"""Multi-resolution combiner semantics (reference utilities.py:469-552)."""
from hicpeaks_tpu.core.combine import combine_annotations


def _peak(s1, s2, res):
    return (s1, s1 + res, s2, s2 + res)


def test_single_resolution_passthrough():
    byres = {10000: {'1': [_peak(100000, 500000, 10000)]}}
    out = combine_annotations(byres)
    assert out == [('1', 100000, 110000, '1', 500000, 510000)]


def test_fine_confirmed_by_coarse_suppresses_coarse():
    res_f, res_c = 10000, 20000
    fine = _peak(100000, 500000, res_f)
    coarse = _peak(100000, 500000, res_c)     # within thre1 = 2*max_res
    byres = {res_f: {'1': [fine]}, res_c: {'1': [coarse]}}
    out = combine_annotations(byres, good_res=20000, mindis=100000,
                              max_res=20000)
    # fine kept; matched coarse recorded as redundant and dropped
    assert ('1', 100000, 110000, '1', 500000, 510000) in out
    assert ('1', 100000, 120000, '1', 500000, 520000) not in out


def test_unconfirmed_fine_peak_dropped_unless_close():
    res_f, res_c = 5000, 20000
    far_fine = _peak(100000, 900000, res_f)     # 800 kb apart, unconfirmed
    near_fine = _peak(100000, 140000, res_f)    # 40 kb apart  -> kept
    coarse = _peak(3_000_000, 4_000_000, res_c)
    byres = {res_f: {'1': [far_fine, near_fine]},
             res_c: {'1': [coarse]}}
    out = combine_annotations(byres, good_res=10000, mindis=100000,
                              max_res=20000)
    keys = set(out)
    assert ('1', 100000, 105000, '1', 140000, 145000) in keys
    assert ('1', 100000, 105000, '1', 900000, 905000) not in keys
    # the unmatched coarse peak survives (coarsest-pass keep rule)
    assert ('1', 3_000_000, 3_020_000, '1', 4_000_000, 4_020_000) in keys
