"""Chromosome-SCALE parity against the real reference (round-4 verdict #3).

tests/test_reference_parity.py diffs against the in-process reference at
n_bins <= 420; the freeze-ratio early-stops (callers.py:203-232,263-275),
lambda-chunk populations and clustering behave differently at real
chromosome scale.  These tests run the full 16-col / 13-col formatted
bedpe diff at chr21 size — 1,870 bins @25Kb and 4,670 bins @10Kb (hg38
chr21 = 46.7Mb; data spec README.rst:148-163) — at realistic depth, with
the reference CLI default configs (scripts/pyHICCUPS:42-73,
scripts/pyBHFDR:38-58).  This is the strongest in-environment substitute
for the north-star run on the real K562 example (whose data file is
unobtainable here; examples/fetch_example.py stands ready).

Marked ``slow``: the in-process reference itself needs minutes at this
scale.  Run with ``pytest -m slow tests/test_reference_parity_scale.py``.
"""
import numpy as np
import pytest

from hicpeaks_tpu.core import engine
from hicpeaks_tpu.core.config import BHFDRConfig, HiccupsConfig
from hicpeaks_tpu.io.coolerlite import CoolerLite
from hicpeaks_tpu.io.synth import synthetic_cooler
from hicpeaks_tpu.ops.band import bands_from_cooler

from .test_reference_parity import (REFROOT, _format_lines, _no_persistent_cache,
                                    prepare_sparse,
                                    ref)   # noqa: F401  (fixture re-export)

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not (REFROOT / 'hicpeaks' / 'callers.py').exists(),
        reason='reference tree not available at /root/reference'),
]


@pytest.fixture(scope='module')
def chr21_25k(tmp_path_factory):
    path = tmp_path_factory.mktemp('scale25k') / 'chr21_25k.cool'
    # 1,870 bins x 25Kb = hg38 chr21; depth calibrated so per-bin coverage
    # is deep enough to exercise the freeze early-stop ratios
    uri, loops = synthetic_cooler(str(path), n_bins=1870, res=25000,
                                  seed=2125, n_loops=120, depth=80.0,
                                  decay=0.75, max_loop_span_bins=340)
    return CoolerLite(uri), loops


@pytest.fixture(scope='module')
def chr21_10k(tmp_path_factory):
    path = tmp_path_factory.mktemp('scale10k') / 'chr21_10k.cool'
    uri, loops = synthetic_cooler(str(path), n_bins=4670, res=10000,
                                  seed=2110, n_loops=250, depth=45.0,
                                  decay=0.75, max_loop_span_bins=800)
    return CoolerLite(uri), loops


def test_hiccups_chr21_scale_25k_bedpe_identical(ref, chr21_25k):
    """Full pyHICCUPS CLI-default run at chr21@25Kb scale: the formatted
    16-col bedpe must be byte-identical to the real reference's
    (scripts/pyHICCUPS:200-210 '%.3g' formatting included)."""
    from hicpeaks_tpu.io.peakfile import write_hiccups_bedpe

    clr, _ = chr21_25k
    res = clr.binsize
    pw, ww = (1, 2), (3, 5)
    cfg = HiccupsConfig(pw=pw, ww=ww, maxww=10, siglevel=0.05, sumq=0.01,
                        maxapart=10_000_000, min_marginal_peaks=2,
                        min_local_reads=16, only_anchors=False)
    d = prepare_sparse(clr, '21', cfg.maxapart, cfg.maxww, min(ww))
    want = ref.callers.hiccups(d['M'], d['cM'], d['B'], d['B'], d['IR'],
                               d['chromLen'], d['Diags'], d['cDiags'],
                               d['num'], '21', pw=list(pw), ww=list(ww),
                               maxww=cfg.maxww, sig=cfg.siglevel,
                               sumq=cfg.sumq, double_fold=cfg.double_fold,
                               single_fold=cfg.single_fold,
                               maxapart=cfg.maxapart, res=res,
                               min_marginal_peaks=2, onlyanchor=False,
                               min_local_reads=16)
    # the PRODUCTION dtype (f32 bands + float64 host completion)
    bands = bands_from_cooler(clr, '21', cfg.maxapart, cfg.maxww, min(ww),
                              dtype=np.float32)
    got = engine.hiccups_chrom(bands, cfg)
    lines_got = _format_lines(write_hiccups_bedpe, '21', res, got)
    lines_want = _format_lines(write_hiccups_bedpe, '21', res, want)
    assert len(lines_want) > 5, 'degenerate fixture: too few peaks'
    assert lines_got == lines_want


def test_bhfdr_chr21_scale_25k_bedpe_identical(ref, chr21_25k):
    """pyBHFDR CLI defaults at chr21@25Kb scale: byte-identical 13-col
    bedpe (scripts/pyBHFDR:169-176)."""
    from hicpeaks_tpu.io.peakfile import write_bhfdr_bedpe

    clr, _ = chr21_25k
    res = clr.binsize
    cfg = BHFDRConfig(pw=2, ww=5, maxww=20, siglevel=0.1,
                      maxapart=2_000_000)
    d = prepare_sparse(clr, '21', cfg.maxapart, cfg.maxww, cfg.ww)
    want = ref.callers.bhfdr(d['M'], d['cM'], d['B'], d['B'], d['IR'],
                             d['chromLen'], d['Diags'], d['cDiags'],
                             d['num'], '21', pw=cfg.pw, ww=cfg.ww,
                             sig=cfg.siglevel, maxww=cfg.maxww,
                             maxapart=cfg.maxapart, res=res)
    bands = bands_from_cooler(clr, '21', cfg.maxapart, cfg.maxww, cfg.ww,
                              dtype=np.float32)
    got = engine.bhfdr_chrom(bands, cfg)
    lines_got = _format_lines(write_bhfdr_bedpe, '21', res, got)
    lines_want = _format_lines(write_bhfdr_bedpe, '21', res, want)
    assert len(lines_want) > 5, 'degenerate fixture: too few peaks'
    assert lines_got == lines_want


def test_hiccups_chr21_scale_10k_bedpe_identical(ref, chr21_10k):
    """chr21@10Kb (4,670 bins) with the README's 10Kb recommendation
    (pw=2, ww=5): byte-identical 16-col bedpe at the largest in-process
    scale the reference can run in test time."""
    from hicpeaks_tpu.io.peakfile import write_hiccups_bedpe

    clr, _ = chr21_10k
    res = clr.binsize
    pw, ww = (2,), (5,)
    cfg = HiccupsConfig(pw=pw, ww=ww, maxww=10, siglevel=0.05, sumq=0.01,
                        maxapart=10_000_000, min_marginal_peaks=2,
                        min_local_reads=16, only_anchors=False)
    d = prepare_sparse(clr, '21', cfg.maxapart, cfg.maxww, min(ww))
    want = ref.callers.hiccups(d['M'], d['cM'], d['B'], d['B'], d['IR'],
                               d['chromLen'], d['Diags'], d['cDiags'],
                               d['num'], '21', pw=list(pw), ww=list(ww),
                               maxww=cfg.maxww, sig=cfg.siglevel,
                               sumq=cfg.sumq, double_fold=cfg.double_fold,
                               single_fold=cfg.single_fold,
                               maxapart=cfg.maxapart, res=res,
                               min_marginal_peaks=2, onlyanchor=False,
                               min_local_reads=16)
    bands = bands_from_cooler(clr, '21', cfg.maxapart, cfg.maxww, min(ww),
                              dtype=np.float32)
    got = engine.hiccups_chrom(bands, cfg)
    lines_got = _format_lines(write_hiccups_bedpe, '21', res, got)
    lines_want = _format_lines(write_hiccups_bedpe, '21', res, want)
    assert len(lines_want) > 5, 'degenerate fixture: too few peaks'
    assert lines_got == lines_want
