"""Lambda-chunk edge-suspect correction (engine._compact_to_host).

The device chunks pixels by f32 E; the reference by float64
(callers.py:263-270).  A pixel within the accumulation-error margin of a
chunk edge ships as a SUSPECT: the controller replays its E in float64,
moves it to its true (chunk, count) histogram cell, rebuilds the exact
q table, and decides its keep host-side.  Natural flips are ~ulp-rare,
so this test FORCES them through a monkeypatched hostexact and checks
the corrected q values, the suspect emission, and the missed-pixel
audit against a brute-force float64 BH."""
import numpy as np
import pytest

from hicpeaks_tpu.core import engine
from hicpeaks_tpu.ops import score as score_ops


def _bh_bruteforce(cids, counts, sig):
    """Exact per-chunk BH over explicit (chunk, count) pixel lists:
    p = 1 - cdf(count; right_edge(chunk)), statsmodels fdr_bh per chunk."""
    from scipy.stats import poisson
    cids = np.asarray(cids)
    counts = np.asarray(counts)
    q = np.ones(len(cids))
    for s in np.unique(cids):
        m = cids == s
        rv = 2.0 ** ((s - 1.0) / 3.0)
        p = 1.0 - poisson.cdf(counts[m], rv)
        order = np.argsort(p, kind='stable')
        ranks = np.empty(len(p))
        ranks[order] = np.arange(1, len(p) + 1)
        # tie groups share the max rank (statsmodels' ecdf)
        for pv in np.unique(p):
            ranks[p == pv] = ranks[p == pv].max()
        raw = np.minimum(p * m.sum() / ranks, 1.0)
        qs = np.minimum.accumulate(raw[order][::-1])[::-1]
        out = np.empty(len(p))
        out[order] = qs
        q[m] = out
    return q


class _FakeCtx:
    """Stands in for hostexact.ExactCtx; the monkeypatched exact_stats
    reads (E64, count) straight from this table."""

    def __init__(self, by_coord):
        self.by_coord = by_coord       # (d, x) -> (E64, count)


def _patch_exact(monkeypatch):
    from hicpeaks_tpu.ops import hostexact

    def fake_exact_stats(ctx, d_idx, x_idx, p, kind):
        pairs = [ctx.by_coord[(int(d), int(x))]
                 for d, x in zip(d_idx, x_idx)]
        E64 = np.array([e for e, _ in pairs], np.float64)
        O64 = np.array([c for _, c in pairs], np.float64)
        fold = O64 / np.maximum(E64, 1e-300)
        ice = O64 * 0.5
        return O64, E64, fold, ice

    monkeypatch.setattr(hostexact, 'exact_stats', fake_exact_stats)


def _mk_hist(S, C, cids, counts):
    hist = np.zeros((S, C), np.int64)
    np.add.at(hist, (np.asarray(cids), np.asarray(counts)), 1)
    return hist


def test_flip_corrects_histogram_and_q(monkeypatch):
    """One suspect's f64 chunk differs from its f32 one: the corrected
    table must equal the brute-force BH over the TRUE chunk assignment,
    and the suspect must be emitted iff its true q clears sig."""
    _patch_exact(monkeypatch)
    S, C, sig = 8, 32, 0.05
    # population: chunk 4 holds counts [9]*3 + [2]*40; chunk 5 holds
    # [12]*2 + [3] * 30.  One pixel with count 9 sits on the 4/5 edge:
    # the device put it in chunk 4, float64 says chunk 5.
    base_cids = [4] * 3 + [4] * 40 + [5] * 2 + [5] * 30
    base_cnts = [9] * 3 + [2] * 40 + [12] * 2 + [3] * 30
    # device histogram INCLUDES the suspect at its f32 cell (4, 9)
    dev_cids = base_cids + [4]
    dev_cnts = base_cnts + [9]
    hist = _mk_hist(S, C, dev_cids, dev_cnts)
    # true (f64) assignment: the suspect belongs to chunk 5
    true_cids = base_cids + [5]
    true_cnts = dev_cnts
    q_true = _bh_bruteforce(true_cids, true_cnts, sig)

    # main bundle: one kept pixel from chunk 4, count 9 (not the suspect)
    E4 = 2.0 ** (2.5 / 3.0)    # interior of chunk 4: t = 2.5
    E5 = 2.0 ** (3.5 / 3.0)    # interior of chunk 5
    cap = 8
    d_idx = np.zeros(cap, np.int32)
    x_idx = np.zeros(cap, np.int32)
    d_idx[0], x_idx[0] = 3, 10
    fetched = (np.int32(1), d_idx, x_idx,
               np.full(cap, 9.0, np.float32),          # O
               np.zeros(cap, np.float32),              # ICE (overwritten)
               np.zeros(cap, np.float32),              # Fold (overwritten)
               np.zeros(cap, np.int32),                # cid (unused: exact)
               hist.astype(np.int32))
    # suspect bundle: the flipped pixel (device cell (4, 9))
    sus_cap = 8
    thr_dev = np.full(S, C, np.int32)   # device kept nothing via threshold
    # ... except chunk 4 at count >= 9 (so the main pixel was kept) and
    # chunk 5 at count >= 12 (its two count-12 pixels are significant;
    # without this the audit rightly refuses — see the audit test)
    thr_dev[4] = 9
    thr_dev[5] = 12
    sus = (np.int32(1),
           np.zeros(sus_cap, np.int32) + 2,            # d_s
           np.zeros(sus_cap, np.int32) + 20,           # x_s
           np.full(sus_cap, 4, np.int32),              # device cid
           np.full(sus_cap, 9, np.int32),              # count
           np.zeros(sus_cap, bool),                    # gap
           thr_dev)
    ctx = _FakeCtx({(3, 10): (E4, 9), (2, 20): (E5, 9)})
    r = engine._compact_to_host(fetched, None, cap, sig=sig,
                                exact=(ctx, 1, 'K'), sus=sus)
    assert r is not None
    got = {(int(x), int(y)): q for x, y, q in zip(r['x'], r['y'], r['q'])}
    # brute-force q of the main pixel: a chunk-4 count-9 pixel under the
    # TRUE assignment (2 such pixels left after the flip moves one out)
    q4 = q_true[np.array([c == 4 and n == 9
                          for c, n in zip(true_cids, true_cnts)])]
    q5 = q_true[-1]                                    # the flipped pixel
    if q4.size and q4[0] <= sig:
        assert (10, 13) in got
        np.testing.assert_allclose(got[(10, 13)], q4[0], rtol=1e-12)
    if q5 <= sig:
        assert (20, 22) in got
        np.testing.assert_allclose(got[(20, 22)], q5, rtol=1e-12)
    else:
        assert (20, 22) not in got


def test_audit_catches_missed_pixel(monkeypatch):
    """If the corrected table makes a cell significant BELOW the device's
    count threshold while non-suspect pixels sit there, the completion
    must refuse (return None) so the caller falls back."""
    _patch_exact(monkeypatch)
    S, C, sig = 8, 32, 0.05
    # chunk 4: 3 pixels at count 9 (p ~ 2e-4 vs right edge 2^1 -> BH-kept
    # at m=3) but the device threshold says only count >= 10 was kept
    hist = _mk_hist(S, C, [4] * 3, [9] * 3)
    cap = 8
    fetched = (np.int32(0), np.zeros(cap, np.int32),
               np.zeros(cap, np.int32), np.zeros(cap, np.float32),
               np.zeros(cap, np.float32), np.zeros(cap, np.float32),
               np.zeros(cap, np.int32), hist.astype(np.int32))
    thr_dev = np.full(S, C, np.int32)
    thr_dev[4] = 10                     # device missed the count-9 pixels
    sus = (np.int32(0),) + tuple(np.zeros(8, np.int32) for _ in range(4)) \
        + (np.zeros(8, bool), thr_dev)
    ctx = _FakeCtx({})
    r = engine._compact_to_host(fetched, None, cap, sig=sig,
                                exact=(ctx, 1, 'K'), sus=sus)
    assert r is None


def test_suspect_cap_overflow_returns_none(monkeypatch):
    _patch_exact(monkeypatch)
    hist = np.zeros((8, 32), np.int32)
    cap = 8
    fetched = (np.int32(0), np.zeros(cap, np.int32),
               np.zeros(cap, np.int32), np.zeros(cap, np.float32),
               np.zeros(cap, np.float32), np.zeros(cap, np.float32),
               np.zeros(cap, np.int32), hist)
    sus = (np.int32(99),) + tuple(np.zeros(8, np.int32) for _ in range(4)) \
        + (np.zeros(8, bool), np.zeros(8, np.int32))
    r = engine._compact_to_host(fetched, None, cap, sig=0.05,
                                exact=(_FakeCtx({}), 1, 'K'), sus=sus)
    assert r is None


@pytest.mark.parametrize('seed', [0, 1])
def test_no_flip_correction_is_identity(monkeypatch, seed):
    """Suspects whose f64 chunk equals the f32 one must leave the output
    exactly as if they had stayed in the device keep set (same corrected
    table, same q)."""
    _patch_exact(monkeypatch)
    rng = np.random.default_rng(seed)
    S, C, sig = 10, 64, 0.05
    n = 500
    cids = rng.integers(1, S, n)
    cnts = rng.integers(0, C, n)
    hist = _mk_hist(S, C, cids, cnts)
    q_true = _bh_bruteforce(cids, cnts, sig)
    # pick one pixel as a 'suspect' that does NOT flip
    i = int(rng.integers(n))
    E_i = 2.0 ** ((cids[i] - 1.5) / 3.0)   # interior of its chunk
    cap = 8
    fetched = (np.int32(0), np.zeros(cap, np.int32),
               np.zeros(cap, np.int32), np.zeros(cap, np.float32),
               np.zeros(cap, np.float32), np.zeros(cap, np.float32),
               np.zeros(cap, np.int32), hist.astype(np.int32))
    thr_dev = np.zeros(S, np.int32)      # device kept everything valid
    sus = (np.int32(1),
           np.zeros(8, np.int32) + 1, np.zeros(8, np.int32) + 5,
           np.full(8, cids[i], np.int32), np.full(8, cnts[i], np.int32),
           np.zeros(8, bool), thr_dev)
    ctx = _FakeCtx({(1, 5): (E_i, cnts[i])})
    r = engine._compact_to_host(fetched, None, cap, sig=sig,
                                exact=(ctx, 1, 'K'), sus=sus)
    assert r is not None
    if q_true[i] <= sig:
        got = {(int(x), int(y)): q for x, y, q in zip(r['x'], r['y'], r['q'])}
        np.testing.assert_allclose(got[(5, 6)], q_true[i], rtol=1e-12)
