"""Native (C++) ring_sums vs the numpy reference implementation.

hostexact.ExactCtx.ring_sums routes through native/bandbuild.cpp's
threaded per-pixel walk when the dense slab is host-resident; the numpy
gather form stays as the reference (and the multi-host raw_spans path).
Float64 accumulation order differs (sequential vs pairwise), so the
comparison is allclose at 1e-12, not bit-equal."""
import numpy as np
import pytest

from hicpeaks_tpu.core import poolplan
from hicpeaks_tpu.io.synth import synthesize_chrom
from hicpeaks_tpu.ops.band import build_bands
from hicpeaks_tpu.ops import hostexact
from hicpeaks_tpu.ops.bandnative import ring_sums_native


@pytest.fixture(scope='module')
def ctx():
    L, res, maxww = 600, 10000, 10
    num = 2_000_000 // res + maxww + 1
    b1, b2, ct, _, bias = synthesize_chrom(n_bins=L, res=res, seed=7,
                                           depth=30.0, n_loops=12)
    w = np.full(L, np.nan)
    ok = bias > 0
    w[ok] = 1.0 / bias[ok]
    bands = build_bands(b1, b2, ct, w, L, num, 3, res, dtype=np.float32)
    plan = tuple(poolplan.hiccups_pool_plan([1, 2], [3, 5], maxww))
    return hostexact.ExactCtx(bands, plan, np.ones(len(plan), bool), 16)


def test_native_matches_numpy(ctx):
    rng = np.random.default_rng(3)
    n = 700
    d = rng.integers(0, ctx.bands.num, n)
    x = rng.integers(0, ctx.bands.raw.shape[1], n)   # incl. lane padding
    native = ring_sums_native(ctx.bands.raw, ctx._w64(), ctx.ir64(),
                              ctx.bands.L, ctx.bands.ww_min, ctx.maxw, d, x)
    assert native is not None, 'native library failed to build/load'
    ref = {k: np.zeros((n, ctx.maxw + 1))
           for k in ('Qm', 'Kc', 'Qc', 'Ke', 'Qe')}
    ctx._ring_sums_block(d, x, ref, 0)
    for k in ref:
        np.testing.assert_allclose(native[k], ref[k], rtol=1e-12,
                                    atol=1e-300, err_msg=k)
    # the raw quadrant sums are integer-valued: sequential-vs-pairwise
    # order cannot round them, so they must be EXACT
    np.testing.assert_array_equal(native['Qm'], ref['Qm'])


def test_ring_sums_dispatches_native(ctx, monkeypatch):
    """ExactCtx.ring_sums must serve the native result for host-resident
    dense bands (and the shapes/keys the consumers expect)."""
    rs = ctx.ring_sums(np.array([5, 9]), np.array([50, 300]))
    assert set(rs) == {'Qm', 'Kc', 'Qc', 'Ke', 'Qe'}
    assert rs['Qm'].shape == (2, ctx.maxw + 1)
    # entries derived from them must be finite
    ent = hostexact.freeze_entries(ctx, rs, 1)
    assert ent.shape == (2,)
