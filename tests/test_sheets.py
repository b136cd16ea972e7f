"""Parity of the device-side sheet builder (ops/score.build_sheets_device)
against the host-side round-1 path it replaces.

The production engine derives the balanced band, expected band, bias
product, gap-reject mask, and candidate mask on device from one raw slab
plus O(L) vectors; these tests pin each sheet to the host computation
that is itself pinned to the reference (gap windows: callers.py:291-312;
expected-value factors: invariant 3 of SURVEY §2).
"""
import jax
import numpy as np
import jax.numpy as jnp
import pytest

from hicpeaks_tpu.ops import score as score_ops
from hicpeaks_tpu.ops.band import build_bands


def _random_chrom(seed, L=300, num=64, nan_frac=0.1, ww_min=3):
    rng = np.random.default_rng(seed)
    n = 1500
    b1 = rng.integers(0, L, n)
    d = rng.integers(0, num + 10, n)
    b2 = np.minimum(b1 + d, L - 1)
    # dedup like ingest does
    key = b1 * (2 * L) + b2
    _, idx = np.unique(key, return_index=True)
    b1, b2 = b1[idx], b2[idx]
    ct = rng.integers(1, 50, b1.size).astype(np.float64)
    w = rng.uniform(0.5, 2.0, L)
    w[rng.random(L) < nan_frac] = np.nan
    return build_bands(b1, b2, ct, w, L, num, ww_min, res=10000), w


def test_shear_bcast_matches_gather():
    rng = np.random.default_rng(0)
    vec = rng.normal(size=137).astype(np.float32)
    num_p = 24
    out = np.asarray(score_ops.shear_bcast(jnp.asarray(vec), num_p))
    Lp = vec.shape[0]
    exp = np.zeros((num_p, Lp), np.float32)
    for dd in range(num_p):
        for x in range(Lp):
            if x + dd < Lp:
                exp[dd, x] = vec[x + dd]
    np.testing.assert_array_equal(out, exp)


@pytest.mark.parametrize('seed', [1, 2])
def test_device_sheets_match_host(seed):
    bands, w = _random_chrom(seed)
    num_p, Lp = bands.raw.shape
    L, ww_min = bands.L, bands.ww_min
    d_lo, d_hi = ww_min, 50
    gap_s = ww_min

    raw_d, cband_d, eband_d, Bprod_d, gapdrop_d, cand_d = [
        np.asarray(a) for a in score_ops.build_sheets_device(
            jnp.asarray(bands.raw), jnp.asarray(bands.w0),
            jnp.asarray(bands.bias), jnp.asarray(bands.IR),
            jnp.asarray(bands.gap), ww_min, L, d_lo, d_hi, gap_s)]

    # balanced band: host path rounds the f64 product once, the device
    # multiplies f32 factors — equal to a few ulp
    np.testing.assert_allclose(cband_d, bands.cband, rtol=5e-6, atol=0)
    # zero/nonzero structure must agree exactly (gap + candidate semantics)
    np.testing.assert_array_equal(cband_d == 0, bands.cband == 0)

    drow = np.arange(num_p)[:, None]
    col = np.arange(Lp)[None, :]
    eband_h = np.where(col < (L - drow), bands.IR[:, None], 0.0)
    np.testing.assert_array_equal(eband_d, eband_h.astype(np.float32))

    np.testing.assert_array_equal(
        Bprod_d, score_ops.bias_product_host(bands.bias, num_p))

    gapdrop_h = score_ops.gap_reject_host(bands.gap, num_p, L, gap_s)
    np.testing.assert_array_equal(gapdrop_d, gapdrop_h)

    cand_h = (bands.raw != 0) & (drow >= d_lo) & (drow <= d_hi)
    np.testing.assert_array_equal(cand_d, cand_h)
    assert bands.candidate_total(d_lo, d_hi) == int(cand_h.sum())


def test_native_band_build_matches_numpy():
    """native/bandbuild.cpp vs the numpy path of build_bands: identical
    raw band, gap vector, candidate totals; IR to f64-summation-order
    tolerance."""
    from hicpeaks_tpu.ops import bandnative
    if bandnative._load_library() is None:
        pytest.skip('native bandbuild unavailable')
    rng = np.random.default_rng(11)
    L, num, ww_min = 400, 96, 3
    n = 3000
    b1 = rng.integers(0, L, n)
    d = rng.integers(0, num + 20, n)
    b2 = np.minimum(b1 + d, L - 1)
    key = b1 * (2 * L) + b2
    _, idx = np.unique(key, return_index=True)
    b1, b2 = b1[idx], b2[idx]
    ct = rng.integers(1, 50, b1.size).astype(np.float64)
    w = rng.uniform(0.5, 2.0, L)
    w[rng.random(L) < 0.15] = np.nan

    nat = build_bands(b1, b2, ct, w, L, num, ww_min, res=10000,
                      dtype=np.float32)
    assert nat._sparse[0].size > 0
    # force the numpy path by requesting a dtype the native kernel skips,
    # then compare against a float32 re-cast
    ref = build_bands(b1, b2, ct, w, L, num, ww_min, res=10000,
                      dtype=np.float64)

    np.testing.assert_array_equal(nat.raw, ref.raw.astype(np.float32))
    np.testing.assert_array_equal(nat.gap, ref.gap)
    np.testing.assert_allclose(nat.IR, ref.IR.astype(np.float32), rtol=1e-6)
    np.testing.assert_array_equal(nat.bias, ref.bias.astype(np.float32))
    np.testing.assert_array_equal(nat.cband, ref.cband.astype(np.float32))
    for lo, hi in ((ww_min, 50), (0, num)):
        assert nat.candidate_total(lo, hi) == ref.candidate_total(lo, hi)
    np.testing.assert_array_equal(nat.cand_hist, ref.cand_hist)
    assert nat.max_count == ref.max_count == float(ct.max())
    assert nat.nnz() == ref.nnz()

    # production form: no COO copies, everything else identical
    slim = build_bands(b1, b2, ct, w, L, num, ww_min, res=10000,
                       dtype=np.float32, keep_sparse=False)
    assert slim._sparse is None
    np.testing.assert_array_equal(slim.raw, nat.raw)
    np.testing.assert_array_equal(slim.cand_hist, nat.cand_hist)
    assert slim.max_count == nat.max_count
    for lo, hi in ((ww_min, 50), (0, num)):
        assert slim.candidate_total(lo, hi) == nat.candidate_total(lo, hi)
    with pytest.raises(AttributeError):
        slim.cband


def test_gap_vector_matches_dense_cband():
    bands, _ = _random_chrom(3, nan_frac=0.3)
    np.testing.assert_array_equal(bands.gap,
                                  bands.cband.sum(axis=0) == 0)


@pytest.mark.parametrize('L,s', [(40, 5), (40, 39), (40, 40), (40, 64),
                                 (128, 1), (40, 0), (1, 3)])
def test_gap_reject_device_edges(L, s):
    """Device twin vs host across clamped windows, s >= L, s = 0, L = 1 —
    including JUNK gap bits beyond L, which the traced-L formulation must
    mask out (the padded tail of a shape-bucketed chromosome is
    arbitrary)."""
    rng = np.random.default_rng(L + s)
    Lp = 128
    num_p = 16
    gap = np.zeros(Lp, bool)
    gap[rng.integers(0, L, 6)] = True
    gap[L:] = rng.random(Lp - L) < 0.5      # junk beyond L: must not count
    d = np.asarray(score_ops.gap_reject_device(jnp.asarray(gap), num_p, L, s))
    h = score_ops.gap_reject_host(gap, num_p, L, s)
    np.testing.assert_array_equal(d, h)

    # traced L must give the identical mask (shared-bucket executables)
    d_tr = np.asarray(jax.jit(
        lambda g, Lt: score_ops.gap_reject_device(g, num_p, Lt, s)
    )(jnp.asarray(gap), jnp.int32(L)))
    np.testing.assert_array_equal(d_tr, h)


def test_u16_slab_transfer_decision_and_parity():
    """engine._prep_chrom ships integer count slabs < 65536 compactly
    (uint16 / uint8 / a split-row pair) and rebuilds float32 on device;
    the decision must be lossless-only."""
    from hicpeaks_tpu.core import engine

    bands, _ = _random_chrom(4)
    assert bands.raw.dtype.kind == 'f'
    out_f = [np.asarray(a) for a in
             engine._prep_chrom(bands, bands.ww_min, 50, bands.ww_min)]
    # counts are integral < 65536 -> the row-classed integer encoding.
    # Cut positions PREFER the fixed (row-count-only) boundaries so the
    # static `bits` tuple — and hence the compiled fused program — is
    # shared across a genome's chromosomes; a u16 head class may appear
    # even when u8 would suffice (a few KB of transfer for one shared
    # executable).  Losslessness is asserted by the round-trip below and
    # by test_split_row_encoding_lossless.
    enc = getattr(bands, '_raw_enc')
    assert isinstance(enc, engine._SlabEnc)
    n_rows = bands.raw.shape[0]
    widths = dict(zip(enc.bits, enc.parts))
    assert sum(p.shape[0] for p in enc.parts) == n_rows
    # device raw is float32 regardless of transfer encoding
    assert out_f[0].dtype == np.float32
    np.testing.assert_array_equal(out_f[0][:, :bands.raw.shape[1]],
                                  bands.raw.astype(np.float32))

    # non-integral counts must fall back to the float path
    bands2, _ = _random_chrom(5)
    bands2.raw = bands2.raw * 1.5
    engine._prep_chrom(bands2, bands2.ww_min, 50, bands2.ww_min)
    assert bands2._raw_enc is False

    # values >= 65536 must fall back too
    bands3, _ = _random_chrom(6)
    bands3.raw[bands3.raw > 0] += 70000.0
    engine._prep_chrom(bands3, bands3.ww_min, 50, bands3.ww_min)
    assert bands3._raw_enc is False


def _decode_enc(enc, n_cols):
    """Host twin of ops/score._unpack_rows over a _SlabEnc."""
    rows = []
    for part, b in zip(enc.parts, enc.bits):
        if b >= 8:
            rows.append(part.astype(np.float32))
            continue
        per = 8 // b
        mask = (1 << b) - 1
        out = np.zeros((part.shape[0], part.shape[1] * per), np.float32)
        for k in range(per):
            out[:, k::per] = (part >> (b * k)) & mask
        rows.append(out)
    got = np.concatenate(rows, axis=0)
    assert got.shape[1] == n_cols
    return got


def test_split_row_slab_transfer_parity():
    """Counts >= 256 on the near diagonals select a uint16 head class;
    the quiet tail rows pack at 8/4/2 bits per count.  The device rebuild
    and the mesh-facing contiguous form must both reproduce the float32
    slab exactly."""
    from hicpeaks_tpu.core import engine

    bands, _ = _random_chrom(7, num=200)
    # hot near-diagonal rows, quiet tail — the genome-scale count shape
    bands.raw[:3][bands.raw[:3] > 0] += 500.0
    enc = engine._compact_slab(bands)
    assert isinstance(enc, engine._SlabEnc)
    assert enc.bits[0] == 16            # hot head rows
    assert enc.bits == tuple(sorted(enc.bits, reverse=True))
    assert enc.parts[0].dtype == np.uint16
    assert enc.parts[0].shape[0] == 64  # 64-row bucketed boundary
    assert sum(p.shape[0] for p in enc.parts) == bands.raw.shape[0]
    np.testing.assert_array_equal(_decode_enc(enc, bands.raw.shape[1]),
                                  bands.raw.astype(np.float32))

    # the mesh path needs one contiguous array (split=False)
    full = engine._compact_slab(bands, split=False)
    assert full.dtype == np.uint16
    np.testing.assert_array_equal(full.astype(np.float32),
                                  bands.raw.astype(np.float32))

    # end-to-end through the sheet builder
    out_f = [np.asarray(a) for a in
             engine._prep_chrom(bands, bands.ww_min, 50, bands.ww_min)]
    np.testing.assert_array_equal(out_f[0][:, :bands.raw.shape[1]],
                                  bands.raw.astype(np.float32))

    # staged (prefetch-thread) form carries the row-classed encoding
    engine.stage_chrom_arrays(bands)
    assert isinstance(bands._staged['raw'], engine._SlabEnc)
    out_s = [np.asarray(a) for a in
             engine._prep_chrom(bands, bands.ww_min, 50, bands.ww_min)]
    np.testing.assert_array_equal(out_s[0], out_f[0])
