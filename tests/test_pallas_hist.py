"""Pallas (chunk, count) histogram kernel vs the jnp one-hot scan.

The kernel must be bit-exact (integer counts) against the scan for any
pixel mix, including padding and the chunk-0 trash row, and the full
q-table / keep mask built from it must be identical.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from hicpeaks_tpu.ops import score as score_ops
from hicpeaks_tpu.ops.pallas_hist import chunk_hist_pallas


def _pack(O, cid, valid, S, C):
    return score_ops._chunk_pack(jnp.asarray(O), jnp.asarray(cid),
                                 jnp.asarray(valid), S, C)


def _scan_hist(Oc_p, cid_p, S, C):
    """The jnp reference histogram (the _chunk_qtab scan, hist only)."""
    s_iota = jnp.arange(S, dtype=jnp.int32)
    c_iota = jnp.arange(C, dtype=jnp.int32)
    import jax

    def hist_step(acc, xs):
        oc, cc = xs
        oh_s = (cc[:, None] == s_iota[None, :]).astype(jnp.bfloat16)
        oh_o = (oc[:, None] == c_iota[None, :]).astype(jnp.bfloat16)
        step = jnp.dot(oh_s.T, oh_o, preferred_element_type=jnp.float32)
        return acc + step.astype(jnp.int32), None

    hist, _ = jax.lax.scan(hist_step, jnp.zeros((S, C), jnp.int32),
                           (Oc_p, cid_p))
    return hist


@pytest.mark.parametrize('n,o_cap,seed', [(5000, 256, 0), (70000, 512, 1),
                                          (300, 131, 2)])
def test_hist_kernel_matches_scan(n, o_cap, seed):
    rng = np.random.default_rng(seed)
    S, C = 128, o_cap + 1
    O = rng.poisson(9.0, n).astype(np.float32)
    O[rng.random(n) < 0.01] = o_cap * 3.0          # clip-at-cap bucket
    cid = rng.integers(1, S, n).astype(np.int32)
    valid = rng.random(n) < 0.8
    Oc_p, cid_p, _ = _pack(O, cid, valid, S, C)

    want = np.asarray(_scan_hist(Oc_p, cid_p, S, C))
    got = np.asarray(chunk_hist_pallas(Oc_p, cid_p, S, C, interpret=True))
    np.testing.assert_array_equal(got, want)
    # every pixel (valid + invalid-folded-to-row-0 + padding) is counted
    assert got.sum() == Oc_p.size


@pytest.mark.parametrize('sig', [0.05, 0.31])
def test_chunk_bh_keep_pallas_backend_matches_jnp(sig):
    """chunk_bh_keep under hist_backend='pallas-interpret' must return the
    identical keep mask and q-table as the jnp scan backend."""
    rng = np.random.default_rng(23)
    n = 40000
    O = rng.poisson(6.0, n).astype(np.float32)
    E = np.exp(rng.uniform(np.log(0.05), np.log(300.0), n)).astype(np.float32)
    scored = rng.random(n) < 0.9
    cid, rv, valid = score_ops.lambda_chunks(jnp.asarray(E),
                                             jnp.asarray(scored))

    keep_j, qtab_j, hist_j, _tj, _okj = score_ops.chunk_bh_keep(
        jnp.asarray(O), cid, valid, jnp.float32(sig), o_cap=256,
        hist_backend='jnp')
    keep_p, qtab_p, hist_p, _tp, _okp = score_ops.chunk_bh_keep(
        jnp.asarray(O), cid, valid, jnp.float32(sig), o_cap=256,
        hist_backend='pallas-interpret')
    np.testing.assert_array_equal(np.asarray(keep_p), np.asarray(keep_j))
    np.testing.assert_array_equal(np.asarray(qtab_p), np.asarray(qtab_j))
    np.testing.assert_array_equal(np.asarray(hist_p), np.asarray(hist_j))
