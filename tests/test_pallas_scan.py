"""Pallas fused capture kernel vs the jnp ring scan (interpret mode on
CPU; the same kernel compiles via Mosaic on hardware)."""
import jax.numpy as jnp
import numpy as np
import pytest

from hicpeaks_tpu.core import poolplan
from hicpeaks_tpu.ops import scan as scan_ops
from hicpeaks_tpu.ops.pallas_scan import (scan_pass_a_pallas,
                                          scan_pass_b_pallas)


@pytest.mark.parametrize('pw,ww,maxww', [
    ([2], [5], 7),
    ([1, 2], [3, 5], 7),
])
def test_pallas_capture_matches_jnp(pw, ww, maxww):
    num_p, Lp = 64, 256
    rng = np.random.default_rng(3)
    raw = (rng.random((num_p, Lp)) < 0.4) * rng.poisson(6.0, (num_p, Lp))
    raw = jnp.asarray(raw.astype(np.float32))
    cband = raw * 0.8
    drow = jnp.arange(num_p)[:, None]
    col = jnp.arange(Lp)[None, :]
    L = Lp - 13
    eband = jnp.where((col < (L - drow)) & (drow >= min(ww)), 1.7, 0.0
                      ).astype(jnp.float32)
    cand = (raw != 0) & (drow >= min(ww)) & (drow <= num_p - maxww - 1) & \
        (col < (L - drow))

    plan = tuple(poolplan.hiccups_pool_plan(pw, ww, maxww))
    p_list = tuple(sorted(set(pw)))
    allowed = jnp.ones(len(plan), bool).at[-1].set(False)  # exercise gating

    _, _, want = scan_ops.scan_pass_b(raw, cband, eband, cand, allowed,
                                      plan, p_list, 16)
    got = scan_pass_b_pallas(raw, cband, eband, cand, allowed, plan, p_list,
                             16, interpret=True)
    for p in p_list:
        for t, name in enumerate(('KS', 'KE', 'YS', 'YE')):
            # bit-exact: same _scan_core math, same accumulation order
            # (also verified on TPU hardware by benchmarks/hw_validate.py)
            np.testing.assert_array_equal(np.asarray(got[p][t]),
                                          np.asarray(want[p][t]),
                                          err_msg=f'p={p} {name}')


@pytest.mark.parametrize('pw,ww,maxww,thr', [
    ([2], [5], 7, 16),
    ([1, 2], [3, 5], 7, 8),
])
def test_pallas_count_matches_jnp(pw, ww, maxww, thr):
    """Pass A (freeze-count) kernel: integer-exact per-entry counts."""
    num_p, Lp = 64, 256
    rng = np.random.default_rng(7)
    raw = (rng.random((num_p, Lp)) < 0.4) * rng.poisson(6.0, (num_p, Lp))
    raw = jnp.asarray(raw.astype(np.float32))
    drow = jnp.arange(num_p)[:, None]
    col = jnp.arange(Lp)[None, :]
    L = Lp - 13
    cand = (raw != 0) & (drow >= min(ww)) & (drow <= num_p - maxww - 1) & \
        (col < (L - drow))

    plan = tuple(poolplan.hiccups_pool_plan(pw, ww, maxww))
    p_list = tuple(sorted(set(pw)))

    want = scan_ops.scan_pass_a(raw, cand, plan, p_list, thr)
    got = scan_pass_a_pallas(raw, cand, plan, p_list, thr, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize('num_p,Lp,L', [
    (17, 139, 131),     # nothing aligned: rows/cols force ragged padding
    (8, 384, 380),      # fewer band rows than the 2*maxww margin
    (96, 128, 97),      # single column tile, ragged valid extent
])
def test_pallas_adversarial_shapes_match_jnp(num_p, Lp, L):
    """OOB regression guard for the fused kernels (round-2 verdict
    next-step #10): shapes chosen so every tile's halo DMA clips against
    the array bounds; any out-of-bounds ring read or mis-clamped DMA
    offset breaks the required bit-exact agreement with the jnp scan.
    (checkify cannot thread through the pallas interpreter's internal
    scan, so the sweep relies on exact equality instead.)"""
    rng = np.random.default_rng(num_p * 1000 + Lp)
    raw = (rng.random((num_p, Lp)) < 0.5) * rng.poisson(5.0, (num_p, Lp))
    raw = jnp.asarray(raw.astype(np.float32))
    cband = raw * jnp.asarray(rng.random((num_p, Lp)), jnp.float32)
    drow = jnp.arange(num_p)[:, None]
    col = jnp.arange(Lp)[None, :]
    eband = jnp.where((col < (L - drow)) & (drow >= 3), 1.3, 0.0
                      ).astype(jnp.float32)
    cand = (raw != 0) & (drow >= 3) & (col < (L - drow))

    plan = tuple(poolplan.hiccups_pool_plan([1, 2], [3, 5], 10))
    p_list = (1, 2)
    allowed = jnp.ones(len(plan), bool)

    want_a = scan_ops.scan_pass_a(raw, cand, plan, p_list, 8)
    got_a = scan_pass_a_pallas(raw, cand, plan, p_list, 8, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_a), np.asarray(want_a))

    _, _, want_b = scan_ops.scan_pass_b(raw, cband, eband, cand, allowed,
                                        plan, p_list, 8)
    got_b = scan_pass_b_pallas(raw, cband, eband, cand, allowed, plan,
                               p_list, 8, interpret=True)
    for p in p_list:
        for t in range(4):
            np.testing.assert_array_equal(np.asarray(got_b[p][t]),
                                          np.asarray(want_b[p][t]),
                                          err_msg=f'p={p} t={t}')
