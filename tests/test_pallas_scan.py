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
            np.testing.assert_allclose(np.asarray(got[p][t]),
                                       np.asarray(want[p][t]),
                                       atol=1e-4,
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
