"""The jnp ring scan must reproduce the reference's background accumulator
states (validated via the literal branch replay from the oracle tests) in
band-tensor space, for both the single-p and the drifting multi-p pools."""
import numpy as np
import jax.numpy as jnp
import pytest

from hicpeaks_tpu.core import poolplan
from hicpeaks_tpu.ops import scan as scan_ops

from .oracle import reference_impl as oracle
from .test_oracle_smoke import _band_matrix, _replay_reference_bg


def _dense_to_band(Md, num):
    L = Md.shape[0]
    band = np.zeros((num, L))
    for d in range(num):
        idx = np.arange(L - d)
        band[d, idx] = Md[idx, idx + d]
    return band


def _compare_on_band(acc, want, L, num, err_msg=''):
    """Compare a band-space accumulator against a dense-space state on the
    region both represent: pixels (x, x+d) with 0 <= d < num, x < L-d."""
    acc = np.asarray(acc)[:num, :L]
    want_band = _dense_to_band(want, num)
    valid = (np.arange(L)[None, :] < (L - np.arange(num))[:, None])
    np.testing.assert_allclose(np.where(valid, acc, 0.0), want_band,
                               atol=1e-8, err_msg=err_msg)


@pytest.mark.parametrize('pw,ww,maxww', [
    ([2], [5], 8),              # single-p (bhfdr-like)
    ([1, 2, 4], [3, 5, 7], 9),  # multi-p with drift re-adds
])
def test_scan_states_match_reference_replay(pw, ww, maxww):
    L, num = 64, 32
    Md = _band_matrix(L, num, seed=2, lam=2.0)
    band = jnp.asarray(_dense_to_band(Md, num))

    plan = tuple(poolplan.hiccups_pool_plan(pw, ww, maxww))
    states = scan_ops.scan_debug_states(band, band, band, plan)

    replay = _replay_reference_bg(Md, pw, ww, maxww)
    for (entry, (accKc, accKe, accQc, accQe, accR)), ((pi, wi), bK, bY, bR) \
            in zip(zip(plan, states), replay):
        assert (entry.p, entry.w) == (pi, wi)
        for got, want, name in ((accKc, bK, 'K'), (accQc, bY, 'Y'),
                                (accR, bR, 'Reads')):
            _compare_on_band(got, want, L, num,
                             err_msg=f'{name} at (p,w)=({pi},{wi})')


def test_bhfdr_plan_matches_hiccups_single_p():
    """bhfdr's widening loop is the single-p pool with identical ring adds."""
    a = poolplan.bhfdr_pool_plan(2, 5, 9)
    b = poolplan.hiccups_pool_plan([2], [5], 9)
    assert [(e.p, e.w, e.bg_rings, e.reads_rings) for e in a] == \
        [(e.p, e.w, e.bg_rings, e.reads_rings) for e in b]
