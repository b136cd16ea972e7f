"""Device freeze-emulation twins vs the host replay (bit-exact gate).

The fused single-program path computes the controller's early-stop
bookkeeping (reference callers.py:203-232 / :505-511) ON DEVICE between
pass A and pass B (poolplan.device_allowed_*).  Every comparison there is
integer-exact (10*n < 3*ini; the left-ratio threshold is precomputed in
exact host ints, poolplan.left_threshold), so the traced gate must equal
the host replay on ANY counts — fuzzed here, including ratio-boundary
counts engineered to land exactly on 0.3/0.03."""
import numpy as np
import jax.numpy as jnp
import pytest

from hicpeaks_tpu.core import poolplan


def _random_counts(rng, plan, total):
    # counts whose per-p sums never exceed total (the scan guarantees
    # this: newly-frozen candidate pixels are disjoint per p)
    counts = np.zeros(len(plan), np.int64)
    budget = {}
    for e in plan:
        budget.setdefault(e.p, total)
        c = rng.integers(0, max(budget[e.p] // 2, 1) + 1)
        counts[e.index] = c
        budget[e.p] -= c
    return counts


@pytest.mark.parametrize('total', [0, 1, 7, 1000, 214748363])
def test_hiccups_device_allowed_matches_host(total):
    plan = tuple(poolplan.hiccups_pool_plan([1, 2], [3, 5], 10))
    rng = np.random.default_rng(0)
    for trial in range(25):
        counts = _random_counts(rng, plan, total)
        host = poolplan.emulate_freeze_hiccups(plan, counts, total,
                                               (3, 5)).allowed
        dev = poolplan.device_allowed_hiccups(
            jnp.asarray(counts, jnp.int32), np.int32(total),
            np.int32(poolplan.left_threshold(total)), plan, (3, 5))
        assert np.array_equal(np.asarray(dev), np.asarray(host)), \
            (total, trial, counts)


def test_hiccups_boundary_ratios():
    """Counts sitting exactly on the 0.3 / 0.03 boundaries: the float
    replay computes e.g. 3/10 == 0.3 (exact in binary? no — but both
    sides use the SAME strict <, and the integer form is the rational
    truth, see poolplan.left_threshold's exactness note)."""
    plan = tuple(poolplan.hiccups_pool_plan([2], [5], 10))
    total = 1000
    # first entry freezes exactly 30% of total -> valid_ratio == 0.3,
    # NOT < 0.3; then 97% cumulative -> left_ratio == 0.03 exactly
    for counts in ([300, 0, 0, 0, 0, 0],
                   [300, 670, 0, 0, 0, 0],     # left_ratio = 0.03 exactly
                   [300, 671, 0, 0, 0, 0],     # left_ratio < 0.03
                   [299, 0, 0, 0, 0, 0],
                   [1000, 0, 0, 0, 0, 0]):
        counts = np.asarray(counts, np.int64)
        host = poolplan.emulate_freeze_hiccups(plan, counts, total,
                                               (5,)).allowed
        dev = poolplan.device_allowed_hiccups(
            jnp.asarray(counts, jnp.int32), np.int32(total),
            np.int32(poolplan.left_threshold(total)), plan, (5,))
        assert np.array_equal(np.asarray(dev), np.asarray(host)), counts


@pytest.mark.parametrize('total', [0, 1, 16, 12345, 214748363])
def test_bhfdr_device_allowed_matches_host(total):
    plan = tuple(poolplan.bhfdr_pool_plan(2, 5, 10))
    rng = np.random.default_rng(1)
    for trial in range(25):
        counts = _random_counts(rng, plan, total)
        host = poolplan.emulate_freeze_bhfdr(plan, counts, total).allowed
        dev = poolplan.device_allowed_bhfdr(
            jnp.asarray(counts, jnp.int32), np.int32(total),
            np.int32(poolplan.left_threshold(total)), plan)
        assert np.array_equal(np.asarray(dev), np.asarray(host)), \
            (total, trial, counts)


def test_left_threshold_rational():
    """left_threshold encodes ini/total < 0.03 exactly: brute-force check
    against the float replay over a dense total sweep."""
    for total in list(range(1, 400)) + [999, 1000, 1001, 10**6, 10**6 + 1]:
        t = poolplan.left_threshold(total)
        for ini in range(0, min(total, 50) + 1):
            assert (ini <= t) == (ini / total < 0.03), (total, ini)
        # spot-check the neighborhood of the exact boundary too
        b = 3 * total // 100
        for ini in range(max(b - 2, 0), min(b + 3, total) + 1):
            assert (ini <= t) == (ini / total < 0.03), (total, ini)
