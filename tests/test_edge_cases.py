"""Degenerate-input robustness: the engines must never crash on inputs
the reference cannot even load (chromosomes shorter than the search span
raise inside scipy ``diagonal`` in the reference worker), and must return
empty tables, not garbage, when there is no signal."""
import numpy as np
import pytest

from hicpeaks_tpu.core import engine
from hicpeaks_tpu.core.config import BHFDRConfig, HiccupsConfig
from hicpeaks_tpu.ops.band import build_bands


def _bands(n_bins, num, pixels=True, seed=0):
    rng = np.random.default_rng(seed)
    if pixels:
        b1 = rng.integers(0, n_bins, 200)
        d = rng.integers(0, min(num, n_bins), 200)
        b2 = np.minimum(b1 + d, n_bins - 1)
        ct = rng.poisson(8.0, 200) + 1
    else:
        b1 = b2 = ct = np.zeros(0, np.int64)
    w = np.ones(n_bins)
    return build_bands(b1, b2, ct, w, n_bins, num, 3, 10000,
                       dtype=np.float64)


def test_chromosome_shorter_than_search_span():
    """L=40 bins but maxapart/res + maxww + 1 = 216 diagonals: every
    out-of-extent diagonal must behave as the reference's zero padding."""
    cfg = HiccupsConfig(pw=(1,), ww=(3,), maxww=8, maxapart=2_000_000,
                        min_marginal_peaks=2, min_local_reads=16)
    num = cfg.maxapart // 10000 + cfg.maxww + 1
    bands = _bands(40, num)
    table = engine.hiccups_chrom(bands, cfg)      # must not raise
    assert isinstance(table, dict)
    bcfg = BHFDRConfig(pw=1, ww=3, maxww=8, maxapart=2_000_000)
    assert isinstance(engine.bhfdr_chrom(bands, bcfg), dict)


def test_empty_chromosome_yields_empty_table():
    cfg = HiccupsConfig(pw=(1,), ww=(3,), maxww=6, maxapart=400_000,
                        min_marginal_peaks=2, min_local_reads=16)
    num = cfg.maxapart // 10000 + cfg.maxww + 1
    bands = _bands(128, num, pixels=False)
    assert engine.hiccups_chrom(bands, cfg) == {}
    bcfg = BHFDRConfig(pw=1, ww=3, maxww=6, maxapart=400_000)
    assert engine.bhfdr_chrom(bands, bcfg) == {}


def test_all_gap_chromosome():
    """Every bin unweighted (NaN weight): the gap filter covers the whole
    chromosome, so no peak can survive and nothing may crash."""
    cfg = HiccupsConfig(pw=(1,), ww=(3,), maxww=6, maxapart=400_000,
                        min_marginal_peaks=2, min_local_reads=16)
    num = cfg.maxapart // 10000 + cfg.maxww + 1
    rng = np.random.default_rng(3)
    n = 128
    b1 = rng.integers(0, n, 300)
    d = rng.integers(0, min(num, n), 300)
    b2 = np.minimum(b1 + d, n - 1)
    ct = rng.poisson(10.0, 300) + 1
    w = np.full(n, np.nan)
    bands = build_bands(b1, b2, ct, w, n, num, 3, 10000, dtype=np.float64)
    assert engine.hiccups_chrom(bands, cfg) == {}
