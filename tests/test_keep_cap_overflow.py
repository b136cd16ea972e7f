"""The two-tier keep-cap machinery: fast-tier overflow must retry at the
hard cap, and hard-cap overflow must fall back to the dense host path —
all yielding tables identical to the unconstrained run."""
import numpy as np
import pytest

from hicpeaks_tpu.core import engine
from hicpeaks_tpu.core.config import BHFDRConfig, HiccupsConfig
from hicpeaks_tpu.io.coolerlite import CoolerLite
from hicpeaks_tpu.io.synth import synthetic_cooler
from hicpeaks_tpu.ops.band import bands_from_cooler


@pytest.fixture(scope='module')
def dense_peaks(tmp_path_factory):
    """A loop-rich cooler whose kept-pixel count comfortably exceeds a
    tiny fast cap."""
    path = tmp_path_factory.mktemp('cap') / 'cap.cool'
    uri, _ = synthetic_cooler(str(path), n_bins=300, res=25000, seed=3,
                              n_loops=40, depth=80.0, loop_strength=8.0)
    return CoolerLite(uri)


def _tables_equal(a, b):
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k], float),
                                   np.asarray(b[k], float), rtol=1e-12)


def test_fast_cap_overflow_retries_hard_cap(dense_peaks, monkeypatch):
    cfg = HiccupsConfig(pw=(1, 2), ww=(3, 5), maxww=8, maxapart=2_000_000,
                        min_marginal_peaks=2, min_local_reads=16)
    bands = bands_from_cooler(dense_peaks, '21', cfg.maxapart, cfg.maxww, 3,
                              dtype=np.float64)
    want = engine.hiccups_chrom(bands, cfg)
    assert len(want) > 0
    bcfg = BHFDRConfig(pw=1, ww=3, maxww=8, maxapart=2_000_000)
    want_b = engine.bhfdr_chrom(bands, bcfg)

    monkeypatch.setattr(engine, '_KEEP_CAP_FAST', 4)
    got = engine.hiccups_chrom(bands, cfg)
    _tables_equal(got, want)
    got_b = engine.bhfdr_chrom(bands, bcfg)
    _tables_equal(got_b, want_b)


def test_hard_cap_overflow_falls_back_dense(dense_peaks, monkeypatch):
    """Both tiers overflowing routes to the dense host-BH fallback; the
    emitted table must still match."""
    cfg = HiccupsConfig(pw=(1,), ww=(3,), maxww=8, maxapart=2_000_000,
                        min_marginal_peaks=2, min_local_reads=16)
    bands = bands_from_cooler(dense_peaks, '21', cfg.maxapart, cfg.maxww, 3,
                              dtype=np.float64)
    want = engine.hiccups_chrom(bands, cfg)
    monkeypatch.setattr(engine, '_KEEP_CAP_FAST', 2)
    monkeypatch.setattr(engine, '_KEEP_CAP', 4)
    got = engine.hiccups_chrom(bands, cfg)
    _tables_equal(got, want)
