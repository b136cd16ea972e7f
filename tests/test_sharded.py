"""Multi-device parity: the halo-exchange sharded scan on the 8 virtual CPU
devices must reproduce the single-device engine's peak tables exactly."""
import jax
import numpy as np
import pytest

from hicpeaks_tpu.io.synth import synthetic_cooler
from hicpeaks_tpu.io.coolerlite import CoolerLite
from hicpeaks_tpu.core.config import BHFDRConfig, HiccupsConfig
from hicpeaks_tpu.core import engine
from hicpeaks_tpu.ops.band import bands_from_cooler
from hicpeaks_tpu.parallel.mesh import make_tile_mesh


@pytest.fixture(scope='module')
def synth(tmp_path_factory):
    path = tmp_path_factory.mktemp('data') / 'shard.cool'
    uri, loops = synthetic_cooler(str(path), n_bins=384, res=25000, seed=7,
                                  n_loops=25, depth=60.0)
    return CoolerLite(uri), loops


def test_eight_virtual_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_bhfdr_matches_single_device(synth):
    clr, _ = synth
    cfg = BHFDRConfig(pw=1, ww=3, maxww=8, maxapart=2000000)
    bands = bands_from_cooler(clr, '21', cfg.maxapart, cfg.maxww, cfg.ww,
                              dtype=np.float64)
    single = engine.bhfdr_chrom(bands, cfg)
    mesh = make_tile_mesh(8)
    sharded = engine.bhfdr_chrom(bands, cfg, mesh=mesh)
    assert single == sharded


def test_sharded_hiccups_matches_single_device(synth):
    clr, _ = synth
    cfg = HiccupsConfig(pw=(1, 2), ww=(3, 5), maxww=8, maxapart=2000000,
                        min_marginal_peaks=2, min_local_reads=16)
    bands = bands_from_cooler(clr, '21', cfg.maxapart, cfg.maxww, 3,
                              dtype=np.float64)
    single = engine.hiccups_chrom(bands, cfg)
    mesh = make_tile_mesh(8)
    sharded = engine.hiccups_chrom(bands, cfg, mesh=mesh)
    assert set(single) == set(sharded)
    for k in single:
        np.testing.assert_allclose(np.asarray(single[k], float),
                                   np.asarray(sharded[k], float), rtol=1e-12)
