"""The engine with the Pallas capture backend (interpret mode) must produce
the identical peak table to the jnp backend."""
import numpy as np

from hicpeaks_tpu.io.synth import synthetic_cooler
from hicpeaks_tpu.io.coolerlite import CoolerLite
from hicpeaks_tpu.core.config import HiccupsConfig
from hicpeaks_tpu.core import engine
from hicpeaks_tpu.ops.band import bands_from_cooler


def test_pallas_backend_matches_jnp(tmp_path):
    uri, _ = synthetic_cooler(str(tmp_path / 'pb.cool'), n_bins=256,
                              res=25000, seed=13, n_loops=15, depth=60.0)
    clr = CoolerLite(uri)
    cfg = HiccupsConfig(pw=(1,), ww=(3,), maxww=6, maxapart=1500000,
                        min_marginal_peaks=2, min_local_reads=16)
    bands = bands_from_cooler(clr, '21', cfg.maxapart, cfg.maxww, 3,
                              dtype=np.float32)
    a = engine.hiccups_chrom(bands, cfg, scan_backend='jnp')
    b = engine.hiccups_chrom(bands, cfg, scan_backend='pallas-interpret')
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k], float),
                                   np.asarray(b[k], float), rtol=1e-5)
