"""NPZ ingestion path (the runHiC/TADLib-compatible archives the reference
accepts, utilities.py:209-226)."""
import numpy as np

from hicpeaks_tpu.io.ingest import ingest
from hicpeaks_tpu.io.coolerlite import CoolerLite
from hicpeaks_tpu.io.synth import synthesize_chrom


def test_npz_ingestion(tmp_path):
    res = 40000
    b1, b2, ct, _, _ = synthesize_chrom(n_bins=50, res=res, seed=2,
                                        n_loops=3, depth=30.0)
    intertype = np.dtype({'names': ['bin1', 'bin2', 'IF'],
                          'formats': [np.int32, np.int32, np.float64]})
    arr = np.zeros(b1.size, dtype=intertype)
    arr['bin1'], arr['bin2'], arr['IF'] = b1, b2, ct
    np.savez(tmp_path / 'data.npz', **{'21_21': arr})

    with open(tmp_path / 'sizes', 'w') as f:
        f.write(f'chr21\t{50 * res}\n')

    out = tmp_path / 'npz.cool'
    ingest({res: str(tmp_path / 'data.npz')}, str(out),
           chromsizes_file=str(tmp_path / 'sizes'))
    clr = CoolerLite(f'{out}::{res}')
    assert clr.chromnames == ['21']
    M = clr.fetch_sparse('21')
    assert M.shape == (50, 50)
    assert float(M.sum()) > 0
