"""Trans-inclusive ingestion: multi-chromosome TXT folders with cis and
trans files must produce a correctly ordered, offset, symmetrized cooler
(the reference's create_from_unordered path, utilities.py:51-127, realized
via an in-memory global sort)."""
import numpy as np

from hicpeaks_tpu.io.ingest import ingest
from hicpeaks_tpu.io.coolerlite import CoolerLite
from hicpeaks_tpu.io.synth import synthesize_chrom, write_txt


def test_trans_inclusive_ingestion(tmp_path):
    res = 50000
    folder = tmp_path / '50K'
    folder.mkdir()
    rng = np.random.default_rng(0)

    sizes = {'1': 40 * res, '2': 30 * res}
    for c, nb in (('1', 40), ('2', 30)):
        b1, b2, ct, _, _ = synthesize_chrom(n_bins=nb, res=res, seed=int(c),
                                            n_loops=2, depth=30.0)
        write_txt(str(folder / f'{c}_{c}.txt'), b1, b2, ct)
    # trans pairs, deliberately written with swapped chromosome order
    tb1 = rng.integers(0, 30, 50)
    tb2 = rng.integers(0, 40, 50)
    tc = rng.poisson(3.0, 50) + 1
    write_txt(str(folder / '2_1.txt'), tb1, tb2, tc)

    with open(tmp_path / 'sizes', 'w') as f:
        f.write(f"chr1\t{sizes['1']}\nchr2\t{sizes['2']}\n")

    out = tmp_path / 'trans.cool'
    ingest({res: str(folder)}, str(out), chromsizes_file=str(tmp_path / 'sizes'),
           only_intra=False)
    clr = CoolerLite(f'{out}::{res}')
    assert clr.chromnames == ['1', '2']
    assert clr.info['metadata']['onlyIntra'] == 'False'

    with __import__('h5py').File(clr.path) as h5:
        grp = h5[clr.group]
        b1 = grp['pixels/bin1_id'][:]
        b2 = grp['pixels/bin2_id'][:]
        assert (b1 <= b2).all()                       # upper triangle
        assert (np.diff(b1) >= 0).all()               # globally sorted
        # the swapped trans file landed as (chr1_bin, chr2_bin + offset)
        trans = (b1 < 40) & (b2 >= 40)
        assert trans.sum() > 0

    # intra fetch still works per chromosome
    M1 = clr.fetch_sparse('1')
    M2 = clr.fetch_sparse('2')
    assert M1.shape == (40, 40) and M2.shape == (30, 30)
    assert M1.nnz > 0 and M2.nnz > 0
