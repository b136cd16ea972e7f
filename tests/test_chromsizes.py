"""Chromsize acquisition: file reader and the UCSC HTTP fetch fallback
(reference utilities.py:20-49; precedence utilities.py:186-193)."""
import io

import pytest

from hicpeaks_tpu.io.chromsizes import (read_chromsizes, fetch_chromsizes,
                                        UCSC_CHROMSIZES_URL)


class _FakeResponse(io.BytesIO):
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def test_fetch_chromsizes_parses_and_selects():
    body = (b"chr1\t248956422\nchr2\t242193529\nchrX\t156040895\n"
            b"chrY\t57227415\nchrM\t16569\nchr1_KI270706v1_random\t175055\n")
    seen = {}

    def fake_urlopen(url, timeout=None):
        seen['url'] = url
        return _FakeResponse(body)

    sizes = fetch_chromsizes('hg38', chroms=('#', 'X'), _urlopen=fake_urlopen)
    assert seen['url'] == UCSC_CHROMSIZES_URL.format(assembly='hg38')
    # '#' selects numerics, X selected, Y/M/random scaffolds dropped;
    # note lstrip('chr') is the reference's char-set strip quirk
    assert sizes == {'1': 248956422, '2': 242193529, 'X': 156040895}

    # empty selection means everything
    all_sizes = fetch_chromsizes('hg38', chroms=(), _urlopen=fake_urlopen)
    assert '1_KI270706v1_random' in all_sizes and 'M' in all_sizes


def test_fetch_chromsizes_offline_error():
    def dead_urlopen(url, timeout=None):
        raise OSError('Name or service not known')

    with pytest.raises(ConnectionError, match='--chromsizes-file'):
        fetch_chromsizes('hg38', _urlopen=dead_urlopen)


def test_ingest_assembly_only(tmp_path, monkeypatch):
    """toCooler works with --assembly alone (no --chromsizes-file), the
    reference's default invocation (utilities.py:191-193)."""
    import numpy as np
    from hicpeaks_tpu.io import ingest as ingest_mod
    from hicpeaks_tpu.io.coolerlite import CoolerLite
    from hicpeaks_tpu.io.synth import synthesize_chrom, write_txt

    res, n_bins = 50000, 40
    folder = tmp_path / '50K'
    folder.mkdir()
    b1, b2, ct, _, _ = synthesize_chrom(n_bins=n_bins, res=res, seed=3,
                                        n_loops=2, depth=30.0)
    write_txt(str(folder / '1_1.txt'), b1, b2, ct)

    monkeypatch.setattr(
        ingest_mod, 'fetch_chromsizes',
        lambda assembly, chroms: {'1': n_bins * res})
    out = ingest_mod.ingest({res: str(folder)}, str(tmp_path / 'a.cool'),
                            chromsizes_file=None, assembly='hg38')
    clr = CoolerLite(f'{out}::{res}')
    assert clr.chromnames == ['1']
    assert clr.chromsizes['1'] == n_bins * res
    assert np.asarray(clr.pixels_for_chrom('1')[2]).sum() > 0


def test_read_chromsizes_still_reads_files(tmp_path):
    f = tmp_path / 'sizes'
    f.write_text('chr21\t46709983\nchrX 156040895\n')
    sizes = read_chromsizes(str(f), ('#', 'X'))
    assert sizes == {'21': 46709983, 'X': 156040895}
