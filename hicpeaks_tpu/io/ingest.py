"""TXT/NPZ ingestion into cooler files.

Host-side equivalent of the reference's ``Genome`` class
(utilities.py:130-364): scans per-resolution TXT folders
(``{c1}_{c2}.txt``) or NPZ archives, enforces upper-triangle storage with
the reference's exact symmetrization (mirror lower triangle, keep upper),
offsets bins to genome-wide ids via cumulative bin counts, and writes one
cooler group per resolution (``outfil::res``).  TXT parsing uses the
native mmap parser (io/fastload) instead of np.loadtxt — the reference's
dominant toCooler cost (README.rst:287-291).

Deviation from the reference: trans-inclusive ingestion sorts chunks
in memory instead of the temp-cooler external merge
(``create_from_unordered``, utilities.py:51-127); the resulting file is
identical.
"""
from __future__ import annotations

import glob
import logging
import os

import numpy as np
from scipy import sparse

from .chromsizes import (read_chromsizes, fetch_chromsizes, sort_chromlabels,
                         _label_selected)
from .coolerlite import binnify, create_cooler_file
from .fastload import load_txt

log = logging.getLogger(__name__)


def scan_txt_folder(folder, chroms):
    """{(c1, c2): path} for ``*_*.txt`` files with selected labels
    (utilities.py:327-351)."""
    mapping = {}
    for path in glob.glob(os.path.join(folder, '*_*.txt')):
        name = os.path.split(path)[1]
        parts = name.rstrip('.txt').split('_')
        if len(parts) != 2:
            continue
        c1, c2 = parts
        if _label_selected(c1, chroms) and _label_selected(c2, chroms):
            mapping[(c1, c2)] = path
    return mapping


def scan_npz(path, chroms):
    """{(c1, c2): key} plus the archive handle (utilities.py:209-226)."""
    lib = np.load(path)
    mapping = {}
    for key in lib.files:
        if '_' not in key:
            if _label_selected(key, chroms):
                mapping[(key, key)] = key
            continue
        parts = key.split('_')
        if len(parts) != 2:
            continue
        c1, c2 = parts
        if _label_selected(c1, chroms) and _label_selected(c2, chroms):
            mapping[(c1, c2)] = key
    return lib, mapping


def _symmetrize_upper(x, y, vals, n):
    """The reference's intra-pair normalization (utilities.py:306-312):
    sum duplicates, mirror each stored (x, y) onto (y, x), keep the upper
    triangle."""
    M = sparse.csr_matrix((vals, (x, y)), shape=(n, n))
    M = sparse.lil_matrix(M)
    M[y, x] = M[x, y]
    M = sparse.triu(M).tocoo()
    return M.row, M.col, M.data


def ingest(datasets, outfil, chromsizes_file, chroms=('#', 'X'),
           only_intra=True, assembly='hg38', dtype='int'):
    """Build ``outfil`` with one cooler group per resolution.

    ``datasets``: {resolution: folder-or-npz-path}, the toCooler metadata
    format (scripts/toCooler:12-25).
    """
    chroms = set(chroms) if chroms else set()
    outfil = os.path.abspath(os.path.expanduser(outfil))
    if os.path.exists(outfil):
        raise FileExistsError(f'Cooler file {outfil} already exists')

    # --chromsizes-file wins when given; otherwise fetch from UCSC by
    # assembly name, matching the reference's precedence
    # (utilities.py:186-193).
    if chromsizes_file:
        log.info('Read chromosome sizes from %s', chromsizes_file)
        sizes = read_chromsizes(chromsizes_file, chroms)
    else:
        log.info('Fetch chromosome sizes from UCSC ...')
        sizes = fetch_chromsizes(assembly, chroms)
    order = sort_chromlabels(sizes.keys())
    count_dtype = np.int32 if dtype == 'int' else np.float64

    for res, source in datasets.items():
        if str(source).endswith('.npz'):
            lib, mapping = scan_npz(source, chroms)
            reader = lambda key: (lib[key]['bin1'], lib[key]['bin2'],
                                  lib[key]['IF'])
        else:
            mapping = scan_txt_folder(source, chroms)
            reader = load_txt

        present = {c for pair in mapping for c in pair}
        chromlist = [c for c in order if c in present]
        chromsizes = {c: sizes[c] for c in chromlist}
        n_bins = {c: int(np.ceil(sizes[c] / res)) for c in chromlist}
        offsets = {}
        acc = 0
        for c in chromlist:
            offsets[c] = acc
            acc += n_bins[c]

        chunks = []
        for i, c1 in enumerate(chromlist):
            for c2 in chromlist[i:]:
                if only_intra and c1 != c2:
                    continue
                if (c1, c2) in mapping:
                    key, swap = (c1, c2), False
                elif (c2, c1) in mapping:
                    key, swap = (c2, c1), True
                else:
                    continue
                x, y, vals = reader(mapping[key])
                x = np.asarray(x, np.int64)
                y = np.asarray(y, np.int64)
                vals = np.asarray(vals, np.float64)
                if swap:
                    x, y = y, x
                if c1 == c2:
                    n = int(max(x.max(), y.max())) + 1 if x.size else 0
                    x, y, vals = _symmetrize_upper(x, y, vals, n)
                elif x.size:
                    # trans pairs go through the same sparse round-trip the
                    # reference applies (utilities.py:313-321): duplicates
                    # summed, stored zeros dropped, rows sorted
                    n1 = n_bins[c1]
                    n2 = n_bins[c2]
                    T = sparse.coo_matrix((vals, (x, y)),
                                          shape=(n1, n2)).tocsr()
                    T.eliminate_zeros()
                    T = T.tocoo()
                    x, y, vals = T.row, T.col, T.data
                chunks.append({
                    'bin1_id': x + offsets[c1],
                    'bin2_id': y + offsets[c2],
                    'count': vals.astype(count_dtype),
                })

        # global (bin1, bin2) order; intra-only chunks are already sorted
        # per chromosome, so this is a cheap merge
        b1 = np.concatenate([c['bin1_id'] for c in chunks]) if chunks else \
            np.zeros(0, np.int64)
        b2 = np.concatenate([c['bin2_id'] for c in chunks]) if chunks else \
            np.zeros(0, np.int64)
        ct = np.concatenate([c['count'] for c in chunks]) if chunks else \
            np.zeros(0, count_dtype)
        order_idx = np.lexsort((b2, b1))
        bins = binnify(chromsizes, res)
        uri = f'{outfil}::{res}'
        log.info('Writing %s (%d pixels)', uri, b1.size)
        create_cooler_file(uri, bins,
                           [{'bin1_id': b1[order_idx], 'bin2_id': b2[order_idx],
                             'count': ct[order_idx]}],
                           assembly=assembly,
                           metadata={'onlyIntra': str(bool(only_intra))},
                           count_dtype=count_dtype)
    return outfil


def parse_datasets_metadata(metadata_path):
    """The toCooler ``-d`` metadata format: ``res:<int>`` lines followed by
    data paths (scripts/toCooler:12-25)."""
    datasets = {}
    res = None
    with open(metadata_path) as source:
        for line in source:
            if line.startswith('res'):
                res = int(line.rstrip().split(':')[1])
            elif not line.isspace() and line.strip():
                datasets[res] = os.path.abspath(os.path.expanduser(line.strip()))
    return datasets
