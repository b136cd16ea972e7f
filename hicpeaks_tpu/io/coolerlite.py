"""Minimal, dependency-light implementation of the Cooler HDF5 schema.

The reference package leans on the ``cooler`` library for all matrix storage
(reference: hicpeaks/utilities.py:12-15, 256-265).  That library is not a
dependency here; instead this module reads and writes the same on-disk
HDF5 layout (format ``HDF5::Cooler`` v3, storage-mode ``symmetric-upper``)
so files interoperate with the wider cooler ecosystem:

    /chroms/{name,length}
    /bins/{chrom,start,end[,weight]}
    /pixels/{bin1_id,bin2_id,count}
    /indexes/{chrom_offset,bin1_offset}

URIs follow the ``path::group`` convention used by the reference
(``outfil::res`` at utilities.py:256).
"""
from __future__ import annotations

import json
import os
import datetime

import h5py
import numpy as np
from scipy import sparse

H5OPTS = dict(compression='gzip', compression_opts=6, shuffle=True)
CHUNK = 1 << 20


def parse_cooler_uri(uri: str):
    parts = uri.split('::')
    if len(parts) == 1:
        return parts[0], '/'
    path, group = parts[0], '::'.join(parts[1:])
    if not group.startswith('/'):
        group = '/' + group
    return path, group


def binnify(chromsizes, res: int):
    """Fixed-width bin table: list of (chrom_label, start, end) triples per
    chromosome in ``chromsizes`` order (a dict-like of label -> length)."""
    chroms, starts, ends = [], [], []
    for c, clen in chromsizes.items():
        n = int(np.ceil(clen / res))
        s = np.arange(n, dtype=np.int64) * res
        e = np.minimum(s + res, clen)
        chroms.extend([c] * n)
        starts.append(s)
        ends.append(e)
    return {
        'chrom': np.asarray(chroms, dtype=object),
        'start': np.concatenate(starts) if starts else np.array([], np.int64),
        'end': np.concatenate(ends) if ends else np.array([], np.int64),
    }


def create_cooler_file(uri, bins, pixel_chunks, assembly=None, metadata=None,
                       count_dtype=np.int32, mode='a'):
    """Write a cooler group from a bin table and an iterable of pixel chunks.

    ``pixel_chunks`` yields dicts with ``bin1_id``/``bin2_id``/``count``
    arrays that are globally sorted by (bin1_id, bin2_id), exactly what the
    intra-chromosomal ingestion generator produces (cf. utilities.py:268-325).
    """
    path, group = parse_cooler_uri(uri)
    chrom_labels = list(dict.fromkeys(bins['chrom'].tolist()))
    chrom_id = {c: i for i, c in enumerate(chrom_labels)}
    bins_chrom = np.asarray([chrom_id[c] for c in bins['chrom']], dtype=np.int32)
    nbins = len(bins_chrom)
    lengths = np.asarray(
        [int(bins['end'][bins_chrom == i].max()) for i in range(len(chrom_labels))],
        dtype=np.int32)
    binsize = int(bins['end'][0] - bins['start'][0]) if nbins else 0

    filemode = mode if os.path.exists(path) else 'w'
    with h5py.File(path, filemode) as h5:
        if group != '/' and group.lstrip('/') in h5:
            del h5[group.lstrip('/')]
        grp = h5 if group == '/' else h5.create_group(group.lstrip('/'))

        cg = grp.create_group('chroms')
        name_dt = h5py.string_dtype(encoding='utf-8')
        cg.create_dataset('name', data=np.array(chrom_labels, dtype=object),
                          dtype=name_dt, **H5OPTS)
        cg.create_dataset('length', data=lengths, dtype=np.int32, **H5OPTS)

        bg = grp.create_group('bins')
        enum_dt = h5py.enum_dtype(chrom_id, basetype=np.int32)
        bg.create_dataset('chrom', data=bins_chrom, dtype=enum_dt, **H5OPTS)
        bg.create_dataset('start', data=np.asarray(bins['start'], np.int32), **H5OPTS)
        bg.create_dataset('end', data=np.asarray(bins['end'], np.int32), **H5OPTS)

        pg = grp.create_group('pixels')
        d1 = pg.create_dataset('bin1_id', shape=(0,), maxshape=(None,),
                               dtype=np.int64, chunks=(CHUNK,), **H5OPTS)
        d2 = pg.create_dataset('bin2_id', shape=(0,), maxshape=(None,),
                               dtype=np.int64, chunks=(CHUNK,), **H5OPTS)
        dc = pg.create_dataset('count', shape=(0,), maxshape=(None,),
                               dtype=count_dtype, chunks=(CHUNK,), **H5OPTS)
        nnz = 0
        total = 0
        for chunk in pixel_chunks:
            b1 = np.asarray(chunk['bin1_id'], np.int64)
            b2 = np.asarray(chunk['bin2_id'], np.int64)
            ct = np.asarray(chunk['count'])
            n = b1.size
            for d, a in ((d1, b1), (d2, b2), (dc, ct)):
                d.resize((nnz + n,))
                d[nnz:nnz + n] = a
            nnz += n
            total += float(ct.sum())

        ig = grp.create_group('indexes')
        chrom_offset = np.zeros(len(chrom_labels) + 1, dtype=np.int64)
        np.cumsum(np.bincount(bins_chrom, minlength=len(chrom_labels)),
                  out=chrom_offset[1:])
        ig.create_dataset('chrom_offset', data=chrom_offset, **H5OPTS)
        bin1 = d1[:]
        bin1_offset = np.searchsorted(bin1, np.arange(nbins + 1), side='left')
        ig.create_dataset('bin1_offset', data=bin1_offset.astype(np.int64), **H5OPTS)

        grp.attrs.update({
            'format': 'HDF5::Cooler',
            'format-version': 3,
            'format-url': 'https://github.com/open2c/cooler',
            'bin-type': 'fixed',
            'bin-size': binsize,
            'storage-mode': 'symmetric-upper',
            'nchroms': len(chrom_labels),
            'nbins': nbins,
            'nnz': nnz,
            'sum': total,
            'generated-by': 'hicpeaks-tpu',
            'creation-date': datetime.datetime.now().isoformat(),
        })
        if assembly:
            grp.attrs['genome-assembly'] = assembly
        grp.attrs['metadata'] = json.dumps(metadata or {})


class CoolerLite:
    """Read-side API over a cooler group, shaped after the small subset of
    ``cooler.Cooler`` the reference scripts use (matrix fetch per chromosome,
    bins fetch, binsize/chromnames: scripts/pyHICCUPS:142-163)."""

    def __init__(self, uri: str):
        self.uri = uri
        self.path, self.group = parse_cooler_uri(uri)
        with h5py.File(self.path, 'r') as h5:
            grp = h5[self.group]
            self.binsize = int(grp.attrs['bin-size'])
            self._chromnames = [c if isinstance(c, str) else c.decode()
                                for c in grp['chroms/name'][:]]
            self._chromlengths = grp['chroms/length'][:]
            self._chrom_offset = grp['indexes/chrom_offset'][:]
            self.nbins = int(grp.attrs['nbins'])
            self.info = dict(grp.attrs)
            if 'metadata' in self.info:
                try:
                    self.info['metadata'] = json.loads(self.info['metadata'])
                except Exception:
                    pass

    @property
    def chromnames(self):
        return list(self._chromnames)

    @property
    def chromsizes(self):
        return dict(zip(self._chromnames, (int(x) for x in self._chromlengths)))

    def _chrom_index(self, chrom):
        if chrom in self._chromnames:
            return self._chromnames.index(chrom)
        alt = chrom.lstrip('chr') if chrom.startswith('chr') else 'chr' + chrom
        return self._chromnames.index(alt)

    def bin_range(self, chrom):
        ci = self._chrom_index(chrom)
        return int(self._chrom_offset[ci]), int(self._chrom_offset[ci + 1])

    def weights(self, chrom=None, name='weight'):
        with h5py.File(self.path, 'r') as h5:
            grp = h5[self.group]
            if name not in grp['bins']:
                raise KeyError(f'no {name!r} column in bins; balance first')
            w = grp['bins'][name][:]
        if chrom is None:
            return w
        lo, hi = self.bin_range(chrom)
        return w[lo:hi]

    def pixels(self):
        """All stored pixels genome-wide as (bin1_id, bin2_id, count) —
        intra and inter chromosomal, upper-triangle convention.  Feeds the
        trans-inclusive balancing path (utilities.py:398-417)."""
        with h5py.File(self.path, 'r') as h5:
            grp = h5[self.group]
            return (grp['pixels/bin1_id'][:], grp['pixels/bin2_id'][:],
                    grp['pixels/count'][:])

    def pixels_for_chrom(self, chrom):
        """(bin1, bin2, count) local to the chromosome (intra only).

        Sequential single-handle reads: h5py serializes every HDF5 call
        (including the gzip inflate inside H5Dread) under its global lock,
        so per-column reader threads only add overhead (round-2 advisor
        finding: the threaded form measured ~15% slower)."""
        lo, hi = self.bin_range(chrom)
        with h5py.File(self.path, 'r') as h5:
            grp = h5[self.group]
            b1o = grp['indexes/bin1_offset']
            plo, phi = int(b1o[lo]), int(b1o[hi])
            b1 = grp['pixels/bin1_id'][plo:phi]
            b2 = grp['pixels/bin2_id'][plo:phi]
            ct = grp['pixels/count'][plo:phi]
        mask = (b2 >= lo) & (b2 < hi)
        return (b1[mask] - lo), (b2[mask] - lo), ct[mask]

    def pixels_for_bin1_range(self, chrom, c0, c1):
        """(bin1, bin2, count) with chromosome-local bin1 in [c0, c1) —
        the ``indexes/bin1_offset`` table makes this a contiguous HDF5 row
        slice, so a tile-sharded multi-host run reads ONLY its own column
        span (per-host ingestion; intra-chromosomal pixels only)."""
        lo, hi = self.bin_range(chrom)
        r0 = lo + max(0, min(c0, hi - lo))
        r1 = lo + max(0, min(c1, hi - lo))
        with h5py.File(self.path, 'r') as h5:
            grp = h5[self.group]
            b1o = grp['indexes/bin1_offset']
            plo, phi = int(b1o[r0]), int(b1o[r1])
            b1 = grp['pixels/bin1_id'][plo:phi]
            b2 = grp['pixels/bin2_id'][plo:phi]
            ct = grp['pixels/count'][plo:phi]
        mask = (b2 >= lo) & (b2 < hi)
        return (b1[mask] - lo), (b2[mask] - lo), ct[mask]

    def fetch_sparse(self, chrom, balance=False, weight_name='weight'):
        """Symmetric scipy CSR of one chromosome; ``balance`` applies
        ``w[x]*w[y]`` with NaN weights propagating to NaN values, matching
        ``cooler.Cooler.matrix(balance=...)`` semantics."""
        if isinstance(balance, str):
            weight_name, balance = balance, True
        b1, b2, ct = self.pixels_for_chrom(chrom)
        lo, hi = self.bin_range(chrom)
        n = hi - lo
        data = ct.astype(np.float64)
        if balance:
            w = self.weights(chrom, weight_name)
            data = data * w[b1] * w[b2]
        off = b1 != b2
        rows = np.concatenate([b1, b2[off]])
        cols = np.concatenate([b2, b1[off]])
        vals = np.concatenate([data, data[off]])
        return sparse.csr_matrix((vals, (rows, cols)), shape=(n, n))

    def fetch_dense_region(self, chrom, start, end, balance='weight'):
        """Dense symmetric submatrix of [start, end) in bp (row-aligned to
        bins), used by the plotting CLIs (scripts/peak-plot:99-103)."""
        res = self.binsize
        s0, e0 = start // res, int(np.ceil(end / res))
        M = self.fetch_sparse(chrom, balance=balance)
        sub = M[s0:e0, s0:e0].toarray()
        return sub

    def write_weights(self, weights, stats=None, name='weight'):
        """Persist the balancing vector, mirroring utilities.py:426-431
        (delete + rewrite of the bins/weight column, stats as attrs)."""
        with h5py.File(self.path, 'r+') as h5:
            grp = h5[self.group]
            if name in grp['bins']:
                del grp['bins'][name]
            ds = grp['bins'].create_dataset(name, data=np.asarray(weights, np.float64),
                                            **H5OPTS)
            if stats:
                ds.attrs.update(stats)
