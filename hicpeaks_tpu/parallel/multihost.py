"""Multi-host orchestration: chromosome data-parallelism across processes.

The reference fans chromosomes out over a fork pool on one machine
(scripts/pyHICCUPS:192-198).  The multi-host equivalent keeps that
work-unit structure but maps it onto ``jax.distributed`` processes:

* every process initializes the same distributed runtime
  (:func:`hicpeaks_tpu.parallel.launch.maybe_initialize_distributed`);
* chromosomes are partitioned deterministically across processes
  (round-robin over the sorted labels, so every process derives the same
  assignment with no communication);
* each process calls peaks on its local devices — optionally tile-sharded
  over a *local* mesh so halo exchange rides ICI, never DCN (chromosomes
  are independent, so the only cross-host traffic is the final gather);
* the tiny per-chromosome peak tables are exchanged with an
  ``all_gather`` over a length-padded byte encoding, so every process
  returns the identical genome-wide result (the reference's driver-side
  ``Pool.map`` gather, made SPMD).
"""
from __future__ import annotations

import json
import logging

import numpy as np

log = logging.getLogger(__name__)


def assign_chroms(labels, num_processes, process_id):
    """Deterministic round-robin partition of chromosome labels.

    Labels are processed in the caller's order (cooler order, which is
    already the reference's numeric->X,Y,M sort); every process computes
    the same global assignment."""
    return [c for i, c in enumerate(labels)
            if i % num_processes == process_id]


def _encode_tables(tables: dict) -> bytes:
    payload = {
        chrom: {','.join(map(str, k)): list(map(float, v))
                for k, v in table.items()}
        for chrom, table in tables.items()
    }
    return json.dumps(payload).encode()


def _decode_tables(blob: bytes) -> dict:
    payload = json.loads(blob.decode())
    return {chrom: {tuple(int(float(x)) for x in k.split(',')): tuple(v)
                    for k, v in table.items()}
            for chrom, table in payload.items()}


def gather_tables(local_tables: dict, cap_bytes: int = 1 << 24) -> dict:
    """All-gather per-process peak tables to every process.

    Uses one replicated ``psum`` of a fixed-size uint8 buffer per process
    (cheap: peak tables are KBs).  Single-process runs short-circuit."""
    import jax

    nproc = jax.process_count()
    if nproc == 1:
        return dict(local_tables)

    from jax.experimental import multihost_utils

    blob = _encode_tables(local_tables)
    if len(blob) > cap_bytes:
        raise ValueError(f'peak tables exceed gather cap: {len(blob)} bytes')
    buf = np.zeros(cap_bytes + 8, np.uint8)
    buf[:8] = np.frombuffer(np.int64(len(blob)).tobytes(), np.uint8)
    buf[8:8 + len(blob)] = np.frombuffer(blob, np.uint8)

    gathered = multihost_utils.process_allgather(buf)   # [nproc, cap+8]
    merged = {}
    for row in np.asarray(gathered):
        n = int(np.frombuffer(row[:8].tobytes(), np.int64)[0])
        merged.update(_decode_tables(row[8:8 + n].tobytes()))
    return merged


def local_tile_mesh():
    """1-D tile mesh over this process's local devices only, so halo
    ppermute rides ICI within the host/slice."""
    import jax
    from jax.sharding import Mesh

    devs = np.array(jax.local_devices())
    return Mesh(devs, ('tiles',))


def sharded_bands_from_cooler(clr, chrom, maxapart, maxww, ww_min, mesh,
                              dtype=np.float64, weight_name='weight',
                              lane_pad=128, sublane_pad=8):
    """Per-host band ingestion for a tile-sharded chromosome.

    The single-host loader (ops/band.bands_from_cooler) builds the whole
    [num, L] slab on the controller and ships it; on a multi-host mesh
    that makes every host read and hold the full chromosome.  Here each
    process reads ONLY the pixel rows of its own column tiles (the cooler
    ``bin1_offset`` index makes a column span one contiguous HDF5 slice,
    io/coolerlite.pixels_for_bin1_range), scatters its local shards via
    ``jax.make_array_from_callback``, and the O(num+L) per-diagonal /
    per-column partial sums are reduced across processes with one small
    all-gather — so the distance-expected IR, the gap vector and the
    freeze-emulation candidate totals are globally exact while slab IO
    and memory stay per-host.

    Returns a ChromBands whose ``raw`` is the tile-sharded global jax
    Array (engine._prep_chrom consumes it directly); all vector fields
    are host numpy, identical on every process.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..ops.band import ChromBands, _round_up
    from .tiles import HALO_AXIS

    res = clr.binsize
    lo, hi = clr.bin_range(chrom)
    L = hi - lo
    num = maxapart // res + maxww + 1
    Lp = _round_up(max(L, 1), lane_pad)
    num_p = _round_up(max(num, 1), sublane_pad)
    n_tiles = mesh.devices.size
    # tile width a multiple of the canonical 128-column csum block
    # (ops/band.CSUM_BLOCK): span boundaries then never split a block, so
    # per-span blocked partials merge by placement — exactly — and the
    # folded csum/IR is bit-identical to the single-host loaders at any
    # mesh/process count (the float64 host-exact statistics need this)
    from ..ops.band import CSUM_BLOCK, blocked_csum, fold_blocked_csum
    Lpm = _round_up(Lp, n_tiles * CSUM_BLOCK)

    w = np.asarray(clr.weights(chrom, weight_name), np.float64)

    sharding = NamedSharding(mesh, P(None, HALO_AXIS))
    idx_map = sharding.addressable_devices_indices_map((num_p, Lpm))
    spans = sorted({(s[1].start or 0, s[1].stop if s[1].stop is not None
                     else Lpm) for s in idx_map.values()})

    # one read per OWNED span (a process's tiles need not be contiguous in
    # mesh order — reading the min..max union would pull other processes'
    # columns into this process's partial sums and double-count them after
    # the allgather)
    locals_ = {}
    b1_parts, dd_parts, ct_parts = [], [], []
    for c0, c1 in spans:
        b1s, b2s, cts = clr.pixels_for_bin1_range(chrom, c0, min(c1, L))
        ds = (b2s - b1s).astype(np.int64)
        sel = (ds >= 0) & (ds < num) & (b2s < L)
        b1s, ds, cts = b1s[sel], ds[sel], cts[sel].astype(np.float64)
        slab = np.zeros((num_p, c1 - c0), dtype)
        slab[ds, b1s - c0] = cts
        locals_[(c0, c1)] = slab
        b1_parts.append(b1s)
        dd_parts.append(ds)
        ct_parts.append(cts)
    b1 = np.concatenate(b1_parts) if b1_parts else np.zeros(0, np.int64)
    dd = np.concatenate(dd_parts) if dd_parts else np.zeros(0, np.int64)
    ct = np.concatenate(ct_parts) if ct_parts else np.zeros(0, np.float64)

    def cb(index):
        cols = index[1]
        c0 = cols.start or 0
        c1 = cols.stop if cols.stop is not None else Lpm
        return locals_[(c0, c1)]

    raw = jax.make_array_from_callback((num_p, Lpm), sharding, cb)

    # O(num + L) partials -> exact global reductions (one allgather).
    # Every partial merges EXACTLY: csum as per-128-column-block partials
    # (each block owned by one process — placement, then the canonical
    # left fold), colsum per column (single owner), nan/cand as integers.
    wprod = w[b1] * w[b1 + dd]
    nanmask = np.isnan(wprod)
    cvals = np.where(nanmask, 0.0, ct * wprod)
    csum_blk = blocked_csum(dd, b1, cvals, num_p, Lpm)
    nan_counts = np.bincount(dd[nanmask], minlength=num_p)[:num_p]
    in_rows = dd >= ww_min
    colsum = np.bincount(b1[in_rows], weights=cvals[in_rows],
                         minlength=Lpm)[:Lpm]
    cand = np.bincount(dd[ct != 0], minlength=num_p)[:num_p]

    max_count = float(ct.max()) if ct.size else 0.0
    if jax.process_count() > 1:
        nb = csum_blk.shape[1]
        packed = np.concatenate([csum_blk.ravel(),
                                 nan_counts.astype(np.float64),
                                 colsum, cand.astype(np.float64),
                                 [max_count]])
        rows = np.asarray(multihost_utils.process_allgather(packed))
        total = rows.sum(axis=0)
        csum_blk = total[:num_p * nb].reshape(num_p, nb)
        nan_counts = total[num_p * nb:num_p * nb + num_p]
        colsum = total[num_p * nb + num_p:num_p * nb + num_p + Lpm]
        cand = total[num_p * nb + num_p + Lpm:-1]
        max_count = float(rows[:, -1].max())
    csum = fold_blocked_csum(csum_blk)

    diag_len = np.maximum(L - np.arange(num_p), 0)
    denom = diag_len - nan_counts
    with np.errstate(invalid='ignore', divide='ignore'):
        IR = csum / denom
    IR[:ww_min] = 0.0
    IR[num:] = 0.0
    gap = colsum == 0

    valid = ~((w == 0) | np.isnan(w))
    bias = np.zeros(Lpm, np.float64)
    bias[:L][valid] = 1.0 / w[valid]
    w0 = np.zeros(Lpm, np.float64)
    w0[:L][valid] = w[valid]
    nanw = np.zeros(Lpm, bool)
    nanw[:L] = np.isnan(w)

    bands = ChromBands(raw=raw, IR=IR.astype(dtype), bias=bias.astype(dtype),
                       w0=w0.astype(dtype), gap=gap, L=L, num=num, res=res,
                       chrom=chrom.lstrip('chr'), ww_min=ww_min,
                       sparse=(dd, b1, cvals, ct), nanw=nanw,
                       cand_hist=cand.astype(np.int64),
                       IR64=IR, bias64=bias, w064=w0)
    bands.max_count = max_count   # global, so the engine's o_cap/bh plan
                                  # never touches the sharded slab
    bands.raw_spans = locals_     # this process's column spans, kept for
                                  # the float64 host-exact statistics
                                  # (ops/hostexact: per-host window cells
                                  # + exact integer cross-process sum)
    return bands
