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
