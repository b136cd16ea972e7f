"""Multi-host launch support.

A multi-host run (BASELINE config 4: genome-wide calling sharded across
hosts) uses the standard ``jax.distributed`` runtime: every host runs the
same CLI with coordinator environment variables set, the global mesh spans
all hosts' devices, band tiles land on local devices, halos cross host
boundaries over DCN via the same ``ppermute`` ring, and ``psum``'d freeze
counts are globally consistent so every host's controller replays the same
early-stop decisions.

Environment (either the standard JAX_COORDINATOR vars or explicit):
  HICPEAKS_COORDINATOR  host:port of process 0
  HICPEAKS_NUM_PROCESSES
  HICPEAKS_PROCESS_ID
"""
from __future__ import annotations

import logging
import os

log = logging.getLogger(__name__)


def maybe_initialize_distributed():
    """Initialize jax.distributed when multi-host env vars are present.
    Returns True if a multi-host runtime was initialized."""
    import jax

    coord = os.environ.get('HICPEAKS_COORDINATOR')
    if not coord:
        return False
    nproc = int(os.environ['HICPEAKS_NUM_PROCESSES'])
    pid = int(os.environ['HICPEAKS_PROCESS_ID'])
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)
    log.info('jax.distributed initialized: process %d/%d via %s '
             '(%d global devices)', pid, nproc, coord,
             len(jax.devices()))
    return True


def global_tile_mesh():
    """1-D tile mesh over every device in the (possibly multi-host) job."""
    from .mesh import make_tile_mesh
    return make_tile_mesh()
