"""Device-mesh construction.

The workload's scalable axes (SURVEY §2.9): data-parallel over
(chromosome, band-tile) work units, with the genome axis tiled like
sequence parallelism — each tile carries a ``2*maxww`` halo exchanged with
its neighbours over ICI.  A 1-D mesh over all local devices covers both:
chromosomes are dispatched in sequence, each sharded across the mesh by
band-tile columns.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_tile_mesh(n_devices=None, devices=None):
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ('tiles',))
