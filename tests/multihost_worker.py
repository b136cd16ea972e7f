"""Worker process for the two-process jax.distributed test.

Usage: python multihost_worker.py <cooler_uri> <out_json> [--mesh]
Env (set by the parent test): HICPEAKS_COORDINATOR, HICPEAKS_NUM_PROCESSES,
HICPEAKS_PROCESS_ID, XLA_FLAGS with --xla_force_host_platform_device_count.
"""
import json
import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)


def main():
    uri, out_path = sys.argv[1], sys.argv[2]
    use_mesh = '--mesh' in sys.argv[3:]
    tile_ingest = '--tile-ingest' in sys.argv[3:]
    global_engine = '--global-engine' in sys.argv[3:]
    global_api = '--global-api' in sys.argv[3:]

    from hicpeaks_tpu.parallel.launch import maybe_initialize_distributed
    assert maybe_initialize_distributed(), 'distributed env vars missing'
    assert jax.process_count() == int(os.environ['HICPEAKS_NUM_PROCESSES'])

    if tile_ingest:
        return run_tile_ingest(uri, out_path)
    if global_engine:
        return run_global_engine(uri, out_path)
    if global_api:
        return run_global_api(uri, out_path)

    mesh = None
    if use_mesh:
        from hicpeaks_tpu.parallel.multihost import local_tile_mesh
        mesh = local_tile_mesh()

    from hicpeaks_tpu.api import call_bhfdr
    from hicpeaks_tpu.core.config import BHFDRConfig

    cfg = BHFDRConfig(pw=1, ww=3, maxww=6, maxapart=1_000_000)
    results = call_bhfdr(uri, cfg, mesh=mesh)

    payload = {c: {','.join(map(str, k)): list(map(float, v))
                   for k, v in t.items()} for c, t in results.items()}
    with open(out_path, 'w') as f:
        json.dump(payload, f, sort_keys=True)
    print('WORKER-OK', jax.process_index(), flush=True)


def run_global_api(uri, out_path):
    """api.call_bhfdr with a GLOBAL mesh spanning both processes: the api
    must select tile-sharded per-host ingestion (no chromosome
    partitioning) and return the full genome-wide table on each process
    without the final gather."""
    import numpy as np
    from jax.sharding import Mesh

    from hicpeaks_tpu.api import call_bhfdr
    from hicpeaks_tpu.core.config import BHFDRConfig

    mesh = Mesh(np.array(jax.devices()), ('tiles',))
    cfg = BHFDRConfig(pw=1, ww=3, maxww=6, maxapart=1_000_000)
    results = call_bhfdr(uri, cfg, mesh=mesh)
    payload = {c: {','.join(map(str, k)): list(map(float, v))
                   for k, v in t.items()} for c, t in results.items()}
    with open(out_path, 'w') as f:
        json.dump(payload, f, sort_keys=True)
    print('WORKER-OK', jax.process_index(), flush=True)


def run_global_engine(uri, out_path):
    """Engine execution on a GLOBAL mesh spanning both processes: sharded
    per-host ingestion feeds bhfdr_chrom/hiccups_chrom whose compacted
    fetches replicate across processes (engine._fetch); every process must
    emit the identical peak table."""
    import numpy as np
    from jax.sharding import Mesh

    from hicpeaks_tpu.core import engine
    from hicpeaks_tpu.core.config import BHFDRConfig, HiccupsConfig
    from hicpeaks_tpu.io.coolerlite import CoolerLite
    from hicpeaks_tpu.parallel.multihost import sharded_bands_from_cooler

    clr = CoolerLite(uri)
    mesh = Mesh(np.array(jax.devices()), ('tiles',))
    tables = {}
    for chrom in ('1', '2'):
        bands = sharded_bands_from_cooler(clr, chrom, 1_000_000, 6, 3, mesh,
                                          dtype=np.float64)
        bcfg = BHFDRConfig(pw=1, ww=3, maxww=6, maxapart=1_000_000)
        tables[f'bhfdr.{chrom}'] = engine.bhfdr_chrom(bands, bcfg, mesh=mesh)
        hcfg = HiccupsConfig(pw=(1,), ww=(3,), maxww=6, maxapart=1_000_000,
                             min_marginal_peaks=2, min_local_reads=16)
        tables[f'hiccups.{chrom}'] = engine.hiccups_chrom(bands, hcfg,
                                                          mesh=mesh)
    payload = {name: {','.join(map(str, k)): list(map(float, v))
                      for k, v in t.items()} for name, t in tables.items()}
    with open(out_path, 'w') as f:
        json.dump(payload, f, sort_keys=True)
    print('WORKER-OK', jax.process_index(), flush=True)


def run_tile_ingest(uri, out_path):
    """Per-host sharded ingestion over a GLOBAL mesh spanning both
    processes: each process must read only its own column span and all
    processes must agree on the reduced IR/gap/candidate vectors."""
    import numpy as np
    from jax.sharding import Mesh

    from hicpeaks_tpu.io.coolerlite import CoolerLite
    from hicpeaks_tpu.parallel.multihost import sharded_bands_from_cooler

    clr = CoolerLite(uri)
    # record + restrict reads: full-chromosome pixel reads are forbidden
    spans = []
    orig = CoolerLite.pixels_for_bin1_range

    def recording(self, chrom, c0, c1):
        spans.append((int(c0), int(c1)))
        return orig(self, chrom, c0, c1)

    CoolerLite.pixels_for_bin1_range = recording
    CoolerLite.pixels_for_chrom = None   # any call would raise TypeError

    mesh = Mesh(np.array(jax.devices()), ('tiles',))
    bands = sharded_bands_from_cooler(clr, '1', 1_000_000, 6, 3, mesh,
                                      dtype=np.float64)

    shards = [(sh.index[1].start or 0, sh.index[1].stop)
              for sh in bands.raw.addressable_shards]
    payload = {
        'process': jax.process_index(),
        'read_spans': spans,
        'shard_cols': shards,
        'shard_data': {f'{a}:{b}': np.asarray(
            [d for d in bands.raw.addressable_shards
             if (d.index[1].start or 0) == a][0].data).tolist()
            for a, b in shards},
        'IR': np.asarray(bands.IR).tolist(),
        'gap': np.asarray(bands.gap).astype(int).tolist(),
        'cand_hist': np.asarray(bands.cand_hist).tolist(),
        'nnz': bands.nnz(),
        'L': bands.L,
    }
    with open(out_path, 'w') as f:
        json.dump(payload, f)
    print('WORKER-OK', jax.process_index(), flush=True)


if __name__ == '__main__':
    main()
