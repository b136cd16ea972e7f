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

    from hicpeaks_tpu.parallel.launch import maybe_initialize_distributed
    assert maybe_initialize_distributed(), 'distributed env vars missing'
    assert jax.process_count() == int(os.environ['HICPEAKS_NUM_PROCESSES'])

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


if __name__ == '__main__':
    main()
