"""Real multi-host execution: two jax.distributed CPU processes on
localhost partition chromosomes, call peaks, and all-gather identical
genome-wide tables (BASELINE config 4 at the correctness level this
single-machine environment allows — SURVEY §4 multi-host note)."""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from hicpeaks_tpu.io.coolerlite import CoolerLite, create_cooler_file, binnify
from hicpeaks_tpu.io.synth import synthesize_chrom


RES = 25000


@pytest.fixture(scope='module')
def two_chrom_cooler(tmp_path_factory):
    """A cooler with two chromosomes and ICE-style weights."""
    root = tmp_path_factory.mktemp('mh')
    path = root / 'two.cool'
    n1, n2 = 220, 180
    chromsizes = {'1': n1 * RES, '2': n2 * RES}
    bins = binnify(chromsizes, RES)

    chunks = []
    weights = []
    offset = 0
    for chrom, n in (('1', n1), ('2', n2)):
        b1, b2, ct, _, bias = synthesize_chrom(
            n_bins=n, res=RES, seed=7 + n, n_loops=12, depth=60.0)
        chunks.append({'bin1_id': b1 + offset, 'bin2_id': b2 + offset,
                       'count': ct})
        w = np.full(n, np.nan)
        ok = bias > 0
        w[ok] = 1.0 / bias[ok]
        weights.append(w)
        offset += n
    uri = f'{path}::{RES}'
    create_cooler_file(uri, bins, chunks, metadata={'onlyIntra': 'True'})
    CoolerLite(uri).write_weights(np.concatenate(weights))
    return uri


def _free_port():
    s = socket.socket()
    s.bind(('localhost', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_expected(uri):
    from hicpeaks_tpu.api import call_bhfdr
    from hicpeaks_tpu.core.config import BHFDRConfig
    cfg = BHFDRConfig(pw=1, ww=3, maxww=6, maxapart=1_000_000)
    results = call_bhfdr(uri, cfg)
    return {c: {','.join(map(str, k)): list(map(float, v))
                for k, v in t.items()} for c, t in results.items()}


@pytest.mark.parametrize('use_mesh', [False, True],
                         ids=['chrom-dp', 'chrom-dp+local-tile-mesh'])
def test_two_process_distributed_parity(two_chrom_cooler, tmp_path,
                                        use_mesh):
    uri = two_chrom_cooler
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), 'multihost_worker.py')

    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f'peaks.{pid}.{use_mesh}.json'
        outs.append(out)
        env = dict(os.environ)
        env['HICPEAKS_COORDINATOR'] = f'localhost:{port}'
        env['HICPEAKS_NUM_PROCESSES'] = '2'
        env['HICPEAKS_PROCESS_ID'] = str(pid)
        env['JAX_PLATFORMS'] = 'cpu'
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env['PYTHONPATH'] = ':'.join(
            [repo] + ([env['PYTHONPATH']] if env.get('PYTHONPATH') else []))
        # 2 local virtual devices per process -> 4 global
        flags = [f for f in env.get('XLA_FLAGS', '').split()
                 if 'device_count' not in f]
        env['XLA_FLAGS'] = ' '.join(
            flags + ['--xla_force_host_platform_device_count=2'])
        argv = [sys.executable, worker, uri, str(out)]
        if use_mesh:
            argv.append('--mesh')
        procs.append(subprocess.Popen(
            argv, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))

    logs = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append((p.returncode, stdout, stderr))
    for rc, stdout, stderr in logs:
        assert rc == 0, f'worker failed:\n{stdout}\n{stderr[-3000:]}'
        assert 'WORKER-OK' in stdout

    tables = [json.loads(out.read_text()) for out in outs]
    # both processes hold the identical gathered genome-wide table
    assert tables[0] == tables[1]
    assert set(tables[0]) == {'1', '2'}

    expected = _single_process_expected(uri)
    assert tables[0] == expected
