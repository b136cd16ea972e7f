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


def test_two_process_per_host_ingestion(two_chrom_cooler, tmp_path):
    """Global tile mesh across two processes: each process reads ONLY its
    own column span (full-chromosome reads are disabled in the worker),
    and the assembled shards + reduced IR/gap/candidate vectors equal the
    single-host loader's."""
    uri = two_chrom_cooler
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), 'multihost_worker.py')

    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f'ingest.{pid}.json'
        outs.append(out)
        env = dict(os.environ)
        env['HICPEAKS_COORDINATOR'] = f'localhost:{port}'
        env['HICPEAKS_NUM_PROCESSES'] = '2'
        env['HICPEAKS_PROCESS_ID'] = str(pid)
        env['JAX_PLATFORMS'] = 'cpu'
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env['PYTHONPATH'] = ':'.join(
            [repo] + ([env['PYTHONPATH']] if env.get('PYTHONPATH') else []))
        flags = [f for f in env.get('XLA_FLAGS', '').split()
                 if 'device_count' not in f]
        env['XLA_FLAGS'] = ' '.join(
            flags + ['--xla_force_host_platform_device_count=2'])
        procs.append(subprocess.Popen(
            [sys.executable, worker, uri, str(out), '--tile-ingest'],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f'worker failed:\n{stdout}\n{stderr[-3000:]}'

    payloads = [json.loads(o.read_text()) for o in outs]

    # reference: single-host loader on the same chromosome/config
    from hicpeaks_tpu.ops.band import bands_from_cooler
    clr = CoolerLite(uri)
    host = bands_from_cooler(clr, '1', 1_000_000, 6, 3, dtype=np.float64,
                             lane_pad=128)
    num_p, Lp = host.raw.shape

    # per-host reads: each process touched only its own shard span
    for pl in payloads:
        lo = min(a for a, b in pl['shard_cols'])
        hi = max(b for a, b in pl['shard_cols'])
        for c0, c1 in pl['read_spans']:
            assert c0 >= lo and c1 <= max(hi, pl['L'])
    # the two processes covered disjoint, complementary spans
    all_cols = sorted(c for pl in payloads for c in pl['shard_cols'])
    assert all_cols[0][0] == 0
    for (a0, b0), (a1, b1) in zip(all_cols, all_cols[1:]):
        assert a1 == b0

    # assembled global slab == host loader's (padded cols are zero)
    Lpm = max(b for pl in payloads for _, b in pl['shard_cols'])
    assembled = np.zeros((num_p, Lpm))
    for pl in payloads:
        for (a, b) in pl['shard_cols']:
            assembled[:, a:b] = np.asarray(pl['shard_data'][f'{a}:{b}'])
    np.testing.assert_array_equal(assembled[:, :Lp], host.raw)
    assert not assembled[:, Lp:].any()

    for pl in payloads:
        # canonical blocked csum (ops/band.fold_blocked_csum): the reduced
        # IR is BIT-identical to the single-host loader's at any process
        # count — the float64 host-exact statistics rest on this
        np.testing.assert_array_equal(np.asarray(pl['IR']), host.IR)
        np.testing.assert_array_equal(
            np.asarray(pl['gap'][:Lp], bool), host.gap)
        assert pl['nnz'] == host.nnz()
    assert payloads[0]['cand_hist'] == payloads[1]['cand_hist']


def test_two_process_global_mesh_engine(two_chrom_cooler, tmp_path):
    """Full engine execution on a 4-device mesh spanning two processes
    (per-host ingestion + halo-sharded scan + replicated compact fetches):
    both processes emit the identical tables, equal to single-process."""
    uri = two_chrom_cooler
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), 'multihost_worker.py')

    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f'genginer.{pid}.json'
        outs.append(out)
        env = dict(os.environ)
        env['HICPEAKS_COORDINATOR'] = f'localhost:{port}'
        env['HICPEAKS_NUM_PROCESSES'] = '2'
        env['HICPEAKS_PROCESS_ID'] = str(pid)
        env['JAX_PLATFORMS'] = 'cpu'
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env['PYTHONPATH'] = ':'.join(
            [repo] + ([env['PYTHONPATH']] if env.get('PYTHONPATH') else []))
        flags = [f for f in env.get('XLA_FLAGS', '').split()
                 if 'device_count' not in f]
        env['XLA_FLAGS'] = ' '.join(
            flags + ['--xla_force_host_platform_device_count=2'])
        procs.append(subprocess.Popen(
            [sys.executable, worker, uri, str(out), '--global-engine'],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f'worker failed:\n{stdout}\n{stderr[-4000:]}'

    t0, t1 = (json.loads(o.read_text()) for o in outs)
    assert t0 == t1
    assert set(t0) == {'bhfdr.1', 'bhfdr.2', 'hiccups.1', 'hiccups.2'}

    # equals the single-process engines on host-loaded bands
    from hicpeaks_tpu.core import engine
    from hicpeaks_tpu.core.config import HiccupsConfig
    from hicpeaks_tpu.ops.band import bands_from_cooler
    clr = CoolerLite(uri)
    for chrom in ('1', '2'):
        bands = bands_from_cooler(clr, chrom, 1_000_000, 6, 3,
                                  dtype=np.float64)
        from hicpeaks_tpu.core.config import BHFDRConfig
        bcfg = BHFDRConfig(pw=1, ww=3, maxww=6, maxapart=1_000_000)
        want = engine.bhfdr_chrom(bands, bcfg)
        got = {tuple(int(float(x)) for x in k.split(',')): tuple(v)
               for k, v in t0[f'bhfdr.{chrom}'].items()}
        assert set(got) == set(want)
        for k in want:
            np.testing.assert_allclose(np.asarray(got[k], float),
                                       np.asarray(want[k], float),
                                       rtol=1e-9)
        hcfg = HiccupsConfig(pw=(1,), ww=(3,), maxww=6, maxapart=1_000_000,
                             min_marginal_peaks=2, min_local_reads=16)
        want = engine.hiccups_chrom(bands, hcfg)
        got = {tuple(int(float(x)) for x in k.split(',')): tuple(v)
               for k, v in t0[f'hiccups.{chrom}'].items()}
        assert set(got) == set(want)
        for k in want:
            np.testing.assert_allclose(np.asarray(got[k], float),
                                       np.asarray(want[k], float),
                                       rtol=1e-9)


def test_two_process_global_mesh_api(two_chrom_cooler, tmp_path):
    """api.call_bhfdr on a mesh spanning two processes selects the
    tile-sharded strategy end to end and equals the single-process API."""
    uri = two_chrom_cooler
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), 'multihost_worker.py')

    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f'gapi.{pid}.json'
        outs.append(out)
        env = dict(os.environ)
        env['HICPEAKS_COORDINATOR'] = f'localhost:{port}'
        env['HICPEAKS_NUM_PROCESSES'] = '2'
        env['HICPEAKS_PROCESS_ID'] = str(pid)
        env['JAX_PLATFORMS'] = 'cpu'
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env['PYTHONPATH'] = ':'.join(
            [repo] + ([env['PYTHONPATH']] if env.get('PYTHONPATH') else []))
        flags = [f for f in env.get('XLA_FLAGS', '').split()
                 if 'device_count' not in f]
        env['XLA_FLAGS'] = ' '.join(
            flags + ['--xla_force_host_platform_device_count=2'])
        procs.append(subprocess.Popen(
            [sys.executable, worker, uri, str(out), '--global-api'],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f'worker failed:\n{stdout}\n{stderr[-4000:]}'

    t0, t1 = (json.loads(o.read_text()) for o in outs)
    assert t0 == t1
    assert t0 == _single_process_expected(uri)
