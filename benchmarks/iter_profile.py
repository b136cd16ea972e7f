#!/usr/bin/env python
"""Per-stage timing of the bench.py steady iteration (single chromosome,
bench config by default).  Each stage is timed as its own jitted program
with a block_until_ready fence, so the split of the fused ~19ms iteration
(sheets+passA / passB / compact scorer x2) is visible.  Writes one JSON
blob to stdout.

Env: HICPEAKS_BENCH_L, HICPEAKS_BENCH_SPAN, HICPEAKS_IP_ITERS.
"""
import json
import os
import sys
import time

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# no direct JAX_COMPILATION_CACHE_DIR: on the axon tunnel persisting
# an executable costs ~100s+ of serialization (cli/common guard)

import jax
import jax.numpy as jnp

from hicpeaks_tpu.core import engine as engine_mod
from hicpeaks_tpu.core import poolplan
from hicpeaks_tpu.io.synth import synthesize_chrom
from hicpeaks_tpu.ops import scan as scan_ops
from hicpeaks_tpu.ops import score as score_ops
from hicpeaks_tpu.ops.band import build_bands
from hicpeaks_tpu.ops.pallas_scan import scan_pass_a_pallas, scan_pass_b_pallas


def log(msg):
    print(f'[iterprof] {msg}', file=sys.stderr, flush=True)


def timeit(fn, iters):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    res = 10000
    L = int(os.environ.get('HICPEAKS_BENCH_L', 8192))
    maxapart = int(os.environ.get('HICPEAKS_BENCH_SPAN', 2_000_000))
    iters = int(os.environ.get('HICPEAKS_IP_ITERS', 10))
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
    plan = tuple(poolplan.hiccups_pool_plan(list(pw), list(ww), maxww))
    p_list = tuple(sorted(set(pw)))
    o_cap = max(256, int(-(-int(bands.raw.max()) // 128) * 128))

    raw0 = jnp.asarray(bands.raw)
    w0 = jnp.asarray(bands.w0)
    bias = jnp.asarray(bands.bias)
    IR = jnp.asarray(bands.IR)
    gap = jnp.asarray(bands.gap)
    allowed = jnp.asarray(np.ones(len(plan), bool))
    jax.block_until_ready((raw0, w0, bias, IR, gap))
    log(f'staged: band {bands.raw.shape}')

    sheets = jax.jit(lambda r: score_ops.build_sheets_device(
        r, w0, bias, IR, gap, min(ww), bands.L, min(ww),
        maxapart // res, min(ww)))
    raw, cband, eband, Bprod, gap_drop, cand = sheets(raw0)
    jax.block_until_ready(raw)

    t_sheets = timeit(lambda: sheets(raw0), iters)
    log(f'sheets: {t_sheets*1e3:.2f} ms')

    t_pass_a = timeit(
        lambda: scan_pass_a_pallas(raw, cand, plan, p_list, 16), iters)
    log(f'pass A (pallas): {t_pass_a*1e3:.2f} ms')

    t_pass_b = timeit(
        lambda: scan_pass_b_pallas(raw, cband, eband, cand, allowed,
                                   plan, p_list, 16), iters)
    log(f'pass B (pallas): {t_pass_b*1e3:.2f} ms')

    t_pass_b_jnp = timeit(
        lambda: scan_ops.scan_pass_b(raw, cband, eband, cand, allowed,
                                     plan, p_list, 16)[2], iters)
    log(f'pass B (jnp): {t_pass_b_jnp*1e3:.2f} ms')

    outs = scan_pass_b_pallas(raw, cband, eband, cand, allowed,
                              plan, p_list, 16)
    KS, KE, YS, YE = outs[pw[0]]
    jax.block_until_ready(KS)

    hist_backend = engine_mod._hist_plan(None, 'auto')
    compact = jax.jit(lambda bSV, bEV: engine_mod._compact_one(
        raw, cband, IR, Bprod, bSV, bEV, cand, gap_drop,
        jnp.float32(0.05), ww[0], bands.L, True, o_cap,
        engine_mod._KEEP_CAP_FAST, hist_backend))
    t_compact = timeit(lambda: compact(KS, KE), iters)
    log(f'compact scorer (1 bg, hist={hist_backend}): {t_compact*1e3:.2f} ms')

    total = t_sheets + t_pass_a + t_pass_b + 2 * t_compact
    n_cand = bands.candidate_total(min(ww), maxapart // res)
    blob = {
        'config': {'L': L, 'maxapart': maxapart, 'num': num,
                   'n_candidates': int(n_cand)},
        'ms': {
            'sheets': round(t_sheets * 1e3, 3),
            'pass_a_pallas': round(t_pass_a * 1e3, 3),
            'pass_b_pallas': round(t_pass_b * 1e3, 3),
            'pass_b_jnp': round(t_pass_b_jnp * 1e3, 3),
            'compact_one_bg': round(t_compact * 1e3, 3),
            'sum_fused_equivalent': round(total * 1e3, 3),
        },
        'pixels_per_s_if_sum': round(n_cand / total, 1),
    }
    print(json.dumps(blob, indent=1), flush=True)


if __name__ == '__main__':
    main()
