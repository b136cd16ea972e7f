#!/usr/bin/env python
"""Pass-B tile/VMEM sweep on hardware (round-4 roofline follow-up).

The hw_efficiency block showed the Pallas capture kernel sustaining only
~1-2.5% of HBM peak at bench scale — VPU-arithmetic + per-tile-overhead
bound, so bigger tiles (less halo recompute, fewer grid steps) should
move the headline.  Sweeps HICPEAKS_PALLAS_VMEM and measures the
steady per-call wall of both Pallas passes at the bench shape.

Writes benchmarks/PASSB_TUNE_r04.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   'PASSB_TUNE_r05.json')


def main():
    budgets = [int(b) for b in os.environ.get(
        'PT_BUDGETS', '13,28,44,56,72,90').split(',')]
    L = int(os.environ.get('PT_L', 8192))
    results = {}
    import numpy as np
    import jax
    import jax.numpy as jnp
    from hicpeaks_tpu.core import poolplan
    from hicpeaks_tpu.io.synth import synthesize_chrom
    from hicpeaks_tpu.ops.band import build_bands
    from hicpeaks_tpu.ops import score as score_ops
    from hicpeaks_tpu.ops import pallas_scan

    res = 10000
    maxapart = 2_000_000
    maxww = 10
    pw, ww = (2,), (5,)
    num = maxapart // res + maxww + 1
    b1, b2, ct, _, bias_vec = synthesize_chrom(
        n_bins=L, res=res, seed=0, depth=40.0, n_loops=200, decay=0.75,
        max_loop_span_bins=min(200, num - maxww - 2))
    w = np.full(L, np.nan)
    ok = bias_vec > 0
    w[ok] = 1.0 / bias_vec[ok]
    bands = build_bands(b1, b2, ct, w, L, num, min(ww), res,
                        dtype=np.float32)
    plan = tuple(poolplan.hiccups_pool_plan(list(pw), list(ww), maxww))
    p_list = tuple(sorted(set(pw)))
    raw0 = jnp.asarray(bands.raw)
    w0 = jnp.asarray(bands.w0)
    bias = jnp.asarray(bands.bias)
    IR = jnp.asarray(bands.IR)
    gap = jnp.asarray(bands.gap)
    raw, cband, eband, Bprod, gap_drop, cand = score_ops.build_sheets_device(
        raw0, w0, bias, IR, gap, min(ww), bands.L, min(ww),
        maxapart // res, min(ww))
    allowed = jnp.asarray(np.ones(len(plan), bool))
    jax.block_until_ready((raw, cband, eband, cand))

    ref = None
    for mb in budgets:
        os.environ['HICPEAKS_PALLAS_VMEM'] = str(mb)
        # fresh jit caches per budget (tile choice happens at trace time)
        pallas_scan.scan_pass_a_pallas.clear_cache()
        pallas_scan.scan_pass_b_pallas.clear_cache()
        M = pallas_scan.scan_ops._row_margin(plan)
        Mr = pallas_scan._pad_to(M, 8)
        Mc = pallas_scan._pad_to(M, 128)
        R, T = pallas_scan._choose_tiles(raw.shape[0], raw.shape[1], Mr, Mc,
                                         19, 10 + 10 * len(p_list))
        try:
            outs = pallas_scan.scan_pass_b_pallas(
                raw, cband, eband, cand, allowed, plan, p_list, 16)
            s0 = float(jnp.sum(outs[p_list[0]][0]))
            t0 = time.perf_counter()
            for _ in range(5):
                outs = pallas_scan.scan_pass_b_pallas(
                    raw, cband, eband, cand, allowed, plan, p_list, 16)
            _ = float(jnp.sum(outs[p_list[0]][0]))
            t_b = (time.perf_counter() - t0) / 5

            counts = pallas_scan.scan_pass_a_pallas(raw, cand, plan,
                                                    p_list, 16)
            _ = np.asarray(counts)
            t0 = time.perf_counter()
            for _ in range(5):
                counts = pallas_scan.scan_pass_a_pallas(raw, cand, plan,
                                                        p_list, 16)
            _ = np.asarray(counts)
            t_a = (time.perf_counter() - t0) / 5
            if ref is None:
                ref = s0
            assert s0 == ref, f'capture sum drifted at {mb}MiB'
            results[mb] = {'tile': [R, T], 'pass_a_ms': round(t_a * 1e3, 2),
                           'pass_b_ms': round(t_b * 1e3, 2),
                           'checksum_equal': True}
        except Exception as e:
            results[mb] = {'tile': [R, T],
                           'error': f'{type(e).__name__}: {e}'[:200]}
        print(f'[passb-tune] {mb}MiB tile={R}x{T}: '
              f'{results[mb]}', file=sys.stderr, flush=True)

    with open(OUT, 'w') as f:
        json.dump({'L': L, 'num': num, 'results': results}, f, indent=1)
    print(json.dumps(results), flush=True)
    os._exit(0)


if __name__ == '__main__':
    try:
        main()
    except Exception:
        import traceback
        traceback.print_exc(file=sys.stderr)
        os._exit(3)
