#!/usr/bin/env python
"""Benchmark: hiccups donut-scoring throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference CPU implementation scores ~20K candidate
pixels/s on the K562 10Kb pyHICCUPS run (139.9M band pixels in 7053 s,
README.rst:291; BASELINE.md derivation).  Here a synthetic chromosome of
comparable per-pixel work (10Kb bins, pw/ww=(2,5), 5Mb search space) runs
the full device pipeline — widening ring scan with background capture,
corrected expected values, lambda-chunk Poisson p-values, segmented BH,
gap filter — and reports candidate pixels scored per second per chip.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from hicpeaks_tpu.core import flagship, poolplan
    from hicpeaks_tpu.io.synth import synthesize_chrom
    from hicpeaks_tpu.ops.band import build_bands

    # chromosome-scale band: L bins at 10Kb, 5Mb search space, maxww 10
    res = 10000
    L = 24576
    maxapart = 5_000_000
    maxww = 10
    pw, ww = (2,), (5,)
    num = maxapart // res + maxww + 1

    b1, b2, ct, _, bias_vec = synthesize_chrom(
        n_bins=L, res=res, seed=0, depth=40.0, n_loops=200, decay=0.75,
        max_loop_span_bins=200)
    w = np.full(L, np.nan)
    ok = bias_vec > 0
    w[ok] = 1.0 / bias_vec[ok]
    # widen the synthetic band to the full search space with a thinner tail
    rng = np.random.default_rng(1)
    extra_d = np.arange(264, num, 1)
    tail_rows = []
    for d in extra_d:
        lam = 40.0 * (1.0 + d) ** -0.75 * 0.5
        n_nz = int((L - d) * min(1.0, lam))
        xs = rng.integers(0, max(L - d, 1), size=max(n_nz, 1))
        tail_rows.append((np.full(xs.size, 0) + xs, xs + d,
                          rng.poisson(max(lam, 0.2), xs.size) + 1))
    b1 = np.concatenate([b1] + [t[0] for t in tail_rows])
    b2 = np.concatenate([b2] + [t[1] for t in tail_rows])
    ct = np.concatenate([ct] + [t[2] for t in tail_rows])

    bands = build_bands(b1, b2, ct, w, L, num, min(ww), res,
                        dtype=np.float32)

    plan = tuple(poolplan.hiccups_pool_plan(list(pw), list(ww), maxww))
    p_list = tuple(sorted(set(pw)))
    pairs = tuple(zip(pw, ww))

    from hicpeaks_tpu.ops import score as score_ops

    raw = jnp.asarray(bands.raw)
    cband = jnp.asarray(bands.cband)
    IR = jnp.asarray(bands.IR)
    num_p = raw.shape[0]
    Bprod = jnp.asarray(score_ops.bias_product_host(bands.bias, num_p))
    gap = bands.cband.sum(axis=0) == 0
    gap_drop = jnp.asarray(score_ops.gap_reject_host(gap, num_p, bands.L,
                                                     min(ww)))
    col = jnp.arange(raw.shape[1])[None, :]
    drow = jnp.arange(num_p)[:, None]
    eband = jnp.where(col < (bands.L - drow), IR[:, None], 0.0)
    cand = (raw != 0) & (drow >= min(ww)) & (drow <= maxapart // res)
    allowed = jnp.ones(len(plan), bool)
    n_cand = int(np.asarray(jnp.sum(cand)))

    def step():
        return flagship.hiccups_device_step(
            raw, cband, eband, IR, Bprod, cand, allowed, gap_drop,
            plan=plan, p_list=p_list, thr=16, pairs=pairs, L=bands.L)

    out = step()
    jax.block_until_ready(out)          # compile + warm
    n_iters = 5
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = step()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_iters

    pixels_per_s = n_cand / dt
    baseline = 20_000.0                  # reference CPU pixels-scored/s
    print(json.dumps({
        'metric': 'pixels-scored/s/chip (hiccups donut pipeline, '
                  f'{n_cand} candidates, L={L}@10Kb, 5Mb span)',
        'value': round(pixels_per_s, 1),
        'unit': 'pixels/s',
        'vs_baseline': round(pixels_per_s / baseline, 2),
    }))


if __name__ == '__main__':
    sys.exit(main())
