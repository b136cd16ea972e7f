#!/usr/bin/env python
"""Sub-stage profile of the compact scorer at the genome default config.

The fused probe (FUSED_PROBE_r03.json) shows the multi-pair scorer is
~200ms of the ~240ms fused round at num=1011/L=24900 — 4x _compact_one
over 25M-pixel sheets.  This times each ingredient as its own jitted
program (expected_observed, lambda_chunks(+suspects), chunk histogram,
threshold keep, compact_mask, stat gathers) so the next optimization
targets the real bottleneck.  Writes benchmarks/SCORE_PROFILE_r03.json.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   'SCORE_PROFILE_r03.json')


def log(msg):
    print(f'[score-profile] {msg}', file=sys.stderr, flush=True)


def timeit(fn, iters=10):
    import jax
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from hicpeaks_tpu.core import engine as engine_mod
    from hicpeaks_tpu.core import poolplan
    from hicpeaks_tpu.io.synth import synthesize_chrom
    from hicpeaks_tpu.ops import score as score_ops
    from hicpeaks_tpu.ops.band import build_bands
    from hicpeaks_tpu.ops.pallas_scan import scan_pass_b_pallas

    log(f'devices: {jax.devices()}')
    res, L, maxapart, maxww = 10000, int(os.environ.get('SP_L', 24900)), \
        10_000_000, 10
    pw, ww = (1, 2), (3, 5)
    num = maxapart // res + maxww + 1
    iters = int(os.environ.get('SP_ITERS', 10))

    b1, b2, ct, _, bias_vec = synthesize_chrom(
        n_bins=L, res=res, seed=42, depth=40.0, n_loops=2000, decay=0.75,
        max_loop_span_bins=num - maxww - 54)
    w = np.full(L, np.nan)
    ok = bias_vec > 0
    w[ok] = 1.0 / bias_vec[ok]
    bands = build_bands(b1, b2, ct, w, L, num, min(ww), res,
                        dtype=np.float32, lane_pad=4096)
    plan = tuple(poolplan.hiccups_pool_plan(list(pw), list(ww), maxww))
    p_list = tuple(sorted(set(pw)))
    _, o_cap = engine_mod._bh_plan(True, 'auto', float(bands.raw.max()))
    margin = engine_mod._chunk_margin(plan)
    log(f'o_cap={o_cap}, margin={margin:.2e}')

    raw_op, bits, w0, bias, IR, gap = engine_mod._staged_operands(bands)
    jax.block_until_ready(jax.tree_util.tree_leaves(
        (raw_op, w0, bias, IR, gap)))

    sheets = jax.jit(lambda r: score_ops.build_sheets_device(
        r, w0, bias, IR, gap, min(ww), bands.L, min(ww), maxapart // res,
        min(ww), bits=bits))
    raw, cband, eband, Bprod, gap_drop, cand = sheets(raw_op)
    allowed = jnp.asarray(np.ones(len(plan), bool))
    outs = scan_pass_b_pallas(raw, cband, eband, cand, allowed, plan,
                              p_list, 16)
    KS, KE, YS, YE = outs[pw[0]]
    jax.block_until_ready(KS)
    wi = ww[0]
    sig = jnp.float32(0.05)
    ms = {}

    f_eo = jax.jit(lambda: score_ops.expected_observed(
        raw, cband, IR, Bprod, KS, KE, wi, cand, int(bands.L)))
    E, O, ICE, Fold, scored, prod = f_eo()
    jax.block_until_ready(E)
    ms['expected_observed'] = timeit(f_eo, iters)

    f_lc = jax.jit(lambda: score_ops.lambda_chunks(E, scored))
    cid, rv, valid = f_lc()
    jax.block_until_ready(cid)
    ms['lambda_chunks'] = timeit(f_lc, iters)

    f_sus = jax.jit(lambda: score_ops.lambda_suspects(E, scored, margin))
    sus = f_sus()
    jax.block_until_ready(sus)
    ms['lambda_suspects'] = timeit(f_sus, iters)
    n_sus = int(jax.device_get(sus.sum()))

    hist_backend = engine_mod._hist_plan(None, 'auto')
    f_keep = jax.jit(lambda: score_ops.chunk_bh_keep(
        O, cid, valid, sig, o_cap=o_cap, hist_backend=hist_backend,
        slack=engine_mod._BH_SLACK))
    keep_q, qtab, hist, thr = f_keep()
    jax.block_until_ready(keep_q)
    ms['chunk_bh_keep(hist+thr)'] = timeit(f_keep, iters)

    f_hist = jax.jit(lambda: score_ops.chunk_hist(
        *score_ops._chunk_pack(O, cid, valid, 128, o_cap + 1)[:2],
        128, o_cap + 1, hist_backend))
    h = f_hist()
    jax.block_until_ready(h)
    ms['chunk_hist_only'] = timeit(f_hist, iters)

    keep = scored & keep_q & ~gap_drop & ~sus
    keep = jax.block_until_ready(jax.jit(lambda: keep)())
    f_cm = jax.jit(lambda: score_ops.compact_mask(
        keep, engine_mod._KEEP_CAP_FAST))
    cm = f_cm()
    jax.block_until_ready(cm)
    ms['compact_mask(keep)'] = timeit(f_cm, iters)

    f_cms = jax.jit(lambda: score_ops.compact_mask(
        sus, engine_mod._SUS_CAP))
    cms = f_cms()
    jax.block_until_ready(cms)
    ms['compact_mask(suspects)'] = timeit(f_cms, iters)

    f_one = jax.jit(lambda: engine_mod._compact_one(
        raw, cband, IR, Bprod, KS, KE, cand, gap_drop, sig, wi,
        int(bands.L), True, o_cap, engine_mod._KEEP_CAP_FAST, hist_backend,
        exact_mode=True, margin=margin))
    one = f_one()
    jax.block_until_ready(one)
    ms['compact_one_total'] = timeit(f_one, iters)

    f_one_noexact = jax.jit(lambda: engine_mod._compact_one(
        raw, cband, IR, Bprod, KS, KE, cand, gap_drop, sig, wi,
        int(bands.L), True, o_cap, engine_mod._KEEP_CAP_FAST, hist_backend))
    one2 = f_one_noexact()
    jax.block_until_ready(one2)
    ms['compact_one_no_suspects'] = timeit(f_one_noexact, iters)

    blob = {
        'config': {'L': L, 'num': num, 'o_cap': int(o_cap),
                   'n_suspects_one_bg': n_sus,
                   'margin': margin,
                   'hist_backend': hist_backend},
        'ms': {k: round(v * 1e3, 2) for k, v in ms.items()},
    }
    with open(OUT, 'w') as f:
        json.dump(blob, f, indent=1)
    print(json.dumps(blob, indent=1), flush=True)
    os._exit(0)


if __name__ == '__main__':
    try:
        main()
    except Exception:
        import traceback
        traceback.print_exc(file=sys.stderr)
        os._exit(3)
