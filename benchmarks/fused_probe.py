#!/usr/bin/env python
"""Hardware probe: per-stage vs fully-fused steady cost at the reference's
DEFAULT multi-pair config (L=24900 @10Kb, maxapart=10Mb -> num=1011,
pw=(1,2)/ww=(3,5)) with staged (pre-transferred) device arrays — the
production prefetch state.  Quantifies how much of the 0.9s steady round
of GENOME_SCALE_r03_multipair is slab re-transfer + dispatch round trips
vs actual device compute, and times the ONE-program fused pipeline that
the engine's fused path dispatches per chromosome.

Writes benchmarks/FUSED_PROBE_r04.json.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   'FUSED_PROBE_r05.json')


def log(msg):
    print(f'[fused-probe] {msg}', file=sys.stderr, flush=True)


def timeit(fn, iters=5):
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
    from hicpeaks_tpu.ops.pallas_scan import (scan_pass_a_pallas,
                                              scan_pass_b_pallas)

    log(f'devices: {jax.devices()}')
    res = 10000
    L = int(os.environ.get('FP_L', 24900))
    maxapart = 10_000_000
    maxww = 10
    pw, ww = (1, 2), (3, 5)
    num = maxapart // res + maxww + 1
    iters = int(os.environ.get('FP_ITERS', 5))

    t0 = time.time()
    b1, b2, ct, _, bias_vec = synthesize_chrom(
        n_bins=L, res=res, seed=42, depth=40.0, n_loops=2000, decay=0.75,
        max_loop_span_bins=num - maxww - 54)
    w = np.full(L, np.nan)
    ok = bias_vec > 0
    w[ok] = 1.0 / bias_vec[ok]
    bands = build_bands(b1, b2, ct, w, L, num, min(ww), res,
                        dtype=np.float32, lane_pad=4096)
    log(f'bands {bands.raw.shape} built in {time.time()-t0:.0f}s')

    plan = tuple(poolplan.hiccups_pool_plan(list(pw), list(ww), maxww))
    p_list = tuple(sorted(set(pw)))
    o_cap = max(256, int(-(-int(bands.raw.max()) // 128) * 128))
    n_cand = int(bands.candidate_total(min(ww), maxapart // res))
    log(f'{n_cand} candidates, o_cap={o_cap}, plan={len(plan)} entries')

    # --- transfer cost (packed slab), then stage everything ---
    enc = engine_mod._compact_slab(bands)
    nbytes = (sum(p.nbytes for p in enc.parts)
              if isinstance(enc, engine_mod._SlabEnc) else enc.nbytes)
    t0 = time.time()
    staged_raw = engine_mod._to_device_slab(enc)
    jax.block_until_ready(jax.tree_util.tree_leaves(staged_raw))
    t_transfer_first = time.time() - t0

    def xfer():
        d = engine_mod._to_device_slab(enc)
        return jax.tree_util.tree_leaves(d)
    t_transfer = timeit(xfer, 3)
    log(f'slab transfer: {nbytes/1e6:.1f}MB in {t_transfer:.2f}s '
        f'({nbytes/1e6/t_transfer:.0f}MB/s)')

    w0 = jnp.asarray(bands.w0)
    bias = jnp.asarray(bands.bias)
    IR = jnp.asarray(bands.IR)
    gap = jnp.asarray(bands.gap)
    allowed = jnp.asarray(np.ones(len(plan), bool))
    jax.block_until_ready((w0, bias, IR, gap))

    raw_op, bits = engine_mod._slab_args(staged_raw)

    # --- per-stage (separate dispatches, staged arrays) ---
    stages = {}
    t_c0 = time.time()
    sheets_fn = jax.jit(lambda r: score_ops.build_sheets_device(
        r, w0, bias, IR, gap, min(ww), bands.L, min(ww),
        maxapart // res, min(ww), bits=bits))
    raw, cband, eband, Bprod, gap_drop, cand = sheets_fn(raw_op)
    jax.block_until_ready(raw)
    stages['sheets_compile_s'] = round(time.time() - t_c0, 1)
    stages['sheets'] = timeit(lambda: sheets_fn(raw_op), iters)
    log(f"sheets: {stages['sheets']*1e3:.0f}ms "
        f"(compile {stages['sheets_compile_s']}s)")

    t_c0 = time.time()
    counts = scan_pass_a_pallas(raw, cand, plan, p_list, 16)
    jax.block_until_ready(counts)
    stages['pass_a_compile_s'] = round(time.time() - t_c0, 1)
    stages['pass_a'] = timeit(
        lambda: scan_pass_a_pallas(raw, cand, plan, p_list, 16), iters)
    log(f"pass A: {stages['pass_a']*1e3:.0f}ms "
        f"(compile {stages['pass_a_compile_s']}s)")

    t_c0 = time.time()
    outs = scan_pass_b_pallas(raw, cband, eband, cand, allowed, plan,
                              p_list, 16)
    jax.block_until_ready(outs)
    stages['pass_b_compile_s'] = round(time.time() - t_c0, 1)
    stages['pass_b'] = timeit(
        lambda: scan_pass_b_pallas(raw, cband, eband, cand, allowed, plan,
                                   p_list, 16), iters)
    log(f"pass B: {stages['pass_b']*1e3:.0f}ms "
        f"(compile {stages['pass_b_compile_s']}s)")

    pairs = list(zip(pw, ww))
    caps = tuple(tuple(outs[pi]) for pi, _ in pairs)
    hist_backend = engine_mod._hist_plan(None, 'auto')
    t_c0 = time.time()
    s_rows = score_ops.chunk_rows(o_cap, 0.05)
    outKY = engine_mod._score_device_compact_multi(
        raw, cband, IR, Bprod, caps, cand, gap_drop, jnp.float32(0.05),
        wis=tuple(int(wi) for _, wi in pairs), L=int(bands.L), chunked=True,
        o_cap=o_cap, keep_cap=engine_mod._KEEP_CAP_FAST,
        hist_backend=hist_backend, s_rows=s_rows)
    jax.block_until_ready(outKY)
    stages['score_multi_compile_s'] = round(time.time() - t_c0, 1)
    stages['score_multi'] = timeit(lambda: engine_mod._score_device_compact_multi(
        raw, cband, IR, Bprod, caps, cand, gap_drop, jnp.float32(0.05),
        wis=tuple(int(wi) for _, wi in pairs), L=int(bands.L), chunked=True,
        o_cap=o_cap, keep_cap=engine_mod._KEEP_CAP_FAST,
        hist_backend=hist_backend, s_rows=s_rows), iters)
    log(f"score multi: {stages['score_multi']*1e3:.0f}ms "
        f"(compile {stages['score_multi_compile_s']}s)")

    # --- fused ONE-program pipeline (production fused path shape) ---
    def fused_body(eps, raw_op, w0, bias, IR, gap, allowed):
        if isinstance(raw_op, tuple):
            raw_op = tuple(r + eps.astype(r.dtype) for r in raw_op)
        else:
            raw_op = raw_op + eps.astype(raw_op.dtype)
        raw_i, cband, eband, Bprod, gap_drop, cand = \
            score_ops.build_sheets_device(
                raw_op, w0, bias, IR, gap, min(ww), bands.L, min(ww),
                maxapart // res, min(ww), bits=bits)
        counts = scan_pass_a_pallas(raw_i, cand, plan, p_list, 16)
        outs2 = scan_pass_b_pallas(raw_i, cband, eband, cand, allowed,
                                   plan, p_list, 16)
        caps2 = tuple(tuple(outs2[pi]) for pi, _ in pairs)
        outK, outY = engine_mod._score_device_compact_multi(
            raw_i, cband, IR, Bprod, caps2, cand, gap_drop,
            jnp.float32(0.05), wis=tuple(int(wi) for _, wi in pairs),
            L=int(bands.L), chunked=True, o_cap=o_cap,
            keep_cap=engine_mod._KEEP_CAP_FAST, hist_backend=hist_backend,
            s_rows=s_rows)
        return counts, outK[:8], outY[:8]

    fused = jax.jit(fused_body)
    eps = jnp.uint16(0) if bits else jnp.float32(0)
    t_c0 = time.time()
    out = fused(eps, raw_op, w0, bias, IR, gap, allowed)
    jax.block_until_ready(out)
    t_fused_compile = time.time() - t_c0
    log(f'fused compile+run: {t_fused_compile:.1f}s')

    t_fused = timeit(lambda: fused(eps, raw_op, w0, bias, IR, gap, allowed),
                     iters)
    log(f'fused steady: {t_fused*1e3:.0f}ms -> {n_cand/t_fused/1e6:.1f}M px/s')

    # fused + fetch of the compacted bundles (the full steady round trip)
    def fused_fetch():
        counts, fK, fY = fused(eps, raw_op, w0, bias, IR, gap, allowed)
        return engine_mod._fetch((counts, fK, fY))
    t_round = timeit(fused_fetch, iters)
    log(f'fused + fetch: {t_round*1e3:.0f}ms -> {n_cand/t_round/1e6:.1f}M px/s')

    blob = {
        'config': {'L': L, 'num': num, 'pw': list(pw), 'ww': list(ww),
                   'candidates': n_cand, 'slab_mb': round(nbytes / 1e6, 1)},
        'transfer_s': round(t_transfer, 3),
        'transfer_first_s': round(t_transfer_first, 3),
        'stage_ms': {k: round(v * 1e3, 1) for k, v in stages.items()
                     if not k.endswith('_s')},
        'stage_compile_s': {k: v for k, v in stages.items()
                            if k.endswith('_s')},
        'sum_stages_ms': round(sum(v for k, v in stages.items()
                                   if not k.endswith('_s')) * 1e3, 1),
        'fused_compile_s': round(t_fused_compile, 1),
        'fused_steady_ms': round(t_fused * 1e3, 1),
        'fused_fetch_ms': round(t_round * 1e3, 1),
        'px_per_s_fused_fetch': round(n_cand / t_round, 1),
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
