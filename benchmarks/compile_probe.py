#!/usr/bin/env python
"""Cold-start compile bisection (round-4 verdict item 1).

Times AOT compiles (jit(...).lower(shapes).compile() — no data, no
execution) of the engine's device programs at the reference default
config shape (num=1011), varying one axis per case, to locate the
450s/1652s cold-start term of GENOME_SCALE_r03_multipair /
FUSED_PROBE_r03.

Usage: python benchmarks/compile_probe.py CASE [NUM] — one case per
process so a pathological compile can be bounded with `timeout`.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def shapes_for(num_p, Lp, enc):
    import jax
    f32 = jnp_struct = lambda s, d: jax.ShapeDtypeStruct(s, d)
    if enc == 'packed4':
        # round-3 row-classed encoding at genome scale: a thin u16 head,
        # a u8 band, then 4-bit and 2-bit packed tails (64-row buckets)
        cuts = [0, 64, min(256, num_p), min(512, num_p), num_p]
        widths = [16, 8, 4, 2]
        parts, bits = [], []
        for w, lo, hi in zip(widths, cuts[:-1], cuts[1:]):
            if hi <= lo:
                continue
            if w == 16:
                parts.append(jnp_struct((hi - lo, Lp), np.uint16))
            elif w == 8:
                parts.append(jnp_struct((hi - lo, Lp), np.uint8))
            else:
                parts.append(jnp_struct((hi - lo, Lp * w // 8), np.uint8))
            bits.append(w)
        return tuple(parts), tuple(bits)
    if enc == 'packed2':
        cuts = [0, min(256, num_p), num_p]
        parts = [jnp_struct((cuts[1], Lp), np.uint16),
                 jnp_struct((num_p - cuts[1], Lp), np.uint8)]
        return tuple(parts), (16, 8)
    if enc == 'u16':
        return jnp_struct((num_p, Lp), np.uint16), None
    return jnp_struct((num_p, Lp), np.float32), None


def main():
    case = sys.argv[1]
    num = int(sys.argv[2]) if len(sys.argv) > 2 else 1011
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 24900

    import jax
    import jax.numpy as jnp
    from hicpeaks_tpu.core import engine as engine_mod
    from hicpeaks_tpu.core import poolplan
    from hicpeaks_tpu.ops import score as score_ops

    num_p = -(-num // 8) * 8
    lane_pad = int(os.environ.get('CP_LANE_PAD', 128))
    Lp = -(-L // lane_pad) * lane_pad
    S = lambda s, d: jax.ShapeDtypeStruct(s, d)
    vec = S((Lp,), np.float32)
    IRs = S((num_p,), np.float32)
    gap = S((Lp,), bool)

    enc = 'packed4'
    if ':' in case:
        case, enc = case.split(':')
    raw_s, bits = shapes_for(num_p, Lp, enc)

    args_built = []
    t0 = time.time()
    if case == 'sheets':
        fn = jax.jit(functools_partial_sheets(score_ops), static_argnames=(
            'ww_min', 'L', 'd_lo', 'd_hi', 'gap_s', 'bits'))
        args_built = [raw_s, vec, vec, IRs, gap]
        lowered = fn.lower(raw_s, vec, vec, IRs, gap, ww_min=3, L=L,
                           d_lo=3, d_hi=1000, gap_s=3, bits=bits)
    elif case == 'unpack':
        def up(raw):
            if isinstance(raw, tuple):
                return jnp.concatenate(
                    [score_ops._unpack_rows(r, b)
                     for r, b in zip(raw, bits)], axis=0)
            return raw.astype(jnp.float32)
        args_built = [raw_s]
        lowered = jax.jit(up).lower(raw_s)
    elif case in ('fused', 'fused-noexact'):
        pw, ww = (1, 2), (3, 5)
        plan = tuple(poolplan.hiccups_pool_plan(list(pw), list(ww), 10))
        wis = tuple(zip(pw, ww))
        args_built = [raw_s, vec, vec, IRs, gap, S((), np.float32),
                      S((), np.int32), S((), np.int32)]
        lowered = engine_mod._fused_hiccups_device.lower(
            raw_s, vec, vec, IRs, gap, S((), np.float32),
            S((), np.int32), S((), np.int32),
            plan=plan, p_list=(1, 2), thr=16, ww_t=ww, wis=wis,
            ww_min=3, L=L, d_lo=3, d_hi=1000, gap_s=3, o_cap=1024,
            keep_cap=engine_mod._KEEP_CAP_FAST, hist_backend='pallas',
            bits=bits, scan_impl='pallas',
            exact_mode=case == 'fused', margin=0.001)
    else:
        raise SystemExit(f'unknown case {case}')
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    line = (f'{case}:{enc} num={num} L={L} lower={t_lower:.1f}s '
            f'compile={t_compile:.1f}s')
    if os.environ.get('CP_SERIALIZE') == '1':
        t0 = time.time()
        try:
            blobs = [compiled.runtime_executable().serialize()]
        except Exception as e:
            blobs = []
            line += f' serialize=FAILED({type(e).__name__})'
        if blobs:
            line += (f' serialize={time.time() - t0:.1f}s '
                     f'({sum(len(b) for b in blobs) / 1e6:.1f}MB)')
    if os.environ.get('CP_EXEC') == '1':
        import jax.numpy as jnp

        def zeros(s):
            return jax.tree_util.tree_map(
                lambda t: jnp.zeros(t.shape, t.dtype), s)
        argz = [zeros(a) for a in args_built]
        t0 = time.time()
        out = compiled(*argz)
        jax.block_until_ready(out)
        t_first = time.time() - t0
        # on the axon backend block_until_ready returns immediately even
        # before the server has finalized/loaded the executable; the first
        # actual D2H read is where the one-time cost surfaces
        t0 = time.time()
        first_leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(first_leaf)
        t_fetch1 = time.time() - t0
        t0 = time.time()
        for _ in range(3):
            out = compiled(*argz)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
        t_steady = (time.time() - t0) / 3
        line += (f' first_exec={t_first:.1f}s first_fetch={t_fetch1:.1f}s '
                 f'steady={t_steady*1e3:.0f}ms')
    print(line, flush=True)


def functools_partial_sheets(score_ops):
    def f(raw, w0, bias, IR, gap, ww_min, L, d_lo, d_hi, gap_s, bits):
        return score_ops._build_sheets_jit(
            raw, w0, bias, IR, gap, ww_min=ww_min, L=L, d_lo=d_lo,
            d_hi=d_hi, gap_s=gap_s, bits=bits)
    return f


if __name__ == '__main__':
    main()
