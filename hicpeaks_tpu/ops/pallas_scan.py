"""Fused Pallas capture-pass kernel (the north-star hot loop).

The jnp ring scan streams ~O(plan * rings) full-array passes through HBM.
This kernel tiles the band into [ROW_TILE, COL_TILE] blocks with
2*maxww halos, DMAs each slab (raw, balanced, expected, candidate mask)
into VMEM once, runs the *same* scan math (ops/scan._scan_core) entirely
on-chip, and writes only the captured background sums back — one HBM read
+ one write instead of hundreds of passes.

Grid: (row_tiles, col_tiles).  Inputs stay in HBM/ANY and are sliced with
dynamic DMA (halos overlap, which BlockSpec-blocked pipelines cannot
express).  The `allowed` vector rides in SMEM.  Tile sizes are chosen so
the ~(4 slabs + 10 ring states + 5 accumulators + 4*n_p captures) live
set fits VMEM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import scan as scan_ops


def _shift2_roll(a, dd, dx):
    """Mosaic-friendly shift: circular roll + zero-mask of the wrapped
    region (pad+slice lowers to unaligned concats Mosaic rejects)."""
    n, m = a.shape
    out = a
    if dd:
        out = pltpu.roll(out, (-dd) % n, axis=0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)
        out = jnp.where((rows + dd >= 0) & (rows + dd < n), out, 0)
    if dx:
        out = pltpu.roll(out, (-dx) % m, axis=1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)
        out = jnp.where((cols + dx >= 0) & (cols + dx < m), out, 0)
    return out


def _choose_tiles(num_p, Lp, Mr, Mc, live_arrays, vmem_budget=None):
    """Pick (ROW_TILE, COL_TILE) minimizing halo-overhead subject to the
    kernel's VMEM live set fitting.  ``live_arrays`` is the caller's
    slab-sized buffer count, calibrated against Mosaic's observed stack
    allocation (pass B: ~47 for a single-p plan — bands + line states +
    accumulators + captures + DMA double-buffering slop).
    HICPEAKS_PALLAS_VMEM (MiB) overrides the budget for tuning."""
    if vmem_budget is None:
        import os
        vmem_budget = int(os.environ.get('HICPEAKS_PALLAS_VMEM', 12)) * 2 ** 20
    best = None
    for col in (2048, 1536, 1024, 768, 512, 384, 256, 128):
        for row in (512, 384, 256, 192, 128, 96, 64, 48, 32, 16, 8):
            if row > max(num_p, 8) or col > max(Lp, 128):
                continue
            slab = (row + 2 * Mr) * (col + 2 * Mc) * 4
            if live_arrays * slab > vmem_budget:
                continue
            overhead = (row + 2 * Mr) * (col + 2 * Mc) / (row * col)
            if best is None or overhead < best[0]:
                best = (overhead, row, col)
    if best is None:
        return 8, 128
    return best[1], best[2]


def _pad_to(x, mult):
    return (x + mult - 1) // mult * mult


@functools.partial(jax.jit, static_argnames=('plan', 'p_list', 'thr',
                                             'interpret'))
def scan_pass_a_pallas(raw, cand_mask, plan, p_list, thr, interpret=False):
    """Fused freeze-count pass: per-entry freshly-frozen pixel counts.

    Drop-in replacement for scan_ops.scan_pass_a.  Pass A only replays the
    raw lower-left 'Reads' state (reference callers.py:203-232), so the
    kernel DMAs two slabs (raw, candidate mask) per tile, runs the shared
    scan math with Q-only ring states, reduces each entry's newly-frozen
    mask over the tile interior, and accumulates the per-entry counts in
    SMEM scalars across the (sequential) grid.  One HBM read of the band
    instead of the jnp path's ~O(plan) full-array passes."""
    num_p, Lp = raw.shape
    M = scan_ops._row_margin(plan)
    Mr = _pad_to(M, 8)
    Mc = _pad_to(M, 128)
    n_e = len(plan)
    # live set: 2 slabs + 2 Q-side line states + reads accumulator +
    # per-p captured masks + shift temporaries (calibrated vs pass B's 44)
    R, T = _choose_tiles(num_p, Lp, Mr, Mc, 12 + 2 * len(p_list))

    num_pad = _pad_to(num_p, R)
    col_pad = _pad_to(Lp, T)
    grid = (num_pad // R, col_pad // T)

    def prep(a):
        return jnp.pad(a, ((Mr, Mr + num_pad - num_p),
                           (Mc, Mc + col_pad - Lp)))

    raw_p = prep(raw)
    cand_p = prep(cand_mask.astype(raw.dtype))
    slab_shape = (R + 2 * Mr, T + 2 * Mc)
    dtype = raw.dtype

    def kernel(raw_ref, cand_ref, out_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when((i == 0) & (j == 0))
        def _init():
            for k in range(n_e):
                out_ref[k] = 0

        def body(s_raw, s_cand, sems):
            copies = []
            for k, (src, dst) in enumerate(((raw_ref, s_raw),
                                            (cand_ref, s_cand))):
                dma = pltpu.make_async_copy(
                    src.at[pl.ds(i * R, R + 2 * Mr),
                           pl.ds(j * T, T + 2 * Mc)],
                    dst, sems.at[k])
                dma.start()
                copies.append(dma)
            for dma in copies:
                dma.wait()

            rows = jax.lax.broadcasted_iota(jnp.int32, slab_shape, 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, slab_shape, 1)
            interior = ((rows >= Mr) & (rows < Mr + R) &
                        (cols >= Mc) & (cols < Mc + T))
            cand = (s_cand[:] != 0) & interior

            counts = scan_ops._scan_core(
                s_raw[:], None, None, cand, plan, p_list, thr,
                [True] * n_e, False, shift_fn=_shift2_roll)
            for k in range(n_e):
                out_ref[k] = out_ref[k] + counts[k]

        pl.run_scoped(
            body,
            s_raw=pltpu.VMEM(slab_shape, dtype),
            s_cand=pltpu.VMEM(slab_shape, dtype),
            sems=pltpu.SemaphoreType.DMA((2,)),
        )

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((n_e,), jnp.int32),
        interpret=interpret,
    )(raw_p, cand_p)


@functools.partial(jax.jit, static_argnames=('plan', 'p_list', 'thr',
                                             'interpret'))
def scan_pass_b_pallas(raw, cband, eband, cand_mask, allowed, plan, p_list,
                       thr, interpret=False):
    """Drop-in replacement for scan_ops.scan_pass_b's capture outputs
    (freeze counts come from pass A, so they are not re-emitted here).
    Returns {p: [KS, KE, YS, YE]} dense [num_p, Lp] arrays."""
    num_p, Lp = raw.shape
    M = scan_ops._row_margin(plan)
    # Mosaic DMA slices must respect the (8, 128) tiling: round the halo
    # margins up so every slab size and offset stays aligned
    Mr = _pad_to(M, 8)
    Mc = _pad_to(M, 128)
    n_p = len(p_list)
    R, T = _choose_tiles(num_p, Lp, Mr, Mc, 44 + 8 * n_p)

    num_pad = _pad_to(num_p, R)
    col_pad = _pad_to(Lp, T)
    grid = (num_pad // R, col_pad // T)

    def prep(a, fill=0):
        a = jnp.pad(a, ((Mr, Mr + num_pad - num_p), (Mc, Mc + col_pad - Lp)),
                    constant_values=fill)
        return a

    raw_p = prep(raw)
    cband_p = prep(cband)
    eband_p = prep(eband)
    cand_p = prep(cand_mask.astype(raw.dtype))
    allowed_i = allowed.astype(jnp.int32)

    slab_shape = (R + 2 * Mr, T + 2 * Mc)
    dtype = raw.dtype

    def kernel(allowed_ref, raw_ref, cband_ref, eband_ref, cand_ref,
               *out_refs):
        i = pl.program_id(0)
        j = pl.program_id(1)

        def body(s_raw, s_c, s_e, s_cand, s_out, sems, out_sem):
            copies = []
            for k, (src, dst) in enumerate(((raw_ref, s_raw),
                                            (cband_ref, s_c),
                                            (eband_ref, s_e),
                                            (cand_ref, s_cand))):
                dma = pltpu.make_async_copy(
                    src.at[pl.ds(i * R, R + 2 * Mr),
                           pl.ds(j * T, T + 2 * Mc)],
                    dst, sems.at[k])
                dma.start()
                copies.append(dma)
            for dma in copies:
                dma.wait()

            rows = jax.lax.broadcasted_iota(jnp.int32, slab_shape, 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, slab_shape, 1)
            interior = ((rows >= Mr) & (rows < Mr + R) &
                        (cols >= Mc) & (cols < Mc + T))
            cand = (s_cand[:] != 0) & interior
            # SMEM only supports scalar loads; the plan is static so read
            # each entry's gate individually
            allowed_vec = [allowed_ref[k] != 0 for k in range(len(plan))]

            _, _, outs = scan_ops._scan_core(
                s_raw[:], s_c[:], s_e[:], cand, plan, p_list, thr,
                allowed_vec, True, shift_fn=_shift2_roll)
            # outputs live in HBM (keeping full results out of scoped VMEM);
            # write each block via DMA from a small staging buffer
            for pi, p in enumerate(p_list):
                for t in range(4):
                    s_out[:, :] = outs[p][t][Mr:Mr + R, Mc:Mc + T]
                    dma = pltpu.make_async_copy(
                        s_out,
                        out_refs[pi * 4 + t].at[pl.ds(i * R, R),
                                                pl.ds(j * T, T)],
                        out_sem)
                    dma.start()
                    dma.wait()

        pl.run_scoped(
            body,
            s_raw=pltpu.VMEM(slab_shape, dtype),
            s_c=pltpu.VMEM(slab_shape, dtype),
            s_e=pltpu.VMEM(slab_shape, dtype),
            s_cand=pltpu.VMEM(slab_shape, dtype),
            s_out=pltpu.VMEM((R, T), dtype),
            sems=pltpu.SemaphoreType.DMA((4,)),
            out_sem=pltpu.SemaphoreType.DMA(()),
        )

    # tag outputs with an explicit HBM memory space: without it XLA's
    # memory assignment may place the whole result tuple in scoped VMEM
    out_shapes = [pltpu.HBM((num_pad, col_pad), dtype)
                  for _ in range(4 * n_p)]
    out_specs = [pl.BlockSpec(memory_space=pltpu.HBM)
                 for _ in range(4 * n_p)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 4,
        out_specs=out_specs,
    )

    outs_flat = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(allowed_i, raw_p, cband_p, eband_p, cand_p)

    result = {}
    for pi, p in enumerate(p_list):
        result[p] = [o[:num_p, :Lp] for o in outs_flat[pi * 4:pi * 4 + 4]]
    return result
