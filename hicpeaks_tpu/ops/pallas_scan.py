"""Fused Pallas capture-pass kernel (the north-star hot loop).

The jnp ring scan streams ~O(plan * rings) full-array passes through HBM.
This kernel tiles the band into [ROW_TILE, COL_TILE] blocks with
2*maxww halos, DMAs each slab (raw, balanced, expected) into VMEM once,
runs the *same* scan math (ops/scan._scan_core) entirely on-chip, and
writes only the captured background sums back — one HBM read + one write
instead of hundreds of passes.

Round-5 restructure (the "multi-row-per-advance" item of VERDICT r4 #1),
three changes that together lift pass B ~3x:

* **mask-free shifts** — the former roll+iota-mask shift spent ~4 extra
  VPU ops per roll zeroing wrapped lanes.  With halo margins
  Mr, Mc >= 2*maxw the wrap junk provably lands outside every region a
  downstream op reads (see :func:`_shift2_fast`), so the rolls run bare;
* **interior pixel state** — freeze accumulators, captured masks and the
  per-p capture outputs live at [R, T] interior size instead of slab
  size (ops/scan._scan_core ``crop`` mode), shrinking the VMEM live set
  so the tile chooser can afford larger column tiles (less halo
  recompute, fewer grid steps);
* **parallel output DMAs** — each (p, quadrant) capture block writes to
  HBM through its own semaphore; the former single-staging-buffer form
  serialized 4*n_p start/wait round trips per tile.

Grid: (row_tiles, col_tiles).  Inputs stay in HBM/ANY and are sliced with
dynamic DMA (halos overlap, which BlockSpec-blocked pipelines cannot
express).  The `allowed` vector rides in SMEM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import scan as scan_ops


def _shift2_fast(a, dd, dx):
    """out[i, j] = a[i + dd, j + dx] via bare circular rolls — NO masking
    of the wrapped region.

    Correctness: every shifted array in the ring scan is consumed only on
    a restricted domain.  With maxw = max ring radius, margins
    Mr, Mc >= 2*maxw (enforced by the callers' _pad_to(2*maxw, 8/128)),
    and |dd|, |dx| <= maxw:

    * shifted *bands* feed the line-state accumulators, which are only
      read (by ring shifts) over rows [Mr-maxw, Mr+R+maxw) and cols
      [Mc-maxw, Mc+T+maxw); the roll's wrapped junk occupies the first or
      last |dd| rows / |dx| cols, disjoint from that window because
      Mr >= maxw + |dd| and 2*Mr - |dd| >= Mr + maxw (same for columns);
    * shifted *states* feed ring sums consumed (after the interior crop)
      only on rows [Mr, Mr+R) x cols [Mc, Mc+T); their reads reach
      [Mr-r, Mr+R+r) into the state arrays, which is exactly the states'
      valid window, and the wrap junk again sits outside by Mr >= |dd|.

    So the bits that differ from the masked form are never observed —
    tests/test_pallas_scan.py asserts bit-equality against the jnp path's
    pad+slice shifts."""
    n, m = a.shape
    out = a
    if dd:
        out = pltpu.roll(out, (-dd) % n, axis=0)
    if dx:
        out = pltpu.roll(out, (-dx) % m, axis=1)
    return out


#: Mosaic's observed stack allocation exceeds the sum of the kernel's
#: nameable buffers (measured 22.55MB actual vs 14MB counted at tile
#: [96, 512], pass B — the allocator does not reuse every dead slot), so
#: tile choice divides the budget by this safety factor.
_ALLOC_SLOP = 1.9

#: Scoped-VMEM window requested from the compiler.  TPU v5e has 128MiB of
#: VMEM per core; the DEFAULT scoped window is only 16MiB, which is what
#: rejected every round-4 tile above [64, 256] (PASSB_TUNE_r04) — raising
#: ``vmem_limit_bytes`` was hardware-probed OK up to 120MiB.
_VMEM_LIMIT = 110 * 2 ** 20


def _vmem_budget():
    import os
    return int(os.environ.get('HICPEAKS_PALLAS_VMEM', 56)) * 2 ** 20


def _compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _choose_tiles(num_p, Lp, Mr, Mc, slab_arrays, px_arrays,
                  vmem_budget=None):
    """Pick (ROW_TILE, COL_TILE) minimizing halo-overhead subject to the
    kernel's VMEM live set fitting.  ``slab_arrays`` counts buffers at
    (row+2Mr, col+2Mc) halo size (bands, line states, ring cache, Mosaic
    temporaries); ``px_arrays`` counts interior-sized (row, col) buffers
    (candidate mask, freeze/capture accumulators, output staging).  Both
    are calibrated against Mosaic's observed stack allocation on TPU v5e
    (benchmarks/passb_tune.py) together with :data:`_ALLOC_SLOP`.
    HICPEAKS_PALLAS_VMEM (MiB) overrides the budget for tuning."""
    if vmem_budget is None:
        vmem_budget = _vmem_budget()
    budget = vmem_budget / _ALLOC_SLOP
    # a row tile covering the whole band (plus alignment) avoids both the
    # second row-pass and its halo recompute — include it as a candidate
    rows = sorted({512, 384, 256, 192, 128, 96, 64, 48, 32, 16, 8,
                   min(_pad_to(max(num_p, 8), 8), 1024)}, reverse=True)
    best = None
    for col in (4096, 3072, 2048, 1536, 1024, 768, 512, 384, 256, 128):
        for row in rows:
            if (row > _pad_to(max(num_p, 8), 8)
                    or col > _pad_to(max(Lp, 128), 128)):
                continue
            slab = (row + 2 * Mr) * (col + 2 * Mc) * 4
            live = slab_arrays * slab + px_arrays * row * col * 4
            if live > budget:
                continue
            # effective work per interior pixel, including row/col padding
            # of the LAST tile (num_p/Lp rarely divide the tile exactly)
            n_r = -(-max(num_p, 1) // row)
            n_c = -(-max(Lp, 1) // col)
            overhead = ((row + 2 * Mr) * (col + 2 * Mc) * n_r * n_c
                        / (max(num_p, 1) * max(Lp, 1)))
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
    kernel DMAs one halo slab (raw) plus the interior candidate mask per
    tile, runs the shared scan math with Q-only ring states at interior
    pixel size, reduces each entry's newly-frozen mask, and accumulates
    the per-entry counts in SMEM scalars across the (sequential) grid."""
    num_p, Lp = raw.shape
    M = scan_ops._row_margin(plan)
    Mr = _pad_to(M, 8)
    Mc = _pad_to(M, 128)
    n_e = len(plan)
    # slab live set: raw band + 2 Q-side line states + ring cache + Mosaic
    # temporaries; interior: cand + freeze accumulator + per-p captured +
    # slop (calibrated on hardware, benchmarks/passb_tune.py)
    R, T = _choose_tiles(num_p, Lp, Mr, Mc, 9, 6 + len(p_list))

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
    crop = lambda a: a[Mr:Mr + R, Mc:Mc + T]

    def kernel(raw_ref, cand_ref, out_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when((i == 0) & (j == 0))
        def _init():
            for k in range(n_e):
                out_ref[k] = 0

        def body(s_raw, s_cand, sems):
            d_raw = pltpu.make_async_copy(
                raw_ref.at[pl.ds(i * R, R + 2 * Mr),
                           pl.ds(j * T, T + 2 * Mc)], s_raw, sems.at[0])
            d_cand = pltpu.make_async_copy(
                cand_ref.at[pl.ds(i * R + Mr, R),
                            pl.ds(j * T + Mc, T)], s_cand, sems.at[1])
            d_raw.start()
            d_cand.start()
            d_raw.wait()
            d_cand.wait()

            cand = s_cand[:] != 0
            counts = scan_ops._scan_core(
                s_raw[:], None, None, cand, plan, p_list, thr,
                [True] * n_e, False, shift_fn=_shift2_fast, crop=crop)
            for k in range(n_e):
                out_ref[k] = out_ref[k] + counts[k]

        pl.run_scoped(
            body,
            s_raw=pltpu.VMEM(slab_shape, dtype),
            s_cand=pltpu.VMEM((R, T), dtype),
            sems=pltpu.SemaphoreType.DMA((2,)),
        )

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((n_e,), jnp.int32),
        compiler_params=_compiler_params(),
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
    # slab live set: 3 bands + 10 line states (c/e K+Q, m Q-only) + ring
    # cache + Mosaic temporaries; interior: cand + 5 accumulators +
    # captured/newly per p + 4*n_p outputs + 4*n_p DMA staging + slop
    R, T = _choose_tiles(num_p, Lp, Mr, Mc, 19, 10 + 10 * n_p)

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
    crop = lambda a: a[Mr:Mr + R, Mc:Mc + T]
    n_out = 4 * n_p

    def kernel(allowed_ref, raw_ref, cband_ref, eband_ref, cand_ref,
               *out_refs):
        i = pl.program_id(0)
        j = pl.program_id(1)

        def body(s_raw, s_c, s_e, s_cand, s_out, sems, out_sems):
            copies = []
            for k, (src, dst) in enumerate(((raw_ref, s_raw),
                                            (cband_ref, s_c),
                                            (eband_ref, s_e))):
                dma = pltpu.make_async_copy(
                    src.at[pl.ds(i * R, R + 2 * Mr),
                           pl.ds(j * T, T + 2 * Mc)],
                    dst, sems.at[k])
                dma.start()
                copies.append(dma)
            d_cand = pltpu.make_async_copy(
                cand_ref.at[pl.ds(i * R + Mr, R),
                            pl.ds(j * T + Mc, T)], s_cand, sems.at[3])
            d_cand.start()
            copies.append(d_cand)
            for dma in copies:
                dma.wait()

            cand = s_cand[:] != 0
            # SMEM only supports scalar loads; the plan is static so read
            # each entry's gate individually
            allowed_vec = [allowed_ref[k] != 0 for k in range(len(plan))]

            _, _, outs = scan_ops._scan_core(
                s_raw[:], s_c[:], s_e[:], cand, plan, p_list, thr,
                allowed_vec, True, shift_fn=_shift2_fast, crop=crop)
            # captures are interior-sized already; stage each block in
            # VMEM and fly all 4*n_p output DMAs in parallel, one
            # semaphore per block
            out_dmas = []
            for pi, p in enumerate(p_list):
                for t in range(4):
                    k = pi * 4 + t
                    s_out[k] = outs[p][t]
                    dma = pltpu.make_async_copy(
                        s_out.at[k],
                        out_refs[k].at[pl.ds(i * R, R), pl.ds(j * T, T)],
                        out_sems.at[k])
                    dma.start()
                    out_dmas.append(dma)
            for dma in out_dmas:
                dma.wait()

        pl.run_scoped(
            body,
            s_raw=pltpu.VMEM(slab_shape, dtype),
            s_c=pltpu.VMEM(slab_shape, dtype),
            s_e=pltpu.VMEM(slab_shape, dtype),
            s_cand=pltpu.VMEM((R, T), dtype),
            s_out=pltpu.VMEM((n_out, R, T), dtype),
            sems=pltpu.SemaphoreType.DMA((4,)),
            out_sems=pltpu.SemaphoreType.DMA((n_out,)),
        )

    # tag outputs with an explicit HBM memory space: without it XLA's
    # memory assignment may place the whole result tuple in scoped VMEM
    out_shapes = [pltpu.HBM((num_pad, col_pad), dtype)
                  for _ in range(n_out)]
    out_specs = [pl.BlockSpec(memory_space=pltpu.HBM)
                 for _ in range(n_out)]

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
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(allowed_i, raw_p, cband_p, eband_p, cand_p)

    result = {}
    for pi, p in enumerate(p_list):
        result[p] = [o[:num_p, :Lp] for o in outs_flat[pi * 4:pi * 4 + 4]]
    return result
