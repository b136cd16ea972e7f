"""Fused (chunk, count) histogram kernel for the lambda-chunk BH table.

``ops/score._chunk_qtab``'s jnp scan expresses the histogram as one-hot
matmuls (the TPU-native scatter-add replacement), but XLA materializes
the [CH, S] and [CH, C] one-hot operands to HBM every step — it cannot
fuse elementwise producers into dot operands — so the scan is HBM-bound.

This kernel builds the one-hots in VMEM tile by tile and feeds the MXU
directly.  Round-5 formulation (hardware-profiled: the round-4 kernel's
[S, CH] x [CH, C] step matmuls had M = S = 40..128 rows, wasting up to
69% of the systolic array, and its 8 small matmuls per step paid per-op
overhead): the count splits as O = hi*W + lo with W = 128 lanes, and the
histogram becomes ONE matmul per K-chunk over the COMBINED row key
``k = cid*H + hi`` —

    hist3[s*H + hi, lo] = sum_p  onehot_k[p, s*H+hi] * onehot_lo[p, lo]

with M = S*H rows (>= 128 for any C > 256) and N = W = 128 columns, both
matching the 128x128 MXU.  Reshaping [S*H, W] -> [S, H*W] and cropping
to C recovers the exact histogram.  Bit-exact with the jnp scan: each
0/1 bf16 dot accumulates exactly in f32 (K-chunks <= 2^24 pixels), and
the running total is carried in int32 so no bucket ever saturates a f32
mantissa (ADVICE r1).

Entries with cid >= S one-hot to nothing (key >= S*H) — callers use
cid = S as an explicit "contribute nowhere" sentinel
(ops/score.chunk_hist_split's masked compaction tail).

Reference semantics being histogrammed: hicpeaks/callers.py:236-287
(lambda-chunked Poisson/BH); the table layout is ops/score._chunk_qtab's.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_W = 128          # count lanes per combined row (the MXU's native width)
_KSUB = 8192      # pixels per inner matmul (K dimension)


@functools.partial(jax.jit, static_argnames=('S', 'C', 'interpret'))
def chunk_hist_pallas(Oc_p, cid_p, S, C, interpret=False):
    """int32 [S, C] histogram of (chunk id, integer count) pairs.

    ``Oc_p``/``cid_p`` are the int32 [steps, CH] arrays from
    ``ops/score._chunk_pack`` (counts pre-clipped to C-1, invalid pixels
    folded into chunk row 0, padding zeros likewise in row 0).
    """
    H = -(-C // _W)
    SH = S * H
    flat_o = Oc_p.reshape(-1)
    flat_c = cid_p.reshape(-1)
    n = flat_o.size
    # keys stream through VMEM in (ROWS, KSUB) blocks; one grid step
    # covers ROWS inner matmuls.  Only one row's one-hot pair is live at
    # a time (the inner loop), so the live set is ~KSUB*(SH+W)*2 bytes of
    # one-hots + the key blocks + the [SH, W] accumulators — well under
    # the raised VMEM window for any S*H this caller produces.  ROWS must
    # be a multiple of 8 (sublane-divisible block shape).
    rows = 16
    step_px = rows * _KSUB
    pad = -(-n // step_px) * step_px - n
    if pad:
        # zero-padding lands in the (0, 0) trash cell of row 0, which the
        # q-table never serves to a valid pixel (ops/score._chunk_pack)
        flat_o = jnp.pad(flat_o, (0, pad))
        flat_c = jnp.pad(flat_c, (0, pad))
    oc2 = flat_o.reshape(-1, _KSUB)
    cc2 = flat_c.reshape(-1, _KSUB)
    grid = (oc2.shape[0] // rows,)

    def kernel(oc_ref, cc_ref, out_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        # fori_loop (not an unrolled Python loop): Mosaic's stack
        # allocator keeps every unrolled iteration's one-hot pair live
        # simultaneously (hardware-probed 109MB at 16 rows), while the
        # loop form reuses one iteration's buffers
        def row_body(r, carry):
            oc = oc_ref[pl.ds(r, 1), :]                      # [1, KSUB]
            cc = cc_ref[pl.ds(r, 1), :]
            key = cc * H + jax.lax.div(oc, jnp.int32(_W))
            lo = jax.lax.rem(oc, jnp.int32(_W))
            # one-hots in NATURAL orientation — pixels along lanes, the
            # bucket axis along sublanes — so no lane->sublane transpose
            # of the key row is ever materialized (hardware-probed: the
            # [1,K]->[K,1] reshape form relayouts per iteration); the
            # dot contracts both operands' LANE axes (an NT matmul, which
            # the MXU takes directly)
            oh_k = (jnp.broadcast_to(key, (SH, _KSUB))
                    == jax.lax.broadcasted_iota(jnp.int32, (SH, _KSUB), 0)
                    ).astype(jnp.bfloat16)
            oh_lo = (jnp.broadcast_to(lo, (_W, _KSUB))
                     == jax.lax.broadcasted_iota(jnp.int32, (_W, _KSUB), 0)
                     ).astype(jnp.bfloat16)
            step = jax.lax.dot_general(
                oh_k, oh_lo, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_ref[:] = acc_ref[:] + step.astype(jnp.int32)
            return carry

        jax.lax.fori_loop(0, rows, row_body, 0)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            out_ref[:] = acc_ref[:]

    hist3 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((rows, _KSUB), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((SH, _W), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((SH, _W), jnp.int32),
        scratch_shapes=[pltpu.VMEM((SH, _W), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(oc2, cc2)
    hist = hist3.reshape(S, H * _W)
    if pad:
        # remove this function's own padding from the (0, 0) trash cell so
        # the result is bit-identical to the jnp scan over Oc_p/cid_p
        hist = hist.at[0, 0].add(-pad)
    return hist[:, :C]
