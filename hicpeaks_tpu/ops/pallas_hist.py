"""Fused (chunk, count) histogram kernel for the lambda-chunk BH table.

``ops/score._chunk_qtab``'s jnp scan expresses the histogram as one-hot
matmuls (the TPU-native scatter-add replacement), but XLA materializes
the [CH, S] and [CH, C] one-hot operands to HBM every step — it cannot
fuse elementwise producers into dot operands — so the scan is HBM-bound:
~84MB of one-hot traffic per 32768-pixel step, hardware-probed at 6.6ms
for a 1.77M-pixel sheet with C=513 on TPU v5e (~5x the MXU bound).

This kernel builds the one-hots in VMEM tile by tile and feeds the MXU
directly; HBM traffic drops to the two int32 key streams (8 bytes per
pixel) plus one [S, C] result write.  Bit-exact with the jnp scan: each
tile's 0/1 bf16 dot accumulates exactly in f32 (tile <= 2^24 pixels),
and the running total is carried in int32 so no bucket ever saturates a
f32 mantissa (ADVICE r1).

Reference semantics being histogrammed: hicpeaks/callers.py:236-287
(lambda-chunked Poisson/BH); the table layout is ops/score._chunk_qtab's.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _choose_tile(S, Cp, vmem_budget=10 * 2 ** 20):
    """Largest pixel-tile width whose one-hot live set fits VMEM."""
    for CH in (8192, 4096, 2048, 1024, 512, 256, 128):
        live = (CH * Cp * 2          # oh_o bf16
                + S * CH * 2         # oh_s bf16
                + 2 * S * Cp * 4     # accumulator + step f32/int32
                + 4 * CH * 4)        # double-buffered key blocks
        if live <= vmem_budget:
            return CH
    return 128


@functools.partial(jax.jit, static_argnames=('S', 'C', 'interpret'))
def chunk_hist_pallas(Oc_p, cid_p, S, C, interpret=False):
    """int32 [S, C] histogram of (chunk id, integer count) pairs.

    ``Oc_p``/``cid_p`` are the int32 [steps, CH] arrays from
    ``ops/score._chunk_pack`` (counts pre-clipped to C-1, invalid pixels
    folded into chunk row 0, padding zeros likewise in row 0).
    """
    Cp = -(-C // 128) * 128
    CH = _choose_tile(S, Cp)
    flat_o = Oc_p.reshape(-1)
    flat_c = cid_p.reshape(-1)
    n = flat_o.size
    # Mosaic blocks need a sublane dimension divisible by 8, so a grid
    # step covers an (8, CH) key tile and the kernel unrolls its 8 rows
    pad = -(-n // (8 * CH)) * (8 * CH) - n
    if pad:
        # zero-padding lands in the (0, 0) trash cell of row 0, which the
        # q-table never serves to a valid pixel (ops/score._chunk_pack)
        flat_o = jnp.pad(flat_o, (0, pad))
        flat_c = jnp.pad(flat_c, (0, pad))
    oc2 = flat_o.reshape(-1, CH)
    cc2 = flat_c.reshape(-1, CH)
    grid = (oc2.shape[0] // 8,)

    def kernel(oc_ref, cc_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        for r in range(8):
            oc = oc_ref[r, :]
            cc = cc_ref[r, :]
            oh_s = (jax.lax.broadcasted_iota(jnp.int32, (S, CH), 0)
                    == cc[None, :]).astype(jnp.bfloat16)
            oh_o = (oc[:, None]
                    == jax.lax.broadcasted_iota(jnp.int32, (CH, Cp), 1)
                    ).astype(jnp.bfloat16)
            step = jnp.dot(oh_s, oh_o, preferred_element_type=jnp.float32)
            out_ref[:] = out_ref[:] + step.astype(jnp.int32)

    hist = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((8, CH), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((S, Cp), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, Cp), jnp.int32),
        interpret=interpret,
    )(oc2, cc2)
    if pad:
        # remove this function's own padding from the (0, 0) trash cell so
        # the result is bit-identical to the jnp scan over Oc_p/cid_p
        hist = hist.at[0, 0].add(-pad)
    return hist[:, :C]
