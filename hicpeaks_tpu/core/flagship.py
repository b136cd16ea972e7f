"""Flagship single-shot device step: the full hiccups scoring pipeline
(widening ring scan -> background capture -> corrected expectations ->
lambda-chunk Poisson p-values -> segmented BH -> gap filter) as one
jittable function.  Used by the graft entry point and the benchmark; the
chromosome-level engine (core/engine.py) runs the same pieces with a
controller round-trip for the freeze bookkeeping."""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import scan as scan_ops
from ..ops import score as score_ops


@functools.partial(jax.jit,
                   static_argnames=('plan', 'p_list', 'thr', 'pairs', 'L'))
def hiccups_device_step(raw, cband, eband, IR, Bprod, cand, allowed, gap_drop,
                        plan, p_list, thr, pairs, L, sig=0.05):
    """One full device pass over a chromosome band.  Returns per-(p,w) pair
    dicts of dense q-values and keep-masks for both backgrounds, plus the
    freeze counts for the controller.  ``Bprod``/``gap_drop`` are
    host-precomputed sheets (ops/score.py) so the graph stays gather-free."""
    counts, captured, outs = scan_ops._scan(
        raw, cband, eband, cand, plan, p_list, thr, allowed, True)

    results = {}
    for (p, w) in pairs:
        KS, KE, YS, YE = outs[p]
        pair_out = {}
        for fl, (bSV, bEV) in (('K', (KS, KE)), ('Y', (YS, YE))):
            E, O, ICE, Fold, scored, prod = score_ops.expected_observed(
                raw, cband, IR, Bprod, bSV, bEV, w, cand, L)
            cid, rv, valid = score_ops.lambda_chunks(E, scored)
            pval = jnp.where(valid, score_ops.poisson_sf(O, rv), 1.0)
            qval = score_ops.segmented_bh(pval, cid, valid)
            keep = scored & (qval <= sig) & ~gap_drop
            pair_out[fl] = dict(q=qval, p=pval, keep=keep, E=E, Fold=Fold)
        results[(p, w)] = pair_out
    return counts, results


def demo_inputs(L=512, num=96, seed=0, dtype='float32'):
    """Small synthetic band inputs for compile checks and smoke runs."""
    import numpy as np
    from ..io.synth import synthesize_chrom
    from ..ops.band import build_bands

    res = 10000
    b1, b2, ct, _, bias_vec = synthesize_chrom(
        n_bins=L, res=res, seed=seed, depth=40.0, n_loops=10,
        max_loop_span_bins=min(64, num - 16))
    w = np.full(L, np.nan)
    ok = bias_vec > 0
    w[ok] = 1.0 / bias_vec[ok]
    return build_bands(b1, b2, ct, w, L, num, 3, res, dtype=np.dtype(dtype))
