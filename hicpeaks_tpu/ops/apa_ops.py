"""Aggregate Peak Analysis, batched on device.

Replaces the reference's per-loop dense slicing (hicpeaks/apa.py:11-28)
with one gather of all (2w+1)^2 windows from the band tensor followed by
vectorized normalization and scoring (hicpeaks/apa.py:30-46); BASELINE
config 5 ("APA scoring on-device").
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import ndtr


def band_window_gather(band, xs, ys, w):
    """windows[k, i, j] = M[xs[k]-w+i, ys[k]-w+j] from the symmetric matrix
    stored as an upper band [num, L]: M[a, b] = band[|b-a|, min(a, b)]."""
    num_p, Lp = band.shape
    off = jnp.arange(-w, w + 1)
    a = xs[:, None, None] + off[None, :, None]
    b = ys[:, None, None] + off[None, None, :]
    d = jnp.abs(b - a)
    x = jnp.minimum(a, b)
    valid = (a >= 0) & (b >= 0) & (x < Lp) & (d < num_p)
    dd = jnp.clip(d, 0, num_p - 1)
    xx = jnp.clip(x, 0, Lp - 1)
    vals = band[dd, xx]
    return jnp.where(valid, vals, 0.0)


@functools.partial(jax.jit, static_argnames=('w', 'L'))
def apa_windows(band, nanband, xs, ys, w, L):
    """Per-loop normalized windows plus their validity, mirroring
    apa.py:16-26: windows fully inside the matrix, no NaN cells, nonzero
    mean; each window divided by its own mean."""
    wins = band_window_gather(band, xs, ys, w)
    nanwins = band_window_gather(nanband, xs, ys, w)
    inside = (xs - w >= 0) & (ys - w >= 0) & (xs + w + 1 <= L) & \
        (ys + w + 1 <= L)
    has_nan = jnp.sum(nanwins, axis=(1, 2)) > 0
    means = jnp.mean(wins, axis=(1, 2))
    ok = inside & ~has_nan & (means != 0)
    norm = wins / jnp.where(means == 0, 1.0, means)[:, None, None]
    return norm, ok, means


def apa_analysis(apa_stack, w=5, cw=3):
    """Score the stacked windows (reference apa.py:30-46): trim windows
    whose mean normalized value is outside the 1-99 percentile band, then
    APA score = center / lower-left corner mean, z/p against the corner
    distribution, and the conventional vmax heuristic."""
    apa_stack = np.asarray(apa_stack)
    mean_arr = apa_stack.mean(axis=(1, 2))
    p99 = np.percentile(mean_arr, 99)
    p1 = np.percentile(mean_arr, 1)
    mask = (mean_arr < p99) & (mean_arr > p1)
    avg = apa_stack[mask].mean(axis=0)
    lowerpart = avg[-cw:, :cw]
    upperpart = avg[:cw, -cw:]
    maxi = upperpart.mean() * 5
    score = avg[w, w] / lowerpart.mean()
    z = (avg[w, w] - lowerpart.mean()) / lowerpart.std()
    p = 1 - ndtr(z)
    return avg, score, z, p, maxi
