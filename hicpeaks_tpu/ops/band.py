"""Diagonal-band tensor construction.

The TPU engine's core data structure replaces the reference's per-diagonal
scipy sparse matrices (scripts/pyHICCUPS:146-159) with dense band tensors
``band[d, x] = M[x, x + d]`` of shape [num_diags, L]:

* ``raw``   — raw counts, diagonals 0..num-1            (reference ``M``)
* ``cband`` — ICE-balanced counts, diagonals ww..num-1, NaN zeroed
              (reference ``cM``)
* ``IR``    — per-diagonal NaN-aware mean of the balanced matrix, the
              distance-decay expected (scripts/pyHICCUPS:150-158)
* ``bias``  — 1/weight with invalid bins zeroed (scripts/pyHICCUPS:163-166)

The NaN-mean semantics mirror the sparse fetch exactly: an entry is "NaN"
only where a *nonzero raw pixel* meets an invalid weight; structural zeros
count toward the mean's denominator.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np


def _round_up(x, m):
    return (x + m - 1) // m * m


@dataclass
class ChromBands:
    raw: np.ndarray        # [num_p, Lp]
    cband: np.ndarray      # [num_p, Lp]
    IR: np.ndarray         # [num_p]
    bias: np.ndarray       # [Lp]
    L: int                 # true chromosome length in bins
    num: int               # true number of diagonals kept
    res: int
    chrom: str = ''


def build_bands(bin1, bin2, count, weights, L, num, ww_min, res, chrom='',
                dtype=np.float32, lane_pad=128, sublane_pad=8) -> ChromBands:
    """Scatter upper-triangle pixels into zero-padded band tensors.

    Shapes are padded to TPU-friendly multiples; padding is semantically
    transparent because all engine reads treat out-of-band positions as
    zero, exactly like the reference's zero-extended diagonals
    (callers.py:50-64).
    """
    Lp = _round_up(max(L, 1), lane_pad)
    num_p = _round_up(max(num, 1), sublane_pad)

    d = (bin2 - bin1).astype(np.int64)
    sel = (d >= 0) & (d < num)
    b1, dd, ct = bin1[sel], d[sel], count[sel].astype(np.float64)

    raw = np.zeros((num_p, Lp), np.float64)
    raw[dd, b1] = ct

    w = np.asarray(weights, np.float64)
    wprod = w[b1] * w[b1 + dd]
    cvals = ct * wprod
    nanmask_vals = np.isnan(wprod)

    cband = np.zeros((num_p, Lp), np.float64)
    cband[dd, b1] = np.where(nanmask_vals, 0.0, cvals)

    # NaN-aware per-diagonal means over the true extent [0, L-d)
    nan_counts = np.zeros(num_p, np.int64)
    np.add.at(nan_counts, dd[nanmask_vals], 1)
    diag_len = np.maximum(L - np.arange(num_p), 0)
    denom = diag_len - nan_counts
    with np.errstate(invalid='ignore', divide='ignore'):
        IR = cband.sum(axis=1) / denom
    IR[:ww_min] = 0.0
    IR[num:] = 0.0
    cband[:ww_min, :] = 0.0

    valid = ~((w == 0) | np.isnan(w))
    bias = np.zeros(Lp, np.float64)
    bias[:L][valid] = 1.0 / w[valid]

    return ChromBands(raw=raw.astype(dtype), cband=cband.astype(dtype),
                      IR=IR.astype(dtype), bias=bias.astype(dtype),
                      L=L, num=num, res=res, chrom=chrom)


def bands_from_cooler(clr, chrom, maxapart, maxww, ww_min, dtype=np.float32,
                      weight_name='weight', lane_pad=128) -> ChromBands:
    """One-stop chromosome loader mirroring the reference worker's prep
    (scripts/pyHICCUPS:139-168): num = maxapart//res + maxww + 1.
    ``lane_pad`` buckets the padded width (e.g. 4096) so chromosomes of
    similar size share compiled programs."""
    res = clr.binsize
    lo, hi = clr.bin_range(chrom)
    L = hi - lo
    num = maxapart // res + maxww + 1
    b1, b2, ct = clr.pixels_for_chrom(chrom)
    w = clr.weights(chrom, weight_name)
    return build_bands(b1, b2, ct, w, L, num, ww_min, res,
                       chrom=chrom.lstrip('chr'), dtype=dtype,
                       lane_pad=lane_pad)
