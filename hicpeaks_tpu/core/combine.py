"""Multi-resolution peak combination (reference utilities.py:469-552).

Controller-side: peak lists are small.  Matches across resolution pairs by
anchor-distance (thre1 = 2*max_res when both resolutions are finer than
that, else thre2 = 5*max_res); keeps fine-resolution coordinates, records
matched coarse peaks as redundant, and filters unconfirmed fine-res peaks
unless the resolution is trustworthy (>= good_res) or the loci are close
(span <= mindis).  Single-resolution input passes straight through.
"""
from __future__ import annotations

import numpy as np
from scipy.spatial import distance_matrix


def combine_annotations(byres, good_res=10000, mindis=100000, max_res=10000):
    thre1 = 2 * max_res
    thre2 = 5 * max_res
    if len(byres) == 1:
        peak_list = []
        for r in byres:
            for c in byres[r]:
                for p in byres[r][c]:
                    peak_list.append((c,) + tuple(p[:2]) + (c,) + tuple(p[2:]))
        return peak_list

    reslist = sorted(byres)
    peak_list = set()
    record = set()
    for i in range(len(reslist) - 1):
        fine = byres[reslist[i]]
        for j in range(i + 1, len(reslist)):
            coarse = byres[reslist[j]]
            for c in fine:
                ref = [(t[0], t[2]) for t in coarse.get(c, [])]
                for p in fine[c]:
                    key = (c,) + tuple(p[:2]) + (c,) + tuple(p[2:])
                    if key in record:
                        continue
                    keep_unconfirmed = (
                        reslist[i] <= max_res and
                        (reslist[i] >= good_res or (p[2] - p[0]) <= mindis))
                    if not ref:
                        if keep_unconfirmed:
                            peak_list.add(key)
                        continue
                    dis = distance_matrix([(p[0], p[2])], ref).ravel()
                    if reslist[i] < thre1 and reslist[j] < thre1:
                        mask = dis <= thre1
                    else:
                        mask = dis <= thre2
                    if mask.sum() > 0:
                        peak_list.add(key)
                        for idx in np.where(mask)[0]:
                            t = coarse[c][idx]
                            record.add((c,) + tuple(t[:2]) + (c,) + tuple(t[2:]))
                    elif keep_unconfirmed:
                        peak_list.add(key)

    coarsest = reslist[-1]
    for c in byres[coarsest]:
        for p in byres[coarsest][c]:
            key = (c,) + tuple(p[:2]) + (c,) + tuple(p[2:])
            if key not in record:
                if coarsest <= max_res and \
                        (coarsest >= good_res or (p[2] - p[0]) <= mindis):
                    peak_list.add(key)
    return sorted(peak_list)
