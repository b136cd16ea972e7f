"""Adversarial combiner check: core/combine.py vs an independent literal
transcription of the reference's combine_annotations
(utilities.py:469-552), over randomized multi-resolution peak sets."""
import numpy as np
from scipy.spatial import distance_matrix

from hicpeaks_tpu.core.combine import combine_annotations


def ref_combine(byres, good_res=10000, mindis=100000, max_res=10000):
    thre1 = 2 * max_res
    thre2 = 5 * max_res
    if len(byres) == 1:
        peak_list = []
        for r in byres:
            for c in byres[r]:
                for p in byres[r][c]:
                    tmp = (c,) + p[:2] + (c,) + p[2:]
                    peak_list.append(tmp)
        return peak_list
    reslist = sorted(byres)
    peak_list = set()
    record = set()
    for i in range(len(reslist) - 1):
        tmp1 = byres[reslist[i]]
        for j in range(i + 1, len(reslist)):
            tmp2 = byres[reslist[j]]
            for c in tmp1:
                if c in tmp2:
                    ref = [(t[0], t[2]) for t in tmp2[c]]
                else:
                    ref = []
                for p in tmp1[c]:
                    key = (c,) + p[:2] + (c,) + p[2:]
                    if key in record:
                        continue
                    if not len(ref):
                        if (reslist[i] <= max_res) and \
                                ((reslist[i] >= good_res) or
                                 (p[2] - p[0] <= mindis)):
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
                            record.add((c,) + tmp2[c][idx][:2] + (c,) +
                                       tmp2[c][idx][2:])
                    else:
                        if (reslist[i] <= max_res) and \
                                ((reslist[i] >= good_res) or
                                 (p[2] - p[0] <= mindis)):
                            peak_list.add(key)
    for c in byres[reslist[-1]]:
        for p in byres[reslist[-1]][c]:
            key = (c,) + p[:2] + (c,) + p[2:]
            if key not in record:
                if (reslist[-1] <= max_res) and \
                        ((reslist[-1] >= good_res) or
                         (p[2] - p[0] <= mindis)):
                    peak_list.add(key)
    return sorted(peak_list)


def _random_byres(rng, resolutions):
    byres = {}
    for res in resolutions:
        chroms = {}
        for c in ('1', '2'):
            n = int(rng.integers(0, 12))
            peaks = []
            for _ in range(n):
                s1 = int(rng.integers(0, 200)) * res
                span = int(rng.integers(2, 40)) * res
                peaks.append((s1, s1 + res, s1 + span, s1 + span + res))
            if peaks:
                chroms[c] = peaks
        byres[res] = chroms
    return byres


def test_combiner_matches_reference_transcription():
    rng = np.random.default_rng(1)
    for trial in range(30):
        resolutions = rng.choice([5000, 10000, 20000, 25000, 40000],
                                 size=rng.integers(1, 4), replace=False)
        byres = _random_byres(rng, [int(r) for r in resolutions])
        for good_res, mindis, max_res in ((10000, 100000, 10000),
                                          (20000, 200000, 25000),
                                          (5000, 50000, 40000)):
            a = combine_annotations({k: {c: list(v) for c, v in d.items()}
                                     for k, d in byres.items()},
                                    good_res=good_res, mindis=mindis,
                                    max_res=max_res)
            b = ref_combine({k: {c: list(v) for c, v in d.items()}
                             for k, d in byres.items()},
                            good_res=good_res, mindis=mindis,
                            max_res=max_res)
            assert sorted(map(tuple, a)) == sorted(map(tuple, b)), \
                f'trial {trial} cfg {(good_res, mindis, max_res)}'
