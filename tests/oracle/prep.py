"""Per-chromosome matrix preparation for the oracle, mirroring the reference
workers (scripts/pyHICCUPS:139-168 / scripts/pyBHFDR:112-141): fetch raw and
balanced sparse matrices, keep the first ``num`` diagonals, per-diagonal
NaN-aware means as the distance-expected IR, inverse-weight bias vectors."""
import numpy as np


def prepare_chrom(clr, chrom, maxapart, maxww, ww_min, weight_name='weight'):
    res = clr.binsize
    H = clr.fetch_sparse(chrom, balance=False)
    cH = clr.fetch_sparse(chrom, balance=weight_name)
    chromLen = H.shape[0]
    num = maxapart // res + maxww + 1

    Md = np.zeros((chromLen, chromLen))
    for d in range(num):
        diag = H.diagonal(d)
        idx = np.arange(chromLen - d)
        Md[idx, idx + d] = diag

    IR = {}
    cMd = np.zeros((chromLen, chromLen))
    for d in range(ww_min, num):
        diag = cH.diagonal(d)
        mask = np.isnan(diag)
        IR[d] = diag[~mask].mean()
        diag = diag.copy()
        diag[mask] = 0
        idx = np.arange(chromLen - d)
        cMd[idx, idx + d] = diag

    w = clr.weights(chrom, weight_name)
    valid = ~((w == 0) | np.isnan(w))
    biases = np.zeros_like(w)
    biases[valid] = 1 / w[valid]
    return dict(Md=Md, cMd=cMd, IR=IR, B=biases, chromLen=chromLen, num=num)
