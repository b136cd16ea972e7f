"""ICE balancing: the on-device implementation against an independent
dense NumPy reference of the same algorithm (cooler's cis-only iterative
correction semantics: ignore-diag zeroing, min_nnz/mad_max filters,
scale-free convergence, sqrt-rescaled bias, NaN at filtered bins)."""
import numpy as np
import pytest

from hicpeaks_tpu.ops.ice import ice_balance_chrom


def _numpy_ice(S, ignore_diags=1, mad_max=5, min_nnz=10, min_count=0,
               tol=1e-5, max_iters=200):
    """Dense symmetric reference implementation."""
    S = S.copy()
    n = S.shape[0]
    for d in range(-ignore_diags + 1, ignore_diags):
        idx = np.arange(n - abs(d))
        S[idx + max(-d, 0), idx + max(d, 0)] = 0

    nnz = (S != 0).sum(axis=1)
    marg0 = S.sum(axis=1)
    mask = np.ones(n, bool)
    if min_nnz > 0:
        mask &= nnz >= min_nnz
    if min_count > 0:
        mask &= marg0 >= min_count
    if mad_max > 0:
        m = np.where(mask, marg0, 0.0)
        logm = np.log(m[m > 0])
        med = np.median(logm)
        dev = np.median(np.abs(logm - med))
        cutoff = np.exp(med - mad_max * dev)
        mask &= m >= cutoff

    b = mask.astype(float)
    var = np.inf
    it = 0
    while var >= tol and it < max_iters:
        m = b * (S @ b)
        nz = m > 0
        mean = m[nz].mean()
        rel = np.where(nz, m / mean, 1.0)
        b = b / rel
        var = ((m[nz] / mean - 1.0) ** 2).mean()
        it += 1
    m = b * (S @ b)
    scale = m[m > 0].mean()
    b = b / np.sqrt(scale)
    w = np.where(mask & (b > 0), b, np.nan)
    return w


def _random_symmetric_counts(n, seed=0, gap_bins=()):
    rng = np.random.default_rng(seed)
    bias = np.exp(rng.normal(0, 0.4, n))
    d = np.abs(np.arange(n)[:, None] - np.arange(n)[None, :])
    lam = 20.0 / (1.0 + d) ** 0.8 * bias[:, None] * bias[None, :]
    A = rng.poisson(lam)
    S = np.triu(A) + np.triu(A, 1).T
    S = S.astype(float)
    for g in gap_bins:
        S[g, :] = 0
        S[:, g] = 0
    return S


@pytest.mark.parametrize('gaps', [(), (7, 8, 30)])
def test_device_ice_matches_numpy_reference(gaps):
    n = 96
    S = _random_symmetric_counts(n, seed=4, gap_bins=gaps)
    want = _numpy_ice(S)

    num = n
    band = np.zeros((num, n))
    for d in range(num):
        idx = np.arange(n - d)
        band[d, idx] = S[idx, idx + d]
    got = ice_balance_chrom(band, n).bias

    np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
    ok = ~np.isnan(want)
    np.testing.assert_allclose(got[ok], want[ok], rtol=1e-6)


def test_ice_equalizes_marginals():
    n = 128
    S = _random_symmetric_counts(n, seed=9)
    w = ice_balance_chrom(_to_band(S), n).bias
    ok = ~np.isnan(w)
    B = S * np.outer(np.where(ok, w, 0), np.where(ok, w, 0))
    np.fill_diagonal(B, 0)   # ignore_diags=1
    marg = B.sum(axis=1)[ok]
    np.testing.assert_allclose(marg, marg.mean(), rtol=2e-2)


def _to_band(S):
    n = S.shape[0]
    band = np.zeros((n, n))
    for d in range(n):
        idx = np.arange(n - d)
        band[d, idx] = S[idx, idx + d]
    return band


def _to_coo_upper(S):
    iu = np.triu_indices(S.shape[0])
    b1, b2 = iu
    keep = S[b1, b2] != 0
    return b1[keep], b2[keep], S[b1, b2][keep]


def _genome_with_trans(n1=60, n2=48, seed=3):
    """Two-chromosome genome-wide symmetric matrix with a trans block."""
    rng = np.random.default_rng(seed)
    n = n1 + n2
    bias = np.exp(rng.normal(0, 0.4, n))
    S = np.zeros((n, n))
    for lo, hi in ((0, n1), (n1, n)):
        d = np.abs(np.arange(lo, hi)[:, None] - np.arange(lo, hi)[None, :])
        A = rng.poisson(20.0 / (1.0 + d) ** 0.8
                        * np.outer(bias[lo:hi], bias[lo:hi]))
        S[lo:hi, lo:hi] = np.triu(A) + np.triu(A, 1).T
    T = rng.poisson(0.8 * np.outer(bias[:n1], bias[n1:]))
    S[:n1, n1:] = T
    S[n1:, :n1] = T.T
    return S


def test_genome_ice_matches_numpy_reference():
    """Trans-inclusive (cis_only=False) ICE over the COO pixel list must
    equal the dense genome-wide reference implementation."""
    from hicpeaks_tpu.ops.ice import ice_balance_genome
    S = _genome_with_trans()
    want = _numpy_ice(S)
    b1, b2, ct = _to_coo_upper(S)
    import jax
    got = ice_balance_genome(b1, b2, ct, S.shape[0],
                             device=jax.devices('cpu')[0]).bias
    np.testing.assert_array_equal(np.isnan(got), np.isnan(want))
    ok = ~np.isnan(want)
    np.testing.assert_allclose(got[ok], want[ok], rtol=1e-6)


def test_genome_ice_differs_from_cis_only():
    """The trans block must actually influence the weights — guards against
    silently falling back to the per-chromosome path (round-1 ADVICE)."""
    from hicpeaks_tpu.ops.ice import ice_balance_genome
    import jax
    cpu = jax.devices('cpu')[0]
    S = _genome_with_trans()
    n1 = 60
    b1, b2, ct = _to_coo_upper(S)
    full = ice_balance_genome(b1, b2, ct, S.shape[0], device=cpu).bias
    cis = (b1 < n1) == (b2 < n1)
    cis_w = ice_balance_genome(b1[cis], b2[cis], ct[cis], S.shape[0],
                               device=cpu).bias
    ok = ~(np.isnan(full) | np.isnan(cis_w))
    assert not np.allclose(full[ok], cis_w[ok], rtol=1e-3)


def test_balance_padded_coo_matches_dense_chrom():
    """balance()'s padded-COO per-chromosome route (power-of-two nnz/bin
    padding, thread pool) must equal the dense band kernel per chromosome
    — pins the inert-padding semantics."""
    import tempfile

    from hicpeaks_tpu.io.coolerlite import CoolerLite, binnify, \
        create_cooler_file
    from hicpeaks_tpu.io.synth import synthesize_chrom
    from hicpeaks_tpu.ops.ice import balance

    res = 25000
    sizes, chunks = {}, []
    offset = 0
    per_chrom = {}
    for c, n in (('1', 97), ('2', 64)):   # odd sizes exercise the padding
        b1, b2, ct, _, _ = synthesize_chrom(n_bins=n, res=res, seed=int(c),
                                            n_loops=6, depth=50.0)
        sizes[c] = n * res
        chunks.append({'bin1_id': b1 + offset, 'bin2_id': b2 + offset,
                       'count': ct})
        per_chrom[c] = (b1, b2, ct, n)
        offset += n
    td = tempfile.mkdtemp()
    uri = f'{td}/b.cool::{res}'
    create_cooler_file(uri, binnify(sizes, res),
                       chunks, metadata={'onlyIntra': 'True'})
    clr = CoolerLite(uri)
    balance(clr)
    got = clr.weights()

    lo = 0
    for c in ('1', '2'):
        b1, b2, ct, n = per_chrom[c]
        band = np.zeros((n, n))
        band[b2 - b1, b1] = ct
        want = ice_balance_chrom(band, n).bias
        seg = got[lo:lo + n]
        np.testing.assert_array_equal(np.isnan(seg), np.isnan(want))
        ok = ~np.isnan(want)
        np.testing.assert_allclose(seg[ok], want[ok], rtol=1e-5)
        lo += n
