"""APA window gathering and scoring vs a dense NumPy port of the reference
(hicpeaks/apa.py:11-46)."""
import jax.numpy as jnp
import numpy as np

from hicpeaks_tpu.ops.apa_ops import apa_windows, apa_analysis


def _reference_apa_submatrix(M, pos, w):
    Len = M.shape[0]
    out = []
    for i, j in pos:
        if (i - w >= 0) and (i + w + 1 <= Len) and (j - w >= 0) and \
                (j + w + 1 <= Len):
            tmp = M[i - w:i + w + 1, j - w:j + w + 1].copy()
            if np.isnan(tmp).sum() > 0:
                continue
            if tmp.mean() == 0:
                continue
            out.append(tmp / tmp.mean())
    return out


def test_apa_windows_match_dense_reference():
    rng = np.random.default_rng(2)
    n, w = 120, 5
    A = rng.poisson(2.0, (n, n)).astype(float)
    M = np.triu(A) + np.triu(A, 1).T
    # plant NaNs at a few stored positions
    M[10, 40] = M[40, 10] = np.nan

    num = n
    band = np.zeros((num, n))
    nanband = np.zeros((num, n))
    for d in range(num):
        idx = np.arange(n - d)
        vals = M[idx, idx + d]
        nanband[d, idx] = np.isnan(vals)
        band[d, idx] = np.where(np.isnan(vals), 0.0, vals)

    pos = [(20, 60), (3, 50), (10, 40), (30, 36), (114, 118), (50, 90)]
    want = _reference_apa_submatrix(M, pos, w)

    xs = jnp.asarray([p[0] for p in pos])
    ys = jnp.asarray([p[1] for p in pos])
    norm, ok, _ = apa_windows(jnp.asarray(band), jnp.asarray(nanband),
                              xs, ys, w, n)
    got = np.asarray(norm)[np.asarray(ok)]
    assert len(got) == len(want)
    for g, wnt in zip(got, want):
        np.testing.assert_allclose(g, wnt, rtol=1e-12)


def test_apa_analysis_scoring():
    rng = np.random.default_rng(0)
    w, cw = 5, 3
    stack = rng.random((50, 2 * w + 1, 2 * w + 1)) + 0.5
    stack[:, w, w] += 3.0      # enriched centers
    avg, score, z, p, maxi = apa_analysis(stack, w=w, cw=cw)
    assert avg.shape == (11, 11)
    assert score > 2.0
    assert p < 0.01
    # the reference derives vmax from the upper corner
    np.testing.assert_allclose(maxi, avg[:cw, -cw:].mean() * 5, rtol=1e-12)
