"""_symmetrize_upper vs a literal transcription of the reference's
csr -> lil mirror-assignment (utilities.py:306-312), including the
both-triangles overwrite quirk."""
import numpy as np
import pytest
from scipy import sparse

from hicpeaks_tpu.io.ingest import _symmetrize_upper


def _reference_symmetrize(x, y, vals, n):
    M = sparse.csr_matrix((vals, (x, y)), shape=(n, n))
    M = sparse.lil_matrix(M)
    M[y, x] = M[x, y]
    M = sparse.triu(M).tocoo()
    M.sum_duplicates()
    return M.row, M.col, M.data


@pytest.mark.parametrize('seed', range(5))
def test_symmetrize_matches_reference_transcription(seed):
    rng = np.random.default_rng(seed)
    n = 60
    m = 400
    x = rng.integers(0, n, m)
    y = rng.integers(0, n, m)
    vals = rng.integers(1, 9, m).astype(float)
    # force duplicates and explicit both-triangle conflicts
    x = np.r_[x, x[:40], y[:25]]
    y = np.r_[y, y[:40], x[:25]]
    vals = np.r_[vals, vals[:40], rng.integers(1, 9, 25).astype(float)]

    rr, rc, rv = _reference_symmetrize(x, y, vals, n)
    gr, gc, gv = _symmetrize_upper(x, y, vals, n)

    ref = {(int(a), int(b)): float(v) for a, b, v in zip(rr, rc, rv)}
    got = {(int(a), int(b)): float(v) for a, b, v in zip(gr, gc, gv)}
    assert got == ref


def test_symmetrize_output_sorted_unique():
    rng = np.random.default_rng(9)
    n, m = 40, 300
    x = rng.integers(0, n, m)
    y = rng.integers(0, n, m)
    vals = np.ones(m)
    gr, gc, gv = _symmetrize_upper(x, y, vals, n)
    assert (gr <= gc).all()
    k = gr * n + gc
    assert (np.diff(k) > 0).all()
