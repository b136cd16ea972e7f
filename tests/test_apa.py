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


class _StubClr:
    """Just enough of CoolerLite for locate_peak_bins."""

    def __init__(self, raw, bal):
        self._raw, self._bal = raw, bal

    def fetch_sparse(self, chrom, balance=False):
        from scipy import sparse
        return sparse.csr_matrix(self._bal if balance else self._raw)


def _reference_locate(M, peaks, res, min_dis):
    """Literal transcription of scripts/apa-analysis:98-119."""
    pos = []
    for p in peaks:
        x, y = p[0], p[2]
        if abs(y - x) < min_dis * res:
            continue
        s_l = range(p[0] // res, int(np.ceil(p[1] / float(res))))
        e_l = range(p[2] // res, int(np.ceil(p[3] / float(res))))
        si, ei = None, None
        for st in s_l:
            for et in e_l:
                if (st < M.shape[0]) and (et < M.shape[0]):
                    if si is None:
                        si, ei = st, et
                    elif M[st, et] > M[si, ei]:
                        si, ei = st, et
        if si is not None:
            pos.append((si, ei) if si < ei else (ei, si))
    return pos


def test_locate_peak_bins_uses_requested_matrix():
    """ADVICE r1: candidate ranking must run on the same (balanced by
    default) matrix the windows are extracted from, not the raw one."""
    from scipy import sparse
    from hicpeaks_tpu.cli.apa import locate_peak_bins

    n, res = 40, 10
    raw = np.zeros((n, n))
    bal = np.zeros((n, n))
    # interval pair covers bins 10-12 x 30-32; raw argmax at (11, 31),
    # balanced argmax at (12, 30) — the fix must follow the balanced one.
    raw[11, 31] = 100.0
    raw[12, 30] = 10.0
    bal[11, 31] = 1.0
    bal[12, 30] = 5.0
    bal[10, 32] = np.nan          # NaN must never win the argmax
    peaks = [(100, 130, 300, 330)]

    clr = _StubClr(raw, bal)
    got_raw = locate_peak_bins(clr, 'x', peaks, res, 0, balance=False)
    got_bal = locate_peak_bins(clr, 'x', peaks, res, 0, balance='weight')
    assert got_raw == [(11, 31)]
    assert got_bal == [(12, 30)]
    assert got_bal == _reference_locate(
        sparse.csr_matrix(bal), peaks, res, 0)
    # all-NaN candidates: reference keeps the unconditional first candidate
    nan_only = np.full((n, n), 0.0)
    nan_bal = np.full((n, n), np.nan)
    clr2 = _StubClr(nan_only, nan_bal)
    got = locate_peak_bins(clr2, 'x', peaks, res, 0, balance='weight')
    assert got == _reference_locate(
        sparse.csr_matrix(nan_bal), peaks, res, 0) == [(10, 30)]


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


def test_apa_cli_device_flag_matches_host(tmp_path, capsys):
    """--device routes the CLI's window extraction through
    ops/apa_ops.apa_windows (round-2 verdict next-step #9); it must keep
    the same windows (identical validity decisions) and emit a figure."""
    from hicpeaks_tpu.cli import apa as apa_cli
    from hicpeaks_tpu.io.synth import synthetic_cooler

    uri, loops = synthetic_cooler(str(tmp_path / 'apa.cool'), n_bins=400,
                                  res=25000, seed=5, n_loops=25, depth=60.0)
    res = 25000
    bedpe = tmp_path / 'loops.bedpe'
    with open(bedpe, 'w') as f:
        for x, y in loops:
            f.write(f'21\t{x * res}\t{(x + 1) * res}\t'
                    f'21\t{y * res}\t{(y + 1) * res}\n')

    rc = apa_cli.main(['-O', str(tmp_path / 'host.png'), '-p', uri,
                       '-I', str(bedpe), '-S', '0', '-M', '5'])
    assert rc == 0
    n_host = capsys.readouterr().out.strip().splitlines()[-1]

    rc = apa_cli.main(['-O', str(tmp_path / 'dev.png'), '-p', uri,
                       '-I', str(bedpe), '-S', '0', '-M', '5', '--device'])
    assert rc == 0
    n_dev = capsys.readouterr().out.strip().splitlines()[-1]

    assert n_host == n_dev and int(n_host) > 0
    assert (tmp_path / 'host.png').stat().st_size > 0
    assert (tmp_path / 'dev.png').stat().st_size > 0
