"""Pixel-level parity of the plotting CLIs against the REAL reference
scripts, executed in-process.

The reference plot scripts need only a sliver of the cooler API
(``Cooler(path).binsize`` / ``.matrix(balance=..., sparse=...).fetch``),
so a functional shim over io/coolerlite lets ``scripts/peak-plot`` and
``scripts/apa-analysis`` run verbatim on the same synthetic cooler our
CLIs consume; the rendered PNGs are then compared pixel-for-pixel (same
in-process matplotlib, so any layout/value deviation shows up as pixel
diffs)."""
import os
import runpy
import sys
import types
from pathlib import Path

import numpy as np
import pytest

import matplotlib

matplotlib.use('Agg')

from hicpeaks_tpu.io.coolerlite import CoolerLite
from hicpeaks_tpu.io.synth import synthetic_cooler

REFROOT = Path('/root/reference')

pytestmark = pytest.mark.skipif(
    not (REFROOT / 'scripts' / 'peak-plot').exists(),
    reason='reference tree not available at /root/reference')


def _functional_cooler_module(uri):
    """A ``cooler`` module whose Cooler implements exactly the surface the
    reference plot scripts touch, backed by io/coolerlite with real
    cooler semantics (dense balanced fetch carries NaN across unweighted
    rows via the outer weight product)."""
    lite = CoolerLite(uri)

    class _Selector:
        def __init__(self, balance, sparse):
            self.balance = balance
            self.sparse = sparse

        def fetch(self, region):
            if isinstance(region, tuple):
                chrom, start, end = region
            else:
                chrom, start, end = region, 0, None
            res = lite.binsize
            M = lite.fetch_sparse(chrom, balance=False).astype(np.float64)
            if self.balance:
                name = self.balance if isinstance(self.balance, str) \
                    else 'weight'
                w = lite.weights(chrom, name)
                if self.sparse:
                    M = M.tocoo()
                    M.data = M.data * w[M.row] * w[M.col]
                    M = M.tocsr()
                else:
                    M = M.toarray() * w[:, None] * w[None, :]
            elif not self.sparse:
                M = M.toarray()
            if start or end is not None:
                s0 = start // res
                e0 = M.shape[0] if end is None else -(-end // res)
                M = M[s0:e0, s0:e0]
            return M

    class _Cooler:
        def __init__(self, path):
            assert str(path) == uri

        binsize = lite.binsize
        chromnames = lite.chromnames
        chromsizes = lite.chromsizes

        def matrix(self, balance='weight', sparse=False):
            return _Selector(balance, sparse)

    def _unavailable(*a, **k):
        raise RuntimeError('not needed by the plot scripts')

    mod = types.ModuleType('cooler')
    mod.Cooler = _Cooler
    for sub in ('util', 'reduce', 'api', 'ice'):
        setattr(mod, sub, types.ModuleType(f'cooler.{sub}'))
    # names hicpeaks.utilities imports at module load; never called here
    mod.util.binnify = _unavailable
    mod.util.parse_cooler_uri = _unavailable
    mod.reduce.CoolerMerger = _unavailable
    mod.api.Cooler = _Cooler
    mod.create_cooler = _unavailable
    return mod


def _run_reference_script(script, argv, uri):
    """Execute a reference CLI verbatim with cooler/statsmodels shimmed."""
    from .oracle.multitest import fdr_bh

    def multipletests(pvals, alpha=0.05, method='fdr_bh'):
        reject, qvals = fdr_bh(pvals, alpha)
        return reject, qvals, None, None

    cool = _functional_cooler_module(uri)
    shims = {
        'cooler': cool,
        'cooler.util': cool.util,
        'cooler.reduce': cool.reduce,
        'cooler.api': cool.api,
        'statsmodels': types.ModuleType('statsmodels'),
        'statsmodels.sandbox': types.ModuleType('statsmodels.sandbox'),
        'statsmodels.sandbox.stats':
            types.ModuleType('statsmodels.sandbox.stats'),
    }
    mc = types.ModuleType('statsmodels.sandbox.stats.multicomp')
    mc.multipletests = multipletests
    shims['statsmodels.sandbox.stats.multicomp'] = mc

    saved_mods = {k: sys.modules.get(k) for k in
                  list(shims) + ['hicpeaks', 'hicpeaks.utilities',
                                 'hicpeaks.callers', 'hicpeaks.apa']}
    saved_argv = sys.argv
    sys.modules.update(shims)
    for k in ('hicpeaks', 'hicpeaks.utilities', 'hicpeaks.callers',
              'hicpeaks.apa'):
        sys.modules.pop(k, None)
    sys.path.insert(0, str(REFROOT))
    sys.argv = [str(script)] + argv
    try:
        runpy.run_path(str(script), run_name='__main__')
    finally:
        sys.path.remove(str(REFROOT))
        sys.argv = saved_argv
        for k, v in saved_mods.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


@pytest.fixture(scope='module')
def plotdata(tmp_path_factory):
    root = tmp_path_factory.mktemp('plots')
    uri, loops = synthetic_cooler(str(root / 'p.cool'), n_bins=260,
                                  res=25000, seed=5, n_loops=14, depth=80.0)
    # a small loop list covering the plotted window
    bedpe = root / 'loops.bedpe'
    with open(bedpe, 'w') as f:
        for x, y in loops[:8]:
            f.write(f'21\t{x * 25000}\t{(x + 1) * 25000}'
                    f'\t21\t{y * 25000}\t{(y + 1) * 25000}\n')
    return root, uri, str(bedpe)


def _imread(path):
    import matplotlib.image as mpimg
    return np.asarray(mpimg.imread(path))


def test_peak_plot_pixel_parity(plotdata):
    root, uri, bedpe = plotdata
    args = ['-p', uri, '-I', bedpe, '-C', '21', '-S', '500000',
            '-E', '4500000', '--skip-rows', '0', '--dpi', '120']

    ref_png = root / 'ref.png'
    _run_reference_script(REFROOT / 'scripts' / 'peak-plot',
                          ['-O', str(ref_png)] + args, uri)

    from hicpeaks_tpu.cli import peakplot
    our_png = root / 'ours.png'
    rc = peakplot.main(['-O', str(our_png)] + args)
    assert rc == 0

    a = _imread(ref_png)
    b = _imread(our_png)
    assert a.shape == b.shape, (a.shape, b.shape)
    frac_diff = float((a != b).any(axis=-1).mean())
    assert frac_diff == 0.0, f'{frac_diff:.4%} of pixels differ'


def test_apa_plot_pixel_parity(plotdata):
    root, uri, bedpe = plotdata
    args = ['-p', uri, '-I', bedpe, '-S', '0', '--skip-rows', '0',
            '--dpi', '120']

    ref_png = root / 'ref_apa.png'
    _run_reference_script(REFROOT / 'scripts' / 'apa-analysis',
                          ['-O', str(ref_png)] + args, uri)

    from hicpeaks_tpu.cli import apa
    our_png = root / 'ours_apa.png'
    rc = apa.main(['-O', str(our_png)] + args)
    assert rc == 0

    a = _imread(ref_png)
    b = _imread(our_png)
    assert a.shape == b.shape, (a.shape, b.shape)
    frac_diff = float((a != b).any(axis=-1).mean())
    assert frac_diff == 0.0, f'{frac_diff:.4%} of pixels differ'
