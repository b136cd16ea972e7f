"""Opt-in checkify instrumentation of the scoring step (SURVEY §5
'race detection / sanitizers' row): clean data passes with identical
results; corrupted data raises instead of silently propagating NaN."""
import numpy as np
import pytest

from hicpeaks_tpu.core import engine, flagship
from hicpeaks_tpu.core.config import BHFDRConfig, HiccupsConfig


def _bands():
    return flagship.demo_inputs(L=256, num=64, dtype='float32')


def test_checkify_clean_run_matches_unchecked():
    bands = _bands()
    cfg = HiccupsConfig(pw=(1, 2), ww=(3, 5), maxww=8,
                        maxapart=40 * bands.res, min_marginal_peaks=2,
                        min_local_reads=16)
    plain = engine.hiccups_chrom(bands, cfg)
    checked = engine.hiccups_chrom(bands, cfg, check=True)
    assert checked == plain

    bcfg = BHFDRConfig(pw=1, ww=3, maxww=8, maxapart=40 * bands.res,
                       min_marginal_peaks=2)
    assert engine.bhfdr_chrom(bands, bcfg, check=True) == \
        engine.bhfdr_chrom(bands, bcfg)


def test_checkify_catches_nan_corruption():
    bands = _bands()
    # corrupt one in-band raw pixel with NaN: it passes the `!= 0`
    # candidate test and reaches the Poisson stage, where float_checks
    # must fire instead of the NaN silently washing through BH
    d, x = 10, 50
    bands.raw[d, x] = np.nan
    cfg = BHFDRConfig(pw=1, ww=3, maxww=8, maxapart=40 * bands.res,
                      min_marginal_peaks=2)
    with pytest.raises(Exception, match='(?i)nan|check'):
        engine.bhfdr_chrom(bands, cfg, check=True)
