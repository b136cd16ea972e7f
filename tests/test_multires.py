"""Multi-resolution synthesis consistency (the substrate of BASELINE
config 5 / the reference's combine-resolutions workflow,
scripts/combine-resolutions:51-71)."""
import numpy as np

from hicpeaks_tpu.io.synth import synthesize_chrom, synthesize_chrom_multires


def test_multires_aggregation_is_exact_rebin():
    per_res, loops, bias = synthesize_chrom_multires(
        400, fine_res=5000, resolutions=(5000, 10000, 25000), seed=3,
        depth=8.0, n_loops=20)
    b1f, b2f, ctf, nf = per_res[5000]

    # total contact mass is conserved at every resolution
    for res, (b1, b2, ct, n_bins) in per_res.items():
        assert ct.sum() == ctf.sum(), res
        assert b1.min() >= 0 and b2.max() < n_bins
        # strictly sorted unique upper-triangle pixels (cooler invariant)
        assert (b1 <= b2).all()
        key = b1 * n_bins + b2
        assert (np.diff(key) > 0).all()

    # the 25Kb matrix equals an explicit dense rebin of the 5Kb one
    f = 25000 // 5000
    n25 = per_res[25000][3]
    dense = np.zeros((n25, n25))
    np.add.at(dense, (b1f // f, b2f // f), ctf)
    b1c, b2c, ctc, _ = per_res[25000]
    want = dense[b1c, b2c]
    np.testing.assert_array_equal(ctc, want)
    assert (dense.sum() - ctc.sum()) == 0   # nothing outside emitted pixels


def test_multires_fine_matches_single_res_synthesis():
    """resolutions containing fine_res returns the untouched fine draw."""
    per_res, loops, bias = synthesize_chrom_multires(
        300, fine_res=5000, resolutions=(5000,), seed=7, depth=6.0,
        n_loops=10)
    b1, b2, ct, n = per_res[5000]
    b1w, b2w, ctw, loopsw, biasw = synthesize_chrom(
        n_bins=300, res=5000, seed=7, depth=6.0, n_loops=10)
    np.testing.assert_array_equal(b1, b1w)
    np.testing.assert_array_equal(b2, b2w)
    np.testing.assert_array_equal(ct, ctw)
    assert loops == loopsw
