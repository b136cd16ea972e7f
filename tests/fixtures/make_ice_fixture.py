#!/usr/bin/env python
"""Generate the real-cooler ICE ground-truth fixture (round-4 verdict #4).

The in-repo ICE test (tests/test_ice.py) validates ops/ice.py against an
independent NumPy implementation written in this repo — a self-consistent
oracle.  THIS script produces the non-self-authored truth: it requires the
REAL ``cooler`` package (not available in the build environment — no pip
installs, no egress), writes a deterministic synthetic cooler with our own
writer, balances it with ``cooler.balance_cooler`` at the reference's
exact knobs (hicpeaks/utilities.py:367-431: chunksize=int(1e7), mad_max=5,
min_nnz=10, min_count=0, ignore_diags=1, tol=1e-5, max_iters=200,
cis_only=True), and saves the weight vector plus input digests to
``tests/fixtures/ice_cooler_weights.npz``.

Run it ON A MACHINE WITH COOLER INSTALLED, commit the npz, and
tests/test_ice_fixture.py will pin ops/ice.py against it (it skips while
the fixture is absent).  The same run also proves coolerlite-written HDF5
opens under real cooler (file-format interop).

Usage:  python tests/fixtures/make_ice_fixture.py
"""
import hashlib
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(HERE)))

OUT = os.path.join(HERE, 'ice_cooler_weights.npz')

#: deterministic input spec — test_ice_fixture.py regenerates the same
#: pixels and verifies the digest before comparing weights
SPEC = dict(n_bins=600, res=25000, seed=777, n_loops=40, depth=55.0,
            decay=0.75)


def pixel_digest(b1, b2, ct):
    h = hashlib.sha256()
    for a in (b1, b2, ct):
        h.update(np.ascontiguousarray(a).tobytes())
    return h.hexdigest()


def main():
    try:
        import cooler
    except ImportError:
        print('ERROR: the real `cooler` package is required to generate '
              'the ground-truth fixture.  Run this script in an '
              'environment with `pip install cooler`.', file=sys.stderr)
        return 2

    from hicpeaks_tpu.io.synth import synthesize_chrom
    from hicpeaks_tpu.io.coolerlite import binnify, create_cooler_file

    b1, b2, ct, _, _ = synthesize_chrom(**SPEC)
    digest = pixel_digest(b1, b2, ct)
    path = '/tmp/ice_fixture.cool'
    if os.path.exists(path):
        os.remove(path)
    uri = f"{path}::{SPEC['res']}"
    create_cooler_file(uri, binnify({'21': SPEC['n_bins'] * SPEC['res']},
                                    SPEC['res']),
                       [{'bin1_id': b1, 'bin2_id': b2, 'count': ct}],
                       metadata={'onlyIntra': 'True'})

    # interop proof: the coolerlite-written file opens under real cooler
    clr = cooler.Cooler(uri)
    assert clr.info is not None
    px = clr.pixels()[:]
    assert len(px) == len(b1), 'pixel count mismatch under real cooler'

    # the reference's exact balance call (utilities.py:403-417)
    bias, stats = cooler.balance_cooler(
        clr, chunksize=int(1e7), mad_max=5, min_nnz=10, min_count=0,
        ignore_diags=1, tol=1e-5, max_iters=200, cis_only=True,
        store=False)

    np.savez(OUT, weights=bias, pixel_digest=np.frombuffer(
        digest.encode(), np.uint8), spec_n_bins=SPEC['n_bins'],
        spec_res=SPEC['res'], spec_seed=SPEC['seed'],
        spec_n_loops=SPEC['n_loops'], spec_depth=SPEC['depth'],
        spec_decay=SPEC['decay'],
        cooler_version=np.frombuffer(
            cooler.__version__.encode(), np.uint8))
    print(f'wrote {OUT} (cooler {cooler.__version__}, '
          f'digest {digest[:16]}...)')
    return 0


if __name__ == '__main__':
    sys.exit(main())
