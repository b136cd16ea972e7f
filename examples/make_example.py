#!/usr/bin/env python
"""Regenerate a chr21-25Kb-style worked example.

The reference ships example/25K/21_21.txt (K562 chr21 at 25Kb,
README.rst:119-163) which is absent from this snapshot; this script
synthesizes a statistically similar dataset and lays out the same example
tree, so the README workflow can be followed verbatim:

    python examples/make_example.py --out example
    toCooler -O example/test.cool -d example/datasets \\
        --chromsizes-file example/hg38.chromsizes --assembly hg38
    pyBHFDR -O example/test-BHFDR.bedpe -p example/test.cool::25000 \\
        --pw 1 --ww 3 --logFile example/bhfdr.log
    pyHICCUPS -O example/test-HICCUPS.bedpe -p example/test.cool::25000 \\
        --pw 1 2 --ww 3 5 --maxapart 3000000 --logFile example/hiccups.log
    peak-plot -O example/region.png -p example/test.cool::25000 \\
        -I example/test-HICCUPS.bedpe -C 21 -S 20000000 -E 22500000 \\
        --skip-rows 0
    apa-analysis -O example/apa.png -p example/test.cool::25000 \\
        -I example/test-HICCUPS.bedpe -S 0
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from hicpeaks_tpu.io.synth import synthesize_chrom, write_txt  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default='example')
    ap.add_argument('--n-bins', type=int, default=1868,
                    help='chr21 at 25Kb is ~1868 bins (46.7 Mb)')
    ap.add_argument('--seed', type=int, default=21)
    args = ap.parse_args()

    res = 25000
    folder = os.path.join(args.out, '25K')
    os.makedirs(folder, exist_ok=True)
    b1, b2, ct, loops, _ = synthesize_chrom(
        n_bins=args.n_bins, res=res, seed=args.seed, n_loops=120,
        depth=70.0, decay=0.8, max_loop_span_bins=120)
    write_txt(os.path.join(folder, '21_21.txt'), b1, b2, ct)
    with open(os.path.join(args.out, 'hg38.chromsizes'), 'w') as f:
        f.write(f'chr21\t{args.n_bins * res}\n')
    with open(os.path.join(args.out, 'datasets'), 'w') as f:
        f.write(f'res:{res}\n  {os.path.abspath(folder)}\n')
    with open(os.path.join(args.out, 'TRUTH.bedpe'), 'w') as f:
        for x, y in loops:
            f.write(f'chr21\t{x * res}\t{x * res + res}\t'
                    f'chr21\t{y * res}\t{y * res + res}\n')
    print(f'example written to {args.out}/ '
          f'({b1.size} contacts, {len(loops)} planted loops)')


if __name__ == '__main__':
    main()
