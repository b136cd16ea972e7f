"""Chromosome-size acquisition.

Equivalent of the reference's ``readChromSizes`` / ``fetchChromSizes``
(reference: hicpeaks/utilities.py:20-49) without the UCSC ``fetchChromSizes``
subprocess dependency: sizes are always read from a 2-column file.
"""
from __future__ import annotations


def _label_selected(label: str, chroms) -> bool:
    """Reference semantics (utilities.py:30,45): empty selection means all;
    '#' stands for purely-numeric labels; otherwise exact match."""
    return (not chroms) or (label.isdigit() and '#' in chroms) or (label in chroms)


def read_chromsizes(chromsizes_file: str, chroms=('#', 'X')) -> dict:
    """Read a UCSC-style 2-column ``<chrom>\t<size>`` file.

    The leading ``chr`` prefix is stripped, mirroring utilities.py:44.
    """
    chroms = set(chroms) if chroms else set()
    chromsizes = {}
    with open(chromsizes_file) as source:
        for line in source:
            parse = line.rstrip().split()
            if len(parse) < 2:
                continue
            c, s = parse[0].lstrip('chr'), parse[1]
            if _label_selected(c, chroms):
                chromsizes[c] = int(s)
    return chromsizes


def sort_chromlabels(labels) -> list:
    """Numeric labels ascending, then X, Y, M, then the rest sorted
    (reference: utilities.py:196-201)."""
    labels = list(labels)
    tmp = list(map(str, sorted(map(int, [i for i in labels if i.isdigit()]))))
    nondigits = [i for i in labels if not i.isdigit()]
    for i in ['X', 'Y', 'M']:
        if i in nondigits:
            tmp.append(nondigits.pop(nondigits.index(i)))
    return tmp + sorted(nondigits)
