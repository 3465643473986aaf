"""Contiguity statistics — equivalent of the reference seq_n50.pl."""

from __future__ import annotations

import sys


def n50_stats(lengths: list[int]) -> dict:
    lengths = sorted(lengths, reverse=True)
    total = sum(lengths)
    out = {
        "n_seqs": len(lengths),
        "total": total,
        "max": lengths[0] if lengths else 0,
        "min": lengths[-1] if lengths else 0,
        "avg": total // max(1, len(lengths)),
    }
    acc = 0
    marks = {50: "N50", 90: "N90"}
    for ln in lengths:
        acc += ln
        for pct, name in list(marks.items()):
            if acc * 100 >= total * pct:
                out[name] = ln
                del marks[pct]
    for name in marks.values():
        out[name] = 0
    return out


def print_n50(paths, out=None):
    from ..io.fasta import read_seqs

    out = out or sys.stdout
    lengths = [len(seq) for _, _, seq in read_seqs(paths)]
    st = n50_stats(lengths)
    for k in ("n_seqs", "total", "max", "N50", "N90", "min", "avg"):
        out.write(f"{k}\t{st[k]}\n")
    return st
