#!/usr/bin/env python
"""Chunk-anchored identity between two large consensus FASTAs.

difflib is quadratic, so Mb-scale consensus comparisons anchor ~20 kb
reference chunks into the other sequence by unique 40-mer match and run
difflib per chunk.  Reports total matched/aligned identity plus the
aligned fraction (chunks whose anchor was not found count as unaligned).

Usage: python scripts/cns_ident.py A.fa B.fa [--chunk 20000]
"""

import argparse
import difflib
import sys


def fa_seqs(path):
    seqs, name, buf = {}, None, []
    for line in open(path):
        if line.startswith(">"):
            if name is not None:
                seqs[name] = "".join(buf)
            name, buf = line[1:].split()[0], []
        else:
            buf.append(line.strip())
    if name is not None:
        seqs[name] = "".join(buf)
    return seqs


def chunk_identity(a: str, b: str, chunk: int = 20000, anchor: int = 40):
    """Identity of a vs b by anchored chunks; returns (ident, aligned_frac,
    per-chunk list)."""
    tot_m = tot_a = 0
    unal = 0
    out = []
    margin = 3000
    exp = None   # expected b position of the next chunk (tracks drift)
    for i in range(0, len(a), chunk):
        ca = a[i: i + chunk]
        if len(ca) < anchor:
            continue
        probe = ca[: anchor]
        lo = 0 if exp is None else max(0, exp - 200000)
        hi = len(b) if exp is None else min(len(b), exp + 200000)
        j = b.find(probe, lo, hi)
        if j < 0:
            j = b.find(probe)
        if j < 0:
            # try an interior probe (chunk start may be in an indel)
            probe = ca[len(ca) // 2: len(ca) // 2 + anchor]
            j = b.find(probe)
            if j >= 0:
                j -= len(ca) // 2
        if j < 0:
            unal += len(ca)
            out.append((i, -1, 0.0))
            exp = None
            continue
        cb = b[max(0, j - margin // 10): j + len(ca) + margin]
        sm = difflib.SequenceMatcher(None, ca, cb, autojunk=False)
        m = sum(bl.size for bl in sm.get_matching_blocks())
        tot_m += m
        tot_a += len(ca)
        out.append((i, j, m / max(1, len(ca))))
        exp = j + chunk
    denom = tot_a + unal
    ident = tot_m / max(1, denom)
    return ident, tot_a / max(1, denom), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("a")
    ap.add_argument("b")
    ap.add_argument("--chunk", type=int, default=20000)
    args = ap.parse_args()
    A = fa_seqs(args.a)
    B = fa_seqs(args.b)
    sa = max(A.values(), key=len)
    sb = max(B.values(), key=len)
    print(f"A: {len(A)} seqs, longest {len(sa)}; B: {len(B)} seqs, "
          f"longest {len(sb)}", file=sys.stderr)
    ident, frac, chunks = chunk_identity(sa, sb, args.chunk)
    worst = sorted(chunks, key=lambda c: c[2])[:5]
    print(f"identity {ident:.5f} aligned_frac {frac:.4f} "
          f"len_delta {len(sb) - len(sa):+d}")
    print(f"worst chunks: {[(c[0], round(c[2], 4)) for c in worst]}")


if __name__ == "__main__":
    main()
