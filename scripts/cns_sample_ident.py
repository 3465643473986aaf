#!/usr/bin/env python
"""Sampled chunk identity between two long consensi (difflib is
quadratic, so sample windows instead of whole-sequence alignment).

Usage: python scripts/cns_sample_ident.py REF.fa OURS.fa|CKPT.npz
                                          [--chunks 60] [--chunk 8000]
"""

import argparse
import difflib
import sys

import numpy as np

BASES = "ACGT"


def load_seq(path):
    if path.endswith(".npz"):
        sys.path.insert(0, "/root/repo")
        from smartdenovo_tpu.data.readbank import codes_to_seq

        z = np.load(path, allow_pickle=True)
        return codes_to_seq(z["cns"]), int(z["it"])
    seqs = []
    for line in open(path):
        if not line.startswith(">"):
            seqs.append(line.strip())
    return "".join(seqs), None


def revcomp(s):
    return s[::-1].translate(str.maketrans("ACGT", "TGCA"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ref")
    ap.add_argument("ours")
    ap.add_argument("--chunks", type=int, default=60)
    ap.add_argument("--chunk", type=int, default=8000)
    args = ap.parse_args()
    ref, _ = load_seq(args.ref)
    ours, it = load_seq(args.ours)
    print(f"ref {len(ref)} bp, ours {len(ours)} bp"
          + (f" (checkpoint after iteration {it})" if it else ""))
    rng = np.random.default_rng(11)
    idents, misses = [], 0
    for beg in sorted(rng.integers(0, max(1, len(ours) - args.chunk),
                                   args.chunks).tolist()):
        piece = ours[beg: beg + args.chunk]
        at = ref.find(piece[:48])
        if at < 0:
            rc = revcomp(piece)
            at = ref.find(rc[:48])
            if at >= 0:
                piece = rc
        if at < 0:
            misses += 1
            continue
        seg = ref[max(0, at - 300): at + args.chunk + 300]
        sm = difflib.SequenceMatcher(None, seg, piece, autojunk=False)
        m = sum(b.size for b in sm.get_matching_blocks())
        idents.append(m / len(piece))
    idents = np.array(idents)
    print(f"sampled {len(idents)} chunks ({misses} anchor misses): "
          f"mean {idents.mean():.5f}, min {idents.min():.5f}, "
          f"median {np.median(idents):.5f}")


if __name__ == "__main__":
    main()
