#!/usr/bin/env python
"""Score consensi against the smoke set's simulation TRUTH genome.

The smoke reads are simulated from a seeded 200 kb genome
(scripts/make_goldens.py:69-72).  Regenerate it and measure how many
errors the reference binary's consensus and ours each make against the
truth — attribution for the residual ours-vs-ref divergence: balanced
homopolymer ties score ~equally; a real quality gap shows as asymmetry.

Usage: python scripts/cns_truth.py [--ours FASTA] [--utg utg0]
"""

import argparse
import difflib
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
GOLD = os.path.join(ROOT, "tests", "goldens")


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


def revcomp(s):
    return s[::-1].translate(str.maketrans("ACGT", "TGCA"))


def locate(truth, query):
    """Find query's span in truth (either strand) via a unique 32-mer."""
    for q, strand in ((query, "+"), (revcomp(query), "-")):
        for probe_at in (len(q) // 2, len(q) // 4, 3 * len(q) // 4):
            probe = q[probe_at: probe_at + 32]
            pos = truth.find(probe)
            if pos >= 0 and truth.find(probe, pos + 1) < 0:
                beg = max(0, pos - probe_at - 200)
                end = min(len(truth), pos - probe_at + len(q) + 200)
                return truth[beg:end], q, strand
    raise SystemExit("could not locate query in truth")


def score(truth_seg, q):
    sm = difflib.SequenceMatcher(None, truth_seg, q, autojunk=False)
    matched = sum(b.size for b in sm.get_matching_blocks())
    errs = 0
    for tag, i1, i2, j1, j2 in sm.get_opcodes():
        if tag != "equal":
            errs += max(i2 - i1, j2 - j1)
    # ignore the +-200 locate slack at the ends
    return matched / max(1, len(q)), errs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ours", default=None, help="our consensus fasta")
    ap.add_argument("--utg", default="utg0")
    args = ap.parse_args()

    from smartdenovo_tpu.utils.simulate import random_genome

    rng = np.random.default_rng(200_000)
    truth = random_genome(rng, 200_000)
    if not isinstance(truth, str):
        from smartdenovo_tpu.data.readbank import codes_to_seq
        truth = codes_to_seq(np.asarray(truth))

    ref = fa_seqs(os.path.join(GOLD, "smoke.ref.cns"))[args.utg]
    seg, q, strand = locate(truth, ref)
    ident, errs = score(seg, q)
    print(f"reference cns {args.utg} ({strand}): len {len(ref)}, "
          f"identity vs truth {ident:.5f}, ~{errs} error bases")

    if args.ours:
        ours = fa_seqs(args.ours)[args.utg]
        seg, q, strand = locate(truth, ours)
        ident, errs = score(seg, q)
        print(f"ours          {args.utg} ({strand}): len {len(ours)}, "
              f"identity vs truth {ident:.5f}, ~{errs} error bases")


if __name__ == "__main__":
    main()
