#!/usr/bin/env python
"""Characterize the consensus divergence vs the reference binary.

Runs our wtcns on one unitig of the golden layout and classifies every
edit against the reference binary's consensus: indel vs substitution,
homopolymer context, position clustering.  The goal is attribution
(VERDICT r2 task 4): which algorithmic choice produces the ~0.7%
residual divergence.

Usage: python scripts/triage_cns.py [--utg utg0] [--iters 6]
"""

import argparse
import difflib
import os
import sys
from collections import Counter

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--utg", default="utg0")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--ours-fa", default=None,
                    help="skip the cns run; load ours from this fasta")
    args = ap.parse_args()

    from smartdenovo_tpu.data.readbank import codes_to_seq
    from smartdenovo_tpu.pipeline.cns import CnsParams, parse_lay_file, run_cns

    units = [u for u in parse_lay_file(os.path.join(GOLD, "smoke.ref.lay"))
             if u.name == args.utg]
    assert units, f"{args.utg} not in layout"
    if args.ours_fa:
        ours = fa_seqs(args.ours_fa)[args.utg]
    else:
        res = run_cns(units, CnsParams(n_iter=args.iters))
        ours = codes_to_seq(res[0][1])
        out = os.path.join(ROOT, "work", f"triage_{args.utg}.cns.fa")
        with open(out, "w") as fh:
            fh.write(f">{args.utg}\n{ours}\n")
        print("saved", out)
    ref = fa_seqs(os.path.join(GOLD, "smoke.ref.cns"))[args.utg]
    print(f"{args.utg}: ref {len(ref)} bp, ours {len(ours)} bp "
          f"(delta {len(ours) - len(ref):+d})")

    sm = difflib.SequenceMatcher(None, ref, ours, autojunk=False)
    ops = [o for o in sm.get_opcodes() if o[0] != "equal"]
    matched = sum(b[2] for b in sm.get_matching_blocks())
    print(f"identity {matched / max(len(ref), len(ours)):.5f}, "
          f"{len(ops)} edit ops")

    cat = Counter()
    hp_ins = hp_del = 0
    sizes = Counter()
    examples = []
    for tag, i1, i2, j1, j2 in ops:
        rlen, olen = i2 - i1, j2 - j1
        if tag == "replace" and rlen == olen:
            cat["sub"] += rlen
        elif tag == "delete" or (tag == "replace" and rlen > olen):
            cat["del"] += rlen - olen
            sizes[f"del{rlen - olen}"] += 1
            seg = ref[i1:i2]
            ctx = ref[max(0, i1 - 3): i2 + 3]
            if len(set(seg)) == 1 and seg[0] * 2 in ctx + seg:
                hp_del += 1
            if len(examples) < 15:
                examples.append((tag, i1, ref[max(0, i1-6):i2+6],
                                 ours[max(0, j1-6):j2+6]))
        elif tag == "insert" or (tag == "replace" and olen > rlen):
            cat["ins"] += olen - rlen
            sizes[f"ins{olen - rlen}"] += 1
            seg = ours[j1:j2]
            ctx = ours[max(0, j1 - 3): j2 + 3]
            if len(set(seg)) == 1 and seg[0] * 2 in ctx + seg:
                hp_ins += 1
            if len(examples) < 15:
                examples.append((tag, i1, ref[max(0, i1-6):i2+6],
                                 ours[max(0, j1-6):j2+6]))
    print(f"edit bases: {dict(cat)}")
    print(f"homopolymer-context ops: ins {hp_ins}, del {hp_del} "
          f"of {len(ops)} total")
    print(f"op size histogram: {dict(sorted(sizes.items()))}")
    # position clustering: edits per 5kb window
    win = Counter()
    for tag, i1, i2, j1, j2 in ops:
        win[i1 // 5000] += 1
    print("edits per 5kb window:", dict(sorted(win.items())))
    print("examples (tag, refpos, ref-ctx, ours-ctx):")
    for e in examples:
        print("  ", e)


if __name__ == "__main__":
    main()
