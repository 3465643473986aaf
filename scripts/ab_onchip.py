#!/usr/bin/env python
"""On-chip A/B: overlap_dmo with fill vs pallas kernel strategies.

The interpret-mode tests prove kernel semantics on CPU; this script
proves them on the real TPU (Mosaic lowering can diverge from interpret
mode).  Compares full overlap records, not just pair sets.

Usage: python scripts/ab_onchip.py [fasta] [--matcher join]
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    fasta = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        ROOT, "tests", "goldens", "smoke.fa")
    Q = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    from smartdenovo_tpu.data.readbank import ReadBank
    from smartdenovo_tpu.pipeline.zmo import ZmoParams, overlap_dmo
    from smartdenovo_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    rb = ReadBank.from_fasta(fasta)
    print(f"{len(rb)} reads")
    runs = {}
    for name, kw in (
        ("fill", dict(phase3="fill", segk="fill")),
        ("p3only", dict(phase3="pallas", segk="fill")),
        ("sgonly", dict(phase3="fill", segk="pallas")),
        ("pallas", dict(phase3="pallas", segk="pallas")),
    ):
        ovls = overlap_dmo(rb, ZmoParams.dmo(matcher="join", batch_q=Q, **kw),
                           progress=False)
        runs[name] = ovls
        print(f"{name}: {len(ovls)} overlaps", flush=True)
    base = runs["fill"]
    bset = {(o.rid1, o.rid2, o.dir2, o.beg1, o.end1, o.beg2, o.end2, o.score)
            for o in base}
    ok = True
    for name in ("p3only", "sgonly", "pallas"):
        os_ = {(o.rid1, o.rid2, o.dir2, o.beg1, o.end1, o.beg2, o.end2,
                o.score) for o in runs[name]}
        same = len(bset & os_)
        print(f"{name}: {same}/{len(bset)} records identical to fill "
              f"({len(os_)} total)")
        if os_ != bset:
            ok = False
            only_b = list(bset - os_)[:3]
            only_o = list(os_ - bset)[:3]
            print(f"  only-fill: {only_b}\n  only-{name}: {only_o}")
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
