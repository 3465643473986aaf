#!/usr/bin/env python
"""Second dataset profile: ONT-like reads through dmo + wtmsa consensus.

BASELINE config 4 names an ONT bacterial sample (ERS554120) on the
wtmsa path; with zero egress we simulate the profile instead: 15 %
error (ONT-like indel-heavy), log-normal length distribution with a
long tail, 1 Mb genome at 20x.  Runs OUR full dmo pipeline, then BOTH
consensus engines (wtcns-style DAG and wtmsa-style POA) on the same
layout, and scores each against the simulation truth
(reference wtmsa.c:410-548; README.md:46-47).

Writes work/ont_report.json.  Usage: python scripts/sim_ont.py [--glen N]
"""

import argparse
import difflib
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def identity(a, b):
    sm = difflib.SequenceMatcher(None, a, b, autojunk=False)
    m = sum(bl.size for bl in sm.get_matching_blocks())
    return m / max(len(a), len(b), 1)


def chunk_identity(truth: str, q: str, chunk: int = 8000) -> float:
    """Chunk-anchored identity for long sequences (difflib is quadratic)."""
    if len(q) < 2 * chunk:
        return identity(truth, q)
    tot = n = 0
    for beg in range(0, len(q) - chunk, chunk):
        piece = q[beg: beg + chunk]
        probe = piece[: 48]
        at = truth.find(probe)
        if at < 0:
            rc = piece[::-1].translate(str.maketrans("ACGT", "TGCA"))
            at = truth.find(rc[:48])
            if at >= 0:
                piece = rc
        if at < 0:
            tot += 0.0
        else:
            seg = truth[max(0, at - 200): at + chunk + 200]
            tot += identity(seg, piece) * min(1.25, len(seg) / chunk)
        n += 1
    return min(1.0, tot / max(n, 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--glen", type=int, default=1_000_000)
    ap.add_argument("--cov", type=int, default=20)
    ap.add_argument("--err", type=float, default=0.15)
    ap.add_argument("--batch-q", type=int, default=32)
    args = ap.parse_args()

    from smartdenovo_tpu.data.readbank import ReadBank, codes_to_seq
    from smartdenovo_tpu.graph.clip import ClpParams
    from smartdenovo_tpu.graph.stringgraph import LayParams
    from smartdenovo_tpu.pipeline.cns import CnsParams, run_cns, units_from_graph
    from smartdenovo_tpu.pipeline.driver import assemble_dmo
    from smartdenovo_tpu.pipeline.msa import MsaParams, run_msa
    from smartdenovo_tpu.pipeline.zmo import ZmoParams
    from smartdenovo_tpu.utils.cache import enable_compilation_cache
    from smartdenovo_tpu.utils.simulate import random_genome, simulate_reads

    enable_compilation_cache()
    rng = np.random.default_rng(554_120)
    genome = random_genome(rng, args.glen)
    gs = genome if isinstance(genome, str) else codes_to_seq(np.asarray(genome))
    # ONT-like: log-normal lengths, heavy tail, 15% error
    names, seqs = simulate_reads(genome, coverage=args.cov, mean_len=12000,
                                 err=args.err, seed=554_121, min_len=1000)
    rb = ReadBank(names, seqs)
    print(f"[ont] {len(rb)} reads, {rb.total_bases} bases, err {args.err}")

    t0 = time.time()
    zp = ZmoParams.dmo(batch_q=args.batch_q)
    res = assemble_dmo(rb, zp, ClpParams.dmo(), LayParams.dmo())
    t_asm = time.time() - t0
    units = units_from_graph(res.graph)
    lens = sorted((sum(len(r) for r, bb in zip(u.reads, u.backbone) if bb)
                   for u in units), reverse=True)
    print(f"[ont] assembled {len(units)} unitigs in {t_asm:.1f}s")

    report = {"reads": len(rb), "bases": int(rb.total_bases),
              "err": args.err, "glen": args.glen,
              "unitigs": len(units), "t_asm_s": round(t_asm, 1)}

    # wtcns-style DAG consensus
    t0 = time.time()
    cns = run_cns(units, CnsParams(n_iter=4, seg_engine=True))
    t_cns = time.time() - t0
    big = codes_to_seq(max((c for _, c in cns), key=len))
    report["dagcns"] = {
        "total": int(sum(len(c) for _, c in cns)),
        "largest": len(big),
        "identity_vs_truth": round(chunk_identity(gs, big), 5),
        "wall_s": round(t_cns, 1),
    }
    print("[ont] dagcns:", report["dagcns"])

    # wtmsa-style POA consensus (reference wtmsa.c:410-548 path)
    t0 = time.time()
    msa = run_msa(units, MsaParams())
    t_msa = time.time() - t0
    bigm = codes_to_seq(max((c for _, c in msa), key=len))
    report["msa"] = {
        "total": int(sum(len(c) for _, c in msa)),
        "largest": len(bigm),
        "identity_vs_truth": round(chunk_identity(gs, bigm), 5),
        "wall_s": round(t_msa, 1),
    }
    print("[ont] msa:", report["msa"])

    out = os.path.join(ROOT, "work", "ont_report.json")
    with open(out, "w") as fh:
        json.dump(report, fh, indent=1)
    print("[ont] wrote", out)


if __name__ == "__main__":
    main()
