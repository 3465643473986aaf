#!/usr/bin/env python
"""E. coli golden-parity harness: our pipeline vs the reference binaries.

Runs the reference dmo pipeline (run_dmo.sh flags: wtzmo -k 16 -z 10 -Z 16
-U 128 -U 64 -U 160 -U 1.0 -U 0.05 -m 0.1 -A 1000; wtclp -d 3 -FT -m 0.1
-k 300; wtlay -m 0.1 -w 300 -r 0.95 -c 1; wtcns) and ours with the same
flags on the same reads, then compares stage by stage:

  zmo:  overlap pair-set recall / precision / Jaccard
  clp:  per-read keep/drop + clip-window decisions (also CROSS: our wtclp
        on the REFERENCE .ovl — isolates clip parity from overlap deltas)
  lay:  unitig count / N50 / total bases (ours on reference inputs too)
  cns:  consensus identity vs the reference .cns

Stages are cached by output-file existence; --force redoes everything.

Usage: python scripts/parity_ecoli.py [--reads N] [--threads T]
       [--stages zmo,clp,lay,cns] [--force]
"""

import argparse
import glob
import json
import os
import shutil
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
WORK = os.path.join(ROOT, "work")
PAR = os.path.join(WORK, "parity")
REFBUILD = os.path.join(WORK, "refbuild")
ECOLI = os.path.join(WORK, "ecoli_reads.fa")

DMO_U = ["-U", "128", "-U", "64", "-U", "160", "-U", "1.0", "-U", "0.05"]


def log(msg):
    print(f"[parity {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def build_reference(tools=("wtzmo", "wtclp", "wtlay", "wtcns", "wtpre", "wtgbo")):
    os.makedirs(REFBUILD, exist_ok=True)
    missing = [t for t in tools if not os.path.exists(os.path.join(REFBUILD, t))]
    if not missing:
        return
    src = "/root/reference"
    for f in glob.glob(os.path.join(src, "*.c")) + glob.glob(
            os.path.join(src, "*.h")) + [os.path.join(src, "Makefile")]:
        if not os.path.exists(os.path.join(REFBUILD, os.path.basename(f))):
            shutil.copy(f, REFBUILD)
    log(f"building reference binaries: {missing}")
    subprocess.run(["make", "-j4"] + list(missing), cwd=REFBUILD, check=True,
                   capture_output=True, timeout=600)


def sh(cmd, out=None, timeout=3 * 3600):
    log(" ".join(cmd) + (f" > {os.path.basename(out)}" if out else ""))
    t0 = time.time()
    if out:
        with open(out, "w") as fh:
            subprocess.run(cmd, stdout=fh, check=True, timeout=timeout,
                           stderr=subprocess.DEVNULL)
    else:
        subprocess.run(cmd, check=True, timeout=timeout,
                       capture_output=True)
    log(f"  done in {time.time() - t0:.1f}s")


def stage(path, force):
    if force or not os.path.exists(path):
        return True
    log(f"cached: {os.path.basename(path)}")
    return False


def load_pairs(path):
    pairs = set()
    rows = 0
    with open(path) as fh:
        for line in fh:
            c = line.split("\t")
            if len(c) < 12:
                continue
            rows += 1
            pairs.add((min(c[0], c[5]), max(c[0], c[5])))
    return pairs, rows


def cmp_pairs(ref, ours):
    inter = len(ref & ours)
    return dict(
        ref=len(ref), ours=len(ours), common=inter,
        recall=round(inter / max(1, len(ref)), 4),
        precision=round(inter / max(1, len(ours)), 4),
        jaccard=round(inter / max(1, len(ref | ours)), 4),
    )


def load_obt(path):
    """Reference wtclp mask: name offset length [tag]; length 0 = dropped."""
    m = {}
    with open(path) as fh:
        for line in fh:
            c = line.split()
            if len(c) >= 3:
                m[c[0]] = (int(c[1]), int(c[2]))
    return m


def cmp_obt(ref, ours, names):
    both = [n for n in names if n in ref and n in ours]
    same_keep = sum((ref[n][1] > 0) == (ours[n][1] > 0) for n in both)
    kept = [n for n in both if ref[n][1] > 0 and ours[n][1] > 0]
    exact = sum(ref[n] == ours[n] for n in kept)
    close = sum(abs(ref[n][0] - ours[n][0]) <= 100
                and abs(ref[n][1] - ours[n][1]) <= 200 for n in kept)
    return dict(
        reads=len(both), keep_agree=round(same_keep / max(1, len(both)), 4),
        clip_exact=round(exact / max(1, len(kept)), 4),
        clip_close=round(close / max(1, len(kept)), 4),
    )


def utg_stats(path):
    lens = []
    cur = 0
    with open(path) as fh:
        for line in fh:
            if line.startswith(">"):
                if cur:
                    lens.append(cur)
                cur = 0
            else:
                cur += len(line.strip())
    if cur:
        lens.append(cur)
    lens.sort(reverse=True)
    tot = sum(lens)
    acc = 0
    n50 = 0
    for ln in lens:
        acc += ln
        if acc * 2 >= tot:
            n50 = ln
            break
    return dict(n=len(lens), total=tot, n50=n50,
                max=lens[0] if lens else 0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=0, help="subset to first N reads")
    ap.add_argument("--threads", type=int, default=os.cpu_count() or 4)
    ap.add_argument("--stages", default="zmo,clp,lay")
    ap.add_argument("--force", action="store_true")
    ap.add_argument("--batch-q", type=int, default=16)
    args = ap.parse_args()
    stages = set(args.stages.split(","))
    os.makedirs(PAR, exist_ok=True)
    build_reference()
    report = {}

    # ---- input reads (optionally subset) ----
    reads = os.path.join(PAR, f"reads_{args.reads or 'all'}.fa")
    if stage(reads, args.force):
        if args.reads:
            n = 0
            with open(ECOLI) as src, open(reads, "w") as dst:
                for line in src:
                    if line.startswith(">"):
                        n += 1
                        if n > args.reads:
                            break
                    dst.write(line)
        else:
            if os.path.exists(reads):
                os.remove(reads)
            os.symlink(ECOLI, reads)
    tag = f"{args.reads or 'all'}"

    def pp(name):
        return os.path.join(PAR, f"{name}.{tag}")

    # ---- zmo ----
    if "zmo" in stages:
        refovl = pp("ref.ovl")
        if stage(refovl, args.force):
            sh([os.path.join(REFBUILD, "wtzmo"), "-t", str(args.threads),
                "-i", reads, "-fo", refovl, "-k", "16", "-z", "10", "-Z", "16"]
               + DMO_U + ["-m", "0.1", "-A", "1000"])
        oursovl = pp("ours.ovl")
        if stage(oursovl, args.force):
            sh([sys.executable, "-m", "smartdenovo_tpu.cli", "zmo",
                "-i", reads, "-o", oursovl, "-m", "0.1", "-A", "1000",
                "--batch-q", str(args.batch_q)])
        refp, nref = load_pairs(refovl)
        oursp, nours = load_pairs(oursovl)
        report["zmo"] = cmp_pairs(refp, oursp)
        log(f"zmo: {report['zmo']}")

    # ---- clp ----
    if "clp" in stages:
        refobt = pp("ref.obt")
        if stage(refobt, args.force):
            sh([os.path.join(REFBUILD, "wtclp"), "-i", pp("ref.ovl"),
                "-fo", refobt, "-d", "3", "-F", "-T", "-m", "0.1", "-k", "300"])
        # cross: OUR clip on the REFERENCE overlaps (isolates clp parity)
        xobt = pp("cross.obt")
        if stage(xobt, args.force):
            sh([sys.executable, "-m", "smartdenovo_tpu.cli", "clp",
                "-i", pp("ref.ovl"), "-o", xobt, "-d", "3", "-F", "-T",
                "-m", "0.1", "-k", "300"])
        oursobt = pp("ours.obt")
        if stage(oursobt, args.force):
            sh([sys.executable, "-m", "smartdenovo_tpu.cli", "clp",
                "-i", pp("ours.ovl"), "-o", oursobt, "-d", "3", "-F", "-T",
                "-m", "0.1", "-k", "300"])
        names = [l[1:].split()[0] for l in open(reads) if l.startswith(">")]
        ref = load_obt(refobt)
        report["clp_cross"] = cmp_obt(ref, load_obt(xobt), names)
        report["clp"] = cmp_obt(ref, load_obt(oursobt), names)
        log(f"clp cross(ref ovl): {report['clp_cross']}")
        log(f"clp (our ovl):      {report['clp']}")

    # ---- lay ----
    if "lay" in stages:
        reflay = pp("ref.lay")
        if stage(reflay + ".utg", args.force):
            sh([os.path.join(REFBUILD, "wtlay"), "-i", reads,
                "-b", pp("ref.obt"), "-j", pp("ref.ovl"), "-fo", reflay,
                "-m", "0.1", "-w", "300", "-r", "0.95", "-c", "1"])
        xlay = pp("cross.lay")
        if stage(xlay + ".utg", args.force):
            sh([sys.executable, "-m", "smartdenovo_tpu.cli", "lay",
                "-i", reads, "-b", pp("ref.obt"), "-j", pp("ref.ovl"),
                "-o", xlay, "-m", "0.1", "-w", "300", "-r", "0.95", "-c", "1"])
        ourslay = pp("ours.lay")
        if stage(ourslay + ".utg", args.force):
            sh([sys.executable, "-m", "smartdenovo_tpu.cli", "lay",
                "-i", reads, "-b", pp("ours.obt"), "-j", pp("ours.ovl"),
                "-o", ourslay, "-m", "0.1", "-w", "300", "-r", "0.95", "-c", "1"])
        report["lay_ref"] = utg_stats(reflay + ".utg")
        report["lay_cross"] = utg_stats(xlay + ".utg")
        report["lay_ours"] = utg_stats(ourslay + ".utg")
        for k in ("lay_ref", "lay_cross", "lay_ours"):
            log(f"{k}: {report[k]}")

    # ---- cns ----
    if "cns" in stages:
        refcns = pp("ref.cns")
        if stage(refcns, args.force):
            sh([os.path.join(REFBUILD, "wtcns"), "-t", str(args.threads),
                "-i", pp("ref.lay"), "-fo", refcns])
        ourscns = pp("ours.cns")
        if stage(ourscns, args.force):
            sh([sys.executable, "-m", "smartdenovo_tpu.cli", "cns",
                "-i", pp("ours.lay"), "-o", ourscns])
        report["cns_ref"] = utg_stats(refcns)
        report["cns_ours"] = utg_stats(ourscns)
        log(f"cns ref:  {report['cns_ref']}")
        log(f"cns ours: {report['cns_ours']}")

    out = os.path.join(PAR, f"report.{tag}.json")
    with open(out, "w") as fh:
        json.dump(report, fh, indent=2)
    print(json.dumps(report, indent=2))
    log(f"report -> {out}")


if __name__ == "__main__":
    main()
