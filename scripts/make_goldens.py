#!/usr/bin/env python
"""Build the committed golden parity fixtures (tests/goldens/).

Generates the deterministic smoke read set (seeded simulation; no network
egress exists to fetch the reference's E. coli sample) and runs the
REFERENCE binaries on it with the canonical dmo flags (run_dmo.sh:17-36):

  wtzmo -t 4 -k 16 -z 10 -Z 16 -U -1 -m 0.1 -A 1000
  wtclp -d 3 -k 300 -m 0.1 -FT
  wtlay -w 300 -s 200 -m 0.1 -r 0.95 -c 1
  wtcns -c 1

Outputs are committed so parity tests ASSERT on every fresh checkout
(VERDICT r2: "make parity verifiable from a fresh checkout").  wtzmo's
pair set is thread-order dependent at the margin; goldens are produced
with -t 1 for full determinism.

Also refreshes work/smoke.fa + work/smoke.ref.ovl used by the verify
recipe (.claude/skills/verify).
"""

import glob
import os
import shutil
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
GOLD = os.path.join(ROOT, "tests", "goldens")
WORK = os.path.join(ROOT, "work")
REFBUILD = os.path.join(WORK, "refbuild")


def build_reference(tools=("wtpre", "wtzmo", "wtclp", "wtlay", "wtcns")):
    os.makedirs(REFBUILD, exist_ok=True)
    missing = [t for t in tools if not os.path.exists(os.path.join(REFBUILD, t))]
    if not missing:
        return
    src = "/root/reference"
    for f in glob.glob(os.path.join(src, "*.c")) + glob.glob(
            os.path.join(src, "*.h")) + [os.path.join(src, "Makefile")]:
        if not os.path.exists(os.path.join(REFBUILD, os.path.basename(f))):
            shutil.copy(f, REFBUILD)
    subprocess.run(["make", "-j4"] + list(missing), cwd=REFBUILD, check=True,
                   capture_output=True, timeout=600)


def sh(cmd, out=None):
    print("+", " ".join(cmd), (">" + out) if out else "", flush=True)
    if out:
        with open(out, "w") as fh:
            subprocess.run(cmd, stdout=fh, check=True,
                           stderr=subprocess.DEVNULL, timeout=3600)
    else:
        subprocess.run(cmd, check=True, capture_output=True, timeout=3600)


def main():
    import numpy as np

    from smartdenovo_tpu.utils.simulate import (random_genome, simulate_reads,
                                                write_sim_fasta)

    os.makedirs(GOLD, exist_ok=True)
    os.makedirs(WORK, exist_ok=True)
    build_reference()

    rng = np.random.default_rng(200_000)
    genome = random_genome(rng, 200_000)
    names, seqs = simulate_reads(genome, coverage=8, mean_len=9000,
                                 err=0.13, seed=515)
    fa = os.path.join(GOLD, "smoke.fa")
    write_sim_fasta(fa, names, seqs)
    print(f"smoke set: {len(seqs)} reads, {sum(len(s) for s in seqs)} bases")

    b = lambda t: os.path.join(REFBUILD, t)
    g = lambda n: os.path.join(GOLD, n)
    # single-threaded reference runs: fully deterministic goldens
    sh([b("wtzmo"), "-t", "1", "-i", fa, "-fo", g("smoke.ref.ovl"),
        "-k", "16", "-z", "10", "-Z", "16", "-U", "-1", "-m", "0.1",
        "-A", "1000"])
    sh([b("wtclp"), "-i", g("smoke.ref.ovl"), "-o", g("smoke.ref.obt"),
        "-f", "-d", "3", "-k", "300", "-m", "0.1", "-FT"])
    sh([b("wtlay"), "-i", fa, "-b", g("smoke.ref.obt"),
        "-j", g("smoke.ref.ovl"), "-fo", g("smoke.ref.lay"), "-w", "300",
        "-s", "200", "-m", "0.1", "-r", "0.95", "-c", "1"])
    sh([b("wtcns"), "-t", "1", "-i", g("smoke.ref.lay"),
        "-fo", g("smoke.ref.cns")])
    for ext in (".lay.utg", ".lay.dup", ".lay.lnk"):
        p = g("smoke.ref" + ext)
        if not os.path.exists(p):
            open(p, "w").close()

    # zmo-engine goldens (run_zmo.sh:14-39, smartdenovo.pl:56-68):
    # wtzmo SW mode + wtgbo rescue + wtclp -F -d 2 + wtlay -R -r 1
    build_reference(tools=("wtgbo",))
    def cut16(src, dst):
        with open(src) as i, open(dst, "w") as o:
            for line in i:
                o.write("\t".join(line.rstrip("\n").split("\t")[:16]) + "\n")

    sh([b("wtzmo"), "-t", "1", "-i", fa, "-fo", g("smoke.zmo.ovl.full"),
        "-k", "16", "-s", "200", "-m", "0.6"])
    cut16(g("smoke.zmo.ovl.full"), g("smoke.zmo.ref.ovl"))
    os.remove(g("smoke.zmo.ovl.full"))
    sh([b("wtgbo"), "-t", "1", "-i", fa, "-j", g("smoke.zmo.ref.ovl"),
        "-fo", g("smoke.zmo.gbo.full")])
    cut16(g("smoke.zmo.gbo.full"), g("smoke.zmo.ref.gbo"))
    os.remove(g("smoke.zmo.gbo.full"))
    sh([b("wtclp"), "-i", g("smoke.zmo.ref.ovl"), "-i", g("smoke.zmo.ref.gbo"),
        "-fo", g("smoke.zmo.ref.obt"), "-F", "-d", "2"])
    sh([b("wtlay"), "-i", fa, "-b", g("smoke.zmo.ref.obt"),
        "-j", g("smoke.zmo.ref.ovl"), "-j", g("smoke.zmo.ref.gbo"),
        "-fo", g("smoke.zmo.ref.lay"), "-s", "200", "-m", "0.6",
        "-R", "-r", "1", "-c", "1"])

    # the verify recipe's locations
    shutil.copy(fa, os.path.join(WORK, "smoke.fa"))
    shutil.copy(g("smoke.ref.ovl"), os.path.join(WORK, "smoke.ref.ovl"))
    for n in sorted(os.listdir(GOLD)):
        print(f"  {n}: {os.path.getsize(os.path.join(GOLD, n))} bytes")


if __name__ == "__main__":
    main()
