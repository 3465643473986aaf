"""E. coli golden parity vs the reference binaries (slow, artifact-gated).

`scripts/parity_ecoli.py` (or the manual stage commands) produce reference
outputs under work/parity/.  These tests replay the stage-level
comparisons whenever those artifacts exist; they skip on fresh checkouts
(the reads + binaries are not in git).

Measured 2026-08-18 on work/ecoli_reads.fa (8729 reads, ~18x):
  - wtclp cross (our clip on the reference .ovl): keep/clip decisions
    exact on 8729/8729 reads, same 3 drops; est genome 4.598 Mb.
  - wtlay cross (our layout on the reference .ovl + .obt): all 8725
    layout rows identical; the single 4,845,933 bp unitig sequence is
    bit-identical to the reference binary's.
"""

import os

import pytest

PAR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "work", "parity")


def _have(*names):
    return all(os.path.exists(os.path.join(PAR, n)) for n in names)


def _load_obt(path):
    m = {}
    for line in open(path):
        c = line.split()
        if len(c) >= 3:
            m[c[0]] = (int(c[1]), int(c[2]))
    return m


@pytest.mark.slow
def test_clp_cross_parity():
    if not _have("ref.obt.all", "cross.obt.all"):
        pytest.skip("E. coli parity artifacts not present")
    ref = _load_obt(os.path.join(PAR, "ref.obt.all"))
    ours = _load_obt(os.path.join(PAR, "cross.obt.all"))
    both = set(ref) & set(ours)
    assert len(both) >= 8000
    keep = sum((ref[n][1] > 0) == (ours[n][1] > 0) for n in both)
    kept = [n for n in both if ref[n][1] > 0 and ours[n][1] > 0]
    exact = sum(ref[n] == ours[n] for n in kept)
    assert keep / len(both) >= 0.999
    assert exact / len(kept) >= 0.999


def _utg_seq(path):
    return "".join(l.strip() for l in open(path) if not l.startswith(">"))


@pytest.mark.slow
def test_lay_cross_parity():
    if not _have("ref.lay.all.utg", "cross.lay.all.utg"):
        pytest.skip("E. coli parity artifacts not present")
    a = _utg_seq(os.path.join(PAR, "ref.lay.all.utg"))
    b = _utg_seq(os.path.join(PAR, "cross.lay.all.utg"))
    assert len(a) == len(b)
    assert a == b, "unitig sequence diverged from the reference binary"
