"""Consensus stage tests: synthetic unitig -> consensus identity vs truth.

Acceptance follows the reference's claim that wtcns consensus "may reach
99.7%" identity (README-tools.md:277-279) — on clean simulated data we
require a strong improvement over the raw backbone (~87% at 13% error).
"""

import numpy as np
import pytest

from smartdenovo_tpu.data.readbank import codes_to_seq
from smartdenovo_tpu.pipeline.cns import CnsParams, LayUnitig, consensus_unitig
from smartdenovo_tpu.utils.simulate import mutate_read, random_genome


def _identity(x: np.ndarray, y: np.ndarray) -> float:
    from difflib import SequenceMatcher

    # autojunk must be off for long small-alphabet strings
    return SequenceMatcher(None, codes_to_seq(x), codes_to_seq(y), autojunk=False).ratio()


@pytest.fixture(scope="module")
def unit_and_truth():
    rng = np.random.default_rng(55)
    truth = random_genome(rng, 12000)
    # tile reads across the unitig like a layout would (~9x, the regime
    # the reference's 99.7% claim lives in — at ~4x the +1-homopolymer
    # vote noise costs ~0.6%, identically in the reference scoring)
    reads, offs, bb = [], [], []
    step, rdlen = 400, 3500
    for start in range(0, 12000 - 1000, step):
        frag = truth[start : start + rdlen]
        read = mutate_read(rng, frag, 0.13)
        reads.append(read)
        offs.append(start)
        bb.append(True)
    # a few extra non-backbone reads
    for start in (700, 4200, 8300):
        frag = truth[start : start + rdlen]
        reads.append(mutate_read(rng, frag, 0.13))
        offs.append(start)
        bb.append(False)
    return LayUnitig(name="utg0", reads=reads, offs=offs, backbone=bb), truth


@pytest.mark.slow
def test_backbone_identity_baseline(unit_and_truth):
    unit, truth = unit_and_truth
    from smartdenovo_tpu.pipeline.cns import _gen_backbone

    bb = _gen_backbone(unit)
    ident = _identity(bb, truth)
    assert 0.80 < ident < 0.95  # raw uncorrected backbone


@pytest.mark.slow
def test_consensus_improves_identity(unit_and_truth):
    unit, truth = unit_and_truth
    p = CnsParams(n_iter=3, batch_reads=16)
    cns = consensus_unitig(unit, p)
    from smartdenovo_tpu.pipeline.cns import _gen_backbone

    bb_id = _identity(_gen_backbone(unit), truth)
    cns_id = _identity(cns, truth)
    assert cns_id > bb_id + 0.03, f"consensus {cns_id:.4f} vs backbone {bb_id:.4f}"
    assert cns_id > 0.99, f"consensus identity too low: {cns_id:.4f}"
    assert 0.9 * len(truth) < len(cns) < 1.1 * len(truth)


def test_final_alignment_output(unit_and_truth, tmp_path):
    """wtcns -a/-V: per-read records + Q/T/M rows + variant MATRIX
    (reference wtcns.c:586-722)."""
    import io

    from smartdenovo_tpu.pipeline.cns import run_cns

    unit, truth = unit_and_truth
    p = CnsParams(n_iter=2, batch_reads=16)
    aln = tmp_path / "out.aln"
    res = run_cns([unit], p, aln_path=str(aln), vmsa=2.05)
    assert res and res[0][0] == "utg0"
    text = aln.read_text().splitlines()
    recs = [l for l in text if l and not l[0] in "QTM" and "\t" in l
            and not l.startswith("MATRIX")]
    qrows = [l for l in text if l.startswith("Q\t")]
    trows = [l for l in text if l.startswith("T\t")]
    mrows = [l for l in text if l.startswith("M\t")]
    mats = [l for l in text if l.startswith("MATRIX\t")]
    assert len(recs) == len(qrows) == len(trows) == len(mrows)
    assert len(recs) >= 0.8 * len(unit.reads)
    assert len(mats) == len(recs)
    # 16 columns, coherent coordinates, aligned rows equal length
    cols = recs[0].split("\t")
    assert len(cols) == 16 and cols[1] == "+" and cols[6] == "+"
    mat, mis, ins, dl = (int(c) for c in cols[12:16])
    q0, t0 = qrows[0][2:], trows[0][2:]
    assert len(q0) == len(t0) == len(mrows[0]) - 2
    assert mat + mis + ins + dl == len(q0)
    assert mat + mis + ins == int(cols[4]) - int(cols[3])  # read span
    assert mat + mis + dl == int(cols[9]) - int(cols[8])   # cns span
    # matrix rows all have the same width (the key-column count)
    widths = {len(l.split("\t")[2]) if len(l.split("\t")) > 2 else 0
              for l in mats}
    assert len(widths) == 1


def test_parse_lay_roundtrip(tmp_path):
    from smartdenovo_tpu.pipeline.cns import parse_lay_file

    p = tmp_path / "x.lay"
    p.write_text(
        ">utg0 length=20 nodes=2\n"
        "Y\tr1\t+\t0\t10\tACGTACGTAC\n"
        "N\tr2\t-\t5\t8\tGGGGCCCC\n"
        ">utg1 length=5 nodes=1\n"
        "Y\tr3\t+\t0\t5\tAAAAA\n"
    )
    units = parse_lay_file(str(p))
    assert len(units) == 2
    assert units[0].name == "utg0"
    assert units[0].offs == [0, 5]
    assert units[0].backbone == [True, False]
    assert codes_to_seq(units[0].reads[0]) == "ACGTACGTAC"


def test_checkpoint_resume_matches_straight_run(tmp_path):
    """consensus_unitig(ckpt=...) resumed mid-run must finish with the
    same consensus as an uninterrupted run (genome-scale failure
    recovery, SURVEY §5.3)."""
    import numpy as np

    from smartdenovo_tpu.pipeline.cns import CnsParams, LayUnitig, consensus_unitig
    from smartdenovo_tpu.utils.simulate import random_genome, simulate_reads

    rng = np.random.default_rng(31)
    g = random_genome(rng, 3000)
    names, seqs = simulate_reads(g, coverage=8, mean_len=1200, err=0.1,
                                 seed=32, min_len=600)
    order = np.argsort([int(n.split("_")[-2]) for n in names])
    unit = LayUnitig(
        name="u",
        reads=[np.asarray(seqs[i]) for i in order],
        offs=[int(names[i].split("_")[-2]) for i in order],
        backbone=[True] * len(order))
    p = CnsParams(n_iter=3, seg_engine=False)
    straight = consensus_unitig(unit, p)
    ck = str(tmp_path / "ck.npz")
    # run 1: stop after one iteration (simulated interruption)
    consensus_unitig(unit, CnsParams(n_iter=1, seg_engine=False), ckpt=ck)
    # run 2: resume from the checkpoint and finish
    resumed = consensus_unitig(unit, p, ckpt=ck)
    assert len(resumed) == len(straight)
    assert np.array_equal(resumed, straight)
