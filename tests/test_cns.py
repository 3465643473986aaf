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
    # tile reads across the unitig like a layout would: step 1500, len 3000
    reads, offs, bb = [], [], []
    step, rdlen = 800, 3500
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


def test_backbone_identity_baseline(unit_and_truth):
    unit, truth = unit_and_truth
    from smartdenovo_tpu.pipeline.cns import _gen_backbone

    bb = _gen_backbone(unit)
    ident = _identity(bb, truth)
    assert 0.80 < ident < 0.95  # raw uncorrected backbone


def test_consensus_improves_identity(unit_and_truth):
    unit, truth = unit_and_truth
    p = CnsParams(n_iter=3, batch_reads=16)
    cns = consensus_unitig(unit, p)
    from smartdenovo_tpu.pipeline.cns import _gen_backbone

    bb_id = _identity(_gen_backbone(unit), truth)
    cns_id = _identity(cns, truth)
    assert cns_id > bb_id + 0.03, f"consensus {cns_id:.4f} vs backbone {bb_id:.4f}"
    assert cns_id > 0.965, f"consensus identity too low: {cns_id:.4f}"
    assert 0.9 * len(truth) < len(cns) < 1.1 * len(truth)


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
