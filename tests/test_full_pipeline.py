"""Full pipeline: reads -> overlap -> clip -> layout -> consensus.

The round-trip acceptance: consensus of a simulated genome assembly
reconstructs the genome at high identity (the reference's own quality
bar: consensus "may reach 99.7%", README-tools.md:277-279 — we require
>=96% on small sims where coverage is modest).
"""

import numpy as np
import pytest

from smartdenovo_tpu.data.readbank import ReadBank, codes_to_seq
from smartdenovo_tpu.graph.clip import ClpParams
from smartdenovo_tpu.graph.stringgraph import LayParams
from smartdenovo_tpu.pipeline.cns import CnsParams, run_cns, units_from_graph
from smartdenovo_tpu.pipeline.driver import assemble_dmo
from smartdenovo_tpu.pipeline.zmo import ZmoParams
from smartdenovo_tpu.utils.simulate import random_genome, simulate_reads

GLEN = 40000


def _identity(x, y):
    from difflib import SequenceMatcher

    return SequenceMatcher(None, codes_to_seq(x), codes_to_seq(y), autojunk=False).ratio()


@pytest.mark.slow
def test_full_pipeline_consensus_identity():
    rng = np.random.default_rng(91)
    g = random_genome(rng, GLEN)
    names, seqs = simulate_reads(g, coverage=16, mean_len=6000, err=0.13, seed=92)
    rb = ReadBank(names, seqs)
    zp = ZmoParams.dmo(batch_q=8, cand_budget=1 << 19, expand_budget=1 << 22,
                       pair_budget=1 << 20, ncand=128)
    res = assemble_dmo(rb, zp, ClpParams.dmo(), LayParams.dmo())
    units = units_from_graph(res.graph)
    assert units, "no unitigs"
    cns = run_cns(units, CnsParams(n_iter=4, batch_reads=24))
    assert cns, "no consensus sequences"
    total = sum(len(c) for _, c in cns)
    assert 0.8 * GLEN < total < 1.3 * GLEN, f"consensus total {total}"
    # the largest consensus contig should match the genome closely
    name, big = max(cns, key=lambda t: len(t[1]))
    # try both orientations
    from smartdenovo_tpu.data.readbank import revcomp_codes

    ident = max(_identity(big, g), _identity(revcomp_codes(big), g))
    # Calibration (round 5): this measures identity vs the simulation
    # TRUTH, which has an algorithm-class ceiling — the REFERENCE binary
    # itself reaches only ~0.9899 vs truth at 18x/13% error
    # (scripts/cns_truth.py on the E. coli sim), and ~0.983 is the
    # ceiling at this test's 16x.  Ours measures 0.9828 here.  The bar
    # below catches regressions (the pre-round-3 engine sat at ~0.94);
    # OURS-vs-BINARY parity — the actual parity metric — is asserted at
    # 0.9985 by tests/test_goldens.py::test_cns_golden_cross.
    assert ident > 0.978, f"consensus-vs-genome identity {ident:.4f}"
