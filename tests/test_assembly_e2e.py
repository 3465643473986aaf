"""End-to-end dmo assembly on a simulated genome.

Acceptance mirrors the reference's operator workflow (run_dmo.sh:36 —
contiguity via seq_n50.pl): the assembly of a clean single-sequence
genome should produce one dominant unitig spanning ~the whole genome,
with a layout whose read order is consistent with true genome positions.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # module fixture is the cost; fast gate skips

from smartdenovo_tpu.data.readbank import ReadBank
from smartdenovo_tpu.graph.clip import ClpParams
from smartdenovo_tpu.graph.stringgraph import LayParams
from smartdenovo_tpu.pipeline.driver import assemble_dmo, write_outputs
from smartdenovo_tpu.pipeline.zmo import ZmoParams
from smartdenovo_tpu.utils.simulate import random_genome, simulate_reads

GLEN = 60000


@pytest.fixture(scope="module")
def assembly():
    rng = np.random.default_rng(31)
    g = random_genome(rng, GLEN)
    names, seqs = simulate_reads(g, coverage=14, mean_len=6000, err=0.13, seed=32)
    rb = ReadBank(names, seqs)
    zp = ZmoParams.dmo(
        batch_q=8, cand_budget=1 << 19, expand_budget=1 << 22, pair_budget=1 << 20,
        ncand=128,
    )
    res = assemble_dmo(rb, zp, ClpParams.dmo(), LayParams.dmo())
    return g, rb, res


def _interval(name):
    parts = name.split("_")
    return int(parts[-2]), int(parts[-2]) + int(parts[-1])


def test_assembly_contiguity(assembly):
    g, rb, res = assembly
    lays = [l for l in res.graph.lays if len(l) >= 4]
    assert lays, "no unitigs produced"
    lens = sorted((res.graph.lay_length(l) for l in lays), reverse=True)
    # dominant unitig close to genome size (raw unitigs inflate ~8-15% from
    # uncorrected insertions)
    assert lens[0] > 0.8 * GLEN, f"largest unitig only {lens[0]} of {GLEN}"
    assert lens[0] < 1.4 * GLEN
    # N50 == largest (single dominant contig)
    assert sum(lens) < 2.0 * GLEN, f"assembly too fragmented/duplicated: {lens}"


def test_assembly_layout_order(assembly):
    """Backbone reads in the main unitig must be collinear with the genome."""
    g, rb, res = assembly
    lays = sorted(res.graph.lays, key=res.graph.lay_length, reverse=True)
    main = lays[0]
    backbone = [(entry[0], entry[4]) for entry in main if not entry[5]]
    assert len(backbone) >= 5
    true_pos = [np.mean(_interval(res.rb.names[nid])) for nid, _ in backbone]
    diffs = np.diff(true_pos)
    # allow either genome orientation; strictly monotone up to small jitter
    direction = np.sign(np.median(diffs))
    ok = np.sum(np.sign(diffs) == direction)
    assert ok >= 0.95 * len(diffs), f"layout order broken: {true_pos}"


def test_assembly_outputs(assembly, tmp_path):
    g, rb, res = assembly
    n = write_outputs(res, str(tmp_path / "asm"))
    assert n >= 1
    lay = (tmp_path / "asm.lay").read_text()
    assert lay.startswith(">utg")
    # each row: Y/N name strand offset length seq
    for line in lay.splitlines():
        if line.startswith(">"):
            continue
        cols = line.split("\t")
        assert len(cols) == 6
        assert cols[0] in "YN"
        assert cols[2] in "+-"
        assert int(cols[4]) == len(cols[5])
    utg = (tmp_path / "asm.lay.utg").read_text()
    assert utg.startswith(">utg")
    seqlen = sum(len(l) for l in utg.splitlines() if not l.startswith(">"))
    assert seqlen > 0.8 * GLEN


def test_graphviz_dump(assembly, tmp_path):
    """write_dot emits the reference's digraph format (wtlay.c:2433)."""
    g, rb, res = assembly
    out = tmp_path / "g.dot"
    with open(out, "w") as fh:
        res.graph.write_dot(fh)
    text = out.read_text()
    assert text.startswith("digraph ")
    import re

    edges = re.findall(r'(\S+) -> (\S+) \[label="([+-])([+-]):(\d+):(-?\d+):',
                       text)
    assert edges, text[:200]
    names = set(rb.names)
    for a, b, k, d, off, score in edges[:50]:
        assert a in names or a in set(res.rb.names)
        assert int(off) >= 0
