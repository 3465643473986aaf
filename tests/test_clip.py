import numpy as np
import pytest

from smartdenovo_tpu.data.readbank import ReadBank
from smartdenovo_tpu.graph.clip import (
    ClpParams,
    _Arrays,
    estimate_genome,
    load_overlaps_clp,
    overlaps_to_clp_records,
    run_clp,
)
from smartdenovo_tpu.pipeline.zmo import ZmoParams, overlap_dmo
from smartdenovo_tpu.utils.simulate import mutate_read, random_genome, simulate_reads


@pytest.fixture(scope="module")
def clip_input():
    rng = np.random.default_rng(21)
    g = random_genome(rng, 30000)
    names, seqs = simulate_reads(g, coverage=12, mean_len=5000, err=0.13, seed=22)
    # add two chimeric reads: left half from pos~2k, right half from pos~20k
    for t in range(2):
        a = mutate_read(rng, g[2000 + t * 500 : 5000 + t * 500], 0.13)
        b = mutate_read(rng, g[20000 + t * 500 : 23000 + t * 500], 0.13)
        names.append(f"chimera{t}_0_1")
        seqs.append(np.concatenate([a, b]))
    rb = ReadBank(names, seqs)
    params = ZmoParams.dmo(
        batch_q=8, cand_budget=1 << 18, expand_budget=1 << 21, pair_budget=1 << 19,
        ncand=64,
    )
    overlaps = overlap_dmo(rb, params, progress=False)
    return g, rb, overlaps


def test_clip_keeps_good_reads(clip_input):
    g, rb, overlaps = clip_input
    clips = run_clp(overlaps_to_clp_records(rb, overlaps), ClpParams.dmo())
    kept = dropped = 0
    for name, (off, ln, orig, x, y, closed) in clips.items():
        if name.startswith("chimera"):
            continue
        if closed:
            dropped += 1
        else:
            kept += 1
            # -F mode keeps (nearly) whole reads
            assert ln >= 0.8 * orig
    assert kept > 0.75 * (kept + dropped), f"too many good reads dropped: {dropped}"


def test_clip_drops_chimeras(clip_input):
    g, rb, overlaps = clip_input
    clips = run_clp(overlaps_to_clp_records(rb, overlaps), ClpParams.dmo())
    caught = 0
    for t in range(2):
        name = f"chimera{t}_0_1"
        if name not in clips:
            caught += 1  # no overlaps at all also removes it from the graph
            continue
        off, ln, orig, x, y, closed = clips[name]
        if closed:
            caught += 1
    assert caught >= 1, "no chimeric read was dropped"


def test_genome_estimation(clip_input):
    """wtclp.c:819-896: modal overlap depth + 1 ~ coverage; tot/avg ~ genome."""
    g, rb, overlaps = clip_input
    p = ClpParams.dmo()
    st = load_overlaps_clp(overlaps_to_clp_records(rb, overlaps), p)
    a = _Arrays(st)
    hist, tot, avg, genome = estimate_genome(a, p)
    assert tot > 0 and avg >= 1
    # simulated at 12x on a 30kb genome: estimate within a factor ~2
    assert 8 <= avg <= 20, avg
    assert 15000 <= genome <= 60000, genome


def test_clip_output_format(clip_input):
    g, rb, overlaps = clip_input
    clips = run_clp(overlaps_to_clp_records(rb, overlaps), ClpParams.dmo())
    for name, (off, ln, orig, x, y, closed) in clips.items():
        assert orig == rb.lengths[rb.name2id[name]]
        if not closed:
            assert 0 <= x < y <= orig
            assert ln == y - x
        else:
            assert ln == 0
