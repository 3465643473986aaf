"""SW (banded local DP) overlap engine tests — the zmo pipeline's wtzmo."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # module fixture is the cost; fast gate skips

from smartdenovo_tpu.data.readbank import ReadBank
from smartdenovo_tpu.pipeline.zmo import ZmoParams, overlap_reads
from smartdenovo_tpu.utils.simulate import random_genome, simulate_reads


def _interval(name):
    parts = name.split("_")
    return int(parts[-2]), int(parts[-2]) + int(parts[-1])


@pytest.fixture(scope="module")
def sw_overlaps():
    rng = np.random.default_rng(101)
    g = random_genome(rng, 12000)
    names, seqs = simulate_reads(g, coverage=7, mean_len=2500, err=0.13, seed=102,
                                 min_len=800)
    rb = ReadBank(names, seqs)
    params = ZmoParams.zmo(
        batch_q=4, cand_budget=1 << 17, expand_budget=1 << 20, pair_budget=1 << 18,
        ncand=32, align_cap=16, band_w=128,
    )
    return rb, overlap_reads(rb, params, progress=False)


def test_sw_recall(sw_overlaps):
    rb, overlaps = sw_overlaps
    found = {(min(o.rid1, o.rid2), max(o.rid1, o.rid2)) for o in overlaps}
    total = hit = 0
    for i in range(len(rb)):
        bi, ei = _interval(rb.names[i])
        for j in range(i + 1, len(rb)):
            bj, ej = _interval(rb.names[j])
            if min(ei, ej) - max(bi, bj) >= 1800:
                total += 1
                hit += (i, j) in found
    assert total > 10
    assert hit / total > 0.8, f"SW overlap recall {hit}/{total}"


def test_sw_identity_and_scores(sw_overlaps):
    rb, overlaps = sw_overlaps
    assert overlaps
    for ov in overlaps:
        # DP identity at 13% simulated error: expect ~0.6-0.95 matched frac
        assert 0.6 <= ov.identity <= 1.0, ov
        assert ov.score >= 200
        assert ov.mat > 0
        l1, l2 = rb.lengths[ov.rid1], rb.lengths[ov.rid2]
        assert 0 <= ov.beg1 < ov.end1 <= l1
        assert 0 <= ov.beg2 < ov.end2 <= l2


def test_sw_coords_are_dovetails(sw_overlaps):
    """Most true overlaps should align to within a margin of the read ends."""
    rb, overlaps = sw_overlaps
    good = 0
    for ov in overlaps:
        l1, l2 = int(rb.lengths[ov.rid1]), int(rb.lengths[ov.rid2])
        left = min(ov.beg1, ov.beg2)
        right = min(l1 - ov.end1, l2 - ov.end2)
        if left + right <= 300:
            good += 1
    assert good / len(overlaps) > 0.7, f"only {good}/{len(overlaps)} dovetail-like"


def test_wtext_reextends(sw_overlaps):
    """Near-dovetail overlaps extend toward the read ends (wtext.c:248-282)."""
    from smartdenovo_tpu.pipeline.ext import ExtParams, run_ext

    rb, overlaps = sw_overlaps
    # shrink each overlap 200bp inward: ext must recover most of it
    shrunk = []
    for ov in overlaps[:20]:
        s = 200
        if ov.end1 - ov.beg1 <= 3 * s or ov.end2 - ov.beg2 <= 3 * s:
            continue
        import dataclasses as _dc
        o2 = _dc.replace(ov, beg1=ov.beg1 + s, end1=ov.end1 - s,
                         beg2=ov.beg2 + s, end2=ov.end2 - s,
                         cigar=f"{max(ov.end1 - ov.beg1, ov.end2 - ov.beg2) - 2 * s}M")
        shrunk.append(o2)
    assert shrunk
    ext = run_ext(rb, shrunk, params=ExtParams(band_w=128))
    assert len(ext) >= 0.8 * len(shrunk)
    recovered = 0
    for ov, old in zip(ext, shrunk):
        l1, l2 = int(rb.lengths[ov.rid1]), int(rb.lengths[ov.rid2])
        assert 0 <= ov.beg1 <= ov.end1 <= l1
        assert 0 <= ov.beg2 <= ov.end2 <= l2
        # real stats now: column counts consistent with coordinates
        assert ov.mat + ov.mis + ov.ins == ov.end1 - ov.beg1
        assert ov.mat + ov.mis + ov.dl == ov.end2 - ov.beg2
        if (ov.end1 - ov.beg1) > (old.end1 - old.beg1) + 150:
            recovered += 1
    assert recovered >= 0.6 * len(ext), f"{recovered}/{len(ext)} extended"


def test_wtext_respects_clips(sw_overlaps):
    """Clip masks trim overlap coordinates into the clipped frame."""
    from smartdenovo_tpu.pipeline.ext import ExtParams, run_ext

    rb, overlaps = sw_overlaps
    ov = max(overlaps, key=lambda o: o.end1 - o.beg1)
    clips = {rb.names[ov.rid1]: (100, int(rb.lengths[ov.rid1]) - 200)}
    ext = run_ext(rb, [ov], clips=clips, params=ExtParams(band_w=128))
    if ext:  # the overlap may vanish if it lay in the clipped margin
        l1c = int(rb.lengths[ov.rid1]) - 200
        assert 0 <= ext[0].beg1 <= ext[0].end1 <= l1c
