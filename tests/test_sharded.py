"""Multi-device sharded overlap on the virtual 8-device CPU mesh.

The round-2 sharded design (parallel/sharded.py) runs the single-chip
pipeline per read-id index shard with two collectives (all_gather of the
per-shard top-A candidates, psum of positional dot-matrix results), so
the pair set must EQUAL the single-chip `overlap_dmo` pair set.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # module fixture is the cost; fast gate skips

import jax

from smartdenovo_tpu.data.readbank import ReadBank
from smartdenovo_tpu.parallel.sharded import (
    make_overlap_mesh,
    overlap_sharded,
)
from smartdenovo_tpu.utils.simulate import random_genome, simulate_reads


@pytest.fixture(scope="module")
def sim_bank():
    rng = np.random.default_rng(77)
    genome = random_genome(rng, 60_000)
    names, seqs = simulate_reads(genome, coverage=8, mean_len=4000, err=0.12,
                                 seed=78)
    return ReadBank(names, seqs)


def test_mesh_shape():
    mesh = make_overlap_mesh(jax.devices())
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("rd", "idx")


def test_sharded_matches_single_chip(sim_bank):
    """Sharded pair set == single-chip pair set (VERDICT round-2 task 4)."""
    from smartdenovo_tpu.pipeline.zmo import ZmoParams, overlap_dmo

    rb = sim_bank
    params = ZmoParams.dmo(ncand=200, batch_q=16)
    mesh = make_overlap_mesh(jax.devices())
    ours = overlap_sharded(rb, params, mesh, progress=False)
    ref = overlap_dmo(rb, params, progress=False)

    def pairset(ovls):
        return {(min(o.rid1, o.rid2), max(o.rid1, o.rid2)) for o in ovls}

    ps, pr = pairset(ours), pairset(ref)
    jac = len(ps & pr) / max(1, len(ps | pr))
    # identical modulo top-A coverage ties at the candidate cut
    assert jac >= 0.99, (
        f"sharded {len(ps)} vs single {len(pr)}, jaccard {jac:.4f}")


def test_sharded_coords_valid(sim_bank):
    from smartdenovo_tpu.pipeline.zmo import ZmoParams

    rb = sim_bank
    mesh = make_overlap_mesh(jax.devices())
    ovls = overlap_sharded(rb, ZmoParams.dmo(ncand=100, batch_q=16), mesh,
                           progress=False)
    assert ovls
    for ov in ovls[:200]:
        l1, l2 = int(rb.lengths[ov.rid1]), int(rb.lengths[ov.rid2])
        assert 0 <= ov.beg1 < ov.end1 <= l1
        assert 0 <= ov.beg2 < ov.end2 <= l2
