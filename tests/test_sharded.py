"""Multi-device sharded overlap step on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from smartdenovo_tpu.data.readbank import ReadBank
from smartdenovo_tpu.ops.index import build_kmer_index, build_zmer_index
from smartdenovo_tpu.ops.seeds import extract_seeds, subsample_mask
from smartdenovo_tpu.parallel.sharded import (
    make_overlap_mesh,
    shard_index,
    sharded_overlap_step,
)
from smartdenovo_tpu.utils.simulate import random_genome, simulate_reads


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 devices")
def test_sharded_overlap_step_runs():
    rng = np.random.default_rng(71)
    g = random_genome(rng, 12000)
    names, seqs = simulate_reads(g, coverage=6, mean_len=3000, err=0.12, seed=72)
    rb = ReadBank(names, seqs)
    kidx = build_kmer_index(rb, ksave=2)
    zidx = build_zmer_index(rb)
    mesh = make_overlap_mesh(jax.devices()[:8], idx_shards=2)
    n_rd_shards = mesh.devices.shape[0]
    Q = 2 * n_rd_shards
    rids = np.arange(Q)
    batch, lens = rb.batch(rids, pad_to=4096)
    res = extract_seeds(jnp.asarray(batch), jnp.asarray(lens), 16, True)
    valid = res["valid"] & subsample_mask(res["kmer"], 2)
    zres = extract_seeds(jnp.asarray(batch), jnp.asarray(lens), 10, True)
    sk = shard_index(kidx.kmers, kidx.post_rd, kidx.post_dir, None, None, 2)
    sz = shard_index(zidx.zmers, zidx.post_rd, zidx.post_dir, zidx.post_off,
                     zidx.post_span, 2)
    step = sharded_overlap_step(mesh, len(rb), budget=1 << 15, pair_budget=1 << 15,
                                ncand=16, kovl=300)
    out = step(
        res["kmer"], res["span"], valid,
        zres["kmer"], zres["off"], zres["span"], zres["valid"], zres["dir"],
        jnp.asarray(rids, jnp.int32), jnp.asarray(lens),
        jnp.asarray(rb.lengths),
        sk.kmers, sk.post_rd, sk.post_dir,
        sz.kmers, sz.post_rd, sz.post_dir, sz.post_off, sz.post_span,
    )
    cands, ols, pair_id, score, tb, te, qb, qe = (np.asarray(x) for x in out)
    assert cands.shape == (Q, 16)
    # every query should find at least one candidate on this dense sim
    assert (cands >= 0).any()
    # some dot-matrix chains should have produced real scores
    assert (score > 200).any()
    # coordinates sane where scored
    live = score > 200
    assert (tb[live] >= 0).all() and (qb[live] >= 0).all()


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 devices")
def test_overlap_sharded_driver():
    from smartdenovo_tpu.parallel.sharded import overlap_sharded
    from smartdenovo_tpu.pipeline.zmo import ZmoParams

    rng = np.random.default_rng(81)
    g = random_genome(rng, 15000)
    names, seqs = simulate_reads(g, coverage=7, mean_len=3500, err=0.12, seed=82)
    rb = ReadBank(names, seqs)
    params = ZmoParams.dmo(batch_q=8, cand_budget=1 << 18, pair_budget=1 << 19,
                           ncand=32)
    mesh = make_overlap_mesh(jax.devices()[:8], idx_shards=2)
    ovls = overlap_sharded(rb, params, mesh, progress=False)
    assert len(ovls) > 10

    def iv(nm):
        parts = nm.split("_")
        return int(parts[-2]), int(parts[-2]) + int(parts[-1])

    found = {(min(o.rid1, o.rid2), max(o.rid1, o.rid2)) for o in ovls}
    total = hit = 0
    for i in range(len(rb)):
        bi, ei = iv(rb.names[i])
        for j in range(i + 1, len(rb)):
            bj, ej = iv(rb.names[j])
            if min(ei, ej) - max(bi, bj) >= 2500:
                total += 1
                hit += (i, j) in found
    assert total > 10
    assert hit / total > 0.7, f"sharded recall {hit}/{total}"
