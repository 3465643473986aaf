"""Multi-chip sharded overlap step — the pod-scale execution path.

Design (SURVEY.md §5.8, replacing the reference's -P/-p job split +
-G index partitioning, wtzmo.c:1431-1463):

  mesh axes:  rd  — data parallel over query reads
              idx — the k-mer/z-mer posting index sharded by
                    jenkins(kmer) % n_idx (the same smear used for the
                    reference's subsampling, wtzmo.c:270)

  step:  every (rd, idx) device scans its query shard against its index
         shard; per-candidate coverage partials are psum'd over `idx`,
         top-A candidates are picked locally per rd shard; z-mer seed
         pairs are extracted per index shard and all-gathered over `idx`
         so each rd shard chains its own pairs' dot-matrix alignment.
         Overlap records stay sharded over `rd` (gathered by the host at
         the end of the stage, like the reference's file concatenation).

Collectives ride the ICI mesh; no host round-trips inside a step.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.seeds import jenkins_hash_u32
from ..ops.dotmatrix import PairBatch, dot_matrix_align


class ShardedIndex(NamedTuple):
    """Posting index sharded by kmer-hash range; equal-size shards."""

    kmers: jnp.ndarray     # [S, Pp] uint32 sorted within shard (pad 0xFFFFFFFF)
    post_rd: jnp.ndarray   # [S, Pp] int32
    post_dir: jnp.ndarray  # [S, Pp] int8
    post_off: jnp.ndarray  # [S, Pp] int32
    post_span: jnp.ndarray # [S, Pp] int32


def shard_index(kmers, post_rd, post_dir, post_off, post_span, n_shards: int) -> ShardedIndex:
    """Partition sorted postings by jenkins(kmer) % n_shards, re-sorting
    each shard by (kmer, rd)."""
    kmers = np.asarray(kmers)
    h = np.zeros(len(kmers), np.uint32)
    # jenkins on host (same arithmetic as ops.seeds.jenkins_hash_u32)
    key = kmers.astype(np.uint64)
    key = (key + (key << 12)) & 0xFFFFFFFF
    key ^= key >> 22
    key = (key + (key << 4)) & 0xFFFFFFFF
    key ^= key >> 9
    key = (key + (key << 10)) & 0xFFFFFFFF
    key ^= key >> 2
    key = (key + (key << 7)) & 0xFFFFFFFF
    key ^= key >> 12
    h = (key % n_shards).astype(np.int64)
    maxp = max(int((h == s).sum()) for s in range(n_shards)) if len(kmers) else 1
    maxp = max(1, maxp)
    Ks = np.full((n_shards, maxp), 0xFFFFFFFF, np.uint32)
    Rs = np.zeros((n_shards, maxp), np.int32)
    Ds = np.zeros((n_shards, maxp), np.int8)
    Os = np.zeros((n_shards, maxp), np.int32)
    Ss = np.zeros((n_shards, maxp), np.int32)
    for s in range(n_shards):
        sel = h == s
        cnt = int(sel.sum())
        Ks[s, :cnt] = kmers[sel]
        Rs[s, :cnt] = np.asarray(post_rd)[sel]
        Ds[s, :cnt] = np.asarray(post_dir)[sel]
        if post_off is not None:
            Os[s, :cnt] = np.asarray(post_off)[sel]
            Ss[s, :cnt] = np.asarray(post_span)[sel]
    return ShardedIndex(
        jnp.asarray(Ks), jnp.asarray(Rs), jnp.asarray(Ds), jnp.asarray(Os), jnp.asarray(Ss)
    )


def make_overlap_mesh(devices=None, idx_shards: int | None = None) -> Mesh:
    """Build a (rd, idx) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if idx_shards is None:
        idx_shards = 2 if n % 2 == 0 and n >= 4 else 1
    rd = n // idx_shards
    dev = np.array(devices[: rd * idx_shards]).reshape(rd, idx_shards)
    return Mesh(dev, ("rd", "idx"))


def sharded_overlap_step(mesh: Mesh, n_reads: int, *, budget: int, pair_budget: int,
                         ncand: int, kovl: int, nb: int = 16):
    """Build the jitted multi-chip overlap step for fixed shapes.

    Returns a function
      f(qk, qoff, qspan, qvalid, qdir, qrids, qlens, read_lens, kidx, zidx)
        -> (cands [Q, A], ols [Q, A], dm_score [Q*A*2... sharded over rd])
    with qk.. sharded over `rd` on axis 0 and index shards over `idx`.
    """
    A = ncand

    def step(qk, qspan16, qvalid, zqk, zqoff, zqspan, zqvalid, zqdir,
             qrids, qlens, read_lens,
             ik, ir, id_, zk, zr, zd, zo, zs):
        # ---- candidate partials against the local index shard ----
        Q, L = qk.shape
        ik = ik[0]
        ir = ir[0]
        flat = qk.reshape(-1)
        start = jnp.searchsorted(ik, flat, side="left").astype(jnp.int32)
        end = jnp.searchsorted(ik, flat, side="right").astype(jnp.int32)
        cnt = jnp.where(qvalid.reshape(-1), end - start, 0)
        cum = jnp.cumsum(cnt)
        pidx = jnp.arange(budget, dtype=jnp.int32)
        src = jnp.clip(jnp.searchsorted(cum, pidx, side="right"), 0, Q * L - 1).astype(jnp.int32)
        prev = jnp.where(src > 0, cum[src - 1], 0)
        pi = jnp.clip(start[src] + (pidx - prev.astype(jnp.int32)), 0, ir.shape[0] - 1)
        alive = pidx < cum[-1]
        q_local = src // L
        cand = ir[pi]
        span = qspan16.reshape(-1)[src]
        keep = alive & (cand != qrids[q_local]) & (
            read_lens[jnp.clip(cand, 0, read_lens.shape[0] - 1)] <= (1.2 * qlens[q_local]).astype(jnp.int32)
        )
        # dense partial coverage [Q, n_reads]: approximate union by capped sum
        seg = jnp.where(keep, q_local * n_reads + cand, Q * n_reads)
        partial = jax.ops.segment_sum(
            jnp.where(keep, span, 0), seg, num_segments=Q * n_reads + 1
        )[: Q * n_reads].reshape(Q, n_reads)
        total = jax.lax.psum(partial, axis_name="idx")
        total = jnp.minimum(total, qlens[:, None])
        total = jnp.where(total >= kovl, total, 0)
        if n_reads < A:  # tiny banks: pad columns so top_k(A) is valid
            total = jnp.pad(total, ((0, 0), (0, A - n_reads)))
        ols, cands = jax.lax.top_k(total, A)
        cands = jnp.where(ols > 0, cands, -1)
        # ---- zmer pairs against the local zmer shard ----
        zk0 = zk[0]
        zr0 = zr[0]
        csorted = jnp.sort(jnp.where(cands < 0, jnp.int32(0x7FFFFFFF), cands), axis=1)
        zflat = zqk.reshape(-1)
        startz = jnp.searchsorted(zk0, zflat, side="left").astype(jnp.int32)
        endz = jnp.searchsorted(zk0, zflat, side="right").astype(jnp.int32)
        cntz = jnp.where(zqvalid.reshape(-1), endz - startz, 0)
        cumz = jnp.cumsum(cntz)
        pz = jnp.arange(pair_budget, dtype=jnp.int32)
        srcz = jnp.clip(jnp.searchsorted(cumz, pz, side="right"), 0, Q * L - 1).astype(jnp.int32)
        prevz = jnp.where(srcz > 0, cumz[srcz - 1], 0)
        piz = jnp.clip(startz[srcz] + (pz - prevz.astype(jnp.int32)), 0, zr0.shape[0] - 1)
        alivez = pz < cumz[-1]
        qlz = srcz // L
        crd = zr0[piz]
        # membership among this query's candidates
        pos = jnp.searchsorted(
            csorted, crd[:, None], side="left"
        ) if False else None
        # manual per-row binary search
        lo = jnp.zeros(pair_budget, jnp.int32)
        hi = jnp.full(pair_budget, A, jnp.int32)
        for _ in range(max(1, (A - 1).bit_length()) + 1):
            mid = (lo + hi) >> 1
            mv = csorted[qlz, jnp.clip(mid, 0, A - 1)]
            go = (mv < crd) & (mid < hi)
            lo = jnp.where(go, mid + 1, lo)
            hi = jnp.where(go, hi, jnp.where(mid < hi, mid, hi))
        slot = jnp.clip(lo, 0, A - 1)
        found = csorted[qlz, slot] == crd
        keepz = alivez & found
        pdir = (zqdir.reshape(-1)[srcz] ^ (zd[0][piz] != 0)).astype(jnp.int32)
        clen = read_lens[jnp.clip(crd, 0, read_lens.shape[0] - 1)]
        o2 = jnp.where(pdir == 1, clen - (zo[0][piz] + zs[0][piz]), zo[0][piz])
        pair_id = jnp.where(keepz, (qlz * A + slot) * 2 + pdir, Q * A * 2)
        fields = (
            pair_id,
            jnp.where(keepz, zqoff.reshape(-1)[srcz], 0),
            jnp.where(keepz, o2, 0),
            jnp.where(keepz, zqspan.reshape(-1)[srcz], 0),
            jnp.where(keepz, zs[0][piz], 0),
        )
        # gather every index shard's pairs onto the rd shard
        gathered = [
            jax.lax.all_gather(f, axis_name="idx", axis=0).reshape(-1) for f in fields
        ]
        match_cnt = jax.ops.segment_sum(
            (gathered[0] < Q * A * 2).astype(jnp.int32),
            jnp.minimum(gathered[0], Q * A * 2),
            num_segments=Q * A * 2 + 1,
        )[: Q * A * 2]
        pairs = PairBatch(
            pair_id=gathered[0], off1=gathered[1], off2=gathered[2],
            len1=gathered[3], len2=gathered[4],
            match_cnt=match_cnt, total=jnp.sum(match_cnt),
            expand_total=jnp.sum(match_cnt),
        )
        qlen_of_pair = jnp.repeat(qlens, A * 2)
        clen_of_pair = jnp.repeat(
            read_lens[jnp.clip(csorted, 0, read_lens.shape[0] - 1)].reshape(-1), 2
        )
        res = dot_matrix_align(
            pairs, qlen_of_pair, clen_of_pair, n_pairs=Q * A * 2, nb=nb,
        )
        return cands, ols, res.pair_id, res.score, res.tb, res.te, res.qb, res.qe

    specs_q = P("rd", None)
    spec_i = P("idx", None)
    fn = shard_map(
        step,
        mesh=mesh,
        in_specs=(
            specs_q, specs_q, specs_q,                    # k16: qk qspan qvalid
            specs_q, specs_q, specs_q, specs_q, specs_q,  # zmer: zqk zqoff zqspan zqvalid zqdir
            P("rd"), P("rd"), P(),                        # qrids qlens read_lens
            spec_i, spec_i, spec_i,                       # kmer shards
            spec_i, spec_i, spec_i, spec_i, spec_i,       # zmer shards
        ),
        out_specs=(
            P("rd", None), P("rd", None),
            P("rd"), P("rd"), P("rd"), P("rd"), P("rd"), P("rd"),
        ),
        check_vma=False,
    )
    return jax.jit(fn)


def overlap_sharded(rb, params=None, mesh: Mesh | None = None, progress: bool = True):
    """Multi-device overlap driver: full all-vs-all via the sharded step.

    Batches of queries stream over the `rd` axis while the posting index
    stays sharded over `idx`; host post-processing applies the same
    score/identity filters and pair dedup as the single-chip driver.
    Candidate coverage uses the capped-sum approximation (psum over idx
    shards), so candidate sets can differ slightly from the single-chip
    union-length scoring; final overlaps are still dot-matrix-scored.
    """
    from ..data.readbank import ReadBank
    from ..ops.index import build_kmer_index, build_zmer_index
    from ..ops.seeds import extract_seeds, subsample_mask
    from ..pipeline.zmo import Overlap, ZmoParams, _pad_tier
    from ..utils.log import log

    p = params or ZmoParams.dmo()
    mesh = mesh or make_overlap_mesh()
    n_rd, n_idx = mesh.devices.shape
    n = len(rb)
    if n == 0:
        return []
    kidx = build_kmer_index(rb, p.ksize, p.hz, p.ksave, p.max_kmer_freq)
    zidx = build_zmer_index(rb, p.zsize, p.hz, p.max_zmer_freq)
    sk = shard_index(kidx.kmers, kidx.post_rd, kidx.post_dir, None, None, n_idx)
    sz = shard_index(zidx.zmers, zidx.post_rd, zidx.post_dir, zidx.post_off,
                     zidx.post_span, n_idx)
    read_lens = jnp.asarray(rb.lengths)
    A = min(p.ncand, 64)
    Q = max(p.batch_q, n_rd)
    Q = ((Q + n_rd - 1) // n_rd) * n_rd
    Ltier = _pad_tier(int(rb.lengths[0]))
    step = sharded_overlap_step(
        mesh, n, budget=p.cand_budget // n_idx, pair_budget=p.pair_budget // n_idx,
        ncand=A, kovl=p.kovl, nb=p.nb,
    )
    overlaps = []
    emitted = set()
    for b0 in range(0, n, Q):
        real = np.arange(b0, min(n, b0 + Q))
        rids = np.concatenate([real, np.full(Q - len(real), real[-1], real.dtype)])
        batch, lens = rb.batch(rids, pad_to=Ltier)
        kres = extract_seeds(jnp.asarray(batch), jnp.asarray(lens), p.ksize, p.hz)
        kvalid = kres["valid"] & subsample_mask(kres["kmer"], p.ksave)
        zres = extract_seeds(jnp.asarray(batch), jnp.asarray(lens), p.zsize, p.hz)
        out = step(
            kres["kmer"], kres["span"], kvalid,
            zres["kmer"], zres["off"], zres["span"], zres["valid"], zres["dir"],
            jnp.asarray(rids, jnp.int32), jnp.asarray(lens), read_lens,
            sk.kmers, sk.post_rd, sk.post_dir,
            sz.kmers, sz.post_rd, sz.post_dir, sz.post_off, sz.post_span,
        )
        cands, ols, pair_id, score, tb, te, qb, qe = (np.asarray(x) for x in out)
        csorted = np.sort(np.where(cands < 0, 0x7FFFFFFF, cands), axis=1)
        # pair ids are shard-local (each rd shard numbers its own Qloc rows);
        # the position within the concatenated output identifies the shard
        Qloc = Q // n_rd
        rows_per_shard = Qloc * A * 2
        for row in range(len(pair_id)):
            pid = int(pair_id[row])
            if pid >= rows_per_shard:
                continue
            shard = row // rows_per_shard
            qi = shard * Qloc + pid // (A * 2)
            slot = (pid // 2) % A
            d = pid & 1
            if qi >= len(real):
                continue
            qrid = int(rids[qi])
            cand = int(csorted[qi, slot])
            if cand >= n or cand == qrid:
                continue
            sc = int(score[row])
            ol = max(int(te[row] - tb[row]), int(qe[row] - qb[row]))
            if ol <= 0 or sc < p.min_score or sc < int(p.min_id * ol):
                continue
            key = (min(qrid, cand), max(qrid, cand))
            if key in emitted:
                continue
            emitted.add(key)
            overlaps.append(Overlap(
                rid1=qrid, dir1=0, beg1=int(tb[row]), end1=int(te[row]),
                rid2=cand, dir2=d, beg2=int(qb[row]), end2=int(qe[row]),
                score=sc, identity=sc / ol, mat=sc, mis=0, ins=0, dl=0, aln=ol,
            ))
        if progress:
            log("sharded overlap %d/%d reads, %d overlaps", min(n, b0 + Q), n,
                len(overlaps))
    return overlaps
