"""Multi-chip sharded overlap step — the pod-scale execution path.

Design (SURVEY.md §5.8; replaces the reference's -P/-p job split and -G
index partitioning, wtzmo.c:1431-1463) — EXACT single-chip semantics:

  mesh axes:  rd  — data parallel over query batches
              idx — the read bank (and both posting indexes) sharded by
                    contiguous read-id blocks

  Sharding the index by READ ID (not kmer hash) makes candidate scoring
  local-exact: a candidate's postings live entirely on its own shard, so
  the per-(query, candidate) k-mer union length — the reference's
  coverage score (wtzmo.c:1251-1357) — is computed exactly by one shard.
  The step then needs only two collectives:

    1. all_gather over `idx` of each shard's local top-A candidate list
       -> exact global top-A per query (a candidate appears on exactly
       one shard, so merging per-shard top-A lists is lossless);
    2. psum over `idx` of the positional dot-matrix result arrays (each
       pair is chained by exactly one shard, the candidate's).

  Everything else is the single-chip pipeline (ops/candidates
  scan_candidates, ops/dotmatrix sweep matcher + dot_matrix_align) run
  per shard — no approximations, no dense [Q, n_reads] buffers, no
  candidate caps beyond the single-chip -A itself.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.candidates import scan_candidates
from ..ops.dotmatrix import (build_query_occ_rows, dot_matrix_align,
                             extract_zmer_pairs_sweep_rows)
from ..ops.flatseeds import flat_seeds, build_indexes_device, pad_pow2
from ..ops.seeds import extract_seeds, subsample_mask
from ..utils.log import log

INT32_MAX = np.int32(0x7FFFFFFF)


def make_overlap_mesh(devices=None, idx_shards: int | None = None) -> Mesh:
    """Build a (rd, idx) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if idx_shards is None:
        idx_shards = 2 if n % 2 == 0 and n >= 4 else 1
    rd = n // idx_shards
    dev = np.array(devices[: rd * idx_shards]).reshape(rd, idx_shards)
    return Mesh(dev, ("rd", "idx"))


class ShardedBank(NamedTuple):
    """Per-shard device indexes, stacked on a leading idx axis."""

    k_kmers: jnp.ndarray   # [S, Ts] uint32
    k_rd: jnp.ndarray      # [S, Ts] int32 (global read ids)
    k_dir: jnp.ndarray     # [S, Ts] int8
    rm_zsd: jnp.ndarray    # [S, Ts] int32
    rm_pk: jnp.ndarray     # [S, Ts] int32
    rm_rd: jnp.ndarray     # [S, Ts] int32 (global read ids)
    rm_start: jnp.ndarray  # [S, n+1] int32 GLOBAL-read CSR (0-width rows
                           #          for reads owned by other shards)
    bounds: np.ndarray     # [S+1] shard read-id boundaries (host)
    stats: np.ndarray      # host copy of per-shard stat packs [S, ...]
    kneed: np.ndarray      # [n] per-read GLOBAL k16 expansion need


def build_sharded_indexes(rb, p, mesh: Mesh) -> ShardedBank:
    """Build each shard's posting indexes with the single-chip builder.

    Reads are partitioned into contiguous blocks.  Each shard's index is
    built by the same `build_indexes_device` jit as the single-chip path
    (one compile — shard tiers are padded to a common size), then stacked
    and device_put with the idx sharding.
    """
    n = len(rb)
    S = mesh.devices.shape[1]
    m = (n + S - 1) // S
    bounds = np.minimum(np.arange(S + 1) * m, n)
    # common tier across shards so the builder compiles once
    Ts = 1
    shard_sizes = []
    for s in range(S):
        lo, hi = bounds[s], bounds[s + 1]
        total = int(rb.offsets[hi] - rb.offsets[lo])
        shard_sizes.append((lo, hi, total))
        Ts = max(Ts, pad_pow2(total + 1))
    Npad = pad_pow2(n, lo=1 << 8)
    raw_k: list = []
    raw_rd: list = []
    raw_dir: list = []
    # read-major arrays carry RM_BLK alignment padding per read
    from ..ops.flatseeds import RM_BLK
    Tz = Ts + Npad * RM_BLK
    zsd = np.empty((S, Tz), np.int32)
    zpk = np.empty((S, Tz), np.int32)
    zrd = np.empty((S, Tz), np.int32)
    rst = np.zeros((S, n + 1), np.int32)
    stats_all = []
    for s, (lo, hi, total) in enumerate(shard_sizes):
        flat = np.full(Ts, 4, np.uint8)
        flat[:total] = rb.bases[rb.offsets[lo]: rb.offsets[hi]]
        offs = np.full(Npad + 1, total, np.int64)
        offs[: hi - lo + 1] = rb.offsets[lo: hi + 1] - rb.offsets[lo]
        flat_d = jnp.asarray(flat)
        offs_d = jnp.asarray(offs.astype(np.int32))
        k16 = flat_seeds(flat_d, offs_d, p.ksize, p.hz)
        z10 = flat_seeds(flat_d, offs_d, p.zsize, p.hz)
        didx = build_indexes_device(
            k16, z10, ksave=p.ksave, max_kmer_freq=p.max_kmer_freq,
            max_zmer_freq=p.max_zmer_freq, zbits=2 * p.zsize)
        # raw sampled k16 postings (frequency filtering must use GLOBAL
        # counts — a shard-local filter drops 2-frequency kmers whose two
        # copies land on different shards, exactly the overlap signal)
        kval = np.asarray(k16.valid & subsample_mask(k16.kmer, p.ksave))
        raw_k.append(np.asarray(k16.kmer)[kval])
        raw_rd.append(np.asarray(k16.comp_rd)[kval] + lo)
        raw_dir.append((np.asarray(k16.aux)[kval] & 1).astype(np.int8))
        # local read ids -> global
        local_n = hi - lo
        zsd[s] = np.asarray(didx.rm_zsd)
        zpk[s] = np.asarray(didx.rm_pk)
        rm_rd_l = np.asarray(didx.rm_rd)
        st_l = np.asarray(didx.rm_start)
        n_live_z = int(st_l[local_n])
        zrd[s] = np.where(np.arange(Tz) < n_live_z, rm_rd_l + lo, n)
        rst[s, lo: hi + 1] = st_l[: local_n + 1]
        rst[s, hi + 1:] = st_l[local_n]
        stats_all.append(np.asarray(didx.stats))

    # ---- global k16 frequency filter (reference wtzmo.c:380-418) ----
    # (host merge here; at pod scale this becomes a psum over a hashed
    # frequency table — the rule must see GLOBAL counts either way)
    allk = np.concatenate(raw_k) if raw_k else np.zeros(0, np.uint32)
    uniq, inv_counts = np.unique(allk, return_counts=True)
    n_post = int(inv_counts.sum())
    n_distinct = max(1, len(uniq))
    kavg = max(n_post // n_distinct, 20)
    cutoff = (p.max_kmer_freq if p.max_kmer_freq >= 2
              else max(kavg * 5, 100))
    keep_kmer = (inv_counts > 1) & (inv_counts <= cutoff)
    kk = np.full((S, Ts), 0xFFFFFFFF, np.uint32)
    krd = np.zeros((S, Ts), np.int32)
    kdr = np.zeros((S, Ts), np.int8)
    kneed_g = np.zeros(n, np.int64)   # per-read global expansion need
    for s in range(S):
        ki = np.searchsorted(uniq, raw_k[s])
        ok = keep_kmer[ki]
        km, rd_, dr = raw_k[s][ok], raw_rd[s][ok], raw_dir[s][ok]
        order = np.lexsort((rd_, km))
        cnt = len(km)
        if cnt > Ts:
            raise ValueError("k16 postings exceed shard tier")
        kk[s, :cnt] = km[order]
        krd[s, :cnt] = rd_[order]
        kdr[s, :cnt] = dr[order]
        np.add.at(kneed_g, rd_, inv_counts[ki][ok])

    def put(x):
        return jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("idx")))

    return ShardedBank(
        k_kmers=put(kk), k_rd=put(krd), k_dir=put(kdr),
        rm_zsd=put(zsd), rm_pk=put(zpk), rm_rd=put(zrd),
        rm_start=put(rst), bounds=bounds, stats=np.stack(stats_all),
        kneed=kneed_g,
    )


def sharded_overlap_step(mesh: Mesh, *, n_reads: int, Q: int, A: int,
                         kovl: int, len_ratio: float, ksave: int,
                         cbud: int, kq: int, occ_budget: int,
                         cross_budget: int, nbk: int, kvar: int, zbits: int,
                         max_per_read: int, nb: int, xvar: int, yvar: int,
                         min_block_len: int, max_overhang: int,
                         deviation_penalty: float, gap_penalty: float):
    """Jitted multi-chip overlap step (fixed shapes).

    Per (rd, idx) device: single-chip candidate scan against the local
    index shard -> all_gather + exact top-A merge -> single-chip sweep
    matcher + dot-matrix on the local shard -> psum of positional
    results.  Returns per-rd-shard packed arrays (host emits).
    """
    def step(qk, qoff, qspan, qvalid, zk, zoff, zspan, zdir, zvalid,
             qrids, qlens, qskip, read_lens,
             ik, ir, id_, rzsd, rzpk, rzrd, rzstart):
        Ql = qk.shape[0]           # local queries on this rd shard
        NP = Ql * A * 2
        ik, ir, id_ = ik[0], ir[0], id_[0]
        rzsd, rzpk, rzrd, rzstart = rzsd[0], rzpk[0], rzrd[0], rzstart[0]
        kvalid = qvalid & subsample_mask(qk, ksave)
        sup0 = jnp.zeros((Ql, 0), jnp.int32)
        supc0 = jnp.zeros((Ql,), jnp.int32)
        cands, ols, cand_total, probe_total = scan_candidates(
            qk, qoff, qspan, kvalid, qrids, qlens, qskip,
            ik, ir, id_, read_lens, sup0, supc0,
            budget=cbud, ncand=A, kovl=kovl, len_ratio=len_ratio,
            probe_budget=kq,
        )
        # ---- exact top-A merge over idx shards ----
        ag_c = jax.lax.all_gather(cands, axis_name="idx", axis=1)  # [Ql,S,A]
        ag_o = jax.lax.all_gather(ols, axis_name="idx", axis=1)
        Sn = ag_c.shape[1]
        flat_c = ag_c.reshape(Ql, Sn * A)
        flat_o = jnp.where(flat_c >= 0, ag_o.reshape(Ql, Sn * A), -1)
        top_o, top_i = jax.lax.top_k(flat_o, A)
        gc = jnp.take_along_axis(flat_c, top_i, axis=1)
        gc = jnp.where(top_o > 0, gc, jnp.int32(INT32_MAX))
        csorted = jnp.sort(gc, axis=1)
        # ---- single-chip sweep matcher against the local z shard ----
        occ = build_query_occ_rows(
            zk, ((zoff << 9) | (jnp.minimum(zspan, 255) << 1)
                 | zdir.astype(jnp.int32)),
            zvalid & ~qskip[:, None],
            occ_budget=occ_budget, zbits=zbits, max_per_read=max_per_read)
        pairs = extract_zmer_pairs_sweep_rows(
            qrids, csorted, occ, rzsd, rzpk, rzrd, rzstart, read_lens,
            cross_budget=cross_budget, kvar=kvar, zbits=zbits)
        res = dot_matrix_align(
            pairs,
            jnp.repeat(qlens, A * 2),
            jnp.repeat(jnp.where(
                csorted < n_reads,
                read_lens[jnp.clip(csorted, 0, n_reads - 1)], 0
            ).astype(jnp.int32).reshape(-1), 2),
            n_pairs=NP, nb=nb, xvar=xvar, yvar=yvar,
            min_block_len=min_block_len, max_overhang=max_overhang,
            deviation_penalty=deviation_penalty, gap_penalty=gap_penalty,
            nbk=nbk,
        )
        # ---- positional scatter + psum (each pair on exactly 1 shard) ----
        rows = jnp.minimum(res.pair_id, NP)

        def posit(v):
            return jnp.zeros(NP + 1, jnp.int32).at[rows].max(
                v.astype(jnp.int32), mode="drop")[:NP]

        live = (res.pair_id < NP) & (res.score > 0)
        packed = jnp.stack([
            posit(jnp.where(live, res.score, 0)),
            posit(jnp.where(live, res.tb, 0)),
            posit(jnp.where(live, res.te, 0)),
            posit(jnp.where(live, res.qb, 0)),
            posit(jnp.where(live, res.qe, 0)),
            res.match_cnt,     # already positional [NP]
        ])
        packed = jax.lax.psum(packed, axis_name="idx")
        totals = jax.lax.psum(jnp.stack([
            pairs.total, pairs.expand_total, res.blk_total,
            cand_total.astype(jnp.int32)]), axis_name="idx")[None, :]
        return csorted, packed, totals

    fn = shard_map(
        step,
        mesh=mesh,
        in_specs=(
            P("rd", None), P("rd", None), P("rd", None), P("rd", None),
            P("rd", None), P("rd", None), P("rd", None), P("rd", None),
            P("rd", None),
            P("rd"), P("rd"), P("rd"), P(),
            P("idx"), P("idx"), P("idx"),
            P("idx"), P("idx"), P("idx"), P("idx"),
        ),
        out_specs=(P("rd", None), P(None, "rd"), P("rd", None)),
        check_vma=False,
    )
    return jax.jit(fn)


def overlap_sharded(rb, params=None, mesh: Mesh | None = None,
                    progress: bool = True):
    """Multi-device overlap driver with single-chip-identical semantics.

    Streams query batches over the rd axis against the idx-sharded bank;
    host emission reuses the single-chip `_emit_batch_dm` (same nbest /
    ledger / dedup replay), so the pair set equals `overlap_dmo`'s.
    """
    from ..pipeline.zmo import ZmoParams, Overlap, _pad_tier, _emit_batch_dm

    p = params or ZmoParams.dmo()
    mesh = mesh or make_overlap_mesh()
    n_rd, n_idx = mesh.devices.shape
    n = len(rb)
    if n == 0:
        return []
    sb = build_sharded_indexes(rb, p, mesh)
    Npad = pad_pow2(n, lo=1 << 8)
    st = sb.stats  # [S, 5*Npad+3]; per-read blocks are in LOCAL shard ids
    zcnt = np.zeros(n, np.int64)        # per-read z postings (own shard)
    kprobes = np.zeros(n, np.int64)
    cross = np.zeros(n, np.int64)
    for s in range(st.shape[0]):
        lo, hi = int(sb.bounds[s]), int(sb.bounds[s + 1])
        ln = hi - lo
        zcnt[lo:hi] = st[s, :ln]
        kprobes[lo:hi] = st[s, 2 * Npad: 2 * Npad + ln]
        cross[lo:hi] = st[s, 4 * Npad: 4 * Npad + ln]
    kneed = sb.kneed                    # GLOBAL (exact per-shard bound)
    comp_max = int(st[:, 5 * Npad].max())

    A = min(p.ncand, p.dm_cand) if p.dm_cand > 0 else p.ncand
    Qloc = max(1, p.batch_q // max(1, n_rd))
    Q = Qloc * n_rd
    Ltier = _pad_tier(int(rb.lengths.max()))
    read_lens = jnp.asarray(rb.lengths.astype(np.int32))
    batches = [np.arange(n)[i: i + Q] for i in range(0, n, Q)]
    # budgets: the own-shard per-read stats estimate the per-shard masses
    # (a shard holds ~1/S of the genome's copies, so own-shard ~= any
    # shard's share); x2 slack + overflow counters in `totals`
    cbud = pad_pow2(max(int(kneed[b].sum()) for b in batches) + 1024,
                    lo=1 << 14)
    kq = pad_pow2(max(int(kprobes[b].sum()) for b in batches) + Q, lo=1 << 12)
    occ_budget = pad_pow2(max(int(zcnt[b].sum()) for b in batches) + Q,
                          lo=1 << 12)
    cross_budget = pad_pow2(2 * max(int(cross[b].sum()) for b in batches)
                            + 1024, lo=1 << 14)
    step = sharded_overlap_step(
        mesh, n_reads=n, Q=Q, A=A, kovl=p.kovl, len_ratio=p.len_ratio,
        ksave=p.ksave, cbud=cbud, kq=kq, occ_budget=occ_budget,
        cross_budget=cross_budget, nbk=max(cross_budget // 4, 1 << 14),
        kvar=p.kvar, zbits=2 * p.zsize, max_per_read=p.max_zmer_freq,
        nb=p.nb, xvar=p.xvar, yvar=p.yvar, min_block_len=p.min_block_len,
        max_overhang=p.max_overhang, deviation_penalty=p.deviation_penalty,
        gap_penalty=p.gap_penalty,
    )
    overlaps: list = []
    emitted_pairs: set = set()
    rdcovs = np.zeros(n, np.int64)
    rdmask = np.zeros(n, bool)
    avg_len = rb.avg_len()
    for b in batches:
        rids = np.concatenate(
            [b, np.full(Q - len(b), b[-1], b.dtype)]).astype(np.int32)
        qskip = np.zeros(Q, bool)
        qskip[len(b):] = True
        batch, lens = rb.batch(rids, pad_to=Ltier)
        kres = extract_seeds(jnp.asarray(batch), jnp.asarray(lens),
                             p.ksize, p.hz)
        zres = extract_seeds(jnp.asarray(batch), jnp.asarray(lens),
                             p.zsize, p.hz)
        csorted, packed, totals = step(
            kres["kmer"], kres["off"], kres["span"], kres["valid"],
            zres["kmer"], zres["off"], zres["span"],
            zres["dir"], zres["valid"],
            jnp.asarray(rids), jnp.asarray(lens.astype(np.int32)),
            jnp.asarray(qskip), read_lens,
            sb.k_kmers, sb.k_rd, sb.k_dir,
            sb.rm_zsd, sb.rm_pk, sb.rm_rd, sb.rm_start,
        )
        csorted = np.asarray(csorted)
        packed = np.asarray(packed)
        NP = Q * A * 2
        # pack rows in the single-chip emit layout
        pos = np.arange(NP, dtype=np.int64)
        row = np.concatenate([
            pos,                       # pair_id (positional)
            packed[0], packed[1], packed[2], packed[3], packed[4],
            packed[5],
            np.asarray(totals).max(axis=0).astype(np.int64),
        ])
        _emit_batch_dm(rb, p, rids, row, csorted, Q, A, rdcovs, rdmask,
                       overlaps, emitted_pairs, set(), None, avg_len)
        if progress:
            log("sharded overlap %d/%d reads, %d overlaps",
                min(n, int(b[-1]) + 1), n, len(overlaps))
    return overlaps
