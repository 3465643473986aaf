"""All-vs-all overlap stage — equivalent of the reference `wtzmo`.

Dot-matrix (SW-free) engine first: candidate selection on the k-mer index,
z-mer seed-pair extraction, batched dot-matrix chaining on device, and
17-column overlap TSV emission (reference wtzmo.c; output format
README-tools.md:119-139).

Scheduling model (deterministic replacement for the reference's thread
pool + closed_alns ledger, wtzmo.c:1309-1334, 813-820): reads are
processed in strict (length desc, name asc) order in fixed batches; a
pair is attempted once, by the earlier query; the attempted-pair ledger
drives candidate suppression for later queries exactly like closed_alns.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from ..data.readbank import ReadBank
from ..ops.seeds import (extract_seeds, subsample_mask, np_canonical_kmers,
                         np_jenkins_u32)
from ..ops.index import build_kmer_index, build_zmer_index
from ..ops.candidates import scan_candidates
from ..ops.dotmatrix import (extract_zmer_pairs, extract_zmer_pairs_join,
                             dot_matrix_align, PairBatch)
from ..ops.zmo_sw import sw_align_batch
from ..utils.log import log

INT32_MAX = np.int32(0x7FFFFFFF)

import os as _os
import time as _time

_PROF = _os.environ.get("SDTPU_PROF", "") == "1"
_prof_acc: dict = {}


def _prof(name, value=None):
    """Accumulate phase wall-times when SDTPU_PROF=1 (forces syncs)."""
    if not _PROF:
        return
    import jax

    if value is not None:
        jax.block_until_ready(value)
    now = _time.perf_counter()
    last = _prof_acc.get("_last")
    if name != "_start" and last is not None:
        _prof_acc[name] = _prof_acc.get(name, 0.0) + (now - last)
    _prof_acc["_last"] = now


def prof_report():
    for k, v in sorted(_prof_acc.items()):
        if not k.startswith("_"):
            log("PROF %-14s %8.2fs", k, v)


def _pad_tier(n: int, tiers=(2048, 4096, 8192, 16384, 32768, 65536)) -> int:
    """Pad lengths to a few fixed tiers so device kernels compile once."""
    for t in tiers:
        if n <= t:
            return t
    return ((n + 65535) // 65536) * 65536


@dataclasses.dataclass
class ZmoParams:
    # seeding (wtzmo defaults, wtzmo.c:1536-1588; dmo pipeline overrides)
    ksize: int = 16
    zsize: int = 10
    hz: bool = True
    ksave: int = 4            # -S subsampling
    max_kmer_freq: int = 0    # -K 0 => auto 5x avg depth
    max_zmer_freq: int = 64   # -Z (dmo: 16) per-read zmer cap
    kvar: int = 2             # -l max span difference of matched zmers
    kovl: int = 300           # -d min kmer covered len for a candidate
    ztot: int = 300           # -r min total zmer seeding region
    ncand: int = 500          # -A (dmo: 1000)
    # dot-matrix candidate width: only the top dm_cand candidates (by k16
    # union length) per query go through zmer extraction + dot-matrix.
    # Measured on the bench set every true pair ranks < 48 on at least one
    # side, so 128 keeps exact recall while cutting pair mass ~4x; raise
    # for very deep coverage (true overlaps/read ~ 2x coverage).
    dm_cand: int = 128
    nbest: int = 100          # -B
    min_score: int = 200      # -s
    min_id: float = 0.5       # -m (dmo: 0.1)
    max_unalign_dovetail: int = 200
    len_ratio: float = 1.2
    # dot matrix (wtzmo.c:1583-1588, -U -1 defaults)
    xvar: int = 128
    yvar: int = 64
    min_block_len: int = 160
    max_overhang: int = 256
    deviation_penalty: float = 1.0
    gap_penalty: float = 0.05
    # batching / budgets (TPU shapes)
    batch_q: int = 16
    cand_budget: int = 1 << 20
    expand_budget: int = 1 << 22        # initial guess; sized per batch
    expand_budget_cap: int = 1 << 25    # hard memory ceiling
    pair_budget: int = 1 << 20
    nb: int = 32

    # SW (zmo) engine
    engine: str = "dm"        # "dm" = dot-matrix (-U), "sw" = banded local DP
    sw_match: int = 2         # -M
    sw_mismatch: int = -5     # -X
    sw_gap: int = -3          # -O
    band_w: int = 256         # band width around the chain diagonal
    align_cap: int = 64       # chains aligned per query per batch (SW engine)
    emit_cigar: bool = False  # attach real CIGARs to SW overlaps (the
                              # reference pipeline drops col 17 via cut -f1-16,
                              # so this costs extra device work only on demand)

    @classmethod
    def dmo(cls, **kw) -> "ZmoParams":
        """smartdenovo.pl dmo engine flags: -k 16 -z 10 -Z 16 -U -1 -m 0.1 -A 1000."""
        d = dict(max_zmer_freq=16, min_id=0.1, ncand=1000, engine="dm")
        d.update(kw)
        return cls(**d)

    @classmethod
    def zmo(cls, **kw) -> "ZmoParams":
        """smartdenovo.pl zmo engine flags: wtzmo -s 200 -m 0.6 (SW mode)."""
        d = dict(min_id=0.6, min_score=200, ncand=500, engine="sw")
        d.update(kw)
        return cls(**d)


@dataclasses.dataclass
class Overlap:
    """One 17-column overlap record (README-tools.md:119-139)."""

    rid1: int
    dir1: int
    beg1: int
    end1: int
    rid2: int
    dir2: int
    beg2: int
    end2: int
    score: int
    identity: float
    mat: int
    mis: int
    ins: int
    dl: int
    aln: int
    cigar: str = "0M"

    def to_tsv(self, names, lengths) -> str:
        return (
            f"{names[self.rid1]}\t{'+-'[self.dir1]}\t{lengths[self.rid1]}\t{self.beg1}\t{self.end1}"
            f"\t{names[self.rid2]}\t{'+-'[self.dir2]}\t{lengths[self.rid2]}\t{self.beg2}\t{self.end2}"
            f"\t{self.score}\t{self.identity:.3f}\t{self.mat}\t{self.mis}\t{self.ins}\t{self.dl}"
            f"\t{self.cigar}"
        )


def overlap_dmo(rb: ReadBank, params: ZmoParams | None = None, progress: bool = True,
                preattempted=None, attempted_out: list | None = None,
                parts: int = 1, part: int = 0):
    """Run the dot-matrix all-vs-all overlapper.  Returns list[Overlap].

    Device work is dispatched asynchronously one batch ahead of the host
    post-processing (emit); the attempted-pair ledger therefore lags one
    batch, which stays deterministic — cross-batch duplicate attempts are
    resolved at emit time by the global emitted-pair set.

    preattempted: iterable of (name1, name2) pairs to skip (the reference's
    -L ledger, wtzmo.c:1758-1773).  attempted_out: if a list is passed,
    every attempted pair is appended as (name1, name2) (the -9 ledger).

    parts/part mirror the reference's -P/-p multi-node split (wtzmo
    usage, README-tools.md:112-117): this invocation overlaps only the
    query reads with index % parts == part against the FULL index; run
    one part per node and concatenate the outputs (duplicates dedup at
    load, as with the reference).
    """
    p = params or ZmoParams.dmo()
    n = len(rb)
    if n == 0:
        return []
    kidx = build_kmer_index(rb, p.ksize, p.hz, p.ksave, p.max_kmer_freq)
    zidx = build_zmer_index(rb, p.zsize, p.hz, p.max_zmer_freq)
    read_lens = jnp.asarray(rb.lengths)
    if p.engine == "sw":
        flat_bases = jnp.asarray(rb.bases)
        read_offs = jnp.asarray(rb.offsets.astype(np.int32))
    avg_len = rb.avg_len()
    rdcovs = np.zeros(n, np.int64)
    rdmask = np.zeros(n, bool)  # contained reads (SW engine skip_contained)
    attempted_by: list[list[int]] = [[] for _ in range(n)]
    if preattempted:
        for n1, n2 in preattempted:
            i1 = rb.name2id.get(n1)
            i2 = rb.name2id.get(n2)
            if i1 is None or i2 is None:
                continue
            attempted_by[i1].append(i2)
            attempted_by[i2].append(i1)
    overlaps: list[Overlap] = []
    emitted_pairs: set[tuple[int, int]] = set()
    A = p.ncand
    Adm = min(p.dm_cand, A)
    Q = p.batch_q
    # pair-budget sizing: survivors of the candidate slot filter as a
    # fraction of the expansion; self-tunes from completed batches, with an
    # overflow redispatch as the safety net (silent truncation loses pairs)
    # candidate-entry budget for the sort-join matcher.  Sound upper bound:
    # Q * (sum of the Adm largest per-read zmer counts); start at half and
    # self-tune from observed totals, with an overflow redispatch.
    mb_bound = int(Q * zidx.np_top_z[:Adm].sum()) if len(zidx.np_top_z) else 1 << 18
    mb_bound = max(1 << 18, 1 << int(np.ceil(np.log2(mb_bound + 1024))))
    mb_bound = min(mb_bound, 1 << 26)
    exp_hist = [mb_bound // 4]   # observed candidate-entry totals
    pair_hist = [mb_bound // 8]  # observed match totals; sizes the pair budget
    blk_hist = [mb_bound // 32]  # observed dot-matrix block totals
    # one length tier for the whole run: reads are length-sorted desc, so
    # rb.lengths[0] is the maximum — a single compile per kernel
    Ltier = _pad_tier(int(rb.lengths[0]) if n else 1024)

    def dispatch(b0, pbud_override=None, mb_override=None, nbk_override=None):
        real = qarr[b0 : min(len(qarr), b0 + Q)]
        rids = np.concatenate([real, np.full(Q - len(real), real[-1], real.dtype)])
        batch, lens = rb.batch(rids, pad_to=Ltier)
        _prof("host_batch")
        nbest_of = np.maximum(p.nbest, p.nbest * lens.astype(np.int64) // max(1, avg_len))
        qskip = (rdcovs[rids] >= nbest_of) | rdmask[rids]
        qskip[len(real):] = True
        sup_lists = [sorted(attempted_by[r]) for r in rids]
        S = _pad_tier(max(1, max((len(s) for s in sup_lists), default=1)),
                      tiers=(16, 64, 256, 1024, 4096, 16384))
        sup = np.full((Q, S), INT32_MAX, np.int32)
        sup_cnt = np.zeros(Q, np.int32)
        for i, s in enumerate(sup_lists):
            sup[i, : len(s)] = s
            sup_cnt[i] = len(s)
        sup_cnt[len(real):] = 0
        _prof("_start")
        kres = extract_seeds(jnp.asarray(batch), jnp.asarray(lens), p.ksize, p.hz)
        kvalid = kres["valid"] & subsample_mask(kres["kmer"], p.ksave)
        _prof("seeds16", kvalid)
        # exact host-side candidate-expansion sizing
        kcodes, kval = np_canonical_kmers(batch, lens, p.ksize, p.hz)
        k32 = kcodes.astype(np.uint32).reshape(-1)
        if p.ksave > 1:
            sub = (np_jenkins_u32(k32) % np.uint32(1024 * p.ksave)) < np.uint32(1024)
        else:
            sub = np.ones(k32.shape, bool)
        klo = np.searchsorted(kidx.np_kmers, k32, side="left")
        khi = np.searchsorted(kidx.np_kmers, k32, side="right")
        kneed = int(np.where(kval.reshape(-1) & sub, khi - klo, 0).sum())
        # quantize to factor-4 tiers: each distinct budget costs one compile
        cbud = max(1 << 18, 1 << (2 * int(np.ceil(np.log2(kneed + 1024) / 2))))
        cbud = min(cbud, p.expand_budget_cap)
        _prof("host_size_k")
        cands_d, ols_d, cand_total = scan_candidates(
            kres["kmer"], kres["off"], kres["span"], kvalid,
            jnp.asarray(rids, jnp.int32), jnp.asarray(lens), jnp.asarray(qskip),
            kidx.kmers, kidx.post_rd, kidx.post_dir, read_lens,
            jnp.asarray(sup), jnp.asarray(sup_cnt),
            budget=cbud, ncand=A, kovl=p.kovl, len_ratio=p.len_ratio,
        )
        _prof("cands", cands_d)
        # only the top dm_cand ol-ranked candidates reach the dot-matrix;
        # candidate table sorted by id, on device (no host sync)
        cands_dm = cands_d[:, :Adm]
        csorted_d = jnp.sort(
            jnp.where(cands_dm < 0, INT32_MAX, cands_dm), axis=1
        ).astype(jnp.int32)
        zres = extract_seeds(jnp.asarray(batch), jnp.asarray(lens), p.zsize, p.hz)
        _prof("seeds10", zres["kmer"])
        # sort-join matcher: both budgets self-tune from observed totals,
        # with overflow redispatch as the safety net (never silently drops)
        if mb_override is not None:
            MB = mb_override
        else:
            eneed = int(max(exp_hist) * 1.3) + 1024
            MB = max(1 << 18, 1 << int(np.ceil(np.log2(eneed))))
            MB = min(MB, mb_bound)
        ebud = MB
        if pbud_override is not None:
            pbud = pbud_override
        else:
            pneed = int(max(pair_hist) * 1.3) + 1024
            pbud = max(1 << 18, 1 << int(np.ceil(np.log2(pneed))))
            pbud = min(pbud, MB)
        pairs = extract_zmer_pairs_join(
            zres["kmer"], zres["dir"], zres["off"], zres["span"], zres["valid"],
            csorted_d,
            zidx.rm_zsd, zidx.rm_pk, zidx.rm_start, read_lens,
            expand_budget=MB, pair_budget=pbud, kvar=p.kvar,
            zbits=2 * p.zsize, max_per_read=p.max_zmer_freq,
        )
        _prof("zpairs", pairs.pair_id)
        clen_of_pair = jnp.repeat(
            jnp.where(csorted_d < n, read_lens[jnp.clip(csorted_d, 0, n - 1)], 0)
            .astype(jnp.int32).reshape(-1), 2
        )
        qlen_of_pair = jnp.repeat(jnp.asarray(lens.astype(np.int32)), Adm * 2)
        if nbk_override is not None:
            nbk = nbk_override
        else:
            nbk = max(1 << 16, 1 << int(np.ceil(np.log2(int(max(blk_hist) * 1.3) + 1024))))
            nbk = min(nbk, pbud)
        res = dot_matrix_align(
            pairs, qlen_of_pair, clen_of_pair,
            n_pairs=Q * Adm * 2, nb=p.nb,
            xvar=p.xvar, yvar=p.yvar, min_block_len=p.min_block_len,
            max_overhang=p.max_overhang,
            deviation_penalty=p.deviation_penalty, gap_penalty=p.gap_penalty,
            nbk=nbk,
        )
        _prof("dotmx", res.score)
        out = dict(rids=rids, lens=lens, cands=cands_dm, csorted=csorted_d,
                   match_cnt=res.match_cnt, total=pairs.total,
                   expand_total=pairs.expand_total, ebud=ebud, pbud=pbud,
                   nbk=nbk, blk_total=res.blk_total,
                   cbud=cbud, cand_total=cand_total, res=res, b0=b0,
                   )
        if p.engine == "sw":
            out["sw"] = sw_align_batch(
                res.pair_id, res.score, res.tb, res.te, res.qb, res.qe,
                csorted_d, jnp.asarray(batch), jnp.asarray(lens),
                flat_bases, read_offs, read_lens,
                Q=Q, A=Adm, C=min(p.align_cap, Adm), Ltier=Ltier, W=p.band_w,
                match=p.sw_match, mismatch=p.sw_mismatch, gap=p.sw_gap,
            )
        return out

    def settle(d):
        # pair-budget overflow would silently drop matches: redispatch the
        # batch synchronously with the full expansion budget, then record
        # the observed survivor ratio so later batches size tighter
        total = int(d["total"])
        texp = int(d["expand_total"])
        tblk = int(d["blk_total"])
        for _ in range(4):
            if texp <= d["ebud"] and total <= d["pbud"] and tblk <= d["nbk"]:
                break
            # a truncated buffer under-reports downstream totals, so grow
            # every overflowing budget and re-verify after the redispatch
            newe = max(d["ebud"], 1 << int(np.ceil(np.log2(texp + 1024))))
            newp = max(min(d["pbud"] * 2, newe),
                       1 << int(np.ceil(np.log2(total + 1024))))
            newk = max(min(d["nbk"] * 2, newp),
                       1 << int(np.ceil(np.log2(tblk + 1024))))
            log("budget overflow (exp %d/%d, pair %d/%d, blk %d/%d): redispatch %d/%d/%d",
                texp, d["ebud"], total, d["pbud"], tblk, d["nbk"], newe, newp, newk)
            d = dispatch(d["b0"], pbud_override=newp, mb_override=newe,
                         nbk_override=newk)
            total = int(d["total"])
            texp = int(d["expand_total"])
            tblk = int(d["blk_total"])
        exp_hist.append(texp)
        del exp_hist[:-64]
        pair_hist.append(total)
        del pair_hist[:-64]
        blk_hist.append(tblk)
        del blk_hist[:-64]
        _finish_batch(rb, p, d, rdcovs, attempted_by, overlaps,
                      emitted_pairs, Adm, rdmask, attempted_out)

    qarr = np.arange(n) if parts <= 1 else np.arange(n)[part::parts]
    pending = None
    for b0 in range(0, len(qarr), Q):
        _prof("_start")
        nxt = dispatch(b0)
        _prof("_start")
        if pending is not None:
            settle(pending)
        _prof("finish")
        pending = nxt
        if progress and (b0 // Q) % 8 == 0:
            log("overlapped %d/%d reads, %d overlaps", min(len(qarr), b0 + Q), len(qarr), len(overlaps))
    if pending is not None:
        settle(pending)
    log("overlap done: %d overlaps", len(overlaps))
    if _PROF:
        prof_report()
    return overlaps


def _finish_batch(rb, p, d, rdcovs, attempted_by, overlaps, emitted_pairs, A,
                  rdmask=None, attempted_out=None):
    if int(d["cand_total"]) > d.get("cbud", p.cand_budget):
        log("WARNING: candidate budget overflow (%d > %d)", int(d["cand_total"]),
            d.get("cbud", p.cand_budget))
    if int(d["total"]) > d.get("pbud", p.pair_budget):
        log("WARNING: pair budget overflow (%d > %d)", int(d["total"]),
            d.get("pbud", p.pair_budget))
    if int(d.get("expand_total", 0)) > d.get("ebud", p.expand_budget):
        log("WARNING: zmer expansion overflow (%d > %d)", int(d["expand_total"]),
            d.get("ebud", p.expand_budget))
    if p.engine == "sw":
        _emit_batch_sw(rb, p, d, rdcovs, attempted_by, overlaps, emitted_pairs,
                       rdmask, attempted_out)
    else:
        _emit_batch(
            rb, p, d["rids"], d["lens"], np.asarray(d["cands"]), np.asarray(d["csorted"]),
            np.asarray(d["match_cnt"]), d["res"], rdcovs, attempted_by, overlaps, A,
            emitted_pairs, attempted_out,
        )


def _emit_batch(rb, p, rids, lens, cands, csorted, match_cnt, res, rdcovs,
                attempted_by, overlaps, A, emitted_pairs=None, attempted_out=None):
    """Host-side combine (vectorised): dir choice, ztot gate, ledger, dedup."""
    if emitted_pairs is None:
        emitted_pairs = set()
    n = len(rb)
    q = len(rids)
    NP2 = q * A * 2
    pair_ids = np.asarray(res.pair_id)
    rowmap = np.full(NP2 + 1, -1, np.int64)
    livep = pair_ids < NP2
    rowmap[pair_ids[livep]] = np.nonzero(livep)[0]
    score_a = np.asarray(res.score)
    tb_a, te_a, qb_a, qe_a = (np.asarray(x) for x in (res.tb, res.te, res.qb, res.qe))
    # per (q, slot): matches, best dir, row
    mc2 = match_cnt.reshape(q, A, 2)
    mc = mc2.sum(axis=2)
    live_slot = (csorted < n)
    attempted_mask = live_slot & (mc * p.zsize >= p.ztot)
    pid0 = (np.arange(q)[:, None] * A + np.arange(A)[None, :]) * 2
    r0 = rowmap[np.minimum(pid0, NP2)]
    r1 = rowmap[np.minimum(pid0 + 1, NP2)]
    w0 = np.where(r0 >= 0, score_a[np.clip(r0, 0, len(score_a) - 1)], 0)
    w1 = np.where(r1 >= 0, score_a[np.clip(r1, 0, len(score_a) - 1)], 0)
    d_best = (w0 < w1).astype(np.int64)
    r_best = np.where(d_best == 1, r1, r0)
    w_best = np.where(d_best == 1, w1, w0)
    has_row = r_best >= 0
    rb_c = np.clip(r_best, 0, max(0, len(score_a) - 1))
    tb = tb_a[rb_c]
    te = te_a[rb_c]
    qb = qb_a[rb_c]
    qe = qe_a[rb_c]
    ol = np.maximum(te - tb, qe - qb)
    ok = (
        attempted_mask & has_row & (ol > 0)
        & (w_best >= p.min_score)
        & (w_best >= (p.min_id * ol).astype(np.int64))
    )
    qrid_of = rids[:, None] * np.ones((1, A), np.int64)
    attempted_now = set(
        zip(qrid_of[attempted_mask].astype(int).tolist(),
            csorted[attempted_mask].astype(int).tolist())
    )
    # iterate accepted hits in (query, chain-score desc) order like the
    # reference candidate processing order
    qs, ss = np.nonzero(ok)
    order = np.lexsort((-w_best[qs, ss], qs))
    for t in order:
        qi, slot = int(qs[t]), int(ss[t])
        qrid = int(rids[qi])
        cand = int(csorted[qi, slot])
        if cand == qrid:
            continue
        if (cand, qrid) in attempted_now and cand < qrid:
            continue
        key = (min(qrid, cand), max(qrid, cand))
        if key in emitted_pairs:
            continue
        emitted_pairs.add(key)
        qlen = int(lens[qi])
        clen = int(rb.lengths[cand])
        sc = int(w_best[qi, slot])
        o = int(ol[qi, slot])
        overlaps.append(Overlap(
            rid1=qrid, dir1=0, beg1=int(tb[qi, slot]), end1=int(te[qi, slot]),
            rid2=cand, dir2=int(d_best[qi, slot]),
            beg2=int(qb[qi, slot]), end2=int(qe[qi, slot]),
            score=sc, identity=sc / o, mat=sc, mis=0, ins=0, dl=0, aln=o,
        ))
        x1 = min(int(tb[qi, slot]), int(qb[qi, slot]))
        x2 = min(qlen - int(te[qi, slot]), clen - int(qe[qi, slot]))
        if x1 + x2 <= p.max_unalign_dovetail:
            rdcovs[qrid] += 1
            rdcovs[cand] += 1
    # ledger for future batches: any attempted pair suppresses the reverse
    for qrid, cand in attempted_now:
        attempted_by[cand].append(qrid)
        if attempted_out is not None:
            attempted_out.append((rb.names[qrid], rb.names[cand]))


def _emit_batch_sw(rb, p, d, rdcovs, attempted_by, overlaps, emitted_pairs, rdmask,
                   attempted_out=None):
    """Host combine for the SW engine: DP-score filters, containment mask."""
    sw = d["sw"]
    rids = d["rids"]
    lens = d["lens"]
    q_l = np.asarray(sw.q_local)
    cand = np.asarray(sw.cand)
    drs = np.asarray(sw.dir)
    score = np.asarray(sw.score)
    mat = np.asarray(sw.mat)
    ba = np.asarray(sw.beg_a)
    ea = np.asarray(sw.end_a)
    bb = np.asarray(sw.beg_b)
    eb = np.asarray(sw.end_b)
    attempted_now: set[tuple[int, int]] = set()
    n_before = len(overlaps)
    hits = []
    for i in range(len(q_l)):
        c = int(cand[i])
        if c < 0:
            continue
        qrid = int(rids[q_l[i]])
        if c == qrid:
            continue
        attempted_now.add((qrid, c))
        sc = int(score[i])
        aln = max(int(ea[i] - ba[i]), int(eb[i] - bb[i]))
        if aln <= 0 or sc < p.min_score:
            continue
        ident = mat[i] / aln
        if ident < p.min_id:
            continue
        hits.append((qrid, int(lens[q_l[i]]), c, int(drs[i]),
                     int(ba[i]), int(ea[i]), int(bb[i]), int(eb[i]),
                     sc, int(mat[i]), aln))
    for qrid, qlen, c, dr, tb, te, qb, qe, sc, m, aln in hits:
        if (c, qrid) in attempted_now and c < qrid:
            continue
        key = (min(qrid, c), max(qrid, c))
        if key in emitted_pairs:
            continue
        emitted_pairs.add(key)
        clen = int(rb.lengths[c])
        overlaps.append(Overlap(
            rid1=qrid, dir1=0, beg1=tb, end1=te,
            rid2=c, dir2=dr, beg2=qb, end2=qe,
            score=sc, identity=m / aln, mat=m,
            mis=0, ins=0, dl=0, aln=aln, cigar=f"{aln}M",
        ))
        x1 = min(tb, qb)
        x2 = min(qlen - te, clen - qe)
        if x1 + x2 <= p.max_unalign_dovetail:
            rdcovs[qrid] += 1
            rdcovs[c] += 1
        # contained candidate (skip_contained, max_unalign_in_contained=0)
        if rdmask is not None and qb <= 0 and qe >= clen:
            rdmask[c] = True
    n_new = len(overlaps) - n_before
    for qrid, c in attempted_now:
        attempted_by[c].append(qrid)
        if attempted_out is not None:
            attempted_out.append((rb.names[qrid], rb.names[c]))
    if p.emit_cigar and n_new:
        _attach_cigars(rb, p, overlaps[-n_new:])


def _attach_cigars(rb, p, ovls):
    """Fill Overlap.cigar/mis/ins/dl with a traceback banded alignment of
    the accepted overlap segments (reference kswx CIGARs, wtzmo.c SW mode).

    Runs only on accepted overlaps — the reference pipeline itself drops
    CIGARs (`cut -f1-16`, smartdenovo.pl), so this is opt-in."""
    import jax.numpy as jnp

    from ..data.readbank import revcomp_codes
    from ..ops.banded import banded_align, make_band_centers, traceback_banded
    from ..ops.swdp import align_strings

    if not ovls:
        return
    segs = []
    for ov in ovls:
        qa = rb.get(ov.rid1)[ov.beg1:ov.end1]
        cb = rb.get(ov.rid2)
        if ov.dir2:
            cb = revcomp_codes(cb)
        segs.append((qa, cb[ov.beg2:ov.end2]))
    LA = _pad_tier(max(len(a) for a, _ in segs))
    LB = max(len(b) for _, b in segs)
    B = len(segs)
    a = np.full((B, LA), 4, np.uint8)
    b = np.full((B, LB), 4, np.uint8)
    alen = np.zeros(B, np.int32)
    blen = np.zeros(B, np.int32)
    anchors = []
    for i, (qa, cb) in enumerate(segs):
        a[i, : len(qa)] = qa
        b[i, : len(cb)] = cb
        alen[i] = len(qa)
        blen[i] = len(cb)
        anchors.append([(0, 0), (len(qa), len(cb))])
    base = make_band_centers(anchors, alen, blen, LA, p.band_w)
    score, end_col, dirs = banded_align(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(alen), jnp.asarray(blen),
        jnp.asarray(base), LA=LA, W=p.band_w,
        match=p.sw_match, mismatch=p.sw_mismatch, gap=p.sw_gap,
        semiglobal_b=True,
    )
    cigs, b_begs = traceback_banded(np.asarray(dirs), base, alen, np.asarray(end_col))
    for i, ov in enumerate(ovls):
        ops, counts = cigs[i]
        if not ops:
            continue
        ra, rb_ = align_strings(a[i], b[i][int(b_begs[i]):], ops, counts)
        both = (ra != 4) & (rb_ != 4)
        ov.mat = int(np.sum(both & (ra == rb_)))
        ov.mis = int(np.sum(both & (ra != rb_)))
        ov.ins = int(np.sum((ra != 4) & (rb_ == 4)))
        ov.dl = int(np.sum((ra == 4) & (rb_ != 4)))
        ov.aln = int(ra.shape[0])
        ov.identity = ov.mat / max(1, ov.aln)
        ov.cigar = "".join(f"{int(c)}{o}" for o, c in zip(ops, counts))


def overlap_reads(rb: ReadBank, params: ZmoParams | None = None, progress: bool = True,
                  preattempted=None, attempted_out=None):
    """Engine-dispatching alias (dm = dot-matrix, sw = banded local DP)."""
    return overlap_dmo(rb, params, progress, preattempted, attempted_out)


def read_pair_ledger(paths):
    """Load -L ledger files: two read names per line."""
    pairs = []
    if isinstance(paths, str):
        paths = [paths]
    for path in paths:
        with open(path) as fh:
            for line in fh:
                c = line.split()
                if len(c) >= 2:
                    pairs.append((c[0], c[1]))
    return pairs


def write_pair_ledger(path, pairs):
    with open(path, "w") as fh:
        for a, b in pairs:
            fh.write(f"{a}\t{b}\n")


def write_overlaps(path: str, rb: ReadBank, overlaps) -> None:
    lengths = rb.lengths
    with open(path, "w") as fh:
        for ov in overlaps:
            fh.write(ov.to_tsv(rb.names, lengths))
            fh.write("\n")
