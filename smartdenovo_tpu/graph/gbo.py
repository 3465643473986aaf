"""Overlap rescue on the graph — equivalent of the reference `wtgbo`.

Iterates (<=5 rounds, wtgbo.c:536-587): build the string graph from the
current overlap set, run best-overlap selection, then find read pairs
that *should* overlap but have no record:

  - graph candidates (gbo_core, wtgbo.c:143-209): for nodes missing a
    two-way BOG edge on a side, an offset-ordered BFS (<=2 levels,
    wtgbo.c:62-116) proposes nearby reads;
  - anchor candidates (abo_core, wtgbo.c:217-316): co-tiling interval
    sweep over each read's overlap projections proposes read pairs that
    tile the same region.

Proposed pairs are aligned in batches with the SW engine's device kernels
(zmer pair extraction -> dot-matrix chain -> banded local DP) and
accepted with the same score/identity filters; new overlaps feed the next
round until none are found.
"""

from __future__ import annotations

import dataclasses
import heapq

import numpy as np
import jax.numpy as jnp

from ..data.readbank import ReadBank
from ..ops.seeds import extract_seeds
from ..ops.index import build_zmer_index
from ..ops.dotmatrix import extract_zmer_pairs, dot_matrix_align
from ..ops.zmo_sw import sw_align_batch
from ..utils.log import log
from .stringgraph import LayParams, StringGraph

INT32_MAX = np.int32(0x7FFFFFFF)
GRAPH_TRACE_LEVEL = 2


@dataclasses.dataclass
class GboParams:
    min_score: int = 200
    min_id: float = 0.6
    margin: int = 100          # -u overlap margin for graph building
    edgecov_cutoff: int = 1
    best_score_cutoff: float = 0.95
    max_ext: int = 0
    max_iter: int = 5
    max_zmer_freq: int = 16
    kvar: int = 2
    batch_q: int = 16
    cand_cap: int = 32         # aligned candidates per rescue node per round
    band_w: int = 256
    expand_budget: int = 1 << 21
    pair_budget: int = 1 << 19


def _pair_key(a: int, b: int, dir: int) -> tuple:
    return (a, b, dir) if a < b else (b, a, dir)


def collect_graph_candidates(g: StringGraph, node_id: int, max_ext: int,
                             closed: set, out: list):
    """Port of collect_graph_candidates_wtgbo (offset-ordered BFS, <=2 levels)."""
    maxoff = max_ext + int(g.rb.lengths[node_id])
    heap = []
    heapq.heappush(heap, (0, 0, node_id, 0, 0))  # (off, lv, nid, dir, k)
    heapq.heappush(heap, (0, 0, node_id, 1, 1))
    seen = {(node_id, 0), (node_id, 1)}
    first = True
    while heap:
        off1, lv, nid, dir, k = heapq.heappop(heap)
        n1 = g.nodes[nid]
        edges = list(n1.edges[k])
        if not edges and g.dead[nid]:
            # contained read: follow its containment edge (wtgbo.c:84-92)
            edges = [e for e in n1.edges[1 - k] if e.att]
        for e in edges:
            off2 = off1 + e.off
            if off2 > maxoff:
                continue
            val = (e.node_id, dir ^ e.dir)
            if val in seen:
                continue
            seen.add(val)
            if not first and not g.dead[e.node_id]:
                key = _pair_key(node_id, e.node_id, dir ^ e.dir)
                if key not in closed:
                    closed.add(key)
                    out.append(val)
            if lv < GRAPH_TRACE_LEVEL:
                heapq.heappush(heap, (off2, lv + 1, e.node_id, dir, e.dir))
        first = False


def collect_anchor_candidates(g: StringGraph, node_id: int, closed: set,
                              out: list):
    """Port of collect_anchor_candidates_wtgbo (co-tiling interval sweep)."""
    n = g.nodes[node_id]
    ln = int(g.rb.lengths[node_id])
    marks = []
    for k in (0, 1):
        for e in n.edges[k]:
            if g.dead[e.node_id]:
                continue
            if k:
                beg = ln - (e.off + g.edge_overlap(node_id, e))
                end = ln - e.off
            else:
                beg = e.off
                end = e.off + g.edge_overlap(node_id, e)
            d = e.dir ^ k
            marks.append((beg, 0, e.node_id, d))
            marks.append((end, 1, e.node_id, d))
    marks.sort(key=lambda t: t[0])
    active: dict[int, int] = {}
    for pos, isend, nid, d in marks:
        if isend:
            active.pop(nid, None)
            for other, od in active.items():
                key = _pair_key(nid, other, d ^ od)
                if key in closed:
                    continue
                closed.add(key)
                out.append((nid, other, d ^ od))
        else:
            active[nid] = d


def align_pairs_sw(rb: ReadBank, zidx, pair_map: dict[int, list[tuple[int, int]]],
                   p: GboParams):
    """Batch-align explicit (query -> [(cand, dir)]) pairs with the SW engine.

    Returns list of hit tuples (qrid, cand, dir, tb, te, qb, qe, score,
    mat, aln).  Alignment orientation: query forward vs candidate in the
    given relative strand.
    """
    from ..pipeline.zmo import _pad_tier

    hits = []
    queries = sorted(pair_map)
    if not queries:
        return hits
    read_lens = jnp.asarray(rb.lengths)
    flat_bases = jnp.asarray(rb.bases)
    read_offs = jnp.asarray(rb.offsets.astype(np.int32))
    A = p.cand_cap
    Q = p.batch_q
    for b0 in range(0, len(queries), Q):
        chunk = queries[b0 : b0 + Q]
        rids = np.array(chunk + [chunk[-1]] * (Q - len(chunk)), np.int64)
        Ltier = _pad_tier(int(rb.lengths[rids].max()))
        batch, lens = rb.batch(rids, pad_to=Ltier)
        cands = np.full((Q, A), INT32_MAX, np.int32)
        for i, qi in enumerate(chunk):
            cl = sorted({c for c, d in pair_map[qi]})[:A]
            cands[i, : len(cl)] = cl
        zres = extract_seeds(jnp.asarray(batch), jnp.asarray(lens), zidx.zsize, True)
        pairs = extract_zmer_pairs(
            zres["kmer"], zres["dir"], zres["off"], zres["span"], zres["valid"],
            jnp.asarray(rids, jnp.int32), jnp.asarray(cands),
            zidx.zmers, zidx.post_rd, zidx.post_packed,
            read_lens,
            expand_budget=p.expand_budget, pair_budget=p.pair_budget, kvar=p.kvar,
        )
        clen_of_pair = jnp.repeat(
            jnp.where(jnp.asarray(cands) < len(rb),
                      read_lens[jnp.clip(jnp.asarray(cands), 0, len(rb) - 1)], 0)
            .astype(jnp.int32).reshape(-1), 2
        )
        qlen_of_pair = jnp.repeat(jnp.asarray(lens.astype(np.int32)), A * 2)
        res = dot_matrix_align(pairs, qlen_of_pair, clen_of_pair,
                               n_pairs=Q * A * 2, nb=16)
        sw = sw_align_batch(
            res.pair_id, res.score, res.tb, res.te, res.qb, res.qe,
            jnp.asarray(cands), jnp.asarray(batch), jnp.asarray(lens),
            flat_bases, read_offs, read_lens,
            Q=Q, A=A, C=min(A, p.cand_cap), Ltier=Ltier, W=p.band_w,
        )
        q_l = np.asarray(sw.q_local)
        cd = np.asarray(sw.cand)
        dr = np.asarray(sw.dir)
        sc = np.asarray(sw.score)
        mt = np.asarray(sw.mat)
        ba, ea = np.asarray(sw.beg_a), np.asarray(sw.end_a)
        bb, eb = np.asarray(sw.beg_b), np.asarray(sw.end_b)
        for i in range(len(q_l)):
            if cd[i] < 0 or q_l[i] >= len(chunk):
                continue
            qrid = chunk[q_l[i]]
            c = int(cd[i])
            if c == qrid:
                continue
            wanted_dirs = {d for cc, d in pair_map[qrid] if cc == c}
            if int(dr[i]) not in wanted_dirs:
                # chain picked the other strand; accept anyway (stronger signal)
                pass
            aln = max(int(ea[i] - ba[i]), int(eb[i] - bb[i]))
            if aln <= 0 or int(sc[i]) < p.min_score:
                continue
            if mt[i] / aln < p.min_id:
                continue
            hits.append((qrid, c, int(dr[i]), int(ba[i]), int(ea[i]),
                         int(bb[i]), int(eb[i]), int(sc[i]), int(mt[i]), aln))
    return hits


def rescue_overlaps(rb: ReadBank, overlaps: list, params: GboParams | None = None):
    """Run wtgbo-style rescue; returns the list of NEW Overlap records."""
    from ..pipeline.zmo import Overlap

    p = params or GboParams()
    zidx = build_zmer_index(rb, 10, True, p.max_zmer_freq)
    closed: set = set()
    for ov in overlaps:
        closed.add(_pair_key(ov.rid1, ov.rid2, ov.dir1 ^ ov.dir2))
    all_ovls = list(overlaps)
    new_total = []
    for it in range(p.max_iter):
        lp = LayParams(min_score=p.min_score, min_id=p.min_id, margin=p.margin,
                       edgecov_cutoff=p.edgecov_cutoff,
                       best_score_cutoff=p.best_score_cutoff)
        g = StringGraph(rb, lp)
        g.load_overlaps(all_ovls)
        g.cal_edge_coverage()
        g.remove_duplicate_edges()
        g.mask_contained_reads()
        g.mask_low_cov_edges(p.edgecov_cutoff)
        g.best_overlap(p.best_score_cutoff)
        pair_map: dict[int, list[tuple[int, int]]] = {}
        cands_buf: list = []
        for nid in range(len(rb)):
            if g.dead[nid]:
                continue
            n = g.nodes[nid]
            if n.bogs[1][0][0] and n.bogs[1][1][0]:
                continue
            cands_buf.clear()
            collect_graph_candidates(g, nid, p.max_ext, closed, cands_buf)
            if cands_buf:
                pair_map.setdefault(nid, []).extend(cands_buf)
        abuf: list = []
        for nid in range(len(rb)):
            if g.dead[nid]:
                continue
            collect_anchor_candidates(g, nid, closed, abuf)
        for a, b, d in abuf:
            pair_map.setdefault(a, []).append((b, d))
        n_cand = sum(len(v) for v in pair_map.values())
        log("wtgbo iter %d: %d rescue candidates", it + 1, n_cand)
        if n_cand == 0:
            break
        hits = align_pairs_sw(rb, zidx, pair_map, p)
        news = []
        for qrid, c, d, tb, te, qb, qe, sc, mt, aln in hits:
            news.append(Overlap(
                rid1=qrid, dir1=0, beg1=tb, end1=te,
                rid2=c, dir2=d, beg2=qb, end2=qe,
                score=sc, identity=mt / aln, mat=mt, mis=0, ins=0, dl=0,
                aln=aln, cigar=f"{aln}M",
            ))
        log("wtgbo iter %d: %d new overlaps", it + 1, len(news))
        if not news:
            break
        all_ovls.extend(news)
        new_total.extend(news)
    return new_total
