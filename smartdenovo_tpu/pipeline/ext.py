"""Overlap re-extension — equivalent of the reference `wtext`.

The reference re-extends local alignments toward read ends with banded
extension + end-clip scoring (wtext.c extending_overlap_wtext:128-293),
upgrading near-dovetail overlaps to full dovetails before trimming.
Here each overlap pair is re-aligned with the SW engine's banded local
DP (z-mer chain anchors + forward/reverse passes), which extends to the
optimal end cells by construction; records gain the extended coordinates
and DP score/identity.
"""

from __future__ import annotations

import dataclasses

from ..data.readbank import ReadBank
from ..graph.gbo import GboParams, align_pairs_sw
from ..ops.index import build_zmer_index
from ..utils.log import log


@dataclasses.dataclass
class ExtParams:
    min_score: int = 200
    min_id: float = 0.6
    batch_q: int = 16
    cand_cap: int = 64
    band_w: int = 256


def run_ext(rb: ReadBank, overlaps, params: ExtParams | None = None):
    """Re-extend overlap records; returns new Overlap list (same pairs)."""
    from .zmo import Overlap

    p = params or ExtParams()
    gp = GboParams(min_score=p.min_score, min_id=p.min_id, batch_q=p.batch_q,
                   cand_cap=p.cand_cap, band_w=p.band_w)
    zidx = build_zmer_index(rb, 10, True, 16)
    pair_map: dict[int, list[tuple[int, int]]] = {}
    for ov in overlaps:
        pair_map.setdefault(ov.rid1, []).append((ov.rid2, ov.dir1 ^ ov.dir2))
    hits = align_pairs_sw(rb, zidx, pair_map, gp)
    out = []
    for qrid, c, d, tb, te, qb, qe, sc, mt, aln in hits:
        out.append(Overlap(
            rid1=qrid, dir1=0, beg1=tb, end1=te,
            rid2=c, dir2=d, beg2=qb, end2=qe,
            score=sc, identity=mt / aln, mat=mt, mis=0, ins=0, dl=0,
            aln=aln, cigar=f"{aln}M",
        ))
    log("wtext: %d/%d overlaps re-extended", len(out), len(overlaps))
    return out
