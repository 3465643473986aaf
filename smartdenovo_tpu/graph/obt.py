"""Overlap-based trimming — equivalent of the reference `wtobt`.

Per read (wtobt.c mobt worker :340-481): project overlaps onto the read,
find the longest region with depth >= min_cov, detect chimeric sites by
spur-window counting, and trim at the strongest spur; reads contained by
another (overlap covering the whole read within 100bp) inherit their
container's trim (process_contained_wtobt :546-575).

Output rows match the reference TSV: name, abs_offset, kept_len,
original_len, x, y (print_obt_wtobt :577-588).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..utils.log import log

CHIMERA_WIN = 500
MAX_MARGIN = 200


@dataclasses.dataclass
class ObtParams:
    min_score: int = 200   # -s
    min_id: float = 0.5    # -m
    min_cov: int = 1       # -c
    fix_contained: bool = True


def run_obt(records, params: ObtParams | None = None):
    """records: (name1, dir1, len1, beg1, end1, name2, dir2, len2, beg2,
    end2, score, identity) tuples.  Returns name -> (abs_off, kept_len,
    orig_len, x, y)."""
    p = params or ObtParams()
    names: list[str] = []
    name2id: dict[str, int] = {}
    lens: list[int] = []
    hits = []  # (id1, id2, d1, d2, b1, e1, b2, e2)

    def seq(nm, ln):
        sid = name2id.get(nm)
        if sid is None:
            sid = len(names)
            name2id[nm] = sid
            names.append(nm)
            lens.append(ln)
        return sid

    for rec in records:
        n1, d1, l1, b1, e1, n2, d2, l2, b2, e2, score, sm = rec[:12]
        if score < p.min_score or sm < p.min_id:
            continue
        hits.append((seq(n1, l1), seq(n2, l2), d1, d2, b1, e1, b2, e2))
    n = len(names)
    per_read: list[list[tuple]] = [[] for _ in range(n)]
    for h in hits:
        i1, i2, d1, d2, b1, e1, b2, e2 = h
        per_read[i1].append((i2, d1, d2, b1, e1, b2, e2))
        per_read[i2].append((i1, d2, d1, b2, e2, b1, e1))
    clips = np.zeros((n, 2), np.int64)
    contained = np.full(n, -1, np.int64)
    cont_hit: dict[int, tuple] = {}
    for nid in range(n):
        alen = lens[nid]
        clips[nid] = (0, alen)
        regs = []
        brks = []  # (pos, isend, spur)
        tot_dep = 0
        found_cont = None
        for (other, d_self, d_other, bs, es, bo, eo) in per_read[nid]:
            blen = lens[other]
            if d_self:
                x, y = alen - es, alen - bs
            else:
                x, y = bs, es
            ol = y - x
            if ol + 100 >= alen:
                found_cont = (other, d_self ^ d_other, bo, eo)
                break
            x_spur = bs > MAX_MARGIN and bo > MAX_MARGIN
            y_spur = es + MAX_MARGIN < alen and eo + MAX_MARGIN < blen
            if (x_spur or y_spur) and ol < 1000:
                continue
            if x_spur and y_spur:
                continue
            xs = y_spur if d_self else x_spur
            ys = x_spur if d_self else y_spur
            if xs:
                brks.append((x, 0, 1))
                brks.append((x, 1, 0))
            elif ys:
                brks.append((y, 0, 0))
                brks.append((y, 1, 1))
            else:
                tot_dep += ol
                brks.append((x, 0, 0))
                brks.append((y, 1, 0))
        if found_cont is not None:
            contained[nid] = found_cont[0]
            cont_hit[nid] = found_cont
            continue
        avg_dep = (tot_dep + alen) // (alen + 1)
        brks.sort(key=lambda t: (t[0] << 1) | t[1])
        chis = []
        dep = 0
        xx = mx = my = best = 0
        for pos, isend, spur in brks:
            if dep >= p.min_cov:
                if pos - xx > best:
                    mx, my, best = xx, pos, pos - xx
            if isend:
                bdep = dep
                dep -= 1
            else:
                dep += 1
                bdep = dep
                if dep == p.min_cov:
                    xx = pos
            if spur:
                chis.append((pos - CHIMERA_WIN, 0, 0, bdep))
                chis.append((pos - 1, 1, 0, bdep))
                chis.append((pos, 0, 1, bdep))
                chis.append((pos + CHIMERA_WIN, 1, 0, bdep))
        clips[nid] = (mx, my)
        if len(chis) < avg_dep:
            continue
        chis.sort(key=lambda t: t[0])
        dep = 0
        best = 0
        mi = -1
        for i, (pos, isend, spur, bdep) in enumerate(chis):
            if isend:
                if spur and dep >= best:
                    best, mi = dep, i
                dep -= 1
            else:
                dep += 1
                if spur and dep >= best:
                    best, mi = dep, i
        if best * 2 < avg_dep or mi < 0:
            continue
        pos, _, _, bdep = chis[mi]
        if bdep >= avg_dep or 2 * bdep > best + 1:
            continue
        if pos <= clips[nid, 0] or pos >= clips[nid, 1]:
            continue
        if pos - clips[nid, 0] > clips[nid, 1] - pos:
            clips[nid, 1] = pos
        else:
            clips[nid, 0] = pos
    # contained reads inherit their container's trims (wtobt.c:546-575)
    if p.fix_contained:
        for nid, (other, rel_dir, bo, eo) in cont_hit.items():
            blen = lens[other]
            x, y = bo, eo
            dx = clips[other, 0] - x if x < clips[other, 0] else 0
            dy = y - clips[other, 1] if y > clips[other, 1] else 0
            if rel_dir:
                clips[nid, 0] += dy
                clips[nid, 1] -= dx
            else:
                clips[nid, 0] += dx
                clips[nid, 1] -= dy
            if clips[nid, 0] >= clips[nid, 1]:
                clips[nid] = (0, 0)
    out = {}
    for nid, nm in enumerate(names):
        x, y = int(clips[nid, 0]), int(clips[nid, 1])
        out[nm] = (x, y - x, lens[nid], x, y)
    log("wtobt: trimmed %d reads", n)
    return out
