"""Anchor-guided banded alignment — batched shifting-band DP on device.

TPU-native equivalent of the reference's scalar shifting-band DP
(kswx.h:101-232 kswx_extend_align_shift_core) and CIGAR-guided variable
band refine (kswx.h:483-659): instead of adapting the band to the best
cell per row (serial), the band center per row is *precomputed* from
chained z-mer anchors (piecewise-linear, like the prior-CIGAR band of
kswx_refine_alignment), which makes every row update a pure [B, W]
vector op.  The within-row (gap-in-b) dependency is a max-plus prefix
scan solved with an associative scan in log2(W) steps.

Row axis = sequence `a` (the read); columns = sequence `b` (consensus
window).  Linear gap model with the reference's default scores.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

NEG_INF = jnp.int32(-(1 << 28))
DIAG, UP, LEFT, STOP = 1, 2, 3, 0


@functools.partial(
    jax.jit,
    static_argnames=("LA", "W", "match", "mismatch", "gap", "gap_a", "gap_b",
                     "semiglobal_b", "return_rowmax"),
)
def banded_align(
    a: jnp.ndarray,       # [B, LA] uint8
    b: jnp.ndarray,       # [B, LB] uint8
    alen: jnp.ndarray,    # [B] int32
    blen: jnp.ndarray,    # [B] int32
    base: jnp.ndarray,    # [B, LA+1] int32: leftmost band column per row
    *,
    LA: int,
    W: int = 256,
    match: int = 2,
    mismatch: int = -5,
    gap: int = -3,
    gap_a: int | None = None,   # cost of consuming a (insertion in a / UP)
    gap_b: int | None = None,   # cost of consuming b (deletion / LEFT)
    semiglobal_b: bool = False,
    return_rowmax: bool = False,  # also return per-row best (score, col)
):
    """Returns (score [B], end_col [B], dirs [B, LA+1, W] uint8).

    semiglobal_b=True makes end gaps in `b` free (read-global, window-
    local): row 0 costs nothing and the score is the best cell of the
    last row — the mode used for read-vs-backbone consensus alignment.
    """
    if gap_a is None:
        gap_a = gap
    if gap_b is None:
        gap_b = gap
    B = a.shape[0]
    LB = b.shape[1]
    lanes = jnp.arange(W, dtype=jnp.int32)[None, :]
    ai = a.astype(jnp.int32)
    bi = b.astype(jnp.int32)

    def leftscan(m):
        # S[c] = max_{k<=c} m[k] + gap_b*(c-k), via associative max-plus scan
        def comb(x, y):
            vx, nx = x
            vy, ny = y
            return jnp.maximum(vx + gap_b * ny, vy), nx + ny

        ones = jnp.ones_like(m)
        s, _ = jax.lax.associative_scan(comb, (m, ones), axis=1)
        return s

    def row0():
        j = base[:, 0:1] + lanes
        h = jnp.zeros_like(j) if semiglobal_b else gap_b * j
        ok = (j >= 0) & (j <= blen[:, None])
        h = jnp.where(ok, h, NEG_INF)
        if semiglobal_b:
            d = jnp.where(ok, jnp.uint8(STOP), jnp.uint8(STOP))
        else:
            d = jnp.where(j == 0, jnp.uint8(STOP), jnp.uint8(LEFT))
            d = jnp.where(ok, d, jnp.uint8(STOP))
        return h, d

    h0, d0 = row0()

    def step(hprev, i):
        # i is a scalar row index (same for the whole batch)
        bs = jax.lax.dynamic_index_in_dim(base, i, axis=1, keepdims=False)      # [B]
        bp = jax.lax.dynamic_index_in_dim(base, i - 1, axis=1, keepdims=False)  # [B]
        shift = (bs - bp)[:, None]
        j = bs[:, None] + lanes   # columns of this row
        idx_up = lanes + shift
        idx_dg = lanes + shift - 1
        up = jnp.where(
            (idx_up >= 0) & (idx_up < W),
            jnp.take_along_axis(hprev, jnp.clip(idx_up, 0, W - 1), axis=1),
            NEG_INF,
        )
        dg = jnp.where(
            (idx_dg >= 0) & (idx_dg < W),
            jnp.take_along_axis(hprev, jnp.clip(idx_dg, 0, W - 1), axis=1),
            NEG_INF,
        )
        ac = jax.lax.dynamic_index_in_dim(ai, jnp.clip(i - 1, 0, LA - 1), axis=1,
                                          keepdims=True)  # [B, 1]
        bc = jnp.take_along_axis(bi, jnp.clip(j - 1, 0, LB - 1), axis=1)
        sub = jnp.where((ac == bc) & (ac < 4), match, mismatch)
        m = jnp.maximum(dg + sub, up + gap_a)
        dirm = jnp.where(dg + sub >= up + gap_a, jnp.uint8(DIAG), jnp.uint8(UP))
        # first column boundary
        at0 = j == 0
        m = jnp.where(at0, gap_a * i, m)
        dirm = jnp.where(at0, jnp.uint8(UP), dirm)
        okj = (j >= 0) & (j <= blen[:, None])
        oki = i <= alen[:, None]
        m = jnp.where(okj & oki, m, NEG_INF)
        s = leftscan(m)
        d = jnp.where(s > m, jnp.uint8(LEFT), dirm)
        d = jnp.where(okj & oki & (s > NEG_INF // 2), d, jnp.uint8(STOP))
        s = jnp.where(okj & oki, s, NEG_INF)
        return s, (s, d)

    iters = jnp.arange(1, LA + 1, dtype=jnp.int32)
    hlast, (hs, ds) = jax.lax.scan(step, h0, iters)
    dirs = jnp.concatenate([d0[None], ds], axis=0)  # [LA+1, B, W]
    hs_all = jnp.concatenate([h0[None], hs], axis=0)
    bidx = jnp.arange(B)
    last_base = base[bidx, alen]
    if semiglobal_b:
        last_row = hs_all[alen, bidx, :]  # [B, W]
        cols = last_base[:, None] + lanes
        okc = (cols >= 0) & (cols <= blen[:, None])
        masked = jnp.where(okc, last_row, NEG_INF)
        lane_end = jnp.argmax(masked, axis=1).astype(jnp.int32)
        score = jnp.take_along_axis(masked, lane_end[:, None], axis=1)[:, 0]
        end_col = last_base + lane_end
    else:
        lane_end = blen - last_base
        score = hs_all[alen, bidx, jnp.clip(lane_end, 0, W - 1)]
        score = jnp.where((lane_end >= 0) & (lane_end < W), score, NEG_INF)
        end_col = blen
    dirs_t = jnp.transpose(dirs, (1, 0, 2))
    if return_rowmax:
        # per-row best in-band cell (for extension alignments that may
        # stop early with an end-clip penalty, reference kswx T logic)
        cols = base[:, :, None] + lanes[None]            # [B, LA+1, W]
        hrows = jnp.transpose(hs_all, (1, 0, 2))         # [B, LA+1, W]
        okc = (cols >= 0) & (cols <= blen[:, None, None])
        masked = jnp.where(okc, hrows, NEG_INF)
        rlane = jnp.argmax(masked, axis=2).astype(jnp.int32)
        rmax = jnp.take_along_axis(masked, rlane[:, :, None], axis=2)[:, :, 0]
        rcol = jnp.take_along_axis(cols, rlane[:, :, None], axis=2)[:, :, 0]
        return score, end_col, dirs_t, rmax, rcol
    return score, end_col, dirs_t


def make_band_centers(anchors_list, alens, blens, LA: int, W: int) -> np.ndarray:
    """Build per-row leftmost band columns from (a_pos, b_pos) anchors.

    anchors_list: per pair, array [(a_pos, b_pos), ...] (may be empty).
    Endpoints (0,0) and (alen, blen) are always included; centers are the
    piecewise-linear interpolation, clamped so the band stays in range.
    """
    B = len(anchors_list)
    base = np.zeros((B, LA + 1), np.int32)
    rows = np.arange(LA + 1)
    for i, anc in enumerate(anchors_list):
        al, bl = int(alens[i]), int(blens[i])
        pts = sorted((int(x), int(y)) for x, y in anc if 0 <= x <= al and 0 <= y <= bl)
        xs, ys = [], []
        lastx = -1
        for x, y in pts:
            if x <= lastx:
                continue
            xs.append(x)
            ys.append(y)
            lastx = x
        if not xs:
            xs, ys = [0, al], [0, bl]
        else:
            # extrapolate the chain's diagonal to the sequence ends instead of
            # pinning (0,0)/(al,bl): the window may extend past the read span
            if xs[0] > 0:
                xs.insert(0, 0)
                ys.insert(0, ys[0] - xs[1])
            if xs[-1] < al:
                ys.append(ys[-1] + (al - xs[-1]))
                xs.append(al)
        center = np.interp(np.minimum(rows, al), xs, ys)
        base[i] = np.clip(center.astype(np.int64) - W // 2, -(W - 1), max(0, bl))
        # monotone non-decreasing so shifts are >= 0
        np.maximum.accumulate(base[i], out=base[i])
    return base


def traceback_banded(dirs: np.ndarray, base: np.ndarray, alen, end_col):
    """Vectorised host traceback for banded_align.

    Returns (cigars, b_beg): per pair (ops, counts) run-length lists with
    ops M/I/D (I consumes a/row, D consumes b/col), and the column in b
    where the alignment starts (meaningful for semiglobal_b)."""
    dirs = np.asarray(dirs)
    B, LR, W = dirs.shape
    i = np.asarray(alen, np.int64).copy()
    j = np.asarray(end_col, np.int64).copy()
    paths = [[] for _ in range(B)]
    bidx = np.arange(B)
    done = (i <= 0) & (j <= 0)
    maxsteps = 2 * LR + W
    for _ in range(maxsteps):
        if done.all():
            break
        lane = j - base[bidx, np.clip(i, 0, LR - 1)]
        ok = (~done) & (lane >= 0) & (lane < W)
        mv = np.where(ok, dirs[bidx, np.clip(i, 0, LR - 1), np.clip(lane, 0, W - 1)], 0)
        # degenerate fallback if out of band or STOP before origin
        stuck = (~done) & (mv == 0)
        # STOP at row 0 with j > 0 = free leading gap in b (semiglobal)
        done = done | (stuck & (i <= 0))
        mv = np.where(stuck & (i > 0), UP, mv)
        mv = np.where(done, 0, mv)
        for k in np.nonzero(mv)[0]:
            paths[k].append(int(mv[k]))
        step_i = (mv == DIAG) | (mv == UP)
        step_j = (mv == DIAG) | (mv == LEFT)
        i -= step_i
        j -= step_j
        done = done | ((i <= 0) & (j <= 0))
    out = []
    code2op = {DIAG: "M", UP: "I", LEFT: "D"}
    for path in paths:
        path.reverse()
        ops, counts = [], []
        for c in path:
            op = code2op[c]
            if ops and ops[-1] == op:
                counts[-1] += 1
            else:
                ops.append(op)
                counts.append(1)
        out.append((ops, counts))
    return out, np.maximum(j, 0)
