"""SW-engine batch alignment tail (wtzmo without -U).

Selects the best chains per query from the dot-matrix stage, gathers the
candidate sequences from the device-resident packed bank (strand-flipped
on device), and scores each pair with the banded local DP in both
directions (forward pass = end coordinates, reverse pass = begin
coordinates).  Replaces the reference's per-candidate alignment loop
(wtzmo.c:1002-1123: fast_seeds_align + global stitching + kswx stats).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .overlap_dp import banded_local_dp, SLOPE_SHIFT


class SwBatchResult(NamedTuple):
    q_local: jnp.ndarray   # [Q*C] int32
    cand: jnp.ndarray      # [Q*C] int32 (-1 invalid)
    dir: jnp.ndarray       # [Q*C] int32
    chain_score: jnp.ndarray  # [Q*C] int32
    score: jnp.ndarray     # [Q*C] int32 local DP score
    mat: jnp.ndarray       # [Q*C] int32 matches
    beg_a: jnp.ndarray     # [Q*C] int32 query begin
    end_a: jnp.ndarray     # [Q*C] int32 query end
    beg_b: jnp.ndarray     # [Q*C] int32 candidate begin (strand space)
    end_b: jnp.ndarray     # [Q*C] int32 candidate end


@functools.partial(
    jax.jit,
    static_argnames=("Q", "A", "C", "Ltier", "W", "match", "mismatch", "gap"),
)
def sw_align_batch(
    pair_id: jnp.ndarray, dm_score: jnp.ndarray,
    dm_tb: jnp.ndarray, dm_te: jnp.ndarray, dm_qb: jnp.ndarray, dm_qe: jnp.ndarray,
    csorted: jnp.ndarray,   # [Q, A]
    qbatch: jnp.ndarray,    # [Q, Ltier] uint8
    qlens: jnp.ndarray,     # [Q] int32
    flat_bases: jnp.ndarray,  # [T] uint8 packed bank
    read_offs: jnp.ndarray,   # [R+1] int32
    read_lens: jnp.ndarray,   # [R] int32
    *,
    Q: int, A: int, C: int, Ltier: int, W: int = 256,
    match: int = 2, mismatch: int = -5, gap: int = -3,
) -> SwBatchResult:
    NP2 = Q * A * 2
    pid = jnp.minimum(pair_id, NP2)

    def dense(v, fill=0):
        return jnp.full(NP2 + 1, fill, jnp.int32).at[pid].set(v, mode="drop")[:NP2]

    ds = dense(dm_score).reshape(Q, A, 2)
    dtb = dense(dm_tb).reshape(Q, A, 2)
    dte = dense(dm_te).reshape(Q, A, 2)
    dqb = dense(dm_qb).reshape(Q, A, 2)
    dqe = dense(dm_qe).reshape(Q, A, 2)
    bdir = jnp.argmax(ds, axis=2).astype(jnp.int32)      # [Q, A]
    sbest = jnp.max(ds, axis=2)                           # [Q, A]
    top_val, top_slot = jax.lax.top_k(sbest, C)           # [Q, C]
    valid = top_val > 0
    qidx = jnp.broadcast_to(jnp.arange(Q, dtype=jnp.int32)[:, None], (Q, C))
    slot = top_slot
    seldir = bdir[qidx, slot]
    cand = jnp.where(valid, csorted[qidx, slot], -1)
    sel = (qidx.reshape(-1), slot.reshape(-1), seldir.reshape(-1))
    q_l, sl, dr = sel
    candf = cand.reshape(-1)
    validf = valid.reshape(-1)
    tb = dtb[q_l, sl, dr]
    te = dte[q_l, sl, dr]
    qb = dqb[q_l, sl, dr]
    qe = dqe[q_l, sl, dr]
    # gather sequences
    a = qbatch[q_l]                                       # [QC, Ltier]
    alen = qlens[q_l]
    candc = jnp.clip(candf, 0, read_lens.shape[0] - 1)
    blen = jnp.where(validf, read_lens[candc], 0)
    lanes = jnp.arange(Ltier, dtype=jnp.int32)[None, :]
    pos = read_offs[candc][:, None] + lanes
    inb = lanes < blen[:, None]
    bfwd = jnp.where(
        inb, flat_bases[jnp.clip(pos, 0, flat_bases.shape[0] - 1)], jnp.uint8(4)
    )
    # strand flip on device: reverse + complement rows where dir == 1
    ridx = jnp.clip(blen[:, None] - 1 - lanes, 0, Ltier - 1)
    brev = jnp.where(inb, 3 - jnp.take_along_axis(bfwd, ridx, axis=1), jnp.uint8(4))
    b = jnp.where((dr == 1)[:, None], brev, bfwd)
    # band parameters from chain extents
    slope = ((qe - qb) << SLOPE_SHIFT) // jnp.maximum(1, te - tb)
    slope = jnp.clip(slope, 1, 4 << SLOPE_SHIFT)
    fs, fm, fea, feb = banded_local_dp(
        a, b, alen, blen, tb, qb, slope,
        LA=Ltier, W=W, match=match, mismatch=mismatch, gap=gap,
    )
    # reverse pass (sequences and band mirrored)
    aridx = jnp.clip(alen[:, None] - 1 - lanes, 0, Ltier - 1)
    ar = jnp.where(lanes < alen[:, None], jnp.take_along_axis(a, aridx, axis=1),
                   jnp.uint8(4))
    br = jnp.where(inb, jnp.take_along_axis(b, ridx, axis=1), jnp.uint8(4))
    rtb = alen - te
    rqb = blen - qe
    rs, rm, rea, reb = banded_local_dp(
        ar, br, alen, blen, rtb, rqb, slope,
        LA=Ltier, W=W, match=match, mismatch=mismatch, gap=gap,
    )
    return SwBatchResult(
        q_local=q_l, cand=candf, dir=dr, chain_score=top_val.reshape(-1),
        score=fs, mat=fm,
        beg_a=alen - rea, end_a=fea,
        beg_b=blen - reb, end_b=feb,
    )
