"""Pallas streaming kernel — sorted-segment reduce + compact.

The dot-matrix aligner (ops/dotmatrix.py) repeatedly collapses a SORTED
match/block stream into per-segment records (per-block coverage sums,
bounding boxes, owning pair ids; cf. the reference's per-group block
collection in hzm_aln.h:799-846).  In XLA each reduction is a
`segment_sum/min/max` — a budget-wide scatter, among the slowest TPU
primitives (~70 ms per op at 16.7M entries; together ~1.1 s of the
1.55 s dot-matrix phase on the v5e bench batch).

This kernel replaces a whole family of them with ONE sequential
streaming pass (TPU grid iterations run in order, so SMEM/VMEM scratch
carries state across tiles):

  - per tile, segmented scans (sum / min / max / keep-first, selected
    per lane by a static `ops` tuple) run as ~10 masked doubling steps
    on the (8, T) tile — pure VPU, no scatters;
  - closed segments are extracted at their boundary positions with a
    one-hot selection matmul (15-bit split, so the f32 MXU products are
    exact over the full int32 range);
  - the compacted records stream to HBM with the overlap-write trick:
    tile i writes T columns at its running record base and tile i+1's
    write overwrites the garbage tail, so compaction needs no
    bookkeeping beyond one SMEM counter;
  - the still-open segment is carried across tiles and flushed as the
    final record after the last tile.

Per element the stream is read once and records written once — the pass
is HBM-bandwidth-bound instead of scatter-latency-bound.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = False   # set True to run interpreted (CPU tests)

I32_MAX = (1 << 31) - 1
I32_MIN1 = -(1 << 31) + 1

# per-op neutral value (empty-segment identity)
_NEUTRAL = {"sum": 0, "min": I32_MAX, "max": I32_MIN1, "first": I32_MAX}


def _row_masks(ops):
    # built from iota so nothing is captured as a traced constant
    rowid = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    out = {}
    for k in ("sum", "min", "max", "first"):
        rows = [r for r, op in enumerate(ops) if op == k]
        m = jnp.zeros((8, 1), jnp.bool_)
        for r in rows:
            m = m | (rowid == r)
        out[k] = m
    return out


def _combine(ops, carry, local):
    """Per-row combine of the open-segment carry with a local reduction."""
    masks = _row_masks(ops)
    out = jnp.where(masks["sum"], carry + local, local)
    out = jnp.where(masks["min"], jnp.minimum(carry, local), out)
    out = jnp.where(masks["max"], jnp.maximum(carry, local), out)
    out = jnp.where(masks["first"],
                    jnp.where(carry != I32_MAX, carry, local), out)
    return out


def _neutral_col(ops):
    rowid = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    out = jnp.zeros((8, 1), jnp.int32)
    for r, op in enumerate(ops):
        out = jnp.where(rowid == r, _NEUTRAL[op], out)
    return out


def _split8(x):
    """Four 8-bit limbs (low three unsigned, top arithmetic).

    8-bit limbs are exact in bf16 (8 effective mantissa bits), so the
    one-hot extraction matmul runs as ONE bf16 MXU pass instead of the
    6-pass f32 emulation that 15-bit limbs force (measured ~3x on the
    extraction-dominated stream kernels)."""
    return (x & 0xFF, (x >> 8) & 0xFF, (x >> 16) & 0xFF,
            jax.lax.shift_right_arithmetic(x, 24))


def _make_kernel(ops, T, OB, nt):
    T2 = T + 128   # staging width: 128-aligned write window + T records

    def kernel(sn_ref, v_ref, out_hbm, cnt_ref, stage_ref, stage2_ref,
               carry_ref, rec_ref, sem):
        t = pl.program_id(0)
        masks = _row_masks(ops)
        neutral = _neutral_col(ops)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
        col2 = jax.lax.broadcasted_iota(jnp.int32, (1, T2), 1)

        @pl.when(t == 0)
        def _():
            cnt_ref[0] = 0
            carry_ref[:, :] = jnp.broadcast_to(neutral, (8, 2))
            rec_ref[:, :] = jnp.zeros((8, 128), jnp.int32)

        sn = sn_ref[:]                       # [1, T] int32 0/1
        # the stream's first entry opens the carry segment rather than
        # closing a (nonexistent) previous one
        sn = jnp.where((t == 0) & (col == 0), 0, sn)

        # ---- start positions (cummax of start-marked indices) ----
        sp = jnp.where(sn == 1, col, -1)
        sh = 1
        while sh < T:
            sp = jnp.maximum(
                sp, jnp.where(col >= sh, pltpu.roll(sp, sh, 1), -1))
            sh *= 2

        # ---- segmented scans, all 8 rows at once ----
        x = v_ref[:]                         # [8, T] int32
        sh = 1
        while sh < T:
            same = (col >= sh) & ((col - sh) >= sp)   # [1, T]
            shv = pltpu.roll(x, sh, 1)
            cand = jnp.where(masks["sum"], x + shv, shv)
            cand = jnp.where(masks["min"], jnp.minimum(x, shv), cand)
            cand = jnp.where(masks["max"], jnp.maximum(x, shv), cand)
            # rows with op "first" keep the shifted (leftmost) value
            x = jnp.where(same, cand, x)
            sh *= 2

        # ---- record extraction at segment boundaries ----
        inc = sn
        sh = 1
        while sh < T:
            inc = inc + jnp.where(col >= sh, pltpu.roll(inc, sh, 1), 0)
            sh *= 2
        S_t = inc[0, T - 1]                  # records closed this tile
        base = cnt_ref[0]
        aligned = (base // 128) * 128        # 128-aligned HBM write base
        off = base - aligned                 # records already in rec_ref
        # record k lands at staging column off + k (so the write target
        # stays 128-aligned, as Mosaic tiled-memref slicing requires)
        k_of_j = inc - sn + off
        # closed segment k's local part = inclusive scan at (start-1)
        Xr = jnp.where(col >= 1, pltpu.roll(x, 1, 1), neutral)
        b0, b1, b2, b3 = _split8(Xr)
        pack = jnp.concatenate(
            [b.astype(jnp.bfloat16) for b in (b0, b1, b2, b3)], axis=0)
        # one-hot selection x 8-bit limbs: every product and sum is exact
        # in bf16 with f32 accumulation.  The selection runs in 128-row
        # k-blocks so VMEM stays O(T) instead of O(T^2) — this is what
        # lets T grow past 1024 (same total MACs either way)
        iota128 = jax.lax.broadcasted_iota(jnp.int32, (128, T), 0)
        snm = sn == 1
        E2 = jnp.concatenate([
            jax.lax.dot_general(
                pack,
                (snm & (k_of_j == (iota128 + kb * 128))).astype(jnp.bfloat16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            for kb in range(T2 // 128)
        ], axis=1)
        E = (((E2[24:].astype(jnp.int32) * 256 + E2[16:24].astype(jnp.int32))
              * 256 + E2[8:16].astype(jnp.int32))
             * 256 + E2[:8].astype(jnp.int32))
        # record 0 (staging column `off`) closes the carried-open segment
        carry = carry_ref[:, 0:1]
        loc0 = jnp.sum(jnp.where(col2 == off, E, 0), axis=1, keepdims=True)
        rec0 = _combine(ops, carry, loc0)
        E = jnp.where(col2 == off, rec0, E)
        # staging prefix [0, off) = the partial 128-record block already
        # on HBM (rewriting identical values keeps the write aligned)
        rb2 = jnp.concatenate(
            [rec_ref[:, :], jnp.zeros((8, T), jnp.int32)], axis=1)
        staged = jnp.where(col2 < off, rb2, E)
        # double-buffered staging: compute fills buffer t%2 while the
        # previous tile's DMA (other buffer) is still in flight; waiting
        # on it BEFORE starting this tile's DMA keeps HBM writes ordered
        # (the overlap-write trick needs tile t+1's write to land after
        # tile t's)
        even = t % 2 == 0

        @pl.when(even)
        def _():
            stage_ref[:, :] = staged

        @pl.when(~even)
        def _():
            stage2_ref[:, :] = staged

        # ---- carry <- this tile's trailing open segment ----
        last = x[:, T - 1: T]
        carry_ref[:, 0:1] = jnp.where(
            S_t == 0, _combine(ops, carry, last), last)
        nbase = base + S_t
        cnt_ref[0] = nbase
        # keep the new partial 128-block for the next tile's prefix (from
        # VMEM staging — independent of the DMA)
        delta = pl.multiple_of(
            jnp.clip(((nbase // 128) * 128) - aligned, 0, T), 128)

        @pl.when(even)
        def _():
            rec_ref[:, :] = stage_ref[:, pl.ds(delta, 128)]

        @pl.when(~even)
        def _():
            rec_ref[:, :] = stage2_ref[:, pl.ds(delta, 128)]

        @pl.when(t > 0)
        def _():
            pltpu.make_async_copy(stage_ref, stage_ref, sem).wait()

        dst = out_hbm.at[:, pl.ds(
            pl.multiple_of(jnp.minimum(aligned, OB - T2), 128), T2)]

        @pl.when(even)
        def _():
            pltpu.make_async_copy(stage_ref, dst, sem).start()

        @pl.when(~even)
        def _():
            pltpu.make_async_copy(stage2_ref, dst, sem).start()

        # ---- final tile: flush the open segment as the last record ----
        @pl.when(t == nt - 1)
        def _():
            pltpu.make_async_copy(stage_ref, stage_ref, sem).wait()
            fbase = cnt_ref[0]
            faligned = (fbase // 128) * 128
            foff = fbase - faligned
            col1 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            stage_ref[:, :128] = jnp.where(
                col1 == foff, carry_ref[:, 0:1], rec_ref[:, :])
            d2 = pltpu.make_async_copy(
                stage_ref.at[:, pl.ds(0, 128)],
                out_hbm.at[:, pl.ds(
                    pl.multiple_of(jnp.minimum(faligned, OB - 128), 128),
                    128)],
                sem)
            d2.start()
            d2.wait()
            cnt_ref[0] = fbase + 1

    return kernel


@functools.partial(jax.jit, static_argnames=("ops", "out_budget", "tile"))
def seg_reduce_compact(
    seg_new: jnp.ndarray,   # [N] or [1, N] int32/bool: 1 at segment starts
    v8: jnp.ndarray,        # [8, N] int32 value lanes (lane-major)
    *,
    ops: tuple = ("sum", "min", "min", "max", "max", "first", "first",
                  "first"),
    out_budget: int,
    tile: int = 0,   # 0 = default 1024 (the extraction matmul bounds T)
):
    """Reduce a sorted-segment stream to compacted per-segment records.

    Returns (out [8, out_budget] int32, count int32).  Records appear in
    stream order; columns >= count are garbage.  If count > out_budget,
    tail records were dropped (the caller redispatches at a bigger
    budget, mirroring the existing overflow protocol).  Dead entries
    must be pre-neutralized per lane (sum -> 0, min -> INT32_MAX,
    max -> INT32_MIN+1).  The final open segment (including any dead
    tail) is flushed as the last record; `first` lanes report INT32_MAX
    for records whose entries were all pre-first-neutralized.
    """
    assert len(ops) == 8 and all(o in _NEUTRAL for o in ops)
    if seg_new.ndim == 1:
        seg_new = seg_new[None, :]
    N = v8.shape[1]
    # blocked extraction keeps VMEM O(T): default to 2048-wide tiles
    # (halves the per-tile fixed overhead vs 1024) when the stream and
    # budget allow
    OB = out_budget
    T = tile or (2048 if N % 2048 == 0 and OB >= 2048 + 128 else 1024)
    assert N % T == 0 and OB >= T + 128 and OB % 128 == 0, (N, T, OB)
    nt = N // T

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, T), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, T), lambda t: (0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, T + 128), jnp.int32),  # staging buffer A
            pltpu.VMEM((8, T + 128), jnp.int32),  # staging buffer B
            pltpu.VMEM((8, 2), jnp.int32),        # open-segment carry
            pltpu.VMEM((8, 128), jnp.int32),      # partial record block
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out, cnt = pl.pallas_call(
        _make_kernel(ops, T, OB, nt),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((8, OB), jnp.int32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ),
        interpret=INTERPRET,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(seg_new.astype(jnp.int32), v8)
    return out, cnt[0]
