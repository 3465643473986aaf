"""Pallas streaming kernel — join-matcher post-sort emitter extraction.

The join matcher (ops/dotmatrix.py extract_zmer_pairs_join) sorts query
zmer occurrences + candidate postings into (query, zmer, side) runs and
then needs, for every candidate entry, the run's query-occurrence count
(`qcnt`) and output placement — in XLA that is 4 budget-wide scan
families (cumsum/cummax at ~25M), one streaming compaction pass
(ops/sseg.py in first-lane mode), and a budget-wide scatter for the
compact query-payload table (together ~190 ms per 64-query bench batch
on v5e).

This kernel computes the whole post-sort phase in ONE sequential
streaming pass over the sorted (key, pay, aux) stream:

  - per tile, the query-occurrence prefix count (pre0), the open-run
    start (rs), and the emitted-slot prefix (ost2) are ~10 masked
    doubling steps each on the (1, T) tile — pure VPU, with scalar
    carries across tiles;
  - entries with 1 <= qcnt < max_per_read are emitters; their records
    (qcnt, payload, aux, output base) are extracted with a one-hot
    selection matmul (8-bit limbs, exact in one bf16 MXU pass) and
    stream-compacted to HBM with the same overlap-write trick as
    ops/sseg.py;
  - the compact query-payload table comes from a separate SMALL sort of
    the query entries alone (the big stream's query payloads are never
    touched again), done by the caller in XLA.

Returns the dense emitter records ready for the ops/pexpand.py
replication kernel, plus the exact total output-slot count.

cf. reference hzm_aln.h:117-224 — the same per-(read, zmer) n x m
co-occurrence bookkeeping, done there with per-read bitvec ranks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = False   # set True to run interpreted (CPU tests)

I32_MAX = (1 << 31) - 1


def _split8(x):
    """Four 8-bit limbs (low three unsigned, top arithmetic)."""
    return (x & 0xFF, (x >> 8) & 0xFF, (x >> 16) & 0xFF,
            jax.lax.shift_right_arithmetic(x, 24))


def _make_kernel(T, OB, nt, mpr):
    T2 = T + 128   # staging width: 128-aligned write window + T records

    def kernel(key_ref, pay_ref, aux_ref, out_hbm, cnt_ref, stage_ref,
               stage2_ref, rec_ref, sem):
        t = pl.program_id(0)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
        col2 = jax.lax.broadcasted_iota(jnp.int32, (1, T2), 1)

        @pl.when(t == 0)
        def _():
            cnt_ref[0] = 0      # emitter records so far
            cnt_ref[1] = 0      # pre0 carry (query entries so far)
            cnt_ref[2] = 0      # ost2 carry (output slots so far)
            cnt_ref[3] = -1     # last grp of previous tile
            cnt_ref[4] = 0      # rs carry (open run's start pre0)
            rec_ref[:, :] = jnp.zeros((8, 128), jnp.int32)

        k = key_ref[:]                          # [1, T] int32 sorted keys
        svalid = k != I32_MAX
        tag0 = svalid & ((k & 1) == 0)
        tag1 = svalid & ((k & 1) == 1)
        grp = k >> 1
        prev_grp = jnp.where(col == 0, cnt_ref[3], pltpu.roll(grp, 1, 1))
        run_new = grp != prev_grp

        # ---- pre0: exclusive count of query entries ----
        c0 = tag0.astype(jnp.int32)
        sh = 1
        while sh < T:
            c0 = c0 + jnp.where(col >= sh, pltpu.roll(c0, sh, 1), 0)
            sh *= 2
        pre0 = cnt_ref[1] + c0 - tag0.astype(jnp.int32)

        # ---- rs: pre0 at the latest run start (cummax; pre0 monotone) ----
        rs = jnp.where(run_new, pre0, -1)
        sh = 1
        while sh < T:
            rs = jnp.maximum(rs, jnp.where(col >= sh,
                                           pltpu.roll(rs, sh, 1), -1))
            sh *= 2
        rs = jnp.where(rs < 0, cnt_ref[4], rs)

        # ---- emitters: candidate entries with 1 <= qcnt < mpr ----
        qcnt = pre0 - rs
        cnt2 = jnp.where(tag1 & (qcnt > 0) & (qcnt < mpr), qcnt, 0)
        is_em = cnt2 > 0
        c2 = cnt2
        sh = 1
        while sh < T:
            c2 = c2 + jnp.where(col >= sh, pltpu.roll(c2, sh, 1), 0)
            sh *= 2
        ost2 = cnt_ref[2] + c2 - cnt2           # exclusive output start
        base_val = rs - ost2

        # ---- record extraction + stream compaction (cf. ops/sseg.py) ----
        em = is_em.astype(jnp.int32)
        ce = em
        sh = 1
        while sh < T:
            ce = ce + jnp.where(col >= sh, pltpu.roll(ce, sh, 1), 0)
            sh *= 2
        S_t = ce[0, T - 1]
        base_e = cnt_ref[0]
        aligned = (base_e // 128) * 128
        off = base_e - aligned
        k_of_j = ce - em + off
        lanes = (cnt2, pay_ref[:], aux_ref[:], base_val)
        limbs = []
        for v in lanes:
            limbs.extend(_split8(v))
        pack = jnp.concatenate(
            [b.astype(jnp.bfloat16) for b in limbs], axis=0)   # [16, T]
        # 128-row k-blocked selection keeps VMEM O(T), unlocking T > 1024
        # (cf. ops/sseg.py — same total MACs as the single [T2, T] pass)
        iota128 = jax.lax.broadcasted_iota(jnp.int32, (128, T), 0)
        E2 = jnp.concatenate([
            jax.lax.dot_general(
                pack,
                (is_em & (k_of_j == (iota128 + kb * 128))).astype(
                    jnp.bfloat16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            for kb in range(T2 // 128)
        ], axis=1)

        def comb(o):
            return (((E2[4 * o + 3: 4 * o + 4].astype(jnp.int32) * 256
                      + E2[4 * o + 2: 4 * o + 3].astype(jnp.int32)) * 256
                     + E2[4 * o + 1: 4 * o + 2].astype(jnp.int32)) * 256
                    + E2[4 * o: 4 * o + 1].astype(jnp.int32))

        E = jnp.concatenate([comb(0), comb(1), comb(2), comb(3),
                             jnp.zeros((4, T2), jnp.int32)], axis=0)
        rb2 = jnp.concatenate(
            [rec_ref[:, :], jnp.zeros((8, T), jnp.int32)], axis=1)
        staged = jnp.where(col2 < off, rb2, E)
        # double-buffered staging (cf. ops/sseg.py): compute overlaps the
        # previous tile's DMA; waiting before this tile's start keeps the
        # overlap-writes ordered
        even = t % 2 == 0

        @pl.when(even)
        def _():
            stage_ref[:, :] = staged

        @pl.when(~even)
        def _():
            stage2_ref[:, :] = staged

        nbase = base_e + S_t
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

        @pl.when(t == nt - 1)
        def _():
            pltpu.make_async_copy(stage_ref, stage_ref, sem).wait()

        # ---- carries ----
        cnt_ref[0] = nbase
        tag0_i = tag0.astype(jnp.int32)   # Mosaic: cast before scalar read
        cnt_ref[1] = pre0[0, T - 1] + tag0_i[0, T - 1]
        cnt_ref[2] = ost2[0, T - 1] + cnt2[0, T - 1]
        cnt_ref[3] = grp[0, T - 1]
        cnt_ref[4] = rs[0, T - 1]

    return kernel


@functools.partial(jax.jit, static_argnames=("max_per_read", "out_budget",
                                             "tile"))
def join_emitters(
    key: jnp.ndarray,   # [N] int32 sorted (q<<zb+1 | zmer<<1 | side), SENT pad
    pay: jnp.ndarray,   # [N] int32 payload (candidate pk; query slots unused)
    aux: jnp.ndarray,   # [N] int32 aux (candidate pair row; query slots 0)
    *,
    max_per_read: int,
    out_budget: int,
    tile: int = 0,   # 0 = default 1024 (the extraction matmul bounds T)
):
    """Extract dense emitter records from the sorted join stream.

    Returns (records [8, out_budget] int32, n_emitters int32,
    total_slots int32).  Record rows: 0 = qcnt, 1 = pay, 2 = aux,
    3 = output base (query-table index minus output start); rows 4-7 are
    zero.  Columns >= n_emitters are garbage.  The overlap-write clamp
    can garble records in the LAST tile+128 columns once the stream
    approaches the budget, so callers must treat n_emitters >
    out_budget - tile - 128 as overflow and redispatch bigger.
    """
    N = key.shape[0]
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
            pl.BlockSpec((1, T), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T), lambda t: (0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, T + 128), jnp.int32),  # staging buffer A
            pltpu.VMEM((8, T + 128), jnp.int32),  # staging buffer B
            pltpu.VMEM((8, 128), jnp.int32),      # partial record block
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out, cnt = pl.pallas_call(
        _make_kernel(T, OB, nt, max_per_read),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((8, OB), jnp.int32),
            jax.ShapeDtypeStruct((8,), jnp.int32),
        ),
        interpret=INTERPRET,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(key[None, :], pay[None, :], aux[None, :])
    return out, cnt[0], cnt[2]
