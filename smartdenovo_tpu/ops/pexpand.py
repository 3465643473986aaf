"""Pallas emission kernel — segmented n x m co-occurrence expansion.

The join matcher's phase 3 (ops/dotmatrix.py extract_zmer_pairs_join)
replicates per-emitter payloads across each emitter's contiguous run of
output slots.  In XLA that costs several budget-wide scatters + forward
fills (~1 s per 25M-entry bench batch on v5e — scatters are among the
slowest TPU primitives); this kernel streams it.

Design (output-driven):

  - emitters are first compacted to a dense prefix with ONE extra sort
    (sorts are cheap relative to scatters, measured);
  - the kernel walks OUTPUT tiles; for tile t the source emitters live
    in a window of <= T+1 entries starting at esrc[t] = first emitter
    covering output t*T (every emitter emits >= 1 slot).  All eight
    emitter lanes (cnt, global run start, and the 15-bit-split payload
    halves) ride ONE packed [8, NE] array, and the window is fetched
    with ONE explicit double-buffered DMA at a dynamic element offset —
    no data-dependent BlockSpec indexing;
  - inside the tile the emitter-of-slot mapping is a selection matrix
    sel[j, e] = (ost[e] <= j < ost[e] + cnt[e]) — one-hot by
    construction because runs tile the output space — and payload
    replication is ONE MXU contraction, w8 @ sel^T (15-bit splits keep
    the f32 products exact over the full int32 range);
  - output tiles are written through a static BlockSpec; slots past the
    true total carry garbage that the caller masks with its total.

Per element the kernel touches memory three times (window DMA in,
sequential write out); there are no scatters and no HBM gathers.  The
remaining per-slot query-occurrence lookup stays in the caller as one
XLA gather into the small compact query table.

cf. reference hzm_aln.h:117-224 (query_single_read_seeds emits the same
n x m products per matched zmer, capped per read)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = False   # set True to run the kernel interpreted (CPU tests)

def _split8(v):
    """Four 8-bit limbs (low three unsigned, top arithmetic) — exact in a
    single bf16 MXU pass (vs the 6-pass f32 emulation 15-bit limbs need)."""
    return (v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF,
            jax.lax.shift_right_arithmetic(v, 24))


def _make_kernel(T, T2, nt):
    def kernel(esrc_ref, in_hbm, out_ref, win, sem):
        t = pl.program_id(0)
        start = pl.multiple_of(esrc_ref[t], 128)
        d = pltpu.make_async_copy(
            in_hbm.at[:, pl.ds(start, T2)], win, sem)
        d.start()
        d.wait()
        w = win[:, :]                        # [16, T2] int32
        cnt = w[0:1]                         # [1, T2] int32
        ost = w[1:2]                         # [1, T2] int32 global run starts
        # int32 comparisons: budgets past 2^24 would lose exactness in f32
        jj = t * T + jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
        sel = ((ost <= jj) & (jj < ost + cnt)).astype(jnp.bfloat16)  # [T, T2]
        E = jax.lax.dot_general(             # [12, T2] x [T, T2] -> [12, T]
            w[2:14].astype(jnp.bfloat16), sel,
            dimension_numbers=(((1,), (1,)), ((), ())),
            # one-hot selection x 8-bit limbs: exact in one bf16 pass
            preferred_element_type=jnp.float32).astype(jnp.int32)
        # rows hold 4 limbs per payload: recombine into 3 payload rows
        def comb(o):
            return ((E[o + 3: o + 4] * 256 + E[o + 2: o + 3]) * 256
                    + E[o + 1: o + 2]) * 256 + E[o: o + 1]
        out = jnp.concatenate([
            comb(0), comb(4), comb(8),
            jnp.zeros((5, T), jnp.int32),
        ], axis=0)
        out_ref[:, :] = out

    return kernel


@functools.partial(jax.jit, static_argnames=("pair_budget", "tile"))
def expand_emit(cnt2c: jnp.ndarray,   # [NE] int32 dense emitter counts
                payc: jnp.ndarray,    # [NE] int32 candidate pk per emitter
                auxc: jnp.ndarray,    # [NE] int32 (q*A + slot) per emitter
                qbasec: jnp.ndarray,  # [NE] int32 query base per emitter
                *,
                pair_budget: int,
                tile: int = 1024):
    """Replicate emitter payloads over their output runs.

    Returns (cg, aux, base) at [pair_budget]; slots past the true total
    carry garbage (the caller masks with its total).  NE must be a
    multiple of 128 and >= tile + 128."""
    T = tile
    T2 = T + 128
    NE = cnt2c.shape[0]
    assert pair_budget % T == 0 and NE % 128 == 0 and NE >= T2
    nt = pair_budget // T
    cum = jnp.cumsum(cnt2c)
    ost2c = cum - cnt2c
    # first emitter whose run covers output t*T; its window never spans
    # more than T+1 emitters (every emitter emits >= 1 slot).  The start
    # is aligned down to 128 (Mosaic tiled-memref slicing requirement);
    # T2 = T + 128 keeps the aligned window covering the worst case
    # (127 alignment slack + T+1 emitters).
    tstarts = jnp.arange(nt, dtype=jnp.int32) * T
    esrc = jnp.searchsorted(cum, tstarts, side="right").astype(jnp.int32)
    esrc = jnp.clip((esrc // 128) * 128, 0, NE - T2)

    in8 = jnp.stack([cnt2c, ost2c,
                     *_split8(payc), *_split8(auxc), *_split8(qbasec),
                     jnp.zeros_like(cnt2c), jnp.zeros_like(cnt2c)],
                    axis=0)                   # [16, NE] int32

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((8, T), lambda t, e: (0, t),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((16, T2), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        _make_kernel(T, T2, nt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, pair_budget), jnp.int32),
        interpret=INTERPRET,
    )(esrc, in8)
    return out[0], out[1], out[2]
