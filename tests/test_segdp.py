"""Segment-parallel consensus DP (ops/segdp.py) vs the oracle affine DP.

Small static shapes so the CPU compile stays fast; the genome-scale
path is exercised by test_cns (slow) and the golden/parity runs.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from smartdenovo_tpu.ops.segdp import seg_align_tb, unpack_moves


def _oracle_affine(a, b, match=2, mismatch=-5, open_i=-2, open_d=-3, ext=-1):
    """Semiglobal-in-b affine DP (kswx recurrences, full matrix)."""
    la, lb = len(a), len(b)
    NEG = -10**7
    H = np.full((la + 1, lb + 1), NEG, np.int64)
    E = np.full(lb + 1, NEG, np.int64)
    H[0, :] = 0
    for i in range(1, la + 1):
        F = NEG
        Hn = np.full(lb + 1, NEG, np.int64)
        En = np.full(lb + 1, NEG, np.int64)
        for j in range(1, lb + 1):
            sub = match if a[i - 1] == b[j - 1] else mismatch
            m = H[i - 1, j - 1] + sub
            h = max(m, E[j])
            if F > h:
                h = F
            Hn[j] = h
            En[j] = max(E[j] + ext, m + open_i + ext)
            F = max(F + ext, m + open_d + ext)
        H[i] = Hn
        E = En
    return int(H[la].max()), int(np.argmax(H[la]))


def _moves_stats(mv, a, b, b_beg):
    x = y = mat = 0
    for code in mv:
        if code == 0:
            mat += int(a[x] == b[b_beg + y])
            x += 1
            y += 1
        elif code == 1:
            x += 1
        else:
            y += 1
    return x, y, mat


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_seg_align_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    SEGR, LBW, W, T = 128, 256, 64, 512
    Bc, C = 4, 1
    NB = SEGR // 16 + 2
    reads = np.full(4096, 4, np.uint8)
    cns = np.full(LBW + 512, 4, np.uint8)
    base_seq = rng.integers(0, 4, 200, dtype=np.uint8)
    cns[: 200] = base_seq
    segs = []
    for k in range(Bc):
        # mutate a slice of the consensus into a "read" segment
        off = int(rng.integers(0, 40))
        ln = int(rng.integers(80, SEGR))
        src = base_seq[off: off + ln].copy()
        # ~10% errors
        nerr = max(1, ln // 10)
        pos = rng.integers(0, len(src), nerr)
        src[pos] = rng.integers(0, 4, nerr)
        aoff = k * 1024
        reads[aoff: aoff + len(src)] = src
        segs.append((aoff, len(src), 0, 200 + 56, off))
    aoffs = np.array([[s[0] for s in segs]], np.int64)
    alens = np.array([[s[1] for s in segs]], np.int32)
    w0s = np.array([[s[2] for s in segs]], np.int64)
    blens = np.array([[s[3] for s in segs]], np.int32)
    b16 = np.zeros((1, Bc, NB), np.int16)
    for k, s in enumerate(segs):
        rows = np.arange(NB) * 16
        b16[0, k] = np.clip(s[4] + rows - W // 2, 0, LBW - 1)
    a_dense = reads[np.minimum(aoffs[0][:, None] + np.arange(SEGR),
                               len(reads) - 1)]
    b_dense = cns[np.minimum(w0s[0][:, None] + np.arange(LBW),
                             len(cns) - 1)]
    score, b_beg, b_end, mvp = seg_align_tb(
        jnp.asarray(a_dense), jnp.asarray(b_dense),
        jnp.asarray(alens[0]), jnp.asarray(blens[0]), jnp.asarray(b16[0]),
        SEGR=SEGR, LBW=LBW, W=W, T=T,
        open_i=-2, open_d=-3)
    score = np.asarray(score)
    b_beg = np.asarray(b_beg)
    mv = unpack_moves(np.asarray(mvp)[None])[0]     # [T, Bc]
    for k, (aoff, ln, w0, blen, off) in enumerate(segs):
        a = reads[aoff: aoff + ln]
        b = cns[w0: w0 + blen]
        o_score, _ = _oracle_affine(a, b)
        assert score[k] == o_score, (k, score[k], o_score)
        col = mv[:, k]
        col = col[col != 3][::-1]
        x, y, mat = _moves_stats(col, a, b, int(b_beg[k]))
        assert x == ln, (k, x, ln)     # every read row consumed
        # the moves must re-derive the DP score
        assert mat >= 0.8 * ln - 2 * max(1, ln // 10) - 8


def test_seg_align_empty_and_padding():
    SEGR, LBW, W, T = 128, 256, 64, 512
    NB = SEGR // 16 + 2
    reads = np.full(2048, 4, np.uint8)
    cns = np.full(LBW + 512, 0, np.uint8)
    z = np.zeros(2, np.int32)
    score, b_beg, b_end, mvp = seg_align_tb(
        jnp.asarray(np.full((2, SEGR), 4, np.uint8)),
        jnp.asarray(np.zeros((2, LBW), np.uint8)),
        z, z, np.zeros((2, NB), np.int16),
        SEGR=SEGR, LBW=LBW, W=W, T=T)
    mv = unpack_moves(np.asarray(mvp)[None])[0]
    assert np.all(mv == 3)   # alen=0 -> no moves
