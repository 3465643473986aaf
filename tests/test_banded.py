import numpy as np
import jax.numpy as jnp

from smartdenovo_tpu.ops.banded import (
    banded_align,
    make_band_centers,
    traceback_banded,
)
from smartdenovo_tpu.ops.swdp import align_strings
from smartdenovo_tpu.utils.simulate import mutate_read


def _run(a_seqs, b_seqs, anchors=None, LA=None, W=64):
    B = len(a_seqs)
    LA = LA or max(len(s) for s in a_seqs)
    LB = max(len(s) for s in b_seqs)
    a = np.full((B, LA), 4, np.uint8)
    b = np.full((B, LB), 4, np.uint8)
    alen = np.zeros(B, np.int32)
    blen = np.zeros(B, np.int32)
    for i, (x, y) in enumerate(zip(a_seqs, b_seqs)):
        a[i, : len(x)] = x
        alen[i] = len(x)
        b[i, : len(y)] = y
        blen[i] = len(y)
    anchors = anchors or [[] for _ in range(B)]
    base = make_band_centers(anchors, alen, blen, LA, W)
    score, end_col, dirs = banded_align(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(alen), jnp.asarray(blen),
        jnp.asarray(base), LA=LA, W=W,
    )
    cigs, b_beg = traceback_banded(np.asarray(dirs), base, alen, np.asarray(end_col))
    return np.asarray(score), cigs, a, b, alen, blen


def test_identical_sequences():
    rng = np.random.default_rng(1)
    s = rng.integers(0, 4, 100).astype(np.uint8)
    score, cigs, a, b, alen, blen = _run([s], [s])
    assert score[0] == 2 * 100
    ops, counts = cigs[0]
    assert ops == ["M"] and counts == [100]


def test_substitution_score():
    rng = np.random.default_rng(2)
    s = rng.integers(0, 4, 50).astype(np.uint8)
    t = s.copy()
    t[25] = (t[25] + 1) % 4
    score, cigs, *_ = _run([s], [t])
    assert score[0] == 2 * 49 - 5


def test_single_gap():
    rng = np.random.default_rng(3)
    s = rng.integers(0, 4, 60).astype(np.uint8)
    t = np.delete(s, 30)
    score, cigs, *_ = _run([s], [t])
    assert score[0] == 2 * 59 - 3
    ops, counts = cigs[0]
    assert "".join(ops) in ("MIM", "IM", "MI")
    assert sum(c for o, c in zip(ops, counts) if o == "M") == 59


def test_alignment_strings_consistent():
    rng = np.random.default_rng(4)
    s = rng.integers(0, 4, 300).astype(np.uint8)
    t = mutate_read(rng, s, 0.12)
    score, cigs, a, b, alen, blen = _run([s], [t], W=128)
    ops, counts = cigs[0]
    a0, a1 = align_strings(a[0], b[0], ops, counts)
    # alignment strings must reproduce both sequences when gaps removed
    np.testing.assert_array_equal(a0[a0 != 4], s)
    np.testing.assert_array_equal(a1[a1 != 4], t)
    # identity should be high
    m = np.sum((a0 == a1) & (a0 != 4))
    assert m > 0.8 * len(s)


def test_long_drifting_alignment_with_anchors():
    """13% indel-heavy noise over 3kb drifts far off the main diagonal;
    without anchors a W=64 band fails, with anchors it works."""
    rng = np.random.default_rng(5)
    s = rng.integers(0, 4, 3000).astype(np.uint8)
    t = mutate_read(rng, s, 0.13, ins_frac=0.8, del_frac=0.05, sub_frac=0.15, hp_bias=0.2)
    # exact anchor chain from the identity mapping is unknown; approximate
    # with proportional anchors every 500bp
    anc = [(i, int(i * len(t) / len(s))) for i in range(250, 2800, 500)]
    score, cigs, a, b, alen, blen = _run([s], [t], anchors=[anc], LA=3000, W=128)
    ops, counts = cigs[0]
    a0, a1 = align_strings(a[0], b[0], ops, counts)
    np.testing.assert_array_equal(a0[a0 != 4], s)
    np.testing.assert_array_equal(a1[a1 != 4], t)
    m = int(np.sum((a0 == a1) & (a0 != 4)))
    assert m > 0.75 * len(s), f"only {m} matches"


def test_batch_independence():
    rng = np.random.default_rng(6)
    seqs = [rng.integers(0, 4, 80).astype(np.uint8) for _ in range(4)]
    muts = [mutate_read(rng, s, 0.1) for s in seqs]
    score_b, cigs_b, *_ = _run(seqs, muts, W=64)
    for i in range(4):
        score_1, cigs_1, *_ = _run([seqs[i]], [muts[i]], W=64, LA=80)
        assert score_b[i] == score_1[0]
        assert cigs_b[i] == cigs_1[0]
