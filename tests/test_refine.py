"""CIGAR-guided refine alignment (ops/refine.py vs kswx.h:483-659 semantics)."""

import numpy as np
import pytest

from smartdenovo_tpu.ops.refine import (band_from_cigar, refine_alignment_batch)


def np_affine_global(a, b, match=2, mismatch=-5, open_i=-3, open_d=-3, ext=-1):
    """Full-matrix oracle with the reference's exact recurrences
    (kswx.h:602-631): gap lanes open from the diagonal candidate m."""
    ql, tl = len(a), len(b)
    NEG = -10000
    H = np.full(tl + 1, NEG, np.int64)
    H[0] = 0
    E = np.full(tl + 1, NEG, np.int64)
    for i in range(ql):
        h1 = NEG
        f = NEG
        Hn = np.full(tl + 1, NEG, np.int64)
        for j in range(1, tl + 1):
            sub = match if a[i] == b[j - 1] else mismatch
            m = H[j - 1] + sub
            e = E[j]
            h = max(m, e, f)
            Hn[j] = h
            E[j] = max(e + ext, m + open_i + ext)
            f = max(f + ext, m + open_d + ext)
        H = Hn
    return int(H[tl])


def mutate(rng, seq, err):
    out = []
    for c in seq:
        r = rng.random()
        if r < err / 3:
            out.append((c + 1 + rng.integers(3)) % 4)
        elif r < 2 * err / 3:
            out.append(c)
            out.append(rng.integers(4))
        elif r < err:
            continue
        else:
            out.append(c)
    return np.array(out, np.uint8)


@pytest.mark.parametrize("err", [0.05, 0.15])
def test_refine_matches_full_matrix_oracle(err):
    rng = np.random.default_rng(41)
    pairs = []
    cigars = []
    for _ in range(6):
        b = rng.integers(0, 4, 300).astype(np.uint8)
        a = mutate(rng, b, err)
        pairs.append((a, b))
        # deliberately sloppy prior: one all-M run (band must recover)
        cigars.append((["M"], [max(len(a), len(b))]))
    res = refine_alignment_batch(pairs, cigars, W_base=128)
    for (a, b), r in zip(pairs, res):
        oracle = np_affine_global(a, b)
        assert r["score"] == oracle, (r["score"], oracle)
        # stats are consistent with the cigar and sequences
        assert r["mat"] + r["mis"] + r["ins"] == len(a)
        assert r["mat"] + r["mis"] + r["dl"] == len(b)
        assert r["mat"] >= (1 - 2.5 * err) * min(len(a), len(b))


def test_refine_improves_sloppy_cigar():
    """A noisy prior CIGAR refines to (near-)optimal like the reference's
    polish; the returned stats must reflect the NEW alignment."""
    rng = np.random.default_rng(42)
    b = rng.integers(0, 4, 800).astype(np.uint8)
    a = mutate(rng, b, 0.12)
    # prior: coarse blocks with misplaced indels
    ops = ["M", "I", "M", "D", "M"]
    la, lb = len(a), len(b)
    counts = [la // 3, 10, la // 3, 10, la - 2 * (la // 3) - 10]
    res = refine_alignment_batch([(a, b)], [(ops, counts)], W_base=64)[0]
    oracle = np_affine_global(a, b)
    assert res["score"] >= 0.95 * oracle
    ident = res["mat"] / res["aln"]
    assert ident > 0.8, ident


def test_band_from_cigar_follows_path():
    ops, counts = ["M", "D", "M", "I", "M"], [100, 50, 100, 30, 70]
    al = 100 + 100 + 30 + 70
    bl = 100 + 50 + 100 + 70
    base = band_from_cigar([(ops, counts)], [al], [bl], 512, 64)[0]
    # after the D run, row 100's center ~ column 150
    assert 100 <= base[100] + 32 <= 160
    # end of path: row al center ~ bl
    assert abs((base[al] + 32) - bl) <= 40
