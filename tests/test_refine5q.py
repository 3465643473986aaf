"""Quality-aware refine (kswx_refine_affine_alignment_5q equivalent)."""

import numpy as np

from smartdenovo_tpu.ops.refine5q import (QCLP, QMIS, refine5q_alignment_batch)


def _tracks(read, subqv=30, insqv=25, delqv=20):
    """Uniform 7-track quality array for a read (tags = read itself)."""
    L = len(read)
    q = np.zeros((7, L), np.uint8)
    q[1] = subqv
    q[2] = insqv
    q[3] = delqv
    q[5] = read      # SubstitutionTag
    q[6] = read      # DeletionTag
    return q


def test_perfect_read_zero_cost():
    rng = np.random.default_rng(3)
    t = rng.integers(0, 4, 300).astype(np.uint8)
    r = t.copy()
    out = refine5q_alignment_batch(
        [(r, t)], [_tracks(r)], [(["M"], [300])])
    assert out[0]["ops"] == ["M"]
    assert out[0]["mat"] == 300 and out[0]["mis"] == 0
    assert out[0]["score"] == 0


def test_tagged_substitution_costs_subqv():
    rng = np.random.default_rng(4)
    t = rng.integers(0, 4, 200).astype(np.uint8)
    r = t.copy()
    r[100] = (t[100] + 1) % 4
    q = _tracks(r, subqv=7)
    q[5, 100] = t[100]          # sequencer suggests the true base
    out = refine5q_alignment_batch([(r, t)], [q], [(["M"], [200])])
    assert out[0]["mis"] == 1 and out[0]["ins"] == 0 and out[0]["dl"] == 0
    assert out[0]["score"] == -7   # SubQV, not QMIS
    # untagged: same alignment, QMIS cost
    out2 = refine5q_alignment_batch([(r, t)], [_tracks(r, subqv=7)],
                                    [(["M"], [200])])
    assert out2[0]["score"] == -QMIS


def test_low_insqv_base_is_deleted_as_insertion():
    rng = np.random.default_rng(5)
    t = rng.integers(0, 4, 200).astype(np.uint8)
    r = np.insert(t, 80, (t[80] + 2) % 4)   # one extra read base
    q = _tracks(r, insqv=3)
    cig = [(["M", "I", "M"], [80, 1, 120])]
    out = refine5q_alignment_batch([(r, t)], [q], cig)
    assert out[0]["ins"] == 1 and out[0]["dl"] == 0
    assert out[0]["mat"] == 200
    assert out[0]["score"] == -3


def test_tagged_deletion_cheap():
    rng = np.random.default_rng(6)
    t = rng.integers(0, 4, 200).astype(np.uint8)
    r = np.delete(t, 90)                     # read lost one base
    q = _tracks(r, delqv=4)
    q[6, 90] = t[90]   # DeletionTag of the NEXT base names the lost base
    cig = [(["M", "D", "M"], [90, 1, 109])]
    out = refine5q_alignment_batch([(r, t)], [q], cig)
    assert out[0]["dl"] == 1 and out[0]["ins"] == 0
    assert out[0]["score"] == -4
