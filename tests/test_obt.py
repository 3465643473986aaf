import numpy as np

from smartdenovo_tpu.graph.obt import ObtParams, run_obt


def _rec(n1, d1, l1, b1, e1, n2, d2, l2, b2, e2, score=500, ident=0.8):
    return (n1, d1, l1, b1, e1, n2, d2, l2, b2, e2, score, ident)


def test_obt_keeps_covered_region():
    # read A (len 10000) covered by overlaps over [0, 9800]
    recs = [
        _rec("A", 0, 10000, 0, 5000, "B", 0, 8000, 3000, 8000),
        _rec("A", 0, 10000, 3000, 9800, "C", 0, 9000, 0, 6800),
    ]
    out = run_obt(recs, ObtParams(min_cov=1))
    off, ln, orig, x, y = out["A"]
    assert x == 0 and y == 9800
    assert orig == 10000


def test_obt_trims_uncovered_ends():
    # dovetail overlap: A[2000..8000] vs B[2900..8900] (B len 9000, reaches
    # B's right end) — no spurs, so A is trimmed to its covered region
    recs = [
        _rec("A", 0, 10000, 2000, 9900, "B", 0, 9000, 0, 7900),
    ]
    out = run_obt(recs, ObtParams(min_cov=1))
    off, ln, orig, x, y = out["A"]
    assert (x, y) == (2000, 9900)


def test_obt_spurred_only_read_clipped_away():
    # a single overlap with a spur on both projections gives no trusted
    # coverage -> the read keeps nothing (matches the reference sweep)
    recs = [
        _rec("A", 0, 10000, 2000, 8000, "B", 0, 9000, 100, 6100),
    ]
    out = run_obt(recs, ObtParams(min_cov=1))
    off, ln, orig, x, y = out["A"]
    assert ln == 0


def test_obt_contained_inherits_container():
    recs = [
        # A contained in B (A fully covered)
        _rec("A", 0, 5000, 0, 5000, "B", 0, 12000, 3000, 8000),
        # B trimmed at right end to 10000 by coverage
        _rec("B", 0, 12000, 0, 10000, "C", 0, 11000, 1000, 11000),
    ]
    out = run_obt(recs, ObtParams(min_cov=1))
    bx = out["B"]
    assert bx[3] == 0 and bx[4] == 10000
    ax = out["A"]
    # A sits at B[3000..8000], inside B's kept region -> untouched
    assert (ax[3], ax[4]) == (0, 5000)
