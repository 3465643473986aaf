"""Join post-sort emitter kernel vs a numpy oracle (interpret mode)."""

import numpy as np
import pytest

from smartdenovo_tpu.ops import jpost


@pytest.fixture(autouse=True)
def interpret_mode():
    old = jpost.INTERPRET
    jpost.INTERPRET = True
    yield
    jpost.INTERPRET = old


I32_MAX = (1 << 31) - 1


def oracle(key, pay, aux, mpr):
    """Reference semantics = the XLA fill path's scan family."""
    n = len(key)
    svalid = key != I32_MAX
    tag0 = svalid & ((key & 1) == 0)
    tag1 = svalid & ((key & 1) == 1)
    grp = key >> 1
    recs = []
    pre0 = 0
    rs = 0
    ost2 = 0
    prev_grp = None
    for i in range(n):
        if prev_grp is None or grp[i] != prev_grp:
            rs = pre0
        prev_grp = grp[i]
        if tag1[i]:
            qcnt = pre0 - rs
            if 0 < qcnt < mpr:
                recs.append((qcnt, int(pay[i]), int(aux[i]), rs - ost2))
                ost2 += qcnt
        if tag0[i]:
            pre0 += 1
    return recs, ost2


def mkstream(rng, n, nq_frac=0.2, mpr=16):
    """Random sorted join stream: runs of (grp) with query entries first."""
    n_grp = max(2, n // 9)
    gids = np.sort(rng.integers(0, 1 << 20, n_grp))
    key, pay, aux = [], [], []
    for g in gids:
        nq = int(rng.integers(0, 5))
        nc = int(rng.integers(0, 5))
        for _ in range(nq):
            key.append((int(g) << 1))
            pay.append(int(rng.integers(-(1 << 30), 1 << 30)))
            aux.append(0)
        for _ in range(nc):
            key.append((int(g) << 1) | 1)
            pay.append(int(rng.integers(-(1 << 30), 1 << 30)))
            aux.append(int(rng.integers(0, 1 << 20)))
        if len(key) >= n:
            break
    key = key[:n]
    pay = pay[:n]
    aux = aux[:n]
    pad = n - len(key)
    key += [I32_MAX] * pad
    pay += [0] * pad
    aux += [0] * pad
    return (np.array(key, np.int32), np.array(pay, np.int32),
            np.array(aux, np.int32))


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_join_emitters_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    N = 2048
    T = 256
    mpr = 16
    key, pay, aux = mkstream(rng, N, mpr=mpr)
    recs, total = oracle(key, pay, aux, mpr)
    out, nem, tot = jpost.join_emitters(
        key, pay, aux, max_per_read=mpr, out_budget=1024, tile=T)
    out = np.asarray(out)
    assert int(nem) == len(recs)
    assert int(tot) == total
    for k, (c, p, a, b) in enumerate(recs):
        assert out[0, k] == c, (k, "cnt")
        assert out[1, k] == p, (k, "pay")
        assert out[2, k] == a, (k, "aux")
        assert out[3, k] == b, (k, "base")


def test_join_emitters_cross_tile_runs():
    """Runs spanning tile boundaries keep correct rs / qcnt / base."""
    T = 256
    N = 1024
    key = np.full(N, I32_MAX, np.int32)
    pay = np.zeros(N, np.int32)
    aux = np.zeros(N, np.int32)
    # a filler group occupying tile 0 up to position 250 (live prefix —
    # the real stream is sorted, dead entries only at the end)
    key[0:250] = 2 << 1
    # one giant group straddling tiles 0-2: 3 query entries at the end
    # of tile 0, then 450 contiguous candidate entries
    g = 7
    key[250:253] = g << 1            # 3 query occurrences
    for j, pos in enumerate(range(253, 703)):
        key[pos] = (g << 1) | 1
        pay[pos] = 100 + j
        aux[pos] = 200 + j
    # second group entirely inside tile 3
    g2 = 9
    key[703:705] = g2 << 1
    key[705] = (g2 << 1) | 1
    pay[705] = 42
    recs, total = oracle(key, pay, aux, 16)
    out, nem, tot = jpost.join_emitters(
        key, pay, aux, max_per_read=16, out_budget=1024, tile=T)
    out = np.asarray(out)
    assert int(nem) == len(recs) == 451
    assert int(tot) == total == 450 * 3 + 2
    for k, (c, p, a, b) in enumerate(recs):
        assert (out[0, k], out[1, k], out[2, k], out[3, k]) == (c, p, a, b)


def test_join_emitters_mpr_cap():
    """Groups with >= max_per_read query occurrences emit nothing."""
    N = 512
    key = np.full(N, I32_MAX, np.int32)
    pay = np.zeros(N, np.int32)
    aux = np.zeros(N, np.int32)
    key[0:4] = 3 << 1                 # 4 occurrences, mpr=4 -> dropped
    key[4] = (3 << 1) | 1
    key[5:7] = 5 << 1                 # 2 occurrences -> kept
    key[7] = (5 << 1) | 1
    pay[7] = 77
    out, nem, tot = jpost.join_emitters(
        key, pay, aux, max_per_read=4, out_budget=384, tile=256)
    assert int(nem) == 1 and int(tot) == 2
    assert np.asarray(out)[1, 0] == 77
