"""sseg streaming segment-reduce kernel vs a numpy oracle (interpret)."""

import numpy as np
import pytest

from smartdenovo_tpu.ops import sseg


@pytest.fixture(autouse=True)
def interpret_mode():
    old = sseg.INTERPRET
    sseg.INTERPRET = True
    yield
    sseg.INTERPRET = old


OPS = ("sum", "min", "min", "max", "max", "first", "first", "first")


def oracle(seg_new, v8):
    N = v8.shape[1]
    recs = []
    cur = None
    for j in range(N):
        if seg_new[j] and j > 0:
            recs.append(cur)
            cur = None
        if cur is None:
            cur = v8[:, j].astype(np.int64).copy()
        else:
            cur[0] += v8[0, j]
            cur[1] = min(cur[1], v8[1, j])
            cur[2] = min(cur[2], v8[2, j])
            cur[3] = max(cur[3], v8[3, j])
            cur[4] = max(cur[4], v8[4, j])
            for r in (5, 6, 7):
                if cur[r] == sseg.I32_MAX:
                    cur[r] = v8[r, j]
    recs.append(cur)
    return np.stack(recs, axis=1)


@pytest.mark.parametrize("seed,T,nt", [(1, 256, 3), (2, 256, 1), (3, 512, 2)])
def test_seg_reduce_matches_oracle(seed, T, nt):
    rng = np.random.default_rng(seed)
    N = T * nt
    seg_new = (rng.random(N) < 0.02).astype(np.int32)
    seg_new[0] = 1
    # a long run crossing tile boundaries + an empty-ish tail
    seg_new[N // 2: N // 2 + T + 7] = 0
    v8 = rng.integers(0, 1 << 17, (8, N)).astype(np.int32)
    v8[0] = rng.integers(-100, 1 << 10, N)          # sum lane, signed
    v8[5:7] = rng.integers(0, 1 << 27, (2, N))      # wide "first" payloads

    out, cnt = sseg.seg_reduce_compact(
        seg_new, v8, ops=OPS, out_budget=max(T, 1024), tile=T)
    exp = oracle(seg_new, v8)
    n = exp.shape[1]
    assert int(cnt) == n
    got = np.asarray(out)[:, :n]
    assert np.array_equal(got, exp.astype(np.int32))


def test_first_lane_neutral_and_overflow():
    T = 256
    N = 2 * T
    seg_new = np.zeros(N, np.int32)
    seg_new[[0, 5, 100, 300]] = 1
    v8 = np.zeros((8, N), np.int32)
    v8[1:3] = sseg.I32_MAX        # min lanes neutralized (all dead)
    v8[3:5] = sseg.I32_MIN1
    v8[5] = sseg.I32_MAX          # first lane neutralized everywhere
    out, cnt = sseg.seg_reduce_compact(
        seg_new, v8, ops=OPS, out_budget=1024, tile=T)
    assert int(cnt) == 4
    got = np.asarray(out)
    assert (got[5, :4] == sseg.I32_MAX).all()   # first stays neutral
    assert (got[0, :4] == 0).all()


@pytest.mark.slow
def test_dm_segk_pallas_matches_fill():
    """The streaming segment-reduce is an exact replacement: the
    overlapper's output must be identical record-for-record under both
    strategies."""
    from smartdenovo_tpu.data.readbank import ReadBank
    from smartdenovo_tpu.pipeline.zmo import ZmoParams, overlap_dmo
    from smartdenovo_tpu.utils.simulate import random_genome, simulate_reads

    rng = np.random.default_rng(79)
    genome = random_genome(rng, 25_000)
    names, seqs = simulate_reads(genome, coverage=12, mean_len=3000,
                                 err=0.12, seed=80)
    rb = ReadBank(names, seqs)
    a = overlap_dmo(rb, ZmoParams.dmo(ncand=64, batch_q=8, matcher="join",
                                      phase3="fill", segk="fill"),
                    progress=False)
    b = overlap_dmo(rb, ZmoParams.dmo(ncand=64, batch_q=8, matcher="join",
                                      phase3="fill", segk="pallas"),
                    progress=False)
    assert len(a) == len(b) and len(a) > 0
    for x, y in zip(a, b):
        assert x == y
