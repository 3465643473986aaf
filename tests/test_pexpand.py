"""Pallas emission kernel vs a numpy oracle (interpret mode on CPU)."""

import numpy as np
import pytest

from smartdenovo_tpu.ops import pexpand


@pytest.fixture(autouse=True)
def interpret_mode():
    from smartdenovo_tpu.ops import jpost, sseg

    old = pexpand.INTERPRET
    olds = sseg.INTERPRET
    oldj = jpost.INTERPRET
    pexpand.INTERPRET = True
    sseg.INTERPRET = True
    jpost.INTERPRET = True    # phase3="pallas" extracts emitters via jpost
    yield
    pexpand.INTERPRET = old
    sseg.INTERPRET = olds
    jpost.INTERPRET = oldj


def oracle(cnt, pay, aux, base, pb):
    cg = np.zeros(pb, np.int64)
    av = np.zeros(pb, np.int64)
    bv = np.zeros(pb, np.int64)
    pos = 0
    for i in range(len(cnt)):
        for _ in range(int(cnt[i])):
            if pos < pb:
                cg[pos], av[pos], bv[pos] = pay[i], aux[i], base[i]
            pos += 1
    return cg, av, bv, pos


@pytest.mark.slow
def test_join_phase3_pallas_matches_fill():
    """The streaming kernel is an exact replacement: the join matcher's
    overlap output must be identical record-for-record under both
    phase-3 strategies."""
    from smartdenovo_tpu.data.readbank import ReadBank
    from smartdenovo_tpu.pipeline.zmo import ZmoParams, overlap_dmo
    from smartdenovo_tpu.utils.simulate import random_genome, simulate_reads

    rng = np.random.default_rng(77)
    genome = random_genome(rng, 25_000)
    names, seqs = simulate_reads(genome, coverage=12, mean_len=3000,
                                 err=0.12, seed=78)
    rb = ReadBank(names, seqs)
    a = overlap_dmo(rb, ZmoParams.dmo(ncand=64, batch_q=8, matcher="join",
                                      phase3="fill"), progress=False)
    b = overlap_dmo(rb, ZmoParams.dmo(ncand=64, batch_q=8, matcher="join",
                                      phase3="pallas"), progress=False)
    assert len(a) == len(b) and len(a) > 0
    for x, y in zip(a, b):
        assert x == y


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_expand_emit_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    T = 128
    NE = 1024
    pb = 2048
    # dense emitter prefix then zero tail (as after the compaction sort)
    ne = int(rng.integers(NE // 4, NE // 2))
    cnt = np.zeros(NE, np.int32)
    cnt[:ne] = rng.integers(1, 15, ne)
    # truncate the prefix so the total stays within the budget (the
    # kernel contract: strictly-positive dense prefix, zero tail)
    tot = np.cumsum(cnt)
    cnt[tot > pb - 16] = 0
    first_zero = int(np.argmax(cnt == 0)) if (cnt == 0).any() else NE
    cnt[first_zero:] = 0
    pay = rng.integers(0, 1 << 30, NE).astype(np.int32)
    aux = rng.integers(0, 1 << 17, NE).astype(np.int32)
    base = rng.integers(-(1 << 24), 1 << 24, NE).astype(np.int32)

    cg, av, bv = pexpand.expand_emit(cnt, pay, aux, base,
                                     pair_budget=pb, tile=T)
    ocg, oav, obv, total = oracle(cnt, pay, aux, base, pb)
    m = min(total, pb)
    assert np.array_equal(np.asarray(cg)[:m], ocg[:m])
    assert np.array_equal(np.asarray(av)[:m], oav[:m])
    assert np.array_equal(np.asarray(bv)[:m], obv[:m])
