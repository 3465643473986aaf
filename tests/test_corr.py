"""DBG correction (wtcorr) tests."""

import numpy as np
import pytest

from smartdenovo_tpu.data.readbank import ReadBank, codes_to_seq
from smartdenovo_tpu.pipeline.corr import CorrParams, run_corr, join_fragments
from smartdenovo_tpu.utils.simulate import mutate_read, random_genome


def _identity(x, y):
    from difflib import SequenceMatcher

    return SequenceMatcher(None, codes_to_seq(x), codes_to_seq(y), autojunk=False).ratio()


@pytest.mark.slow
def test_dbg_correction_improves_reads():
    rng = np.random.default_rng(61)
    genome = random_genome(rng, 20000)
    # accurate short reads, 30x
    snames, sseqs = [], []
    i = 0
    for _ in range(20000 * 30 // 150):
        start = int(rng.integers(0, 20000 - 150))
        frag = mutate_read(rng, genome[start : start + 150], 0.002)
        snames.append(f"s{i}")
        sseqs.append(frag)
        i += 1
    short_rb = ReadBank(snames, sseqs, sort=False)
    # noisy long reads
    lnames, lseqs, truths = [], [], []
    for j in range(5):
        start = int(rng.integers(0, 20000 - 6000))
        truth = genome[start : start + 6000]
        lnames.append(f"L{j}")
        lseqs.append(mutate_read(rng, truth, 0.12))
        truths.append(truth)
    long_rb = ReadBank(lnames, lseqs, sort=False)
    res = dict(run_corr(long_rb, short_rb, CorrParams(ksize=21, min_cov=3)))
    improved = 0
    for j in range(5):
        before = _identity(long_rb.get(long_rb.name2id[f"L{j}"]), truths[j])
        after = _identity(res[f"L{j}"], truths[j])
        if after > before + 0.02:
            improved += 1
    assert improved >= 4, f"only {improved}/5 reads improved"
    # at least one should be highly accurate now
    best = max(_identity(res[f"L{j}"], truths[j]) for j in range(5))
    assert best > 0.97, best


def test_bigk_verifier_counts_and_rejects():
    """Counting bloom (wtcorr -K role): true windows verify, windows with
    novel K-mers fail."""
    import ctypes

    from smartdenovo_tpu.pipeline.corr import DbgCorrector, build_dbg_kmers
    from smartdenovo_tpu.utils.simulate import random_genome

    rng = np.random.default_rng(63)
    g = random_genome(rng, 5000)
    snames, sseqs = [], []
    for i in range(0, 5000 - 150, 20):
        snames.append(f"s{i}")
        sseqs.append(g[i : i + 150].copy())
    srb = ReadBank(snames, sseqs, sort=False)
    km, ct = build_dbg_kmers(srb, 21)
    corr = DbgCorrector(km, ct, 21, min_cov=2)
    corr.attach_verifier(srb, 31, min_cov=1)
    lib = corr._lib
    lib.cbf_verify.restype = ctypes.c_double
    lib.cbf_verify.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
                               ctypes.c_int, ctypes.c_uint32]

    def frac(win):
        win = np.ascontiguousarray(win, np.uint8)
        return lib.cbf_verify(
            corr._cbf, win.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            len(win), 1)

    true_win = g[1000:1100]
    assert frac(true_win) == 1.0
    bad = true_win.copy()
    bad[50] = (bad[50] + 2) % 4    # novel kmers around the corruption
    assert frac(bad) < 0.8


def test_join_fragments():
    a = np.array([0, 1, 2, 3] * 10, np.uint8)
    res = join_fragments([("r", a[:24], 0), ("r", a[16:], 16)])
    assert len(res) == 1
    name, joined = res[0]
    np.testing.assert_array_equal(joined, a)


def test_join_fragments_dag_gap_fill():
    """wtjnt overlap-guided DAG gap fill (wtjnt.c:284): the raw noisy gap
    between corrected fragments is replaced by a consensus of overlapping
    reads and lands closer to the truth."""
    from smartdenovo_tpu.pipeline.corr import join_fragments_dag
    from smartdenovo_tpu.pipeline.zmo import Overlap
    from smartdenovo_tpu.utils.simulate import mutate_read, random_genome

    rng = np.random.default_rng(64)
    genome = random_genome(rng, 9000)
    truth = genome[2000:7000]                  # the parent's true window
    mid0, mid1 = 2200, 2800
    # parent built per segment so the fragment boundaries' RAW parent
    # coordinates are known exactly (like wtcorr's tracked pbx/pby)
    p1 = mutate_read(rng, truth[:mid0], 0.13)
    pg = mutate_read(rng, truth[mid0:mid1], 0.13)
    p2 = mutate_read(rng, truth[mid1:], 0.13)
    parent = np.concatenate([p1, pg, p2])
    names = ["P"]
    seqs = [parent]
    ovls = []
    # supporting reads covering the whole parent (same window, noisy)
    for j in range(8):
        sup = mutate_read(rng, truth, 0.13)
        names.append(f"S{j}")
        seqs.append(sup)
        ovls.append(Overlap(
            rid1=0, dir1=0, beg1=0, end1=len(parent),
            rid2=j + 1, dir2=0, beg2=0, end2=len(sup),
            score=1000, identity=0.8, mat=1000, mis=0, ins=0, dl=0,
            aln=len(parent)))
    rb = ReadBank(names, seqs, sort=False)
    # fragments: perfectly corrected flanks; raw gap between them
    f1 = truth[:mid0].copy()
    f2 = truth[mid1:].copy()
    frags = [("P", f1, 0, len(p1)),
             ("P", f2, len(p1) + len(pg), len(parent))]
    res = dict(join_fragments_dag(rb, frags, ovls, min_support=2))
    joined = res["P"]
    raw_gap_id = _identity(pg, truth[mid0:mid1])
    got_gap = joined[mid0: len(joined) - (len(truth) - mid1)]
    fill_id = _identity(got_gap, truth[mid0:mid1])
    assert fill_id > raw_gap_id + 0.05, f"{fill_id:.3f} vs raw {raw_gap_id:.3f}"
    assert fill_id > 0.95, fill_id
