"""DBG correction (wtcorr) tests."""

import numpy as np

from smartdenovo_tpu.data.readbank import ReadBank, codes_to_seq
from smartdenovo_tpu.pipeline.corr import CorrParams, run_corr, join_fragments
from smartdenovo_tpu.utils.simulate import mutate_read, random_genome


def _identity(x, y):
    from difflib import SequenceMatcher

    return SequenceMatcher(None, codes_to_seq(x), codes_to_seq(y), autojunk=False).ratio()


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


def test_join_fragments():
    a = np.array([0, 1, 2, 3] * 10, np.uint8)
    res = join_fragments([("r", a[:24], 0), ("r", a[16:], 16)])
    assert len(res) == 1
    name, joined = res[0]
    np.testing.assert_array_equal(joined, a)
