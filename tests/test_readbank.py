import numpy as np

from smartdenovo_tpu.data.readbank import (
    PAD,
    ReadBank,
    codes_to_seq,
    revcomp_codes,
    seq_to_codes,
)
from smartdenovo_tpu.io.fasta import read_seqs, write_fasta
from smartdenovo_tpu.pipeline.pre import preprocess, well_key


def test_codes_roundtrip():
    s = "ACGTACGTTTGA"
    assert codes_to_seq(seq_to_codes(s)) == s


def test_revcomp():
    assert codes_to_seq(revcomp_codes(seq_to_codes("ACGT"))) == "ACGT"
    assert codes_to_seq(revcomp_codes(seq_to_codes("AACG"))) == "CGTT"


def test_readbank_sorting_and_batch():
    names = ["a", "b", "c"]
    seqs = [seq_to_codes("ACGT"), seq_to_codes("ACGTACGTAC"), seq_to_codes("TTTTTT")]
    rb = ReadBank(names, seqs)
    assert rb.names == ["b", "c", "a"]  # length desc
    assert list(rb.lengths) == [10, 6, 4]
    assert rb.get_seq(2) == "ACGT"
    batch, lens = rb.batch(np.array([0, 2]))
    assert batch.shape == (2, 10)
    assert batch[1, 4] == PAD
    assert list(lens) == [10, 4]


def test_fasta_roundtrip(tmp_path):
    p = tmp_path / "x.fa"
    with open(p, "w") as fh:
        write_fasta(fh, "r1 desc here", "ACGTACGT", width=4)
        write_fasta(fh, "r2", "GGGG")
    recs = list(read_seqs(str(p)))
    assert recs[0] == ("r1", " desc here", "ACGTACGT")
    assert recs[1] == ("r2", "", "GGGG")


def test_fastq(tmp_path):
    p = tmp_path / "x.fq"
    p.write_text("@r1\nACGT\n+\nIIII\n@r2 d\nGGCC\n+\n!!!!\n")
    recs = list(read_seqs(str(p)))
    assert recs == [("r1", "", "ACGT"), ("r2", " d", "GGCC")]


def test_well_key():
    assert well_key("m1/100/0_5000") == "m1/100"
    assert well_key("m1/100/5001_9000") == "m1/100"
    assert well_key("plainname") == "plainname"
    assert well_key("x_123") == "x_123"


def test_preprocess_longest_subread():
    recs = [
        ("m/1/0_10", "", "ACGTACGTAC"),
        ("m/1/10_14", "", "ACGT"),
        ("m/2/0_6", "", "GGGGGG"),
    ]
    out = list(preprocess(recs, prefix="pb"))
    assert out == [("pb000000000000", "ACGTACGTAC"), ("pb000000000001", "GGGGGG")]


def test_preprocess_jackknife():
    recs = [("a", "", "ACGT"), ("b", "", "ACGTACGTACGT")]
    out = list(preprocess(recs, min_len=10, longest=False))
    assert out == [("pb000000000000", "ACGTACGTACGT")]


def test_simulator_assembles_identity():
    from smartdenovo_tpu.utils.simulate import random_genome, simulate_reads

    rng = np.random.default_rng(0)
    g = random_genome(rng, 10000)
    names, seqs = simulate_reads(g, coverage=5, mean_len=3000, err=0.12, seed=2)
    assert sum(len(s) for s in seqs) >= 5 * 10000
    rb = ReadBank(names, seqs)
    assert len(rb) == len(names)
    assert all(rb.lengths[i] >= rb.lengths[i + 1] for i in range(len(rb) - 1))
