"""Utility tool tests: n50, fq2fa, pairaln, cyc, idx snapshot, CLI."""

import numpy as np

from smartdenovo_tpu.utils.stats import n50_stats


def test_n50():
    st = n50_stats([100, 200, 300, 400])
    assert st["total"] == 1000
    assert st["max"] == 400
    assert st["N50"] == 300  # 400+300 >= 500


def test_cli_pre_and_n50(tmp_path, capsys):
    from smartdenovo_tpu.cli import main

    fa = tmp_path / "in.fa"
    fa.write_text(">r1/1/0_10\nACGTACGTACGTACGTACGT\n>r1/1/10_14\nACGT\n>r2\nGGGGCCCCGGGG\n")
    out = tmp_path / "out.fa"
    assert main(["pre", str(fa), "-o", str(out)]) == 0
    txt = out.read_text()
    assert txt.count(">") == 2
    assert main(["n50", str(out)]) == 0
    cap = capsys.readouterr()
    assert "N50" in cap.out


def test_pairaln(tmp_path, capsys):
    from smartdenovo_tpu.cli import main
    from smartdenovo_tpu.utils.simulate import mutate_read
    from smartdenovo_tpu.data.readbank import codes_to_seq

    rng = np.random.default_rng(7)
    s = rng.integers(0, 4, 400).astype(np.uint8)
    t = mutate_read(rng, s, 0.1)
    fa = tmp_path / "p.fa"
    fa.write_text(f">a\n{codes_to_seq(s)}\n>b\n{codes_to_seq(t)}\n")
    assert main(["pairaln", str(fa)]) == 0
    cap = capsys.readouterr()
    cols = cap.out.strip().split("\t")
    assert cols[0] == "a" and cols[2] == "b"
    assert float(cols[6]) > 0.7


def test_cyc_detects_palindrome(tmp_path):
    from smartdenovo_tpu.cli import main
    from smartdenovo_tpu.data.readbank import codes_to_seq, revcomp_codes

    rng = np.random.default_rng(8)
    half = rng.integers(0, 4, 600).astype(np.uint8)
    palindrome = np.concatenate([half, revcomp_codes(half)])
    normal = rng.integers(0, 4, 1200).astype(np.uint8)
    fa = tmp_path / "c.fa"
    fa.write_text(f">pal\n{codes_to_seq(palindrome)}\n>norm\n{codes_to_seq(normal)}\n")
    out = tmp_path / "c.obt"
    assert main(["cyc", str(fa), "-o", str(out)]) == 0
    rows = {l.split("\t")[0]: l.split("\t") for l in out.read_text().splitlines()}
    assert int(rows["pal"][2]) == 600       # clipped to the longer half
    assert int(rows["norm"][2]) == 1200     # untouched


def test_cyc_offcenter_fold(tmp_path):
    """The fold point comes from the alignment, not ln//2 (wtcyc.c:86-90)."""
    from smartdenovo_tpu.cli import main
    from smartdenovo_tpu.data.readbank import codes_to_seq, revcomp_codes

    rng = np.random.default_rng(9)
    arm = rng.integers(0, 4, 800).astype(np.uint8)
    read = np.concatenate([arm, revcomp_codes(arm[500:])])  # fold at 800
    fa = tmp_path / "c2.fa"
    fa.write_text(f">off\n{codes_to_seq(read)}\n")
    out = tmp_path / "c2.obt"
    assert main(["cyc", str(fa), "-o", str(out)]) == 0
    name, off, ln, total = out.read_text().split()
    # keeps [0, bp) with bp ~ 800 (the true fold), not ln//2 = 550
    assert int(off) == 0
    assert 750 <= int(ln) <= 850, ln


def test_idx_snapshot_roundtrip(tmp_path):
    from smartdenovo_tpu.data.readbank import ReadBank
    from smartdenovo_tpu.ops.index import build_kmer_index, build_zmer_index
    from smartdenovo_tpu.pipeline.idx import load_indexes, save_indexes
    from smartdenovo_tpu.utils.simulate import random_genome, simulate_reads

    rng = np.random.default_rng(9)
    g = random_genome(rng, 8000)
    names, seqs = simulate_reads(g, coverage=4, mean_len=2000, err=0.1, seed=10)
    rb = ReadBank(names, seqs)
    kidx = build_kmer_index(rb)
    zidx = build_zmer_index(rb)
    path = str(tmp_path / "idx.npz")
    save_indexes(path, kidx, zidx)
    k2, z2 = load_indexes(path)
    np.testing.assert_array_equal(np.asarray(kidx.kmers), np.asarray(k2.kmers))
    np.testing.assert_array_equal(np.asarray(zidx.post_off), np.asarray(z2.post_off))
    assert k2.max_freq == kidx.max_freq and z2.zsize == zidx.zsize


def test_dif_variants(tmp_path, capsys):
    from smartdenovo_tpu.cli import main
    from smartdenovo_tpu.data.readbank import codes_to_seq

    rng = np.random.default_rng(12)
    ref = rng.integers(0, 4, 300).astype(np.uint8)
    alt = ref.copy()
    alt[150] = (alt[150] + 1) % 4
    fa = tmp_path / "d.fa"
    fa.write_text(f">ref\n{codes_to_seq(ref)}\n>alt\n{codes_to_seq(alt)}\n")
    assert main(["dif", str(fa)]) == 0
    cap = capsys.readouterr()
    rows = [l.split("\t") for l in cap.out.strip().splitlines()]
    assert any(r[1] == "150" and r[2] == "S" for r in rows), rows


def test_upgma_clusters():
    from smartdenovo_tpu.utils.upgma import cut_clusters, upgma

    # two tight clusters {0,1} and {2,3}, far apart
    d = np.array([
        [0.0, 0.1, 0.9, 0.9],
        [0.1, 0.0, 0.9, 0.9],
        [0.9, 0.9, 0.0, 0.1],
        [0.9, 0.9, 0.1, 0.0],
    ])
    merges = upgma(d)
    assert len(merges) == 3
    labels = cut_clusters(merges, 4, height=0.5)
    assert labels[0] == labels[1]
    assert labels[2] == labels[3]
    assert labels[0] != labels[2]


def test_dbm_fasta_roundtrip(tmp_path):
    """dbm_index_fa / dbm_read_fa: strand + subrange tag semantics
    (reference dbm_index_fa.pl / dbm_read_fa.pl)."""
    import io

    from smartdenovo_tpu.utils.dbmfa import dbm_index_fa, dbm_read_fa

    fa = tmp_path / "r.fa"
    fa.write_text(">a desc\nACGTACGTAA\n>b\nGGGCCC\n")
    db = dbm_index_fa(str(fa))
    out = io.StringIO()
    dbm_read_fa(db, ["a", "b[-]", "a[+:2,5]"], out=out)
    recs = out.getvalue().strip().split("\n")
    assert recs[0] == ">a" and recs[1] == "ACGTACGTAA"
    assert recs[2] == ">b_R_1_6" and recs[3] == "GGGCCC"  # revcomp of GGGCCC
    assert recs[4] == ">a_F_2_5" and recs[5] == "CGTA"


def test_pbcluster_haplo_majority():
    """pbcluster_haplo: the consensus converges to the majority haplotype."""
    import io

    from smartdenovo_tpu.utils.dbmfa import pbcluster_haplo

    rows = [("core", "ACGT-ACGT"),
            ("r1", "ACGT-ACGT"),
            ("r2", "ACGT-ACGT"),
            ("r3", "ATGT-ACGT"),
            ("r4", "ACGT-ACCT")]
    out = io.StringIO()
    ref = pbcluster_haplo("core", rows, out=out)
    assert ref == "ACGT-ACGT"
    assert "REF[5]" in out.getvalue()
