"""f5q quality path: pre passthrough, bank decode, .lay column 7,
quality-aware consensus refine (reference f5q flow: pbh5tof5q ->
wtpre(f5q) -> wtlay col7 -> wtcns 5q refine, wtcns.c:938/380)."""

import numpy as np

from smartdenovo_tpu.data.readbank import (ReadBank, codes_to_seq,
                                           decode_f5q, encode_f5q,
                                           revcomp_f5q, seq_to_codes)


def _mk_tracks(rng, L):
    q = np.zeros((7, L), np.uint8)
    q[0] = rng.integers(10, 40, L)
    q[1] = rng.integers(5, 30, L)   # SubQV
    q[2] = rng.integers(5, 30, L)   # InsQV
    q[3] = rng.integers(5, 30, L)   # DelQV
    q[4] = rng.integers(10, 40, L)
    q[5] = rng.integers(0, 4, L)    # SubTag
    q[6] = rng.integers(0, 4, L)    # DelTag
    return q


def test_f5q_codec_roundtrip():
    rng = np.random.default_rng(11)
    q = _mk_tracks(rng, 57)
    assert np.array_equal(decode_f5q(encode_f5q(q), 57), q)
    assert np.array_equal(revcomp_f5q(revcomp_f5q(q)), q)
    # strand flip reverses positions and complements tags
    r = revcomp_f5q(q)
    assert np.array_equal(r[2], q[2][::-1])
    assert np.array_equal(r[5], 3 - q[5][::-1])


def test_pre_f5q_passthrough(tmp_path):
    from smartdenovo_tpu.pipeline.pre import run_pre

    rng = np.random.default_rng(12)
    L = 80
    seq = codes_to_seq(rng.integers(0, 4, L).astype(np.uint8))
    qual = encode_f5q(_mk_tracks(rng, L))
    src = tmp_path / "in.f5q"
    src.write_text(f"@m0/1/0_{L}\n{seq}\n+\n{qual}\n"
                   f"@m0/2/0_{L - 10}\n{seq[:L - 10]}\n+\n"
                   f"{encode_f5q(_mk_tracks(rng, L - 10))}\n")
    out = tmp_path / "out.f5q"
    n = run_pre([str(src)], str(out), min_len=10)
    assert n == 2
    lines = out.read_text().splitlines()
    assert lines[0].startswith("@pb")
    assert lines[3] == qual          # 7-track line preserved
    rb = ReadBank.from_fasta(str(out), use_qual=True)
    assert rb.quals is not None
    rid = rb.name2id["pb000000000000"]
    assert rb.quals[rid].shape == (7, L)


def test_lay_column7_roundtrip(tmp_path):
    """output_layout emits oriented tracks; parse_lay_file recovers them."""
    from smartdenovo_tpu.pipeline.cns import parse_lay_file

    rng = np.random.default_rng(13)
    L = 60
    codes = rng.integers(0, 4, L).astype(np.uint8)
    q = _mk_tracks(rng, L)
    # forward row as the writer produces it
    fwd = f"Y\trd0\t+\t0\t{L}\t{codes_to_seq(codes)}\t{encode_f5q(q)}\n"
    # reverse row: oriented sequence + oriented tracks
    from smartdenovo_tpu.data.readbank import revcomp_codes

    rev = (f"N\trd1\t-\t5\t{L}\t{codes_to_seq(revcomp_codes(codes))}"
           f"\t{encode_f5q(revcomp_f5q(q))}\n")
    p = tmp_path / "x.lay"
    p.write_text(f">utg0 length={L} nodes=2\n{fwd}{rev}")
    units = parse_lay_file(str(p))
    u = units[0]
    assert u.quals[0] is not None and u.quals[1] is not None
    assert np.array_equal(u.quals[0], q)
    assert np.array_equal(u.quals[1], revcomp_f5q(q))


def test_cns_uses_5q_refine(unitish=None):
    """Consensus with f5q tracks runs the quality-aware refine and still
    converges to the truth on simulated data."""
    from smartdenovo_tpu.pipeline.cns import CnsParams, LayUnitig, consensus_unitig
    from smartdenovo_tpu.utils.simulate import mutate_read, random_genome

    rng = np.random.default_rng(14)
    truth = random_genome(rng, 6000)
    reads, offs, bb, quals = [], [], [], []
    for start in range(0, 5200, 700):
        frag = truth[start: start + 2600]
        read = mutate_read(rng, frag, 0.1)
        reads.append(read)
        offs.append(start)
        bb.append(True)
        quals.append(_mk_tracks(rng, len(read)))
    unit = LayUnitig(name="u", reads=reads, offs=offs, backbone=bb,
                     quals=quals)
    cns = consensus_unitig(unit, CnsParams(n_iter=2, batch_reads=8))
    from difflib import SequenceMatcher

    ident = SequenceMatcher(None, codes_to_seq(cns), codes_to_seq(truth),
                            autojunk=False).ratio()
    assert ident > 0.93, f"5q consensus identity {ident:.4f}"
