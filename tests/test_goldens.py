"""Golden parity vs committed reference-binary outputs (always runs).

tests/goldens/ holds the deterministic smoke read set plus the REFERENCE
binaries' outputs on it (single-threaded, canonical dmo flags — see
scripts/make_goldens.py).  These fixtures are committed, so a fresh
checkout asserts parity without rebuilding the reference or refetching
data (VERDICT r2 item 7).

Stage contracts checked:
  clp: our keep/drop + clip windows on the reference .ovl, exact
       (reference wtclp.c:235-896 semantics)
  lay: our StringGraph/BOG layout on the reference .ovl/.obt — unitig
       sequence bit-identical (wtlay.c:2524-2838)
  cns: our consensus on the reference .lay vs the binary's .cns (slow)
  zmo: our overlapper's pair set vs the binary's (slow; CPU run)
"""

import os

import pytest

GOLD = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")


def g(name):
    return os.path.join(GOLD, name)


def load_obt(path):
    m = {}
    for line in open(path):
        c = line.split()
        if len(c) >= 3:
            m[c[0]] = (int(c[1]), int(c[2]))
    return m


def ovl_records(path):
    for line in open(path):
        c = line.rstrip("\n").split("\t")
        if len(c) < 12 or line.startswith("#"):
            continue
        yield (c[0], int(c[1] == "-"), int(c[2]), int(c[3]), int(c[4]),
               c[5], int(c[6] == "-"), int(c[7]), int(c[8]), int(c[9]),
               int(c[10]), float(c[11]))


def ovl_pairs(path, col1=0, col2=5):
    pairs = set()
    for line in open(path):
        c = line.split("\t")
        if len(c) > col2:
            pairs.add(frozenset((c[col1], c[col2])))
    return pairs


def fa_seqs(path):
    seqs, name, buf = {}, None, []
    for line in open(path):
        if line.startswith(">"):
            if name is not None:
                seqs[name] = "".join(buf)
            name, buf = line[1:].split()[0], []
        else:
            buf.append(line.strip())
    if name is not None:
        seqs[name] = "".join(buf)
    return seqs


def test_clp_golden_cross():
    """Our wtclp on the reference .ovl == the binary's .obt, exactly."""
    from smartdenovo_tpu.graph.clip import ClpParams, run_clp

    p = ClpParams(min_crs_dep=3, bin_size=300, min_sm=0.1, whole=True,
                  block_test=True)
    ours = run_clp(ovl_records(g("smoke.ref.ovl")), p)
    ref = load_obt(g("smoke.ref.obt"))
    both = set(ref) & set(ours)
    assert len(both) == len(ref) == len(ours)
    mismatch = [n for n in both if (ours[n][0], ours[n][1]) != ref[n]]
    assert not mismatch, f"{len(mismatch)} clip mismatches, e.g. {mismatch[:5]}"


def test_lay_golden_cross():
    """Our layout on the reference .ovl/.obt: bit-identical unitig seq."""
    from smartdenovo_tpu.data.readbank import ReadBank
    from smartdenovo_tpu.graph.clip import read_clp
    from smartdenovo_tpu.graph.stringgraph import LayParams, run_lay
    from smartdenovo_tpu.pipeline.zmo import Overlap

    rb = ReadBank.from_fasta(g("smoke.fa"), use_qual=True)
    clips = read_clp(g("smoke.ref.obt"))
    drop = {n for n, (o, ln) in clips.items() if ln <= 0}
    names = [n for n in rb.names if n not in drop]
    rb = ReadBank(names, [rb.get(rb.name2id[n]).copy() for n in names])
    ovls = []
    for c in (l.rstrip("\n").split("\t") for l in open(g("smoke.ref.ovl"))):
        if len(c) < 16:
            continue
        i1, i2 = rb.name2id.get(c[0]), rb.name2id.get(c[5])
        if i1 is None or i2 is None:
            continue
        ovls.append(Overlap(
            rid1=i1, dir1=int(c[1] == "-"), beg1=int(c[3]), end1=int(c[4]),
            rid2=i2, dir2=int(c[6] == "-"), beg2=int(c[8]), end2=int(c[9]),
            score=int(c[10]), identity=float(c[11]), mat=int(c[12]),
            mis=int(c[13]), ins=int(c[14]), dl=int(c[15]), aln=0))
    p = LayParams.dmo(min_score=200, min_id=0.1, margin=300,
                      best_score_cutoff=0.95, edgecov_cutoff=1)
    graph = run_lay(rb, ovls, p)
    out = "/tmp/golden_lay"
    with open(out, "w") as lay_fh, open(out + ".utg", "w") as utg_fh, \
         open(out + ".dup", "w") as dl, open(out + ".utg.dup", "w") as du:
        graph.output_layout(lay_fh, utg_fh, dl, du, utg_sm=p.utg_sm)
    ref = fa_seqs(g("smoke.ref.lay.utg"))
    ours = fa_seqs(out + ".utg")
    assert sorted(len(s) for s in ours.values()) == \
        sorted(len(s) for s in ref.values())
    assert sorted(ours.values()) == sorted(ref.values()), \
        "unitig sequences differ from the reference binary's"


def _identity(a: str, b: str) -> float:
    """Chunk-anchored identity (same method as scripts/parity_ecoli.py)."""
    import difflib

    sm = difflib.SequenceMatcher(None, a, b, autojunk=False)
    matched = sum(bl.size for bl in sm.get_matching_blocks())
    return matched / max(len(a), len(b), 1)


@pytest.mark.slow
def test_cns_golden_cross():
    """Our consensus on the reference .lay vs the binary's .cns.

    Measured state (round 5, TPU + CPU): utg0 identity 0.99897 with 65
    edit ops, ~80% in homopolymer context and balanced ins/del.  Both
    consensi are statistically identical against the simulation TRUTH
    (ours ~1297 vs the binary's ~1288 error bases in 46.6 kb,
    scripts/cns_truth.py) — the residual ours-vs-binary divergence is
    coverage-tie noise between equally-scoring DAG paths, not quality.
    The bar is set at 0.9985: tight enough to catch any semantic
    regression (the pre-round-5 polish-order bug sat at 0.997), loose
    enough not to demand replication of the binary's quicksort tie
    permutations."""
    from smartdenovo_tpu.data.readbank import codes_to_seq
    from smartdenovo_tpu.pipeline.cns import CnsParams, parse_lay_file, run_cns

    units = parse_lay_file(g("smoke.ref.lay"))
    res = run_cns(units, CnsParams(n_iter=6))
    ref = fa_seqs(g("smoke.ref.cns"))
    ours = {name: codes_to_seq(codes) for name, codes in res}
    assert set(ours) == set(ref)
    for name in ref:
        ident = _identity(ours[name], ref[name])
        assert ident >= 0.9985, f"{name}: consensus identity {ident:.4f}"


@pytest.mark.slow
def test_zmo_golden_pairs():
    """Our overlapper's pair set vs the reference binary's (CPU run)."""
    from smartdenovo_tpu.data.readbank import ReadBank
    from smartdenovo_tpu.pipeline.zmo import ZmoParams, overlap_dmo

    rb = ReadBank.from_fasta(g("smoke.fa"))
    ovls = overlap_dmo(rb, ZmoParams.dmo())
    ours = {frozenset((rb.names[o.rid1], rb.names[o.rid2])) for o in ovls}
    ref = ovl_pairs(g("smoke.ref.ovl"))
    recall = len(ours & ref) / max(len(ref), 1)
    precision = len(ours & ref) / max(len(ours), 1)
    assert recall >= 0.99, f"pair recall {recall:.4f}"
    assert precision >= 0.99, f"pair precision {precision:.4f}"
