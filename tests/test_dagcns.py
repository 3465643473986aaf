"""Unit tests for the native DAG consensus engine."""

import numpy as np
import pytest

from smartdenovo_tpu.data.readbank import seq_to_codes, codes_to_seq
from smartdenovo_tpu.utils.native import DagCns


def _aln_from_strings(s0: str, s1: str):
    m = {"A": 0, "C": 1, "G": 2, "T": 3, "-": 4}
    return (np.array([m[c] for c in s0], np.uint8),
            np.array([m[c] for c in s1], np.uint8))


def test_backbone_only_consensus():
    g = DagCns()
    bb = seq_to_codes("ACGTACGTAC")
    g.set_backbone(bb)
    g.merge_nodes()
    cns, mp, score = g.consensus()
    assert codes_to_seq(cns) == "ACGTACGTAC"


def test_majority_substitution_corrected():
    # backbone has an error at pos 4 (G instead of T); 4 reads say T
    g = DagCns()
    bb = seq_to_codes("ACGTGACGTA")
    truth = "ACGTTACGTA"
    g.set_backbone(bb)
    for _ in range(4):
        a0, a1 = _aln_from_strings("ACGTG-ACGTA", "ACGT-TACGTA")
        g.add_alignment(0, 10, a0, a1)
    g.merge_nodes()
    cns, mp, score = g.consensus()
    assert codes_to_seq(cns) == truth


def test_majority_deletion_corrected():
    # backbone has a spurious inserted base at pos 5; reads skip it
    g = DagCns()
    g.set_backbone(seq_to_codes("ACGTAGCGTA"))
    for _ in range(4):
        a0, a1 = _aln_from_strings("ACGTAGCGTA", "ACGTA-CGTA")
        g.add_alignment(0, 10, a0, a1)
    g.merge_nodes()
    cns, mp, score = g.consensus()
    assert codes_to_seq(cns) == "ACGTACGTA"


def test_majority_insertion_added():
    # all reads insert a T after pos 4
    g = DagCns()
    g.set_backbone(seq_to_codes("ACGTACGTA"))
    for _ in range(4):
        a0, a1 = _aln_from_strings("ACGTA-CGTA"[:10], "ACGTATCGTA")
        g.add_alignment(0, 9, a0, a1)
    g.merge_nodes()
    cns, mp, score = g.consensus()
    assert codes_to_seq(cns) == "ACGTATCGTA"


def test_noisy_reads_converge():
    """Full loop: noisy reads + true backbone -> consensus ~= truth."""
    from smartdenovo_tpu.utils.simulate import mutate_read
    from smartdenovo_tpu.ops.swdp import batch_global_align, traceback_batch, align_strings
    import jax.numpy as jnp

    rng = np.random.default_rng(44)
    truth = rng.integers(0, 4, 200).astype(np.uint8)
    backbone = mutate_read(rng, truth, 0.08)
    reads = [mutate_read(rng, truth, 0.10) for _ in range(12)]
    L = 256
    cns = backbone
    for it in range(3):
        g = DagCns()
        g.set_backbone(cns)
        B = len(reads)
        a = np.full((B, L), 4, np.uint8)
        b = np.full((B, L), 4, np.uint8)
        alen = np.zeros(B, np.int32)
        blen = np.zeros(B, np.int32)
        for i, r in enumerate(reads):
            a[i, : len(cns)] = cns
            alen[i] = len(cns)
            b[i, : len(r)] = r
            blen[i] = len(r)
        score, dirs = batch_global_align(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(alen), jnp.asarray(blen),
            max_len=L,
        )
        cigs = traceback_batch(np.asarray(dirs), alen, blen)
        for i, (ops, counts) in enumerate(cigs):
            a0, a1 = align_strings(a[i], b[i], ops, counts)
            g.add_alignment(0, int(alen[i]), a0, a1)
        g.merge_nodes()
        cns, mp, sc = g.consensus()
    # consensus should be much closer to truth than the backbone was
    def ident(x, y):
        from difflib import SequenceMatcher
        # autojunk junks "popular" characters — catastrophic on DNA strings
        return SequenceMatcher(None, codes_to_seq(x), codes_to_seq(y),
                               autojunk=False).ratio()

    assert ident(cns, truth) > 0.97, f"consensus identity {ident(cns, truth)}"
    assert ident(cns, truth) > ident(backbone, truth)


def test_snv_calling():
    """A 50/50 variant position should be reported by call_snv."""
    g = DagCns()
    bb = seq_to_codes("ACGTACGTACGT")
    g.set_backbone(bb)
    # half the reads carry a G->C substitution at index 6; polish splits
    # the mismatch column into del+ins, creating the alt bridge node.
    # (A G->T variant would left-shift into the adjacent backbone T and
    # become a skip+insertion instead of a bridge — reference
    # _polish_pairwise_aln_dagcns behavior on del-first split rows.)
    for i in range(8):
        if i % 2 == 0:
            a0, a1 = _aln_from_strings("ACGTACGTACGT", "ACGTACGTACGT")
        else:
            a0, a1 = _aln_from_strings("ACGTACGTACGT", "ACGTACCTACGT")
        g.add_alignment(0, 12, a0, a1)
    g.merge_nodes()
    cns, mp, score = g.consensus()
    snvs = g.call_snv(min_cnt=2, min_freq=0.05)
    assert len(snvs) >= 1, snvs
