"""Small alignment tools — equivalents of `pairaln` and `wtcyc`.

pairaln: align consecutive read pairs from FASTA input and print stats
(reference pairaln.c — a 2-sequence debugging harness).
wtcyc: align each read against its own reverse complement to detect
missed-adapter palindromes; emit a retained-region mask for the longer
half (reference wtcyc.c, README-tools.md:320-335).
"""

from __future__ import annotations

import sys

import numpy as np
import jax.numpy as jnp

from ..data.readbank import revcomp_codes, seq_to_codes
from ..io.fasta import read_seqs
from ..ops.overlap_dp import banded_local_dp


def _align_two(a_codes: np.ndarray, b_codes: np.ndarray, W: int = 256):
    LA = 1 << max(8, (len(a_codes) - 1).bit_length())
    a = np.full((1, LA), 4, np.uint8)
    a[0, : len(a_codes)] = a_codes
    b = np.full((1, max(LA, len(b_codes))), 4, np.uint8)
    b[0, : len(b_codes)] = b_codes
    alen = np.array([len(a_codes)], np.int32)
    blen = np.array([len(b_codes)], np.int32)
    slope = np.array([1 << 12], np.int32)
    zero = np.zeros(1, np.int32)
    sc, mat, ea, eb = banded_local_dp(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(alen), jnp.asarray(blen),
        jnp.asarray(zero), jnp.asarray(zero), jnp.asarray(slope),
        LA=LA, W=W,
    )
    return int(sc[0]), int(mat[0]), int(ea[0]), int(eb[0])


def run_pairaln(inputs, out=None):
    out = out or sys.stdout
    recs = list(read_seqs(inputs))
    for i in range(0, len(recs) - 1, 2):
        n1, _, s1 = recs[i]
        n2, _, s2 = recs[i + 1]
        sc, mat, ea, eb = _align_two(seq_to_codes(s1), seq_to_codes(s2))
        aln = max(ea, eb)
        out.write(f"{n1}\t{len(s1)}\t{n2}\t{len(s2)}\t{sc}\t{mat}\t"
                  f"{mat / max(1, aln):.3f}\n")


def run_cyc(inputs, output="-", min_score: int = 400, min_id: float = 0.7,
            out=None):
    """Detect palindromic (self-revcomp) reads; keep the longer arm.

    Reference semantics (wtcyc.c output_alignment:78-92): align rc(read)
    vs read; if the local alignment scores >= min_score at identity >=
    min_id, touches a read end, and is coordinate-symmetric (an inverted
    repeat maps onto itself: |tb - (len-qe)| < 50 and |te - (len-qb)| <
    50), the fold point is bp = (tb + te) / 2 — the midpoint of the
    palindromic region — and the longer side of bp is kept.  Begin
    coordinates come from a second local DP on the reversed sequences.
    """
    fh = sys.stdout if output == "-" else open(output, "w")
    try:
        for name, _, seq in read_seqs(inputs):
            codes = seq_to_codes(seq)
            rc = revcomp_codes(codes)
            ln = len(codes)
            sc, mat, qe, te = _align_two(rc, codes, W=1600)
            bp = -1
            if sc >= min_score:
                # suffix trick: ends of the reversed problem are begins
                sc2, _m2, ea2, eb2 = _align_two(rc[::-1].copy(),
                                                codes[::-1].copy(), W=1600)
                qb = ln - ea2
                tb = ln - eb2
                aln = max(qe - qb, te - tb)
                ident = mat / (aln + 1)
                anchored = tb <= 0 or te >= ln
                symmetric = (abs(tb - (ln - qe)) < 50
                             and abs(te - (ln - qb)) < 50)
                if ident >= min_id and anchored and symmetric:
                    bp = (tb + te) // 2
            if bp >= 0:
                if bp < ln // 2:
                    fh.write(f"{name}\t{bp}\t{ln - bp}\t{ln}\n")
                else:
                    fh.write(f"{name}\t0\t{bp}\t{ln}\n")
            else:
                fh.write(f"{name}\t0\t{ln}\t{ln}\n")
    finally:
        if fh is not sys.stdout:
            fh.close()


def run_dif(inputs, out=None, W: int = 256):
    """wtdif equivalent: align reads 2..N to read 1, report variants.

    Output: qname, pos-on-ref, type(S/I/D), ref base(s), alt base(s).
    """
    from ..ops.banded import banded_align, make_band_centers, traceback_banded
    from ..ops.swdp import align_strings
    import jax.numpy as jnp

    out = out or sys.stdout
    recs = list(read_seqs(inputs))
    if len(recs) < 2:
        return
    ref_name, _, ref_seq = recs[0]
    ref = seq_to_codes(ref_seq)
    for name, _, seq in recs[1:]:
        codes = seq_to_codes(seq)
        LA = 1 << max(8, (len(codes) - 1).bit_length())
        a = np.full((1, LA), 4, np.uint8)
        a[0, : len(codes)] = codes
        b = np.full((1, len(ref)), 4, np.uint8)
        b[0] = ref
        alen = np.array([len(codes)], np.int32)
        blen = np.array([len(ref)], np.int32)
        base = make_band_centers([[]], alen, blen, LA, W)
        score, end_col, dirs = banded_align(
            jnp.asarray(a), jnp.asarray(b), jnp.asarray(alen), jnp.asarray(blen),
            jnp.asarray(base), LA=LA, W=W, semiglobal_b=True,
        )
        cigs, b_begs = traceback_banded(np.asarray(dirs), base, alen,
                                        np.asarray(end_col))
        ops, counts = cigs[0]
        ra, rb = align_strings(a[0], b[0][int(b_begs[0]):], ops, counts)
        pos = int(b_begs[0])
        bases = "ACGT-"
        for x, y in zip(ra, rb):
            if y != 4 and x != 4 and x != y:
                out.write(f"{name}\t{pos}\tS\t{bases[y]}\t{bases[x]}\n")
            elif y == 4 and x != 4:
                out.write(f"{name}\t{pos}\tI\t-\t{bases[x]}\n")
            elif x == 4 and y != 4:
                out.write(f"{name}\t{pos}\tD\t{bases[y]}\t-\n")
            if y != 4:
                pos += 1


def run_dotplot(inputs, prefix: str = "dot_plot", zsize: int = 10,
                hz: bool = True, max_zmer_freq: int = 64):
    """Dot-plot debug dump for exactly two reads (reference
    debug_dot_plot_hzmps, hzm_aln.h:902-931): writes
    {prefix}.fwd.txt / {prefix}.rev.txt with one `off1\\toff2` zmer match
    per line — the raw image the dot-matrix aligner chains."""
    from ..data.readbank import ReadBank
    from ..ops.seeds import extract_seeds

    rb = ReadBank.from_fasta(inputs, sort=False)
    if len(rb) != 2:
        raise ValueError(f"dot plot needs exactly 2 reads, got {len(rb)}")
    batch, lens = rb.batch(np.arange(2))
    res = extract_seeds(jnp.asarray(batch), jnp.asarray(lens), zsize, hz)
    km = np.asarray(res["kmer"])
    off = np.asarray(res["off"])
    dr = np.asarray(res["dir"])
    ok = np.asarray(res["valid"])
    rows = []
    for i in (0, 1):
        d = {}
        for j in np.nonzero(ok[i])[0]:
            d.setdefault(int(km[i][j]), []).append(
                (int(off[i][j]), int(dr[i][j])))
        rows.append(d)
    n_match = 0
    with open(f"{prefix}.fwd.txt", "w") as fwd, \
         open(f"{prefix}.rev.txt", "w") as rev:
        for z, occ0 in rows[0].items():
            occ1 = rows[1].get(z)
            if occ1 is None or len(occ0) > max_zmer_freq \
                    or len(occ1) > max_zmer_freq:
                continue
            for o0, d0 in occ0:
                for o1, d1 in occ1:
                    out = rev if (d0 ^ d1) else fwd
                    o1p = (int(rb.lengths[1]) - o1 - zsize) if (d0 ^ d1) else o1
                    out.write(f"{o0}\t{o1p}\n")
                    n_match += 1
    return n_match
