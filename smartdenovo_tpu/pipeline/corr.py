"""Short-read DBG correction of long reads — equivalent of `wtcorr`/`wtjnt`.

The de Bruijn graph is a sorted canonical k-mer array with counts built
from accurate short reads (the same sort/scan machinery as the overlap
indexes); correction (native/dbgcorr.cpp) anchors each long read on runs
of solid k-mers and replaces weak gaps with bounded best-first paths
through the graph (reference wtcorr.c DBG + kmer-moving alignment,
README-tools.md:283-318).  `join_fragments` re-joins per-fragment
corrected pieces into whole reads (the wtjnt role) by offset ordering +
junction overlap merge.
"""

from __future__ import annotations

import ctypes
import dataclasses

import numpy as np

from ..data.readbank import ReadBank
from ..utils.log import log
from ..utils.native import build_and_load


@dataclasses.dataclass
class CorrParams:
    ksize: int = 21           # -k small kmer (kmer moving)
    min_cov: int = 3          # -c solid small-kmer coverage
    max_branch: int = 4096
    big_k: int = 31           # -K big verification kmer (reference 41;
                              # capped at 32 by the 2-bit packed codes);
                              # 0 disables the counting-bloom verifier
    min_bigk_cov: int = 2     # -1 equivalent: min big-kmer count on paths
    bigk_frac: float = 0.95   # fraction of path big-kmers that must verify
    max_cands: int = 8        # candidate gap paths ranked by edit distance
    cbf_log2_cells: int = 26  # 64 MB counting bloom (counting_bloom_filter.h)
    cbf_hashes: int = 3


def build_dbg_kmers(short_reads: ReadBank, ksize: int) -> tuple[np.ndarray, np.ndarray]:
    """Canonical kmer -> count arrays from short accurate reads (no hpc)."""
    from ..ops.seeds import np_canonical_kmers

    parts = []
    B = 256
    for b0 in range(0, len(short_reads), B):
        rids = np.arange(b0, min(len(short_reads), b0 + B))
        batch, lens = short_reads.batch(rids)
        codes, valid = np_canonical_kmers(batch, lens, ksize, hz=False)
        parts.append(codes[valid].astype(np.uint64))
    if not parts:
        return np.zeros(0, np.uint64), np.zeros(0, np.uint32)
    kmers = np.concatenate(parts)
    kmers.sort()
    boundary = np.empty(len(kmers), bool)
    boundary[0] = True
    np.not_equal(kmers[1:], kmers[:-1], out=boundary[1:])
    uniq = kmers[boundary]
    counts = np.diff(np.append(np.nonzero(boundary)[0], len(kmers))).astype(np.uint32)
    return uniq, counts


class DbgCorrector:
    def __init__(self, kmers: np.ndarray, counts: np.ndarray, ksize: int,
                 min_cov: int = 3):
        lib = build_and_load("dbgcorr")
        lib.dbg_new.restype = ctypes.c_void_p
        lib.dbg_new.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int64, ctypes.c_int, ctypes.c_uint32]
        lib.dbg_free.argtypes = [ctypes.c_void_p]
        lib.dbg_correct.restype = ctypes.c_int
        lib.dbg_correct.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int]
        lib.cbf_new.restype = ctypes.c_void_p
        lib.cbf_new.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.cbf_free.argtypes = [ctypes.c_void_p]
        lib.cbf_add_seq.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
        lib.dbg_set_verifier.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32,
            ctypes.c_double, ctypes.c_int]
        self._lib = lib
        self._kmers = np.ascontiguousarray(kmers, np.uint64)
        self._counts = np.ascontiguousarray(counts, np.uint32)
        self._h = lib.dbg_new(
            self._kmers.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            self._counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            len(self._kmers), ksize, min_cov)
        self._cbf = None

    def attach_verifier(self, short_rb: ReadBank, big_k: int,
                        min_cov: int = 2, frac: float = 0.95,
                        max_cands: int = 8, log2_cells: int = 26,
                        hashes: int = 3):
        """Counting-bloom big-K verifier over the short reads (wtcorr -K)."""
        big_k = min(big_k, 32)
        self._cbf = self._lib.cbf_new(log2_cells, hashes, big_k)
        for rid in range(len(short_rb)):
            codes = np.ascontiguousarray(short_rb.get(rid), np.uint8)
            self._lib.cbf_add_seq(
                self._cbf, codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                len(codes))
        self._lib.dbg_set_verifier(self._h, self._cbf, min_cov, frac,
                                   max_cands)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.dbg_free(self._h)
            self._h = None
        if getattr(self, "_cbf", None):
            self._lib.cbf_free(self._cbf)
            self._cbf = None

    def correct(self, codes: np.ndarray, max_branch: int = 4096) -> np.ndarray | None:
        codes = np.ascontiguousarray(codes, np.uint8)
        cap = len(codes) * 2 + 64
        out = np.zeros(cap, np.uint8)
        n = self._lib.dbg_correct(
            self._h, codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            len(codes), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            cap, max_branch)
        if n < 0:
            return None
        return out[:min(n, cap)].copy()


def run_corr(long_rb: ReadBank, short_rb: ReadBank, params: CorrParams | None = None):
    """Correct every long read; returns list of (name, corrected codes)."""
    p = params or CorrParams()
    kmers, counts = build_dbg_kmers(short_rb, p.ksize)
    log("wtcorr: DBG with %d kmers (k=%d)", len(kmers), p.ksize)
    corr = DbgCorrector(kmers, counts, p.ksize, p.min_cov)
    if p.big_k:
        corr.attach_verifier(short_rb, p.big_k, p.min_bigk_cov, p.bigk_frac,
                             p.max_cands, p.cbf_log2_cells, p.cbf_hashes)
        log("wtcorr: big-K verifier K=%d (counting bloom, %d hashes)",
            min(p.big_k, 32), p.cbf_hashes)
    out = []
    n_fixed = 0
    for rid in range(len(long_rb)):
        codes = long_rb.get(rid)
        fixed = corr.correct(codes, p.max_branch)
        if fixed is None:
            out.append((long_rb.names[rid], codes.copy()))
        else:
            out.append((long_rb.names[rid], fixed))
            n_fixed += 1
    log("wtcorr: corrected %d/%d reads", n_fixed, len(long_rb))
    return out


def join_fragments_dag(parent_rb: ReadBank, fragments, overlaps,
                       margin: int = 100, min_support: int = 2,
                       batch: int = 16):
    """wtjnt with overlap-guided DAG gap filling (make_cns_fillgap,
    wtjnt.c:284-331): between adjacent corrected fragments of a long
    read, build a backbone [frag1 tail margin][raw parent gap][frag2 head
    margin], align the gap regions of OVERLAPPING long reads to it, and
    replace the raw gap with the DAG consensus.

    fragments: (parent_name, codes, parent_beg[, parent_end]) — like the
    reference's wt_rd_t pbx/pby, parent_beg/parent_end are the fragment's
    span in RAW PARENT coordinates (corrected length drifts from the raw
    span, so the gap slice must come from tracked raw coords); overlaps:
    Overlap records keyed to parent_rb read ids.  Falls back to the raw
    bases when fewer than min_support reads cover a gap.
    """
    from collections import defaultdict

    import jax.numpy as jnp

    from ..data.readbank import revcomp_codes
    from ..ops.banded import banded_align, make_band_centers, traceback_banded
    from ..ops.swdp import align_strings
    from ..utils.native import DagCns

    # parent region -> supporting (read, coords) from the overlap records
    sup = defaultdict(list)   # parent rid -> [(b1, e1, rid2, dir2, b2, e2)]
    for ov in overlaps:
        sup[ov.rid1].append((ov.beg1, ov.end1, ov.rid2, ov.dir2, ov.beg2, ov.end2))
        sup[ov.rid2].append((ov.beg2, ov.end2, ov.rid1, ov.dir1 ^ ov.dir2,
                             ov.beg1, ov.end1))

    groups = defaultdict(list)
    for rec in fragments:
        name, codes, off = rec[0], rec[1], rec[2]
        pend = rec[3] if len(rec) > 3 else off + len(codes)
        groups[name].append((off, codes, pend))
    out = []
    for name, frs in groups.items():
        frs.sort(key=lambda t: t[0])
        rid = parent_rb.name2id.get(name)
        parent = parent_rb.get(rid) if rid is not None else None
        pieces = [frs[0][1]]
        for (o1, c1, pe1), (o2, c2, _pe2) in zip(frs, frs[1:]):
            g0 = pe1                # raw parent coords of the gap
            g1 = o2
            if parent is None or g1 <= g0:
                pieces.append(c2)
                continue
            back = np.concatenate([
                c1[-margin:], parent[g0:g1], c2[:margin]]).astype(np.uint8)
            # supporting slices over [g0-margin, g1+margin]
            win0, win1 = g0 - margin, g1 + margin
            seqs = []
            for b1, e1, r2, d2, b2, e2 in sup.get(rid, []):
                if b1 > win0 or e1 < win1 or e1 <= b1:
                    continue
                # map parent coords -> read2 coords (linear interpolation
                # over the overlap, like the reference's lnk x/y)
                f = (e2 - b2) / (e1 - b1)
                x = int(b2 + (win0 - b1) * f)
                y = int(b2 + (win1 - b1) * f)
                other = parent_rb.get(r2)
                if d2:
                    other = revcomp_codes(other)
                # slice exactly the backbone's parent span: overhanging
                # bases would be forced inside as insertion votes
                x = max(0, x)
                y = min(len(other), y)
                if y - x >= (win1 - win0) // 2:
                    seqs.append(np.ascontiguousarray(other[x:y]))
            if len(seqs) < min_support:
                pieces.append(parent[g0:g1])
                pieces.append(c2)
                continue
            from .cns import CnsParams, LayUnitig, consensus_unitig

            unit = LayUnitig(
                name="gap", reads=[back] + seqs, offs=[0] * (1 + len(seqs)),
                backbone=[True] + [False] * len(seqs))
            cns = consensus_unitig(unit, CnsParams(
                n_iter=3, batch_reads=batch, win_margin=margin + 64,
                band=256, min_block_len=32))
            # splice out the corrected gap: locate the accurate flank
            # tails in the consensus (the flanks come from corrected
            # fragments, so a 24-mer exact match is reliable)
            lo = hi = -1
            probe1 = c1[-min(24, margin):].tobytes()
            probe2 = c2[:min(24, margin)].tobytes()
            sb = cns.tobytes()
            p1 = sb.find(probe1, 0, 2 * margin + 64)
            if p1 >= 0:
                lo = p1 + len(probe1)
            p2 = sb.rfind(probe2, max(0, len(sb) - 2 * margin - 64))
            if p2 >= 0:
                hi = p2
            import os as _os
            if _os.environ.get("SDTPU_JNT_DEBUG"):
                print(f"[jnt] cns={len(cns)} back={len(back)} p1={p1} p2={p2}"
                      f" lo={lo} hi={hi} nsup={len(seqs)}")
            if 0 <= lo <= hi <= len(cns):
                pieces.append(cns[lo:hi])
            else:
                pieces.append(parent[g0:g1])
            pieces.append(c2)
        out.append((name, np.concatenate(pieces).astype(np.uint8)))
    return out


def join_fragments(fragments: list[tuple[str, np.ndarray, int]]):
    """wtjnt role: join (parent_name, codes, offset) fragments per parent.

    Fragments are offset-ordered and joined; overlapping junctions keep the
    earlier fragment's bases up to the later fragment's offset.
    """
    from collections import defaultdict

    groups = defaultdict(list)
    for name, codes, off in fragments:
        groups[name].append((off, codes))
    out = []
    for name, frs in groups.items():
        frs.sort(key=lambda t: t[0])
        ln = max(off + len(c) for off, c in frs)
        buf = np.zeros(ln, np.uint8)
        built = 0
        for off, c in frs:
            if off + len(c) <= built:
                continue
            start = max(off, built)
            buf[start : off + len(c)] = c[start - off :]
            built = off + len(c)
        out.append((name, buf[:built]))
    return out
