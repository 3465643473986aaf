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
    ksize: int = 21
    min_cov: int = 3
    max_branch: int = 4096


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
        self._lib = lib
        self._kmers = np.ascontiguousarray(kmers, np.uint64)
        self._counts = np.ascontiguousarray(counts, np.uint32)
        self._h = lib.dbg_new(
            self._kmers.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            self._counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            len(self._kmers), ksize, min_cov)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.dbg_free(self._h)
            self._h = None

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
