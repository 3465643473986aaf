"""K-mer frequency spectrum — equivalent of the reference `wtmer`.

Prints a depth histogram of (homopolymer-compressed) canonical k-mers,
used to choose the -K high-frequency cutoff (reference wtmer.c:41-125).
"""

from __future__ import annotations

import sys

import numpy as np
import jax.numpy as jnp

from ..data.readbank import ReadBank
from ..ops.index import _length_batches, _pad_rids
from ..ops.seeds import extract_seeds


def kmer_spectrum(rb: ReadBank, ksize: int = 16, hz: bool = True,
                  max_depth: int = 1000) -> np.ndarray:
    """Return hist[depth] = number of distinct kmers with that depth."""
    parts = []
    for rids, Lp in _length_batches(rb):
        rids, mask = _pad_rids(rids)
        batch, lens = rb.batch(rids, pad_to=Lp)
        lens = lens * mask
        res = extract_seeds(jnp.asarray(batch), jnp.asarray(lens), ksize, hz)
        keep = np.asarray(res["valid"])
        parts.append(np.asarray(res["kmer"])[keep])
    if not parts:
        return np.zeros(max_depth + 1, np.int64)
    kmers = np.concatenate(parts)
    kmers.sort()
    boundary = np.empty(len(kmers), bool)
    boundary[0] = True
    np.not_equal(kmers[1:], kmers[:-1], out=boundary[1:])
    depth = np.bincount(np.cumsum(boundary) - 1)
    depth = np.minimum(depth, max_depth)
    return np.bincount(depth, minlength=max_depth + 1)


def run_mer(inputs, ksize: int = 16, hz: bool = True, out=None):
    out = out or sys.stdout
    rb = ReadBank.from_fasta(inputs)
    hist = kmer_spectrum(rb, ksize, hz)
    for depth, cnt in enumerate(hist):
        if cnt:
            out.write(f"{depth}\t{cnt}\n")
    return hist
