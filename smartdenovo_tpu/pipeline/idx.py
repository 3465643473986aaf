"""Index snapshotting — equivalent of the reference `wtidx`.

The reference dumps the wtzmo k-mer index with obj-desc serialization so
multiple processes can mmap-share it (wtidx.c:244-245, mem_share.h).
Here the sorted posting arrays are saved as one compressed .npz; loading
memory-maps the arrays (np.load mmap_mode) so concurrent overlap jobs on
one host share page-cache, and device upload streams from the map.
"""

from __future__ import annotations

import numpy as np

from ..data.readbank import ReadBank
from ..ops.index import KmerIndex, ZmerIndex, build_kmer_index, build_zmer_index
from ..utils.log import log


def save_indexes(path: str, kidx: KmerIndex, zidx: ZmerIndex) -> None:
    np.savez_compressed(
        path,
        k_kmers=np.asarray(kidx.kmers), k_rd=np.asarray(kidx.post_rd),
        k_dir=np.asarray(kidx.post_dir),
        k_meta=np.array([kidx.max_freq, kidx.ksize, kidx.n_reads], np.int64),
        z_zmers=np.asarray(zidx.zmers), z_rd=np.asarray(zidx.post_rd),
        z_dir=np.asarray(zidx.post_dir), z_off=np.asarray(zidx.post_off),
        z_span=np.asarray(zidx.post_span),
        z_meta=np.array([zidx.zsize, zidx.max_per_read], np.int64),
    )
    log("saved indexes to %s", path)


def load_indexes(path: str):
    import jax.numpy as jnp

    d = np.load(path)
    kidx = KmerIndex(
        kmers=jnp.asarray(d["k_kmers"]), post_rd=jnp.asarray(d["k_rd"]),
        post_dir=jnp.asarray(d["k_dir"]),
        max_freq=int(d["k_meta"][0]), ksize=int(d["k_meta"][1]),
        n_reads=int(d["k_meta"][2]),
    )
    z_packed = (
        (d["z_off"].astype(np.int64) << 9)
        | (np.minimum(d["z_span"], 255).astype(np.int64) << 1)
        | d["z_dir"].astype(np.int64)
    ).astype(np.int32)
    zidx = ZmerIndex(
        zmers=jnp.asarray(d["z_zmers"]), post_rd=jnp.asarray(d["z_rd"]),
        post_dir=jnp.asarray(d["z_dir"]), post_off=jnp.asarray(d["z_off"]),
        post_span=jnp.asarray(d["z_span"]),
        post_packed=jnp.asarray(z_packed),
        zsize=int(d["z_meta"][0]), max_per_read=int(d["z_meta"][1]),
        np_zmers=np.asarray(d["z_zmers"]),
        np_key=(d["z_zmers"].astype(np.uint64) << np.uint64(32))
        | d["z_rd"].astype(np.uint64),
    )
    return kidx, zidx


def build_and_save_indexes(inputs, output: str, ksize: int = 16, zsize: int = 10):
    rb = ReadBank.from_fasta(inputs)
    kidx = build_kmer_index(rb, ksize)
    zidx = build_zmer_index(rb, zsize)
    save_indexes(output, kidx, zidx)
    return output
