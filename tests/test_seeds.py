import numpy as np

from smartdenovo_tpu.data.readbank import PAD, seq_to_codes
from smartdenovo_tpu.ops.seeds import (
    extract_seeds,
    extract_seeds_np,
    jenkins_hash_u32,
    revcomp_kmer_u32,
)


def _jenkins_ref(key):
    key = key & 0xFFFFFFFF
    key = (key + (key << 12)) & 0xFFFFFFFF
    key ^= key >> 22
    key = (key + (key << 4)) & 0xFFFFFFFF
    key ^= key >> 9
    key = (key + (key << 10)) & 0xFFFFFFFF
    key ^= key >> 2
    key = (key + (key << 7)) & 0xFFFFFFFF
    key ^= key >> 12
    return key


def test_jenkins_matches_reference():
    import jax.numpy as jnp

    keys = np.array([0, 1, 12345, 0xDEADBEEF, 0xFFFFFFFF], dtype=np.uint32)
    got = np.asarray(jenkins_hash_u32(jnp.asarray(keys)))
    want = np.array([_jenkins_ref(int(k)) for k in keys], dtype=np.uint32)
    np.testing.assert_array_equal(got, want)


def test_revcomp_kmer():
    import jax.numpy as jnp

    # ACGT (k=4) -> revcomp ACGT (palindrome)
    code = 0b00011011
    assert int(revcomp_kmer_u32(jnp.uint32(code), 4)) == code
    # AAAA -> TTTT
    assert int(revcomp_kmer_u32(jnp.uint32(0), 4)) == 0b11111111


def _device_seeds(seq_codes, ksize, hz=True, L=None):
    import jax.numpy as jnp

    L = L or len(seq_codes) + 3
    batch = np.full((1, L), PAD, dtype=np.uint8)
    batch[0, : len(seq_codes)] = seq_codes
    res = extract_seeds(jnp.asarray(batch), jnp.asarray([len(seq_codes)], np.int32), ksize, hz)
    res = {k: np.asarray(v) for k, v in res.items()}
    out = []
    for i in range(L):
        if res["valid"][0, i]:
            out.append(
                (
                    int(res["kmer"][0, i]),
                    int(res["dir"][0, i]),
                    int(res["off"][0, i]),
                    int(res["span"][0, i]),
                )
            )
    return out


def test_extract_seeds_matches_oracle_small():
    seq = seq_to_codes("ACCGGGTACGTTAACGTACG")
    for hz in (True, False):
        for k in (3, 5):
            got = _device_seeds(seq, k, hz)
            want = extract_seeds_np(seq, k, hz)
            assert got == want, (k, hz)


def test_extract_seeds_matches_oracle_random():
    rng = np.random.default_rng(7)
    for trial in range(5):
        n = int(rng.integers(30, 300))
        seq = rng.integers(0, 4, n).astype(np.uint8)
        got = _device_seeds(seq, 16 if trial % 2 else 10, hz=True)
        want = extract_seeds_np(seq, 16 if trial % 2 else 10, hz=True)
        assert got == want


def test_extract_seeds_batch_padding_isolated():
    rng = np.random.default_rng(8)
    s1 = rng.integers(0, 4, 100).astype(np.uint8)
    s2 = rng.integers(0, 4, 37).astype(np.uint8)
    import jax.numpy as jnp

    L = 128
    batch = np.full((2, L), PAD, dtype=np.uint8)
    batch[0, : len(s1)] = s1
    batch[1, : len(s2)] = s2
    res = extract_seeds(jnp.asarray(batch), jnp.asarray([len(s1), len(s2)], np.int32), 10, True)
    res = {k: np.asarray(v) for k, v in res.items()}
    for row, s in ((0, s1), (1, s2)):
        got = [
            (int(res["kmer"][row, i]), int(res["dir"][row, i]), int(res["off"][row, i]), int(res["span"][row, i]))
            for i in range(L)
            if res["valid"][row, i]
        ]
        assert got == extract_seeds_np(s, 10, True)
