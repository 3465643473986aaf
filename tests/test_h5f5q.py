"""pbh5tof5q converter test with a synthetic bas.h5."""

import io

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from smartdenovo_tpu.pipeline.h5f5q import convert_bas_h5


def _make_bas(path):
    rng = np.random.default_rng(5)
    seqs = [rng.choice(list(b"ACGT"), 500).astype(np.uint8) for _ in range(2)]
    flat = np.concatenate(seqs)
    with h5py.File(path, "w") as f:
        f["/PulseData/BaseCalls/Basecall"] = flat
        f["/PulseData/BaseCalls/ZMW/HoleNumber"] = np.array([7, 9], np.uint32)
        f["/PulseData/BaseCalls/ZMW/NumEvent"] = np.array([500, 500], np.uint32)
        f["/PulseData/BaseCalls/QualityValue"] = np.full(1000, 30, np.uint8)
        f["/PulseData/BaseCalls/SubstitutionQV"] = np.full(1000, 25, np.uint8)
        f["/PulseData/BaseCalls/InsertionQV"] = np.full(1000, 20, np.uint8)
        f["/PulseData/BaseCalls/DeletionQV"] = np.full(1000, 15, np.uint8)
        f["/PulseData/BaseCalls/MergeQV"] = np.full(1000, 10, np.uint8)
        f["/PulseData/BaseCalls/SubstitutionTag"] = np.frombuffer(b"A" * 1000, np.uint8).copy()
        f["/PulseData/BaseCalls/DeletionTag"] = np.frombuffer(b"C" * 1000, np.uint8).copy()
        # regions: hole, type, beg, end, score; insert + HQ per hole
        f["/PulseData/Regions"] = np.array([
            [7, 1, 0, 400, 0],
            [7, 2, 50, 450, 800],
            [9, 1, 0, 500, 0],
            [9, 2, 0, 500, 500],   # low RQ -> filtered
        ], np.int32)
    return seqs


def test_convert(tmp_path):
    p = str(tmp_path / "movie1.bas.h5")
    seqs = _make_bas(p)
    buf = io.StringIO()
    n = convert_bas_h5(p, out=buf, min_len=100, min_rq=0.6)
    assert n == 1
    lines = buf.getvalue().splitlines()
    assert lines[0] == "@movie1/7/50_400"
    assert len(lines[1]) == 350
    assert lines[1] == seqs[0][50:400].tobytes().decode()
    assert len(lines[3]) == 7 * 350
    assert lines[3][:350] == chr(30 + 33) * 350
    assert lines[3][-350:] == "C" * 350
