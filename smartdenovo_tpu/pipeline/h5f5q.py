"""PacBio bas/bax.h5 -> f5q converter — equivalent of `pbh5tof5q`.

f5q = FASTQ whose quality line holds 7xL tracks: QualityValue,
SubstitutionQV, InsertionQV, DeletionQV, MergeQV, SubstitutionTag,
DeletionTag (phred+33; reference pbh5tof5q.c usage text).  Subread
regions come from /PulseData/Regions (type 1 = insert region, clipped by
the HQ region type 2); read names follow the PacBio convention
`<movie>/<hole>/<start>_<end>`.
"""

from __future__ import annotations

import sys

import numpy as np

QV_PATHS = [
    "/PulseData/BaseCalls/QualityValue",
    "/PulseData/BaseCalls/SubstitutionQV",
    "/PulseData/BaseCalls/InsertionQV",
    "/PulseData/BaseCalls/DeletionQV",
    "/PulseData/BaseCalls/MergeQV",
    "/PulseData/BaseCalls/SubstitutionTag",
    "/PulseData/BaseCalls/DeletionTag",
]


def convert_bas_h5(path: str, out=None, min_len: int = 100, min_rq: float = 0.6,
                   movie: str | None = None) -> int:
    import h5py

    out = out or sys.stdout
    n_out = 0
    with h5py.File(path, "r") as f:
        basecall = f["/PulseData/BaseCalls/Basecall"]
        holes = np.asarray(f["/PulseData/BaseCalls/ZMW/HoleNumber"])
        nevent = np.asarray(f["/PulseData/BaseCalls/ZMW/NumEvent"])
        offsets = np.zeros(len(nevent) + 1, np.int64)
        np.cumsum(nevent, out=offsets[1:])
        hole2idx = {int(h): i for i, h in enumerate(holes)}
        regions = np.asarray(f["/PulseData/Regions"])  # [N, 5]: hole, type, beg, end, score
        if movie is None:
            movie = path.rsplit("/", 1)[-1].split(".")[0]
        qv_data = []
        for p in QV_PATHS:
            qv_data.append(f[p] if p in f else None)
        # group regions per hole: inserts (type 1), HQ region (type 2)
        from collections import defaultdict

        inserts = defaultdict(list)
        hq = {}
        for row in regions:
            hole, rtype, beg, end, score = (int(x) for x in row[:5])
            if rtype == 1:
                inserts[hole].append((beg, end))
            elif rtype == 2:
                hq[hole] = (beg, end, score)
        base_arr = np.asarray(basecall)
        qv_arrs = [np.asarray(d) if d is not None else None for d in qv_data]
        for hole, subs in sorted(inserts.items()):
            idx = hole2idx.get(hole)
            if idx is None:
                continue
            hqb, hqe, score = hq.get(hole, (0, int(nevent[idx]), 1000))
            if score < min_rq * 1000:
                continue
            off0 = int(offsets[idx])
            for beg, end in subs:
                b = max(beg, hqb)
                e = min(end, hqe)
                if e - b < min_len:
                    continue
                seq = base_arr[off0 + b : off0 + e].tobytes().decode("ascii", "replace")
                tracks = []
                for t, arr in enumerate(qv_arrs):
                    if arr is None:
                        tracks.append("!" * (e - b))
                    elif t >= 5:  # tag tracks are base characters already
                        tracks.append(arr[off0 + b : off0 + e].tobytes().decode("ascii", "replace"))
                    else:
                        q = np.clip(arr[off0 + b : off0 + e].astype(np.int32), 0, 90) + 33
                        tracks.append(q.astype(np.uint8).tobytes().decode("ascii"))
                name = f"{movie}/{hole}/{b}_{e}"
                out.write(f"@{name}\n{seq}\n+\n{''.join(tracks)}\n")
                n_out += 1
    return n_out
