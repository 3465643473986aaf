"""Random-access FASTA store + haplotype MSA clustering utilities.

Equivalents of the reference's last three uncovered scripts:
  dbm_index_fa.pl — build a name->sequence DBM from a FASTA
  dbm_read_fa.pl  — fetch reads (with strand / subrange tags) from the DBM
  pbcluster_haplo.pl — iterative weighted-majority haplotype consensus
                       over an aligned MSA (column strings with '-')

The DBM pair uses Python's `dbm` module (same key/value hash-file model
as Perl's DB_File; the file format differs, which is fine — the format
was never a cross-tool contract, only the CLI behaviour).
cf. /root/reference/dbm_index_fa.pl:1-36, dbm_read_fa.pl:1-59,
pbcluster_haplo.pl:1-92.
"""

from __future__ import annotations

import dbm
import os
import re
import sys

_COMP = str.maketrans("ACGTacgt", "TGCAtgca")

# name[+] / name[-] / name[+:beg,end] (1-based inclusive, end<1 = to end)
_TAG_RE = re.compile(r"^(.+?)\[([+-])(?::(-?\d+),(-?\d+))?\]$")


def dbm_index_fa(fasta_path: str, out_path: str | None = None) -> str:
    """Build `<fasta>.dbm` mapping read name -> sequence."""
    out = out_path or fasta_path + ".dbm"
    if os.path.exists(out):
        raise FileExistsError(f"{out} already exists!!!")
    db = dbm.open(out, "c")
    try:
        name, buf = None, []
        with open(fasta_path) as fh:
            for line in fh:
                if line.startswith(">"):
                    if name:
                        db[name] = "".join(buf)
                    name = line[1:].split()[0]
                    buf = []
                else:
                    buf.append(line.strip())
        if name:
            db[name] = "".join(buf)
    finally:
        db.close()
    return out


def parse_tag(tag: str):
    """-> (name, forward, beg, end, tagged); beg 1-based, end -1 = to end."""
    m = _TAG_RE.match(tag)
    if not m:
        return tag, True, 1, -1, False
    beg = int(m.group(3)) if m.group(3) else 1
    end = int(m.group(4)) if m.group(4) else -1
    return m.group(1), m.group(2) == "+", beg, end, True


def dbm_read_fa(dbm_path: str, tags, out=sys.stdout, width: int = 100):
    """Print the requested reads as FASTA (strand/subrange aware)."""
    if not dbm_path.endswith(".dbm") and os.path.exists(dbm_path + ".dbm"):
        dbm_path += ".dbm"
    db = dbm.open(dbm_path, "r")
    try:
        for tag in tags:
            name, fwd, beg, end, tagged = parse_tag(tag)
            if name.encode() not in db:
                print(f"'{name}' was not found", file=sys.stderr)
                continue
            seq = db[name.encode()].decode()
            if end < 1:
                end = len(seq)
            if tagged:
                out.write(">" + "_".join(
                    [name, "F" if fwd else "R", str(beg), str(end)]) + "\n")
            else:
                out.write(f">{name}\n")
            if beg < end:
                ss = seq[beg - 1: end]
                if not fwd:
                    ss = ss.translate(_COMP)[::-1]
                for i in range(0, len(ss), width):
                    out.write(ss[i: i + width] + "\n")
    finally:
        db.close()


def pbcluster_haplo(core: str, rows, out=sys.stdout, n_iter: int = 4):
    """Weighted-majority haplotype clustering over an aligned MSA.

    rows: iterable of (name, aligned_seq) with '-' gap chars, all the same
    length; `core` names the reference row.  Each iteration scores every
    row against the current reference (column-weight match count), sorts
    rows best-first, then recomputes the consensus from the top-N rows
    for a shrinking ladder of N — mirroring pbcluster_haplo.pl exactly
    (weights stay 1; the script never updates them).
    """
    seqs = [[name, s.upper(), 0] for name, s in rows]
    ref = next((s for n, s, _ in seqs if n == core), None)
    if not seqs:
        raise ValueError("No sequences")
    if ref is None:
        raise ValueError(f"Cannot find {core}")
    N = len(seqs)
    M = len(ref)

    def call_cns(cnt_top):
        nonlocal ref
        cns = []
        for i in range(M):
            if ref[i] == "-":
                cns.append("-")
                continue
            bases = [(row[1][i], N - j) for j, row in enumerate(seqs)
                     if row[1][i] != "-"]
            acc: dict[str, int] = {}
            for c, w in bases[: min(cnt_top, len(bases))]:
                acc[c] = acc.get(c, 0) + w
            best = ("-", 1)
            for c in sorted(acc):
                if acc[c] > best[1]:
                    best = (c, acc[c])
            cns.append(best[0])
        ref = "".join(cns)
        out.write(f"REF[{cnt_top}]\t{ref}\n")

    for _ in range(n_iter):
        for row in seqs:
            row[2] = sum(1 for a, b in zip(ref, row[1]) if a == b and a != "-")
        seqs.sort(key=lambda r: -r[2])
        par, lst = 1, -1
        while True:
            cnt = N // par
            par += 1
            if cnt < 3:
                break
            if cnt == lst:
                continue
            lst = cnt
            call_cns(cnt)
        out.write("\n".join("\t".join(map(str, r)) for r in seqs) + "\n")
    return ref
