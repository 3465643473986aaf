"""Command-line interface — stage commands mirroring the reference CLIs.

  sdtpu pre    — wtpre    (subread selection / jackknife / rename)
  sdtpu zmo    — wtzmo    (all-vs-all overlap, dot-matrix engine)
  sdtpu clp    — wtclp    (read clipping / chimera filtering)
  sdtpu lay    — wtlay    (string-graph / BOG layout)
  sdtpu cns    — wtcns    (DAG consensus)
  sdtpu mer    — wtmer    (k-mer frequency histogram)
  sdtpu asm    — smartdenovo.pl (full dmo pipeline)

Stage files keep the reference formats (17-col .ovl TSV, clip mask TSV,
.lay/.utg layout) so outputs are interchangeable with the reference
binaries stage by stage.
"""

from __future__ import annotations

import argparse
import sys


def _add_pre(sub):
    q = sub.add_parser("pre", help="preprocess reads (wtpre)")
    q.add_argument("inputs", nargs="+")
    q.add_argument("-o", "--output", default="-")
    q.add_argument("-J", "--min-len", type=int, default=0)
    q.add_argument("-c", "--clip", type=int, default=0)
    q.add_argument("-L", "--keep-all", action="store_true")
    q.add_argument("-p", "--prefix", default="pb")


def _add_zmo(sub):
    q = sub.add_parser("zmo", help="all-vs-all overlap (wtzmo, dot-matrix)")
    q.add_argument("-i", "--input", required=True, nargs="+")
    q.add_argument("-o", "--output", required=True)
    q.add_argument("-k", "--ksize", type=int, default=16)
    q.add_argument("-z", "--zsize", type=int, default=10)
    q.add_argument("-Z", "--zmax", type=int, default=16)
    q.add_argument("-m", "--min-id", type=float, default=0.1)
    q.add_argument("-s", "--min-score", type=int, default=200)
    q.add_argument("-A", "--ncand", type=int, default=1000)
    q.add_argument("-J", "--min-len", type=int, default=0)
    q.add_argument("-G", "--gparts", type=int, default=1,
                   help="build the kmer index in G read-block passes to "
                        "cap index memory (reference -G)")
    q.add_argument("-n", "--refine", action="store_true",
                   help="refine each SW hit's alignment (reference -n)")
    q.add_argument("-e", "--engine", choices=("dm", "sw"), default="dm")
    q.add_argument("--batch-q", type=int, default=64)
    q.add_argument("-P", "--parts", type=int, default=1,
                   help="split queries across P nodes (reference -P)")
    q.add_argument("-p", "--part", type=int, default=0,
                   help="this node's part index (reference -p)")


def _add_clp(sub):
    q = sub.add_parser("clp", help="clip reads (wtclp)")
    q.add_argument("-i", "--input", required=True, nargs="+")
    q.add_argument("-o", "--output", required=True)
    q.add_argument("-d", "--min-dep", type=int, default=3)
    q.add_argument("-k", "--bin-size", type=int, default=50)
    q.add_argument("-m", "--min-id", type=float, default=0.6)
    q.add_argument("-F", "--whole", action="store_true")
    q.add_argument("-T", "--block-test", action="store_true")


def _add_lay(sub):
    q = sub.add_parser("lay", help="layout unitigs (wtlay)")
    q.add_argument("-i", "--reads", required=True, nargs="+")
    q.add_argument("-j", "--overlaps", required=True, nargs="+")
    q.add_argument("-b", "--clips", default=None)
    q.add_argument("-o", "--output", required=True)
    q.add_argument("-s", "--min-score", type=int, default=200)
    q.add_argument("-m", "--min-id", type=float, default=0.1)
    q.add_argument("-w", "--margin", type=int, default=300)
    q.add_argument("-r", "--best-score-cutoff", type=float, default=0.95)
    q.add_argument("-c", "--edgecov", type=int, default=1)
    q.add_argument("-g", "--dot", action="store_true",
                   help="write {output}.{N}.dot graphviz dumps at each "
                        "'g' phase (wtlay print_dot_strgraph)")


def _add_cns(sub):
    q = sub.add_parser("cns", help="consensus (wtcns)")
    q.add_argument("-i", "--layout", required=True)
    q.add_argument("-o", "--output", default="-")
    q.add_argument("-n", "--iterations", type=int, default=6)
    q.add_argument("-a", "--aln-out", default=None,
                   help="align reads against final consensus, write here (wtcns -a)")
    q.add_argument("-V", "--vmsa", type=float, default=None,
                   help="variant matrix in -a output; 2.05 = min count 2, "
                        "min freq 0.05 (wtcns -V)")


def _add_mer(sub):
    q = sub.add_parser("mer", help="k-mer histogram (wtmer)")
    q.add_argument("inputs", nargs="+")
    q.add_argument("-k", "--ksize", type=int, default=16)
    q.add_argument("-H", "--no-hz", action="store_true")


def _add_util(sub):
    q = sub.add_parser("n50", help="contiguity stats (seq_n50.pl)")
    q.add_argument("inputs", nargs="+")
    q = sub.add_parser("fq2fa", help="FASTQ -> FASTA (fq2fa.pl)")
    q.add_argument("inputs", nargs="+")
    q.add_argument("-o", "--output", default="-")
    q = sub.add_parser("pairaln", help="align two sequences (pairaln)")
    q.add_argument("inputs", nargs="+", help="FASTA with pairs of reads")
    q = sub.add_parser("cyc", help="self-revcomp palindrome mask (wtcyc)")
    q.add_argument("inputs", nargs="+")
    q.add_argument("-o", "--output", default="-")
    q.add_argument("-s", "--min-score", type=int, default=400)
    q.add_argument("-m", "--min-id", type=float, default=0.7)
    q = sub.add_parser("dif", help="variants of reads vs first read (wtdif)")
    q.add_argument("inputs", nargs="+")
    q = sub.add_parser("dotplot", help="zmer dot-plot dump for 2 reads "
                                       "(hzm_aln debug_dot_plot)")
    q.add_argument("inputs", nargs="+")
    q.add_argument("-o", "--output", default="dot_plot")
    q = sub.add_parser("idx", help="build + snapshot the overlap indexes (wtidx)")
    q.add_argument("inputs", nargs="+")
    q.add_argument("-o", "--output", required=True)
    q = sub.add_parser("dbmidx", help="random-access FASTA store (dbm_index_fa.pl)")
    q.add_argument("fasta")
    q = sub.add_parser("dbmget", help="fetch reads from a dbm store "
                                      "(dbm_read_fa.pl; tags name[+:b,e])")
    q.add_argument("dbm")
    q.add_argument("tags", nargs="*")
    q = sub.add_parser("haplo", help="haplotype MSA clustering "
                                     "(pbcluster_haplo.pl)")
    q.add_argument("core", help="reference read name in the MSA")
    q.add_argument("msa", help="TSV: name <tab> aligned-seq per line")


def _add_asm(sub):
    q = sub.add_parser("asm", help="full assembly (smartdenovo.pl)")
    q.add_argument("inputs", nargs="+")
    q.add_argument("-p", "--prefix", default="wtasm")
    q.add_argument("-e", "--engine", choices=("dmo", "zmo"), default="dmo")
    q.add_argument("-J", "--min-len", type=int, default=5000)
    q.add_argument("-c", "--consensus", type=int, default=0)
    q.add_argument("--cns-engine", choices=("dag", "poa"), default="dag")
    q.add_argument("--batch-q", type=int, default=16)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="sdtpu", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    for f in (_add_pre, _add_zmo, _add_clp, _add_lay, _add_cns, _add_mer, _add_util, _add_asm):
        f(sub)
    args = ap.parse_args(argv)

    if args.cmd == "pre":
        from .pipeline.pre import run_pre

        run_pre(args.inputs, args.output, min_len=args.min_len, clip=args.clip,
                longest=not args.keep_all, prefix=args.prefix)
        return 0

    if args.cmd == "zmo":
        from .data.readbank import ReadBank
        from .pipeline.zmo import ZmoParams, overlap_dmo, write_overlaps
        from .utils.cache import enable_compilation_cache

        enable_compilation_cache()
        rb = ReadBank.from_fasta(args.input, min_len=args.min_len)
        mk = ZmoParams.zmo if args.engine == "sw" else ZmoParams.dmo
        p = mk(ksize=args.ksize, zsize=args.zsize,
               max_zmer_freq=args.zmax, min_id=args.min_id,
               min_score=args.min_score, ncand=args.ncand,
               batch_q=args.batch_q, gparts=args.gparts, refine=args.refine)
        ovls = overlap_dmo(rb, p, parts=args.parts, part=args.part)
        write_overlaps(args.output, rb, ovls)
        return 0

    if args.cmd == "clp":
        from .graph.clip import ClpParams, run_clp, write_clp

        def records():
            for path in args.input:
                with open(path) as fh:
                    for line in fh:
                        if line.startswith("#"):
                            continue
                        c = line.rstrip("\n").split("\t")
                        if len(c) < 12:
                            continue
                        yield (c[0], int(c[1] == "-"), int(c[2]), int(c[3]), int(c[4]),
                               c[5], int(c[6] == "-"), int(c[7]), int(c[8]), int(c[9]),
                               int(c[10]), float(c[11]))

        p = ClpParams(min_crs_dep=args.min_dep, bin_size=args.bin_size,
                      min_sm=args.min_id, whole=args.whole,
                      block_test=args.block_test)
        clips = run_clp(records(), p)
        write_clp(args.output, clips)
        return 0

    if args.cmd == "lay":
        from .data.readbank import ReadBank
        from .graph.clip import read_clp
        from .graph.stringgraph import LayParams, run_lay
        from .pipeline.zmo import Overlap

        rb = ReadBank.from_fasta(args.reads, use_qual=True)
        if args.clips:
            clips = read_clp(args.clips)
            # whole-read mode: drop zero-length reads
            drop = {n for n, (o, ln) in clips.items() if ln <= 0}
            names = [n for n in rb.names if n not in drop]
            rb = ReadBank(names, [rb.get(rb.name2id[n]).copy() for n in names])
        ovls = []
        for path in args.overlaps:
            with open(path) as fh:
                for line in fh:
                    if line.startswith("#"):
                        continue
                    c = line.rstrip("\n").split("\t")
                    if len(c) < 16:
                        continue
                    i1 = rb.name2id.get(c[0])
                    i2 = rb.name2id.get(c[5])
                    if i1 is None or i2 is None:
                        continue
                    ovls.append(Overlap(
                        rid1=i1, dir1=int(c[1] == "-"), beg1=int(c[3]), end1=int(c[4]),
                        rid2=i2, dir2=int(c[6] == "-"), beg2=int(c[8]), end2=int(c[9]),
                        score=int(c[10]), identity=float(c[11]), mat=int(c[12]),
                        mis=int(c[13]), ins=int(c[14]), dl=int(c[15]), aln=0,
                    ))
        p = LayParams.dmo(min_score=args.min_score, min_id=args.min_id,
                          margin=args.margin,
                          best_score_cutoff=args.best_score_cutoff,
                          edgecov_cutoff=args.edgecov,
                          dot_prefix=args.output if args.dot else "")
        g = run_lay(rb, ovls, p)
        with open(args.output, "w") as lay_fh, open(args.output + ".utg", "w") as utg_fh, \
             open(args.output + ".dup", "w") as dl, open(args.output + ".utg.dup", "w") as du:
            g.output_layout(lay_fh, utg_fh, dl, du, utg_sm=p.utg_sm)
        return 0

    if args.cmd == "cns":
        from .pipeline.cns import CnsParams, parse_lay_file, run_cns, write_cns
        from .utils.cache import enable_compilation_cache

        enable_compilation_cache()
        units = parse_lay_file(args.layout)
        res = run_cns(units, CnsParams(n_iter=args.iterations),
                      aln_path=args.aln_out, vmsa=args.vmsa)
        if args.output == "-":
            from .data.readbank import codes_to_seq

            for name, codes in res:
                sys.stdout.write(f">{name} len={len(codes)}\n{codes_to_seq(codes)}\n")
        else:
            write_cns(args.output, res)
        return 0

    if args.cmd == "mer":
        from .pipeline.mer import run_mer

        run_mer(args.inputs, ksize=args.ksize, hz=not args.no_hz)
        return 0

    if args.cmd == "n50":
        from .utils.stats import print_n50

        print_n50(args.inputs)
        return 0

    if args.cmd == "fq2fa":
        from .io.fasta import read_seqs, write_fasta

        out = sys.stdout if args.output == "-" else open(args.output, "w")
        for tag, desc, seq in read_seqs(args.inputs):
            write_fasta(out, tag + desc, seq)
        if out is not sys.stdout:
            out.close()
        return 0

    if args.cmd == "pairaln":
        from .pipeline.aln_tools import run_pairaln

        run_pairaln(args.inputs)
        return 0

    if args.cmd == "cyc":
        from .pipeline.aln_tools import run_cyc

        run_cyc(args.inputs, args.output, min_score=args.min_score,
                min_id=args.min_id)
        return 0

    if args.cmd == "dif":
        from .pipeline.aln_tools import run_dif

        run_dif(args.inputs)
        return 0

    if args.cmd == "dotplot":
        from .pipeline.aln_tools import run_dotplot

        n = run_dotplot(args.inputs, args.output)
        print(f"{n} matches -> {args.output}.fwd.txt / .rev.txt",
              file=sys.stderr)
        return 0

    if args.cmd == "idx":
        from .pipeline.idx import build_and_save_indexes

        build_and_save_indexes(args.inputs, args.output)
        return 0

    if args.cmd == "dbmidx":
        from .utils.dbmfa import dbm_index_fa

        print(dbm_index_fa(args.fasta))
        return 0

    if args.cmd == "dbmget":
        import sys as _sys

        from .utils.dbmfa import dbm_read_fa

        tags = args.tags or [l.strip() for l in _sys.stdin if l.strip()]
        dbm_read_fa(args.dbm, tags)
        return 0

    if args.cmd == "haplo":
        from .utils.dbmfa import pbcluster_haplo

        rows = []
        with open(args.msa) as fh:
            for line in fh:
                c = line.split()
                if len(c) >= 2:
                    rows.append((c[0], c[1]))
        pbcluster_haplo(args.core, rows)
        return 0

    if args.cmd == "asm":
        from .data.readbank import ReadBank, decode_f5q, seq_to_codes
        from .io.fasta import read_seqs_qual
        from .pipeline.driver import assemble_dmo, write_outputs
        from .pipeline.pre import preprocess
        from .pipeline.zmo import ZmoParams
        from .utils.cache import enable_compilation_cache

        enable_compilation_cache()
        names, seqs, quals = [], [], []
        any_q = False
        for rec in preprocess(read_seqs_qual(args.inputs), min_len=args.min_len):
            names.append(rec[0])
            seqs.append(seq_to_codes(rec[1]))
            if len(rec) > 2:
                quals.append(decode_f5q(rec[2], len(rec[1])))
                any_q = True
            else:
                quals.append(None)
        rb = ReadBank(names, seqs, quals=quals if any_q else None)
        if args.engine == "zmo":
            from .pipeline.driver import assemble_zmo

            res = assemble_zmo(rb, ZmoParams.zmo(batch_q=args.batch_q))
        else:
            res = assemble_dmo(rb, ZmoParams.dmo(batch_q=args.batch_q))
        write_outputs(res, args.prefix + "." + args.engine)
        if args.consensus:
            from .pipeline.cns import units_from_graph, write_cns

            units = units_from_graph(res.graph)
            if args.cns_engine == "poa":
                from .pipeline.msa import run_msa

                cns = run_msa(units)
            else:
                from .pipeline.cns import CnsParams, run_cns

                cns = run_cns(units, CnsParams())
            write_cns(args.prefix + "." + args.engine + ".cns", cns)
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
