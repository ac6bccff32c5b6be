"""Command-line interface (the reference pg_run.py equivalent).

    pg-tpu asm reads.lst --output ./wd --with-consensus
    pg-tpu asm reads.lst -k 16 -w 80 -r 6 -l 2 --min_len 4000 --min_idt 96

Chunk/process counts from the reference CLI are absent by design: stages
run as batched device kernels plus an in-process host runtime; multi-chip
execution shards over the JAX mesh instead of worker processes.
"""

from __future__ import annotations

import argparse
import logging
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="pg-tpu",
        description="TPU-native OLC assembler for accurate long reads")
    sub = p.add_subparsers(dest="cmd", required=True)

    asm = sub.add_parser("asm", help="assemble reads into contigs")
    asm.add_argument("reads_lst", help="file listing FASTA/FASTQ(.gz) read files")
    asm.add_argument("--output", default="./wd", help="output directory")
    asm.add_argument("--with-consensus", action="store_true",
                     help="polish draft contigs with read consensus")
    asm.add_argument("--shimmer-k", type=int, default=16, dest="k")
    asm.add_argument("--shimmer-w", type=int, default=80, dest="w")
    asm.add_argument("--shimmer-r", type=int, default=6, dest="r")
    asm.add_argument("--shimmer-l", type=int, default=2, dest="levels",
                     help="SHIMMER reduction levels (1 or 2)")
    asm.add_argument("--best_n_ovlp", type=int, default=4)
    asm.add_argument("--mc_lower", type=int, default=2)
    asm.add_argument("--mc_upper", type=int, default=240)
    asm.add_argument("--aln_bw", type=int, default=100)
    asm.add_argument("--ovlp_upper", type=int, default=120)
    asm.add_argument("--min_len", type=int, default=4000)
    asm.add_argument("--min_idt", type=float, default=96.0)
    asm.add_argument("--lfc", action="store_true",
                     help="local-flow-consistency repeat resolution")
    asm.add_argument("--disable_chimer_bridge_removal", action="store_true")
    asm.add_argument("-v", "--verbose", action="store_true")

    args = p.parse_args(argv)
    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format="%(asctime)s %(name)s %(message)s")

    if args.cmd == "asm":
        from .config import AsmConfig
        from .pipeline.run import Assembly

        cfg = AsmConfig(
            k=args.k, w=args.w, r=args.r, levels=args.levels,
            best_n_ovlp=args.best_n_ovlp, mc_lower=args.mc_lower,
            mc_upper=args.mc_upper, aln_bw=args.aln_bw,
            ovlp_upper=args.ovlp_upper, min_len=args.min_len,
            min_idt=args.min_idt, lfc=args.lfc,
            disable_chimer_bridge_removal=args.disable_chimer_bridge_removal)
        fa = Assembly(args.output, cfg).run(
            reads_list=args.reads_lst, with_consensus=args.with_consensus)
        print(fa)
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
