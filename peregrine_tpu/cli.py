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
import os
import sys


def _honor_jax_platforms() -> None:
    """Apply the JAX_PLATFORMS env var through the config API: an
    environment sitecustomize that pre-imports jax and pins a backend
    (e.g. the axon remote runtime) makes jax ignore the env var, so
    `JAX_PLATFORMS=cpu pg-tpu ...` would silently run on the pinned
    backend.  The config API still works before first device use."""
    import os
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass  # backend already initialized: keep whatever it is


def main(argv=None) -> int:
    _honor_jax_platforms()
    from .config import DEFAULT

    p = argparse.ArgumentParser(
        prog="pg-tpu",
        description="TPU-native OLC assembler for accurate long reads")
    sub = p.add_subparsers(dest="cmd", required=True)

    asm = sub.add_parser("asm", help="assemble reads into contigs")
    asm.add_argument("reads_lst", help="file listing FASTA/FASTQ(.gz) read files")
    asm.add_argument("--output", default="./wd", help="output directory")
    asm.add_argument("--with-consensus", action="store_true",
                     help="polish draft contigs with read consensus")
    # defaults come from AsmConfig — the single source of truth — so the
    # reference's triplicated-default drift (SURVEY §5) cannot recur here
    asm.add_argument("--shimmer-k", type=int, default=DEFAULT.k, dest="k")
    asm.add_argument("--shimmer-w", type=int, default=DEFAULT.w, dest="w")
    asm.add_argument("--shimmer-r", type=int, default=DEFAULT.r, dest="r")
    asm.add_argument("--shimmer-l", type=int, default=DEFAULT.levels,
                     dest="levels", help="SHIMMER reduction levels (1 or 2)")
    asm.add_argument("--best_n_ovlp", type=int, default=DEFAULT.best_n_ovlp)
    asm.add_argument("--mc_lower", type=int, default=DEFAULT.mc_lower)
    asm.add_argument("--mc_upper", type=int, default=DEFAULT.mc_upper)
    asm.add_argument("--aln_bw", type=int, default=DEFAULT.aln_bw)
    asm.add_argument("--ovlp_upper", type=int, default=DEFAULT.ovlp_upper)
    asm.add_argument("--min_len", type=int, default=DEFAULT.min_len)
    asm.add_argument("--min_idt", type=float, default=DEFAULT.min_idt)
    asm.add_argument("--lfc", action="store_true",
                     help="local-flow-consistency repeat resolution")
    asm.add_argument("--disable_chimer_bridge_removal", action="store_true")
    asm.add_argument("--with-alt", action="store_true",
                     help="emit alternate (bubble) contigs a_ctg.fa")
    asm.add_argument("--with-L0-index", action="store_true", dest="with_l0",
                     help="also write the level-0 SHIMMER index")
    asm.add_argument("--n_chunks", type=int, default=None,
                     help="overlap hash chunks (default: auto)")
    asm.add_argument("--n_workers", type=int, default=None,
                     help="overlap/consensus worker processes (default: auto)")
    asm.add_argument("--device-aligner", action="store_true",
                     help="run overlap confirmation on the TPU (batched "
                          "banded Myers) instead of host cores.  NOTE: the "
                          "device kernel reports optimal edit distances where "
                          "the host aligner is greedy, so accept decisions "
                          "differ slightly (~97.5%% pair agreement with the "
                          "host backend; contig-level output is equivalent "
                          "but not byte-identical)")
    asm.add_argument("--hybrid-overlap", action="store_true",
                     help="align overlap chunks on the TPU and host cores "
                          "concurrently (work-stealing chunk queue).  Same "
                          "output caveat as --device-aligner")
    asm.add_argument("--shard-overlap", action="store_true",
                     help="shard the seqdb across all devices and route "
                          "alignment requests over ICI (for dbs larger "
                          "than one chip's HBM); implies --device-aligner")
    asm.add_argument("--spill-dir", default=None,
                     help="back the overlap pair map / bucket stream with "
                          "unlinked files in this directory instead of "
                          "anonymous memory (bounded-RSS mode for hosts "
                          "smaller than the dataset; output unchanged)")
    asm.add_argument("--mem-budget", default=None,
                     help="host anonymous-memory budget in bytes (e.g. "
                          "32e9) for the overlap stage; spill engages "
                          "automatically past it.  Default: 85%% of "
                          "MemAvailable (self-sizing; equals setting "
                          "PG_MEM_BUDGET)")
    asm.add_argument("--device-pairs", action="store_true",
                     help="build the overlap pair map on the TPU (byte-"
                          "identical output; wins on locally-attached "
                          "chips, loses to the threaded host build when "
                          "the device link is a remote tunnel)")
    asm.add_argument("--profile-dir", default=None,
                     help="write a jax.profiler trace of the run here")
    asm.add_argument("--mesh", action="store_true",
                     help="run the index stage sharded over all devices "
                          "(data-parallel sketch + hash all_to_all); output "
                          "is identical to the single-device build")
    asm.add_argument("--multihost", action="store_true",
                     help="run under jax.distributed (launch one process "
                          "per host with JAX coordinator env vars or "
                          "TPU-pod metadata set): rank 0 executes the "
                          "host stages and writes outputs, every rank "
                          "executes stage 1 over the global device mesh")
    asm.add_argument("--on-config-change", default="error",
                     choices=("error", "clean", "ignore"),
                     help="resuming an outdir built with a different config: "
                          "refuse (error), invalidate stages 1-4 (clean), "
                          "or trust the caller (ignore)")
    asm.add_argument("-v", "--verbose", action="store_true")

    mp = sub.add_parser("map", help="map reads to a reference "
                        "(shmr_map equivalent)")
    mp.add_argument("ref_prefix", help="reference seqdb prefix")
    mp.add_argument("read_prefix", help="read seqdb prefix")
    mp.add_argument("--output", default="-", help="output path (- = stdout)")
    mp.add_argument("--shimmer-k", type=int, default=16, dest="k")
    mp.add_argument("--shimmer-w", type=int, default=80, dest="w")
    mp.add_argument("--shimmer-r", type=int, default=6, dest="r")
    mp.add_argument("--shimmer-l", type=int, default=2, dest="levels")

    sq = sub.add_parser("seqdb", help="build a packed seqdb from a read list "
                        "(shmr_mkseqdb equivalent)")
    sq.add_argument("reads_lst")
    sq.add_argument("prefix")

    dp = sub.add_parser("dump-index", help="print SHIMMER index records as "
                        "text (py-utils dumper equivalent)")
    dp.add_argument("mmlist", help="a *-L?-cc-of-tt.dat file")
    dp.add_argument("--limit", type=int, default=0)

    st = sub.add_parser("stats", help="summarize a working directory: seqdb "
                        "read stats, SHIMMER index density + multiplicity "
                        "histogram, overlap degree (the process_L2-style "
                        "analyses from the reference's py-utils, as one "
                        "command)")
    st.add_argument("workdir", help="assembly output dir (or a seqdb prefix "
                    "with --prefix)")
    st.add_argument("--prefix", action="store_true",
                    help="treat WORKDIR as a seqdb prefix instead")

    gm = sub.add_parser("gather-mc", help="merge per-chunk minimizer-count "
                        "files (shmr_gather_mc equivalent)")
    gm.add_argument("mc_files", nargs="+", help="*-MC-cc-of-tt.dat files")
    gm.add_argument("--output", required=True, help="merged -MC-all.dat path")

    args = p.parse_args(argv)
    logging.basicConfig(
        level=logging.DEBUG if getattr(args, "verbose", False) else logging.INFO,
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
            disable_chimer_bridge_removal=args.disable_chimer_bridge_removal,
            use_device_aligner=args.device_aligner or args.shard_overlap,
            hybrid_overlap=args.hybrid_overlap,
            shard_overlap=args.shard_overlap, mesh=args.mesh,
            device_pairs=args.device_pairs, spill_dir=args.spill_dir)
        if args.mem_budget is not None:
            os.environ["PG_MEM_BUDGET"] = str(int(float(args.mem_budget)))
        if args.multihost:
            import jax

            from .parallel.distributed import init_distributed
            if jax.process_count() == 1:
                init_distributed()  # env/pod-metadata driven
            asm_obj = Assembly(args.output, cfg.replace(mesh=True),
                               with_alt=args.with_alt,
                               on_config_change=args.on_config_change)
            fa = asm_obj.run_multihost(args.reads_lst,
                                       with_consensus=args.with_consensus)
            if fa:
                print(fa)
            return 0
        asm_obj = Assembly(args.output, cfg, with_alt=args.with_alt,
                           on_config_change=args.on_config_change)
        if args.profile_dir:
            import jax
            jax.profiler.start_trace(args.profile_dir)
        try:
            asm_obj.build_db(reads_list=args.reads_lst)
            if args.with_l0:
                from .ops.index import build_index
                idx, l0 = build_index(asm_obj.db, cfg, keep_l0=True)
                prefix = f"{args.output}/1-index/shmr"
                idx.save(prefix, level=cfg.levels)
                l0.save(prefix, level=0)
                asm_obj.idx = idx
            else:
                asm_obj.build_shimmer_index()
            asm_obj.build_overlaps(args.n_chunks, args.n_workers)
            fa = asm_obj.build_contigs()
            if args.with_consensus:
                fa = asm_obj.build_consensus(args.n_workers)
        finally:
            if args.profile_dir:
                import jax
                jax.profiler.stop_trace()
        print(fa)
        return 0

    if args.cmd == "map":
        import numpy as np
        from .config import AsmConfig
        from .io.seqdb import SeqDB
        from .ops.index import build_index
        from .ops.mapping import map_reads_to_ref

        cfg = AsmConfig(k=args.k, w=args.w, r=args.r, levels=args.levels)
        ref_db = SeqDB.open(args.ref_prefix)
        read_db = SeqDB.open(args.read_prefix)
        ref_idx = build_index(ref_db, cfg)
        read_idx = build_index(read_db, cfg)
        rows = map_reads_to_ref(read_idx, read_db.lengths, ref_idx, cfg)
        out = sys.stdout if args.output == "-" else open(args.output, "w")
        try:
            for r in rows:
                print(" ".join(str(int(v)) for v in r), file=out)
        finally:
            if out is not sys.stdout:
                out.close()
        return 0

    if args.cmd == "seqdb":
        from .io.seqdb import SeqDB
        # streamed: peak RSS stays bounded regardless of dataset size
        SeqDB.build_to_disk(args.reads_lst, args.prefix)
        return 0

    if args.cmd == "dump-index":
        from .io import formats
        x, y = formats.read_mmlist(args.mmlist)
        n = args.limit or len(x)
        for i in range(min(n, len(x))):
            xi, yi = int(x[i]), int(y[i])
            print(f"{xi >> 8} {xi & 0xFF} {yi >> 32} "
                  f"{(yi & 0xFFFFFFFF) >> 1} {yi & 1}")
        return 0

    if args.cmd == "stats":
        import glob as _glob
        import os

        import numpy as np

        from .io import formats
        from .io.seqdb import SeqDB

        if args.prefix:
            prefix, mms, ovl = args.workdir, [], None
        else:
            prefix = os.path.join(args.workdir, "0-seqdb", "seq_dataset")
            mms = sorted(_glob.glob(
                os.path.join(args.workdir, "1-index", "*-L?-*-of-*.dat")))
            mms = [p for p in mms if "-MC-" not in p]
            ovl = os.path.join(args.workdir, "2-ovlp", "preads.ovl")
        db = SeqDB.open(prefix)
        lens = np.sort(db.lengths)[::-1]
        half = lens.sum() / 2
        n50 = int(lens[np.searchsorted(np.cumsum(lens), half)])
        print(f"seqdb: {len(db)} reads, {int(lens.sum())} bases, "
              f"mean {lens.mean():.0f}, N50 {n50}, max {int(lens[0])}")
        for mm in mms:
            x, y = formats.read_mmlist(mm)
            if not len(x):
                continue
            dens = 1000.0 * len(x) / lens.sum()
            h, c = np.unique(x >> np.uint64(8), return_counts=True)
            hist = np.bincount(np.minimum(c, 10))
            print(f"{os.path.basename(mm)}: {len(x)} SHIMMERs "
                  f"({dens:.2f}/kb), {len(h)} distinct; multiplicity "
                  "histogram (1..9,10+): "
                  + " ".join(str(int(v)) for v in hist[1:]))
        if ovl and os.path.exists(ovl):
            rid0 = []
            with open(ovl, "rb") as f:
                for ln in f:
                    if ln.startswith(b"-"):
                        break
                    rid0.append(int(ln.split(b" ", 1)[0]))
            deg = np.bincount(np.asarray(rid0, np.int64),
                              minlength=len(db))
            print(f"overlaps: {len(rid0)} records; per-read out-degree "
                  f"mean {deg.mean():.1f}, median {int(np.median(deg))}, "
                  f"zero-degree reads {(deg == 0).sum()}")
        return 0

    if args.cmd == "gather-mc":
        # merge per-chunk minimizer-count files into one, summing counts
        # per mer (reference shmr_gather_mc, src/shmr_gather_mc.c:61-82 /
        # aggregate_mm_count, src/shmr_utils.c:162-176)
        import numpy as np

        from .io import formats
        mers, counts = [], []
        for p in args.mc_files:
            m, c = formats.read_mm_count(p)
            mers.append(m)
            counts.append(c)
        m = np.concatenate(mers) if mers else np.zeros(0, np.uint64)
        c = np.concatenate(counts) if counts else np.zeros(0, np.uint32)
        um, inv = np.unique(m, return_inverse=True)
        uc = np.zeros(len(um), np.uint64)
        np.add.at(uc, inv, c.astype(np.uint64))
        formats.write_mm_count(args.output, um, uc.astype(np.uint32))
        print(f"{len(um)} mers from {len(args.mc_files)} chunk files")
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
