"""Parameterized scale run for the BASELINE.md config ladder.

    python scripts/scale_run.py OUTDIR --genome-mb 12 --coverage 30 \
        [--read-len 15000] [--device-overlap] [--cpu]

Simulates a seeded random genome at the requested size (real references
need network access), assembles end-to-end, reports per-stage walls and
final contig identity.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--genome-mb", type=float, default=12.0)
    ap.add_argument("--coverage", type=float, default=30.0)
    ap.add_argument("--read-len", type=int, default=15000)
    ap.add_argument("--error", type=float, default=0.01)
    ap.add_argument("--wrap-kb", type=int, default=40)
    ap.add_argument("--device-overlap", action="store_true")
    ap.add_argument("--hybrid-overlap", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--manifest", action="store_true",
                    help="stream simulated reads to a FASTA + manifest and "
                         "assemble via the bounded-RSS reads_list path "
                         "(reads never materialize in memory)")
    args = ap.parse_args()

    if args.cpu:
        os.environ.setdefault("XLA_FLAGS",
                              "--xla_force_host_platform_device_count=8")
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    import logging
    import numpy as np
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    # start absorbing the remote first-load stall under the (long) read
    # simulation below
    from peregrine_tpu.pipeline.warmup import warm_device_async
    warm_device_async()
    from peregrine_tpu.config import AsmConfig
    from peregrine_tpu.io.seqdb import read_fastx, revcomp
    from peregrine_tpu.native import dw_align
    from peregrine_tpu.pipeline.run import Assembly
    from simdata import random_genome, simulate_reads

    rng = np.random.default_rng(42)
    glen = int(args.genome_mb * 1e6)
    t0 = time.time()
    genome = random_genome(rng, glen)
    os.makedirs(args.outdir, exist_ok=True)
    if args.manifest:
        # stream each simulated read straight to disk (mutate per read),
        # then assemble through the streamed manifest path — reads and
        # the packed seqdb never materialize in RAM
        from simdata import mutate
        from peregrine_tpu.io.seqdb import revcomp as _rc
        g = genome + genome[:args.wrap_kb * 1000]
        n_reads = int(args.coverage * len(g) / args.read_len)
        fa_path = os.path.join(args.outdir, "reads.fa")
        total_bases = 0
        with open(fa_path, "w", buffering=1 << 22) as f:
            for i in range(n_reads):
                rl = max(args.read_len // 3,
                         int(args.read_len + rng.normal(0, args.read_len // 10)))
                s = int(rng.integers(0, max(1, len(g) - rl)))
                seq = mutate(rng, g[s:s + rl], args.error)
                strand = int(rng.integers(0, 2))
                if strand:
                    seq = _rc(seq)
                f.write(f">sim/{i:07d}/{strand}\n{seq.decode()}\n")
                total_bases += len(seq)
        lst = os.path.join(args.outdir, "reads.lst")
        with open(lst, "w") as f:
            f.write(fa_path + "\n")
        reads = None
        print(f"simulated {n_reads} reads to disk "
              f"({total_bases/1e6:.0f} Mbases, {time.time()-t0:.0f}s)",
              flush=True)
    else:
        reads, truth = simulate_reads(
            rng, genome, read_len=args.read_len, coverage=args.coverage,
            len_sd=args.read_len // 10, error=args.error,
            circular_wrap=args.wrap_kb * 1000)
        with open(os.path.join(args.outdir, "truth.tsv"), "w") as f:
            for i, (s, e, strand) in enumerate(truth):
                f.write(f"{i} {s} {e} {strand}\n")
        print(f"simulated {len(reads)} reads "
              f"({sum(len(s) for _, s in reads)/1e6:.0f} Mbases, "
              f"{time.time()-t0:.0f}s)", flush=True)

    cfg = AsmConfig(sketch_pad_len=32768, sketch_batch=256,
                    use_device_aligner=args.device_overlap,
                    hybrid_overlap=args.hybrid_overlap)
    asm = Assembly(args.outdir, cfg)
    stages = []

    def _stage0():
        if reads is None:
            return asm.build_db(reads_list=os.path.join(args.outdir,
                                                        "reads.lst"))
        return asm.build_db(reads=reads)

    for name, fn in (("seqdb", _stage0),
                     ("index", asm.build_shimmer_index),
                     ("overlap", asm.build_overlaps),
                     ("layout", asm.build_contigs),
                     ("consensus", asm.build_consensus)):
        t0 = time.time()
        fn()
        stages.append((name, round(time.time() - t0, 1)))
        print(f"=== {name}: {stages[-1][1]}s", flush=True)

    fa = os.path.join(args.outdir, "4-cns", "p_ctg_cns.fa")
    ctgs = dict(read_fastx(fa))
    sizes = sorted((len(v) for v in ctgs.values()), reverse=True)
    print(f"contigs: {len(ctgs)}, sizes: {sizes[:8]}", flush=True)

    # identity: exact-substring first (the greedy aligner overcounts on
    # multi-Mb spans), then blockwise alignment with re-anchoring
    g2 = genome + genome
    longest = max(ctgs.values(), key=len).upper()
    for cand, tag in ((longest, "fwd"), (revcomp(longest), "rc")):
        if g2.find(cand) >= 0:
            print(f"{tag}: EXACT substring of genome — 100% identity "
                  f"({len(cand):,} bases)", flush=True)
            break
        p = g2.find(cand[1000:1064])
        if p < 0:
            continue
        p -= 1000
        ref = g2[max(p, 0):p + len(cand) + 50000]
        qpos = tpos = total = 0
        while qpos < len(cand) - 1000:
            a = dw_align(cand[qpos:qpos + 2_000_000],
                         ref[tpos:tpos + 2_050_000], 2000, get_aln_str=False)
            if a.aln_q_e == 0:
                break
            total += a.dist
            qpos += a.aln_q_e
            tpos += a.aln_t_e
        print(f"{tag}: blockwise dist={total} over {qpos:,} bases "
              f"identity={1 - total/max(qpos, 1):.9f}", flush=True)
        break
    print("stage walls:", dict(stages))


if __name__ == "__main__":
    main()
