"""Overlap-stage benchmark: legacy hash-chunked vs global-dedup path.

    python scripts/bench_overlap_dedup.py [--genome-mb 12] [--coverage 30]
        [--workers 2] [--cpu]

Measures, on one simulated dataset: the single-chunk sequential baseline,
the legacy chunked path at n_chunks=workers, and overlap_all_spec at
several (window, per_pair) settings — wall, accepted records, speculative
request count, replay misses.  Asserts dedup output equals 1-chunk output.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-mb", type=float, default=12.0)
    ap.add_argument("--coverage", type=float, default=30.0)
    ap.add_argument("--read-len", type=int, default=15000)
    ap.add_argument("--workers", type=int, default=os.cpu_count() or 1)
    ap.add_argument("--cpu", action="store_true")
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
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    import numpy as np
    from peregrine_tpu.config import AsmConfig
    from peregrine_tpu.io.seqdb import SeqDB
    from peregrine_tpu.ops.index import build_index
    from peregrine_tpu.ops.overlap import (build_pairs, overlap_all,
                                           overlap_all_spec,
                                           overlap_chunk_native)
    from simdata import random_genome, simulate_reads

    cfg = AsmConfig(sketch_pad_len=32768, sketch_batch=256)
    from peregrine_tpu.ops.index import ShimmerIndex
    wd = f"/tmp/dedup_bench_{args.genome_mb:g}mb_{args.coverage:g}x"
    if os.path.exists(wd + "/seq.idx"):
        print(f"reusing cached dataset {wd}", flush=True)
        db = SeqDB.open(wd + "/seq")
        idx = ShimmerIndex.load_chunks([wd + "/shmr-L2-01-of-01.dat"],
                                       [wd + "/shmr-L2-MC-01-of-01.dat"])
    else:
        rng = np.random.default_rng(42)
        genome = random_genome(rng, int(args.genome_mb * 1e6))
        reads, _ = simulate_reads(rng, genome, read_len=args.read_len,
                                  coverage=args.coverage,
                                  len_sd=args.read_len // 10,
                                  error=0.01, circular_wrap=40000)
        print(f"{len(reads)} reads, "
              f"{sum(len(s) for _, s in reads) / 1e6:.0f} Mbases", flush=True)
        db = SeqDB.from_reads(reads)
        t0 = time.time()
        idx = build_index(db, cfg)
        print(f"index: {time.time() - t0:.1f}s", flush=True)
        os.makedirs(wd, exist_ok=True)
        db.save(wd + "/seq")
        idx.save(wd + "/shmr", level=2)

    t0 = time.time()
    base, _ = overlap_chunk_native(db, idx, cfg)
    t_base = time.time() - t0
    print(f"1-chunk sequential: {t_base:.1f}s, {len(base)} records",
          flush=True)

    W = args.workers
    t0 = time.time()
    legacy = overlap_all(db, idx, cfg, n_chunks=W, n_workers=W, dedup=False)
    print(f"legacy chunked (n={W}): {time.time() - t0:.1f}s, "
          f"{len(legacy)} records", flush=True)

    pairs = build_pairs(idx, db.lengths, 1, 1, cfg.mc_lower, cfg.mc_upper,
                        cfg.min_anchor_dist)
    for window, per_pair in ((8, 1), (12, 1), (6, 1)):
        t0 = time.time()
        got = overlap_all_spec(db, idx, cfg, n_workers=W, window=window,
                               per_pair=per_pair, pairs=pairs)
        dt = time.time() - t0
        same = (len(got) == len(base)
                and bool(np.array_equal(
                    got.view(np.uint8).reshape(len(got), -1),
                    base.view(np.uint8).reshape(len(base), -1))))
        print(f"dedup w={window} pp={per_pair} (workers={W}): {dt:.1f}s, "
              f"{len(got)} records, identical={same}", flush=True)
        assert same


if __name__ == "__main__":
    main()
