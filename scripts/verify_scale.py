"""Full-coverage exact verification of a completed scale_run outdir.

    python scripts/verify_scale.py OUTDIR --genome-mb 1000 [--wrap-kb 40]

Regenerates the seeded simulated genome (seed 42, matching
scale_run.py) and verifies every consensus contig with the exact
Landau-Vishkin verifier (peregrine_tpu/verify.py) — true Levenshtein
distance, every base covered.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--genome-mb", type=float, required=True)
    ap.add_argument("--fasta", default=None,
                    help="contig FASTA (default OUTDIR/4-cns/p_ctg_cns.fa)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from peregrine_tpu.verify import verify_fasta
    from simdata import random_genome

    rng = np.random.default_rng(42)
    t0 = time.time()
    genome = random_genome(rng, int(args.genome_mb * 1e6))
    print(f"genome regenerated ({len(genome):,} bases, "
          f"{time.time()-t0:.0f}s)", flush=True)
    fa = args.fasta or os.path.join(args.outdir, "4-cns", "p_ctg_cns.fa")
    t0 = time.time()
    for r in verify_fasta(fa, genome, circular=True):
        if not r["anchored"]:
            print(f"{r['name']}: FAILED to anchor", flush=True)
            continue
        print(f"{r['name']} [{r['orientation']}]: exact dist="
              f"{r['distance']} over {r['length']:,} bases "
              f"identity={r['identity']:.10f} "
              f"segments={r['segments'][:20]}"
              f"{'...' if len(r['segments']) > 20 else ''}", flush=True)
    print(f"verify wall: {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
