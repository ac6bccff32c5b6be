"""Benchmark: SHIMMER index throughput per chip (fused device step).

Prints ONE JSON line:
  {"metric": "index_throughput", "value": <Mbases/s>, "unit": "Mbases/s",
   "vs_baseline": <ratio>}

Baseline: the reference shmr_index (single core, C, L0 output off) measured
at 90.9 Mbases/s on this machine (3000 x 15 kb synthetic reads; see
scripts/build_reference.sh + BASELINE.md).  If the reference binary is
available the baseline is re-measured live; otherwise the recorded constant
is used.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REF_BASELINE_MBASES_S = 90.9  # measured 2026-08-17, .ref_build/shmr_index, 1 core


def measure_reference(tmpdir: str) -> float | None:
    ref_bin = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           ".ref_build", "shmr_index")
    if not os.path.exists(ref_bin):
        return None
    from peregrine_tpu.io.seqdb import SeqDB
    rng = np.random.default_rng(0)
    b2a = np.frombuffer(b"ACGT", np.uint8)
    reads = [(f"r{i}", b2a[rng.integers(0, 4, 15000)].tobytes())
             for i in range(2000)]
    db = SeqDB.from_reads(reads)
    prefix = os.path.join(tmpdir, "seq_dataset")
    db.save(prefix)
    t0 = time.time()
    subprocess.run([ref_bin, "-p", prefix, "-t", "1", "-c", "1",
                    "-o", os.path.join(tmpdir, "shmr"), "-m", "0"],
                   check=True, capture_output=True)
    return float(db.lengths.sum()) / (time.time() - t0) / 1e6


def main() -> None:
    import peregrine_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    from peregrine_tpu.ops.index import index_step

    B, L = 8192, 32768
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))
    lengths = jnp.asarray(np.full(B, L, np.int32))
    rids = jnp.asarray(np.arange(B, dtype=np.uint32))

    def step():
        return index_step(codes, lengths, rids, w=80, k=16, r=6, levels=2,
                          cap=L // 8)

    jax.block_until_ready(step())  # compile + warm
    n = 6
    t0 = time.time()
    for _ in range(n):
        out = step()
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    mbases = B * L / dt / 1e6

    baseline = REF_BASELINE_MBASES_S
    try:
        import tempfile
        with tempfile.TemporaryDirectory() as td:
            live = measure_reference(td)
        if live:
            baseline = live
    except Exception:
        pass

    print(json.dumps({"metric": "index_throughput",
                      "value": round(mbases, 1),
                      "unit": "Mbases/s",
                      "vs_baseline": round(mbases / baseline, 2)}))


if __name__ == "__main__":
    sys.exit(main())
