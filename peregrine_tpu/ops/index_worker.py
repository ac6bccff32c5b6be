"""Short-lived index-segment worker process.

Why a subprocess: the axon TPU client retains EVERY byte it ever
device_puts in host anonymous memory for the lifetime of the process —
measured directly (BENCH.md r5): 4-bit-db plane uploads leak their full
size into RssAnon and no Python-side lever (Array.delete, gc,
jax.clear_caches, malloc_trim, reused source buffers — the client
snapshots content per put) reclaims it.  A segmented index build over a
90 GB db therefore accretes ~tens of GB of dead staging in the parent
(the round-4 "~65 GB anon mystery").  Running each segment group in a
worker that exits bounds the leak to one group's plane bytes (~2.8 GB
at the default HBM budget), while the persistent, call-path-independent
compilation cache keeps the child's kernels warm.

The worker re-opens the on-disk seqdb (read-only mmap — the reference's
shared data plane, src/shmr_overlap.c:200), indexes one contiguous rid
range against its byte window, and writes the per-segment (x, y) record
arrays atomically.  Output is byte-identical to the in-process segment
(same build_index call; tests/test_index.py).

Usage (spawned by ops.index.build_index_segmented):
    python -m peregrine_tpu.ops.index_worker \
        <db_prefix> <cfg_json_path> <segments_json_path>
where segments_json is [[rid_start, rid_end, byte_lo, byte_hi,
out_prefix], ...] — one worker handles SEVERAL segments (its staging is
bounded by their plane bytes) to amortize the ~tens of seconds of
process spawn + jax init + cached-executable load per child.
PG_WORKER_PLATFORM=cpu forces the CPU backend (tests).
"""

import os
import sys


def main(argv: list[str]) -> int:
    prefix, cfg_path, seg_path = argv
    import jax
    if os.environ.get("PG_WORKER_PLATFORM") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

    import json

    import numpy as np

    import peregrine_tpu  # noqa: F401  (x64 + traceback-free cache keys)
    from peregrine_tpu.config import AsmConfig
    from peregrine_tpu.io.seqdb import SeqDB
    from peregrine_tpu.ops.index import build_index

    with open(cfg_path) as f:
        cfg = AsmConfig.from_json(f.read())
    with open(seg_path) as f:
        segments = json.load(f)
    db = SeqDB.open(prefix)
    for s, e, lo, hi, out_prefix in segments:
        part = build_index(db, cfg, rid_filter=np.arange(int(s), int(e)),
                           db_window=(int(lo), int(hi)))
        for name, arr in (("x", part.x), ("y", part.y)):
            tmp = f"{out_prefix}-{name}.npy.tmp.npy"
            np.save(tmp, arr)
            os.replace(tmp, f"{out_prefix}-{name}.npy")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
