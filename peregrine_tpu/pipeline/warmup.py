"""Per-process device warmup: absorb the remote service's first-load stall.

Measured behavior of the remote (axon) TPU service in bad windows
(CLAUDE.md / BENCH.md): the FIRST big executable a process loads stalls
10-400 s in the service's load/queue path — independent of the persistent
compile cache (no cache entries are written during the stall, and the same
bytes load in ~15 s minutes later).  Tiny jits do NOT absorb it; any big
executable does, after which every later load in the process is fast.

So: start a daemon thread that uploads a token packed seqdb and runs one
small-batch scan-group index dispatch (a cached, cheap-to-compile shape).
Launched at pipeline construction, the stall burns concurrently with the
host-bound work that follows (read parsing, seqdb encode, checkpoint
write — minutes at Drosophila/human scale), instead of serializing into
the stage-1 wall.  Harmless when the window is good (the absorber runs in
~1-3 s) and skipped entirely on the CPU backend (tests).
"""

from __future__ import annotations

import threading

_started = False
_lock = threading.Lock()


def warm_device_async() -> None:
    """Best-effort, once per process, never raises, never blocks."""
    global _started
    with _lock:
        if _started:
            return
        _started = True

    def _run() -> None:
        try:
            import jax
            if jax.default_backend() == "cpu":
                return
            import jax.numpy as jnp
            import numpy as np

            from ..ops.dbgather import upload_seqdb
            from ..ops.index import INDEX_SCAN_GROUP, index_step_db_scan

            rows = upload_seqdb(np.ones(200000, np.uint8))
            B, L = 16, 16384
            metas = np.zeros((INDEX_SCAN_GROUP, B, 3), np.int64)
            metas[:, :, 1] = 100
            jax.block_until_ready(index_step_db_scan(
                rows, jnp.asarray(metas), L=L, w=80, k=16, r=6, levels=2,
                cap=L // 8))
        except Exception:  # noqa: BLE001 — warmup must never break a run
            pass

    threading.Thread(target=_run, daemon=True, name="tpu-warmup").start()
