"""Marginal cost: sort-compaction vs log-shift compaction at [512, 32768]."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from peregrine_tpu.ops.sketch import _sort_compact, _shift_compact

B, L = 512, 32768
rng = np.random.default_rng(0)
u64 = jnp.asarray(rng.integers(0, 2**63, size=(B, L)).astype(np.uint64))
dense = jnp.asarray(rng.random((B, L)) < 0.97)   # first compaction shape
sparse = jnp.asarray(rng.random((B, L)) < 0.025)  # emission compaction shape


def timeit(name, fn, n=4):
    out = jax.block_until_ready(fn())
    t0 = time.time()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.time()-t0)/n*1e3:9.2f} ms", flush=True)


def chain(op, keep, reps):
    def f():
        def body(i, x):
            return op(keep, [x ^ i.astype(x.dtype)])[0][0]
        return jax.lax.fori_loop(0, reps, body, u64)
    return jax.jit(f)


for nm, keep in (("dense97", dense), ("sparse2.5", sparse)):
    for opn, op in (("sort", _sort_compact), ("shift", _shift_compact)):
        t1 = timeit(f"{opn} {nm} x1", chain(op, keep, 1))
        t8 = timeit(f"{opn} {nm} x8", chain(op, keep, 8))
