"""Marginal on-device cost of each index primitive: run each op 8x chained
inside ONE jit (data-dependent, defeating CSE) so the ~4.5 ms remote
dispatch floor amortizes; marginal = (t8 - t1) / 7.
"""
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

from peregrine_tpu.ops.sketch import (_sort_compact, _sliding_min_trailing,
                                      hash64)

B, L = 512, 32768
rng = np.random.default_rng(0)
u64 = jnp.asarray(rng.integers(0, 2**63, size=(B, L)).astype(np.uint64))
u32 = jnp.asarray(rng.integers(0, 2**31, size=(B, L)).astype(np.uint32))
codes = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))


def timeit(name, fn, n=4):
    out = jax.block_until_ready(fn())
    t0 = time.time()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{name:44s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def chain(op, x0, reps):
    def f():
        def body(i, x):
            return op(x ^ i.astype(x.dtype))
        return jax.lax.fori_loop(0, reps, body, x0)
    return jax.jit(f)


def report(name, op, x0):
    t1 = timeit(f"{name} x1", chain(op, x0, 1))
    t8 = timeit(f"{name} x8", chain(op, x0, 8))
    print(f"{name:44s} marginal {1e3*(t8-t1)/7:9.2f} ms", flush=True)


# sort u64 single operand (the compaction cost center)
report("sort1 u64", lambda x: jax.lax.sort((x >> jnp.uint64(1), x),
                                           dimension=1, is_stable=True,
                                           num_keys=1)[1], u64)

# sliding min u32 w=80
report("sliding_min u32", lambda x: _sliding_min_trailing(
    x, 80, jnp.uint32(0xFFFFFFFF)), u32)

# cumsum i32
report("cumsum i32", lambda x: jnp.cumsum(x, axis=1,
                                          dtype=jnp.int32).astype(jnp.uint32),
       u32)

# rolling kmer both strands (k=16) from codes
def roll(cb):
    cb = cb & jnp.uint32(3)
    cbr = cb ^ jnp.uint32(3)
    fwd = jnp.zeros((B, L), jnp.uint32)
    rev = jnp.zeros((B, L), jnp.uint32)
    for d in range(16):
        cd = jnp.pad(cb[:, :L - d], ((0, 0), (d, 0)))
        cdr = jnp.pad(cbr[:, :L - d], ((0, 0), (d, 0)))
        fwd = fwd | (cd << jnp.uint32(2 * d))
        rev = rev | (cdr << jnp.uint32(2 * (15 - d)))
    return fwd ^ rev
report("rolling kmer fwd+rev", roll, u32)

# hash64 u32
report("hash64 u32", lambda x: hash64(x, jnp.uint32(0xFFFFFFFF)), u32)
