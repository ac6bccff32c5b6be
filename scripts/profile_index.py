"""Microbenchmark breakdown of the fused index step on the real chip.

Times: full index_step, sketch alone, each reduce level, and the
individual sort-compact passes, to find where the ms go.
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

from peregrine_tpu.ops.index import index_step
from peregrine_tpu.ops.sketch import sketch_impl, _sort_compact, \
    _sliding_min_trailing, _sliding_max_leading
from peregrine_tpu.ops.reduce import reduce_impl

B, L = 512, 32768
rng = np.random.default_rng(0)
codes = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))
lengths = jnp.asarray(np.full(B, L, np.int32))
rids = jnp.asarray(np.arange(B, dtype=np.uint32))


def timeit(name, fn, n=6):
    out = jax.block_until_ready(fn())  # compile+warm
    t0 = time.time()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n
    print(f"{name:40s} {dt*1e3:9.2f} ms", flush=True)
    return dt


timeit("index_step (full, cap=L/8)",
       jax.jit(lambda: index_step(codes, lengths, rids, w=80, k=16, r=6,
                                  levels=2, cap=L // 8)))

sk = jax.jit(lambda: sketch_impl(codes, lengths, rids, w=80, k=16))
timeit("sketch_impl alone", sk)
x, y, c = jax.block_until_ready(sk())
x1 = x[:, :L // 8]
y1 = y[:, :L // 8]
c1 = jnp.minimum(c, L // 8)

r1 = jax.jit(lambda: reduce_impl(x1, y1, c1, r=6))
timeit("reduce L0->L1 (cap L/8)", r1)
xa, ya, ca = jax.block_until_ready(r1())
r2 = jax.jit(lambda: reduce_impl(xa, ya, ca, r=6))
timeit("reduce L1->L2 (same width)", r2)

# individual primitives at [B, L]
u64 = jnp.asarray(rng.integers(0, 2**63, size=(B, L)).astype(np.uint64))
u32 = jnp.asarray(rng.integers(0, 2**31, size=(B, L)).astype(np.uint32))
keep = jnp.asarray(rng.random((B, L)) < 0.97)

timeit("sort_compact 1x u64 [B,L]",
       jax.jit(lambda: _sort_compact(keep, [u64])))
timeit("sort_compact 1x u32 [B,L]",
       jax.jit(lambda: _sort_compact(keep, [u32])))
timeit("sort_compact 2x u64 [B,L]",
       jax.jit(lambda: _sort_compact(keep, [u64, u64 ^ jnp.uint64(1)])))
timeit("sliding_min u32 w=80 [B,L]",
       jax.jit(lambda: _sliding_min_trailing(u32, 80, jnp.uint32(0xFFFFFFFF))))
timeit("cumsum int32 [B,L]",
       jax.jit(lambda: jnp.cumsum(u32 & jnp.uint32(1), axis=1)))

# the k-shift rolling kmer build
def roll():
    cb = codes.astype(jnp.uint32) & 3
    fwd = jnp.zeros((B, L), jnp.uint32)
    for d in range(16):
        cd = jnp.pad(cb[:, :L - d], ((0, 0), (d, 0)))
        fwd = fwd | (cd << jnp.uint32(2 * d))
    return fwd
timeit("16-shift rolling kmer u32", jax.jit(roll))

# sort_compact at the reduced width [B, L/8]
keep8 = keep[:, :L // 8]
u648 = u64[:, :L // 8]
timeit("sort_compact 2x u64 [B,L/8]",
       jax.jit(lambda: _sort_compact(keep8, [u648, u648 ^ jnp.uint64(1)])))
