"""Hierarchical SHIMMER reduction — vectorized window-argmin per read.

The reference slides a ring buffer of r minimizers per read and emits the
buffer's minimum-hash element per step, deduplicated against the previous
emission (src/shmr_reduce.c:53-90).  Its find_minimizer scans ring slots in
*array* order with a strict '<', so hash ties resolve to the lowest ring
slot (element offset mod r) — a quirk preserved here for output parity.

Vectorized form over per-read compacted arrays [B, C]: the window winner at
column j is the argmin over the last r entries of the composite key
(x with its span byte replaced by the ring slot); ties are impossible
because slots within one window are distinct.  Applied once for L1, twice
for L2 (src/shmr_index.c:199,216).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .sketch import INF, _compact


@functools.partial(jax.jit, static_argnames=("r",))
def reduce_batch(x: jnp.ndarray, y: jnp.ndarray, count: jnp.ndarray, *, r: int):
    """Reduce per-read minimizer rows by factor ~r.

    Args:
      x, y:  [B, C] uint64 minimizer records compacted per row (INF padding).
      count: [B] int32 valid entries per row.
      r:     reduction window (static, < 256).

    Returns (x', y', count') in the same layout.
    """
    assert 0 < r < 256
    B, C = x.shape
    col = jnp.arange(C, dtype=jnp.uint64)[None, :]
    # composite key: hash in the high 56 bits, ring slot replaces the span byte
    key = (x & ~jnp.uint64(0xFF)) | (col % jnp.uint64(r))

    stack = jnp.stack(
        [jnp.pad(key, ((0, 0), (d, 0)), constant_values=INF)[:, :C]
         for d in range(r)], axis=0)                       # [r, B, C]
    dstar = jnp.argmin(stack, axis=0).astype(jnp.int32)    # [B, C]
    u = jnp.maximum(jnp.arange(C, dtype=jnp.int32)[None, :] - dstar, 0)
    wx = jnp.take_along_axis(x, u, axis=1)
    wy = jnp.take_along_axis(y, u, axis=1)

    valid = (jnp.arange(C)[None, :] >= (r - 1)) & (jnp.arange(C)[None, :] < count[:, None])
    prev_wy = jnp.pad(wy, ((0, 0), (1, 0)), constant_values=INF)[:, :C]
    prev_valid = jnp.pad(valid, ((0, 0), (1, 0)))[:, :C]
    emit = valid & ((wy != prev_wy) | ~prev_valid)

    (ox, oy), ocount = _compact([wx, wy], emit, [INF, INF])
    return ox, oy, ocount


def reduce_flat_np(x: np.ndarray, y: np.ndarray, r: int) -> tuple[np.ndarray, np.ndarray]:
    """Host convenience: reduce a concatenated (rid-ordered) minimizer list.

    Splits by the rid field of y, pads to a batch, reduces on device, and
    re-flattens — matches the reference's concatenated-stream semantics
    because dedup never fires across rid boundaries (y embeds rid).
    """
    if len(x) == 0:
        return x.copy(), y.copy()
    rids = (y >> np.uint64(32)).astype(np.int64)
    boundaries = np.flatnonzero(np.diff(rids)) + 1
    segs = np.split(np.arange(len(x)), boundaries)
    C = max(len(s) for s in segs)
    B = len(segs)
    bx = np.full((B, C), np.uint64(0xFFFFFFFFFFFFFFFF), np.uint64)
    by = np.full((B, C), np.uint64(0xFFFFFFFFFFFFFFFF), np.uint64)
    cnt = np.zeros(B, np.int32)
    for i, s in enumerate(segs):
        bx[i, :len(s)] = x[s]
        by[i, :len(s)] = y[s]
        cnt[i] = len(s)
    ox, oy, oc = jax.device_get(
        reduce_batch(jnp.asarray(bx), jnp.asarray(by), jnp.asarray(cnt), r=r))
    xs = [ox[i, :oc[i]] for i in range(B)]
    ys = [oy[i, :oc[i]] for i in range(B)]
    return np.concatenate(xs), np.concatenate(ys)
