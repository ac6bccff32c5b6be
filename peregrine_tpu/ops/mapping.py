"""Read-to-reference SHIMMER mapping (reference src/shmr_map.c).

Builds the oriented pair map over the *read* index (sorted arrays, see
ops/overlap.py), then walks the *reference* SHIMMER list: every adjacent
eligible reference pair present in the map emits its stored read-pair hits
as mapping records ``(ref_id, ref_bgn, ref_end, read_id, read_bgn,
read_end, direction, mc0, mc1)`` — the input of the consensus stage.
"""

from __future__ import annotations

import numpy as np

from ..config import AsmConfig
from .index import ShimmerIndex
from .overlap import build_pairs

_U32 = np.uint64(0xFFFFFFFF)


def map_reads_to_ref(read_idx: ShimmerIndex, read_lengths: np.ndarray,
                     ref_idx: ShimmerIndex, cfg: AsmConfig,
                     chunk: int = 1, total_chunk: int = 1) -> np.ndarray:
    """Returns an int64 array [n, 9] of mapping rows (printf order,
    src/shmr_map.c:153)."""
    key0, key1, y0a, y1a, dira = build_pairs(
        read_idx, read_lengths, chunk, total_chunk,
        cfg.mc_lower, cfg.mc_upper, cfg.min_anchor_dist)

    buckets: dict[tuple[int, int], tuple[int, int]] = {}
    if len(key0):
        change = np.flatnonzero((key0[1:] != key0[:-1])
                                | (key1[1:] != key1[:-1])) + 1
        bounds = np.concatenate([[0], change, [len(key0)]])
        for a, b in zip(bounds[:-1], bounds[1:]):
            buckets[(int(key0[a]), int(key1[a]))] = (int(a), int(b))

    mmer0_keys = {int(k) for k in key0}
    rx, ry = ref_idx.x, ref_idx.y
    counts = read_idx.counts_for(rx >> np.uint64(8))

    n = len(rx)
    # advance to the first reference SHIMMER present in the read pair map
    s = 0
    while s < n and int(rx[s]) not in mmer0_keys:
        s += 1
    if s >= n:
        return np.zeros((0, 9), np.int64)

    # precomputed int views keep the anchor walk cheap; bucket-hit
    # emission is fully vectorized afterwards
    ry_rid = (ry >> np.uint64(32)).astype(np.int64)
    ry_pos = ((ry & np.uint64(0xFFFFFFFF)) >> np.uint64(1)).astype(np.int64)
    rx_int = rx.astype(np.int64)  # full x keys (hash<<8|span fits int64)
    c_int = counts.astype(np.int64)

    acc: list[tuple] = []  # (ref_id, pos0, pos1, mc0, c1, a, b)
    m0 = s
    for i in range(s + 1, n):
        c1 = c_int[i]
        # c1 == 0 means the hash is absent from the read index (the
        # reference skips on kh_get miss regardless of the bounds)
        if c1 == 0 or c1 < cfg.mc_lower or c1 > cfg.mc_upper:
            continue
        if ry_rid[m0] != ry_rid[i]:
            m0 = i
            continue
        bucket = buckets.get((int(rx_int[m0]), int(rx_int[i])))
        if bucket is None:
            m0 = i
            continue
        pos0 = int(ry_pos[m0])
        pos1 = int(ry_pos[i])
        if ((pos1 & 0xFFFFFFF) - (pos0 & 0xFFFFFFF)) % (1 << 28) \
                < cfg.min_anchor_dist:
            m0 = i
            continue
        acc.append((int(ry_rid[m0]), pos0, pos1, int(c_int[m0]), int(c1),
                    bucket[0], bucket[1]))
        m0 = i

    if not acc:
        return np.zeros((0, 9), np.int64)
    pa = np.asarray(acc, np.int64)
    sizes = pa[:, 6] - pa[:, 5]
    total = int(sizes.sum())
    rep = np.repeat(np.arange(len(pa)), sizes)
    within = np.arange(total) - np.repeat(np.cumsum(sizes) - sizes, sizes)
    j = pa[rep, 5] + within
    rows = np.empty((total, 9), np.int64)
    rows[:, 0] = pa[rep, 0]
    rows[:, 1] = pa[rep, 1]
    rows[:, 2] = pa[rep, 2]
    rows[:, 3] = (y0a[j] >> np.uint64(32)).astype(np.int64)
    rows[:, 4] = ((y0a[j] & np.uint64(0xFFFFFFFF)) >> np.uint64(1)).astype(np.int64)
    rows[:, 5] = ((y1a[j] & np.uint64(0xFFFFFFFF)) >> np.uint64(1)).astype(np.int64)
    rows[:, 6] = dira[j].astype(np.int64)
    rows[:, 7] = pa[rep, 3]
    rows[:, 8] = pa[rep, 4]
    return rows
