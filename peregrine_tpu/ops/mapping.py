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

    rows: list[tuple] = []
    n = len(rx)
    # advance to the first reference SHIMMER present in the read pair map
    s = 0
    while s < n and int(rx[s]) not in mmer0_keys:
        s += 1
    if s >= n:
        return np.zeros((0, 9), np.int64)

    m0 = s
    for i in range(s + 1, n):
        c1 = int(counts[i])
        if c1 == 0 or c1 < cfg.mc_lower or c1 > cfg.mc_upper:
            continue
        if (int(ry[m0]) >> 32) != (int(ry[i]) >> 32):
            m0 = i
            continue
        bucket = buckets.get((int(rx[m0]), int(rx[i])))
        if bucket is None:
            m0 = i
            continue
        pos0 = (int(ry[m0]) & 0xFFFFFFFF) >> 1
        pos1 = (int(ry[i]) & 0xFFFFFFFF) >> 1
        if ((pos1 & 0xFFFFFFF) - (pos0 & 0xFFFFFFF)) % (1 << 28) < cfg.min_anchor_dist:
            m0 = i
            continue
        ref_id = int(ry[m0]) >> 32
        mc0 = int(counts[m0])
        a, b = bucket
        for j in range(a, b):
            read_id = int(y0a[j]) >> 32
            read_bgn = (int(y0a[j]) & 0xFFFFFFFF) >> 1
            read_end = (int(y1a[j]) & 0xFFFFFFFF) >> 1
            rows.append((ref_id, pos0, pos1, read_id, read_bgn, read_end,
                         int(dira[j]), mc0, c1))
        m0 = i

    return np.asarray(rows, np.int64).reshape(-1, 9)
