"""Pure-Python oracles transliterating reference algorithm *semantics*.

These are slow, step-by-step ports used only as golden references in tests.
Each cites the reference implementation whose behavior it mirrors.
"""

from __future__ import annotations

INF = (1 << 64) - 1

_NT4 = {ord(c): i for i, c in enumerate("ACGT")}
_NT4.update({ord(c): i for i, c in enumerate("acgt")})


def nt4(byte: int) -> int:
    return _NT4.get(byte, 4)


def hash64(key: int, mask: int) -> int:
    """Invertible integer hash (reference: src/mm_sketch.c:23-32)."""
    key = (~key + (key << 21)) & mask
    key = key ^ (key >> 24)
    key = (key + (key << 3) + (key << 8)) & mask
    key = key ^ (key >> 14)
    key = (key + (key << 2) + (key << 4)) & mask
    key = key ^ (key >> 28)
    key = (key + (key << 31)) & mask
    return key


def mm_sketch(seq: bytes, w: int, k: int, rid: int) -> list[tuple[int, int]]:
    """(w,k)-minimizer sketch, minimap2 semantics (src/mm_sketch.c:70-151).

    Returns a list of (x, y) with x = hash<<8|span, y = rid<<32|pos<<1|strand.
    Non-HPC only (the reference pipeline always calls with is_hpc=0,
    src/shmr_index.c:161).
    """
    assert len(seq) > 0 and 0 < w < 256 and 0 < k <= 28
    mask = (1 << (2 * k)) - 1
    shift1 = 2 * (k - 1)
    out: list[tuple[int, int]] = []
    buf = [(INF, INF)] * w
    mn = (INF, INF)
    kmer0 = kmer1 = 0
    l = buf_pos = min_pos = 0
    for i, ch in enumerate(seq):
        c = nt4(ch)
        info = (INF, INF)
        if c < 4:
            kmer_span = l + 1 if l + 1 < k else k
            kmer0 = ((kmer0 << 2) | c) & mask
            kmer1 = (kmer1 >> 2) | ((3 ^ c) << shift1)
            if kmer0 == kmer1:
                continue  # strand-symmetric k-mer: ambiguous strand, skip
            z = 0 if kmer0 < kmer1 else 1
            l += 1
            if l >= k and kmer_span < 256:
                km = kmer0 if z == 0 else kmer1
                info = ((hash64(km, mask) << 8) | kmer_span,
                        (rid << 32) | ((i << 1) & 0xFFFFFFFE) | z)
        else:
            l = 0
        buf[buf_pos] = info
        if l == w + k - 1 and mn[0] != INF:
            # first full window: flush identical-minimum ties kept in the buffer
            for j in list(range(buf_pos + 1, w)) + list(range(buf_pos)):
                if mn[0] == buf[j][0] and buf[j][1] != mn[1]:
                    out.append(buf[j])
        if info[0] <= mn[0]:
            if l >= w + k and mn[0] != INF:
                out.append(mn)
            mn, min_pos = info, buf_pos
        elif buf_pos == min_pos:
            if l >= w + k - 1 and mn[0] != INF:
                out.append(mn)
            mn = (INF, INF)
            for j in list(range(buf_pos + 1, w)) + list(range(buf_pos + 1)):
                if mn[0] >= buf[j][0]:
                    mn, min_pos = buf[j], j
            if l >= w + k - 1 and mn[0] != INF:
                for j in list(range(buf_pos + 1, w)) + list(range(buf_pos + 1)):
                    if mn[0] == buf[j][0] and mn[1] != buf[j][1]:
                        out.append(buf[j])
        buf_pos = (buf_pos + 1) % w
    if mn[0] != INF:
        out.append(mn)
    return out


def mm_reduce(mmers: list[tuple[int, int]], r: int) -> list[tuple[int, int]]:
    """Hierarchical SHIMMER reduction (reference: src/shmr_reduce.c:53-90).

    Ring buffer of r minimizers per read; per window emit the entry with the
    smallest (hash, ring-slot) — the reference's find_minimizer scans ring
    slots in array order with strict '<', so ties resolve to the lowest slot
    index — deduplicated against the previously emitted entry's y.
    """
    out: list[tuple[int, int]] = []
    prev_y = INF
    cur_rid = None
    window: list[tuple[int, int]] = []
    offset = 0
    for x, y in mmers:
        rid = y >> 32
        if rid != cur_rid:
            cur_rid, window, offset = rid, [], 0
        window.append((x, y))
        if len(window) > r:
            window.pop(0)
        if offset >= r - 1:
            # ring slot of element at per-read offset o is o % r
            base = offset - len(window) + 1
            best = min(range(len(window)),
                       key=lambda t: ((window[t][0] >> 8), (base + t) % r))
            mx, my = window[best]
            if my != prev_y:
                out.append((mx, my))
                prev_y = my
        offset += 1
    return out


def ovlp_match(query: bytes, q_strand: int, target: bytes, t_strand: int,
               band_tolerance: int) -> dict:
    """Banded greedy O(ND) overlap confirmation on 4-bit packed sequences
    (transliteration of reference src/DWmatch.c:66-204)."""
    q_shift = 4 if q_strand else 0
    t_shift = 4 if t_strand else 0
    q_len, t_len = len(query), len(target)
    max_d = int(0.3 * (q_len + t_len))
    band_size = band_tolerance * 2
    V = [0] * (max_d * 2 + 1)
    U = [0] * (max_d * 2 + 1)
    ko = max_d
    rtn = dict(m_size=0, dist=0, q_bgn=0, q_end=0, t_bgn=0, t_end=0,
               q_m_end=0, t_m_end=0)
    start = matched = False
    longest = 0
    best_m = -1
    min_k = max_k = 0
    x = y = 0
    for d in range(max_d):
        if max_k - min_k > band_size:
            break
        k = min_k
        while k <= max_k:
            if k == min_k or (k != max_k and V[k - 1 + ko] < V[k + 1 + ko]):
                x = V[k + 1 + ko]
            else:
                x = V[k - 1 + ko] + 1
            y = x - k
            x1 = x
            while (x < q_len and y < t_len and
                   ((query[x] >> q_shift) & 0x0F) == ((target[y] >> t_shift) & 0x0F)):
                x += 1
                y += 1
            if x - x1 > 16 and not start:
                rtn["q_bgn"], rtn["t_bgn"] = x1, y - (x - x1)
                start = True
            if x - x1 > longest:
                longest = x - x1
                rtn["q_m_end"], rtn["t_m_end"] = x, y
            V[k + ko] = x
            U[k + ko] = x + y
            if x + y > best_m:
                best_m = x + y
            if x >= q_len or y >= t_len:
                matched = True
                break
            k += 2
        new_min_k, new_max_k = max_k, min_k
        for k2 in range(min_k, max_k + 1, 2):
            if U[k2 + ko] >= best_m - band_tolerance:
                new_min_k = min(new_min_k, k2)
                new_max_k = max(new_max_k, k2)
        max_k = new_max_k + 1
        min_k = new_min_k - 1
        if matched:
            rtn["q_end"], rtn["t_end"], rtn["dist"] = x, y, d
            rtn["m_size"] = (rtn["q_end"] - rtn["q_bgn"]
                             + rtn["t_end"] - rtn["t_bgn"] + 2 * d) // 2
            break
    if not matched:
        rtn["q_bgn"] = rtn["t_bgn"] = 0
    return rtn
