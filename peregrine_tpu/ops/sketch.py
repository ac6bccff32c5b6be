"""Vectorized (w,k)-minimizer sketch — the TPU-native SHIMMER L0 kernel.

The reference computes minimizers with a sequential ring buffer per read
(src/mm_sketch.c:70-151).  Here the same *output* is produced by a data-
parallel reformulation over a padded batch of reads [B, L]:

1. per-position rolling k-mers via k shifted adds (XLA fuses these),
2. the minimizer stream (valid, non-strand-symmetric positions plus
   ambiguous-base placeholders) compacted with cumsum/scatter,
3. window minima via the block prefix/suffix-min trick (two lax.cummin),
4. the emission set derived declaratively:  an entry e is emitted iff it is
   a minimum of some *complete* window (window-end run length
   l >= w+k-1), or it is the held minimum of the final window.

For sequences without ambiguous bases this set — ordered by position — is
exactly the reference's emission sequence (proved by the tie-handling
analysis in the module tests; validated against a transliterated oracle).
Known divergences (both superset-only, order preserved; negligible for
k=16 real data, validated in tests/test_sketch.py):
  * with ambiguous bases mid-read the reference's emission guard is
    evaluated at a later loop step and can drop minima near the reset;
  * when hash ties occur exactly at a read's first complete window, the
    reference's supersede guard (l >= w+k) drops the held tie one step
    after the l == w+k-1 special case; the set semantics keep it.

Encodings (must match src/mm_sketch.c:62-68):
    x = hash64(canonical_kmer) << 8 | span        (span == k, non-HPC)
    y = rid << 32 | last_pos << 1 | strand
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

INF = jnp.uint64(0xFFFFFFFFFFFFFFFF)


def hash64(key: jnp.ndarray, mask) -> jnp.ndarray:
    """Invertible minimizer hash (reference: src/mm_sketch.c:23-32)."""
    key = (~key + (key << 21)) & mask
    key = key ^ (key >> 24)
    key = (key + (key << 3) + (key << 8)) & mask
    key = key ^ (key >> 14)
    key = (key + (key << 2) + (key << 4)) & mask
    key = key ^ (key >> 28)
    key = (key + (key << 31)) & mask
    return key


def _sliding_min_trailing(a: jnp.ndarray, w: int, fill) -> jnp.ndarray:
    """W[t] = min(a[t-w+1 .. t]), out-of-range entries = fill.  [B, L] -> [B, L]."""
    B, L = a.shape
    nb = -(-L // w)
    P = nb * w
    ap = jnp.pad(a, ((0, 0), (0, P - L)), constant_values=fill)
    blocks = ap.reshape(B, nb, w)
    pref = jax.lax.cummin(blocks, axis=2).reshape(B, P)
    suf = jax.lax.cummin(blocks, axis=2, reverse=True).reshape(B, P)
    t = jnp.arange(L)
    s = t - w + 1
    left = jnp.where(s >= 0, jnp.take(suf, jnp.maximum(s, 0), axis=1),
                     jnp.asarray(fill, a.dtype))
    return jnp.minimum(left, pref[:, :L])


def _sliding_max_leading(a: jnp.ndarray, w: int, fill) -> jnp.ndarray:
    """M[t] = max(a[t .. t+w-1]), out-of-range entries = fill.  [B, L] -> [B, L]."""
    B, L = a.shape
    nb = -(-L // w)
    P = nb * w
    ap = jnp.pad(a, ((0, 0), (0, P - L)), constant_values=fill)
    blocks = ap.reshape(B, nb, w)
    pref = jax.lax.cummax(blocks, axis=2).reshape(B, P)
    suf = jax.lax.cummax(blocks, axis=2, reverse=True).reshape(B, P)
    t = jnp.arange(L)
    e = t + w - 1
    right = jnp.where(e < P, jnp.take(pref, jnp.minimum(e, P - 1), axis=1),
                      jnp.asarray(fill, a.dtype))
    return jnp.maximum(suf[:, :L], right)


def _compact(values: list[jnp.ndarray], keep: jnp.ndarray, fills) -> tuple[list[jnp.ndarray], jnp.ndarray]:
    """Stable-compact kept entries to the front of each row; returns counts."""
    B, L = keep.shape
    rows = jnp.arange(B)[:, None]
    ccum = jnp.cumsum(keep, axis=1)
    dest = jnp.where(keep, ccum - 1, L)  # L = trash slot
    outs = []
    for v, fill in zip(values, fills):
        o = jnp.full((B, L + 1), fill, v.dtype).at[rows, dest].set(v)
        outs.append(o[:, :L])
    return outs, ccum[:, -1].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("w", "k"))
def sketch_batch(codes: jnp.ndarray, lengths: jnp.ndarray, rids: jnp.ndarray,
                 *, w: int, k: int):
    """Sketch a padded batch of reads.

    Args:
      codes:   [B, L] uint8 2-bit base codes (4 = ambiguous/padding).
      lengths: [B] int32 true read lengths.
      rids:    [B] uint32 read ids (encoded into y).
      w, k:    window / k-mer size (static).

    Returns:
      (x [B, L] uint64, y [B, L] uint64, count [B] int32) — per-read
      minimizers compacted to the row front, padding = INF.
    """
    assert 0 < w < 256 and 0 < k <= 28
    B, L = codes.shape
    mask = jnp.uint64((1 << (2 * k)) - 1)
    rows = jnp.arange(B)[:, None]
    pos = jnp.arange(L)[None, :]

    c = codes.astype(jnp.uint32)
    inlen = pos < lengths[:, None].astype(jnp.int64)
    valid = (c < 4) & inlen
    amb = (c >= 4) & inlen

    # --- rolling k-mers over the valid-compacted stream -------------------
    (ccode,), _ = _compact([c], valid, [jnp.uint32(0)])
    cc = ccode.astype(jnp.uint64)
    fwd = jnp.zeros((B, L), jnp.uint64)
    rev = jnp.zeros((B, L), jnp.uint64)
    for d in range(k):
        # element u-d, missing entries behave like the zero-initialized
        # rolling registers: code 0 for fwd, complement bits 0 for rev
        sh_f = jnp.pad(cc, ((0, 0), (d, 0)))[:, :L]
        sh_r = jnp.pad(cc ^ jnp.uint64(3), ((0, 0), (d, 0)))[:, :L]
        fwd = fwd | (sh_f << jnp.uint64(2 * d))
        rev = rev | (sh_r << jnp.uint64(2 * (k - 1 - d)))
    fwd = fwd & mask

    sym_c = fwd == rev
    strand_c = jnp.where(fwd < rev, jnp.uint64(0), jnp.uint64(1))
    canon_c = jnp.minimum(fwd, rev)
    hash_c = hash64(canon_c, mask)

    # map compact-index results back to original positions
    vidx = jnp.cumsum(valid, axis=1) - 1
    gidx = jnp.clip(vidx, 0, L - 1)
    sym = jnp.take_along_axis(sym_c, gidx, axis=1) & valid
    strand = jnp.take_along_axis(strand_c, gidx, axis=1)
    hsh = jnp.take_along_axis(hash_c, gidx, axis=1)

    vns = valid & ~sym  # enters the window buffer with a real payload

    # --- run length l: valid non-symmetric entries since last ambiguous ---
    last_amb = jax.lax.cummax(jnp.where(amb, pos, -1), axis=1)
    cvns = jnp.cumsum(vns, axis=1)
    cvns_pad = jnp.pad(cvns, ((0, 0), (1, 0)))  # index shift: [-1] -> 0
    at_amb = jnp.take_along_axis(cvns_pad, last_amb + 1, axis=1)
    l = cvns - at_amb

    defined = vns & (l >= k)
    x = jnp.where(defined, (hsh << jnp.uint64(8)) | jnp.uint64(k), INF)
    y = jnp.where(
        defined,
        (rids[:, None].astype(jnp.uint64) << jnp.uint64(32))
        | ((pos.astype(jnp.uint64) << jnp.uint64(1)) & jnp.uint64(0xFFFFFFFE))
        | strand,
        INF)

    # --- compact the buffer stream (placeholders for ambiguous bases) -----
    inc = vns | amb
    (sx, sy, sl), n = _compact([x, y, l.astype(jnp.int32)], inc,
                               [INF, INF, jnp.int32(0)])

    # --- window minima + emission set -------------------------------------
    W = _sliding_min_trailing(sx, w, INF)
    complete = sl >= (w + k - 1)
    # sentinel 0 is below every finite x (x >= span > 0) and never equals one
    Ap = jnp.where(complete, W, jnp.uint64(0))
    Ap = jnp.where(jnp.arange(L)[None, :] < n[:, None], Ap, jnp.uint64(0))
    M = _sliding_max_leading(Ap, w, jnp.uint64(0))
    emit = (sx != INF) & (M == sx)

    # --- final held minimum: min of the last window, newest tie wins ------
    spos = jnp.arange(L)[None, :]
    in_final = (spos >= (n[:, None] - w)) & (spos < n[:, None])
    xm = jnp.where(in_final, sx, INF)
    fmin = jnp.min(xm, axis=1)
    t_f = jnp.max(jnp.where((xm == fmin[:, None]) & in_final, spos, -1), axis=1)
    has_final = (fmin != INF) & (t_f >= 0)
    emit = emit.at[jnp.arange(B), jnp.clip(t_f, 0, L - 1)].max(has_final)

    (ox, oy), count = _compact([sx, sy], emit, [INF, INF])
    return ox, oy, count


def sketch_reads_np(codes: np.ndarray, lengths: np.ndarray, rids: np.ndarray,
                    w: int, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Host convenience: run sketch_batch and flatten to concatenated
    (x, y) arrays in rid order (the reference's per-chunk mmlist layout)."""
    ox, oy, cnt = jax.device_get(
        sketch_batch(jnp.asarray(codes), jnp.asarray(lengths),
                     jnp.asarray(rids), w=w, k=k))
    xs, ys = [], []
    for b in range(len(cnt)):
        xs.append(ox[b, :cnt[b]])
        ys.append(oy[b, :cnt[b]])
    return (np.concatenate(xs) if xs else np.zeros(0, np.uint64),
            np.concatenate(ys) if ys else np.zeros(0, np.uint64))
