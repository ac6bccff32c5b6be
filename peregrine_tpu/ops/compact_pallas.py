"""Pallas TPU kernel: stable stream compaction entirely in VMEM.

The sketch/reduce compactions were the index pipeline's cost center: a
stable [B, L] sort costs ~19 ms marginal at [512, 32k] on v5e, and the
XLA log-shift reformulation (ops.sketch._shift_compact) still round-trips
every operand through HBM once per bit pass (~15 passes).  Here the same
log-shift algorithm runs on row tiles held in VMEM: HBM sees each operand
once in and once out (~0.5 ms of traffic), and the bit passes are VPU
rolls+selects on-chip.

Semantics are identical to _shift_compact (see its correctness argument):
kept entries move to the row front in stable order, dropped entries
become the per-operand fill value, counts are exact.  Equality with the
XLA path is asserted in tests/test_sketch.py (interpret mode on CPU).

Operands are uint32 planes; 64-bit operands are split into (lo, hi) by
the dispatcher (ops.sketch._compact) — TPU vector lanes are 32-bit and
Mosaic's u64 support is emulated, so explicit planes are both faster and
safer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# NOTE: x64 is globally enabled (peregrine_tpu import), so Python-int
# shifts/literals would trace as int64, which Mosaic cannot lower
# (tpu.dynamic_rotate wants i32; int64->int32 converts recurse) — every
# scalar below is an explicit int32.


def _roll_right(x, s, fill):
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(col < jnp.int32(s), jnp.asarray(fill, x.dtype),
                     pltpu.roll(x, np.int32(s), axis=1))


def _roll_left(x, s, fill):
    L = x.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(col >= jnp.int32(L - s), jnp.asarray(fill, x.dtype),
                     pltpu.roll(x, np.int32((L - s) % L), axis=1))


def _make_kernel(n_planes: int, fills: tuple, K: int):
    def kernel(keep_ref, *refs):
        ins = refs[:n_planes]
        outs = refs[n_planes:2 * n_planes]
        cnt_ref = refs[2 * n_planes]
        keep = keep_ref[:]                       # [R, L] int32 0/1
        R, L = keep.shape
        col = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)

        # inclusive prefix sum of keep along lanes (log-shift adds)
        cvk = keep
        s = 1
        while s < L:
            cvk = cvk + _roll_right(cvk, s, 0)
            s *= 2
        cnt_ref[:] = cvk[:, L - 128:]            # count = [:, -1] outside

        kept = keep == jnp.int32(1)
        # drops before each kept entry
        r = jnp.where(kept, col - cvk + jnp.int32(1), jnp.int32(0))
        planes = [jnp.where(kept, ref[:], jnp.asarray(f, jnp.uint32))
                  for ref, f in zip(ins, fills)]
        for k in range(K):
            bit = 1 << k
            r_s = _roll_left(r, bit, 0)
            take = (r_s & jnp.int32(bit)) != jnp.int32(0)
            stay = (r & jnp.int32(bit)) == jnp.int32(0)
            planes = [jnp.where(take, _roll_left(p, bit, f),
                                jnp.where(stay, p, jnp.asarray(f, jnp.uint32)))
                      for p, f in zip(planes, fills)]
            r = jnp.where(take, r_s, jnp.where(stay, r, jnp.int32(0)))
        for o, p in zip(outs, planes):
            o[:] = p
    return kernel


def _make_move_kernel(K: int):
    """Move passes of the log-shift compaction with the shift-distance
    plane r precomputed by the producer kernel (build_stream / emit_mask
    compute the prefix sums anyway, so per-plane calls skip them: half
    the per-call roll work).  No hole fills — positions >= count keep
    stale values; every consumer masks by count."""
    def kernel(r_ref, p_ref, o_ref):
        r = r_ref[:]
        p = p_ref[:]
        R, L = r.shape
        col = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
        for k in range(K):
            bit = 1 << k
            r_s = _roll_left(r, bit, 0)
            take = (r_s & jnp.int32(bit)) != jnp.int32(0)
            p = jnp.where(take, _roll_left(p, bit, 0), p)
            # vacated positions clear r (a stale shift distance would
            # re-move the leftover copy in a later pass)
            stay = (r & jnp.int32(bit)) == jnp.int32(0)
            r = jnp.where(take, r_s, jnp.where(stay, r, jnp.int32(0)))
        o_ref[:] = p
    return kernel


@functools.partial(jax.jit, static_argnames=("rows", "interpret"))
def move_plane(r: jnp.ndarray, plane: jnp.ndarray,
               rows: int = 8, interpret: bool = False):
    """Compact one uint32 plane given precomputed shift distances r
    (int32: drops before each kept entry; 0 at dropped positions).
    Tail positions (>= count) hold stale values."""
    B, L = r.shape
    assert B % rows == 0 and L % 128 == 0
    K = max(1, (L - 1).bit_length())
    zero = np.int32(0)
    blk = pl.BlockSpec((rows, L), lambda i: (i, zero),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_move_kernel(K),
        grid=(B // rows,),
        in_specs=[blk, blk],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((B, L), plane.dtype),
        input_output_aliases={1: 0},
        interpret=interpret,
    )(r, plane)


def _hash64_u32(key, mask):
    """hash64 with static int shift amounts (Mosaic-friendly); same
    algebra as ops.sketch.hash64 on uint32."""
    key = (~key + (key << 21)) & mask
    key = key ^ (key >> 24)
    key = (key + (key << 3) + (key << 8)) & mask
    key = key ^ (key >> 14)
    key = (key + (key << 2) + (key << 4)) & mask
    key = key ^ (key >> 28)
    key = (key + (key << 31)) & mask
    return key


def _make_build_kernel(k: int, L: int):
    """Stream-entry build for the packed sketch: rolling canonical k-mer
    (log-doubling composition), hash64, ambiguity run length — one VMEM
    pass over the code tile.  Semantic reference: the XLA block in
    ops.sketch._sketch_impl_packed (equality tested in tests/test_sketch)."""
    mask = (1 << (2 * k)) - 1

    def kernel(c_ref, len_ref, h_ref, p_ref, r_ref, cnt_ref):
        c = c_ref[:]                          # [R, L] i32 codes (>=4 amb)
        lens = len_ref[:, :1]
        R = c.shape[0]
        col = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
        inlen = col < lens
        valid = (c < jnp.int32(4)) & inlen
        amb = (c >= jnp.int32(4)) & inlen

        cb = pltpu.bitcast(c & jnp.int32(3), jnp.uint32)
        # log-doubling k-mer composition: f_{m+n}[t] = f_m[t-n] << 2n | f_n[t]
        # (forward) and r_{m+n}[t] = r_n[t] << 2m | r_m[t-n] (revcomp)
        fpow, rpow = [cb], [cb ^ jnp.uint32(3)]
        j = 1
        while j < k:
            f, r = fpow[-1], rpow[-1]
            fpow.append((_roll_right(f, j, 0) << jnp.uint32(2 * j)) | f)
            rpow.append((r << jnp.uint32(2 * j)) | _roll_right(r, j, 0))
            j *= 2
        fwd = rev = None
        m = 0
        for jbit, (f, r) in enumerate(zip(fpow, rpow)):
            n = 1 << jbit
            if not (k & n):
                continue
            if fwd is None:
                fwd, rev = f, r
            else:
                fwd = (_roll_right(fwd, n, 0) << jnp.uint32(2 * n)) | f
                rev = (r << jnp.uint32(2 * m)) | _roll_right(rev, n, 0)
            m += n
        fwd = fwd & jnp.uint32(mask)
        rev = rev & jnp.uint32(mask)

        sym = (fwd == rev) & valid
        # unsigned compare/min in the order-preserving signed domain
        fi = pltpu.bitcast(fwd ^ jnp.uint32(0x80000000), jnp.int32)
        ri = pltpu.bitcast(rev ^ jnp.uint32(0x80000000), jnp.int32)
        strand = jnp.where(fi < ri, jnp.uint32(0), jnp.uint32(1))
        canon = pltpu.bitcast(jnp.minimum(fi, ri),
                              jnp.uint32) ^ jnp.uint32(0x80000000)
        hsh = _hash64_u32(canon, jnp.uint32(mask))

        vns = valid & jnp.logical_not(sym)
        cv = vns.astype(jnp.int32)
        s = 1
        while s < L:
            cv = cv + _roll_right(cv, s, 0)
            s *= 2
        aa = jnp.where(amb, cv, jnp.int32(0))
        s = 1
        while s < L:
            aa = jnp.maximum(aa, _roll_right(aa, s, 0))
            s *= 2
        defined = vns & ((cv - aa) >= jnp.int32(k))

        h_ref[:] = jnp.where(defined, hsh, jnp.uint32(0xFFFFFFFF))
        p_ref[:] = ((pltpu.bitcast(col, jnp.uint32) << jnp.uint32(2))
                    | (strand << jnp.uint32(1)) | amb.astype(jnp.uint32))
        # shift distances for the stream compaction (move_plane input):
        # r = drops before each kept entry, 0 at dropped positions
        inc = (vns | amb).astype(jnp.int32)
        ci = inc
        s = 1
        while s < L:
            ci = ci + _roll_right(ci, s, 0)
            s *= 2
        cnt_ref[:] = ci[:, L - 128:]
        r_ref[:] = jnp.where(inc == jnp.int32(1), col - ci + jnp.int32(1),
                             jnp.int32(0))

    return kernel


@functools.partial(jax.jit, static_argnames=("k", "rows", "interpret"))
def build_stream(codes: jnp.ndarray, lengths: jnp.ndarray, *, k: int,
                 rows: int = 8, interpret: bool = False):
    """Fused stream-entry build: [B, L] int32 codes -> (H, P, r, n).
    H/P uint32 planes, r int32 shift distances for move_plane, n int32 [B]
    stream entry counts."""
    B, L = codes.shape
    assert B % rows == 0 and L % 128 == 0 and 0 < k <= 16
    lb = jnp.broadcast_to(lengths.astype(jnp.int32)[:, None], (B, 128))
    zero = np.int32(0)
    blk = pl.BlockSpec((rows, L), lambda i: (i, zero),
                       memory_space=pltpu.VMEM)
    cblk = pl.BlockSpec((rows, 128), lambda i: (i, zero),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _make_build_kernel(k, L),
        grid=(B // rows,),
        in_specs=[blk, cblk],
        out_specs=[blk, blk, blk, cblk],
        out_shape=[jax.ShapeDtypeStruct((B, L), jnp.uint32),
                   jax.ShapeDtypeStruct((B, L), jnp.uint32),
                   jax.ShapeDtypeStruct((B, L), jnp.int32),
                   jax.ShapeDtypeStruct((B, 128), jnp.int32)],
        interpret=interpret,
    )(codes.astype(jnp.int32), lb)
    return outs[0], outs[1], outs[2], outs[3][:, -1]


def _make_emit_kernel(w: int, k: int, L: int):
    INF32 = 0xFFFFFFFF

    def kernel(h_ref, p_ref, n_ref, r_ref, cnt_ref):
        sH = h_ref[:]                       # [R, L] u32 hashes (INF = hole)
        sPl = p_ref[:]                      # [R, L] u32 pos|strand|amb
        n = n_ref[:, :1]                    # [R, 1] i32 row counts
        R = sH.shape[0]
        col = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
        in_n = col < n
        samb = ((sPl & jnp.uint32(1)) != jnp.uint32(0)) & in_n

        # svns-run length since the last ambiguous reset = column distance
        # to the last amb placeholder (prefix max)
        la = jnp.where(samb, col, jnp.int32(-1))
        s = 1
        while s < L:
            la = jnp.maximum(la, _roll_right(la, s, -1))
            s *= 2
        sl = col - la

        # Mosaic has no unsigned min/max, so all extrema run in the
        # order-preserving signed domain x ^ 0x8000_0000 (INF32 -> INT_MAX,
        # 0 -> INT_MIN)
        IMAX = jnp.int32(0x7FFFFFFF)
        IMIN = jnp.int32(-0x80000000)
        sHi = pltpu.bitcast(sH ^ jnp.uint32(0x80000000), jnp.int32)

        # trailing sliding min of sH over w (power-of-two sparse table)
        m = sHi
        j = 1
        while 2 * j <= w:
            m = jnp.minimum(m, _roll_right(m, j, 0x7FFFFFFF))
            j *= 2
        W = jnp.minimum(m, _roll_right(m, w - j, 0x7FFFFFFF)) if w > j else m

        complete = (sl >= jnp.int32(w + k - 1)) & in_n
        Ap = jnp.where(complete, W, IMIN)

        # leading sliding max of Ap over w
        mm = Ap
        j = 1
        while 2 * j <= w:
            mm = jnp.maximum(mm, _roll_left(mm, j, -0x80000000))
            j *= 2
        M = jnp.maximum(mm, _roll_left(mm, w - j, -0x80000000)) if w > j \
            else mm

        emit = (sHi != IMAX) & (M == sHi)

        # held minimum of the final window (newest tie wins)
        in_final = (col >= n - jnp.int32(w)) & in_n
        xmi = jnp.where(in_final, sHi, IMAX)
        fmin = jnp.min(xmi, axis=1, keepdims=True)
        t_f = jnp.max(jnp.where((xmi == fmin) & in_final, col, jnp.int32(-1)),
                      axis=1, keepdims=True)
        has_final = (fmin != IMAX) & (t_f >= jnp.int32(0))
        # in_n guard: tail positions hold STALE values (move_plane does
        # not fill holes), so emissions must be masked to the stream
        emit = (emit | ((col == t_f) & has_final)) & in_n

        # shift distances for the output compaction
        ei = emit.astype(jnp.int32)
        ci = ei
        s = 1
        while s < L:
            ci = ci + _roll_right(ci, s, 0)
            s *= 2
        cnt_ref[:] = ci[:, L - 128:]
        r_ref[:] = jnp.where(emit, col - ci + jnp.int32(1), jnp.int32(0))

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("w", "k", "rows", "interpret"))
def emit_mask(sH: jnp.ndarray, sPl: jnp.ndarray, n: jnp.ndarray,
              *, w: int, k: int, rows: int = 8, interpret: bool = False):
    """Fused window-minimum emission for the packed sketch (the XLA block
    in ops.sketch._sketch_impl_packed is the semantic reference; equality
    is tested in tests/test_sketch.py).

    sH/sPl: [B, L] compacted stream planes; n: [B] int32 counts.
    Returns (r [B, L] int32 shift distances for move_plane,
             count [B] int32 emitted entries per row).
    """
    B, L = sH.shape
    assert B % rows == 0 and L % 128 == 0 and 0 < w < L
    nb = jnp.broadcast_to(n.astype(jnp.int32)[:, None], (B, 128))
    zero = np.int32(0)
    blk = pl.BlockSpec((rows, L), lambda i: (i, zero),
                       memory_space=pltpu.VMEM)
    cblk = pl.BlockSpec((rows, 128), lambda i: (i, zero),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _make_emit_kernel(w, k, L),
        grid=(B // rows,),
        in_specs=[blk, blk, cblk],
        out_specs=[blk, cblk],
        out_shape=[jax.ShapeDtypeStruct((B, L), jnp.int32),
                   jax.ShapeDtypeStruct((B, 128), jnp.int32)],
        interpret=interpret,
    )(sH, sPl, nb)
    return outs[0], outs[1][:, -1]


@functools.partial(jax.jit,
                   static_argnames=("fills", "rows", "interpret", "passes"))
def compact_planes(keep: jnp.ndarray, planes: tuple, fills: tuple,
                   rows: int = 8, interpret: bool = False,
                   passes: int | None = None):
    """Compact uint32 planes by a shared keep mask.

    Args:
      keep:   [B, L] int32 (0/1), B % rows == 0, L % 128 == 0.
      planes: tuple of [B, L] uint32 arrays.
      fills:  per-plane hole value (static).
      passes: bit passes to run (default log2(L) — any shift distance).
              Callers may pass fewer when they can bound the max shift
              (wrong results if the bound is violated — guard with a
              lax.cond on the actual max, as ops.sketch._compact does).

    Returns (planes', count[B] int32).
    """
    B, L = keep.shape
    assert B % rows == 0 and L % 128 == 0
    n = len(planes)
    K = max(1, (L - 1).bit_length()) if passes is None else passes
    kern = _make_kernel(n, fills, K)
    zero = np.int32(0)  # a bare 0 traces as i64 under x64 and kills Mosaic
    blk = pl.BlockSpec((rows, L), lambda i: (i, zero),
                       memory_space=pltpu.VMEM)
    cblk = pl.BlockSpec((rows, 128), lambda i: (i, zero),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kern,
        grid=(B // rows,),
        in_specs=[blk] * (n + 1),
        out_specs=[blk] * n + [cblk],
        out_shape=[jax.ShapeDtypeStruct((B, L), jnp.uint32)] * n
        + [jax.ShapeDtypeStruct((B, 128), jnp.int32)],
        interpret=interpret,
    )(keep, *planes)
    return tuple(outs[:n]), outs[n][:, -1]


def _make_reduce_kernel(r: int, L: int):
    """One hierarchical-reduction level on the stream planes: the window
    winner at column j minimizes (hash, ring slot) over the r trailing
    entries — identical ordering to the reference composite key
    (x & ~0xFF) | slot, since x = hash<<8|span with constant span for
    k <= 16 (ops.reduce.reduce_impl is the semantic reference).  Emits
    winners deduplicated against the previous column and computes the
    compaction shift distances for move_plane."""
    def kernel(h_ref, p_ref, n_ref, ho_ref, po_ref, r_ref, cnt_ref):
        H = h_ref[:]
        P = p_ref[:]
        n = n_ref[:, :1]
        R = H.shape[0]
        col = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)

        # signed-domain hash for unsigned ordering; ring slot = col % r
        Hi = pltpu.bitcast(H ^ jnp.uint32(0x80000000), jnp.int32)
        q = col // jnp.int32(r)
        slot = col - q * jnp.int32(r)

        best_h, best_s, best_p = Hi, slot, P
        for d in range(1, r):
            hd = _roll_right(Hi, d, 0x7FFFFFFF)
            sd = _roll_right(slot, d, 0x7FFFFFFF)
            pd = _roll_right(P, d, 0)
            win = (hd < best_h) | ((hd == best_h) & (sd < best_s))
            best_h = jnp.where(win, hd, best_h)
            best_s = jnp.where(win, sd, best_s)
            best_p = jnp.where(win, pd, best_p)

        valid = (col >= jnp.int32(r - 1)) & (col < n)
        prev_p = _roll_right(best_p, 1, 0)
        prev_valid = (col >= jnp.int32(r)) & (col < n + jnp.int32(1))
        emit = valid & ((best_p != prev_p) | jnp.logical_not(prev_valid))

        ho_ref[:] = pltpu.bitcast(best_h, jnp.uint32) ^ jnp.uint32(0x80000000)
        po_ref[:] = best_p
        ei = emit.astype(jnp.int32)
        ci = ei
        s = 1
        while s < L:
            ci = ci + _roll_right(ci, s, 0)
            s *= 2
        cnt_ref[:] = ci[:, L - 128:]
        r_ref[:] = jnp.where(emit, col - ci + jnp.int32(1), jnp.int32(0))
    return kernel


@functools.partial(jax.jit, static_argnames=("r", "rows", "interpret"))
def reduce_step(H: jnp.ndarray, P: jnp.ndarray, n: jnp.ndarray, *, r: int,
                rows: int = 8, interpret: bool = False):
    """One reduction level on (H, P, n); returns (H', P', shift, count) —
    apply move_plane(shift, .) to H' and P' to compact the winners."""
    B, L = H.shape
    assert B % rows == 0 and L % 128 == 0 and 1 < r < 256
    nb = jnp.broadcast_to(n.astype(jnp.int32)[:, None], (B, 128))
    zero = np.int32(0)
    blk = pl.BlockSpec((rows, L), lambda i: (i, zero),
                       memory_space=pltpu.VMEM)
    cblk = pl.BlockSpec((rows, 128), lambda i: (i, zero),
                        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _make_reduce_kernel(r, L),
        grid=(B // rows,),
        in_specs=[blk, blk, cblk],
        out_specs=[blk, blk, blk, cblk],
        out_shape=[jax.ShapeDtypeStruct((B, L), jnp.uint32),
                   jax.ShapeDtypeStruct((B, L), jnp.uint32),
                   jax.ShapeDtypeStruct((B, L), jnp.int32),
                   jax.ShapeDtypeStruct((B, 128), jnp.int32)],
        interpret=interpret,
    )(H, P, nb)
    return outs[0], outs[1], outs[2], outs[3][:, -1]
