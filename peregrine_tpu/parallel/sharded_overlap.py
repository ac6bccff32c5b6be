"""Multi-chip overlap alignment over a read-sharded device seqdb.

At human scale the packed seqdb no longer fits one chip's HBM (90 Gbases
of 30x reads ~ 22 GB even 2-bit packed), so each chip holds only its read
shard and alignment requests ride ICI to the data instead of the data
being replicated (SURVEY.md §2.3: the reference's analog is N processes
sharing one mmap; a TPU pod has no shared memory, so the all_to_all IS
the mmap).

Execution model per batch of (query read, target read) alignment requests:

1. the host routes each request to the chip owning its QUERY read and
   pre-groups it by the chip owning its TARGET read (static capacity
   ``cap`` per (src, dst) pair, mirroring sharded_index's exchange);
2. every chip gathers+decodes its local query windows ([cap, L] 2-bit
   codes per destination) and ships them — together with the target
   request fields — to the target owner via one tiled ``all_to_all``;
3. every chip gathers its local target windows and runs the banded Myers
   kernel (ops.device_align._myers_core) on the full received batch;
4. results return to the host sharded by executing chip; the host
   unpermutes them into request order.

Validated against the single-device myers_batch_db on a virtual CPU mesh
(tests/test_sharded.py)."""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.device_align import _myers_core
from ..ops.dbgather import gather_codes


@dataclass
class ShardedSeqDB:
    """Read-sharded packed seqdb resident across a mesh."""
    rows: jnp.ndarray        # [D, R, 128] bytes, sharded on dim 0
    base: np.ndarray         # [D] byte offset where each shard starts
    owner: np.ndarray        # [n_reads] owning chip per read
    mesh: Mesh
    axis: str


def shard_seqdb(data: np.ndarray, offsets: np.ndarray,
                mesh: Mesh, axis: str = "data") -> ShardedSeqDB:
    """Split the packed byte array into row-aligned, read-aligned shards.

    Boundaries fall on read starts (a read's bytes never straddle chips)
    rounded down to 128-byte rows; shards are padded to a common pow2 row
    count so the stacked array has one static shape per size class.
    """
    n = mesh.devices.size
    total = len(data)
    n_reads = len(offsets)
    offsets = offsets.astype(np.int64)
    # greedy byte-balanced cuts at read starts, floored to 128-byte rows;
    # flooring can pull the previous read's tail row into the next shard,
    # so shard segments OVERLAP by up to one read: segment d runs from
    # cut[d] to the start of the first read owned by d+1 (tail bytes near
    # a cut are duplicated on both chips — a read never straddles)
    target = total / n
    cut = np.zeros(n + 1, np.int64)
    r = 0
    for d in range(1, n):
        want = int(round(d * target))
        while r < n_reads and offsets[r] < want:
            r += 1
        cut[d] = (int(offsets[r]) >> 7) << 7 if r < n_reads else total
    cut[n] = total
    base = cut[:n].copy()
    # owner d = number of interior cuts <= read offset
    owner = np.searchsorted(cut[1:n], offsets, side="right").astype(np.int32)
    first_of = np.searchsorted(owner, np.arange(n + 1))  # [n+1] read idx
    seg_end = np.where(first_of[1:] < n_reads,
                       offsets[np.minimum(first_of[1:], n_reads - 1)],
                       total)
    rmax = max(1, int(np.max(-(-(seg_end - base) // 128))))
    rpad = -(-rmax // 8192) * 8192  # 1 MB granularity (pow2 over-pads at scale)
    stacked = np.zeros((n, rpad, 128), np.uint8)
    for d in range(n):
        seg = data[base[d]:seg_end[d]]
        stacked[d].reshape(-1)[:len(seg)] = seg
    rows = jax.device_put(
        jnp.asarray(stacked),
        jax.sharding.NamedSharding(mesh, P(axis, None, None)))
    return ShardedSeqDB(rows=rows, base=base, owner=owner, mesh=mesh,
                        axis=axis)


def _exchange_align(rows, qo, ql, qs, to, tl, ts, *, axis: str, n: int,
                    cap: int, L: int, nb: int, unroll: int):
    """shard_map body: local q gather -> all_to_all -> local t gather ->
    Myers. All request arrays are [1, n*cap] (this chip's q-owned
    requests, grouped [dst, cap])."""
    rows = rows[0]

    def ex(a):
        # [n*cap,...] grouped by dst -> rows from each src after exchange
        return jax.lax.all_to_all(a.reshape((n, cap) + a.shape[1:]),
                                  axis, 0, 0, tiled=True).reshape(
                                      (n * cap,) + a.shape[1:])

    qc = gather_codes(rows.reshape(-1, 128), qo[0], ql[0], qs[0], L, fill=7)
    qc = ex(qc)
    ql2 = ex(ql[0])
    to2, tl2, ts2 = ex(to[0]), ex(tl[0]), ex(ts[0])
    tc = gather_codes(rows.reshape(-1, 128), to2, tl2, ts2, L, fill=7)
    d, qe, te = _myers_core(qc, ql2, tc, tl2, nb=nb, unroll=unroll)
    return d[None], qe[None], te[None]


@functools.lru_cache(maxsize=64)
def _build_exchange(mesh: Mesh, axis: str, n: int, cap: int, L: int,
                    nb: int, unroll: int):
    return jax.jit(jax.shard_map(
        functools.partial(_exchange_align, axis=axis, n=n, cap=cap,
                          L=L, nb=nb, unroll=unroll),
        mesh=mesh,
        in_specs=(P(axis, None, None),) + (P(axis, None),) * 6,
        out_specs=(P(axis, None),) * 3,
        # the Myers kernel's constant initial carries are unvarying while
        # its outputs vary per device; the VMA checker rejects that mix
        check_vma=False))


def sharded_align(sdb: ShardedSeqDB,
                  q_rid: np.ndarray, q_off: np.ndarray, q_len: np.ndarray,
                  q_strand: np.ndarray,
                  t_rid: np.ndarray, t_off: np.ndarray, t_len: np.ndarray,
                  t_strand: np.ndarray, *, L: int, nb: int = 8,
                  unroll: int = 32, cap: int | None = None):
    """Batched banded alignment of (query window, target read) requests
    against the sharded seqdb; returns (dist, q_end, t_end) in request
    order. q_off/t_off are ABSOLUTE byte offsets into the unsharded db.
    """
    n = sdb.mesh.devices.size
    nreq = len(q_rid)
    src = sdb.owner[q_rid]
    dst = sdb.owner[t_rid]
    qloc = q_off - sdb.base[src]
    tloc = t_off - sdb.base[dst]

    # slot assignment per (src, dst)
    pair = src.astype(np.int64) * n + dst
    order = np.argsort(pair, kind="stable")
    counts = np.bincount(pair, minlength=n * n)
    need = int(counts.max()) if nreq else 1
    if cap is None:
        cap = 1 << max(5, (need - 1).bit_length())
    if need > cap:
        raise ValueError(f"per-pair capacity {cap} < max group {need}")
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    slot = np.empty(nreq, np.int64)
    slot[order] = np.arange(nreq) - np.repeat(starts, counts)

    def pack(vals, dtype, fill=0):
        a = np.full((n, n * cap), fill, dtype)
        a[src, dst * cap + slot] = vals
        return jnp.asarray(a)

    qo = pack(qloc, np.int64)
    ql = pack(q_len, np.int32)
    qs = pack(q_strand, np.int32)
    to = pack(tloc, np.int64)
    tl = pack(t_len, np.int32)
    ts = pack(t_strand, np.int32)

    fn = _build_exchange(sdb.mesh, sdb.axis, n, cap, L, nb, unroll)
    out = fn(sdb.rows, qo, ql, qs, to, tl, ts)
    if jax.process_count() > 1:
        # multi-controller: the output shards span processes, so gather
        # the global result to every host (device_get needs addressability)
        from jax.experimental import multihost_utils
        d, qe, te = (np.asarray(multihost_utils.process_allgather(a, tiled=True))
                     for a in out)
    else:
        d, qe, te = jax.device_get(out)
    # request landed on chip dst at flat position src*cap + slot
    sel = (dst, src * cap + slot)
    return d[sel], qe[sel], te[sel]
