import numpy as np
import pytest

from peregrine_tpu.io.seqdb import seq_to_codes
from peregrine_tpu.ops.reduce import reduce_flat_np
from peregrine_tpu.ops.sketch import sketch_reads_np
from tests import oracles
from tests.conftest import random_seq


def _sketch(seqs, w, k):
    pad = max(len(s) for s in seqs)
    codes = np.full((len(seqs), pad), 4, np.uint8)
    lens = np.zeros(len(seqs), np.int32)
    for i, s in enumerate(seqs):
        codes[i, :len(s)] = seq_to_codes(s)
        lens[i] = len(s)
    return sketch_reads_np(codes, lens, np.arange(len(seqs), dtype=np.uint32), w, k)


@pytest.mark.parametrize("w,k,r", [(12, 8, 6), (12, 8, 3), (5, 4, 6), (80, 16, 6)])
def test_reduce_matches_oracle(rng, w, k, r):
    seqs = [random_seq(rng, 3000 + 11 * i) for i in range(5)]
    x, y = _sketch(seqs, w, k)
    l0 = list(zip(x.tolist(), y.tolist()))
    want1 = oracles.mm_reduce(l0, r)
    gx, gy = reduce_flat_np(x, y, r)
    got1 = list(zip(gx.tolist(), gy.tolist()))
    assert got1 == want1

    # second level (L2)
    want2 = oracles.mm_reduce(want1, r)
    g2x, g2y = reduce_flat_np(gx, gy, r)
    assert list(zip(g2x.tolist(), g2y.tolist())) == want2


def test_reduce_short_reads(rng):
    # reads yielding fewer than r minimizers produce no output
    seqs = [random_seq(rng, 60), random_seq(rng, 3000)]
    x, y = _sketch(seqs, 12, 8)
    want = oracles.mm_reduce(list(zip(x.tolist(), y.tolist())), 6)
    gx, gy = reduce_flat_np(x, y, 6)
    assert list(zip(gx.tolist(), gy.tolist())) == want


def test_reduce_tie_slot_break(rng):
    # duplicate hashes within a window exercise the ring-slot tiebreak
    x = np.array([(5 << 8) | 16, (5 << 8) | 16, (7 << 8) | 16,
                  (5 << 8) | 16, (9 << 8) | 16], dtype=np.uint64)
    y = np.array([(1 << 32) | (p << 1) for p in (10, 20, 30, 40, 50)],
                 dtype=np.uint64)
    want = oracles.mm_reduce(list(zip(x.tolist(), y.tolist())), 3)
    gx, gy = reduce_flat_np(x, y, 3)
    assert list(zip(gx.tolist(), gy.tolist())) == want


def test_end_filter_matches_reference_semantics(rng):
    """end_filter_np mirrors mm_end_filter's pos/r_pos selection."""
    import numpy as np

    from peregrine_tpu.ops.reduce import end_filter_np

    n = 500
    rlen = np.full(8, 3000, np.int64)
    rid = rng.integers(0, 8, n).astype(np.uint64)
    pos0 = rng.integers(15, 3000, n).astype(np.uint64)  # pos-1 encoding
    strand = rng.integers(0, 2, n).astype(np.uint64)
    span = np.full(n, 16, np.uint64)
    x = (rng.integers(0, 1 << 48, n).astype(np.uint64) << np.uint64(8)) | span
    y = (rid << np.uint64(32)) | ((pos0 - np.uint64(1)) << np.uint64(1)) | strand

    (x5, y5), (x3, y3) = end_filter_np(x, y, rlen, 250)
    pos = pos0.astype(np.int64)
    want5 = pos < 250
    want3 = (3000 - pos + 16) < 250
    assert len(x5) == int(want5.sum())
    assert len(x3) == int(want3.sum())
    np.testing.assert_array_equal(y5, y[want5])
    np.testing.assert_array_equal(y3, y[want3])


def test_reduce_step_pallas_interpret_matches_reduce_impl(rng):
    """The Pallas plane reduction (hash+slot lexicographic tournament +
    dedup + shift distances) equals reduce_impl on converted planes."""
    import jax.numpy as jnp
    from peregrine_tpu.ops.compact_pallas import (move_plane, reduce_step)
    from peregrine_tpu.ops.reduce import reduce_impl

    B, C, k, r = 8, 512, 12, 6
    count = rng.integers(0, C, B).astype(np.int32)
    count[0] = 0
    count[1] = C
    # stream planes: H hashes (duplicates likely: small value range to
    # exercise ties), P = pos<<2|strand<<1
    H = rng.integers(0, 50, (B, C)).astype(np.uint32)
    P = ((rng.integers(0, 2**15, (B, C)).astype(np.uint32) << np.uint32(2))
         | (rng.integers(0, 2, (B, C)).astype(np.uint32) << np.uint32(1)))
    col = np.arange(C)[None, :]
    inn = col < count[:, None]

    H2, P2, rs, cnt = reduce_step(jnp.asarray(H), jnp.asarray(P),
                                  jnp.asarray(count), r=r, interpret=True)
    oH = np.asarray(move_plane(rs, H2, interpret=True))
    oP = np.asarray(move_plane(rs, P2, interpret=True))
    cnt = np.asarray(cnt)

    # reference on u64 records (rid constant per row)
    INF = np.uint64(0xFFFFFFFFFFFFFFFF)
    rid = np.arange(B, dtype=np.uint64)[:, None]
    x = (H.astype(np.uint64) << np.uint64(8)) | np.uint64(k)
    y = ((rid << np.uint64(32))
         | ((P.astype(np.uint64) >> np.uint64(2)) << np.uint64(1))
         | ((P.astype(np.uint64) >> np.uint64(1)) & np.uint64(1)))
    x = np.where(inn, x, INF)
    y = np.where(inn, y, INF)
    rx, ry, rc = reduce_impl(jnp.asarray(x), jnp.asarray(y),
                             jnp.asarray(count), r=r)
    rx, ry, rc = np.asarray(rx), np.asarray(ry), np.asarray(rc)

    np.testing.assert_array_equal(cnt, rc)
    for b in range(B):
        n = cnt[b]
        got_x = (oH[b, :n].astype(np.uint64) << np.uint64(8)) | np.uint64(k)
        got_y = ((np.uint64(b) << np.uint64(32))
                 | ((oP[b, :n].astype(np.uint64) >> np.uint64(2))
                    << np.uint64(1))
                 | ((oP[b, :n].astype(np.uint64) >> np.uint64(1))
                    & np.uint64(1)))
        np.testing.assert_array_equal(got_x, rx[b, :n], err_msg=f"x row {b}")
        np.testing.assert_array_equal(got_y, ry[b, :n], err_msg=f"y row {b}")
