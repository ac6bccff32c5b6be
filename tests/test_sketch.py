import numpy as np
import pytest

from peregrine_tpu.io.seqdb import seq_to_codes
from peregrine_tpu.ops.sketch import sketch_batch, sketch_reads_np, hash64
from tests import oracles
from tests.conftest import random_seq

import jax.numpy as jnp


def test_hash64_matches_oracle(rng):
    mask = (1 << 32) - 1
    keys = rng.integers(0, mask, size=100, dtype=np.uint64)
    got = np.asarray(hash64(jnp.asarray(keys), jnp.uint64(mask)))
    want = np.array([oracles.hash64(int(x), mask) for x in keys], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)
    mask56 = (1 << 56) - 1
    keys = rng.integers(0, mask56, size=100, dtype=np.uint64)
    got = np.asarray(hash64(jnp.asarray(keys), jnp.uint64(mask56)))
    want = np.array([oracles.hash64(int(x), mask56) for x in keys], dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


def _run_batch(seqs, w, k, pad=None):
    pad = pad or max(len(s) for s in seqs)
    B = len(seqs)
    codes = np.full((B, pad), 4, np.uint8)
    lens = np.zeros(B, np.int32)
    for i, s in enumerate(seqs):
        codes[i, :len(s)] = seq_to_codes(s)
        lens[i] = len(s)
    rids = np.arange(B, dtype=np.uint32)
    x, y = sketch_reads_np(codes, lens, rids, w, k)
    return list(zip(x.tolist(), y.tolist()))


@pytest.mark.parametrize("w,k,n", [(80, 16, 2000), (80, 16, 500),
                                   (12, 8, 777), (24, 12, 1200)])
def test_sketch_matches_oracle_clean(rng, w, k, n):
    # k >= 8: hash ties within a window are vanishingly rare, so the
    # emission set equals the reference's sequential output exactly
    seqs = [random_seq(rng, n + 17 * i) for i in range(4)]
    got = _run_batch(seqs, w, k)
    want = []
    for rid, s in enumerate(seqs):
        want.extend(oracles.mm_sketch(s, w, k, rid))
    assert got == want


def test_sketch_tiny_k_superset(rng):
    # k=4 on random sequences hits first-complete-window hash ties; the
    # documented divergence makes the output a superset (order preserved)
    seqs = [random_seq(rng, 300 + 17 * i) for i in range(4)]
    got = _run_batch(seqs, 5, 4)
    want = []
    for rid, s in enumerate(seqs):
        want.extend(oracles.mm_sketch(s, 5, 4, rid))
    got_set = set(got)
    assert all(t in got_set for t in want)
    want_set = set(want)
    assert [t for t in got if t in want_set] == want


def test_sketch_short_reads(rng):
    # shorter than w+k-1: only the final held minimum is emitted
    seqs = [random_seq(rng, 40), random_seq(rng, 90), random_seq(rng, 17)]
    got = _run_batch(seqs, 80, 16, pad=128)
    want = []
    for rid, s in enumerate(seqs):
        want.extend(oracles.mm_sketch(s, 80, 16, rid))
    assert got == want


def test_sketch_tiny_wk(rng):
    # Small w,k with periodic sequences create dense hash ties.  The
    # reference's sequential algorithm drops a tie-element exactly at the
    # first-complete-window boundary (supersede guard l >= w+k fires one
    # step after the l == w+k-1 special case); the declarative emission-set
    # implementation keeps it.  Assert superset + order preservation.
    seqs = [b"ACGT" * 100, b"AAAACCCCGGGGTTTT" * 20, random_seq(rng, 256)]
    got = _run_batch(seqs, 5, 4, pad=512)
    want = []
    for rid, s in enumerate(seqs):
        want.extend(oracles.mm_sketch(s, 5, 4, rid))
    got_set = set(got)
    assert all(t in got_set for t in want)
    want_set = set(want)
    assert [t for t in got if t in want_set] == want
    assert len(got) - len(want) <= len(seqs)


def test_sketch_with_ambiguous_superset(rng):
    # with N's the implementation may emit a superset near resets; every
    # oracle emission must be present, order preserved for common entries
    seqs = [random_seq(rng, 1500, with_n=True) for _ in range(3)]
    got = _run_batch(seqs, 12, 8)
    want = []
    for rid, s in enumerate(seqs):
        want.extend(oracles.mm_sketch(s, 12, 8, rid))
    got_set = set(got)
    missing = [t for t in want if t not in got_set]
    assert not missing
    # order of the oracle subsequence is preserved
    want_set = set(want)
    filtered = [t for t in got if t in want_set]
    assert filtered == want


def test_sketch_position_strand_encoding(rng):
    seq = random_seq(rng, 3000)
    out = _run_batch([seq], 80, 16)
    assert len(out) > 0
    for x, y in out:
        assert (x & 0xFF) == 16          # span
        assert (y >> 32) == 0            # rid
        pos = (y & 0xFFFFFFFF) >> 1
        assert 15 <= pos < len(seq)


def test_sketch_long_matches_single_shot(rng):
    from peregrine_tpu.ops.sketch import sketch_long_np
    seq = random_seq(rng, 200_000)
    codes = seq_to_codes(seq)
    # single shot
    import jax
    import jax.numpy as jnp
    from peregrine_tpu.ops.sketch import sketch_batch
    pad = 1 << 18
    batch = np.full((1, pad), 4, np.uint8)
    batch[0, :len(codes)] = codes
    x, y, c = jax.device_get(sketch_batch(
        jnp.asarray(batch), jnp.asarray([len(codes)], np.int32),
        jnp.asarray([7], np.uint32), w=80, k=16))
    want = list(zip(x[0, :c[0]].tolist(), y[0, :c[0]].tolist()))
    gx, gy = sketch_long_np(codes, 7, 80, 16, seg=1 << 15, margin=1 << 12)
    got = list(zip(gx.tolist(), gy.tolist()))
    assert got == want


def test_shift_compact_matches_sort_compact(rng):
    from peregrine_tpu.ops.sketch import _shift_compact, _sort_compact, INF
    import jax.numpy as jnp

    for B, L, p in ((8, 512, 0.97), (4, 1024, 0.03), (3, 64, 0.5),
                    (2, 128, 0.0), (2, 128, 1.0)):
        keep = rng.random((B, L)) < p
        vals = rng.integers(0, 2**63, (B, L)).astype(np.uint64)
        vals = np.where(keep, vals, np.uint64(0xFFFFFFFFFFFFFFFF))
        aux = rng.integers(0, 100, (B, L)).astype(np.int32)
        aux = np.where(keep, aux, 0)
        k = jnp.asarray(keep)
        (sv, sa), sn = _sort_compact(k, [jnp.asarray(vals), jnp.asarray(aux)])
        (hv, ha), hn = _shift_compact(k, [jnp.asarray(vals), jnp.asarray(aux)],
                                      fills=[INF, jnp.int32(0)])
        np.testing.assert_array_equal(np.asarray(sn), np.asarray(hn))
        np.testing.assert_array_equal(np.asarray(sv), np.asarray(hv))
        np.testing.assert_array_equal(np.asarray(sa), np.asarray(ha))


def test_compact_pallas_interpret_matches_shift(rng):
    import jax.numpy as jnp
    from peregrine_tpu.ops.compact_pallas import compact_planes
    from peregrine_tpu.ops.sketch import _shift_compact

    B, L = 8, 512
    for p in (0.9, 0.05, 0.0, 1.0):
        keep = rng.random((B, L)) < p
        p1 = rng.integers(0, 2**32, (B, L)).astype(np.uint32)
        p2 = rng.integers(0, 2**32, (B, L)).astype(np.uint32)
        (o1, o2), cnt = compact_planes(
            jnp.asarray(keep.astype(np.int32)),
            (jnp.asarray(p1), jnp.asarray(p2)),
            (0xFFFFFFFF, 0), interpret=True)
        (s1, s2), scnt = _shift_compact(
            jnp.asarray(keep), [jnp.asarray(p1), jnp.asarray(p2)],
            fills=[jnp.uint32(0xFFFFFFFF), jnp.uint32(0)])
        np.testing.assert_array_equal(np.asarray(cnt), np.asarray(scnt))
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(s1))
        np.testing.assert_array_equal(np.asarray(o2), np.asarray(s2))


def test_emit_mask_pallas_interpret_matches_xla(rng):
    """The fused Pallas emission kernel equals the XLA reference block on
    random compacted streams (incl. amb placeholders, warmup INF hashes,
    short rows)."""
    import jax
    import jax.numpy as jnp
    from peregrine_tpu.ops.compact_pallas import emit_mask
    from peregrine_tpu.ops.sketch import (_sliding_min_trailing,
                                          _sliding_max_leading)

    B, L, w, k = 8, 1024, 24, 12
    INF32 = np.uint32(0xFFFFFFFF)
    n = rng.integers(0, L, B).astype(np.int32)
    n[0] = 0
    n[1] = L
    sH = rng.integers(0, 2**32, (B, L)).astype(np.uint32)
    amb = rng.random((B, L)) < 0.02
    warm = rng.random((B, L)) < 0.05
    sH = np.where(amb | warm, INF32, sH)
    sPl = ((rng.integers(0, L, (B, L)).astype(np.uint32) << np.uint32(2))
           | rng.integers(0, 2, (B, L)).astype(np.uint32) << np.uint32(1)
           | amb.astype(np.uint32))
    col = np.arange(L)[None, :]
    hole = col >= n[:, None]
    sH = np.where(hole, INF32, sH)
    sPl = np.where(hole, INF32, sPl)

    r2, cnt = emit_mask(jnp.asarray(sH), jnp.asarray(sPl),
                        jnp.asarray(n), w=w, k=k, interpret=True)

    # XLA reference block (mirrors ops.sketch._sketch_impl_packed)
    scol = jnp.arange(L)[None, :]
    in_n = scol < jnp.asarray(n)[:, None]
    samb = ((jnp.asarray(sPl) & jnp.uint32(1)) != 0) & in_n
    last_amb = jax.lax.cummax(jnp.where(samb, scol, -1), axis=1)
    sl = (scol - last_amb).astype(jnp.int32)
    W = _sliding_min_trailing(jnp.asarray(sH), w, jnp.uint32(0xFFFFFFFF))
    complete = sl >= (w + k - 1)
    Ap = jnp.where(complete & in_n, W, jnp.uint32(0))
    M = _sliding_max_leading(Ap, w, jnp.uint32(0))
    emit = (jnp.asarray(sH) != jnp.uint32(0xFFFFFFFF)) & (M == jnp.asarray(sH))
    in_final = (scol >= (jnp.asarray(n)[:, None] - w)) & in_n
    xm = jnp.where(in_final, jnp.asarray(sH), jnp.uint32(0xFFFFFFFF))
    fmin = jnp.min(xm, axis=1)
    t_f = jnp.max(jnp.where((xm == fmin[:, None]) & in_final, scol, -1), axis=1)
    has_final = (fmin != jnp.uint32(0xFFFFFFFF)) & (t_f >= 0)
    emit = emit | ((scol == t_f[:, None]) & has_final[:, None])
    emit = np.asarray(emit)
    col = np.arange(L)[None, :]
    cvk = np.cumsum(emit, axis=1)
    r_ref = np.where(emit, col - cvk + 1, 0)
    np.testing.assert_array_equal(np.asarray(r2), r_ref)
    np.testing.assert_array_equal(np.asarray(cnt), emit.sum(axis=1))


def test_build_stream_pallas_interpret_matches_xla(rng):
    """The fused Pallas stream build equals the XLA reference block
    (rolling canonical k-mers, hash, ambiguity run length)."""
    import jax
    import jax.numpy as jnp
    from peregrine_tpu.ops.compact_pallas import build_stream
    from peregrine_tpu.ops.sketch import hash64, _shift_right

    B, L = 8, 512
    for k in (11, 12, 16):
        codes = rng.integers(0, 4, (B, L)).astype(np.uint8)
        codes[rng.random((B, L)) < 0.02] = 4          # ambiguous
        lengths = rng.integers(1, L + 1, B).astype(np.int32)
        lengths[0] = L

        H, Pl, r1, n = build_stream(jnp.asarray(codes), jnp.asarray(lengths),
                                    k=k, interpret=True)

        # XLA reference (mirrors ops.sketch._sketch_impl_packed)
        mask = jnp.uint32((1 << (2 * k)) - 1)
        pos = jnp.arange(L)[None, :]
        c = jnp.asarray(codes).astype(jnp.int32)
        inlen = pos < jnp.asarray(lengths)[:, None]
        valid = (c < 4) & inlen
        amb = (c >= 4) & inlen
        cb = (c & 3).astype(jnp.uint32)
        cbr = cb ^ jnp.uint32(3)
        fwd = jnp.zeros((B, L), jnp.uint32)
        rev = jnp.zeros((B, L), jnp.uint32)
        for d in range(k):
            fwd = fwd | (_shift_right(cb, d, jnp.uint32(0)) << jnp.uint32(2 * d))
            rev = rev | (_shift_right(cbr, d, jnp.uint32(0))
                         << jnp.uint32(2 * (k - 1 - d)))
        fwd = fwd & mask
        sym = (fwd == rev) & valid
        strand = jnp.where(fwd < rev, jnp.uint32(0), jnp.uint32(1))
        hsh = hash64(jnp.minimum(fwd, rev), mask)
        vns = valid & ~sym
        cvns = jnp.cumsum(vns, axis=1).astype(jnp.int32)
        at_amb = jax.lax.cummax(jnp.where(amb, cvns, 0), axis=1)
        defined = vns & ((cvns - at_amb) >= k)
        H_ref = jnp.where(defined, hsh, jnp.uint32(0xFFFFFFFF))
        P_ref = ((pos.astype(jnp.uint32) << jnp.uint32(2))
                 | (strand << jnp.uint32(1)) | amb.astype(jnp.uint32))
        inc_ref = vns | amb

        np.testing.assert_array_equal(np.asarray(H), np.asarray(H_ref),
                                      err_msg=f"H k={k}")
        np.testing.assert_array_equal(np.asarray(Pl), np.asarray(P_ref),
                                      err_msg=f"P k={k}")
        inc_np = np.asarray(inc_ref)
        col = np.arange(L)[None, :]
        cvk = np.cumsum(inc_np, axis=1)
        r_ref = np.where(inc_np, col - cvk + 1, 0)
        np.testing.assert_array_equal(np.asarray(r1), r_ref,
                                      err_msg=f"r k={k}")
        np.testing.assert_array_equal(np.asarray(n), inc_np.sum(axis=1),
                                      err_msg=f"n k={k}")


def test_move_plane_interpret_matches_shift(rng):
    """move_plane with producer-computed shift distances equals the XLA
    shift compaction within the count (tails are stale by contract)."""
    import jax.numpy as jnp
    from peregrine_tpu.ops.compact_pallas import move_plane
    from peregrine_tpu.ops.sketch import _shift_compact

    B, L = 8, 512
    for p in (0.97, 0.03, 1.0):
        keep = rng.random((B, L)) < p
        vals = rng.integers(0, 2**32, (B, L)).astype(np.uint32)
        col = np.arange(L)[None, :]
        cvk = np.cumsum(keep, axis=1)
        r = np.where(keep, col - cvk + 1, 0).astype(np.int32)
        got = np.asarray(move_plane(jnp.asarray(r), jnp.asarray(vals),
                                    interpret=True))
        (ref,), cnt = _shift_compact(jnp.asarray(keep), [jnp.asarray(vals)],
                                     fills=[jnp.uint32(0)])
        cnt = np.asarray(cnt)
        for b in range(B):
            np.testing.assert_array_equal(got[b, :cnt[b]],
                                          np.asarray(ref)[b, :cnt[b]])


def test_sketch_long_cap_overflow_fallback(rng):
    """A dense sketch (tiny w) overflows the capped device fetch; the
    uncapped refetch path must still return the exact emission set."""
    from peregrine_tpu.ops.sketch import sketch_batch, sketch_long_np
    import jax
    import jax.numpy as jnp

    seq = random_seq(rng, 100_000)
    codes = seq_to_codes(seq)
    # w=3: density ~2/(w+1) = 0.5 per base >> cap (= pad/8)
    pad = 1 << 17
    batch = np.full((1, pad), 4, np.uint8)
    batch[0, :len(codes)] = codes
    x, y, c = jax.device_get(sketch_batch(
        jnp.asarray(batch), jnp.asarray([len(codes)], np.int32),
        jnp.asarray([3], np.uint32), w=3, k=12))
    want = list(zip(x[0, :c[0]].tolist(), y[0, :c[0]].tolist()))
    assert c[0] > pad // 8  # the test must actually overflow the cap
    gx, gy = sketch_long_np(codes, 3, 3, 12, seg=1 << 15, margin=1 << 12)
    got = list(zip(gx.tolist(), gy.tolist()))
    assert got == want
