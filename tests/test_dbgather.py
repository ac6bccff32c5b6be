"""Packed device seqdb gather vs the 4-bit codec semantics.

Oracle: the byte-per-base dual-strand codec (reference
src/shmr_utils.c:44-62) — strand 0 reads low nibbles at [off, off+L),
strand 1 reads high nibbles (= complement of the mirrored forward base).
The packed gather must reproduce it exactly for windows ending at their
read's end (the only windows the aligner issues), including ambiguous
bases and sub-byte offsets.
"""

import numpy as np
import jax.numpy as jnp

from peregrine_tpu.ops.dbgather import (GUARD_BASES, gather_codes,
                                        gather_offsets, pack_db_np,
                                        upload_seqdb)

_NIB2CODE = {1: 0, 2: 1, 4: 2, 8: 3}


def _oracle(data, off, ln, strand, L, fill):
    out = np.full(L, fill, np.uint8)
    for i in range(min(ln, L)):
        b = data[off + i]
        nib = (b & 0xF) if strand == 0 else (b >> 4)
        out[i] = _NIB2CODE.get(int(nib), fill)
    return out


def _random_db(rng, n_reads=40, min_len=200, max_len=3000, n_frac=0.01):
    """Random 4-bit codec db with dual-strand nibbles and some N bases."""
    f_map = np.array([1, 2, 4, 8], np.uint8)
    lengths = rng.integers(min_len, max_len, n_reads)
    chunks, offsets = [], []
    pos = 0
    for n in lengths:
        codes = rng.integers(0, 4, n).astype(np.uint8)
        amb = rng.random(n) < n_frac
        fw = np.where(amb, 15, f_map[codes])
        # high nibble at p = complement code of base at n-1-p
        rc = np.where(amb, 15, f_map[codes ^ 3])[::-1]
        chunks.append((fw | (rc << 4)).astype(np.uint8))
        offsets.append(pos)
        pos += int(n)
    return (np.concatenate(chunks), np.asarray(offsets, np.int64),
            lengths.astype(np.int64))


def test_gather_codes_matches_4bit_oracle(rng):
    data, offsets, lengths = _random_db(rng)
    pdb = upload_seqdb(data)

    B, L = 64, 4096  # L >= max read length: windows always end at read end
    rid = rng.integers(0, len(offsets), B)
    shift = np.minimum(rng.integers(0, 300, B), lengths[rid] - 1)
    off = offsets[rid] + shift
    ln = (lengths[rid] - shift).astype(np.int32)
    strand = rng.integers(0, 2, B).astype(np.int32)

    goff = gather_offsets(off, ln, strand, offsets[rid], L)
    got = np.asarray(gather_codes(pdb, jnp.asarray(goff),
                                  jnp.asarray(ln), jnp.asarray(strand),
                                  L, fill=7))
    for b in range(B):
        want = _oracle(data, int(off[b]), int(ln[b]), int(strand[b]), L, 7)
        np.testing.assert_array_equal(got[b], want, err_msg=f"lane {b}")


def test_gather_negative_mirror_start(rng):
    """A short strand-1 read at the very start of the db gathers from a
    negative (guard-covered) offset."""
    data, offsets, lengths = _random_db(rng, n_reads=3, min_len=100,
                                        max_len=200)
    pdb = upload_seqdb(data)
    L = 1024
    assert offsets[0] + lengths[0] < L  # mirror start is negative
    ln = np.asarray([lengths[0]], np.int32)
    strand = np.ones(1, np.int32)
    goff = gather_offsets(offsets[:1], ln, strand, offsets[:1], L)
    assert goff[0] < 0
    got = np.asarray(gather_codes(pdb, jnp.asarray(goff), jnp.asarray(ln),
                                  jnp.asarray(strand), L, fill=7))
    want = _oracle(data, int(offsets[0]), int(ln[0]), 1, L, 7)
    np.testing.assert_array_equal(got[0], want)


def test_pack_db_np_guard_and_planes(rng):
    data = np.array([1, 2, 4, 8, 15, 1, 2, 3], np.uint8)  # 3 = amb nibble
    fw, amb = pack_db_np(data, guard_bases=1024)
    codes = np.zeros(1024 + 8, np.uint8)
    codes[1024:1032] = [0, 1, 2, 3, 0, 0, 1, 0]
    ambs = np.zeros(1024 + 8, bool)
    ambs[1028] = True
    ambs[1031] = True
    c4 = codes[:len(fw) * 4].reshape(-1, 4)
    want_fw = (c4[:, 0] | (c4[:, 1] << 2) | (c4[:, 2] << 4) | (c4[:, 3] << 6))
    np.testing.assert_array_equal(fw, want_fw.astype(np.uint8))
    np.testing.assert_array_equal(
        np.unpackbits(amb, bitorder="little")[:len(ambs)], ambs)


def test_seqdb_uploader_matches_bulk_upload(rng):
    """The incremental stage-0 uploader must produce planes bit-identical
    to the one-shot upload_seqdb, including guard, padding class, and a
    ragged final chunk."""
    import numpy as np

    from peregrine_tpu.ops.dbgather import SeqDBUploader, upload_seqdb

    data = rng.integers(0, 16, size=3 * 1024 * 17 + 531, dtype=np.uint8)
    want = upload_seqdb(data)
    up = SeqDBUploader()
    pos = 0
    for step in (1024, 5 * 1024, 16 * 1024, 2 * 1024):
        up.feed(data[pos:pos + step])
        pos += step
    up.feed(data[pos:])  # ragged tail
    got = up.finish()
    assert got.fw.shape == want.fw.shape
    assert got.amb.shape == want.amb.shape
    np.testing.assert_array_equal(np.asarray(got.fw), np.asarray(want.fw))
    np.testing.assert_array_equal(np.asarray(got.amb), np.asarray(want.amb))


def test_seqdb_uploader_via_build_to_disk(tmp_path, rng):
    """build_to_disk's chunk sink feeds the uploader aligned chunks whose
    concatenation is the full encoded stream."""
    import numpy as np

    from peregrine_tpu.io.seqdb import SeqDB
    from peregrine_tpu.ops.dbgather import SeqDBUploader, upload_seqdb
    from tests.conftest import random_seq

    reads = [(f"r{i}", random_seq(rng, int(rng.integers(200, 3000))))
             for i in range(40)]
    fa = tmp_path / "r.fa"
    with open(fa, "w") as f:
        for name, seq in reads:
            f.write(f">{name}\n{seq.decode()}\n")
    lst = tmp_path / "r.lst"
    lst.write_text(str(fa) + "\n")
    up = SeqDBUploader()
    db = SeqDB.build_to_disk(str(lst), str(tmp_path / "db"),
                             chunk_sink=up.feed, chunk_bases=4096)
    got = up.finish()
    want = upload_seqdb(np.asarray(db.data))
    np.testing.assert_array_equal(np.asarray(got.fw), np.asarray(want.fw))
    np.testing.assert_array_equal(np.asarray(got.amb), np.asarray(want.amb))
