import numpy as np

from peregrine_tpu.config import AsmConfig
from peregrine_tpu.io.seqdb import SeqDB
from peregrine_tpu.ops.index import build_index
from peregrine_tpu.ops.overlap import (
    build_pairs, overlap_chunk, ovlps_to_text,
)
from tests.simdata import random_genome, simulate_reads


def _cfg():
    # small-genome scale: smaller windows, shorter min overlap
    return AsmConfig(k=12, w=24, r=4, levels=2, min_ovlp_aln=300,
                     sketch_pad_len=8192, sketch_batch=16)


def _make(rng, glen=30000, coverage=12.0):
    genome = random_genome(rng, glen)
    reads, truth = simulate_reads(rng, genome, read_len=3000, coverage=coverage)
    db = SeqDB.from_reads(reads)
    return genome, db, truth


def test_build_pairs_properties(rng):
    cfg = _cfg()
    _, db, _ = _make(rng)
    idx = build_index(db, cfg)
    key0, key1, y0, y1, d = build_pairs(idx, db.lengths,
                                        mc_lower=cfg.mc_lower,
                                        mc_upper=cfg.mc_upper)
    assert len(key0) > 0
    # sorted by composite key
    comp = list(zip(key0.tolist(), key1.tolist()))
    assert comp == sorted(comp)
    # every record pairs positions >= 100 apart in the same read
    p0 = (y0 >> np.uint64(1)) & np.uint64(0xFFFFFFF)
    p1 = (y1 >> np.uint64(1)) & np.uint64(0xFFFFFFF)
    same = (y0 >> np.uint64(32)) == (y1 >> np.uint64(32))
    assert same.all()
    fwd = d == 0
    assert (p1[fwd] - p0[fwd] >= 100).all()
    # reverse records mirror forward ones with both strands flipped
    rev = d == 1
    assert rev.sum() > 0
    assert ((y0[rev] ^ y1[rev]) != 0).all()
    # reverse pair positions are within read bounds
    rl = db.lengths[(y0[rev] >> np.uint64(32)).astype(np.int64)]
    assert (p0[rev].astype(np.int64) < rl).all()


def test_fused_pair_build_matches_numpy_oracle(rng):
    """The native fused build (build_pairs.cpp) must be byte-identical to
    the numpy build_pairs_np + _bucket_stream oracles — same stable
    (key0, key1) order, same flip arithmetic, same stream ordering."""
    from peregrine_tpu.ops.overlap import (_bucket_stream, bucket_stream,
                                           build_pairs_np)

    cfg = _cfg()
    _, db, _ = _make(rng)
    idx = build_index(db, cfg)
    for total in (1, 3):
        for chunk in range(1, total + 1):
            ref = build_pairs_np(idx, db.lengths, chunk, total,
                                 cfg.mc_lower, cfg.mc_upper)
            got = build_pairs(idx, db.lengths, chunk, total,
                              cfg.mc_lower, cfg.mc_upper)
            for a, b in zip(ref, got):
                assert len(a) == len(b)
                assert (a == b).all()
    ref = build_pairs_np(idx, db.lengths)
    s_ref = _bucket_stream(ref[0], ref[1], ref[2], ref[4], cfg.ovlp_upper)
    s_got = bucket_stream(ref[0], ref[1], ref[2], ref[4], cfg.ovlp_upper)
    assert len(s_got) == 5
    for a, b in zip(s_ref[:5], s_got):
        assert len(a) == len(b)
        assert (np.asarray(a) == np.asarray(b)).all()


def test_write_ovl_file_matches_text_oracle(tmp_path, rng):
    """The native preads.ovl writer must be byte-identical to the Python
    formatter + '-' terminator (incl. the %0.1f float rounding)."""
    from peregrine_tpu.ops.overlap import write_ovl_file

    cfg = _cfg()
    _, db, _ = _make(rng)
    idx = build_index(db, cfg)
    ovlps = overlap_chunk(db, idx, cfg)
    assert len(ovlps) > 0
    want = ("\n".join(ovlps_to_text(ovlps) + ["-"]) + "\n").encode()
    p = str(tmp_path / "preads.ovl")
    n = write_ovl_file(p, ovlps)
    got = open(p, "rb").read()
    assert got == want
    assert n == want.count(b"\n") - 1
    # empty input still writes the terminator
    p2 = str(tmp_path / "empty.ovl")
    assert write_ovl_file(p2, ovlps[:0]) == 0
    assert open(p2, "rb").read() == b"-\n"


def test_spill_mode_byte_identical(tmp_path, rng):
    """spill_dir-backed pair map + stream (bounded-RSS mode) must produce
    the same bytes as the anonymous-memory build."""
    from peregrine_tpu.ops.overlap import bucket_stream, overlap_all_spec

    cfg = _cfg()
    _, db, _ = _make(rng)
    idx = build_index(db, cfg)
    a = build_pairs(idx, db.lengths)
    b = build_pairs(idx, db.lengths, spill_dir=str(tmp_path))
    for x, y in zip(a, b):
        assert (np.asarray(x) == np.asarray(y)).all()
        assert isinstance(y, np.memmap)
    sa = bucket_stream(a[0], a[1], a[2], a[4], cfg.ovlp_upper)
    sb = bucket_stream(b[0], b[1], b[2], b[4], cfg.ovlp_upper,
                       spill_dir=str(tmp_path))
    for x, y in zip(sa, sb):
        assert (np.asarray(x) == np.asarray(y)).all()
    # the whole overlap stage accepts the spilled arrays
    r1 = overlap_all_spec(db, idx, cfg, n_workers=2, pairs=a)
    r2 = overlap_all_spec(db, idx, cfg.replace(spill_dir=str(tmp_path)),
                          n_workers=2, pairs=b)
    assert r1.tobytes() == r2.tobytes()


def test_pair_sharding_partitions(rng):
    cfg = _cfg()
    _, db, _ = _make(rng)
    idx = build_index(db, cfg)
    full = build_pairs(idx, db.lengths)
    parts = [build_pairs(idx, db.lengths, chunk=c, total_chunk=3)
             for c in (1, 2, 3)]
    assert sum(len(p[0]) for p in parts) == len(full[0])
    allrec = sorted(
        (int(a), int(b), int(c), int(dd), int(e))
        for p in parts
        for a, b, c, dd, e in zip(*p))
    fullrec = sorted(
        (int(a), int(b), int(c), int(dd), int(e))
        for a, b, c, dd, e in zip(*full))
    assert allrec == fullrec


def test_overlap_chunk_finds_true_overlaps(rng):
    cfg = _cfg()
    genome, db, truth = _make(rng)
    idx = build_index(db, cfg)
    ovlps = overlap_chunk(db, idx, cfg)
    assert len(ovlps) > 0

    # precision: every reported overlap pair truly overlaps >= 300bp
    bad = 0
    for o in ovlps:
        r0 = int(o["y0"] >> np.uint64(32))
        r1 = int(o["y1"] >> np.uint64(32))
        s0, e0, _ = truth[r0]
        s1, e1, _ = truth[r1]
        if min(e0, e1) - max(s0, s1) < 300:
            bad += 1
    assert bad <= max(1, len(ovlps) // 50)

    # sensitivity: most truly-contained/overlapping pairs with >=1.5kb overlap
    # that share index anchors should be found; check a weaker global bound
    n_true = 0
    for i in range(len(truth)):
        for j in range(i + 1, len(truth)):
            s0, e0, _ = truth[i]
            s1, e1, _ = truth[j]
            if min(e0, e1) - max(s0, s1) >= 2000:
                n_true += 1
    found_pairs = {(min(int(o["y0"] >> np.uint64(32)), int(o["y1"] >> np.uint64(32))),
                    max(int(o["y0"] >> np.uint64(32)), int(o["y1"] >> np.uint64(32))))
                   for o in ovlps}
    # bestn caps per-read extension; require a healthy fraction
    assert len(found_pairs) >= n_true * 0.2


def test_ovlps_to_text_format(rng):
    cfg = _cfg()
    _, db, _ = _make(rng, glen=20000, coverage=10.0)
    idx = build_index(db, cfg)
    ovlps = overlap_chunk(db, idx, cfg)
    lines = ovlps_to_text(ovlps)
    assert len(lines) > 0
    for ln in lines[:50]:
        f = ln.split()
        assert len(f) == 13
        assert len(f[0]) == 9 and len(f[1]) == 9  # %09d rids
        assert int(f[2]) < 0                      # -m_size
        assert 0 < float(f[3]) <= 100.0           # err_est
        assert f[4] == "0"
        a_bgn, a_end, rl0 = int(f[5]), int(f[6]), int(f[7])
        b_bgn, b_end, rl1 = int(f[9]), int(f[10]), int(f[11])
        assert 0 <= a_bgn < a_end <= rl0
        assert 0 <= b_bgn < b_end <= rl1
        assert f[8] in ("0", "1")
        assert f[12] in ("overlap", "contains", "contained")
    # dedup: one line per rid pair
    pairs = [(ln.split()[0], ln.split()[1]) for ln in lines]
    assert len(pairs) == len({tuple(sorted(p)) for p in pairs})


def test_native_replay_matches_python(rng):
    """The C++ accept loop (overlap_replay.cpp) reproduces overlap_chunk
    byte-for-byte with an empty cache (every alignment native)."""
    import numpy as np

    from peregrine_tpu.ops.index import build_index
    from peregrine_tpu.ops.overlap import overlap_chunk, overlap_chunk_native
    from tests.simdata import random_genome, simulate_reads

    cfg = AsmConfig(k=12, w=24, r=4, levels=2, min_len=2500,
                    min_ovlp_aln=500, sketch_pad_len=8192, sketch_batch=16)
    genome = random_genome(rng, 80000)
    reads, _ = simulate_reads(rng, genome, read_len=4000, coverage=12.0,
                              circular_wrap=6000)
    db = SeqDB.from_reads(reads)
    idx = build_index(db, cfg)

    want = overlap_chunk(db, idx, cfg)
    got, miss = overlap_chunk_native(db, idx, cfg)
    # with an empty cache every alignment attempt is a miss; at least every
    # accepted record required one
    assert miss >= len(got) > 0
    assert len(got) == len(want)
    np.testing.assert_array_equal(got.view(np.uint8).reshape(len(got), -1),
                                  want.view(np.uint8).reshape(len(want), -1))


def test_overlap_all_spec_identical_any_workers(rng):
    """The globally-deduplicated parallel path (overlap_all_spec) is
    byte-identical to the single-chunk sequential run at every worker
    count (VERDICT r1 item 1 — the reference's per-chunk RPAIR tables
    make chunked output grow with chunk count instead)."""
    import numpy as np

    from peregrine_tpu.ops.index import build_index
    from peregrine_tpu.ops.overlap import (overlap_all, overlap_all_spec,
                                           overlap_chunk_native)
    from tests.simdata import random_genome, simulate_reads

    cfg = AsmConfig(k=12, w=24, r=4, levels=2, min_len=2500,
                    min_ovlp_aln=500, sketch_pad_len=8192, sketch_batch=16)
    genome = random_genome(rng, 80000)
    reads, _ = simulate_reads(rng, genome, read_len=4000, coverage=12.0,
                              circular_wrap=6000)
    db = SeqDB.from_reads(reads)
    idx = build_index(db, cfg)

    want, _ = overlap_chunk_native(db, idx, cfg)
    assert len(want) > 0

    def as_bytes(r):
        return r.view(np.uint8).reshape(len(r), -1)

    for workers in (1, 2, 4):
        got = overlap_all_spec(db, idx, cfg, n_workers=workers)
        np.testing.assert_array_equal(as_bytes(got), as_bytes(want))
    # the overlap_all router takes the dedup path by default
    got = overlap_all(db, idx, cfg, n_chunks=4, n_workers=2)
    np.testing.assert_array_equal(as_bytes(got), as_bytes(want))


def test_overlap_all_spec_sharded_identical(rng):
    """Multi-host sharded alignment rounds (VERDICT r4 item 1): with
    shard=(rank, nranks) each rank aligns only its block-cyclic share
    and an exchange supplies the peers' rows.  Simulated in-process with
    a loopback exchange that computes the missing rows exactly as a peer
    would — the final records must be byte-identical to the unsharded
    run, and every simulated rank must have aligned a fair share."""
    import numpy as np

    from peregrine_tpu.ops.index import build_index
    from peregrine_tpu.ops.overlap import (_align_parallel,
                                           overlap_all_spec)
    from tests.simdata import random_genome, simulate_reads

    cfg = AsmConfig(k=12, w=24, r=4, levels=2, min_len=2500,
                    min_ovlp_aln=500, sketch_pad_len=8192, sketch_batch=16)
    genome = random_genome(rng, 80000)
    reads, _ = simulate_reads(rng, genome, read_len=4000, coverage=12.0,
                              circular_wrap=6000)
    db = SeqDB.from_reads(reads)
    idx = build_index(db, cfg)

    want = overlap_all_spec(db, idx, cfg, n_workers=2)

    def as_bytes(r):
        return r.view(np.uint8).reshape(len(r), -1)

    for nranks in (2, 3):
        shares = []

        def loopback(rnd, reqs, res, mine, shares=shares):
            peer = np.flatnonzero(~mine)
            shares.append((int(mine.sum()), len(mine)))
            if len(peer):
                pres = _align_parallel(reqs[peer], db, db.data, cfg.aln_bw,
                                       2)
                res[peer] = pres
            return res

        got = overlap_all_spec(db, idx, cfg, n_workers=2,
                               shard=(0, nranks), exchange=loopback)
        np.testing.assert_array_equal(as_bytes(got), as_bytes(want))
        tot_mine = sum(s[0] for s in shares)
        tot = sum(s[1] for s in shares)
        assert tot > 0 and tot_mine < tot  # peers really owned rows
        assert tot_mine >= 0.5 * tot / nranks  # fair-ish share

        # a non-zero rank with run_final=False returns None
        got1 = overlap_all_spec(db, idx, cfg, n_workers=2,
                                shard=(1, nranks), exchange=loopback,
                                run_final=False)
        assert got1 is None
