"""SHIMMER mapping tests mirroring the reference's test/genome_mapping
harness (shmr_map reads->ref and ref->ref; test/genome_mapping/run_test.sh)."""

import numpy as np

from peregrine_tpu.config import AsmConfig
from peregrine_tpu.io.seqdb import SeqDB
from peregrine_tpu.ops.index import build_index
from peregrine_tpu.ops.mapping import map_reads_to_ref
from tests.simdata import random_genome, simulate_reads


def _cfg():
    return AsmConfig(k=12, w=24, r=4, levels=2, sketch_pad_len=8192,
                     sketch_batch=16)


def test_map_reads_to_ref_hits_true_intervals(rng):
    """Reads map back onto the genome they were drawn from at roughly
    their true coordinates."""
    cfg = _cfg()
    genome = random_genome(rng, 60000)
    reads, truth = simulate_reads(rng, genome, read_len=4000, coverage=6.0)
    read_db = SeqDB.from_reads(reads)
    ref_db = SeqDB.from_reads([("ref", genome)])
    rows = map_reads_to_ref(build_index(read_db, cfg), read_db.lengths,
                            build_index(ref_db, cfg), cfg)
    assert len(rows) > len(reads), "expected multiple hits per read"
    assert set(rows[:, 0].tolist()) == {0}
    hit_reads = set(rows[:, 3].tolist())
    assert len(hit_reads) > 0.9 * len(reads)
    # ref_bgn of each hit is near the read's true interval
    slop = 200
    ok = 0
    for ref_id, rb, re, rid, qb, qe, d, mc0, mc1 in rows.tolist():
        s, e, strand = truth[rid]
        if s - slop <= rb <= e + slop:
            ok += 1
    assert ok > 0.95 * len(rows)


def test_map_ref_to_ref_self_hits(rng):
    """ref->ref self-mapping (second genome_mapping case): every emitted
    hit of the reference against its own index is exact-position."""
    cfg = _cfg()
    genome = random_genome(rng, 50000)
    ref_db = SeqDB.from_reads([("ref", genome)])
    ref_idx = build_index(ref_db, cfg)
    rows = map_reads_to_ref(ref_idx, ref_db.lengths, ref_idx, cfg)
    assert len(rows) > 0
    # self-map: same id, forward direction rows align begin==begin
    self_rows = rows[(rows[:, 3] == 0) & (rows[:, 6] == 0)]
    assert len(self_rows) > 0
    exact = np.sum(self_rows[:, 1] == self_rows[:, 4])
    assert exact == len(self_rows)


def test_write_rows_matches_savetxt(tmp_path, rng):
    """The C++ mapping-row writer (native.write_rows) formats exactly like
    np.savetxt(fmt='%d') modulo the separator run."""
    from peregrine_tpu.native import write_rows

    rows = rng.integers(-50, 1 << 40, size=(2000, 9)).astype(np.int64)
    p1 = tmp_path / "cpp.txt"
    p2 = tmp_path / "np.txt"
    write_rows(rows, str(p1))
    np.savetxt(p2, rows, fmt="%d")
    a = p1.read_text().splitlines()
    b = p2.read_text().splitlines()
    assert [x.split() for x in a] == [y.split() for y in b]
