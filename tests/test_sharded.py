"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np

from peregrine_tpu.config import AsmConfig
from peregrine_tpu.io.seqdb import SeqDB
from peregrine_tpu.ops.index import build_index
from peregrine_tpu.parallel.sharded_index import make_mesh, sharded_index_host
from tests.simdata import random_genome, simulate_reads

import jax


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_index_matches_single_device(rng):
    cfg = AsmConfig(k=12, w=24, r=4, levels=2)
    genome = random_genome(rng, 30000)
    reads, _ = simulate_reads(rng, genome, read_len=3000, coverage=8.0)
    db = SeqDB.from_reads(reads)
    L = 8192
    codes, lens = db.padded_code_batch(range(len(db)), L)
    rids = np.arange(len(db), dtype=np.uint32)

    mesh = make_mesh(8)
    shards = sharded_index_host(mesh, codes, lens, rids, w=cfg.w, k=cfg.k,
                                r=cfg.r, levels=cfg.levels)
    assert len(shards) == 8

    ref = build_index(db, cfg.replace(sketch_pad_len=L, sketch_batch=64))

    # every record lands on the shard owning its hash
    for d, (sx, sy) in enumerate(shards):
        if len(sx):
            np.testing.assert_array_equal(
                (sx >> np.uint64(8)) % np.uint64(8), d)
        # shard-local records sorted by (x, y)
        pairs = list(zip(sx.tolist(), sy.tolist()))
        assert pairs == sorted(pairs)

    # union of shards == single-device records (as multisets)
    all_pairs = sorted(
        (int(a), int(b)) for sx, sy in shards for a, b in zip(sx, sy))
    want = sorted(zip(ref.x.tolist(), ref.y.tolist()))
    assert all_pairs == want
