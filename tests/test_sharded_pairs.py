"""Mesh pair-map build vs the host build (byte identity on the virtual
8-device CPU mesh)."""
import numpy as np

from peregrine_tpu.config import AsmConfig
from peregrine_tpu.io.seqdb import SeqDB
from peregrine_tpu.ops.index import build_index
from peregrine_tpu.ops.overlap import bucket_stream, build_pairs
from peregrine_tpu.parallel.sharded_index import make_mesh
from peregrine_tpu.parallel.sharded_pairs import build_pairs_mesh
from tests.simdata import random_genome, simulate_reads


def _cfg():
    return AsmConfig(k=12, w=24, r=4, levels=2, min_ovlp_aln=300,
                     sketch_pad_len=8192, sketch_batch=16)


def _check(idx, db, cfg, mesh, **kw):
    host_pairs = build_pairs(idx, db.lengths, mc_lower=cfg.mc_lower,
                             mc_upper=cfg.mc_upper,
                             min_dist=cfg.min_anchor_dist)
    host_stream = bucket_stream(host_pairs[0], host_pairs[1], host_pairs[2],
                                host_pairs[4], cfg.ovlp_upper)
    mesh_pairs, mesh_stream = build_pairs_mesh(
        idx, db.lengths, mesh, cfg.mc_lower, cfg.mc_upper,
        cfg.min_anchor_dist, cfg.ovlp_upper, **kw)
    assert len(host_pairs[0]) > 0
    for i, (a, b) in enumerate(zip(host_pairs, mesh_pairs)):
        assert len(a) == len(b), f"pairs[{i}] length {len(a)} vs {len(b)}"
        assert (np.asarray(a) == np.asarray(b)).all(), f"pairs[{i}] bytes"
    for i, (a, b) in enumerate(zip(host_stream, mesh_stream)):
        assert len(a) == len(b), f"stream[{i}] length"
        assert (np.asarray(a) == np.asarray(b)).all(), f"stream[{i}] bytes"


def test_mesh_pairs_byte_identical(rng):
    cfg = _cfg()
    genome = random_genome(rng, 40000)
    reads, _ = simulate_reads(rng, genome, read_len=3000, coverage=12.0)
    db = SeqDB.from_reads(reads)
    idx = build_index(db, cfg)
    _check(idx, db, cfg, make_mesh(8))


def test_mesh_pairs_small_mesh_and_overflow_fallback(rng):
    cfg = _cfg()
    genome = random_genome(rng, 25000)
    reads, _ = simulate_reads(rng, genome, read_len=2500, coverage=10.0)
    db = SeqDB.from_reads(reads)
    idx = build_index(db, cfg)
    _check(idx, db, cfg, make_mesh(2))
    # a degenerate capacity forces the overflow fallback path — output
    # must still be byte-identical (host rebuild)
    _check(idx, db, cfg, make_mesh(4), cap=8)
