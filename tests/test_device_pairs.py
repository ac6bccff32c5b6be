"""Device pair-map build vs the host oracles (byte identity)."""
import numpy as np

from peregrine_tpu.config import AsmConfig
from peregrine_tpu.io.seqdb import SeqDB
from peregrine_tpu.ops.device_pairs import build_pairs_device
from peregrine_tpu.ops.index import build_index
from peregrine_tpu.ops.overlap import bucket_stream, build_pairs
from tests.simdata import random_genome, simulate_reads


def _cfg():
    return AsmConfig(k=12, w=24, r=4, levels=2, min_ovlp_aln=300,
                     sketch_pad_len=8192, sketch_batch=16)


def test_device_pairs_byte_identical(rng):
    cfg = _cfg()
    genome = random_genome(rng, 40000)
    reads, _ = simulate_reads(rng, genome, read_len=3000, coverage=12.0)
    db = SeqDB.from_reads(reads)
    idx = build_index(db, cfg)

    host_pairs = build_pairs(idx, db.lengths, mc_lower=cfg.mc_lower,
                             mc_upper=cfg.mc_upper,
                             min_dist=cfg.min_anchor_dist)
    host_stream = bucket_stream(host_pairs[0], host_pairs[1], host_pairs[2],
                                host_pairs[4], cfg.ovlp_upper)
    dev_pairs, dev_stream = build_pairs_device(
        idx, db.lengths, cfg.mc_lower, cfg.mc_upper, cfg.min_anchor_dist,
        cfg.ovlp_upper)
    assert len(host_pairs[0]) > 0
    for i, (a, b) in enumerate(zip(host_pairs, dev_pairs)):
        assert len(a) == len(b), f"pairs[{i}] length"
        assert (np.asarray(a) == np.asarray(b)).all(), f"pairs[{i}] bytes"
    for i, (a, b) in enumerate(zip(host_stream, dev_stream)):
        assert len(a) == len(b), f"stream[{i}] length"
        assert (np.asarray(a) == np.asarray(b)).all(), f"stream[{i}] bytes"


def test_device_pairs_tight_gates(rng):
    """Narrow mc gates exercise the first-strict-upper scan edge."""
    cfg = _cfg()
    genome = random_genome(rng, 20000)
    reads, _ = simulate_reads(rng, genome, read_len=2500, coverage=10.0)
    db = SeqDB.from_reads(reads)
    idx = build_index(db, cfg)
    host = build_pairs(idx, db.lengths, mc_lower=3, mc_upper=6, min_dist=50)
    dev, _ = build_pairs_device(idx, db.lengths, 3, 6, 50, cfg.ovlp_upper)
    for a, b in zip(host, dev):
        assert (np.asarray(a) == np.asarray(b)).all()
