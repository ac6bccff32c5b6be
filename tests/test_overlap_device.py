import numpy as np

from peregrine_tpu.config import AsmConfig
from peregrine_tpu.io.seqdb import SeqDB
from peregrine_tpu.ops.index import build_index
from peregrine_tpu.ops.overlap import overlap_chunk, overlap_chunk_device
from tests.simdata import random_genome, simulate_reads


def test_device_overlap_matches_host(rng):
    cfg = AsmConfig(k=12, w=24, r=4, levels=2, min_ovlp_aln=300,
                    sketch_pad_len=8192, sketch_batch=16)
    genome = random_genome(rng, 30000)
    reads, _ = simulate_reads(rng, genome, read_len=3000, coverage=12.0)
    db = SeqDB.from_reads(reads)
    idx = build_index(db, cfg)

    host = overlap_chunk(db, idx, cfg)
    dev = overlap_chunk_device(db, idx, cfg)

    def pairs(recs):
        return {tuple(sorted((int(o["y0"] >> np.uint64(32)),
                              int(o["y1"] >> np.uint64(32))))) for o in recs}

    hp, dp = pairs(host), pairs(dev)
    jac = len(hp & dp) / max(len(hp | dp), 1)
    # aligner dist differences can flip borderline accepts; demand near-parity
    assert jac > 0.95, (len(hp), len(dp), jac)

    # classification agreement on shared pairs
    def types(recs):
        return {tuple(sorted((int(o["y0"] >> np.uint64(32)),
                              int(o["y1"] >> np.uint64(32))))): int(o["ovlp_type"])
                for o in recs}

    ht, dt = types(host), types(dev)
    shared = set(ht) & set(dt)
    agree = sum(1 for p in shared if ht[p] == dt[p])
    assert agree / max(len(shared), 1) > 0.95
