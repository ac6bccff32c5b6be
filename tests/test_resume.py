"""Stage-checkpoint resume semantics (the reference's pypeflow idempotence:
completed outputs are not recomputed; a crashed run resumes by re-invoking,
SURVEY.md §5)."""

import os
import time

from peregrine_tpu.config import AsmConfig
from peregrine_tpu.pipeline.run import Assembly
from tests.simdata import random_genome, simulate_reads


def test_stage_resume(tmp_path, rng):
    genome = random_genome(rng, 30000)
    reads, _ = simulate_reads(rng, genome, read_len=3000, coverage=10.0)
    cfg = AsmConfig(k=12, w=24, r=4, levels=2, min_len=2000,
                    sketch_pad_len=8192, sketch_batch=16)
    wd = str(tmp_path / "wd")
    fa = Assembly(wd, cfg).run_draft(reads=reads)
    first = open(fa, "rb").read()

    # record stage-output mtimes, then delete only the final stage output
    kept = [os.path.join(wd, p) for p in
            ("0-seqdb/seq_dataset.seqdb", "1-index/shmr-L2-01-of-01.dat",
             "2-ovlp/preads.ovl")]
    mtimes = {p: os.path.getmtime(p) for p in kept}
    os.remove(fa)
    time.sleep(0.05)

    # resume without reads: earlier stages load from checkpoints untouched
    fa2 = Assembly(wd, cfg).run_draft()
    assert open(fa2, "rb").read() == first
    for p in kept:
        assert os.path.getmtime(p) == mtimes[p], f"{p} was recomputed"
