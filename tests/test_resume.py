"""Stage-checkpoint resume semantics (the reference's pypeflow idempotence:
completed outputs are not recomputed; a crashed run resumes by re-invoking,
SURVEY.md §5)."""

import os
import time

import pytest

from peregrine_tpu.config import AsmConfig
from peregrine_tpu.pipeline.run import Assembly, ConfigMismatchError
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


def test_config_change_detection(tmp_path, rng):
    """Resuming an outdir with a different semantic config must not silently
    reuse stale stage outputs (VERDICT r1 weak #4; reference analog:
    pypeflow input-hash semantics, py/scripts/pg_run.py:164-191)."""
    genome = random_genome(rng, 30000)
    reads, _ = simulate_reads(rng, genome, read_len=3000, coverage=10.0)
    cfg = AsmConfig(k=12, w=24, r=4, levels=2, min_len=2000,
                    sketch_pad_len=8192, sketch_batch=16)
    wd = str(tmp_path / "wd")
    Assembly(wd, cfg).run_draft(reads=reads)

    # changing a semantic knob (k) must refuse by default...
    cfg2 = cfg.replace(k=14)
    with pytest.raises(ConfigMismatchError):
        Assembly(wd, cfg2)

    # ...and with on_config_change="clean", stages 1-4 re-run (stage 0 kept)
    seqdb = os.path.join(wd, "0-seqdb", "seq_dataset.seqdb")
    idx_dat = os.path.join(wd, "1-index", "shmr-L2-01-of-01.dat")
    seqdb_mtime = os.path.getmtime(seqdb)
    idx_mtime = os.path.getmtime(idx_dat)
    time.sleep(0.05)
    Assembly(wd, cfg2, on_config_change="clean").run_draft()
    assert os.path.getmtime(seqdb) == seqdb_mtime, "stage 0 was recomputed"
    assert os.path.getmtime(idx_dat) != idx_mtime, "stage 1 was NOT re-run"

    # non-semantic batching knobs do not invalidate anything
    Assembly(wd, cfg2.replace(sketch_batch=32))  # no raise


def test_config_change_same_config_ok(tmp_path, rng):
    genome = random_genome(rng, 20000)
    reads, _ = simulate_reads(rng, genome, read_len=3000, coverage=8.0)
    cfg = AsmConfig(k=12, w=24, r=4, levels=2, min_len=2000,
                    sketch_pad_len=8192, sketch_batch=16)
    wd = str(tmp_path / "wd")
    Assembly(wd, cfg).build_db(reads=reads)
    Assembly(wd, cfg)  # identical config: no raise
