"""Pipeline mode variants mirroring the reference test matrix
(test/ecoli_K12/Makefile: test-pypeflow-l1, --with-L0-index, --with-alt)."""

import os

import numpy as np

from peregrine_tpu.config import AsmConfig
from peregrine_tpu.io import formats
from peregrine_tpu.io.seqdb import SeqDB, read_fastx
from peregrine_tpu.ops.index import build_index
from peregrine_tpu.pipeline.run import Assembly
from tests.simdata import random_genome, simulate_reads


def test_l1_only_mode(tmp_path, rng):
    """Single reduction level with a larger r (reference test-pypeflow-l1
    uses --shimmer-r 24 --shimmer-l 1)."""
    genome = random_genome(rng, 40000)
    reads, _ = simulate_reads(rng, genome, read_len=4000, coverage=14.0)
    cfg = AsmConfig(k=12, w=24, r=8, levels=1, min_len=2500,
                    sketch_pad_len=8192, sketch_batch=16)
    asm = Assembly(str(tmp_path / "wd"), cfg)
    fa = asm.run_draft(reads=reads)
    assert os.path.exists(str(tmp_path / "wd/1-index/shmr-L1-01-of-01.dat"))
    ctgs = dict(read_fastx(fa))
    assert ctgs
    assert max(len(s) for s in ctgs.values()) > 0.5 * len(genome)


def test_keep_l0_index(rng, tmp_path):
    genome = random_genome(rng, 20000)
    reads, _ = simulate_reads(rng, genome, read_len=3000, coverage=8.0)
    db = SeqDB.from_reads(reads)
    cfg = AsmConfig(k=12, w=24, r=4, levels=2, sketch_pad_len=8192,
                    sketch_batch=16)
    idx, l0 = build_index(db, cfg, keep_l0=True)
    assert len(l0.x) > len(idx.x) * 3
    l0.save(str(tmp_path / "shmr"), level=0)
    x, y = formats.read_mmlist(str(tmp_path / "shmr-L0-01-of-01.dat"))
    np.testing.assert_array_equal(x, l0.x)


def test_device_pairs_mode(tmp_path, rng):
    """cfg.device_pairs routes the shared pair map through the device
    build; the whole pipeline output must stay byte-identical."""
    genome = random_genome(rng, 40000)
    reads, _ = simulate_reads(rng, genome, read_len=4000, coverage=14.0)
    outs = []
    for sub, dev in (("host", False), ("dev", True)):
        cfg = AsmConfig(k=12, w=24, r=4, levels=2, min_len=2500,
                        sketch_pad_len=8192, sketch_batch=16,
                        device_pairs=dev)
        fa = Assembly(str(tmp_path / sub), cfg).run_draft(reads=reads)
        outs.append(open(fa, "rb").read())
        ovl = open(str(tmp_path / sub / "2-ovlp/preads.ovl"), "rb").read()
        outs.append(ovl)
    assert outs[0] == outs[2] and outs[1] == outs[3]


def test_with_alt_contigs(tmp_path, rng):
    """A heterozygous bubble produces an alternate contig path."""
    genome = random_genome(rng, 50000)
    # haplotype B: divergent middle section
    alt = bytearray(genome)
    for i in range(20000, 23000, 29):
        alt[i] = ord("ACGT"[(alt[i] + 1) % 4])
    reads_a, _ = simulate_reads(rng, genome, read_len=4000, coverage=10.0)
    reads_b, _ = simulate_reads(rng, bytes(alt), read_len=4000, coverage=10.0)
    reads = [(f"a{n}", s) for n, s in reads_a] + [(f"b{n}", s) for n, s in reads_b]
    cfg = AsmConfig(k=12, w=24, r=4, levels=2, min_len=2500,
                    sketch_pad_len=8192, sketch_batch=16)
    asm = Assembly(str(tmp_path / "wd"), cfg, with_alt=True)
    asm.run_draft(reads=reads)
    # bubble may resolve into alternates; the a_ctg tiling file must exist
    assert os.path.exists(str(tmp_path / "wd/3-asm/a_ctg_tiling_path"))


def test_alt_consensus_polish(tmp_path, rng):
    """--with-alt runs a second consensus pass over a_ctg.fa into
    4-cns-alt/a_ctg_cns.fa when it passes the size gate
    (reference py/scripts/pg_run.py:622-633)."""
    import shutil

    genome = random_genome(rng, 40000)
    reads, _ = simulate_reads(rng, genome, read_len=4000, coverage=14.0,
                              circular_wrap=4000)
    cfg = AsmConfig(k=12, w=24, r=4, levels=2, min_len=2500,
                    sketch_pad_len=8192, sketch_batch=16,
                    alt_cns_min_size=0)
    asm = Assembly(str(tmp_path / "wd"), cfg, with_alt=True)
    fa = asm.run_draft(reads=reads)
    # ensure an alt contig set exists regardless of bubble resolution:
    # the polish pass only depends on the file, not on how it was derived
    a_fa = str(tmp_path / "wd/3-asm/a_ctg.fa")
    if not (os.path.exists(a_fa) and os.stat(a_fa).st_size > 0):
        shutil.copy(fa, a_fa)
    asm.build_consensus()
    out = str(tmp_path / "wd/4-cns-alt/a_ctg_cns.fa")
    assert os.path.exists(out)
    cns = dict(read_fastx(out))
    assert cns and max(len(s) for s in cns.values()) > 0.5 * len(genome)


def test_auto_spill_engages_and_is_identical(tmp_path, rng, monkeypatch):
    """Self-sizing low-memory mode (VERDICT r3 item 3): with a tiny
    PG_MEM_BUDGET the pipeline engages spill automatically (pair map +
    overlap caches ride unlinked files under outdir/spill) and the
    output stays byte-identical to the unspilled run."""
    genome = random_genome(rng, 40000)
    reads, _ = simulate_reads(rng, genome, read_len=4000, coverage=14.0)
    outs = []
    for sub, budget in (("big", None), ("tiny", "1000000")):
        if budget is None:
            monkeypatch.delenv("PG_MEM_BUDGET", raising=False)
        else:
            monkeypatch.setenv("PG_MEM_BUDGET", budget)
        cfg = AsmConfig(k=12, w=24, r=4, levels=2, min_len=2500,
                        sketch_pad_len=8192, sketch_batch=16)
        asm = Assembly(str(tmp_path / sub), cfg)
        fa = asm.run_draft(reads=reads)
        outs.append(open(fa, "rb").read())
        outs.append(open(str(tmp_path / sub / "2-ovlp/preads.ovl"),
                         "rb").read())
        spilled = asm.cfg.spill_dir is not None
        assert spilled == (budget is not None), (sub, asm.cfg.spill_dir)
        if spilled:
            assert os.path.isdir(str(tmp_path / sub / "spill"))
    assert outs[0] == outs[2] and outs[1] == outs[3]


def test_spill_preflight_fails_fast(tmp_path, rng, monkeypatch):
    """Spill-capacity preflight (VERDICT r4 item 6): when the spill
    filesystem cannot hold the projected spill bytes, the pipeline
    raises a sized diagnostic BEFORE any overlap work instead of dying
    mid-write on ENOSPC (the 3 Gb rung's first attempt).  Simulated by
    monkeypatching statvfs free space down to ~nothing."""
    import pytest

    from peregrine_tpu.pipeline import run as prun

    genome = random_genome(rng, 40000)
    reads, _ = simulate_reads(rng, genome, read_len=4000, coverage=14.0)
    cfg = AsmConfig(k=12, w=24, r=4, levels=2, min_len=2500,
                    sketch_pad_len=8192, sketch_batch=16)

    # force auto-spill on, and a "full" spill filesystem
    monkeypatch.setenv("PG_MEM_BUDGET", "1000000")
    monkeypatch.setattr(prun, "_spill_free_bytes", lambda d: 4096)
    asm = Assembly(str(tmp_path / "wd"), cfg)
    with pytest.raises(RuntimeError, match="spill preflight"):
        asm.run_draft(reads=reads)
    assert not os.path.exists(str(tmp_path / "wd/2-ovlp/preads.ovl"))

    # PG_SPILL_PREFLIGHT=0 opts out of the gate and the run completes
    monkeypatch.setenv("PG_SPILL_PREFLIGHT", "0")
    asm2 = Assembly(str(tmp_path / "wd2"), cfg)
    fa = asm2.run_draft(reads=reads)
    assert os.path.exists(fa)


def test_repeat_genome_e2e_fires_hard_paths(tmp_path, rng):
    """Repeat-stressed e2e (VERDICT r4 item 2): a genome with dispersed
    elements, tandem arrays, and ~99%-identical segmental duplications
    must drive the string graph through its hard paths (compound
    paths/bundles and a_ctg emission — machinery uniform-random genomes
    never fire), and the break-aware exact verifier must attribute the
    contigs: every >=30 kb contig anchors, aggregate identity over
    aligned spans >= 0.99, with repeat-join breaks reported rather than
    drowning the identity."""
    from tests.simdata import repeat_genome, simulate_reads

    from peregrine_tpu.io.seqdb import read_fastx
    from peregrine_tpu.verify import verify_contigs_multi

    rng2 = np.random.default_rng(9)
    chroms, info = repeat_genome(rng2, 900_000, n_chrom=1,
                                 segdup_len=(50_000, 90_000))
    assert info["segdup"], "simulator must place segdups"
    reads, _ = simulate_reads(rng2, chroms[0], read_len=4000,
                              coverage=16.0, circular_wrap=8000)
    cfg = AsmConfig(k=12, w=24, r=4, levels=2, min_len=2500,
                    sketch_pad_len=8192, sketch_batch=16)
    asm = Assembly(str(tmp_path / "wd"), cfg, with_alt=True)
    asm.run_draft(reads=reads)
    asm.build_consensus()

    def _nlines(p):
        try:
            with open(p) as f:
                return sum(1 for ln in f if ln.strip())
        except OSError:
            return 0

    n_compound = _nlines(str(tmp_path / "wd/3-asm/c_path"))
    n_actg = _nlines(str(tmp_path / "wd/3-asm/a_ctg_tiling_path"))
    assert n_compound > 0, "repeat genome produced no compound paths"
    assert n_actg > 0, "repeat genome produced no a_ctg paths"

    ctgs = dict(read_fastx(str(tmp_path / "wd/4-cns/p_ctg_cns.fa")))
    agg = verify_contigs_multi(ctgs, chroms, circular=True, min_len=30000)
    assert agg["n_unanchored"] == 0
    assert agg["identity"] >= 0.99, (agg["identity"], agg["breaks"])
    assert agg["length"] >= 0.7 * sum(len(v) for v in ctgs.values())
