import numpy as np

from peregrine_tpu.api import (
    get_cns_from_reads, get_shimmer_alns, get_shimmers_from_seq,
    get_tag_from_seqs,
)
from peregrine_tpu.io.seqdb import revcomp
from tests.simdata import mutate, random_genome


def test_get_shimmers_from_seq(rng):
    seq = random_genome(rng, 5000)
    x, y = get_shimmers_from_seq(seq, rid=3, levels=2, reduction_factor=3)
    assert len(x) > 0
    assert (np.asarray(y) >> np.uint64(32) == 3).all()
    # L1 is denser than L2
    x1, _ = get_shimmers_from_seq(seq, levels=1, reduction_factor=3)
    x0, _ = get_shimmers_from_seq(seq, levels=0)
    assert len(x0) > len(x1) > len(x)


def test_shimmer_alns_same_strand(rng):
    genome = random_genome(rng, 8000)
    a = genome[:6000]
    b = mutate(rng, genome[2000:8000], 0.01)
    sh0 = get_shimmers_from_seq(a, rid=0)
    sh1 = get_shimmers_from_seq(b, rid=1)
    alns = get_shimmer_alns(sh0, sh1, direction=0)
    assert alns
    best = max(alns, key=lambda x: len(x[0]))
    # offset ~ 2000 (a position - b position)
    assert abs(best[2] - 2000) < 150
    assert len(best[0]) >= 3


def test_shimmer_alns_reverse(rng):
    genome = random_genome(rng, 8000)
    a = genome
    b = revcomp(mutate(rng, genome[1000:7000], 0.01))
    sh0 = get_shimmers_from_seq(a, rid=0)
    sh1 = get_shimmers_from_seq(b, rid=1)
    alns = get_shimmer_alns(sh0, sh1, direction=1)
    assert alns
    best = max(alns, key=lambda x: len(x[0]))
    assert len(best[0]) >= 3


def test_get_tag_and_cluster_consensus(rng):
    template = random_genome(rng, 3000)
    tag = get_tag_from_seqs(mutate(rng, template, 0.02), template, 0)
    assert tag is not None and len(tag) > 2500

    reads = [template] + [mutate(rng, template, 0.02) for _ in range(8)]
    # shuffle strands
    reads = [r if i % 2 == 0 else revcomp(r) for i, r in enumerate(reads)]
    reads[0] = template if True else reads[0]
    cns = get_cns_from_reads(reads)
    from peregrine_tpu.native import dw_align
    aln = dw_align(cns.upper(), template, 100, get_aln_str=False)
    ident = 1 - aln.dist / max(aln.aln_q_e, 1)
    assert aln.aln_q_e > 2900
    assert ident > 0.998, ident


def test_cli_gather_mc(tmp_path):
    """gather-mc merges chunk MC files summing per-mer counts
    (reference shmr_gather_mc / aggregate_mm_count)."""
    import numpy as np

    from peregrine_tpu import cli
    from peregrine_tpu.io import formats

    a = str(tmp_path / "x-MC-01-of-02.dat")
    b = str(tmp_path / "x-MC-02-of-02.dat")
    out = str(tmp_path / "x-MC-all.dat")
    formats.write_mm_count(a, np.array([5, 9, 12], np.uint64),
                           np.array([2, 1, 7], np.uint32))
    formats.write_mm_count(b, np.array([9, 30], np.uint64),
                           np.array([4, 1], np.uint32))
    assert cli.main(["gather-mc", a, b, "--output", out]) == 0
    m, c = formats.read_mm_count(out)
    assert m.tolist() == [5, 9, 12, 30]
    assert c.tolist() == [2, 5, 7, 1]


def test_cli_stats(tmp_path, capsys):
    """stats summarizes a seqdb prefix (read counts/N50) — the
    process_L2-style py-utils analyses as one command."""
    from peregrine_tpu import cli
    from peregrine_tpu.io.seqdb import SeqDB

    reads = [("r0", b"ACGT" * 300), ("r1", b"TTGCA" * 100),
             ("r2", b"GATTACA" * 200)]
    prefix = str(tmp_path / "sdb")
    SeqDB.from_reads(reads).save(prefix)
    assert cli.main(["stats", prefix, "--prefix"]) == 0
    out = capsys.readouterr().out
    assert "3 reads" in out and "N50 1200" in out


def test_cli_defaults_match_config():
    """`pg-tpu asm` with no flags must equal AsmConfig(): argparse defaults
    are read FROM the dataclass, so the reference's triplicated-default
    drift (SURVEY §5) cannot recur."""
    import argparse

    from peregrine_tpu import cli
    from peregrine_tpu.config import AsmConfig

    captured = {}
    orig = argparse.ArgumentParser.parse_args

    def grab(self, argv=None):
        ns = orig(self, argv)
        captured.update(vars(ns))
        raise SystemExit(0)  # stop before the pipeline runs

    argparse.ArgumentParser.parse_args = grab
    try:
        try:
            cli.main(["asm", "reads.lst"])
        except SystemExit:
            pass
    finally:
        argparse.ArgumentParser.parse_args = orig

    want = AsmConfig()
    for field in ("k", "w", "r", "levels", "best_n_ovlp", "mc_lower",
                  "mc_upper", "aln_bw", "ovlp_upper", "min_len", "min_idt"):
        assert captured[field] == getattr(want, field), field


def test_config_json_roundtrip():
    """AsmConfig survives the JSON round trip used by worker processes."""
    from peregrine_tpu.config import AsmConfig

    cfg = AsmConfig(k=14, w=40, r=4, levels=1, min_idt=98.5, lfc=True,
                    hybrid_overlap=True, use_device_aligner=True)
    assert AsmConfig.from_json(cfg.to_json()) == cfg
    assert AsmConfig.from_json(AsmConfig().to_json()) == AsmConfig()
