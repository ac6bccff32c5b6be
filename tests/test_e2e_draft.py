"""End-to-end draft assembly on a simulated genome.

The north-star acceptance test in miniature (SURVEY.md §4): simulated
error-laden reads -> draft contigs; validates contig count, genome
coverage, and identity against the known source genome.
"""

import numpy as np
import pytest

from peregrine_tpu.config import AsmConfig
from peregrine_tpu.native import dw_align
from peregrine_tpu.io.seqdb import read_fastx, revcomp
from peregrine_tpu.pipeline.run import assemble
from tests.simdata import random_genome, simulate_reads


def _identity(contig: bytes, genome: bytes) -> float:
    """Best-strand identity of contig against genome via banded alignment."""
    best = 0.0
    for cand in (contig, revcomp(contig)):
        aln = dw_align(cand, genome, 1000, get_aln_str=False)
        span = max(aln.aln_q_e, 1)
        if span < len(cand) * 0.5:
            continue
        ident = 1.0 - aln.dist / max(span, 1)
        best = max(best, ident)
    return best


@pytest.mark.slow
def test_draft_assembly_linear_genome(tmp_path, rng):
    genome = random_genome(rng, 60000)
    reads, _ = simulate_reads(rng, genome, read_len=4000, coverage=15.0,
                              len_sd=400, error=0.01)
    cfg = AsmConfig(k=12, w=24, r=4, levels=2, min_len=2500,
                    min_ovlp_aln=500, sketch_pad_len=8192, sketch_batch=16)
    fa = assemble(reads=reads, outdir=str(tmp_path / "wd"), cfg=cfg)

    contigs = dict(read_fastx(fa))
    assert contigs, "no contigs produced"
    total = sum(len(s) for s in contigs.values())
    longest = max(contigs.values(), key=len)
    # draft covers most of the genome in few pieces
    assert len(longest) > 0.5 * len(genome)
    assert total > 0.8 * len(genome)
    assert total < 1.6 * len(genome)
    # the DRAFT (pre-consensus) is spelled from raw 1%-error read
    # segments, so its measured identity sits just under 99% (0.9836 on
    # this seed, greedy-aligner-measured); 0.98 bounds regressions
    # without flaking on simulation noise.  The strict gate — the
    # POLISHED contig must be an EXACT substring of the genome — lives
    # in test_acceptance.py and supersedes this smoke bound.
    ident = _identity(longest, genome)
    assert ident > 0.98, f"draft identity {ident:.4f}"

    # stage outputs exist in the reference layout
    for rel in ("0-seqdb/seq_dataset.idx", "1-index/shmr-L2-01-of-01.dat",
                "2-ovlp/preads.ovl", "3-asm/sg_edges_list", "3-asm/utg_data",
                "3-asm/ctg_paths", "3-asm/p_ctg_tiling_path"):
        assert (tmp_path / "wd" / rel).exists(), rel
