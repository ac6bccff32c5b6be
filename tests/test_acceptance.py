"""In-suite acceptance gates (VERDICT r1 items 3 + 8).

1. The exact-substring property the pipeline actually achieves (BENCH.md:
   E. coli/yeast/Drosophila runs all produce contigs that are EXACT
   substrings of the doubled circular genome), asserted on a scaled-down
   seeded circular dataset — the shape of the reference's acceptance test
   (/root/reference/test/ecoli_K12/Makefile + docker/test/run_test.sh
   dnadiff gate), plus byte-reproducibility across runs.

2. The reference head-to-head (scripts/ref_vs_mine.py promoted to a
   pytest): identical reads through both pipelines, mutual draft identity
   asserted >= 99.9%.  Needs .ref_build/ (scripts/build_reference.sh
   --with-py); skipped when absent.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from peregrine_tpu.config import AsmConfig
from peregrine_tpu.io.seqdb import read_fastx, revcomp
from peregrine_tpu.pipeline.run import Assembly
from tests.simdata import random_genome, simulate_reads

from tests.refbuild import REF_BUILD, ensure_ref_build

RSCRIPTS = "/root/reference/py/scripts"


@pytest.mark.slow
def test_exact_substring_circular_acceptance(tmp_path, rng):
    """Circular genome, 30x 1%-error reads -> ONE polished contig that is
    an EXACT substring of the doubled genome, byte-identical across runs."""
    glen = 150000
    genome = random_genome(rng, glen)
    reads, _ = simulate_reads(rng, genome, read_len=8000, coverage=30.0,
                              len_sd=800, error=0.01, circular_wrap=20000)
    cfg = AsmConfig(k=14, w=48, r=4, levels=2, min_len=3000,
                    sketch_pad_len=16384, sketch_batch=16)
    outs = []
    for run in ("a", "b"):
        fa = Assembly(str(tmp_path / run), cfg).run(reads=reads)
        outs.append(open(fa, "rb").read())
    assert outs[0] == outs[1], "assembly is not byte-reproducible"

    contigs = dict(read_fastx(str(tmp_path / "a" / "4-cns" / "p_ctg_cns.fa")))
    assert len(contigs) == 1, f"expected one contig, got {len(contigs)}"
    seq = max(contigs.values(), key=len).upper()
    doubled = genome + genome
    assert len(seq) > 0.95 * glen
    assert seq in doubled or revcomp(seq) in doubled, \
        "polished contig is not an exact substring of the circular genome"


@pytest.mark.slow
@pytest.mark.skipif(
    ensure_ref_build(with_py=True) is None,
    reason="reference tree unavailable (auto-build failed; "
           "see scripts/build_reference.sh)")
def test_reference_h2h_draft_identity(tmp_path, rng):
    """Identical reads through the reference pipeline (C binaries + its
    own graph scripts) and ours; mutual draft identity >= 99.9%
    (scripts/ref_vs_mine.py measured 99.97% at 2 Mb; this runs the same
    harness at 500 kb to stay CI-sized)."""
    pytest.importorskip("peregrine._shimmer4py",
                        reason="reference python package not installed "
                               "(build_reference.sh --with-py)")
    genome = random_genome(rng, 500000)
    reads, _ = simulate_reads(rng, genome, read_len=15000, coverage=30.0,
                              len_sd=1500, error=0.01, circular_wrap=40000)
    fa_path = tmp_path / "reads.fa"
    with open(fa_path, "w") as f:
        for n, s in reads:
            f.write(f">{n}\n{s.decode()}\n")
    lst = tmp_path / "reads.lst"
    lst.write_text(str(fa_path) + "\n")

    # ours (draft, stages 0-3)
    mine_fa = Assembly(str(tmp_path / "mine"),
                       AsmConfig(sketch_pad_len=32768, sketch_batch=64)
                       ).run_draft(reads_list=str(lst))
    mine = dict(read_fastx(mine_fa))

    # reference: C binaries + its own pypy-targeted scripts under CPython
    ref = tmp_path / "ref"
    ref.mkdir()
    env = dict(os.environ, PYTHONHASHSEED="0")

    def run(cmd, shell=False):
        r = subprocess.run(cmd, cwd=ref, capture_output=True, text=True,
                           shell=shell, env=env)
        assert r.returncode == 0, (cmd, r.stderr[-1500:])

    rb = os.path.abspath(REF_BUILD)
    run([rb + "/shmr_mkseqdb", "-p", "seq_dataset", "-d", str(lst)])
    run([rb + "/shmr_index", "-p", "seq_dataset", "-t", "1", "-c", "1",
         "-o", "shmr", "-m", "0"])
    run([rb + "/shmr_overlap", "-p", "seq_dataset", "-l", "shmr-L2",
         "-t", "1", "-c", "1", "-o", "ovlp.01"])
    run(f"{rb}/shmr_dedup < ovlp.01 > preads.ovl && echo - >> preads.ovl",
        shell=True)
    run([sys.executable, RSCRIPTS + "/ovlp_to_graph.py"])
    run([sys.executable, RSCRIPTS + "/graph_to_path.py"])
    run(f"{sys.executable} {RSCRIPTS}/path_to_contig.py seq_dataset "
        f"p_ctg_tiling_path > p_ctg.fa", shell=True)
    refc = dict(read_fastx(str(ref / "p_ctg.fa")))

    assert mine and refc
    m = max(mine.values(), key=len).upper()
    r = max(refc.values(), key=len).upper()
    from peregrine_tpu.native import dw_align
    best = 0.0
    for cand in (m, revcomp(m)):
        for off in (1000, 5000, 20000):
            p = r.find(cand[off:off + 64])
            if p >= 0:
                a = dw_align(cand[off:], r[p:], 2000, get_aln_str=False)
                if a.aln_q_e > len(cand) * 0.5:
                    best = max(best, 1 - a.dist / a.aln_q_e)
                break
    assert best >= 0.999, (f"mutual draft identity {best:.6f} "
                           f"(lens {len(m)} vs {len(r)})")
