import numpy as np
import pytest

from peregrine_tpu.config import AsmConfig
from peregrine_tpu.io.seqdb import SeqDB, read_fastx, revcomp
from peregrine_tpu.native import dw_align
from peregrine_tpu.ops.consensus import cns_from_tags, get_align_tags
from peregrine_tpu.ops.index import build_index
from peregrine_tpu.ops.mapping import map_reads_to_ref
from tests.simdata import mutate, random_genome, simulate_reads


def test_get_align_tags_simple():
    #   q: AC-GT    t: ACTGT  -> deletion in query
    tags = get_align_tags(b"AC-GT", b"ACTGT", 0, 0, 0)
    assert [t[:3] for t in tags] == [
        (0, 0, ord("A")), (1, 0, ord("C")), (2, 0, ord("-")),
        (3, 0, ord("G")), (4, 0, ord("T"))]
    # predecessor chain
    assert tags[1][3:] == (0, 0, ord("A"))
    #   q: ACXGT   t: AC-GT  -> insertion in query (delta 1)
    tags = get_align_tags(b"ACXGT", b"AC-GT", 0, 0, 0)
    assert [t[:3] for t in tags] == [
        (0, 0, ord("A")), (1, 0, ord("C")), (1, 1, ord("X")),
        (2, 0, ord("G")), (3, 0, ord("T"))]


def test_cns_majority_vote(rng):
    """Consensus corrects random errors given coverage."""
    template = random_genome(rng, 2000)
    tag_lists = []
    # backbone
    aln = dw_align(template, template, 50)
    tag_lists.append(get_align_tags(aln.q_aln_str, aln.t_aln_str,
                                    aln.aln_q_s, aln.aln_t_s, 0))
    for _ in range(12):
        read = mutate(rng, template, 0.02)
        aln = dw_align(read, template, 150)
        tag_lists.append(get_align_tags(aln.q_aln_str, aln.t_aln_str,
                                        aln.aln_q_s, aln.aln_t_s, 0))
    cns = cns_from_tags(tag_lists, len(template), 1)
    assert abs(len(cns) - len(template)) < 20
    aln = dw_align(cns.upper(), template, 100, get_aln_str=False)
    ident = 1 - aln.dist / max(aln.aln_q_e, 1)
    assert ident > 0.999, f"consensus identity {ident}"


def test_mapping_rows(rng):
    cfg = AsmConfig(k=12, w=24, r=4, levels=2, sketch_pad_len=16384,
                    sketch_batch=8)
    genome = random_genome(rng, 40000)
    reads, truth = simulate_reads(rng, genome, read_len=3000, coverage=10.0)
    read_db = SeqDB.from_reads(reads)
    ref_db = SeqDB.from_reads([("ref", genome)])
    ridx = build_index(read_db, cfg)
    fidx = build_index(ref_db, cfg)
    rows = map_reads_to_ref(ridx, read_db.lengths, fidx, cfg)
    assert len(rows) > 0
    assert (rows[:, 0] == 0).all()
    assert (rows[:, 4] < rows[:, 5]).all()  # read_bgn < read_end
    # mapped reads' implied positions agree with simulation truth
    ok = bad = 0
    for r in rows[:500]:
        ref_bgn, read_id, read_bgn = int(r[1]), int(r[3]), int(r[4])
        s, e, strand = truth[read_id]
        implied = ref_bgn - read_bgn
        if abs(implied - s) < 200:
            ok += 1
        else:
            bad += 1
    assert ok > bad * 5


@pytest.mark.slow
def test_full_pipeline_with_consensus(tmp_path, rng):
    from peregrine_tpu.pipeline.run import Assembly

    genome = random_genome(rng, 60000)
    reads, _ = simulate_reads(rng, genome, read_len=4000, coverage=16.0,
                              len_sd=400, error=0.01)
    cfg = AsmConfig(k=12, w=24, r=4, levels=2, min_len=2500,
                    sketch_pad_len=8192, sketch_batch=16)
    asm = Assembly(str(tmp_path / "wd"), cfg)
    fa = asm.run(reads=reads)
    ctgs = dict(read_fastx(fa))
    assert ctgs
    longest = max(ctgs.values(), key=len)
    assert len(longest) > 0.5 * len(genome)

    # consensus must beat the ~1%-error draft: >99.5% identity
    def ident(c):
        best = 0.0
        for cand in (c, revcomp(c)):
            for off in (100, 500, 1000, 2000, 4000):
                seed = cand[off:off + 64].upper()
                p = genome.find(seed)
                if p < 0:
                    continue
                ref = genome[max(p - off - 150, 0):]
                aln = dw_align(cand.upper(), ref, 1500, get_aln_str=False)
                if aln.aln_q_e > len(cand) * 0.5:
                    best = max(best, 1 - aln.dist / max(aln.aln_q_e, 1))
                break
        return best

    i = ident(longest)
    assert i > 0.995, f"consensus identity {i:.4f}"


def test_native_window_matches_python(rng, tmp_path):
    """The C++ window core must reproduce the Python reference path."""
    from peregrine_tpu.ops.consensus import window_consensus
    from peregrine_tpu.ops.mapping import map_reads_to_ref
    from peregrine_tpu.ops.consensus import plan_windows

    cfg = AsmConfig(k=12, w=24, r=4, levels=2, sketch_pad_len=16384,
                    sketch_batch=8)
    genome = random_genome(rng, 30000)
    reads, _ = simulate_reads(rng, genome, read_len=3000, coverage=12.0)
    read_db = SeqDB.from_reads(reads)
    ref_db = SeqDB.from_reads([("ref", genome)])
    ridx = build_index(read_db, cfg)
    fidx = build_index(ref_db, cfg)
    rows = map_reads_to_ref(ridx, read_db.lengths, fidx, cfg)
    specs = plan_windows(len(genome), rows)
    assert specs
    for left, right, wreads in specs[:2]:
        py = window_consensus(read_db, ref_db, 0, left, right, wreads, cfg,
                              use_native=False)
        cc = window_consensus(read_db, ref_db, 0, left, right, wreads, cfg,
                              use_native=True)
        assert cc == py


def test_native_window_matches_python_with_n_bases(rng, tmp_path):
    """Reads containing ambiguous bases decode to 'N'; the C++ tag order
    must keep N's ASCII rank (between G and T) so ties resolve like the
    Python port."""
    from peregrine_tpu.ops.consensus import plan_windows, window_consensus
    from peregrine_tpu.ops.mapping import map_reads_to_ref

    cfg = AsmConfig(k=12, w=24, r=4, levels=2, sketch_pad_len=16384,
                    sketch_batch=8)
    genome = random_genome(rng, 25000)
    reads, _ = simulate_reads(rng, genome, read_len=3000, coverage=12.0)
    # salt ambiguous bases into every read so N tags hit the pileup
    salted = []
    for name, seq in reads:
        b = bytearray(seq)
        for p in range(50, len(b), 997):
            b[p] = ord("N")
        salted.append((name, bytes(b)))
    read_db = SeqDB.from_reads(salted)
    ref_db = SeqDB.from_reads([("ref", genome)])
    rows = map_reads_to_ref(build_index(read_db, cfg), read_db.lengths,
                            build_index(ref_db, cfg), cfg)
    specs = plan_windows(len(genome), rows)
    assert specs
    for left, right, wreads in specs[:2]:
        py = window_consensus(read_db, ref_db, 0, left, right, wreads, cfg,
                              use_native=False)
        cc = window_consensus(read_db, ref_db, 0, left, right, wreads, cfg,
                              use_native=True)
        assert cc == py
