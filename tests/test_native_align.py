import numpy as np
import pytest

from peregrine_tpu.io.seqdb import encode_biseq, revcomp
from peregrine_tpu.native import dw_align, ovlp_match
from tests import oracles
from tests.conftest import random_seq


def _mutate(rng, seq: bytes, rate: float) -> bytes:
    """Introduce substitutions/indels at the given per-base rate."""
    out = bytearray()
    bases = b"ACGT"
    for c in seq:
        r = rng.random()
        if r < rate:
            kind = rng.integers(0, 3)
            if kind == 0:
                out.append(bases[rng.integers(0, 4)])  # substitution
            elif kind == 1:
                pass  # deletion
            else:
                out.append(c)
                out.append(bases[rng.integers(0, 4)])  # insertion
        else:
            out.append(c)
    return bytes(out)


@pytest.mark.parametrize("n,rate", [(500, 0.0), (2000, 0.02), (8000, 0.02)])
def test_ovlp_match_matches_oracle(rng, n, rate):
    a = random_seq(rng, n)
    b = _mutate(rng, a, rate)
    pa, pb = encode_biseq(a), encode_biseq(b)
    got = ovlp_match(pa.tobytes(), 0, pb.tobytes(), 0, 100)
    want = oracles.ovlp_match(pa.tobytes(), 0, pb.tobytes(), 0, 100)
    for f, v in want.items():
        assert getattr(got, f) == v, f


def test_ovlp_match_strand_nibbles(rng):
    a = random_seq(rng, 1000)
    # read B = revcomp of a suffix of A with errors; aligning A(fwd) vs
    # B(strand=1) must succeed because strand=1 reads the complement nibble
    b = _mutate(rng, revcomp(a[300:]), 0.01)
    pa, pb = encode_biseq(a[300:]), encode_biseq(b)
    m = ovlp_match(pa.tobytes(), 0, pb.tobytes(), 1, 100)
    assert m.q_end > 600 and m.t_end > 600
    assert m.dist < 50
    w = oracles.ovlp_match(pa.tobytes(), 0, pb.tobytes(), 1, 100)
    assert (m.q_end, m.t_end, m.dist) == (w["q_end"], w["t_end"], w["dist"])


def test_dw_align_perfect(rng):
    a = random_seq(rng, 400)
    aln = dw_align(a, a, 50)
    assert aln.dist == 0
    assert aln.q_aln_str == a and aln.t_aln_str == a
    assert (aln.aln_q_s, aln.aln_q_e, aln.aln_t_s, aln.aln_t_e) == (0, 400, 0, 400)


@pytest.mark.parametrize("n,rate", [(1000, 0.02), (5000, 0.03)])
def test_dw_align_roundtrip(rng, n, rate):
    a = random_seq(rng, n)
    b = _mutate(rng, a, rate)
    aln = dw_align(b, a, 150)
    # gapped strings reproduce the aligned slices exactly
    assert aln.q_aln_str.replace(b"-", b"") == b[aln.aln_q_s:aln.aln_q_e]
    assert aln.t_aln_str.replace(b"-", b"") == a[aln.aln_t_s:aln.aln_t_e]
    assert len(aln.q_aln_str) == len(aln.t_aln_str) == aln.aln_str_size
    # edit distance consistency: mismatches+gaps along the strings <= dist
    diffs = sum(1 for qc, tc in zip(aln.q_aln_str, aln.t_aln_str) if qc != tc)
    assert diffs <= aln.dist
    # reached at least one sequence end
    assert aln.aln_q_e == len(b) or aln.aln_t_e == len(a)


def test_dw_align_matches_ovlp_match_endpoints(rng):
    # same algorithm, two variants: distances agree on identical input
    a = random_seq(rng, 3000)
    b = _mutate(rng, a, 0.02)
    aln = dw_align(b, a, 100, get_aln_str=False)
    m = ovlp_match(encode_biseq(b).tobytes(), 0, encode_biseq(a).tobytes(), 0, 100)
    assert aln.dist == m.dist
    assert (aln.aln_q_e, aln.aln_t_e) == (m.q_end, m.t_end)
