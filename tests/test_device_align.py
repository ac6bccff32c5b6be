import numpy as np
import pytest

from peregrine_tpu.io.seqdb import encode_biseq, seq_to_codes
from peregrine_tpu.native import ovlp_match
from peregrine_tpu.ops.device_align import myers_batch_np
from tests.simdata import mutate, random_genome


def _pairs(rng, n_pairs, max_len=6000, err=0.02):
    qs, ts, refs = [], [], []
    for _ in range(n_pairs):
        n = int(rng.integers(1500, max_len))
        a = random_genome(rng, n)
        cut = int(rng.integers(0, n // 3))
        b = mutate(rng, a[cut:], err) + random_genome(rng, int(rng.integers(0, 400)))
        q, t = a[cut:], b
        qs.append(seq_to_codes(q))
        ts.append(seq_to_codes(t))
        refs.append(ovlp_match(encode_biseq(q).tobytes(), 0,
                               encode_biseq(t).tobytes(), 0, 100))
    return qs, ts, refs


def test_myers_batch_matches_native(rng):
    qs, ts, refs = _pairs(rng, 16)
    out = myers_batch_np(qs, ts)
    for (d, qe, te), m in zip(out, refs):
        # endpoints essentially exact; dist is the optimal banded distance,
        # at most the greedy walk's and within ~40% below it
        assert abs(qe - m.q_end) <= 8, (qe, m.q_end)
        assert abs(te - m.t_end) <= 8, (te, m.t_end)
        assert d <= m.dist + 2
        assert d >= m.dist * 0.5


def test_myers_batch_perfect_and_short(rng):
    a = random_genome(rng, 2000)
    out = myers_batch_np(
        [seq_to_codes(a), seq_to_codes(a[:500])],
        [seq_to_codes(a), seq_to_codes(a[:500] + b"ACGT" * 100)])
    d0, qe0, te0 = out[0]
    assert (d0, qe0, te0) == (0, 2000, 2000)
    d1, qe1, te1 = out[1]
    assert qe1 == 500 and d1 <= 2


def test_myers_batch_high_error(rng):
    # 10% error: dist grows but endpoints still track
    qs, ts, refs = _pairs(rng, 6, max_len=3000, err=0.10)
    out = myers_batch_np(qs, ts)
    for (d, qe, te), m in zip(out, refs):
        if m.q_end == 0:  # native failed/band-broke; skip comparison
            continue
        assert abs(qe - m.q_end) <= 50
        assert d <= m.dist + 2
