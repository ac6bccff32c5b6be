"""Shared test-data simulator: seeded random genome + error-laden long reads.

Mirrors the reference test harness's simulator semantics (1% errors,
uniform sub/del/ins, random strand; test/ecoli_K12/simulate_reads.py) at
configurable scale so unit/e2e tests run in seconds.
"""

from __future__ import annotations

import numpy as np

from peregrine_tpu.io.seqdb import revcomp

_B = np.frombuffer(b"ACGT", np.uint8)


def random_genome(rng: np.random.Generator, n: int) -> bytes:
    return _B[rng.integers(0, 4, n)].tobytes()


def mutate(rng: np.random.Generator, seq: bytes, rate: float = 0.01) -> bytes:
    out = bytearray()
    for c in seq:
        if rng.random() < rate:
            choice = rng.integers(0, 9)
            if choice < 4:
                out.append(_B[choice])           # substitution
            elif choice == 4:
                pass                              # deletion
            else:
                out.append(c)
                out.append(_B[choice - 5])        # insertion
        else:
            out.append(c)
    return bytes(out)


def simulate_reads(rng: np.random.Generator, genome: bytes, *,
                   read_len: int = 3000, coverage: float = 10.0,
                   len_sd: int = 300, error: float = 0.01,
                   circular_wrap: int = 0):
    """Returns (reads, truth): reads = [(name, seq)], truth = [(start, end, strand)]."""
    g = genome + genome[:circular_wrap]
    n_reads = int(coverage * len(g) / read_len)
    reads, truth = [], []
    for i in range(n_reads):
        rl = max(read_len // 3, int(read_len + rng.normal(0, len_sd)))
        s = int(rng.integers(0, max(1, len(g) - rl)))
        seq = mutate(rng, g[s:s + rl], error)
        strand = int(rng.integers(0, 2))
        if strand:
            seq = revcomp(seq)
        reads.append((f"sim/{i:06d}/{strand}_{rl}", seq))
        truth.append((s, s + rl, strand))
    return reads, truth
