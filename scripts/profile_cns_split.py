"""Profile the native consensus window: alignment vs pileup+DP split.

Synthetic 100 kb template, 30x coverage of 15 kb reads at 1% error —
the shape of one pg_asm_cns window (reference pg_asm_cns.py:75-98).
"""

import time

import numpy as np

from peregrine_tpu.native import dw_align, window_cns

rng = np.random.default_rng(0)
BASES = np.frombuffer(b"ACGT", np.uint8)
B2C = np.zeros(256, np.uint8)
B2C[BASES] = np.arange(4)

REF_LEN = 100_000
READ_LEN = 15_000
COV = 30

ref_codes = rng.integers(0, 4, REF_LEN).astype(np.uint8)
ref_b = BASES[ref_codes].tobytes()


def mutate(codes: np.ndarray, err: float) -> bytes:
    out = []
    i = 0
    n = len(codes)
    while i < n:
        r = rng.random()
        if r < err:
            kind = rng.integers(0, 3)
            if kind == 0:      # sub
                out.append((int(codes[i]) + 1 + int(rng.integers(0, 3))) % 4)
                i += 1
            elif kind == 1:    # del
                i += 1
            else:              # ins
                out.append(int(rng.integers(0, 4)))
        else:
            out.append(int(codes[i]))
            i += 1
    return BASES[np.array(out, np.int64)].tobytes()


n_reads = REF_LEN * COV // READ_LEN
reads, shifts = [], []
for _ in range(n_reads):
    s = int(rng.integers(-READ_LEN + 2000, REF_LEN - 2000))
    lo, hi = max(0, s), min(REF_LEN, s + READ_LEN)
    reads.append(mutate(ref_codes[lo:hi], 0.01))
    shifts.append(lo if s >= 0 else s)

t0 = time.time()
cns = window_cns(ref_b, reads, shifts, 150, 1)
t_total = time.time() - t0

# alignment-only pass (the same dw_align calls window_cns_c makes,
# consensus.cpp:144-176)
t0 = time.time()
cols = 0
for seq, shift in zip(reads, shifts):
    if shift < 0:
        a = dw_align(seq[-shift:], ref_b, 150)
    else:
        a = dw_align(seq, ref_b[shift:], 150)
    cols += a.aln_str_size
t_align = time.time() - t0

print(f"reads={n_reads} window={REF_LEN} cov={COV} aln_cols={cols}")
print(f"window_cns total: {t_total:.3f} s")
print(f"dw_align only:    {t_align:.3f} s  ({100*t_align/t_total:.0f}%)")
print(f"pileup+DP (rest): {t_total-t_align:.3f} s")
print(f"cns len={len(cns)}")
