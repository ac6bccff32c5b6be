"""Micro-profile of the consensus window core: where does the time go?

Synthesizes one 100 kb template window at 30x with 1% error reads and
times (a) the full native window_cns, (b) alignments alone (dw_align with
traceback), (c) alignments without traceback, to locate the hot part.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
from simdata import mutate, random_genome  # noqa: E402

from peregrine_tpu.native import dw_align, window_cns  # noqa: E402


def main():
    rng = np.random.default_rng(7)
    tpl = random_genome(rng, 102000)
    ref = tpl[:101000]

    reads = []
    shifts = []
    read_len = 15000
    step = read_len // 30  # ~30x
    for start in range(-14000, 101000, step):
        lo = max(0, start)
        hi = min(len(tpl), start + read_len)
        if hi - lo < 2000:
            continue
        seq = mutate(rng, tpl[lo:hi], 0.01)
        reads.append(seq)
        shifts.append(start)
    print(f"{len(reads)} reads, {sum(len(r) for r in reads)/1e6:.1f} Mbases")

    t0 = time.time()
    cns = window_cns(ref, reads, shifts, 150, 1)
    t_full = time.time() - t0
    print(f"window_cns full: {t_full:.2f}s  (cns len {len(cns)})")

    # alignments only, with traceback
    t0 = time.time()
    ncols = 0
    for seq, shift in zip(reads, shifts):
        if shift < 0:
            a = dw_align(seq[-shift:], ref, 150)
        else:
            a = dw_align(seq, ref[shift:], 150)
        ncols += a.aln_str_size
    t_aln = time.time() - t0
    print(f"alignments w/ traceback: {t_aln:.2f}s  ({ncols/1e6:.1f}M cols)")

    t0 = time.time()
    for seq, shift in zip(reads, shifts):
        if shift < 0:
            dw_align(seq[-shift:], ref, 150, get_aln_str=False)
        else:
            dw_align(seq, ref[shift:], 150, get_aln_str=False)
    t_nt = time.time() - t0
    print(f"alignments no traceback: {t_nt:.2f}s")
    print(f"=> pileup+DP+tags ~ {t_full - t_aln:.2f}s; "
          f"traceback overhead ~ {t_aln - t_nt:.2f}s")


if __name__ == "__main__":
    main()
