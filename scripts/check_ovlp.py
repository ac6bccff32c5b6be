"""Overlap sensitivity/precision vs simulator ground truth.

Equivalent of the reference's py-utils/check_ovlp.py (which intersects the
read simulator's .bed intervals with preads.ovl via intervaltree): given a
truth table of genome intervals per read and a preads.ovl file, report

  * precision  — fraction of reported overlap pairs whose genome intervals
    truly intersect by >= --min-ovlp bases,
  * sensitivity — fraction of truly-overlapping read pairs (intersection
    >= --min-ovlp, both reads >= --min-len) recovered in preads.ovl.

Truth format: one row per read, `rid start end strand` (the coordinates the
simulator drew, in the (possibly circular-wrapped) genome frame);
scripts/scale_run.py writes this as OUTDIR/truth.tsv.

    python scripts/check_ovlp.py WORKDIR/2-ovlp/preads.ovl WORKDIR/truth.tsv

Caveat (same as the reference checker): intersection is computed in the
linear wrapped-genome frame, so genuine overlaps across the circular wrap
point count against precision — expect a deficit about equal to the
wrap fraction of the genome.
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("preads_ovl")
    ap.add_argument("truth_tsv")
    ap.add_argument("--min-ovlp", type=int, default=2000,
                    help="min true intersection to count a pair (bases)")
    ap.add_argument("--min-len", type=int, default=4000,
                    help="reads shorter than this are excluded from the "
                         "sensitivity denominator (pipeline min_len)")
    args = ap.parse_args()

    rows = np.loadtxt(args.truth_tsv, dtype=np.int64).reshape(-1, 4)
    rid, s, e = rows[:, 0], rows[:, 1], rows[:, 2]
    starts = np.zeros(int(rid.max()) + 1, np.int64)
    ends = np.zeros(int(rid.max()) + 1, np.int64)
    starts[rid] = s
    ends[rid] = e

    reported = set()
    with open(args.preads_ovl) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 13:
                continue
            a, b = int(parts[0]), int(parts[1])
            reported.add((a, b) if a < b else (b, a))

    lens = ends - starts
    ok_len = lens >= args.min_len
    tp = sum(1 for a, b in reported
             if min(ends[a], ends[b]) - max(starts[a], starts[b])
             >= args.min_ovlp)
    precision = tp / max(1, len(reported))

    truth = true_pairs_simple(starts, ends, ok_len, args.min_ovlp)
    found = sum(1 for p in truth if p in reported)
    sensitivity = found / max(1, len(truth))

    print(f"reported {len(reported)} pairs, precision {precision:.4f}")
    print(f"truth {len(truth)} pairs (>= {args.min_ovlp} bp, len >= "
          f"{args.min_len}), sensitivity {sensitivity:.4f}")


def true_pairs_simple(starts, ends, ok_len, min_ovlp):
    """Sweep-line enumeration of truly intersecting eligible pairs."""
    idx = np.flatnonzero(ok_len)
    order = idx[np.argsort(starts[idx], kind="stable")]
    pairs = set()
    active: list[int] = []
    for i in order.tolist():
        s = starts[i]
        active = [j for j in active if ends[j] - s >= min_ovlp]
        for j in active:
            # true intersection caps at the shorter interval's end
            if min(ends[i], ends[j]) - s >= min_ovlp:
                pairs.add((i, j) if i < j else (j, i))
        active.append(i)
    return pairs


if __name__ == "__main__":
    main()
