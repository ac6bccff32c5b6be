"""Prototype: blocked banded Myers bit-parallel edit distance (numpy, scalar).

Validates the algorithm against the native O(ND) aligner before the JAX
batched port (peregrine_tpu/ops/device_align.py).

Design notes:
- query rows in 32-bit blocks; a fixed window of NB blocks slides down one
  block whenever the column index passes the window center;
- query padded with sentinel (no match) so rows beyond Lq are
  vertical-only: D[i][j] = D[Lq][j] + (i - Lq), letting one tracked
  bottom-row score serve both endpoint readouts;
- top boundary carry-in fixed at +1 (row-0 / band-edge);
- outputs (dist, q_end, t_end): min over (reach query end, reach target
  end) candidates.
"""

import numpy as np

WB = 32
MSB = 1 << (WB - 1)
MASK = (1 << WB) - 1


def build_peq(q_codes, nb_total):
    """PEq[c][b]: bit i set iff q[b*32+i] == c. Sentinel beyond Lq."""
    peq = np.zeros((4, nb_total), dtype=np.uint64)
    for i, c in enumerate(q_codes):
        if c < 4:
            peq[c][i // WB] |= np.uint64(1 << (i % WB))
    return peq


def calculate_block(pv, mv, eq, hin):
    """One Myers block update; returns (pv, mv, hout)."""
    xv = eq | mv
    if hin < 0:
        eq |= 1
    xh = (((eq & pv) + pv) & MASK ^ pv) | eq
    ph = mv | (~(xh | pv) & MASK)
    mh = pv & xh
    hout = 0
    if ph & MSB:
        hout = 1
    if mh & MSB:
        hout = -1
    ph = (ph << 1) & MASK
    mh = (mh << 1) & MASK
    if hin < 0:
        mh |= 1
    elif hin > 0:
        ph |= 1
    pv = mh | (~(xv | ph) & MASK)
    mv = ph & xv
    return pv, mv, hout


def myers_banded(q_codes, t_codes, nb=8):
    """Banded global-suffix alignment; returns (dist, q_end, t_end)."""
    lq, lt = len(q_codes), len(t_codes)
    nb_total = max(nb, (max(lq, lt) + 2 * nb * WB) // WB + 2)
    peq = build_peq(q_codes, nb_total)

    # window of nb blocks over query rows; starts at block 0
    pv = np.full(nb, MASK, dtype=np.int64)  # all +1 vertical deltas
    mv = np.zeros(nb, dtype=np.int64)
    w0 = 0
    bot_score = nb * WB  # D[window_bottom][0] = row count (vertical chain)

    best_q_end = (1 << 30, 0)   # (dist, q_end) at target end
    best_t_end = (1 << 30, 0)   # (dist, t_end) at query-end row

    for j in range(lt):
        # slide window so that row ~j is centered
        want_w0 = max(0, (j // WB) - nb // 2)
        while w0 < want_w0:
            # drop top block, append fresh bottom block
            pv[:-1] = pv[1:]
            mv[:-1] = mv[1:]
            pv[-1] = MASK
            mv[-1] = 0
            w0 += 1
            bot_score += WB

        c = t_codes[j]
        hin = 1  # top boundary (row 0 or band edge)
        for b in range(nb):
            eq = int(peq[c][w0 + b]) if c < 4 else 0
            p, m, hin = calculate_block(int(pv[b]), int(mv[b]), eq, hin)
            pv[b], mv[b] = p, m
        bot_score += hin

        # query-end readout: bottom row >= Lq means D[Lq][j+1] is derivable
        bottom_row = (w0 + nb) * WB
        if bottom_row >= lq:
            d_lq = bot_score - (bottom_row - lq)
            if d_lq < best_t_end[0]:
                best_t_end = (d_lq, j + 1)

    # target-end readout: walk scores up the final column
    score = bot_score
    bottom_row = (w0 + nb) * WB
    best = (score - max(0, bottom_row - lq), min(bottom_row, lq))
    row = bottom_row
    for b in range(nb - 1, -1, -1):
        for i in range(WB - 1, -1, -1):
            if int(pv[b]) & (1 << i):
                score -= 1
            elif int(mv[b]) & (1 << i):
                score += 1
            row -= 1
            if row <= lq and score < best[0]:
                best = (score, row)
    best_q_end = best

    if best_t_end[0] <= best_q_end[0]:
        return best_t_end[0], lq, best_t_end[1]
    return best_q_end[0], best_q_end[1], lt


if __name__ == "__main__":
    import sys
    sys.path.insert(0, "tests")
    sys.path.insert(0, ".")
    from simdata import mutate, random_genome
    from peregrine_tpu.io.seqdb import encode_biseq, seq_to_codes
    from peregrine_tpu.native import ovlp_match

    rng = np.random.default_rng(0)
    ok = 0
    for trial in range(20):
        n = int(rng.integers(2000, 12000))
        a = random_genome(rng, n)
        # suffix-overlap shape: b = mutated suffix of a + extra
        cut = int(rng.integers(0, n // 3))
        b = mutate(rng, a[cut:], 0.02) + random_genome(rng, int(rng.integers(0, 500)))
        q = seq_to_codes(a[cut:])
        t = seq_to_codes(b)
        d, qe, te = myers_banded(q, t, nb=8)
        m = ovlp_match(encode_biseq(a[cut:]).tobytes(), 0,
                       encode_biseq(b).tobytes(), 0, 100)
        dd = abs(d - m.dist) / max(m.dist, 1)
        de = abs(qe - m.q_end) + abs(te - m.t_end)
        status = "OK" if (dd < 0.35 and de < 64) else "MISMATCH"
        if status == "OK":
            ok += 1
        print(f"{trial}: mine d={d} qe={qe} te={te} | ref d={m.dist} "
              f"qe={m.q_end} te={m.t_end}  {status}")
    print(f"{ok}/20 within tolerance")
