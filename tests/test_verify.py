"""Verifier tests: exact edit distance + full-coverage contig check."""
import numpy as np
import pytest

from peregrine_tpu.verify import (exact_edit_distance, revcomp_bytes,
                                  verify_contig)


def _dp_edit(a: bytes, b: bytes) -> int:
    n, m = len(a), len(b)
    prev = np.arange(m + 1)
    bb = np.frombuffer(b, np.uint8).astype(np.int64)
    for i in range(1, n + 1):
        cur = np.empty(m + 1, np.int64)
        cur[0] = i
        sub = prev[:-1] + (bb != a[i - 1])
        # no vector dependency trick: do the scan in a loop (tests only)
        for j in range(1, m + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, sub[j - 1])
        prev = cur
    return int(prev[m])


def test_exact_edit_distance_vs_dp():
    rng = np.random.default_rng(7)
    for _ in range(25):
        n = int(rng.integers(0, 60))
        m = int(rng.integers(0, 60))
        a = bytes(rng.choice(list(b"ACGT"), n).astype(np.uint8))
        b = bytes(rng.choice(list(b"ACGT"), m).astype(np.uint8))
        assert exact_edit_distance(a, b) == _dp_edit(a, b)


def test_exact_edit_distance_long_few_errors():
    rng = np.random.default_rng(11)
    a = bytes(rng.choice(list(b"ACGT"), 200_000).astype(np.uint8))
    b = bytearray(a)
    b[50_000] = b"T"[0] if b[50_000] != b"T"[0] else b"A"[0]  # sub
    del b[120_000]                                            # del
    b.insert(170_000, b"G"[0])                                # ins
    assert exact_edit_distance(a, bytes(b)) == 3


def _genome(rng, n):
    return bytes(rng.choice(list(b"ACGT"), n).astype(np.uint8))


def test_verify_exact_rotation_and_rc():
    rng = np.random.default_rng(3)
    g = _genome(rng, 300_000)
    contig = g[123_456:] + g[:123_456]
    r = verify_contig(contig, g, circular=True)
    assert r["anchored"] and r["exact"] and r["distance"] == 0
    assert r["orientation"] == "fwd"
    r2 = verify_contig(revcomp_bytes(contig), g, circular=True)
    assert r2["exact"] and r2["orientation"] == "rc"


def test_verify_counts_injected_errors_exactly():
    rng = np.random.default_rng(5)
    g = _genome(rng, 500_000)
    contig = bytearray(g[200_000:] + g[:200_000])
    # 5 substitutions, 2 deletions, 1 insertion, spread out
    for pos in (10_000, 90_000, 250_000, 333_333, 480_000):
        contig[pos] = b"A"[0] if contig[pos] != b"A"[0] else b"C"[0]
    del contig[150_000]
    del contig[400_000]
    contig.insert(44_000, b"T"[0])
    r = verify_contig(bytes(contig), g, circular=True)
    assert r["anchored"]
    assert r["distance"] == 8, r["segments"]
    assert abs(r["identity"] - (1 - 8 / len(contig))) < 1e-12


def test_verify_error_near_start_and_end():
    rng = np.random.default_rng(9)
    g = _genome(rng, 200_000)
    contig = bytearray(g)
    contig[5] = b"A"[0] if contig[5] != b"A"[0] else b"C"[0]
    contig[-3] = b"A"[0] if contig[-3] != b"A"[0] else b"C"[0]
    r = verify_contig(bytes(contig), g, circular=True)
    assert r["anchored"]
    assert r["distance"] == 2, r["segments"]


def test_verify_linear_subsequence():
    rng = np.random.default_rng(13)
    g = _genome(rng, 400_000)
    contig = g[100_000:350_000]
    r = verify_contig(contig, g, circular=False)
    assert r["exact"] and r["genome_pos"] == 100_000


def test_verify_contigs_multi_attribution_and_totals():
    """Multi-molecule verification: contigs in mixed orientation /
    rotation / with injected errors are attributed to the right
    chromosome and the aggregate distance is the exact sum."""
    from peregrine_tpu.verify import verify_contigs_multi

    rng = np.random.default_rng(11)
    L = 120_000
    chroms = [bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), L)
                    .tobytes()) for _ in range(3)]
    # contig 0: chrom 1 rotated by 31k, forward, clean
    c0 = chroms[1][31_000:] + chroms[1][:31_000]
    # contig 1: chrom 0 reverse-complemented with 2 substitutions
    c1 = bytearray(revcomp_bytes(chroms[0]))
    c1[5_000] = ord("A") if c1[5_000] != ord("A") else ord("C")
    c1[80_000] = ord("G") if c1[80_000] != ord("G") else ord("T")
    # contig 2: chrom 2 with one deletion
    c2 = chroms[2][:60_000] + chroms[2][60_001:]
    # plus a sub-min_len fragment that must be skipped
    frag = chroms[0][:10_000]
    agg = verify_contigs_multi(
        {"a": c0, "b": bytes(c1), "c": c2, "tiny": frag}, chroms,
        circular=True, min_len=50_000)
    by_name = {r["name"]: r for r in agg["contigs"]}
    assert by_name["a"]["chrom"] == 1 and by_name["a"]["distance"] == 0
    assert by_name["b"]["chrom"] == 0 and by_name["b"]["distance"] == 2
    assert by_name["b"]["orientation"] == "rc"
    assert by_name["c"]["chrom"] == 2 and by_name["c"]["distance"] == 1
    assert agg["distance"] == 3
    assert agg["chroms_covered"] == 3
    assert agg["n_small"] == 1 and agg["small_bases"] == 10_000
    assert agg["n_unanchored"] == 0
    assert agg["length"] == sum(map(len, (c0, c1, c2)))
