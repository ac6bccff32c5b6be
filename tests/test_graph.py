"""Unit tests for the string-graph layout engine on constructed cases."""

from peregrine_tpu.graph.layout import (
    assemble_graph, identify_simple_paths,
)
from peregrine_tpu.graph.string_graph import (
    GraphResult, StringGraph, generate_string_graph, reverse_end,
)
from peregrine_tpu.graph.tiling import tiling_paths


def _ovl_line(a, b, mlen, idt, a_rng, b_rng, strand_b, typ):
    a_b, a_e, a_l = a_rng
    b_b, b_e, b_l = b_rng
    return (f"{a:09d} {b:09d} {-mlen} {idt} 0 {a_b} {a_e} {a_l} "
            f"{strand_b} {b_b} {b_e} {b_l} {typ}")


def _chain_overlaps(n=6, rl=10000, step=4000, idt=99.5):
    """Reads tiling a line: read i covers [i*step, i*step+rl)."""
    lines = []
    for i in range(n - 1):
        ov = rl - step
        lines.append(_ovl_line(i, i + 1, ov, idt,
                               (step, rl, rl), (0, ov, rl), 0, "overlap"))
    return lines


def test_reverse_end():
    assert reverse_end("000000001:B") == "000000001:E"
    assert reverse_end("000000001:E") == "000000001:B"
    assert reverse_end("NA") == "NA"


def test_linear_chain_graph():
    res = generate_string_graph(_chain_overlaps(), min_len=4000, min_idt=96)
    # every live edge has its dual complement
    for (v, w) in res.edge_data:
        assert (reverse_end(w), reverse_end(v)) in res.edge_data
    u_edge_data, ctg_rows, utg_rows, _ = assemble_graph(res)
    assert len(ctg_rows) == 2  # F and R of one contig
    f_row = ctg_rows[0].split()
    assert f_row[1] == "ctg_linear"
    # tiling path covers all 5 edges
    p_lines, a_lines = tiling_paths(res.sg_edge_lines, utg_rows, ctg_rows)
    assert len(p_lines) == 5
    assert not a_lines


def test_contained_reads_dropped():
    lines = _chain_overlaps()
    # read 99 contained in read 0
    lines.append(_ovl_line(0, 99, 5000, 99.9,
                           (0, 5000, 10000), (0, 5000, 5000), 0, "contains"))
    res = generate_string_graph(lines, min_len=4000, min_idt=96)
    for (v, w) in res.edge_data:
        assert not v.startswith("000000099")
        assert not w.startswith("000000099")


def test_low_identity_filtered():
    lines = _chain_overlaps(idt=90.0)
    res = generate_string_graph(lines, min_len=4000, min_idt=96)
    assert not res.edge_data


def test_transitive_reduction():
    # reads 0-1-2 chain plus a transitive overlap 0-2
    lines = _chain_overlaps(n=3)
    lines.append(_ovl_line(0, 2, 2000, 99.0,
                           (8000, 10000, 10000), (0, 2000, 10000), 0, "overlap"))
    res = generate_string_graph(lines, min_len=4000, min_idt=96)
    # the 0->2 edge must be marked TR (reduced), leaving the chain
    live = set(res.edge_data)
    assert ("000000000:E", "000000002:E") not in live
    assert ("000000000:E", "000000001:E") in live
    assert ("000000001:E", "000000002:E") in live


def test_spur_removed():
    # chain of 6 plus a dead-end spur read hanging off read 2
    lines = _chain_overlaps(n=6)
    lines.append(_ovl_line(2, 50, 3000, 99.0,
                           (7000, 10000, 10000), (0, 3000, 6000), 0, "overlap"))
    res = generate_string_graph(lines, min_len=4000, min_idt=96)
    u_edge_data, ctg_rows, utg_rows, _ = assemble_graph(res)
    # main contig survives with all chain reads
    p_lines, _ = tiling_paths(res.sg_edge_lines, utg_rows, ctg_rows)
    main = [l for l in p_lines if l.split()[0].endswith("F")]
    assert len(main) >= 4


def test_simple_paths_dual_symmetry():
    res = generate_string_graph(_chain_overlaps(), min_len=4000, min_idt=96)
    sp = identify_simple_paths(res.live, res.edge_data)
    keys = set(sp)
    for (v0, w0, end) in keys:
        r = (reverse_end(end), None, None)
        assert any(k[0] == reverse_end(end) for k in keys), (v0, w0, end)


def _utg(ug, u_edge_data, s, t, via, length=20000, score=1000):
    ug.add_edge(s, t, via)
    u_edge_data[(s, t, via)] = (length, score, [s, via, t], "simple")
    rs, rt, rv = reverse_end(t), reverse_end(s), reverse_end(via)
    ug.add_edge(rs, rt, rv)
    u_edge_data[(rs, rt, rv)] = (length, score, [rs, rv, rt], "simple")


def test_find_bundle_and_compound_paths():
    from peregrine_tpu.graph.digraph import MultiDiGraph
    from peregrine_tpu.graph.layout import construct_compound_paths, find_bundle

    ug = MultiDiGraph()
    u_edge_data = {}
    # bubble: S -> (A | B) -> T, plus entry/exit chains
    _utg(ug, u_edge_data, "000000001:E", "000000002:E", "000000010:E")
    _utg(ug, u_edge_data, "000000002:E", "000000003:E", "000000011:E", score=900)
    _utg(ug, u_edge_data, "000000002:E", "000000004:E", "000000012:E", score=800)
    _utg(ug, u_edge_data, "000000003:E", "000000005:E", "000000013:E")
    _utg(ug, u_edge_data, "000000004:E", "000000005:E", "000000014:E")
    _utg(ug, u_edge_data, "000000005:E", "000000006:E", "000000015:E")

    conv, data = find_bundle(ug, u_edge_data, "000000002:E", 48, 16, 500000)
    assert conv
    start, end, bundle_edges, length, score, depth = data
    assert start == "000000002:E" and end == "000000005:E"
    assert len(bundle_edges) == 4

    compound = construct_compound_paths(ug, u_edge_data)
    keys = set(compound)
    assert ("000000002:E", "NA", "000000005:E") in keys
    # the reverse-complement bundle must be present too
    assert ("000000005:B", "NA", "000000002:B") in keys


def test_layout_deterministic(rng):
    """Two runs over the same overlaps must produce byte-identical layout
    (unlike the reference, whose set/khash iteration order varies with
    PYTHONHASHSEED)."""
    import numpy as np
    from peregrine_tpu.config import AsmConfig
    from peregrine_tpu.io.seqdb import SeqDB
    from peregrine_tpu.ops.index import build_index
    from peregrine_tpu.ops.overlap import overlap_chunk, ovlps_to_text
    from tests.simdata import random_genome, simulate_reads

    cfg = AsmConfig(k=12, w=24, r=4, levels=2, min_len=2000,
                    sketch_pad_len=8192, sketch_batch=16)
    genome = random_genome(rng, 40000)
    reads, _ = simulate_reads(rng, genome, read_len=3000, coverage=12.0)
    db = SeqDB.from_reads(reads)
    idx = build_index(db, cfg)
    lines = ovlps_to_text(overlap_chunk(db, idx, cfg))

    outs = []
    for _ in range(2):
        res = generate_string_graph(iter(lines), min_len=cfg.min_len,
                                    min_idt=cfg.min_idt)
        u_edge_data, ctg_rows, utg_rows, compound_rows = assemble_graph(res)
        outs.append((res.sg_edge_lines, ctg_rows, utg_rows, compound_rows))
    assert outs[0] == outs[1]


def test_native_ovl_parse_matches_python(tmp_path):
    """The C++ preads.ovl fast path produces an identical string graph
    (sg_edges_list byte-for-byte) to the Python parse loop."""
    lines = _chain_overlaps()
    # exercise filters: a contained pair, a self pair, a low-identity row,
    # a short read, a 'none' row, and the '-' terminator
    lines = lines + [
        "000000900 000000901 -5000 99.9 0 0 9000 9000 0 100 9100 12000 contained",
        "000000902 000000902 -5000 99.9 0 0 9000 9000 0 100 9100 12000 overlap",
        "000000903 000000904 -5000 90.0 0 0 9000 9000 0 100 9100 12000 overlap",
        "000000905 000000906 -5000 99.9 0 0 3000 3000 0 100 3100 12000 overlap",
        "000000907 000000908 -5000 99.9 0 0 9000 9000 0 100 9100 12000 none",
        "-",
        "000000909 000000910 -5000 99.9 0 0 9000 9000 0 100 9100 12000 overlap",
    ]
    res_py = generate_string_graph(list(lines), min_len=4000, min_idt=96)
    blob = ("\n".join(lines) + "\n").encode()
    res_cc = generate_string_graph(ovl_bytes=blob, min_len=4000, min_idt=96,
                                   use_native=False)
    assert res_py.sg_edge_lines == res_cc.sg_edge_lines
    assert res_py.chimer_nodes == res_cc.chimer_nodes
    assert sorted(res_py.edge_data) == sorted(res_cc.edge_data)


def test_native_sg_passes_match_python_oracle(rng):
    """The C++ graph classification (sg_passes.cpp) must reproduce the
    Python passes byte-for-byte: sg_edges_list bytes, chimer nodes,
    edge_data insertion order, node_attr, and all downstream layout and
    tiling rows — under every flag combination."""
    from peregrine_tpu.config import AsmConfig
    from peregrine_tpu.graph.tiling import tiling_paths
    from peregrine_tpu.io.seqdb import SeqDB
    from peregrine_tpu.ops.index import build_index
    from peregrine_tpu.ops.overlap import overlap_chunk, ovlps_to_text
    from tests.simdata import random_genome, simulate_reads

    cfg = AsmConfig(k=12, w=24, r=4, levels=2, min_len=2000,
                    sketch_pad_len=8192, sketch_batch=16)
    genome = random_genome(rng, 60000)
    reads, _ = simulate_reads(rng, genome, read_len=3000, coverage=14.0)
    db = SeqDB.from_reads(reads)
    idx = build_index(db, cfg)
    blob = ("\n".join(ovlps_to_text(overlap_chunk(db, idx, cfg)))
            + "\n-\n").encode()

    for kw in ({}, {"lfc": True}, {"disable_chimer_bridge_removal": True}):
        py = generate_string_graph(ovl_bytes=blob, min_len=cfg.min_len,
                                   min_idt=cfg.min_idt, use_native=False,
                                   **kw)
        na = generate_string_graph(ovl_bytes=blob, min_len=cfg.min_len,
                                   min_idt=cfg.min_idt, use_native=True,
                                   **kw)
        exp = (("\n".join(py.sg_edge_lines) + "\n").encode()
               if py.sg_edge_lines else b"")
        assert na.sg_edge_bytes == exp, kw
        assert na.chimer_nodes == py.chimer_nodes, kw
        assert list(na.edge_data.items()) == list(py.edge_data.items()), kw
        assert na.live.node_attr == py.live.node_attr, kw
        u1, c1, g1, p1 = assemble_graph(py)
        u2, c2, g2, p2 = assemble_graph(na)
        assert (c1, g1, p1) == (c2, g2, p2), kw
        t1 = tiling_paths(py.sg_edge_lines, g1, c1)
        t2 = tiling_paths(None, g2, c2, edge_data=na.tiling_edge_data())
        assert t1 == t2, kw
