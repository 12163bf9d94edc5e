"""Link-graph + PageRank operator tests.

Algorithmic ground truth is an independent numpy power iteration with
identical fixed-iteration/dangling semantics; the Spark results must
match to double precision on hand-built graphs that exercise cycles,
dangling nodes, weighted edges, and disconnected components. The
corpus-level end-to-end path is oracle-checked by q_host_rank
(tests/test_entry_oracle.py + the driver gate).
"""

from __future__ import annotations

import numpy as np
import pytest

pytestmark = pytest.mark.spark


def _np_pagerank(nodes, edges, iters, damping=0.85):
    """Reference power iteration: edges = [(src, dst, weight)]."""
    idx = {h: i for i, h in enumerate(nodes)}
    n = len(nodes)
    out_w = np.zeros(n)
    for s, _, w in edges:
        out_w[idx[s]] += w
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = r[out_w == 0].sum()
        nxt = np.full(n, (1.0 - damping) / n + damping * dangling / n)
        for s, d, w in edges:
            nxt[idx[d]] += damping * r[idx[s]] * w / out_w[idx[s]]
        r = nxt
    return {h: r[idx[h]] for h in nodes}


def _run(spark, edges, iters, **kw):
    from htmlparser2_spark.operators.linkgraph import pagerank

    df = spark.createDataFrame(edges, "src string, dst string, weight long")
    got = {r["host"]: r["rank"] for r in pagerank(df, iters=iters, **kw).collect()}
    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    want = _np_pagerank(nodes, edges, iters)
    assert set(got) == set(want)
    for h in want:
        assert got[h] == pytest.approx(want[h], abs=1e-12), h
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    return got


def test_cycle_with_dangling(spark):
    # a <-> b cycle feeding a dangling sink c.
    edges = [("a", "b", 1), ("b", "a", 1), ("a", "c", 1), ("b", "c", 3)]
    got = _run(spark, edges, iters=5)
    # The sink receives the heaviest flow.
    assert got["c"] == max(got.values())


def test_weighted_edges_matter(spark):
    # Same topology, skewed weights: d's inbound weight 9 vs c's 1.
    edges = [("a", "c", 1), ("a", "d", 9)]
    got = _run(spark, edges, iters=4)
    assert got["d"] > got["c"]


def test_disconnected_components(spark):
    edges = [("a", "b", 1), ("x", "y", 2), ("y", "x", 2)]
    got = _run(spark, edges, iters=6)
    assert len(got) == 4


def test_zero_weight_edges_dropped(spark):
    from htmlparser2_spark.operators.linkgraph import pagerank

    # ('s','d',0) must not crash (ANSI divide-by-zero) nor create
    # nodes; it simply contributes no edge.
    df = spark.createDataFrame(
        [("s", "d", 0), ("x", "y", 1)], "src string, dst string, weight long"
    )
    got = {r["host"]: r["rank"] for r in pagerank(df, iters=2).collect()}
    assert set(got) == {"x", "y"}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_zero_iters_uniform(spark):
    edges = [("a", "b", 1), ("b", "c", 1)]
    got = _run(spark, edges, iters=0)
    for v in got.values():
        assert v == pytest.approx(1.0 / 3)


def test_host_edges_resolution(spark):
    from htmlparser2_spark.operators.linkgraph import host_edges

    links = spark.createDataFrame(
        [
            ("https://a.example/p1", "https://b.example/x"),
            ("https://a.example/p2", "https://b.example/y"),
            ("https://a.example/p3", "/relative/path"),  # -> self loop, dropped
            ("https://b.example/p1", "http://c.example"),
        ],
        "url string, href string",
    )
    rows = {(r["src"], r["dst"]): r["weight"] for r in host_edges(links).collect()}
    assert rows == {("a.example", "b.example"): 2, ("b.example", "c.example"): 1}
    kept = host_edges(links, drop_self_loops=False).collect()
    assert {(r["src"], r["dst"]): r["weight"] for r in kept}[
        ("a.example", "a.example")
    ] == 1


def test_host_edges_schemes_null_and_case(spark):
    from htmlparser2_spark.operators.linkgraph import host_edges

    links = spark.createDataFrame(
        [
            # protocol-relative -> that host, not a self-loop
            ("https://a.example/p", "//b.example/x"),
            # uppercase scheme + port + host case all normalize
            ("https://a.example/p", "HTTP://C.Example:8080/y"),
            # non-http schemes produce no edge
            ("https://a.example/p", "mailto:bob@b.example"),
            ("https://a.example/p", "javascript:void(0)"),
            ("https://a.example/p", "ftp://d.example/f"),
            # NULL href produces no edge (would leak rank mass as a
            # NULL graph node)
            ("https://a.example/p", None),
            # unparseable source host -> no edge
            ("not a url", "https://b.example/z"),
        ],
        "url string, href string",
    )
    rows = {(r["src"], r["dst"]): r["weight"] for r in host_edges(links).collect()}
    assert rows == {
        ("a.example", "b.example"): 1,
        ("a.example", "c.example"): 1,
    }
