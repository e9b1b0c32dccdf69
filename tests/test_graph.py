"""Unit tests for exact-integer PageRank (betl_spark/operators/graph.py):
agreement with a pure-Python replay of the integer recurrence,
partition-order independence (the property the integer design buys),
teleport/dangling semantics, and the sub-stochastic mass decay the
convergence contract documents."""

import pytest
from pyspark.sql import functions as F

from betl_spark.operators import graph

SCALE = 10**9
TELEPORT = 15 * SCALE // 100


def python_pagerank(edge_list, iters, scale=SCALE, damping=85):
    nodes = {u for u, _ in edge_list} | {v for _, v in edge_list}
    outdeg = {}
    for u, _ in edge_list:
        outdeg[u] = outdeg.get(u, 0) + 1
    r = {n: scale for n in nodes}
    teleport = (100 - damping) * scale // 100
    for _ in range(iters):
        inflow = {n: 0 for n in nodes}
        for u, v in edge_list:
            inflow[v] += r[u] // outdeg[u]
        r = {n: teleport + damping * inflow[n] // 100 for n in nodes}
    return r


@pytest.fixture(scope="module")
def ring_graph(spark):
    # 12-node ring with chords: every node has out-edges (no dangling)
    edges = [(i, (i + 1) % 12) for i in range(12)] + [
        (i, (i + 5) % 12) for i in range(12)
    ]
    return edges, spark.createDataFrame(edges, ["src", "dst"])


def test_pagerank_matches_python_reference(spark, ring_graph):
    edges, df = ring_graph
    for iters in (1, 3):
        want = python_pagerank(edges, iters)
        got = {
            r["node"]: r["rank_int"]
            for r in graph.pagerank_int(df, iters=iters).collect()
        }
        assert got == want, iters


def test_pagerank_partition_order_independent(spark, ring_graph):
    """The reason the recurrence is integer-typed: identical results
    under any partitioning / evaluation order."""
    edges, df = ring_graph
    a = {r["node"]: r["rank_int"] for r in graph.pagerank_int(df, 3).collect()}
    for parts in (1, 7):
        alt = df.repartition(parts, "dst")
        b = {
            r["node"]: r["rank_int"]
            for r in graph.pagerank_int(alt, 3).collect()
        }
        assert a == b, parts
    c = {
        r["node"]: r["rank_int"]
        for r in graph.pagerank_int(df, 3, broadcast_ranks=True).collect()
    }
    assert a == c


def test_no_inlink_node_holds_teleport_mass(spark):
    # 0 -> 1 -> 2 -> 0 plus source-only node 9 -> 0
    df = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (9, 0)], ["src", "dst"]
    )
    got = {r["node"]: r["rank_int"] for r in graph.pagerank_int(df, 2).collect()}
    assert got[9] == TELEPORT  # no in-edges: bare teleport after iter 1+


def test_hub_ranks_highest(spark):
    # star + return edges: hub 0 receives from 1..9, all return via 0
    edges = [(i, 0) for i in range(1, 10)] + [(0, i) for i in range(1, 10)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    rows = graph.pagerank_int(df, 3).collect()
    top = max(rows, key=lambda r: r["rank_int"])
    assert top["node"] == 0


def test_zero_iters_returns_start_mass(spark, ring_graph):
    _, df = ring_graph
    rows = graph.pagerank_int(df, 0).collect()
    assert {r["rank_int"] for r in rows} == {SCALE}


def test_mass_decays_sub_stochastically(spark, ring_graph):
    """Total mass never grows; per-iteration leak is < |V| + |E| units
    (one floor per node update + one per out-edge division)."""
    edges, df = ring_graph
    n_nodes, n_edges = 12, len(edges)
    prev = n_nodes * SCALE
    for iters in (1, 2, 3):
        total = (
            graph.pagerank_int(df, iters)
            .agg(F.sum("rank_int").alias("m"))
            .collect()[0]["m"]
        )
        assert total <= prev
        assert prev - total < (n_nodes + n_edges) * iters + n_nodes
        prev = total


def test_dangling_node_leaks_documented(spark):
    """A dangling node (no out-edges) leaks its mass — the documented
    sink-absorbs approximation; ranks stay deterministic."""
    df = spark.createDataFrame([(0, 1), (1, 2)], ["src", "dst"])  # 2 dangles
    a = {r["node"]: r["rank_int"] for r in graph.pagerank_int(df, 2).collect()}
    b = {r["node"]: r["rank_int"] for r in graph.pagerank_int(df, 2).collect()}
    assert a == b and set(a) == {0, 1, 2}
    assert a[0] == TELEPORT  # nothing flows back to 0
