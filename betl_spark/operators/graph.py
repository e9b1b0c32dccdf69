"""Web-graph centrality — exact-integer PageRank over a domain link
graph, the classic web-curation quality signal (Common-Crawl-style
pipelines weight domains by link centrality before sampling; see e.g.
the harmonic-centrality filtering in public CC derivatives).

Why an INTEGER PageRank: the textbook formulation iterates doubles,
and a double sum over incoming edges is evaluation-order-dependent in
the last ulp — which is exactly what a cross-engine value-match
contract cannot tolerate. This variant keeps every quantity a long:

    r_0(v)   = SCALE                       (per-node start mass)
    send(u)  = r_i(u) div outdeg(u)        (per out-edge, exact)
    r_i+1(v) = (15 * SCALE) div 100
             + (85 * sum_{(u,v) in E} send(u)) div 100

Integer addition is exactly associative and commutative, so the
inflow sum is engine- and partition-order-independent; ``div`` is
exact; the result is bit-identical however the shuffle lands and
whoever computes it (the DuckDB oracle unrolls the same iterations).
The cost of determinism: floor() leaks mass (the chain is
sub-stochastic, total mass decays by < |V| + |E| units per iteration
— invisible at SCALE=1e9), and the teleport term assumes every node
HAS out-edges (no dangling redistribution). Callers must pass a graph
whose every source node has >= 1 out-edge; :func:`pagerank_int`
guards nothing — dangling nodes simply leak their mass, which is the
standard "sink absorbs" approximation and still deterministic.

Plan shape (the 100 TB contract): per iteration, one join of the
rank table (|V| rows) with the edge table (|E| rows) on ``src`` and
one aggregation on ``dst`` — the canonical 2-shuffles-per-iteration
distributed PageRank. When |V| is broadcast-sized (a DOMAIN graph is
~1e8 rows of (id, long) — tens of GB is not; a 101-node contract
graph is) the rank side broadcasts and the per-iteration cost is one
aggregation of the edge table; pass ``broadcast_ranks=True``. The
edge table with its attached out-degrees is reused across iterations
— persist it before calling when iterating more than ~3 times so the
lineage doesn't recompute the degree aggregation per iteration.

Reference parity note: the reference engine (betl) has no graph
surface — this module is part of the beyond-reference training-data
tier (web curation), alongside operators/web.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: per-node starting mass; 85/15 damping in percent (exact integers)
DEFAULT_SCALE = 10**9
DEFAULT_DAMPING_PCT = 85


def out_degrees(edges: DataFrame, src: str = "src") -> DataFrame:
    """(src, outdeg) — one hash aggregate over the edge table."""
    return edges.groupBy(src).agg(
        F.count(F.lit(1)).cast("long").alias("outdeg")
    )


def graph_nodes(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Distinct node table (column ``node``) from an edge list."""
    return (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )


def pagerank_int(
    edges: DataFrame,
    iters: int = 3,
    damping_pct: int = DEFAULT_DAMPING_PCT,
    scale: int = DEFAULT_SCALE,
    src: str = "src",
    dst: str = "dst",
    broadcast_ranks: bool = False,
) -> DataFrame:
    """Exact-integer PageRank (module docstring): returns
    ``(node, rank_int)`` after ``iters`` iterations. Overflow bound:
    ``damping_pct * |V| * scale`` must stay below 2^63 — at the
    default scale=1e9 that allows ~10^11 nodes, far beyond any real
    graph. Nodes with no in-edges keep the bare teleport mass; nodes
    absent from ``src`` (dangling) leak their mass (see docstring)."""
    teleport = (100 - int(damping_pct)) * int(scale) // 100
    deg = out_degrees(edges, src)
    e = edges.select(src, dst).join(deg, src)
    nodes = graph_nodes(edges, src, dst)
    ranks = nodes.withColumn("rank_int", F.lit(int(scale)).cast("long"))
    for _ in range(int(iters)):
        r = F.broadcast(ranks) if broadcast_ranks else ranks
        contrib = r.join(e, r["node"] == e[src]).select(
            F.col(dst).alias("node"),
            F.expr("rank_int div outdeg").alias("__send"),
        )
        inflow = contrib.groupBy("node").agg(
            F.sum("__send").cast("long").alias("__in")
        )
        ranks = (
            nodes.join(inflow, "node", "left")
            .select(
                "node",
                (
                    F.lit(int(teleport))
                    + F.expr(
                        f"{int(damping_pct)} * coalesce(__in, CAST(0 AS BIGINT))"
                        " div 100"
                    )
                )
                .cast("long")
                .alias("rank_int"),
            )
        )
    return ranks


def pagerank_int_sql(
    edges_cte: str,
    iters: int = 3,
    damping_pct: int = DEFAULT_DAMPING_PCT,
    scale: int = DEFAULT_SCALE,
) -> str:
    """The oracle's side: unrolled-iteration SQL (DuckDB dialect, but
    plain enough for most engines) computing the identical integer
    recurrence from an edge CTE named ``{edges_cte}`` with columns
    (src, dst). Produces CTE ``pr_final(node, rank_int)``; callers
    append their own SELECT. One generator feeds both engines'
    iteration count and literals — a drift in either breaks the
    contract's value match."""
    teleport = (100 - int(damping_pct)) * int(scale) // 100
    d = int(damping_pct)
    parts = [
        f"deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg"
        f" FROM {edges_cte} GROUP BY 1)",
        f"nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM"
        f" {edges_cte} UNION ALL SELECT dst FROM {edges_cte}))",
        f"pr_0 AS (SELECT node, CAST({int(scale)} AS BIGINT) AS rank_int"
        f" FROM nodes)",
    ]
    for i in range(int(iters)):
        parts.append(
            f"in_{i + 1} AS (SELECT e.dst AS node,"
            f" CAST(sum(p.rank_int // d.outdeg) AS BIGINT) AS inflow"
            f" FROM pr_{i} p JOIN {edges_cte} e ON e.src = p.node"
            f" JOIN deg d ON d.src = p.node GROUP BY 1)"
        )
        parts.append(
            f"pr_{i + 1} AS (SELECT n.node,"
            f" CAST({teleport} + ({d} * coalesce(i.inflow, 0)) // 100"
            f" AS BIGINT) AS rank_int"
            f" FROM nodes n LEFT JOIN in_{i + 1} i ON i.node = n.node)"
        )
    parts.append(
        f"pr_final AS (SELECT node, rank_int FROM pr_{int(iters)})"
    )
    return ",\n".join(parts)
