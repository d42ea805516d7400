"""Graph operators over edge DataFrames: PageRank-style centrality.

Beyond-reference surface (the reference has no graph ops): the near-dup
pipeline already builds a similarity GRAPH (minhash/simhash pairs) and
collapses it with connected components (``dedup.neardup_clusters``).
Centrality is the natural next question — *which* member of a dup
cluster is the canonical copy, which domains dominate a link graph —
and PageRank is the standard answer.

Execution model mirrors the CC lesson from round 5: every iteration is a
bounded plan (one join + one aggregate), and the rank relation is
``localCheckpoint``-ed each round so lineage stays CONSTANT-depth — the
naive loop replays all prior iterations' shuffles at every action and
dies by iteration ~20.  Each released checkpoint frees its blocks; at
1000 executors the per-iteration cost is exactly one shuffle on the dst
key plus one broadcast-sized count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             n_iter: int = 10, damping: float = 0.85,
             undirected: bool = False) -> DataFrame:
    """PageRank over an edge list: ``rank = (1-d)/N + d * (inbound
    contributions + dangling mass / N)``, ``n_iter`` synchronous power
    iterations from the uniform vector — the textbook formulation, with
    dangling-node mass redistributed uniformly so the ranks keep summing
    to 1 (drop that term and directed graphs leak mass every round).

    ``undirected=True`` symmetrizes the edge list first (the similarity-
    graph case — no dangling nodes by construction).  Self-loops and
    duplicate edges are removed; isolated nodes never enter (an edge
    list cannot name them).

    Scale shape per iteration: ranks ⋈ out-degrees (broadcast-sized
    right side: O(nodes) rows, but planned as a plain equi-join so it
    scales past broadcast when nodes are huge) → contribution fan-out
    along edges (shuffle on ``dst``) → one map-side-combining sum.  The
    dangling mass is a 1-row aggregate crossJoin-broadcast, not a
    driver round-trip.  N is computed once.  Output: ``(node, rank)``
    with rank rounded to 8dp for cross-run stability.
    """
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    if not (0.0 < damping < 1.0):
        raise ValueError("damping must be in (0, 1)")
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    if undirected:
        e = e.unionByName(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
    e = e.filter(F.col("s") != F.col("d")).distinct()
    e = e.localCheckpoint(eager=True)

    nodes = (
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("d").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = e.groupBy(F.col("s").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    prev = None
    for _ in range(n_iter):
        with_deg = ranks.join(outdeg, "node", "left")
        contrib = (
            with_deg.filter(F.col("deg").isNotNull())
            .join(e, F.col("node") == F.col("s"))
            .select(F.col("d").alias("node"),
                    (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inbound"))
        )
        # dangling mass: rank parked on nodes with no outgoing edges,
        # redistributed uniformly (1-row aggregate, broadcast join)
        dangling = (
            with_deg.filter(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        nxt = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + damping
                    * (F.coalesce(F.col("inbound"), F.lit(0.0))
                       + F.col("dm") / n)
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        if prev is not None:
            prev.unpersist()
        prev, ranks = ranks, nxt
    return ranks.select("node", F.round("rank", 8).alias("rank"))


def pagerank_unrolled_sql(edges_sql: str, n_iter: int,
                          damping: float = 0.85) -> str:
    """DuckDB mirror of :func:`pagerank` for UNDIRECTED edge sets (oracle
    generator): ``edges_sql`` must yield columns ``(src, dst)``; the
    mirror symmetrizes, drops self-loops, and unrolls the fixed
    ``n_iter`` power iterations as chained CTEs — standard SQL forbids
    aggregation inside a recursive term, so unrolling is the portable
    form.  After symmetrization every node has out-degree ≥ 1, so the
    dangling term is identically zero and the per-layer update is exactly
    the operator's: ``(1-d)/N + d · Σ rank/deg``.  All constants are
    ``repr``-ed Python doubles — the very literals the Spark side folds
    in — so both engines run identical IEEE arithmetic.
    """
    omd, dmp = repr(1.0 - damping), repr(float(damping))
    layers = []
    for i in range(1, n_iter + 1):
        layers.append(
            f"r{i} AS (SELECT e.d AS node, "
            f"({omd} / (SELECT nn FROM meta)) + {dmp} * sum(r.rank / dg.deg) AS rank "
            f"FROM r{i-1} r JOIN ed e ON r.node = e.s "
            f"JOIN deg dg ON dg.s = e.s GROUP BY e.d)"
        )
    joined = ",\n".join(layers)
    return f"""
WITH e0 AS ({edges_sql}),
ed AS (SELECT src AS s, dst AS d FROM e0 WHERE src <> dst
       UNION SELECT dst, src FROM e0 WHERE src <> dst),
nodes AS (SELECT DISTINCT s AS node FROM ed),
meta AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM nodes),
deg AS (SELECT s, CAST(count(*) AS BIGINT) AS deg FROM ed GROUP BY 1),
r0 AS (SELECT node, 1.0 / (SELECT nn FROM meta) AS rank FROM nodes),
{joined}
SELECT node, round(rank, 8) AS rank FROM r{n_iter}
"""
