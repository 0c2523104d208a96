"""PageRank over a derived trade graph — iterative graph analytics as
repeated join + aggregate, the canonical Spark pattern for fixed-point
algorithms (same family as functions/graph.py's label propagation).

Nodes are nations; a weighted edge customer-nation -> supplier-nation
exists per lineitem whose order's customer sits in the source nation
and whose supplier sits in the target nation. The expensive,
genuinely-distributed part is the EDGE DERIVATION (a q7-shaped 4-way
join over lineitem); the rank iteration itself runs over a |V|^2-bounded
edge list. No reference analog; extends SURVEY §2.10 (north-star
iterative algorithms).

Fixed iteration count (3) keeps the computation SQL-expressible: the
DuckDB oracle unrolls the same three iterations as CTEs, so this is a
full value-checked oracle rather than a rows-only entry — rare for an
iterative algorithm.

Scale design (100 TB): the lineitem joins are the only big shuffles
(orders co-partitioned on orderkey; dimension sides broadcast). The
rank vector is |V| rows; each iteration is one broadcast join against
the edge list plus one groupBy(dst). For web-scale graphs (|V| in the
billions) the same loop holds with the rank vector shuffle-joined
instead of broadcast and labels checkpointed every few iterations —
documented at functions/graph.py:14-18.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.functions.graph import bfs_hops, pagerank
from fhir_to_lakehouse_spark.plans.registry import query
from fhir_to_lakehouse_spark.sources.tables import load_table

_D = 0.85
_ITERS = 3


def _iteration_ctes(n_iters: int) -> str:
    """Unrolled PageRank iterations as DuckDB CTE text (r0 given)."""
    parts = []
    for i in range(1, n_iters + 1):
        prev = f"r{i - 1}"
        parts.append(
            f"""
    contrib{i} AS (
        SELECT e.dst AS node, SUM({prev}.r * e.w / outw.ow) AS c
        FROM e JOIN {prev} ON e.src = {prev}.node
        JOIN outw ON e.src = outw.src
        GROUP BY e.dst
    ),
    dang{i} AS (
        SELECT COALESCE(SUM({prev}.r), 0) AS dm
        FROM {prev} LEFT JOIN outw ON {prev}.node = outw.src
        WHERE outw.src IS NULL
    ),
    r{i} AS (
        SELECT v.node,
               {1 - _D} / (SELECT n FROM nv)
                 + {_D} * (COALESCE(c.c, 0)
                           + (SELECT dm FROM dang{i}) / (SELECT n FROM nv)) AS r
        FROM v LEFT JOIN contrib{i} c ON v.node = c.node
    )"""
        )
    return ",".join(parts)


_ORACLE = f"""
    WITH e AS (
        SELECT cn.n_name AS src, sn.n_name AS dst, COUNT(*) AS w
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
        JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
        GROUP BY cn.n_name, sn.n_name
    ),
    v AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    nv AS (SELECT COUNT(*) AS n FROM v),
    outw AS (SELECT src, SUM(w) AS ow FROM e GROUP BY src),
    r0 AS (SELECT node, 1.0 / (SELECT n FROM nv) AS r FROM v),
    {_iteration_ctes(_ITERS)}
    SELECT node, ROUND(r, 6) AS pagerank FROM r{_ITERS}
"""


@query("graph_pagerank_trade", oracle=_ORACLE)
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (damping 0.85, 3 iterations, dangling mass
    redistributed uniformly) over the nation-level trade graph.

    The heavy lifting — deriving the weighted edge list from 6 tables —
    shuffles once on orderkey and broadcasts every dimension; the
    iteration itself delegates to functions/graph.py::pagerank, which
    persists the normalized edge list once and materializes each
    iteration's rank vector to truncate lineage (left lazy, the
    unrolled DAG re-executes subplans O(3^iters) times — measured 81
    redundant lineitem-join subtrees for 3 iterations). Dangling mass
    falls out of mass conservation (1 - sum(contributions)) instead of
    an anti-join scan."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    cn = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("src")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("dst")
    )
    edges = (
        li.select("l_orderkey", "l_suppkey")
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
    )
    ranks = pagerank(edges, iterations=_ITERS, damping=_D)
    out = ranks.select("node", F.round("r", 6).alias("pagerank"))
    # ranks is the operator's persisted final vector; the driver only
    # collects `out` once, so hand ownership to this plan's consumer.
    return out


@query(
    "graph_reachability_bfs",
    oracle="""
    WITH RECURSIVE edges AS (
        SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
        FROM lineitem a
        JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                       AND a.l_suppkey <> b.l_suppkey
    ),
    r(node, hops) AS (
        SELECT CAST(1 AS BIGINT), 0
        UNION
        SELECT e.dst, r.hops + 1
        FROM r JOIN edges e ON e.src = r.node
        WHERE r.hops < 3
    )
    SELECT node, CAST(MIN(hops) AS INT) AS hops FROM r GROUP BY node
    """,
)
def graph_reachability_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-hop reachability from supplier 1 over the supplier
    co-occurrence graph (two suppliers are adjacent when they ship
    lineitems of the same order), capped at 3 hops.

    Spark has no recursive CTE; the semi-naive BFS loop in
    functions/graph.py::bfs_hops computes the identical min-hop
    relation (the oracle IS the recursive CTE, so the equivalence is
    value-checked, not asserted). The expensive distributed step is the
    edge derivation — a lineitem self-join co-partitioned on
    l_orderkey (one shuffle; per-order groups are small so the
    within-group pair fan-out is bounded) followed by a distinct on
    the pair."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") != F.col("b.l_suppkey")),
        )
        .select(
            F.col("a.l_suppkey").alias("src"), F.col("b.l_suppkey").alias("dst")
        )
        .distinct()
    )
    reach = bfs_hops(edges, seed=1, max_hops=3)
    return reach.select("node", F.col("hops").cast("int").alias("hops"))


@query(
    "graph_knn_triangles",
    oracle="""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v, COUNT(*) AS m
      FROM li a
      JOIN li b ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
    ),
    directed AS (
      SELECT u AS n, v AS o, m FROM pairs
      UNION ALL
      SELECT v, u, m FROM pairs
    ),
    topk AS (
      SELECT n, o FROM (
        SELECT n, o,
               ROW_NUMBER() OVER (PARTITION BY n
                                  ORDER BY m DESC, o ASC) AS r
        FROM directed
      ) WHERE r <= 5
    ),
    und AS (
      SELECT DISTINCT LEAST(n, o) AS u, GREATEST(n, o) AS v FROM topk
    ),
    deg AS (
      SELECT n, COUNT(*) AS d
      FROM (SELECT u AS n FROM und UNION ALL SELECT v FROM und)
      GROUP BY n
    ),
    tri AS (
      SELECT COUNT(*) AS t
      FROM und e1
      JOIN und e2 ON e2.u = e1.v
      JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT)  AS n_nodes,
           CAST((SELECT COUNT(*) FROM und) AS BIGINT)  AS n_edges,
           CAST(t AS BIGINT)                           AS n_triangles,
           ROUND(3.0 * t
                 / (SELECT SUM(d * (d - 1) // 2) FROM deg), 6)
             AS global_clustering
    FROM tri
    """,
)
def graph_knn_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN-graph sparsification + triangle census — the similarity-
    graph pipeline shape (SemDeDup / graph-based clustering build
    their neighbor graphs exactly like this): co-purchase strength
    between parts, each node keeping only its 5 STRONGEST neighbors
    (deterministic tie-break by neighbor id), then the global triangle
    count and clustering coefficient over the sparsified graph.
    Top-k sparsification is what makes triangle counting tractable —
    edge count is <= 5|V| by construction at ANY scale, where the raw
    co-occurrence graph saturates toward complete as data grows (the
    sf0.1 graph is 99.6% dense before sparsification).

    Plan shape: one orderkey-keyed self-join for pair strengths ->
    per-node top-5 window (map-side WindowGroupLimit prunes before the
    shuffle) -> distinct undirected edges -> triangle enumeration as
    two self-joins over the u<v edge list (each triangle counted once
    by vertex order) -> 1-row census.

    100 TB shape: the bounded degree (<= 10 after union) bounds wedges
    at 45|V| and the triangle joins at wedge count; everything keys on
    node ids. The raw pair strengths remain the dominant cost and ride
    the same bounded per-order fan-out as the BFS edge derivation."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .agg(F.count(F.lit(1)).alias("m"))
    )
    directed = pairs.select(
        F.col("u").alias("n"), F.col("v").alias("o"), "m"
    ).unionByName(
        pairs.select(F.col("v").alias("n"), F.col("u").alias("o"), "m")
    )
    w = Window.partitionBy("n").orderBy(F.col("m").desc(), F.col("o").asc())
    topk = (
        directed.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= 5)
        .select("n", "o")
    )
    und = topk.select(
        F.least("n", "o").alias("u"), F.greatest("n", "o").alias("v")
    ).distinct()
    deg = (
        und.select(F.col("u").alias("n"))
        .unionByName(und.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e1, e2, e3 = und.alias("e1"), und.alias("e2"), und.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u"))
            & (F.col("e3.v") == F.col("e2.v")),
        )
        .agg(F.count(F.lit(1)).alias("t"))
    )
    nodes = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("wedges"),
    )
    n_edges = und.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        tri.join(F.broadcast(nodes))
        .join(F.broadcast(n_edges))
        .select(
            "n_nodes",
            "n_edges",
            F.col("t").alias("n_triangles"),
            F.round(
                3.0 * F.col("t") / F.col("wedges"), 6
            ).alias("global_clustering"),
        )
    )
