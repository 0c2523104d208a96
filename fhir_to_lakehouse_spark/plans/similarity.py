"""Similarity-search queries over the embeddings table (north-star
extension): exact brute-force cosine top-k (Catalyst HOF path and
Arrow/numpy Pandas-UDF path — same oracle) and IVF-bucketed ANN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.functions import similarity as SIM
from fhir_to_lakehouse_spark.plans.registry import query
from fhir_to_lakehouse_spark.sources.tables import (
    fan_out_small_scan,
    load_table,
)

_N_QUERIES = 5  # vec_id < 5 are the query vectors
_K = 5
# the large-Q twin set: where the Arrow matmul path's batched
# (B×d)·(d×Q) product amortizes Python/Arrow overhead that the per-row
# HOF path pays Q times per row (crossover measured in SCALING.md)
_N_QUERIES_LARGE = 500


def _brute_oracle(n_queries: int, k: int) -> str:
    return f"""
    WITH c AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), q AS (
      SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < {n_queries}
    ), scored AS (
      SELECT q.query_id, c.vec_id,
             ROUND(list_dot_product(q.qv, c.v)
                   / greatest(sqrt(list_dot_product(q.qv, q.qv))
                              * sqrt(list_dot_product(c.v, c.v)), 1e-12), 6)
               AS cos_sim
      FROM c JOIN q ON q.query_id <> c.vec_id
    )
    SELECT query_id, vec_id, cos_sim, CAST(rank AS INT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, vec_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {k}
"""


_BRUTE_ORACLE = _brute_oracle(_N_QUERIES, _K)


def _query_vectors(
    spark: SparkSession, sf_dir: str, n_queries: int = _N_QUERIES
) -> DataFrame:
    emb = fan_out_small_scan(load_table(spark, sf_dir, "embeddings"))
    return emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


@query("similarity_brute_topk", oracle=_BRUTE_ORACLE)
def similarity_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k, Catalyst higher-order-function path: the
    query set is broadcast, the corpus is scanned once, dot products run
    as zip_with+aggregate in double precision (no Python in the loop)."""
    emb = fan_out_small_scan(load_table(spark, sf_dir, "embeddings"))
    return SIM.brute_force_topk(emb, _query_vectors(spark, sf_dir), k=_K)


@query("similarity_matmul_topk", oracle=_BRUTE_ORACLE)
def similarity_matmul_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same semantics as similarity_brute_topk (identical oracle) via the
    Arrow path: mapInPandas streams corpus batches into numpy, one
    (B×d)·(d×Q) matmul per batch, per-batch partial top-k, global exact
    top-k on the tiny candidate set. The scale path when Q is large."""
    emb = fan_out_small_scan(load_table(spark, sf_dir, "embeddings"))
    qrows = [
        (int(r["query_id"]), list(r["embedding"]))
        for r in _query_vectors(spark, sf_dir).collect()  # Q rows only
    ]
    return SIM.matmul_topk_pandas(emb, qrows, k=_K)


@query("similarity_brute_topk_q500", oracle=_brute_oracle(_N_QUERIES_LARGE, _K))
def similarity_brute_topk_q500(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HOF path at Q=500: the SCALING.md crossover benchmark's
    slow side. Per corpus row the plan evaluates 500 zip_with+aggregate
    dot products inside codegen — O(N·Q·d) scalar expression work that
    grows linearly in Q with no batching to amortize it. Correctness is
    identical to the Q=5 entry (same oracle family); the point of the
    pair of q500 entries is the measured wall-clock against the Arrow
    matmul twin at the same Q."""
    emb = fan_out_small_scan(load_table(spark, sf_dir, "embeddings"))
    return SIM.brute_force_topk(
        emb, _query_vectors(spark, sf_dir, _N_QUERIES_LARGE), k=_K
    )


@query("similarity_matmul_topk_q500", oracle=_brute_oracle(_N_QUERIES_LARGE, _K))
def similarity_matmul_topk_q500(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Arrow matmul path at Q=500 (same oracle as the HOF twin):
    one (B×d)·(d×Q) numpy product per Arrow batch scores all 500
    queries against the batch at BLAS speed, then per-batch partial
    top-k caps what leaves Python at Q·k rows per batch. This is the
    claimed large-Q advantage ("beats per-row HOFs when Q is large",
    functions/similarity.py) made measurable: both q500 entries run in
    the headline bench and SCALING.md records the crossover."""
    emb = fan_out_small_scan(load_table(spark, sf_dir, "embeddings"))
    qrows = [
        (int(r["query_id"]), list(r["embedding"]))
        for r in _query_vectors(spark, sf_dir, _N_QUERIES_LARGE).collect()
    ]
    return SIM.matmul_topk_pandas(emb, qrows, k=_K)


# cosine in DuckDB over double-cast lists — the building block all
# similarity oracles share (sequential fold, same as F.aggregate)
def _duck_cos(a: str, b: str) -> str:
    return (
        f"list_dot_product({a}, {b}) / greatest(sqrt(list_dot_product({a}, {a}))"
        f" * sqrt(list_dot_product({b}, {b})), 1e-12)"
    )


_IVF_ORACLE = f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), cen AS (
      SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < 8
    ), asg AS (
      SELECT vec_id, v, cell FROM (
        SELECT e.vec_id, e.v, cen.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {_duck_cos('e.v', 'cen.cv')} DESC, cen.cell ASC) AS rn
        FROM e CROSS JOIN cen
      ) WHERE rn = 1
    ), q AS (
      SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {_N_QUERIES}
    ), probes AS (
      SELECT query_id, qv, cell FROM (
        SELECT q.query_id, q.qv, cen.cell,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                 ORDER BY {_duck_cos('q.qv', 'cen.cv')} DESC, cen.cell ASC) AS rn
        FROM q CROSS JOIN cen
      ) WHERE rn <= 2
    ), scored AS (
      SELECT p.query_id, a.vec_id,
             ROUND({_duck_cos('p.qv', 'a.v')}, 6) AS cos_sim
      FROM asg a JOIN probes p ON a.cell = p.cell AND p.query_id <> a.vec_id
    )
    SELECT query_id, vec_id, cos_sim, CAST(rank AS INT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, vec_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {_K}
"""


@query("similarity_ivf_topk", oracle=_IVF_ORACLE)
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN: deterministic coarse centroids (the 8 lowest
    vec_ids), corpus partitioned by nearest-centroid cell, queries probe
    their 2 nearest cells only — at scale the cell is a partition column
    and probes prune ~75% of the corpus. Every step (assignment, probe
    choice, scoring) is deterministic, so despite being approximate
    w.r.t. brute force it carries a full DuckDB oracle;
    recall-vs-brute-force is additionally asserted in pytest."""
    emb = fan_out_small_scan(load_table(spark, sf_dir, "embeddings"))
    centroids = (
        emb.filter(F.col("vec_id") < 8)
        .select(F.col("vec_id").alias("cell"), "embedding")
    )
    # ONE bounded collect feeds both the assignment and the probe
    # expressions (r12): ivf_assign and ivf_probes each accept the
    # pre-collected [(cell, vector), ...] list, so the query pays one
    # driver round-trip for the quantizer instead of two.
    cen_rows = SIM._collect_centroids(
        centroids, "embedding", SIM.MAX_COLLECTED_CENTROIDS,
        caller="similarity_ivf_topk",
    )
    assigned = SIM.ivf_assign(emb, cen_rows)

    # queries probe their 2 nearest centroid cells — in-row top-n
    # against the collected centroid literals (SIM.ivf_probes, r12):
    # the former cross-join + row_number() formulation cost an
    # exchange, two sorts and a window on the query side for a per-row
    # argtop-2 over 8 bounded candidates.
    from pyspark.sql import Window

    q = _query_vectors(spark, sf_dir)
    probes = SIM.ivf_probes(q, cen_rows, n_probe=2)
    # corpus-row norms staged once per row (see brute_force_topk)
    sim = SIM.dot(F.col("qv"), F.col("embedding")) / F.greatest(
        F.col("q_nrm") * F.col("c_nrm"), F.lit(1e-12)
    )
    scored = (
        assigned.withColumn("c_nrm", SIM.l2_norm(F.col("embedding")))
        .join(F.broadcast(probes), "cell")
        .filter(F.col("query_id") != F.col("vec_id"))
        .withColumn("cos_sim", F.round(sim, 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _K)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


def _lsh_planes(n_planes: int = 4, dim: int = 64):
    """The exact plane-sign constants hyperplane_bucket bakes into the
    plan (same seed/stream) — interpolated into the oracle as literals
    so both engines test signs against identical hyperplanes."""
    import numpy as np

    rng = np.random.default_rng(0xF41A)
    return (rng.integers(0, 2, size=(n_planes, dim)) * 2 - 1).tolist()


def _lsh_oracle() -> str:
    planes = _lsh_planes()
    bucket_terms = " + ".join(
        f"(CASE WHEN list_dot_product("
        f"[{', '.join(f'{float(s)!r}' for s in plane)}]::DOUBLE[], v) > 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i, plane in enumerate(planes)
    )
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), b AS (
      SELECT vec_id, v, {bucket_terms} AS bucket FROM e
    ), q AS (
      SELECT vec_id AS query_id, v AS qv, bucket FROM b
      WHERE vec_id < {_N_QUERIES}
    ), scored AS (
      SELECT q.query_id, b.vec_id,
             ROUND({_duck_cos('q.qv', 'b.v')}, 6) AS cos_sim
      FROM b JOIN q ON b.bucket = q.bucket AND q.query_id <> b.vec_id
    )
    SELECT query_id, vec_id, cos_sim, CAST(rank AS INT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, vec_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {_K}
"""


@query("similarity_hyperplane_lsh_topk", oracle=_lsh_oracle())
def similarity_hyperplane_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN: 4-bit deterministic sign buckets;
    queries search only their own bucket. The third ANN strategy
    alongside IVF (partition pruning) and matmul (Arrow). The plane
    signs are data-independent constants, so the whole query is
    deterministic and oracle-checked (the oracle embeds the same
    constants); recall vs brute force asserted in pytest."""
    from pyspark.sql import Window

    emb = fan_out_small_scan(load_table(spark, sf_dir, "embeddings"))
    base = (
        emb.select(
            "vec_id",
            SIM.as_double(F.col("embedding")).alias("v"),
        )
        .withColumn("bucket", SIM.hyperplane_bucket(F.col("v"), n_planes=4))
        .withColumn("nrm", SIM.l2_norm(F.col("v")))
    )
    q = base.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("bucket"),
        F.col("nrm").alias("q_nrm"),
    )
    # per-row staged norms: one dot product per bucket pair
    sim = SIM.dot(F.col("qv"), F.col("v")) / F.greatest(
        F.col("q_nrm") * F.col("nrm"), F.lit(1e-12)
    )
    scored = (
        base.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("vec_id"))
        .withColumn("cos_sim", F.round(sim, 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _K)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


@query(
    "embedding_norm_stats",
    oracle="""
    WITH c AS (
      SELECT vec_id, label,
             sqrt(list_dot_product(
               list_transform(embedding, x -> CAST(x AS DOUBLE)),
               list_transform(embedding, x -> CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT)   AS n,
           ROUND(AVG(nrm), 6)         AS avg_norm,
           ROUND(MIN(nrm), 6)         AS min_norm,
           ROUND(MAX(nrm), 6)         AS max_norm
    FROM c GROUP BY label
    """,
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-column aggregate: L2 norm per vector (HOF dot product),
    stats per label."""
    emb = fan_out_small_scan(load_table(spark, sf_dir, "embeddings"))
    v = SIM.as_double(F.col("embedding"))
    return (
        emb.select("vec_id", "label", SIM.l2_norm(v).alias("nrm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("nrm"), 6).alias("avg_norm"),
            F.round(F.min("nrm"), 6).alias("min_norm"),
            F.round(F.max("nrm"), 6).alias("max_norm"),
        )
    )


_HARDNEG_ORACLE = f"""
    WITH c AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), q AS (
      SELECT vec_id AS query_id, label AS query_label, v AS qv
      FROM c WHERE vec_id < {_N_QUERIES}
    ), scored AS (
      SELECT q.query_id, q.query_label, c.vec_id,
             c.label AS neg_label,
             ROUND({{cos}}, 6) AS cos_sim
      FROM c JOIN q
        ON q.query_id <> c.vec_id AND q.query_label <> c.label
    )
    SELECT query_id, query_label, vec_id, neg_label, cos_sim,
           CAST(rank AS INT) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, vec_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {_K}
""".format(cos=_duck_cos("q.qv", "c.v"))


@query("similarity_hard_negatives", oracle=_HARDNEG_ORACLE)
def similarity_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive / metric training: for
    each query vector, the k most-similar corpus vectors with a
    DIFFERENT class label — the pairs that maximize training signal
    for embedding models and cross-encoder rerankers.

    Same scale shape as similarity_brute_topk (broadcast query set,
    one corpus scan, per-partition partial top-k under the window's
    TakeOrdered) with the label-mismatch predicate fused into the
    broadcast join, so same-label rows never reach scoring. The
    production path for large query sets swaps in the matmul/IVF
    machinery unchanged — the mining predicate stays a join filter."""
    from pyspark.sql import Window

    from fhir_to_lakehouse_spark.functions.similarity import (
        as_double,
        dot,
        l2_norm,
    )

    emb = fan_out_small_scan(load_table(spark, sf_dir, "embeddings"))
    # norms staged per ROW, not per pair — one dot product per
    # (query, candidate) instead of three (see brute_force_topk)
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        as_double(F.col("embedding")).alias("qv"),
    ).withColumn("q_nrm", l2_norm(F.col("qv")))
    c = emb.select(
        "vec_id",
        F.col("label").alias("neg_label"),
        as_double(F.col("embedding")).alias("cv"),
    ).withColumn("c_nrm", l2_norm(F.col("cv")))
    sim = dot(F.col("qv"), F.col("cv")) / F.greatest(
        F.col("q_nrm") * F.col("c_nrm"), F.lit(1e-12)
    )
    scored = (
        c.join(
            F.broadcast(q),
            (F.col("query_id") != F.col("vec_id"))
            & (F.col("query_label") != F.col("neg_label")),
        )
        .withColumn("cos_sim", F.round(sim, 6))
        .select("query_id", "query_label", "vec_id", "neg_label", "cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= _K
    )
