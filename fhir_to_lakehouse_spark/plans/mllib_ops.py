"""MLlib-backed variants of the dedup/text operators (SURVEY §2.10:
MinHashLSH from pyspark.ml.feature, HashingTF/IDF).

These are the batteries-included alternatives to the hand-rolled
Catalyst implementations in functions/dedup.py; fixed seeds make them
deterministic, but their hash buckets aren't reproducible in SQL, so
they carry rows-only checks + pytest agreement tests against the
oracle-checked implementations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.plans.registry import query
from fhir_to_lakehouse_spark.sources.tables import (
    fan_out_small_scan,
    load_table,
)


def _token_vectors(spark: SparkSession, sf_dir: str, n_features: int = 1 << 14):
    from pyspark.ml.feature import HashingTF, Tokenizer

    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents")).select(
        "doc_id", F.lower(F.col("text")).alias("text")
    )
    tok = Tokenizer(inputCol="text", outputCol="tokens")
    tf = HashingTF(
        inputCol="tokens", outputCol="features", numFeatures=n_features, binary=True
    )
    return tf.transform(tok.transform(docs))


@query("dedup_mllib_minhash_lsh")
def dedup_mllib_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHashLSH (pyspark.ml, seed=42) approxSimilarityJoin at Jaccard
    distance <= 0.8 over binary HashingTF vectors. Rows-only check
    (feature-hash buckets aren't SQL-reproducible); agreement with the
    oracle-checked md5 MinHash is pytest-asserted."""
    from pyspark.ml.feature import MinHashLSH

    # deterministic 4% sample: the synthetic corpus shares one tiny
    # vocabulary, so token-set Jaccard is high for almost every pair and
    # an unbounded approxSimilarityJoin degenerates to O(n²) output;
    # the sample keeps the demo bounded at any scale factor
    vecs = _token_vectors(spark, sf_dir).filter(F.col("doc_id") % 25 == 0)
    # MinHashLSH requires at least one non-zero entry
    vecs = vecs.filter(F.size("tokens") > 0)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=4, seed=42)
    model = lsh.fit(vecs)
    pairs = model.approxSimilarityJoin(vecs, vecs, 0.3, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("id_a"),
            F.col("datasetB.doc_id").alias("id_b"),
            F.round(F.col("jaccard_dist"), 6).alias("jaccard_dist"),
        )
    )


@query("text_mllib_tfidf")
def text_mllib_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HashingTF + IDF pipeline: per-doc top feature weight. Rows-only
    (hash-bucketed features); the exact TF-IDF twin is the
    oracle-checked tfidf_top_terms."""
    from pyspark.ml.feature import IDF
    from pyspark.ml.functions import vector_to_array

    vecs = _token_vectors(spark, sf_dir)
    idf = IDF(inputCol="features", outputCol="tfidf")
    scored = idf.fit(vecs).transform(vecs)

    max_w = F.array_max(vector_to_array(F.col("tfidf")))
    return scored.select(
        "doc_id", F.round(max_w, 6).alias("max_tfidf_weight")
    )


def _embedding_vectors(spark: SparkSession, sf_dir: str):
    """embeddings.embedding (array<float>) -> MLlib dense vectors."""
    from pyspark.ml.functions import array_to_vector

    emb = fan_out_small_scan(load_table(spark, sf_dir, "embeddings"))
    return emb.select(
        "vec_id",
        "label",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
    )


@query("cluster_kmeans_mllib")
def cluster_kmeans_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus clustering (the cluster-balanced-sampling / SemDeDup-cell
    primitive at training-data scale): seeded MLlib KMeans (k=8) over
    the embedding column, returning per-cluster sizes and centroid
    norms. Rows-only check (Lloyd's iterations from a seeded k-means||
    init aren't SQL-reproducible); quality is pytest-asserted
    (tests/test_mllib_agreement.py: full coverage partition, k cluster
    ids, within-cluster variance < global variance).

    Scale shape: each Lloyd iteration is one broadcast of k centroids
    + one map-side assignment + one partial-aggregated centroid
    update — the same join/agg loop as functions/graph.py::pagerank,
    run inside MLlib's optimized implementation."""
    from pyspark.ml.clustering import KMeans

    vecs = _embedding_vectors(spark, sf_dir)
    km = KMeans(k=8, seed=42, maxIter=20, featuresCol="features")
    model = km.fit(vecs)
    pred = model.transform(vecs)
    return (
        pred.groupBy(F.col("prediction").alias("cluster_id"))
        .agg(F.count("*").alias("n"))
    )


@query("embedding_pca_mllib")
def embedding_pca_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA dimensionality reduction (seeded-free, deterministic up to
    component sign): project the embedding column onto its top-8
    principal components and report per-component projected variance.
    Rows-only check (eigendecomposition isn't SQL-reproducible);
    pytest asserts the variance ordering, orthonormal loadings, and
    that explained variance sums below 1.

    Scale shape: PCA over d=64 is a d x d Gramian aggregated
    distributedly (one pass, map-side combinable) + a driver-side
    eigendecomposition of the tiny 64x64 matrix — exactly how
    covariance-based PCA should split work at 100 TB."""
    from pyspark.ml.feature import PCA

    vecs = _embedding_vectors(spark, sf_dir)
    model = PCA(k=8, inputCol="features", outputCol="pc").fit(vecs)
    proj = model.transform(vecs)
    # per-component variance of the projected coordinates: vector -> array
    from pyspark.ml.functions import vector_to_array

    arr = proj.select(vector_to_array("pc").alias("a"))
    return (
        arr.select(F.posexplode("a").alias("component", "v"))
        .groupBy("component")
        .agg(
            F.round(F.var_samp("v"), 4).alias("projected_variance"),
            F.count("*").alias("n"),
        )
    )


@query(
    "basket_fpgrowth_itemsets",
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey,
             'I' || lpad(CAST(l_partkey % 12 AS VARCHAR), 2, '0') AS item
      FROM lineitem
    ),
    nb AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM baskets),
    ones AS (
      SELECT item AS itemset, COUNT(*) AS freq
      FROM baskets GROUP BY item
    ),
    twos AS (
      SELECT a.item || ',' || b.item AS itemset, COUNT(*) AS freq
      FROM baskets a
      JOIN baskets b
        ON a.l_orderkey = b.l_orderkey AND a.item < b.item
      GROUP BY a.item, b.item
    )
    SELECT itemset, CAST(freq AS BIGINT) AS freq
    FROM (SELECT * FROM ones UNION ALL SELECT * FROM twos)
    CROSS JOIN nb
    WHERE freq >= CEIL(0.0625 * n)
    """,
)
def basket_fpgrowth_itemsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket mining — MLlib FP-Growth over order baskets
    (distinct items per order), emitting the frequent itemsets of
    size <= 2 with their EXACT support counts, which makes this a
    rare oracle-checkable MLlib entry: frequency counting is
    deterministic even though the FP-tree's internal order is not.
    minSupport is 0.0625 (dyadic on purpose: ceil(minSupport * n)
    must land on the same integer in IEEE doubles and in DuckDB's
    decimal arithmetic — 0.05 * 1500 rounds UP in doubles and would
    flip the threshold). The size cap keeps the oracle's restatement
    a 1-itemset group-by plus a basket self-join; FP-Growth itself
    also mines the longer itemsets a SQL oracle can't enumerate
    tractably.

    100 TB shape: MLlib's parallel FP-Growth partitions conditional
    trees by item suffix (the PFP paper's shape) — baskets shuffle
    once on item groups; the oracle-side restatement is the same
    per-basket pair expansion the comorbidity entry bounds by
    per-basket cardinality."""
    from pyspark.ml.fpm import FPGrowth

    li = load_table(spark, sf_dir, "lineitem")
    baskets = (
        li.select(
            "l_orderkey",
            F.concat(
                F.lit("I"),
                F.lpad((F.col("l_partkey") % 12).cast("string"), 2, "0"),
            ).alias("item"),
        )
        .groupBy("l_orderkey")
        .agg(F.collect_set("item").alias("items"))
    )
    fp = FPGrowth(
        itemsCol="items", minSupport=0.0625, minConfidence=0.5
    )
    model = fp.fit(baskets)
    return (
        model.freqItemsets.filter(F.size("items") <= 2)
        .select(
            # CSV of the sorted itemset, not ARRAY<STRING>: the driver's
            # row hasher can't hash list cells (r8 verdict #2), so the
            # registry boundary convention is strings out — same as
            # agg_collect_sorted_list
            F.array_join(F.sort_array("items"), ",").alias("itemset"),
            F.col("freq").cast("long").alias("freq"),
        )
    )


@query(
    "basket_association_rules",
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey,
             'I' || lpad(CAST(l_partkey % 12 AS VARCHAR), 2, '0') AS item
      FROM lineitem
    ),
    nb AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM baskets),
    ones AS (
      SELECT item, COUNT(*) AS freq FROM baskets GROUP BY item
    ),
    pairs AS (
      SELECT a.item AS ia, b.item AS ib, COUNT(*) AS freq
      FROM baskets a
      JOIN baskets b ON a.l_orderkey = b.l_orderkey AND a.item <> b.item
      GROUP BY a.item, b.item
    )
    SELECT p.ia                                   AS antecedent,
           p.ib                                   AS consequent,
           ROUND(CAST(p.freq AS DOUBLE) / oa.freq, 6) AS confidence,
           ROUND((CAST(p.freq AS DOUBLE) / oa.freq)
                 / (CAST(ob.freq AS DOUBLE) / nb.n), 6) AS lift,
           ROUND(CAST(p.freq AS DOUBLE) / nb.n, 6) AS support
    FROM pairs p
    JOIN ones oa ON oa.item = p.ia
    JOIN ones ob ON ob.item = p.ib
    CROSS JOIN nb
    WHERE p.freq >= CEIL(0.0625 * nb.n)
      AND oa.freq >= CEIL(0.0625 * nb.n)
      AND CAST(p.freq AS DOUBLE) / oa.freq >= 0.25
    """,
)
def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules from the same FP-Growth model — the
    recommender / cross-sell primitive: for every frequent
    {antecedent} -> {consequent} single-item rule, its confidence
    (P(consequent | antecedent)), lift (confidence over the
    consequent's base rate) and support. MLlib derives rules from the
    mined itemsets; the oracle restates the single-item rules from
    raw pair and item counts, so every emitted number is
    cross-engine-verified (ratios of exact integers — deterministic
    doubles). Rules with multi-item antecedents exist in the model
    but are filtered, mirroring the SQL-tractable slice.

    100 TB shape: rule derivation is itemset-table-sized (not
    corpus-sized); the heavy lifting is the same PFP mining pass as
    basket_fpgrowth_itemsets."""
    from pyspark.ml.fpm import FPGrowth

    li = load_table(spark, sf_dir, "lineitem")
    baskets = (
        li.select(
            "l_orderkey",
            F.concat(
                F.lit("I"),
                F.lpad((F.col("l_partkey") % 12).cast("string"), 2, "0"),
            ).alias("item"),
        )
        .groupBy("l_orderkey")
        .agg(F.collect_set("item").alias("items"))
    )
    model = FPGrowth(
        itemsCol="items", minSupport=0.0625, minConfidence=0.25
    ).fit(baskets)
    rules = model.associationRules
    return rules.filter(
        (F.size("antecedent") == 1) & (F.size("consequent") == 1)
    ).select(
        F.element_at("antecedent", 1).alias("antecedent"),
        F.element_at("consequent", 1).alias("consequent"),
        F.round("confidence", 6).alias("confidence"),
        F.round("lift", 6).alias("lift"),
        F.round("support", 6).alias("support"),
    )


@query(
    "events_prefixspan_patterns",
    oracle="""
    WITH users AS (SELECT COUNT(DISTINCT user_id) AS n FROM events),
    ones AS (
      SELECT event_type AS e1, CAST(NULL AS VARCHAR) AS e2,
             COUNT(DISTINCT user_id) AS freq
      FROM events GROUP BY event_type
    ),
    twos AS (
      SELECT a.event_type AS e1, b.event_type AS e2,
             COUNT(DISTINCT a.user_id) AS freq
      FROM events a
      JOIN events b
        ON a.user_id = b.user_id
       AND (a.ts < b.ts OR (a.ts = b.ts AND a.event_id < b.event_id))
      GROUP BY a.event_type, b.event_type
    )
    SELECT e1, e2, CAST(freq AS BIGINT) AS freq
    FROM (SELECT * FROM ones UNION ALL SELECT * FROM twos)
    CROSS JOIN users
    WHERE freq >= CEIL(0.25 * n)
    """,
)
def events_prefixspan_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern mining — MLlib PrefixSpan over per-user
    event sequences (each event a 1-item itemset, ordered by
    (ts, event_id) so equal timestamps sequence deterministically):
    every frequent pattern of length <= 2 with its EXACT user count,
    oracle-checked against the subsequence restatement (a user
    supports [a -> b] iff some a-event precedes some b-event). The
    dyadic minSupport (0.25) keeps ceil(minSupport * n) on the same
    integer in both engines.

    100 TB shape: PrefixSpan shuffles postfixes by frequent prefix
    (the PrefixSpan paper's projected-database shape) with
    maxPatternLength capping the recursion at 2; sequence assembly is
    one user-keyed sort-aggregate. The oracle's self-join restatement
    is per-user-quadratic and exists only for verification."""
    from pyspark.ml.fpm import PrefixSpan

    ev = load_table(spark, sf_dir, "events")
    seqs = (
        ev.select("user_id", F.struct("ts", "event_id", "event_type").alias("e"))
        .groupBy("user_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list("e")),
                lambda x: F.array(x["event_type"]),
            ).alias("sequence")
        )
    )
    ps = PrefixSpan(
        minSupport=0.25,
        maxPatternLength=2,
        sequenceCol="sequence",
    )
    pats = ps.findFrequentSequentialPatterns(seqs)
    return pats.select(
        F.element_at(F.element_at("sequence", 1), 1).alias("e1"),
        F.when(
            F.size("sequence") > 1,
            F.element_at(F.element_at("sequence", 2), 1),
        ).alias("e2"),
        F.col("freq").cast("long").alias("freq"),
    )
