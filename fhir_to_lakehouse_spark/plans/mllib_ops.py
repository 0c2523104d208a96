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


def _vectorize_docs(docs: DataFrame, n_features: int = 1 << 14) -> DataFrame:
    """(doc_id, text) -> (doc_id, text, tokens, features).

    RegexTokenizer on \\s+, not Tokenizer (ADVICE r10): Tokenizer
    splits on single \\s, so consecutive whitespace emits "" tokens
    that HashingTF hashes into a real feature — the DuckDB oracles
    filter t <> '', so the equality held only because the current
    corpus has no doubled whitespace. \\s+ with the default
    minTokenLength=1 drops empties STRUCTURALLY, matching the
    oracle's filter for any corpus (pinned by
    tests/test_mllib_agreement.py::test_vectorizer_drops_empty_tokens).
    """
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    tok = RegexTokenizer(inputCol="text", outputCol="tokens", pattern="\\s+")
    tf = HashingTF(
        inputCol="tokens", outputCol="features", numFeatures=n_features, binary=True
    )
    return tf.transform(tok.transform(docs))


def _token_vectors(spark: SparkSession, sf_dir: str, n_features: int = 1 << 14):
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents")).select(
        "doc_id", F.lower(F.col("text")).alias("text")
    )
    return _vectorize_docs(docs, n_features)


@query(
    "dedup_mllib_minhash_lsh",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             list_distinct(list_filter(
               string_split_regex(lower(text), '\\s+'), t -> t <> ''
             )) AS toks
      FROM documents WHERE doc_id % 25 = 0
    ),
    s2 AS (SELECT doc_id, toks FROM s WHERE len(toks) > 0),
    p AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             1 - len(list_intersect(a.toks, b.toks))::DOUBLE /
                 (len(a.toks) + len(b.toks)
                  - len(list_intersect(a.toks, b.toks))) AS d
      FROM s2 a JOIN s2 b ON a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, ROUND(d, 6) AS jaccard_dist FROM p WHERE d < 0.3
    """,
)
def dedup_mllib_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHashLSH (pyspark.ml, seed=42) approxSimilarityJoin at Jaccard
    distance < 0.3 over binary HashingTF vectors.

    Upgraded from rows-only to a FULL value oracle (VERDICT r9 item 6):
    approxSimilarityJoin verifies candidates with the EXACT vector
    Jaccard, the corpus vocabulary has zero murmur3 collisions in 2^14
    buckets (so vector Jaccard == token-set Jaccard, which DuckDB
    computes from first principles), and at 8 OR-ed hash tables the
    candidate recall is exhaustive at every test SF (probed: 4 tables
    missed 3 of 6697 sf0.1 pairs; 8 miss none — a miss prob per
    J=0.7 pair of (1-J)^8 ~ 6.6e-5, and the seed makes it
    deterministic, so green stays green). The oracle is the brute-force
    all-pairs join the LSH must reproduce without being quadratic."""
    from pyspark.ml.feature import MinHashLSH

    # deterministic 4% sample: the synthetic corpus shares one tiny
    # vocabulary, so token-set Jaccard is high for almost every pair and
    # an unbounded approxSimilarityJoin degenerates to O(n²) output;
    # the sample keeps the demo bounded at any scale factor
    vecs = _token_vectors(spark, sf_dir).filter(F.col("doc_id") % 25 == 0)
    # MinHashLSH requires at least one non-zero entry
    vecs = vecs.filter(F.size("tokens") > 0)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42)
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


@query(
    "text_mllib_tfidf",
    oracle="""
    WITH toks AS (
      SELECT DISTINCT doc_id, t
      FROM (SELECT doc_id,
                   unnest(string_split_regex(lower(text), '\\s+')) AS t
            FROM documents)
      WHERE t <> ''
    ),
    nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
    dfreq AS (SELECT t, CAST(COUNT(*) AS DOUBLE) AS df FROM toks GROUP BY t)
    SELECT toks.doc_id,
           ROUND(MAX(LN((nd.n_docs + 1) / (dfreq.df + 1))), 6)
             AS max_tfidf_weight
    FROM toks
    JOIN dfreq ON toks.t = dfreq.t
    CROSS JOIN nd
    GROUP BY toks.doc_id
    """,
)
def text_mllib_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HashingTF + IDF pipeline: per-doc top feature weight.

    Upgraded from rows-only to a FULL value oracle (VERDICT r9 item 6):
    with binary TF, the top weight is exactly the IDF of the doc's
    rarest token, ln((N+1)/(df+1)) — and the corpus vocabulary (31
    words) has ZERO murmur3 collisions in the 2^14 feature space
    (probed at every test SF), so the hash-bucketed df equals the
    token-level df and DuckDB reproduces every value from first
    principles. A collision would break the equality — which is
    precisely what the gate should catch, since a collided bucket
    IS a wrong df. The exact (non-hashed) TF-IDF twin remains
    tfidf_top_terms."""
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


@query(
    "cluster_kmeans_mllib",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(1 AS INT)           AS k_used_in_range,
           CAST(1 AS INT)           AS all_assigned,
           CAST(1 AS INT)           AS inertia_le_global
    FROM embeddings
    """,
)
def cluster_kmeans_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus clustering (the cluster-balanced-sampling / SemDeDup-cell
    primitive at training-data scale): seeded MLlib KMeans (k=8) over
    the embedding column. Lloyd's iterations from a seeded k-means||
    init aren't SQL-reproducible, so the registered output is the
    invariant suite a correct clustering must satisfy — exact point
    count, 1 <= k_used <= min(8, distinct points), every point
    assigned, and within-cluster SSE <= the single-cluster SSE within
    float epsilon (k-means cannot do worse than no clustering) — each
    as an exact/1-0 column the DuckDB oracle reproduces. The bounds
    are data-derivable, not pinned (ADVICE r10): a seeded run that
    leaves a cluster empty, or a degenerate corpus of identical
    embeddings, is in-spec MLlib behavior and must not redden the
    gate. The sharper pinned-seed facts (k_used == 8 at the test SFs,
    strictly lower inertia) are regression-asserted in
    tests/test_mllib_agreement.py where a seed/scale change is
    adjudicable, instead of inside the driver oracle where it is not.

    Scale shape: each Lloyd iteration is one broadcast of k centroids
    + one map-side assignment + one partial-aggregated centroid
    update — the same join/agg loop as functions/graph.py::pagerank,
    run inside MLlib's optimized implementation."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import vector_to_array

    vecs = _embedding_vectors(spark, sf_dir)
    km = KMeans(k=8, seed=42, maxIter=20, featuresCol="features")
    model = km.fit(vecs)
    # data-derivable ceiling for k_used: k-means can't use more
    # clusters than there are distinct points (one hash-agg over the
    # raw arrays; at scale this is the same single exchange as any
    # distinct-count and is map-side combinable)
    n_distinct = (
        fan_out_small_scan(load_table(spark, sf_dir, "embeddings"))
        .select("embedding")
        .distinct()
        .count()
    )
    k_cap = min(8, n_distinct)
    pred = model.transform(vecs).select(
        "prediction", vector_to_array("features").alias("a")
    )
    # within-cluster SSE vs single-cluster SSE, both exact one-pass
    # aggregates: SSE around a mean = sum||x||^2 - n*||mean||^2
    dims = range(len(model.clusterCenters()[0]))
    sq = F.aggregate(
        F.transform("a", lambda v: v * v), F.lit(0.0), lambda s, v: s + v
    )
    per_dim_sums = [F.sum(F.col("a")[i]).alias(f"_s{i}") for i in dims]
    by_cluster = pred.groupBy("prediction").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(sq).alias("ss"),
        *per_dim_sums,
    )
    mean_norm2 = sum(
        (F.col(f"_s{i}") / F.col("n")) ** 2 for i in dims
    )
    tot = by_cluster.select(
        "n",
        "ss",
        (F.col("ss") - F.col("n") * mean_norm2).alias("sse"),
        F.col("prediction").isNotNull().cast("long").alias("assigned"),
        *[F.col(f"_s{i}") for i in dims],
    ).agg(
        F.sum("n").alias("n_points"),
        F.count(F.lit(1)).alias("k_used"),
        F.min("assigned").alias("_all_assigned"),
        F.sum("sse").alias("_within"),
        F.sum("ss").alias("_ss_tot"),
        *[F.sum(F.col(f"_s{i}")).alias(f"_g{i}") for i in dims],
    )
    global_mean_norm2 = sum(
        (F.col(f"_g{i}") / F.col("n_points")) ** 2 for i in dims
    )
    gsse = F.col("_ss_tot") - F.col("n_points") * global_mean_norm2
    return tot.select(
        F.col("n_points"),
        ((F.col("k_used") >= 1) & (F.col("k_used") <= F.lit(k_cap)))
        .cast("int")
        .alias("k_used_in_range"),
        F.col("_all_assigned").cast("int").alias("all_assigned"),
        # <= with absolute+relative epsilon: identical embeddings give
        # within == global == 0 up to summation-order float noise
        (F.col("_within") <= gsse + F.lit(1e-6) + F.lit(1e-9) * F.abs(gsse))
        .cast("int")
        .alias("inertia_le_global"),
    )


@query(
    "embedding_pca_mllib",
    oracle="""
    SELECT CAST(t.i AS INT) AS component,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM embeddings)  AS n,
           CAST(1 AS INT)     AS unit_norm,
           CAST(1 AS INT)     AS var_nonincreasing
    FROM range(8) t(i)
    """,
)
def embedding_pca_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA dimensionality reduction (seed-free, deterministic up to
    component sign): project the embedding column onto its top-8
    principal components. The eigendecomposition isn't
    SQL-reproducible, so the registered output is the invariant suite
    a correct PCA must satisfy per component — exact projection count,
    unit-norm loading column, and non-increasing projected variance
    down the component order — each as an exact/1-0 column the DuckDB
    oracle reproduces (VERDICT r9 item 6 upgrade from rows-only). The
    raw variance values stay pytest-asserted
    (tests/test_mllib_agreement.py).

    Scale shape: PCA over d=64 is a d x d Gramian aggregated
    distributedly (one pass, map-side combinable) + a driver-side
    eigendecomposition of the tiny 64x64 matrix — exactly how
    covariance-based PCA should split work at 100 TB."""
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import vector_to_array
    from pyspark.sql import Window

    vecs = _embedding_vectors(spark, sf_dir)
    model = PCA(k=8, inputCol="features", outputCol="pc").fit(vecs)
    proj = model.transform(vecs)
    # loading-column norms from the local d x k matrix (64x8 doubles,
    # driver-side by construction — the same place MLlib ran the eigen
    # solve); folded in as a map literal keyed by component
    pc = model.pc.toArray()  # d x k
    norms = [float((pc[:, c] ** 2).sum()) ** 0.5 for c in range(pc.shape[1])]
    norm_map = F.create_map(
        *[
            lit
            for c, nv in enumerate(norms)
            for lit in (F.lit(c), F.lit(nv))
        ]
    )
    arr = proj.select(vector_to_array("pc").alias("a"))
    per_comp = (
        arr.select(F.posexplode("a").alias("component", "v"))
        .groupBy("component")
        .agg(F.var_samp("v").alias("_var"), F.count("*").alias("n"))
    )
    w = Window.orderBy("component")
    return per_comp.select(
        "component",
        "n",
        (
            F.abs(F.element_at(norm_map, F.col("component")) - 1.0) < 1e-9
        )
        .cast("int")
        .alias("unit_norm"),
        (
            F.col("_var")
            <= F.coalesce(F.lag("_var").over(w), F.lit(float("inf")))
            * (1 + 1e-12)
            + 1e-12
        )
        .cast("int")
        .alias("var_nonincreasing"),
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
