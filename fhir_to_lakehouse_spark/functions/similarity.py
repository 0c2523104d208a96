"""Similarity search over embedding columns (array<float>).

Two paths, per the scale plan:
- brute-force cosine top-k: exact baseline. The query set is broadcast;
  the corpus is scanned once; per-row dot products run as Catalyst
  higher-order functions (zip_with + aggregate) in double precision;
  top-k per query via window row_number. Corpus-side cost is O(N*Q*d)
  with zero shuffles of the corpus (the only shuffle is the final
  top-k on the small (query, candidate) result).
- IVF (inverted-file) bucketed: deterministic coarse quantizer (the
  first n_cells vectors by id are the centroids — deterministic, no
  kmeans RNG), each corpus vector is assigned to its nearest centroid
  (broadcast centroids), queries probe the nearest n_probe cells, so
  the scan touches ~n_probe/n_cells of the corpus. This is the 100 TB
  path: cell assignment is a write-time partition key, so a probe
  reads only matching partitions.

There is also a Pandas-UDF (Arrow) matmul variant for wide batches —
numpy does Q×d · d×N per Arrow batch, which beats per-row HOFs when Q
is large.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.greatest(l2_norm(a) * l2_norm(b), F.lit(1e-12))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: broadcast queries × scanned corpus.

    Returns (query_id, vec_id, cos_sim, rank), rank 1..k, ties broken
    by vec_id so results are engine-deterministic.
    """
    from pyspark.sql import Window

    # norms are staged per ROW on each side before the join: cosine()
    # inline would recompute both norms per PAIR — 3 dot products per
    # (query, candidate) instead of 1 — tripling the O(N·Q·d) codegen
    # work (measured ~3x on the Q=500 crossover bench, SCALING.md)
    q = queries.select(
        F.col(query_id_col), as_double(F.col(vec_col)).alias("q_vec")
    ).withColumn("q_nrm", l2_norm(F.col("q_vec")))
    c = corpus.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("c_vec")
    ).withColumn("c_nrm", l2_norm(F.col("c_vec")))
    sim = dot(F.col("q_vec"), F.col("c_vec")) / F.greatest(
        F.col("q_nrm") * F.col("c_nrm"), F.lit(1e-12)
    )
    scored = (
        c.join(F.broadcast(q), F.col(query_id_col) != F.col(id_col))
        .withColumn("cos_sim", F.round(sim, 6))
        .select(query_id_col, id_col, "cos_sim")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# IVF coarse quantizers use k ≈ sqrt(N) cells — hundreds to a few
# thousand even at 100 TB corpus sizes. 4096 centroid literals is also
# near the practical ceiling for a single projection expression; past
# it the argmax should become a (tiny) broadcast join instead.
MAX_COLLECTED_CENTROIDS = 4096


class CentroidCollectError(ValueError):
    """The centroid frame exceeds the bounded-collect contract: it is
    not a coarse-quantizer set, and collecting it driver-side would be
    the exact unbounded-collect hazard this module is designed to
    avoid."""


def _collect_centroids(
    centroids,
    vec_col: str,
    max_centroids: int,
    caller: str,
) -> list[tuple[int, list[float]]]:
    """Bounded driver-side centroid collect shared by ivf_assign and
    ivf_probes: at most ``max_centroids + 1`` rows ever move (the +1
    detects overflow without a count job); raw double vectors, no
    normalization (callers differ). A pre-collected
    ``[(cell, vector), ...]`` list passes through unchanged (still
    bound-checked) so one collect job can feed BOTH the assignment and
    the probe expressions — one driver round-trip per query instead of
    two."""
    if isinstance(centroids, list):
        if len(centroids) > max_centroids:
            raise CentroidCollectError(
                f"{caller} got more than max_centroids="
                f"{max_centroids} pre-collected centroid rows."
            )
        return [
            (int(c), [float(x) for x in v]) for c, v in centroids
        ]
    rows = (
        centroids.select("cell", as_double(F.col(vec_col)).alias("cv"))
        .limit(max_centroids + 1)
        .collect()
    )
    if len(rows) > max_centroids:
        raise CentroidCollectError(
            f"{caller} collected more than max_centroids="
            f"{max_centroids} centroid rows; an IVF coarse quantizer "
            "is k ~ sqrt(N) cells (hundreds). Pass a real centroid "
            "set, or raise max_centroids deliberately if you mean it."
        )
    return [(int(r["cell"]), [float(x) for x in r["cv"]]) for r in rows]


def ivf_probes(
    queries: DataFrame,
    centroids: DataFrame | list,
    n_probe: int = 2,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    max_centroids: int = MAX_COLLECTED_CENTROIDS,
) -> DataFrame:
    """The n_probe nearest centroid cells per query, IN-ROW: output
    ``(query_id, qv, q_nrm, cell)``, one row per probed cell, ordered
    exactly like the former window formulation (cosine DESC, cell ASC
    on ties).

    Shuffle-free by the same argument as :func:`ivf_assign`: the
    centroid set is bounded and collected driver-side (enforced), each
    query row sorts a |cells|-element struct array in-row and explodes
    its first ``n_probe`` entries. The previous formulation
    cross-joined queries × centroids and ranked with
    ``row_number() OVER (PARTITION BY query_id)`` — an exchange, two
    sorts and a window for a per-row top-n over a bounded candidate
    list. Scores are the full cosine against centroid literals (same
    expression shape the window version evaluated), so the probe
    choice is bit-identical."""
    import math

    cen = _collect_centroids(
        centroids, vec_col, max_centroids, caller="ivf_probes"
    )
    cen.sort()
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        as_double(F.col(vec_col)).alias("qv"),
    ).withColumn("q_nrm", l2_norm(F.col("qv")))
    if not cen:
        # zero centroids: F.array() of no structs has no `cell` field,
        # so the expression below fails at ANALYSIS time. The former
        # cross-join + row_number formulation returned an empty frame
        # with the correct schema for the same input — preserve that.
        return q.select(
            "query_id", "qv", "q_nrm", F.lit(None).cast("long").alias("cell")
        ).where(F.lit(False))
    cvn = {cell: math.sqrt(sum(x * x for x in cv)) for cell, cv in cen}
    ranked = F.sort_array(
        F.array(
            *[
                F.struct(
                    (
                        -(
                            dot(F.col("qv"), F.lit(cv))
                            / F.greatest(
                                F.col("q_nrm") * F.lit(cvn[cell]),
                                F.lit(1e-12),
                            )
                        )
                    ).alias("neg_sim"),
                    F.lit(cell).cast("long").alias("cell"),
                )
                for cell, cv in cen
            ]
        )
    )
    return q.select(
        "query_id",
        "qv",
        "q_nrm",
        F.explode(F.slice(ranked, 1, n_probe)).alias("__p"),
    ).select("query_id", "qv", "q_nrm", F.col("__p.cell").alias("cell"))


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame | list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_centroids: int = MAX_COLLECTED_CENTROIDS,
) -> DataFrame:
    """Assign each vector to its nearest centroid. Output:
    (vec_id, cell, embedding). At write time ``cell`` becomes the
    partition column so probes prune partitions.

    Shuffle-free by construction: the coarse-centroid set is small and
    bounded by design (IVF k ≈ sqrt(N) cells at most, typically
    hundreds), so it is collected driver-side — same bounded-collect
    class as the Q=5 query vectors in plans/similarity.py — and baked
    into ONE projection as unit-normalized literal vectors. Nearest
    cell = array_max over (score, -cell) structs: max score wins, ties
    break to the LOWEST cell (matching the former window's
    `sim DESC, cell ASC`). Ordering by dot(v, cv/||cv||) equals
    cosine ordering because the row's own norm is a positive constant
    across candidates. The previous implementation shuffled
    K×|corpus| rows (each carrying the full vector) through a
    Window.partitionBy(id) — a per-row argmax does not need a
    shuffle, and at 100 TB that shuffle IS the job.

    The bounded-collect contract is ENFORCED, not just documented:
    more than ``max_centroids`` rows raises
    :class:`CentroidCollectError` before anything large crosses the
    driver (the check piggybacks on a limit(max+1) collect — no extra
    count job, and at most max+1 rows ever move)."""
    import math

    cen = []
    for cell, cv in _collect_centroids(
        centroids, vec_col, max_centroids, caller="ivf_assign"
    ):
        n = math.sqrt(sum(x * x for x in cv))
        cen.append((cell, [x / n for x in cv] if n > 1e-12 else cv))
    cen.sort()
    # materialize the double-cast vector ONCE — inlining it into K
    # score expressions would cast K times (functions/dedup.py note)
    tmp = corpus.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("__v")
    )
    if not cen:
        # same empty-centroid guard as ivf_probes: the argmax over an
        # empty literal array cannot be analyzed; the former window
        # formulation yielded an empty frame of the same schema.
        return tmp.select(
            F.col(id_col),
            F.lit(None).cast("long").alias("cell"),
            F.col("__v").alias(vec_col),
        ).where(F.lit(False))
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    dot(F.col("__v"), F.lit(cv)).alias("score"),
                    F.lit(-cell).cast("long").alias("neg_cell"),
                )
                for cell, cv in cen
            ]
        )
    )
    return tmp.select(
        F.col(id_col),
        (-best["neg_cell"]).alias("cell"),
        F.col("__v").alias(vec_col),
    )


def hyperplane_bucket(vec: Column, n_planes: int = 8, dim: int = 64) -> Column:
    """Random-hyperplane LSH bucket id (SimHash for vectors): bit i is
    the sign of plane_i · v, planes built from deterministic ±1 entries
    (xxhash64 parity of (plane, dim) — reproducible across runs and
    engines with xxhash64, no RNG state). Cosine-similar vectors agree
    on most signs, so they land in the same bucket; at scale the bucket
    is a partition/bucketBy column and probes touch one bucket.
    """
    import numpy as np  # deterministic plane signs, built driver-side

    # xxhash64-equivalent determinism without a JVM round trip: use a
    # fixed numpy PCG stream seeded per function constant — the planes
    # are data-independent constants baked into the plan as literals
    rng = np.random.default_rng(0xF41A)
    signs = rng.integers(0, 2, size=(n_planes, dim)) * 2 - 1

    bucket = F.lit(0)
    for i in range(n_planes):
        plane = F.array(*[F.lit(float(s)) for s in signs[i]])
        d = dot(plane, vec)
        bucket = bucket + F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket.cast("int")


# the query matrix rides in every task's pickled closure: Q×d doubles.
# 16384 queries × 64 dims ≈ 8 MB — about the ceiling before the
# closure itself becomes per-task I/O; larger query sets should be a
# DataFrame side of a join, not a closure.
MAX_CLOSURE_QUERY_ROWS = 16384


def matmul_topk_pandas(
    corpus: DataFrame,
    query_rows: list[tuple[int, list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_query_rows: int = MAX_CLOSURE_QUERY_ROWS,
) -> DataFrame:
    """Arrow-batched matmul top-k: queries held as a numpy matrix in the
    closure (broadcast via task pickle), corpus streamed per Arrow batch
    through mapInPandas, numpy does the (B×d)·(d×Q) product. Partial
    top-k per batch, final exact top-k via groupBy window on the tiny
    candidate set.

    The closure-size contract is enforced: more than ``max_query_rows``
    query vectors raises ValueError — a query set that large belongs in
    a DataFrame join (brute_force_topk / IVF), not a task closure."""
    from pyspark.sql import Window

    if len(query_rows) > max_query_rows:
        raise ValueError(
            f"matmul_topk_pandas got {len(query_rows)} query rows; the "
            f"closure contract caps at max_query_rows={max_query_rows} "
            "— use brute_force_topk (broadcast-join path) or the IVF "
            "index for large query sets."
        )

    qids = np.array([q[0] for q in query_rows], dtype=np.int64)
    qmat = np.array([q[1] for q in query_rows], dtype=np.float64)
    qnorm = np.linalg.norm(qmat, axis=1)
    qnorm[qnorm == 0] = 1e-12

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField(id_col, T.LongType()),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )

    def score_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            cmat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            cnorm = np.linalg.norm(cmat, axis=1)
            cnorm[cnorm == 0] = 1e-12
            sims = (cmat @ qmat.T) / np.outer(cnorm, qnorm)  # B×Q
            ids = pdf[id_col].to_numpy()
            # partial top-k inside the batch: keep k best rows per query
            frames = []
            for qi in range(len(qids)):
                col = sims[:, qi]
                mask = ids != qids[qi]
                cids, csims = ids[mask], np.round(col[mask], 6)
                if len(cids) == 0:
                    continue
                # order by (-sim, id) so batch-local pruning keeps exactly
                # the candidates the global (rounded sim desc, id asc)
                # ranking would pick — ties never lose the right row
                top = np.lexsort((cids, -csims))[:k]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": qids[qi],
                            id_col: cids[top],
                            "cos_sim": csims[top],
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    candidates = corpus.select(id_col, vec_col).mapInPandas(
        score_batches, schema=out_schema
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
