"""Re-measure text_trigram_perplexity's recompute-vs-persist trade
(VERDICT r12 item 6): the r11 decision (recompute the token stream
per consumer) predates the r12 table-handle memo, so the relative
price of a within-query persist has changed. Variants:

  V0 current      tokenize 3x (grams x2 + vocab), no materialization
  V1 persist tk   tokenize once into a persisted (doc_id, t) frame,
                  derive grams x2 + vocab from the cache
  V2 ckpt tk      same but eager localCheckpoint (plan truncation)

Each variant runs $REPS noop-sink passes bench-style (median of 3
after a warmup). Run on a QUIET machine.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fhir_to_lakehouse_spark.functions import text as TX
from fhir_to_lakehouse_spark.functions.cache import (
    release_all_persistent_rdds,
    scoped_local_checkpoint,
    scoped_persist,
)
from fhir_to_lakehouse_spark.session import get_spark
from fhir_to_lakehouse_spark.sources.tables import (
    fan_out_small_scan,
    load_table,
)

REPS = int(os.environ.get("REPS", "4"))


def gram_expr():
    return F.expr(
        "transform(sequence(1, size(t) - 2), i -> struct("
        " concat_ws(' ', element_at(t, i), element_at(t, i + 1)) AS ctx,"
        " element_at(t, i + 2) AS nxt))"
    )


def score(grams, cn, cc, vocab):
    scored = (
        grams.join(cn, ["ctx", "nxt"]).join(cc, "ctx")
        .crossJoin(F.broadcast(vocab))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_trigrams"),
        F.round(
            F.avg(
                -F.log(
                    (F.col("n") + F.lit(0.5))
                    / (F.col("n_ctx") + F.lit(0.5) * F.col("v"))
                )
            ),
            6,
        ).alias("avg_neg_logprob"),
    )


def v0(spark, sf_dir):
    from fhir_to_lakehouse_spark.plans import QUERIES

    return QUERIES["text_trigram_perplexity"](spark, sf_dir)


def _tk(spark, sf_dir):
    docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
    return docs.select("doc_id", TX.tokens("text").alias("t"))


def _from_tk(tk):
    t = tk.filter(F.size("t") >= 3)
    grams = t.select("doc_id", F.explode(gram_expr()).alias("g")).select(
        "doc_id", "g.ctx", "g.nxt"
    )
    grams2 = t.select("doc_id", F.explode(gram_expr()).alias("g")).select(
        "doc_id", "g.ctx", "g.nxt"
    )
    cn = grams2.groupBy("ctx", "nxt").agg(F.count(F.lit(1)).alias("n"))
    cc = cn.groupBy("ctx").agg(F.sum("n").alias("n_ctx"))
    vocab = tk.select(F.explode("t").alias("token")).agg(
        F.countDistinct("token").alias("v")
    )
    return score(grams, cn, cc, vocab)


def v1(spark, sf_dir):
    tk = scoped_persist(_tk(spark, sf_dir))
    tk.count()  # materialize before the fan-out (stampede guard)
    return _from_tk(tk)


def v2(spark, sf_dir):
    tk = scoped_local_checkpoint(_tk(spark, sf_dir), eager=True)
    return _from_tk(tk)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile_trigram")
    for name, fn in (("V0 current", v0), ("V1 persist", v1), ("V2 ckpt", v2)):
        times = []
        for _ in range(REPS):
            spark.sparkContext.setJobDescription(f"trigram {name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
            release_all_persistent_rdds(spark)
        print(f"{name:12s} {times}  median {sorted(times[1:])[len(times[1:]) // 2]}")
    # equivalence spot check at sf0.001: V1/V2 vs V0 rows
    small = "/root/testdata/sf0.001"
    rows0 = {tuple(r) for r in v0(spark, small).collect()}
    rows1 = {tuple(r) for r in v1(spark, small).collect()}
    rows2 = {tuple(r) for r in v2(spark, small).collect()}
    print("V1 == V0:", rows1 == rows0, " V2 == V0:", rows2 == rows0)
    spark.catalog.clearCache()
    release_all_persistent_rdds(spark)


if __name__ == "__main__":
    main()
