"""Per-stage profile of dedup_prefix_filter_join (VERDICT r12 item 4).

Splits one bench pass into its physical phases and times each with the
noop sink (guide §1.4), labeled for the UI (§1.5):

  A  build+checkpoint  tokenize x2 -> df-rank -> order -> group -> ckpt
  A1 elem scan         tokenize+shingle+explode, one pass, no shuffle
  A2 dfreq             elem -> groupBy(e).count  (includes one elem scan)
  A3 ordered           elem join dfreq -> collect_list/sort (2nd elem scan)
  B  consumers         within + cand + cross off the warm checkpoint
  B1 cand              prefix posexplode self-join + distinct
  B2 cross verify      cand join sets x2 + array_intersect

Run on a QUIET machine; every phase repeats $REPS times (default 3)
and reports all passes. This is a diagnosis tool, not the bench.
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
)
from fhir_to_lakehouse_spark.session import get_spark
from fhir_to_lakehouse_spark.sources.tables import (
    fan_out_small_scan,
    load_table,
)

REPS = int(os.environ.get("REPS", "3"))


def timed(spark, label, build):
    times = []
    for _ in range(REPS):
        spark.sparkContext.setJobDescription(f"profile: {label}")
        t0 = time.perf_counter()
        df = build()
        df.write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
    spark.sparkContext.setJobDescription(None)
    print(f"{label:28s} {times}")
    return times


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile_prefix")
    threshold = 0.5

    def sh():
        docs = fan_out_small_scan(load_table(spark, sf_dir, "documents"))
        return docs.select("doc_id", TX.tokens("text").alias("_toks")).select(
            "doc_id", TX.shingles_from_tokens(F.col("_toks"), 3).alias("sh")
        )

    def elem():
        return sh().select("doc_id", F.explode("sh").alias("e"))

    def dfreq():
        return elem().groupBy("e").agg(F.count(F.lit(1)).alias("df"))

    def ordered():
        return (
            elem()
            .join(dfreq(), "e")
            .groupBy("doc_id")
            .agg(F.array_sort(F.collect_list(F.struct("df", "e"))).alias("oe"))
            .select("doc_id", F.transform("oe", lambda s: s["e"]).alias("oe"))
        )

    def groups_unmaterialized():
        return (
            ordered()
            .withColumn("sfp", F.md5(F.to_json("oe")))
            .groupBy("sfp")
            .agg(
                F.sort_array(F.collect_list("doc_id")).alias("ids"),
                F.first("oe").alias("oe"),
            )
        )

    # ---- A-side: build cost -------------------------------------------
    timed(spark, "A1 elem (1 tokenize pass)", elem)
    timed(spark, "A2 dfreq (agg over elem)", dfreq)
    timed(spark, "A3 ordered (join+collect)", ordered)
    timed(spark, "A4 groups (no ckpt)", groups_unmaterialized)

    # A4' alternative formulations of the ordering stage
    def ordered_window():
        from pyspark.sql import Window

        e = elem().withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("e"))
        )
        return (
            e.groupBy("doc_id")
            .agg(F.array_sort(F.collect_list(F.struct("df", "e"))).alias("oe"))
            .select("doc_id", F.transform("oe", lambda s: s["e"]).alias("oe"))
        )

    timed(spark, "A3w ordered via window", ordered_window)

    def groups_xxfp():
        return (
            ordered()
            .withColumn("sfp", F.xxhash64("oe"))
            .groupBy("sfp")
            .agg(
                F.sort_array(F.collect_list("doc_id")).alias("ids"),
                F.first("oe").alias("oe"),
            )
        )

    timed(spark, "A4x groups (xxhash64 fp)", groups_xxfp)

    # ---- checkpoint cost ------------------------------------------------
    t0 = time.perf_counter()
    spark.sparkContext.setJobDescription("profile: checkpoint groups")
    groups = scoped_local_checkpoint(groups_unmaterialized(), eager=True)
    print(f"{'A5 eager checkpoint':28s} [{round(time.perf_counter() - t0, 3)}]")

    # ---- B-side: consumers off the warm checkpoint ----------------------
    n = F.size("oe")
    plen = (n - F.ceil(F.lit(threshold) * n - F.lit(1e-9)) + 1).cast("int")

    def pref():
        return groups.select(
            F.col("sfp").alias("fp_"),
            n.alias("n"),
            F.posexplode(F.slice("oe", F.lit(1), plen)).alias("pos", "p"),
        )

    def cand():
        a = pref().select(
            F.col("fp_").alias("fa"), F.col("n").alias("na"),
            (F.col("pos") + 1).alias("pa"), "p",
        )
        b = pref().select(
            F.col("fp_").alias("fb"), F.col("n").alias("nb"),
            (F.col("pos") + 1).alias("pb"), "p",
        )
        alpha = F.ceil(
            F.lit(threshold) * (F.col("na") + F.col("nb"))
            / F.lit(1.0 + threshold) - F.lit(1e-9)
        )
        return (
            a.join(b, "p")
            .filter(F.col("fa") < F.col("fb"))
            .filter(
                F.least("na", "nb") >= F.lit(threshold) * F.greatest("na", "nb")
            )
            .filter(
                1 + F.least(F.col("na") - F.col("pa"), F.col("nb") - F.col("pb"))
                >= alpha
            )
            .select("fa", "fb")
            .distinct()
        )

    def cross():
        sa = groups.select(
            F.col("sfp").alias("fa"), F.col("oe").alias("ea"),
            F.col("ids").alias("ids_a"),
        )
        sb = groups.select(
            F.col("sfp").alias("fb"), F.col("oe").alias("eb"),
            F.col("ids").alias("ids_b"),
        )
        inter = F.size(F.array_intersect("ea", "eb"))
        union = F.size("ea") + F.size("eb") - inter
        jac = inter / union.cast("double")
        return (
            cand().join(sa, "fa").join(sb, "fb")
            .select("ids_a", "ids_b", inter.alias("n_common"), jac.alias("_j"))
            .filter(F.col("_j") >= threshold)
        )

    timed(spark, "B1 cand (prefix join)", cand)
    timed(spark, "B2 cross (cand+verify)", cross)

    # counts for context (one extra pass each)
    print("n docs:", load_table(spark, sf_dir, "documents").count())
    print("n distinct sets:", groups.count())
    print("n candidates:", cand().count())

    release_all_persistent_rdds(spark)

    # ---- full query, bench-style, for the same-session anchor ----------
    from fhir_to_lakehouse_spark.plans import QUERIES

    def full():
        return QUERIES["dedup_prefix_filter_join"](spark, sf_dir)

    timed(spark, "FULL dedup_prefix_filter", full)
    spark.catalog.clearCache()
    release_all_persistent_rdds(spark)


if __name__ == "__main__":
    main()
