"""Capture .explain('formatted') for named queries into plans/r12/
and (optionally) time a noop-sink pass — the round-12 optimization
evidence trail. Usage:

    python tools/snap_one.py after q1_pricing_summary fhir_comorbidity_pairs
    BENCH_TIME=1 python tools/snap_one.py after fhir_comorbidity_pairs

Timing here is a quick signal only (no quiet-gate); official numbers
come from bench.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fhir_to_lakehouse_spark.plans import QUERIES
from fhir_to_lakehouse_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("snap_one")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SNAP_DIR", "r13"),
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}")
        if os.environ.get("BENCH_TIME") == "1":
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                df = QUERIES[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                times.append(time.perf_counter() - t0)
            print(f"  {name}: passes {[round(t, 3) for t in times]}")


if __name__ == "__main__":
    main()
