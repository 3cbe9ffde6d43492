"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from docker_aktin_dwh_spark.registry import build_registry
from docker_aktin_dwh_spark.session import build_session

#: headline set: star join, wide agg, windows, cohort semantics, dedup,
#: similarity, text — the capability cross-section, not the cheap ones.
HEADLINE = (
    "jn_03", "agg_04", "agg_02", "win_01", "jn_08", "jn_09",
    "coh_01", "eav_01", "ont_01",
    "ded_minhash", "ded_ngram", "ann_topk", "text_quality", "text_fp",
    "str_04", "pipe_01", "pipe_02",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="bench")
    registry = build_registry()

    # warm the JVM/catalog and the Python/Arrow UDF workers so measured
    # time is query execution, not session or worker bring-up
    registry["jn_01"].fn(spark, sf_dir).count()
    from pyspark.sql import functions as F

    @F.pandas_udf("double")
    def _warm(x: pd.Series) -> pd.Series:
        return x

    spark.range(1000).repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32"))) \
        .select(_warm(F.col("id").cast("double"))).count()

    # best of 3: this VM shows ±50% run-to-run noise; min is the
    # steady-state number the plan actually achieves
    timings: dict[str, float] = {}
    for key in HEADLINE:
        fn = registry[key].fn
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[key] = round(best, 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "headline_query_wall_clock_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf_dir,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
