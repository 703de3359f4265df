"""Benchmark harness: runs the registered query suite at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "suite_total_sec", "value": N, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": ...}

Each query is timed end-to-end (plan + execute + collect). A short
warm-up query runs first so JVM/codegen startup isn't billed to the
first timed query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_engineering_challenge_spark import registry
from data_engineering_challenge_spark.session import get_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_session("bench")

    # warm-up: spin the JVM, codegen, and parquet footer caches
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for name, spec in registry.all_queries().items():
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        n = len(df.collect())
        timings[name] = round(time.perf_counter() - t0, 4)
        assert n >= 0
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "suite_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
