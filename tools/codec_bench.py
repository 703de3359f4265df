"""Bench the PNG codec-audit batch adapters: mapInArrow (RecordBatch
native) vs mapInPandas (pandas bridge). Same per-doc codec loop
(`_png_audit_columns`), same plan shape — the delta is pure batch
(de)serialization cost.

    PYTHONPATH=/root/repo python tools/codec_bench.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_challenge_spark.operators import multimodal as mm
from data_engineering_challenge_spark.session import get_session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_session("codec_bench")
    variants = {
        "arrow": mm.png_roundtrip_audit,
        "pandas": mm.png_roundtrip_audit_pandas,
    }
    out: dict[str, list[float]] = {}
    rows = {}
    for name, fn in variants.items():
        fn(spark, sf_dir).count()  # warm (JVM + Python worker pool)
    for r in range(reps):
        for name, fn in variants.items():
            t0 = time.time()
            rows[name] = fn(spark, sf_dir).count()
            out.setdefault(name, []).append(round(time.time() - t0, 3))
    assert rows["arrow"] == rows["pandas"], rows
    best = {k: min(v) for k, v in out.items()}
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "rows": rows["arrow"],
                "runs": out,
                "best": best,
                "arrow_speedup": round(best["pandas"] / best["arrow"], 3),
            }
        )
    )


if __name__ == "__main__":
    main()
