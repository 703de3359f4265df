#!/usr/bin/env python
"""Declarative pipeline CLI: run a JSON-configured pipeline.

    python tools/pipeline.py config.json

Config schema in data_engineering_challenge_spark/pipeline.py. Prints
the per-stage stats dict as one JSON line (the reference's load-stats
surface, src/etl/ingest/data_loader.py:12-16, widened to the full
source→clean→validate→dedup→split→sink chain).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_challenge_spark.pipeline import run_pipeline
from data_engineering_challenge_spark.session import get_session


def main(argv: list[str] | None = None) -> int:
    args = argv if argv is not None else sys.argv[1:]
    if len(args) != 1:
        print(__doc__, file=sys.stderr)
        return 2
    with open(args[0]) as f:
        config = json.load(f)
    spark = get_session("dec-spark-pipeline")
    stats = run_pipeline(spark, config)
    print(json.dumps(stats, default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
