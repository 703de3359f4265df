"""Sessionize skew probe: registered plan vs the demoted lag plan on a
hot-keyed events corpus.

    python tools/skew_probe.py [--sf-dir DIR] [--uniform-dir DIR]

Round-4 measured the skew cliff (SCALING.md "Skew, measured honestly"):
the lag formulation funnels a hot key's rows through ONE window task —
8.05 s vs 2.08 s uniform at sf10 with a 30%-one-key corpus. Round-5
rerouted the REGISTERED sessionize_events through the hybrid; this
probe re-measures both plans on both corpora so the claim "the
registered surface no longer pays the cliff" is an artifact, not an
assertion. Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_challenge_spark.session import get_session
from data_engineering_challenge_spark.catalog import load_table
from data_engineering_challenge_spark.operators.windows import (
    sessionize_events,
    sessionize_lag_plan,
)
from data_engineering_challenge_spark.registry import drain_cache_ledger


def time_plan(fn, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        drain_cache_ledger()
        t0 = time.perf_counter()
        # JVM-side noop batch sink: full materialization without
        # serializing rows through Python workers (foreach would bill a
        # 9.5M-row Python round-trip to both plans, diluting the cliff
        # ratio this probe exists to report).
        fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/repo/.data/sf10_hot")
    ap.add_argument("--uniform-dir", default="/root/repo/.data/sf10")
    args = ap.parse_args()

    spark = get_session("skew-probe")
    out = {"metric": "sessionize_skew_probe", "unit": "sec", "corpora": {}}
    for label, d in (("hot", args.sf_dir), ("uniform", args.uniform_dir)):
        reg = time_plan(lambda: sessionize_events(spark, d))
        lag = time_plan(lambda: sessionize_lag_plan(load_table(spark, d, "events")))
        out["corpora"][label] = {
            "registered_sessionize_events_sec": reg,
            "demoted_lag_plan_sec": lag,
            "cliff_ratio_lag_over_registered": round(lag / reg, 2) if reg else None,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
