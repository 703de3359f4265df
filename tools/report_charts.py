#!/usr/bin/env python
"""Render the report chart artifacts (the twin of the reference's
src/assets/images/*.png, produced by notebooks/profiling.ipynb):

    python tools/report_charts.py [--sf-dir /root/testdata/sf0.01] [--out reports/]

Charts are SVG rendered with the standard library only (no plotting
dependency in this environment); data comes from the registered query
layer.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_challenge_spark.reporting.charts import create_report_charts
from data_engineering_challenge_spark.session import get_session


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="reports")
    args = ap.parse_args()
    spark = get_session("report-charts")
    for p in create_report_charts(spark, args.sf_dir, args.out):
        print(p)


if __name__ == "__main__":
    main()
