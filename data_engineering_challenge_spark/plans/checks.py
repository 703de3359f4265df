"""Physical-plan inspection helpers — the 100-TB design gate.

The reference inherits its physical behavior from PostgreSQL indexes
and the Polars lazy engine (SURVEY.md §4); here the physical design
lives in Catalyst's plan, so we make it testable: the suite asserts
the properties that decide whether a query survives a 100× scale-up —
filters reach the parquet scan (row-group pruning), projections prune
the read schema (no full-width scans), dim joins broadcast instead of
shuffling the fact side, top-k plans as TakeOrderedAndProject rather
than a global sort, and aggregations stay partial+final (map-side
combine) with a known shuffle count.

A plan regression (a lost pushdown, an accidental sort-merge join, an
extra exchange) fails tests at sf0.001 long before it burns a cluster
at real scale.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    """The query's physical plan as a string (explain() output)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def executed_adaptive_plan(df: DataFrame) -> str:
    """The FINAL adaptive physical plan: executes the frame, then
    renders the plan after AQE's runtime re-optimization
    (isFinalPlan=true). Needed to assert join strategies that the
    static planner legitimately defers — e.g. a dim behind a join whose
    output stats are unknown statically stays SortMergeJoin in
    explain() but converts to broadcast at runtime once the built
    side's actual bytes are known. Note the rendered string still
    embeds pre-conversion subtree text; assert on LIVE operators (the
    codegen-starred ``*(n)`` lines) via :func:`live_operator_count`."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def live_operator_count(plan: str, op: str) -> int:
    """Occurrences of `op` as a LIVE (whole-stage-codegen'd) operator
    in an executed adaptive plan — ``*(n) Op`` lines only, ignoring the
    stale initial-plan subtree text AQE embeds for replaced stages."""
    return len(re.findall(rf"\*\(\d+\) {op}\b", plan))


def count_exchanges(plan: str) -> int:
    """Shuffle exchanges in a formatted plan (BroadcastExchange
    excluded — broadcasts move a dim once, not the fact table)."""
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def scan_sections(plan: str) -> list[dict[str, str]]:
    """Parse `(n) Scan parquet` sections of a formatted plan into
    dicts with keys like Location / PushedFilters / ReadSchema."""
    out: list[dict[str, str]] = []
    for m in re.finditer(r"\(\d+\) Scan parquet ?\n((?:.+\n)+?)(?:\n|$)", plan):
        sec: dict[str, str] = {}
        for line in m.group(1).splitlines():
            k, _, v = line.partition(": ")
            sec[k.split(" [")[0]] = v
        out.append(sec)
    return out


def scans_of(plan: str, table: str) -> list[dict[str, str]]:
    return [s for s in scan_sections(plan) if table in s.get("Location", "")]


def read_columns(scan: dict[str, str]) -> set[str]:
    """Column names out of a scan section's ReadSchema struct."""
    schema = scan.get("ReadSchema", "")
    return set(re.findall(r"(\w+):", schema))
