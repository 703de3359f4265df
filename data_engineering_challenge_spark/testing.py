"""Oracle-parity helpers shared by tests/ and tools/check_oracle.py.

Mirrors the driver's t2 gate: for each registered query, run the Spark
implementation and the DuckDB oracle on the same parquet tables, then
compare row count, column-name set, and an order-insensitive value
fingerprint (columns sorted by name, normalized cells, sorted rows).

Two comparison modes:

- **strict** (default everywhere since round 2): floats compare by
  exact shortest ``repr`` — the driver hashes exact values, so a
  1-ulp engine divergence must FAIL locally too. Values the driver's
  serialization can't hash faithfully (``Decimal``, ints outside
  int64 — DuckDB HUGEINT) raise :class:`DriverUnsafeValue`: registered
  queries must cast such columns to double/BIGINT at the projection
  boundary (round 1 shipped 9 hash failures because the lenient local
  gate rounded them away; VERDICT.md round 1 §What's wrong).
- **lenient** (``strict=False``): the round-1 behavior (floats and
  decimals rounded to 9 digits) — kept only for debugging whether a
  mismatch is representational or real.
"""

from __future__ import annotations

import datetime
import decimal
import hashlib
import math

import duckdb

from .catalog import TABLES

_INT64_MIN, _INT64_MAX = -(2**63), 2**63 - 1


class DriverUnsafeValue(TypeError):
    """A query/oracle emitted a value the driver cannot hash faithfully
    (Decimal, int128). Fix the query's final projection, not the gate."""


def _norm(v: object, strict: bool = True) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v) if strict else repr(round(v, 9))
    if isinstance(v, decimal.Decimal):
        if strict:
            raise DriverUnsafeValue(
                f"Decimal output {v!r}: cast the final projection to DOUBLE "
                "in both the Spark query and its oracle"
            )
        return repr(float(v).__round__(9))
    if isinstance(v, int) and strict and not (_INT64_MIN <= v <= _INT64_MAX):
        raise DriverUnsafeValue(
            f"int out of int64 range {v!r} (DuckDB HUGEINT): CAST(... AS BIGINT) in the oracle"
        )
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return v.strftime("%Y-%m-%d")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x, strict) for x in v) + "]"
    return str(v)


def normalized_rows(cols: list[str], rows: list[tuple], strict: bool = True) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm(r[i], strict) for i in order) for r in rows)


def fingerprint(cols: list[str], rows: list[tuple], strict: bool = True) -> tuple[int, str]:
    lines = normalized_rows(cols, rows, strict)
    return len(rows), hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Register the sf tables as DuckDB views — both layouts: the
    driver's single-file `{t}.parquet` and the Spark-written directory
    `{t}.parquet/part-*.parquet` (tools/gen_sf.py output)."""
    import os

    con = duckdb.connect()
    # Big-SF oracle sweeps share the box with a large-heap JVM: without
    # a limit DuckDB grows to physical RAM and the kernel OOM-kills the
    # harness (observed at sf100 on the ANN oracles). A bound + spill
    # dir turns that into disk-backed execution. Both knobs are
    # overridable for small boxes / bigger sweeps.
    # Default bounds at min(48GB, half of physical RAM): DuckDB's own
    # default is ~80% of RAM, so a flat 48GB would RAISE the cap on
    # boxes under ~60GB and make the OOM it guards against more likely.
    try:
        phys_gb = (
            os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE") // (1 << 30)
        )
        default_mem = f"{min(48, max(1, phys_gb // 2))}GB"
    except (ValueError, OSError):
        default_mem = "48GB"
    mem = os.environ.get("SPARK_GRAFT_ORACLE_MEM", default_mem)
    con.execute(f"SET memory_limit='{mem}'")
    tmp = os.environ.get("SPARK_GRAFT_ORACLE_TMP", "/tmp/duckdb_spill")
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET temp_directory='{tmp}'")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if not os.path.exists(path):
            # partial scale fixtures (e.g. an sf100 dir generated with
            # --tables documents,embeddings,events, or a content-hash
            # doc sample) ship only the tables under test; a query
            # touching an absent table still fails, with "table not
            # found" instead of a bind error at connect time
            continue
        src = f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")
    return con


def run_oracle(con: duckdb.DuckDBPyConnection, sql: str) -> tuple[list[str], list[tuple]]:
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    return cols, res.fetchall()


def oracle_output_types(con: duckdb.DuckDBPyConnection, sql: str) -> list[tuple[str, str]]:
    """(column, duckdb type) for an oracle query — bind-only, no execution."""
    rel = con.sql(sql)
    return list(zip(rel.columns, [str(t) for t in rel.types]))


def compare(
    s_cols: list[str],
    s_rows: list[tuple],
    d_cols: list[str],
    d_rows: list[tuple],
    strict: bool = True,
) -> tuple[bool, str]:
    """Return (match, detail-on-mismatch)."""
    if sorted(s_cols) != sorted(d_cols):
        return False, f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row counts differ: spark={len(s_rows)} duck={len(d_rows)}"
    try:
        ss = normalized_rows(s_cols, s_rows, strict)
    except DriverUnsafeValue as e:
        return False, f"spark output driver-unsafe: {e}"
    try:
        dd = normalized_rows(d_cols, d_rows, strict)
    except DriverUnsafeValue as e:
        return False, f"oracle output driver-unsafe: {e}"
    for a, b in zip(ss, dd):
        if a != b:
            return False, f"first differing row:\n  spark: {a}\n  duck : {b}"
    return True, ""
