"""Oracle-parity helpers shared by tests/ and tools/check_oracle.py.

Mirrors the driver's t2 gate: for each registered query, run the Spark
implementation and the DuckDB oracle on the same parquet tables, then
compare row count, column-name set, and an order-insensitive value
fingerprint (columns sorted by name, normalized cells, sorted rows).
"""

from __future__ import annotations

import datetime
import decimal
import hashlib
import math

import duckdb

from .catalog import TABLES


def _norm(v: object) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, decimal.Decimal):
        return repr(float(v).__round__(9))
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return v.strftime("%Y-%m-%d")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def normalized_rows(cols: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm(r[i]) for i in order) for r in rows)


def fingerprint(cols: list[str], rows: list[tuple]) -> tuple[int, str]:
    lines = normalized_rows(cols, rows)
    return len(rows), hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def run_oracle(con: duckdb.DuckDBPyConnection, sql: str) -> tuple[list[str], list[tuple]]:
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    return cols, res.fetchall()


def compare(
    s_cols: list[str],
    s_rows: list[tuple],
    d_cols: list[str],
    d_rows: list[tuple],
) -> tuple[bool, str]:
    """Return (match, detail-on-mismatch)."""
    if sorted(s_cols) != sorted(d_cols):
        return False, f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row counts differ: spark={len(s_rows)} duck={len(d_rows)}"
    ss, dd = normalized_rows(s_cols, s_rows), normalized_rows(d_cols, d_rows)
    for a, b in zip(ss, dd):
        if a != b:
            return False, f"first differing row:\n  spark: {a}\n  duck : {b}"
    return True, ""
