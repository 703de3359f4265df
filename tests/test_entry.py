"""Driver-contract smoke: entry() runs, queries()/oracle_sql() agree."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as se


def test_entry_returns_rows(spark):
    df = se.entry(spark)
    rows = df.collect()
    assert len(rows) == 10
    assert df.columns == ["l_partkey", "total_units_sold"]


def test_oracle_keys_subset_of_queries():
    q = se.queries()
    o = se.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 13


def test_queries_are_callable(spark, sf_dir):
    q = se.queries()
    name, fn = next(iter(sorted(q.items())))
    df = fn(spark, sf_dir)
    assert df.columns
