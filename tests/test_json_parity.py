"""Adversarial-JSON oracle parity for the semi-structured surface.

The driver testdata's props are uniformly well-formed {"k": int};
this fixture plants malformed JSON, empty strings, nulls, wrong-typed
values (floats, scientific notation, strings, nested objects, arrays),
unicode keys, and int64-max values, and requires engine-vs-DuckDB
parity. It caught three real divergences, now pinned by the shared
semantics:

- DuckDB json functions ERROR on malformed input while Spark returns
  NULL -> oracles gate with json_valid(); the Spark variant path used
  parse_json which THROWS (ANSI) -> try_parse_json.
- Numeric-string casts disagree (DuckDB rounds '1.5'->2 and parses
  '2e2'; Spark nulls both) -> get_json_object/map extraction is
  defined integral-only (^-?\\d+$) on both sides.
- Spark from_json map<string,bigint> nulls the WHOLE map when any
  value is non-conforming -> parse as map<string,string>, gate values.
- variant_get('bigint') coerces with truncation toward zero and exact
  integral-string parsing; the oracle replays exactly that.
"""

from __future__ import annotations

import datetime
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_engineering_challenge_spark import registry, testing

NASTY_PROPS = [
    '{"k": 69}', '{"k": -1}', '{"k": 0}', None, '', '{}', 'not json',
    '{"k": null}', '{"k": "12"}', '{"k": 9223372036854775807}',
    '{"k": 1.5}', '{"K": 3}', '[1,2]', '{"k": -2.5}', '{"k": "x"}',
    '{"k": {"nested": 1}}', '{"k":\n\n 7}', '{"é": 5}', '{"k": 2e2}',
]

JSON_QUERIES = [
    "events_json_extract",
    "events_props_map",
    "events_variant_extract",
    "value_format_profile_events",
]


@pytest.fixture(scope="module")
def nasty_events_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("nasty_events")
    n = len(NASTY_PROPS)
    base = datetime.datetime(2024, 1, 1)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), type=pa.int64()),
                "ts": pa.array(
                    [base + datetime.timedelta(minutes=i) for i in range(n)],
                    type=pa.timestamp("us"),
                ),
                "user_id": pa.array([i % 3 for i in range(n)], type=pa.int64()),
                "event_type": pa.array(["a" if i % 2 else "b" for i in range(n)]),
                "value": pa.array([float(i) for i in range(n)]),
                "props": pa.array(NASTY_PROPS),
            }
        ),
        str(root / "events.parquet"),
    )
    return str(root)


@pytest.fixture(scope="module")
def nasty_events_con(nasty_events_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{os.path.join(nasty_events_dir, 'events.parquet')}'"
    )
    return con


@pytest.mark.parametrize("name", JSON_QUERIES)
def test_json_oracle_parity(spark, nasty_events_dir, nasty_events_con, name):
    spec = registry.all_queries()[name]
    sdf = spec.fn(spark, nasty_events_dir)
    d_cols, d_rows = testing.run_oracle(nasty_events_con, spec.oracle)
    ok, detail = testing.compare(
        sdf.columns, [tuple(r) for r in sdf.collect()], d_cols, d_rows
    )
    assert ok, f"{name}: {detail}"
