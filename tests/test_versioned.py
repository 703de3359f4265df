"""Versioned snapshot tables: atomic publish, time travel, rollback."""

from __future__ import annotations

import pytest

from data_engineering_challenge_spark.sinks.versioned import (
    history,
    read_snapshot,
    rollback,
    write_snapshot,
)


def test_snapshot_write_read_time_travel_rollback(spark, tmp_path):
    d = str(tmp_path / "tbl")
    assert write_snapshot(spark.range(10), d) == 1
    assert write_snapshot(spark.range(20), d) == 2
    assert write_snapshot(spark.range(5), d) == 3

    assert read_snapshot(spark, d).count() == 5  # latest = v3
    assert read_snapshot(spark, d, version=2).count() == 20  # time travel

    rollback(d, 2)
    assert read_snapshot(spark, d).count() == 20  # latest repointed
    assert read_snapshot(spark, d, version=3).count() == 5  # v3 still readable
    assert history(d) == {"latest": 2, "versions": [1, 2, 3]}

    # writing after rollback continues the version sequence (no reuse)
    assert write_snapshot(spark.range(7), d) == 4
    assert read_snapshot(spark, d).count() == 7


def test_snapshot_unknown_version_raises(spark, tmp_path):
    d = str(tmp_path / "tbl")
    write_snapshot(spark.range(3), d)
    with pytest.raises(ValueError, match="not in table history"):
        read_snapshot(spark, d, version=9)
    with pytest.raises(ValueError, match="not in table history"):
        rollback(d, 9)
