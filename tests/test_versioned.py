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


def test_vacuum_drops_old_versions_keeps_latest_and_retained(spark, tmp_path):
    import os

    from data_engineering_challenge_spark.sinks.versioned import vacuum_snapshots

    d = str(tmp_path / "tbl")
    for n in (10, 20, 5, 7):
        write_snapshot(spark.range(n), d)
    assert vacuum_snapshots(d, keep_last=2) == [1, 2]
    assert history(d) == {"latest": 4, "versions": [3, 4]}
    assert read_snapshot(spark, d).count() == 7
    assert read_snapshot(spark, d, version=3).count() == 5
    # vacuumed versions are unreachable through the manifest AND gone
    with pytest.raises(ValueError, match="not in table history"):
        read_snapshot(spark, d, version=1)
    assert not os.path.exists(os.path.join(d, "v=1"))
    # idempotent
    assert vacuum_snapshots(d, keep_last=2) == []


def test_vacuum_never_drops_a_rolled_back_latest(spark, tmp_path):
    from data_engineering_challenge_spark.sinks.versioned import vacuum_snapshots

    d = str(tmp_path / "tbl")
    for n in (10, 20, 5):
        write_snapshot(spark.range(n), d)
    rollback(d, 1)  # latest points at the OLDEST version
    assert vacuum_snapshots(d, keep_last=1) == [2]
    assert read_snapshot(spark, d).count() == 10  # v1 survives as latest
    assert history(d) == {"latest": 1, "versions": [1, 3]}
