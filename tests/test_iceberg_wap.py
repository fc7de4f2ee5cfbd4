"""Write-audit-publish: branch appends (the jar's ``spark.wap.branch``
staging flow) + ``fast_forward`` publication. Staged commits must be
invisible to every main-scoped surface (reads, incremental scans,
changelog, timestamp travel) until the pointer swap."""

from __future__ import annotations

import time

import pytest

from flinkrunner_spark.iceberg import IcebergFsTable


def _t(spark, tmp_path):
    t = IcebergFsTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string"))
    return t


def test_branch_append_invisible_until_publish(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.create_branch("audit")
    t.append(spark.createDataFrame([(3, "c")], "id long, s string"),
             branch="audit")
    assert {r["id"] for r in t.read(spark).collect()} == {1, 2}
    assert {r["id"] for r in t.read(spark, ref="audit").collect()} == {
        1, 2, 3
    }
    sid = t.fast_forward("main", "audit")
    assert t.metadata()["current-snapshot-id"] == sid
    assert {r["id"] for r in t.read(spark).collect()} == {1, 2, 3}


def test_staged_commits_skip_lineage_scans(spark, tmp_path):
    t = _t(spark, tmp_path)
    s1 = t.metadata()["current-snapshot-id"]
    t.create_branch("audit")
    t.append(spark.createDataFrame([(3, "c")], "id long, s string"),
             branch="audit")
    # incremental + changelog follow main's lineage: nothing after s1
    assert t.read_incremental(spark, from_snapshot_id=s1).count() == 0
    assert t.read_changelog(spark, from_snapshot_id=s1).count() == 0
    # timestamp travel never lands on the staged snapshot
    now = int(time.time() * 1000) + 10_000
    assert {r["id"] for r in t.read(spark, as_of_ms=now).collect()} == {1, 2}
    t.fast_forward("main", "audit")
    assert t.read_changelog(spark, from_snapshot_id=s1).count() == 1
    got = t.read_incremental(spark, from_snapshot_id=s1)
    assert [r["id"] for r in got.collect()] == [3]


def test_branch_lineage_forks_from_branch_head(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.create_branch("audit")
    t.append(spark.createDataFrame([(3, "c")], "id long, s string"),
             branch="audit")
    t.append(spark.createDataFrame([(4, "d")], "id long, s string"),
             branch="audit")
    # second staged commit chains on the first, not on main
    md = t.metadata()
    head = next(
        s for s in md["snapshots"]
        if s["snapshot-id"] == md["refs"]["audit"]["snapshot-id"]
    )
    parent = next(
        s for s in md["snapshots"]
        if s["snapshot-id"] == head["parent-snapshot-id"]
    )
    assert parent["parent-snapshot-id"] == md["current-snapshot-id"]
    assert {r["id"] for r in t.read(spark, ref="audit").collect()} == {
        1, 2, 3, 4
    }


def test_fast_forward_refusals(spark, tmp_path):
    t = _t(spark, tmp_path)
    s1 = t.metadata()["current-snapshot-id"]
    t.append(spark.createDataFrame([(3, "c")], "id long, s string"))
    t.create_branch("stale", snapshot_id=s1)
    with pytest.raises(ValueError, match="not a fast-forward"):
        t.fast_forward("main", "stale")
    t.tag("v1")
    with pytest.raises(ValueError, match="tag"):
        t.fast_forward("v1", "stale")
    with pytest.raises(ValueError, match="unknown ref"):
        t.fast_forward("nope", "stale")
    with pytest.raises(ValueError, match="unknown branch"):
        t.append(spark.createDataFrame([(9, "z")], "id long, s string"),
                 branch="nope")


def test_expire_keeps_staged_branch_files(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.create_branch("audit")
    t.append(spark.createDataFrame([(3, "c")], "id long, s string"),
             branch="audit")
    t.append(spark.createDataFrame([(4, "d")], "id long, s string"))
    t.expire_snapshots(keep_last=1)
    # the staged branch still reads whole after expiry (ref-protected)
    assert {r["id"] for r in t.read(spark, ref="audit").collect()} == {
        1, 2, 3
    }
