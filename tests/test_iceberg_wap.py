"""Write-audit-publish: branch appends (the jar's ``spark.wap.branch``
staging flow) + ``fast_forward`` publication. Staged commits must be
invisible to every main-scoped surface (reads, incremental scans,
changelog, timestamp travel) until the pointer swap."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

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


# -- cherry_pick (the divergent-branch publish path) -------------------------


def test_cherry_pick_applies_staged_append_after_divergence(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.create_branch("feat")
    t.append(spark.createDataFrame([(3, "c")], "id long, s string"),
             branch="feat")
    staged = t.metadata()["refs"]["feat"]["snapshot-id"]
    t.append(spark.createDataFrame([(4, "d")], "id long, s string"))
    with pytest.raises(ValueError, match="not a fast-forward"):
        t.fast_forward("main", "feat")
    sid = t.cherry_pick(staged)
    assert t.metadata()["current-snapshot-id"] == sid
    assert {r["id"] for r in t.read(spark).collect()} == {1, 2, 3, 4}
    # commits NOW: the new snapshot's op is append on the main lineage
    assert t.snapshots()[-1]["summary"]["operation"] == "append"


def test_cherry_pick_escapes_earlier_equality_deletes(spark, tmp_path):
    # picked rows arrive at the CURRENT sequence number — an upsert
    # committed on main between staging and picking must not erase them
    # (same outcome as appending the rows directly after the upsert)
    t = IcebergFsTable(str(tmp_path / "t"))
    t.upsert(spark.createDataFrame([(1, "a"), (2, "b")],
                                   "id long, s string"), ["id"])
    t.create_branch("feat")
    t.append(spark.createDataFrame([(2, "NEW")], "id long, s string"),
             branch="feat")
    staged = t.metadata()["refs"]["feat"]["snapshot-id"]
    t.upsert(spark.createDataFrame([(2, "B2")], "id long, s string"),
             ["id"])
    t.cherry_pick(staged)
    rows = sorted((r["id"], r["s"]) for r in t.read(spark).collect())
    assert rows == [(1, "a"), (2, "B2"), (2, "NEW")]


def test_cherry_pick_refusals(spark, tmp_path):
    t = _t(spark, tmp_path)
    main_head = t.metadata()["current-snapshot-id"]
    with pytest.raises(ValueError, match="already on the main lineage"):
        t.cherry_pick(main_head)
    with pytest.raises(ValueError, match="unknown snapshot"):
        t.cherry_pick(12345)
    # an off-lineage snapshot that is not an append refuses by op name:
    # overwrite main so the earlier delete snapshot falls off the lineage
    t3 = IcebergFsTable(str(tmp_path / "t3"))
    t3.append(spark.createDataFrame([(i, "x") for i in range(4)],
                                    "id long, s string"))
    t3.delete_where(spark, "id = 1")
    del_snap = t3.snapshots()[-1]["snapshot-id"]
    t3.overwrite(spark.createDataFrame([(9, "y")], "id long, s string"))
    with pytest.raises(ValueError, match="append snapshots only"):
        t3.cherry_pick(del_snap)


# -- add_files (metadata-only parquet import) --------------------------------


def test_add_files_imports_and_prunes(spark, tmp_path):
    import glob

    ext = str(tmp_path / "ext")
    spark.createDataFrame(
        [(100 + i, f"x{i}") for i in range(10)], "id long, s string"
    ).coalesce(1).write.parquet(ext)
    pfiles = sorted(glob.glob(f"{ext}/*.parquet"))
    t = _t(spark, tmp_path)
    n = t.add_files(pfiles)
    assert n == len(pfiles)
    got = {r["id"] for r in t.read(spark).collect()}
    assert got == {1, 2} | {100 + i for i in range(10)}
    # footer bounds landed in the manifest: range pruning skips the
    # imported file for a low-id filter
    assert len(t.data_files(range_filter={"id": (1, 2)})) < len(
        t.data_files()
    )
    # directory-tailing stream refuses out-of-tree files
    with pytest.raises(ValueError, match="outside"):
        t.read_stream(spark)
    # compact pulls rows in-tree; the imported file itself is untouched
    t.compact(spark)
    assert all(
        __import__("os").path.exists(p) for p in pfiles
    )
    got = {r["id"] for r in t.read(spark).collect()}
    assert got == {1, 2} | {100 + i for i in range(10)}


def test_add_files_refusals(spark, tmp_path):
    import glob

    ext = str(tmp_path / "ext")
    spark.createDataFrame(
        [(1, "a", 5)], "id long, s string, extra int"
    ).write.parquet(ext)
    pfiles = sorted(glob.glob(f"{ext}/*.parquet"))
    t = _t(spark, tmp_path)
    with pytest.raises(ValueError, match="missing from the table schema"):
        t.add_files(pfiles)
    ext2 = str(tmp_path / "ext2")
    spark.createDataFrame([(1.5, "a")], "id double, s string").write.parquet(
        ext2
    )
    with pytest.raises(ValueError, match="not a widening match"):
        t.add_files(sorted(glob.glob(f"{ext2}/*.parquet")))
    tp = IcebergFsTable(str(tmp_path / "tp"))
    tp.append(
        spark.createDataFrame([(1, "x", "a")], "id long, p string, s string"),
        partition_by=["p"],
    )
    with pytest.raises(ValueError, match="unpartitioned"):
        tp.add_files(pfiles)
    tm = IcebergFsTable(str(tmp_path / "missing"))
    with pytest.raises(ValueError, match="existing table"):
        tm.add_files(pfiles)


def test_add_files_widening_import_reads_exact(spark, tmp_path):
    import glob

    # int32 file imported into a long column — Spark's widening read
    ext = str(tmp_path / "ext")
    spark.createDataFrame([(7, "w")], "id int, s string").write.parquet(ext)
    t = _t(spark, tmp_path)  # id is long
    t.add_files(sorted(glob.glob(f"{ext}/*.parquet")))
    got = {r["id"] for r in t.read(spark).collect()}
    assert got == {1, 2, 7}


# -- review-hardening regressions ---------------------------------------------


def test_lineage_scans_survive_expiry(spark, tmp_path):
    # expire_snapshots leaves the head's parent-snapshot-id pointing at
    # dropped history — lineage walks must stop there, not KeyError
    t = _t(spark, tmp_path)
    t.append(spark.createDataFrame([(3, "c")], "id long, s string"))
    t.append(spark.createDataFrame([(4, "d")], "id long, s string"))
    t.expire_snapshots(keep_last=1)
    # the truncated-history root bootstraps its FULL state as inserts
    # (replay == final state even though earlier commits expired)
    cl = t.read_changelog(spark)
    assert cl.count() == 4
    assert {r["id"] for r in cl.collect()} == {1, 2, 3, 4}
    # incremental keeps its delta contract: retained commits' adds only
    head = t.metadata()["current-snapshot-id"]
    assert t.read_incremental(spark, to_snapshot_id=head).count() == 1


def test_fast_forward_refuses_cleanly_after_expiry(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.create_branch("audit")
    t.append(spark.createDataFrame([(3, "c")], "id long, s string"),
             branch="audit")
    t.append(spark.createDataFrame([(4, "d")], "id long, s string"),
             branch="audit")
    t.append(spark.createDataFrame([(5, "e")], "id long, s string"))
    t.expire_snapshots(keep_last=1)  # drops the first staged commit
    with pytest.raises(ValueError, match="not a fast-forward"):
        t.fast_forward("main", "audit")


def test_read_stream_refuses_staged_branch_files(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.create_branch("audit")
    t.append(spark.createDataFrame([(3, "c")], "id long, s string"),
             branch="audit")
    with pytest.raises(ValueError, match="STAGED branch"):
        t.read_stream(spark)
    t.fast_forward("main", "audit")
    t.read_stream(spark)  # published: streaming allowed again


def test_as_of_resolves_at_publication_time_not_creation(spark, tmp_path):
    import time as _time

    t = _t(spark, tmp_path)
    t.create_branch("audit")
    t.append(spark.createDataFrame([(3, "c")], "id long, s string"),
             branch="audit")
    _time.sleep(0.02)
    mid = int(_time.time() * 1000)  # after staging, before publish
    _time.sleep(0.02)
    t.fast_forward("main", "audit")
    # at `mid` main was still {1,2}: the staged snapshot's CREATION time
    # precedes mid, but it only became current at publish time
    got = {r["id"] for r in t.read(spark, as_of_ms=mid).collect()}
    assert got == {1, 2}
    now = int(_time.time() * 1000) + 1000
    assert {r["id"] for r in t.read(spark, as_of_ms=now).collect()} == {
        1, 2, 3
    }


def test_cherry_pick_twice_refuses(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.create_branch("feat")
    t.append(spark.createDataFrame([(3, "c")], "id long, s string"),
             branch="feat")
    staged = t.metadata()["refs"]["feat"]["snapshot-id"]
    t.append(spark.createDataFrame([(4, "d")], "id long, s string"))
    t.cherry_pick(staged)
    with pytest.raises(ValueError, match="already cherry-picked"):
        t.cherry_pick(staged)
    assert t.read(spark).count() == 4  # no duplicated rows


def test_add_files_duplicate_paths_refuse(spark, tmp_path):
    import glob

    ext = str(tmp_path / "ext")
    spark.createDataFrame([(9, "z")], "id long, s string").coalesce(
        1
    ).write.parquet(ext)
    pfiles = sorted(glob.glob(f"{ext}/*.parquet"))
    t = _t(spark, tmp_path)
    with pytest.raises(ValueError, match="repeated in this call"):
        t.add_files(pfiles + pfiles)
    t.add_files(pfiles)
    with pytest.raises(ValueError, match="already referenced"):
        t.add_files(pfiles)
    assert t.read(spark).count() == 3


def test_range_filter_after_widening(spark, tmp_path):
    # pre-widening manifests carry 4-byte bounds; decoding must follow
    # the buffer width, and pruning must still work on the long column
    t = IcebergFsTable(str(tmp_path / "t"))
    df = spark.range(100).select(
        F.col("id").cast("int").alias("v"), F.col("id").alias("id")
    ).repartitionByRange(4, "v")
    t.append(df)
    t.update_column_type("v", "long")
    pruned = t.data_files(range_filter={"v": (0, 10)})
    assert len(pruned) < len(t.data_files())
    got = t.read(spark, range_filter={"v": (0, 10)}).filter(
        "v between 0 and 10"
    )
    assert got.count() == 11


# -- snapshot-migration + retention options -----------------------------------


def test_create_from_parquet_snapshot_migration(spark, tmp_path):
    import glob

    ext = str(tmp_path / "lake")
    spark.createDataFrame(
        [(i, float(i) / 2, f"s{i}") for i in range(50)],
        "id long, x double, s string",
    ).repartitionByRange(3, "id").write.parquet(ext)
    pfiles = sorted(glob.glob(f"{ext}/*.parquet"))
    t = IcebergFsTable(str(tmp_path / "t"))
    n = t.create_from_parquet(pfiles)
    assert n == len(pfiles)
    got = t.read(spark)
    assert got.count() == 50
    assert set(got.columns) == {"id", "x", "s"}
    # bounds from footers: pruning works immediately on the imported lake
    assert len(t.data_files(range_filter={"id": (0, 5)})) < len(
        t.data_files()
    )
    # the table continues as a normal iceberg table
    t.append(spark.createDataFrame([(99, 9.9, "z")],
                                   "id long, x double, s string"))
    assert t.read(spark).count() == 51
    with pytest.raises(ValueError, match="already exists"):
        t.create_from_parquet(pfiles)


def test_create_from_parquet_widens_across_files(spark, tmp_path):
    import glob

    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    spark.createDataFrame([(1,)], "v int").write.parquet(a)
    spark.createDataFrame([(2**40,)], "v long").write.parquet(b)
    t = IcebergFsTable(str(tmp_path / "t"))
    t.create_from_parquet(
        sorted(glob.glob(f"{a}/*.parquet")) + sorted(glob.glob(f"{b}/*.parquet"))
    )
    got = t.read(spark)
    assert dict(got.dtypes)["v"] == "bigint"
    assert {r["v"] for r in got.collect()} == {1, 2**40}
    # an un-widenable conflict refuses
    c = str(tmp_path / "c")
    spark.createDataFrame([("x",)], "v string").write.parquet(c)
    t2 = IcebergFsTable(str(tmp_path / "t2"))
    with pytest.raises(ValueError, match="not a widening match"):
        t2.create_from_parquet(
            sorted(glob.glob(f"{a}/*.parquet"))
            + sorted(glob.glob(f"{c}/*.parquet"))
        )


def test_expire_older_than_keeps_recent_history(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.append(spark.createDataFrame([(3, "c")], "id long, s string"))
    t.append(spark.createDataFrame([(4, "d")], "id long, s string"))
    # cutoff in the past: every snapshot is at/after it -> nothing expires
    doomed = t.expire_snapshots(
        keep_last=1, older_than_ms=int(time.time() * 1000) - 3_600_000
    )
    assert doomed == []
    assert len(t.snapshots()) == 3
    # cutoff in the future: only keep_last survives
    t.expire_snapshots(
        keep_last=1, older_than_ms=int(time.time() * 1000) + 3_600_000
    )
    assert len(t.snapshots()) == 1


def test_expire_drops_aged_refs(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.append(spark.createDataFrame([(3, "c")], "id long, s string"))
    s1 = t.snapshots()[0]["snapshot-id"]
    t.tag("old", snapshot_id=s1, max_ref_age_ms=1)
    t.tag("pinned", snapshot_id=s1)  # no age -> immortal
    time.sleep(0.01)
    t.expire_snapshots(keep_last=1)
    refs = t.refs()
    assert "old" not in refs and "pinned" in refs
    # the pinned tag still protects the old snapshot
    assert any(s["snapshot-id"] == s1 for s in t.snapshots())


def test_create_from_parquet_list_type_conflict_refuses(spark, tmp_path):
    import glob

    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    spark.createDataFrame(
        [([1, 2],)], "v array<int>"
    ).write.parquet(a)
    spark.createDataFrame(
        [([2**40],)], "v array<long>"
    ).write.parquet(b)
    t = IcebergFsTable(str(tmp_path / "t"))
    with pytest.raises(ValueError, match="not a widening match"):
        t.create_from_parquet(
            sorted(glob.glob(f"{a}/*.parquet"))
            + sorted(glob.glob(f"{b}/*.parquet"))
        )
    # equal list types migrate fine
    t2 = IcebergFsTable(str(tmp_path / "t2"))
    t2.create_from_parquet(sorted(glob.glob(f"{a}/*.parquet")))
    assert t2.read(spark).collect()[0]["v"] == [1, 2]
