"""Iceberg metadata tables (`snapshots_df` / `history_df` / `files_df`
/ `manifests_df`) — the spec's inspection surface over the pure-Python
table layout."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flinkrunner_spark.iceberg import IcebergFsTable  # noqa: E402


def _mk(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    t = IcebergFsTable(str(tmp_path / "t"))
    t.append(df)
    return t, df


def test_snapshots_and_history_lineage(spark, tmp_path):
    t, _ = _mk(spark, tmp_path, [(1, "a", 1.0), (2, "b", 2.0)])
    t.append(spark.createDataFrame([(3, "a", 3.0)], "id long, grp string, v double"))
    snaps = t.snapshots_df(spark).collect()
    assert len(snaps) == 2
    assert snaps[0]["operation"] == "append"
    assert snaps[0]["parent_id"] is None
    assert snaps[1]["parent_id"] == snaps[0]["snapshot_id"]
    assert snaps[1]["sequence_number"] == snaps[0]["sequence_number"] + 1
    hist = t.history_df(spark).collect()
    assert [h["snapshot_id"] for h in hist] == [
        s["snapshot_id"] for s in snaps
    ]
    assert all(h["is_current_ancestor"] for h in hist)


def test_files_df_counts_and_partitions(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 2), float(i)) for i in range(10)],
        "id long, grp string, v double",
    )
    t = IcebergFsTable(str(tmp_path / "tp"))
    t.append(df, partition_by=["grp"])
    files = t.files_df(spark).collect()
    assert sum(f["record_count"] for f in files) == 10
    assert all(f["content"] == 0 for f in files)
    parts = {json.loads(f["partition"])["grp"] for f in files}
    assert parts == {"g0", "g1"}
    assert all(f["file_size_in_bytes"] > 0 for f in files)
    # file paths resolve on disk
    assert all(os.path.exists(f["file_path"]) for f in files)


def test_files_df_shows_delete_files_after_upsert(spark, tmp_path):
    t = IcebergFsTable(str(tmp_path / "tu"))
    ddl = "id long, grp string, v double"
    t.append(spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], ddl))
    t.upsert(spark.createDataFrame([(2, "b", 20.0)], ddl), ["id"])
    files = t.files_df(spark).collect()
    contents = sorted({f["content"] for f in files})
    assert contents == [0, 2]  # data + equality deletes
    eq = [f for f in files if f["content"] == 2]
    assert all("_deletes" in f["file_path"] for f in eq)


def test_manifests_df_matches_snapshot(spark, tmp_path):
    t, _ = _mk(spark, tmp_path, [(1, "a", 1.0)])
    t.append(spark.createDataFrame([(2, "b", 2.0)], "id long, grp string, v double"))
    snaps = {s["snapshot_id"] for s in t.snapshots_df(spark).collect()}
    mans = t.manifests_df(spark).collect()
    # current snapshot carries its own manifest plus the inherited one
    assert len(mans) == 2
    assert {m["added_snapshot_id"] for m in mans} == snaps
    assert all(m["content"] == 0 for m in mans)
    assert all(m["added_files_count"] >= 1 for m in mans)
    assert all(os.path.exists(m["path"]) for m in mans)


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "concat('r', id) AS s")


def test_refs_main_tracks_commits_and_tags_survive(spark, tmp_path):
    """`main` is a branch ref advanced by every commit; user tags must
    SURVIVE later commits (regression: the commit path used to rewrite
    the whole refs map)."""
    import pytest

    t = IcebergFsTable(str(tmp_path / "t"))
    t.append(_df(spark, 0, 10))
    s1 = t.metadata()["current-snapshot-id"]
    assert t.refs()["main"] == {"snapshot-id": s1, "type": "branch"}

    t.tag("v1")  # pins s1
    t.append(_df(spark, 10, 20))
    s2 = t.metadata()["current-snapshot-id"]
    refs = t.refs()
    assert refs["main"]["snapshot-id"] == s2  # main advanced
    assert refs["v1"] == {"snapshot-id": s1, "type": "tag"}  # tag survived

    # read at the tag = the rows as of s1; read plain = current
    assert t.read(spark, ref="v1").count() == 10
    assert t.read(spark).count() == 20
    # branch ref + refs_df inspection shape
    t.create_branch("audit", snapshot_id=s1)
    rows = {r["name"]: r for r in t.refs_df(spark).collect()}
    assert rows["v1"]["type"] == "tag"
    assert rows["audit"]["type"] == "branch"
    assert rows["main"]["snapshot_id"] == s2

    # refusals
    with pytest.raises(ValueError, match="already exists"):
        t.tag("v1")
    with pytest.raises(ValueError, match="main"):
        t.tag("main")
    with pytest.raises(ValueError, match="main"):
        t.drop_ref("main")
    with pytest.raises(ValueError, match="unknown ref"):
        t.read(spark, ref="nope")
    with pytest.raises(ValueError, match="ref OR"):
        t.read(spark, ref="v1", snapshot_id=s1)


def test_expire_snapshots_protects_refs(spark, tmp_path):
    """A tagged snapshot (and its files) survives expire_snapshots until
    the tag is dropped — the spec's retention rule."""
    t = IcebergFsTable(str(tmp_path / "t"))
    t.append(_df(spark, 0, 5))
    s1 = t.metadata()["current-snapshot-id"]
    t.tag("keepme", snapshot_id=s1)
    t.append(_df(spark, 5, 10))
    t.append(_df(spark, 10, 15))

    deleted = t.expire_snapshots(keep_last=1)
    ids = {s["snapshot-id"] for s in t.snapshots()}
    assert s1 in ids  # protected by the tag
    assert len(ids) == 2  # newest + tagged; the middle one expired
    # the tagged snapshot still READS intact (its files survived)
    assert t.read(spark, ref="keepme").count() == 5
    assert t.read(spark).count() == 15

    t.drop_ref("keepme")
    deleted2 = t.expire_snapshots(keep_last=1)
    ids2 = {s["snapshot-id"] for s in t.snapshots()}
    assert s1 not in ids2 and len(ids2) == 1
    assert deleted2  # the formerly-pinned files are now GC'd
    assert t.read(spark).count() == 15  # current unaffected


def test_sort_order_tightens_bounds_and_prunes_files(spark, tmp_path):
    """A table created with sort_by range-distributes and sorts rows at
    write, so data files carry DISJOINT key ranges — a range_filter
    then plans a strict subset of files, where the same filter on an
    unsorted copy of the same rows must read everything (every file's
    bounds span the whole key range). Also pins the spec metadata shape
    (`sort-orders` + `default-sort-order-id`) and that later appends
    inherit the order."""
    # shuffled keys across many input partitions → without sorting,
    # every output file spans ~the full id range
    df = (
        spark.range(0, 4000)
        .selectExpr("cast(hash(id) % 100000 as long) AS noise", "id")
        .orderBy("noise")
        .repartition(8)
        .selectExpr("id", "concat('r', id) AS s")
    )
    sorted_t = IcebergFsTable(str(tmp_path / "sorted"))
    sorted_t.append(df, sort_by=["id"])
    sorted_t.append(df.selectExpr("id + 4000 AS id", "s"))  # inherits order

    plain_t = IcebergFsTable(str(tmp_path / "plain"))
    plain_t.append(df)
    plain_t.append(df.selectExpr("id + 4000 AS id", "s"))

    md = sorted_t.metadata()
    assert md["default-sort-order-id"] == 1
    [order] = [o for o in md["sort-orders"] if o["order-id"] == 1]
    assert order["fields"][0]["direction"] == "asc"

    flt = {"id": (100, 200)}
    n_sorted_all = len(sorted_t.data_files())
    n_sorted = len(sorted_t.data_files(range_filter=flt))
    n_plain_all = len(plain_t.data_files())
    n_plain = len(plain_t.data_files(range_filter=flt))
    # the second append (ids 4000+) is wholly out of range, so both
    # tables drop that half on bounds alone; within the overlapping
    # half the unsorted files ALL span the filter (shuffled ids) while
    # the sorted files carry disjoint ranges and mostly skip
    assert n_plain == n_plain_all // 2  # unsorted half: nothing skipped
    assert n_sorted < n_plain  # sorted: whole in-range files skipped
    assert n_sorted <= max(2, n_plain // 3)

    # correctness unchanged: the pruned scan returns the exact rows
    got = sorted(
        r["id"]
        for r in sorted_t.read(spark, range_filter=flt)
        .filter("id BETWEEN 100 AND 200")
        .collect()
    )
    assert got == list(range(100, 201))
    # desc + tuple forms parse; unknown column refuses
    import pytest

    t3 = IcebergFsTable(str(tmp_path / "t3"))
    t3.append(df, sort_by=[("id", "desc")])
    assert (
        t3.metadata()["sort-orders"][1]["fields"][0]["null-order"]
        == "nulls-last"
    )
    with pytest.raises(ValueError, match="unknown sort column"):
        IcebergFsTable(str(tmp_path / "t4")).append(df, sort_by=["nope"])


def test_max_records_per_file_property_bounds_files(spark, tmp_path):
    """write.max-records-per-file (set once as a table property) caps
    rows per data file on every LATER write — the giant-partition skew
    mitigation, without touching the writer's code path."""
    t = IcebergFsTable(str(tmp_path / "t"))
    t.append(
        _df(spark, 0, 10).coalesce(1),
        extra_properties={"write.max-records-per-file": 500},
    )
    first_files = len(t.data_files())
    t.append(_df(spark, 10, 2010).coalesce(1))  # 2000 rows, ONE task
    import pyarrow.parquet as pq

    new_files = [p for p in t.data_files()][first_files:]
    rows_per_file = [pq.read_metadata(p).num_rows for p in t.data_files()]
    assert len(t.data_files()) - first_files >= 4  # 2000/500
    assert all(n <= 500 for n in rows_per_file[first_files:] or [0])
    assert t.read(spark).count() == 2010


def test_sort_by_on_existing_table_refused_on_mismatch(spark, tmp_path):
    import pytest

    t = IcebergFsTable(str(tmp_path / "t"))
    t.append(_df(spark, 0, 10), sort_by=["id"])
    # matching order re-stated: fine
    t.append(_df(spark, 10, 20), sort_by=["id"])
    # different order: loud refusal, not a silent no-op
    with pytest.raises(ValueError, match="sort order"):
        t.append(_df(spark, 20, 30), sort_by=["id desc"])
    with pytest.raises(ValueError, match="sort order"):
        t.append(_df(spark, 20, 30), sort_by=["s"])
    # unsorted table + sort_by: also refused (orders are set at creation)
    t2 = IcebergFsTable(str(tmp_path / "t2"))
    t2.append(_df(spark, 0, 10))
    with pytest.raises(ValueError, match="sort order"):
        t2.append(_df(spark, 10, 20), sort_by=["id"])


def test_partitions_df_totals_and_spec_evolution(spark, tmp_path):
    """`partitions` metadata table: per-partition file/row/byte totals
    from manifests alone; mixed-spec tables key rows on (spec_id,
    tuple) so identically-shaped tuples under different specs never
    merge; delete files count separately."""
    from flinkrunner_spark.iceberg import IcebergFsTable

    t = IcebergFsTable(str(tmp_path / "pmeta"))
    df = spark.createDataFrame(
        [(i, f"t{i}", "en" if i % 2 else "de") for i in range(20)],
        "doc_id long, text string, lang string",
    )
    t.append(df, partition_by=["lang"])
    parts = {p["partition"]: p for p in t.partitions_df(spark).collect()}
    assert set(parts) == {'{"lang": "de"}', '{"lang": "en"}'}
    assert parts['{"lang": "en"}']["record_count"] == 10
    assert parts['{"lang": "de"}']["record_count"] == 10
    assert all(p["data_file_count"] >= 1 for p in parts.values())
    assert all(p["total_size_bytes"] > 0 for p in parts.values())
    assert all(p["delete_file_count"] == 0 for p in parts.values())

    # evolve to bucket[4](doc_id): new rows land under spec 1; rows
    # keyed per spec, never merged
    t.evolve_spec(["bucket[4](doc_id)"])
    t.append(
        spark.createDataFrame(
            [(100, "x", "fr")], "doc_id long, text string, lang string"
        )
    )
    rows = t.partitions_df(spark).collect()
    assert {r["spec_id"] for r in rows} == {0, 1}
    assert sum(r["record_count"] for r in rows) == 21

    # a row-level delete shows up as delete files, not fewer records
    n = t.delete_where(spark, "doc_id = 3")
    assert n == 1
    rows2 = t.partitions_df(spark).collect()
    assert sum(r["delete_file_count"] for r in rows2) >= 1
    assert sum(r["record_count"] for r in rows2) == 21  # data rows unchanged


def test_snapshot_summary_statistics(spark, tmp_path):
    """Snapshot summaries carry the spec's statistics (the jar's
    SnapshotSummary): added-* counts only THIS commit's manifests even
    when append/delete commits carry the parent's manifest-list records
    forward; total-records is the raw stored data-row count."""
    import flinkrunner_spark.iceberg as I

    t = I.IcebergFsTable(str(tmp_path / "sm"))
    df1 = spark.createDataFrame(
        [(i, f"x{i}") for i in range(10)], "id long, name string"
    ).coalesce(1)
    t.append(df1)
    s1 = t.snapshots()[-1]["summary"]
    assert s1["operation"] == "append"
    assert s1["added-records"] == "10" and s1["total-records"] == "10"
    assert s1["added-data-files"] == "1" == s1["total-data-files"]

    t.append(df1.selectExpr("id + 100 as id", "name").coalesce(1))
    s2 = t.snapshots()[-1]["summary"]
    # the second append carries the first manifest forward — added-*
    # must NOT double-count it
    assert s2["added-records"] == "10" and s2["total-records"] == "20"
    assert s2["added-data-files"] == "1" and s2["total-data-files"] == "2"

    n = t.delete_where(spark, "id = 3")
    assert n == 1
    s3 = t.snapshots()[-1]["summary"]
    assert s3["operation"] == "delete"
    assert s3["added-data-files"] == "0" and s3["added-records"] == "0"
    assert int(s3["added-delete-files"]) >= 1
    assert int(s3["total-delete-files"]) >= 1
    # raw stored rows unchanged by a position delete (spec convention)
    assert s3["total-records"] == "20"

    t.compact(spark)
    s4 = t.snapshots()[-1]["summary"]
    assert s4["operation"] == "replace"
    # the rewrite materialized the post-delete state
    assert s4["total-records"] == "19"
    assert s4["total-delete-files"] == "0"
