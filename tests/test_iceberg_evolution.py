"""Full column-level schema evolution (rename / drop / type widening —
spec §Schema Evolution, field-id resolution) and the CDC changelog scan
(the iceberg-spark runtime's create_changelog_view / Flink changelog
read), both jar-free. Reference scope: the table-level operations a
long-lived Iceberg deployment of `model/sink/IcebergSinkConfig.scala`
tables needs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flinkrunner_spark.iceberg import IcebergFsTable


def _mk(spark, loc, rows=None):
    t = IcebergFsTable(loc)
    df = spark.createDataFrame(
        rows or [(1, 10, 1.5, "a"), (2, 20, 2.5, "b"), (3, 30, 3.5, "c")],
        "id long, v int, w float, s string",
    )
    t.append(df)
    return t


# -- rename ------------------------------------------------------------------


def test_rename_reads_old_files_under_new_name(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.rename_column("v", "val")
    got = {r["id"]: r["val"] for r in t.read(spark).collect()}
    assert got == {1: 10, 2: 20, 3: 30}
    assert "v" not in t.read(spark).columns


def test_rename_mixed_old_new_files(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.rename_column("v", "val")
    t.append(spark.createDataFrame(
        [(4, 40, 4.5, "d")], "id long, val int, w float, s string"
    ))
    got = {r["id"]: r["val"] for r in t.read(spark).collect()}
    assert got == {1: 10, 2: 20, 3: 30, 4: 40}


def test_rename_time_travel_keeps_old_name(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    s1 = t.snapshots()[0]["snapshot-id"]
    t.rename_column("v", "val")
    old = t.read(spark, snapshot_id=s1)
    assert "v" in old.columns and "val" not in old.columns
    assert {r["v"] for r in old.collect()} == {10, 20, 30}


def test_rename_range_filter_pruning_survives(spark, tmp_path):
    # bounds are keyed by FIELD ID in manifests — pruning must keep
    # working when the filter names the post-rename column
    t = IcebergFsTable(str(tmp_path / "t"))
    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 2).cast("int").alias("v")
    ).repartitionByRange(4, "v")
    t.append(df)
    t.rename_column("v", "val")
    all_files = t.data_files()
    pruned = t.data_files(range_filter={"val": (0, 10)})
    assert len(pruned) < len(all_files)
    got = t.read(spark, range_filter={"val": (0, 10)}).filter(
        "val between 0 and 10"
    )
    assert got.count() == 6


def test_rename_upsert_key_column_merge_still_exact(spark, tmp_path):
    # equality-delete FILES store the old key name; merge-on-read must
    # resolve them by field id after the rename
    t = IcebergFsTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, s string"
    )
    t.upsert(df, ["k"])
    t.upsert(spark.createDataFrame([(2, "B")], "k long, s string"), ["k"])
    t.rename_column("k", "key")
    got = {r["key"]: r["s"] for r in t.read(spark).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}
    # and upserts continue under the new name (ids are stable)
    t.upsert(spark.createDataFrame([(3, "C")], "key long, s string"), ["key"])
    got = {r["key"]: r["s"] for r in t.read(spark).collect()}
    assert got == {1: "a", 2: "B", 3: "C"}


def test_rename_refusals(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("v", "s")
    with pytest.raises(ValueError, match="no column"):
        t.rename_column("nope", "x")
    t.rename_column("v", "val")
    # the RETIRED name belongs to val's field id forever — rebinding it
    # to a new field would make old files ambiguous
    with pytest.raises(ValueError, match="earlier schema version"):
        t.add_column("v", "int")
    with pytest.raises(ValueError, match="earlier schema version"):
        t.rename_column("s", "v")
    # renaming BACK to its own old name is legal (same field id)
    t.rename_column("val", "v")
    assert {r["v"] for r in t.read(spark).collect()} == {10, 20, 30}


def test_rename_partition_source_refused(spark, tmp_path):
    t = IcebergFsTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(1, "x", "a"), (2, "y", "b")], "id long, p string, s string"
    )
    t.append(df, partition_by=["p"])
    with pytest.raises(ValueError, match="partition field"):
        t.rename_column("p", "part")
    t.rename_column("s", "txt")  # non-source renames fine
    assert {r["txt"] for r in t.read(spark).collect()} == {"a", "b"}


def test_rename_blocks_jar_free_streaming(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.rename_column("v", "val")
    with pytest.raises(ValueError, match="RENAMED"):
        t.read_stream(spark)


# -- drop --------------------------------------------------------------------


def test_drop_column_hides_and_time_travel_restores(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    s1 = t.snapshots()[0]["snapshot-id"]
    t.drop_column("s")
    assert "s" not in t.read(spark).columns
    assert t.read(spark).count() == 3
    assert "s" in t.read(spark, snapshot_id=s1).columns
    # the dropped NAME stays retired (old files still carry it)
    with pytest.raises(ValueError, match="earlier schema version"):
        t.add_column("s", "string")
    t.add_column("s2", "string")  # fresh names fine
    assert [r["s2"] for r in t.read(spark).collect()] == [None] * 3


def test_drop_refusals(spark, tmp_path):
    t = IcebergFsTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(1, "x", "a"), (2, "y", "b")], "id long, p string, s string"
    )
    t.append(df, partition_by=["p"], sort_by=["id"])
    with pytest.raises(ValueError, match="partition field"):
        t.drop_column("p")
    with pytest.raises(ValueError, match="sort-order source"):
        t.drop_column("id")
    t2 = IcebergFsTable(str(tmp_path / "t2"))
    t2.upsert(
        spark.createDataFrame([(1, "a")], "k long, s string"), ["k"]
    )
    t2.upsert(
        spark.createDataFrame([(1, "A")], "k long, s string"), ["k"]
    )
    with pytest.raises(ValueError, match="equality-delete"):
        t2.drop_column("k")
    t3 = IcebergFsTable(str(tmp_path / "t3"))
    t3.append(spark.createDataFrame([(1,)], "id long"))
    with pytest.raises(ValueError, match="only column"):
        t3.drop_column("id")


# -- type widening -----------------------------------------------------------


def test_widen_int_to_long_and_float_to_double(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.update_column_type("v", "long")
    t.update_column_type("w", "double")
    got = t.read(spark)
    types = dict(got.dtypes)
    assert types["v"] == "bigint" and types["w"] == "double"
    rows = {r["id"]: (r["v"], r["w"]) for r in got.collect()}
    assert rows[1] == (10, 1.5) and rows[3] == (30, 3.5)
    # writes under the widened schema mix with old int32/float files
    t.append(spark.createDataFrame(
        [(4, 2**40, 4.5, "d")], "id long, v long, w double, s string"
    ))
    rows = {r["id"]: r["v"] for r in t.read(spark).collect()}
    assert rows[4] == 2**40 and rows[1] == 10


def test_widen_refusals(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="unsupported type promotion"):
        t.update_column_type("id", "int")  # narrowing
    with pytest.raises(ValueError, match="unsupported type promotion"):
        t.update_column_type("s", "long")
    tp = IcebergFsTable(str(tmp_path / "tp"))
    tp.append(
        spark.createDataFrame([(1, 2)], "id long, b int"),
        partition_by=["bucket[4](b)"],
    )
    with pytest.raises(ValueError, match="partition field"):
        tp.update_column_type("b", "long")


def test_combined_evolution_stack(spark, tmp_path):
    # rename + widen + add + drop in sequence, old and new files mixed
    t = _mk(spark, str(tmp_path / "t"))
    t.rename_column("v", "val")
    t.update_column_type("val", "long")
    t.add_column("extra", "string")
    t.append(spark.createDataFrame(
        [(4, 40, 4.5, "d", "X")],
        "id long, val long, w float, s string, extra string",
    ))
    t.drop_column("s")
    got = t.read(spark)
    assert set(got.columns) == {"id", "val", "w", "extra"}
    rows = {r["id"]: (r["val"], r["extra"]) for r in got.collect()}
    assert rows == {1: (10, None), 2: (20, None), 3: (30, None),
                    4: (40, "X")}


# -- changelog ---------------------------------------------------------------


def test_changelog_append_only(spark, tmp_path):
    t = IcebergFsTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, "a")], "id long, s string"))
    t.append(spark.createDataFrame([(2, "b")], "id long, s string"))
    cl = t.read_changelog(spark)
    rows = sorted(
        (r["id"], r["_change_type"], r["_commit_order"])
        for r in cl.collect()
    )
    assert rows == [(1, "insert", 1), (2, "insert", 2)]


def test_changelog_upsert_emits_delete_then_insert(spark, tmp_path):
    t = IcebergFsTable(str(tmp_path / "t"))
    t.upsert(spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, s string"), ["k"])
    t.upsert(spark.createDataFrame([(2, "B")], "k long, s string"), ["k"])
    rows = sorted(
        (r["k"], r["s"], r["_change_type"], r["_commit_order"])
        for r in t.read_changelog(spark).collect()
    )
    assert rows == sorted([
        (1, "a", "insert", 1),
        (2, "b", "insert", 1),
        (2, "b", "delete", 2),
        (2, "B", "insert", 2),
    ])


def test_changelog_position_delete_reads_only_targets(spark, tmp_path):
    t = IcebergFsTable(str(tmp_path / "t"))
    df = spark.createDataFrame(
        [(i, f"s{i}") for i in range(10)], "id long, s string"
    ).repartition(4)
    t.append(df)
    t.delete_where(spark, "id in (3, 7)")
    rows = sorted(
        (r["id"], r["_change_type"])
        for r in t.read_changelog(spark).collect()
        if r["_change_type"] == "delete"
    )
    assert rows == [(3, "delete"), (7, "delete")]


def test_changelog_overwrite_full_diff(spark, tmp_path):
    t = IcebergFsTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string"))
    t.overwrite(spark.createDataFrame([(9, "z")], "id long, s string"))
    rows = sorted(
        (r["id"], r["_change_type"], r["_commit_order"])
        for r in t.read_changelog(spark).collect()
    )
    assert rows == sorted([
        (1, "insert", 1), (1, "delete", 2),
        (2, "insert", 1), (2, "delete", 2),
        (9, "insert", 2),
    ])


def test_changelog_replace_is_silent_and_range_bounds(spark, tmp_path):
    t = IcebergFsTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame([(1, "a")], "id long, s string"))
    s1 = t.metadata()["current-snapshot-id"]
    t.append(spark.createDataFrame([(2, "b")], "id long, s string"))
    s2 = t.metadata()["current-snapshot-id"]
    t.compact(spark)
    # compaction emits nothing; full scan = two inserts
    rows = sorted(
        (r["id"], r["_change_type"]) for r in t.read_changelog(spark).collect()
    )
    assert rows == [(1, "insert"), (2, "insert")]
    # (s1, s2] = just the second append
    rng = t.read_changelog(spark, from_snapshot_id=s1, to_snapshot_id=s2)
    assert [(r["id"], r["_change_type"]) for r in rng.collect()] == [
        (2, "insert")
    ]
    with pytest.raises(ValueError, match="unknown snapshot"):
        t.read_changelog(spark, from_snapshot_id=12345)


def test_changelog_resolves_under_current_schema(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.upsert = None  # guard against accidental use below
    t.rename_column("v", "val")
    t.update_column_type("val", "long")
    cl = t.read_changelog(spark)
    assert "val" in cl.columns and "v" not in cl.columns
    assert dict(cl.dtypes)["val"] == "bigint"
    assert {r["val"] for r in cl.collect()} == {10, 20, 30}


def test_changelog_replays_to_final_state(spark, tmp_path):
    # inserts minus deletes (multiset) must equal the final table read —
    # the invariant any CDC consumer relies on
    t = IcebergFsTable(str(tmp_path / "t"))
    docs = spark.createDataFrame(
        [(i, f"d{i}", i % 3) for i in range(30)],
        "id long, s string, g int",
    )
    t.upsert(docs, ["id"])
    t.upsert(spark.createDataFrame(
        [(i, f"D{i}", 9) for i in range(0, 30, 5)],
        "id long, s string, g int"), ["id"])
    t.delete_where(spark, "g = 1")
    cl = t.read_changelog(spark)
    ins = cl.filter("_change_type = 'insert'").groupBy("id", "s", "g").count()
    dels = cl.filter("_change_type = 'delete'").groupBy("id", "s", "g").count()
    net = (
        ins.withColumnRenamed("count", "n_ins")
        .join(dels.withColumnRenamed("count", "n_del"), ["id", "s", "g"],
              "full_outer")
        .fillna(0, ["n_ins", "n_del"])
        .filter("n_ins - n_del > 0")
        .select("id", "s", "g")
    )
    final = t.read(spark).select("id", "s", "g")
    assert net.exceptAll(final).count() == 0
    assert final.exceptAll(net).count() == 0


def test_changelog_model_based_random_sequences(spark, tmp_path):
    """Model check: for ANY commit sequence (append / key-unique upsert /
    delete_where / compact), replaying the changelog (multiset inserts
    minus deletes) must equal the final table read — the invariant every
    CDC consumer materializing a downstream copy relies on. Deterministic
    seeds, three independent sequences."""
    import random

    from flinkrunner_spark.iceberg import IcebergFsTable

    for seed in (5, 23, 77):
        rng = random.Random(seed)
        t = IcebergFsTable(str(tmp_path / f"cl{seed}"))
        next_id = 0
        for _step in range(5):
            op = rng.choice(["append", "upsert", "delete", "compact"])
            if op == "append" or not t.exists():
                rows = [
                    (next_id + i, f"a{seed}-{_step}-{i}", rng.randint(0, 99))
                    for i in range(rng.randint(1, 5))
                ]
                next_id += len(rows)
                t.append(spark.createDataFrame(
                    rows, "id long, s string, v long"))
            elif op == "upsert":
                ids = rng.sample(range(next_id), min(3, next_id))
                t.upsert(spark.createDataFrame(
                    [(i, f"u{seed}-{_step}-{i}", rng.randint(0, 99))
                     for i in ids],
                    "id long, s string, v long"), ["id"])
            elif op == "delete":
                t.delete_where(spark, f"v < {rng.randint(5, 40)}")
            else:
                t.compact(spark)
        cl = t.read_changelog(spark)
        ins = [
            tuple(r)[:3]
            for r in cl.filter("_change_type = 'insert'").collect()
        ]
        dels = [
            tuple(r)[:3]
            for r in cl.filter("_change_type = 'delete'").collect()
        ]
        from collections import Counter

        net = Counter(ins)
        net.subtract(Counter(dels))
        assert all(v in (0, 1) for v in net.values()), f"seed {seed}"
        replayed = sorted(k for k, v in net.items() if v == 1)
        final = sorted(tuple(r) for r in t.read(spark).collect())
        assert replayed == final, f"seed {seed}"


def test_changelog_net_changes_collapses_intermediates(spark, tmp_path):
    # insert->replace->replace collapses to one delete + one insert;
    # insert->delete inside the range collapses to NOTHING
    t = IcebergFsTable(str(tmp_path / "t"))
    t.upsert(spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, s string"), ["id"])
    s1 = t.metadata()["current-snapshot-id"]
    t.upsert(spark.createDataFrame([(2, "B")], "id long, s string"), ["id"])
    t.upsert(spark.createDataFrame([(2, "BB")], "id long, s string"), ["id"])
    t.append(spark.createDataFrame([(3, "c")], "id long, s string"))
    t.delete_where(spark, "id = 3")  # churn that must vanish from net
    net = t.read_changelog(spark, from_snapshot_id=s1, net_changes=True)
    rows = sorted((r["id"], r["s"], r["_change_type"]) for r in net.collect())
    # s1's state held (2,'b'); the intermediate (2,'B') and the
    # insert+delete churn of id=3 vanish — only the endpoint diff emits
    assert rows == sorted([(2, "b", "delete"), (2, "BB", "insert")])
    assert "_commit_order" not in net.columns


def test_changelog_net_matches_replayed_full_changelog(spark, tmp_path):
    from collections import Counter

    t = IcebergFsTable(str(tmp_path / "t"))
    t.append(spark.createDataFrame(
        [(i, f"s{i}") for i in range(10)], "id long, s string"))
    t.upsert(spark.createDataFrame(
        [(i, f"S{i}") for i in range(0, 10, 2)], "id long, s string"),
        ["id"])
    t.delete_where(spark, "id >= 8")
    full = t.read_changelog(spark)
    net = t.read_changelog(spark, net_changes=True)

    def _net(rows):
        c = Counter()
        for r in rows:
            k = (r["id"], r["s"])
            c[k] += 1 if r["_change_type"] == "insert" else -1
        return {k: v for k, v in c.items() if v != 0}

    assert _net(net.collect()) == _net(full.collect())
    # and the net view replays to the final state
    final = Counter(
        (r["id"], r["s"]) for r in t.read(spark).collect()
    )
    assert {k: v for k, v in _net(net.collect()).items() if v > 0} == dict(
        final
    )
