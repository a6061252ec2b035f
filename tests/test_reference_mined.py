"""Regression tests mined from reference test dirs the earlier rounds
had not covered: time_travel/, cleanup/, checkpoint/, concurrent/,
types/{floats,null_byte,timestamp,unsupported}.

Each test cites the reference .test file it ports; semantics are
re-expressed over the lake API (no SQL shell here).
"""

from __future__ import annotations

import glob as g
import os

import pytest

import conftest

from pyspark.sql import functions as F


@pytest.fixture()
def lake(spark, tmp_path):
    from ducklake_spark.lake import DuckLake

    return DuckLake.attach(
        spark, conftest.catalog_url(tmp_path), str(tmp_path / "data")
    )


# -- time_travel/basic_time_travel.test ---------------------------------

def test_dropped_table_readable_at_old_version(lake, spark):
    lake.create_table("t", [("i", "int32")])
    lake.insert("t", spark.createDataFrame([(1,), (2,)], "i int"))
    s = lake.current_snapshot()
    lake.drop_table("t")
    from ducklake_spark.lake import DuckLakeError

    with pytest.raises(DuckLakeError):
        lake.table("t")
    assert sorted(r.i for r in lake.table("t", at_version=s).collect()) == [1, 2]


def test_nonexistent_version_errors(lake, spark):
    lake.create_table("t", [("i", "int32")])
    with pytest.raises(Exception, match="version"):
        lake.table("t", at_version=999)


def test_drop_schema_cascade_time_travel(lake, spark):
    from ducklake_spark.lake import DuckLakeError

    lake.create_schema("s1")
    lake.create_table("s1.tbl", [("i", "int32")])
    lake.insert("s1.tbl", spark.createDataFrame([(42,)], "i int"))
    s = lake.current_snapshot()
    with pytest.raises(DuckLakeError, match="not empty"):
        lake.drop_schema("s1")
    lake.drop_schema("s1", cascade=True)
    with pytest.raises(DuckLakeError):
        lake.table("s1.tbl")
    assert lake.table("s1.tbl", at_version=s).collect()[0].i == 42
    # name is reusable afterwards
    lake.create_schema("s1")
    lake.create_table("s1.t2", [("i", "int32")])


# -- time_travel/time_travel_views.test ---------------------------------

def test_view_time_travel_and_drop(lake, spark):
    from ducklake_spark.lake import DuckLakeError

    lake.create_table("base", [("i", "int32")])
    lake.create_view("v1", "SELECT i * 100 AS i FROM base")
    v_empty = lake.current_snapshot()
    lake.insert("base", spark.createDataFrame([(1,), (2,)], "i int"))
    v_two = lake.current_snapshot()
    assert sorted(r.i for r in lake.view("v1").collect()) == [100, 200]
    assert lake.view("v1", at_version=v_empty).count() == 0
    lake.drop_view("v1")
    with pytest.raises(DuckLakeError):
        lake.view("v1")
    assert sorted(r.i for r in lake.view("v1", at_version=v_two).collect()) == [100, 200]


# -- checkpoint/many_inserts_transaction.test ---------------------------

def test_create_insert_in_one_transaction(lake, spark):
    with lake.transaction():
        lake.create_table("integers", [("i", "int32")])
        lake.insert("integers",
                    spark.createDataFrame([(1,)] * 10, "i int"))
        lake.insert("integers", spark.createDataFrame([(1,)], "i int"))
        lake.insert("integers", spark.createDataFrame([(2,)], "i int"))
        lake.insert("integers", spark.createDataFrame([(3,)], "i int"))
        # visible inside the txn
        assert lake.table("integers").count() == 13
    lake.checkpoint()
    row = lake.table("integers").agg(
        F.min("i").alias("mn"), F.max("i").alias("mx"),
        F.count("*").alias("c"), F.count("i").alias("ci")).collect()[0]
    assert (row.mn, row.mx, row.c, row.ci) == (1, 3, 13, 13)


# -- cleanup/create_drop_cleanup.test -----------------------------------

def test_txn_local_create_drop_cleans_files(lake, spark, tmp_path):
    with lake.transaction():
        lake.create_table("tbl", [("i", "int32")])
        lake.insert("tbl", spark.createDataFrame([(42,)], "i int"))
        files_mid = g.glob(str(tmp_path / "data" / "main" / "tbl" / "*.parquet"))
        assert len(files_mid) == 1  # empty part files are never kept
        lake.drop_table("tbl")
        assert g.glob(str(tmp_path / "data" / "main" / "tbl" / "*.parquet")) == []
    # nothing committed
    from ducklake_spark.lake import DuckLakeError

    with pytest.raises(DuckLakeError):
        lake.table("tbl")
    assert lake.meta.query(
        "SELECT COUNT(*) FROM ducklake_table WHERE table_name='tbl'")[0][0] == 0


# -- cleanup/drop_table_cleans_delete_files.test ------------------------

def test_txn_local_dml_then_drop(lake, spark, tmp_path):
    with lake.transaction():
        lake.create_table("tbl", [("id", "int64")])
        lake.insert("tbl", spark.range(100))
        assert lake.delete("tbl", "id % 2 = 0") == 50
        assert lake.table("tbl").count() == 50
        assert lake.update("tbl", {"id": "id + 1000"}, "id = 1") == 1
        lake.drop_table("tbl")
        assert g.glob(str(tmp_path / "data" / "main" / "tbl" / "*.parquet")) == []
    assert lake.meta.query(
        "SELECT COUNT(*) FROM ducklake_data_file")[0][0] == 0


# -- cleanup/cleanup_old_files.test -------------------------------------

def test_cleanup_old_files_end_to_end(lake, spark):
    lake.create_table("t", [("x", "int32")])
    lake.insert("t", spark.createDataFrame([(1,), (2,), (3,)], "x int"))
    lake.insert("t", spark.createDataFrame([(4,), (5,)], "x int"))
    lake.delete("t", "x <= 2")
    lake.insert("t", spark.createDataFrame([(6,), (7,)], "x int"))
    lake.rewrite_data_files(table="t", delete_threshold=0.001)
    lake.merge_adjacent_files()
    lake.expire_snapshots(versions=list(range(0, lake.current_snapshot())))
    doomed = lake.cleanup_old_files(cleanup_all=True, dry_run=True)
    assert len(doomed) > 0
    lake.cleanup_old_files(cleanup_all=True)
    assert lake.cleanup_old_files(cleanup_all=True, dry_run=True) == []
    assert sorted(r.x for r in lake.table("t").collect()) == [3, 4, 5, 6, 7]


# -- types/floats.test --------------------------------------------------

@pytest.mark.parametrize("ftype,stype", [("float32", "float"),
                                         ("float64", "double")])
def test_float_nan_inf_predicates(lake, spark, ftype, stype):
    lake.create_table("f", [("f", ftype)])
    lake.insert("f", spark.createDataFrame([(1.0,), (10.0,)], f"f {stype}"))
    lake.insert("f", spark.createDataFrame(
        [(float("nan"),), (1.0,)], f"f {stype}"))
    lake.insert("f", spark.createDataFrame(
        [(float("inf"),), (float("-inf"),)], f"f {stype}"))
    # NaN orders greatest in both DuckDB and Spark; file pruning must
    # keep NaN files for upper-bound predicates (NaN-aware zone maps)
    for pred, want in [
        ("f = double('NaN')", 1), ("f > double('NaN')", 0),
        ("f >= double('NaN')", 1), ("f < double('NaN')", 5),
        ("f <= double('NaN')", 6), ("f > 1", 3),
        ("f > double('Infinity')", 1), ("f >= double('Infinity')", 2),
        ("f < double('Infinity')", 4), ("f > double('-Infinity')", 5),
        ("f >= double('-Infinity')", 6),
    ]:
        assert lake.table("f", where=pred).filter(pred).count() == want, pred


# -- types/null_byte.test -----------------------------------------------

def test_null_byte_strings(lake, spark):
    lake.create_table("nb", [("s", "varchar")])
    lake.insert("nb", spark.createDataFrame(
        [("goo\x00se",), ("hello",)], "s string"))
    got = sorted(r.s for r in lake.table("nb").collect())
    assert got == ["goo\x00se", "hello"]
    assert lake.table("nb", where="s < 'hello'").filter(
        "s < 'hello'").collect()[0].s == "goo\x00se"


# -- types/timestamp.test (finite range; Spark has no ±infinity ts) -----

def test_timestamp_predicates_across_files(lake, spark):
    lake.create_table("ts", [("ts", "timestamp")])
    lake.insert("ts", spark.sql(
        "SELECT * FROM VALUES (TIMESTAMP_NTZ '1992-01-01 00:00:00'), "
        "(TIMESTAMP_NTZ '2020-01-01 00:00:00') AS t(ts)"))
    lake.insert("ts", spark.sql(
        "SELECT TIMESTAMP_NTZ '2022-01-01 00:00:00' AS ts"))
    assert lake.table("ts", where="ts > TIMESTAMP_NTZ '2019-01-01'").filter(
        "ts > TIMESTAMP_NTZ '2019-01-01'").count() == 2
    assert lake.table("ts", where="ts = TIMESTAMP_NTZ '1992-01-01'").filter(
        "ts = TIMESTAMP_NTZ '1992-01-01'").count() == 1


# -- types/unsupported.test ---------------------------------------------

def test_unsupported_types_rejected(lake):
    from ducklake_spark.catalog.types import UnsupportedTypeError

    for bad in ("enum('world','hello')", "union(i int32, j int32)",
                "int32[3]", "varchar collate noaccent", "struct<>"):
        with pytest.raises(UnsupportedTypeError):
            lake.create_table("bad", [("c", bad)])


def test_declared_type_names_round_trip(lake, spark):
    """Every reference-declared simple type name resolves to a Spark
    type and survives create_table (ducklake_types.cpp:17-49 incl.
    time_ns / timetz added for attach parity)."""
    from ducklake_spark.catalog.types import ducklake_to_spark

    names = [
        "boolean", "int8", "int16", "int32", "int64", "int128",
        "uint8", "uint16", "uint32", "uint64", "uint128",
        "float32", "float64", "date", "time", "time_ns", "timetz",
        "timestamp", "timestamp_us", "timestamp_ms", "timestamp_ns",
        "timestamp_s", "timestamptz", "timestamptz_ns", "varchar",
        "blob", "uuid", "json", "variant", "geometry", "interval",
        "decimal(12,3)",
    ]
    for n in names:
        ducklake_to_spark(n)  # must not raise
    lake.create_table("allt", [(f"c{i}", n) for i, n in enumerate(names)])
    h = lake._handle("allt")
    assert [c[2] for c in h.columns] == names


# -- concurrent/concurrent_catalog_id_false_conflict.test ---------------

def test_concurrent_table_creation_no_false_conflict(spark, tmp_path):
    from ducklake_spark.lake import DuckLake

    url = conftest.catalog_url(tmp_path)
    lake1 = DuckLake.attach(spark, url, str(tmp_path / "data"))
    lake1.create_table("seed", [("x", "int32")])
    lake1.insert("seed", spark.createDataFrame([(1,)], "x int"))
    lake2 = DuckLake.attach(spark, url, str(tmp_path / "data"))

    # both sessions create a different table from the same base snapshot
    with lake1.transaction():
        lake1.create_table("tmp_a", [("x", "int32")])
        lake1.insert("tmp_a", spark.createDataFrame([(1,)], "x int"))
    lake1.drop_table("tmp_a")
    with lake2.transaction():
        lake2.create_table("tmp_b", [("x", "int32")])
        lake2.insert("tmp_b", spark.createDataFrame([(2,)], "x int"))
    assert lake2.table("tmp_b").count() == 1


# -- virtualcolumns/ducklake_snapshot_id.test ---------------------------

def test_snapshot_id_virtual_column_lifecycle(lake, spark):
    lake.create_table("t", [("i", "int32")])
    for v in (1, 2, 3, None):
        lake.insert("t", spark.createDataFrame([(v,)], "i int"))
    committed = {
        r.i: r.snapshot_id
        for r in lake.table("t", with_virtual=True).collect()
    }
    assert sorted(committed.values()) == [2, 3, 4, 5]
    with lake.transaction():
        lake.insert("t", spark.createDataFrame([(10,), (11,)], "i int"))
        rows = lake.table("t", with_virtual=True).collect()
        assert len(rows) == 6
        # uncommitted rows read snapshot_id NULL, committed keep theirs
        by_i = {r.i: r.snapshot_id for r in rows}
        assert by_i[10] is None and by_i[11] is None
        assert by_i[1] == 2
    after = {r.i: r.snapshot_id
             for r in lake.table("t", with_virtual=True).collect()}
    assert after[10] == after[11] == 6
    assert [r.i for r in lake.table("t", with_virtual=True)
            .filter("snapshot_id = 4").collect()] == [3]


# -- rowid/ducklake_row_id_update.test ----------------------------------

def test_rowid_preserved_through_partitioned_merge(lake, spark):
    lake.create_table("t", [("i", "int32"), ("j", "int32")])
    lake.set_partitioned_by("t", [("i", "identity")])
    lake.insert("t", spark.createDataFrame([(1, 5), (2, 5)], "i int, j int"))
    src = spark.createDataFrame([(1, 5)], "i int, j int")
    lake.merge("t", src, on=["j"],
               when_matched_update={"i": None, "j": None},
               when_not_matched_insert=False)
    got = [(r.rowid, r.i, r.j) for r in
           lake.table("t", with_virtual=True).orderBy("rowid").collect()]
    assert got == [(0, 1, 5), (1, 1, 5)]


# -- round-4 self-review regressions ------------------------------------

def test_adopted_absolute_path_scan_and_delete(lake, spark, tmp_path):
    """Adopted files outside data_path keep working through the scan
    metadata join and DML (absolute catalog paths vs URI prefix)."""
    foreign = tmp_path / "elsewhere"
    foreign.mkdir()
    spark.range(10).withColumnRenamed("id", "i").coalesce(1).write.mode(
        "overwrite").parquet(str(foreign / "batch"))
    lake.create_table("adopt", [("i", "int64")])
    assert lake.add_data_files("adopt", str(foreign / "batch" / "*.parquet")) == 1
    rows = lake.table("adopt", with_virtual=True).collect()
    assert len(rows) == 10
    assert all(r.rowid is not None and r.snapshot_id is not None for r in rows)
    assert lake.delete("adopt", "i < 3") == 3
    assert lake.table("adopt").count() == 7


def test_merge_in_open_txn_guarded(lake, spark):
    from ducklake_spark.lake import DuckLakeError

    lake.create_table("t", [("k", "int64"), ("v", "int64")])
    lake.insert("t", spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"))
    src = spark.createDataFrame([(1, 99)], "k long, v long")
    with lake.transaction():
        lake.insert("t", spark.createDataFrame([(3, 30)], "k long, v long"))
        with pytest.raises(DuckLakeError, match="open transaction"):
            lake.merge("t", src, on=["k"],
                       when_matched_update={"v": None},
                       when_not_matched_insert=False)
    # untouched txn: merge inside an open txn is fine
    with lake.transaction():
        out = lake.merge("t", src, on=["k"],
                         when_matched_update={"v": None},
                         when_not_matched_insert=False)
    assert out["updated"] == 1
    got = {r.k: r.v for r in lake.table("t").collect()}
    assert got == {1: 99, 2: 20, 3: 30}


def test_txn_local_create_drop_commits_nothing(lake, spark):
    s0 = lake.current_snapshot()
    with lake.transaction():
        lake.create_table("ghost", [("i", "int32")])
        lake.insert("ghost", spark.createDataFrame([(1,)], "i int"))
        lake.drop_table("ghost")
    assert lake.current_snapshot() == s0  # no phantom snapshot


def test_ctas_changes_feed_carries_real_table_id(lake, spark):
    lake.create_table_as("c1", spark.range(3).withColumnRenamed("id", "i"))
    h = lake._handle("c1")
    (changes,) = lake.meta.query(
        "SELECT changes_made FROM ducklake_snapshot_changes "
        "ORDER BY snapshot_id DESC LIMIT 1")[0]
    assert f"inserted_into_table:{h.table_id}" in changes
    assert ":-1" not in changes and "main.c1" not in changes


def test_sql_views_not_stale_across_lakes(spark, tmp_path):
    from ducklake_spark.lake import DuckLake

    a = DuckLake.attach(spark, str(tmp_path / "a.db"), str(tmp_path / "da"))
    b = DuckLake.attach(spark, str(tmp_path / "b.db"), str(tmp_path / "db"))
    a.create_table("t", [("i", "int32")])
    a.insert("t", spark.createDataFrame([(1,)], "i int"))
    b.create_table("t", [("i", "int32")])
    b.insert("t", spark.createDataFrame([(2,), (3,)], "i int"))
    assert a.sql("SELECT count(*) AS c FROM t").collect()[0].c == 1
    assert b.sql("SELECT count(*) AS c FROM t").collect()[0].c == 2
    assert a.sql("SELECT count(*) AS c FROM t").collect()[0].c == 1


# -- attach/different_paths.test ----------------------------------------

def test_reattach_different_data_path_rejected(spark, tmp_path):
    from ducklake_spark.lake import DuckLake, DuckLakeError

    url = conftest.catalog_url(tmp_path)
    a = DuckLake.attach(spark, url, str(tmp_path / "some"))
    a.create_table("t", [("a", "int64")])
    a.insert("t", spark.range(10).withColumnRenamed("id", "a"))
    with pytest.raises(DuckLakeError, match="does not match existing"):
        DuckLake.attach(spark, url, str(tmp_path / "other_path"))
    b = DuckLake.attach(spark, url, str(tmp_path / "other_path"),
                        override_data_path=True)
    assert b.data_path.rstrip("/").endswith("other_path")
    # reads against the overridden (empty) path fail, like the reference
    with pytest.raises(Exception):
        b.table("t").collect()
    # same-path reattach still fine (after restoring)
    c = DuckLake.attach(spark, url, str(tmp_path / "some"),
                        override_data_path=True)
    assert c.table("t").count() == 10


# -- transaction/transaction_conflict_cleanup.test ----------------------

def test_conflicted_commit_cleans_buffered_files(spark, tmp_path):
    """A conflicted COMMIT leaves no orphan parquet behind: the loser's
    buffered files are physically removed."""
    from ducklake_spark.lake import DuckLake
    from ducklake_spark.catalog.metadata import ConflictError

    url = conftest.catalog_url(tmp_path)
    l1 = DuckLake.attach(spark, url, str(tmp_path / "data"))
    l2 = DuckLake.attach(spark, url, str(tmp_path / "data"))
    ctx1 = l1.transaction().__enter__()
    l1.create_table("test", [("i", "int32")])
    ctx2 = l2.transaction().__enter__()
    l2.create_table("test", [("s", "varchar")])
    l2.insert("test", spark.createDataFrame([("hello",), ("world",)],
                                            "s string"))
    # loser's txn-local file(s) are on disk pre-commit
    assert len(g.glob(str(tmp_path / "data" / "**" / "*.parquet"),
                      recursive=True)) >= 1
    ctx1.__exit__(None, None, None)  # con1 commits first
    with pytest.raises(ConflictError):
        ctx2.__exit__(None, None, None)
    # cleaned up after the conflict
    assert g.glob(str(tmp_path / "data" / "**" / "*.parquet"),
                  recursive=True) == []
    # and explicit rollback cleans too
    with pytest.raises(RuntimeError):
        with l2.transaction():
            l2.insert("test", spark.createDataFrame([(1,)], "i int"))
            assert len(g.glob(str(tmp_path / "data" / "**" / "*.parquet"),
                              recursive=True)) >= 1
            raise RuntimeError("abort")
    assert g.glob(str(tmp_path / "data" / "**" / "*.parquet"),
                  recursive=True) == []
    assert l1.table("test").count() == 0


def test_cleanup_defaults_use_delete_older_than(lake, spark):
    """cleanup_old_files()/delete_orphaned_files() with no args use the
    delete_older_than option ('2 days' default) — freshly tombstoned
    files survive, aged ones are collected once the option shrinks."""
    lake.create_table("t", [("i", "int32")])
    lake.insert("t", spark.createDataFrame([(1,), (2,)], "i int"))
    lake.insert("t", spark.createDataFrame([(3,)], "i int"))
    lake.merge_adjacent_files()
    lake.expire_snapshots(versions=list(range(1, lake.current_snapshot())))
    # tombstones exist but are too fresh under the 2-day default
    assert lake.cleanup_old_files(
        cleanup_all=True, dry_run=True) != []
    assert lake.cleanup_old_files(dry_run=True) == []
    lake.meta.set_option("delete_older_than", "0 seconds")
    assert lake.cleanup_old_files(dry_run=True) != []
    lake.cleanup_old_files()
    assert lake.cleanup_old_files(cleanup_all=True, dry_run=True) == []
    assert sorted(r.i for r in lake.table("t").collect()) == [1, 2, 3]


# -- checkpoint/checkpoint_updates_interleaved.test ----------------------

def test_checkpoint_inside_txn_is_independent(lake, spark):
    """CHECKPOINT inside an open transaction commits on its own; the
    surrounding transaction keeps its buffered writes and commits
    cleanly when nothing conflicts."""
    lake.set_option("data_inlining_row_limit", "5")
    lake.create_table("test", [("i", "int32")])
    lake.insert("test", spark.createDataFrame([(i,) for i in range(10)], "i int"))
    with lake.transaction():
        lake.insert("test", spark.createDataFrame(
            [(i,) for i in range(10, 13)], "i int"))
        lake.checkpoint()  # runs as its own txns, buffered insert survives
        assert lake.table("test").count() == 13
    assert sorted(r.i for r in lake.table("test").collect()) == list(range(13))
    with lake.transaction():
        lake.checkpoint()
        lake.insert("test", spark.createDataFrame(
            [(i,) for i in range(13, 16)], "i int"))
    assert lake.table("test").count() == 16


def test_checkpoint_conflicts_with_buffered_delete(lake, spark):
    """A transaction that buffered a DELETE aborts at COMMIT when a
    mid-transaction CHECKPOINT compacted the deleted-from files
    (reference: final block of checkpoint_updates_interleaved.test)."""
    from ducklake_spark.transaction import ConflictError

    lake.create_table("test", [("i", "int32")])
    lake.insert("test", spark.createDataFrame([(i,) for i in range(10)], "i int"))
    lake.insert("test", spark.createDataFrame(
        [(i,) for i in range(10, 20)], "i int"))
    with pytest.raises(ConflictError):
        with lake.transaction():
            lake.delete("test", "i < 15")
            lake.checkpoint()  # compacts the two files the delete targets
            lake.insert("test", spark.createDataFrame([(1,), (2,)], "i int"))
    # the aborted txn left nothing behind; checkpoint's compaction stands
    assert lake.table("test").count() == 20


# -- metadata/row_group_count.test ---------------------------------------

def test_row_group_count_recorded(lake, spark):
    lake.create_table("t", [("i", "int32")])
    lake.insert("t", spark.createDataFrame(
        [(i,) for i in range(1000)], "i int").coalesce(1))
    rows = lake.meta.query(
        "SELECT record_count, row_group_count FROM ducklake_data_file "
        "WHERE end_snapshot IS NULL")
    assert rows == [(1000, 1)]
    lake.delete("t", "i < 100")
    drows = lake.meta.query(
        "SELECT delete_count, row_group_count FROM ducklake_delete_file "
        "WHERE end_snapshot IS NULL")
    assert drows == [(100, 1)]
    # small byte-budget row groups → several per file
    lake.set_option("parquet_row_group_size_bytes", "4096")
    lake.create_table("m", [("i", "int32"), ("s", "varchar")])
    lake.insert("m", spark.createDataFrame(
        [(i, "x" * 100) for i in range(20000)], "i int, s string").coalesce(1))
    (rg,) = lake.meta.query(
        "SELECT row_group_count FROM ducklake_data_file d "
        "JOIN ducklake_table t ON d.table_id = t.table_id "
        "WHERE t.table_name='m' AND d.end_snapshot IS NULL")[0]
    assert rg >= 2


# -- update/update_join_duplicates.test ----------------------------------

def test_joined_update_first_write_wins(lake, spark):
    lake.create_table("test", [("id", "int64")])
    lake.insert("test", spark.createDataFrame(
        [(i,) for i in range(10)], "id long"))
    # duplicate update ids: every even id appears twice in the source
    src = spark.createDataFrame(
        [(i,) for i in range(0, 10, 2)] * 2, "id long")
    n = lake.update("test", {"id": "t.id + 1000"}, source=src, on=["id"])
    assert n == 5  # one update per matched target row, not per source row
    got = sorted(r.id for r in lake.table("test").collect())
    assert got == [1, 3, 5, 7, 9, 1000, 1002, 1004, 1006, 1008]
    assert sum(got) == 5045
    # DISTINCT source gives the same result
    lake2_rows = sorted(r.id for r in lake.table("test").collect())
    assert lake2_rows == got


def test_update_in_same_transaction_as_create(lake, spark):
    # update/update_same_transaction.test: create+insert+update in one txn
    with lake.transaction():
        lake.create_table("t", [("id", "int32"), ("name", "varchar")])
        lake.insert("t", spark.createDataFrame(
            [(1, "Bob")], "id int, name string"))
        lake.update("t", {"name": "'Alice'"}, "id = 1")
    assert [r.name for r in lake.table("t").collect()] == ["Alice"]


# -- types/list.test -----------------------------------------------------

def test_list_column_round_trip(lake, spark):
    """Lists with NULL elements and NULL lists survive write/scan and a
    re-attach; element predicates work (types/list.test)."""
    import conftest
    from ducklake_spark.lake import DuckLake

    lake.create_table("test", [("l", "list<int32>")])
    lake.insert("test", spark.sql(
        "SELECT * FROM VALUES (array(1)), (array(CAST(NULL AS INT))), "
        "(CAST(NULL AS ARRAY<INT>)), (array(3)) AS t(l)"))
    got = [r.l for r in lake.table("test").collect()]
    assert len(got) == 4
    assert [1] in got and [3] in got and [None] in got and None in got
    assert [r.l for r in lake.table("test").filter("l[0] = 1").collect()] \
        == [[1]]
    assert lake.table("test").filter("l[0] = 100").count() == 0
    lake.insert("test", spark.sql(
        "SELECT * FROM VALUES (array(4, 5)), (array(6, 7)) AS t(l)"))
    assert lake.table("test").count() == 6
    lake2 = DuckLake.attach(spark, lake.metadata_path, lake.data_path)
    assert lake2.table("test").count() == 6


# -- types/map.test ------------------------------------------------------

def test_map_column_round_trip_inlined_and_flushed(lake, spark):
    """Maps (incl. NULL) survive the inlined path and flush to parquet;
    key access predicates work (types/map.test)."""
    lake.create_table("test", [("s", "map<varchar, int32>")])
    lake.set_option("data_inlining_row_limit", "10", table_name="test")
    lake.insert("test", spark.sql(
        "SELECT * FROM VALUES (map('i', 1, 'j', 2)), (map('j', 3)), "
        "(CAST(NULL AS MAP<STRING,INT>)) AS t(s)"))
    # the inlined scan path decodes the JSON-encoded map before flush
    pre = {tuple(sorted(r.s.items())) if r.s is not None else None
           for r in lake.table("test").collect()}
    assert pre == {(("i", 1), ("j", 2)), (("j", 3),), None}
    lake.flush_inlined_data()
    assert lake.table("test").count() == 3
    assert [r.s for r in lake.table("test").filter("s['i'] = 1").collect()] \
        == [{"i": 1, "j": 2}]
    assert lake.table("test").filter("s['i'] = 100").count() == 0
    lake.insert("test", spark.sql(
        "SELECT * FROM VALUES (map('i', 4, 'j', 5)), (map('i', 6)) AS t(s)"))
    lake.flush_inlined_data()
    assert lake.table("test").count() == 5


# -- types/json.test + json_alter_table.test -----------------------------

def test_json_column_and_alter_add_json(lake, spark):
    """JSON columns store/scan and can be added via ALTER
    (types/json.test, types/json_alter_table.test)."""
    from ducklake_spark.lake import DuckLake

    lake.create_table("jt", [("l", "json")])
    lake.insert("jt", spark.createDataFrame(
        [('{"key": "value"}',)], "l string"))
    assert lake.table("jt").collect()[0].l == '{"key": "value"}'
    lake2 = DuckLake.attach(spark, lake.metadata_path, lake.data_path)
    h = lake2._handle("jt")
    assert [c[2] for c in h.columns] == ["json"]
    # json_alter_table.test: ADD COLUMN ... JSON onto an existing table
    lake.create_table("batch_transaction_finished",
                      [("id", "int64"), ("status", "varchar"),
                       ("batch_id", "varchar")])
    lake.insert("batch_transaction_finished", spark.createDataFrame(
        [(1, "ok", "b1")], "id long, status string, batch_id string"))
    lake.add_column("batch_transaction_finished",
                    "validation_errors", "json")
    rows = lake.table("batch_transaction_finished").collect()
    assert rows[0].validation_errors is None
    lake.insert("batch_transaction_finished", spark.createDataFrame(
        [(2, "bad", "b2", '["boom"]')],
        "id long, status string, batch_id string, validation_errors string"))
    got = {r.id: r.validation_errors
           for r in lake.table("batch_transaction_finished").collect()}
    assert got == {1: None, 2: '["boom"]'}


# -- round-4 code-review regressions (second pass) -----------------------

def test_update_without_where_touches_all_rows(lake, spark):
    lake.create_table("t", [("i", "int64"), ("v", "varchar")])
    lake.insert("t", spark.createDataFrame(
        [(1, "a"), (2, "b")], "i long, v string"))
    n = lake.update("t", {"v": "'z'"})
    assert n == 2
    assert [r.v for r in lake.table("t").collect()] == ["z", "z"]


def test_merge_rejects_unknown_multi_match(lake, spark):
    from ducklake_spark.dml import merge_into
    from ducklake_spark.lake import DuckLakeError

    lake.create_table("t", [("i", "int64")])
    lake.insert("t", spark.createDataFrame([(1,)], "i long"))
    with pytest.raises(DuckLakeError, match="multi_match"):
        merge_into(lake, "t", spark.createDataFrame([(1,)], "i long"),
                   ["i"], when_matched_update={"i": "s.i"},
                   multi_match="First")


def test_joined_update_winner_is_data_deterministic(lake, spark):
    """Duplicate-key source rows with DIFFERENT payloads resolve to the
    same winner on every run (ordered by source data, not partitioning)."""
    lake.create_table("t", [("k", "int64"), ("v", "varchar")])
    lake.insert("t", spark.createDataFrame([(1, "old")], "k long, v string"))
    src = spark.createDataFrame(
        [(1, "bbb"), (1, "aaa"), (1, "ccc")], "k long, v string"
    ).repartition(3)
    n = lake.update("t", {"v": "s.v"}, source=src, on=["k"])
    assert n == 1
    assert lake.table("t").collect()[0].v == "aaa"  # smallest payload wins


def test_rename_column_keeps_cast_type_in_sort_expr(lake, spark):
    """A column literally named 'date' renames without corrupting a
    CAST(... AS DATE) in the stored sort expression."""
    lake.create_table("t", [("ts", "varchar"), ("date", "int64")])
    lake.set_sorted_by("t", [("CAST(ts AS DATE)", "asc")])
    lake.rename_column("t", "date", "dt")
    spec = lake._sort_spec(lake._handle("t"))
    assert spec[0][0].lower() == "cast(ts as date)"
    # sorted insert still analyzes
    lake.insert("t", spark.createDataFrame(
        [("2024-01-02", 1), ("2024-01-01", 2)], "ts string, dt long"))
    assert lake.table("t").count() == 2


def test_schema_scoped_deletion_inlining(lake, spark):
    """deletion_inlining_row_limit set at SCHEMA scope inlines deletes
    for the schema's tables (table > schema > global resolution)."""
    lake.create_table("t", [("i", "int64")])
    lake.insert("t", spark.range(20).withColumnRenamed("id", "i"))
    lake.set_option("deletion_inlining_row_limit", "100",
                    schema_name="main")
    assert lake.delete("t", "i < 3") == 3
    assert lake.table("t").count() == 17
    # inlined, not a delete parquet
    assert not lake.meta.query(
        "SELECT 1 FROM ducklake_delete_file WHERE end_snapshot IS NULL")


def test_schema_level_zero_exempts_global_inlining_enable(lake, spark):
    from ducklake_spark.lake import DuckLakeError

    lake.create_schema("s1")
    lake.create_table("s1.t", [("row_id", "int64")])  # reserved name
    lake.set_option("data_inlining_row_limit", "0", schema_name="s1")
    # global enable must not trip over s1.t: its schema pins 0
    lake.set_option("data_inlining_row_limit", "5")
    # but enabling FOR s1 itself still fails
    with pytest.raises(DuckLakeError, match="reserved column"):
        lake.set_option("data_inlining_row_limit", "5", schema_name="s1")


# -- view/ducklake_rename_view.test + rename_view_case.test --------------

def test_rename_view(lake, spark):
    from ducklake_spark.lake import DuckLakeError

    lake.create_table("base", [("i", "int32")])
    lake.insert("base", spark.createDataFrame([(42,)], "i int"))
    lake.create_view("v1", "SELECT i FROM base")
    lake.rename_view("v1", "v2")
    assert lake.view("v2").collect()[0].i == 42
    with pytest.raises(DuckLakeError):
        lake.view_sql("v1")
    # case-only rename succeeds (rename_view_case.test)
    lake.rename_view("v2", "V2")
    assert lake.view("V2").collect()[0].i == 42
    # txn-local view renames in the buffer; rollback leaves nothing
    with lake.transaction():
        lake.create_view("local_view", "SELECT 100 AS i")
        lake.rename_view("local_view", "local_view2")
    assert lake.view("local_view2").collect()[0].i == 100
    # time travel still finds the old name at the old snapshot
    snaps = [s for (s,) in lake.meta.query(
        "SELECT begin_snapshot FROM ducklake_view WHERE view_name='v1'")]
    assert lake.view("v1", at_version=snaps[0]).collect()[0].i == 42


def test_concurrent_view_rename_conflicts(spark, tmp_path):
    from ducklake_spark.lake import DuckLake
    from ducklake_spark.transaction import ConflictError

    url = conftest.catalog_url(tmp_path)
    a = DuckLake.attach(spark, url, str(tmp_path / "data"))
    b = DuckLake.attach(spark, url, str(tmp_path / "data"))
    a.create_view("v", "SELECT 1 AS i")
    with pytest.raises(ConflictError):
        with a.transaction():
            a.rename_view("v", "va")
            b.rename_view("v", "vb")  # commits first
    assert b.view_sql("vb")


# -- delete/truncate_table.test ------------------------------------------

def test_truncate_writes_no_delete_files(lake, spark, tmp_path):
    # txn-local truncate: the buffered files just disappear
    with lake.transaction():
        lake.create_table_as("test_local", spark.range(10_000).selectExpr("id"))
        assert lake.table("test_local").count() == 10_000
        assert lake.delete("test_local") == 10_000
        assert lake.table("test_local").count() == 0
    assert g.glob(
        str(tmp_path / "data" / "main" / "test_local" / "*.parquet")) == []
    # committed truncate: whole-file drop, no delete parquet
    lake.create_table_as("test", spark.range(10_000).selectExpr("id"))
    assert lake.delete("test") == 10_000
    assert lake.table("test").count() == 0
    assert lake.meta.query(
        "SELECT COUNT(*) FROM ducklake_delete_file")[0][0] == 0


# -- insert/insert_into_self.test ----------------------------------------

def test_insert_into_self_in_transaction(lake, spark):
    lake.create_table("test", [("i", "int32"), ("j", "varchar")])
    with lake.transaction():
        lake.insert("test", spark.createDataFrame(
            [(1, "2"), (None, "3")], "i int, j string"))
        for expect in (2, 4, 8):
            n = lake.insert("test", lake.table("test"))
            assert n == expect, (n, expect)
        # self cross join: 16 * 16 = 256
        a, b = lake.table("test").alias("a"), lake.table("test").alias("b")
        n = lake.insert("test", a.crossJoin(b).select("a.i", "a.j"))
        assert n == 256
    row = lake.table("test").agg(
        F.sum("i").alias("si"),
        F.sum(F.length("j")).alias("sj"),
        F.count("*").alias("c")).collect()[0]
    assert (row.si, row.sj, row.c) == (136, 272, 272)


# -- transaction/update_null_column.test ---------------------------------

def test_stats_pruning_after_update_of_null_column(lake, spark):
    lake.create_table("test", [("active", "boolean")])
    lake.insert("test", spark.createDataFrame([(False,)], "active boolean"))
    assert lake.table("test", where="active = false").filter(
        "active = false").count() == 1
    lake.create_table("t", [("id", "int64"), ("tag", "varchar")])
    lake.insert("t", spark.createDataFrame([(1, None)], "id long, tag string"))
    lake.update("t", {"tag": "'new'"})
    got = lake.table("t", where="tag = 'new'").filter("tag = 'new'").collect()
    assert [(r.id, r.tag) for r in got] == [(1, "new")]


# -- general/data_path_tag.test ------------------------------------------

def test_reattach_without_data_path(lake, spark, tmp_path):
    """An existing lake re-attaches with no DATA_PATH: the catalog
    records it (general/data_path_tag.test)."""
    from ducklake_spark.lake import DuckLake, DuckLakeError

    lake.create_table("t", [("i", "int32")])
    lake.insert("t", spark.createDataFrame([(7,)], "i int"))
    lake2 = DuckLake.attach(spark, lake.meta.db_path)
    assert lake2.data_path.rstrip("/") == lake.data_path.rstrip("/")
    assert lake2.table("t").collect()[0].i == 7
    # a FRESH lake without data_path still errors clearly
    with pytest.raises(DuckLakeError, match="secret|data_path"):
        DuckLake.attach(spark, str(tmp_path / "fresh.db"))


# -- general/attach_at_snapshot.test -------------------------------------

def test_attach_at_snapshot_is_read_only(lake, spark, tmp_path):
    from ducklake_spark.lake import DuckLake, DuckLakeError

    lake.create_table("test", [("i", "int32"), ("j", "int32")])
    s1 = lake.current_snapshot()
    lake.insert("test", spark.createDataFrame([(1, 2), (None, 3)], "i int, j int"))
    pinned = DuckLake.attach(spark, lake.meta.db_path,
                             str(tmp_path / "data"), snapshot_version=s1)
    assert pinned.table("test").count() == 0  # before the insert
    with pytest.raises(DuckLakeError, match="read-only"):
        pinned.insert("test", spark.createDataFrame([(10, 100)], "i int, j int"))
    with pytest.raises(Exception):
        DuckLake.attach(spark, lake.meta.db_path, str(tmp_path / "data"),
                        snapshot_version=999)


# -- concurrent/concurrent_insert_data_inlining.test ---------------------

def test_concurrent_inlined_inserts_both_commit(spark, tmp_path):
    """Two writers inline one row each concurrently: both commit (no
    conflict), no files land on disk, stats fold both rows."""
    import threading

    from ducklake_spark.lake import DuckLake

    url = conftest.catalog_url(tmp_path)
    a = DuckLake.attach(spark, url, str(tmp_path / "data"),
                        data_inlining_row_limit=10)
    b = DuckLake.attach(spark, url, str(tmp_path / "data"))
    a.create_table("tbl", [("key", "int32")])

    errs = []

    def ins(lk, v):
        try:
            lk.insert("tbl", spark.createDataFrame([(v,)], "key int"))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    t1 = threading.Thread(target=ins, args=(a, 0))
    t2 = threading.Thread(target=ins, args=(b, 1))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    rows = [r.key for r in a.table("tbl").collect()]
    assert sorted(rows) == [0, 1]
    assert g.glob(str(tmp_path / "data" / "**" / "*.parquet"),
                  recursive=True) == []


# -- general/paths.test --------------------------------------------------

def test_special_name_paths_use_uuid(lake, spark, tmp_path):
    """Schema/table names with path-hostile characters store under the
    entry's uuid, never under the raw name (reference
    DuckLakeCatalog::GeneratePathFromName, general/paths.test)."""
    lake.create_schema("asd/fgh")
    lake.create_table("asd/fgh.du ck", [("col", "int32")])
    lake.insert("asd/fgh.du ck", spark.createDataFrame([(42,)], "col int"))
    assert [r.col for r in lake.table("asd/fgh.du ck").collect()] == [42]
    (spath,) = lake.meta.query(
        "SELECT path FROM ducklake_schema WHERE schema_name='asd/fgh'")[0]
    (tpath,) = lake.meta.query(
        "SELECT path FROM ducklake_table WHERE table_name='du ck'")[0]
    assert "/" not in spath.rstrip("/") and " " not in tpath
    # no raw-name directory appeared on disk
    assert not (tmp_path / "data" / "asd").exists()
    # safe names still use the readable layout
    lake.create_table("plain", [("i", "int32")])
    (p,) = lake.meta.query(
        "SELECT path FROM ducklake_table WHERE table_name='plain'")[0]
    assert p == "plain/"  # schema-relative (reference convention)


# -- partitioning/partition_null.test ------------------------------------

def test_null_partition_pruning(lake, spark):
    """NULL partition values land in __HIVE_DEFAULT_PARTITION__ files;
    comparison predicates prune them, IS NULL keeps only them, and
    null-count zone maps prune non-partitioned columns too."""
    lake.create_table("pt", [("part_key", "int32"), ("v", "varchar")])
    lake.set_partitioned_by("pt", [("part_key", "identity")])
    lake.insert("pt", spark.sql(
        "SELECT CASE WHEN i%3=0 THEN NULL ELSE CAST(i%2 AS INT) END AS "
        "part_key, concat('s_', i) AS v FROM range(9999) t(i)"))
    h = lake._handle("pt")
    s = lake._resolve_snapshot(None, None)
    total = len(lake._visible_files(h, s, None))
    per_part = total // 3
    assert len(lake._visible_files(h, s, "part_key = 1")) == per_part
    assert len(lake._visible_files(h, s, "part_key IS NULL")) == per_part
    assert len(lake._visible_files(h, s, "part_key IS NOT NULL")) == 2 * per_part
    assert len(lake._visible_files(h, s, "part_key > 0")) == per_part
    assert lake.table("pt", where="part_key IS NULL").filter(
        "part_key IS NULL").count() == 3333
    assert lake.table("pt", where="part_key = 0").filter(
        "part_key = 0").count() == 3333
    assert lake.table("pt", where="part_key IS NOT NULL").filter(
        "part_key IS NOT NULL").count() == 6666


# -- compaction/merge_adjacent_rotation_mode.test ------------------------

def test_compaction_rotation_mode(lake, spark):
    """Adjacent (contiguous-rowid) packs merge to a POSITIONAL file (no
    embedded rowid column); non-adjacent packs keep embedded rowids."""
    import pyarrow.parquet as pq
    from ducklake_spark import maintenance
    from ducklake_spark.lake import ROWID_COL

    lake.create_table("adj", [("id", "int32")])
    for lo in (0, 1000, 2000):
        lake.insert("adj", spark.sql(
            f"SELECT CAST(i AS INT) id FROM range({lo},{lo+1000}) t(i)"))
    assert maintenance.merge_adjacent_files(lake) == 1
    rows = lake.meta.query(
        "SELECT path, row_id_start FROM ducklake_data_file "
        "WHERE end_snapshot IS NULL")
    assert len(rows) == 1 and rows[0][1] == 0  # positional
    cols = pq.ParquetFile(os.path.join(
        lake.data_path, lake._handle("adj").path + rows[0][0]
    )).schema_arrow.names
    assert ROWID_COL not in cols
    # rowids preserved positionally
    got = sorted((r.rowid, r.id) for r in
                 lake.table("adj", with_virtual=True).collect())
    assert got[0] == (0, 0) and got[-1] == (2999, 2999)
    # non-adjacent: delete a middle file's worth to break contiguity
    lake.create_table("gap", [("id", "int32")])
    for lo in (0, 100, 200):
        lake.insert("gap", spark.sql(
            f"SELECT CAST(i AS INT) id FROM range({lo},{lo+100}) t(i)"))
    # whole-file delete of the middle file leaves a rowid gap
    lake.delete("gap", "id >= 100 AND id < 200")
    assert maintenance.merge_adjacent_files(lake, table="gap") == 1
    rows = lake.meta.query(
        "SELECT d.path, d.row_id_start FROM ducklake_data_file d "
        "JOIN ducklake_table t USING (table_id) "
        "WHERE t.table_name='gap' AND d.end_snapshot IS NULL")
    assert len(rows) == 1 and rows[0][1] is None  # embedded
    cols = pq.ParquetFile(os.path.join(
        lake.data_path, lake._handle("gap").path + rows[0][0]
    )).schema_arrow.names
    assert ROWID_COL in cols
    got = sorted(r.rowid for r in
                 lake.table("gap", with_virtual=True).collect())
    assert got == list(range(100)) + list(range(200, 300))


# -- compaction/merge_adjacent_max_files.test + file_size_filter ---------

def test_merge_adjacent_options(lake, spark):
    from ducklake_spark import maintenance
    from ducklake_spark.lake import DuckLakeError

    lake.create_table("ex", [("key", "int32")])
    for i in range(8):
        lake.insert("ex", spark.createDataFrame([(i,)], "key int"))
    with pytest.raises(DuckLakeError, match="greater than zero"):
        maintenance.merge_adjacent_files(lake, max_compacted_files=0)
    # cap at one created file per call
    assert maintenance.merge_adjacent_files(
        lake, max_compacted_files=1) == 1
    assert lake.table("ex").count() == 8
    # min_file_size above every file: nothing merges
    assert maintenance.merge_adjacent_files(
        lake, min_file_size=10**9) == 0
    # size-band filter merges only small files
    lake.create_table("ex2", [("k", "int32"), ("v", "varchar")])
    lake.insert("ex2", spark.createDataFrame([(1, "small")], "k int, v string"))
    lake.insert("ex2", spark.createDataFrame([(2, "small")], "k int, v string"))
    lake.insert("ex2", spark.sql(
        "SELECT CAST(i AS INT) k, repeat('medium', 200) v "
        "FROM range(2000) t(i)").coalesce(1))
    sizes = sorted(s for (s,) in lake.meta.query(
        "SELECT d.file_size_bytes FROM ducklake_data_file d "
        "JOIN ducklake_table t USING (table_id) "
        "WHERE t.table_name='ex2' AND d.end_snapshot IS NULL"))
    assert len(sizes) == 3
    cutoff = (sizes[1] + sizes[-1]) // 2
    assert maintenance.merge_adjacent_files(
        lake, table="ex2", max_file_size=cutoff) == 1
    left = lake.meta.query(
        "SELECT COUNT(*) FROM ducklake_data_file d "
        "JOIN ducklake_table t USING (table_id) "
        "WHERE t.table_name='ex2' AND d.end_snapshot IS NULL")[0][0]
    assert left == 2  # merged-small + untouched-large
    assert lake.table("ex2").count() == 2002


# -- default/struct_field_default.test -----------------------------------

def test_add_struct_field_with_default(lake, spark):
    """ADD nested FIELD ... DEFAULT surfaces the default for rows that
    predate the field; rows written after keep their own values."""
    lake.create_table("test", [("col1", "struct<i:int32,j:int32>")])
    lake.insert("test", spark.sql(
        "SELECT named_struct('i', 1, 'j', 2) AS col1"))
    lake.add_field("test", "col1", "k", "int32", default="42")
    lake.insert("test", spark.sql(
        "SELECT named_struct('i', 100, 'j', 200, 'k', 300) AS col1"))
    got = sorted((r.col1.i, r.col1.j, r.col1.k)
                 for r in lake.table("test").collect())
    assert got == [(1, 2, 42), (100, 200, 300)]
    # re-attach reads the same (tag is catalog-persistent)
    from ducklake_spark.lake import DuckLake

    lk2 = DuckLake.attach(spark, lake.meta.db_path, lake.data_path)
    got = sorted((r.col1.i, r.col1.j, r.col1.k)
                 for r in lk2.table("test").collect())
    assert got == [(1, 2, 42), (100, 200, 300)]


# -- catalog/drop_schema_with_table_macro.test ---------------------------

def test_drop_schema_with_macro(lake, spark):
    from ducklake_spark.lake import DuckLakeError

    lake.create_schema("myschema")
    lake.create_macro("myschema.mymacro", ["x"], "SELECT {x} AS col",
                      is_table_macro=True)
    with pytest.raises(DuckLakeError, match="not empty"):
        lake.drop_schema("myschema")
    lake.drop_schema("myschema", cascade=True)
    assert lake.meta.query(
        "SELECT COUNT(*) FROM ducklake_macro WHERE end_snapshot IS NULL"
    )[0][0] == 0
    with pytest.raises(DuckLakeError):
        lake.create_table("myschema.tbl", [("i", "int32")])


# -- view/dangling_view_columns.test (view-on-view binding) --------------

def test_view_referencing_view(lake, spark):
    from ducklake_spark.lake import DuckLakeError

    lake.create_schema("main", if_not_exists=True)  # no-op, like reference
    with pytest.raises(DuckLakeError, match="exists"):
        lake.create_schema("main")
    lake.create_table("t1", [("id", "int32"), ("label", "varchar")])
    lake.create_view("v1", "SELECT 1 AS id, 'x' AS label")
    lake.create_view("v2", "SELECT id, label FROM v1")
    lake.create_view("v3", "SELECT 100 AS score")
    got = lake.view("v2").collect()
    assert [(r.id, r.label) for r in got] == [(1, "x")]
    lake.drop_view("v1")
    # v2 now dangles; v3 still binds
    assert lake.view("v3").collect()[0].score == 100
    with pytest.raises(Exception):
        lake.view("v2").collect()


# -- issues/issue_1027_hive_path_scan.test ------------------------------

def test_data_path_with_hive_like_segment(spark, tmp_path):
    # a DATA_PATH containing an incidental key=value segment must not
    # trigger hive partition auto-detection on scans
    from ducklake_spark.lake import DuckLake

    lake = DuckLake.attach(
        spark, conftest.catalog_url(tmp_path),
        str(tmp_path / "issue_1027" / "site_id=42"))
    lake.create_table("t", [("id", "int64")])
    lake.insert("t", spark.range(1000).select(F.col("id")))
    lake.delete("t", "id % 7 = 0")
    lake.delete("t", "id % 5 = 0")  # second delete merges the first
    df = lake.table("t")
    assert df.columns == ["id"]  # no phantom 'site_id' partition column
    assert df.count() == 686
    assert df.filter("id % 7 = 0 OR id % 5 = 0").count() == 0


# -- issues/issue_1074.test ---------------------------------------------

def test_inlining_toggle_delete_time_travel(lake, spark):
    lake.create_table("t", [("id", "int64")])
    lake.insert("t", spark.range(100).select(F.col("id")))
    v1 = lake.current_snapshot()
    lake.set_option("data_inlining_row_limit", "100")
    lake.delete("t", "id = 0")
    v2 = lake.current_snapshot()
    lake.set_option("data_inlining_row_limit", "0")
    lake.delete("t", "id = 1")
    v3 = lake.current_snapshot()
    lake.delete("t", "id = 2")
    v4 = lake.current_snapshot()
    for v, n in ((v1, 100), (v2, 99), (v3, 98), (v4, 97)):
        assert lake.table("t", at_version=v).count() == n


# -- issues/options_unknown_metadata_key.test ---------------------------

def test_options_unknown_metadata_key(lake, spark):
    lake.meta.con.execute(
        "INSERT INTO ducklake_metadata VALUES ('mykey', 'myvalue', NULL, NULL)")
    lake.meta.con.execute(
        "INSERT INTO ducklake_metadata VALUES ('another_unknown', 'v2', NULL, NULL)")
    lake.set_option("parquet_compression", "zstd")
    rows = {r.option_name: r for r in lake.options().collect()}
    assert rows["mykey"].value == "myvalue"
    assert rows["mykey"].description is None
    assert rows["mykey"].scope == "GLOBAL"
    assert rows["another_unknown"].value == "v2"
    assert rows["parquet_compression"].description is not None
    # scope_entry carries NAMES for scoped options
    lake.create_table("scoped", [("i", "int64")])
    lake.set_option("target_file_size", "1048576", table_name="scoped")
    rows = {r.option_name: r for r in lake.options().collect()}
    assert rows["target_file_size"].scope == "TABLE"
    assert rows["target_file_size"].scope_entry == "main.scoped"


# -- issues/late_materialization.test -----------------------------------

def test_late_materialization_topn(lake, spark):
    lake.create_table("m", [("id", "int32"), ("value", "varchar")])
    for i, v in enumerate(["hello", "world", "this", "is", "a", "test"], 1):
        lake.insert("m", spark.createDataFrame([(i, v)], "id int, value string"))
    got = (lake.table("m").filter("id > 3")
           .orderBy(F.col("value").desc()).limit(1).collect())
    assert [tuple(r) for r in got] == [(6, "test")]


# -- issues/corrupted_catalog_fault_isolation.test ----------------------

def test_corrupted_catalog_fault_isolation(spark, tmp_path):
    from ducklake_spark.lake import DuckLake, DuckLakeError

    bad = DuckLake.attach(
        spark, str(tmp_path / "corrupted.db"), str(tmp_path / "corrupted"))
    bad.create_table("t1", [("id", "int32"), ("name", "varchar")])
    bad.insert("t1", spark.createDataFrame([(1, "hello")], "id int, name string"))
    bad.meta.con.execute(
        "UPDATE ducklake_column SET column_type='int32varcharvarchar' "
        "WHERE column_name='id'")
    # a corrupted catalog must not poison an independent attach
    good = DuckLake.attach(
        spark, str(tmp_path / "good.db"), str(tmp_path / "good"))
    good.create_table("t2", [("val", "int32")])
    good.insert("t2", spark.createDataFrame([(42,)], "val int"))
    assert [r.val for r in good.table("t2").collect()] == [42]
    # re-attach of the corrupted one succeeds (lazy); reading the broken
    # table errors with the bad type name
    bad2 = DuckLake.attach(
        spark, str(tmp_path / "corrupted.db"), str(tmp_path / "corrupted"))
    with pytest.raises(Exception, match="int32varcharvarchar"):
        bad2.table("t1").collect()


# -- quack/noop_partition_alter_data_files.test -------------------------

def test_redundant_partition_alter_is_noop(lake, spark):
    """A SET PARTITIONED BY identical to the live spec must not create
    a new partition spec, must not bump schema_version, and files
    written in the same transaction must all land under the ONE
    existing partition_id."""
    lake.create_table("p", [("part_key", "int32"), ("vals", "varchar")])
    lake.set_partitioned_by("p", [("part_key", "identity")])
    lake.insert("p", spark.createDataFrame(
        [(i % 2, f"value_{i}") for i in range(5)],
        "part_key int, vals string"))
    con = lake.meta.con
    (sv_before,) = con.execute(
        "SELECT MAX(schema_version) FROM ducklake_snapshot").fetchone()
    with lake.transaction():
        lake.set_partitioned_by("p", [("part_key", "identity")])  # redundant
        lake.delete("p", "part_key = 0")
        lake.insert("p", spark.createDataFrame(
            [(0, "replacement_a"), (0, "replacement_b")],
            "part_key int, vals string"))
    (live_specs,) = con.execute(
        "SELECT COUNT(*) FROM ducklake_partition_info "
        "WHERE end_snapshot IS NULL").fetchone()
    assert live_specs == 1
    (live_pids,) = con.execute(
        "SELECT COUNT(DISTINCT partition_id) FROM ducklake_data_file "
        "WHERE end_snapshot IS NULL").fetchone()
    assert live_pids == 1
    (sv_after,) = con.execute(
        "SELECT MAX(schema_version) FROM ducklake_snapshot").fetchone()
    assert sv_after == sv_before
    # a NON-redundant alter still takes effect
    lake.set_partitioned_by("p", [("part_key", "bucket(4)")])
    (sv_bumped,) = con.execute(
        "SELECT MAX(schema_version) FROM ducklake_snapshot").fetchone()
    assert sv_bumped == sv_before + 1
    got = sorted(r.vals for r in lake.table("p").collect())
    assert got == ["replacement_a", "replacement_b",
                   "value_1", "value_3"]


# -- issues/issue_sqlite_snapshot_time.test -----------------------------

def test_attach_pinned_at_snapshot_time(spark, tmp_path):
    """Capture max(snapshot_time), write more data, re-attach pinned at
    the captured timestamp: reads see only the first two rows (and the
    pinned attach is read-only)."""
    from ducklake_spark.lake import DuckLake

    db = str(tmp_path / "st.db")
    data = str(tmp_path / "stdata")
    lake = DuckLake.attach(spark, db, data)
    lake.create_table("t", [("col1", "int64"), ("col2", "varchar")])
    lake.insert("t", spark.createDataFrame(
        [(1, "a"), (2, "b")], "col1 long, col2 string"))
    (t1,) = lake.meta.con.execute(
        "SELECT MAX(snapshot_time) FROM ducklake_snapshot").fetchone()
    lake2 = DuckLake.attach(spark, db, data)
    lake2.insert("t", spark.createDataFrame(
        [(3, "c"), (4, "d")], "col1 long, col2 string"))
    pinned = DuckLake.attach(spark, db, data, snapshot_time=str(t1))
    got = sorted(tuple(r) for r in pinned.table("t").collect())
    assert got == [(1, "a"), (2, "b")]
    with pytest.raises(Exception):
        pinned.insert("t", spark.createDataFrame(
            [(9, "z")], "col1 long, col2 string"))
    # unpinned attach still sees all four
    assert DuckLake.attach(spark, db, data).table("t").count() == 4


# -- constraints/not_null_drop_column.test ------------------------------

def test_not_null_survives_drop_column(lake, spark):
    lake.create_table("nn", [("i", "int32"), ("j", "int32"),
                             ("k", "int32")], not_null=("i", "k"))
    lake.insert("nn", spark.createDataFrame(
        [(42, None, 3)], "i int, j int, k int"))
    with pytest.raises(Exception, match="(?i)not null|null"):
        lake.insert("nn", spark.createDataFrame(
            [(None, 84, 3)], "i int, j int, k int"))
    lake.drop_column("nn", "j")
    with pytest.raises(Exception, match="(?i)not null|null"):
        lake.insert("nn", spark.createDataFrame(
            [(42, None)], "i int, k int"))
    lake.drop_column("nn", "k")
    with pytest.raises(Exception, match="(?i)not null|null"):
        lake.insert("nn", spark.createDataFrame([(None,)], "i int"))
    lake.insert("nn", spark.createDataFrame([(7,)], "i int"))
    assert sorted(r.i for r in lake.table("nn").collect()) == [7, 42]


# -- default/default_expressions.test -----------------------------------

def test_default_expressions(lake, spark):
    """Expression defaults evaluate at insert time; a quoted literal
    that LOOKS like a function call stays a literal."""
    lake.create_table("de", [("id", "int32"), ("created_at", "timestamp")])
    lake.set_default("de", "created_at", "now()")
    lake.insert("de", spark.createDataFrame([(1,)], "id int"))
    row = lake.table("de").collect()[0]
    assert row.created_at is not None
    lake.create_table("de1", [("id", "int32"), ("id_plus", "int32")])
    lake.set_default("de1", "id_plus", "1")
    lake.insert("de1", spark.createDataFrame([(0,)], "id int"))
    lake.set_default("de1", "id_plus", "CAST(round(pi()) AS INT)")
    lake.insert("de1", spark.createDataFrame([(1,)], "id int"))
    assert sorted((r.id, r.id_plus) for r in lake.table("de1").collect()) \
        == [(0, 1), (1, 3)]
    lake.create_table("de2", [("a", "int32"), ("b", "varchar")])
    lake.set_default("de2", "b", "'random()'")
    lake.insert("de2", spark.createDataFrame([(1,)], "a int"))
    assert [(r.a, r.b) for r in lake.table("de2").collect()] == \
        [(1, "random()")]


# -- comments/comment_on_view_column*.test ------------------------------

def test_view_column_comments(lake, spark):
    """Tags on view OUTPUT columns key by (view_id, column_name):
    case-insensitive updates keep one live row, invalid columns error,
    rename preserves, drop expires."""
    from ducklake_spark.lake import DuckLakeError

    lake.create_view("v", "SELECT 1 AS col_a, 2 AS col_b")
    assert lake.get_view_column_comment("v", "col_a") is None
    lake.set_view_column_comment("v", "col_a", "view column note")
    assert lake.get_view_column_comment("v", "col_a") == "view column note"
    # upper-case update targets the same tag row
    lake.set_view_column_comment("v", "COL_A", "upper-case update")
    (live,) = lake.meta.con.execute(
        "SELECT COUNT(*) FROM ducklake_view_column_tag "
        "WHERE end_snapshot IS NULL").fetchone()
    assert live == 1
    assert lake.get_view_column_comment("v", "col_a") == "upper-case update"
    with pytest.raises(DuckLakeError,
                       match='does not have a column with name'):
        lake.set_view_column_comment("v", "nope", "x")
    # rename preserves (same view_id)
    lake.rename_view("v", "v2")
    assert lake.get_view_column_comment("v2", "col_a") == "upper-case update"
    # drop expires every tag row
    lake.drop_view("v2")
    (live,) = lake.meta.con.execute(
        "SELECT COUNT(*) FROM ducklake_view_column_tag "
        "WHERE end_snapshot IS NULL").fetchone()
    assert live == 0


# -- comments/comment_schema_version.test -------------------------------

def test_comments_do_not_bump_schema_version(lake, spark):
    """COMMENT ON TABLE/COLUMN bumps the GLOBAL snapshot
    schema_version (the altered entry makes SchemaChangesMade() true)
    but writes NO per-table ducklake_schema_versions row — so the
    per-table version stays put and the next real alter JUMPS it to
    the then-current global (comment_mixed_operations.test: 1 -> 3
    after comment + ADD COLUMN)."""
    lake.create_table("ct", [("a", "int32"), ("b", "varchar")])
    con = lake.meta.con

    def sv():
        return (
            con.execute("SELECT MAX(schema_version) FROM "
                        "ducklake_schema_versions").fetchone()[0],
            con.execute("SELECT MAX(schema_version) FROM "
                        "ducklake_snapshot").fetchone()[0],
        )

    base = sv()
    lake.set_comment("ct", "table comment")
    lake.set_comment("ct", "col comment", column="a")
    # per-table row untouched; global moved once per comment snapshot
    assert sv() == (base[0], base[1] + 2)
    assert lake.get_comment("ct") == "table comment"
    assert lake.get_comment("ct", column="a") == "col comment"
    # a REAL schema change writes the per-table row at the new global
    lake.add_column("ct", "c", "int32")
    assert sv() == (base[1] + 3, base[1] + 3)


# -- comments/comment_same_transaction.test -----------------------------

def test_comment_on_column_added_in_same_transaction(lake, spark):
    lake.create_table("cs", [("a", "int32"), ("b", "varchar")])
    with lake.transaction():
        lake.set_comment("cs", "my table comment")
        lake.add_column("cs", "c", "int64")
        lake.set_comment("cs", "new column comment", column="c")
    assert lake.get_comment("cs") == "my table comment"
    assert lake.get_comment("cs", column="c") == "new column comment"
    # one schema bump total (the ADD COLUMN), none from the comments
    (sv,) = lake.meta.con.execute(
        "SELECT MAX(schema_version) FROM ducklake_snapshot").fetchone()
    assert sv == 2


# -- catalog/drop_schema_after_drop_dependents.test,
#    drop_schema_transaction_local_entries.test ---------------------------

def test_drop_schema_after_dropping_dependents_in_txn(lake, spark):
    lake.create_schema("s")
    lake.create_view("s.v", "SELECT 1 AS x")
    with lake.transaction():
        lake.drop_view("s.v")
        lake.drop_schema("s")  # non-cascade: dependents gone in-txn
    lake.create_schema("s_tbl")
    lake.create_table("s_tbl.t", [("i", "int32")])
    with lake.transaction():
        lake.drop_table("s_tbl.t")
        lake.drop_schema("s_tbl")
    live = {r[0] for r in lake.meta.query(
        "SELECT schema_name FROM ducklake_schema WHERE end_snapshot IS NULL")}
    assert "s" not in live and "s_tbl" not in live


def test_drop_txn_local_schema(lake, spark):
    from ducklake_spark.lake import DuckLakeError

    with lake.transaction():
        lake.create_schema("my_schema")
        lake.create_table("my_schema.t1", [("i", "int32")])
        with pytest.raises(DuckLakeError, match="not empty"):
            lake.drop_schema("my_schema")
        lake.drop_schema("my_schema", cascade=True)
        with pytest.raises(Exception):
            lake.table("my_schema.t1").collect()
    # the whole transaction collapsed to a no-op: nothing committed
    assert lake.meta.query(
        "SELECT COUNT(*) FROM ducklake_schema "
        "WHERE schema_name='my_schema'") == [(0,)]


# -- catalog/create_then_drop_macro.test, quoted_identifiers.test -------

def test_create_then_drop_macro_in_txn(lake, spark):
    from ducklake_spark.lake import DuckLakeError

    with lake.transaction():
        lake.create_macro("zipm", ["i", "j"], "concat(i, '-', j)")
        assert lake.call_macro("zipm", "'A'", "'B'") == "concat('A', '-', 'B')" \
            or "'A'" in lake.call_macro("zipm", "'A'", "'B'")
        lake.drop_macro("zipm")
    with pytest.raises(DuckLakeError, match="no macro"):
        lake.call_macro("zipm", "1", "2")
    assert lake.meta.query(
        "SELECT COUNT(*) FROM ducklake_macro") == [(0,)]
    # committed create, then drop: end-marked, call fails
    lake.create_macro("m2", ["x"], "x + 1")
    assert lake.call_macro("m2", "41") == "41 + 1"
    lake.drop_macro("m2")
    with pytest.raises(DuckLakeError, match="no macro"):
        lake.call_macro("m2", "1")


def test_quoted_identifier_names(lake, spark):
    from pyspark.sql import functions as F

    tname = 'quoted \'table\' "name"'
    cname = 'quoted \'column\' "name"'
    lake.create_table(tname, [(cname, "int32")])
    lake.insert(tname, spark.range(3).select(
        F.col("id").cast("int").alias(cname)))
    assert sorted(r[0] for r in lake.table(tname).collect()) == [0, 1, 2]
    lake.drop_table(tname)


# -- comments/comment_duplicate_same_transaction.test -------------------

def test_duplicate_comments_same_transaction(lake, spark):
    lake.create_table("cd", [("a", "int32")])
    with lake.transaction():
        lake.set_comment("cd", "first")
        lake.set_comment("cd", "second")
        lake.set_comment("cd", "col first", column="a")
        lake.set_comment("cd", "col second", column="a")
    assert lake.get_comment("cd") == "second"
    assert lake.get_comment("cd", column="a") == "col second"
    (live,) = lake.meta.con.execute(
        "SELECT COUNT(*) FROM ducklake_tag WHERE end_snapshot IS NULL"
    ).fetchone()
    assert live == 1
