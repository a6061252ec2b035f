"""DELETE / UPDATE / MERGE + CDC + maintenance.

Mirrors reference test/sql/delete/*, update/*, merge/*,
table_changes/*, compaction/*, data_inlining/*.
"""

from __future__ import annotations

import pytest

import conftest


@pytest.fixture()
def lake(spark, tmp_path):
    from ducklake_spark.lake import DuckLake

    return DuckLake.attach(spark, conftest.catalog_url(tmp_path), str(tmp_path / "data"))


def _mk(lake, spark, name="d", n=100, files=1):
    lake.create_table(name, [("i", "int64"), ("v", "varchar")])
    for k in range(files):
        lo, hi = k * n // files, (k + 1) * n // files
        df = spark.createDataFrame(
            [(i, f"val{i}") for i in range(lo, hi)], "i long, v string"
        )
        lake.insert(name, df.coalesce(1))
    return name


def test_delete_partial(lake, spark):
    _mk(lake, spark, n=100)
    n = lake.delete("d", "i >= 90")
    assert n == 10
    assert lake.table("d").count() == 90
    assert lake.table("d").filter("i >= 90").count() == 0


def test_delete_merges_existing(lake, spark):
    _mk(lake, spark, n=100)
    lake.delete("d", "i >= 90")
    lake.delete("d", "i < 10")
    assert lake.table("d").count() == 80
    # one live delete file binding the single data file, holding both batches
    rows = lake.meta.query(
        "SELECT delete_count FROM ducklake_delete_file WHERE end_snapshot IS NULL"
    )
    assert [r[0] for r in rows] == [20]


def test_delete_whole_file_drops(lake, spark):
    _mk(lake, spark, n=40, files=2)
    n = lake.delete("d", "i < 20")  # exactly file 1
    assert n == 20
    live = lake.meta.query(
        "SELECT COUNT(*) FROM ducklake_data_file WHERE end_snapshot IS NULL"
    )[0][0]
    assert live == 1
    assert lake.table("d").count() == 20


def test_delete_time_travel(lake, spark):
    _mk(lake, spark, n=50)
    s_before = lake.current_snapshot()
    lake.delete("d", "i % 2 = 0")
    assert lake.table("d").count() == 25
    assert lake.table("d", at_version=s_before).count() == 50


def test_rowid_stable_after_delete(lake, spark):
    _mk(lake, spark, n=20)
    before = {
        r.i: r.rowid
        for r in lake.table("d", with_virtual=True).select("i", "rowid").collect()
    }
    lake.delete("d", "i < 5")
    after = {
        r.i: r.rowid
        for r in lake.table("d", with_virtual=True).select("i", "rowid").collect()
    }
    for i, rid in after.items():
        assert before[i] == rid


def test_update_preserves_rowid(lake, spark):
    _mk(lake, spark, n=20)
    before = {
        r.i: r.rowid
        for r in lake.table("d", with_virtual=True).select("i", "rowid").collect()
    }
    n = lake.update("d", {"v": "'updated'"}, "i >= 15")
    assert n == 5
    out = lake.table("d", with_virtual=True).select("i", "v", "rowid").collect()
    assert len(out) == 20
    for r in out:
        assert r.rowid == before[r.i]
        assert (r.v == "updated") == (r.i >= 15)


def test_update_time_travel(lake, spark):
    _mk(lake, spark, n=10)
    s0 = lake.current_snapshot()
    lake.update("d", {"v": "'new'"}, "i = 3")
    old = lake.table("d", at_version=s0).filter("i = 3").collect()
    assert old[0].v == "val3"
    new = lake.table("d").filter("i = 3").collect()
    assert new[0].v == "new"


def test_merge(lake, spark):
    _mk(lake, spark, n=10)
    src = spark.createDataFrame(
        [(5, "merged5"), (11, "merged11")], "i long, v string"
    )
    counts = lake.merge("d", src, ["i"], when_matched_update={"v": None},
                        when_not_matched_insert=True)
    assert counts["updated"] == 1
    assert counts["inserted"] == 1
    rows = {r.i: r.v for r in lake.table("d").collect()}
    assert rows[5] == "merged5"
    assert rows[11] == "merged11"
    assert len(rows) == 11


def test_cdc_insertions_deletions_changes(lake, spark):
    name = _mk(lake, spark, n=10)
    s1 = lake.current_snapshot()
    lake.insert(
        name, spark.createDataFrame([(100, "x")], "i long, v string")
    )
    s2 = lake.current_snapshot()
    lake.delete(name, "i = 3")
    s3 = lake.current_snapshot()

    ins = lake.table_insertions(name, s2, s2).collect()
    assert [r.i for r in ins] == [100]
    dels = lake.table_deletions(name, s3, s3).collect()
    assert [r.i for r in dels] == [3]
    ch = lake.table_changes(name, s2, s3).collect()
    types = {(r.i, r.change_type) for r in ch}
    assert (100, "insert") in types
    assert (3, "delete") in types


def test_cdc_update_pre_post_image(lake, spark):
    name = _mk(lake, spark, n=10)
    lake.update(name, {"v": "'upd'"}, "i = 7")
    s = lake.current_snapshot()
    ch = lake.table_changes(name, s, s).collect()
    types = {(r.i, r.change_type, r.v) for r in ch}
    assert (7, "update_postimage", "upd") in types
    assert (7, "update_preimage", "val7") in types


def test_compaction_merges_files(lake, spark):
    name = _mk(lake, spark, n=40, files=8)
    files_before = lake.meta.query(
        "SELECT COUNT(*) FROM ducklake_data_file WHERE end_snapshot IS NULL"
    )[0][0]
    assert files_before == 8
    s_before = lake.current_snapshot()
    n = lake.merge_adjacent_files()
    assert n == 1
    files_after = lake.meta.query(
        "SELECT COUNT(*) FROM ducklake_data_file WHERE end_snapshot IS NULL"
    )[0][0]
    assert files_after == 1
    # data intact, rowids preserved, time travel across the merge works
    rows = lake.table(name, with_virtual=True).select("i", "rowid").collect()
    assert sorted(r.rowid for r in rows) == list(range(40))
    assert lake.table(name, at_version=s_before).count() == 40
    assert lake.table(name).count() == 40


def test_compaction_time_travel_partial(lake, spark):
    lake.create_table("c", [("i", "int64")])
    lake.insert("c", spark.createDataFrame([(1,)], "i long"))
    s1 = lake.current_snapshot()
    lake.insert("c", spark.createDataFrame([(2,)], "i long"))
    s2 = lake.current_snapshot()
    lake.merge_adjacent_files()
    assert lake.table("c", at_version=s1).count() == 1
    assert lake.table("c", at_version=s2).count() == 2
    assert lake.table("c").count() == 2


def test_rewrite_data_files(lake, spark):
    _mk(lake, spark, n=100)
    lake.delete("d", "i < 96")
    n = lake.rewrite_data_files(delete_threshold=0.5)
    assert n == 1
    assert lake.table("d").count() == 4
    assert sorted(r.i for r in lake.table("d").collect()) == [96, 97, 98, 99]
    live_deletes = lake.meta.query(
        "SELECT COUNT(*) FROM ducklake_delete_file WHERE end_snapshot IS NULL"
    )[0][0]
    assert live_deletes == 0


def test_expire_and_cleanup(lake, spark, tmp_path):
    import os

    _mk(lake, spark, n=20, files=2)
    lake.delete("d", "i < 10")  # drops file 1 entirely
    expired = lake.expire_snapshots(older_than="9999-01-01")
    assert expired
    removed = lake.cleanup_old_files(cleanup_all=True)
    assert removed
    for rel in removed:
        assert not os.path.exists(os.path.join(str(tmp_path / "data"), rel))
    assert lake.table("d").count() == 10


def test_inlining_roundtrip(lake, spark, tmp_path):
    from ducklake_spark.lake import DuckLake

    lk = DuckLake.attach(
        spark, conftest.catalog_url(tmp_path / "x2"), str(tmp_path / "data2"),
        data_inlining_row_limit=10,
    )
    lk.create_table("inl", [("i", "int32"), ("v", "varchar")])
    lk.insert("inl", spark.createDataFrame([(1, "a"), (2, "b")], "i int, v string"))
    # no parquet written
    assert lk.meta.query("SELECT COUNT(*) FROM ducklake_data_file")[0][0] == 0
    assert lk.table("inl").count() == 2
    # big insert goes to parquet
    lk.insert(
        "inl",
        spark.createDataFrame([(i, f"v{i}") for i in range(3, 40)], "i int, v string"),
    )
    assert lk.table("inl").count() == 39
    # delete hits inlined rows too
    n = lk.delete("inl", "i = 1")
    assert n == 1
    assert lk.table("inl").count() == 38
    # flush moves inlined rows to parquet — the count is the flushed
    # FILE's row count, which includes end-stamped (deleted) generations
    # since the reference writes every row with embedded snapshot ids
    # and masks deleted ones with a positional delete file
    # (ducklake_flush_inlined_data.cpp:204 "rows_flushed += file.row_count")
    flushed = lk.flush_inlined_data()
    assert flushed == 2
    assert lk.table("inl").count() == 38
    rows = {r.i for r in lk.table("inl").collect()}
    assert 2 in rows and 1 not in rows


def test_checkpoint_runs(lake, spark):
    _mk(lake, spark, n=30, files=3)
    lake.delete("d", "i = 0")
    lake.checkpoint()
    assert lake.table("d").count() == 29


def test_inlined_deletions_roundtrip(lake, spark):
    """Small deletes absorb into the catalog (no delete parquet),
    subtract from scans/time-travel/CDC, and flush to a positional
    delete file (reference: deletion inlining + flush)."""
    import glob as g

    from pyspark.sql import functions as F

    from ducklake_spark.cdc import table_changes
    from ducklake_spark.maintenance import flush_inlined_data

    lake.create_table("t", [("i", "int64")])
    lake.set_option("deletion_inlining_row_limit", "10", table_name="t")
    lake.insert("t", spark.range(100).coalesce(1).select(F.col("id").alias("i")))
    snap_before = lake.current_snapshot()

    from ducklake_spark.dml import delete

    n = delete(lake, "t", "i < 3")
    assert n == 3
    # no delete parquet was written
    assert not [f for f in g.glob(f"{lake.data_path}/**/*.parquet", recursive=True)
                if "delete" in f]
    assert lake.table("t").count() == 97
    assert {r.i for r in lake.table("t", where="i < 5").collect()} == {3, 4}
    # time travel still sees the rows
    assert lake.table("t", at_version=snap_before).count() == 100
    # CDC reports the inlined deletions
    ch = table_changes(lake, "t", snap_before + 1, lake.current_snapshot())
    assert {(r.i, r.change_type) for r in ch.collect()} == {
        (0, "delete"), (1, "delete"), (2, "delete")
    }

    # a second small delete stacks on top
    delete(lake, "t", "i = 50")
    assert lake.table("t").count() == 96

    # flush converts to a delete parquet; scan unchanged
    flush_inlined_data(lake, table="t")
    dels = [f for f in g.glob(f"{lake.data_path}/**/*.parquet", recursive=True)
            if "delete" in f]
    assert len(dels) == 1
    assert lake.table("t").count() == 96
    # large delete after flush merges with the flushed file
    delete(lake, "t", "i >= 90")
    assert lake.table("t").count() == 86


def test_merge_expressions_and_delete_action(lake, spark):
    """Distributed MERGE: update expressions over t./s. aliases, and
    the WHEN MATCHED DELETE action; rowids preserved across updates."""
    from pyspark.sql import functions as F

    lake.create_table("m", [("k", "int64"), ("v", "int64")])
    lake.insert("m", spark.createDataFrame([(1, 10), (2, 20), (3, 30)],
                                           "k long, v long"))
    src = spark.createDataFrame([(2, 5), (4, 40)], "k long, v long")
    counts = lake.merge(
        "m", src, ["k"], when_matched_update={"v": "t.v + s.v"},
    )
    assert counts == {"updated": 1, "deleted": 0, "inserted": 1}
    rows = {r.k: r.v for r in lake.table("m").collect()}
    assert rows == {1: 10, 2: 25, 3: 30, 4: 40}
    # rowid of the updated row survived the rewrite
    rid = {r.k: r.rowid for r in lake.table("m", with_virtual=True).collect()}
    assert rid[2] == 1  # original insert order 0,1,2

    counts = lake.merge(
        "m", spark.createDataFrame([(1,)], "k long"), ["k"],
        when_matched_delete=True, when_not_matched_insert=False,
    )
    assert counts == {"updated": 0, "deleted": 1, "inserted": 0}
    assert sorted(r.k for r in lake.table("m").collect()) == [2, 3, 4]


def test_delete_apply_shuffle_path(lake, spark):
    """With delete_broadcast_row_limit=0 every scan takes the shuffle
    anti-join path for delete application — results identical to the
    broadcast path (SURVEY §4: strategy chosen by delete_count)."""
    from ducklake_spark.dml import delete

    lake.create_table("sb", [("i", "int64")])
    lake.insert("sb", spark.range(1000).selectExpr("id AS i"))
    assert delete(lake, "sb", "i % 10 = 0") == 100
    lake.meta.set_option("delete_broadcast_row_limit", "0")
    df = lake.table("sb")
    assert df.count() == 900
    assert df.filter("i % 10 = 0").count() == 0
    # (AQE may still choose broadcast at runtime for a small set — the
    # point is the PLANNED side has no forced broadcast hint and results
    # stay identical)
    lake.meta.set_option("delete_broadcast_row_limit", "1000000")
    assert lake.table("sb").count() == 900


def test_update_with_delete_file_and_inlined_deletes(spark, tmp_path):
    """Regression mirror of reference issue 865
    (test/sql/issues/issue_865_update_wrong_result.test): a data file
    carrying BOTH a committed positional delete file and committed
    inlined deletions must not yield duplicate rows through UPDATE."""
    from ducklake_spark.dml import delete, update
    from ducklake_spark.lake import DuckLake

    lake = DuckLake.attach(
        spark, str(tmp_path / "meta865.db"), str(tmp_path / "data865"),
        data_inlining_row_limit=10,
    )
    lake.create_table("t865", [("id", "int64"), ("val", "varchar")])
    lake.set_option("deletion_inlining_row_limit", "10", table_name="t865")
    lake.insert(
        "t865",
        spark.range(100).selectExpr("id", "'original' AS val").coalesce(1),
    )
    assert delete(lake, "t865", "id >= 80") == 20  # -> delete file
    assert lake.table("t865").count() == 80
    assert delete(lake, "t865", "id >= 75") == 5   # -> inlined deletions
    assert lake.table("t865").count() == 75
    assert update(lake, "t865", {"val": "'updated'"}, "id < 20") == 20
    assert lake.table("t865").count() == 75
    got = lake.table("t865").where("val = 'updated'").groupBy("id").count()
    assert got.where("count <> 1").count() == 0
    assert got.count() == 20
    # untouched middle range intact, exactly once each
    assert lake.table("t865").where("val = 'original'").count() == 55


def test_reserved_internal_column_names_rejected(spark, tmp_path):
    """test/sql/reserved_names/reserved_names.test"""
    import pytest as _pytest

    from ducklake_spark.lake import DuckLake, DuckLakeError

    lake = DuckLake.attach(
        spark, str(tmp_path / "metar.db"), str(tmp_path / "datar")
    )
    with _pytest.raises(DuckLakeError, match="reserved by DuckLake"):
        lake.create_table(
            "c1", [("id", "int32"), ("_ducklake_internal_snapshot_id", "int32")]
        )
    lake.create_table("c2", [("id", "int32")])
    with _pytest.raises(DuckLakeError, match="reserved by DuckLake"):
        lake.add_column("c2", "_ducklake_internal_row_id", "int64")
    with _pytest.raises(DuckLakeError, match="reserved by DuckLake"):
        lake.rename_column("c2", "id", "_ducklake_internal_x")


def test_data_path_with_hive_segment_not_autodetected(spark, tmp_path):
    """Reference issue #1027: a DATA_PATH containing key=value segments
    must not make scans hive-infer phantom partition columns."""
    from ducklake_spark.dml import delete
    from ducklake_spark.lake import DuckLake

    lake = DuckLake.attach(
        spark,
        str(tmp_path / "m1027.db"),
        str(tmp_path / "run=5" / "data"),
    )
    lake.create_table("t", [("id", "int64")])
    lake.insert("t", spark.range(1000).selectExpr("id"))
    delete(lake, "t", "id % 7 = 0")
    delete(lake, "t", "id % 5 = 0")  # second delete merges delete files
    df = lake.table("t")
    assert df.columns == ["id"]
    assert df.count() == 686
    assert df.where("id % 7 = 0 OR id % 5 = 0").count() == 0


def test_filter_on_added_default_column_pushdown(spark, tmp_path):
    """Reference issue #1135: filtering on a column added with DEFAULT
    must not let zone-map pruning drop files written before the column
    existed (they have no stats for it), and the default must satisfy
    the filter."""
    from ducklake_spark.lake import DuckLake

    lake = DuckLake.attach(
        spark, str(tmp_path / "m1135.db"), str(tmp_path / "d1135")
    )
    lake.create_table("t", [("a", "int32")])
    lake.insert("t", spark.range(10).selectExpr("CAST(id AS int) AS a"))
    lake.add_column("t", "b", "int32", default="42")
    assert lake.table("t", where="b = 42").count() == 10
    assert lake.table("t", where="b = 43").count() == 0
    lake.insert(
        "t", spark.range(5).selectExpr("CAST(id AS int) a", "CAST(7 AS int) b")
    )
    assert lake.table("t", where="b = 42").count() == 10
    assert lake.table("t", where="b = 7").count() == 5
    assert lake.table("t").count() == 15


def test_added_default_column_over_inlined_rows(spark, tmp_path):
    """ADD COLUMN ... DEFAULT over INLINED rows: scans, updates,
    deletes, and flush must all surface/materialize the default for
    rows stored under the older schema epoch."""
    from ducklake_spark import maintenance as maint
    from ducklake_spark.dml import delete, update
    from ducklake_spark.lake import DuckLake

    lake = DuckLake.attach(
        spark, str(tmp_path / "mi.db"), str(tmp_path / "di"),
        data_inlining_row_limit=50,
    )
    lake.create_table("t", [("a", "int32")])
    lake.insert("t", spark.range(10).selectExpr("CAST(id AS int) AS a"))
    lake.add_column("t", "b", "int32", default="42")
    assert lake.table("t", where="b = 42").count() == 10
    # update referencing the defaulted column, on old-epoch inlined rows
    assert update(lake, "t", {"b": "b + 1"}, "b = 42 AND a < 3") == 3
    assert lake.table("t", where="b = 43").count() == 3
    assert lake.table("t", where="b = 42").count() == 7
    # delete predicate over the defaulted column
    assert delete(lake, "t", "b = 43") == 3
    assert lake.table("t").count() == 7
    # flush materializes the default into parquet
    maint.flush_inlined_data(lake, table="t")
    assert lake.table("t", where="b = 42").count() == 7
    vals = {r.b for r in lake.table("t").collect()}
    assert vals == {42}


def test_inlining_limit_flip_deletes_and_time_travel(spark, tmp_path):
    """Reference issue #1074: deletes issued while data_inlining_row_limit
    flips on and off must replay correctly under time travel."""
    from ducklake_spark.dml import delete
    from ducklake_spark.lake import DuckLake

    lake = DuckLake.attach(
        spark, str(tmp_path / "m1074.db"), str(tmp_path / "d1074"),
        data_inlining_row_limit=0,
    )
    lake.create_table("t", [("id", "int64")])
    lake.insert("t", spark.range(100).selectExpr("id"))
    v_full = lake.current_snapshot()
    lake.set_option("data_inlining_row_limit", "100")
    delete(lake, "t", "id = 0")
    lake.set_option("data_inlining_row_limit", "0")
    delete(lake, "t", "id = 1")
    delete(lake, "t", "id = 2")
    assert lake.table("t").count() == 97
    assert lake.table("t", at_version=v_full).count() == 100


def test_rename_column_preserves_inlined_values(spark, tmp_path):
    """Inlined rows stored under an older schema epoch keep their
    values through RENAME COLUMN (epoch column-id mapping, not name),
    and a dropped-then-readded name does not resurrect old values."""
    from ducklake_spark.lake import DuckLake

    lake = DuckLake.attach(
        spark, str(tmp_path / "mr.db"), str(tmp_path / "dr"),
        data_inlining_row_limit=50,
    )
    lake.create_table("t", [("k", "int64"), ("v", "int64")])
    lake.insert("t", spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"))
    lake.rename_column("t", "v", "w")
    got = sorted((r.k, r.w) for r in lake.table("t").collect())
    assert got == [(1, 10), (2, 20)]
    assert lake.table("t", where="w = 20").count() == 1
    # drop + re-add under the same name: old values must NOT come back
    lake.drop_column("t", "w")
    lake.add_column("t", "w", "int64")
    got2 = sorted((r.k, r.w) for r in lake.table("t").collect())
    assert got2 == [(1, None), (2, None)]


def test_merge_not_matched_by_source(lake, spark):
    """WHEN NOT MATCHED BY SOURCE THEN DELETE/UPDATE (reference:
    test/sql/merge/merge_into_tpch.test_slow sync pattern)."""
    _mk(lake, spark, n=10)
    src = spark.createDataFrame(
        [(i, f"val{i}") for i in range(5)] + [(11, "new11")], "i long, v string"
    )
    # full sync: insert missing, delete rows absent from source
    counts = lake.merge(
        "d", src, ["i"],
        when_not_matched_insert=True,
        when_not_matched_by_source_delete=True,
    )
    assert counts["inserted"] == 1
    assert counts["deleted"] == 5  # i in 5..9 removed
    rows = sorted(r.i for r in lake.table("d").collect())
    assert rows == [0, 1, 2, 3, 4, 11]

    # by-source UPDATE: stamp rows missing from a new source
    src2 = spark.createDataFrame([(0, "z")], "i long, v string")
    counts2 = lake.merge(
        "d", src2, ["i"],
        when_not_matched_insert=False,
        when_not_matched_by_source_update={"v": "'stale'"},
    )
    assert counts2["updated"] == 5 and counts2["deleted"] == 0
    got = {r.i: r.v for r in lake.table("d").collect()}
    assert got[0] == "val0"  # matched row untouched (no matched action)
    assert all(got[i] == "stale" for i in [1, 2, 3, 4, 11])
    # rowids preserved through the by-source update
    rids = [r.rowid for r in lake.table("d", with_virtual=True).collect()]
    assert len(set(rids)) == 6


def test_merge_matched_and_by_source_combined(lake, spark):
    _mk(lake, spark, n=6)
    src = spark.createDataFrame(
        [(0, "u0"), (1, "u1"), (10, "n10")], "i long, v string"
    )
    counts = lake.merge(
        "d", src, ["i"],
        when_matched_update={"v": None},
        when_not_matched_insert=True,
        when_not_matched_by_source_delete=True,
    )
    assert counts["updated"] == 2
    assert counts["deleted"] == 4
    assert counts["inserted"] == 1
    got = {r.i: r.v for r in lake.table("d").collect()}
    assert got == {0: "u0", 1: "u1", 10: "n10"}


def test_txn_read_your_own_writes(spark, tmp_path):
    """Scans inside an open transaction see the txn's buffered inserts
    and deletes (reference txn visibility, e.g.
    data_inlining_txn_delete_visibility.test); time travel stays pinned."""
    from ducklake_spark.dml import delete
    from ducklake_spark.lake import DuckLake

    lake = DuckLake.attach(
        spark, str(tmp_path / "mrw.db"), str(tmp_path / "drw")
    )
    lake.create_table("t", [("id", "int64"), ("val", "int64")])
    lake.insert(
        "t", spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "id long, val long")
    )
    delete(lake, "t", "id = 1")
    s_committed = lake.current_snapshot()
    with lake.transaction():
        delete(lake, "t", "id = 2")
        assert sorted(r.id for r in lake.table("t").collect()) == [3]
        lake.insert("t", spark.createDataFrame([(9, 90)], "id long, val long"))
        assert sorted(r.id for r in lake.table("t").collect()) == [3, 9]
        # a pinned read inside the txn ignores the buffered changes
        assert sorted(
            r.id for r in lake.table("t", at_version=s_committed).collect()
        ) == [2, 3]
    assert sorted(r.id for r in lake.table("t").collect()) == [3, 9]


def test_txn_read_your_own_writes_inlined(spark, tmp_path):
    from ducklake_spark.dml import delete
    from ducklake_spark.lake import DuckLake

    lake = DuckLake.attach(
        spark, str(tmp_path / "mrwi.db"), str(tmp_path / "drwi"),
        data_inlining_row_limit=50,
    )
    lake.create_table("t", [("id", "int64")])
    lake.insert("t", spark.createDataFrame([(1,), (2,)], "id long"))
    with lake.transaction():
        lake.insert("t", spark.createDataFrame([(5,)], "id long"))
        delete(lake, "t", "id = 1")
        assert sorted(r.id for r in lake.table("t").collect()) == [2, 5]
    assert sorted(r.id for r in lake.table("t").collect()) == [2, 5]


def test_txn_scan_keeps_explicit_nulls_in_buffered_files(spark, tmp_path):
    """Read-your-own-writes must not rewrite explicitly-inserted NULLs
    to the column default: buffered overlay files have no committed
    stats rows, so 'column absent' inference must skip them."""
    from ducklake_spark.lake import DuckLake

    lake = DuckLake.attach(
        spark, str(tmp_path / "mnull.db"), str(tmp_path / "dnull")
    )
    lake.create_table("t", [("a", "int32")])
    lake.insert("t", spark.range(3).selectExpr("CAST(id AS int) AS a"))
    lake.add_column("t", "b", "int32", default="42")
    with lake.transaction():
        lake.insert(
            "t",
            spark.createDataFrame([(10, None), (11, 7)], "a int, b int"),
        )
        got = {r.a: r.b for r in lake.table("t").collect()}
        # old files surface the default; the buffered file keeps its NULL
        assert got == {0: 42, 1: 42, 2: 42, 10: None, 11: 7}
    got = {r.a: r.b for r in lake.table("t").collect()}
    assert got == {0: 42, 1: 42, 2: 42, 10: None, 11: 7}


def test_merge_inside_open_txn_with_buffered_insert(spark, tmp_path):
    """MERGE inside a user transaction whose buffer already touched the
    target REFUSES instead of silently duplicating: the committed view
    would classify buffered keys as not-matched and re-insert them.
    (Round 3 pinned the duplicate as 'documented'; the duplicate was
    wrong results — the explicit rejection is the honest contract.)"""
    from ducklake_spark.lake import DuckLake, DuckLakeError

    lake = DuckLake.attach(
        spark, str(tmp_path / "mmtx.db"), str(tmp_path / "dmtx")
    )
    lake.create_table("t", [("k", "int64"), ("v", "int64")])
    lake.insert("t", spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"))
    with lake.transaction():
        lake.insert("t", spark.createDataFrame([(3, 30)], "k long, v long"))
        src = spark.createDataFrame([(2, 99), (3, 77)], "k long, v long")
        with pytest.raises(DuckLakeError, match="open transaction"):
            lake.merge(
                "t", src, ["k"],
                when_matched_update={"v": None},
                when_not_matched_insert=True,
            )
    # the rejected merge left no trace; the buffered insert committed
    rows = sorted((r.k, r.v) for r in lake.table("t").collect())
    assert rows == [(1, 10), (2, 20), (3, 30)]


def test_merge_multi_match_raises(lake, spark):
    """A target row matched by multiple source rows must raise for
    update actions instead of updating twice (reference
    ducklake_delete.cpp:504-507); a delete-only multi-match collapses
    to one delete."""
    from ducklake_spark.lake import DuckLakeError

    _mk(lake, spark, name="mm", n=10)
    dup_src = spark.createDataFrame(
        [(5, "x"), (5, "y")], "i long, v string"
    )
    with pytest.raises(DuckLakeError, match="multiple source rows"):
        lake.merge("mm", dup_src, ["i"], when_matched_update={"v": None})
    # delete-only multi-match: one row deleted, honest count
    counts = lake.merge("mm", dup_src, ["i"], when_matched_delete=True)
    assert counts["deleted"] == 1
    assert lake.table("mm").count() == 9


def test_adopted_file_missing_variant_column_no_fake_stats(lake, spark, tmp_path):
    """add_data_files over a file that physically lacks a JSON/variant
    column must not fabricate a stats row for it — stats-row existence
    drives the initial_default 'column absent' inference."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ducklake_spark.add_files import add_data_files

    lake.create_table("adv", [("i", "int64"), ("props", "json")])
    p = str(tmp_path / "plain.parquet")
    pq.write_table(pa.table({"i": [1, 2, 3]}), p)
    add_data_files(lake, "adv", p, allow_missing=True)
    h = lake._handle("adv")
    cid = {c[1]: c[0] for c in h.columns}["props"]
    rows = lake.meta.query(
        "SELECT 1 FROM ducklake_file_column_stats "
        "WHERE table_id=? AND column_id=?",
        (h.table_id, cid),
    )
    assert rows == []
    # and the scan surfaces NULL (not a fabricated presence) for props
    got = {r.i: r.props for r in lake.table("adv").collect()}
    assert got == {1: None, 2: None, 3: None}


def test_fused_delete_fname_map_shuffle_fallback(lake, spark):
    """With delete_broadcast_row_limit=0 the fused DELETE's
    filename->catalog-path map is NOT hint-broadcast (at millions of
    candidate files that broadcast is hundreds of MB per executor);
    the join still resolves and results are identical."""
    from ducklake_spark.dml import delete

    lake.create_table("fb", [("i", "int64")])
    lake.insert("fb", spark.range(500).selectExpr("id AS i"))
    lake.insert("fb", spark.range(500, 1000).selectExpr("id AS i"))
    lake.meta.set_option("delete_broadcast_row_limit", "0")
    try:
        assert delete(lake, "fb", "i % 10 = 0") == 100
    finally:
        lake.meta.set_option("delete_broadcast_row_limit", "1000000")
    df = lake.table("fb")
    assert df.count() == 900
    assert df.filter("i % 10 = 0").count() == 0


def test_update_unknown_column_errors(lake, spark):
    """SET on a column the table doesn't have must error (reference
    binder: 'Referenced update column not found'), not silently rewrite
    matched rows unchanged."""
    import pytest as _pytest

    from ducklake_spark.dml import DuckLakeError, update

    lake.create_table("uu", [("i", "int64"), ("v", "varchar")])
    lake.insert("uu", spark.createDataFrame([(1, "a")], "i long, v string"))
    with _pytest.raises(DuckLakeError, match="does not exist"):
        update(lake, "uu", {"nope": "'x'"}, "i = 1")
