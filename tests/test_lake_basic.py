"""Lakehouse core: create/insert/scan/persist, snapshots, time travel.

Mirrors reference test/sql/ducklake_basic.test and
test/sql/time_travel/basic_time_travel.test.
"""

from __future__ import annotations

import pytest

import conftest

from pyspark.sql import Row
from pyspark.sql import functions as F


@pytest.fixture()
def lake(spark, tmp_path):
    from ducklake_spark.lake import DuckLake

    return DuckLake.attach(
        spark, conftest.catalog_url(tmp_path), str(tmp_path / "data")
    )


def test_create_insert_scan(lake, spark):
    lake.create_table("t1", [("i", "int32"), ("j", "int32")])
    df = spark.createDataFrame([(1, 2), (None, 3), (4, 5), (6, 7)], "i int, j int")
    lake.insert("t1", df)
    out = lake.table("t1").orderBy("j").collect()
    assert [(r.i, r.j) for r in out] == [(1, 2), (None, 3), (4, 5), (6, 7)]


def test_reattach_persistence(lake, spark, tmp_path):
    from ducklake_spark.lake import DuckLake

    lake.create_table("t1", [("i", "int64")])
    lake.insert("t1", spark.range(10).withColumnRenamed("id", "i"))
    lake2 = DuckLake.attach(spark, conftest.catalog_url(tmp_path), str(tmp_path / "data"))
    assert lake2.table("t1").count() == 10


def test_multiple_inserts_rowids(lake, spark):
    lake.create_table("t", [("i", "int64")])
    lake.insert("t", spark.range(5).withColumnRenamed("id", "i"))
    lake.insert("t", spark.range(5, 10).withColumnRenamed("id", "i"))
    out = lake.table("t", with_virtual=True).select("i", "rowid").orderBy("rowid")
    rows = out.collect()
    assert [r.rowid for r in rows] == list(range(10))
    assert [r.i for r in rows] == list(range(10))


def test_snapshots_and_time_travel(lake, spark):
    lake.create_table("tt", [("i", "int32"), ("v", "varchar")])
    lake.insert("tt", spark.createDataFrame([(1, "a")], "i int, v string"))
    s1 = lake.current_snapshot()
    lake.insert("tt", spark.createDataFrame([(2, "b")], "i int, v string"))
    s2 = lake.current_snapshot()
    assert s2 == s1 + 1
    assert lake.table("tt", at_version=s1).count() == 1
    assert lake.table("tt", at_version=s2).count() == 2
    # snapshots() surface
    snaps = lake.snapshots().collect()
    assert snaps[0].snapshot_id == 0
    assert any("tables_inserted_into" in r.changes for r in snaps)


def test_time_travel_before_table(lake, spark):
    from ducklake_spark.lake import DuckLakeError

    s0 = lake.current_snapshot()
    lake.create_table("later", [("i", "int32")])
    with pytest.raises(DuckLakeError):
        lake.table("later", at_version=s0)


def test_drop_and_rename(lake, spark):
    from ducklake_spark.lake import DuckLakeError

    lake.create_table("a", [("i", "int32")])
    lake.insert("a", spark.createDataFrame([(1,)], "i int"))
    lake.rename_table("a", "b")
    assert lake.table("b").count() == 1
    with pytest.raises(DuckLakeError):
        lake.table("a")
    lake.drop_table("b")
    with pytest.raises(DuckLakeError):
        lake.table("b")


def test_ctas(lake, spark):
    lake.create_table_as("ct", spark.range(7).withColumnRenamed("id", "x"))
    assert lake.table("ct").count() == 7
    assert lake.table("ct").columns == ["x"]


def test_not_null_enforced(lake, spark):
    lake.create_table("nn", [("i", "int32"), ("j", "int32")], not_null=("i",))
    with pytest.raises(Exception):
        lake.insert("nn", spark.createDataFrame([(None, 1)], "i int, j int"))
    lake.insert("nn", spark.createDataFrame([(1, None)], "i int, j int"))
    assert lake.table("nn").count() == 1


def test_table_info_and_list_files(lake, spark):
    lake.create_table("ti", [("i", "int64")])
    lake.insert("ti", spark.range(100).withColumnRenamed("id", "i"))
    info = {r.table_name: r for r in lake.table_info().collect()}
    assert info["ti"].file_count >= 1
    files = lake.list_files("ti").collect()
    assert all(f.data_file.endswith(".parquet") for f in files)


def test_schema_evolution_add_drop_column(lake, spark):
    lake.create_table("se", [("i", "int32")])
    lake.insert("se", spark.createDataFrame([(1,)], "i int"))
    lake.add_column("se", "j", "int32")
    lake.insert("se", spark.createDataFrame([(2, 20)], "i int, j int"))
    rows = lake.table("se").orderBy("i").collect()
    assert [(r.i, r.j) for r in rows] == [(1, None), (2, 20)]
    lake.drop_column("se", "j")
    assert lake.table("se").columns == ["i"]
    # old snapshot still sees j
    snaps = [r.snapshot_id for r in lake.snapshots().collect()]
    assert lake.table("se", at_version=snaps[-2]).columns == ["i", "j"]


def test_rename_column_field_id_read(lake, spark):
    lake.create_table("rc", [("i", "int32"), ("v", "varchar")])
    lake.insert("rc", spark.createDataFrame([(1, "x")], "i int, v string"))
    lake.rename_column("rc", "v", "w")
    rows = lake.table("rc").collect()
    assert rows[0].w == "x"  # field-id-based resolution maps old file column


def test_type_promotion(lake, spark):
    from ducklake_spark.lake import DuckLakeError

    lake.create_table("tp", [("i", "int32")])
    lake.insert("tp", spark.createDataFrame([(1,)], "i int"))
    lake.change_column_type("tp", "i", "int64")
    assert dict(lake.table("tp").dtypes)["i"] == "bigint"
    with pytest.raises(DuckLakeError):
        lake.change_column_type("tp", "i", "int32")  # narrowing rejected


def test_views(lake, spark):
    lake.create_table("vt", [("i", "int64")])
    lake.insert("vt", spark.range(4).withColumnRenamed("id", "i"))
    lake.create_view("v1", "SELECT i * 2 AS d FROM vt")
    assert sorted(r.d for r in lake.view("v1").collect()) == [0, 2, 4, 6]


def test_transaction_groups_snapshot(lake, spark):
    with lake.transaction():
        lake.create_table("g1", [("i", "int32")])
        lake.create_table("g2", [("i", "int32")])
    snaps = lake.snapshots().collect()
    assert "tables_created" in snaps[-1].changes
    assert len(snaps[-1].changes["tables_created"]) == 2


def test_scan_pushes_filters_and_prunes_columns(lake, spark):
    """Plan quality: predicates reach the parquet scan (PushedFilters)
    and unreferenced columns are pruned from ReadSchema — the two
    .explain properties that matter at 100 TB (SURVEY §4)."""
    from pyspark.sql import functions as F

    lake.create_table("pq", [("a", "int64"), ("b", "varchar"), ("c", "float64")])
    lake.insert(
        "pq",
        spark.range(1000).select(
            F.col("id").alias("a"),
            F.concat(F.lit("v"), F.col("id")).alias("b"),
            (F.col("id") * 1.5).alias("c"),
        ),
    )
    df = lake.table("pq", where="a > 500").select("a", "b")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "GreaterThan(a,500)" in plan
    scan_line = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "c:" not in scan_line  # unused column pruned from the scan


def test_distributed_footer_harvest(spark, tmp_path, monkeypatch):
    """Large writes harvest footers executor-side; catalog rows must be
    identical in shape to the driver-loop path."""
    from ducklake_spark.lake import DuckLake

    monkeypatch.setattr(DuckLake, "DISTRIBUTED_HARVEST_MIN_FILES", 1)
    lake = DuckLake.attach(
        spark, conftest.catalog_url(tmp_path / "dh"), str(tmp_path / "dhd")
    )
    lake.create_table("t", [("i", "int64"), ("v", "varchar")])
    lake.insert(
        "t",
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(100)], "i long, v string"
        ).repartition(4),
    )
    files = lake.meta.query(
        "SELECT record_count, file_size_bytes, footer_size "
        "FROM ducklake_data_file WHERE end_snapshot IS NULL"
    )
    assert len(files) == 4
    assert sum(r[0] for r in files) == 100
    assert all(r[1] > 0 and r[2] > 0 for r in files)
    stats = lake.meta.query(
        "SELECT min_value, max_value FROM ducklake_file_column_stats "
        "WHERE column_id = (SELECT column_id FROM ducklake_column "
        "WHERE column_name = 'i' AND end_snapshot IS NULL)"
    )
    assert len(stats) == 4 and all(s[0] is not None for s in stats)
    assert lake.table("t").count() == 100
    assert lake.table("t", where="i = 5").count() == 1
    assert lake.row_count("t") == 100


def test_time_travel_views(lake, spark):
    """Views resolve their definition AND their tables at the pinned
    snapshot (test/sql/time_travel/time_travel_views.test)."""
    from ducklake_spark.lake import DuckLakeError

    lake.create_table("ttv", [("i", "int32"), ("j", "int32")])
    v_before_view = lake.current_snapshot()
    lake.create_view(
        "v1", "SELECT i * 100 AS i, j * 100 AS j FROM ttv ORDER BY i"
    )
    v_empty = lake.current_snapshot()
    lake.insert("ttv", spark.createDataFrame([(1, 2), (2, 3)], "i int, j int"))
    v_two = lake.current_snapshot()
    lake.insert("ttv", spark.createDataFrame([(3, 4), (5, 6)], "i int, j int"))

    assert [(r.i, r.j) for r in lake.view("v1").collect()] == [
        (100, 200), (200, 300), (300, 400), (500, 600)
    ]
    with pytest.raises(DuckLakeError, match="does not exist at version"):
        lake.view("v1", at_version=v_before_view)
    assert lake.view("v1", at_version=v_empty).count() == 0
    assert [(r.i, r.j) for r in lake.view("v1", at_version=v_two).collect()] == [
        (100, 200), (200, 300)
    ]


def test_mixed_alter_compaction_epochs(lake, spark):
    """Add/drop/re-add (different type) + compaction across schema
    epochs: old column values must not resurrect into the re-added
    name, and compaction preserves the evolved shape
    (test/sql/compaction/compaction_alter_table.test)."""
    lake.create_table("mx", [("id", "int32"), ("i", "int32")])
    lake.insert("mx", spark.createDataFrame([(1, 10)], "id int, i int"))
    lake.insert("mx", spark.createDataFrame([(2, 20)], "id int, i int"))
    lake.add_column("mx", "j", "int32")
    lake.insert("mx", spark.createDataFrame([(3, 30, 300)], "id int, i int, j int"))
    lake.drop_column("mx", "i")
    lake.insert("mx", spark.createDataFrame([(5, 500)], "id int, j int"))
    lake.add_column("mx", "i", "varchar")
    lake.insert(
        "mx", spark.createDataFrame([(7, 700, "hello")], "id int, j int, i string")
    )
    expected = [
        (1, None, None), (2, None, None), (3, 300, None),
        (5, 500, None), (7, 700, "hello"),
    ]
    got = [tuple(r) for r in lake.table("mx").orderBy("id").collect()]
    assert got == expected
    s_before = lake.current_snapshot()
    lake.merge_adjacent_files()
    got2 = [tuple(r) for r in lake.table("mx").orderBy("id").collect()]
    assert got2 == expected
    assert [
        tuple(r) for r in lake.table("mx", at_version=s_before).orderBy("id").collect()
    ] == expected


def test_sql_view_cache_sees_new_snapshots(lake, spark):
    """sql() caches view registration per snapshot — a write (here via a
    second attach, and via this lake) must invalidate it, and time-travel
    sql() must not poison the latest-version cache."""
    lake.create_table("sv", [("i", "int64")])
    lake.insert("sv", spark.range(3).withColumnRenamed("id", "i"))
    assert lake.sql("SELECT count(*) AS c FROM sv").collect()[0].c == 3
    s1 = lake.current_snapshot()
    lake.insert("sv", spark.range(3, 5).withColumnRenamed("id", "i"))
    assert lake.sql("SELECT count(*) AS c FROM sv").collect()[0].c == 5
    # time travel bypasses + repopulates correctly
    assert lake.sql("SELECT count(*) AS c FROM sv", at_version=s1).collect()[0].c == 3
    assert lake.sql("SELECT count(*) AS c FROM sv").collect()[0].c == 5
    # inside an open transaction the overlay is consulted every call
    with lake.transaction():
        lake.insert("sv", spark.range(5, 6).withColumnRenamed("id", "i"))
        assert lake.sql("SELECT count(*) AS c FROM sv").collect()[0].c == 6
    assert lake.sql("SELECT count(*) AS c FROM sv").collect()[0].c == 6


def test_update_no_extra_count_job(lake, spark):
    """UPDATE's return count comes from written-file footers; a no-match
    UPDATE registers no snapshot and leaves no orphan files."""
    lake.create_table("uc", [("i", "int64"), ("v", "varchar")])
    lake.insert(
        "uc", spark.createDataFrame([(1, "a"), (2, "b")], "i long, v string")
    )
    s0 = lake.current_snapshot()
    assert lake.update("uc", {"v": "'z'"}, "i = 99") == 0
    assert lake.current_snapshot() == s0  # no-op: no snapshot
    assert lake.update("uc", {"v": "'z'"}, "i = 2") == 1
    got = sorted(tuple(r) for r in lake.table("uc").collect())
    assert got == [(1, "a"), (2, "z")]


def test_settings_descriptor(lake, spark):
    # reference test/sql/metadata/ducklake_settings.test: one row of
    # (catalog_type, extension_version, data_path)
    row = lake.settings().collect()[0]
    assert row.catalog_type in ("sqlite", "duckdb", "postgres")
    assert row.extension_version
    assert row.data_path == lake.data_path


def test_view_column_aliases(lake, spark):
    """CREATE VIEW v(x, y) AS ... renames output columns positionally
    (reference ducklake_view.column_aliases;
    test/sql/issues/view_tosql_performance.test)."""
    lake.create_view("aliased_view", "SELECT 1, 2",
                     column_aliases=["x", "y"])
    df = lake.view("aliased_view")
    assert df.columns == ["x", "y"]
    assert [tuple(r) for r in df.collect()] == [(1, 2)]
    # a view ON the aliased view binds through the aliased names
    lake.create_view("v2", "SELECT x + y AS s FROM aliased_view")
    assert [r.s for r in lake.view("v2").collect()] == [3]
    # rename preserves the aliases
    lake.rename_view("aliased_view", "renamed_aliased")
    assert lake.view("renamed_aliased").columns == ["x", "y"]
