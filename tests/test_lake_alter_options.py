"""SET SORTED BY / NOT NULL / DEFAULT / scoped options coverage."""

from __future__ import annotations

import pytest

import conftest
from pyspark.sql import functions as F


@pytest.fixture()
def lake(spark, tmp_path):
    from ducklake_spark.lake import DuckLake

    return DuckLake.attach(spark, conftest.catalog_url(tmp_path), str(tmp_path / "data"))


def test_set_sorted_by_orders_rows_in_files(lake, spark):
    lake.create_table("t", [("k", "int64"), ("v", "varchar")])
    lake.set_sorted_by("t", [("k", "desc")])
    lake.insert(
        "t",
        spark.createDataFrame([(3, "c"), (1, "a"), (2, "b")], "k long, v string")
        .coalesce(1),
    )
    # rows inside the written file follow the sort spec
    import glob as g
    import pyarrow.parquet as pq

    files = g.glob(f"{lake.data_path}/**/*.parquet", recursive=True)
    ks = pq.read_table(files[0]).column("k").to_pylist()
    assert ks == sorted(ks, reverse=True)


def test_set_not_null_validates_and_enforces(lake, spark):
    from ducklake_spark.lake import DuckLakeError

    lake.create_table("t", [("i", "int64"), ("s", "varchar")])
    lake.insert(
        "t", spark.createDataFrame([(1, "a"), (2, None)], "i long, s string")
    )
    with pytest.raises(DuckLakeError):
        lake.set_not_null("t", "s")  # existing NULLs block the alter
    lake.set_not_null("t", "i")
    with pytest.raises(Exception):
        lake.insert("t", spark.createDataFrame([(None, "x")], "i long, s string"))
    lake.drop_not_null("t", "i")
    lake.insert("t", spark.createDataFrame([(None, "x")], "i long, s string"))
    assert lake.table("t").count() == 3


def test_set_default_applies_to_future_inserts(lake, spark):
    lake.create_table("t", [("i", "int64"), ("tag", "varchar")])
    lake.set_default("t", "tag", "'untagged'")
    lake.insert("t", spark.createDataFrame([(1,)], "i long"))
    lake.set_default("t", "tag", None)  # DROP DEFAULT
    lake.insert("t", spark.createDataFrame([(2,)], "i long"))
    rows = {r.i: r.tag for r in lake.table("t").collect()}
    assert rows == {1: "untagged", 2: None}


def test_scoped_options_drive_writer(lake, spark, tmp_path):
    lake.create_table("t", [("i", "int64")])
    lake.set_option("parquet_compression", "zstd", table_name="t")
    lake.insert("t", spark.range(1000).select(F.col("id").alias("i")))
    import glob as g
    import pyarrow.parquet as pq

    files = g.glob(f"{lake.data_path}/**/*.parquet", recursive=True)
    codecs = {
        pq.ParquetFile(f).metadata.row_group(0).column(0).compression
        for f in files
    }
    assert codecs == {"ZSTD"}
    # global scope fills where the table scope is silent
    lake.create_table("u", [("i", "int64")])
    lake.set_option("parquet_compression", "gzip")
    lake.insert("u", spark.range(10).select(F.col("id").alias("i")))
    ufiles = [f for f in g.glob(f"{lake.data_path}/**/*.parquet", recursive=True)
              if f not in files]
    assert {
        pq.ParquetFile(f).metadata.row_group(0).column(0).compression
        for f in ufiles
    } == {"GZIP"}


def test_nested_field_add_drop(lake, spark):
    lake.create_table("t", [("i", "int64"), ("s", "struct<a:int64,b:varchar>")])
    lake.insert(
        "t",
        spark.createDataFrame(
            [(1, (10, "x"))], "i long, s struct<a:long,b:string>"
        ),
    )
    lake.add_field("t", "s", "c", "float64")
    lake.insert(
        "t",
        spark.createDataFrame(
            [(2, (20, "y", 2.5))], "i long, s struct<a:long,b:string,c:double>"
        ),
    )
    rows = {r.i: r.s.asDict() for r in lake.table("t").collect()}
    assert rows[1] == {"a": 10, "b": "x", "c": None}  # old file: new field NULL
    assert rows[2] == {"a": 20, "b": "y", "c": 2.5}
    lake.drop_field("t", "s", "b")
    rows = {r.i: r.s.asDict() for r in lake.table("t").collect()}
    assert rows[1] == {"a": 10, "c": None}
    assert rows[2] == {"a": 20, "c": 2.5}


def test_nested_field_rename_reads_old_files(lake, spark):
    lake.create_table("t", [("i", "int64"), ("s", "struct<a:int64,b:varchar>")])
    lake.insert(
        "t",
        spark.createDataFrame(
            [(1, (10, "x"))], "i long, s struct<a:long,b:string>"
        ),
    )
    lake.rename_field("t", "s", "a", "alpha")
    lake.insert(
        "t",
        spark.createDataFrame(
            [(2, (20, "y"))], "i long, s struct<alpha:long,b:string>"
        ),
    )
    rows = {r.i: r.s.asDict() for r in lake.table("t").collect()}
    assert rows[1] == {"alpha": 10, "b": "x"}  # old file, old name, no rewrite
    assert rows[2] == {"alpha": 20, "b": "y"}
    # chained rename still resolves the oldest epoch
    lake.rename_field("t", "s", "alpha", "alef")
    rows = {r.i: r.s.asDict() for r in lake.table("t").collect()}
    assert rows[1]["alef"] == 10 and rows[2]["alef"] == 20


def test_nested_field_errors(lake, spark):
    from ducklake_spark.lake import DuckLakeError

    lake.create_table("t", [("s", "struct<a:int64>")])
    with pytest.raises(DuckLakeError):
        lake.drop_field("t", "s", "a")  # empty struct rejected
    with pytest.raises(DuckLakeError):
        lake.add_field("t", "s", "a", "int64")  # duplicate
    with pytest.raises(DuckLakeError):
        lake.rename_field("t", "s", "zz", "q")  # unknown field


def test_auto_compact_after_dml(lake, spark):
    lake.create_table("t", [("i", "int64")])
    lake.set_option("auto_compact", "true")
    for _ in range(3):
        lake.insert("t", spark.range(100).repartition(4)
                    .select(F.col("id").alias("i")))
    h = lake._handle("t")
    files = lake._visible_files(h, lake._resolve_snapshot(None, None), None)
    # 12 written files were compacted down behind the last insert
    assert len(files) < 12
    assert lake.table("t").count() == 300


def test_require_commit_message(lake, spark):
    lake.create_table("t", [("i", "int64")])
    lake.set_option("require_commit_message", "true")
    with pytest.raises(ValueError, match="require_commit_message"):
        lake.insert("t", spark.createDataFrame([(1,)], "i long"))
    lake.set_commit_message("me", "loaded batch 1")
    lake.insert("t", spark.createDataFrame([(1,)], "i long"))
    assert lake.table("t").count() == 1


def test_option_per_thread_output_single_file(lake, spark):
    """per_thread_output=false -> one data file per insert (reference
    COPY semantics, ducklake_insert.cpp:531-534)."""
    lake.meta.set_option("per_thread_output", "false")
    lake.create_table("pto", [("i", "int64")])
    lake.insert("pto", spark.range(1000).selectExpr("id AS i").repartition(8))
    n = lake.meta.query(
        "SELECT COUNT(*) FROM ducklake_data_file WHERE end_snapshot IS NULL"
    )[0][0]
    assert n == 1
    assert lake.table("pto").count() == 1000


def test_option_parquet_version_and_level(lake, spark):
    import pyarrow.parquet as pq
    import os

    lake.meta.set_option("parquet_version", "V1")
    lake.meta.set_option("parquet_compression", "zstd")
    lake.meta.set_option("parquet_compression_level", "10")
    lake.create_table("pvv", [("i", "int64")])
    lake.insert("pvv", spark.range(100).selectExpr("id AS i").coalesce(1))
    (path,) = lake.meta.query(
        "SELECT path FROM ducklake_data_file WHERE end_snapshot IS NULL"
    )[0]
    pf = pq.ParquetFile(os.path.join(
        lake.data_path, lake._handle("pvv").path + path))
    assert pf.metadata.row_group(0).column(0).compression.lower() == "zstd"


def test_option_hive_file_pattern(lake, spark):
    """Default layout places partitioned files in <col>=<value>/ dirs
    (reference disable_hive_partitioning.test); false keeps flat."""
    import os

    from pyspark.sql import functions as F

    lake.create_table("hfp", [("i", "int64"), ("k", "varchar")])
    lake.set_partitioned_by("hfp", [("k", "identity")])
    lake.insert(
        "hfp",
        spark.range(10).select(F.col("id").alias("i"), F.lit("a").alias("k")),
    )
    paths = [
        p for (p,) in lake.meta.query(
            "SELECT path FROM ducklake_data_file WHERE end_snapshot IS NULL"
        )
    ]
    assert all("k=a" in p for p in paths), paths
    assert lake.table("hfp", where="k = 'a'").count() == 10

    lake.meta.set_option("hive_file_pattern", "false")
    lake.create_table("hfp2", [("i", "int64"), ("k", "varchar")])
    lake.set_partitioned_by("hfp2", [("k", "identity")])
    lake.insert(
        "hfp2",
        spark.range(10).select(F.col("id").alias("i"), F.lit("b").alias("k")),
    )
    paths2 = [
        p for (p,) in lake.meta.query(
            "SELECT d.path FROM ducklake_data_file d JOIN ducklake_table t "
            "ON d.table_id = t.table_id WHERE t.table_name = 'hfp2'"
        )
    ]
    assert all("k=b" not in p for p in paths2), paths2
    assert lake.table("hfp2", where="k = 'b'").count() == 10


def test_read_only_attach(lake, spark, tmp_path):
    """READ_ONLY attach: scans work, every write path is rejected, and
    attaching a non-existent catalog read-only errors
    (test/sql/general/ducklake_read_only.test)."""
    from ducklake_spark.lake import DuckLake, DuckLakeError

    lake.create_table("ro", [("i", "int64")])
    lake.insert("ro", spark.range(5).select(F.col("id").alias("i")))

    ro = DuckLake.attach(
        spark, lake.metadata_path, str(tmp_path / "data"), read_only=True
    )
    assert ro.table("ro").count() == 5
    assert ro.row_count("ro") == 5
    assert [r.snapshot_id for r in ro.snapshots().collect()]
    with pytest.raises(DuckLakeError, match="read-only"):
        ro.insert("ro", spark.range(1).select(F.col("id").alias("i")))
    with pytest.raises(DuckLakeError, match="read-only"):
        ro.create_table("ro2", [("i", "int64")])
    with pytest.raises(DuckLakeError, match="read-only"):
        ro.set_option("parquet_compression", "zstd")
    with pytest.raises(DuckLakeError, match="read-only"):
        from ducklake_spark.dml import delete

        delete(ro, "ro", "i = 1")
    # writes through the original handle still work
    lake.insert("ro", spark.range(2).select(F.col("id").alias("i")))
    assert ro.table("ro").count() == 7

    with pytest.raises(DuckLakeError, match="READ_ONLY"):
        DuckLake.attach(
            spark, str(tmp_path / "nope.db"), str(tmp_path / "d2"),
            read_only=True,
        )


def test_database_size(lake, spark):
    """PRAGMA database_size equivalent (test/sql/general/database_size.test)."""
    sizes0 = lake.database_size()
    assert sizes0["data_file_bytes"] == 0
    lake.create_table("dbs", [("i", "int64")])
    lake.insert("dbs", spark.range(1000).select(F.col("id").alias("i")))
    sizes = lake.database_size()
    assert sizes["data_file_bytes"] > 0
    assert sizes["total_bytes"] >= sizes["data_file_bytes"]
    assert sizes["metadata_bytes"] is None or sizes["metadata_bytes"] > 0


def test_add_column_default_seeds_global_stats(lake, spark):
    """ADD COLUMN with a literal DEFAULT seeds table-level column stats
    at that literal, and later inserts widen them
    (test/sql/alter/add_column_default_stats.test)."""
    lake.create_table("acds", [("a", "int32")])
    lake.insert("acds", spark.range(3).selectExpr("CAST(id AS int) AS a"))
    lake.add_column("acds", "b", "int32", default="42")
    stats = {r.column_name: r for r in lake.column_stats("acds").collect()}
    assert (stats["b"].min_value, stats["b"].max_value) == ("42", "42")
    lake.insert(
        "acds", spark.range(1).selectExpr("CAST(40 AS int) a", "CAST(200 AS int) b")
    )
    stats = {r.column_name: r for r in lake.column_stats("acds").collect()}
    assert (stats["b"].min_value, stats["b"].max_value) == ("42", "200")
    # empty table: no phantom stats for the new column
    lake.create_table("acds2", [("a", "int32")])
    lake.add_column("acds2", "b", "int32", default="7")
    stats2 = {r.column_name: r for r in lake.column_stats("acds2").collect()}
    assert "b" not in stats2


def test_in_txn_sorted_by_inlined_insert_epoch_routing(spark, tmp_path):
    """BEGIN; SET SORTED BY; INSERT(inlined); COMMIT — sort_ops DOES
    bump the GLOBAL snapshot schema_version at commit (reference:
    schema_version_mixed_operations.test pins 1 -> 3 across a comment +
    real alter), so routing the in-txn inlined rows into the sv+1
    table exactly matches the committed stamp: a later real ALTER
    allocates the NEXT epoch's table and never mixes epochs
    (round-9 advisor finding adjudicated as by-design)."""
    from ducklake_spark.lake import DuckLake

    import conftest
    lake = DuckLake.attach(
        spark, conftest.catalog_url(tmp_path), str(tmp_path / "data"),
        data_inlining_row_limit=10)
    lake.create_table("t", [("k", "int64"), ("v", "varchar")])
    lake.insert("t", spark.createDataFrame([(1, "a")], "k long, v string"))
    lake.begin()
    lake.set_sorted_by("t", [("k", "asc")])
    lake.insert("t", spark.createDataFrame([(2, "b")], "k long, v string"))
    lake.commit()
    assert sorted((r.k, r.v) for r in lake.table("t").collect()) == [
        (1, "a"), (2, "b")]
    sv_after_sort = lake.meta.latest_snapshot().schema_version
    names = {r[1]: r[2] for r in lake.meta.con.execute(
        "SELECT * FROM ducklake_inlined_data_tables").fetchall()}
    # in-txn rows landed in the table matching the committed stamp
    assert f"ducklake_inlined_data_1_{sv_after_sort}" in names
    # a later real ALTER gets its own epoch (no reuse/mixing)
    lake.add_column("t", "w", "int64")
    lake.insert("t", spark.createDataFrame(
        [(3, "c", 7)], "k long, v string, w long"))
    assert sorted((r.k, r.v, r.w) for r in lake.table("t").collect()) == [
        (1, "a", None), (2, "b", None), (3, "c", 7)]
    assert lake.meta.latest_snapshot().schema_version == sv_after_sort + 1
