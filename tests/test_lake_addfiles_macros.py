"""add_data_files (foreign parquet adoption) + macros + comments.

Mirrors reference test/sql/add_files/*, test/sql/macros/*,
test/sql/comments/*.
"""

from __future__ import annotations

import os

import pytest

import conftest


@pytest.fixture()
def lake(spark, tmp_path):
    from ducklake_spark.lake import DuckLake

    return DuckLake.attach(spark, conftest.catalog_url(tmp_path), str(tmp_path / "data"))


def test_add_data_files_basic(lake, spark, tmp_path):
    ext = tmp_path / "external"
    spark.createDataFrame([(1, "a"), (2, "b")], "i long, v string").coalesce(
        1
    ).write.parquet(str(ext))
    lake.create_table("adopted", [("i", "int64"), ("v", "varchar")])
    n = lake.add_data_files("adopted", str(ext / "*.parquet"))
    assert n == 1
    rows = sorted((r.i, r.v) for r in lake.table("adopted").collect())
    assert rows == [(1, "a"), (2, "b")]
    # adopted rows get row ids too
    rowids = [r.rowid for r in lake.table("adopted", with_virtual=True).collect()]
    assert sorted(rowids) == [0, 1]
    # name map recorded
    assert lake.meta.query("SELECT COUNT(*) FROM ducklake_name_mapping")[0][0] == 2


def test_add_data_files_missing_column(lake, spark, tmp_path):
    from ducklake_spark.lake import DuckLakeError

    ext = tmp_path / "ext2"
    spark.createDataFrame([(1,)], "i long").coalesce(1).write.parquet(str(ext))
    lake.create_table("m", [("i", "int64"), ("j", "int64")])
    with pytest.raises(DuckLakeError):
        lake.add_data_files("m", str(ext / "*.parquet"))
    n = lake.add_data_files("m", str(ext / "*.parquet"), allow_missing=True)
    assert n == 1
    row = lake.table("m").collect()[0]
    assert row.i == 1 and row.j is None


def test_add_data_files_hive(lake, spark, tmp_path):
    ext = tmp_path / "hive"
    for cat in ("x", "y"):
        os.makedirs(ext / f"cat={cat}", exist_ok=True)
        spark.createDataFrame(
            [(1 if cat == "x" else 2,)], "i long"
        ).coalesce(1).write.mode("overwrite").parquet(str(ext / f"cat={cat}"))
    lake.create_table("hv", [("i", "int64"), ("cat", "varchar")])
    lake.set_partitioned_by("hv", [("cat", "identity")])
    n = lake.add_data_files(
        "hv", str(ext / "**" / "*.parquet"), allow_missing=True, hive_partitioning=True
    )
    assert n == 2
    rows = sorted((r.i, r.cat) for r in lake.table("hv").collect())
    assert rows == [(1, "x"), (2, "y")]
    # partition pruning works on adopted hive values
    h = lake._handle("hv")
    snap = lake.meta.latest_snapshot()
    assert len(lake._visible_files(h, snap, "cat = 'x'")) == 1


def test_scalar_and_table_macro(lake, spark):
    lake.create_table("mt", [("i", "int64")])
    lake.insert("mt", spark.range(10).withColumnRenamed("id", "i"))
    lake.create_macro("add_one", ["x"], "(x + 1)")
    assert lake.call_macro("add_one", 41) == "(41 + 1)"
    lake.create_macro(
        "top_n", ["n"], "SELECT i FROM mt ORDER BY i DESC LIMIT n", is_table_macro=True
    )
    rows = [r.i for r in lake.call_macro("top_n", 3).collect()]
    assert rows == [9, 8, 7]


def test_comments(lake, spark):
    lake.create_table("cm", [("i", "int64"), ("v", "varchar")])
    lake.set_comment("cm", "a table comment")
    lake.set_comment("cm", "col comment", column="v")
    assert lake.get_comment("cm") == "a table comment"
    assert lake.get_comment("cm", column="v") == "col comment"
    lake.set_comment("cm", "replaced")
    assert lake.get_comment("cm") == "replaced"


def test_add_files_without_stats_keeps_is_null_scan(lake, spark, tmp_path):
    # ADVICE r4: a foreign file whose writer omitted statistics must
    # store NULL (not 0) null_count, or the IS NULL prune
    # ("null_count = 0" drops the file) silently eats its rows
    import pyarrow as pa
    import pyarrow.parquet as pq

    lake.create_table("nostats", [("i", "int64"), ("v", "varchar")])
    ext = tmp_path / "ext_nostats"
    ext.mkdir()
    pq.write_table(
        pa.table({"i": [1, 2, 3], "v": ["a", None, "c"]}),
        str(ext / "f.parquet"),
        write_statistics=False,
    )
    assert lake.add_data_files("nostats", str(ext / "*.parquet")) == 1
    nc_rows = lake.meta.query(
        "SELECT null_count, value_count FROM ducklake_file_column_stats "
        "WHERE table_id=(SELECT table_id FROM ducklake_table "
        "WHERE table_name='nostats' AND end_snapshot IS NULL)")
    assert all(nc is None for nc, _vc in nc_rows)
    got = lake.table("nostats", where="v IS NULL").filter("v IS NULL")
    assert [r[0] for r in got.collect()] == [2]
    got2 = lake.table("nostats", where="v IS NOT NULL").filter("v IS NOT NULL")
    assert sorted(r[0] for r in got2.collect()) == [1, 3]


def test_add_files_type_checks(lake, spark, tmp_path):
    # reference add_files_type_check_{integer,float,string_blob,decimal}:
    # a file whose physical type cannot serve the table type fails at
    # ADD time, narrower integers adopt into wider columns
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ducklake_spark.lake import DuckLakeError

    ext = tmp_path / "ext_types"
    ext.mkdir()
    pq.write_table(pa.table({"col1": pa.array([1], pa.int32())}),
                   str(ext / "int.parquet"))
    pq.write_table(pa.table({"col1": pa.array([-1], pa.int8())}),
                   str(ext / "tinyint.parquet"))
    pq.write_table(pa.table({"col1": pa.array([True])}),
                   str(ext / "bool.parquet"))
    pq.write_table(pa.table({"col1": pa.array([1.5], pa.float64())}),
                   str(ext / "double.parquet"))

    lake.create_table("t_bool", [("col1", "boolean")])
    with pytest.raises(DuckLakeError, match="boolean"):
        lake.add_data_files("t_bool", str(ext / "int.parquet"))
    assert lake.add_data_files("t_bool", str(ext / "bool.parquet")) == 1

    lake.create_table("t_small", [("col1", "int16")])
    with pytest.raises(DuckLakeError, match="int16"):
        lake.add_data_files("t_small", str(ext / "int.parquet"))
    assert lake.add_data_files("t_small", str(ext / "tinyint.parquet")) == 1
    assert [r.col1 for r in lake.table("t_small").collect()] == [-1]

    lake.create_table("t_big", [("col1", "int64")])
    assert lake.add_data_files("t_big", str(ext / "int.parquet")) == 1
    with pytest.raises(DuckLakeError, match="float64|int64"):
        lake.add_data_files("t_big", str(ext / "double.parquet"))

    lake.create_table("t_float", [("col1", "float32")])
    with pytest.raises(DuckLakeError, match="float32"):
        lake.add_data_files("t_float", str(ext / "double.parquet"))


def test_add_files_duplicate_and_equivalent_paths(lake, spark, tmp_path):
    # reference add_files_equivalent_path_duplicate + overlapping_globs
    import pyarrow as pa
    import pyarrow.parquet as pq

    ext = tmp_path / "ext_dup"
    ext.mkdir()
    pq.write_table(pa.table({"i": pa.array([42], pa.int64())}),
                   str(ext / "one.parquet"))
    lake.create_table("dup", [("i", "int64")])
    n = lake.add_data_files(
        "dup", [str(ext / "one.parquet"), str(ext / "." / "one.parquet"),
                str(ext / "*.parquet")])
    assert n == 1
    assert lake.table("dup").count() == 1


def test_add_files_rollback_leaves_no_trace(lake, spark, tmp_path):
    # reference add_rollback: adoption inside a rolled-back transaction
    # must leave neither data-file rows nor name-map rows behind
    import pyarrow as pa
    import pyarrow.parquet as pq

    ext = tmp_path / "ext_rb"
    ext.mkdir()
    pq.write_table(pa.table({"i": pa.array([1], pa.int64())}),
                   str(ext / "f.parquet"))
    lake.create_table("rb", [("i", "int64")])
    try:
        with lake.transaction():
            lake.add_data_files("rb", str(ext / "f.parquet"))
            raise RuntimeError("abort")
    except RuntimeError:
        pass
    assert lake.table("rb").count() == 0
    assert lake.meta.query("SELECT COUNT(*) FROM ducklake_column_mapping")[0][0] == 0
    assert lake.meta.query("SELECT COUNT(*) FROM ducklake_name_mapping")[0][0] == 0
    # and a successful retry still works
    assert lake.add_data_files("rb", str(ext / "f.parquet")) == 1
    assert lake.table("rb").count() == 1


def test_add_files_hive_mismatch_and_empty(lake, spark, tmp_path):
    # reference add_files_hive_mismatch.test + add_empty_file.test
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ducklake_spark.lake import DuckLakeError

    ext = tmp_path / "ext_hive" / "part_key=p1"
    ext.mkdir(parents=True)
    pq.write_table(pa.table({"val": pa.array(["hello"])}),
                   str(ext / "f.parquet"))
    lake.create_table("hv_int", [("part_key", "int32"), ("val", "varchar")])
    with pytest.raises(DuckLakeError, match="Unable to cast 'p1'"):
        lake.add_data_files("hv_int", str(tmp_path / "ext_hive" / "**"),
                            hive_partitioning=True)
    lake.create_table("hv_str", [("part_key", "varchar"), ("val", "varchar")])
    assert lake.add_data_files("hv_str", str(tmp_path / "ext_hive" / "**"),
                               hive_partitioning=True) == 1
    rows = lake.table("hv_str").collect()
    assert [tuple(r) for r in rows] == [("p1", "hello")]
    # empty foreign parquet registers and scans as zero rows
    empty = tmp_path / "ext_empty"
    empty.mkdir()
    pq.write_table(pa.table({"part_key": pa.array([], pa.string()),
                             "val": pa.array([], pa.string())}),
                   str(empty / "e.parquet"))
    assert lake.add_data_files("hv_str", str(empty / "e.parquet")) == 1
    assert lake.table("hv_str").count() == 1


def test_macro_default_parameters(lake, spark):
    # reference macros/test_default_parameter.test
    lake.create_macro("add_default", ["a", "b := 5"], "a + b")
    assert lake.call_macro("add_default", 1) == "1 + 5"
    assert lake.call_macro("add_default", 1, 3) == "1 + 3"
    rows = lake.meta.query(
        "SELECT parameter_name, default_value FROM ducklake_macro_parameters "
        "WHERE macro_id=(SELECT macro_id FROM ducklake_macro "
        "WHERE macro_name='add_default') ORDER BY column_id")
    assert rows == [("a", None), ("b", "5")]
    from ducklake_spark.lake import DuckLakeError

    with pytest.raises(DuckLakeError, match="last"):
        lake.create_macro("bad", ["a := 1", "b"], "a + b")


def test_macro_multiple_implementations(lake, spark):
    # reference macros/test_multiple_implementations.test
    lake.create_macro(
        "multi_add",
        overloads=[([], "0"), (["a"], "a"), (["a", "b"], "a + b"),
                   (["a", "b", "c"], "a + b + c")])
    assert lake.call_macro("multi_add") == "0"
    assert lake.call_macro("multi_add", 7) == "7"
    assert lake.call_macro("multi_add", 1, 2) == "1 + 2"
    assert lake.call_macro("multi_add", 1, 2, 3) == "1 + 2 + 3"
    from ducklake_spark.lake import DuckLakeError

    with pytest.raises(DuckLakeError, match="no implementation"):
        lake.call_macro("multi_add", 1, 2, 3, 4)
    with pytest.raises(DuckLakeError, match="distinct"):
        lake.create_macro("dup", overloads=[(["a"], "a"), (["x"], "x")])


def test_add_files_legacy_list_unwrap_gated_on_parquet_schema(
        lake, spark, tmp_path):
    """The legacy avro 2-level list unwrap (add_old_list.test) must key
    on the PARQUET schema's backward-compat shape, not on the arrow
    field name: a genuine list<struct<array: T>> column written by a
    modern 3-level writer is type-checked against the STRUCT (round-9
    advisor finding)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ducklake_spark.lake import DuckLakeError

    ext = tmp_path / "ext3"
    ext.mkdir()
    pq.write_table(
        pa.table({"l": pa.array([[{"array": 7}]],
                                pa.list_(pa.struct([("array", pa.int64())])))}),
        str(ext / "f.parquet"))
    # declared as the struct it really is: adopts and reads back
    lake.create_table("gs", [("l", "list<struct<array:int64>>")])
    assert lake.add_data_files("gs", str(ext / "*.parquet")) == 1
    assert [[row.asDict() for row in r.l]
            for r in lake.table("gs").collect()] == [[{"array": 7}]]
    # mis-declared as list<int64>: the old name-based unwrap ACCEPTED
    # this; the parquet-schema gate rejects it
    lake.create_table("gm", [("l", "list<int64>")])
    try:
        lake.add_data_files("gm", str(ext / "*.parquet"))
        raise AssertionError("expected type-check rejection")
    except DuckLakeError:
        pass
    # the reference's real legacy fixture still adopts
    import shutil
    lake.create_table("old", [("a", "list<list<int32>>")])
    legacy = tmp_path / "legacy"
    legacy.mkdir()
    shutil.copy("/root/reference/data/parquet/old_list_structure.parquet",
                str(legacy / "old.parquet"))
    assert lake.add_data_files("old", str(legacy / "*.parquet")) == 1
    assert [r.a for r in lake.table("old").collect()] == [[[1, 2], [3, 4]]]
