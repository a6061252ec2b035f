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
