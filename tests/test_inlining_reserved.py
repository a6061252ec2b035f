"""Inlined-data edge cases — ports of test/sql/data_inlining/
inlining_reserved_column_names.test, inlining_double.test,
data_inlining_filter.test, plus the table-scoped
data_inlining_row_limit override the reserved-names test depends on.
"""

from __future__ import annotations

import pytest

import conftest


@pytest.fixture()
def lake(spark, tmp_path):
    from ducklake_spark.lake import DuckLake

    return DuckLake.attach(
        spark, conftest.catalog_url(tmp_path), str(tmp_path / "data")
    )


# -- inlining_reserved_column_names.test --------------------------------

def test_reserved_names_rejected_only_while_inlining(lake, spark):
    from ducklake_spark.lake import DuckLakeError

    lake.set_option("data_inlining_row_limit", "10")
    for bad in ("row_id", "begin_snapshot", "end_snapshot"):
        with pytest.raises(DuckLakeError, match="reserved"):
            lake.create_table("t1", [(bad, "int32"), ("v", "int32")])
    # disable inlining globally → reserved names are allowed
    lake.set_option("data_inlining_row_limit", "0")
    lake.create_table("t1", [("row_id", "int32"), ("v", "int32")])
    lake.insert("t1", spark.createDataFrame(
        [(1, 10), (2, 20)], "row_id int, v int"))
    lake.add_column("t1", "begin_snapshot", "int32")
    lake.rename_column("t1", "v", "end_snapshot")
    rows = sorted(tuple(r) for r in lake.table("t1").collect())
    assert rows == [(1, 10, None), (2, 20, None)]

    # re-enabling inlining fails while t1 has reserved names
    with pytest.raises(DuckLakeError, match="Cannot enable data inlining"):
        lake.set_option("data_inlining_row_limit", "10", table_name="t1")
    with pytest.raises(DuckLakeError, match="Cannot enable data inlining"):
        lake.set_option("data_inlining_row_limit", "10")

    # an explicit table-level 0 exempts t1 from the global enable
    lake.set_option("data_inlining_row_limit", "0", table_name="t1")
    lake.set_option("data_inlining_row_limit", "10")

    # t2 inlines (no new parquet); t1 keeps writing files
    import glob as g

    lake.create_table("t2", [("i", "int32"), ("j", "int32")])
    before = len(g.glob(f"{lake.data_path}/**/*.parquet", recursive=True))
    lake.insert("t2", spark.createDataFrame([(1, 2), (3, 4)], "i int, j int"))
    after = len(g.glob(f"{lake.data_path}/**/*.parquet", recursive=True))
    assert after == before
    lake.insert("t1", spark.createDataFrame(
        [(3, 300, 30)], "row_id int, begin_snapshot int, end_snapshot int"))
    assert len(g.glob(f"{lake.data_path}/**/*.parquet", recursive=True)) > after
    assert sorted(tuple(r) for r in lake.table("t2").collect()) == [(1, 2), (3, 4)]
    got = sorted(tuple(r) for r in lake.table("t1").collect())
    assert (3, 30, 300) in got  # (row_id, end_snapshot, begin_snapshot order)


def test_add_reserved_column_rejected_with_table_inlining(lake, spark):
    from ducklake_spark.lake import DuckLakeError

    lake.create_table("t", [("i", "int32")])
    lake.set_option("data_inlining_row_limit", "10", table_name="t")
    with pytest.raises(DuckLakeError, match="reserved"):
        lake.add_column("t", "row_id", "int32")
    with pytest.raises(DuckLakeError, match="reserved"):
        lake.rename_column("t", "i", "end_snapshot")


# -- inlining_double.test ----------------------------------------------

def test_double_round_trip_through_inlined_rows(lake, spark):
    lake.set_option("data_inlining_row_limit", "10")
    lake.create_table(
        "events2", [("id", "int32"), ("lat", "float64"), ("lon", "float64")])
    lake.insert("events2", spark.createDataFrame(
        [(1, 37.7749, -122.4194)], "id int, lat double, lon double"))
    assert [tuple(r) for r in lake.table("events2").collect()] == [
        (1, 37.7749, -122.4194)
    ]


# -- data_inlining_filter.test ------------------------------------------

def test_filter_sort_limit_over_inlined_rows(lake, spark):
    lake.set_option("data_inlining_row_limit", "10000")
    lake.create_table(
        "td", [("id", "varchar"), ("category", "varchar"),
               ("created_at", "timestamp")],
        not_null=("id", "category", "created_at"))
    import datetime

    t0 = datetime.datetime(2026, 1, 1)
    for i, (rid, cat) in enumerate(
        [("a_1", "A"), ("b_1", "B"), ("a_2", "A"),
         ("b_2", "B"), ("a_3", "A"), ("b_3", "B")]
    ):
        lake.insert("td", spark.createDataFrame(
            [(rid, cat, t0 + datetime.timedelta(seconds=i))],
            "id string, category string, created_at timestamp"))
    got = [r["id"] for r in lake.table("td", where="category='A'")
           .orderBy("created_at", ascending=False).limit(3).collect()]
    assert got == ["a_3", "a_2", "a_1"]


# -- table-scoped limit resolution --------------------------------------

def test_table_scope_inline_limit_overrides_global(lake, spark):
    import glob as g

    lake.set_option("data_inlining_row_limit", "100")
    lake.create_table("a", [("i", "int32")])
    lake.create_table("b", [("i", "int32")])
    lake.set_option("data_inlining_row_limit", "0", table_name="b")
    lake.insert("a", spark.createDataFrame([(1,)], "i int"))
    lake.insert("b", spark.createDataFrame([(1,)], "i int"))
    files = g.glob(f"{lake.data_path}/**/*.parquet", recursive=True)
    # a inlined (no file), b wrote parquet despite the global limit
    assert len(files) == 1 and "/b/" in files[0].replace("\\", "/")


# -- data_inlining_per_schema_alter.test --------------------------------

def test_schema_scope_inline_limit(lake, spark):
    import glob as g

    lake.set_option("data_inlining_row_limit", "10")
    lake.create_schema("s1")
    lake.set_option("data_inlining_row_limit", "0", schema_name="s1")
    lake.create_table("s1.t1", [("i", "int32"), ("j", "varchar")])
    lake.insert("s1.t1", spark.createDataFrame(
        [(1, "hello"), (2, "world")], "i int, j string"))
    # schema-scope 0 overrides the global 10 → parquet, not inlined
    nfiles = len(g.glob(f"{lake.data_path}/**/*.parquet", recursive=True))
    assert nfiles >= 1
    assert lake.meta.query(
        "SELECT COUNT(*) FROM ducklake_inlined_data_tables")[0][0] == 0
    # ADD COLUMN ... DEFAULT still reads through (column_schema_change path)
    lake.add_column("s1.t1", "k", "int32", default="42")
    rows = sorted(tuple(r) for r in lake.table("s1.t1").collect())
    assert rows == [(1, "hello", 42), (2, "world", 42)]
    # a table in another schema still inlines under the global limit
    lake.create_table("t2", [("i", "int32")])
    lake.insert("t2", spark.createDataFrame([(5,)], "i int"))
    assert len(
        g.glob(f"{lake.data_path}/**/*.parquet", recursive=True)) == nfiles
    # table scope beats schema scope
    lake.set_option("data_inlining_row_limit", "10", table_name="s1.t1")
    lake.insert("s1.t1", spark.createDataFrame(
        [(3, "x")], "i int, j string"))
    assert len(
        g.glob(f"{lake.data_path}/**/*.parquet", recursive=True)) == nfiles
    assert lake.table("s1.t1").count() == 3
