"""Sorted-table parity — ports of test/sql/sorted_table/:
insert_sorted_expression, insert_sorted_sort_on_insert_option,
merge_adjacent_sorted_basic, set_sorted_by_rollback_basic,
drop_sorted_column, merge_adjacent_sorted_renamed,
merge_adjacent_sorted_reset.
"""

from __future__ import annotations

import glob as g

import pyarrow.parquet as pq
import pytest

import conftest


@pytest.fixture()
def lake(spark, tmp_path):
    from ducklake_spark.lake import DuckLake

    return DuckLake.attach(
        spark, conftest.catalog_url(tmp_path), str(tmp_path / "data")
    )


def _file_col(lake, col, *, newest=False):
    files = sorted(
        g.glob(f"{lake.data_path}/**/*.parquet", recursive=True),
        key=lambda p: p,
    )
    if newest:
        files = sorted(files, key=lambda p: __import__("os").path.getmtime(p))
        return pq.read_table(files[-1]).column(col).to_pylist()
    assert len(files) == 1
    return pq.read_table(files[0]).column(col).to_pylist()


# -- insert_sorted_expression.test --------------------------------------

def test_insert_sorted_by_concat_expression(lake, spark):
    lake.create_table("t", [("first_name", "varchar"), ("last_name", "varchar")])
    lake.set_sorted_by("t", [("concat(last_name, ', ', first_name)", "asc")])
    lake.insert("t", spark.createDataFrame(
        [("John", "Smith"), ("Alice", "Brown"), ("Bob", "Johnson")],
        "first_name string, last_name string").coalesce(1))
    assert _file_col(lake, "last_name") == ["Brown", "Johnson", "Smith"]


def test_insert_sorted_by_arithmetic_expression(lake, spark):
    lake.create_table("t", [("a", "int32"), ("b", "int32")])
    lake.set_sorted_by("t", [("(a + b)", "desc")])
    lake.insert("t", spark.createDataFrame(
        [(1, 2), (5, 1), (2, 2), (3, 5)], "a int, b int").coalesce(1))
    assert _file_col(lake, "a") == [3, 5, 2, 1]


def test_insert_sorted_multi_expression(lake, spark):
    lake.create_table(
        "t", [("a", "int32"), ("b", "int32"), ("name", "varchar")])
    lake.set_sorted_by("t", [("length(name)", "asc"), ("(a * b)", "desc")])
    lake.insert("t", spark.createDataFrame(
        [(3, 4, "ab"), (2, 5, "abc"), (1, 1, "ab"), (5, 2, "abc"), (7, 1, "a")],
        "a int, b int, name string").coalesce(1))
    names = _file_col(lake, "name")
    azs = _file_col(lake, "a")
    assert names == ["a", "ab", "ab", "abc", "abc"]
    assert azs[0] == 7 and azs[1] == 3 and azs[2] == 1  # 12 > 1 within len=2


def test_invalid_sort_key_rejected(lake, spark):
    from ducklake_spark.lake import DuckLakeError

    lake.create_table("t", [("a", "int32")])
    with pytest.raises(DuckLakeError):
        lake.set_sorted_by("t", [("no_such_column", "asc")])
    with pytest.raises(DuckLakeError):
        lake.set_sorted_by("t", [("a", "sideways")])


# -- insert_sorted_sort_on_insert_option.test ---------------------------

def test_sort_on_insert_false_preserves_order(lake, spark):
    lake.create_table("t", [("i", "int32")])
    lake.set_sorted_by("t", [("i", "asc")])
    lake.set_option("sort_on_insert", "false")
    lake.insert("t", spark.createDataFrame(
        [(3,), (1,), (5,), (2,), (4,)], "i int").coalesce(1))
    assert _file_col(lake, "i") == [3, 1, 5, 2, 4]
    lake.set_option("sort_on_insert", "true")
    lake.create_table("t2", [("i", "int32")])
    lake.set_sorted_by("t2", [("i", "asc")])
    lake.insert("t2", spark.createDataFrame(
        [(3,), (1,), (5,), (2,), (4,)], "i int").coalesce(1))
    assert _file_col(lake, "i", newest=True) == [1, 2, 3, 4, 5]


# -- merge_adjacent_sorted_basic.test -----------------------------------

def test_set_sorted_by_schema_version_split(lake, spark):
    """SET SORTED BY bumps the GLOBAL snapshot schema_version (the
    altered entry makes SchemaChangesMade() true) but writes no
    per-table ducklake_schema_versions row — the split
    schema_version_mixed_operations.test pins (table stays at 1 while
    the next real alter jumps to 3)."""
    lake.create_table("t", [("a", "int32"), ("b", "varchar")])
    sv0 = lake.meta.latest_snapshot().schema_version
    tid = lake._handle("t").table_id
    tv0 = lake.meta.query(
        "SELECT MAX(schema_version) FROM ducklake_schema_versions "
        "WHERE table_id=?", (tid,))[0][0]
    lake.set_sorted_by("t", [("a", "asc")])
    lake.set_sorted_by("t", [("a", "desc"), ("b", "desc")])
    assert lake.meta.latest_snapshot().schema_version == sv0 + 2
    assert lake.meta.query(
        "SELECT MAX(schema_version) FROM ducklake_schema_versions "
        "WHERE table_id=?", (tid,))[0][0] == tv0
    # and each SET SORTED BY is a real snapshot flagged as an alter
    snaps = lake.meta.query(
        "SELECT changes_made FROM ducklake_snapshot_changes "
        "ORDER BY snapshot_id DESC LIMIT 2")
    assert all("altered_table" in c for (c,) in snaps)


def test_merge_adjacent_resorts_by_sort_key(lake, spark):
    lake.create_table(
        "t", [("unique_id", "int64"), ("k1", "int64"), ("k2", "varchar")])
    for base in (0, 4):
        lake.insert("t", spark.createDataFrame(
            [(i, i % 2, f"woot{i}") for i in range(base + 3, base - 1, -1)],
            "unique_id long, k1 long, k2 string").coalesce(1))
    lake.set_sorted_by("t", [("k1", "asc"), ("k2", "asc")])
    assert lake.merge_adjacent_files(table="t") == 1
    rows = [tuple(r) for r in lake.table("t").collect()]
    assert [r[0] for r in rows] == [0, 2, 4, 6, 1, 3, 5, 7]
    # rowids survive the re-sort
    vr = {tuple(r[:1]): r for r in
          lake.table("t", with_virtual=True).collect()}
    assert len(vr) == 8


# -- set_sorted_by_rollback_basic.test ----------------------------------

def test_set_sorted_by_rolls_back(lake, spark):
    lake.create_table("t", [("a", "int32")])
    with lake.transaction():
        lake.set_sorted_by("t", [("a", "asc")])
        lake.rollback()
    assert lake._sort_spec(lake._handle("t")) == []
    rows = lake.meta.query(
        "SELECT COUNT(*) FROM ducklake_sort_info "
        "WHERE table_id=? AND end_snapshot IS NULL",
        (lake._handle("t").table_id,))
    assert rows[0][0] == 0


# -- drop_sorted_column.test --------------------------------------------

def test_drop_sorted_column_rejected_until_reset(lake, spark):
    from ducklake_spark.lake import DuckLakeError

    lake.create_table("t", [("a", "int32"), ("b", "int32")])
    lake.set_sorted_by("t", [("b", "asc")])
    with pytest.raises(DuckLakeError, match="sorted by"):
        lake.drop_column("t", "b")
    lake.reset_sorted_by("t")
    lake.drop_column("t", "b")
    assert [c[1] for c in lake._handle("t").columns] == ["a"]


# -- merge_adjacent_sorted_renamed.test ---------------------------------

def test_rename_updates_sort_expressions(lake, spark):
    lake.create_table("t", [("k1", "int64"), ("k2", "varchar")])
    lake.set_sorted_by("t", [("k1", "asc"), ("concat(k2, 'k1')", "asc")])
    lake.rename_column("t", "k1", "k1_changed")
    spec = lake._sort_spec(lake._handle("t"))
    assert spec[0][0] == "k1_changed"
    # literal 'k1' inside the string stays; identifier k2 unchanged
    assert spec[1][0] == "concat(k2, 'k1')"
    lake.insert("t", spark.createDataFrame(
        [(2, "b"), (1, "a")], "k1_changed long, k2 string").coalesce(1))
    assert _file_col(lake, "k1_changed") == [1, 2]


# -- merge_adjacent_sorted_reset.test ------------------------------------

def test_reset_sorted_by_restores_rowid_compaction(lake, spark):
    lake.create_table("t", [("i", "int64")])
    lake.set_sorted_by("t", [("i", "desc")])
    lake.insert("t", spark.createDataFrame([(1,), (3,)], "i long").coalesce(1))
    lake.insert("t", spark.createDataFrame([(2,), (4,)], "i long").coalesce(1))
    lake.reset_sorted_by("t")
    assert lake.merge_adjacent_files(table="t") == 1
    # without a sort spec compaction keeps rowid order (insert order)
    rows = [r["i"] for r in lake.table("t").collect()]
    assert rows == [3, 1, 4, 2]
