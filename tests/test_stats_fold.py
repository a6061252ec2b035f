"""Metadata stats folding (lake.stats_agg / row_count) — ports of
test/sql/stats/min_max_optimization_basic.test,
min_max_optimization_deletes.test, min_max_optimization_time_travel.test,
count_star_optimization_basic.test, count_star_optimization_inlined.test,
count_star_optimization_time_travel.test.

The reference asserts fold-vs-scan via EXPLAIN ANALYZE regexes; here the
``folded_count`` / ``folded_columns`` flags report the same decision, and
every answer is additionally checked against a real scan.
"""

from __future__ import annotations

import math

import pytest

import conftest

from pyspark.sql import functions as F


@pytest.fixture()
def lake(spark, tmp_path):
    from ducklake_spark.lake import DuckLake

    return DuckLake.attach(
        spark, conftest.catalog_url(tmp_path), str(tmp_path / "data")
    )


def _ints(spark, lo, hi):
    return spark.createDataFrame([(i,) for i in range(lo, hi)], "i int")


# -- min_max_optimization_basic.test ------------------------------------

def test_min_max_folds_after_pure_inserts(lake, spark):
    lake.create_table("t", [("i", "int32")])
    lake.insert("t", _ints(spark, 1, 101))
    lake.insert("t", _ints(spark, 101, 201))
    r = lake.stats_agg("t")
    assert r["row_count"] == 200
    assert r["folded_count"] is True
    assert r["folded_columns"]["i"] is True
    assert (r["min"]["i"], r["max"]["i"]) == (1, 200)


# -- min_max_optimization_deletes.test ----------------------------------

def test_min_max_falls_back_on_deletes_but_count_folds(lake, spark):
    lake.create_table("t", [("i", "int32")])
    lake.insert("t", _ints(spark, 1, 101))
    lake.delete("t", "i = 1")
    r = lake.stats_agg("t")
    # result correct; MIN computed via scan, COUNT(*) still folded
    assert (r["min"]["i"], r["max"]["i"], r["row_count"]) == (2, 100, 99)
    assert r["folded_columns"]["i"] is False
    assert r["folded_count"] is True
    lake.delete("t", "i = 100")
    r = lake.stats_agg("t")
    assert (r["min"]["i"], r["max"]["i"], r["row_count"]) == (2, 99, 98)


def test_min_max_folds_again_after_rewrite(lake, spark):
    lake.create_table("t", [("i", "int32")])
    lake.insert("t", _ints(spark, 1, 101))
    lake.delete("t", "i = 1")
    lake.delete("t", "i = 100")
    lake.rewrite_data_files(delete_threshold=0.0)
    r = lake.stats_agg("t")
    assert (r["min"]["i"], r["max"]["i"], r["row_count"]) == (2, 99, 98)
    # rewriting the deletes away re-enables the fold (the new files'
    # stats are exact) — min_max_optimization_deletes.test §2
    assert r["folded_columns"]["i"] is True


def test_min_max_inlined_deletes_stay_correct(lake, spark):
    lake.set_option("data_inlining_row_limit", "100")
    lake.create_table("t", [("i", "int32")])
    lake.insert("t", _ints(spark, 1, 51))
    r = lake.stats_agg("t")
    assert r["folded_columns"]["i"] is True  # committed inlined data folds
    assert (r["min"]["i"], r["max"]["i"], r["row_count"]) == (1, 50, 50)
    lake.delete("t", "i = 1")
    r = lake.stats_agg("t")
    assert (r["min"]["i"], r["max"]["i"], r["row_count"]) == (2, 50, 49)
    assert r["folded_count"] is True


# -- count_star_optimization_time_travel.test ---------------------------

def test_count_time_travel_with_merged_files(lake, spark):
    lake.create_table("t", [("i", "int32")])
    lake.insert("t", _ints(spark, 0, 100))
    v1 = lake.current_snapshot()
    lake.insert("t", _ints(spark, 100, 200))
    v2 = lake.current_snapshot()
    lake.insert("t", _ints(spark, 200, 300))
    lake.merge_adjacent_files()
    assert lake.stats_agg("t", columns=[])["row_count"] == 300
    # time travel across a partial_max merge output → falls back, correct
    r1 = lake.stats_agg("t", columns=[], at_version=v1)
    r2 = lake.stats_agg("t", columns=[], at_version=v2)
    assert (r1["row_count"], r2["row_count"]) == (100, 200)
    assert r1["folded_count"] is False


def test_count_time_travel_folds_without_merge(lake, spark):
    lake.create_table("t", [("i", "int32")])
    lake.insert("t", _ints(spark, 0, 100))
    v1 = lake.current_snapshot()
    lake.insert("t", _ints(spark, 100, 200))
    lake.delete("t", "i < 10")
    r = lake.stats_agg("t", columns=[], at_version=v1)
    assert (r["row_count"], r["folded_count"]) == (100, True)
    r = lake.stats_agg("t", columns=[])
    assert (r["row_count"], r["folded_count"]) == (190, True)


# -- min_max_optimization_time_travel.test ------------------------------

def test_min_max_time_travel_and_txn_local(lake, spark):
    lake.create_table("t", [("i", "int32")])
    lake.insert("t", _ints(spark, 1, 101))
    v1 = lake.current_snapshot()
    lake.insert("t", _ints(spark, 101, 201))
    r = lake.stats_agg("t")
    assert (r["min"]["i"], r["max"]["i"]) == (1, 200)
    r = lake.stats_agg("t", at_version=v1)
    assert (r["min"]["i"], r["max"]["i"]) == (1, 100)

    with lake.transaction():
        lake.insert("t", spark.createDataFrame([(-5,), (9999,)], "i int"))
        r = lake.stats_agg("t")
        # HasTransactionLocalData() → full fallback, sees buffered rows
        assert r["folded_count"] is False
        assert (r["min"]["i"], r["max"]["i"]) == (-5, 9999)
        assert r["row_count"] == 202
        lake.rollback()
    r = lake.stats_agg("t")
    assert (r["min"]["i"], r["max"]["i"], r["row_count"]) == (1, 200, 200)
    assert r["folded_count"] is True and r["folded_columns"]["i"] is True

    with lake.transaction():
        lake.delete("t", "i = 1")
        r = lake.stats_agg("t")
        assert r["min"]["i"] == 2
        assert r["folded_count"] is False
        lake.rollback()
    assert lake.stats_agg("t")["min"]["i"] == 1


# -- fold edge cases beyond the reference tests -------------------------

def test_added_column_falls_back_until_rewritten(lake, spark):
    lake.create_table("t", [("i", "int32")])
    lake.insert("t", _ints(spark, 1, 11))
    lake.add_column("t", "j", "int32", default="7")
    r = lake.stats_agg("t", columns=["j"])
    # files predate the column → no stats rows → scan, initial_default fills
    assert r["folded_columns"]["j"] is False
    assert (r["min"]["j"], r["max"]["j"]) == (7, 7)


def test_nan_file_falls_back(lake, spark):
    lake.create_table("t", [("x", "float64")])
    lake.insert("t", spark.createDataFrame(
        [(1.0,), (float("nan"),), (2.0,)], "x double"))
    r = lake.stats_agg("t")
    assert r["folded_columns"]["x"] is False
    assert r["min"]["x"] == 1.0
    assert math.isnan(r["max"]["x"])  # NaN orders greatest


def test_all_null_and_string_fold(lake, spark):
    lake.create_table("t", [("s", "varchar"), ("z", "int32")])
    lake.insert("t", spark.createDataFrame(
        [("b", None), ("a", None)], "s string, z int"))
    r = lake.stats_agg("t")
    assert r["folded_columns"]["s"] is True
    assert (r["min"]["s"], r["max"]["s"]) == ("a", "b")
    assert r["min"]["z"] is None and r["max"]["z"] is None


def test_row_count_respects_open_txn(lake, spark):
    lake.create_table("t", [("i", "int32")])
    lake.insert("t", _ints(spark, 0, 10))
    assert lake.row_count("t") == 10
    with lake.transaction():
        lake.insert("t", _ints(spark, 10, 15))
        assert lake.row_count("t") == 15
    assert lake.row_count("t") == 15
