"""Catalog backend matrix (reference: test/configs/postgres.json runs
the same suite over DuckDB/SQLite/Postgres; the metadata SQL is
ANSI-portable by design, ducklake_metadata_manager.cpp:1241-1244).

The sqlite backend is the suite default; DUCKLAKE_TEST_BACKEND=duckdb
re-runs every lake test on a DuckDB catalog. This module always
exercises the DuckDB backend regardless of the env var, plus the
Postgres translation layer (no server in this container)."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def ducklake_duckdb(spark, tmp_path):
    from ducklake_spark.lake import DuckLake

    return DuckLake.attach(
        spark, "duckdb://" + str(tmp_path / "cat.duckdb"), str(tmp_path / "data")
    )


def test_duckdb_catalog_roundtrip(ducklake_duckdb, spark):
    from ducklake_spark import maintenance
    from ducklake_spark.dml import delete, update

    lk = ducklake_duckdb
    lk.create_table("t", [("i", "int64"), ("v", "varchar")])
    for lo in (0, 100):
        lk.insert(
            "t",
            spark.range(lo, lo + 100).select(
                F.col("id").alias("i"), F.lit("x").alias("v")
            ),
        )
    assert lk.table("t").count() == 200
    snap1 = lk.meta.latest_snapshot().snapshot_id
    assert delete(lk, "t", "i < 10") == 10
    assert lk.table("t").count() == 190
    assert lk.table("t", at_version=snap1).count() == 200  # time travel
    update(lk, "t", {"v": "'y'"}, "i >= 190")
    assert lk.table("t").filter("v = 'y'").count() == 10
    maintenance.merge_adjacent_files(lk)
    maintenance.checkpoint(lk)
    assert lk.table("t").count() == 190


def test_duckdb_catalog_concurrent_inserts(ducklake_duckdb, spark, tmp_path):
    """DuckDB detects write-write conflicts at COMMIT (MVCC) instead of
    taking a lock up front — the optimistic loop must absorb those."""
    from ducklake_spark.lake import DuckLake

    lk = ducklake_duckdb
    lk.create_table("c", [("i", "int64"), ("who", "varchar")])
    errs: list[Exception] = []

    def writer(tag: str):
        try:
            mine = DuckLake.attach(
                spark, "duckdb://" + str(tmp_path / "cat.duckdb"),
                str(tmp_path / "data"),
            )
            for k in range(2):
                mine.insert(
                    "c",
                    spark.createDataFrame([(k, tag)], "i long, who string"),
                )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(f"w{j}",)) for j in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    assert lk.table("c").count() == 4


def test_duckdb_catalog_inlining_and_staged(ducklake_duckdb, spark):
    lk = ducklake_duckdb
    lk.meta.set_option("data_inlining_row_limit", "10")
    lk.create_table("inl", [("i", "int64")])
    lk.insert("inl", spark.createDataFrame([(1,), (2,)], "i long"))
    # rows live in the catalog, not parquet
    assert lk.meta.query("SELECT COUNT(*) FROM ducklake_data_file")[0][0] == 0
    assert lk.table("inl").count() == 2
    with lk.transaction(staged=True) as ctx:
        lk.insert("inl", spark.createDataFrame([(3,)], "i long"))
    staged = ctx.staged_snapshot
    assert lk.table("inl").count() == 2  # invisible until finalize
    lk.commit_staged(staged)
    assert lk.table("inl").count() == 3


def test_pg_translation_qmark_and_introspection():
    from ducklake_spark.catalog.backends import _PgConnection

    t = _PgConnection._translate
    assert t("SELECT a FROM x WHERE b=? AND c=?") == (
        "SELECT a FROM x WHERE b=%s AND c=%s"
    )
    out = t("SELECT 1 FROM sqlite_master WHERE type='table' AND name=?")
    assert "information_schema.tables" in out and out.endswith("table_name = %s")
    out = t("SELECT name FROM sqlite_master WHERE type='table'")
    assert "information_schema.tables" in out and "%s" not in out
    out = t("PRAGMA table_info(ducklake_data_file)")
    assert "information_schema.columns" in out
    assert "'ducklake_data_file'" in out
    # column order mirrors sqlite's (cid, name, type, notnull, dflt, pk)
    assert out.index("ordinal_position - 1") < out.index("column_name")


def test_backend_selection():
    from ducklake_spark.catalog.backends import (
        DuckDBBackend,
        PostgresBackend,
        SqliteBackend,
        backend_for,
    )

    assert isinstance(backend_for("/x/meta.db"), SqliteBackend)
    assert isinstance(backend_for("duckdb:///x/meta.duckdb"), DuckDBBackend)
    assert isinstance(backend_for("postgresql://h/db"), PostgresBackend)
    assert isinstance(backend_for("postgres://h/db"), PostgresBackend)
