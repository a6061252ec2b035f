"""Iceberg-v3 deletion vectors (puffin) — write + read + merge paths.

Reference: ducklake_puffin.cpp:32-120 (container + bare blob),
ducklake_deletion_vector.cpp (roaring blob codec),
write_deletion_vectors option (ducklake_set_option.cpp:165)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import conftest


@pytest.fixture()
def lake(spark, tmp_path):
    from ducklake_spark.lake import DuckLake

    lk = DuckLake.attach(
        spark, conftest.catalog_url(tmp_path), str(tmp_path / "data")
    )
    lk.meta.set_option("write_deletion_vectors", "true")
    return lk


def test_dv_delete_roundtrip(lake, spark):
    from ducklake_spark.dml import delete

    lake.create_table("t", [("i", "int64")])
    lake.insert("t", spark.range(1000).selectExpr("id AS i"))
    snap0 = lake.meta.latest_snapshot().snapshot_id
    assert delete(lake, "t", "i % 10 = 0") == 100
    # catalog row says puffin, delete_count 100, non-trivial footer meta
    # catalog paths are TABLE-relative (reference convention) —
    # resolve against the table's path for the direct-disk check
    h = lake._handle("t")
    rows = [
        (fmt, dc, (h.path + p) if prel else p)
        for fmt, dc, p, prel in lake.meta.query(
            "SELECT format, delete_count, path, path_is_relative "
            "FROM ducklake_delete_file WHERE end_snapshot IS NULL"
        )
    ]
    assert rows and all(fmt == "puffin" for fmt, _, _ in rows)
    assert sum(dc for _, dc, _ in rows) == 100
    # the file on disk really is a deletion vector
    import os

    from ducklake_spark.functions.roaring import puffin_read

    total = 0
    for _, _, p in rows:
        with open(os.path.join(lake.data_path, p), "rb") as fh:
            blobs = puffin_read(fh.read())
        total += len(blobs[0]["positions"])
    assert total == 100
    # scan applies the DV; time travel ignores it
    df = lake.table("t")
    assert df.count() == 900
    assert df.filter("i % 10 = 0").count() == 0
    assert lake.table("t", at_version=snap0).count() == 1000


def test_dv_second_delete_merges(lake, spark):
    from ducklake_spark.dml import delete

    lake.create_table("t", [("i", "int64")])
    lake.insert("t", spark.range(100).selectExpr("id AS i").coalesce(1))
    assert delete(lake, "t", "i < 10") == 10
    assert delete(lake, "t", "i >= 90") == 10
    assert lake.table("t").count() == 80
    assert lake.table("t").filter("i < 10 OR i >= 90").count() == 0
    # merged DV holds both batches
    (dc,) = lake.meta.query(
        "SELECT delete_count FROM ducklake_delete_file WHERE end_snapshot IS NULL"
    )[0]
    assert dc == 20


def test_dv_update_and_rewrite(lake, spark):
    from ducklake_spark.dml import delete, update
    from ducklake_spark.maintenance import rewrite_data_files

    lake.create_table("t", [("i", "int64"), ("v", "varchar")])
    lake.insert(
        "t", spark.range(100).selectExpr("id AS i", "'a' AS v").coalesce(1)
    )
    update(lake, "t", {"v": "'b'"}, "i < 5")
    assert lake.table("t").filter("v = 'b'").count() == 5
    assert lake.table("t").count() == 100
    delete(lake, "t", "i >= 50 AND v = 'a'")
    assert lake.table("t").count() == 50
    # rewrite path decodes the DV (55/100 dead >= threshold)
    n = rewrite_data_files(lake, delete_threshold=0.5)
    assert n >= 1
    assert lake.table("t").count() == 50
    assert lake.table("t").filter("v = 'b'").count() == 5


def test_dv_cdc_deletions(lake, spark):
    from ducklake_spark.cdc import table_deletions
    from ducklake_spark.dml import delete

    lake.create_table("t", [("i", "int64")])
    lake.insert("t", spark.range(50).selectExpr("id AS i"))
    s0 = lake.meta.latest_snapshot().snapshot_id
    delete(lake, "t", "i < 7")
    s1 = lake.meta.latest_snapshot().snapshot_id
    dels = table_deletions(lake, "t", s0 + 1, s1)
    assert sorted(r.i for r in dels.collect()) == list(range(7))


def test_dv_mixed_formats(lake, spark):
    """A lake can hold parquet delete files AND DVs (reference:
    test/sql/delete/delete_mixed_formats.test): flip the option
    between deletes."""
    from ducklake_spark.dml import delete

    lake.create_table("t", [("i", "int64")])
    lake.insert("t", spark.range(100).selectExpr("id AS i").coalesce(1))
    lake.meta.set_option("write_deletion_vectors", "false")
    delete(lake, "t", "i < 10")
    lake.meta.set_option("write_deletion_vectors", "true")
    delete(lake, "t", "i >= 90")
    fmts = {
        fmt
        for (fmt,) in lake.meta.query(
            "SELECT format FROM ducklake_delete_file WHERE end_snapshot IS NULL"
        )
    }
    assert lake.table("t").count() == 80
    # the second delete merged the parquet predecessor into the DV
    assert fmts == {"puffin"}
    assert lake.table("t").filter("i < 10 OR i >= 90").count() == 0


def test_orphaned_puffin_collected(spark, tmp_path):
    """delete_orphaned_files collects stray .puffin files too
    (reference remove_orphans/puffin_orphan.test), and live DV files
    are never treated as orphans."""
    import conftest
    import glob as g
    import os

    from ducklake_spark.lake import DuckLake

    lake = DuckLake.attach(
        spark, conftest.catalog_url(tmp_path), str(tmp_path / "data")
    )
    lake.create_table("t", [("i", "int64")])
    lake.meta.set_option("write_deletion_vectors", "true",
                         scope="table", scope_id=lake._handle("t").table_id)
    lake.insert("t", spark.range(100).withColumnRenamed("id", "i"))
    assert lake.delete("t", "i < 10") == 10
    fmts = {f for (f,) in lake.meta.query(
        "SELECT DISTINCT format FROM ducklake_delete_file "
        "WHERE end_snapshot IS NULL")}
    assert fmts == {"puffin"}
    # live DV is not an orphan
    assert lake.delete_orphaned_files(cleanup_all=True, dry_run=True) == []
    # a stray puffin with no catalog row IS collected — but only past
    # the age guard (fresh files may belong to an in-flight commit)
    stray = tmp_path / "data" / "main" / "t" / "ducklake-dv-stray.puffin"
    stray.write_bytes(b"PUF1junk")
    assert lake.delete_orphaned_files(dry_run=True) == []  # guarded
    got = lake.delete_orphaned_files(cleanup_all=True)
    assert [os.path.basename(p) for p in got] == ["ducklake-dv-stray.puffin"]
    assert not stray.exists()
    assert lake.table("t").count() == 90
