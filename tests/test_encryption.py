"""ENCRYPTED lakes: per-file parquet keys recorded in the catalog
(reference: ducklake_insert.cpp:743-756, encryption_key column).

Footer + column data are AES-GCM encrypted via parquet modular
encryption (java/ducklake/DuckLakeCrypto.java, prebuilt into
ducklake_spark/jars/), matching the reference's encrypted-footer
uniform mode; the Java writer stamps pyarrow-compatible PKMT1 key
material so stats harvesting decrypts footers with the catalog key.
Delete files carry their own per-file PME keys
(ducklake_spark/crypto_pme.py; reference ducklake_delete.cpp:63-70)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import conftest


@pytest.fixture()
def elake(spark, tmp_path):
    from ducklake_spark.lake import DuckLake

    return DuckLake.attach(
        spark, conftest.catalog_url(tmp_path), str(tmp_path / "data"),
        encrypted=True,
    )


def test_encrypted_roundtrip(elake, spark):
    lk = elake
    assert lk.encrypted
    lk.create_table("t", [("i", "int64"), ("v", "varchar")])
    for lo in (0, 100):
        lk.insert(
            "t",
            spark.range(lo, lo + 100).select(
                F.col("id").alias("i"),
                F.concat(F.lit("secret_"), F.col("id")).alias("v"),
            ),
        )
    # catalog holds a key per file; two inserts -> >= 2 distinct keys
    keys = [
        k for (k,) in lk.meta.query(
            "SELECT encryption_key FROM ducklake_data_file "
            "WHERE end_snapshot IS NULL"
        )
    ]
    assert keys and all(k for k in keys)
    assert len(set(keys)) >= 2
    # scan decrypts transparently
    df = lk.table("t")
    assert df.count() == 200
    assert df.filter("v = 'secret_42'").count() == 1

    # raw reads do NOT see the plaintext: column data is encrypted
    (path,) = lk.meta.query(
        "SELECT path FROM ducklake_data_file WHERE end_snapshot IS NULL LIMIT 1"
    )[0]
    path = lk._handle("t").path + path  # catalog paths are table-relative
    with open(os.path.join(lk.data_path, path), "rb") as fh:
        raw = fh.read()
    assert b"secret_" not in raw
    # a keyless Spark read fails (or returns no plaintext)
    with pytest.raises(Exception):
        spark.read.schema("i long, v string").parquet(
            os.path.join(lk.data_path, path)
        ).collect()


def test_encrypted_delete_update_compact(elake, spark):
    from ducklake_spark import maintenance
    from ducklake_spark.dml import delete, update

    lk = elake
    lk.create_table("t", [("i", "int64"), ("v", "varchar")])
    for lo in (0, 100):
        lk.insert(
            "t",
            spark.range(lo, lo + 100).select(
                F.col("id").alias("i"), F.lit("x").alias("v")
            ),
        )
    assert delete(lk, "t", "i < 10") == 10
    assert lk.table("t").count() == 190
    update(lk, "t", {"v": "'y'"}, "i >= 190")
    assert lk.table("t").filter("v = 'y'").count() == 10
    # compaction re-encrypts the merged file with a fresh key
    snap = lk.meta.latest_snapshot().snapshot_id
    maintenance.merge_adjacent_files(lk)
    assert lk.table("t").count() == 190
    assert lk.table("t", at_version=snap).count() == 190


def test_encrypted_time_travel_and_stats(elake, spark):
    lk = elake
    lk.create_table("t", [("i", "int64")])
    lk.insert("t", spark.range(50).selectExpr("id AS i"))
    s1 = lk.meta.latest_snapshot().snapshot_id
    lk.insert("t", spark.range(50, 80).selectExpr("id AS i"))
    assert lk.table("t").count() == 80
    assert lk.table("t", at_version=s1).count() == 50
    # footers are encrypted, yet harvesting (via the catalog key)
    # still fills record_count / footer_size
    rows = lk.meta.query(
        "SELECT record_count, footer_size FROM ducklake_data_file"
    )
    assert all(rc > 0 and fs > 0 for rc, fs in rows)


def test_encrypted_footer_unreadable_without_key(elake, spark):
    """Data-file footers are encrypted like the reference (uniform
    encrypted-footer mode): pyarrow cannot even read the schema without
    the catalog key, and CAN read footer+data with it (the Java
    writer's PKMT1 key material is pyarrow-compatible)."""
    import os as _os

    import pyarrow.parquet as pq

    lk = elake
    lk.create_table("t", [("i", "int64"), ("v", "varchar")])
    lk.insert("t", spark.range(100).selectExpr(
        "id AS i", "concat('secret_', id) AS v"))
    (path, key, rc) = lk.meta.query(
        "SELECT path, encryption_key, record_count FROM ducklake_data_file "
        "WHERE end_snapshot IS NULL LIMIT 1")[0]
    path = lk._handle("t").path + path  # catalog paths are table-relative
    full = _os.path.join(lk.data_path, path)
    with open(full, "rb") as fh:
        raw = fh.read()
    assert raw[-4:] == b"PARE"  # encrypted-footer magic
    with pytest.raises(Exception):
        pq.ParquetFile(full)  # keyless: no schema, no stats
    from ducklake_spark.lake import _crypto_key_id
    from ducklake_spark.crypto_pme import decrypt_properties

    pf = pq.ParquetFile(full, decryption_properties=decrypt_properties(
        {_crypto_key_id(key): key}))
    assert pf.metadata.num_rows == rc  # matches the harvested count
    t = pf.read(use_threads=False)  # pyarrow PME races under threaded reads
    assert all(v.startswith("secret_") for v in t["v"].to_pylist())
    # Spark scan path still decrypts transparently
    assert lk.table("t").filter("v = 'secret_42'").count() == 1


def test_encrypted_delete_files(elake, spark, tmp_path):
    """Delete parquet written under an ENCRYPTED lake is unreadable
    without its catalog key (reference encrypts delete files with
    per-file keys, ducklake_delete.cpp:63-70)."""
    import pyarrow.parquet as pq

    lk = elake
    lk.create_table("t", [("i", "int64")])
    lk.insert("t", spark.range(100).withColumnRenamed("id", "i"))
    assert lk.delete("t", "i % 10 = 3") == 10
    rows = [
        (lk._handle("t").path + p, k, c)  # table-relative catalog paths
        for p, k, c in lk.meta.query(
            "SELECT path, encryption_key, delete_count "
            "FROM ducklake_delete_file WHERE end_snapshot IS NULL")
    ]
    assert rows and all(k for _p, k, _c in rows)
    total = 0
    for rel, key, dc in rows:
        full = os.path.join(str(tmp_path / "data"), rel)
        with pytest.raises(Exception):
            pq.read_table(full)  # no key -> unreadable
        from ducklake_spark.crypto_pme import decrypt_properties, key_id_for

        t = pq.ParquetFile(
            full, decryption_properties=decrypt_properties({key_id_for(key): key})
        ).read()
        assert t.num_rows == dc
        total += t.num_rows
    assert total == 10  # one delete parquet per touched data file
    # scans still merge the deletes correctly
    assert lk.table("t").count() == 90
    # a second delete merges the encrypted prev delete file
    assert lk.delete("t", "i % 10 = 7") == 10
    assert lk.table("t").count() == 80
    got = sorted(r.i for r in lk.table("t").collect())
    assert all(i % 10 not in (3, 7) for i in got)


def test_encrypted_flush_inlined_deletes(elake, spark):
    """deletion_inlining + flush folds positions into an ENCRYPTED
    delete parquet."""
    lk = elake
    lk.create_table("t", [("i", "int64")])
    lk.insert("t", spark.range(50).withColumnRenamed("id", "i"))
    lk.meta.set_option("deletion_inlining_row_limit", "100",
                       scope="table", scope_id=lk._handle("t").table_id)
    assert lk.delete("t", "i < 5") == 5
    assert lk.table("t").count() == 45
    lk.flush_inlined_data()
    rows = lk.meta.query(
        "SELECT encryption_key FROM ducklake_delete_file WHERE end_snapshot IS NULL")
    assert rows and all(k for (k,) in rows)
    assert lk.table("t").count() == 45
