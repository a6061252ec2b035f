"""DuckLake secrets — named attach-config bundles
(reference: ducklake_secret.cpp; ATTACH 'ducklake:my_secret')."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_secret_crud(tmp_path, monkeypatch):
    monkeypatch.setenv("DUCKLAKE_SECRET_DIR", str(tmp_path / "secrets"))
    from ducklake_spark import secrets

    with pytest.raises(ValueError):
        secrets.create_secret("bad name!", metadata_path="/x")
    with pytest.raises(ValueError):
        secrets.create_secret("s1")  # metadata_path required
    with pytest.raises(ValueError):
        secrets.create_secret("s1", metadata_path="/x", nope="y")

    secrets.create_secret("mem1", metadata_path="/m", data_path="/d")
    secrets.create_secret(
        "disk1", metadata_path="/m2", data_path="/d2", persistent=True
    )
    assert set(secrets.list_secrets()) >= {"mem1", "disk1"}
    assert secrets.get_secret("mem1")["data_path"] == "/d"
    assert secrets.get_secret("disk1")["metadata_path"] == "/m2"
    assert secrets.drop_secret("mem1") and secrets.drop_secret("disk1")
    assert secrets.get_secret("mem1") is None


def test_attach_via_secret(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("DUCKLAKE_SECRET_DIR", str(tmp_path / "secrets"))
    from ducklake_spark import secrets
    from ducklake_spark.lake import DuckLake, DuckLakeError

    secrets.create_secret(
        "mylake",
        metadata_path=str(tmp_path / "meta.db"),
        data_path=str(tmp_path / "data"),
    )
    lk = DuckLake.attach(spark, "mylake")
    lk.create_table("t", [("i", "int64")])
    lk.insert("t", spark.range(10).select(F.col("id").alias("i")))
    assert lk.table("t").count() == 10
    # a second attach through the same secret sees the data
    lk2 = DuckLake.attach(spark, "mylake")
    assert lk2.table("t").count() == 10
    secrets.drop_secret("mylake")
    with pytest.raises(DuckLakeError):
        DuckLake.attach(spark, "mylake")
