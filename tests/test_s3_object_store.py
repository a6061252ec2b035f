"""Object-store (S3) e2e: insert / delete / compact round trip.

Runs against a local moto S3 server (the same server the SLT runner
boots for the reference's `require httpfs` corpus). The engine's
mirror-mode data plane stages Spark IO locally and syncs to the store
at commit/maintenance boundaries — see fsio.mirror_root_for; with
hadoop-aws on a real cluster the data plane reads s3a:// directly.
"""

import os
import socket
import subprocess
import time
import uuid

import pytest


def _server_up() -> bool:
    try:
        with socket.create_connection(("127.0.0.1", 9000), timeout=0.5):
            return True
    except OSError:
        return False


@pytest.fixture(scope="module")
def s3_env():
    if not _server_up():
        try:
            subprocess.Popen(
                ["moto_server", "-p", "9000", "-H", "127.0.0.1"],
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                start_new_session=True)
        except FileNotFoundError:
            pytest.skip("moto_server unavailable")
        for _ in range(40):
            if _server_up():
                break
            time.sleep(0.25)
        else:
            pytest.skip("moto_server did not come up")
    os.environ.setdefault("AWS_ENDPOINT_URL", "http://127.0.0.1:9000")
    os.environ.setdefault("AWS_ACCESS_KEY_ID", "admin")
    os.environ.setdefault("AWS_SECRET_ACCESS_KEY", "password")
    os.environ.setdefault("AWS_DEFAULT_REGION", "us-east-1")
    return True


def _remote_keys(prefix: str) -> dict:
    from ducklake_spark.fsio import s3_boto_client, split_s3

    bucket, key = split_s3(prefix)
    out = {}
    resp = s3_boto_client().list_objects_v2(Bucket=bucket, Prefix=key)
    for o in resp.get("Contents", []):
        out[o["Key"]] = o["Size"]
    return out


def test_s3_insert_delete_compact_roundtrip(spark, tmp_path, s3_env):
    from pyspark.sql import functions as F

    from ducklake_spark import maintenance as M
    from ducklake_spark.lake import DuckLake

    slug = uuid.uuid4().hex[:10]
    url = f"s3://dl-e2e/{slug}/"
    db = str(tmp_path / "meta.db")
    lk = DuckLake.attach(spark, db, url)
    assert lk.remote_data_path == url
    assert lk.meta.option("data_path") == url

    lk.create_table("t", [("i", "int64"), ("s", "varchar")])
    lk.insert("t", spark.range(100).select(
        F.col("id").alias("i"), F.concat(F.lit("v"), F.col("id")).alias("s")))
    lk.insert("t", spark.range(100, 200).select(
        F.col("id").alias("i"), F.concat(F.lit("v"), F.col("id")).alias("s")))
    assert lk.table("t").count() == 200
    # committed data files are durably on the object store
    keys = _remote_keys(url)
    assert any(k.endswith(".parquet") for k in keys), keys

    n = lk.delete("t", "i < 20")
    assert n == 20
    assert lk.table("t").count() == 180

    M.merge_adjacent_files(lk)
    lk._s3_sync_up()
    assert lk.table("t").count() == 180
    keys_after = _remote_keys(url)
    assert any(k.endswith(".parquet") for k in keys_after)

    # a FRESH attach with a cleared mirror must rebuild from the store
    lk.meta.close()
    import shutil

    from ducklake_spark.fsio import mirror_root_for

    shutil.rmtree(mirror_root_for(url), ignore_errors=True)
    lk2 = DuckLake.attach(spark, db, url)
    assert lk2.table("t").count() == 180
    assert lk2.table("t").filter("i = 150").count() == 1
