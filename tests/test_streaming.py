"""Structured Streaming over the lake's CDC feed + watermark/window demo."""

from __future__ import annotations

import pytest

import conftest

# DuckDB catalogs hold a process-exclusive file lock, and Spark's python
# streaming source runs in a separate worker process — it cannot open
# the catalog the driver already holds. The reference's DuckDB catalogs
# carry the same single-process restriction; use sqlite or postgres
# catalogs for cross-process streaming.
pytestmark = pytest.mark.skipif(
    conftest.CATALOG_BACKEND == "duckdb",
    reason="duckdb catalog is single-process; streaming worker cannot attach",
)


@pytest.fixture()
def lake(spark, tmp_path):
    from ducklake_spark.lake import DuckLake

    return DuckLake.attach(spark, conftest.catalog_url(tmp_path), str(tmp_path / "data"))


def test_changes_stream_microbatch(lake, spark):
    from ducklake_spark.streaming.cdc_source import changes_stream

    lake.create_table("s", [("i", "int64"), ("v", "varchar")])
    lake.insert(
        "s", spark.createDataFrame([(1, "a"), (2, "b")], "i long, v string")
    )
    stream = changes_stream(lake, "s")
    q = (
        stream.writeStream.format("memory")
        .queryName("cdc_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM cdc_out").collect()
    assert {(r.i, r.change_type) for r in out} == {(1, "insert"), (2, "insert")}
    rowids = sorted(r.rowid for r in out)
    assert rowids == [0, 1]

    # a second batch picks up only the new snapshot's changes
    lake.insert("s", spark.createDataFrame([(3, "c")], "i long, v string"))
    lake.delete("s", "i = 1")
    last = max(r.snapshot_id for r in out)
    stream2 = changes_stream(lake, "s", start_snapshot=last)
    q2 = (
        stream2.writeStream.format("memory")
        .queryName("cdc_out2")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    out2 = spark.sql("SELECT * FROM cdc_out2").collect()
    kinds = {(r.i, r.change_type) for r in out2}
    assert (3, "insert") in kinds
    assert (1, "delete") in kinds


def test_streaming_windowed_agg_with_watermark(lake, spark):
    """Watermark + tumbling window over the change feed (the Spark-side
    capability the reference lacks, SURVEY §2.10)."""
    import datetime

    from pyspark.sql import functions as F

    from ducklake_spark.streaming.cdc_source import changes_stream

    lake.create_table("wm", [("ts", "timestamptz"), ("value", "float64")])
    rows = [
        (datetime.datetime(2024, 1, 1, 0, m, tzinfo=datetime.timezone.utc), float(m))
        for m in range(30)
    ]
    lake.insert(
        "wm", spark.createDataFrame(rows, "ts timestamp, value double")
    )
    stream = changes_stream(lake, "wm")
    agg = (
        stream.filter("change_type = 'insert'")
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("win_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT n, total FROM win_out ORDER BY total").collect()
    assert [r.n for r in out] == [10, 10, 10]
    assert [r.total for r in out] == [45.0, 145.0, 245.0]


def test_lake_sink_end_to_end(lake, spark, tmp_path):
    """bronze -> silver: stream one table's change feed into another
    lake table via foreachBatch; each batch = one snapshot."""
    from ducklake_spark.streaming.cdc_source import changes_stream
    from ducklake_spark.streaming.lake_sink import write_stream

    lake.create_table("bronze", [("i", "int64"), ("v", "varchar")])
    lake.create_table("silver", [("i", "int64"), ("v", "varchar")])
    lake.insert(
        "bronze", spark.createDataFrame([(1, "a"), (2, "b")], "i long, v string")
    )
    stream = changes_stream(lake, "bronze").filter("change_type = 'insert'").select(
        "i", "v"
    )
    q = write_stream(
        stream,
        lake,
        "silver",
        checkpoint=str(tmp_path / "ckpt"),
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)
    out = lake.table("silver").collect()
    assert {(r.i, r.v) for r in out} == {(1, "a"), (2, "b")}
    # the batch snapshot carries the idempotence tag
    tags = [
        r[0]
        for r in lake.meta.query(
            "SELECT commit_message FROM ducklake_snapshot_changes "
            "WHERE commit_message LIKE 'streaming_batch:%'"
        )
    ]
    assert tags and tags[0].startswith("streaming_batch:silver:")


def test_cdc_timestamp_overloads(lake, spark):
    """TIMESTAMPTZ bounds resolve through the snapshot log (reference:
    BIGINT-version or TIMESTAMPTZ overloads of table_insertions)."""
    from ducklake_spark.cdc import table_changes, table_insertions

    lake.create_table("tt", [("i", "int64")])
    lake.insert("tt", spark.createDataFrame([(1,)], "i long"))
    lake.insert("tt", spark.createDataFrame([(2,)], "i long"))
    by_version = table_insertions(lake, "tt", 0, lake.current_snapshot())
    by_time = table_insertions(lake, "tt", "1970-01-01", "9999-01-01")
    assert {r.i for r in by_version.collect()} == {1, 2}
    assert {r.i for r in by_time.collect()} == {1, 2}
    ch = table_changes(lake, "tt", "1970-01-01", "9999-01-01")
    assert {(r.i, r.change_type) for r in ch.collect()} == {
        (1, "insert"), (2, "insert")
    }


def test_stateful_running_profile_over_cdc(lake, spark, tmp_path):
    """applyInPandasWithState over the change feed: per-key state
    persists across micro-batches via the checkpoint."""
    import datetime as dt

    from ducklake_spark.streaming.cdc_source import changes_stream
    from ducklake_spark.streaming.stateful import running_profile

    lake.create_table("ev", [("user_id", "int64"), ("ts", "timestamptz"),
                             ("value", "float64")])
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    lake.insert(
        "ev",
        spark.createDataFrame(
            [(1, base, 10.0), (1, base + dt.timedelta(minutes=1), 5.0),
             (2, base, 7.0)],
            "user_id long, ts timestamp, value double",
        ),
    )
    stream = changes_stream(lake, "ev").filter("change_type = 'insert'")
    out = running_profile(stream, key_col="user_id", ts_col="ts", value_col="value")
    q = (
        out.writeStream.format("memory")
        .queryName("prof_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r.key: r for r in spark.sql("SELECT * FROM prof_out").collect()}
    assert rows[1].n_events == 2 and rows[1].total == 15.0
    assert rows[2].n_events == 1 and rows[2].total == 7.0
    assert rows[1].last_ts > rows[1].first_ts


def test_streaming_dedup_across_microbatches(lake, spark):
    """dedup_stream keeps only the first arrival of each fingerprint,
    including re-arrivals in LATER micro-batches (keyed state), and
    normalization folds whitespace/case variants together."""
    from ducklake_spark.streaming.cdc_source import changes_stream
    from ducklake_spark.streaming.stateful import dedup_stream

    lake.create_table("docs", [("doc_id", "int64"), ("text", "varchar")])
    lake.insert("docs", spark.createDataFrame(
        [(1, "hello world"), (2, "HELLO   world"), (3, "fresh doc")],
        "doc_id long, text string"))
    stream = changes_stream(lake, "docs").filter("change_type = 'insert'")
    deduped = dedup_stream(stream, content_cols=["text"])
    q = (deduped.writeStream.format("memory").queryName("dd_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(r.doc_id for r in spark.sql("SELECT * FROM dd_out").collect())
    assert got == [1, 3]  # doc 2 is a case/whitespace dup of doc 1


def test_bronze_to_silver_incremental_curation(lake, spark, tmp_path):
    """End-to-end incremental curation: bronze inserts stream through
    CDC -> streaming dedup -> lake sink into a silver table; a second
    run picks up only new changes, re-arrived duplicates stay dropped
    across runs (dropDuplicates state lives in the checkpoint), and
    every micro-batch is one silver snapshot."""
    from ducklake_spark.streaming.cdc_source import changes_stream
    from ducklake_spark.streaming.lake_sink import write_stream
    from ducklake_spark.streaming.stateful import dedup_stream

    lake.create_table("bronze", [("doc_id", "int64"), ("text", "varchar")])
    lake.create_table("silver", [("doc_id", "int64"), ("text", "varchar")])
    ckpt = str(tmp_path / "ckpt")

    def run_once(start=None):
        kw = {} if start is None else {"start_snapshot": start}
        stream = changes_stream(lake, "bronze", **kw).filter(
            "change_type = 'insert'")
        deduped = dedup_stream(stream, content_cols=["text"]).select(
            "doc_id", "text")
        q = write_stream(deduped, lake, "silver", checkpoint=ckpt,
                         trigger={"availableNow": True})
        q.awaitTermination(120)
        return lake.current_snapshot()

    lake.insert("bronze", spark.createDataFrame(
        [(1, "alpha doc"), (2, "ALPHA   doc"), (3, "beta doc")],
        "doc_id long, text string"))
    last = run_once()
    assert sorted(r.doc_id for r in lake.table("silver").collect()) == [1, 3]

    # second wave: one re-arrival of a known text, one genuinely new
    lake.insert("bronze", spark.createDataFrame(
        [(4, "alpha doc"), (5, "gamma doc")], "doc_id long, text string"))
    run_once(start=last)
    assert sorted(r.doc_id for r in lake.table("silver").collect()) == [
        1, 3, 5]
