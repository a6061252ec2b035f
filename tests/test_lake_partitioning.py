"""Partitioned writes + file pruning (zone maps, partition values, bucket).

Mirrors reference test/sql/partitioning/* and the pruning SQL of
ducklake_metadata_manager.cpp:1246-1343,1843-1853.
"""

from __future__ import annotations

import datetime

import pytest

import conftest


@pytest.fixture()
def lake(spark, tmp_path):
    from ducklake_spark.lake import DuckLake

    return DuckLake.attach(spark, conftest.catalog_url(tmp_path), str(tmp_path / "data"))


def test_identity_partition_write_and_prune(lake, spark):
    lake.create_table("p", [("id", "int64"), ("cat", "varchar"), ("amount", "float64")])
    lake.set_partitioned_by("p", [("cat", "identity")])
    df = spark.createDataFrame(
        [(i, "abc"[i % 3], float(i)) for i in range(90)],
        "id long, cat string, amount double",
    )
    lake.insert("p", df)
    h = lake._handle("p")
    snap = lake.meta.latest_snapshot()
    all_files = lake._visible_files(h, snap, None)
    assert len(all_files) >= 3  # one file tree per partition value
    pruned = lake._visible_files(h, snap, "cat = 'a'")
    assert 0 < len(pruned) < len(all_files)
    # values correct and filter works through the scan
    assert lake.table("p", where="cat = 'a'").count() == 30
    rows = lake.meta.query("SELECT DISTINCT partition_value FROM ducklake_file_partition_value")
    assert {r[0] for r in rows} == {"a", "b", "c"}


def test_year_partition_prune(lake, spark):
    lake.create_table("py", [("id", "int64"), ("ts", "timestamp")])
    lake.set_partitioned_by("py", [("ts", "year")])
    rows = [
        (i, datetime.datetime(1995 + (i % 3), 1 + i % 12, 1)) for i in range(60)
    ]
    lake.insert("py", spark.createDataFrame(rows, "id long, ts timestamp_ntz"))
    h = lake._handle("py")
    snap = lake.meta.latest_snapshot()
    all_files = lake._visible_files(h, snap, None)
    pruned = lake._visible_files(h, snap, "ts >= TIMESTAMP '1997-01-01 00:00:00'")
    assert 0 < len(pruned) < len(all_files)
    assert lake.table("py", where="ts >= TIMESTAMP '1997-01-01 00:00:00'").count() == 20


def test_bucket_partition_iceberg_hash(lake, spark):
    from ducklake_spark.functions.murmur3 import bucket_py, murmur3_32_py

    # Iceberg spec test vectors: bucket hash of int 34 = 2017239379
    assert murmur3_32_py(34) == 2017239379
    # strings hash as utf8: murmur3_32("iceberg") = 1210000089 per spec
    assert murmur3_32_py("iceberg") == 1210000089

    lake.create_table("pb", [("k", "int64"), ("v", "varchar")])
    lake.set_partitioned_by("pb", [("k", "bucket(4)")])
    lake.insert(
        "pb",
        spark.createDataFrame([(i, f"v{i}") for i in range(40)], "k long, v string"),
    )
    h = lake._handle("pb")
    snap = lake.meta.latest_snapshot()
    all_files = lake._visible_files(h, snap, None)
    assert len(all_files) >= 2
    pruned = lake._visible_files(h, snap, "k = 7")
    assert 0 < len(pruned) < len(all_files)
    assert lake.table("pb", where="k = 7").count() == 1
    # stored partition value matches the planner's bucket computation
    expected = str(bucket_py(7, 4))
    vals = {
        v
        for (v,) in lake.meta.query(
            "SELECT partition_value FROM ducklake_file_partition_value fpv "
            "JOIN ducklake_data_file df ON df.data_file_id = fpv.data_file_id "
            "WHERE df.end_snapshot IS NULL"
        )
    }
    assert expected in vals


def test_zone_map_pruning(lake, spark):
    lake.create_table("z", [("i", "int64"), ("v", "float64")])
    for k in range(4):  # 4 files with disjoint i ranges
        lake.insert(
            "z",
            spark.createDataFrame(
                [(i, float(i)) for i in range(k * 100, (k + 1) * 100)],
                "i long, v double",
            ).coalesce(1),
        )
    h = lake._handle("z")
    snap = lake.meta.latest_snapshot()
    assert len(lake._visible_files(h, snap, None)) == 4
    assert len(lake._visible_files(h, snap, "i >= 300")) == 1
    assert len(lake._visible_files(h, snap, "i < 100")) == 1
    assert len(lake._visible_files(h, snap, "i = 150")) == 1
    assert len(lake._visible_files(h, snap, "i > 150 AND i < 250")) == 2
    assert len(lake._visible_files(h, snap, "i > 1000")) == 0
    # correctness preserved
    assert lake.table("z", where="i >= 300").count() == 100


def test_zone_map_string_and_timestamp(lake, spark):
    lake.create_table("zs", [("s", "varchar"), ("ts", "timestamp")])
    lake.insert(
        "zs",
        spark.createDataFrame(
            [("apple", datetime.datetime(1995, 1, 1))], "s string, ts timestamp_ntz"
        ).coalesce(1),
    )
    lake.insert(
        "zs",
        spark.createDataFrame(
            [("zebra", datetime.datetime(1999, 1, 1))], "s string, ts timestamp_ntz"
        ).coalesce(1),
    )
    h = lake._handle("zs")
    snap = lake.meta.latest_snapshot()
    assert len(lake._visible_files(h, snap, "s = 'apple'")) == 1
    assert len(lake._visible_files(h, snap, "ts > TIMESTAMP '1997-01-01 00:00:00'")) == 1


def test_stats_kept_for_no_stats_file(lake, spark):
    # files without stats rows must never be pruned (reference :1522-1533)
    lake.create_table("ns", [("i", "int64")])
    lake.insert("ns", spark.range(10).withColumnRenamed("id", "i").coalesce(1))
    lake.meta.con.execute("DELETE FROM ducklake_file_column_stats")
    h = lake._handle("ns")
    snap = lake.meta.latest_snapshot()
    assert len(lake._visible_files(h, snap, "i = 5")) == 1


def test_row_count_fast_path(lake, spark):
    lake.create_table("rcnt", [("i", "int64")])
    lake.insert("rcnt", spark.range(500).withColumnRenamed("id", "i"))
    lake.delete("rcnt", "i < 50")
    assert lake.row_count("rcnt") == 450
    assert lake.table("rcnt").count() == 450


def test_sorted_write(lake, spark):
    lake.create_table("srt", [("i", "int64")])
    lake.meta.con.execute(
        "INSERT INTO ducklake_sort_info VALUES (0, "
        "(SELECT table_id FROM ducklake_table WHERE table_name='srt'), 0, NULL)"
    )
    lake.meta.con.execute(
        "INSERT INTO ducklake_sort_expression VALUES (0, "
        "(SELECT table_id FROM ducklake_table WHERE table_name='srt'), 0, 'i', "
        "'spark', 'desc', 'nulls_last')"
    )
    import random

    vals = list(range(100))
    random.Random(7).shuffle(vals)
    lake.insert(
        "srt", spark.createDataFrame([(v,) for v in vals], "i long").coalesce(1)
    )
    # file content is sorted desc -> zone maps per file; read back in file order
    first_rows = [
        r.i for r in lake.table("srt").limit(5).collect()
    ]
    assert first_rows == sorted(first_rows, reverse=True)


def test_identity_prune_hostile_values(lake, spark):
    """Identity =-pruning must compare RAW typed values: spaces, literal
    '%', escape-looking strings, and 5-vs-'5.0' numeric forms all round
    trip through Spark's Hadoop-escaped partition dir names."""
    from pyspark.sql import functions as F

    lake.create_table("hv", [("i", "int64"), ("p", "varchar")])
    lake.set_partitioned_by("hv", [("p", "identity")])
    tags = ["a b", "5.0", "x%20y", "100%"]
    for tag in tags:
        lake.insert(
            "hv", spark.range(10).select(F.col("id").alias("i"), F.lit(tag).alias("p"))
        )
    for tag in tags:
        assert lake.table("hv", where=f"p = '{tag}'").count() == 10, tag
    # catalog stores raw values (no Hadoop %XX escapes)
    vals = {
        v
        for (v,) in lake.meta.query(
            "SELECT DISTINCT partition_value FROM ducklake_file_partition_value "
            "WHERE table_id=(SELECT table_id FROM ducklake_table "
            "WHERE table_name='hv')"
        )
    }
    assert vals == set(tags)

    lake.create_table("hn", [("i", "int64"), ("k", "int64")])
    lake.set_partitioned_by("hn", [("k", "identity")])
    for k in (5, 7):
        lake.insert(
            "hn", spark.range(10).select(F.col("id").alias("i"), F.lit(k).alias("k"))
        )
    assert lake.table("hn", where="k = 5").count() == 10
    assert lake.table("hn", where="k > 5").count() == 10
    assert lake.table("hn", where="k <= 5").count() == 10


def test_scan_issues_constant_catalog_queries(lake, spark):
    """Scan assembly must not issue per-file catalog round-trips: the
    query count for a 12-file table stays bounded (the round-2 verdict
    flagged an N+1 via _file_begin_snapshot)."""
    from pyspark.sql import functions as F

    lake.create_table("nq", [("i", "int64")])
    for lo in range(12):
        lake.insert(
            "nq", spark.range(lo * 10, lo * 10 + 10).select(F.col("id").alias("i"))
        )
    calls: list[str] = []
    orig = lake.meta.query

    def counting(sql, *a, **kw):
        calls.append(sql)
        return orig(sql, *a, **kw)

    lake.meta.query = counting
    try:
        df = lake.table("nq")
        assert df.count() == 120
    finally:
        lake.meta.query = orig
    per_file = [c for c in calls if "WHERE data_file_id=?" in c]
    assert not per_file, f"{len(per_file)} per-file catalog queries in a scan"
    assert len(calls) < 20, f"{len(calls)} catalog queries for a 12-file scan"


def test_flush_inlined_honors_partition_spec(spark, tmp_path):
    """Flushing inlined rows writes PARTITIONED files with recorded
    partition values, so pruning applies to them like any insert
    (reference: data_inlining_partitions.test)."""
    import conftest as _c

    from ducklake_spark import maintenance as maint
    from ducklake_spark.lake import DuckLake

    lake = DuckLake.attach(
        spark, _c.catalog_url(tmp_path / "fp"), str(tmp_path / "fpd"),
        data_inlining_row_limit=100,
    )
    lake.create_table("pt", [("id", "int64"), ("k", "varchar")])
    lake.set_partitioned_by("pt", [("k", "identity")])
    lake.insert(
        "pt",
        spark.createDataFrame(
            [(i, "a" if i < 5 else "b") for i in range(10)], "id long, k string"
        ),
    )
    # inlined: no files yet
    assert lake.meta.query(
        "SELECT COUNT(*) FROM ducklake_data_file WHERE end_snapshot IS NULL"
    )[0][0] == 0
    maint.flush_inlined_data(lake, table="pt")
    pv = lake.meta.query(
        "SELECT DISTINCT partition_value FROM ducklake_file_partition_value"
    )
    assert sorted(v for (v,) in pv) == ["a", "b"]
    assert lake.table("pt").count() == 10
    assert lake.table("pt", where="k = 'a'").count() == 5
    # pruning: the k='b' file is excluded from a k='a' scan
    h = lake._handle("pt")
    snap = lake._resolve_snapshot(None, None)
    assert len(lake._visible_files(h, snap, "k = 'a'")) == 1


def test_jvm_murmur3_matches_python(spark):
    """The JVM Iceberg-murmur3 UDF (write path) must agree with the
    pure-Python form (planner pruning path) on every supported type —
    including the Iceberg spec vectors murmur3_32(34)=2017239379 and
    murmur3_32('iceberg')=1210000089 reduced mod n."""
    import datetime

    from pyspark.sql import functions as F

    from ducklake_spark.functions.murmur3 import (
        _jvm_bucket_available,
        bucket_py,
        murmur3_bucket_col,
    )

    assert _jvm_bucket_available(), "jar missing from session classpath"
    n = 16
    vals = [
        ("bigint", 34),
        ("bigint", -9223372036854775808),
        ("int", -1),
        ("boolean", True),
        ("string", "iceberg"),
        ("string", ""),
        ("string", "héllo wörld 🦆"),
        ("binary", b"\x00\x01\x02"),
        ("date", datetime.date(2017, 11, 16)),
        ("timestamp", datetime.datetime(2017, 11, 16, 22, 31, 8)),
    ]
    for typ, v in vals:
        df = spark.createDataFrame([(v,)], f"v {typ}")
        got = df.select(murmur3_bucket_col(F.col("v"), n).alias("b")).first().b
        assert got == bucket_py(v, n), (typ, v, got, bucket_py(v, n))
    # null stays null
    df = spark.createDataFrame([(None,)], "v string")
    assert df.select(murmur3_bucket_col(F.col("v"), n).alias("b")).first().b is None


def test_partition_pruning_after_spec_change(lake, spark):
    """Files keep the spec id they were written under: a predicate on
    the NEW key must never prune old files by misreading their values
    (old idx-0 values are a DIFFERENT column), and pruning still works
    for files written under the current spec (reference:
    ducklake_data_file.partition_id ties each file to its spec)."""
    lake.create_table("sc", [("x", "int32"), ("y", "int32")])
    lake.set_partitioned_by("sc", [("x", "identity")])
    lake.insert("sc", spark.createDataFrame(
        [(1, 100), (2, 200)], "x int, y int"))
    lake.set_partitioned_by("sc", [("y", "identity")])
    lake.insert("sc", spark.createDataFrame(
        [(3, 300), (4, 400)], "x int, y int"))
    # y = 200 lives only in an OLD-spec file whose idx-0 value is x=2;
    # under the pre-fix code that file was pruned (2 != 200) -> []
    assert [r.y for r in lake.table("sc", where="y = 200")
            .filter("y = 200").collect()] == [200]
    assert sorted(r.y for r in lake.table("sc", where="y >= 100")
                  .filter("y >= 100").collect()) == [100, 200, 300, 400]
    con = lake.meta.con
    # both specs' files carry their own spec id
    pids = {r[0] for r in con.execute(
        "SELECT DISTINCT partition_id FROM ducklake_data_file "
        "WHERE end_snapshot IS NULL").fetchall()}
    assert len(pids) == 2 and None not in pids
    # current-spec pruning is still effective: a y-predicate prunes the
    # new files by partition value (old files survive via the pid scope)
    clause, params = lake._pruning_clauses(lake._handle("sc"), "y = 300")
    assert "partition_id" in clause and params


def test_partition_write_shuffle_one_file_per_value(lake, spark):
    """The pre-write hash shuffle co-locates each partition value into
    one task: a many-task insert into a K-value partitioning writes K
    files, not tasks x K (the 1000-executor small-file explosion)."""
    lake.create_table("pw", [("k", "int32"), ("v", "int64")])
    lake.set_partitioned_by("pw", [("k", "identity")])
    df = spark.createDataFrame(
        [(i % 4, i) for i in range(4000)], "k int, v long").repartition(8)
    lake.insert("pw", df)
    (n,) = lake.meta.con.execute(
        "SELECT COUNT(*) FROM ducklake_data_file").fetchone()
    assert n == 4
    assert lake.table("pw").count() == 4000
    # opting out restores the shuffle-free write (possibly more files)
    lake.meta.set_option("partition_write_shuffle", "false")
    lake.insert("pw", df)
    assert lake.table("pw").count() == 8000


def test_time_timetz_zone_map_pruning_normalizes_micros(lake, spark):
    """TIME/TIMETZ stats are stored as duckdb clock text but predicates
    arrive as BIGINT micros (Spark has no TIME type) — pruning must
    normalize the literal to the stored text instead of comparing
    CAST('01:00:00' AS REAL) against 3600000000 (which over-prunes on
    SQLite and errors on a DuckDB catalog)."""
    lake.create_table("tt", [("k", "int64"), ("t", "time"),
                             ("tz", "timetz")])
    lake.insert("tt", spark.createDataFrame(
        [(1, 3_600_000_000, 3_600_000_000),
         (2, 3_660_000_000, 3_660_000_000)],
        "k long, t long, tz long").coalesce(1))
    lake.insert("tt", spark.createDataFrame(
        [(3, 7_200_000_000, 7_200_000_000),
         (4, 7_260_000_000, 7_260_000_000)],
        "k long, t long, tz long").coalesce(1))
    assert sorted(r.k for r in
                  lake.table("tt", where="t = 3600000000").collect()) == [1]
    assert sorted(r.k for r in
                  lake.table("tt", where="t > 3660000000").collect()) == [3, 4]
    assert sorted(r.k for r in
                  lake.table("tt", where="t <= 3660000000").collect()) == [1, 2]
    assert sorted(r.k for r in
                  lake.table("tt", where="tz = 7200000000").collect()) == [3]
    # the = prune actually eliminates the 02:00 file, not just filters
    clause, params = lake._pruning_clauses(
        lake._handle("tt"), "t = 3600000000")
    assert "01:00:00" in str(params)
