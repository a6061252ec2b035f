"""Iceberg-compatible murmur3_32 for bucket partitioning.

The reference ships exactly one scalar function, ``murmur3_32``,
hashing values per the Iceberg spec (bool/ints -> 8-byte
little-endian long, strings -> utf8 bytes; seed 0 —
src/functions/ducklake_murmur3.cpp:9-107). Spark's built-in ``hash()``
is also murmur3-32 but with seed 42 and different byte layouts, so it
is NOT compatible; we port the algorithm.

Two forms:
- ``murmur3_32_py`` — pure Python, used by the planner for bucket
  pruning (driver side, one value at a time).
- ``murmur3_bucket_col`` — vectorized pandas UDF for the write path
  (computing the bucket partition column). Python-side hashing is the
  slow path, but it only runs on bucket-partitioned *writes*; scans
  prune via catalog SQL and never execute it.
"""

from __future__ import annotations

import datetime
import struct
from typing import Any

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_C1, _C2 = 0xCC9E2D51, 0x1B873593
_MASK = 0xFFFFFFFF


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """Standard murmur3 x86 32-bit, returning unsigned 32-bit."""
    h = seed
    nblocks = len(data) // 4
    for i in range(nblocks):
        k = int.from_bytes(data[4 * i : 4 * i + 4], "little")
        k = (k * _C1) & _MASK
        k = ((k << 15) | (k >> 17)) & _MASK
        k = (k * _C2) & _MASK
        h ^= k
        h = ((h << 13) | (h >> 19)) & _MASK
        h = (h * 5 + 0xE6546B64) & _MASK
    tail = data[4 * nblocks :]
    if tail:
        k = 0
        for i, b in enumerate(tail):
            k |= b << (8 * i)
        k = (k * _C1) & _MASK
        k = ((k << 15) | (k >> 17)) & _MASK
        k = (k * _C2) & _MASK
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _MASK
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _MASK
    h ^= h >> 16
    return h


def _iceberg_bytes(v: Any) -> bytes:
    """Value -> bytes per the Iceberg bucket-transform spec."""
    if isinstance(v, bool):
        v = 1 if v else 0
    if isinstance(v, float):
        # Iceberg: float widens to double -> doubleToLongBits, -0.0
        # normalized (ducklake_murmur3.cpp:56-79)
        if v == 0.0:
            v = 0.0
        return struct.pack("<q", struct.unpack(
            "<q", struct.pack("<d", v))[0])
    if isinstance(v, int):
        return v.to_bytes(8, "little", signed=True)
    if isinstance(v, str):
        return v.encode("utf-8")
    if isinstance(v, bytes):
        return v
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        days = (v - datetime.date(1970, 1, 1)).days
        return days.to_bytes(8, "little", signed=True)
    if isinstance(v, datetime.datetime):
        epoch = datetime.datetime(1970, 1, 1, tzinfo=v.tzinfo)
        micros = int((v - epoch).total_seconds() * 1_000_000)
        return micros.to_bytes(8, "little", signed=True)
    raise TypeError(f"unsupported bucket value type: {type(v)}")


def murmur3_32_py(v: Any) -> int:
    return murmur3_32(_iceberg_bytes(v))


def bucket_py(v: Any, n: int) -> int | None:
    """Planner-side bucket: (murmur3 & 0x7FFFFFFF) % n
    (reference: ducklake_metadata_manager.cpp:1843-1853)."""
    if v is None:
        return None
    return (murmur3_32_py(v) & 0x7FFFFFFF) % n


# sessions (by id) where the Java UDF registered / failed to register
_JVM_UDF_STATE: dict[int, bool] = {}
_JVM_UDF_NAME = "ducklake_murmur3_bucket"


def _jvm_bucket_available() -> bool:
    """Register the JVM Iceberg-murmur3 UDF (java/ducklake/
    IcebergMurmur3.java, shipped in the same jar as the crypto shim)
    on the active session, once. Row-at-a-time JVM beats the Arrow +
    per-row-Python pandas_udf by an order of magnitude on the write
    path and needs no Python workers at all."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        return False
    key = id(spark)
    if key not in _JVM_UDF_STATE:
        try:
            spark.udf.registerJavaFunction(
                _JVM_UDF_NAME, "ducklake.IcebergMurmur3", T.IntegerType()
            )
            _JVM_UDF_STATE[key] = True
        except Exception:
            # jar not on this session's classpath (e.g. a vanilla
            # driver session) -> pandas fallback
            _JVM_UDF_STATE[key] = False
    return _JVM_UDF_STATE[key]


def murmur3_bucket_col(col: Column, n: int) -> Column:
    if _jvm_bucket_available():
        return F.call_function(_JVM_UDF_NAME, col, F.lit(n))

    @F.pandas_udf(T.IntegerType())
    def _bucket(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else bucket_py(v, n))

    return _bucket(col)
