"""ducklake_spark — a PySpark-native lakehouse + analytics engine.

A from-scratch rebuild of the capabilities of duckdb/ducklake
(reference: /root/reference, "SQL as a Lakehouse Format") on top of
Apache Spark:

- ``ducklake_spark.catalog``   — SQL-database catalog (snapshots, MVCC
  metadata, stats) mirroring the reference's ~25-table schema
  (reference: src/storage/ducklake_metadata_manager.cpp:228-301).
- ``ducklake_spark.lake``      — the user-facing ``DuckLake`` session
  object: create/insert/scan/delete/update/merge/time-travel.
- ``ducklake_spark.queries``   — the analytic query suite (TPC-H-style
  + events/windowing + documents dedup/text + embeddings similarity)
  used by the driver correctness gate and bench.
- ``ducklake_spark.operators`` — large-scale data-pipeline operators
  (dedup, similarity search, text analysis, multimodal plumbing).

Everything is DataFrame/Catalyst-first: the library plans with
metadata SQL on the driver and lets Spark execute declarative plans.
"""

from ducklake_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
