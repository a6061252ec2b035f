"""Structured Streaming source over the DuckLake snapshot log.

The reference has no streaming engine (SURVEY §2.10) — its
incremental surface is snapshots + CDC. The Spark-native rebuild
exposes exactly that as a micro-batch source: each batch covers a
snapshot range [start, end); rows are the table_changes feed
(insert / delete / update_pre/postimage) for that range. Watermarks,
windows, and stateful processing then come from Spark for free.

Implemented with the PySpark 4 Python Data Source API
(``pyspark.sql.datasource``): offsets are snapshot ids, partitions
are (file, kind) units, and workers read parquet via pyarrow — no
driver-side data movement, so a 100 TB table streams at file
granularity across the cluster.

Usage::

    df = (spark.readStream.format("ducklake_changes")
          .option("metadata_path", ...).option("data_path", ...)
          .option("table", "main.events").load())
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql import types as T


@dataclass
class _FilePartition(InputPartition):
    path: str  # absolute parquet path
    row_id_start: int | None
    snapshot_id: int
    change_type: str
    col_names: tuple
    delete_path: str | None = None  # delete positions to subtract
    prev_delete_path: str | None = None  # for deletion feeds: predecessor
    range_start: int = 0
    range_end: int = 0


@dataclass
class _InlinedPartition(InputPartition):
    rows: tuple
    change_type: str


class DuckLakeChangesStreamReader(DataSourceStreamReader):
    def __init__(self, schema: T.StructType, options: dict):
        self.metadata_path = options["metadata_path"]
        self.data_path = options["data_path"].rstrip("/") + "/"
        self.table = options.get("table", "main.events")
        self.start_snapshot = int(options.get("start_snapshot", "0"))
        self.schema_ = schema
        self.col_names = tuple(
            f.name for f in schema.fields
            if f.name not in ("snapshot_id", "rowid", "change_type")
        )

    def _meta(self):
        # backend-pluggable: metadata_path may be a plain sqlite path,
        # duckdb://path, or postgresql://dsn (same resolution as the lake)
        from ducklake_spark.catalog.backends import backend_for

        return backend_for(self.metadata_path).connect()

    def initialOffset(self) -> dict:
        return {"snapshot_id": self.start_snapshot}

    def latestOffset(self) -> dict:
        con = self._meta()
        try:
            (latest,) = con.execute(
                "SELECT MAX(snapshot_id) FROM ducklake_snapshot WHERE snapshot_time IS NOT NULL"
            ).fetchone()
        finally:
            con.close()
        return {"snapshot_id": int(latest or 0)}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        lo, hi = start["snapshot_id"], end["snapshot_id"]
        if hi <= lo:
            return []
        con = self._meta()
        try:
            tname = self.table.split(".")[-1]
            row = con.execute(
                "SELECT table_id FROM ducklake_table WHERE table_name=? "
                "AND end_snapshot IS NULL",
                (tname,),
            ).fetchone()
            if row is None:
                return []
            tid = row[0]
            trow = con.execute(
                "SELECT CASE WHEN t.path_is_relative "
                "THEN s.path || t.path ELSE t.path END "
                "FROM ducklake_table t JOIN ducklake_schema s "
                "ON t.schema_id=s.schema_id "
                "WHERE t.table_id=? AND t.end_snapshot IS NULL", (tid,),
            ).fetchone()
            tpath = trow[0] if trow else ""

            def _fp(path, prel):
                # catalog file paths are TABLE-relative
                return (tpath + path) if prel else path

            parts: list[InputPartition] = []
            # inserted files in (lo, hi]
            for path, prel, rid, bsnap in con.execute(
                "SELECT path, path_is_relative, row_id_start, "
                "begin_snapshot FROM ducklake_data_file "
                "WHERE table_id=? AND begin_snapshot > ? AND begin_snapshot <= ? "
                "AND row_id_start IS NOT NULL",
                (tid, lo, hi),
            ).fetchall():
                path = _fp(path, prel)
                parts.append(
                    _FilePartition(
                        path=os.path.join(self.data_path, path),
                        row_id_start=rid,
                        snapshot_id=bsnap,
                        change_type="insert",
                        col_names=self.col_names,
                    )
                )
            # delete files committed in (lo, hi] -> deletions feed
            for dpath, dprel, data_fid, bsnap in con.execute(
                "SELECT path, path_is_relative, data_file_id, "
                "begin_snapshot FROM ducklake_delete_file "
                "WHERE table_id=? AND begin_snapshot > ? AND begin_snapshot <= ?",
                (tid, lo, hi),
            ).fetchall():
                dpath = _fp(dpath, dprel)
                base = con.execute(
                    "SELECT path, path_is_relative, row_id_start "
                    "FROM ducklake_data_file "
                    "WHERE data_file_id=?",
                    (data_fid,),
                ).fetchone()
                if base is None:
                    continue
                prev = con.execute(
                    "SELECT path, path_is_relative "
                    "FROM ducklake_delete_file WHERE data_file_id=? "
                    "AND begin_snapshot < ? ORDER BY begin_snapshot DESC LIMIT 1",
                    (data_fid, bsnap),
                ).fetchone()
                parts.append(
                    _FilePartition(
                        path=os.path.join(self.data_path,
                                          _fp(base[0], base[1])),
                        row_id_start=base[2],
                        snapshot_id=bsnap,
                        change_type="delete",
                        col_names=self.col_names,
                        delete_path=os.path.join(self.data_path, dpath),
                        prev_delete_path=(
                            os.path.join(self.data_path,
                                         _fp(prev[0], prev[1]))
                            if prev else None
                        ),
                    )
                )
            # whole files dropped in (lo, hi] by a logical DELETE
            delete_snaps = {
                sid
                for sid, changes in con.execute(
                    "SELECT snapshot_id, changes_made FROM ducklake_snapshot_changes "
                    "WHERE snapshot_id > ? AND snapshot_id <= ?",
                    (lo, hi),
                ).fetchall()
                if f"deleted_from_table:{tid}" in (changes or "")
            }
            for path, prel, rid, esnap, fid in con.execute(
                "SELECT path, path_is_relative, row_id_start, "
                "end_snapshot, data_file_id "
                "FROM ducklake_data_file WHERE table_id=? "
                "AND end_snapshot > ? AND end_snapshot <= ?",
                (tid, lo, hi),
            ).fetchall():
                path = _fp(path, prel)
                if esnap not in delete_snaps:
                    continue  # compaction/rewrite, not a logical delete
                prev = con.execute(
                    "SELECT path, path_is_relative "
                    "FROM ducklake_delete_file WHERE data_file_id=? "
                    "AND begin_snapshot < ? ORDER BY begin_snapshot DESC LIMIT 1",
                    (fid, esnap),
                ).fetchone()
                if prev:
                    prev = (_fp(prev[0], prev[1]),)
                parts.append(
                    _FilePartition(
                        path=os.path.join(self.data_path, path),
                        row_id_start=rid,
                        snapshot_id=esnap,
                        change_type="delete",
                        col_names=self.col_names,
                        delete_path=None,  # whole file deleted
                        prev_delete_path=(
                            os.path.join(self.data_path, prev[0]) if prev else None
                        ),
                    )
                )
            # inlined inserts in range
            inl_rows = []
            for (itname,) in con.execute(
                "SELECT table_name FROM ducklake_inlined_data_tables WHERE table_id=?",
                (tid,),
            ).fetchall():
                for r in con.execute(
                    f"SELECT * FROM {itname} WHERE begin_snapshot > ? "
                    "AND begin_snapshot <= ?",
                    (lo, hi),
                ).fetchall():
                    inl_rows.append(tuple(r))
            if inl_rows:
                parts.append(_InlinedPartition(rows=tuple(inl_rows), change_type="insert"))
            return parts
        finally:
            con.close()

    def _arrow_schema(self):
        from pyspark.sql.pandas.types import to_arrow_schema

        return to_arrow_schema(self.schema_)

    def read(self, partition):
        """Yield Arrow RecordBatches (vectorized — no per-row Python loop)."""
        import pyarrow as pa

        target = self._arrow_schema()
        if isinstance(partition, _InlinedPartition):
            # inlined rows: (row_id, begin_snapshot, end_snapshot, *cols)
            rows = [
                (r[1], r[0], partition.change_type) + tuple(r[3:])
                for r in partition.rows
            ]
            cols = list(zip(*rows))
            arrays = [
                pa.array(list(col)).cast(f.type, safe=False)
                for col, f in zip(cols, target)
            ]
            yield pa.record_batch(arrays, schema=target)
            return
        import numpy as np
        import pyarrow.parquet as pq

        tbl = pq.read_table(partition.path)
        n = tbl.num_rows
        if partition.change_type == "insert":
            positions = np.arange(n, dtype=np.int64)
        else:
            if partition.delete_path is None:
                # whole-file delete: every surviving row was removed
                dels = set(range(n))
            else:
                dels = set(pq.read_table(partition.delete_path)["pos"].to_pylist())
            if partition.prev_delete_path:
                dels -= set(
                    pq.read_table(partition.prev_delete_path)["pos"].to_pylist()
                )
            positions = np.array(sorted(dels), dtype=np.int64)
            tbl = tbl.take(pa.array(positions))
        m = len(positions)
        if m == 0:
            return
        if partition.row_id_start is not None:
            rowid = pa.array(positions + partition.row_id_start, pa.int64())
        else:
            rowid = pa.nulls(m, pa.int64())
        arrays = [
            pa.array(np.full(m, partition.snapshot_id, dtype=np.int64)),
            rowid,
            pa.array([partition.change_type] * m, pa.string()),
        ]
        for c, f in zip(partition.col_names, list(target)[3:]):
            if c in tbl.column_names:
                arrays.append(tbl[c].combine_chunks().cast(f.type, safe=False))
            else:
                arrays.append(pa.nulls(m, f.type))
        yield pa.record_batch(arrays, schema=target)

    def commit(self, end: dict) -> None:
        pass


class DuckLakeChangesDataSource(DataSource):
    """spark.readStream.format("ducklake_changes")"""

    @classmethod
    def name(cls) -> str:
        return "ducklake_changes"

    def schema(self) -> str:
        raise NotImplementedError(
            "pass .schema(...) explicitly: snapshot_id/rowid/change_type + table columns"
        )

    def streamReader(self, schema: T.StructType) -> DuckLakeChangesStreamReader:
        return DuckLakeChangesStreamReader(schema, self.options)


def register(spark) -> None:
    spark.dataSource.register(DuckLakeChangesDataSource)


def changes_stream(lake, table: str, *, start_snapshot: int = 0):
    """Convenience: readStream DataFrame of a lake table's change feed."""
    register(lake.spark)
    h = lake._handle(table)
    schema = T.StructType(
        [
            T.StructField("snapshot_id", T.LongType()),
            T.StructField("rowid", T.LongType()),
            T.StructField("change_type", T.StringType()),
        ]
        + list(lake._spark_schema(h).fields)
    )
    return (
        lake.spark.readStream.format("ducklake_changes")
        .schema(schema)
        .option("metadata_path", lake.metadata_path)
        .option("data_path", lake.data_path)
        .option("table", table)
        .option("start_snapshot", str(start_snapshot))
        .load()
    )
