"""Change data feed: table_insertions / table_deletions / table_changes.

Reference semantics:
- ``ducklake_table_insertions(schema, tbl, start, end)`` scans only
  rows whose files were committed with begin_snapshot in
  [start, end] (src/functions/ducklake_table_insertions.cpp:47-99).
- ``ducklake_table_deletions`` returns rows whose positions became
  deleted in the range: new delete-file content minus the previous
  delete file for the same data file, plus whole files dropped by a
  DELETE (ducklake_multi_file_list.cpp:396-421).
- ``table_changes`` is the reference's SQL macro verbatim
  (src/functions/ducklake_table_changes.cpp:7-25): insertions
  left-join deletions on (snapshot_id, rowid) to classify
  insert/update_postimage, unioned with the symmetric
  delete/update_preimage side.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ducklake_spark.lake import ROWID_COL, DuckLake, _resolve_rel_path


def _rel(h, path, prel):
    """Catalog TABLE-relative file path -> data-root-relative."""
    return _resolve_rel_path(h.path, path, prel)


def _with_rowid(schema):
    """Files written by UPDATE/MERGE have no row_id_start: their rowids
    ride the embedded column, which must be in the requested read
    schema or the reference is unresolvable."""
    from pyspark.sql import types as T

    return T.StructType(
        list(schema.fields) + [T.StructField(ROWID_COL, T.LongType())]
    )


def _snapshot_bound(lake: DuckLake, v, side: str) -> int:
    """BIGINT-version or TIMESTAMPTZ overload resolution (reference:
    ducklake_table_insertions.cpp:89-107): a timestamp start maps to
    the first snapshot at/after it, an end to the last at/before."""
    if isinstance(v, int):
        return v
    agg, cmp = ("MIN", ">=") if side == "start" else ("MAX", "<=")
    rows = lake.meta.query(
        f"SELECT {agg}(snapshot_id) FROM ducklake_snapshot "
        f"WHERE snapshot_time IS NOT NULL AND snapshot_time {cmp} ?",
        (str(v),),
    )
    if not rows or rows[0][0] is None:
        raise ValueError(f"no snapshot {cmp} {v!r}")
    return rows[0][0]


def table_insertions(lake: DuckLake, name: str, start, end) -> DataFrame:
    start = _snapshot_bound(lake, start, "start")
    end = _snapshot_bound(lake, end, "end")
    h = lake._handle(name)
    schema = lake._spark_schema(h)
    files = lake.meta.query(
        "SELECT data_file_id, path, path_is_relative, record_count, "
        "row_id_start, partial_max, "
        "file_size_bytes, begin_snapshot FROM ducklake_data_file "
        "WHERE table_id = ? AND row_id_start IS NOT NULL "
        "AND ((begin_snapshot >= ? AND begin_snapshot <= ?) "
        "     OR (partial_max IS NOT NULL AND begin_snapshot <= ? "
        "         AND partial_max >= ?)) "
        "ORDER BY data_file_id",
        (h.table_id, start, end, end, start),
    )
    from ducklake_spark.lake import SNAPID_COL as _SNAP

    frames = []
    for fid, path, prel, rc, rid_start, pmax, fsz, bsnap in files:
        path = _rel(h, path, prel)
        raw = lake.spark.read.parquet(os.path.join(lake.data_path, path))
        df = (
            raw
            .withColumn("rowid", F.lit(rid_start) + F.col("_metadata.row_index"))
        )
        if pmax is not None and _SNAP in raw.columns:
            # compacted POSITIONAL output spanning several snapshots:
            # rows carry their original insert snapshot — filter to the
            # range (the merged file replaced the per-snapshot sources,
            # whose rows were purged by compaction)
            df = (
                df.filter((F.col(_SNAP) >= F.lit(start))
                          & (F.col(_SNAP) <= F.lit(end)))
                .withColumn("snapshot_id", F.col(_SNAP))
            )
        elif start <= bsnap <= end:
            df = df.withColumn("snapshot_id", F.lit(bsnap))
        else:
            continue
        frames.append(df.select(
            *[
                (F.col(f.name).cast(f.dataType)
                 if f.name in raw.columns
                 else F.lit(None).cast(f.dataType)).alias(f.name)
                for f in schema.fields
            ], "rowid", "snapshot_id"))
    # snapshots in range that actually performed inserts on this table —
    # distinguishes update-written files (insert CDC) from rewrite /
    # compaction / flush files (not new rows)
    insert_snaps = {
        sid
        for sid, changes in lake.meta.query(
            "SELECT snapshot_id, changes_made FROM ducklake_snapshot_changes "
            "WHERE snapshot_id >= ? AND snapshot_id <= ?",
            (start, end),
        )
        if f"inserted_into_table:{h.table_id}" in (changes or "")
    }
    upd_files = lake.meta.query(
        "SELECT path, path_is_relative, begin_snapshot, partial_max "
        "FROM ducklake_data_file "
        "WHERE table_id = ? AND row_id_start IS NULL "
        "AND ((begin_snapshot >= ? AND begin_snapshot <= ?) "
        "     OR (partial_max IS NOT NULL AND begin_snapshot <= ? AND partial_max >= ?)) "
        "ORDER BY data_file_id",
        (h.table_id, start, end, end, start),
    )
    from ducklake_spark.lake import SNAPID_COL

    for path, prel, bsnap, pmax in upd_files:
        path = _rel(h, path, prel)
        df = lake.spark.read.parquet(os.path.join(lake.data_path, path))
        if pmax is not None and SNAPID_COL in df.columns:
            # compacted multi-snapshot file: rows carry their original
            # insert snapshot; filter to the requested range
            df = (
                df.filter(
                    (F.col(SNAPID_COL) >= F.lit(start))
                    & (F.col(SNAPID_COL) <= F.lit(end))
                )
                .withColumn("rowid", F.col(ROWID_COL))
                .withColumn("snapshot_id", F.col(SNAPID_COL))
            )
        elif bsnap in insert_snaps and start <= bsnap <= end:
            df = (
                df.withColumn("rowid", F.col(ROWID_COL))
                .withColumn("snapshot_id", F.lit(bsnap))
            )
        else:
            continue
        frames.append(df.select(*[f.name for f in schema.fields], "rowid", "snapshot_id"))
    # inlined rows inserted in range
    inl = _inlined_rows(lake, h, schema, start, end)
    if inl is not None:
        frames.append(inl)
    if not frames:
        from ducklake_spark.lake import _with_virtual_schema
        from pyspark.sql import types as T

        empty = T.StructType(
            list(schema.fields)
            + [T.StructField("rowid", T.LongType()), T.StructField("snapshot_id", T.LongType())]
        )
        return lake.spark.createDataFrame([], empty)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    cols = ["snapshot_id", "rowid"] + [f.name for f in schema.fields]
    return out.select(*cols)


def _inlined_rows(lake, h, schema, start, end):
    from pyspark.sql import types as T

    tabs = lake.meta.query(
        "SELECT table_name FROM ducklake_inlined_data_tables WHERE table_id=?",
        (h.table_id,),
    )
    tail = [
        (T.StructField("rowid", T.LongType()), lambda r, idx: r[idx["row_id"]]),
        (T.StructField("snapshot_id", T.LongType()),
         lambda r, idx: r[idx["begin_snapshot"]]),
    ]
    frames = []
    for (tname,) in tabs:
        rows = lake.meta.query(
            f"SELECT * FROM {tname} WHERE begin_snapshot >= ? AND begin_snapshot <= ?",
            (start, end),
        )
        if rows:
            frames.append(lake.inlined_frame(h, tname, rows, schema, tail=tail))
    if not frames:
        return None
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def table_deletions(lake: DuckLake, name: str, start, end) -> DataFrame:
    start = _snapshot_bound(lake, start, "start")
    end = _snapshot_bound(lake, end, "end")
    h = lake._handle(name)
    schema = lake._spark_schema(h)
    spark = lake.spark
    frames = []

    # predecessor delete-file lookup, batched ONCE for the table — a CDC
    # range over 100k delete files must not mean 100k catalog queries
    all_dels = sorted(
        (fid_, b_, _rel(h, p_, prel_), f_)
        for fid_, b_, p_, prel_, f_ in lake.meta.query(
            "SELECT data_file_id, begin_snapshot, path, "
            "path_is_relative, format "
            "FROM ducklake_delete_file WHERE table_id=?",
            (h.table_id,),
        ))

    def _prev_delete(data_fid: int, before_snap: int):
        """(path, format) of the latest delete file for data_fid with
        begin_snapshot < before_snap, or None."""
        best = None
        for fid_, b_, p_, f_ in all_dels:
            if fid_ == data_fid and b_ < before_snap:
                best = (p_, f_)
            elif fid_ > data_fid:
                break
        return best

    # 1) delete files whose snapshot SPAN intersects the range. A
    # consolidated file replaces its predecessor outright (the old
    # catalog row is deleted, reference _try_commit) and re-emits every
    # position with its original delete snapshot embedded
    # (ducklake_delete.cpp:426-489 "with snapshots"), so each position
    # is attributed to ITS snapshot — begin_snapshot..partial_max is the
    # file's span, and positions outside [start, end] are filtered out.
    # Plain files (no embedded column) read NULL and fall back to the
    # file's begin_snapshot.
    from ducklake_spark.lake import SNAPID_COL

    dels = lake.meta.query(
        "SELECT delete_file_id, data_file_id, path, path_is_relative, "
        "begin_snapshot, "
        "format FROM ducklake_delete_file WHERE table_id=? "
        "AND begin_snapshot <= ? "
        "AND COALESCE(partial_max, begin_snapshot) >= ?",
        (h.table_id, end, start),
    )
    for dfid, data_fid, path, prel, bsnap, fmt in dels:
        path = _rel(h, path, prel)
        cur = lake._delete_file_df(path, fmt, with_snap=True)
        cur = cur.withColumn(
            "__snap", F.coalesce(F.col(SNAPID_COL), F.lit(bsnap))
        ).filter(
            (F.col("__snap") >= F.lit(start))
            & (F.col("__snap") <= F.lit(end))
        )
        # legacy double-count guard: when an end-stamped predecessor row
        # still exists (old layout), its positions repeat in this file
        # attributed to the OLD snapshot — subtract them
        prev = _prev_delete(data_fid, bsnap)
        if prev:
            prev_df = lake._delete_file_df(prev[0], prev[1])
            cur = cur.join(prev_df.select("pos"), ["pos"], "left_anti")
        rows = _rows_at_positions(lake, h, schema, data_fid, cur, None)
        if rows is not None:
            frames.append(rows)

    # 2) whole files dropped in range by a DELETE (not compaction)
    delete_snaps = {
        sid
        for sid, changes in lake.meta.query(
            "SELECT snapshot_id, changes_made FROM ducklake_snapshot_changes "
            "WHERE snapshot_id >= ? AND snapshot_id <= ?",
            (start, end),
        )
        if f"deleted_from_table:{h.table_id}" in (changes or "")
    }
    dropped = lake.meta.query(
        "SELECT data_file_id, path, path_is_relative, row_id_start, "
        "end_snapshot "
        "FROM ducklake_data_file WHERE table_id=? "
        "AND end_snapshot >= ? AND end_snapshot <= ?",
        (h.table_id, start, end),
    )
    for fid, path, prel, rid_start, esnap in dropped:
        path = _rel(h, path, prel)
        if esnap not in delete_snaps:
            continue  # compaction/rewrite, not a logical delete
        read_schema = schema if rid_start is not None else _with_rowid(schema)
        df = spark.read.schema(read_schema).parquet(os.path.join(lake.data_path, path))
        df = (
            df.withColumn("__pos", F.col("_metadata.row_index"))
            .withColumn(
                "rowid",
                F.lit(rid_start) + F.col("__pos")
                if rid_start is not None
                else F.col(ROWID_COL),
            )
            .withColumn("snapshot_id", F.lit(esnap))
        )
        # subtract positions already deleted before the drop
        prev = _prev_delete(fid, esnap)
        if prev:
            prev_df = lake._delete_file_df(prev[0], prev[1]).select(
                F.col("pos").alias("__pos")
            )
            df = df.join(prev_df, "__pos", "left_anti")
        frames.append(df.select("snapshot_id", "rowid", *[f.name for f in schema.fields]))

    # 2b) catalog-inlined small deletes committed in range
    idt = f"ducklake_inlined_delete_{h.table_id}"
    if lake.meta.query(
        "SELECT 1 FROM sqlite_master WHERE type='table' AND name=?", (idt,)
    ):
        inl = lake.meta.query(
            f"SELECT file_id, row_id, begin_snapshot FROM {idt} "
            "WHERE begin_snapshot >= ? AND begin_snapshot <= ?",
            (start, end),
        )
        by_file_snap: dict[tuple[int, int], list[int]] = {}
        for fid, pos, bsnap in inl:
            by_file_snap.setdefault((fid, bsnap), []).append(pos)
        for (fid, bsnap), poss in by_file_snap.items():
            pos_df = spark.createDataFrame([(p,) for p in poss], "pos long")
            rows = _rows_at_positions(lake, h, schema, fid, pos_df, bsnap)
            if rows is not None:
                frames.append(rows)

    # 3) inlined rows whose end_snapshot landed in range — but only when
    # that snapshot was a logical DELETE or an inlined delete/update
    # ("inlined_delete": deleting or updating rows that LIVE inlined —
    # the preimage of an inlined update must surface here, reference
    # data_inlining_interleaved_update.test). A flush also sets
    # end_snapshot but logs "flushed_inlined" and stays excluded.
    inlined_delete_snaps = {
        sid
        for sid, changes in lake.meta.query(
            "SELECT snapshot_id, changes_made FROM ducklake_snapshot_changes "
            "WHERE snapshot_id >= ? AND snapshot_id <= ?",
            (start, end),
        )
        if f"inlined_delete:{h.table_id}" in (changes or "")
    }
    logical_delete_snaps = delete_snaps | inlined_delete_snaps
    tabs = lake.meta.query(
        "SELECT table_name FROM ducklake_inlined_data_tables WHERE table_id=?",
        (h.table_id,),
    )
    from pyspark.sql import types as T

    head = [
        (T.StructField("snapshot_id", T.LongType()),
         lambda r, idx: r[idx["end_snapshot"]]),
        (T.StructField("rowid", T.LongType()), lambda r, idx: r[idx["row_id"]]),
    ]
    for (tname,) in tabs:
        inl_rows = [
            r
            for r in lake.meta.query(
                f"SELECT * FROM {tname} WHERE end_snapshot >= ? AND end_snapshot <= ?",
                (start, end),
            )
            if r[2] in logical_delete_snaps
        ]
        if inl_rows:
            frames.append(
                lake.inlined_frame(h, tname, inl_rows, schema, head=head)
            )

    if not frames:
        from pyspark.sql import types as T

        empty = T.StructType(
            [T.StructField("snapshot_id", T.LongType()), T.StructField("rowid", T.LongType())]
            + list(schema.fields)
        )
        return spark.createDataFrame([], empty)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.select("snapshot_id", "rowid", *[f.name for f in schema.fields])


def _rows_at_positions(lake, h, schema, data_fid, positions: DataFrame,
                       snap_id: int | None):
    """Data rows of ``data_fid`` at the given file positions.
    ``snap_id=None`` means the positions DataFrame carries a per-position
    ``__snap`` column (consolidated delete files embedding the snapshot
    each position was deleted at, ducklake_delete.cpp:426-489)."""
    row = lake.meta.query(
        "SELECT path, path_is_relative, row_id_start "
        "FROM ducklake_data_file WHERE data_file_id=?",
        (data_fid,),
    )
    if not row:
        return None
    path, prel, rid_start = row[0]
    path = _rel(h, path, prel)
    read_schema = schema if rid_start is not None else _with_rowid(schema)
    df = (
        lake.spark.read.schema(read_schema)
        .parquet(os.path.join(lake.data_path, path))
        .withColumn("__pos", F.col("_metadata.row_index"))
    )
    if snap_id is None:
        pos = positions.select(
            F.col("pos").alias("__pos"), F.col("__snap")
        ).dropDuplicates(["__pos"])
        df = df.join(F.broadcast(pos), "__pos", "inner")
        snap_col = F.col("__snap")
    else:
        pos = positions.select(F.col("pos").alias("__pos"))
        df = df.join(F.broadcast(pos), "__pos", "left_semi")
        snap_col = F.lit(snap_id)
    rowid = (
        F.lit(rid_start) + F.col("__pos") if rid_start is not None else F.col(ROWID_COL)
    )
    return (
        df.withColumn("rowid", rowid)
        .withColumn("snapshot_id", snap_col)
        .select("snapshot_id", "rowid", *[f.name for f in schema.fields])
    )


def table_changes(lake: DuckLake, name: str, start, end) -> DataFrame:
    """The reference macro (ducklake_table_changes.cpp:7-25) as DataFrame ops."""
    ins = table_insertions(lake, name, start, end)
    dels = table_deletions(lake, name, start, end)
    d_keys = dels.select(
        F.col("snapshot_id").alias("__dsnap"), F.col("rowid").alias("__drow")
    )
    i_keys = ins.select(
        F.col("snapshot_id").alias("__isnap"), F.col("rowid").alias("__irow")
    )
    ins_marked = ins.join(
        d_keys,
        (ins["snapshot_id"] == d_keys["__dsnap"]) & (ins["rowid"] == d_keys["__drow"]),
        "left",
    ).withColumn(
        "change_type",
        F.when(F.col("__drow").isNotNull(), F.lit("update_postimage")).otherwise(
            F.lit("insert")
        ),
    ).drop("__dsnap", "__drow")
    dels_marked = dels.join(
        i_keys,
        (dels["snapshot_id"] == i_keys["__isnap"]) & (dels["rowid"] == i_keys["__irow"]),
        "left",
    ).withColumn(
        "change_type",
        F.when(F.col("__irow").isNotNull(), F.lit("update_preimage")).otherwise(
            F.lit("delete")
        ),
    ).drop("__isnap", "__irow")
    cols = ["snapshot_id", "rowid", "change_type"] + [
        c for c in ins.columns if c not in ("snapshot_id", "rowid")
    ]
    return ins_marked.select(*cols).unionByName(dels_marked.select(*cols))


DuckLake.table_insertions = lambda self, name, start, end: table_insertions(self, name, start, end)
DuckLake.table_deletions = lambda self, name, start, end: table_deletions(self, name, start, end)
DuckLake.table_changes = lambda self, name, start, end: table_changes(self, name, start, end)
