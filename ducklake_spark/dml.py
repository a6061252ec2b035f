"""DELETE / UPDATE / MERGE physical operators.

Reference semantics (SURVEY §2.2):
- DELETE scans victim positions ``(file, file_row_number)``, writes
  **one positional-delete parquet per touched data file**, merging
  pre-existing deletes; files whose every live row is deleted are
  dropped instead of getting a delete file
  (src/storage/ducklake_delete.cpp:36-158,410-424,598-631).
- UPDATE = delete + insert, with the new rows carrying the preserved
  ``_ducklake_internal_row_id`` column
  (src/storage/ducklake_update.cpp:260-334,
  update_is_del_and_insert = true).
- MERGE INTO composes the two Delta-style: full-outer join + action
  disposition (src/storage/ducklake_merge_into.cpp:474-641).

Scale shape: victims are computed by a single distributed scan; the
per-file grouping is a shuffle on file path (bounded by #touched
files); only per-file *counts* ever reach the driver.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ducklake_spark.lake import (
    ROWID_COL,
    SNAPID_COL,
    DuckLake,
    DuckLakeError,
    TableHandle,
)
from ducklake_spark.transaction import DataFileInfo, DeleteFileInfo


def _log_change(txn, entry: str) -> None:
    """Append a changes_made entry once (a DML may route victims through
    several forms — absorbed + delete-file — for the same table)."""
    if entry not in txn.change_log:
        txn.change_log.append(entry)


def _live_files(lake: DuckLake, h: TableHandle, snap, where: str) -> list[dict]:
    """Committed files visible at ``snap`` minus files the OPEN
    transaction already dropped whole — its own later DML must not
    resurrect them (reference BEGIN semantics)."""
    files = lake._visible_files(h, snap, where)
    if lake._txn is not None:
        removed = set(lake._txn.removed_data_files.get(h.table_id, []))
        if removed:
            files = [f for f in files if f["data_file_id"] not in removed]
    return files


def _victims(lake: DuckLake, name: str, where: str) -> tuple[TableHandle, DataFrame]:
    h = lake._handle(name)
    snap = lake._resolve_snapshot(None, None)
    files = _live_files(lake, h, snap, where)
    schema = lake._spark_schema(h)
    deletes = lake._delete_entries(h, snap, [f["data_file_id"] for f in files],
                                   txn_overlay=True)
    df = lake._read_files(h, snap, files, schema, deletes, with_virtual=True)
    if df is None:
        return h, None
    return h, df.filter(where)


def _rewrite_txn_local(lake: DuckLake, h: TableHandle, where: str,
                       assignments: dict[str, str] | None) -> int:
    """DELETE/UPDATE against a table created in the CURRENT transaction.

    DELETE writes positional delete parquets against the buffered files
    — the reference's txn-local layout (drop_table_cleans_delete_files
    .test shows a ``*-delete.*`` file mid-transaction;
    delete_same_transaction.test shows the two sequential deletes leave
    ONE merged delete file after commit). UPDATE rewrites the buffers
    in place (delete+re-insert preserving buffered rowids)."""
    key = f"{h.schema_name}.{h.table_name}"
    if assignments is None:
        return (_delete_buffered_as_files(lake, h, where, key)
                + _dml_buffered_inlined(lake, h, where, None))
    return (_rewrite_buffered(lake, h, where, assignments, key)
            + _dml_buffered_inlined(lake, h, where, assignments))


def _delete_buffered_as_files(lake: DuckLake, h: TableHandle, where: str,
                              key: str) -> int:
    """DELETE over this transaction's buffered files via positional
    delete parquets (reference txn-local delete layout,
    ducklake_delete.cpp over transaction-local file lists). The delete
    file references its data file by PATH — the commit resolves the
    assigned id through committed_path_fid (transaction.py). Sequential
    deletes merge: the new file absorbs the previous buffered delete
    file's positions and the old parquet is unlinked."""
    from pyspark.sql import types as _T

    from ducklake_spark.lake import (DECODED_FILE_PATH, ROWID_COL,
                                     SNAPID_COL)
    from ducklake_spark.transaction import DeleteFileInfo

    txn = lake._begin()
    files = txn.new_data_files.get(key, [])
    if not files:
        return 0
    schema = lake._spark_schema(h)
    snap = lake._resolve_snapshot(None, None)
    anticipated = snap.snapshot_id + 1
    prev_by_path = {d.data_file_id: d
                    for d in txn.new_delete_files.get(key, [])
                    if isinstance(d.data_file_id, str)}
    uri_to_rel = {lake._file_uri(f.path): f.path for f in files}
    new_dels = None
    for allocate in (True, False):
        grp = [f for f in files if f.allocate == allocate]
        if not grp:
            continue
        rschema = schema if allocate else _T.StructType(
            list(schema.fields) + [_T.StructField(ROWID_COL, _T.LongType())])
        paths = [os.path.join(lake.data_path, f.path) for f in grp]
        df = (lake.spark.read.schema(rschema).parquet(*paths)
              .withColumn("__file", F.expr(DECODED_FILE_PATH))
              .withColumn("pos", F.col("_metadata.row_index")))
        part = df.filter(where).select("__file", "pos")
        new_dels = part if new_dels is None else new_dels.unionByName(part)
    if new_dels is None:
        return 0
    if len(uri_to_rel) <= int(
            lake.meta.option("filemap_inline_limit", "16") or 0):
        # literal map instead of a broadcast join (see
        # _apply_file_deletes_fused): inner-join semantics preserved
        # by the not-null filter
        new_dels = new_dels.select(
            F.try_element_at(
                F.create_map(*[
                    F.lit(x) for kv in uri_to_rel.items() for x in kv]),
                F.col("__file")).alias("file_path"),
            "pos",
        ).filter(F.col("file_path").isNotNull())
    else:
        from ducklake_spark.lake import _local_df

        rel_map = _local_df(lake.spark, list(uri_to_rel.items()),
                            "__file string, file_path string")
        new_dels = new_dels.join(
            F.broadcast(rel_map), "__file").select("file_path", "pos")
    new_dels = (new_dels
                .withColumn("is_new", F.lit(True))
                .withColumn("snap", F.lit(anticipated).cast("long")))
    prev_df = None
    if prev_by_path:
        prev_paths = [os.path.join(lake.data_path, d.path)
                      for d in prev_by_path.values()]
        prev_df = (lake.spark.read.schema(
            f"file_path string, pos long, `{SNAPID_COL}` long")
            .parquet(*prev_paths)
            .select("file_path", "pos",
                    F.lit(False).alias("is_new"),
                    F.col(SNAPID_COL).alias("snap")))
        # a position deleted earlier in this transaction is not a new
        # victim (multi_deletes.test count semantics)
        new_dels = new_dels.join(prev_df.select("file_path", "pos"),
                                 ["file_path", "pos"], "left_anti")
    all_dels = (new_dels.select("file_path", "pos", "is_new", "snap")
                if prev_df is None
                else new_dels.select("file_path", "pos", "is_new", "snap")
                .unionByName(prev_df.select(
                    "file_path", "pos", "is_new", "snap")))
    delete_dir = os.path.join(lake.data_path, h.path)
    lake.lfs.makedirs(lake.lfs.strip_scheme(delete_dir))
    written = _write_delete_files_distributed(
        lake, delete_dir, all_dels, 0, anticipated)
    n_new = sum(w["n_new"] for w in written)
    if n_new == 0:
        for w in written:
            if w["out_path"]:
                lake.lfs.remove(lake.lfs.strip_scheme(w["out_path"]))
        return 0
    by_rel = {f.path: f for f in files}

    def _drop_prev(rel: str) -> None:
        prev = prev_by_path.pop(rel, None)
        if prev is not None:
            txn.new_delete_files[key].remove(prev)
            lake.lfs.remove(lake.lfs.strip_scheme(
                os.path.join(lake.data_path, prev.path)))

    for w in written:
        fi = by_rel[w["file_path"]]
        if w["n"] >= (fi.record_count or 0):
            # every buffered row gone: drop the buffered file whole
            # (adopted external files stay on disk —
            # preserve_external_transaction_local_files.test)
            if w["out_path"]:
                lake.lfs.remove(lake.lfs.strip_scheme(w["out_path"]))
            _drop_prev(fi.path)
            txn.new_data_files[key].remove(fi)
            if fi.mapping_id is None:
                lake.lfs.remove(lake.lfs.strip_scheme(
                    os.path.join(lake.data_path, fi.path)))
            continue
        _drop_prev(fi.path)
        txn.new_delete_files.setdefault(key, []).append(
            DeleteFileInfo(
                data_file_id=fi.path,
                path=os.path.relpath(w["out_path"], lake.data_path),
                delete_count=w["n"],
                file_size_bytes=w["size"],
                footer_size=w["footer"],
                format="parquet",
                encryption_key=w.get("enc_key") or None,
                begin_snapshot_override=(
                    w["smin"] if w.get("with_snaps") else None),
                partial_max=w["smax"] if w.get("with_snaps") else None,
            )
        )
    return n_new


def _rewrite_buffered(lake: DuckLake, h: TableHandle, where: str,
                      assignments: dict[str, str] | None, key: str) -> int:
    """Rewrite the transaction's buffered files for ``key`` in place.

    Used for txn-local tables AND for a committed table whose open
    transaction already buffered inserts — a later DELETE/UPDATE in the
    same transaction must see those rows (reference:
    test/sql/delete/delete_same_transaction.test). Files whose rows
    carry an embedded rowid (update/compaction output, allocate=False)
    are rewritten WITH that column so preserved rowids survive."""
    from pyspark.sql import types as _T

    from ducklake_spark.lake import ROWID_COL

    txn = lake._begin()
    files = txn.new_data_files.get(key, [])
    if not files:
        return 0
    schema = lake._spark_schema(h)
    total = 0
    out_files = []
    part_keys, sort_spec = lake._partition_spec(h), lake._sort_spec(h)
    for allocate in (True, False):
        grp = [f for f in files if f.allocate == allocate]
        if not grp:
            continue
        rschema = schema if allocate else _T.StructType(
            list(schema.fields) + [_T.StructField(ROWID_COL, _T.LongType())])
        paths = [os.path.join(lake.data_path, f.path) for f in grp]
        df = lake.spark.read.schema(rschema).parquet(*paths)
        if assignments is not None:
            total += df.filter(where).count()  # matched rows
        else:
            total += sum(f.record_count for f in grp)
        if assignments is None:
            out = df.filter(f"NOT ({where}) OR ({where}) IS NULL")
        else:
            cond = F.expr(where)
            out = df.select(*[
                F.when(cond, F.expr(assignments[f.name])).otherwise(
                    F.col(f.name)).alias(f.name)
                if f.name in assignments else F.col(f.name)
                for f in rschema.fields
            ])
            out = lake._enforce_not_null(out, h)
        # plain table schema drives stats harvest; the embedded rowid
        # column rides along in the df (same shape update's writer uses)
        new_files = lake._write_parquet(h, out, schema, part_keys,
                                          sort_spec, rotate=False)
        if not allocate:
            for nf in new_files:
                nf.allocate = False
                nf.row_id_start = None
        for fi in grp:
            if fi.mapping_id is not None:
                # adopted via add_data_files: the file is externally
                # owned — dropping its txn-local registration must not
                # touch the disk (test/sql/delete/
                # preserve_external_transaction_local_files.test)
                continue
            lake.lfs.remove(
                lake.lfs.strip_scheme(os.path.join(lake.data_path, fi.path)))
        out_files.extend(new_files)
    txn.new_data_files[key] = out_files
    written = sum(f.record_count for f in out_files)
    before = sum(f.record_count for f in files)
    return (before - written) if assignments is None else total


def delete(lake: DuckLake, name: str, where: str | None = None) -> int:
    """DELETE FROM name [WHERE ...]; returns deleted row count. No
    predicate truncates: every file fully matches, so the whole-file
    drop path retires them without writing delete parquet
    (test/sql/delete/truncate_table.test)."""
    if where is None:
        where = "true"
    h = lake._handle(name)
    if h.table_id < 0:
        return _rewrite_txn_local(lake, h, where, None)
    snap = lake._resolve_snapshot(None, None)
    txn0 = lake._txn
    files = _live_files(lake, h, snap, where)
    schema = lake._spark_schema(h)
    # txn_overlay: positions deleted EARLIER IN THIS TRANSACTION (delete
    # files buffered in the txn, absorbed inlined positions) must not be
    # victims again — a second DELETE in one BEGIN previously recounted
    # them (reference: test/sql/delete/multi_deletes.test returns 1250,
    # not 2500, for the second overlapping delete)
    delete_entries = lake._delete_entries(
        h, snap, [f["data_file_id"] for f in files], txn_overlay=True)
    df = lake._read_files(h, snap, files, schema, delete_entries, with_virtual=True)
    victims = None
    if df is not None:
        victims = (
            df.filter(where)
            .select(F.col("filename"), F.col("file_row_number").alias("pos"))
        )
    n_deleted = _apply_file_deletes(lake, h, snap, files, victims)
    n_inl = _delete_inlined(lake, h, where)
    n_buf = 0
    if txn0 is not None:
        # rows INSERTED earlier in this same transaction live in
        # buffered files: rewrite them (reference
        # test/sql/delete/delete_same_transaction.test)
        n_buf = _rewrite_buffered(lake, h, where, None, str(h.table_id))
        n_buf += _dml_buffered_inlined(lake, h, where, None)
    if n_deleted + n_inl + n_buf == 0:
        return 0
    # NO stats decrement for inlined-DATA row deletes: the reference
    # keeps ducklake_table_stats.record_count GROSS (total ever
    # inserted) for EVERY delete form — file-positional, absorbed, and
    # inlined-row alike; only whole-file drops and compaction recompute
    # it (ducklake_scan.cpp:214-220: min_max_exact compares the gross
    # count against the net count, so an inlined delete must leave a
    # gross>net gap to disable the MIN/MAX fold —
    # min_max_optimization_deletes.test section 3)
    lake._begin()
    # change kinds are logged at the site that knows the delete's form:
    # _apply_file_deletes (deleted_from_table / inlined_delete for
    # absorbed positions) and _delete_inlined (inlined_delete)
    lake._autocommit()
    return n_deleted + n_inl + n_buf


def _apply_file_deletes(lake: DuckLake, h: TableHandle, snap, files: list[dict],
                        victims: DataFrame | None) -> int:
    """Apply a victims relation (filename, pos) against parquet-backed
    rows: whole-file drops, inlined absorption, or per-file positional
    delete parquet with merge. Shared by DELETE / UPDATE / MERGE —
    victims can come from a predicate scan or a join, always as one
    distributed relation (no driver-side row loops)."""
    if victims is None:
        return 0
    file_by_path = {
        lake._file_uri(f["path"]): f for f in files
    }
    return _apply_file_deletes_fused(
        lake, h, snap, files, victims, file_by_path)


def _delete_inline_limit(lake: DuckLake, h: TableHandle) -> int:
    """Per-file threshold for absorbing positional deletes into the
    catalog instead of writing a delete file. The reference drives this
    from data_inlining_row_limit itself (ducklake_delete.cpp:530-546:
    DataInliningRowLimit gates inlined file deletions, decided per data
    file); deletion_inlining_row_limit stays as a beyond-reference
    explicit override so delete absorption can be tuned independently
    of insert inlining."""
    v = lake.meta.option("deletion_inlining_row_limit", None,
                         scope="table", scope_id=h.table_id,
                         schema_id=h.schema_id)
    if v not in (None, ""):
        return int(v)
    return lake._inline_limit(h.table_id, h.schema_id)


def _apply_file_deletes_fused(lake: DuckLake, h: TableHandle, snap,
                              files: list[dict], victims: DataFrame,
                              file_by_path: dict) -> int:
    """Single-action DELETE apply: victims shuffle straight into the
    per-file delete-parquet writers; pre-existing delete content for the
    touched files merges INSIDE the same job (semi-join against the
    victim file set), and the full-drop / partial decision is made from
    the writers' returned counts — fully-deleted files' fresh delete
    parquet is discarded and the file dropped whole. One scan of the
    table instead of two (count pass + write pass)."""
    txn0 = lake._txn
    already_replaced = (set(txn0.replaced_delete_files)
                        if txn0 is not None else set())
    existing: dict = {}
    existing_ids: dict = {}
    prev_begin: dict = {}
    from ducklake_spark.lake import _resolve_rel_path as _rrp

    for fid, path, prel, fmt, dc, ekey, dfid, dbegin in lake.meta.query(
        "SELECT data_file_id, path, path_is_relative, format, "
        "delete_count, encryption_key, "
        "delete_file_id, begin_snapshot FROM ducklake_delete_file "
        "WHERE table_id=? AND begin_snapshot <= ? "
        "AND (end_snapshot IS NULL OR end_snapshot > ?)",
        (h.table_id, snap.snapshot_id, snap.snapshot_id),
    ):
        if dfid in already_replaced:
            continue  # superseded earlier in this open transaction
        existing[fid] = (_rrp(h.path, path, prel), fmt, dc, ekey)
        existing_ids[fid] = dfid
        prev_begin[fid] = dbegin
    # delete files BUFFERED by this open transaction supersede the
    # committed row for their data file: their positions merge into the
    # rewrite, and writing a fresh file replaces the buffered one
    # in-place (never committed, so its parquet is just removed)
    txn_local_prev: dict = {}
    if txn0 is not None:
        for d in txn0.new_delete_files.get(h.table_id, []):
            existing[d.data_file_id] = (d.path, d.format, d.delete_count,
                                        d.encryption_key)
            existing_ids.pop(d.data_file_id, None)
            txn_local_prev[d.data_file_id] = d
    # scan filenames -> catalog paths for EVERY candidate file (the
    # victim set is unknown until the job runs). The map has #files
    # rows: broadcast-joined below the same row limit that gates the
    # delete-position broadcast — at millions of candidate files a
    # forced broadcast ships hundreds of MB to every executor, so past
    # the limit the hint is dropped and AQE picks the join strategy
    # (shuffle, or its own runtime broadcast if the map turns out small)
    # positions written by THIS delete are stamped with the anticipated
    # commit snapshot, like the reference (ducklake_delete.cpp:433:
    # current_snapshot.snapshot_id + 1) — merged delete files embed a
    # per-position snapshot column so one file serves every snapshot
    anticipated = snap.snapshot_id + 1
    inline_files = int(lake.meta.option("filemap_inline_limit", "16") or 0)
    if len(files) <= inline_files:
        # literal map instead of a broadcast join (same rewrite as
        # _read_files' file-info map): no driver-RDD broadcast job per
        # DELETE, and inner-join semantics preserved by the not-null
        # filter. Past the limit the join returns — the map lookup is
        # a linear key scan and a million-file literal has no place in
        # a plan.
        fmap_expr = F.create_map(*[
            F.lit(x) for f in files
            for x in (lake._file_uri(f["path"]), f["path"])])
        new_dels = victims.select(
            F.try_element_at(fmap_expr, F.col("filename")).alias(
                "file_path"),
            "pos",
        ).filter(F.col("file_path").isNotNull())
    else:
        from ducklake_spark.lake import _local_df

        fname_map = _local_df(
            lake.spark,
            [(lake._file_uri(f["path"]), f["path"]) for f in files],
            "filename string, file_path string",
        )
        bcast_limit = int(lake.meta.option("delete_broadcast_row_limit",
                                           "1000000") or 0)
        if len(files) <= bcast_limit:
            fname_map = F.broadcast(fname_map)
        new_dels = victims.join(fname_map, "filename").select(
            "file_path", "pos")
    new_dels = new_dels.withColumn("is_new", F.lit(True)).withColumn(
        "snap", F.lit(anticipated).cast("long"))

    # pre-existing delete content of candidate files, narrowed to files
    # that actually receive new deletes by an in-job semi-join (no
    # separate action; files without new victims must NOT be rewritten)
    fid_by_path = {f["path"]: f["data_file_id"] for f in files}
    prev_pq, prev_enc, prev_dv = [], [], []
    for rel, fid in fid_by_path.items():
        prev = existing.get(fid)
        if not prev:
            continue
        if (prev[1] or "parquet").lower() == "puffin":
            prev_dv.append((os.path.join(lake.data_path, prev[0]), rel))
        elif prev[3]:
            prev_enc.append((os.path.join(lake.data_path, prev[0]), prev[3]))
        else:
            prev_pq.append(os.path.join(lake.data_path, prev[0]))
    from ducklake_spark.lake import SNAPID_COL

    prev_df = None
    if prev_pq:
        prev_df = lake.spark.read.schema(
            f"file_path string, pos long, `{SNAPID_COL}` long"
        ).parquet(*prev_pq).withColumnRenamed(SNAPID_COL, "snap")
    if prev_enc:
        pe = lake._read_encrypted_delete_files(prev_enc)
        if SNAPID_COL in pe.columns:
            pe = pe.select("file_path", "pos",
                           F.col(SNAPID_COL).alias("snap"))
        else:
            pe = pe.select("file_path", "pos",
                           F.lit(None).cast("long").alias("snap"))
        prev_df = pe if prev_df is None else prev_df.unionByName(pe)
    if prev_dv:
        pd_df = lake._decode_dv_files(prev_dv).withColumnRenamed(
            "__dfile", "file_path").withColumnRenamed("__dpos", "pos")
        if SNAPID_COL in pd_df.columns:
            pd_df = pd_df.withColumnRenamed(SNAPID_COL, "snap")
        else:
            pd_df = pd_df.withColumn("snap", F.lit(None).cast("long"))
        pd_df = pd_df.select("file_path", "pos", "snap")
        prev_df = pd_df if prev_df is None else prev_df.unionByName(pd_df)
    all_dels = new_dels
    if prev_df is not None:
        # inherited positions lacking an embedded snapshot take the
        # previous delete file's begin_snapshot (reference
        # MergeDeletesWithSnapshots fallback)
        begin_rows = [(rel, prev_begin.get(fid))
                      for rel, fid in fid_by_path.items() if fid in existing]
        prev_df = prev_df.join(
            new_dels.select("file_path").distinct(), "file_path", "left_semi"
        )
        if len(begin_rows) <= inline_files:
            # literal map (LeftOuter semantics: NULL on missing keys,
            # None-valued entries skipped — try_element_at yields NULL)
            bm_entries = [F.lit(x) for rel, b in begin_rows
                          if b is not None for x in (rel, b)]
            prev_begin_col = (
                F.try_element_at(
                    F.create_map(*bm_entries), F.col("file_path"))
                .cast("long")
                if bm_entries else F.lit(None).cast("long"))
            prev_df = prev_df.withColumn("__prev_begin", prev_begin_col)
        else:
            from ducklake_spark.lake import _local_df

            begin_map = _local_df(
                lake.spark, begin_rows,
                "file_path string, __prev_begin long",
            )
            prev_df = prev_df.join(
                F.broadcast(begin_map), "file_path", "left")
        prev_df = prev_df.select(
            "file_path", "pos",
            F.lit(False).alias("is_new"),
            F.coalesce(F.col("snap"), F.col("__prev_begin")).alias("snap"),
        )
        all_dels = new_dels.select(
            "file_path", "pos", "is_new", "snap").unionByName(prev_df)

    delete_dir = os.path.join(lake.data_path, h.path)
    lake.lfs.makedirs(lake.lfs.strip_scheme(delete_dir))
    use_dv = (
        lake.meta.option("write_deletion_vectors", "false",
                         scope="table", scope_id=h.table_id,
                         schema_id=h.schema_id) or "false"
    ).lower() == "true"
    # per-file deletion inlining (reference ducklake_delete.cpp:530-546):
    # the writers skip the parquet/puffin write for files whose NEW
    # delete count fits the threshold and hand the positions back for
    # catalog absorption — still one action, no extra pass
    inline_limit = _delete_inline_limit(lake, h)
    if use_dv:
        written = _write_dv_files_distributed(
            lake, delete_dir, all_dels, inline_limit, anticipated)
    else:
        written = _write_delete_files_distributed(
            lake, delete_dir, all_dels, inline_limit, anticipated)
    n_deleted = sum(w["n_new"] for w in written)
    if n_deleted == 0:
        for w in written:  # defensive: semi-join should prevent these
            if w["out_path"]:
                lake.lfs.remove(lake.lfs.strip_scheme(w["out_path"]))
        return 0

    txn = lake._begin()
    inl_counts = _inlined_delete_counts(lake, h)
    by_rel = {f["path"]: f for f in files}
    had_file = had_inline = False

    def _drop_txn_prev(fid):
        prev = txn_local_prev.get(fid)
        if prev is not None:
            txn.new_delete_files[h.table_id].remove(prev)
            lake.lfs.remove(lake.lfs.strip_scheme(
                os.path.join(lake.data_path, prev.path)))

    for w in written:
        finfo = by_rel[w["file_path"]]
        fid = finfo["data_file_id"]
        if w["n"] + inl_counts.get(fid, 0) >= finfo["record_count"]:
            # every live row gone: drop the file whole; the merged
            # delete parquet just written (if any) is unneeded, and so
            # is a delete file this transaction buffered for it
            if w["out_path"]:
                lake.lfs.remove(lake.lfs.strip_scheme(w["out_path"]))
            _drop_txn_prev(fid)
            txn.removed_data_files.setdefault(h.table_id, []).append(fid)
            txn.touched_delete_data_files.add(fid)
            # GROSS stats convention (reference full_file_delete_stats):
            # partial deletes leave record_count alone; a whole-file
            # drop subtracts the file's record count
            delta = txn.stats_delta.setdefault(h.table_id, {})
            delta["records"] = (delta.get("records", 0)
                                - finfo["record_count"])
            delta["bytes"] = (delta.get("bytes", 0)
                              - (finfo["file_size_bytes"] or 0))
            # commit applies the reference's dropped-file stats rule
            # (delete-or-reset of global column stats)
            dfs = txn.dropped_file_stats.setdefault(h.table_id, [0, 0])
            dfs[0] += finfo["record_count"]
            dfs[1] += finfo["file_size_bytes"] or 0
            had_file = True
            continue
        if not w["out_path"]:
            # inlined file deletions: new positions absorb into the
            # catalog; a pre-existing delete file stays live (the scan
            # merges both), so nothing is replaced
            txn.inlined_deletes.setdefault(h.table_id, []).extend(
                (fid, int(p)) for p in json.loads(w["new_pos"])
            )
            txn.touched_delete_data_files.add(fid)
            had_inline = True
            continue
        had_file = True
        if fid in txn_local_prev:
            _drop_txn_prev(fid)
        elif fid in existing_ids:
            txn.replaced_delete_files.append(existing_ids[fid])
        txn.new_delete_files.setdefault(h.table_id, []).append(
            DeleteFileInfo(
                data_file_id=fid,
                path=os.path.relpath(w["out_path"], lake.data_path),
                delete_count=w["n"],
                file_size_bytes=w["size"],
                footer_size=w["footer"],
                format="puffin" if use_dv else "parquet",
                encryption_key=w.get("enc_key") or None,
                row_group_count=w.get("rgs"),
                # merged files spanning committed delete history keep
                # the earliest snapshot as begin and record the span
                # (reference: begin_snapshot is the minimum embedded
                # snapshot, partial_max the maximum)
                begin_snapshot_override=(
                    w["smin"] if w.get("with_snaps") else None),
                partial_max=w["smax"] if w.get("with_snaps") else None,
            )
        )
        txn.touched_delete_data_files.add(fid)
    if had_file:
        _log_change(txn, f"deleted_from_table:{h.table_id}")
    if had_inline:
        # catalog-absorbed positional deletes are "inlined deletes" in
        # the changes grammar (reference new_inlined_file_deletes ->
        # tables_deleted_inlined, ducklake_transaction.cpp:1051-1053)
        _log_change(txn, f"inlined_delete:{h.table_id}")
    return n_deleted


def _write_delete_files_distributed(lake, delete_dir: str, dels: DataFrame,
                                    inline_limit: int = 0,
                                    anticipated: int | None = None,
                                    ) -> list[dict]:
    """Write one reference-layout delete parquet per data file, each
    group on the executor that owns it; returns per-file metadata rows
    (file_path, out_path, n, size). Reference layout:
    ducklake_delete.cpp:598-631 (sorted positions, Iceberg field ids).
    ENCRYPTED lakes give each delete file its own random PME key like
    the reference (ducklake_delete.cpp:63-70; crypto_pme module).
    Files whose NEW delete count fits ``inline_limit`` skip the write
    and return the positions (``new_pos`` JSON) for catalog absorption
    (reference inlined file deletions, ducklake_delete.cpp:530-546 —
    the threshold is applied PER FILE)."""
    import pandas as pd

    encrypt = lake.encrypted

    def write_group(pdf: pd.DataFrame) -> pd.DataFrame:
        import base64 as _b64
        import json as _json
        import os as _os
        import uuid as _uuid

        import pyarrow as _pa
        import pyarrow.parquet as _pq

        import pandas as _pd

        rel = pdf["file_path"].iloc[0]
        pos_snap, has_null = _dedupe_pos_snaps(pdf, _pd)
        pos = sorted(pos_snap)
        n_new = int(pdf["is_new"].sum()) if "is_new" in pdf else len(pos)
        if 0 < n_new <= inline_limit:
            new_pos = sorted(
                int(x) for x in (pdf.loc[pdf["is_new"], "pos"]
                                 if "is_new" in pdf else pdf["pos"])
            )
            return pd.DataFrame(
                [{"file_path": rel, "out_path": "", "n": len(pos),
                  "n_new": n_new, "new_pos": _json.dumps(new_pos),
                  "size": 0, "footer": 0, "rgs": 0, "enc_key": "",
                  "smin": 0, "smax": 0, "with_snaps": False}]
            )
        snaps = [pos_snap[p] for p in pos]
        # embedded per-position snapshots ONLY when the file spans
        # committed delete history (reference FlushDeleteWithSnapshots
        # vs the plain first-delete write, ducklake_delete.cpp:550-590)
        with_snaps = (not has_null) and any(s != anticipated for s in snaps)
        fields = [
            _pa.field("file_path", _pa.string(),
                      metadata={b"PARQUET:field_id": b"2147483546"}),
            _pa.field("pos", _pa.int64(),
                      metadata={b"PARQUET:field_id": b"2147483545"}),
        ]
        cols = {"file_path": [rel] * len(pos), "pos": pos}
        if with_snaps:
            from ducklake_spark.lake import SNAPID_COL as _SC
            from ducklake_spark.lake import SNAPID_FIELD_ID as _SFID

            fields.append(_pa.field(_SC, _pa.int64(),
                                    metadata={b"PARQUET:field_id":
                                              str(_SFID).encode()}))
            cols[_SC] = snaps
        schema = _pa.schema(fields)
        out = _pa.table(cols, schema=schema)
        final = _os.path.join(
            delete_dir, f"ducklake-{_uuid.uuid4()}-delete.parquet"
        )
        enc_key = ""
        if encrypt:
            from ducklake_spark.crypto_pme import (
                encrypt_properties,
                key_id_for,
            )

            enc_key = _b64.b64encode(_os.urandom(16)).decode()
            _pq.write_table(
                out, final,
                encryption_properties=encrypt_properties(
                    key_id_for(enc_key), enc_key),
            )
        else:
            _pq.write_table(out, final)
        from ducklake_spark.lake import _open_parquet_meta, parquet_footer_size

        from ducklake_spark.fsio import open_input_any, size_any

        with open_input_any(final) as fh:
            nrgs = _open_parquet_meta(fh, enc_key).metadata.num_row_groups
        return pd.DataFrame(
            [{"file_path": rel, "out_path": final, "n": len(pos),
              "n_new": n_new, "new_pos": "",
              "size": size_any(final),
              "footer": parquet_footer_size(final),
              "rgs": nrgs,
              "enc_key": enc_key,
              "smin": min(snaps) if with_snaps else 0,
              "smax": max(snaps) if with_snaps else 0,
              "with_snaps": with_snaps}]
        )

    rows = (
        dels.groupBy("file_path")
        .applyInPandas(
            write_group,
            "file_path string, out_path string, n long, n_new long, "
            "new_pos string, size long, footer long, rgs long, "
            "enc_key string, smin long, smax long, with_snaps boolean",
        )
        .collect()
    )
    return [r.asDict() for r in rows]


def _dedupe_pos_snaps(pdf, _pd) -> tuple[dict, bool]:
    """{position -> earliest snapshot or None} and whether any position
    lacks a snapshot (txn-local merge content — forces the plain,
    snapshot-free layout)."""
    pos_snap: dict[int, int | None] = {}
    has_null = False
    snaps_col = pdf["snap"] if "snap" in pdf else [None] * len(pdf)
    for p, s in zip(pdf["pos"], snaps_col):
        p = int(p)
        s = None if s is None or _pd.isna(s) else int(s)
        if s is None:
            has_null = True
        cur = pos_snap.get(p, -1)
        if cur == -1 or (s is not None and (cur is None or s < cur)):
            pos_snap[p] = s
    return pos_snap, has_null


def _inlined_delete_counts(lake, h) -> dict[int, int]:
    """Live inlined-delete counts per data file — one grouped query (a
    delete touching 100k files must not mean 100k catalog round-trips).
    Positions absorbed EARLIER IN THIS OPEN TRANSACTION count too: the
    full-file-drop decision must see them."""
    tname = f"ducklake_inlined_delete_{h.table_id}"
    out: dict[int, int] = {}
    if lake.meta.query(
        "SELECT 1 FROM sqlite_master WHERE type='table' AND name=?", (tname,)
    ):
        out = dict(
            lake.meta.query(
                f"SELECT file_id, COUNT(*) FROM {tname} GROUP BY file_id"
            )
        )
    if lake._txn is not None:
        for fid, _pos in lake._txn.inlined_deletes.get(h.table_id, []):
            out[fid] = out.get(fid, 0) + 1
    return out


def _write_dv_files_distributed(lake, delete_dir: str, dels: DataFrame,
                                inline_limit: int = 0,
                                anticipated: int | None = None,
                                ) -> list[dict]:
    """Iceberg-v3 deletion vectors: one bare deletion-vector-v1 blob per
    data file (reference single-blob case, ducklake_puffin.cpp:131-141),
    written executor-side like the parquet variant. Inlined file
    deletions (per-file ``inline_limit``) win over the DV format like
    the reference, where the inline check precedes the file write
    (ducklake_delete.cpp:530-546)."""
    import pandas as pd

    def write_group(pdf: pd.DataFrame) -> pd.DataFrame:
        import json as _json
        import os as _os
        import uuid as _uuid

        from ducklake_spark.functions.roaring import puffin_write

        import pandas as _pd

        rel = pdf["file_path"].iloc[0]
        pos_snap, has_null = _dedupe_pos_snaps(pdf, _pd)
        pos = sorted(pos_snap)
        n_new = int(pdf["is_new"].sum()) if "is_new" in pdf else len(pos)
        if 0 < n_new <= inline_limit:
            new_pos = sorted(
                int(x) for x in (pdf.loc[pdf["is_new"], "pos"]
                                 if "is_new" in pdf else pdf["pos"])
            )
            return pd.DataFrame(
                [{"file_path": rel, "out_path": "", "n": len(pos),
                  "n_new": n_new, "new_pos": _json.dumps(new_pos),
                  "size": 0, "footer": 0,
                  "smin": 0, "smax": 0, "with_snaps": False}]
            )
        final = _os.path.join(
            delete_dir, f"ducklake-{_uuid.uuid4()}-delete.puffin"
        )
        snaps = [pos_snap[p] for p in pos]
        with_snaps = (not has_null) and any(s != anticipated for s in snaps)
        if with_snaps:
            # cumulative snapshot-tagged blobs: blob at snapshot S holds
            # every position deleted at or before S (reference puffin
            # DVs tag blobs with ducklake-snapshot-id; readers take the
            # first blob containing a position)
            blobs = []
            acc: list[int] = []
            for s in sorted(set(snaps)):
                acc = sorted(p for p in pos if pos_snap[p] <= s)
                blobs.append((s, list(acc)))
        else:
            blobs = [(None, pos)]
        r = puffin_write(final, blobs, rel)
        return pd.DataFrame(
            [{"file_path": rel, "out_path": final, "n": len(pos),
              "n_new": n_new, "new_pos": "",
              "size": r["file_size_bytes"], "footer": r["footer_size"],
              "smin": min(snaps) if with_snaps else 0,
              "smax": max(snaps) if with_snaps else 0,
              "with_snaps": with_snaps}]
        )

    rows = (
        dels.groupBy("file_path")
        .applyInPandas(
            write_group,
            "file_path string, out_path string, n long, n_new long, "
            "new_pos string, size long, footer long, "
            "smin long, smax long, with_snaps boolean",
        )
        .collect()
    )
    return [r.asDict() for r in rows]


def _delete_inlined(lake: DuckLake, h: TableHandle, where: str) -> int:
    """Inlined-row deletes mark end_snapshot in the catalog DB
    (reference inlined deletions: ducklake_delete.cpp:530-546)."""
    tabs = lake.meta.query(
        "SELECT table_name FROM ducklake_inlined_data_tables WHERE table_id=?",
        (h.table_id,),
    )
    if not tabs:
        return 0
    snap = lake.meta.latest_snapshot()
    schema = lake._spark_schema(h)
    total = 0
    txn0 = lake._txn
    for (tname,) in tabs:
        rows = lake.meta.query(
            f"SELECT * FROM {tname} WHERE begin_snapshot <= ? "
            "AND end_snapshot IS NULL",
            (snap.snapshot_id,),
        )
        if txn0 is not None:
            # read-your-own-writes: skip rows an earlier statement in
            # this transaction already end-hid (see _update_inlined)
            ended = {
                rid for tname2, keys, tuples in txn0.inlined_end_updates
                if tname2 == tname and keys == ("row_id",) and tuples
                for (rid,) in tuples
            }
            if ended:
                rows = [r for r in rows if r[0] not in ended]
        if not rows:
            continue
        from pyspark.sql import types as T

        victims = lake.inlined_frame(
            h, tname, rows, schema,
            tail=[(T.StructField("__rid", T.LongType()),
                   lambda r, idx: r[idx["row_id"]]),
                  # rowid predicates reach inlined DML too
                  # (ducklake_row_id.test UPDATE ... WHERE rowid=5)
                  (T.StructField("rowid", T.LongType()),
                   lambda r, idx: r[idx["row_id"]])],
        ).filter(where)
        rids = [r["__rid"] for r in victims.select("__rid").collect()]
        if rids:
            # buffered: end_snapshot is stamped with the REAL snapshot id
            # inside the commit's catalog transaction (an aborted commit
            # must leave these rows visible)
            txn = lake._begin()
            txn.inlined_end_updates.append(
                (tname, ("row_id",), [(r,) for r in rids])
            )
            # deleting rows that LIVE inlined -> tables_deleted_inlined
            # (reference ducklake_transaction.cpp:1051-1053)
            _log_change(txn, f"inlined_delete:{h.table_id}")
            total += len(rids)
    return total


def _dml_buffered_inlined(lake: DuckLake, h: TableHandle, where: str,
                          assignments: dict[str, str] | None) -> int:
    """DELETE/UPDATE rows this OPEN transaction buffered as inlined
    inserts: they exist only in txn memory, so matching tuples are
    dropped (delete) or transformed (update) in place — reference
    read-your-own-writes (transaction_insert_update_delete.test:
    BEGIN; INSERT; UPDATE; DELETE sees one surviving row)."""
    from pyspark.sql import types as T

    from ducklake_spark.lake import _from_sql_value, _to_sql_value

    txn = lake._txn
    if txn is None:
        return 0
    schema = lake._spark_schema(h)
    ncols = len(schema.fields)
    fs = T.StructType(list(schema.fields)
                      + [T.StructField("__idx", T.LongType())])
    total = 0
    key = f"{h.schema_name}.{h.table_name}"
    # normalize the three buffer shapes to
    # (entries, index, packed, rebuild(new_packed) -> entry)
    work = []
    for entries in (txn.inlined_inserts, txn.inlined_inserts_rebase):
        for ei, (tid, tname, packed) in enumerate(entries):
            if tid == h.table_id and packed:
                work.append((entries, ei, packed,
                             lambda p, t=tid, n=tname: (t, n, p)))
    for ei, (k, packed, cols) in enumerate(txn.inlined_ctas):
        # inlined CTAS buffers key by NAME (table id exists at commit)
        if k == key and packed:
            work.append((txn.inlined_ctas, ei, packed,
                         lambda p, k=k, c=cols: (k, p, c)))
    for entries, ei, packed, rebuild in work:
        data = [
            tuple(_from_sql_value(v, f_.dataType)
                  for v, f_ in zip(r[3:3 + ncols], schema.fields))
            + (i,)
            for i, r in enumerate(packed)
        ]
        df = lake.spark.createDataFrame(data, fs)
        if assignments is None:
            hit = {r["__idx"] for r in
                   df.filter(where).select("__idx").collect()}
            if not hit:
                continue
            entries[ei] = rebuild(
                [r for i, r in enumerate(packed) if i not in hit])
            total += len(hit)
            continue
        cond = F.expr(where)
        out = df.select(
            *[
                F.when(cond, F.expr(assignments[f.name])).otherwise(
                    F.col(f.name)).alias(f.name)
                if f.name in assignments else F.col(f.name)
                for f in schema.fields
            ],
            cond.alias("__hit"), F.col("__idx"),
        ).collect()
        new_packed, hits = list(packed), 0
        for r in out:
            if not r["__hit"]:
                continue
            i = r["__idx"]
            old = packed[i]
            new_packed[i] = old[:3] + tuple(
                _to_sql_value(r[f.name], f.dataType)
                for f in schema.fields) + old[3 + ncols:]
            hits += 1
        if hits:
            entries[ei] = rebuild(new_packed)
            total += hits
    return total


def update(lake: DuckLake, name: str, assignments: dict[str, str],
           where: str | None = None, *, source: DataFrame | None = None,
           on: list[str] | None = None) -> int:
    """UPDATE name SET col=expr WHERE ...; delete+insert preserving rowid.

    ``source``/``on`` give the reference's ``UPDATE ... FROM src WHERE
    t.k = src.k`` join form: each target row joins the source on the
    ``on`` keys and duplicate source matches resolve first-write-wins
    (test/sql/update/update_join_duplicates.test) — unlike MERGE, which
    errors on a multi-match."""
    if source is not None:
        if not on:
            raise DuckLakeError("joined UPDATE needs join keys via on=[...]")
        if where is not None:
            raise DuckLakeError(
                "joined UPDATE expresses its predicate through the join "
                "keys; extra WHERE is not supported")
        res = merge_into(
            lake, name, source, on,
            when_matched_update=assignments,
            when_not_matched_insert=False,
            multi_match="first",
        )
        return res["updated"]
    if where is None:
        where = "true"  # UPDATE without WHERE touches every row
    h = lake._handle(name)
    # assignments to unknown columns previously vanished silently (the
    # replacement-row select projects the table schema): a typo'd SET
    # rewrote every matched row unchanged. The reference binder errors
    # (DuckDB: Binder Error: Referenced update column not found)
    known = {c[1] for c in h.columns}
    for col in assignments:
        if col not in known:
            raise DuckLakeError(
                f"UPDATE {name}: column {col!r} does not exist"
            )
    if h.table_id < 0:
        return _rewrite_txn_local(lake, h, where, assignments)
    # rows INSERTED earlier in this open transaction live in buffered
    # files / buffered inlined batches: rewrite them FIRST —
    # _update_inlined appends replacement rows into the same buffers,
    # which must not be matched (and counted) a second time
    n_buf = 0
    if lake._txn is not None:
        n_buf = _rewrite_buffered(lake, h, where, assignments,
                                  str(h.table_id))
        n_buf += _dml_buffered_inlined(lake, h, where, assignments)
    n_inlined = _update_inlined(lake, h, assignments, where)
    _h, matched = _victims(lake, name, where)
    if matched is None:
        if n_inlined or n_buf:
            lake._autocommit()
        return n_inlined + n_buf
    # both the replacement-row write and the victim delete-apply read
    # the matched relation: cache it so the scan+filter runs once
    matched = matched.persist()
    try:
        n = _update_files(lake, h, matched, assignments, where)
    finally:
        matched.unpersist()
    if n == 0 and (n_inlined or n_buf):
        lake._autocommit()
    return n + n_inlined + n_buf


def _update_files(lake: DuckLake, h: TableHandle, matched: DataFrame,
                  assignments: dict[str, str], where: str) -> int:
    schema = lake._spark_schema(h)
    new_rows = matched
    for col, expr in assignments.items():
        new_rows = new_rows.withColumn(col, F.expr(expr))
    new_rows = new_rows.select(
        *[F.col(f.name) for f in schema.fields],
        F.col("rowid").alias(ROWID_COL),
    )
    new_rows = lake._enforce_not_null(new_rows, h)
    # a small UPDATE on file-backed rows inlines BOTH halves like the
    # reference (data_inlining_update_inline_verification.test: new row
    # -> inlined-data table with the preserved rowid, removed position
    # -> inlined deletions; NO new file is written). The probe is cheap:
    # `matched` is persisted by the caller, and limit+1 bounds the fetch
    inline_limit = lake._inline_limit(h.table_id, h.schema_id)
    probed_nonempty = False
    if (inline_limit > 0 and h.table_id >= 0 and not (
            lake._txn is not None
            and lake._txn.pending_columns.get(h.table_id))):
        head = new_rows.limit(inline_limit + 1).collect()
        if len(head) <= inline_limit:
            return _update_files_via_inlining(lake, h, head, matched,
                                              where, schema)
        # the overflowing probe proves matched is non-empty — no
        # separate zero-check pass needed
        probed_nonempty = True
    # Zero-match early exit BEFORE any transaction state is touched.
    # When the inline probe already overflowed, this is free; otherwise
    # a limit-1 probe replaces the former full matched.count() pass —
    # the full materialization is left to the consumer jobs below,
    # which fill the persisted blocks while doing useful work (the
    # cache's per-block locks dedupe concurrent computes).
    if not probed_nonempty and matched.isEmpty():
        return 0
    # Run the two independent consumers — the replacement-file write
    # and the fused delete-file write — as CONCURRENT Spark jobs from a
    # driver thread (guide 2.6: the second job's tasks back-fill
    # executors as the first one drains). Neither job depends on the
    # other's output: the write touches no transaction state, and the
    # delete-apply's inputs are the catalog file list + the cache.
    # Replacement rows honor the table's partition spec like the
    # reference (update_partitioning.test: updated rows land under
    # their new partition dirs with partition values recorded).
    import concurrent.futures as _cf

    part_spec = lake._partition_spec(h)
    with _cf.ThreadPoolExecutor(max_workers=1) as pool:
        fut = pool.submit(lake._write_parquet, h, new_rows, schema,
                          part_spec, [], rotate=False)
        try:
            with lake.transaction():
                txn = lake._begin()
                # victims re-use the matched relation — no second
                # predicate scan
                snap = lake._resolve_snapshot(None, None)
                vfiles = _live_files(lake, h, snap, where)
                victims = matched.select(
                    F.col("filename"),
                    F.col("file_row_number").alias("pos"),
                )
                # gross record_count convention: the delete half leaves
                # stats alone (whole-file drops decrement inside the
                # fused writer); the replacement files add their counts
                # at commit
                _apply_file_deletes(lake, h, snap, vfiles, victims)
                files = fut.result()
                fut = None
                for f in files:
                    # rowid comes from the embedded column
                    f.row_id_start = None
                    f.allocate = False
                txn.new_data_files.setdefault(
                    str(h.table_id), []).extend(files)
                txn.change_log.append(f"inserted_into_table:{h.table_id}")
        finally:
            if fut is not None:  # txn aborted: drain the writer thread
                _cf.wait([fut])
    return sum(f.record_count for f in files)


def _update_files_via_inlining(lake: DuckLake, h: TableHandle, head,
                               matched: DataFrame, where: str,
                               schema) -> int:
    """UPDATE's inline fast path: replacement rows land in the
    inlined-data table with their PRESERVED row ids, and the removed
    file positions absorb as inlined deletions — no new file is
    written (reference data_inlining_update_inline_verification.test;
    the update plan routes its insert half through DuckLakeInlineData
    with the same data_inlining_row_limit, ducklake_insert.cpp:865)."""
    if not head:
        return 0
    from ducklake_spark.lake import _to_sql_value
    from ducklake_spark.transaction import PENDING_SNAPSHOT

    with lake.transaction():
        txn = lake._begin()
        cur_tname = lake._ensure_inlined_table(h)
        packed = [
            (r[ROWID_COL], PENDING_SNAPSHOT, None)
            + tuple(_to_sql_value(r[f.name], f.dataType)
                    for f in schema.fields)
            for r in head
        ]
        txn.inlined_inserts.append((h.table_id, cur_tname, packed))
        snap = lake._resolve_snapshot(None, None)
        vfiles = _live_files(lake, h, snap, where)
        victims = matched.select(
            F.col("filename"), F.col("file_row_number").alias("pos")
        )
        _apply_file_deletes(lake, h, snap, vfiles, victims)
        delta = txn.stats_delta.setdefault(h.table_id, {})
        # gross record_count: the absorbed delete positions leave stats
        # alone (the data file stays live and counted); the preserved-
        # rowid inlined replacement rows are NEW live rows, and plain
        # inlined_inserts don't advance record_count at commit — add
        # them here
        delta["records"] = delta.get("records", 0) + len(head)
        _log_change(txn, f"inlined_insert:{h.table_id}")
    return len(head)


def _update_inlined(lake: DuckLake, h: TableHandle, assignments: dict[str, str],
                    where: str) -> int:
    """Update rows living in the catalog DB: end-snapshot the old row,
    insert the updated one with the same row_id (delete+insert shape)."""
    tabs = lake.meta.query(
        "SELECT table_name FROM ducklake_inlined_data_tables WHERE table_id=?",
        (h.table_id,),
    )
    if not tabs:
        return 0
    snap = lake.meta.latest_snapshot()
    schema = lake._spark_schema(h)
    total = 0
    from ducklake_spark.lake import _to_sql_value
    from ducklake_spark.transaction import PENDING_SNAPSHOT
    from pyspark.sql import types as T

    txn = lake._begin()
    for (tname,) in tabs:
        rows = lake.meta.query(
            f"SELECT * FROM {tname} WHERE begin_snapshot <= ? "
            "AND end_snapshot IS NULL",
            (snap.snapshot_id,),
        )
        # read-your-own-writes: rows THIS transaction already
        # end-hidden (an earlier UPDATE in the same BEGIN) must not
        # match again through their still-uncommitted catalog state —
        # matching them re-inserts the OLD generation's value
        # (ducklake_row_id.test: two updates in one txn read 6 rows,
        # not 12, after COMMIT)
        ended = {
            rid for tname2, keys, tuples in txn.inlined_end_updates
            if tname2 == tname and keys == ("row_id",) and tuples
            for (rid,) in tuples
        }
        if ended:
            rows = [r for r in rows if r[0] not in ended]
        if not rows:
            continue
        matched = lake.inlined_frame(
            h, tname, rows, schema,
            tail=[(T.StructField("__rid", T.LongType()),
                   lambda r, idx: r[idx["row_id"]]),
                  (T.StructField("rowid", T.LongType()),
                   lambda r, idx: r[idx["row_id"]])],
        ).filter(where)
        for col, expr in assignments.items():
            matched = matched.withColumn(col, F.expr(expr))
        updated = matched.collect()
        if not updated:
            continue
        for cname in (c[1] for c in h.columns if not c[3]):
            if any(r[cname] is None for r in updated):
                raise DuckLakeError(
                    f"NOT NULL constraint failed: column {cname}")
        rids = [r["__rid"] for r in updated]
        txn.inlined_end_updates.append((tname, ("row_id",), [(r,) for r in rids]))
        # updated rows land in the CURRENT epoch's inlined table: an
        # older-epoch source table lacks columns added since, and the
        # updated row is a current-schema row (preserved row_id)
        cur_tname = lake._ensure_inlined_table(h)
        packed = [
            (r["__rid"], PENDING_SNAPSHOT, None)
            + tuple(_to_sql_value(r[f.name], f.dataType) for f in schema.fields)
            for r in updated
        ]
        txn.inlined_inserts.append((h.table_id, cur_tname, packed))
        total += len(updated)
    if total:
        # an UPDATE of inlined rows = inlined delete + inlined insert
        _log_change(txn, f"inlined_delete:{h.table_id}")
        _log_change(txn, f"inlined_insert:{h.table_id}")
    return total


def merge_into(lake: DuckLake, target: str, source: DataFrame, on: list[str],
               *, when_matched_update: dict[str, str | None] | None = None,
               when_matched_delete: bool = False,
               when_not_matched_insert: bool | dict | list = True,
               when_not_matched_by_source_update: dict[str, str] | None = None,
               when_not_matched_by_source_delete: bool = False,
               multi_match: str = "error") -> dict[str, int]:
    """MERGE INTO target USING source ON equality keys.

    Supports WHEN MATCHED THEN UPDATE (or DELETE), WHEN NOT MATCHED
    [BY TARGET] THEN INSERT, and WHEN NOT MATCHED BY SOURCE THEN
    UPDATE/DELETE — the reference's action set
    (ducklake_merge_into.cpp:474-641; BY SOURCE exercised in
    test/sql/merge/merge_into_tpch.test_slow). ``when_matched_update``
    maps target column -> SQL expression over ``t.``/``s.`` aliases; a
    None value means "take the source's same-named column".
    ``when_not_matched_by_source_update`` expressions see only ``t.``.
    ``when_not_matched_insert`` accepts True (INSERT * by name — extra
    source columns dropped, missing target columns take their
    defaults), a dict {target column -> SQL expr over the SOURCE's
    columns}, or a list of positional exprs like the reference's
    ``INSERT VALUES (...)`` (merge_update_insert.test:
    ``INSERT VALUES (b.item_id, b.volume)``).

    Scale shape: one equi-join computes matched rows, one anti-join the
    by-source rows; ALL victims union into a single pass of the shared
    positional-delete applier (one delete file per touched data file),
    and replacement rows are written as distributed jobs with preserved
    rowids — no per-row driver loops.
    """
    if when_matched_update and when_matched_delete:
        raise DuckLakeError("at most one WHEN MATCHED action (like the reference)")
    if when_not_matched_by_source_update and when_not_matched_by_source_delete:
        raise DuckLakeError("at most one WHEN NOT MATCHED BY SOURCE action")
    if multi_match not in ("error", "first"):
        raise DuckLakeError(
            f"multi_match must be 'error' or 'first', got {multi_match!r}")
    h = lake._handle(target)
    if h.table_id < 0:
        raise DuckLakeError(
            "MERGE INTO a table created in the current transaction is "
            "not supported; commit the CREATE first"
        )
    # MERGE victims target COMMITTED (file, pos) identities: inside an
    # open transaction whose buffer already touches the target (or when
    # inlined rows can't be flushed because flush would only buffer),
    # the committed view is stale — matched rows would be re-inserted
    # as duplicates. Refuse loudly instead of corrupting.
    txn0 = lake._txn
    if txn0 is not None:
        touched = (
            txn0.new_data_files.get(str(h.table_id))
            or txn0.new_delete_files.get(h.table_id)
            or txn0.removed_data_files.get(h.table_id)
            or txn0.inlined_deletes.get(h.table_id)
            or any(t[0] == h.table_id for t in txn0.inlined_inserts)
            or any(t[0] == h.table_id
                   for t in txn0.inlined_inserts_rebase)
        )
        has_inlined = bool(lake.meta.query(
            "SELECT 1 FROM ducklake_inlined_data_tables WHERE table_id=?",
            (h.table_id,),
        ))
        if touched or has_inlined:
            raise DuckLakeError(
                "MERGE INTO inside an open transaction that already "
                "modified the target (or over unflushed inlined rows) "
                "is not supported; commit the pending changes first"
            )
    # matched victims address rows as (file, pos): flush catalog-inlined
    # rows first so every target row is parquet-backed
    if lake.meta.query(
        "SELECT 1 FROM ducklake_inlined_data_tables WHERE table_id=?",
        (h.table_id,),
    ):
        from ducklake_spark.maintenance import flush_inlined_data

        flush_inlined_data(lake, table=target)

    snap = lake._resolve_snapshot(None, None)
    files = _live_files(lake, h, snap, None)
    schema = lake._spark_schema(h)
    # committed view (overlay=False): the victim scan and the `files`
    # list above must agree — a merge running inside a user transaction
    # must not emit positional deletes against files the transaction has
    # only buffered (their ids aren't assigned until commit)
    tgt = lake.table(target, with_virtual=True, overlay=False)
    t, sdf = tgt.alias("t"), source.alias("s")
    cond = [F.col(f"t.{k}") == F.col(f"s.{k}") for k in on]
    counts = {"updated": 0, "deleted": 0, "inserted": 0}

    def _write_replacements(rows: DataFrame) -> int:
        rows = lake._enforce_not_null(rows, h)
        wfiles = lake._write_parquet(h, rows, schema,
                                     lake._partition_spec(h), [],
                                     rotate=False)
        for fw in wfiles:
            fw.row_id_start = None  # rowid rides the embedded column
            fw.allocate = False
        txn = lake._begin()
        txn.new_data_files.setdefault(str(h.table_id), []).extend(wfiles)
        txn.change_log.append(f"inserted_into_table:{h.table_id}")
        return sum(fw.record_count for fw in wfiles)

    with lake.transaction():
        victim_rels: list[DataFrame] = []
        persisted: list[DataFrame] = []
        replaced = 0
        if when_matched_update or when_matched_delete:
            # the joined relation feeds BOTH the replacement-row write and
            # the victim delete-apply: persist so the join runs once
            joined = t.join(sdf, cond, "inner")
            if when_matched_update and multi_match == "first":
                # joined UPDATE semantics: one winner per target row on
                # duplicate source matches (reference
                # test/sql/update/update_join_duplicates.test). The join
                # keys are constant inside each partition, so order by
                # the source's remaining (orderable) columns — the
                # winner is then a deterministic function of the source
                # DATA, not of Spark's partitioning
                from pyspark.sql import types as T
                from pyspark.sql.window import Window

                def _orderable(dt) -> bool:
                    # a type TRANSITIVELY containing a map is unorderable
                    # (Window.orderBy raises) — array<map<..>>, structs
                    # with map fields, etc., not just top-level MapType
                    if isinstance(dt, T.MapType):
                        return False
                    if isinstance(dt, T.ArrayType):
                        return _orderable(dt.elementType)
                    if isinstance(dt, T.StructType):
                        return all(_orderable(f.dataType) for f in dt.fields)
                    return True

                order_cols = [
                    F.col(f"s.{f_.name}")
                    for f_ in sdf.schema.fields
                    if _orderable(f_.dataType)
                ] or [F.lit(1)]
                w = Window.partitionBy(
                    F.col("t.filename"), F.col("t.file_row_number")
                ).orderBy(*order_cols)
                joined = (
                    joined.withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") == 1).drop("__rn")
                )
            joined = joined.persist()
            persisted.append(joined)
            if when_matched_update:
                if multi_match == "error":
                    # a target row matched by multiple source rows would
                    # be updated multiple times — MERGE raises instead
                    # of picking a winner (ducklake_delete.cpp:504-507)
                    ndup = (
                        joined.groupBy("t.filename", "t.file_row_number")
                        .count().filter(F.col("count") > 1).limit(1).count()
                    )
                    if ndup:
                        raise DuckLakeError(
                            "MERGE: the same target row matches multiple "
                            "source rows — eliminate duplicate matches "
                            "before updating"
                        )
                replaced += _write_replacements(
                    joined.select(
                        *[
                            (
                                F.expr(when_matched_update[f.name])
                                if when_matched_update.get(f.name) is not None
                                else F.col(f"s.{f.name}")
                                if f.name in when_matched_update
                                else F.col(f"t.{f.name}")
                            ).alias(f.name)
                            for f in schema.fields
                        ],
                        F.col("t.rowid").alias(ROWID_COL),
                    )
                )
            victim_rels.append(
                joined.select(
                    F.col("t.filename").alias("filename"),
                    F.col("t.file_row_number").alias("pos"),
                )
            )
        if when_not_matched_by_source_update or when_not_matched_by_source_delete:
            unmatched = t.join(sdf, cond, "left_anti").persist()
            persisted.append(unmatched)
            if when_not_matched_by_source_update:
                replaced += _write_replacements(
                    unmatched.select(
                        *[
                            (
                                F.expr(when_not_matched_by_source_update[f.name])
                                if f.name in when_not_matched_by_source_update
                                else F.col(f"t.{f.name}")
                            ).alias(f.name)
                            for f in schema.fields
                        ],
                        F.col("t.rowid").alias(ROWID_COL),
                    )
                )
            victim_rels.append(
                unmatched.select(
                    F.col("t.filename").alias("filename"),
                    F.col("t.file_row_number").alias("pos"),
                )
            )
        if victim_rels:
            victims = victim_rels[0]
            for vr in victim_rels[1:]:
                victims = victims.unionByName(vr)
            # a delete-only multi-match collapses to one delete per
            # position (reference dedupes via its sorted position set);
            # distinct also keeps the deleted count honest
            victims = victims.distinct()
            n = _apply_file_deletes(lake, h, snap, files, victims)
            for p in persisted:
                p.unpersist()
            # gross record_count: partial positional deletes leave the
            # stats row alone (whole-file drops decrement inside the
            # fused writer); replacement files add their counts at commit
            counts["updated"] = replaced
            counts["deleted"] = n - replaced
        if when_not_matched_insert:
            new_rows = source.join(tgt, on, "left_anti")
            spec = when_not_matched_insert
            if isinstance(spec, list):
                if len(spec) != len(h.columns):
                    raise DuckLakeError(
                        f"INSERT VALUES needs {len(h.columns)} expressions, "
                        f"got {len(spec)}")
                new_rows = new_rows.select([
                    F.expr(e).alias(c[1]) for e, c in zip(spec, h.columns)
                ])
            elif isinstance(spec, dict):
                known = {c[1] for c in h.columns}
                for col in spec:
                    if col not in known:
                        raise DuckLakeError(
                            f"MERGE INSERT: column {col!r} does not exist")
                new_rows = new_rows.select([
                    F.expr(spec[c[1]]).alias(c[1])
                    for c in h.columns if c[1] in spec
                ])
            # count comes back from the insert's file footers — no
            # separate counting job over the join
            counts["inserted"] = lake.insert(target, new_rows)
    return counts


def _key_eq(col: str, v) -> str:
    return f"{col} = {_sql_literal(v)}"


def _sql_literal(v) -> str:
    import datetime

    if v is None:
        return "NULL"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, (datetime.date, datetime.datetime)):
        return f"'{v}'"
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


# install as methods
DuckLake.delete = lambda self, name, where=None: delete(self, name, where)
DuckLake.update = lambda self, name, assignments, where=None, **kw: update(
    self, name, assignments, where, **kw)
DuckLake.merge = (
    lambda self, target, source, on, **kw: merge_into(self, target, source, on, **kw)
)
