"""Metadata / maintenance table-function surface (SURVEY §2.6).

Each reference table function becomes a DuckLake method returning a
small DataFrame (catalog-DB queries only; no cluster work):
snapshots(), table_info(), list_files(), options(), settings(),
current/last_committed snapshot (registration list:
src/ducklake_extension.cpp:53-126).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from ducklake_spark.lake import DuckLake


# stored change-type prefix (ducklake_transaction_changes.cpp:43-86)
# -> display key (ducklake_snapshots.cpp:80-146), in the reference's
# emission order so rendered maps compare equal
_CHANGE_DISPLAY = {
    "created_schema": "schemas_created",
    "dropped_schema": "schemas_dropped",
    "created_table": "tables_created",
    "created_view": "views_created",
    "created_scalar_macro": "scalar_macros_created",
    "created_table_macro": "table_macros_created",
    "dropped_table": "tables_dropped",
    "altered_table": "tables_altered",
    "inserted_into_table": "tables_inserted_into",
    "deleted_from_table": "tables_deleted_from",
    "dropped_view": "views_dropped",
    "dropped_scalar_macro": "scalar_macros_dropped",
    "dropped_table_macro": "table_macros_dropped",
    "altered_view": "views_altered",
    "inlined_insert": "inlined_insert",
    "inlined_delete": "inlined_delete",
    "flushed_inlined": "flushed_inlined",
    "inline_flush": "flushed_inlined",
    "merge_adjacent": "merge_adjacent",
    "rewrite_delete": "rewrite_delete",
    "compacted_table": "merge_adjacent",
}
_CHANGE_ORDER = {k: i for i, k in enumerate(dict.fromkeys(
    _CHANGE_DISPLAY.values()))}


def _split_change_entries(changes: str) -> list[str]:
    """Split on unquoted commas (ParseChangeValue semantics)."""
    out, cur, q = [], [], False
    for ch in changes:
        if ch == '"':
            q = not q
        if ch == "," and not q:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


def _display_changes(changes: str | None) -> dict[str, list[str]]:
    """changes_made text -> the display map ducklake_snapshots() shows
    (quoted identifiers unquoted, reference key names and order)."""
    buckets: dict[str, list[str]] = {}
    for entry in _split_change_entries(changes or ""):
        if not entry:
            continue
        kind, _, payload = entry.partition(":")
        kind = kind.strip().lower()
        key = _CHANGE_DISPLAY.get(kind, kind)
        if kind in ("created_scalar_macro", "created_table_macro"):
            # reference shows macros as schema."name" — schema unquoted,
            # macro name kept quoted (ducklake_snapshots.cpp:30-35 via
            # SQLIdentifier::ToString on the name only)
            parts = _split_quoted_dots(payload)
            sch = (parts[0][1:-1].replace('""', '"')
                   if parts[0].startswith('"') else parts[0])
            payload = sch + "." + ".".join(parts[1:])
        else:
            # '"main"' -> main; '"s"."t"' -> s.t; ids pass through
            payload = ".".join(
                p[1:-1].replace('""', '"') if p.startswith('"') else p
                for p in _split_quoted_dots(payload))
        buckets.setdefault(key, []).append(payload)
    return {k: buckets[k] for k in
            sorted(buckets, key=lambda k: _CHANGE_ORDER.get(k, 99))}


def _split_quoted_dots(s: str) -> list[str]:
    out, cur, q = [], [], False
    for ch in s:
        if ch == '"':
            q = not q
        if ch == "." and not q:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return out


def snapshots(lake: DuckLake) -> DataFrame:
    """reference: ducklake_snapshots.cpp:39-58"""
    rows = lake.meta.query(
        "SELECT s.snapshot_id, s.snapshot_time, s.schema_version, "
        "COALESCE(c.changes_made, ''), c.author, c.commit_message, c.commit_extra_info "
        "FROM ducklake_snapshot s LEFT JOIN ducklake_snapshot_changes c "
        "ON s.snapshot_id = c.snapshot_id WHERE s.snapshot_time IS NOT NULL ORDER BY s.snapshot_id"
    )
    data = []
    for sid, ts, sv, changes, author, msg, extra in rows:
        data.append((sid, str(ts), sv, _display_changes(changes),
                     author, msg, extra))
    return lake.spark.createDataFrame(
        data,
        "snapshot_id long, snapshot_time string, schema_version long, "
        "changes map<string,array<string>>, author string, commit_message string, "
        "commit_extra_info string",
    )


def table_info(lake: DuckLake) -> DataFrame:
    """reference: ducklake_table_info.cpp:29-52"""
    rows = lake.meta.query(
        """
        SELECT t.table_name, t.schema_id, t.table_id, t.table_uuid,
               (SELECT COUNT(*) FROM ducklake_data_file f
                WHERE f.table_id = t.table_id AND f.end_snapshot IS NULL),
               (SELECT COALESCE(SUM(f.file_size_bytes), 0) FROM ducklake_data_file f
                WHERE f.table_id = t.table_id AND f.end_snapshot IS NULL),
               (SELECT COUNT(*) FROM ducklake_delete_file d
                WHERE d.table_id = t.table_id AND d.end_snapshot IS NULL),
               (SELECT COALESCE(SUM(d.file_size_bytes), 0) FROM ducklake_delete_file d
                WHERE d.table_id = t.table_id AND d.end_snapshot IS NULL)
        FROM ducklake_table t WHERE t.end_snapshot IS NULL
        """
    )
    return lake.spark.createDataFrame(
        [tuple(r) for r in rows],
        "table_name string, schema_id long, table_id long, table_uuid string, "
        "file_count long, file_size_bytes long, delete_file_count long, "
        "delete_file_size_bytes long",
    )


def list_files(lake: DuckLake, table: str, *, at_version: int | None = None,
               at_timestamp: str | None = None) -> DataFrame:
    """reference: ducklake_list_files.cpp:40-62,108-114"""
    h = lake._handle(table, at_version=at_version, at_timestamp=at_timestamp)
    snap = lake._resolve_snapshot(at_version, at_timestamp)
    rows = lake.meta.query(
        """
        SELECT d.path, d.path_is_relative, d.file_size_bytes, d.footer_size,
               del.path, del.path_is_relative, del.file_size_bytes, del.footer_size
        FROM ducklake_data_file d
        LEFT JOIN ducklake_delete_file del ON del.data_file_id = d.data_file_id
             AND del.begin_snapshot <= ? AND (del.end_snapshot IS NULL OR del.end_snapshot > ?)
        WHERE d.table_id = ? AND d.begin_snapshot <= ?
          AND (d.end_snapshot IS NULL OR d.end_snapshot > ?)
        ORDER BY d.data_file_id
        """,
        (snap.snapshot_id, snap.snapshot_id, h.table_id, snap.snapshot_id, snap.snapshot_id),
    )
    def full(p, prel=1):
        # catalog stores table-relative paths; the function's contract is
        # directly-readable paths (reference ducklake_list_files.test
        # feeds the output straight into read_parquet/add_data_files)
        if p is None or "://" in p or os.path.isabs(p):
            return p
        if prel:
            p = h.path + p
        return lake.data_path + p

    return lake.spark.createDataFrame(
        [(full(r[0], r[1]), r[2], r[3], full(r[4], r[5]), r[6], r[7])
         for r in rows],
        "data_file string, data_file_size_bytes long, data_file_footer_size long, "
        "delete_file string, delete_file_size_bytes long, delete_file_footer_size long",
    )


# reference ducklake_options.cpp:15-42 DUCKLAKE_OPTIONS
_OPTION_DESCRIPTIONS = {
    "data_inlining_row_limit":
        "Maximum amount of rows to inline in a single insert",
    "parquet_compression":
        "Compression algorithm for Parquet files (uncompressed, snappy, "
        "gzip, zstd, brotli, lz4, lz4_raw)",
    "parquet_version": "Parquet format version (1 or 2)",
    "parquet_compression_level": "Compression level for Parquet files",
    "parquet_row_group_size":
        "Number of rows per row group in Parquet files",
    "parquet_row_group_size_bytes":
        "Number of bytes per row group in Parquet files",
    "hive_file_pattern":
        "If partitioned data should be written in a hive-like folder "
        "structure",
    "target_file_size":
        "The target data file size for insertion and compaction operations",
    "version": "DuckLake format version",
    "created_by": "Tool used to write the DuckLake",
    "data_path": "Path to data files",
    "require_commit_message":
        "If an explicit commit message is required for a snapshot commit.",
    "rewrite_delete_threshold":
        "A threshold that determines the minimum amount of data that must "
        "be removed from a file before a rewrite is warranted. From 0 - 1.",
    "delete_older_than":
        "How old unused files must be to be removed by the "
        "'ducklake_delete_orphaned_files' and 'ducklake_cleanup_old_files' "
        "cleanup functions.",
    "expire_older_than":
        "How old snapshots must be, by default, to be expired by: "
        "'ducklake_expire_snapshots'",
    "auto_compact":
        "Pre-defined schema used as a default value for the following "
        "compaction functions 'ducklake_flush_inlined_data',"
        "'ducklake_merge_adjacent_files', 'ducklake_rewrite_data_files', "
        "'ducklake_delete_orphaned_files'",
    "encrypted":
        "Whether or not to encrypt Parquet files written to the data path",
    "per_thread_output":
        "Whether to create separate output files per thread during "
        "parallel insertion",
    "sort_on_insert":
        "Whether to sort data on INSERT according to SET SORTED BY "
        "(default: true)",
}


def options(lake: DuckLake) -> DataFrame:
    """Reference shape (ducklake_options.cpp:70-150): one row per stored
    option with description, GLOBAL/SCHEMA/TABLE scope and the scope's
    entry NAME — unknown keys appear with a NULL description
    (test/sql/issues/options_unknown_metadata_key.test)."""
    rows = lake.meta.query(
        "SELECT key, value, scope, scope_id FROM ducklake_metadata "
        "WHERE key NOT IN ('version', 'created_by', 'data_path', "
        "'encrypted', 'id_reservation')"
    )
    schema_names = dict(lake.meta.query(
        "SELECT schema_id, schema_name FROM ducklake_schema "
        "WHERE end_snapshot IS NULL"))
    table_names = dict(lake.meta.query(
        "SELECT t.table_id, s.schema_name || '.' || t.table_name "
        "FROM ducklake_table t JOIN ducklake_schema s "
        "ON s.schema_id = t.schema_id AND s.end_snapshot IS NULL "
        "WHERE t.end_snapshot IS NULL"))
    data = []
    for key, value, scope, scope_id in rows:
        if scope == "table":
            sc, entry = "TABLE", table_names.get(scope_id)
        elif scope == "schema":
            sc, entry = "SCHEMA", schema_names.get(scope_id)
        else:
            sc, entry = "GLOBAL", None
        data.append(
            (key, _OPTION_DESCRIPTIONS.get(key), value, sc, entry))
    data.sort(key=lambda r: r[0])
    return lake.spark.createDataFrame(
        data,
        "option_name string, description string, value string, "
        "scope string, scope_entry string",
    )


def settings(lake: DuckLake) -> DataFrame:
    """One-row deployment descriptor: (catalog_type, extension_version,
    data_path) — reference ducklake_settings.cpp:12-45 normalizes the
    metadata backend to a user-friendly name the same way."""
    from ducklake_spark.catalog.backends import (
        DuckDBBackend,
        PostgresBackend,
        SqliteBackend,
    )

    b = lake.meta.backend
    catalog_type = (
        "sqlite" if isinstance(b, SqliteBackend)
        else "duckdb" if isinstance(b, DuckDBBackend)
        else "postgres" if isinstance(b, PostgresBackend)
        else type(b).__name__
    )
    version = lake.meta.option("created_by") or ""
    # mirror-mode object-store lakes report the REMOTE data path (the
    # user-facing one; metadata/ducklake_settings_minio.test)
    dp = getattr(lake, "remote_data_path", None) or lake.data_path
    return lake.spark.createDataFrame(
        [(catalog_type, version, dp)],
        "catalog_type string, extension_version string, data_path string",
    )


DuckLake.snapshots = lambda self: snapshots(self)
DuckLake.table_info = lambda self: table_info(self)
DuckLake.list_files = lambda self, table, **kw: list_files(self, table, **kw)
DuckLake.options = lambda self: options(self)
DuckLake.settings = lambda self: settings(self)
