"""DuckLake catalog metadata layer (SQLite backend).

Keeps the reference's metadata schema verbatim — every table below
mirrors ``DuckLakeMetadataManager::GetCreateTableStatements``
(reference: src/storage/ducklake_metadata_manager.cpp:228-301) — so a
catalog written by this library is row-compatible with one written by
the reference, and all planning questions ("which files at snapshot
S, pruned by these filters?") are answered by SQL against this DB.

All metadata operations run on the Spark *driver* over stdlib
``sqlite3`` (the reference's SQL is deliberately ANSI-portable across
DuckDB/SQLite/Postgres — ducklake_metadata_manager.cpp:1241-1244);
executors never touch the catalog. A Postgres backend can drop in by
swapping the connection factory.
"""

from __future__ import annotations

import re
import threading
import time
import uuid
from dataclasses import dataclass, field

SCHEMA_STATEMENTS = [
    # ducklake_metadata_manager.cpp:230-231
    """CREATE TABLE IF NOT EXISTS ducklake_metadata(
        key VARCHAR NOT NULL, value VARCHAR NOT NULL,
        scope VARCHAR, scope_id BIGINT)""",
    # :232-234
    """CREATE TABLE IF NOT EXISTS ducklake_snapshot(
        snapshot_id BIGINT PRIMARY KEY, snapshot_time TIMESTAMP,
        schema_version BIGINT, next_catalog_id BIGINT, next_file_id BIGINT)""",
    # :235-236
    """CREATE TABLE IF NOT EXISTS ducklake_snapshot_changes(
        snapshot_id BIGINT PRIMARY KEY, changes_made VARCHAR,
        author VARCHAR, commit_message VARCHAR, commit_extra_info VARCHAR)""",
    # :237-239
    """CREATE TABLE IF NOT EXISTS ducklake_schema(
        schema_id BIGINT PRIMARY KEY, schema_uuid VARCHAR,
        begin_snapshot BIGINT, end_snapshot BIGINT,
        schema_name VARCHAR, path VARCHAR, path_is_relative BOOLEAN)""",
    # :240-242
    """CREATE TABLE IF NOT EXISTS ducklake_table(
        table_id BIGINT, table_uuid VARCHAR,
        begin_snapshot BIGINT, end_snapshot BIGINT,
        schema_id BIGINT, table_name VARCHAR,
        path VARCHAR, path_is_relative BOOLEAN)""",
    # :243-245
    """CREATE TABLE IF NOT EXISTS ducklake_view(
        view_id BIGINT, view_uuid VARCHAR,
        begin_snapshot BIGINT, end_snapshot BIGINT,
        schema_id BIGINT, view_name VARCHAR,
        dialect VARCHAR, sql VARCHAR, column_aliases VARCHAR)""",
    # :246-249
    """CREATE TABLE IF NOT EXISTS ducklake_tag(
        object_id BIGINT, begin_snapshot BIGINT, end_snapshot BIGINT,
        key VARCHAR, value VARCHAR)""",
    """CREATE TABLE IF NOT EXISTS ducklake_column_tag(
        table_id BIGINT, column_id BIGINT,
        begin_snapshot BIGINT, end_snapshot BIGINT,
        key VARCHAR, value VARCHAR)""",
    # view OUTPUT columns have no column ids — tags key by name
    # (reference 1.1-dev1 addition, MigrateV10 DDL;
    # test/sql/comments/comment_on_view_column*.test)
    """CREATE TABLE IF NOT EXISTS ducklake_view_column_tag(
        view_id BIGINT, column_name VARCHAR,
        begin_snapshot BIGINT, end_snapshot BIGINT,
        key VARCHAR, value VARCHAR)""",
    # :214-219
    """CREATE TABLE IF NOT EXISTS ducklake_data_file(
        data_file_id BIGINT PRIMARY KEY, table_id BIGINT,
        begin_snapshot BIGINT, end_snapshot BIGINT,
        file_order BIGINT, path VARCHAR, path_is_relative BOOLEAN,
        file_format VARCHAR, record_count BIGINT, file_size_bytes BIGINT,
        footer_size BIGINT, row_id_start BIGINT, partition_id BIGINT,
        encryption_key VARCHAR, mapping_id BIGINT, partial_max BIGINT,
        row_group_count BIGINT)""",
    # :221-226
    """CREATE TABLE IF NOT EXISTS ducklake_delete_file(
        delete_file_id BIGINT PRIMARY KEY, table_id BIGINT,
        begin_snapshot BIGINT, end_snapshot BIGINT,
        data_file_id BIGINT, path VARCHAR, path_is_relative BOOLEAN,
        format VARCHAR, delete_count BIGINT, file_size_bytes BIGINT,
        footer_size BIGINT, encryption_key VARCHAR, partial_max BIGINT,
        row_group_count BIGINT)""",
    # :251-253
    """CREATE TABLE IF NOT EXISTS ducklake_file_column_stats(
        data_file_id BIGINT, table_id BIGINT, column_id BIGINT,
        column_size_bytes BIGINT, value_count BIGINT, null_count BIGINT,
        min_value VARCHAR, max_value VARCHAR, contains_nan BOOLEAN,
        extra_stats VARCHAR)""",
    # :254-257
    """CREATE TABLE IF NOT EXISTS ducklake_file_variant_stats(
        data_file_id BIGINT, table_id BIGINT, column_id BIGINT,
        variant_path VARCHAR, shredded_type VARCHAR,
        value_count BIGINT, null_count BIGINT,
        min_value VARCHAR, max_value VARCHAR)""",
    # :259-262
    """CREATE TABLE IF NOT EXISTS ducklake_column(
        column_id BIGINT, begin_snapshot BIGINT, end_snapshot BIGINT,
        table_id BIGINT, column_order BIGINT, column_name VARCHAR,
        column_type VARCHAR, initial_default VARCHAR, default_value VARCHAR,
        nulls_allowed BOOLEAN, parent_column BIGINT,
        default_value_type VARCHAR, default_value_dialect VARCHAR)""",
    # :263-264
    """CREATE TABLE IF NOT EXISTS ducklake_table_stats(
        table_id BIGINT PRIMARY KEY, record_count BIGINT,
        next_row_id BIGINT, file_size_bytes BIGINT)""",
    # :265-267
    """CREATE TABLE IF NOT EXISTS ducklake_table_column_stats(
        table_id BIGINT, column_id BIGINT, contains_null BOOLEAN,
        contains_nan BOOLEAN, min_value VARCHAR, max_value VARCHAR,
        extra_stats VARCHAR)""",
    # :268-271
    """CREATE TABLE IF NOT EXISTS ducklake_partition_info(
        partition_id BIGINT, table_id BIGINT,
        begin_snapshot BIGINT, end_snapshot BIGINT)""",
    """CREATE TABLE IF NOT EXISTS ducklake_partition_column(
        partition_id BIGINT, table_id BIGINT, partition_key_index BIGINT,
        column_id BIGINT, transform VARCHAR)""",
    # :272-273
    """CREATE TABLE IF NOT EXISTS ducklake_file_partition_value(
        data_file_id BIGINT, table_id BIGINT,
        partition_key_index BIGINT, partition_value VARCHAR)""",
    # :274-275
    """CREATE TABLE IF NOT EXISTS ducklake_files_scheduled_for_deletion(
        data_file_id BIGINT, path VARCHAR, path_is_relative BOOLEAN,
        schedule_start TIMESTAMP)""",
    # :276-277
    """CREATE TABLE IF NOT EXISTS ducklake_inlined_data_tables(
        table_id BIGINT, table_name VARCHAR, schema_version BIGINT)""",
    # :278-281
    """CREATE TABLE IF NOT EXISTS ducklake_column_mapping(
        mapping_id BIGINT, table_id BIGINT, type VARCHAR)""",
    """CREATE TABLE IF NOT EXISTS ducklake_name_mapping(
        mapping_id BIGINT, column_id BIGINT, source_name VARCHAR,
        target_field_id BIGINT, parent_column BIGINT, is_partition BOOLEAN)""",
    # :282-283
    """CREATE TABLE IF NOT EXISTS ducklake_schema_versions(
        begin_snapshot BIGINT, schema_version BIGINT, table_id BIGINT)""",
    # :284-290
    # reference layout EXACTLY (ducklake_metadata_manager.cpp:284-290):
    # is_table_macro lives in macro_impl.type ('scalar_macro' /
    # 'table_macro'); parameters carry a column_id ordinal + types
    """CREATE TABLE IF NOT EXISTS ducklake_macro(
        schema_id BIGINT, macro_id BIGINT, macro_name VARCHAR,
        begin_snapshot BIGINT, end_snapshot BIGINT)""",
    """CREATE TABLE IF NOT EXISTS ducklake_macro_impl(
        macro_id BIGINT, impl_id BIGINT, dialect VARCHAR,
        sql VARCHAR, type VARCHAR)""",
    """CREATE TABLE IF NOT EXISTS ducklake_macro_parameters(
        macro_id BIGINT, impl_id BIGINT, column_id BIGINT,
        parameter_name VARCHAR, parameter_type VARCHAR,
        default_value VARCHAR, default_value_type VARCHAR)""",
    # :291-295
    """CREATE TABLE IF NOT EXISTS ducklake_sort_info(
        sort_id BIGINT, table_id BIGINT,
        begin_snapshot BIGINT, end_snapshot BIGINT)""",
    """CREATE TABLE IF NOT EXISTS ducklake_sort_expression(
        sort_id BIGINT, table_id BIGINT, sort_key_index BIGINT,
        expression VARCHAR, dialect VARCHAR,
        sort_direction VARCHAR, null_order VARCHAR)""",
]

# matches the reference's current catalog format tag (its MigrateV10
# DDL stamps '1.1-dev1'; our schema already carries the 1.1 columns —
# row_group_count, default_value_type/dialect)
FORMAT_VERSION = "1.1-dev1"


@dataclass
class Snapshot:
    """reference: src/include/common/ducklake_snapshot.hpp:18-31"""

    snapshot_id: int
    schema_version: int
    next_catalog_id: int
    next_file_id: int


class ConflictError(Exception):
    """Raised when commit-time conflict detection finds an incompatible
    concurrent snapshot (reference: ducklake_transaction_state.cpp:77-214)."""


class MetadataManager:
    """Driver-side connection to the catalog database.

    ``db_path`` selects the backend: a plain path → SQLite,
    ``duckdb://path`` → DuckDB, ``postgresql://…`` → Postgres
    (reference supports the same trio, test/configs/postgres.json)."""

    def __init__(self, db_path: str, schema: str | None = None):
        from ducklake_spark.catalog.backends import backend_for

        self.db_path = db_path
        #: METADATA_SCHEMA: scope every catalog table to this schema so
        #: multiple lakes can share one catalog database
        #: (transaction/transaction_schema.test)
        self.schema = schema
        self.backend = backend_for(db_path)
        self._local = threading.local()
        # attach alias, stamped by the SQL surface; the metadata log
        # records it as the `catalog` column (reference logs
        # GetName().GetIdentifierName(), ducklake_transaction.cpp:1589)
        self.catalog_name: str | None = None

    @property
    def con(self):
        con = getattr(self._local, "con", None)
        if con is None:
            con = self.backend.connect()
            if self.schema and self.schema != "main":
                self.backend.use_schema(con, self.schema)
            self._local.con = con
        from ducklake_spark import metadata_log

        if self.catalog_name is not None and metadata_log.is_enabled():
            # only attached lakes log (the reference logs through the
            # ducklake catalog's transaction; probe connections made
            # before the catalog exists are not metadata queries)
            return metadata_log.LoggingCon(con, self.catalog_name)
        return con

    def begin_write(self) -> None:
        """Open a write transaction with the engine-appropriate mode."""
        self.con.execute(self.backend.begin_write_sql)

    def reserve_catalog_ids(self, n: int) -> int:
        """Atomically reserve ``n`` catalog ids (CTAS pre-assigns column
        field ids to the parquet it writes BEFORE its commit assigns
        ids). The reservation ceiling persists in ducklake_metadata and
        every commit starts its allocator at max(next_catalog_id,
        ceiling), so reserved ids can never be re-issued — even if the
        reserving transaction aborts (the band is simply wasted)."""
        con = self.con
        for attempt in range(10):
            self.begin_write()
            try:
                row = con.execute(
                    "SELECT value FROM ducklake_metadata "
                    "WHERE key='id_reservation' AND scope IS NULL"
                ).fetchone()
                head = con.execute(
                    "SELECT MAX(next_catalog_id) FROM ducklake_snapshot"
                ).fetchone()[0]
                base = max(int(row[0]) if row else 0, head or 0)
                if row:
                    con.execute(
                        "UPDATE ducklake_metadata SET value=? "
                        "WHERE key='id_reservation' AND scope IS NULL",
                        (str(base + n),),
                    )
                else:
                    con.execute(
                        "INSERT INTO ducklake_metadata VALUES "
                        "('id_reservation', ?, NULL, NULL)",
                        (str(base + n),),
                    )
                con.execute("COMMIT")
                return base
            except Exception as exc:
                safe_rollback(con)
                if not self.is_retryable(exc) or attempt == 9:
                    raise
                time.sleep(0.02 * (attempt + 1))
        raise RuntimeError("unreachable")

    def is_retryable(self, exc: Exception) -> bool:
        return self.backend.is_retryable(exc)

    # -- server-side ("quack") commit --------------------------------------

    def server_commit_supported(self) -> bool:
        """Probe once whether the catalog server can run data-only
        commits server-side (reference:
        QuackMetadataManager::ProbeServerCapabilities) — only networked
        catalogs are probed; a server that errors on the probe keeps
        the client-side optimistic loop."""
        ok = getattr(self, "_server_commit_ok", None)
        if ok is None:
            ok = False
            if self.db_path.startswith(("postgresql://", "postgres://")):
                from ducklake_spark.catalog.server_commit import CAPABILITY

                try:
                    row = self.con.execute(
                        "SELECT ducklake_server_capabilities()"
                    ).fetchone()
                    ok = row is not None and CAPABILITY in str(row[0])
                except Exception:
                    safe_rollback(self.con)
                    ok = False
            self._server_commit_ok = ok
        return ok

    def server_commit(self, payload: dict) -> dict:
        """Ship a data-only commit to the server in ONE statement and
        return its result. A logical conflict detected server-side
        arrives tagged and is re-raised as :class:`ConflictError`; the
        server has already run the retry loop, so other failures
        propagate as-is."""
        from ducklake_spark.catalog.server_commit import (
            CONFLICT_TAG,
            encode_payload,
        )

        con = self.con
        try:
            row = con.execute(
                f"SELECT ducklake_server_commit('{encode_payload(payload)}')"
            ).fetchone()
        except Exception as exc:
            safe_rollback(con)
            if CONFLICT_TAG in str(exc):
                raise ConflictError(str(exc)) from exc
            raise
        import json

        return json.loads(row[0])

    # -- bootstrap ---------------------------------------------------------

    def initialize(self, data_path: str, *, encrypted: bool = False,
               format_version: str | None = None) -> None:
        """Create the metadata schema + snapshot 0 + schema ``main``.

        reference: ducklake_metadata_manager.cpp:186-212
        """
        con = self.con
        # already-initialized catalogs skip the DDL entirely: concurrent
        # attaches must not race on CREATE TABLE (DuckDB raises a catalog
        # write-write conflict even for IF NOT EXISTS no-ops)
        bootstrapped = bool(
            con.execute(
                "SELECT 1 FROM sqlite_master WHERE type='table' "
                "AND name=?", ("ducklake_snapshot",)
            ).fetchone()
        )
        if bootstrapped and con.execute(
            "SELECT COUNT(*) FROM ducklake_snapshot"
        ).fetchone()[0] > 0:
            return
        last_exc: Exception | None = None
        for _attempt in range(5):
            try:
                self._bootstrap(data_path, encrypted=encrypted,
                format_version=format_version)
                return
            except Exception as exc:
                if not self.is_retryable(exc):
                    raise
                last_exc = exc
                time.sleep(0.05)
                # another attach may have won the race
                if con.execute(
                    "SELECT 1 FROM sqlite_master WHERE type='table' "
                    "AND name=?", ("ducklake_snapshot",)
                ).fetchone() and con.execute(
                    "SELECT COUNT(*) FROM ducklake_snapshot"
                ).fetchone()[0] > 0:
                    return
        raise last_exc

    def _bootstrap(self, data_path: str, *, encrypted: bool,
               format_version: str | None = None) -> None:
        con = self.con
        self.begin_write()
        try:
            for stmt in SCHEMA_STATEMENTS:
                con.execute(stmt)
            if con.execute("SELECT COUNT(*) FROM ducklake_snapshot").fetchone()[0] == 0:
                con.executemany(
                    "INSERT INTO ducklake_metadata(key, value, scope, scope_id) "
                    "VALUES (?, ?, NULL, NULL)",
                    [
                        ("version", format_version or FORMAT_VERSION),
                        ("created_by", "ducklake_spark v0.1.0"),
                        ("data_path", data_path),
                        ("encrypted", "true" if encrypted else "false"),
                    ],
                )
                con.execute(
                    "INSERT INTO ducklake_snapshot VALUES (0, ?, 0, 1, 0)",
                    (_now_ts(),),
                )
                con.execute(
                    "INSERT INTO ducklake_snapshot_changes VALUES "
                    "(0, 'created_schema:\"main\"', NULL, NULL, NULL)"
                )
                con.execute(
                    "INSERT INTO ducklake_schema VALUES (0, ?, 0, NULL, 'main', 'main/', 1)",
                    (str(uuid.uuid4()),),
                )
            # idempotent column migrations for catalogs created before a
            # column existed (reference adds row_group_count the same
            # way — ducklake_metadata_manager.cpp:428 ALTER ... IF NOT
            # EXISTS); run inside the bootstrap txn, guarded by a
            # PRAGMA probe so no backend sees a failing statement
            for mtable, mcol, mdecl in (
                ("ducklake_data_file", "row_group_count", "BIGINT"),
                ("ducklake_delete_file", "row_group_count", "BIGINT"),
            ):
                cols = [r[1] for r in con.execute(
                    f"PRAGMA table_info({mtable})").fetchall()]
                if mcol not in cols:
                    con.execute(
                        f"ALTER TABLE {mtable} ADD COLUMN {mcol} {mdecl}")
            con.execute("COMMIT")
        except BaseException:
            safe_rollback(con)
            raise

    # -- snapshot access ---------------------------------------------------

    def latest_snapshot(self) -> Snapshot:
        """Latest *committed* snapshot (staged rows carry a NULL
        snapshot_time until ducklake_commit finalizes them)."""
        row = self.con.execute(
            "SELECT snapshot_id, schema_version, next_catalog_id, next_file_id "
            "FROM ducklake_snapshot WHERE snapshot_time IS NOT NULL "
            "ORDER BY snapshot_id DESC LIMIT 1"
        ).fetchone()
        return Snapshot(*row)

    def allocation_head(self) -> Snapshot:
        """Allocator state: the next snapshot id extends the committed
        chain, but the catalog/file-id counters take the MAX over
        staged rows too — staged commits hold id reservations that
        must never be reused."""
        latest = self.latest_snapshot()
        next_cat, next_file = self.con.execute(
            "SELECT MAX(next_catalog_id), MAX(next_file_id) FROM ducklake_snapshot"
        ).fetchone()
        return Snapshot(latest.snapshot_id, latest.schema_version, next_cat, next_file)

    def snapshot_at_version(self, version: int) -> Snapshot:
        row = self.con.execute(
            "SELECT snapshot_id, schema_version, next_catalog_id, next_file_id "
            "FROM ducklake_snapshot WHERE snapshot_id = ? "
            "AND snapshot_time IS NOT NULL",
            (version,),
        ).fetchone()
        if row is None:
            # reference-exact wording (ducklake_metadata_manager.cpp:4385)
            raise ValueError(f"No snapshot found at version {version}")
        return Snapshot(*row)

    def snapshot_at_timestamp(self, ts: str) -> Snapshot:
        """AT (TIMESTAMP => t): latest snapshot with snapshot_time <= t
        (reference: ducklake_metadata_manager.cpp:4352-4389)."""
        row = self.con.execute(
            "SELECT snapshot_id, schema_version, next_catalog_id, next_file_id "
            "FROM ducklake_snapshot WHERE snapshot_time <= ? "
            "ORDER BY snapshot_id DESC LIMIT 1",
            (ts,),
        ).fetchone()
        if row is None:
            # reference-exact wording (ducklake_metadata_manager.cpp:4385)
            raise ValueError(f"No snapshot found at timestamp {ts}")
        return Snapshot(*row)

    def snapshots_since(self, snapshot_id: int) -> list[tuple[int, str]]:
        """(snapshot_id, changes_made) committed after ``snapshot_id``."""
        return self.con.execute(
            "SELECT s.snapshot_id, COALESCE(c.changes_made, '') "
            "FROM ducklake_snapshot s "
            "LEFT JOIN ducklake_snapshot_changes c ON s.snapshot_id = c.snapshot_id "
            "WHERE s.snapshot_id > ? AND s.snapshot_time IS NOT NULL "
            "ORDER BY s.snapshot_id",
            (snapshot_id,),
        ).fetchall()

    # -- generic helpers ---------------------------------------------------

    def query(self, sql: str, params: tuple = ()) -> list[tuple]:
        return self.con.execute(sql, params).fetchall()

    def columns(self, table: str) -> list[str] | None:
        """Column names of a catalog table, via the backend cursor's
        description (works on sqlite3, duckdb, and the pg clients);
        None when the backend does not expose one."""
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", table):
            raise ValueError(f"bad catalog table name {table!r}")
        try:
            cur = self.con.execute(f"SELECT * FROM {table} WHERE 1=0")
            desc = getattr(cur, "description", None)
            return [d[0] for d in desc] if desc else None
        except Exception:
            return None

    def option(self, key: str, default: str | None = None,
               scope: str | None = None, scope_id: int | None = None,
               schema_id: int | None = None) -> str | None:
        """Scoped config lookup: table scope wins over schema over global
        (reference: ducklake_set_option.cpp:92-171,
        ducklake_metadata_manager.cpp:466-482)."""
        if scope_id is not None:
            row = self.con.execute(
                "SELECT value FROM ducklake_metadata WHERE key=? AND scope=? AND scope_id=?",
                (key, scope, scope_id),
            ).fetchone()
            if row:
                return row[0]
        if schema_id is not None:
            row = self.con.execute(
                "SELECT value FROM ducklake_metadata "
                "WHERE key=? AND scope='schema' AND scope_id=?",
                (key, schema_id),
            ).fetchone()
            if row:
                return row[0]
        row = self.con.execute(
            "SELECT value FROM ducklake_metadata WHERE key=? AND scope IS NULL",
            (key,),
        ).fetchone()
        return row[0] if row else default

    def set_option(self, key: str, value: str,
                   scope: str | None = None, scope_id: int | None = None) -> None:
        # retried: concurrent sessions SETting the same option race on
        # the delete+insert (settings/max_retry_count.test runs SET
        # inside a concurrentloop)
        import time as _time

        for attempt in range(6):
            try:
                if scope is None:
                    self.con.execute(
                        "DELETE FROM ducklake_metadata "
                        "WHERE key=? AND scope IS NULL", (key,)
                    )
                else:
                    self.con.execute(
                        "DELETE FROM ducklake_metadata "
                        "WHERE key=? AND scope=? AND scope_id=?",
                        (key, scope, scope_id),
                    )
                self.con.execute(
                    "INSERT INTO ducklake_metadata VALUES (?, ?, ?, ?)",
                    (key, value, scope, scope_id),
                )
                return
            except Exception as exc:
                safe_rollback(self.con)
                if attempt == 5 or not self.is_retryable(exc):
                    raise
                _time.sleep(0.05 * (attempt + 1))

    def close(self) -> None:
        con = getattr(self._local, "con", None)
        if con is not None:
            con.close()
            self._local.con = None


def safe_rollback(con) -> None:
    """ROLLBACK tolerant of already-aborted transactions (DuckDB aborts
    the txn itself when COMMIT fails; a bare ROLLBACK then raises and
    would mask the original error)."""
    try:
        con.execute("ROLLBACK")
    except Exception:
        pass


def _now_ts() -> str:
    t = time.time()
    frac = f"{t % 1:.6f}"[2:]
    return time.strftime("%Y-%m-%d %H:%M:%S", time.gmtime(t)) + "." + frac
