"""Catalog database backends.

The reference runs its metadata schema on DuckDB, SQLite, or Postgres
(test/configs/postgres.json; the SQL is deliberately ANSI-portable —
ducklake_metadata_manager.cpp:1241-1244). This module gives the Spark
port the same choice behind one seam:

- ``SqliteBackend``   — default; a plain file path.
- ``DuckDBBackend``   — ``duckdb://<path>``; the reference's own default
  catalog engine, fully exercised by the test suite in this repo.
- ``PostgresBackend`` — ``postgresql://...``; the cross-machine
  multi-writer deployment. Uses psycopg2 when importable, else the
  vendored pure-Python wire client (``catalog/pg_client.py``, protocol
  v3 over a real socket). Exercised end-to-end against the TCP wire
  server in tests/pg_tcp_server.py (and the whole pytest matrix via
  ``DUCKLAKE_TEST_BACKEND=pgtcp``).

Every backend must provide qmark-style ``execute(sql, params)`` whose
result supports ``fetchone/fetchall``, plus ``executemany``. The repo's
catalog SQL avoids engine-specific constructs (no rowid keys, no
``datetime('now')``); the two introspection idioms that remain —
``sqlite_master`` and ``PRAGMA table_info`` — work natively on SQLite
AND DuckDB, and are rewritten to information_schema for Postgres.
"""

from __future__ import annotations

import re


class CatalogBackend:
    """One per MetadataManager; connections are created per thread."""

    #: statement that opens a write transaction with writer exclusion /
    #: snapshot isolation appropriate to the engine
    begin_write_sql = "BEGIN"

    def connect(self):  # pragma: no cover - interface
        raise NotImplementedError

    def is_retryable(self, exc: Exception) -> bool:
        """Transient concurrency error → the optimistic commit loop
        retries instead of surfacing the failure."""
        msg = str(exc).lower()
        return "lock" in msg or "conflict" in msg or "busy" in msg

    def use_schema(self, con, schema: str) -> None:
        """Scope this connection's unqualified table names to
        ``schema`` (ATTACH ... METADATA_SCHEMA 'x': multiple lakes
        share one catalog database under different schemas —
        transaction/transaction_schema.test). Engines without schema
        support refuse, like the reference on SQLite."""
        raise ValueError(
            "METADATA_SCHEMA is not supported by this metadata backend")


class SqliteBackend(CatalogBackend):
    begin_write_sql = "BEGIN IMMEDIATE"

    def __init__(self, path: str):
        self.path = path

    def connect(self):
        import sqlite3

        con = sqlite3.connect(self.path, timeout=30.0, isolation_level=None)
        con.execute("PRAGMA journal_mode=WAL")
        con.execute("PRAGMA busy_timeout=30000")
        return con


class DuckDBBackend(CatalogBackend):
    # DuckDB rejects nested BEGIN and detects write-write conflicts at
    # COMMIT (MVCC) — the commit loop's retry handles those
    begin_write_sql = "BEGIN TRANSACTION"

    def __init__(self, path: str):
        self.path = path

    def connect(self):
        import duckdb

        return _DuckConnection(duckdb.connect(self.path))

    def use_schema(self, con, schema: str) -> None:
        esc = schema.replace('"', '""')
        con.execute(f'CREATE SCHEMA IF NOT EXISTS "{esc}"')
        con.execute(f'USE "{esc}"')
        # duckdb's sqlite_master compat view is NOT schema-scoped —
        # existence probes must go through information_schema instead
        con.schema = schema

    def is_retryable(self, exc: Exception) -> bool:
        msg = str(exc).lower()
        # "duplicate key" on a catalog id is the PK form of the same
        # optimistic race: two writers allocated the same next id from
        # the snapshot they both read — retry re-reads and advances
        return (
            "conflict" in msg
            or "lock" in msg
            or "transactioncontext" in msg
            or "could not set lock" in msg
            or "duplicate key" in msg
        )


class _DuckConnection:
    """Thin shim over a duckdb connection smoothing two DB-API gaps:
    ``executemany([])`` raises on duckdb (sqlite3 no-ops — call sites
    batch whatever rows the commit collected, possibly none), and the
    catalog layer treats cursors as the connection's return value."""

    __slots__ = ("raw", "schema")

    def __init__(self, raw):
        self.raw = raw
        self.schema = None  # set by DuckDBBackend.use_schema

    def _translate(self, sql: str) -> str:
        if self.schema is None:
            return sql
        esc = self.schema.replace("'", "''")
        sql = _SQLITE_MASTER_LIST.sub(
            "SELECT table_name FROM information_schema.tables "
            f"WHERE table_schema = '{esc}'", sql)

        def _one(m: "re.Match[str]") -> str:
            return (
                "SELECT 1 FROM information_schema.tables "
                f"WHERE table_schema = '{esc}' AND table_name = "
                + m.group(1))

        return _SQLITE_MASTER_ONE.sub(_one, sql)

    def execute(self, sql: str, params=()):
        return self.raw.execute(self._translate(sql), tuple(params))

    def executemany(self, sql: str, seq):
        rows = [tuple(p) for p in seq]
        if not rows:
            return self.raw
        return self.raw.executemany(self._translate(sql), rows)

    def __getattr__(self, name):
        return getattr(self.raw, name)


_SQLITE_MASTER_LIST = re.compile(
    r"SELECT\s+name\s+FROM\s+sqlite_master\s+WHERE\s+type='table'", re.I
)
_SQLITE_MASTER_ONE = re.compile(
    r"SELECT\s+1\s+FROM\s+sqlite_master\s+WHERE\s+type='table'\s+AND\s+"
    r"name=(\?|'\w+')",
    re.I,
)
_PRAGMA_INFO = re.compile(r"PRAGMA\s+table_info\(\s*'?(\w+)'?\s*\)", re.I)


class _PgConnection:
    """Adapter giving a psycopg2 connection the sqlite3 call shape the
    catalog layer uses: qmark params, autocommit statements, and the two
    introspection idioms rewritten to information_schema."""

    def __init__(self, raw):
        self.raw = raw
        raw.autocommit = True
        self._in_txn = False

    @staticmethod
    def _translate(sql: str) -> str:
        m = _PRAGMA_INFO.search(sql)
        if m:
            # emit sqlite's (cid, name, type, notnull, dflt_value, pk) shape
            return (
                "SELECT ordinal_position - 1, column_name, data_type, "
                "CASE WHEN is_nullable='NO' THEN 1 ELSE 0 END, "
                "column_default, 0 FROM information_schema.columns "
                f"WHERE table_name = '{m.group(1).lower()}' "
                "ORDER BY ordinal_position"
            )
        sql = _SQLITE_MASTER_LIST.sub(
            "SELECT table_name FROM information_schema.tables "
            "WHERE table_schema = current_schema()",
            sql,
        )
        def _one(m: "re.Match[str]") -> str:
            return (
                "SELECT 1 FROM information_schema.tables "
                "WHERE table_schema = current_schema() AND table_name = "
                + ("%s" if m.group(1) == "?" else m.group(1))
            )

        sql = _SQLITE_MASTER_ONE.sub(_one, sql)
        return sql.replace("?", "%s")

    def execute(self, sql: str, params=()):
        stripped = sql.strip().upper()
        if stripped.startswith("BEGIN"):
            self.raw.autocommit = False
            self._in_txn = True
            return self
        if stripped in ("COMMIT", "ROLLBACK"):
            (self.raw.commit if stripped == "COMMIT" else self.raw.rollback)()
            self.raw.autocommit = True
            self._in_txn = False
            return self
        cur = self.raw.cursor()
        cur.execute(self._translate(sql), tuple(params))
        return cur

    def executemany(self, sql: str, seq):
        cur = self.raw.cursor()
        cur.executemany(self._translate(sql), [tuple(p) for p in seq])
        return cur

    def close(self):
        self.raw.close()


class PostgresBackend(CatalogBackend):
    begin_write_sql = "BEGIN"

    def __init__(self, dsn: str):
        self.dsn = dsn

    def connect(self):
        try:
            import psycopg2

            return _PgConnection(psycopg2.connect(self.dsn))
        except ImportError:
            # vendored pure-Python wire client (catalog/pg_client.py):
            # same psycopg2 connection surface over a real socket
            from ducklake_spark.catalog import pg_client

            return _PgConnection(pg_client.connect(self.dsn))

    def use_schema(self, con, schema: str) -> None:
        esc = schema.replace('"', '""')
        con.execute(f'CREATE SCHEMA IF NOT EXISTS "{esc}"')
        # current_schema() drives the information_schema rewrites, so
        # the existence probes scope automatically
        con.execute(f'SET search_path TO "{esc}"')

    def is_retryable(self, exc: Exception) -> bool:
        msg = str(exc).lower()
        # real Postgres: deadlock / serialization failures. The DuckDB-
        # backed wire server used in tests surfaces MVCC write-write
        # conflicts with DuckDB's own wording — retry those identically.
        return (
            "deadlock" in msg
            or "could not serialize" in msg
            or "lock" in msg
            or "conflict" in msg
            or "busy" in msg
            or "duplicate key" in msg
        )


_EXTRA_BACKENDS: list[tuple[str, object]] = []


def register_backend(prefix: str, factory) -> None:
    """Extension point: map a DSN prefix to a custom backend factory.
    Lets a deployment plug an alternative Postgres driver (pg8000,
    psycopg3) — and lets the test suite run the translation layer
    against a wire-faithful fake server."""
    _EXTRA_BACKENDS.append((prefix, factory))


class S3StagedDuckDBBackend(DuckDBBackend):
    """DuckDB catalog file living on an object store: staged to a
    local cache (download on first connect, upload after each COMMIT
    and on close). Used when ATTACH names an s3:// metadata path
    (metadata/ducklake_settings_minio.test); a production deployment
    would put the catalog on a database server instead."""

    def __init__(self, url: str):
        import os as _os

        from ducklake_spark.fsio import (
            mirror_root_for,
            s3_boto_client,
            split_s3,
        )

        self.url = url
        self.bucket, self.key = split_s3(url)
        local = _os.path.join(
            mirror_root_for(url.rsplit("/", 1)[0]),
            _os.path.basename(url))
        if not _os.path.exists(local):
            try:
                s3_boto_client().download_file(self.bucket, self.key,
                                               local)
            except Exception:
                pass  # fresh catalog
        super().__init__(local)

    def connect(self):
        con = super().connect()
        backend = self

        class _Synced(_DuckConnection):
            __slots__ = ()

            def execute(self2, sql: str, params=()):  # noqa: N805
                out = _DuckConnection.execute(self2, sql, params)
                if sql.strip().upper().startswith("COMMIT"):
                    backend._upload(self2)
                return out

        syn = _Synced(con.raw)
        syn.schema = con.schema
        return syn

    def _upload(self, con) -> None:
        from ducklake_spark.fsio import s3_boto_client

        try:
            con.raw.execute("CHECKPOINT")
        except Exception:
            pass
        try:
            s3_boto_client().upload_file(self.path, self.bucket,
                                         self.key)
        except Exception:
            pass  # durability is best-effort under the mock server


def backend_for(db_path: str) -> CatalogBackend:
    for prefix, factory in _EXTRA_BACKENDS:
        if db_path.startswith(prefix):
            return factory(db_path)
    if db_path.startswith("duckdb://"):
        return DuckDBBackend(db_path[len("duckdb://"):])
    if db_path.startswith(("postgresql://", "postgres://")):
        return PostgresBackend(db_path)
    if db_path.startswith(("s3://", "s3a://")):
        return S3StagedDuckDBBackend(db_path)
    return SqliteBackend(db_path)
