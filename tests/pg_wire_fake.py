"""Wire-faithful Postgres fake for the catalog translation layer.

psycopg2 (and a Postgres server) are not available in this container,
so the ``_PgConnection`` adapter is driven against this fake instead:
an object exposing exactly the psycopg2 connection surface the adapter
uses (``autocommit``, ``cursor()``, ``commit``, ``rollback``,
``close``), which

- REJECTS anything that would fail on the Postgres wire: a leftover
  qmark placeholder, a ``PRAGMA``, a ``sqlite_master`` reference, or a
  placeholder-count/param-count mismatch;
- parses + executes every translated statement on DuckDB, whose SQL
  parser is derived from Postgres' grammar (libpg_query) and which
  enforces declared column types — the closest ANSI/PG conformance
  check available in-process;
- emulates psycopg2's implicit-BEGIN: with ``autocommit = False`` a
  transaction opens at the first statement and closes at
  ``commit()``/``rollback()``.

Reference config: test/configs/postgres.json (the reference runs its
whole suite against a real Postgres; this fake is the documented
stand-in, see VERDICT r3 "next" #4).
"""

from __future__ import annotations

import re
import threading

import duckdb

_QMARK = re.compile(r"\?")
_SQLITEISM = re.compile(r"\b(pragma|sqlite_master)\b", re.I)
_PCT_S = re.compile(r"%s")


class WireProtocolError(AssertionError):
    """The adapter emitted something a real Postgres would reject."""


class FakePgServer:
    """One 'server' = one DuckDB database file shared by connections."""

    def __init__(self, path: str):
        self.path = path
        self.lock = threading.Lock()


class FakePgRawConnection:
    def __init__(self, server: FakePgServer):
        self.server = server
        self.duck = duckdb.connect(server.path)
        self.autocommit = True
        self._txn_open = False
        self.statements: list[str] = []  # audit trail for tests

    # -- psycopg2 surface used by _PgConnection -----------------------
    def cursor(self):
        return FakePgCursor(self)

    def commit(self):
        if self._txn_open:
            self.duck.execute("COMMIT")
            self._txn_open = False

    def rollback(self):
        if self._txn_open:
            self.duck.execute("ROLLBACK")
            self._txn_open = False

    def close(self):
        self.duck.close()

    # -- internals ----------------------------------------------------
    def _run(self, sql: str, params):
        if _QMARK.search(_strip_strings(sql)):
            raise WireProtocolError(f"qmark placeholder reached the wire: {sql!r}")
        if _SQLITEISM.search(sql):
            raise WireProtocolError(f"sqlite-ism reached the wire: {sql!r}")
        n_ph = len(_PCT_S.findall(sql))
        if n_ph != len(params):
            raise WireProtocolError(
                f"{n_ph} placeholders vs {len(params)} params: {sql!r}"
            )
        if not self.autocommit and not self._txn_open:
            self.duck.execute("BEGIN")  # psycopg2 implicit BEGIN
            self._txn_open = True
        # numbered params, the wire form ($1..$n)
        out, i = [], 0
        pos = 0
        for m in _PCT_S.finditer(sql):
            out.append(sql[pos:m.start()])
            i += 1
            out.append(f"${i}")
            pos = m.end()
        out.append(sql[pos:])
        wire_sql = "".join(out)
        self.statements.append(wire_sql)
        return self.duck.execute(wire_sql, list(params))


class FakePgCursor:
    def __init__(self, raw: FakePgRawConnection):
        self.raw = raw
        self._res = None

    def execute(self, sql: str, params=()):
        with self.raw.server.lock:
            self._res = self.raw._run(sql, tuple(params))
        return self

    def executemany(self, sql: str, seq):
        with self.raw.server.lock:
            for p in seq:
                self._res = self.raw._run(sql, tuple(p))
        return self

    def fetchone(self):
        return self._res.fetchone() if self._res is not None else None

    def fetchall(self):
        return self._res.fetchall() if self._res is not None else []

    @property
    def description(self):
        return self._res.description if self._res is not None else None

    def close(self):
        pass


def _strip_strings(sql: str) -> str:
    return re.sub(r"'(?:[^']|'')*'", "''", sql)


def install(path: str) -> str:
    """Register a ``postgresql://wire-fake`` backend bound to a DuckDB
    file at ``path``; returns the DSN to attach with."""
    from ducklake_spark.catalog.backends import (
        PostgresBackend,
        _PgConnection,
        register_backend,
    )

    server = FakePgServer(path)

    class FakePgBackend(PostgresBackend):
        def connect(self):
            return _PgConnection(FakePgRawConnection(server))

    dsn = f"postgresql://wire-fake/{path}"
    register_backend(dsn, lambda _dsn: FakePgBackend(_dsn))
    return dsn
