"""Minimal pure-Python PostgreSQL client (wire protocol v3).

psycopg2 is not installable in every deployment (nor in this
container), so ``PostgresBackend`` falls back to this client: a
from-scratch implementation of the public PostgreSQL frontend/backend
protocol — startup, simple query, error and ready-for-query handling —
exposing exactly the psycopg2 connection surface the catalog adapter
(`_PgConnection`) drives: ``autocommit``, ``cursor()``, ``commit``,
``rollback``, ``close``; cursors support ``execute(sql, params)`` with
``%s`` placeholders, ``executemany``, ``fetchone``, ``fetchall`` and
``description``.

Parameters are interpolated client-side into SQL literals before they
reach the wire — psycopg2's own model for ``%s`` — so only the simple
query message ('Q') is needed. Message formats follow the public spec:
https://www.postgresql.org/docs/current/protocol-message-formats.html

Reference parity: the reference exercises its whole suite against a
real Postgres catalog (test/configs/postgres.json); this client plus
the DuckDB-backed wire server in tests/pg_tcp_server.py give this repo
the same end-to-end network path.
"""

from __future__ import annotations

import datetime
import decimal
import socket
import struct
from urllib.parse import urlparse


class PgError(Exception):
    """ErrorResponse surfaced from the server ('E' message fields)."""

    def __init__(self, fields: dict[str, str]):
        self.fields = fields
        super().__init__(fields.get("M", "postgres error"))


def _escape_literal(v) -> str:
    """Render a Python value as a SQL literal (standard_conforming)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        if isinstance(v, float) and (v != v or v in (float("inf"), float("-inf"))):
            raise ValueError(f"non-finite float parameter: {v}")
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        return "'" + v.isoformat(sep=" ") + "'"
    if isinstance(v, datetime.date):
        return "'" + v.isoformat() + "'"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    raise TypeError(f"unsupported parameter type: {type(v).__name__}")


def _interpolate(sql: str, params) -> str:
    """Replace each ``%s`` OUTSIDE string literals with the escaped
    parameter, in order; count mismatches raise like psycopg2."""
    out: list[str] = []
    it = iter(params)
    used = 0
    i, n = 0, len(sql)
    in_str = False
    while i < n:
        c = sql[i]
        if in_str:
            out.append(c)
            if c == "'":
                # '' escape stays inside the literal
                if i + 1 < n and sql[i + 1] == "'":
                    out.append("'")
                    i += 1
                else:
                    in_str = False
        elif c == "'":
            in_str = True
            out.append(c)
        elif c == "%" and i + 1 < n and sql[i + 1] == "s":
            try:
                out.append(_escape_literal(next(it)))
            except StopIteration:
                raise ValueError(f"not enough parameters for: {sql!r}") from None
            used += 1
            i += 1
        else:
            out.append(c)
        i += 1
    if used != len(tuple(params)):
        raise ValueError(
            f"{used} placeholders vs {len(tuple(params))} params: {sql!r}"
        )
    return "".join(out)


# text-format decoders by type OID (the subset the catalog round-trips)
def _parse_ts(s: str):
    return datetime.datetime.fromisoformat(s)


_DECODERS = {
    16: lambda s: s == "t",                      # bool
    20: int, 21: int, 23: int, 26: int,          # int8/2/4, oid
    700: float, 701: float,                      # float4/8
    1082: datetime.date.fromisoformat,           # date
    1114: _parse_ts, 1184: _parse_ts,            # timestamp[tz]
    1700: decimal.Decimal,                       # numeric
}


class PgWireConnection:
    """One TCP connection speaking protocol v3 in text mode."""

    def __init__(self, host: str, port: int, user: str = "ducklake",
                 database: str = "ducklake", timeout: float = 30.0):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self.autocommit = True
        self._txn_open = False
        self._closed = False
        params = (
            f"user\x00{user}\x00database\x00{database}\x00"
            "client_encoding\x00UTF8\x00\x00"
        ).encode()
        body = struct.pack("!I", 196608) + params  # protocol 3.0
        self.sock.sendall(struct.pack("!I", len(body) + 4) + body)
        self._consume_until_ready()

    # ---------------------------------------------------------- wire
    def _read_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("server closed the connection")
            buf += chunk
        return buf

    def _read_message(self) -> tuple[bytes, bytes]:
        t = self._read_exact(1)
        (length,) = struct.unpack("!I", self._read_exact(4))
        return t, self._read_exact(length - 4)

    @staticmethod
    def _error_fields(payload: bytes) -> dict[str, str]:
        fields: dict[str, str] = {}
        i = 0
        while i < len(payload) and payload[i] != 0:
            code = chr(payload[i])
            end = payload.index(b"\x00", i + 1)
            fields[code] = payload[i + 1:end].decode("utf-8", "replace")
            i = end + 1
        return fields

    def _consume_until_ready(self):
        err = None
        while True:
            t, payload = self._read_message()
            if t == b"Z":
                if err is not None:
                    raise PgError(err)
                return
            if t == b"E":
                err = self._error_fields(payload)
            # R (auth), S (parameter status), K (backend key), N
            # (notice) need no action in this client

    def _simple_query(self, sql: str):
        """Send 'Q', gather (description, rows) until ReadyForQuery."""
        body = sql.encode() + b"\x00"
        self.sock.sendall(b"Q" + struct.pack("!I", len(body) + 4) + body)
        desc, rows, err = None, [], None
        while True:
            t, payload = self._read_message()
            if t == b"Z":
                if err is not None:
                    raise PgError(err)
                return desc, rows
            if t == b"E":
                err = self._error_fields(payload)
            elif t == b"T":
                desc = []
                (nfields,) = struct.unpack("!H", payload[:2])
                i = 2
                for _ in range(nfields):
                    end = payload.index(b"\x00", i)
                    name = payload[i:end].decode()
                    (_tbl, _att, oid, _len, _mod, _fmt) = struct.unpack(
                        "!IHIhih", payload[end + 1:end + 19]
                    )
                    desc.append((name, oid, None, None, None, None, None))
                    i = end + 19
            elif t == b"D" and desc is not None and err is None:
                (ncols,) = struct.unpack("!H", payload[:2])
                i = 2
                row = []
                for c in range(ncols):
                    (ln,) = struct.unpack("!i", payload[i:i + 4])
                    i += 4
                    if ln == -1:
                        row.append(None)
                    else:
                        text = payload[i:i + ln].decode()
                        i += ln
                        dec = _DECODERS.get(desc[c][1])
                        row.append(dec(text) if dec else text)
                rows.append(tuple(row))
            # C (command complete), N (notice): ignored

    # ------------------------------------------------ psycopg2 shape
    def cursor(self) -> "PgWireCursor":
        return PgWireCursor(self)

    def commit(self):
        if self._txn_open:
            self._simple_query("COMMIT")
            self._txn_open = False

    def rollback(self):
        if self._txn_open:
            self._simple_query("ROLLBACK")
            self._txn_open = False

    def close(self):
        if not self._closed:
            try:
                self.sock.sendall(b"X" + struct.pack("!I", 4))
            except OSError:
                pass
            self.sock.close()
            self._closed = True


class PgWireCursor:
    def __init__(self, conn: PgWireConnection):
        self.conn = conn
        self.description = None
        self._rows: list[tuple] = []
        self._idx = 0

    def execute(self, sql: str, params=()):
        text = _interpolate(sql, tuple(params))
        if not self.conn.autocommit and not self.conn._txn_open:
            self.conn._simple_query("BEGIN")  # psycopg2 implicit BEGIN
            self.conn._txn_open = True
        desc, rows = self.conn._simple_query(text)
        self.description = desc
        self._rows, self._idx = rows, 0
        return self

    def executemany(self, sql: str, seq):
        """All rows in ONE wire round trip: the v3 simple-query message
        carries multiple semicolon-separated statements, so a K-row
        insert costs one network round trip, not K (the motivation for
        the reference's server-side commit path,
        ducklake_server_side_commit.cpp)."""
        seq = [tuple(p) for p in seq]
        if not seq:
            return self
        if not self.conn.autocommit and not self.conn._txn_open:
            self.conn._simple_query("BEGIN")
            self.conn._txn_open = True
        batch = "; ".join(_interpolate(sql, p) for p in seq)
        desc, rows = self.conn._simple_query(batch)
        self.description = desc
        self._rows, self._idx = rows, 0
        return self

    def fetchone(self):
        if self._idx < len(self._rows):
            r = self._rows[self._idx]
            self._idx += 1
            return r
        return None

    def fetchall(self):
        r = self._rows[self._idx:]
        self._idx = len(self._rows)
        return r

    def close(self):
        pass


def connect(dsn: str) -> PgWireConnection:
    """psycopg2-style entry: postgresql://[user@]host[:port]/dbname."""
    u = urlparse(dsn)
    return PgWireConnection(
        u.hostname or "localhost",
        u.port or 5432,
        user=u.username or "ducklake",
        database=(u.path or "/ducklake").lstrip("/") or "ducklake",
    )
