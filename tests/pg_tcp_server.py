"""DuckDB-backed PostgreSQL wire server for end-to-end catalog tests.

Round-5 verdict: the wire-faithful fake (`pg_wire_fake`) never crossed
a socket, so the client path was untested. This server speaks real
protocol v3 over TCP — startup (incl. SSLRequest refusal), simple
query, RowDescription/DataRow in text format, ErrorResponse,
ReadyForQuery with transaction status — and executes every statement
on DuckDB (whose SQL grammar derives from Postgres' via libpg_query),
applying the same wire-hygiene checks as the in-process fake: a
leftover ``%s``/``?`` placeholder or a sqlite-ism reaching the wire is
a protocol error.

Databases are files: the startup message's ``database`` parameter maps
to ``<root>/<database>.duckdb``, so every test gets an isolated
catalog through a distinct DSN. Each TCP connection gets its own
DuckDB connection (real MVCC between writers — write-write conflicts
surface as ErrorResponse and drive the optimistic commit retry loop).

Message formats per the public spec:
https://www.postgresql.org/docs/current/protocol-message-formats.html
Run the whole pytest matrix over TCP with DUCKLAKE_TEST_BACKEND=pgtcp.
"""

from __future__ import annotations

import datetime
import decimal
import json
import os
import re
import socket
import struct
import threading

import duckdb

from ducklake_spark.catalog.server_commit import (
    CONFLICT_TAG,
    CAPABILITY,
    ServerCommitConflict,
    apply_data_commit,
    decode_payload,
)

_BAD_WIRE = re.compile(r"%s|\?")
_SQLITEISM = re.compile(r"\b(pragma|sqlite_master)\b", re.I)
_STRINGS = re.compile(r"'(?:[^']|'')*'")
# server-side ("quack") commit entry points — the analogue of the
# reference extension's hooks running inside the catalog server
_SERVER_CALL = re.compile(
    r"^\s*SELECT\s+ducklake_server_(commit|capabilities)\s*"
    r"\(\s*(?:'([A-Za-z0-9+/=]*)')?\s*\)\s*;?\s*$",
    re.I,
)

_SSL_REQUEST = 80877103
_PROTO_V3 = 196608


def _oid_for(v) -> int:
    if isinstance(v, bool):
        return 16
    if isinstance(v, int):
        return 20
    if isinstance(v, float):
        return 701
    if isinstance(v, decimal.Decimal):
        return 1700
    if isinstance(v, datetime.datetime):
        return 1114
    if isinstance(v, datetime.date):
        return 1082
    return 25


def _encode(v) -> bytes | None:
    if v is None:
        return None
    if isinstance(v, bool):
        return b"t" if v else b"f"
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ").encode()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex().encode()
    return str(v).encode()


class DuckPgServer:
    """Thread-per-connection wire server over per-database DuckDB files."""

    def __init__(self, root: str, host: str = "127.0.0.1", port: int = 0):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.lock = threading.Lock()  # serializes statement execution
        self._listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._listener.bind((host, port))
        self._listener.listen(32)
        self.host, self.port = self._listener.getsockname()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def dsn(self, database: str) -> str:
        return f"postgresql://{self.host}:{self.port}/{database}"

    def close(self):
        self._stop.set()
        try:
            self._listener.close()
        except OSError:
            pass

    # ------------------------------------------------------------ serve
    def _serve(self):
        while not self._stop.is_set():
            try:
                conn, _addr = self._listener.accept()
            except OSError:
                return
            threading.Thread(
                target=self._session, args=(conn,), daemon=True
            ).start()

    def _session(self, sock: socket.socket):
        try:
            db = self._handshake(sock)
            duck = duckdb.connect(os.path.join(self.root, f"{db}.duckdb"))
        except Exception:
            sock.close()
            return
        in_txn = False
        try:
            while True:
                head = _read_exact(sock, 5)
                if head is None:
                    return
                t, length = head[:1], struct.unpack("!I", head[1:])[0]
                payload = _read_exact(sock, length - 4)
                if payload is None:
                    return
                if t == b"X":
                    return
                if t != b"Q":
                    _send_error(sock, f"unsupported message type {t!r}")
                    _send_ready(sock, in_txn)
                    continue
                sql = payload.rstrip(b"\x00").decode()
                bare = _STRINGS.sub("''", sql)
                if _BAD_WIRE.search(bare) or _SQLITEISM.search(bare):
                    _send_error(sock, f"wire protocol violation: {sql!r}")
                    _send_ready(sock, in_txn)
                    continue
                sc = _SERVER_CALL.match(sql)
                if sc is not None:
                    if sc.group(1).lower() == "capabilities":
                        _send_result(
                            sock, [("capabilities",)], [(CAPABILITY,)], "SELECT"
                        )
                    elif in_txn:
                        _send_error(
                            sock,
                            "ducklake_server_commit must run outside a "
                            "transaction",
                        )
                    else:
                        try:
                            result = apply_data_commit(
                                duck,
                                decode_payload(sc.group(2) or ""),
                                lock=self.lock,
                            )
                            _send_result(
                                sock,
                                [("ducklake_server_commit",)],
                                [(json.dumps(result),)],
                                "SELECT",
                            )
                        except ServerCommitConflict as e:
                            _send_error(sock, f"{CONFLICT_TAG}: {e}")
                        except Exception as e:
                            _send_error(sock, str(e))
                    _send_ready(sock, in_txn)
                    continue
                up = sql.strip().upper()
                try:
                    with self.lock:
                        res = duck.execute(sql)
                        desc = res.description
                        rows = res.fetchall() if desc else []
                    if up.startswith("BEGIN"):
                        in_txn = True
                    elif up.startswith(("COMMIT", "ROLLBACK")):
                        in_txn = False
                    _send_result(sock, desc, rows, up.split()[0] if up else "OK")
                except Exception as e:  # surfaced as ErrorResponse
                    # real Postgres treats COMMIT/ROLLBACK outside a
                    # transaction as a WARNING, not an error — DuckDB
                    # may have auto-aborted the txn on a prior failure
                    if (up.startswith(("COMMIT", "ROLLBACK"))
                            and "no transaction is active" in str(e)):
                        in_txn = False
                        _send_result(sock, None, [], up.split()[0])
                    else:
                        if up.startswith(("COMMIT", "ROLLBACK")):
                            in_txn = False
                        _send_error(sock, str(e))
                _send_ready(sock, in_txn)
        finally:
            try:
                duck.close()
            except Exception:
                pass
            sock.close()

    def _handshake(self, sock: socket.socket) -> str:
        while True:
            head = _read_exact(sock, 4)
            (length,) = struct.unpack("!I", head)
            body = _read_exact(sock, length - 4)
            (code,) = struct.unpack("!I", body[:4])
            if code == _SSL_REQUEST:
                sock.sendall(b"N")  # no TLS; client retries plaintext
                continue
            if code != _PROTO_V3:
                raise ValueError(f"unsupported protocol {code}")
            params = body[4:].split(b"\x00")
            kv = dict(zip(params[::2], params[1::2]))
            db = kv.get(b"database", b"ducklake").decode() or "ducklake"
            if "/" in db or ".." in db:
                raise ValueError(f"bad database name {db!r}")
            # AuthenticationOk, ParameterStatus, ReadyForQuery
            sock.sendall(b"R" + struct.pack("!II", 8, 0))
            for k, v in ((b"server_version", b"16.0 (ducklake-fake)"),
                         (b"client_encoding", b"UTF8")):
                body = k + b"\x00" + v + b"\x00"
                sock.sendall(b"S" + struct.pack("!I", len(body) + 4) + body)
            _send_ready(sock, False)
            return db


def _read_exact(sock: socket.socket, n: int) -> bytes | None:
    buf = b""
    while len(buf) < n:
        try:
            chunk = sock.recv(n - len(buf))
        except OSError:
            return None
        if not chunk:
            return None
        buf += chunk
    return buf


def _send_ready(sock, in_txn: bool):
    sock.sendall(b"Z" + struct.pack("!I", 5) + (b"T" if in_txn else b"I"))


def _send_error(sock, message: str):
    body = (
        b"SERROR\x00"
        + b"CXX000\x00"
        + b"M" + message.encode("utf-8", "replace") + b"\x00"
        + b"\x00"
    )
    sock.sendall(b"E" + struct.pack("!I", len(body) + 4) + body)


def _send_result(sock, desc, rows, tag: str):
    if desc:
        oids = []
        for c in range(len(desc)):
            oid = 25
            for r in rows:
                if r[c] is not None:
                    oid = _oid_for(r[c])
                    break
            oids.append(oid)
        body = struct.pack("!H", len(desc))
        for (name, *_), oid in zip(desc, oids):
            body += name.encode() + b"\x00" + struct.pack(
                "!IHIhih", 0, 0, oid, -1, -1, 0
            )
        sock.sendall(b"T" + struct.pack("!I", len(body) + 4) + body)
        for r in rows:
            body = struct.pack("!H", len(r))
            for v in r:
                ev = _encode(v)
                if ev is None:
                    body += struct.pack("!i", -1)
                else:
                    body += struct.pack("!i", len(ev)) + ev
            sock.sendall(b"D" + struct.pack("!I", len(body) + 4) + body)
        tag = f"SELECT {len(rows)}"
    body = tag.encode() + b"\x00"
    sock.sendall(b"C" + struct.pack("!I", len(body) + 4) + body)
