"""In-memory metadata-query log — the Spark-side analogue of the
reference's ``DuckLakeMetadata`` log type.

The reference wraps every catalog query in
``DuckLakeTransaction::ExecuteRaw`` (ducklake_transaction.cpp:1582-1596)
and emits a structured log record ``{catalog, query, elapsed_ms}``
through DuckDB's log manager (ducklake_log_type.cpp:12-29), surfaced to
SQL via ``duckdb_logs_parsed('DuckLakeMetadata')`` after
``CALL enable_logging('DuckLakeMetadata')``
(test/sql/general/ducklake_metadata_logging.test).

Here the equivalent seam is ``MetadataManager.con`` — every driver-side
catalog statement flows through that connection — so when logging is
enabled the property hands out a timing proxy that appends to this
module's ring buffer.  Python's stdlib ``logging`` gets a mirror record
(logger ``ducklake_spark.metadata``) so cluster operators can ship the
stream to their normal sink; the buffer is what the SQL surface reads.

Like the reference (one log manager per database instance, shared by
all connections) the state is process-global; ``reset()`` runs on each
fresh ``SQLSession`` so replayed test files start clean.
"""

from __future__ import annotations

import logging
import threading
import time
from datetime import datetime, timezone

_LOG = logging.getLogger("ducklake_spark.metadata")

_lock = threading.Lock()
_enabled: set[str] = set()
# (timestamp_utc, catalog, query, elapsed_ms)
_records: list[tuple[datetime, str, str, int]] = []
_MAX_RECORDS = 100_000  # ring-buffer bound: metadata queries are
# driver-side and small, but a long-lived session must not grow without
# limit (the reference's log manager buffers in the duckdb instance)

LOG_TYPE = "DuckLakeMetadata"


def enable(log_type: str | None = None) -> None:
    """``CALL enable_logging('DuckLakeMetadata')``; bare
    ``enable_logging()`` enables everything (DuckDB semantics) — only
    the DuckLakeMetadata stream exists here."""
    with _lock:
        _enabled.add(log_type or LOG_TYPE)


def disable(log_type: str | None = None) -> None:
    with _lock:
        if log_type is None:
            _enabled.clear()
        else:
            _enabled.discard(log_type)


def is_enabled() -> bool:
    return LOG_TYPE in _enabled or bool(_enabled and None in _enabled)


def reset() -> None:
    with _lock:
        _enabled.clear()
        _records.clear()


def log(catalog: str, query: str, elapsed_ms: int) -> None:
    ts = datetime.now(timezone.utc)
    with _lock:
        _records.append((ts, catalog, query, int(elapsed_ms)))
        if len(_records) > _MAX_RECORDS:
            del _records[: _MAX_RECORDS // 10]
    if _LOG.isEnabledFor(logging.DEBUG):
        _LOG.debug("catalog=%s elapsed_ms=%d query=%s",
                   catalog, elapsed_ms, query)


def records() -> list[tuple[datetime, str, str, int]]:
    with _lock:
        return list(_records)


class LoggingCon:
    """Timing proxy over a catalog DB-API connection: ``execute`` /
    ``executemany`` record (catalog, query, elapsed_ms); everything
    else passes through.  Returned cursors are the backend's own."""

    __slots__ = ("_con", "_catalog")

    def __init__(self, con, catalog: str):
        self._con = con
        self._catalog = catalog

    def execute(self, sql, *args, **kw):
        t0 = time.perf_counter()
        try:
            return self._con.execute(sql, *args, **kw)
        finally:
            log(self._catalog, sql,
                int((time.perf_counter() - t0) * 1000))

    def executemany(self, sql, *args, **kw):
        t0 = time.perf_counter()
        try:
            return self._con.executemany(sql, *args, **kw)
        finally:
            log(self._catalog, sql,
                int((time.perf_counter() - t0) * 1000))

    def __getattr__(self, name):
        return getattr(self._con, name)
