#!/usr/bin/env python3
"""Replay the reference's sqllogictest files against the Spark engine.

Parses the DuckDB sqllogictest dialect used by the reference's
test/sql corpus (statement ok/error/maybe, query <types> [sortmode]
[conn/label], loops, foreach, test-env/{NAME} substitution, multiple
named connections) and executes every statement through
ducklake_spark.sqlfront.SQLSession — i.e. through the REAL engine:
the same ATTACH / DDL / DML / CALL / SELECT surface a reference user
drives.

Per-file outcome:
  PASS   every record matched
  FAIL   a query/statement diverged (engine bug candidate!)
  SKIP   the file needs something we deliberately don't do
         (other extensions, concurrentloop, fixtures, …) or hit a
         dialect gap (SQLFrontUnsupported / Spark can't parse the
         SELECT); the reason is recorded for triage.

Usage:
  python tools/slt_runner.py FILE...          # run files, print outcomes
  python tools/slt_runner.py --dir test/sql/delete --report out.json
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import re
import sys
import time
import uuid as uuidlib
from dataclasses import dataclass, field
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

_ALLOWED_REQUIRES = {"ducklake", "parquet", "json", "icu", "tpch",
                     "notwindows", "notmusl", "no_alternative_verify",
                     "skip_reload", "noforcestorage", "vector_size"}


@dataclass
class Record:
    kind: str                 # statement | query | directive
    arg: str = ""             # ok/error/maybe | type string
    sortmode: str = "nosort"
    conn: str = ""
    label: str = ""
    sql: str = ""
    expected: list[str] = field(default_factory=list)
    hash_expect: tuple[int, str] | None = None
    lineno: int = 0
    cond: str | None = None   # skipif/onlyif expression


class Skip(Exception):
    pass


class Fail(Exception):
    pass


def _split_records(lines: list[str]) -> list[list[tuple[int, str]]]:
    blocks: list[list[tuple[int, str]]] = []
    cur: list[tuple[int, str]] = []
    for i, raw in enumerate(lines):
        line = raw.rstrip("\n")
        if line.strip() == "" and cur:
            blocks.append(cur)
            cur = []
            continue
        if line.strip() == "":
            continue
        if line.lstrip().startswith("#"):
            continue
        cur.append((i + 1, line))
    if cur:
        blocks.append(cur)
    return blocks


def parse_file(path: str) -> list[Record]:
    lines = open(path, encoding="utf8").read().splitlines()
    records: list[Record] = []
    pending_cond: str | None = None
    for block in _split_records(lines):
        lineno, first = block[0][0], block[0][1].strip()
        toks = first.split()
        head = toks[0]
        if head in ("skipif", "onlyif"):
            # condition attaches to the NEXT block line within the same
            # record block (duckdb puts it on the line above)
            pending_cond = first
            block = block[1:]
            if not block:
                continue
            lineno, first = block[0][0], block[0][1].strip()
            toks = first.split()
            head = toks[0]
        if head == "statement":
            r = Record("statement", arg=toks[1], lineno=lineno,
                       cond=pending_cond)
            pending_cond = None
            for t in toks[2:]:
                if re.fullmatch(r"con\w*", t):
                    r.conn = t
                else:
                    r.label = t
            body = [b[1] for b in block[1:]]
            if "----" in body:
                cut = body.index("----")
                r.sql = "\n".join(body[:cut])
                r.expected = body[cut + 1:]
            else:
                r.sql = "\n".join(body)
            records.append(r)
        elif head == "query":
            r = Record("query", arg=toks[1] if len(toks) > 1 else "",
                       lineno=lineno, cond=pending_cond)
            pending_cond = None
            for t in toks[2:]:
                if t in ("rowsort", "valuesort", "nosort"):
                    r.sortmode = t
                elif re.fullmatch(r"con\w*", t):
                    r.conn = t
                else:
                    r.label = t
            body = [b[1] for b in block[1:]]
            if "----" in body:
                cut = body.index("----")
                r.sql = "\n".join(body[:cut])
                exp = body[cut + 1:]
            else:
                r.sql = "\n".join(body)
                exp = []
            if len(exp) == 1:
                m = re.fullmatch(r"(\d+) values hashing to ([0-9a-f]+)",
                                 exp[0].strip())
                if m:
                    r.hash_expect = (int(m.group(1)), m.group(2))
                    exp = []
            r.expected = exp
            records.append(r)
        else:
            r = Record("directive", lineno=lineno, cond=pending_cond)
            pending_cond = None
            r.sql = "\n".join(b[1] for b in block)
            records.append(r)
    return records


# ---------------------------------------------------------------------------
# rendering Spark values the way duckdb's sqllogictest renders them


def _variant_display(txt: str) -> str:
    """duckdb's VARIANT rendering from the engine's JSON-text storage
    (shared with the SQL frontend's VARIANT::VARCHAR cast)."""
    from ducklake_spark.extra_stats import variant_display_text

    return variant_display_text(txt)


def render(v, tz: bool = False, geo: bool | None = None,
           var: bool = False, timecol: str | None = None) -> str:
    import datetime
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if timecol and isinstance(v, int):
        # TIME surfaces Spark-side as BIGINT microseconds; duckdb's
        # sqllogictest shows clock text (add_files_type_check_timestamp)
        from ducklake_spark.lake import _us_to_time_text

        return _us_to_time_text(v) + ("+00" if timecol == "timetz"
                                      else "")
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        if v == int(v) and abs(v) < 1e15:
            return f"{int(v)}.0"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        s = v.strftime("%Y-%m-%d %H:%M:%S")
        if v.microsecond:
            s += f".{v.microsecond:06d}".rstrip("0")
        # duckdb renders TIMESTAMPTZ (Spark TimestampType) with the
        # UTC offset suffix; plain TIMESTAMP (TimestampNTZ) without
        return s + "+00" if tz else s
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, datetime.timedelta):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        # GEOMETRY columns are stored as ISO WKB binary — duckdb's
        # sqllogictest shows them as WKT (test/sql/geo/*). Tri-state:
        # the engine stamps dl_type field metadata on scan output, so
        # geo=True decodes, geo=False (a known BLOB column — bytes that
        # coincidentally parse as WKB keep the raw rendering) never
        # decodes, and geo=None (metadata lost through an expression)
        # falls back to parse-sniffing.
        if geo or geo is None:
            try:
                from ducklake_spark.extra_stats import wkb_to_wkt

                return wkb_to_wkt(bytes(v))
            except Exception:
                pass
        return v.decode("utf8", "backslashreplace")
    if isinstance(v, str):
        if var:
            v = _variant_display(v)
        if v == "":
            return "(empty)"
        # duckdb's sqllogictest escapes embedded NUL bytes
        return v.replace("\x00", "\\0")
    if isinstance(v, list):
        return "[" + ", ".join(_inner(x, geo=geo) for x in v) + "]"
    if isinstance(v, dict):
        # Spark MapType -> duckdb's MAP rendering: {key=value, ...}
        return ("{" + ", ".join(f"{k}={_inner(x, geo=geo)}"
                                for k, x in v.items()) + "}")
    try:  # Row -> dict
        d = v.asDict(recursive=False)
        return ("{" + ", ".join(f"'{k}': {_inner(x, geo=geo)}"
                                for k, x in d.items()) + "}")
    except AttributeError:
        return str(v)


def _inner(v, geo: bool | None = None) -> str:
    if isinstance(v, str):
        # duckdb quotes VARCHAR values inside nested renderings when
        # they need it ({'b': hello} but {'a': 'POINT (1 2)'})
        if v and re.fullmatch(r"[A-Za-z0-9_\-\.+/]+", v):
            return v
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, (bytes, bytearray)):
        # nested GEOMETRY: WKT, quoted like any special-char string
        if geo or geo is None:
            try:
                from ducklake_spark.extra_stats import wkb_to_wkt

                return "'" + wkb_to_wkt(bytes(v)) + "'"
            except Exception:
                pass
        return v.decode("utf8", "backslashreplace")
    return render(v, geo=geo)


def _cells_match(actual: str, expected: str, typ: str) -> bool:
    expected = expected.strip()
    if expected.startswith("<REGEX>:"):
        # DOTALL: the corpus matches multiline EXPLAIN output with .*
        return re.fullmatch(expected[len("<REGEX>:"):].strip(),
                            actual, re.S) is not None
    if expected.startswith("<!REGEX>:"):
        return re.fullmatch(expected[len("<!REGEX>:"):].strip(),
                            actual, re.S) is None
    if actual == expected:
        return True
    # the corpus mixes 'true'/'True' boolean renderings, and under
    # `query I` some files expect 1/0 for a boolean expression
    # (metadata/ducklake_settings.test:30)
    if actual in ("true", "false"):
        if expected.lower() == actual:
            return True
        if typ == "I" and expected == ("1" if actual == "true" else "0"):
            return True
    if expected == "NULL" or actual == "NULL":
        return actual == expected
    if typ == "I":
        try:
            return int(float(actual)) == int(float(expected))
        except ValueError:
            pass  # duckdb's type chars are advisory — a MAP column
            # under `query II` still compares as text
    if typ == "R":
        try:
            a, e = float(actual), float(expected)
            return math.isclose(a, e, rel_tol=1e-6, abs_tol=1e-9)
        except ValueError:
            pass
    # T: also tolerate numeric-formatting differences and quote style
    na = actual.replace("'", "").replace('"', "")
    ne = expected.replace("'", "").replace('"', "")
    if na == ne:
        return True
    # nested renderings: duckdb prints '[a, b]' where a JSON-text
    # VARIANT stores '["a","b"]' — quote- and space-insensitive
    # compare, but only for bracketed (nested) values
    if ("[" in na or "{" in na) and ("[" in ne or "{" in ne):
        if na.replace(" ", "") == ne.replace(" ", ""):
            return True
    try:
        return float(actual) == float(expected)
    except ValueError:
        return False


# ---------------------------------------------------------------------------


class FileRunner:
    def __init__(self, path: str, tmp_root: str, *, verbose: bool = False,
                 budget_s: float = 240.0, spark=None):
        self.path = path
        self.verbose = verbose
        self.budget_s = budget_s
        self.tmpdir = os.path.join(
            tmp_root, re.sub(r"\W+", "_", os.path.relpath(path, "/")))
        os.makedirs(self.tmpdir, exist_ok=True)
        self.env: dict[str, str] = {
            # duckdb's sqllogictest built-in: the test file's stem
            "BASE_TEST_NAME": os.path.splitext(os.path.basename(path))[0],
        }
        self.spark = spark
        self.sessions: dict = {}
        self.attach_replay: list[str] = []
        self.unchecked_errors = 0
        self.label_results: dict[str, list[str]] = {}
        self.loop_vars: dict[str, str] = {}

    # -- session plumbing

    def _session(self, conn: str):
        from ducklake_spark.sqlfront import SQLSession

        if conn not in self.sessions:
            # single_file_writes: the reference is single-node — its
            # tests assert file counts that parallel writes would break
            # default_backend duckdb: the reference's plain-path
            # ATTACH creates a DuckDB catalog database —
            # ducklake_settings() reports catalog_type 'duckdb'
            # (metadata/ducklake_settings.test)
            s = SQLSession(self.spark, single_file_writes=True,
                           default_backend=os.environ.get(
                               "SLT_BACKEND", "duckdb"))
            # replay the default connection's ATTACHes: DuckDB
            # connections share one database instance, so a named
            # connection sees the same attached lakes
            for stmt in self.attach_replay:
                try:
                    s.execute(stmt)
                except Exception:
                    pass
            self.sessions[conn] = s
        return self.sessions[conn]

    def _subst(self, text: str) -> str:
        def repl(m: re.Match) -> str:
            key = m.group(1)
            if key == "TEST_DIR":
                # minio-family tests run under the reference's minio CI
                # config, where the whole TEST_DIR lives on the object
                # store — mirror that when the local S3 mock is up
                if ("minio" in os.path.basename(self.path)
                        and os.environ.get(
                            "S3_TEST_SERVER_AVAILABLE") == "1"):
                    return ("s3://test-bucket/"
                            + os.path.basename(self.tmpdir))
                return self.tmpdir
            if key == "UUID":
                return str(uuidlib.uuid4())
            if key in self.env:
                return self.env[key]
            if key in self.loop_vars:  # UPPERCASE foreach vars
                return self.loop_vars[key]
            raise Skip(f"unknown substitution {{{key}}}")

        text = re.sub(r"\{([A-Z][A-Z0-9_]*)\}", repl, text)
        for k, v in self.loop_vars.items():
            text = text.replace("${" + k + "}", v)
            # duckdb's sqllogictest also substitutes bare {var}
            text = text.replace("{" + k + "}", v)
        # fixture paths are relative to the reference checkout (the
        # duckdb test runner's cwd): 'data/parquet/x.parquet' etc.
        if "'data/" in text and "/test/sql/" in self.path:
            ref_root = self.path.split("/test/sql/")[0]
            text = text.replace("'data/", f"'{ref_root}/data/")
        return text

    def _cond_true(self, cond: str | None) -> bool:
        if not cond:
            return True
        kind, expr = cond.split(None, 1)
        expr = expr.strip()
        m = re.fullmatch(r"(\w+)\s*(=|==|<|>|<=|>=|<>|!=)\s*(-?\w+)", expr)
        val = None
        if m and m.group(1) in self.loop_vars:
            a = self.loop_vars[m.group(1)]
            b = m.group(3)
            op = m.group(2)
            try:
                a, b = float(a), float(b)
            except ValueError:
                pass
            val = {"=": a == b, "==": a == b, "<": a < b, ">": a > b,
                   "<=": a <= b, ">=": a >= b,
                   "<>": a != b, "!=": a != b}[op]
        elif expr in ("duckdb",):
            val = True
        else:
            val = False
        return val if kind == "onlyif" else (not val)

    # -- record execution

    def run(self) -> tuple[str, str]:
        try:
            records = parse_file(self.path)
        except Exception as e:
            return ("SKIP", f"parse: {e}")
        try:
            self._run_block(records, 0, len(records))
        except Skip as e:
            return ("SKIP", str(e))
        except Fail as e:
            return ("FAIL", str(e))
        except Exception as e:
            return ("SKIP", f"runner-error: {type(e).__name__}: {e}")
        finally:
            self._cleanup()
        return ("PASS", f"unchecked_errors={self.unchecked_errors}")

    def _cleanup(self):
        for s in self.sessions.values():
            for name in list(s.lakes):
                try:
                    s.lakes.pop(name).meta.close()
                except Exception:
                    pass
        if self.spark is not None:
            try:
                for t in self.spark.catalog.listTables():
                    if t.isTemporary:
                        self.spark.catalog.dropTempView(t.name)
            except Exception:
                pass

    def _run_block(self, records: list[Record], start: int, end: int):
        self.t0 = getattr(self, "t0", time.monotonic())
        i = start
        while i < end:
            if time.monotonic() - self.t0 > self.budget_s:
                raise Skip(f"budget: exceeded {self.budget_s}s")
            r = records[i]
            if r.kind == "directive":
                i = self._directive(records, i, end)
                continue
            if not self._cond_true(r.cond):
                i += 1
                continue
            if r.kind == "statement":
                self._statement(r)
            else:
                self._query(r)
            i += 1

    def _find_matching_end(self, records: list[Record], i: int,
                           end: int) -> int:
        depth = 1
        j = i + 1
        while j < end:
            if records[j].kind == "directive":
                head = records[j].sql.split()[0] if records[j].sql else ""
                if head in ("loop", "foreach", "concurrentloop"):
                    depth += 1
                elif head == "endloop":
                    depth -= 1
                    if depth == 0:
                        return j
            j += 1
        raise Skip("unterminated loop")

    def _directive(self, records: list[Record], i: int, end: int) -> int:
        r = records[i]
        toks = r.sql.split()
        head = toks[0]
        if head == "require":
            what = toks[1] if len(toks) > 1 else ""
            if what == "httpfs":
                # satisfied when a local S3 mock is serving (main()
                # boots moto_server on :9000 when available)
                if os.environ.get("S3_TEST_SERVER_AVAILABLE") == "1":
                    return i + 1
                raise Skip("require httpfs")
            if what == "sqlite_scanner":
                # the engine speaks sqlite natively (ducklake:sqlite:
                # URLs) — the host-duckdb extension is irrelevant here
                return i + 1
            if what == "postgres_scanner":
                # satisfied when the DuckDB-backed PG wire server is up
                # (main() boots tests/pg_tcp_server on :5432); the
                # reference PG CI also redirects the catalog to
                # postgres — mirror that for DUCKLAKE_CONNECTION
                if os.environ.get("PG_TEST_SERVER_AVAILABLE") == "1":
                    self._pg_required = True
                    return i + 1
                raise Skip("require postgres_scanner")
            if what not in _ALLOWED_REQUIRES:
                raise Skip(f"require {what}")
            if what == "vector_size":
                raise Skip("require vector_size")
            return i + 1
        if head == "require-env":
            name = toks[1]
            if name not in self.env and name not in os.environ:
                raise Skip(f"require-env {name}")
            return i + 1
        if head == "test-env":
            name = toks[1]
            val = r.sql.split(None, 2)[2] if len(toks) > 2 else ""
            val = self._subst(val)
            if (name == "DUCKLAKE_CONNECTION"
                    and getattr(self, "_pg_required", False)
                    and not val.startswith(("postgres:",
                                            "postgresql:"))):
                # PG CI config: the catalog lives in postgres
                # (data_inlining/postgres_identifier_limit.test)
                val = ("postgres:dbname=slt_"
                       + re.sub(r"\W+", "_",
                                os.path.basename(self.tmpdir))[:40])
            self.env[name] = val
            return i + 1
        if head == "mode":
            if len(toks) > 1 and toks[1] == "skip":
                j = i + 1
                while j < end:
                    if (records[j].kind == "directive"
                            and records[j].sql.split()[:2] == ["mode",
                                                               "unskip"]):
                        return j + 1
                    j += 1
                return end
            return i + 1
        if head in ("loop", "foreach"):
            var = toks[1]
            stop = self._find_matching_end(records, i, end)
            if head == "loop":
                lo, hi = int(self._subst(toks[2])), int(self._subst(toks[3]))
                values = [str(x) for x in range(lo, hi)]
            else:
                values = [self._subst(t) for t in toks[2:]]
            outer = self.loop_vars.get(var)
            for v in values:
                self.loop_vars[var] = v
                self._run_block(records, i + 1, stop)
            if outer is None:
                self.loop_vars.pop(var, None)
            else:
                self.loop_vars[var] = outer
            return stop + 1
        if head == "concurrentloop":
            # duckdb sqllogictest: N threads, each running the loop
            # body on its OWN connection with the loop var bound to its
            # thread index (test/sql/concurrent/*). Each thread gets a
            # fresh session (attach-replayed), so writers race through
            # the shared catalog like real concurrent clients.
            import copy as _copy
            import threading as _th

            var = toks[1]
            lo = int(self._subst(toks[2]))
            hi = int(self._subst(toks[3]))
            stop = self._find_matching_end(records, i, end)
            errors: list[BaseException] = []
            uncheck = [0] * (hi - lo)

            def _worker(tid: int, slot: int) -> None:
                sub = _copy.copy(self)
                sub.sessions = {}
                sub.loop_vars = dict(self.loop_vars)
                sub.loop_vars[var] = str(tid)
                sub.label_results = {}
                sub.unchecked_errors = 0
                try:
                    sub._run_block(records, i + 1, stop)
                except BaseException as e:  # noqa: BLE001
                    errors.append(e)
                finally:
                    uncheck[slot] = sub.unchecked_errors

            threads = [_th.Thread(target=_worker, args=(t, s))
                       for s, t in enumerate(range(lo, hi))]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            self.unchecked_errors += sum(uncheck)
            if errors:
                raise errors[0]
            return stop + 1
        if head == "restart":
            for s in self.sessions.values():
                s.restart()
            return i + 1
        if head == "sleep":
            n = float(toks[1])
            unit = toks[2] if len(toks) > 2 else "sec"
            mult = {"sec": 1, "second": 1, "seconds": 1,
                    "ms": 0.001, "msec": 0.001,
                    "min": 60, "minute": 60, "minutes": 60}.get(unit, 1)
            time.sleep(min(n * mult, 2.0))
            return i + 1
        if head in ("set",):
            return i + 1  # host-engine knobs (threads, autoload, …)
        if head == "unzip":
            # `unzip data/old_ducklake/v01.db.gz {TEST_DIR}/v01.db` —
            # reference fixtures are gzip files relative to the repo
            # root (migration/*.test)
            import gzip as _gz
            import shutil as _sh

            src = toks[1]
            if not os.path.isabs(src):
                for base in (os.environ.get("SLT_REF",
                                            "/root/reference"),):
                    cand = os.path.join(base, src)
                    if os.path.exists(cand):
                        src = cand
                        break
            dst = self._subst(toks[2]) if len(toks) > 2 else \
                os.path.join(self.tmpdir, os.path.basename(src)[:-3])
            if not os.path.exists(src):
                raise Skip(f"unzip fixture missing: {toks[1]}")
            os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
            with _gz.open(src, "rb") as fin, open(dst, "wb") as fout:
                _sh.copyfileobj(fin, fout)
            return i + 1
        if head in ("load", "reconnect", "halt"):
            raise Skip(head)
        raise Skip(f"directive {head}")

    def _statement(self, r: Record):
        from ducklake_spark.sqlfront import SQLFrontUnsupported

        sql = self._subst(r.sql)
        if re.match(r"\s*ATTACH\b", sql, re.I):
            # the reference runner resolves relative DATA_PATHs against
            # its repo checkout (delete_ignore_extra_columns.test:
            # DATA_PATH 'data/iceberg_deletes/...') — ours runs from a
            # different CWD, so anchor them explicitly
            ref = os.environ.get("SLT_REF", "/root/reference")

            def _abs_dp(m: "re.Match[str]") -> str:
                rel = m.group(2)
                if rel.startswith(("/", "s3://", "file://")):
                    return m.group(0)
                cand = os.path.join(ref, rel)
                if os.path.exists(cand):
                    return f"{m.group(1)}'{cand}'"
                return m.group(0)

            sql = re.sub(r"(DATA_PATH\s+)'([^']+)'", _abs_dp, sql,
                         flags=re.I)
        sess = self._session(r.conn)
        try:
            df = sess.execute(sql)
            if df is not None and r.arg in ("ok", "maybe"):
                df.collect()
            err = None
        except SQLFrontUnsupported as e:
            if r.arg == "error":
                self.unchecked_errors += 1
                return
            raise Skip(f"unsupported: {e} [line {r.lineno}]")
        except Exception as e:
            err = e
        if err is not None and r.arg == "ok" \
                and "database file with version number" in str(err):
            # fixture written by a NEWER duckdb storage format than the
            # installed library can read (migration.test v04.db needs
            # duckdb >= 1.1) — environment gate, not a divergence
            raise Skip(f"fixture needs newer duckdb storage "
                       f"[line {r.lineno}]")
        if r.arg == "ok":
            if err is not None:
                if self._looks_dialect(err):
                    raise Skip(
                        f"spark-dialect: {self._short(err)} "
                        f"[line {r.lineno}]")
                raise Fail(f"statement ok failed [line {r.lineno}]: "
                           f"{self._short(err)}\nSQL: {sql}")
            if re.match(r"\s*ATTACH\b", sql, re.I):
                # DuckDB connections share one database instance: an
                # ATTACH issued on ANY named connection is visible to
                # the others (concurrent_catalog_id_false_conflict.test
                # attaches on con1 and reads on con2)
                self.attach_replay.append(sql)
                for cname, sess in self.sessions.items():
                    if cname != (r.conn or ""):
                        try:
                            sess.execute(sql)
                        except Exception:
                            pass
        elif r.arg == "error":
            if err is None:
                raise Fail(f"statement error SUCCEEDED [line {r.lineno}]"
                           f"\nSQL: {sql}")
            exp = "\n".join(r.expected).strip()
            if exp and exp.lower() not in str(err).lower():
                self.unchecked_errors += 1  # wording differs; error raised
        # maybe: either is fine

    @staticmethod
    def _short(e: Exception) -> str:
        return f"{type(e).__name__}: {str(e).splitlines()[0][:300]}"

    @staticmethod
    def _looks_dialect(e: Exception) -> bool:
        """Spark couldn't parse/resolve DuckDB-only SELECT syntax — a
        dialect gap, not an engine divergence."""
        name = type(e).__name__
        msg = str(e)
        if "ParseException" in name:
            return True
        if "AnalysisException" in name and (
                "UNRESOLVED_ROUTINE" in msg
                or "cannot resolve" in msg.lower()
                or "UNRESOLVED_COLUMN" in msg
                or "DATATYPE_MISMATCH" in msg
                or "INVALID_FORMAT" in msg
                # mixed-type VALUES into a VARIANT column: Spark's
                # inline-table typing can't express it
                or "INVALID_INLINE_TABLE" in msg):
            return True
        if "duckdb_memory" in msg:
            # host-engine memory introspection (issue_852_cache_growth
            # asserts on duckdb's ObjectCache byte counts) — there is no
            # Spark-side equivalent to report honestly
            return True
        return False

    def _query(self, r: Record):
        from ducklake_spark.sqlfront import SQLFrontUnsupported

        sql = self._subst(r.sql)
        sess = self._session(r.conn)
        try:
            df = sess.execute(sql)
            # a DDL statement written as a `query` record (some tests
            # do `query I CREATE VIEW ...`) produces no relation
            rows = df.collect() if df is not None else []
        except SQLFrontUnsupported as e:
            raise Skip(f"unsupported: {e} [line {r.lineno}]")
        except Exception as e:
            if self._looks_dialect(e):
                raise Skip(f"spark-dialect: {self._short(e)} "
                           f"[line {r.lineno}]")
            raise Fail(f"query raised [line {r.lineno}]: "
                       f"{self._short(e)}\nSQL: {sql}")
        types = r.arg
        ncols = len(types)
        if rows and len(rows[0]) != ncols:
            if r.label and not r.expected:
                # duckdb's runner compares label-only queries by
                # result hash and does not validate the declared
                # column count (data_inlining_types.test: `query I
                # nosort extra_types` over a 10-column table)
                ncols = len(rows[0])
            else:
                raise Fail(f"query [line {r.lineno}]: returned "
                           f"{len(rows[0])} columns, expected {ncols}"
                           f"\nSQL: {sql}")
        tzcols, geocols = [], []
        if df is not None:
            from pyspark.sql import types as _T

            tzcols = [isinstance(f.dataType, _T.TimestampType)
                      for f in df.schema.fields]
            varcols = []
            timecols = []
            for f in df.schema.fields:
                dlt = str((f.metadata or {}).get("dl_type", "")).lower()
                geocols.append("geometry" in dlt if dlt else None)
                varcols.append(dlt.split("(")[0].strip() == "variant")
                timecols.append(
                    dlt if dlt in ("time", "timetz") else None)
        else:
            varcols = []
            timecols = []
        table = [[render(v, tz=(i < len(tzcols) and tzcols[i]),
                         geo=(geocols[i] if i < len(geocols) else None),
                         var=(i < len(varcols) and varcols[i]),
                         timecol=(timecols[i]
                                  if i < len(timecols) else None))
                  for i, v in enumerate(row)] for row in rows]
        # duckdb's nosort relies on its insertion-order scans; Spark
        # orders scan splits by size, so without an ORDER BY we compare
        # rows order-insensitively (and sort the expected rows the same
        # way below)
        implicit_rowsort = (r.sortmode == "nosort"
                            and not re.search(r"\bORDER\s+BY\b", sql, re.I)
                            and r.hash_expect is None)
        if r.sortmode == "rowsort" or implicit_rowsort:
            table.sort()
        values = [c for row in table for c in row]
        if r.sortmode == "valuesort":
            values.sort()
        if r.hash_expect is not None:
            n, digest = r.hash_expect
            if len(values) != n:
                raise Fail(f"query [line {r.lineno}]: {len(values)} values,"
                           f" expected {n}\nSQL: {sql}")
            md5 = hashlib.md5(
                ("".join(v + "\n" for v in values)).encode()).hexdigest()
            if md5 != digest:
                raise Fail(f"query [line {r.lineno}]: hash mismatch"
                           f"\nSQL: {sql}")
            return
        # expected text -> cells
        exp_lines = [self._subst(x) for x in r.expected]
        if ncols > 1 and exp_lines and all("\t" not in x for x in exp_lines):
            if len(exp_lines) % ncols == 0 and (
                    len(exp_lines) == len(values)):
                exp_cells = [x.strip() for x in exp_lines]
            else:
                exp_cells = [c for x in exp_lines for c in x.split("\t")]
        else:
            exp_cells = [c for x in exp_lines
                         for c in (x.split("\t") if x else [""])]
        if r.sortmode == "valuesort":
            exp_cells = sorted(exp_cells)
        elif r.sortmode == "rowsort" or implicit_rowsort:
            if ncols and len(exp_cells) % ncols == 0:
                erows = [exp_cells[i:i + ncols]
                         for i in range(0, len(exp_cells), ncols)]
                # sort expected rows by the same key the actual rows
                # used (their rendered text), then re-flatten
                erows.sort()
                exp_cells = [c for row in erows for c in row]
        if r.label:
            # labeled queries compare equal to other queries with the
            # same label when no inline result is given
            if not exp_lines and r.label in self.label_results:
                if values != self.label_results[r.label]:
                    raise Fail(f"label {r.label} mismatch "
                               f"[line {r.lineno}]\nSQL: {sql}")
                return
            self.label_results.setdefault(r.label, values)
            if not exp_lines:
                return
        if len(exp_cells) != len(values):
            raise Fail(
                f"query [line {r.lineno}]: {len(values)} values, expected "
                f"{len(exp_cells)}\nSQL: {sql}\n"
                f"actual: {values[:8]}...\nexpected: {exp_cells[:8]}...")
        for k, (a, e) in enumerate(zip(values, exp_cells)):
            t = types[k % ncols] if ncols else "T"
            if not _cells_match(a, e, t):
                raise Fail(
                    f"query [line {r.lineno}] value {k}: "
                    f"actual={a!r} expected={e!r}\nSQL: {sql}")


def _ensure_s3_mock() -> None:
    """Serve an S3 API on 127.0.0.1:9000 (the reference's minio
    address) via moto so `require httpfs` tests run. No-op if a
    server is already listening or moto is unavailable."""
    import socket
    import subprocess

    def _up() -> bool:
        try:
            with socket.create_connection(("127.0.0.1", 9000),
                                          timeout=0.5):
                return True
        except OSError:
            return False

    def _export_env() -> None:
        # the reference minio test config installs a default S3 secret
        # (admin/password @ 127.0.0.1:9000) — mirror it into the AWS
        # env so credential-less tests (delete_metadata.test) resolve
        os.environ["S3_TEST_SERVER_AVAILABLE"] = "1"
        os.environ.setdefault("AWS_ENDPOINT_URL",
                              "http://127.0.0.1:9000")
        os.environ.setdefault("AWS_ACCESS_KEY_ID", "admin")
        os.environ.setdefault("AWS_SECRET_ACCESS_KEY", "password")
        os.environ.setdefault("AWS_DEFAULT_REGION", "us-east-1")

    if _up():
        _export_env()
        return
    try:
        subprocess.Popen(
            ["moto_server", "-p", "9000", "-H", "127.0.0.1"],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            start_new_session=True)
    except Exception:
        return
    for _ in range(40):
        if _up():
            _export_env()
            return
        time.sleep(0.25)


def _ensure_pg_mock() -> None:
    """Serve a PostgreSQL wire API on 127.0.0.1:5432 via the repo's
    DuckDB-backed wire server so `require postgres_scanner` tests run
    (the reference PG CI uses a real postgres; the wire server speaks
    the same protocol the engine's pg_client targets)."""
    import socket
    import tempfile

    try:
        with socket.create_connection(("127.0.0.1", 5432), timeout=0.5):
            os.environ["PG_TEST_SERVER_AVAILABLE"] = "1"
            os.environ.setdefault("PGPORT", "5432")
            return
    except OSError:
        pass
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                        "..", "tests"))
        from pg_tcp_server import DuckPgServer

        srv = DuckPgServer(tempfile.mkdtemp(prefix="slt_pg_"),
                          port=5432)
        globals()["_PG_SERVER"] = srv  # keep alive for the run
        os.environ["PG_TEST_SERVER_AVAILABLE"] = "1"
        os.environ.setdefault("PGPORT", str(srv.port))
    except Exception:
        pass


def main(argv: list[str]) -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="*")
    ap.add_argument("--dir")
    ap.add_argument("--report")
    ap.add_argument("--budget", type=float, default=240.0)
    ap.add_argument("--ref", default="/root/reference")
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args(argv)

    files = list(args.files)
    if args.dir:
        root = args.dir if os.path.isabs(args.dir) else os.path.join(
            args.ref, args.dir)
        files += sorted(
            str(p) for p in Path(root).rglob("*.test"))
    if not files:
        ap.error("no files")

    from ducklake_spark.session import get_spark

    # DUCKLAKE_CI gates a handful of reference tests (metadata logging,
    # orphan_after_expire); we run them — the postgres-backed ones still
    # skip on their `require postgres_scanner`
    os.environ.setdefault("DUCKLAKE_CI", "1")
    _ensure_s3_mock()
    _ensure_pg_mock()
    spark = get_spark("slt", cpus=int(os.environ.get("SLT_CPUS", "8")))
    import tempfile

    tmp_root = tempfile.mkdtemp(prefix="slt_")
    report = {}
    counts = {"PASS": 0, "FAIL": 0, "SKIP": 0}
    for f in files:
        t0 = time.monotonic()
        status, detail = FileRunner(
            f, tmp_root, verbose=args.verbose, budget_s=args.budget,
            spark=spark).run()
        dt = time.monotonic() - t0
        counts[status] += 1
        rel = os.path.relpath(f, args.ref)
        report[rel] = {"status": status, "detail": detail,
                       "seconds": round(dt, 1)}
        print(f"{status:4s} {rel} ({dt:.1f}s) {detail[:160]}")
    print(json.dumps(counts))
    if args.report:
        with open(args.report, "w") as fh:
            json.dump(report, fh, indent=1)
    return 1 if counts["FAIL"] else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
