"""The ``DuckLake`` session object: lakehouse operations on Spark.

Architecture (SURVEY §7): Spark SQL/Catalyst is the relational
engine; this layer implements the reference's *lakehouse* semantics —
SQL-catalog metadata, snapshots/time travel, transactional commits,
scan planning with file pruning, DML, maintenance. All planning is
driver-side SQL against the catalog DB; all data movement is
declarative DataFrame work that Catalyst optimizes.

Scale notes (how this behaves at 100 TB / 1000 executors):
- scans pass Spark an explicit pruned file list; Parquet predicate
  pushdown + column pruning still apply per file (the pruning here is
  *file-level* zone-map pruning the way the reference does it —
  ducklake_metadata_manager.cpp:1774-1930).
- delete application is an anti-join on (file, position); the delete
  side is broadcast when small (the common case) so the scan needs no
  shuffle.
- commits write O(#files) metadata rows from the driver — no
  executor involvement, identical to the reference's commit shape.
"""

from __future__ import annotations

import itertools
import json
import os
import re
import struct
import urllib.parse
import uuid
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ducklake_spark.catalog.metadata import FORMAT_VERSION, MetadataManager, Snapshot
from ducklake_spark.catalog.types import (
    check_supported,
    ducklake_to_spark,
    is_widening,
    spark_to_ducklake,
)
from ducklake_spark.transaction import (
    ColumnDef,
    ColumnStatsRow,
    DataFileInfo,
    DeleteFileInfo,
    TableDef,
    Transaction,
)

# sql() temp-view registration cache: SparkSession id -> (lake id, key)
# of the lake whose views are currently registered (views are global to
# the session, so ownership must be session-scoped)
_SQL_VIEW_OWNER: dict[int, tuple | None] = {}

ROWID_COL = "_ducklake_internal_row_id"
SNAPID_COL = "_ducklake_internal_snapshot_id"
# uncommitted rows expose rowids from this base until commit reassigns
# real ids (reference: test/sql/rowid/ducklake_row_id.test)
TXN_LOCAL_ROWID_BASE = 10**18

# Spark URI-encodes _metadata.file_path (space -> %20); catalog paths
# are stored raw, so every join between the two decodes the Spark side.
# Literal '+' is protected first (url_decode is form-decoding).
DECODED_FILE_PATH = "url_decode(replace(_metadata.file_path, '+', '%2B'))"
# Iceberg positional-delete field ids (reference: ducklake_delete.cpp:36-158)
DELETE_FILE_PATH_FIELD_ID = 2147483546
DELETE_POS_FIELD_ID = 2147483545


def _local_df(spark, rows, schema):
    """Small driver-built DataFrame without the default-parallelism
    Python-RDD fan-out: ``createDataFrame(list)`` parallelizes into
    ``defaultParallelism`` slices, so materializing a handful of
    metadata rows (file maps, inlined positions) costs a 32-task wave
    every time it is broadcast or unioned. One slice carries up to 50k
    rows; bigger row sets scale slices with size."""
    rows = list(rows)
    if not rows:
        return spark.createDataFrame([], schema)
    if isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string

        schema = _parse_datatype_string(schema)
    n = min(1 + len(rows) // 50_000, 64)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, n), schema)


@dataclass
class TableHandle:
    table_id: int
    table_uuid: str
    schema_id: int
    schema_name: str
    table_name: str
    path: str  # relative to data_path
    columns: list[tuple[int, str, str, bool]]  # (column_id, name, type, nulls_allowed)


class DuckLakeError(Exception):
    pass


def _lit_as_string(expr: str) -> str:
    """Bare numeric literal -> quoted string so try_cast can widen it
    (a 39-digit UHUGEINT default parsed as a decimal literal would
    fail analysis before the cast even runs)."""
    s = expr.strip()
    if re.fullmatch(r"-?\d+(\.\d+)?", s):
        return "'" + s + "'"
    return expr


def _default_kind(default: str | None) -> str:
    """Reference catalog labels every column's default slot: 'literal'
    (including absent defaults) or 'expression'
    (test/sql/default/default_expressions.test)."""
    if (default is None or default.strip().lower() == "null"
            or _literal_text(default) is not None):
        return "literal"
    return "expression"


def _default_storage_text(default: str | None) -> str | None:
    """Catalog text for a default: literals store their RENDERED value
    (the reference writes Value::ToString into the metadata INSERT, so
    DEFAULT 'x' stores x), expressions store their SQL. The rendered
    text NULL collapses to catalog NULL — the reference's unquoted
    interpolation quirk that test/sql/default/default_values.test pins
    (VARCHAR DEFAULT 'NULL' reads back as SQL NULL)."""
    if default is None or default.strip().lower() == "null":
        return None
    lit = _literal_text(default)
    if lit is None:
        return default
    return None if lit == "NULL" else lit


def _default_expr_text(value: str | None, kind: str | None) -> str | None:
    """Stored default -> Spark SQL text: expressions verbatim, literal
    values re-quoted unless numeric/boolean (reference rebinding,
    ducklake_catalog.cpp:396-408)."""
    if value is None:
        return None
    if kind != "literal":
        # 'expression' verbatim; NULL kind = legacy rows written before
        # the type column existed — those stored expr-ready SQL text
        return value
    s = str(value)
    if re.fullmatch(r"-?\d+(\.\d+)?", s) or s.lower() in ("true", "false"):
        return s
    return "'" + s.replace("'", "''") + "'"


def _literal_text(default: str | None) -> str | None:
    """Stats text of a LITERAL default expression (non-literal defaults
    contribute no stats). '42' -> '42', "'x'" -> 'x', else None."""
    if default is None:
        return None
    s = default.strip()
    if re.fullmatch(r"-?\d+(\.\d+)?", s):
        return s
    if len(s) >= 2 and s[0] == "'" and s[-1] == "'" and "'" not in s[1:-1]:
        return s[1:-1]
    if s.lower() in ("true", "false"):
        return s.lower()
    return None


def _type_at_struct_path(type_name: str, segs: list[str]) -> str | None:
    """DuckLake type of the field at a pure-struct dotted path, or None
    when the path no longer resolves (field since dropped/renamed)."""
    from ducklake_spark.catalog.types import _split_top

    t = type_name
    for seg in segs:
        m = re.fullmatch(r"\s*struct<(.+)>\s*", t, re.I | re.S)
        if not m:
            return None
        nxt = None
        for part in _split_top(m.group(1)):
            n, ty = part.split(":", 1)
            if n.strip().lower() == seg.lower():
                nxt = ty
                break
        if nxt is None:
            return None
        t = nxt
    return t


def _remap_json_rename(v, hops: list[str], frm: str, to: str):
    """Apply one nested-field rename to a decoded inlined-JSON value:
    hop through struct dicts / list elements / map [k, v] pairs along
    ``hops``, then rename dict key ``frm`` -> ``to`` (case-insensitive,
    matching the catalog's identifier semantics)."""
    if v is None:
        return v
    if hops:
        seg, rest = hops[0].lower(), hops[1:]
        if seg == "element" and isinstance(v, list):
            return [_remap_json_rename(x, rest, frm, to) for x in v]
        if seg in ("key", "value") and isinstance(v, list):
            i = 0 if seg == "key" else 1
            out = []
            for pair in v:
                pair = list(pair)
                pair[i] = _remap_json_rename(pair[i], rest, frm, to)
                out.append(pair)
            return out
        if isinstance(v, dict):
            return {k: (_remap_json_rename(x, rest, frm, to)
                        if k.lower() == seg else x) for k, x in v.items()}
        return v
    if isinstance(v, dict):
        k0 = next((k for k in v if k.lower() == frm.lower()), None)
        if k0 is not None and to not in v:
            v = dict(v)
            v[to] = v.pop(k0)
        return v
    return v


def _rename_in_dtype(dt: T.DataType, hops: list[str], frm: str,
                     to: str) -> T.DataType:
    """Rename struct field ``frm`` -> ``to`` at dotted path ``hops``
    within a (possibly container-nested) Spark type; hop segments are
    struct field names, a list's ``element``, or a map's
    ``key``/``value``. Returns ``dt`` unchanged (identity) when the
    path doesn't resolve."""
    if hops:
        seg, rest = hops[0].lower(), hops[1:]
        if isinstance(dt, T.ArrayType) and seg == "element":
            inner = _rename_in_dtype(dt.elementType, rest, frm, to)
            return dt if inner is dt.elementType else T.ArrayType(
                inner, dt.containsNull)
        if isinstance(dt, T.MapType) and seg == "key":
            inner = _rename_in_dtype(dt.keyType, rest, frm, to)
            return dt if inner is dt.keyType else T.MapType(
                inner, dt.valueType, dt.valueContainsNull)
        if isinstance(dt, T.MapType) and seg == "value":
            inner = _rename_in_dtype(dt.valueType, rest, frm, to)
            return dt if inner is dt.valueType else T.MapType(
                dt.keyType, inner, dt.valueContainsNull)
        if isinstance(dt, T.StructType):
            out, hit = [], False
            for f in dt.fields:
                if f.name.lower() == seg:
                    inner = _rename_in_dtype(f.dataType, rest, frm, to)
                    hit = hit or inner is not f.dataType
                    out.append(T.StructField(f.name, inner, f.nullable))
                else:
                    out.append(f)
            return T.StructType(out) if hit else dt
        return dt
    if isinstance(dt, T.StructType):
        if not any(f.name.lower() == frm.lower() for f in dt.fields):
            return dt
        return T.StructType([
            T.StructField(to if f.name.lower() == frm.lower() else f.name,
                          f.dataType, f.nullable)
            for f in dt.fields
        ])
    return dt


def _coerce_by_name(col: Column, src: T.DataType | None,
                    dst: T.DataType) -> Column:
    """Insert-time cast with the reference's by-name struct coercion:
    DuckDB (>=1.2, which the reference builds on) casts structs by
    matching field NAMES — source-only fields are dropped, target-only
    fields fill NULL, matched fields recurse
    (test/sql/alter/struct_evolution_reuse.test inserts {'i','j'} into
    STRUCT(j INT)). Spark's struct cast is positional and
    arity-strict, so differing struct shapes are rebuilt field-wise;
    identical shapes keep the plain (whole-stage-codegen) cast."""
    if src is None or src == dst:
        return col if src == dst else col.cast(dst)
    if isinstance(src, T.StructType) and isinstance(dst, T.StructType):
        sfields = {f.name.lower(): f for f in src.fields}
        parts = []
        for f in dst.fields:
            s = sfields.get(f.name.lower())
            if s is None:
                parts.append(F.lit(None).cast(f.dataType).alias(f.name))
            else:
                parts.append(_coerce_by_name(
                    col.getField(s.name), s.dataType, f.dataType
                ).alias(f.name))
        return F.when(col.isNull(), F.lit(None).cast(dst)).otherwise(
            F.struct(*parts))
    if isinstance(src, T.ArrayType) and isinstance(dst, T.ArrayType):
        return F.when(col.isNull(), F.lit(None).cast(dst)).otherwise(
            F.transform(col, lambda x: _coerce_by_name(
                x, src.elementType, dst.elementType)))
    if isinstance(src, T.MapType) and isinstance(dst, T.MapType):
        return F.when(col.isNull(), F.lit(None).cast(dst)).otherwise(
            F.map_from_arrays(
                F.transform(F.map_keys(col), lambda k: _coerce_by_name(
                    k, src.keyType, dst.keyType)),
                F.transform(F.map_values(col), lambda v: _coerce_by_name(
                    v, src.valueType, dst.valueType))))
    return col.cast(dst)


def _check_reserved_column(name: str) -> None:
    """Reference rejects user columns in the internal namespace
    (test/sql/reserved_names/reserved_names.test)."""
    if name.startswith("_ducklake_internal_"):
        raise DuckLakeError(
            f'Column name "{name}" is reserved by DuckLake for internal use'
        )


# bookkeeping columns of the catalog-inlined data tables — user columns
# with these names collide there, so they are only rejected while data
# inlining is enabled (test/sql/data_inlining/inlining_reserved_column_names)
RESERVED_INLINE_COLS = frozenset({"row_id", "begin_snapshot", "end_snapshot"})


def _check_inline_reserved(name: str) -> None:
    if name.lower() in RESERVED_INLINE_COLS:
        raise DuckLakeError(
            f'Column name "{name}" is reserved while data inlining is '
            "enabled (set data_inlining_row_limit to 0 to use it)"
        )


class DuckLake:
    """One attached lake = one catalog DB + one data path."""

    def __init__(self, spark: SparkSession, metadata_path: str, data_path: str,
                 *, snapshot_version: int | None = None,
                 snapshot_time: str | None = None,
                 data_inlining_row_limit: int | None = None,
                 encrypted: bool = False, read_only: bool = False,
                 filesystem=None, override_data_path: bool = False,
                 disabled_filesystems: str | None = None,
                 automatic_migration: bool = False,
                 format_version: str | None = None,
                 alias: str | None = None,
                 metadata_schema: str | None = None,
                 s3_options: dict | None = None):
        from ducklake_spark.fsio import LakeFS

        self.spark = spark
        self.metadata_path = metadata_path
        self.data_path = data_path.rstrip("/") + "/"
        if disabled_filesystems:
            # reference: SET disabled_filesystems='LocalFileSystem' must
            # not break an object-store lake, and must refuse a lake
            # whose data path lives on a disabled filesystem
            # (test/sql/settings/disabled_filesystems.test)
            disabled = {d.strip().lower()
                        for d in disabled_filesystems.split(",") if d.strip()}
            scheme = (self.data_path.split("://", 1)[0]
                      if "://" in self.data_path else "file")
            fs_name = ("LocalFileSystem" if scheme == "file" else
                       {"s3": "S3FileSystem", "s3a": "S3FileSystem",
                        "gs": "GcsFileSystem", "hdfs": "HadoopFileSystem",
                        }.get(scheme, scheme))
            if fs_name.lower() in disabled or scheme in disabled:
                raise DuckLakeError(
                    f"data path {self.data_path!r} uses filesystem "
                    f"{fs_name}, which is disabled "
                    "(disabled_filesystems)")
        # Object-store data path without a hadoop-aws-capable Spark
        # (this container): run the data plane on a SHARED local mirror
        # and sync it to the store via pyarrow at commit/maintenance
        # boundaries. The catalog keeps the s3:// data_path; a
        # production cluster with hadoop-aws reads s3a:// directly and
        # never enters mirror mode.
        self.remote_data_path: str | None = None
        self._s3fs = None
        self._s3_prefix = ""
        if self.data_path.startswith(("s3://", "s3a://")) \
                and filesystem is None:
            from ducklake_spark.fsio import mirror_root_for, s3_filesystem

            from ducklake_spark.fsio import s3_boto_client, split_s3

            self.remote_data_path = self.data_path
            self._s3fs, self._s3_prefix = s3_filesystem(
                self.data_path, s3_options)
            self._s3_opts = dict(s3_options or {})
            self._boto = s3_boto_client(s3_options)
            self._s3_bucket, _ = split_s3(self.remote_data_path)
            self.data_path = (
                mirror_root_for(self.remote_data_path).rstrip("/") + "/")
            try:
                self._boto.create_bucket(Bucket=self._s3_bucket)
            except Exception:
                pass  # exists / owned
            self._s3_sync_down()
        # every driver-side file op (finalize/adopt/cleanup) routes
        # through this pyarrow.fs-backed seam — see fsio.LakeFS;
        # injectable for tests and for pre-configured object stores
        self.lfs: LakeFS = filesystem or LakeFS.for_path(self.data_path)
        # snapshot-keyed file-list cache (see _visible_files); expire/
        # cleanup maintenance clears it (issue_852_cache_growth.test)
        self._file_cache: dict[tuple, list[dict]] = {}
        # session-scoped default for data_inlining_row_limit when no
        # catalog scope sets it: the SQL frontend pins this to the
        # reference's interactive default (10,
        # ducklake_extension.cpp:36-38) so reference-shaped sessions
        # inline small inserts and reserve row_id/begin_snapshot/
        # end_snapshot exactly like the reference; the library API
        # leaves it None (→ spark conf → 0, the cluster-scale default).
        self.session_inline_default: int | None = None
        self.read_only = read_only
        if read_only:
            # READ_ONLY attach requires an existing catalog (reference:
            # test/sql/general/ducklake_read_only.test — attaching a
            # non-existent lake read-only is an error, not a bootstrap)
            p = metadata_path
            if p.startswith("duckdb://"):
                p = p[len("duckdb://"):]
            if "://" not in p and not os.path.exists(p):
                raise DuckLakeError(
                    f"cannot ATTACH {metadata_path!r} READ_ONLY: "
                    "catalog database does not exist"
                )
        self.meta = MetadataManager(metadata_path, schema=metadata_schema)
        # attach alias — the metadata log's `catalog` column
        # (ducklake_transaction.cpp:1589 logs the catalog name)
        self.meta.catalog_name = alias
        # MIGRATE_IF_REQUIRED: upgrade an old-format catalog in place
        # before anything reads it (ducklake_metadata_manager.cpp:308-380)
        from ducklake_spark.catalog.migrate import detect_version, migrate_if_required

        cur_ver = detect_version(self.meta)
        if (format_version is not None and cur_ver is not None
                and format_version < cur_ver):
            raise DuckLakeError(
                f"Cannot downgrade DuckLake from version {cur_ver!r} "
                f"to {format_version!r}")
        if cur_ver not in (None, FORMAT_VERSION):
            # '1.x' catalogs are format-compatible and keep their tag —
            # only AUTOMATIC_MIGRATION bumps them to the current head
            # (attach/attach_ducklake_version.test); pre-1.0 catalogs
            # require explicit AUTOMATIC_MIGRATION TRUE, like the
            # reference (migration/migration.test: plain attach errors)
            if cur_ver.startswith("1.") and not automatic_migration:
                pass
            elif not automatic_migration:
                raise DuckLakeError(
                    f"DuckLake catalog version mismatch: catalog is "
                    f"{cur_ver!r}, engine expects {FORMAT_VERSION!r} — "
                    "re-attach with AUTOMATIC_MIGRATION TRUE to upgrade"
                )
            elif read_only:
                raise DuckLakeError(
                    "catalog requires a format migration; re-attach without "
                    "READ_ONLY to migrate"
                )
            else:
                migrate_if_required(self.meta)
        if not read_only:
            # same-format-version layout fixup: older catalogs of THIS
            # engine stored ducklake_table.path data-root-relative; the
            # reference convention (and the handle resolver) is
            # schema-relative (general/paths.test). Idempotent, no-op
            # on reference-written catalogs.
            from ducklake_spark.catalog.migrate import (
                migrate_file_paths,
                migrate_table_paths,
            )

            try:
                n_tbl = migrate_table_paths(self.meta)
                migrate_file_paths(self.meta, legacy_hint=n_tbl > 0)
            except Exception:
                pass  # read-only backends / locked catalogs: leave as-is
        if read_only:
            try:
                bootstrapped = self.meta.query(
                    "SELECT COUNT(*) FROM ducklake_snapshot"
                )[0][0] > 0
            except Exception:
                bootstrapped = False
            if not bootstrapped:
                raise DuckLakeError(
                    f"cannot ATTACH {metadata_path!r} READ_ONLY: "
                    "catalog is not initialized"
                )
            if data_inlining_row_limit is not None:
                raise DuckLakeError("cannot set options on a READ_ONLY lake")
        else:
            self.meta.initialize(
                self.remote_data_path or self.data_path,
                encrypted=encrypted, format_version=format_version)
            # unconditional layout repair (not gated on
            # AUTOMATIC_MIGRATION): catalogs written before the
            # reference-exact inlined-delete layout landed used
            # ducklake_inlined_deletes_{tid}(data_file_id, pos, …) or a
            # 4-column end_snapshot variant — readers probe only the
            # 3-column ducklake_inlined_delete_{tid}(file_id, row_id,
            # begin_snapshot), so unmigrated rows would silently
            # resurrect deleted rows
            self._migrate_inlined_delete_tables()
        # a re-attach must use the catalog's recorded data path — files
        # are referenced relative to it, so a silent mismatch breaks
        # every read (reference: attach/different_paths.test,
        # OVERRIDE_DATA_PATH opt-out)
        stored = self.meta.option("data_path")
        if stored and stored.rstrip("/") != (
                self.remote_data_path or self.data_path).rstrip("/"):
            if override_data_path:
                # session-scoped: the catalog keeps its recorded
                # data_path — a later plain re-attach returns the
                # ORIGINAL path (general/data_path_tag.test)
                pass
            else:
                raise DuckLakeError(
                    f"DATA_PATH {data_path!r} does not match existing "
                    f"data path in the catalog ({stored!r}); pass "
                    "override_data_path=True to override"
                )
        # per-file parquet encryption (reference: ENCRYPTED lakes,
        # ducklake_insert.cpp:743-756): data files carry random keys
        # recorded in the catalog; footer + columns AES-GCM encrypted
        # (uniform encrypted-footer mode like the reference) — stats
        # harvesting decrypts footers via pyarrow with the catalog key
        self.encrypted = (self.meta.option("encrypted") or "false") == "true"
        self._pinned: Snapshot | None = None
        if snapshot_version is not None and snapshot_time is not None:
            # reference attach_at_snapshot.test:53
            raise DuckLakeError(
                "Cannot specify both VERSION and TIMESTAMP")
        if snapshot_version is not None:
            self._pinned = self.meta.snapshot_at_version(snapshot_version)
        elif snapshot_time is not None:
            self._pinned = self.meta.snapshot_at_timestamp(snapshot_time)
        if self._pinned is not None:
            # attaching at a snapshot means read-only (reference:
            # test/sql/general/attach_at_snapshot.test)
            self.read_only = True
        if data_inlining_row_limit is not None:
            self.meta.set_option("data_inlining_row_limit", str(data_inlining_row_limit))
        self._txn: Transaction | None = None
        self._commit_note: tuple[str | None, str | None, str | None] = (None, None, None)
        spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
        spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
        # foreign (adopted) files carry no field ids -> resolve those by name
        spark.conf.set("spark.sql.parquet.fieldId.read.ignoreMissing", "true")

    # -- attach ------------------------------------------------------------

    @classmethod
    def attach(cls, spark: SparkSession, metadata_path: str,
               data_path: str | None = None, **kw) -> DuckLake:
        """ATTACH 'ducklake:<metadata_path>' (DATA_PATH ...) equivalent
        (reference: ducklake_storage.cpp:13-126). When ``metadata_path``
        is a bare name (alphanumeric/underscore), it resolves as a
        DuckLake SECRET holding the attach parameters
        (ducklake_secret.cpp:17-29 PathIsSecret). Re-attaching an
        EXISTING lake needs no DATA_PATH: the catalog records it
        (reference: test/sql/general/data_path_tag.test — "Existing
        DuckLake with no DATA_PATH, returns the one from the metadata
        catalog")."""
        from ducklake_spark.secrets import get_secret, path_is_secret

        if data_path is None and not path_is_secret(metadata_path):
            stored = cls._stored_data_path(
                metadata_path, schema=kw.get("metadata_schema"))
            if stored:
                data_path = stored
        if data_path is None or path_is_secret(metadata_path):
            sec = get_secret(metadata_path)
            if sec is None:
                raise DuckLakeError(
                    f"no DuckLake secret named {metadata_path!r} "
                    "(and no data_path given)"
                )
            metadata_path = sec["metadata_path"]
            data_path = data_path or sec.get("data_path")
            if data_path is None:
                raise DuckLakeError(
                    f"secret {metadata_path!r} has no data_path and none given"
                )
            if "encrypted" in sec and "encrypted" not in kw:
                kw["encrypted"] = str(sec["encrypted"]).lower() == "true" or sec["encrypted"] is True
        return cls(spark, metadata_path, data_path, **kw)

    @staticmethod
    def _stored_data_path(metadata_path: str,
                          schema: str | None = None) -> str | None:
        """The data_path recorded in an EXISTING catalog, or None if the
        catalog does not exist / is not initialized yet."""
        from ducklake_spark.catalog.metadata import MetadataManager

        local = metadata_path.split("://", 1)[-1]
        if "://" not in metadata_path or metadata_path.startswith("duckdb://"):
            if not os.path.exists(local):
                return None  # fresh lake: don't create the file probing it
        try:
            meta = MetadataManager(metadata_path, schema=schema)
            # read-only existence probe FIRST: treat missing tables as
            # "not initialized" instead of issuing a failing SELECT (a
            # remote backend may abort its session transaction on
            # error), and never run any DDL/bootstrap from a probe
            if not meta.query(
                "SELECT 1 FROM sqlite_master WHERE type='table' AND name=?",
                ("ducklake_metadata",),
            ):
                return None
            return meta.option("data_path")
        except Exception:
            return None

    # -- transactions ------------------------------------------------------

    def _check_writable(self) -> None:
        if self.read_only:
            raise DuckLakeError(
                f"lake {self.metadata_path!r} is attached in read-only mode"
            )

    def begin(self) -> Transaction:
        """Open an explicit transaction (reference: BEGIN TRANSACTION).

        Subsequent statements — including DML helpers and maintenance
        calls that internally open ``lake.transaction()`` contexts —
        JOIN this transaction instead of auto-committing, until
        :meth:`commit` or :meth:`rollback` (reference:
        test/sql/insert/insert_into_self.test,
        test/sql/rewrite_data_files/test_rewrite_rollback_cleanup.test)."""
        self._explicit_txn = True
        return self._begin()

    def _begin(self) -> Transaction:
        """Join the open transaction, or open an auto-commit-scoped one
        (internal statement scope — does NOT mark the txn explicit)."""
        self._check_writable()
        if self._txn is None:
            self._txn = Transaction(self.meta)
            # the SESSION's data root (OVERRIDE_DATA_PATH may differ
            # from the catalog-recorded one): commit-time absolute
            # paths for outside-table files must name the real
            # location (migration/migration.test adopts under an
            # overridden root)
            self._txn.active_data_root = self.data_path
            self._txn.commit_message = self._commit_note
            self._txn.session_inline_default = self._inline_limit()
        return self._txn

    def commit(self) -> int:
        self._explicit_txn = False
        if self._txn is None:
            return self.current_snapshot()
        txn = self._txn
        try:
            snap = txn.commit()
        except BaseException:
            # a failed/conflicted commit leaves no trace on storage:
            # buffered data/delete files were never published, remove
            # them now instead of leaving orphans (reference:
            # test/sql/transaction/transaction_conflict_cleanup.test)
            self._discard_buffered_files(txn)
            raise
        finally:
            self._txn = None
            self._commit_note = (None, None, None)
            from ducklake_spark.maintenance import release_flush_claims

            release_flush_claims(txn)
        if snap is not None:
            DuckLake._LAST_COMMITTED[self.meta.db_path] = snap
        for op_ in getattr(txn, "post_commit_ops", []):
            op_()
        self._s3_sync_up()
        return snap

    def rollback(self) -> None:
        self._explicit_txn = False
        txn, self._txn = self._txn, None
        # a rolled-back transaction's pending commit note must not leak
        # onto the NEXT commit (reference: test/sql/audit/
        # test_base_audit.test "ROLLBACK doesn't mess things up")
        self._commit_note = (None, None, None)
        if txn is not None:
            from ducklake_spark.maintenance import release_flush_claims

            release_flush_claims(txn)
            self._discard_buffered_files(txn)

    def _discard_buffered_files(self, txn: Transaction) -> None:
        """Physically remove files a dead transaction had buffered —
        except ADOPTED files (mapping_id set): add_data_files registers
        the user's existing data, it never writes it, so a rollback must
        not delete it (reference add_files/add_rollback.test)."""
        for files in txn.new_data_files.values():
            for fi in files:
                if fi.mapping_id is not None:
                    continue
                self.lfs.remove(self.lfs.strip_scheme(
                    os.path.join(self.data_path, fi.path)))
        for dfiles in txn.new_delete_files.values():
            for di in dfiles:
                self.lfs.remove(self.lfs.strip_scheme(
                    os.path.join(self.data_path, di.path)))

    class _TxnCtx:
        def __init__(self, lake: DuckLake, staged: bool = False):
            self.lake = lake
            self.staged = staged
            self.staged_snapshot: int | None = None

        def __enter__(self):
            # nested contexts JOIN the outer transaction (reference
            # semantics: one connection, one transaction) — the outer
            # context owns commit/rollback. CTAS and the DML helpers
            # open a context internally, so they compose with a
            # user-opened lake.transaction() instead of committing it.
            self.nested = self.lake._explicit_txn
            if self.nested and self.staged:
                raise DuckLakeError(
                    "staged transaction cannot nest inside an open one")
            self.lake._explicit_txn = True
            self.lake.begin()
            return self

        def __exit__(self, exc_type, *a):
            if self.nested:
                return  # outer context commits / rolls back
            self.lake._explicit_txn = False
            if exc_type is None:
                if self.staged:
                    txn, self.lake._txn = self.lake._txn, None
                    self.staged_snapshot = txn.commit(staged=True)
                else:
                    self.lake.commit()
            else:
                self.lake.rollback()

        def __getattr__(self, item):  # delegate lake ops inside the ctx
            return getattr(self.lake, item)

    _explicit_txn = False

    def transaction(self, *, staged: bool = False) -> DuckLake._TxnCtx:
        """``with lake.transaction(): ...`` groups ops into one snapshot.

        ``staged=True`` stages instead of publishing: the context's
        ``staged_snapshot`` holds the reserved id, invisible to readers
        until :meth:`commit_staged` (reference: staged commits +
        ducklake_commit())."""
        return DuckLake._TxnCtx(self, staged)

    def commit_staged(self, snapshot_id: int) -> int:
        """ducklake_commit(cat, snapshot_id): finalize a staged snapshot."""
        return Transaction.finalize_staged(self.meta, snapshot_id)

    def rollback_staged(self, snapshot_id: int) -> None:
        """Abandon a staged snapshot (e.g. after a finalize conflict)."""
        Transaction.rollback_staged(self.meta, snapshot_id)

    _in_auto_compact = False

    def _autocommit(self) -> int | None:
        if self._explicit_txn:
            return None
        touched_data = self._txn is not None and any(
            e.startswith(("inserted_into_table", "deleted_from_table"))
            for e in self._txn.change_log
        )
        snap = self.commit()
        # auto_compact: compaction piggybacks on DML commits (reference:
        # ducklake_compaction_functions.cpp:842,865-878)
        if (
            touched_data
            and not DuckLake._in_auto_compact
            and (self.meta.option("auto_compact", "") or "").lower() == "true"
        ):
            from ducklake_spark.maintenance import merge_adjacent_files

            DuckLake._in_auto_compact = True
            try:
                merge_adjacent_files(self)
            finally:
                DuckLake._in_auto_compact = False
        return snap

    def set_commit_message(self, author: str | None, message: str | None,
                           extra_info: str | None = None) -> None:
        """reference: ducklake_set_commit_message.cpp:55-57"""
        self._commit_note = (author, message, extra_info)
        if self._txn is not None:
            self._txn.commit_message = self._commit_note

    # -- snapshot helpers --------------------------------------------------

    def current_snapshot(self) -> int:
        if self._pinned is not None:
            return self._pinned.snapshot_id
        return self.meta.latest_snapshot().snapshot_id

    # catalog-identity -> last snapshot committed by THIS process
    # (reference ducklake_last_committed_snapshot is scoped to the
    # database instance: every connection of one process sees it,
    # test/sql/snapshot_info/ducklake_last_commit.test)
    _LAST_COMMITTED: dict[str, int] = {}

    def last_committed_snapshot(self) -> int | None:
        return DuckLake._LAST_COMMITTED.get(self.meta.db_path)

    def _resolve_snapshot(self, at_version: int | None, at_timestamp: str | None) -> Snapshot:
        if at_version is not None:
            return self.meta.snapshot_at_version(at_version)
        if at_timestamp is not None:
            return self.meta.snapshot_at_timestamp(at_timestamp)
        if self._pinned is not None:
            return self._pinned
        return self.meta.latest_snapshot()

    # -- DDL ---------------------------------------------------------------

    def create_schema(self, name: str, *, if_not_exists: bool = False) -> None:
        committed = self.meta.query(
            "SELECT schema_id FROM ducklake_schema "
            "WHERE schema_name=? AND end_snapshot IS NULL", (name,),
        )
        if committed and self._txn is not None:
            # dropped earlier in THIS transaction ⇒ re-creatable
            # (reference catalog/schema.test: DROP SCHEMA s1 CASCADE;
            # CREATE SCHEMA s1 inside one BEGIN)
            committed = [r for r in committed
                         if r[0] not in self._txn.dropped_schemas]
        exists = bool(committed) or (self._txn is not None and any(
            sn == name for sn, _u in self._txn.created_schemas))
        if exists:
            if if_not_exists:
                return
            raise DuckLakeError(f"schema {name!r} already exists")
        txn = self._begin()
        txn.created_schemas.append((name, str(uuid.uuid4())))
        txn.change_log.append(f'created_schema:"{name}"')
        self._autocommit()

    def drop_schema(self, name: str, *, cascade: bool = False) -> None:
        """DROP SCHEMA [CASCADE]: end-snapshots the schema row; CASCADE
        drops its tables and views in the same snapshot (reference
        basic_time_travel.test — the dropped objects stay readable via
        time travel)."""
        rows = self.meta.query(
            "SELECT schema_id FROM ducklake_schema "
            "WHERE schema_name=? AND end_snapshot IS NULL", (name,),
        )
        if not rows:
            # a schema created in THIS transaction unwinds from the
            # buffer; its txn-local tables/views block a non-cascade
            # drop exactly like committed dependents (reference
            # catalog/drop_schema_transaction_local_entries.test)
            if self._txn is not None and any(
                n == name for n, _u in self._txn.created_schemas
            ):
                txn = self._txn
                local_tables = [td.table_name for td in txn.created_tables
                                if td.schema_name == name]
                local_views = [vn for sn, vn, _d, _s, _a in txn.created_views
                               if sn == name]
                local_macros = [mn for sn, mn, _k in getattr(
                    txn, "_pending_macros", {}) if sn == name]
                if (local_tables or local_views or local_macros) \
                        and not cascade:
                    raise DuckLakeError(
                        f"schema {name!r} is not empty — there are "
                        "entries that depend on it (use cascade=True)"
                    )
                from ducklake_spark.macros import drop_macro as _drop_macro

                for mn in local_macros:
                    _drop_macro(self, f"{name}.{mn}")
                for tname in local_tables:
                    self.drop_table(f"{name}.{tname}")
                dropped_v = {(name, vn) for vn in local_views}
                txn.created_views = [
                    v for v in txn.created_views
                    if (v[0], v[1]) not in dropped_v
                ]
                for _sn, vn in dropped_v:
                    entry = f'created_view:"{name}"."{vn}"'
                    while entry in txn.change_log:
                        txn.change_log.remove(entry)
                txn.created_schemas = [
                    (n, u) for n, u in txn.created_schemas if n != name
                ]
                entry = f'created_schema:"{name}"'
                while entry in txn.change_log:
                    txn.change_log.remove(entry)
                return
            raise DuckLakeError(f"schema {name!r} does not exist")
        sid = rows[0][0]
        members = self.meta.query(
            "SELECT table_id FROM ducklake_table "
            "WHERE schema_id=? AND end_snapshot IS NULL", (sid,),
        )
        views = self.meta.query(
            "SELECT view_id FROM ducklake_view "
            "WHERE schema_id=? AND end_snapshot IS NULL", (sid,),
        )
        macros = self.meta.query(
            "SELECT macro_id FROM ducklake_macro "
            "WHERE schema_id=? AND end_snapshot IS NULL", (sid,),
        )
        # dependents dropped EARLIER IN THIS TRANSACTION no longer
        # block a non-cascade drop (reference
        # catalog/drop_schema_after_drop_dependents.test: DROP VIEW;
        # DROP SCHEMA inside one BEGIN commits)
        if self._txn is not None:
            from ducklake_spark.macros import _txn_dropped_macro_ids

            gone_t = set(self._txn.dropped_tables)
            gone_v = set(self._txn.dropped_views)
            gone_m = _txn_dropped_macro_ids(self)
            members = [m for m in members if m[0] not in gone_t]
            views = [v for v in views if v[0] not in gone_v]
            macros = [m for m in macros if m[0] not in gone_m]
        if (members or views or macros) and not cascade:
            # macros depend on the schema too (reference
            # catalog/drop_schema_with_table_macro.test)
            raise DuckLakeError(
                f"schema {name!r} is not empty (use cascade=True)"
            )
        txn = self._begin()
        txn.dropped_schemas.append(sid)
        for (tid,) in members:
            txn.dropped_tables.append(tid)
            txn.change_log.append(f"dropped_table:{tid}")
        for (vid,) in views:
            txn.dropped_views.append(vid)
            txn.change_log.append(f"dropped_view:{vid}")
        for (mid,) in macros:
            def mop(con, snap_id, mid=mid):
                con.execute(
                    "UPDATE ducklake_macro SET end_snapshot=? "
                    "WHERE macro_id=? AND end_snapshot IS NULL",
                    (snap_id, mid),
                )

            txn.column_changes.setdefault(-1, []).append(mop)
        txn.change_log.append(f'dropped_schema:"{name}"')
        self._autocommit()

    def create_table(self, name: str, schema, *, not_null: tuple[str, ...] = (),
                     if_not_exists: bool = False,
                     defaults: dict[str, str] | None = None) -> None:
        """``schema`` is a Spark StructType or DuckLake DDL-ish list of
        (name, type-name) pairs. PRIMARY KEY / CHECK / FOREIGN KEY are
        unsupported, like the reference (test/sql/constraints/unsupported.test);
        NOT NULL is supported via ``not_null``; ``defaults`` maps column
        name -> DEFAULT expression SQL (``CREATE TABLE t(i INT DEFAULT
        42)`` — stored on the column row like the reference, in the
        create snapshot itself)."""
        schema_name, table_name = self._split_name(name)
        found = self._find_table(schema_name, table_name)
        if (found is not None and self._txn is not None
                and found[0] in self._txn.dropped_tables):
            # dropped earlier in THIS transaction (possibly via DROP
            # SCHEMA CASCADE) ⇒ the name is free again
            # (catalog/schema.test drop-and-recreate)
            found = None
        exists = found is not None or (
            self._txn is not None
            and any(td.schema_name == schema_name
                    and td.table_name == table_name
                    for td in self._txn.created_tables)
        )
        # views share the table namespace per schema (reference
        # test/sql/transaction/create_conflict.test:78-84)
        if exists or self._view_exists(schema_name, table_name):
            if if_not_exists:
                return
            raise DuckLakeError(f"table {name!r} already exists")
        cols = []
        if isinstance(schema, T.StructType):
            for f_ in schema.fields:
                check_supported(f_.dataType)
                _check_reserved_column(f_.name)
                cols.append(
                    ColumnDef(
                        f_.name,
                        spark_to_ducklake(f_.dataType),
                        nulls_allowed=f_.name not in not_null and f_.nullable,
                    )
                )
        else:
            for cname, ctype in schema:
                ducklake_to_spark(ctype)  # validates
                _check_reserved_column(cname)
                cols.append(ColumnDef(cname, ctype, nulls_allowed=cname not in not_null))
        for c in cols:
            if defaults and c.name in defaults:
                c.default_value = defaults[c.name]
        txn0 = self._txn
        if txn0 is not None and any(
                sn == schema_name for sn, _u in txn0.created_schemas):
            # a schema (re-)created in THIS transaction wins over a
            # committed row of the same name that the transaction also
            # dropped (catalog/schema.test drop-and-recreate)
            sid = None
        else:
            try:
                sid = self._schema_id(schema_name)
            except DuckLakeError:
                raise DuckLakeError(f"schema {schema_name!r} not found")
        if self._inline_limit(schema_id=sid) > 0:
            for c in cols:
                _check_inline_reserved(c.name)
        txn = self._begin()
        from ducklake_spark.transaction import path_component

        tuid = str(uuid.uuid4())
        td = TableDef(
            schema_name, table_name, cols,
            path=self._schema_path(schema_name, txn)
            + path_component(table_name, tuid),
            table_uuid=tuid,
        )
        # per-NODE child rows for nested columns: the reference assigns
        # every schema node (struct children, list element, map
        # key/value) its own ducklake_column row + parquet field id in
        # pre-order DFS (ducklake_field_data.cpp:75-121;
        # schema_evolution/field_ids.test pins the numbering). Child
        # rows carry the plain node name; parent_column holds the
        # parent's ABSOLUTE dotted path until ids exist at commit.
        from ducklake_spark.catalog.types import field_nodes

        for c in cols:
            for nd in field_nodes(c.type):
                parent = (c.name if not nd["parent_path"]
                          else f"{c.name}.{nd['parent_path']}")
                td.child_columns.append(
                    ColumnDef(nd["name"], nd["type"], parent_column=parent)
                )
        txn.created_tables.append(td)
        txn.change_log.append(f'created_table:"{schema_name}"."{table_name}"')
        self._autocommit()

    def _schema_path(self, schema_name: str, txn) -> str:
        """The schema's storage path — from the catalog, or from the
        txn buffer for a schema created in this transaction."""
        from ducklake_spark.transaction import path_component

        for sname, suuid in txn.created_schemas:
            if sname == schema_name:
                return path_component(sname, suuid)
        rows = self.meta.query(
            "SELECT path FROM ducklake_schema "
            "WHERE schema_name=? AND end_snapshot IS NULL", (schema_name,))
        if rows:
            return rows[0][0]
        return schema_name + "/"  # unreachable for valid schemas

    def drop_table(self, name: str) -> None:
        h = self._handle(name)
        if h.table_id < 0:
            # dropping a table created in THIS transaction: unwind it and
            # physically remove its buffered files — nothing may leak to
            # disk or the catalog (reference test/sql/cleanup/
            # create_drop_cleanup.test + drop_table_cleans_delete_files)
            txn = self._begin()
            key = f"{h.schema_name}.{h.table_name}"
            for fi in txn.new_data_files.pop(key, []):
                if getattr(fi, "mapping_id", None) is not None:
                    # adopted via add_data_files: externally owned —
                    # unregistering must not touch the disk
                    # (preserve_external_transaction_local_files.test)
                    continue
                self.lfs.remove(
                    self.lfs.strip_scheme(
                        os.path.join(self.data_path, fi.path)))
            # buffered positional delete files go with the data files
            # (drop_table_cleans_delete_files.test)
            for dfi in txn.new_delete_files.pop(key, []):
                self.lfs.remove(
                    self.lfs.strip_scheme(
                        os.path.join(self.data_path, dfi.path)))
            txn.inlined_ctas = [e for e in txn.inlined_ctas
                                if e[0] != key]
            txn.created_tables = [
                td for td in txn.created_tables
                if not (td.schema_name == h.schema_name
                        and td.table_name == h.table_name)
            ]
            for entry in (
                f'created_table:"{h.schema_name}"."{h.table_name}"',
                f"inserted_into_table:{h.schema_name}.{h.table_name}",
            ):
                while entry in txn.change_log:
                    txn.change_log.remove(entry)
            return
        txn = self._begin()
        txn.dropped_tables.append(h.table_id)
        txn.change_log.append(f"dropped_table:{h.table_id}")
        self._autocommit()

    def rename_table(self, name: str, new_name: str) -> None:
        h = self._handle(name)
        txn = self._begin()
        new_tname = new_name.split(".")[-1]
        if h.table_id < 0:
            # renaming a table CREATED in this transaction: update the
            # buffered definition and re-key its buffered files/changes
            # (dbt's tmp-swap: CREATE tmp; RENAME old->backup;
            # RENAME tmp->old — rename_table_dbt_workload.test)
            td = next(
                t for t in txn.created_tables
                if t.schema_name == h.schema_name
                and t.table_name == h.table_name
            )
            old_key = f"{td.schema_name}.{td.table_name}"
            new_key = f"{td.schema_name}.{new_tname}"
            td.table_name = new_tname
            if old_key in txn.new_data_files:
                txn.new_data_files[new_key] = txn.new_data_files.pop(old_key)
            txn.change_log = [
                e[: -len(old_key)] + new_key if e.endswith(f":{old_key}")
                else e
                for e in txn.change_log
            ]
            self._autocommit()
            return
        txn.renamed_tables.append((h.table_id, new_tname))
        # the reference records a RENAME as created_table with the NEW
        # name (GetTransactionTableChanges, ducklake_transaction.cpp:
        # 893-899: LocalChangeType::RENAMED inserts into
        # created_tables) — expire_snapshot_bug.test matches
        # '%tables_created%main.b%' on the rename snapshot. Conflict
        # protection for the renamed id comes from renamed_tables
        # (folded into ours_alter in _check_conflicts).
        txn.change_log.append(
            f'created_table:"{h.schema_name}"."{new_tname}"')
        self._autocommit()


    def _require_committed(self, h: TableHandle, op: str) -> None:
        """ALTER on a table created in the current transaction would
        write catalog rows for an id that does not exist yet."""
        if h.table_id < 0:
            raise DuckLakeError(
                f"{op} on a table created in the current transaction is "
                "not supported; commit the CREATE first"
            )

    def add_column(self, name: str, col_name: str, col_type: str,
                   default: str | None = None, *,
                   if_not_exists: bool = False) -> None:
        h = self._handle(name)
        if h.table_id < 0:
            # ALTER on a table created in THIS transaction: the column
            # bakes into the pending CREATE (reference
            # insert_sorted_transaction.test: BEGIN; CREATE; ADD COLUMN;
            # INSERT; COMMIT)
            if any(cn.lower() == col_name.lower() for _i, cn, _t, _n
                   in h.columns):
                if if_not_exists:
                    return
                raise DuckLakeError(
                    f'column "{col_name}" already exists in {name!r}')
            ducklake_to_spark(col_type)
            _check_reserved_column(col_name)
            if default is not None and _default_kind(default) == "expression":
                raise DuckLakeError(
                    "We cannot add a column with a non-literal default "
                    'value. Add the column and then explicitly set the '
                    'default for new values using "ALTER ... SET DEFAULT"')
            txn = self._begin()
            from ducklake_spark.transaction import ColumnDef

            td = next(
                t for t in txn.created_tables
                if t.schema_name == h.schema_name
                and t.table_name == h.table_name
            )
            td.columns.append(ColumnDef(
                name=col_name, type=col_type,
                default_value=default, initial_default=default))
            if any(c.column_id is not None for c in td.columns):
                # ids were pre-assigned (CTAS / in-txn writes): extend
                self._preassign_column_ids(td)
            self._autocommit()
            return
        if any(cn.lower() == col_name.lower() for _i, cn, _t, _n
               in h.columns):
            # reference: duplicate ADD COLUMN errors unless IF NOT
            # EXISTS (test/sql/alter/add_column.test:19-27)
            if if_not_exists:
                return
            raise DuckLakeError(
                f'column "{col_name}" already exists in {name!r}')
        ducklake_to_spark(col_type)
        _check_reserved_column(col_name)
        if self._inline_limit(h.table_id, h.schema_id) > 0:
            _check_inline_reserved(col_name)
        txn = self._begin()
        from ducklake_spark.catalog.types import field_nodes

        leaves = field_nodes(col_type)
        if default is not None and _default_kind(default) == "expression":
            # reference: ducklake_table_entry.cpp AddColumn rejects
            # non-literal defaults (default_expressions.test)
            raise DuckLakeError(
                "We cannot add a column with a non-literal default "
                'value. Add the column and then explicitly set the '
                'default for new values using "ALTER ... SET DEFAULT"')
        pending_id = None
        if self._explicit_txn:
            # inside an open transaction the new column is visible to
            # the transaction's own later statements (reference
            # txn-local schema, data_inlining_transaction_local_alter
            # .test): reserve the ids NOW (parent + nested leaves) so
            # in-txn parquet writes stamp the right field ids, and
            # overlay the column on _handle. Ids are PER TABLE
            # (reference GetNextColumnId = MAX(column_id)+1 over the
            # table's full history); a concurrent ALTER on the same
            # table is an alter-alter conflict and aborts anyway.
            committed_max = self.meta.query(
                "SELECT COALESCE(MAX(column_id), 0) FROM ducklake_column "
                "WHERE table_id=?", (h.table_id,),
            )[0][0]
            base = max(committed_max,
                       txn.column_id_floor.get(h.table_id, 0))
            pending_id = base + 1
            txn.column_id_floor[h.table_id] = base + 1 + len(leaves)
            txn.pending_columns.setdefault(h.table_id, []).append(
                (pending_id, col_name, col_type, default)
            )

        # decide NOW whether any row will surface the default: rows
        # committed before this statement (minus ones this transaction
        # already deleted) plus rows buffered earlier in this
        # transaction (add_column_default_stats.test cases 1-3 — a
        # post-ALTER insert carries explicit values and must NOT seed)
        rc_row = self.meta.query(
            "SELECT record_count FROM ducklake_table_stats "
            "WHERE table_id=?", (h.table_id,))
        surfacing = (rc_row[0][0] or 0) if rc_row else 0
        inl_prefix = f"ducklake_inlined_data_{h.table_id}_"
        for tname2, keys2, tuples2 in txn.inlined_end_updates:
            if tname2.startswith(inl_prefix) and tuples2:
                surfacing -= len(tuples2)
        surfacing -= len(txn.inlined_deletes.get(h.table_id, []))
        for dfl in txn.new_delete_files.get(h.table_id, []):
            surfacing -= dfl.delete_count or 0
        surfacing += sum(
            len(p) for t, _n, p in (txn.inlined_inserts
                                    + txn.inlined_inserts_rebase)
            if t == h.table_id
        ) + sum(
            f.record_count or 0
            for f in txn.new_data_files.get(str(h.table_id), [])
        )
        seed_default = surfacing > 0

        def op(con, snap_id, h=h, col_name=col_name, col_type=col_type,
               default=default, txn=txn, pending_id=pending_id,
               leaves=leaves, seed_default=seed_default):
            # per-table id (reference GetNextColumnId): MAX over the
            # table's FULL history so a drop-readd never reuses an id —
            # unless the ids were already reserved for txn-local use
            new_id = pending_id
            if new_id is None:
                new_id = con.execute(
                    "SELECT COALESCE(MAX(column_id), 0) + 1 "
                    "FROM ducklake_column WHERE table_id=?",
                    (h.table_id,),
                ).fetchone()[0]
            # column_order == column_id (reference convention,
            # ducklake_metadata_manager.cpp:2636)
            con.execute(
                "INSERT INTO ducklake_column VALUES "
                "(?, ?, NULL, ?, ?, ?, ?, ?, ?, 1, NULL, ?, 'duckdb')",
                (new_id, snap_id, h.table_id, new_id, col_name, col_type,
                 _default_storage_text(default), _default_storage_text(default),
                 _default_kind(default)),
            )
            # per-NODE nested rows, parent resolved within the batch
            # (DFS order guarantees parents precede children)
            path_to_id = {"": new_id}
            for k, nd in enumerate(leaves):
                node_id = new_id + 1 + k
                path_to_id[nd["path"]] = node_id
                con.execute(
                    "INSERT INTO ducklake_column VALUES "
                    "(?, ?, NULL, ?, ?, ?, ?, NULL, NULL, 1, ?, "
                    "'literal', 'duckdb')",
                    (node_id, snap_id, h.table_id, node_id,
                     nd["name"], nd["type"], path_to_id[nd["parent_path"]]),
                )
            # a literal DEFAULT becomes the new column's value for every
            # existing row, so the global stats start at that literal
            # (reference: test/sql/alter/add_column_default_stats.test)
            lit = _literal_text(default)
            if lit is not None and seed_default:
                con.execute(
                    "INSERT INTO ducklake_table_column_stats VALUES "
                    "(?, ?, 0, 0, ?, ?, NULL)",
                    (h.table_id, new_id, lit, lit),
                )

        txn.column_changes.setdefault(h.table_id, []).append(op)
        txn.change_log.append(f"altered_table:{h.table_id}")
        self._autocommit()

    def drop_column(self, name: str, col_name: str, *,
                    if_exists: bool = False) -> None:
        h = self._handle(name)
        self._require_committed(h, "ALTER DROP COLUMN")
        stored = next((cn for _i, cn, _t, _n in h.columns
                       if cn.lower() == col_name.lower()), None)
        if stored is None:
            # reference: dropping a missing column errors unless IF
            # EXISTS (test/sql/alter/drop_column.test:23-31)
            if if_exists:
                return
            raise DuckLakeError(
                f'column "{col_name}" does not exist in {name!r}')
        col_name = stored
        if len(h.columns) == 1:
            # reference: test/sql/alter/drop_column.test:33-37
            raise DuckLakeError(
                f"cannot drop column {col_name!r}: the table "
                "only has one column remaining")
        if any(_expr_references(e, col_name)
               for e, _d, _n in self._sort_spec(h)):
            # reference: test/sql/sorted_table/drop_sorted_column.test
            raise DuckLakeError(
                f"cannot drop column {col_name!r}: "
                "the table is sorted by this column (RESET SORTED BY first)"
            )
        if any(cname == col_name for cname, _t in self._partition_spec(h)):
            # reference: test/sql/partitioning/drop_partition_column.test
            raise DuckLakeError(
                f"cannot drop column {col_name!r}: "
                "the table is partitioned by this column "
                "(RESET PARTITIONED BY first)"
            )
        txn = self._begin()
        if self._explicit_txn:
            # hide the column from this transaction's later statements
            # (drop-readd inside one BEGIN)
            pend = getattr(txn, "pending_column_drops", None)
            if pend is None:
                pend = txn.pending_column_drops = {}
            pend.setdefault(h.table_id, []).append(col_name)

        def op(con, snap_id, h=h, col_name=col_name):
            row = con.execute(
                "SELECT column_id FROM ducklake_column "
                "WHERE table_id=? AND column_name=? AND end_snapshot IS NULL "
                "AND parent_column IS NULL",
                (h.table_id, col_name),
            ).fetchone()
            con.execute(
                "UPDATE ducklake_column SET end_snapshot=? "
                "WHERE table_id=? AND column_name=? AND end_snapshot IS NULL "
                "AND parent_column IS NULL",
                (snap_id, h.table_id, col_name),
            )
            if row:  # retire the column's nested-leaf child rows too
                con.execute(
                    "UPDATE ducklake_column SET end_snapshot=? "
                    "WHERE table_id=? AND parent_column=? "
                    "AND end_snapshot IS NULL",
                    (snap_id, h.table_id, row[0]),
                )

        txn.column_changes.setdefault(h.table_id, []).append(op)
        txn.change_log.append(f"altered_table:{h.table_id}")
        self._autocommit()

    def rename_column(self, name: str, col_name: str, new_name: str) -> None:
        h = self._handle(name)
        self._require_committed(h, "ALTER RENAME COLUMN")
        _check_reserved_column(new_name)
        if self._inline_limit(h.table_id, h.schema_id) > 0:
            _check_inline_reserved(new_name)
        stored = next((cn for _i, cn, _t, _n in h.columns
                       if cn.lower() == col_name.lower()), None)
        if stored is None:
            raise DuckLakeError(
                f'column "{col_name}" does not exist in {name!r}')
        col_name = stored  # duckdb identifiers are case-insensitive
        # (alter/rename_column_with_case_insensitive_name.test)
        txn = self._begin()
        if self._explicit_txn:
            # make the new name visible to the transaction's own later
            # statements (ADD -> RENAME -> DROP chains, test/sql/alter/
            # multi_alter_same_column_transaction.test); the commit-time
            # op below still renames the catalog row
            txn.pending_column_renames.setdefault(h.table_id, []).append(
                (col_name, new_name))

        def op(con, snap_id, h=h, col_name=col_name, new_name=new_name):
            row = con.execute(
                "SELECT column_id, column_order, column_type, initial_default, "
                "default_value, nulls_allowed, parent_column, "
                "default_value_type FROM ducklake_column "
                "WHERE table_id=? AND column_name=? AND end_snapshot IS NULL",
                (h.table_id, col_name),
            ).fetchone()
            if row is None:
                raise DuckLakeError(f"no column {col_name!r}")
            con.execute(
                "UPDATE ducklake_column SET end_snapshot=? "
                "WHERE table_id=? AND column_id=? AND end_snapshot IS NULL",
                (snap_id, h.table_id, row[0]),
            )
            con.execute(
                "INSERT INTO ducklake_column VALUES "
                "(?, ?, NULL, ?, ?, ?, ?, ?, ?, ?, ?, ?, 'duckdb')",
                (row[0], snap_id, h.table_id, row[1], new_name, row[2], row[3],
                 row[4], row[5], row[6], row[7] or "literal"),
            )
            # sort expressions track the rename (reference:
            # merge_adjacent_sorted_renamed.test — "sort expressions
            # are updated during rename")
            for sid, idx, expr in con.execute(
                "SELECT se.sort_id, se.sort_key_index, se.expression "
                "FROM ducklake_sort_expression se "
                "JOIN ducklake_sort_info si ON si.sort_id = se.sort_id "
                "AND si.table_id = se.table_id "
                "WHERE si.table_id=? AND si.end_snapshot IS NULL",
                (h.table_id,),
            ).fetchall():
                if _expr_references(expr, col_name):
                    con.execute(
                        "UPDATE ducklake_sort_expression SET expression=? "
                        "WHERE sort_id=? AND table_id=? AND sort_key_index=?",
                        (_rename_identifier(expr, col_name, new_name),
                         sid, h.table_id, idx),
                    )

        txn.column_changes.setdefault(h.table_id, []).append(op)
        # a SET SORTED BY buffered in this SAME transaction inserts its
        # expression rows in the sort_ops pass, which runs AFTER
        # column_changes at commit — the rename op above can't see
        # them. Re-apply the rename as a trailing sort_op and keep the
        # txn-local pending spec in sync
        # (sorted_table/merge_adjacent_sorted_transaction_renamed.test)
        skey = self._sort_key(h)
        spec = txn.pending_sort_specs.get(skey)
        if spec:
            txn.pending_sort_specs[skey] = [
                ((_rename_identifier(e, col_name, new_name)
                  if _expr_references(e, col_name) else e), d, n)
                for e, d, n in spec]

        def _sort_rename(con, snap_id, h=h, col_name=col_name,
                         new_name=new_name):
            for sid, idx, expr in con.execute(
                "SELECT se.sort_id, se.sort_key_index, se.expression "
                "FROM ducklake_sort_expression se "
                "JOIN ducklake_sort_info si ON si.sort_id = se.sort_id "
                "AND si.table_id = se.table_id "
                "WHERE si.table_id=? AND si.end_snapshot IS NULL",
                (h.table_id,),
            ).fetchall():
                if _expr_references(expr, col_name):
                    con.execute(
                        "UPDATE ducklake_sort_expression SET expression=? "
                        "WHERE sort_id=? AND table_id=? "
                        "AND sort_key_index=?",
                        (_rename_identifier(expr, col_name, new_name),
                         sid, h.table_id, idx),
                    )

        if txn.sort_ops.get(skey):
            txn.sort_ops[skey].append(_sort_rename)
        txn.change_log.append(f"altered_table:{h.table_id}")
        self._autocommit()

    def change_column_type(self, name: str, col_name: str, new_type: str) -> None:
        """Widening promotions for primitives; field-level evolution for
        nested types — matched fields promote, target-only fields are
        added, source-only fields are dropped (reference:
        ducklake_table_entry.cpp:912-1025 TypePromotion /
        GetNestedEvolution)."""
        h = self._handle(name)
        self._require_committed(h, "ALTER CHANGE TYPE")
        cur = next((c for c in h.columns if c[1] == col_name), None)
        if cur is None:
            raise DuckLakeError(f"no column {col_name!r}")

        def _is_nested(t: str) -> bool:
            return bool(re.match(r"\s*(struct|list|map)<", t, re.I))

        if _is_nested(cur[2]) or _is_nested(new_type):
            from ducklake_spark.catalog.types import nested_evolution

            try:
                added = nested_evolution(cur[2], new_type)
            except ValueError as e:
                raise DuckLakeError(str(e))
            ducklake_to_spark(new_type)  # validates
            self._apply_nested_type(name, h, cur, new_type, tuple(added))
            return
        if not is_widening(cur[2], new_type):
            raise DuckLakeError(
                f"type change {cur[2]} -> {new_type} is not a widening promotion"
            )
        txn = self._begin()

        def op(con, snap_id, h=h, cid=cur[0], new_type=new_type):
            row = con.execute(
                "SELECT column_order, column_name, initial_default, default_value, "
                "nulls_allowed, parent_column, default_value_type "
                "FROM ducklake_column "
                "WHERE table_id=? AND column_id=? AND end_snapshot IS NULL",
                (h.table_id, cid),
            ).fetchone()
            con.execute(
                "UPDATE ducklake_column SET end_snapshot=? "
                "WHERE table_id=? AND column_id=? AND end_snapshot IS NULL",
                (snap_id, h.table_id, cid),
            )
            con.execute(
                "INSERT INTO ducklake_column VALUES "
                "(?, ?, NULL, ?, ?, ?, ?, ?, ?, ?, ?, ?, 'duckdb')",
                (cid, snap_id, h.table_id, row[0], row[1], new_type, row[2], row[3],
                 row[4], row[5], row[6] or "literal"),
            )

        txn.column_changes.setdefault(h.table_id, []).append(op)
        txn.change_log.append(f"altered_table:{h.table_id}")
        self._autocommit()

    def set_partitioned_by(self, name: str, keys: list[tuple[str, str]]) -> None:
        """keys = [(column_name, transform)] with transform in
        identity|year|month|day|hour|bucket(N)
        (reference: ducklake_partition_data.cpp:14-66)."""
        for _cname, transform in keys:
            mb = re.match(r"bucket\s*\((.*)\)\s*$",
                          str(transform or ""), re.I)
            if mb:
                arg = mb.group(1).strip().strip("'\"")
                if not re.fullmatch(r"-?\d+", arg):
                    raise DuckLakeError("Bucket count must be an integer")
                if int(arg) <= 0:
                    raise DuckLakeError("Bucket count must be positive")
                if int(arg) > 2**31 - 1:
                    raise DuckLakeError(
                        "Bucket count cannot exceed the INT32 maximum")
        h = self._handle(name)
        if h.table_id < 0:
            # SET PARTITIONED BY on a table created in this transaction:
            # buffer the spec on the TableDef; the commit writes the
            # partition rows right after the column ids exist and stamps
            # the table's buffered files with the new partition_id
            # (reference partition_rename_in_transaction.test)
            txn = self._begin()
            td = next(
                t for t in txn.created_tables
                if t.schema_name == h.schema_name
                and t.table_name == h.table_name
            )
            known = {c.name for c in td.columns}
            for cname, _transform in keys:
                if cname not in known:
                    raise DuckLakeError(f"no column {cname!r}")
            td.partition_spec = list(keys)
            # the reference logs the alter alongside the create
            # (ducklake_snapshots.test:200: tables_altered on a
            # create+alter transaction); resolved to the real id at
            # commit
            txn.change_log.append(
                f"altered_table:{h.schema_name}.{h.table_name}")
            self._autocommit()
            return
        txn = self._begin()
        # a REDUNDANT alter (same columns, same transforms, same order)
        # is a complete no-op: no new partition spec, no schema_version
        # bump — otherwise files written later in the same transaction
        # split across two partition_ids and every redundant alter
        # rewrites the table's spec row (reference:
        # test/sql/quack/noop_partition_alter_data_files.test). Only the
        # committed spec is compared — a pending alter buffered in this
        # transaction always applies.
        pending = getattr(txn, "_pending_partition_tables", None)
        if pending is None:
            pending = txn._pending_partition_tables = set()
        if h.table_id not in pending:
            colmap_probe = {c[1]: c[0] for c in h.columns}
            want = [(colmap_probe.get(cname), transform)
                    for cname, transform in keys]
            live = self.meta.con.execute(
                "SELECT pc.column_id, pc.transform "
                "FROM ducklake_partition_info pi "
                "JOIN ducklake_partition_column pc "
                "ON pi.partition_id = pc.partition_id "
                "WHERE pi.table_id=? AND pi.end_snapshot IS NULL "
                "ORDER BY pc.partition_key_index",
                (h.table_id,),
            ).fetchall()
            if [tuple(r) for r in live] == want:
                self._autocommit()
                return
        pending.add(h.table_id)
        # the new spec is visible to this transaction's own inserts
        # (basic_partitioning.test:100-124: SET PARTITIONED BY + INSERT
        # in one BEGIN writes partitioned files)
        pspecs = getattr(txn, "pending_partition_specs", None)
        if pspecs is None:
            pspecs = txn.pending_partition_specs = {}
        pspecs[h.table_id] = list(keys)

        def op(con, snap_id, h=h, keys=keys, txn=txn):
            con.execute(
                "UPDATE ducklake_partition_info SET end_snapshot=? "
                "WHERE table_id=? AND end_snapshot IS NULL",
                (snap_id, h.table_id),
            )
            # partition ids draw from the commit's catalog allocator
            # (reference numbering: partitioning/basic_partitioning.test
            # expects the id AFTER schema 0 / table 1)
            pid = txn.alloc_catalog_id()
            con.execute(
                "INSERT INTO ducklake_partition_info VALUES (?, ?, ?, NULL)",
                (pid, h.table_id, snap_id),
            )
            colmap = {c[1]: c[0] for c in h.columns}
            for i, (cname, transform) in enumerate(keys):
                con.execute(
                    "INSERT INTO ducklake_partition_column VALUES (?, ?, ?, ?, ?)",
                    (pid, h.table_id, i, colmap[cname], transform),
                )
            # files buffered under the pending spec get the real id
            # (their insert rows are written after the column ops)
            for f in txn.new_data_files.get(str(h.table_id), []):
                if f.partition_values and f.partition_id is None:
                    f.partition_id = pid

        txn.column_changes.setdefault(h.table_id, []).append(op)
        txn.change_log.append(f"altered_table:{h.table_id}")
        self._autocommit()

    def set_sorted_by(self, name: str, keys: list[tuple]) -> None:
        """keys = [(sort_expr, 'asc'|'desc'[, 'nulls_first'|'nulls_last'])];
        sort_expr is any SQL expression over the table's columns
        (reference: SET SORTED BY with expression keys,
        test/sql/sorted_table/insert_sorted_expression.test; schema
        ducklake_sort_info/ducklake_sort_expression). Applied on insert
        (unless ``sort_on_insert`` is false), on inlined-data flush,
        and on compaction. Does NOT bump schema_version
        (merge_adjacent_sorted_basic.test)."""
        h = self._handle(name)
        norm: list[tuple[str, str, str]] = []
        for item in keys:
            expr, direction = item[0], item[1].lower()
            # duckdb type names in :: casts -> Spark equivalents (the
            # stored dialect is 'spark'; insert_sorted_expression.test
            # uses power(x, x)::varchar keys)
            expr = re.sub(r"::\s*(varchar|text)\b", "::string", expr,
                          flags=re.I)
            expr = re.sub(r"::\s*(hugeint|int128)\b", "::decimal(38,0)",
                          expr, flags=re.I)
            null_order = (item[2].lower() if len(item) > 2 else "nulls_last")
            if direction not in ("asc", "desc"):
                raise DuckLakeError(f"bad sort direction {direction!r}")
            if null_order not in ("nulls_first", "nulls_last"):
                raise DuckLakeError(f"bad null order {null_order!r}")
            norm.append((expr, direction, null_order))
        # analyze (driver-side, no job) so an unknown column or a syntax
        # error is rejected at ALTER time like the reference; stored
        # text stays RAW (macro calls re-bind at every use, so dropping
        # the macro later breaks the flush exactly like the reference —
        # data_inlining_flush_sorted_macro_errors.test)
        probe = self.spark.createDataFrame([], self._spark_schema(h))
        xlate = getattr(self, "sort_expr_translator", None)
        try:
            probe.select(*[F.expr(xlate(e) if xlate else e)
                           for e, _d, _n in norm]).schema
        except Exception as ex:
            raise DuckLakeError(f"SET SORTED BY: invalid sort key: {ex}")
        # a repeated IDENTICAL SET SORTED BY writes no new sort_info
        # generation (merge_adjacent_sorted_repeated.test
        # "prevent_duplicates": exactly 2 sort_expression rows after two
        # identical ALTERs) — but the alter still consumes a catalog id
        # (same test: the next CREATE TABLE gets id 4, not 3)
        duplicate_spec = [(e, d, n) for e, d, n in self._sort_spec(h)] == norm
        txn = self._begin()
        if duplicate_spec:
            key = self._sort_key(h)
            txn.sort_ops.setdefault(key, []).append(
                lambda con, snap_id, txn=txn: txn.alloc_catalog_id())
            if h.table_id >= 0:
                txn.change_log.append(f"altered_table:{h.table_id}")
            self._autocommit()
            return
        # txn-local tables (SET SORTED BY between CREATE and COMMIT,
        # reference insert_sorted_default_direction.test:25-40) buffer
        # by name; the op resolves the committed id
        key = self._sort_key(h)

        def op(con, snap_id, key=key, norm=norm, txn=txn):
            tid = (int(key) if isinstance(key, int) or str(key).isdigit()
                   else txn._resolve_table_id(key))
            con.execute(
                "UPDATE ducklake_sort_info SET end_snapshot=? "
                "WHERE table_id=? AND end_snapshot IS NULL",
                (snap_id, tid),
            )
            # sort_id comes from the GLOBAL catalog-id sequence, like
            # every other catalog entity — a SET SORTED BY consumes an
            # id, so a later CREATE TABLE lands one higher
            # (merge_adjacent_sorted_drop_recreate.test: recreated
            # table_id is 3, not 2)
            sid = txn.alloc_catalog_id()
            con.execute(
                "INSERT INTO ducklake_sort_info VALUES (?, ?, ?, NULL)",
                (sid, tid, snap_id),
            )
            for i, (expr, direction, null_order) in enumerate(norm):
                # reference stores display case: ASC / NULLS_LAST
                con.execute(
                    "INSERT INTO ducklake_sort_expression VALUES "
                    "(?, ?, ?, ?, 'spark', ?, ?)",
                    (sid, tid, i, expr, direction.upper(),
                     null_order.upper()),
                )

        txn.sort_ops.setdefault(key, []).append(op)
        txn.pending_sort_specs[key] = list(norm)
        if h.table_id >= 0:
            txn.change_log.append(f"altered_table:{h.table_id}")
        self._autocommit()

    def reset_sorted_by(self, name: str) -> None:
        """ALTER TABLE ... RESET SORTED BY: close the live sort spec
        (reference: test/sql/sorted_table/drop_sorted_column.test,
        merge_adjacent_sorted_reset.test). No schema_version bump."""
        h = self._handle(name)
        txn = self._begin()
        key = self._sort_key(h)

        def op(con, snap_id, key=key, txn=txn):
            tid = (int(key) if isinstance(key, int) or str(key).isdigit()
                   else txn._resolve_table_id(key))
            con.execute(
                "UPDATE ducklake_sort_info SET end_snapshot=? "
                "WHERE table_id=? AND end_snapshot IS NULL",
                (snap_id, tid),
            )

        txn.sort_ops.setdefault(key, []).append(op)
        txn.pending_sort_specs[key] = []
        if h.table_id >= 0:
            txn.change_log.append(f"altered_table:{h.table_id}")
        self._autocommit()

    def _alter_column(self, name: str, col_name: str, mutate) -> None:
        """Version a single column row: close the live row, insert the
        mutated copy at the new snapshot (the AlterTable pattern of
        ducklake_table_entry.cpp)."""
        h = self._handle(name)
        cur = next((c for c in h.columns if c[1] == col_name), None)
        if cur is None:
            raise DuckLakeError(f"no column {col_name!r}")
        txn = self._begin()

        def op(con, snap_id, h=h, cid=cur[0], mutate=mutate):
            row = con.execute(
                "SELECT column_order, column_name, column_type, initial_default, "
                "default_value, nulls_allowed, parent_column, "
                "default_value_type FROM ducklake_column "
                "WHERE table_id=? AND column_id=? AND end_snapshot IS NULL",
                (h.table_id, cid),
            ).fetchone()
            vals = mutate(dict(zip(
                ["column_order", "column_name", "column_type", "initial_default",
                 "default_value", "nulls_allowed", "parent_column",
                 "default_value_type"], row)))
            if vals["default_value"] != row[4]:
                # SET DEFAULT: classify and store the NEW text like the
                # reference (literal -> rendered value)
                vals["default_value_type"] = _default_kind(
                    vals["default_value"])
                vals["default_value"] = _default_storage_text(
                    vals["default_value"])
            con.execute(
                "UPDATE ducklake_column SET end_snapshot=? "
                "WHERE table_id=? AND column_id=? AND end_snapshot IS NULL",
                (snap_id, h.table_id, cid),
            )
            con.execute(
                "INSERT INTO ducklake_column VALUES "
                "(?, ?, NULL, ?, ?, ?, ?, ?, ?, ?, ?, ?, 'duckdb')",
                (cid, snap_id, h.table_id, vals["column_order"], vals["column_name"],
                 vals["column_type"], vals["initial_default"], vals["default_value"],
                 vals["nulls_allowed"], vals["parent_column"],
                 vals["default_value_type"] or "literal"),
            )

        txn.column_changes.setdefault(h.table_id, []).append(op)
        txn.change_log.append(f"altered_table:{h.table_id}")
        self._autocommit()

    def set_not_null(self, name: str, col_name: str) -> None:
        """reference: ducklake_table_entry.cpp:661-730 — existing rows
        must already satisfy the constraint."""
        h = self._handle(name)
        cur = next((c for c in h.columns
                    if c[1].lower() == col_name.lower()), None)
        pend = (self._txn.pending_not_null.get(h.table_id, set())
                if self._txn is not None else set())
        if (cur is not None and not cur[3]) or col_name in pend:
            # reference: constraints/not_null.test — re-adding errors
            raise DuckLakeError(
                f"column {col_name!r} already has a NOT NULL constraint")
        df = self.table(name)
        if df.filter(F.col(col_name).isNull()).limit(1).count() > 0:
            raise DuckLakeError(
                f"cannot SET NOT NULL: column {col_name!r} contains NULLs"
            )
        if self._explicit_txn and self._txn is not None:
            self._txn.pending_not_null.setdefault(
                h.table_id, set()).add(col_name)
        self._alter_column(name, col_name, lambda v: {**v, "nulls_allowed": 0})

    def drop_not_null(self, name: str, col_name: str) -> None:
        h = self._handle(name)
        cur = next((c for c in h.columns
                    if c[1].lower() == col_name.lower()), None)
        pend = (self._txn.pending_not_null.get(h.table_id, set())
                if self._txn is not None else set())
        if cur is not None and cur[3] and col_name not in pend:
            # reference: constraints/not_null.test
            raise DuckLakeError(
                f"column {col_name!r} has no NOT NULL constraint to drop")
        pend.discard(col_name)
        self._alter_column(name, col_name, lambda v: {**v, "nulls_allowed": 1})

    def set_default(self, name: str, col_name: str, default: str | None) -> None:
        """SET/DROP DEFAULT (ducklake_table_entry.cpp:831): applies to
        future inserts; stored as SQL text."""
        h = self._handle(name)
        self._alter_column(name, col_name, lambda v: {**v, "default_value": default})
        if self._txn is not None:
            self._txn.pending_defaults.setdefault(h.table_id, {})[
                col_name] = (None if default is None else
                             (_default_storage_text(default),
                              _default_kind(default)))

    # -- nested struct field evolution (ducklake_table_entry.cpp:1069-1306) --

    @staticmethod
    def _struct_parts(type_str: str) -> list[tuple[str, str]]:
        from ducklake_spark.catalog.types import _split_top

        m = re.fullmatch(r"struct<(.+)>", type_str)
        if m is None:
            raise DuckLakeError(f"not a struct column: {type_str!r}")
        return [tuple(p.split(":", 1)) for p in _split_top(m.group(1))]

    def _edit_type_at(self, type_str: str, nav: tuple, edit) -> str:
        """Apply ``edit`` to the struct at the end of ``nav``, where nav
        segments walk struct fields by name, a map's ``key``/``value``,
        or a list's ``element`` (reference struct-in-map evolution:
        ALTER TABLE t ADD COLUMN col.value.k INT —
        test/sql/alter/struct_evolution_map_alter.test)."""
        from ducklake_spark.catalog.types import _split_top

        t = type_str.strip()
        if not nav:
            parts = self._struct_parts(t)
            new_parts = edit(parts)
            if not new_parts:
                raise DuckLakeError("cannot drop the last struct field")
            return ("struct<"
                    + ",".join(f"{n}:{ty}" for n, ty in new_parts) + ">")
        seg, rest = nav[0].lower(), nav[1:]
        low = t.lower()
        if low.startswith("map<"):
            kv = _split_top(t[4:-1])
            if seg == "key":
                return f"map<{self._edit_type_at(kv[0], nav[1:], edit)}, {kv[1]}>"
            if seg == "value":
                return f"map<{kv[0]}, {self._edit_type_at(kv[1], rest, edit)}>"
            raise DuckLakeError(f"map has no part {seg!r} (key/value)")
        if low.startswith("list<") and seg == "element":
            return f"list<{self._edit_type_at(t[5:-1], rest, edit)}>"
        if low.startswith("struct<"):
            parts = self._struct_parts(t)
            out, hit = [], False
            for n, ty in parts:
                if n.lower() == seg:
                    out.append((n, self._edit_type_at(ty, rest, edit)))
                    hit = True
                else:
                    out.append((n, ty))
            if not hit:
                raise DuckLakeError(f"no field {nav[0]!r} in {t!r}")
            return ("struct<"
                    + ",".join(f"{n}:{ty}" for n, ty in out) + ">")
        raise DuckLakeError(f"cannot navigate {seg!r} into {t!r}")

    def _mutate_struct(self, name: str, col_name: str, edit,
                       nav: tuple = (), added_paths: tuple = ()) -> None:
        h = self._handle(name)
        self._require_committed(h, "SET DEFAULT")
        cur = next((c for c in h.columns if c[1] == col_name), None)
        if cur is None:
            raise DuckLakeError(f"no column {col_name!r}")
        new_type = self._edit_type_at(cur[2], nav, edit)
        self._apply_nested_type(name, h, cur, new_type, added_paths)

    def _apply_nested_type(self, name: str, h: "TableHandle", cur,
                           new_type: str, added_paths: tuple = ()) -> None:
        """Install a new nested type for a column: regenerate the
        per-leaf child rows, tag ADDED field paths (a field added after
        a file was written must read NULL from that file even when the
        file carries stale same-named bytes — the reference gives
        re-added fields a fresh field id so old data never resurrects,
        struct_evolution_reuse.test), and overlay the type on the open
        transaction's own later statements."""
        col_name = cur[1]
        # regenerate the per-NODE child rows for the new shape (fresh
        # ids: old files' leaf stats stay keyed to the retired ids, so
        # pruning on a renamed/added field keeps them — no-stats ⇒ keep)
        from ducklake_spark.catalog.types import field_nodes

        leaves = field_nodes(new_type)
        txn = self._begin()

        def regen(con, snap_id, h=h, cid=cur[0], leaves=leaves, txn=txn):
            # end-stamp the column's ENTIRE nested subtree (per-node
            # rows: children of children too)
            live = [cid]
            seen = set()
            while live:
                frontier = [i for i in live if i not in seen]
                seen.update(frontier)
                if not frontier:
                    break
                qs = ",".join("?" * len(frontier))
                rows = con.execute(
                    "SELECT column_id FROM ducklake_column "
                    f"WHERE table_id=? AND parent_column IN ({qs}) "
                    "AND end_snapshot IS NULL",
                    (h.table_id, *frontier),
                ).fetchall()
                kids = [r[0] for r in rows]
                if kids:
                    qs2 = ",".join("?" * len(kids))
                    con.execute(
                        "UPDATE ducklake_column SET end_snapshot=? "
                        f"WHERE table_id=? AND column_id IN ({qs2}) "
                        "AND end_snapshot IS NULL",
                        (snap_id, h.table_id, *kids),
                    )
                live = kids
            lid = con.execute(
                "SELECT COALESCE(MAX(column_id), 0) FROM ducklake_column "
                "WHERE table_id=?", (h.table_id,),
            ).fetchone()[0]
            path_to_id = {"": cid}
            for k, nd in enumerate(leaves):
                node_id = lid + 1 + k
                path_to_id[nd["path"]] = node_id
                con.execute(
                    "INSERT INTO ducklake_column VALUES "
                    "(?, ?, NULL, ?, ?, ?, ?, NULL, NULL, 1, ?, "
                    "'literal', 'duckdb')",
                    (node_id, snap_id, h.table_id,
                     node_id, nd["name"], nd["type"],
                     path_to_id[nd["parent_path"]]),
                )

        txn.column_changes.setdefault(h.table_id, []).append(regen)
        if self._explicit_txn:
            txn.pending_column_types.setdefault(
                h.table_id, {})[col_name] = new_type
        for path in added_paths:
            def tag_op(con, snap_id, h=h, cid=cur[0], path=path):
                con.execute(
                    "INSERT INTO ducklake_column_tag VALUES (?, ?, ?, NULL, "
                    "'field_added', ?)",
                    (h.table_id, cid, snap_id, path),
                )

            txn.column_changes.setdefault(h.table_id, []).append(tag_op)
        self._alter_column(name, col_name, lambda v: {**v, "column_type": new_type})

    def add_field(self, name: str, col_name: str, field_name: str,
                  field_type: str, default: str | None = None,
                  if_not_exists: bool = False) -> None:
        """ADD nested FIELD: appended at the end of the struct; old files
        read the new field as NULL (name-resolved nested schema merge) —
        or as ``default`` when given: rows that predate the field
        surface it like ADD COLUMN ... DEFAULT does for top-level
        columns (reference test/sql/default/struct_field_default.test;
        recorded as a ``field_default`` column tag, applied per file
        epoch on the scan — file-backed rows only, inlined older-epoch
        rows keep NULL)."""
        *nav, leaf = field_name.split(".")

        def edit(parts):
            # reference matches case-insensitively (struct_evolution_
            # alter.test: ADD COLUMN col1.K after col1.k -> exists)
            if any(n.lower() == leaf.lower() for n, _ in parts):
                raise DuckLakeError(f"field {leaf!r} already exists")
            return parts + [(leaf, field_type)]

        if if_not_exists:
            # probe with the real navigation (hops list/map containers
            # exactly like the add itself — struct_evolution_list_alter
            # .test ADD COLUMN IF NOT EXISTS on a STRUCT[] column)
            h = self._handle(name)
            cur = next((c for c in h.columns if c[1] == col_name), None)
            if cur is not None:
                try:
                    self._edit_type_at(cur[2], tuple(nav), edit)
                except DuckLakeError as e:
                    if "already exists" in str(e):
                        return
                    raise
        if default is not None and nav:
            raise DuckLakeError(
                "ADD FIELD ... DEFAULT is supported on top-level struct "
                "fields only")
        if default is not None:
            h = self._handle(name)
            cur = next((c for c in h.columns if c[1] == col_name), None)
            if cur is None:
                raise DuckLakeError(f"no column {col_name!r}")
            txn = self._begin()

            def tag_op(con, snap_id, h=h, cid=cur[0]):
                con.execute(
                    "INSERT INTO ducklake_column_tag VALUES (?, ?, ?, NULL, "
                    "'field_default', ?)",
                    (h.table_id, cid, snap_id, f"{field_name}:{default}"),
                )

            txn.column_changes.setdefault(h.table_id, []).append(tag_op)
            # same-transaction reads must already surface the default
            # on pre-existing rows (struct_field_default.test reads
            # k=42 before COMMIT)
            txn.pending_field_defaults.append(
                (h.table_id, cur[0], field_name, default))
        self._mutate_struct(name, col_name, edit, nav=tuple(nav),
                            added_paths=(field_name,))

    def _field_default_log(self, h: TableHandle) -> list[tuple[int, int, str, str]]:
        """[(begin_snapshot, column_id, field, default_sql)] of nested
        ADD FIELD ... DEFAULT tags."""
        out = []
        for cid, snap, val in self.meta.query(
            "SELECT column_id, begin_snapshot, value FROM ducklake_column_tag "
            "WHERE table_id=? AND key='field_default'",
            (h.table_id,),
        ):
            fname, _, dsql = val.partition(":")
            out.append((snap, cid, fname, dsql))
        if self._txn is not None:
            # buffered ADD FIELD ... DEFAULTs postdate every committed
            # snapshot, so every committed epoch's rows fill them
            future = self.meta.latest_snapshot().snapshot_id + 1
            out.extend(
                (future, cid, fname, dsql)
                for tid, cid, fname, dsql in self._txn.pending_field_defaults
                if tid == h.table_id
            )
        return sorted(out)

    def _field_added_log(self, h: TableHandle) -> list[tuple[int, int, str]]:
        """[(begin_snapshot, column_id, dotted_field_path)] of nested
        field ADDs (ADD FIELD and SET DATA TYPE evolution). Files
        written before the add must read the field as NULL even when
        they carry stale same-named bytes from a dropped generation —
        the reference's fresh-field-id rule
        (struct_evolution_reuse.test)."""
        out = []
        for cid, snap, val in self.meta.query(
            "SELECT column_id, begin_snapshot, value FROM ducklake_column_tag "
            "WHERE table_id=? AND key='field_added'",
            (h.table_id,),
        ):
            out.append((snap, cid, val))
        return sorted(out)

    def drop_field(self, name: str, col_name: str, field_name: str) -> None:
        """REMOVE nested FIELD: dropped from the requested read schema;
        bytes in old files are simply never scanned again."""
        *nav, leaf = field_name.split(".")

        def edit(parts):
            if not any(n == leaf for n, _ in parts):
                raise DuckLakeError(f"no field {leaf!r}")
            return [(n, t) for n, t in parts if n != leaf]

        self._mutate_struct(name, col_name, edit, nav=tuple(nav))

    def rename_field(self, name: str, col_name: str, old: str, new: str) -> None:
        """RENAME nested FIELD (metadata-only). Files written before the
        rename still carry the old name; the reader replays the rename
        log per file epoch (``field_rename`` column tags) and rebuilds
        the struct positionally — no data rewrite."""
        h = self._handle(name)
        self._require_committed(h, "RENAME FIELD")
        self._require_committed(h, "DROP FIELD")
        self._require_committed(h, "ADD FIELD")
        cur = next((c for c in h.columns if c[1] == col_name), None)
        if cur is None:
            raise DuckLakeError(f"no column {col_name!r}")

        *nav, leaf = old.split(".")
        hit: dict[str, str] = {}

        def edit(ps):
            # reference matches case-insensitively (RENAME col1.K)
            stored = next(
                (n for n, _ in ps if n.lower() == leaf.lower()), None)
            if stored is None:
                raise DuckLakeError(f"field {leaf!r} does not exist")
            if any(n.lower() == new.lower() for n, _ in ps):
                raise DuckLakeError(f"field {new!r} already exists")
            hit["old"] = stored
            return [(new if n == stored else n, t) for n, t in ps]

        # compute/validate the new type BEFORE recording the rename tag
        new_type = self._edit_type_at(cur[2], tuple(nav), edit)
        txn = self._begin()
        path_old = ".".join([*nav, hit["old"]])

        def tag_op(con, snap_id, h=h, cid=cur[0], old=path_old, new=new):
            con.execute(
                "INSERT INTO ducklake_column_tag VALUES (?, ?, ?, NULL, "
                "'field_rename', ?)",
                (h.table_id, cid, snap_id, f"{old}:{new}"),
            )

        txn.column_changes.setdefault(h.table_id, []).append(tag_op)
        self._apply_nested_type(name, h, cur, new_type)

    def _epoch_schema(
        self, h: TableHandle, reader_schema: T.StructType, later: tuple
    ) -> tuple[T.StructType, list[tuple[str, T.DataType]]]:
        """Revert the renames in ``later`` (newest first) inside
        ``reader_schema``; returns (epoch schema, [(col, current type)]
        fix-ups to cast back after the read)."""
        if not later:
            return reader_schema, []
        name_by_cid = {c[0]: c[1] for c in h.columns}
        fields = {f.name: f for f in reader_schema.fields}
        affected: set[str] = set()
        for snap, cid, old, new in sorted(later, reverse=True):
            cname = name_by_cid.get(cid)
            if cname is None or cname not in fields:
                continue
            *hops, old_leaf = old.split(".")
            reverted = _rename_in_dtype(
                fields[cname].dataType, hops, new, old_leaf)
            if reverted is fields[cname].dataType:
                continue
            fields[cname] = T.StructField(
                cname, reverted, fields[cname].nullable)
            affected.add(cname)
        epoch = T.StructType([fields[f.name] for f in reader_schema.fields])
        fixups = [
            (cname, next(f.dataType for f in reader_schema.fields if f.name == cname))
            for cname in affected
        ]
        return epoch, fixups

    def _rename_log(self, h: TableHandle) -> list[tuple[int, int, str, str]]:
        """[(begin_snapshot, column_id, old, new)] of nested renames."""
        out = []
        for cid, snap, val in self.meta.query(
            "SELECT column_id, begin_snapshot, value FROM ducklake_column_tag "
            "WHERE table_id=? AND key='field_rename'",
            (h.table_id,),
        ):
            old, _, new = val.partition(":")
            out.append((snap, cid, old, new))
        return sorted(out)

    def set_option(self, option: str, value: str, *,
                   table_name: str | None = None,
                   schema_name: str | None = None) -> None:
        """Scoped config (reference: ducklake_set_option.cpp:92-171,
        schema scope ducklake_metadata_manager.cpp:466-482). Table
        scope when ``table_name`` given, schema scope when
        ``schema_name`` given, else global; resolution is
        table > schema > global."""
        self._check_writable()
        if table_name is not None and schema_name is not None:
            # both scopes = the table within that schema (reference
            # per_table_settings.test: schema => 's1', table_name => 't1')
            if "." not in table_name:
                table_name = f"{schema_name}.{table_name}"
            schema_name = None
        if option in ("expire_older_than", "delete_older_than") and (
                table_name is not None or schema_name is not None):
            # reference: these drive catalog-wide maintenance cutoffs
            # (expire_snapshot_table_scoped_option.test)
            raise DuckLakeError(
                f"option '{option}' can only be set globally")
        if option in ("parquet_row_group_size_bytes", "target_file_size"):
            # normalize human sizes ('10KB') to bytes: options() shows
            # the canonical value (parquet_row_group_size_bytes.test)
            value = str(_parse_byte_size(value))
        if option in ("expire_older_than", "delete_older_than") and value:
            # empty string RESETS the option (remove_orphaned_files.test
            # accepts ''), anything else must parse as an interval
            from ducklake_spark.maintenance import _parse_interval

            try:
                _parse_interval(value)
            except Exception:
                raise DuckLakeError(
                    f"{option} is not a valid interval value.")
        if option == "sort_on_insert" and str(value).lower() not in (
                "true", "false", "0", "1"):
            # reference: insert_sorted_sort_on_insert_option.test
            raise DuckLakeError(
                f"Could not convert string '{value}' to BOOL "
                "for option 'sort_on_insert'")
        if option == "rewrite_delete_threshold":
            try:
                frac = float(value)
            except (TypeError, ValueError):
                frac = -1.0
            if not (0.0 <= frac <= 1.0):
                # reference: test_last_snapshot_rewrite.test:148-151
                raise DuckLakeError(
                    "The rewrite_delete_threshold must be between 0 and 1")
        if option == "data_inlining_row_limit" and int(value or 0) > 0:
            self._check_inlining_enableable(table_name,
                                            schema_name=schema_name)
        if table_name is not None:
            h = self._handle(table_name)
            self.meta.set_option(option, value, scope="table", scope_id=h.table_id)
        elif schema_name is not None:
            self.meta.set_option(option, value, scope="schema",
                                 scope_id=self._schema_id(schema_name))
        else:
            self.meta.set_option(option, value)

    def _schema_id(self, schema_name: str) -> int:
        rows = self.meta.query(
            "SELECT schema_id FROM ducklake_schema "
            "WHERE schema_name=? AND end_snapshot IS NULL", (schema_name,))
        if not rows:
            raise DuckLakeError(f"no schema {schema_name!r}")
        return rows[0][0]

    def _pg_identifier_blocked(self, h: TableHandle) -> bool:
        """True when the metadata backend is Postgres and a column name
        exceeds PG's 63-byte identifier limit — inlining would
        silently truncate the inlined-data table's column."""
        from ducklake_spark.catalog.backends import PostgresBackend

        if not isinstance(self.meta.backend, PostgresBackend):
            return False
        return any(len(str(c[1]).encode()) > 63 for c in h.columns)

    def _inline_limit(self, table_id: int | None = None,
                      schema_id: int | None = None) -> int:
        """Effective data_inlining_row_limit (table over schema over
        global — the reference resolves per scope,
        ducklake_set_option.cpp). When no catalog scope sets it, the
        session default ``spark.ducklake.defaultDataInliningRowLimit``
        applies — the analogue of the reference's GLOBAL setting
        ``ducklake_default_data_inlining_row_limit``
        (ducklake_extension.cpp:36-38, reference default 10). We ship
        0: a cluster engine's inserts are rarely 10-row interactive
        statements, and catalog-inlined rows bypass file statistics /
        pruning — opt in per lake, table, or session to match the
        reference's interactive default."""
        if table_id is not None and table_id >= 0:
            v = self.meta.option(
                "data_inlining_row_limit", None,
                scope="table", scope_id=table_id,
                schema_id=schema_id)
        elif schema_id is not None:
            v = self.meta.option(
                "data_inlining_row_limit", None, schema_id=schema_id)
        else:
            v = self.meta.option("data_inlining_row_limit", None)
        if v is not None:
            return int(v or 0)
        if self.session_inline_default is not None:
            return self.session_inline_default
        try:
            return int(self.spark.conf.get(
                "spark.ducklake.defaultDataInliningRowLimit", "0") or 0)
        except Exception:
            return 0

    def _check_inlining_enableable(self, table_name: str | None,
                                   schema_name: str | None = None) -> None:
        """Enabling inlining fails while any affected live table has a
        reserved bookkeeping column name
        (test/sql/data_inlining/inlining_reserved_column_names.test);
        tables with an explicit table-level limit of 0 are exempt from
        the global/schema check."""
        if table_name is not None:
            handles = [self._handle(table_name)]
        else:
            sid = (self._schema_id(schema_name)
                   if schema_name is not None else None)
            handles = []
            for t in self._table_names():
                h = self._handle(t)
                if sid is not None and h.schema_id != sid:
                    continue
                # the most specific EXPLICIT setting that the new value
                # does NOT overwrite wins (table over schema); 0 there
                # means this table can never inline, so the broader
                # enable does not affect it. A schema-level 0 only
                # exempts for a GLOBAL enable — a schema-scope enable
                # replaces it.
                if sid is None:
                    row = self.meta.query(
                        "SELECT value FROM ducklake_metadata WHERE "
                        "key='data_inlining_row_limit' AND "
                        "((scope='table' AND scope_id=?) OR "
                        " (scope='schema' AND scope_id=?)) "
                        "ORDER BY CASE scope WHEN 'table' THEN 0 ELSE 1 "
                        "END LIMIT 1", (h.table_id, h.schema_id),
                    )
                else:
                    row = self.meta.query(
                        "SELECT value FROM ducklake_metadata WHERE "
                        "key='data_inlining_row_limit' AND scope='table' "
                        "AND scope_id=?", (h.table_id,),
                    )
                if row and int(row[0][0] or 0) == 0:
                    continue  # explicitly disabled at a narrower scope
                handles.append(h)
        for h in handles:
            for c in h.columns:
                if c[1].lower() in RESERVED_INLINE_COLS:
                    raise DuckLakeError(
                        "Cannot enable data inlining: table "
                        f"{h.table_name!r} has reserved column name {c[1]!r}"
                    )

    def _view_exists(self, schema_name: str, vname: str) -> bool:
        """Is there a live view of this name — committed (minus this
        transaction's drops/renames) or created in this transaction?"""
        txn = self._txn
        if txn is not None:
            if any(sn == schema_name and vn == vname
                   for sn, vn, *_ in txn.created_views):
                return True
            if any(nn == vname for _vid, nn in txn.renamed_views):
                return True
        rows = self.meta.query(
            "SELECT v.view_id FROM ducklake_view v JOIN ducklake_schema s "
            "ON v.schema_id = s.schema_id "
            "WHERE s.schema_name=? AND v.view_name=? AND v.end_snapshot IS NULL",
            (schema_name, vname),
        )
        if not rows:
            return False
        vid = rows[0][0]
        if txn is not None:
            if vid in txn.dropped_views:
                return False
            rmap = dict(txn.renamed_views)
            if rmap.get(vid, vname) != vname:
                return False  # renamed away in this transaction
        return True

    def create_view(self, name: str, sql: str, dialect: str = "spark",
                    column_aliases: list[str] | None = None) -> None:
        """``column_aliases`` is the reference's ``CREATE VIEW v(x, y)
        AS …`` form (ducklake_view.column_aliases; duckdb_views() shows
        the aliased signature — test/sql/issues/view_tosql_performance
        .test): the view's output columns are renamed positionally.

        Tables and views share one namespace per schema (reference
        test/sql/transaction/create_conflict.test:52-84): creating a
        view over an existing table name — or vice versa — errors."""
        schema_name, vname = self._split_name(name)
        found = self._find_table(schema_name, vname)
        if (found is not None and self._txn is not None
                and found[0] in self._txn.dropped_tables):
            found = None
        table_exists = found is not None or (
            self._txn is not None
            and any(td.schema_name == schema_name and td.table_name == vname
                    for td in self._txn.created_tables)
        )
        if table_exists or self._view_exists(schema_name, vname):
            raise DuckLakeError(
                f"cannot create view {name!r}: an entry with this name "
                "already exists"
            )
        aliases = json.dumps(column_aliases) if column_aliases else None
        txn = self._begin()
        txn.created_views.append((schema_name, vname, dialect, sql, aliases))
        txn.change_log.append(f'created_view:"{schema_name}"."{vname}"')
        self._autocommit()

    def drop_view(self, name: str) -> None:
        schema_name, vname = self._split_name(name)
        # a view created earlier in THIS transaction drops from the
        # buffer; sibling txn-local views are untouched (reference
        # test/sql/catalog/drop_entry_same_schema.test)
        if self._txn is not None:
            for i, (sn, vn, _d, _s, _a) in enumerate(self._txn.created_views):
                if sn == schema_name and vn == vname:
                    del self._txn.created_views[i]
                    self._txn.change_log = [
                        e for e in self._txn.change_log
                        if e != f'created_view:"{sn}"."{vn}"'
                    ]
                    self._autocommit()
                    return
        rows = self.meta.query(
            "SELECT v.view_id FROM ducklake_view v JOIN ducklake_schema s "
            "ON v.schema_id = s.schema_id "
            "WHERE s.schema_name=? AND v.view_name=? AND v.end_snapshot IS NULL",
            (schema_name, vname),
        )
        if self._txn is not None:
            # RENAME then DROP in one txn: the NEW name identifies the
            # view, the old one no longer answers
            rmap = dict(self._txn.renamed_views)
            rows = [r for r in rows if rmap.get(r[0], vname) == vname]
            if not rows:
                rows = [(vid,) for vid, nn in self._txn.renamed_views
                        if nn == vname]
        if not rows:
            raise DuckLakeError(f"no view {name!r}")
        txn = self._begin()
        txn.dropped_views.append(rows[0][0])
        txn.change_log.append(f"dropped_view:{rows[0][0]}")
        self._autocommit()

    def rename_view(self, name: str, new_name: str) -> None:
        """ALTER VIEW ... RENAME TO (reference:
        test/sql/view/ducklake_rename_view.test, rename_view_case.test;
        conflicts per ducklake_transaction_state.cpp:282-285). A view
        created in the current transaction renames in the buffer."""
        schema_name, vname = self._split_name(name)
        new_vname = new_name.split(".")[-1]
        if new_vname.lower() != vname.lower():
            # renaming onto an existing entry errors (reference:
            # view/ducklake_rename_view_incorect.test)
            taken = self.meta.query(
                "SELECT 1 FROM ducklake_view v JOIN ducklake_schema s "
                "ON v.schema_id=s.schema_id WHERE s.schema_name=? "
                "AND v.view_name=? AND v.end_snapshot IS NULL",
                (schema_name, new_vname),
            ) or self.meta.query(
                "SELECT 1 FROM ducklake_table t JOIN ducklake_schema s "
                "ON t.schema_id=s.schema_id WHERE s.schema_name=? "
                "AND t.table_name=? AND t.end_snapshot IS NULL",
                (schema_name, new_vname),
            )
            if taken:
                raise DuckLakeError(
                    f"cannot rename view {name!r} to {new_vname!r}: "
                    "an entry with that name already exists")
        txn = self._begin()
        for i, (sn, vn, dialect, sql, aliases) in enumerate(txn.created_views):
            if sn == schema_name and vn == vname:
                txn.created_views[i] = (sn, new_vname, dialect, sql, aliases)
                txn.view_name_renames[(sn, vname)] = new_vname
                self._autocommit()
                return
        rows = self.meta.query(
            "SELECT v.view_id FROM ducklake_view v JOIN ducklake_schema s "
            "ON v.schema_id = s.schema_id "
            "WHERE s.schema_name=? AND v.view_name=? AND v.end_snapshot IS NULL",
            (schema_name, vname),
        )
        if not rows:
            raise DuckLakeError(f"no view {name!r}")
        txn.renamed_views.append((rows[0][0], new_vname))
        txn.change_log.append(f"altered_view:{rows[0][0]}")
        self._autocommit()

    def view_sql(self, name: str, *, at_version: int | None = None,
                 at_timestamp: str | None = None) -> str:
        schema_name, vname = self._split_name(name)
        if at_version is None and at_timestamp is None \
                and self._pinned is None:
            # a view created earlier in THIS transaction is visible to
            # its own later statements
            if self._txn is not None:
                for sn, vn, _d, sql, _a in self._txn.created_views:
                    if sn == schema_name and vn == vname:
                        return sql
                # txn-local ALTER VIEW RENAME: the new name answers for
                # this transaction's own statements, the old one stops
                # (alter/rename_entity.test renames inside BEGIN)
                rvids = [vid for vid, nn in self._txn.renamed_views
                         if nn == vname]
                if rvids:
                    hit = self.meta.query(
                        "SELECT v.sql FROM ducklake_view v "
                        "JOIN ducklake_schema s ON v.schema_id=s.schema_id "
                        "WHERE s.schema_name=? AND v.view_id IN (%s) "
                        "AND v.end_snapshot IS NULL"
                        % ",".join("?" * len(rvids)),
                        (schema_name, *rvids),
                    )
                    if hit:
                        return hit[0][0]
            rows = self.meta.query(
                "SELECT v.sql, v.view_id FROM ducklake_view v "
                "JOIN ducklake_schema s ON v.schema_id = s.schema_id "
                "WHERE s.schema_name=? AND v.view_name=? AND v.end_snapshot IS NULL",
                (schema_name, vname),
            )
            if rows and self._txn is not None:
                rmap = dict(self._txn.renamed_views)
                rows = [r for r in rows
                        if rmap.get(r[1], vname) == vname]
            if not rows:
                raise DuckLakeError(f"no view {name!r}")
            return rows[0][0]
        snap = self._resolve_snapshot(at_version, at_timestamp)
        rows = self.meta.query(
            "SELECT v.sql FROM ducklake_view v JOIN ducklake_schema s "
            "ON v.schema_id = s.schema_id "
            "WHERE s.schema_name=? AND v.view_name=? "
            "AND v.begin_snapshot <= ? "
            "AND (v.end_snapshot IS NULL OR v.end_snapshot > ?)",
            (schema_name, vname, snap.snapshot_id, snap.snapshot_id),
        )
        if not rows:
            raise DuckLakeError(
                f"view {name!r} does not exist at version {snap.snapshot_id}"
            )
        return rows[0][0]

    def view(self, name: str, *, at_version: int | None = None,
             at_timestamp: str | None = None) -> DataFrame:
        """Bind a stored view: register lake tables and run its SQL.
        ``{DUCKLAKE_CATALOG}`` placeholders (reference:
        ducklake_view_entry.cpp:125,141 — kept so views survive catalog
        renames) resolve to the session's unqualified temp views.
        Time travel binds BOTH the view definition and every table at
        the pinned snapshot (test/sql/time_travel/time_travel_views.test)."""
        sql = self.view_sql(
            name, at_version=at_version, at_timestamp=at_timestamp
        ).replace("{DUCKLAKE_CATALOG}.", "")
        snap = self._resolve_snapshot(at_version, at_timestamp)
        qual_rewrites: list[tuple[str, str]] = []
        for t in self._table_names(snap if (at_version is not None
                                            or at_timestamp is not None
                                            or self._pinned is not None)
                                   else None):
            df = self.table(
                t, at_version=at_version, at_timestamp=at_timestamp
            )
            sname, tname_ = t.split(".", 1)
            df.createOrReplaceTempView(tname_)
            if sname != "main":
                # a view body may reference `schema.table`; Spark has no
                # lake schemas, so alias it to a flat temp view
                # (time_travel_views.test: s1_view over s1.test)
                flat = f"{sname}__{tname_}"
                df.createOrReplaceTempView(flat)
                qual_rewrites.append(
                    (rf"\b{re.escape(sname)}\s*\.\s*{re.escape(tname_)}\b",
                     flat))
            else:  # `main.t` in a stored body binds the bare temp view
                qual_rewrites.append(
                    (rf"\bmain\s*\.\s*{re.escape(tname_)}\b", tname_))
        for pat, flat in qual_rewrites:
            sql = re.sub(pat, flat, sql, flags=re.I)
        # `main.x` where x is a sibling VIEW (no table rewrite matched)
        sql = re.sub(r"\bmain\s*\.\s*(\w+)\b", r"\1", sql)
        # an explicit AT (VERSION/TIMESTAMP => x) inside the stored body
        # takes priority over the view's own pinning
        # (time_travel_views.test:97-104)
        def _at(m: re.Match) -> str:
            raw = m.group(3).strip().strip("'")
            df_ = (self.table(m.group(1), at_version=int(raw))
                   if m.group(2).upper() == "VERSION"
                   else self.table(m.group(1), at_timestamp=raw))
            nm = f"__at_{m.group(1).replace('.', '_')}_{raw.replace('-', '_').replace(':', '_').replace(' ', '_').replace('.', '_')}"
            df_.createOrReplaceTempView(nm)
            return nm

        sql = re.sub(
            r"\b(\w+(?:\.\w+)*)\s+AT\s*\(\s*(VERSION|TIMESTAMP)\s*=>"
            r"\s*([^)]+)\)", _at, sql, flags=re.I)
        # views may reference OTHER views (view/dangling_view_columns
        # v2-on-v1): bind the remaining live views to a fixpoint —
        # each pass binds every view whose dependencies already resolve
        schema_name, target = self._split_name(name)
        arow = self.meta.query(
            "SELECT v.column_aliases FROM ducklake_view v "
            "JOIN ducklake_schema s ON v.schema_id = s.schema_id "
            "WHERE s.schema_name=? AND v.view_name=? "
            "AND v.begin_snapshot <= ? "
            "AND (v.end_snapshot IS NULL OR v.end_snapshot > ?)",
            (schema_name, target, snap.snapshot_id, snap.snapshot_id),
        )
        target_aliases = (
            json.loads(arow[0][0]) if arow and arow[0][0] else None
        )
        others = []
        for vn, vsql, valias in self.meta.query(
            "SELECT view_name, sql, column_aliases FROM ducklake_view "
            "WHERE begin_snapshot <= ? "
            "AND (end_snapshot IS NULL OR end_snapshot > ?)",
            (snap.snapshot_id, snap.snapshot_id),
        ):
            if vn == target:
                continue
            vsql = vsql.replace("{DUCKLAKE_CATALOG}.", "")
            for pat, flat in qual_rewrites:
                vsql = re.sub(pat, flat, vsql, flags=re.I)
            # sibling views referenced as `main.x` bind their bare names
            vsql = re.sub(r"\bmain\s*\.\s*(\w+)\b", r"\1", vsql)
            others.append(
                (vn, vsql, json.loads(valias) if valias else None))
        # drop temp views left over from earlier binds of since-dropped
        # lake views (they would mask the drop)
        live = {target} | {vn for vn, _, _ in others}
        for stale in getattr(self, "_bound_views", set()) - live:
            self.spark.catalog.dropTempView(stale)
        self._bound_views = set(live)
        pending = list(others)
        for _round in range(len(others)):
            still = []
            for vn, vsql, valias in pending:
                try:
                    vdf = self.spark.sql(vsql)
                    if valias:
                        vdf = vdf.toDF(*(list(valias)
                                         + vdf.columns[len(valias):]))
                    vdf.createOrReplaceTempView(vn)
                except Exception:
                    still.append((vn, vsql, valias))  # deps not bound yet
            if not still or len(still) == len(pending):
                break
            pending = still
        out = self.spark.sql(sql)
        if target_aliases:
            # CREATE VIEW v(x, y) AS …: positional output renames; a
            # PARTIAL alias list renames the leading columns only
            # (reference view/ducklake_view.test: CREATE VIEW v(a) AS
            # SELECT 42 AS X, 84 AS Y)
            out = out.toDF(*(list(target_aliases)
                             + out.columns[len(target_aliases):]))
        return out

    # -- insert ------------------------------------------------------------

    def insert(self, name: str, df: DataFrame) -> int:
        """INSERT INTO: write parquet (executors) then commit metadata
        (driver) — the two-phase shape of reference ducklake_insert.cpp
        :802-853 with Spark's job success as the data barrier.
        Returns the inserted row count, read from the written files'
        footers (no extra counting job)."""
        self._check_writable()  # before any parquet lands on disk
        h = self._handle(name)
        schema = self._spark_schema(h)
        df = self._conform(df, schema, h)

        inline_limit = self._inline_limit(h.table_id, h.schema_id)
        if any("geometry" in str(c[2] or "").lower() for c in h.columns):
            # GEOMETRY columns are never inlined (reference
            # DuckLakeMetadataManager::SupportsInlining,
            # ducklake_metadata_manager.cpp:97-102 — geo stats need a
            # real parquet file; ducklake_geometry.test expects a file
            # stats row for a 1-row insert)
            inline_limit = 0
        if inline_limit > 0 and self._pg_identifier_blocked(h):
            # a Postgres catalog truncates identifiers at 63 bytes —
            # the inlined-data table could not carry the column, so
            # such tables never inline (reference SupportsInlining;
            # data_inlining/postgres_identifier_limit.test)
            inline_limit = 0
        if (inline_limit > 0 and h.table_id >= 0 and not (
                self._txn is not None
                and self._txn.pending_columns.get(h.table_id))):
            # txn-local tables (id assigned at commit) always write
            # parquet — the inlined-data tables need a real table id.
            # Same for tables with a txn-local ADD COLUMN: the epoch
            # inlined table for the post-alter schema does not exist
            # until the commit bumps the schema version, so those rows
            # take the parquet path (semantics match; storage differs
            # from the reference's in-memory txn-local inlined data)
            head = df.limit(inline_limit + 1).collect()
            if head and len(head) <= inline_limit:
                self._insert_inlined(h, schema, head)
                return len(head)
            if not head:
                # a 0-row insert writes one EMPTY data file, never an
                # empty inlined batch (reference writer semantics —
                # repro_merge_adjacent_zero_output.test)
                pass

        part_keys = self._partition_spec(h)
        sort_spec = self._sort_spec(h)
        # sort_on_insert (default true) controls whether INSERT applies
        # the table's sort spec; flush/compaction always honor it
        # (test/sql/sorted_table/insert_sorted_sort_on_insert_option)
        if sort_spec and (
            self.meta.option("sort_on_insert", "true",
                             scope="table", scope_id=h.table_id,
                             schema_id=h.schema_id) or "true"
        ).lower() == "false":
            sort_spec = []
        files = self._write_parquet(h, df, schema, part_keys, sort_spec,
                                    keep_empty=True)
        txn = self._begin()
        # txn-local tables buffer by name: ids exist only after commit
        key = (str(h.table_id) if h.table_id >= 0
               else f"{h.schema_name}.{h.table_name}")
        txn.new_data_files.setdefault(key, []).extend(files)
        txn.change_log.append(f"inserted_into_table:{key}")
        self._autocommit()
        return sum(f.record_count for f in files)

    def create_table_as(self, name: str, df: DataFrame) -> None:
        """CTAS = create + insert in one snapshot (ducklake_insert.cpp:855-885)."""
        with self.transaction():
            self.create_table(name, df.schema)
            schema_name, table_name = self._split_name(name)
            td = next(
                t for t in self._txn.created_tables
                if t.schema_name == schema_name and t.table_name == table_name
            )
            # files must be written before commit; column ids are assigned at
            # commit, so pre-assign them here from a reservation
            self._preassign_column_ids(td)
            h = TableHandle(
                table_id=-1, table_uuid=td.table_uuid, schema_id=-1,
                schema_name=schema_name, table_name=table_name, path=td.path,
                columns=[(c.column_id, c.name, c.type, c.nulls_allowed) for c in td.columns],
            )
            schema = self._spark_schema(h)
            key = f"{schema_name}.{table_name}"
            inline_limit = self._inline_limit()
            if inline_limit > 0:
                # small CTAS output inlines into the catalog like a
                # small INSERT (reference routes the CTAS insert half
                # through DuckLakeInlineData;
                # data_inlining_delete.test expects NO files on disk)
                conf = self._conform(df, schema, h)
                head = conf.limit(inline_limit + 1).collect()
                if len(head) <= inline_limit:
                    from ducklake_spark.transaction import PENDING_SNAPSHOT

                    packed = [
                        (i, PENDING_SNAPSHOT, None)
                        + tuple(_to_sql_value(v, f_.dataType)
                                for v, f_ in zip(r, schema.fields))
                        for i, r in enumerate(head)
                    ]
                    self._txn.inlined_ctas.append((key, packed, [
                        (c.column_id, c.name, c.type) for c in td.columns]))
                    self._txn.change_log.append(f"inlined_insert:{key}")
                    return
            files = self._write_parquet(h, self._conform(df, schema, h),
                                        schema, [], [], keep_empty=True)
            self._txn.new_data_files.setdefault(key, []).extend(files)
            self._txn.change_log.append(
                f"inserted_into_table:{schema_name}.{table_name}"
            )

    def _preassign_column_ids(self, td: TableDef) -> None:
        # reference column ids are PER TABLE (GetNextColumnId:
        # ducklake_metadata_manager.cpp:4965-4982 allocates
        # MAX(column_id)+1 within the table) and a fresh table numbers
        # its fields from 1 in a pre-order walk — root, then its nested
        # leaves — which is also what the parquet field_ids record
        # (test/sql/schema_evolution/field_ids.test). Concurrent CTAS
        # can't collide: the ids only need uniqueness within the table.
        nxt = 1
        for c in td.columns:
            if c.column_id is None:
                c.column_id = nxt
            nxt = max(nxt, c.column_id) + 1
            for ch in td.child_columns:
                # child rows carry the parent's ABSOLUTE dotted path;
                # rows under this column share its root segment and sit
                # in pre-order DFS within the list
                root = str(ch.parent_column).split(".", 1)[0]
                if root == c.name:
                    if ch.column_id is None:
                        ch.column_id = nxt
                    nxt = max(nxt, ch.column_id) + 1
        for ch in td.child_columns:  # defensive: unparented child rows
            if ch.column_id is None:
                ch.column_id = nxt
                nxt += 1

    def _conform(self, df: DataFrame, schema: T.StructType, h: TableHandle) -> DataFrame:
        names = [f.name for f in schema.fields]
        missing = [n for n in names if n not in df.columns]
        defaults = {}
        if missing:
            defaults = {
                cname: _default_expr_text(dv, kind)
                for cname, dv, kind in self.meta.query(
                    "SELECT column_name, default_value, default_value_type "
                    "FROM ducklake_column "
                    "WHERE table_id=? AND end_snapshot IS NULL "
                    "AND default_value IS NOT NULL",
                    (h.table_id,),
                )
            }
            if self._txn is not None:  # txn-local ADD COLUMN ... DEFAULT
                for _cid, cname, _ctype, dflt in (
                        self._txn.pending_columns.get(h.table_id, [])):
                    if dflt is not None:
                        defaults.setdefault(cname, dflt)
                # txn-local SET/DROP DEFAULT overrides the committed one
                for cname, pv in self._txn.pending_defaults.get(
                        h.table_id, {}).items():
                    if pv is None:
                        defaults.pop(cname, None)
                    else:
                        defaults[cname] = _default_expr_text(*pv)
                if h.table_id < 0:
                    # table created in THIS transaction: its DEFAULTs
                    # live on the buffered TableDef, not the catalog
                    # (test/sql/default/default_values.test inserts
                    # with a column list before COMMIT)
                    for td in self._txn.created_tables:
                        if (td.schema_name == h.schema_name
                                and td.table_name == h.table_name):
                            for c in td.columns:
                                if c.default_value is not None:
                                    defaults.setdefault(
                                        c.name, c.default_value)
        for n in missing:
            # stored DEFAULT (SQL text, dialect 'spark') applies to new rows
            df = df.withColumn(
                n, F.expr(defaults[n]) if n in defaults else F.lit(None)
            )
        # Spark 4 native VariantType inserts into VARIANT/JSON columns
        # (stored as JSON text; read back natively via variant_as_native)
        by_name = {f_.name: f_.dataType for f_ in df.schema.fields}
        for n, f_ in zip(names, schema.fields):
            if isinstance(by_name.get(n), T.VariantType) and isinstance(
                f_.dataType, T.StringType
            ):
                df = df.withColumn(n, F.to_json(F.col(n)))
        # TIME columns live as micros-since-midnight (Spark has no TIME
        # type); 'HH:MM:SS[.ffffff]' strings convert on the way in
        ctypes = {c[1]: (c[2] or "").lower().split("(")[0] for c in h.columns}
        for n in names:
            # Spark 4 TIME literals arrive as TimeType — convert to the
            # stored micros-since-midnight unit (CAST to LONG alone
            # truncates to SECONDS, silently mixing units with adopted
            # time64 files)
            if ctypes.get(n) in ("time", "timetz") and type(
                    by_name.get(n)).__name__ == "TimeType":
                df = df.withColumn(
                    n, (F.col(n).cast(T.DecimalType(18, 6))
                        * 1_000_000).cast(T.LongType()))
            if ctypes.get(n) in ("time", "timetz") and isinstance(
                    by_name.get(n), T.StringType):
                df = df.withColumn(
                    n,
                    (F.unix_micros(F.to_timestamp(
                        F.concat(F.lit("1970-01-01 "),
                                 F.regexp_replace(F.col(n), r"[+-]\d\d:?\d*$",
                                                  "")))))
                )
        for n in names:
            if ctypes.get(n) == "interval" and isinstance(
                    by_name.get(n), T.StringType):
                # duckdb renders intervals as '1 day'/'01:00:00'; Spark's
                # day-time interval cast rejects that text — rebuild via
                # make_dt_interval (month-grain parts don't fit the Spark
                # type and fold to 30-day approximations like the
                # catalog's interval ordering does)
                c = F.col(n)
                num = lambda pat: F.coalesce(  # noqa: E731
                    F.expr(
                        "try_cast(regexp_extract(`%s`, '%s', 1) AS DOUBLE)"
                        % (n, pat.replace("\\", "\\\\"))),
                    F.lit(0.0))
                df = df.withColumn(
                    n,
                    F.when(c.isNull(), F.lit(None)).otherwise(
                        F.expr("make_dt_interval(0, 0, 0, 0)")
                        + F.make_dt_interval(
                            (num(r"(-?\d+)\s+day")
                             + num(r"(-?\d+)\s+mon") * F.lit(30)
                             + num(r"(-?\d+)\s+year") * F.lit(365)
                             ).cast("int"),
                            num(r"(\d+):\d+:").cast("int"),
                            num(r":(\d+):").cast("int"),
                            num(r":(\d+(?:\.\d+)?)$"),
                        )))
        by_final = {f_.name: f_.dataType for f_ in df.schema.fields}
        df = df.select([
            _coerce_by_name(F.col(n), by_final.get(n), f.dataType).alias(n)
            for n, f in zip(names, schema.fields)
        ])
        return self._enforce_not_null(df, h)

    def _enforce_not_null(self, df: DataFrame, h: TableHandle) -> DataFrame:
        """NOT NULL enforcement at write time (reference supports NOT
        NULL — ducklake_table_entry.cpp:661-730; PRIMARY KEY/CHECK are
        rejected). Shared by INSERT (_conform) and the UPDATE/MERGE
        replacement writers — an UPDATE ... SET col=NULL previously
        bypassed the check and committed an unreadable file
        (test/sql/update/update_not_null.test)."""
        pending_nn: set[str] = set()
        if self._txn is not None:
            # SET NOT NULL earlier in this open transaction binds its
            # own later inserts (constraints/not_null.test:72-83)
            pending_nn = {
                c.lower() for c in self._txn.pending_not_null.get(
                    h.table_id, set())
            }
        for _cid, cname, _ctype, nulls_allowed in h.columns:
            if not nulls_allowed or cname.lower() in pending_nn:
                df = df.withColumn(
                    cname,
                    F.when(
                        F.col(cname).isNull(),
                        F.raise_error(f"NOT NULL constraint failed: column {cname}"),
                    ).otherwise(F.col(cname)),
                )
        return df

    def _write_parquet(self, h: TableHandle, df: DataFrame, schema: T.StructType,
                       part_keys, sort_spec,
                       rotate: bool = True,
                       rotate_chunk_rows: float = 2048.0,
                       keep_empty: bool = False) -> list[DataFileInfo]:
        import pyarrow.parquet as pq

        table_dir = os.path.join(self.data_path, h.path)
        tmp = os.path.join(table_dir, f".tmp_{uuid.uuid4().hex}")
        # control-plane file ops go through the pyarrow.fs seam (lfs):
        # object stores have no POSIX mkdir/glob/rename (fsio.LakeFS)
        self.lfs.makedirs(self.lfs.strip_scheme(table_dir))

        # attach parquet field ids (column metadata survives into the file
        # footer with spark.sql.parquet.fieldId.write.enabled) so files are
        # schema-mapped by id, not name — same idea as Iceberg (SURVEY §1.2)
        id_by_name = {cname: cid for cid, cname, _t, _na in h.columns}
        id_by_name[ROWID_COL] = ROWID_FIELD_ID
        id_by_name[SNAPID_COL] = SNAPID_FIELD_ID
        colmap = self._leaf_colmap(h)  # per-node nested ids (pq paths)
        out = df.select(
            [
                F.col(f_.name).alias(
                    f_.name, metadata={"parquet.field.id": id_by_name[f_.name]}
                )
                if f_.name in id_by_name
                else F.col(f_.name)
                for f_ in df.schema.fields
            ]
        )
        if any("." in k for k in colmap):
            # nested STRUCT members get their per-node ids stamped at
            # write time (Spark's writer reads parquet.field.id off any
            # StructField, however deep — executor-side, no rewrite);
            # only the synthetic list/map element nodes need the
            # pyarrow post-pass below
            new_fields = [
                T.StructField(
                    f_.name,
                    _spark_type_with_ids(f_.dataType, f_.name, colmap),
                    f_.nullable, f_.metadata)
                for f_ in out.schema.fields
            ]
            out = out.to(T.StructType(new_fields))

        writer = out
        part_cols = []
        # files written under a live spec are stamped with its id so
        # partition pruning never interprets their values under a LATER
        # spec (reference: ducklake_data_file.partition_id)
        part_pid = self._partition_spec_id(h) if part_keys else None
        if part_keys:
            for i, (cname, transform) in enumerate(part_keys):
                writer = writer.withColumn(f"__part_{i}", _transform_col(cname, transform))
                part_cols.append(f"__part_{i}")
        opt = lambda k, d=None: self.meta.option(
            k, d, scope="table", scope_id=h.table_id, schema_id=h.schema_id)
        if part_cols and (
            opt("partition_write_shuffle", "true") or "true"
        ).lower() != "false":
            # co-locate each partition value into one task before the
            # partitioned write: without this every task emits one file
            # per value it happens to hold, so a 1000-executor ingest
            # into a 1000-value partitioning writes up to 10^6 tiny
            # files (tasks × values). One hash shuffle on the transform
            # columns caps output at ~one file per value while keeping
            # value-level parallelism. partition_write_shuffle=false
            # restores the shuffle-free path for already-clustered
            # inputs.
            writer = writer.repartition(*[F.col(c) for c in part_cols])
        if sort_spec:
            writer = writer.sortWithinPartitions(*_sort_columns(sort_spec))
        # session setting overrides every metadata scope (reference
        # SET ducklake_target_file_size, insert_session_target_file_size)
        session_tfs = getattr(self, "session_target_file_size", None)
        target_file_size = (parse_memory_limit(str(session_tfs))
                            if session_tfs
                            else parse_memory_limit(opt("target_file_size",
                                                        "0")))
        enc_key = None
        if self.encrypted:
            import base64 as _b64

            enc_key = _b64.b64encode(os.urandom(16)).decode()
        # per_thread_output=false -> one output file (reference COPY
        # semantics, ducklake_insert.cpp:531-534); unset keeps Spark's
        # parallel one-file-per-task default (== per_thread_output=true)
        pto = (opt("per_thread_output")
               or getattr(self, "session_pto_default", "")
               or "").lower()
        if pto == "false":
            writer = writer.coalesce(1)
        elif pto == "true" and writer.rdd.getNumPartitions() == 1:
            # explicit per-thread output fans a single-partition plan
            # back out (settings/per_thread_output.test expects multiple
            # files even when the source read collapsed to one split)
            writer = writer.repartition(
                self.spark.sparkContext.defaultParallelism)
        w = writer.write.mode("overwrite")
        if target_file_size and target_file_size // 200 >= 10_000:
            # coarse in-flight rotation from a bytes/row estimate; the
            # exact size-based split below corrects the stragglers.
            # Micro targets (< ~2MB, reference tests) skip the guess —
            # the post-split alone lands the exact reference file count
            # (insert_partitioned_file_size.test: 5 per partition).
            # The rate comes from the table's OWN stats when it has
            # data (duckdb rotates on actual written bytes — a fixed
            # 200B/row guess split a 28B/row lineitem insert into 3
            # files where the reference writes 1:
            # compaction/compaction_size_limit.test); a fresh table
            # falls back to the conservative 200B/row guess only when
            # the target is large enough that one unsplit file would
            # be painful to rewrite.
            rate = 0
            try:
                strow = self.meta.query(
                    "SELECT record_count, file_size_bytes FROM "
                    "ducklake_table_stats WHERE table_id=?",
                    (h.table_id,))
                if strow and strow[0][0]:
                    rate = max(1, int(strow[0][1]) // int(strow[0][0]))
            except Exception:
                pass
            if rate:
                if target_file_size // rate >= 10_000:
                    w = w.option("maxRecordsPerFile",
                                 target_file_size // rate)
            elif target_file_size >= (64 << 20):
                w = w.option("maxRecordsPerFile",
                             target_file_size // 200)
        def _format_opts(w):
            """Writer options shared by the main write and the
            size-rotation re-split below."""
            compression = opt("parquet_compression")
            if compression:  # uncompressed/snappy/gzip/zstd/lz4 (ducklake_set_option.cpp:92)
                if compression.lower() == "lz4":
                    # duckdb's 'lz4' writes parquet LZ4_RAW; Spark's
                    # 'lz4' is the legacy Hadoop-framed codec other
                    # readers reject (per_table_settings.test pins
                    # LZ4_RAW in the footer)
                    compression = "lz4_raw"
                w = w.option("compression", compression)
            rg_size = opt("parquet_row_group_size")
            if rg_size:
                # duckdb's row_group_size is a ROW count; parquet-mr
                # splits by BYTES, checking at page-row intervals — pin
                # the check interval to the row count and shrink the
                # byte target so every check flushes: groups of exactly
                # rg_size rows
                w = (w.option("parquet.page.size.row.check.min", rg_size)
                     .option("parquet.page.size.row.check.max", rg_size)
                     .option("parquet.block.size", 1))
            rg_bytes = opt("parquet_row_group_size_bytes")
            if rg_bytes:
                w = w.option("parquet.block.size", _parse_byte_size(rg_bytes))
            pv_opt = opt("parquet_version")
            if pv_opt:  # reference normalizes to 'V1'/'V2' (ducklake_set_option.cpp:108)
                w = w.option(
                    "parquet.writer.version",
                    "PARQUET_2_0" if str(pv_opt).upper().lstrip("V") == "2"
                    else "PARQUET_1_0",
                )
            comp_level = opt("parquet_compression_level")
            if comp_level and (compression or "").lower() == "zstd":
                w = w.option("parquet.compression.codec.zstd.level",
                             comp_level)
            if enc_key:
                w = (
                    w.option("parquet.crypto.factory.class",
                             "ducklake.DuckLakeCrypto")
                    .option("ducklake.encryption.write.key", enc_key)
                    .option("ducklake.encryption.write.key.id",
                            _crypto_key_id(enc_key))
                )
            return w

        w = _format_opts(w)
        if part_cols:
            w = w.partitionBy(*part_cols)
        w.parquet(tmp)
        if target_file_size and rotate:
            # INSERT/CTAS/rewrite: compaction sizes its own outputs
            # (repartitionByRange on rowid) — a second split there
            # would double-rotate
            rg_opt = opt("parquet_row_group_size")
            self._rotate_oversized(tmp, target_file_size, _format_opts,
                                   enc_key,
                                   rg_rows=int(rg_opt) if rg_opt else None,
                                   chunk_rows=rotate_chunk_rows)
        if not enc_key and not any(opt(k) for k in (
                "parquet_compression", "parquet_row_group_size",
                "parquet_row_group_size_bytes", "parquet_version",
                "parquet_compression_level")):
            self._slim_small_files(tmp, field_ids=colmap)

        infos: list[DataFileInfo] = []
        # hive_file_pattern (default true, reference
        # disable_hive_partitioning.test): partitioned files land in
        # <col>=<value>/ subdirs; false keeps a flat layout — either way
        # the catalog's partition values are the planning source of truth
        hive_dirs = (opt("hive_file_pattern", "true") or "true").lower() != "false"
        if self.encrypted:
            # an ENCRYPTED lake must not leak partition values through
            # the directory layout (reference
            # test/sql/encryption/partitioning_encryption.test: paths
            # carry no part_key=... segment); the catalog's partition
            # values stay the planning source of truth
            hive_dirs = False
        tmp_fs = self.lfs.strip_scheme(tmp)
        data_fs = self.lfs.strip_scheme(self.data_path).rstrip("/") + "/"
        for path in self.lfs.list_files(tmp_fs, suffix=".parquet"):
            rel_parts = path[len(tmp_fs):].lstrip("/").split("/")
            part_values: list[tuple[int, str]] = []
            for seg in rel_parts[:-1]:
                k, _, v = seg.partition("=")
                idx = int(k.split("_")[-1])
                # Spark Hadoop-escapes specials in partition dir names
                # ('%'->'%25', ':'->'%3A', ...): store the RAW value, the
                # catalog holds one encoding (pruning compares raw);
                # hive's NULL sentinel is stored as SQL NULL (reference
                # merge_adjacent_null_partition.test)
                v2 = urllib.parse.unquote(v)
                part_values.append(
                    (idx,
                     None if v2 == "__HIVE_DEFAULT_PARTITION__" else v2))
            # h.path may carry a trailing '/' — normalize so the
            # registered relative path never contains '//'
            dest_dir = self.lfs.strip_scheme(table_dir).rstrip("/")
            if hive_dirs and part_values and part_keys:
                for idx, v in part_values:
                    if idx < len(part_keys):
                        cname, tf = part_keys[idx]
                        # transform partitions name the dir after the
                        # TRANSFORM like the reference (year=2025/
                        # month=9) — repeating the column name would
                        # also collide when one column carries several
                        # transforms (merge_timestamp.test)
                        key = (cname if tf == "identity"
                               else tf.split("(")[0])
                    else:
                        key = f"p{idx}"
                    # duckdb's hive-dir encoding escapes only %, /, =
                    # and control chars — notably NOT space
                    # (merge_adjacent_external_hive_paths.test pins the
                    # 'weird=a%2Fb%3Dc%25 d' segment byte-for-byte)
                    vtxt = ("__HIVE_DEFAULT_PARTITION__" if v is None
                            else "".join(
                                f"%{ord(c):02X}"
                                if c in "%/=" or ord(c) < 0x20 else c
                                for c in v))
                    dest_dir = "/".join((dest_dir, f"{key}={vtxt}"))
                self.lfs.makedirs(dest_dir)
            final = f"{dest_dir}/ducklake-{uuid.uuid4().hex}.parquet"
            # a move within the table prefix: rename on local/HDFS,
            # server-side copy+delete on S3 (pyarrow handles either)
            self.lfs.move(path, final)
            infos.append(
                DataFileInfo(
                    path=final[len(data_fs):],
                    record_count=0,  # filled by the footer harvest below
                    file_size_bytes=0,
                    footer_size=0,
                    partition_values=part_values,
                    partition_id=part_pid,
                    encryption_key=enc_key,
                )
            )
        self.lfs.rmtree(tmp_fs)
        self._harvest_file_meta(infos, colmap)
        # TIME columns persist as int64 µs in parquet; their footer
        # stats arrive as raw ints — store duckdb's clock-text form so
        # the file/global stats rows read like the reference's
        time_cids = {c[0]: ("+00" if str(c[2]).lower() == "timetz"
                            else "")
                     for c in h.columns
                     if str(c[2] or "").lower() in ("time", "timetz")}
        if time_cids:
            for fi in infos:
                for cs in fi.column_stats:
                    if cs.column_id in time_cids:
                        for attr in ("min_value", "max_value"):
                            v = getattr(cs, attr)
                            if v is not None and re.fullmatch(
                                    r"-?\d+", str(v)):
                                setattr(cs, attr,
                                        _us_to_time_text(int(v))
                                        + time_cids[cs.column_id])
        # empty part files (Spark can emit one per empty partition) are
        # never registered alongside real data — but a WHOLLY empty
        # INSERT/CTAS registers exactly one 0-row file, like the
        # reference writer whose opened file always lands
        # (repro_merge_adjacent_zero_output.test: 4 empty inserts ->
        # 4 files with record_count 0). Only the insert paths pass
        # keep_empty: rewrite/compaction/flush/DML drop fully-empty
        # output with NO replacement file
        # (rewrite_deletes_full_file_delete_after_flush.test:85
        # expects files_created=0 on a fully-deleted source file)
        empties = [f for f in infos if f.record_count == 0]
        infos = [f for f in infos if f.record_count]
        if keep_empty and not infos and empties:
            infos, empties = [empties[0]], empties[1:]
        for f in empties:
            self.lfs.remove(self.lfs.strip_scheme(
                os.path.join(self.data_path, f.path)))
        self._attach_extra_stats(h, infos, enc_key)
        return infos

    # files below this size are re-serialized without Spark's footer
    # key-values / arrow schema / dictionary pages — parquet-mr's fixed
    # per-file overhead (~400B) otherwise dominates tiny files, throwing
    # off every size-based decision the catalog later makes against
    # reference-tuned byte thresholds (merge_adjacent_file_size_filter
    # .test: 10-row files must sit under max_file_size=>1000)
    SLIM_FILE_MAX_BYTES = 4096

    def _slim_small_files(self, tmp: str,
                          field_ids: dict | None = None) -> None:
        """Re-serialize tiny freshly-written files via pyarrow: strips
        Spark's schema key-values and dictionary overhead (field ids
        and row order preserved), landing duckdb-comparable sizes.
        ``field_ids`` maps parquet paths -> column ids; when given,
        EVERY schema node (struct children, list elements) is stamped
        with its id — Spark's writer only stamps nodes a StructField
        metadata slot exists for, but the reference stamps all nodes
        (ducklake_field_data.cpp; schema_evolution/field_ids.test pins
        element ids). Skipped for encrypted writes and whenever an
        explicit parquet format option pins the writer's output
        shape."""
        import pyarrow.parquet as _pq

        # list-element / map-entry nodes can't carry ids through Spark
        # (no StructField slot) — files holding such nodes get the
        # pyarrow stamp even above the slim size cap, bounded at 8 MiB
        # (bigger files keep Spark's struct-member ids; our reads
        # resolve element stats by name, so only external parity
        # tooling would notice)
        needs_el = any(".list." in k or ".key_value." in k
                       for k in (field_ids or {}))
        work: list[tuple[str, bool]] = []  # (path, small)
        for path in list(self.lfs.list_files(
                self.lfs.strip_scheme(tmp), suffix=".parquet")):
            size = self.lfs.size(path)
            if size is None:
                continue
            small = size <= self.SLIM_FILE_MAX_BYTES
            if not small and not (needs_el and size <= (8 << 20)):
                continue
            work.append((path, small))
        if not work:
            return
        from ducklake_spark.fsio import LakeFS as _LFS

        lfs = self.lfs
        fids = dict(field_ids or {})
        if len(work) <= 2 or type(lfs) is not _LFS:
            # few files — or an injected filesystem wrapper that may
            # not survive pickling to executors — rewrite on the driver
            for path, small in work:
                _slim_one_file(lfs, path, small, fids)
        else:
            # many files: the per-file pyarrow rewrite runs as a Spark
            # job on the executors — a nested-type table writing K
            # files must not funnel K sequential read+rewrite passes
            # through the driver (ADVICE r11). LakeFS wraps a pyarrow
            # filesystem, which pickles.
            self.spark.sparkContext.parallelize(
                work, min(len(work), 32)
            ).foreach(lambda rec: _slim_one_file(
                lfs, rec[0], rec[1], fids))

    def _rotate_oversized(self, tmp: str, target: int, format_opts,
                          enc_key: str | None,
                          rg_rows: int | None = None,
                          chunk_rows: float = 2048.0) -> None:
        """Size-based output rotation: any freshly written file larger
        than ~4/3 of target_file_size is re-split into order-preserving
        pieces, replicating the reference writer's rotation counts.

        duckdb's streaming parquet writer buffers ~2048-row source
        chunks (scaled down when a filter, e.g. a rewrite's delete
        anti-join, thins them — ``chunk_rows``), flushes the WHOLE
        buffer as one row group once it holds >= parquet_row_group_size
        rows (default 122880), and rotates the file after any flush
        that pushed written bytes past target_file_size. So the piece
        count is bounded by ceil(rows / group_rows) with group_rows the
        smallest chunk multiple >= the row-group size — verified
        against duckdb COPY ... (FILE_SIZE_BYTES, ROW_GROUP_SIZE)
        matrices; pins test_rewrite_target_file_size_rotation.test
        (1 source -> exactly 5 files) and insert_file_size.test."""
        import math as _math

        tmp_fs = self.lfs.strip_scheme(tmp)
        for path in list(self.lfs.list_files(tmp_fs, suffix=".parquet")):
            size = self.lfs.size(path)
            if size <= target + target // 3:
                continue
            # duckdb's writer rotates when written bytes EXCEED target,
            # so each piece lands slightly over it: floor matches the
            # reference count (our encoding overhead would push a ceil
            # one file too far)
            with self.lfs.open_input(path) as fh:
                nrows = _open_parquet_meta(fh, enc_key).metadata.num_rows
            rg = rg_rows or 122880
            group_rows = max(1.0, _math.ceil(rg / chunk_rows)) * chunk_rows
            cap = max(1, _math.ceil(nrows / group_rows))
            nout = min(max(2, size // target), cap)
            if nout < 2:
                continue
            copts = self._crypto_read_options(
                [{"encryption_key": enc_key}]) if enc_key else {}
            df = (self.spark.read.options(**copts).parquet(path)
                  .withColumn("__rot", F.col("_metadata.row_index"))
                  .repartitionByRange(int(nout), F.col("__rot"))
                  .sortWithinPartitions("__rot")
                  .drop("__rot"))
            split_dir = path + ".__rot"
            format_opts(df.write.mode("overwrite")).parquet(split_dir)
            self.lfs.remove(path)
            parent = path.rsplit("/", 1)[0]
            for i, piece in enumerate(
                    self.lfs.list_files(split_dir, suffix=".parquet")):
                # keep Spark's own part-file name (it carries the real
                # codec extension — zstd data must not land in a
                # *.snappy.parquet name); only prefix the rotation index
                self.lfs.move(
                    piece,
                    f"{parent}/part-rot{i:05d}-{piece.rsplit('/', 1)[-1]}")
            self.lfs.rmtree(split_dir)

    def _leaf_colmap(self, h: TableHandle) -> dict[str, int]:
        """PARQUET path -> column_id for every nested schema node, plus
        top-level names. Per-node child rows (reference
        ducklake_field_data.cpp) are matched against the column's type
        tree, so keys are parquet path_in_schema form: struct leaves
        under dotted paths ("s.a"), list elements under
        "l.list.element", map entries under "m.key_value.key" — exactly
        what footer stats harvest sees. Legacy dotted-leaf rows (older
        catalogs of this engine) fall back to the one-hop keying."""
        from ducklake_spark.catalog.types import field_nodes

        out = {c[1]: c[0] for c in h.columns}
        if h.table_id < 0:
            # txn-local (CTAS): children live on the buffered TableDef
            if self._txn is not None:
                for td in self._txn.created_tables:
                    if (td.schema_name == h.schema_name
                            and td.table_name == h.table_name):
                        by_path = {
                            f"{c.parent_column}.{c.name}": c.column_id
                            for c in td.child_columns
                            if c.column_id is not None
                        }
                        for c in td.columns:
                            for nd in field_nodes(c.type):
                                nid = by_path.get(f"{c.name}.{nd['path']}")
                                if nid is not None:
                                    out[f"{c.name}.{nd['pq_path']}"] = nid
            return out
        kids: dict[int, dict[str, int]] = {}
        legacy: list[tuple[int, str, int]] = []
        pname = {c[0]: c[1] for c in h.columns}
        for cid, cname, parent in self.meta.query(
            "SELECT column_id, column_name, parent_column FROM ducklake_column "
            "WHERE table_id=? AND end_snapshot IS NULL "
            "AND parent_column IS NOT NULL",
            (h.table_id,),
        ):
            kids.setdefault(parent, {})[str(cname).lower()] = cid
            if "." in str(cname) and parent in pname:
                legacy.append((cid, cname, parent))
        for tl_id, tl_name, tl_type, *_r in h.columns:
            nodes = field_nodes(str(tl_type or ""))
            path_to_id = {"": tl_id}
            for nd in nodes:
                pid = path_to_id.get(nd["parent_path"])
                if pid is None:
                    continue
                nid = kids.get(pid, {}).get(nd["name"].lower())
                if nid is None:
                    continue
                path_to_id[nd["path"]] = nid
                out[f"{tl_name}.{nd['pq_path']}"] = nid
        for cid, cname, parent in legacy:
            out.setdefault(f"{pname[parent]}.{cname}", cid)
        return out

    # above this many files, footer harvesting runs as a Spark job
    # instead of a driver loop (one pyarrow footer read per file —
    # serializing 100k of those on the driver was the round-2 verdict's
    # "driver-side finalize" scale-killer)
    DISTRIBUTED_HARVEST_MIN_FILES = 64

    def _harvest_file_meta(self, infos: list[DataFileInfo], colmap: dict) -> None:
        """Fill record_count / file_size / footer_size / zone-map stats
        for freshly written files. Driver loop for small writes;
        executor-parallel (mapInPandas over the path list) beyond
        DISTRIBUTED_HARVEST_MIN_FILES. Encrypted writes have encrypted
        footers (reference parity): the harvest opens those through
        pyarrow's PME decryption with the file's catalog key."""
        paths = [os.path.join(self.data_path, f.path) for f in infos]
        if len(infos) < self.DISTRIBUTED_HARVEST_MIN_FILES:
            for f, path in zip(infos, paths):
                p_fs = self.lfs.strip_scheme(path)
                # one open per file: size + footer + stats off one handle
                with self.lfs.open_input(p_fs) as fh:
                    pf = _open_parquet_meta(fh, f.encryption_key)
                    f.record_count = pf.metadata.num_rows
                    f.row_group_count = pf.metadata.num_row_groups
                    f.column_stats = _harvest_stats(pf, colmap)
                    f.file_size_bytes = fh.size()
                    f.footer_size = _footer_size_from_handle(fh)
            return

        def gen(batches):
            import json as _json

            import pandas as pd

            from ducklake_spark.lake import (
                _harvest_stats as _hs,
                _open_parquet_meta as _opm,
            )

            from ducklake_spark.fsio import open_input_any as _open
            from ducklake_spark.lake import (
                _footer_size_from_handle as _fsz,
            )

            for b in batches:
                out = []
                for p, k in zip(b["path"], b["key"]):
                    with _open(p) as fh:
                        size = fh.size()
                        pf = _opm(fh, k if k else None)
                        stats = _hs(pf, colmap)
                        nrows = pf.metadata.num_rows
                        nrgs = pf.metadata.num_row_groups
                        footer = _fsz(fh)
                    out.append(
                        (
                            p,
                            nrows,
                            nrgs,
                            size,
                            footer,
                            _json.dumps([s.__dict__ for s in stats]),
                        )
                    )
                yield pd.DataFrame(
                    out,
                    columns=["path", "rows", "rgs", "size", "footer", "stats"],
                )

        pdf = self.spark.createDataFrame(
            [(p, f.encryption_key or "") for p, f in zip(paths, infos)],
            "path string, key string",
        ).repartition(min(max(1, len(paths) // 4), 256))
        import json as _json

        by_path = {
            r["path"]: r
            for r in pdf.mapInPandas(
                gen,
                "path string, rows long, rgs long, size long, "
                "footer long, stats string",
            ).collect()
        }
        for f, path in zip(infos, paths):
            r = by_path[path]
            f.record_count = r["rows"]
            f.row_group_count = r["rgs"]
            f.file_size_bytes = r["size"]
            f.footer_size = r["footer"]
            f.column_stats = [
                ColumnStatsRow(**d) for d in _json.loads(r["stats"])
            ]

    def _attach_extra_stats(self, h: TableHandle, infos: list[DataFileInfo],
                            enc_key: str | None) -> None:
        """Geometry-bbox and shredded-VARIANT stats for the written files
        (SURVEY §1.4 extended stats; reference gathers them in its writer —
        ducklake_geo_stats.cpp:16-76, ducklake_variant_stats.cpp:59-69).

        One distributed pass over ONLY the geometry/variant columns of the
        new files (extra_stats.harvest_extra_stats): no-op for tables
        without such columns. Encrypted writes skip the harvest — the
        re-read would need the per-file keys wired into a second scan, and
        extended stats are an optional pruning aid."""
        geo = self._geo_stat_ids(h)
        var: dict[str, int] = {}
        for cid, cname, ctype, _na in h.columns:
            base = ctype.split("(")[0].strip().lower()
            if base in ("variant", "json"):
                var[cname] = cid
        if (not geo and not var) or enc_key or not infos:
            return
        from ducklake_spark.extra_stats import harvest_extra_stats
        from ducklake_spark.transaction import VariantStatsRow

        by_abs = {
            os.path.abspath(os.path.join(self.data_path, f.path)): f for f in infos
        }
        stats = harvest_extra_stats(self.spark, list(by_abs), geo, var)
        for path, per_col in stats.items():
            f = by_abs.get(os.path.abspath(path))
            if f is None:
                continue
            rows_by_id = {cs.column_id: cs for cs in f.column_stats}
            for cname, payload in per_col.items():
                cid = geo.get(cname, var.get(cname))
                cs = rows_by_id.get(cid)
                if cs is None:
                    # the file does not physically contain this column
                    # (adopted mixed-schema files read as all-NULL for the
                    # missing column): fabricating a stats row here would
                    # fake "column present" for the stats-row-existence
                    # inference that drives initial_default fill
                    continue
                cs.extra_stats = payload.to_json()
                if cname in var:
                    f.variant_stats.extend(
                        VariantStatsRow(cid, *vals) for vals in payload.rows()
                    )

    def _geo_stat_ids(self, h: TableHandle) -> dict[str, int]:
        """column name -> the column id its geometry bbox stats key
        off: the column's own id for a plain GEOMETRY column, the
        geometry LEAF node's id for nested shapes (per-node rows —
        the reference stores the bbox on the leaf's stats row,
        geo/ducklake_geometry_nested_struct.test:45 expects exactly
        one file_column_stats row)."""
        from ducklake_spark.catalog.types import field_nodes

        out: dict[str, int] = {}
        colmap = None
        for cid, cname, ctype, _na in h.columns:
            low = str(ctype or "").lower()
            if "geometry" not in low:
                continue
            if low.split("(")[0].strip() == "geometry":
                out[cname] = cid
                continue
            if colmap is None:
                colmap = self._leaf_colmap(h)
            for nd in field_nodes(str(ctype)):
                if nd["type"].split("(")[0].strip().lower() == "geometry":
                    nid = colmap.get(f"{cname}.{nd['pq_path']}")
                    if nid is not None:
                        out[cname] = nid
                        break
            else:
                out.setdefault(cname, cid)  # legacy catalogs: no node
        return out

    def _ensure_inlined_table(self, h: TableHandle) -> str:
        """Create-if-missing the CURRENT schema-version's inlined table
        and return its name (one table per (table, schema_version))."""
        sv = self.meta.latest_snapshot().schema_version
        txn = self._txn
        if txn is not None and bool(
            txn.created_schemas or txn.dropped_schemas
            or txn.created_tables or txn.dropped_tables
            or txn.renamed_tables or txn.created_views
            or txn.dropped_views or txn.renamed_views
            or txn.column_changes or txn.sort_ops
            or txn.schema_bump_tables
        ):
            # the open transaction already made a schema change, so the
            # commit will stamp schema_version+1: rows inserted AFTER an
            # in-txn ALTER belong to the NEW epoch's inlined table —
            # routing them into the old epoch would replay that ALTER's
            # evolution on read and erase their own values
            # (struct_field_default.test: in-txn ADD FIELD then INSERT,
            # the inserted k must survive COMMIT)
            sv += 1
        tname = f"ducklake_inlined_data_{h.table_id}_{sv}"
        con = self.meta.con
        exists = con.execute(
            "SELECT 1 FROM ducklake_inlined_data_tables WHERE table_id=? AND table_name=?",
            (h.table_id, tname),
        ).fetchone()
        if not exists:
            from ducklake_spark.catalog.types import ducklake_to_catalog_sql

            col_ddl = ", ".join(
                f'"{c[1]}" {ducklake_to_catalog_sql(c[2])}' for c in h.columns
            )
            con.execute(
                f"CREATE TABLE IF NOT EXISTS {tname} "
                f"(row_id BIGINT, begin_snapshot BIGINT, end_snapshot BIGINT, {col_ddl})"
            )
            # idempotent registry insert: two concurrent writers raced
            # the exists-probe above and BOTH inserted the registry row,
            # making every scan read the table twice (single-statement
            # INSERT..WHERE NOT EXISTS serializes on the catalog lock)
            con.execute(
                "INSERT INTO ducklake_inlined_data_tables "
                "SELECT ?, ?, ? WHERE NOT EXISTS "
                "(SELECT 1 FROM ducklake_inlined_data_tables "
                "WHERE table_id=? AND table_name=?)",
                (h.table_id, tname, sv, h.table_id, tname),
            )
        return tname

    def _insert_inlined(self, h: TableHandle, schema: T.StructType, rows) -> None:
        """Data inlining: small inserts live in the catalog DB
        (reference: ducklake_inline_data.cpp:15-120, SURVEY §1.5)."""
        txn = self._begin()
        tname = self._ensure_inlined_table(h)
        from ducklake_spark.transaction import PENDING_SNAPSHOT

        # row_id here is an OFFSET: the real ids are allocated from
        # ducklake_table_stats.next_row_id inside the commit transaction
        # (BEGIN IMMEDIATE serializes writers), so concurrent inlined
        # inserts can't collide and an aborted commit leaves stats alone
        packed = []
        for i, r in enumerate(rows):
            packed.append(
                (i, PENDING_SNAPSHOT, None)
                + tuple(
                    _to_sql_value(v, f_.dataType)
                    for v, f_ in zip(r, schema.fields)
                )
            )
        txn.inlined_inserts_rebase.append((h.table_id, tname, packed))
        # inlined inserts get their own changes_made kind (reference
        # tables_inserted_inlined -> "inlined_insert",
        # ducklake_transaction_changes.cpp:78-79,205-206)
        txn.change_log.append(f"inlined_insert:{h.table_id}")
        self._autocommit()

    # -- scan --------------------------------------------------------------

    def table(self, name: str, *, at_version: int | None = None,
              at_timestamp: str | None = None, where: str | None = None,
              with_virtual: bool = False,
              bbox: dict[str, tuple] | None = None,
              variant_where: list[tuple] | None = None,
              variant_as_native: bool = False,
              overlay: bool | None = None) -> DataFrame:
        """Read a lake table as a DataFrame.

        ``where`` additionally drives file-level zone-map pruning (the
        predicate itself is still applied by Catalyst). ``with_virtual``
        adds the reference's virtual columns (filename,
        file_row_number, rowid, snapshot_id —
        ducklake_table_entry.cpp:398-410).

        ``bbox`` maps a GEOMETRY column to a query window
        ``(xmin, ymin, xmax, ymax)``: files whose stored bbox
        (extra_stats, ducklake_geo_stats.cpp:46-72) provably misses the
        window are pruned, and an exact WKB-intersection filter is
        applied to the surviving rows.

        ``variant_where`` is a list of ``(column, path, op, literal)``
        conjuncts over shredded VARIANT fields (e.g. ``("props",
        "width", ">=", 100)``): files are pruned through
        ducklake_file_variant_stats (files lacking shredded stats for
        the path are kept) and the predicate re-applied row-level via
        JSON extraction.

        ``variant_as_native=True`` parses VARIANT/JSON columns into
        Spark 4's native VariantType on the way out.
        """
        h = self._handle(name, at_version=at_version, at_timestamp=at_timestamp)
        snap = self._resolve_snapshot(at_version, at_timestamp)
        # read-your-own-writes: a scan inside an open transaction sees
        # its buffered inserts/deletes (reference txn visibility, e.g.
        # test/sql/data_inlining/data_inlining_txn_delete_visibility);
        # time-travel reads stay pinned to their snapshot
        # ``overlay=False`` forces the committed view — DML victim scans
        # (merge) read it so positional deletes never target a buffered
        # uncommitted file (which has no stable file identity yet)
        if overlay is None:
            overlay = (
                at_version is None and at_timestamp is None
                and self._pinned is None and self._txn is not None
            )
        files = self._visible_files(h, snap, where, txn_overlay=overlay)
        colmap = {c[1]: c[0] for c in h.columns}
        if bbox:
            files = self._bbox_prune(h, files, bbox, colmap)
        if variant_where:
            variant_where = [
                (cname, path, "=" if op == "==" else op, val)
                for cname, path, op, val in variant_where
            ]
            for _c, _p, op, _v in variant_where:
                if op not in ("=", ">", ">=", "<", "<="):
                    raise DuckLakeError(
                        f"unsupported variant_where operator {op!r}"
                    )
            files = self._variant_prune(h, files, variant_where, colmap)
        schema = self._spark_schema(h)
        deletes = self._delete_entries(
            h, snap, [f["data_file_id"] for f in files], txn_overlay=overlay
        )
        df = self._read_files(
            h, snap, files, schema, deletes, with_virtual, txn_overlay=overlay
        )
        inlined = self._read_inlined(
            h, snap, schema, with_virtual, txn_overlay=overlay,
            findex_base=len(files)
        )
        if inlined is not None:
            df = df.unionByName(inlined) if df is not None else inlined
        if df is None:
            empty = schema if not with_virtual else _with_virtual_schema(schema)
            df = self.spark.createDataFrame([], empty)
        if where is not None:
            df = df.filter(where)
        if bbox:
            for cname, box in bbox.items():
                df = df.filter(_bbox_intersects_udf(box)(F.col(cname)))
        if variant_where:
            for cname, path, op, val in variant_where:
                df = df.filter(_variant_row_predicate(cname, path, op, val))
        if variant_as_native:
            for _cid, cname, ctype, _na in h.columns:
                if ctype.split("(")[0].strip().lower() in ("variant", "json"):
                    df = df.withColumn(cname, F.try_parse_json(F.col(cname)))
        # GEOMETRY and BLOB both surface as BinaryType, VARIANT as a
        # JSON string; stamp the ducklake type into the field metadata
        # so renderers (slt WKT / duckdb-style variant display) can
        # tell them apart without sniffing values
        out_names = set(df.columns)
        for _cid, cname, ctype, _na in h.columns:
            low = str(ctype or "").lower()
            if (("geometry" in low or "blob" in low
                 or low.split("(")[0].strip() == "variant"
                 or (low.startswith("time")
                     and not low.startswith("timestamp")))
                    and cname in out_names):
                df = df.withMetadata(cname, {"dl_type": str(ctype)})
        return df

    def _bbox_prune(self, h: TableHandle, files: list[dict],
                    bbox: dict[str, tuple], colmap: dict) -> list[dict]:
        """Spatial file pruning from the stored per-file bboxes: drop
        files whose bbox is disjoint from the query window; files
        without extra stats are kept (same keep-on-no-evidence rule as
        the zone maps)."""
        from ducklake_spark.extra_stats import bbox_disjoint_json

        geo_ids = self._geo_stat_ids(h)
        pruned_ids: set[int] = set()
        for cname, box in bbox.items():
            if cname not in colmap:
                continue
            for fid, extra in self.meta.query(
                "SELECT data_file_id, extra_stats FROM ducklake_file_column_stats "
                "WHERE table_id = ? AND column_id = ? AND extra_stats IS NOT NULL",
                (h.table_id, geo_ids.get(cname, colmap[cname])),
            ):
                if bbox_disjoint_json(extra, box):
                    pruned_ids.add(fid)
        if not pruned_ids:
            return files
        return [f for f in files if f["data_file_id"] not in pruned_ids]

    def _variant_prune(self, h: TableHandle, files: list[dict],
                       variant_where: list[tuple], colmap: dict) -> list[dict]:
        """Prune through shredded VARIANT field stats
        (ducklake_file_variant_stats): the same min/max contradiction
        test as the zone maps, applied per variant_path. Files with no
        shredded row for the path — or whose shredded type does not
        match the literal's type class — are kept (pruning may only
        drop files that provably cannot match)."""
        pruned_ids: set[int] = set()
        for cname, path, op, val in variant_where:
            if cname not in colmap:
                continue
            if isinstance(val, bool):
                # stored boolean shredded min/max are 1/0 (reference
                # serialization, variant_shredded_stats.test)
                vclass, v = "boolean", ("1" if val else "0")
            elif isinstance(val, (int, float)):
                vclass, v = "numeric", float(val)
            else:
                vclass, v = "varchar", str(val)
            for fid, styp, mn, mx in self.meta.query(
                "SELECT data_file_id, shredded_type, min_value, max_value "
                "FROM ducklake_file_variant_stats "
                "WHERE table_id = ? AND column_id = ? AND variant_path = ?",
                (h.table_id, colmap[cname], _variant_path_key(path)),
            ):
                if mn is None or mx is None:
                    continue
                # stats compare only within the literal's type class —
                # stored text ordering differs per shredded type
                if vclass == "numeric":
                    if styp not in ("int32", "int64", "bigint", "double"):
                        continue
                    try:
                        lo, hi = float(mn), float(mx)
                    except (TypeError, ValueError):
                        continue
                elif styp != vclass:
                    continue
                else:
                    lo, hi = mn, mx
                contradiction = {
                    "=": lambda: lo > v or hi < v,
                    ">": lambda: hi <= v,
                    ">=": lambda: hi < v,
                    "<": lambda: lo >= v,
                    "<=": lambda: lo > v,
                }.get(op)
                if contradiction is not None and contradiction():
                    pruned_ids.add(fid)
        if not pruned_ids:
            return files
        return [f for f in files if f["data_file_id"] not in pruned_ids]

    def sql(self, query: str, *, at_version: int | None = None) -> DataFrame:
        """Run Spark SQL with every lake table registered as a temp view.

        View registration is cached per catalog snapshot: every table is
        re-registered only when the latest snapshot (or the requested
        at_version) changes — not once per statement, which cost one
        file-list catalog round per table per call. Inside an open
        transaction the overlay changes as writes buffer, so the cache
        is bypassed (and left invalidated for the post-commit call)."""
        key = (self.meta.latest_snapshot().snapshot_id, at_version)
        # temp views are global to the SparkSession: another lake on the
        # same session may have re-registered them, so ownership is
        # tracked per session, not only per lake
        owner = _SQL_VIEW_OWNER.get(id(self.spark))
        if self._txn is not None or owner != (id(self), key):
            for t in self._table_names():
                self.table(t, at_version=at_version).createOrReplaceTempView(
                    t.split(".")[-1]
                )
            _SQL_VIEW_OWNER[id(self.spark)] = (
                None if self._txn is not None else (id(self), key)
            )
        return self.spark.sql(query)

    def _s3_sync_down(self) -> None:
        """Materialize the object store's state into the local mirror
        (attach time; cheap no-op when sizes already match)."""
        if self._s3fs is None:
            return
        import pyarrow.fs as pafs

        sel = pafs.FileSelector(self._s3_prefix, recursive=True,
                                allow_not_found=True)
        for info in self._s3fs.get_file_info(sel):
            if info.type != pafs.FileType.File:
                continue
            rel = info.path[len(self._s3_prefix):].lstrip("/")
            lp = os.path.join(self.data_path, rel)
            if os.path.exists(lp) \
                    and os.path.getsize(lp) == info.size:  # noqa: posix-ok
                continue
            os.makedirs(os.path.dirname(lp), exist_ok=True)  # noqa: posix-ok
            with self._s3fs.open_input_file(info.path) as fin, \
                    open(lp, "wb") as fout:
                import shutil as _sh

                _sh.copyfileobj(fin, fout)

    def _s3_sync_up(self) -> None:
        """Push the mirror's state to the object store: upload new or
        changed files, drop remote keys whose local file is gone
        (cleanup/expire/compaction removals). Runs after commits and
        maintenance calls — the mirror is the authoritative working
        copy between syncs."""
        if self._s3fs is None:
            return
        import pyarrow.fs as pafs

        sel = pafs.FileSelector(self._s3_prefix, recursive=True,
                                allow_not_found=True)
        remote = {
            info.path[len(self._s3_prefix):].lstrip("/"): info.size
            for info in self._s3fs.get_file_info(sel)
            if info.type == pafs.FileType.File
        }
        local: dict[str, str] = {}
        for root, _dirs, names in os.walk(self.data_path):  # noqa: posix-ok
            for n in names:
                lp = os.path.join(root, n)
                local[os.path.relpath(lp, self.data_path)
                      .replace(os.sep, "/")] = lp
        key_base = self._s3_prefix.split("/", 1)
        key_prefix = key_base[1] + "/" if len(key_base) > 1 else ""
        for rel, lp in local.items():
            if remote.get(rel) == os.path.getsize(lp):  # noqa: posix-ok
                continue
            # boto3 PutObject (arrow's multipart completion trips over
            # the moto test server; see fsio.s3_boto_client)
            self._boto.upload_file(lp, self._s3_bucket,
                                   key_prefix + rel)
        for rel in set(remote) - set(local):
            try:
                self._boto.delete_object(Bucket=self._s3_bucket,
                                         Key=key_prefix + rel)
            except Exception:
                pass

    def object_cache_bytes(self) -> int:
        """Estimated bytes held by the file-list cache — surfaced as
        duckdb_memory()'s OBJECT_CACHE row."""
        total = 0
        for files in self._file_cache.values():
            total += 512 + sum(
                192 + len(str(f.get("path") or "")) for f in files)
        return total

    def _visible_files(self, h: TableHandle, snap: Snapshot,
                       where: str | None, *,
                       txn_overlay: bool = False) -> list[dict]:
        # catalog paths are TABLE-relative (reference convention);
        # resolve to the engine's data-root-relative form here so every
        # downstream consumer keeps seeing the full path
        sql = (
            "SELECT data_file_id, path, path_is_relative, record_count, "
            "row_id_start, partial_max, "
            "file_size_bytes, mapping_id, begin_snapshot, encryption_key "
            "FROM ducklake_data_file "
            "WHERE table_id = ? AND begin_snapshot <= ? "
            "AND (end_snapshot IS NULL OR end_snapshot > ?)"
        )
        params: list = [h.table_id, snap.snapshot_id, snap.snapshot_id]
        # snapshot-keyed file-list cache: repeated scans of the same
        # table at the same snapshot + predicate skip the catalog
        # round-trip. Bypassed inside open transactions (the overlay
        # mutates); entries for older snapshots of a table are evicted
        # on insert, so DDL/commit churn cannot grow it unboundedly
        # (issues/issue_852_cache_growth.test)
        ckey = (h.table_id, snap.snapshot_id, where or "")
        if self._txn is None:
            hit = self._file_cache.get(ckey)
            if hit is not None:
                return [dict(f) for f in hit]
        pruned_sql, pruned_params = self._pruning_clauses(h, where)
        rows = self.meta.query(sql + pruned_sql + " ORDER BY data_file_id",
                               tuple(params + pruned_params))
        out = []
        for r in rows:
            d = dict(zip(
                ["data_file_id", "path", "path_is_relative",
                 "record_count", "row_id_start",
                 "partial_max", "file_size_bytes", "mapping_id",
                 "begin_snapshot", "encryption_key"], r))
            d["path"] = _resolve_rel_path(h.path, d["path"],
                                          d.pop("path_is_relative"))
            out.append(d)
        if self._txn is None:
            for k in [k for k in self._file_cache
                      if k[0] == h.table_id and k[1] != snap.snapshot_id]:
                del self._file_cache[k]
            if len(self._file_cache) > 512:
                self._file_cache.clear()
            self._file_cache[ckey] = [dict(f) for f in out]
        if txn_overlay and self._txn is not None:
            txn = self._txn
            # files this txn removed (whole-file deletes / rewrites) OR
            # replaced by a buffered compaction output must disappear
            # from the txn's own reads — otherwise COUNT(*) inside
            # BEGIN; merge_adjacent_files; sees source AND output
            # (reference: stats/count_star_optimization_file_operations)
            removed = set(txn.removed_data_files.get(h.table_id, []))
            removed.update(txn.purged_data_files.get(h.table_id, []))
            if removed:
                out = [f for f in out if f["data_file_id"] not in removed]
            # buffered inserts: synthetic negative ids (assigned at commit);
            # txn-local tables buffer under their name key
            buf_key = (str(h.table_id) if h.table_id >= 0
                       else f"{h.schema_name}.{h.table_name}")
            neg = -1
            # uncommitted rows read TRANSACTION-LOCAL rowids starting at
            # 10^18 in buffer order, reassigned to real ids at commit
            # (reference: test/sql/rowid/ducklake_row_id.test — rowids
            # 1000000000000000000.. inside BEGIN, 0.. after COMMIT).
            # Files that embed a rowid column (compaction/rewrite
            # buffers) keep it: the scan's COALESCE prefers the
            # embedded value over row_id_start + position.
            local_rid = TXN_LOCAL_ROWID_BASE
            for fi in txn.new_data_files.get(buf_key, []):
                rid_start = fi.row_id_start
                if rid_start is None and fi.allocate:
                    # allocate=False files (update/compaction/rewrite
                    # buffers) EMBED their preserved rowids — keeping
                    # row_id_start NULL routes them to the embedded-
                    # column read mode
                    rid_start = local_rid
                    local_rid += fi.record_count or 0
                out.append({
                    "data_file_id": neg, "path": fi.path,
                    "record_count": fi.record_count,
                    "row_id_start": rid_start,
                    "partial_max": fi.partial_max,
                    "file_size_bytes": fi.file_size_bytes,
                    "mapping_id": fi.mapping_id,
                    # uncommitted: snapshot_id reads NULL (reference
                    # ducklake_snapshot_id.test in-txn rows)
                    "begin_snapshot": None,
                    "encryption_key": fi.encryption_key,
                })
                neg -= 1
        return out

    def _pruning_clauses(self, h: TableHandle, where: str | None) -> tuple[str, list]:
        """File pruning from zone maps: compile simple conjuncts of the
        predicate into NOT-IN subqueries over ducklake_file_column_stats
        (the reference compiles the same SQL —
        ducklake_metadata_manager.cpp:1246-1343,1492-1553). Files
        without stats are always kept (:1522-1533)."""
        if not where:
            return "", []
        colmap = self._leaf_colmap(h)  # dotted struct-leaf refs prune too
        part_keys = {}  # cname -> [(key_index, transform), ...]
        for i, (cname, transform) in enumerate(self._partition_spec(h)):
            # one column may carry several transforms (year + month on
            # the same timestamp, merge_timestamp.test) — emit a prune
            # clause per transform, not just the last
            part_keys.setdefault(cname, []).append((i, transform))
        # partition pruning applies ONLY to files written under the
        # CURRENT spec (data_file.partition_id): after SET PARTITIONED
        # BY changes the key columns, an old file's values at the same
        # key index mean a different column — interpreting them under
        # the new spec wrongly prunes live rows (reference ties every
        # file to its spec via ducklake_data_file.partition_id)
        live_pid = self._partition_spec_id(h)
        clauses, params = [], []
        coltypes = {c[1]: (c[2] or "").lower() for c in h.columns}
        for col, op, val in _parse_conjuncts(where):
            if col not in colmap:
                continue
            if isinstance(val, float) and val != val:  # NaN: never prune (:1294-1343)
                continue
            # normalize temporal literals to the zone map's
            # serialization: TIMESTAMP'2025-09-17' must compare equal
            # to the stored "2025-09-17 00:00:00" — the raw string
            # compare pruned EVERY file for a date-only timestamp
            # literal (min "…00:00:00" > "2025-09-17")
            ctype = coltypes.get(col, "")
            if isinstance(val, str):
                if (ctype.startswith("timestamp")
                        and re.fullmatch(r"\d{4}-\d{2}-\d{2}", val)):
                    val = val + " 00:00:00"
                elif ctype == "date" and val.endswith(" 00:00:00"):
                    val = val[: -len(" 00:00:00")]
            if ctype in ("time", "timetz"):
                # TIME surfaces Spark-side as BIGINT µs, but the zone
                # map stores duckdb's clock text ('01:00:00'[+00]) — a
                # numeric-vs-text compare over-prunes (SQLite CASTs
                # text to 1.0) or errors (duckdb backend). Normalize
                # the literal to the stored text; fall back to no
                # pruning when the literal shape is unrecognized.
                def _time_lit(v2):
                    suf = "+00" if ctype == "timetz" else ""
                    if isinstance(v2, bool):
                        return None
                    if isinstance(v2, int):
                        return _us_to_time_text(v2) + suf
                    if isinstance(v2, str):
                        if re.fullmatch(r"-?\d+", v2):
                            return _us_to_time_text(int(v2)) + suf
                        if re.fullmatch(
                                r"\d{2}:\d{2}:\d{2}(\.\d+)?", v2):
                            return v2.rstrip("0").rstrip(".") + suf \
                                if "." in v2 else v2 + suf
                        if ctype == "timetz" and re.fullmatch(
                                r"\d{2}:\d{2}:\d{2}(\.\d+)?\+00", v2):
                            return v2
                    return None
                if op == "or":
                    vals2 = [(o2, _time_lit(v2)) for o2, v2 in val]
                    if any(v2 is None for _, v2 in vals2):
                        continue
                    val = vals2
                elif op not in ("isnull", "notnull"):
                    val = _time_lit(val)
                    if val is None:
                        continue
            for entry in part_keys.get(col, []):
                part_clause = self._partition_prune_clause(
                    h, entry, live_pid, col, op, val)
                if part_clause is not None:
                    clauses.append(part_clause[0])
                    params.extend(part_clause[1])
            cid = colmap[col]
            if op in ("isnull", "notnull"):
                # null-count zone maps (value_count counts NON-null
                # values): IS NULL prunes null-free files, IS NOT NULL
                # prunes all-null files; files without stats are kept
                cond = ("null_count = 0" if op == "isnull"
                        else "value_count = 0 AND null_count > 0")
                clauses.append(
                    " AND data_file_id NOT IN ("
                    "SELECT data_file_id FROM ducklake_file_column_stats "
                    f"WHERE table_id = ? AND column_id = ? AND {cond})"
                )
                params.extend([h.table_id, cid])
                continue
            def _contra(op2, val2):
                numeric = isinstance(val2, (int, float))
                cast = "CAST(%s AS REAL)" if numeric else "%s"
                mn, mx = cast % "min_value", cast % "max_value"
                if op2 == "!=":
                    # a constant file (min == max == v) can't satisfy !=
                    # (filter_pushdown.test file 4 single-row prune) —
                    # but NaN rows are excluded from parquet float stats
                    # and DO satisfy !=, so contains_nan files are kept;
                    # integers compare as exact text (a REAL cast
                    # collides values beyond 2^53)
                    if isinstance(val2, int) and not isinstance(val2, bool):
                        emn, emx, v = "min_value", "max_value", str(val2)
                    else:
                        emn, emx, v = mn, mx, val2
                    return (f"({emn} = ? AND {emx} = ? AND null_count = 0"
                            " AND contains_nan = 0)"), [v, v]
                c = {
                    "=": f"({mn} > ? OR {mx} < ?)",
                    ">": f"{mx} <= ?",
                    ">=": f"{mx} < ?",
                    "<": f"{mn} >= ?",
                    "<=": f"{mn} > ?",
                }.get(op2)
                if c is None:
                    return None
                if numeric and op2 in (">", ">="):
                    c += " AND contains_nan = 0"
                return c, [val2] * c.count("?")

            if op == "or":
                # a file is prunable only when EVERY disjunct
                # contradicts its range (IN lists / same-column ORs)
                parts_sql, parts_params, ok2 = [], [], True
                for op2, val2 in val:
                    r = _contra(op2, val2)
                    if r is None:
                        ok2 = False
                        break
                    parts_sql.append(r[0])
                    parts_params.extend(r[1])
                if not ok2 or not parts_sql:
                    continue
                clauses.append(
                    " AND data_file_id NOT IN ("
                    "SELECT data_file_id FROM ducklake_file_column_stats "
                    "WHERE table_id = ? AND column_id = ? AND min_value "
                    "IS NOT NULL AND max_value IS NOT NULL AND ("
                    + ") AND (".join(parts_sql) + "))"
                )
                params.extend([h.table_id, cid] + parts_params)
                continue
            r = _contra(op, val)
            if r is None:
                continue
            clauses.append(
                " AND data_file_id NOT IN ("
                "SELECT data_file_id FROM ducklake_file_column_stats "
                f"WHERE table_id = ? AND column_id = ? AND min_value IS NOT NULL "
                f"AND max_value IS NOT NULL AND {r[0]})"
            )
            params.extend([h.table_id, cid] + r[1])
        return "".join(clauses), params

    def _partition_spec_id(self, h: TableHandle) -> int | None:
        """Live partition spec id for the table, or None when the table
        was never partitioned."""
        row = self.meta.con.execute(
            "SELECT partition_id FROM ducklake_partition_info "
            "WHERE table_id=? AND end_snapshot IS NULL",
            (h.table_id,),
        ).fetchone()
        return row[0] if row else None

    def _partition_prune_clause(self, h: TableHandle, entry: tuple,
                                live_pid: int | None,
                                col: str, op: str, val) -> tuple[str, list] | None:
        """Partition pruning over ducklake_file_partition_value
        (reference: ducklake_metadata_manager.cpp:1843-1853; bucket
        clause :2201). Files lacking partition values are kept, and
        only files stamped with the CURRENT spec id prune — a value
        recorded under an earlier spec describes a different column."""
        if entry is None or live_pid is None:
            return None
        idx, transform = entry
        t = transform.lower()
        base = (
            " AND data_file_id NOT IN ("
            "SELECT pv.data_file_id FROM ducklake_file_partition_value pv "
            "JOIN ducklake_data_file df ON pv.data_file_id = df.data_file_id "
            "WHERE pv.table_id = ? AND df.partition_id = ? "
            "AND pv.partition_key_index = ? AND {cond})"
        )
        if t == "identity":
            # typed compare in Python over the (few) DISTINCT stored values:
            # a raw string compare wrongly prunes `5` vs `5.0` and values
            # whose hive form was escaped. Stored values are always raw
            # (add_data_files unquotes at write time). NULL rows store
            # the hive sentinel (reference ducklake_partition_data.cpp:127);
            # a comparison predicate can never match them, IS NULL
            # matches only them.
            import operator

            f_op = {"=": operator.eq, ">": operator.gt, ">=": operator.ge,
                    "<": operator.lt, "<=": operator.le}.get(op)
            if f_op is None and op not in ("isnull", "notnull"):
                return None
            vals = self.meta.query(
                "SELECT DISTINCT pv.partition_value "
                "FROM ducklake_file_partition_value pv "
                "JOIN ducklake_data_file df "
                "ON pv.data_file_id = df.data_file_id "
                "WHERE pv.table_id = ? AND df.partition_id = ? "
                "AND pv.partition_key_index = ?",
                (h.table_id, live_pid, idx),
            )
            contradictors = []
            for (pv,) in vals:
                # SQL NULL and the hive sentinel both mean "NULL
                # partition" (merge_adjacent_null_partition.test layout)
                is_null_part = (pv is None
                                or pv == "__HIVE_DEFAULT_PARTITION__")
                if op == "isnull":
                    match = is_null_part
                elif op == "notnull":
                    match = not is_null_part
                elif is_null_part:
                    match = False  # NULL never satisfies a comparison
                elif isinstance(val, (int, float)):
                    try:
                        match = f_op(float(pv), float(val))
                    except ValueError:
                        continue  # un-typed stored value: keep the file
                else:
                    match = f_op(pv, str(val))
                if not match:
                    contradictors.append(pv)
            if not contradictors:
                return None
            # a NULL stored value can't prune through IN (SQL NULL
            # never matches IN) — it needs its own IS NULL arm
            # (partition_null.test: the all-NULL partition file must
            # prune under part_key = 1)
            nonnull = [pv for pv in contradictors if pv is not None]
            conds, params = [], []
            if nonnull:
                qs = ",".join("?" * len(nonnull))
                conds.append(f"partition_value IN ({qs})")
                params = nonnull
            if len(nonnull) < len(contradictors):
                conds.append("partition_value IS NULL")
            return (
                base.format(cond="(" + " OR ".join(conds) + ")"),
                [h.table_id, live_pid, idx, *params],
            )
        if t in ("year", "month", "day", "hour") and isinstance(val, str):
            bucket_val = _date_part_of_literal(t, val)
            if bucket_val is None:
                return None
            if op == "=":
                return (
                    base.format(cond="CAST(partition_value AS REAL) <> ?"),
                    [h.table_id, live_pid, idx, bucket_val],
                )
            # range on the source column -> range on the (monotonic for
            # year/truncation) transform value
            if t == "year":
                inv = {">": "<", ">=": "<", "<": ">", "<=": ">"}[op]
                return (
                    base.format(cond=f"CAST(partition_value AS REAL) {inv} ?"),
                    [h.table_id, live_pid, idx, bucket_val],
                )
            return None
        m = re.fullmatch(r"bucket\((\d+)\)", t)
        if m and op == "=":
            from ducklake_spark.functions.murmur3 import bucket_py

            b = bucket_py(val, int(m.group(1)))
            return (
                base.format(cond="CAST(partition_value AS REAL) <> ?"),
                [h.table_id, live_pid, idx, b],
            )
        return None

    def topn(self, name: str, order_col: str, limit: int, *,
             descending: bool = True, where: str | None = None,
             plan_info: list | None = None) -> DataFrame:
        """Top-N scan with stats-ordered file pruning.

        The reference re-prunes the file list mid-scan from the Top-N
        operator's evolving threshold (ducklake_multi_file_list.cpp:58-84,
        stats-ordered listing ducklake_metadata_manager.cpp:1779-1827).
        Spark has no mid-query re-planning seam, so we apply the static
        variant at plan time: sort surviving files by the order column's
        zone-map bound, walk until the accumulated net row count can
        satisfy N (threshold T = worst kept bound), and drop every file
        whose range provably cannot beat T. Files lacking stats are
        always kept. At 100 TB this turns "sort everything" into
        "scan the few newest/densest files" for the common
        ORDER BY ts DESC LIMIT k access pattern.
        """
        h = self._handle(name)
        snap = self._resolve_snapshot(None, None)
        files = self._visible_files(h, snap, where)
        colmap = {c[1]: c[0] for c in h.columns}
        cid = colmap.get(order_col)
        if cid is not None and files:
            stats = {
                fid: (mn, mx)
                for fid, mn, mx in self.meta.query(
                    "SELECT data_file_id, min_value, max_value "
                    "FROM ducklake_file_column_stats "
                    "WHERE table_id = ? AND column_id = ? "
                    "AND min_value IS NOT NULL AND max_value IS NOT NULL",
                    (h.table_id, cid),
                )
            }
            dtype = dict((c[1], c[2]) for c in h.columns).get(order_col, "varchar")
            numeric = dtype in (
                "int8", "int16", "int32", "int64", "float32", "float64",
            ) or dtype.startswith("decimal")
            conv = (lambda s: float(s)) if numeric else (lambda s: s)
            deletes = dict(
                self.meta.query(
                    "SELECT data_file_id, SUM(delete_count) FROM ducklake_delete_file "
                    "WHERE table_id = ? AND begin_snapshot <= ? "
                    "AND (end_snapshot IS NULL OR end_snapshot > ?) "
                    "GROUP BY data_file_id",
                    (h.table_id, snap.snapshot_id, snap.snapshot_id),
                )
            )
            # inlined delete positions also shrink a file's net count —
            # overcounting here could satisfy N too early and wrongly
            # prune a file that still holds a top-N row
            for fid, pos in self._inlined_delete_positions(
                h, snap, [f["data_file_id"] for f in files]
            ):
                deletes[fid] = int(deletes.get(fid, 0) or 0) + 1

            def bound(f):  # best value this file could contribute
                s = stats.get(f["data_file_id"])
                if s is None:
                    return None
                return conv(s[1]) if descending else conv(s[0])

            def worst(f):
                s = stats.get(f["data_file_id"])
                return conv(s[0]) if descending else conv(s[1])

            with_stats = [f for f in files if bound(f) is not None]
            no_stats = [f for f in files if bound(f) is None]
            with_stats.sort(key=bound, reverse=descending)
            core, extras, acc, thresh = [], [], 0, None
            for f in with_stats:
                if thresh is not None:
                    b = bound(f)
                    if (descending and b < thresh) or (not descending and b > thresh):
                        continue  # provably cannot reach the top N
                    extras.append(f)
                    continue
                core.append(f)
                acc += f["record_count"] - int(deletes.get(f["data_file_id"], 0) or 0)
                if acc >= limit:
                    w = [worst(f2) for f2 in core]
                    thresh = min(w) if descending else max(w)
        else:
            core, extras, no_stats, thresh = list(files), [], [], None
            numeric, conv = False, str

        schema = self._spark_schema(h)
        order = F.col(order_col).desc() if descending else F.col(order_col).asc()
        if plan_info is not None:
            # EXPLAIN support: the phase-1 (dynamic-filter-initialized)
            # file set and its net row count
            plan_info.append({
                "core_files": len(core),
                "total_files": len(files),
                "core_rows": sum(
                    f["record_count"]
                    - int(deletes.get(f["data_file_id"], 0) or 0)
                    for f in core) if (cid is not None and files) else None,
                "deferred_files": len(extras) + len(no_stats),
            })

        def scan(fs):
            de = self._delete_entries(h, snap, [f["data_file_id"] for f in fs])
            d = self._read_files(h, snap, fs, schema, de, False)
            return d.filter(where) if (d is not None and where) else d

        phase1 = scan(core)
        inlined = self._read_inlined(h, snap, schema, False)
        if inlined is not None:
            if where is not None:
                inlined = inlined.filter(where)
            phase1 = (phase1.unionByName(inlined)
                      if phase1 is not None else inlined)
        maybe = extras + no_stats
        if phase1 is None:
            phase1 = self.spark.createDataFrame([], schema)
        if not maybe:
            return phase1.orderBy(order).limit(limit)
        # dynamic re-prune (the reference tightens the file list from the
        # Top-N operator's evolving threshold mid-scan,
        # ducklake_multi_file_list.cpp:58-84 + stats-ordered listing).
        # Spark's analogue: materialize the stats-ordered CORE prefix,
        # take the ACTUAL N-th value, and re-prune the remaining
        # candidates with it — usually far tighter than the zone-map
        # bound the static walk used. Guarded to small N (the threshold
        # probe collects the N-th column value only).
        if thresh is not None and limit <= 100_000:
            phase1 = phase1.persist()  # probe + final result share the scan
            vals = [
                r[0]
                for r in phase1.select(order_col)
                .orderBy(order).limit(limit).collect()
            ]
            if len(vals) == limit and vals[-1] is not None:
                t = float(vals[-1]) if numeric else _stat_str(vals[-1])
                maybe = [
                    f for f in extras
                    if (descending and bound(f) >= t)
                    or (not descending and bound(f) <= t)
                ] + no_stats
                if not maybe:
                    return phase1.orderBy(order).limit(limit)
        rest = scan(maybe)
        df = phase1.unionByName(rest) if rest is not None else phase1
        return df.orderBy(order).limit(limit)

    def column_stats(self, name: str) -> DataFrame:
        """Global per-column stats from the catalog — a metadata-only
        answer for min/max/null questions (reference:
        ducklake_table_column_stats, merged write-side; stats are
        widen-only so they are bounds, exact after pure inserts)."""
        h = self._handle(name)
        cols = {c[0]: (c[1], c[2]) for c in h.columns}
        rows = [
            (cols[cid][0], cols[cid][1], bool(cn), mn, mx, extra)
            for cid, cn, mn, mx, extra in self.meta.query(
                "SELECT column_id, contains_null, min_value, max_value, extra_stats "
                "FROM ducklake_table_column_stats WHERE table_id = ?",
                (h.table_id,),
            )
            if cid in cols
        ]
        return self.spark.createDataFrame(
            rows,
            "column_name string, column_type string, contains_null boolean, "
            "min_value string, max_value string, extra_stats string",
        )

    def variant_stats(self, name: str) -> DataFrame:
        """Per-file shredded VARIANT field stats
        (ducklake_file_variant_stats rows for the table's live files —
        reference serializes the same rows per data file,
        ducklake_variant_stats.cpp:59-69)."""
        h = self._handle(name)
        cols = {c[0]: c[1] for c in h.columns}
        rows = [
            (fid, cols.get(cid), path, styp, vc, nc, mn, mx)
            for fid, cid, path, styp, vc, nc, mn, mx in self.meta.query(
                "SELECT v.data_file_id, v.column_id, v.variant_path, "
                "v.shredded_type, v.value_count, v.null_count, "
                "v.min_value, v.max_value "
                "FROM ducklake_file_variant_stats v "
                "JOIN ducklake_data_file d ON v.data_file_id = d.data_file_id "
                "WHERE v.table_id = ? AND d.end_snapshot IS NULL "
                "ORDER BY v.data_file_id, v.column_id, v.variant_path",
                (h.table_id,),
            )
        ]
        return self.spark.createDataFrame(
            rows,
            "data_file_id long, column_name string, variant_path string, "
            "shredded_type string, value_count long, null_count long, "
            "min_value string, max_value string",
        )

    def database_size(self) -> dict:
        """PRAGMA database_size equivalent
        (test/sql/general/database_size.test): live data+delete file
        bytes from the catalog plus the metadata DB's own footprint."""
        (data_bytes,) = self.meta.query(
            "SELECT COALESCE(SUM(file_size_bytes), 0) FROM ducklake_data_file "
            "WHERE end_snapshot IS NULL"
        )[0]
        (delete_bytes,) = self.meta.query(
            "SELECT COALESCE(SUM(file_size_bytes), 0) FROM ducklake_delete_file "
            "WHERE end_snapshot IS NULL"
        )[0]
        p = self.metadata_path
        if p.startswith("duckdb://"):
            p = p[len("duckdb://"):]
        meta_bytes = (  # the catalog DB file is driver-local by nature
            os.path.getsize(p) if "://" not in p and os.path.exists(p) else None  # noqa: posix-ok
        )
        return {
            "data_file_bytes": int(data_bytes or 0),
            "delete_file_bytes": int(delete_bytes or 0),
            "total_bytes": int(data_bytes or 0) + int(delete_bytes or 0),
            "metadata_bytes": meta_bytes,
        }

    def row_count(self, name: str) -> int:
        """count(*) fast path answered from ducklake_table_stats
        (reference: DuckLakeGetPartitionStats exactness rule,
        ducklake_scan.cpp:138-229 — our record_count is net of deletes,
        so it is exact at the latest snapshot). Transaction-local
        changes and snapshot-pinned attaches route through
        ``stats_agg`` instead, which applies the reference's fallback
        rules (test/sql/stats/count_star_optimization_time_travel)."""
        h = self._handle(name)
        if self._pinned is not None or self._txn_touches_table(h):
            return self.stats_agg(name, columns=[])["row_count"]
        # the O(1) table_stats shortcut is only valid when no delete
        # artifact exists: record_count is GROSS (sum of live files,
        # like the reference — ducklake_scan.cpp:217 subtracts delete
        # counts independently; test/sql/delete/full_file_delete_stats
        # .test keeps 100 after a partial delete), so any live delete
        # file / inlined delete routes through the per-file netting
        # fold instead
        has_deletes = self.meta.query(
            "SELECT 1 FROM ducklake_delete_file "
            "WHERE table_id=? AND end_snapshot IS NULL",
            (h.table_id,),
        ) or self._inlined_delete_rows_exist(h)
        if has_deletes:
            return self.stats_agg(name, columns=[])["row_count"]
        rows = self.meta.query(
            "SELECT record_count FROM ducklake_table_stats WHERE table_id=?",
            (h.table_id,),
        )
        return rows[0][0] if rows else 0

    def _inlined_delete_rows_exist(self, h: TableHandle) -> bool:
        tname = f"ducklake_inlined_delete_{h.table_id}"
        if not self.meta.query(
            "SELECT 1 FROM sqlite_master WHERE type='table' AND name=?",
            (tname,),
        ):
            return False
        return bool(self.meta.query(f"SELECT 1 FROM {tname} LIMIT 1"))

    def _txn_touches_table(self, h: TableHandle) -> bool:
        """Whether the open transaction (if any) buffers changes for
        this table — the reference's HasTransactionLocalData() guard
        that disables every metadata fold
        (test/sql/stats/min_max_optimization_time_travel.test)."""
        txn = self._txn
        if txn is None:
            return False
        key = (str(h.table_id) if h.table_id >= 0
               else f"{h.schema_name}.{h.table_name}")

        def _owns(tname: str) -> bool:
            # ducklake_inlined_data_{tid}_{sv} / ducklake_inlined_delete_{tid}
            parts = tname.split("_")
            return (str(h.table_id) in parts[-2:])

        return bool(
            txn.new_data_files.get(key)
            or txn.new_delete_files.get(h.table_id)
            or txn.removed_data_files.get(h.table_id)
            or txn.inlined_deletes.get(h.table_id)
            or h.table_id in txn.inlined_clears
            or any(tid == h.table_id for tid, _t, _r in txn.inlined_inserts)
            or any(tid == h.table_id
                   for tid, _t, _r in txn.inlined_inserts_rebase)
            or any(k == f"{h.schema_name}.{h.table_name}"
                   for k, _p, _c in txn.inlined_ctas)
            or any(_owns(t) for t, _k, _u in txn.inlined_end_updates)
            or any(_owns(t) for t, _k, _u in txn.inlined_row_removals)
        )

    _FOLDABLE_STAT_TYPES = (
        T.ByteType, T.ShortType, T.IntegerType, T.LongType,
        T.FloatType, T.DoubleType, T.DecimalType, T.StringType,
        T.BooleanType, T.DateType, T.TimestampType, T.TimestampNTZType,
    )

    def stats_agg(self, name: str, columns: list[str] | None = None, *,
                  at_version: int | None = None,
                  at_timestamp: str | None = None) -> dict:
        """COUNT(*)/MIN/MAX answered from catalog metadata when that is
        provably exact, falling back to a real scan otherwise — the
        reference's stats-folding rules (ducklake_scan.cpp stats
        binding; pinned by test/sql/stats/min_max_optimization_basic /
        _deletes / _time_travel and count_star_optimization_*):

        - transaction-local changes disable every fold (scan);
        - COUNT(*) folds from per-file record counts net of live
          delete-file/inlined-delete counts plus visible inlined rows,
          including under time travel — unless a compacted partial_max
          file straddles the target snapshot (row-level visibility ⇒
          scan);
        - MIN/MAX fold from per-file column stats of the visible files
          plus driver-side aggregation of catalog-inlined rows; any
          delete (positional or inlined), a file missing the column's
          stats row, a float file containing NaN, or a non-foldable
          type makes that column fall back to the scan.

        Returns ``{"row_count", "min", "max", "folded_count",
        "folded_columns"}`` — always correct; the folded flags report
        whether metadata alone answered."""
        h = self._handle(name, at_version=at_version,
                         at_timestamp=at_timestamp)
        snap = self._resolve_snapshot(at_version, at_timestamp)
        time_travel = (at_version is not None or at_timestamp is not None
                       or self._pinned is not None)
        schema = self._spark_schema(h)
        known = set(schema.fieldNames())
        colnames = (list(columns) if columns is not None
                    else list(schema.fieldNames()))
        for c in colnames:
            if c not in known:
                raise DuckLakeError(f"unknown column {c!r} in {name}")
        cid_of = {c[1]: c[0] for c in h.columns}

        def _scan(cols: list[str], need_count: bool) -> dict:
            df = self.table(name, at_version=at_version,
                            at_timestamp=at_timestamp)
            aggs = [F.count(F.lit(1)).alias("__c")] if need_count else []
            for c in cols:
                aggs.append(F.min(F.col(c)).alias(f"__mn_{c}"))
                aggs.append(F.max(F.col(c)).alias(f"__mx_{c}"))
            if not aggs:
                return {}
            row = df.agg(*aggs).collect()[0].asDict()
            out: dict = {}
            if need_count:
                out["row_count"] = row["__c"]
            out["min"] = {c: row[f"__mn_{c}"] for c in cols}
            out["max"] = {c: row[f"__mx_{c}"] for c in cols}
            return out

        if self._txn_touches_table(h):
            r = _scan(colnames, True)
            return {"row_count": r["row_count"], "min": r["min"],
                    "max": r["max"], "folded_count": False,
                    "folded_columns": {c: False for c in colnames}}

        files = self._visible_files(h, snap, None)
        if time_travel and (
            any(f["partial_max"] is not None for f in files)
            or self.meta.query(
                "SELECT 1 FROM ducklake_delete_file WHERE table_id=? "
                "AND partial_max IS NOT NULL AND partial_max > ? "
                "AND begin_snapshot <= ? "
                "AND (end_snapshot IS NULL OR end_snapshot > ?) LIMIT 1",
                (h.table_id, snap.snapshot_id, snap.snapshot_id,
                 snap.snapshot_id),
            )
        ):
            # a compaction output (or a flushed delete file) embeds rows
            # from several snapshots; row-level visibility at this
            # snapshot needs the scan's embedded-snapshot filter
            # (count_star_optimization_time_travel); a flushed delete
            # file straddling the target snapshot makes delete_count
            # inexact the same way
            r = _scan(colnames, True)
            return {"row_count": r["row_count"], "min": r["min"],
                    "max": r["max"], "folded_count": False,
                    "folded_columns": {c: False for c in colnames}}

        fids = [f["data_file_id"] for f in files]
        deletes = self._delete_entries(h, snap, fids)
        inl_dels = self._inlined_delete_positions(h, snap, fids)
        inlined = self._inlined_visible_rows(h, snap, schema)

        n = (sum(f["record_count"] for f in files)
             - sum(d[2] for d in deletes) - len(inl_dels)
             + sum(len(rows) for _pos, rows in inlined))

        file_stats: dict[tuple[int, int], tuple] = {}
        if fids and colnames:
            qs = ",".join("?" * len(fids))
            for fid, cid, mn, mx, vc, nc, nan in self.meta.query(
                "SELECT data_file_id, column_id, min_value, max_value, "
                "value_count, null_count, contains_nan "
                f"FROM ducklake_file_column_stats WHERE table_id = ? "
                f"AND data_file_id IN ({qs})",
                (h.table_id, *fids),
            ):
                file_stats[(fid, cid)] = (mn, mx, vc, nc, nan)

        # reference fold-exactness rule (ducklake_scan.cpp:214-220):
        # global column stats only widen on insert and are never
        # tightened by deletes, so MIN/MAX is exact iff the GROSS
        # record_count (ducklake_table_stats, total ever inserted since
        # the last recompute) equals the net delete-adjusted count —
        # and never under time travel (global stats are current-only,
        # min_max_optimization_time_travel.test).
        gross_row = self.meta.query(
            "SELECT record_count FROM ducklake_table_stats "
            "WHERE table_id=?", (h.table_id,))
        gross = gross_row[0][0] if gross_row else None
        has_deletes = (bool(deletes or inl_dels) or time_travel
                       or (gross is not None and gross != n))
        mins: dict = {}
        maxs: dict = {}
        folded: dict = {}
        scan_cols: list[str] = []
        for c in colnames:
            dt = schema[c].dataType
            ok = (not has_deletes
                  and isinstance(dt, self._FOLDABLE_STAT_TYPES))
            lo = hi = None
            has_nan = False
            if ok:
                for fid in fids:
                    s = file_stats.get((fid, cid_of[c]))
                    if s is None:
                        ok = False  # column physically absent / no stats
                        break
                    mn, mx, vc, nc, nan = s
                    if nan:
                        ok = False  # true max may be NaN; stats exclude it
                        break
                    if vc is not None and nc is not None and vc == nc:
                        continue  # all-NULL file contributes nothing
                    if mn is None or mx is None:
                        ok = False
                        break
                    lo = _fold_min(lo, _stats_value(mn, dt))
                    hi = _fold_max(hi, _stats_value(mx, dt))
            if ok:
                for pos, rows in inlined:
                    if c not in pos:
                        ok = False  # older-epoch inlined rows lack it
                        break
                    for r in rows:
                        v = _from_sql_value(r[pos[c]], dt)
                        if v is None:
                            continue
                        if isinstance(v, float) and v != v:
                            has_nan = True
                            continue
                        lo = _fold_min(lo, v)
                        hi = _fold_max(hi, v)
            if ok:
                if has_nan:  # NaN orders greatest (DuckDB & Spark)
                    hi = float("nan")
                    if lo is None:
                        lo = float("nan")
                mins[c], maxs[c], folded[c] = lo, hi, True
            else:
                scan_cols.append(c)
                folded[c] = False
        if scan_cols:
            r = _scan(scan_cols, False)
            mins.update(r["min"])
            maxs.update(r["max"])
        return {"row_count": n, "min": mins, "max": maxs,
                "folded_count": True, "folded_columns": folded}

    def _inlined_visible_rows(self, h: TableHandle, snap: Snapshot,
                              schema: T.StructType) -> list[tuple[dict, list]]:
        """[(current-name → storage position, raw rows)] of the
        committed inlined rows visible at ``snap`` — catalog-side data,
        so folding over it is still a metadata-only answer."""
        out: list[tuple[dict, list]] = []
        for (tname,) in self.meta.query(
            "SELECT table_name FROM ducklake_inlined_data_tables "
            "WHERE table_id=?", (h.table_id,),
        ):
            rows = self.meta.query(
                f"SELECT * FROM {tname} WHERE begin_snapshot <= ? "
                "AND (end_snapshot IS NULL OR end_snapshot > ?)",
                (snap.snapshot_id, snap.snapshot_id),
            )
            if not rows:
                continue
            idx = {r[1]: i for i, r in enumerate(
                self.meta.query(f"PRAGMA table_info({tname})"))}
            pos = self._inlined_epoch_positions(h, tname, idx, schema)
            out.append((pos, rows))
        return out

    def _inlined_delete_positions(self, h: TableHandle, snap: Snapshot,
                                  file_ids: list[int]) -> list[tuple[int, int]]:
        """Catalog-absorbed small deletes live at snap (reference:
        inlined file deletions, ducklake_delete.cpp:530-546)."""
        tname = f"ducklake_inlined_delete_{h.table_id}"
        keep = set(file_ids)
        out: list[tuple[int, int]] = []
        if self.meta.query(
            "SELECT 1 FROM sqlite_master WHERE type='table' AND name=?", (tname,)
        ):
            # reference-exact visibility: begin_snapshot <= snap only
            # (GetFileIdsWithInlinedDeletions,
            # ducklake_metadata_manager.cpp:3145-3147) — rows for dead
            # files drop out via the ``keep`` file-id intersection
            rows = self.meta.query(
                f"SELECT file_id, row_id FROM {tname} "
                "WHERE begin_snapshot <= ?",
                (snap.snapshot_id,),
            )
            out = [(fid, pos) for fid, pos in rows if fid in keep]
        # positions absorbed by the OPEN transaction overlay the
        # committed set: the txn's own later scans/deletes must not see
        # (or re-delete) those rows
        if self._txn is not None:
            out.extend(
                (fid, pos)
                for fid, pos in self._txn.inlined_deletes.get(h.table_id, [])
                if fid in keep
            )
        return out

    def _delete_entries(self, h: TableHandle, snap: Snapshot,
                        file_ids: list[int], *,
                        txn_overlay: bool = False) -> list[tuple[int, str]]:
        if not file_ids:
            return []
        rows = self.meta.query(
            "SELECT data_file_id, path, path_is_relative, delete_count, "
            "format, encryption_key, delete_file_id "
            "FROM ducklake_delete_file "
            "WHERE table_id = ? AND begin_snapshot <= ? "
            "AND (end_snapshot IS NULL OR end_snapshot > ?)",
            (h.table_id, snap.snapshot_id, snap.snapshot_id),
        )
        keep = set(file_ids)
        replaced: set[int] = set()
        if txn_overlay and self._txn is not None:
            replaced = set(self._txn.replaced_delete_files)
        out = [
            (fid, _resolve_rel_path(h.path, p, prel), dc, fmt, ekey)
            for fid, p, prel, dc, fmt, ekey, dfid in rows
            if fid in keep and dfid not in replaced
        ]
        if txn_overlay and self._txn is not None:
            out.extend(
                (d.data_file_id, d.path, d.delete_count, d.format,
                 d.encryption_key)
                for d in self._txn.new_delete_files.get(h.table_id, [])
                if d.data_file_id in keep
            )
            # buffered delete files that reference a not-yet-committed
            # data file by PATH (txn-local DML under the table's name
            # key; in-txn flush under the id key): the anti-join matches
            # rows by the file_path column in the delete parquet, so a
            # synthetic -1 id is fine here
            buf_key = (f"{h.schema_name}.{h.table_name}"
                       if h.table_id < 0 else str(h.table_id))
            for key2 in (buf_key, h.table_id):
                out.extend(
                    (-1, d.path, d.delete_count, d.format,
                     d.encryption_key)
                    for d in self._txn.new_delete_files.get(key2, [])
                    if isinstance(d.data_file_id, str)
                )
        return out

    def _initial_defaults(self, h: TableHandle, schema: T.StructType) -> dict:
        """{column_name: initial_default SQL} for the handle's columns
        (the value existing rows take after ADD COLUMN ... DEFAULT).
        Keyed by the handle's snapshot-correct column ids, so time
        travel over later-dropped or renamed columns still fills."""
        names = set(schema.fieldNames())
        id2name = {c[0]: c[1] for c in h.columns if c[1] in names}
        if not id2name:
            return {}
        qs = ",".join("?" * len(id2name))
        out = {
            id2name[cid]: _default_expr_text(d, kind)
            for cid, d, kind in self.meta.query(
                "SELECT column_id, initial_default, default_value_type "
                "FROM ducklake_column "
                f"WHERE table_id = ? AND column_id IN ({qs}) "
                "AND initial_default IS NOT NULL AND parent_column IS NULL",
                (h.table_id, *id2name),
            )
            if cid in id2name
        }
        # columns added by THIS open transaction have no committed row
        # yet; their DEFAULT backfills existing rows for in-txn reads
        if self._txn is not None:
            for _cid, cname, _ctype, dflt in self._txn.pending_columns.get(
                    h.table_id, []):
                if dflt is not None and cname in names:
                    out.setdefault(cname, dflt)
        return out

    def _columns_absent_in_files(self, h: TableHandle, files: list[dict],
                                 cnames: dict) -> dict:
        """fid -> frozenset(column names physically absent in that file),
        restricted to ``cnames``. One batched stats query, O(#files)."""
        colmap = {c[1]: c[0] for c in h.columns}
        cids = {colmap[c]: c for c in cnames if c in colmap}
        if not cids:
            return {}
        qs = ",".join("?" * len(cids))
        present: set = set()
        fids = [f["data_file_id"] for f in files]
        # scope to the scan's files (chunked: a table's historical stats
        # rows can far outnumber the visible snapshot's)
        for i in range(0, len(fids), 500):
            chunk = fids[i:i + 500]
            fqs = ",".join("?" * len(chunk))
            present.update(
                (fid, cid)
                for fid, cid in self.meta.query(
                    "SELECT data_file_id, column_id "
                    "FROM ducklake_file_column_stats "
                    f"WHERE table_id = ? AND column_id IN ({qs}) "
                    f"AND data_file_id IN ({fqs})",
                    (h.table_id, *cids, *chunk),
                )
            )
        out: dict[int, frozenset] = {}
        for f in files:
            fid = f["data_file_id"]
            if fid < 0:
                # txn-overlay buffered file (synthetic id, no committed
                # stats rows yet): it was written by THIS transaction under
                # the current schema, so every current column is physically
                # present — never coalesce-fill explicit NULLs in it
                continue
            absent = frozenset(
                c for cid, c in cids.items() if (fid, cid) not in present
            )
            if absent:
                out[fid] = absent
        return out

    def _file_epoch_keys(
        self, h: TableHandle, files: list[dict], schema: T.StructType
    ) -> tuple[dict, dict]:
        """fid -> (later-renames, pending-field-defaults, absent-columns)
        evolution-epoch triple for each native file, all batched. Shared
        by the scan (:meth:`_read_files`) and by maintenance rewrites —
        compaction must group files by EXACTLY the key the scan groups
        by, or a merged file silently loses its epoch's treatment
        (reference groups compaction per schema_version,
        ducklake_compaction_functions.cpp:299-348)."""
        renames = self._rename_log(h)
        field_defaults = self._field_default_log(h)
        field_adds = self._field_added_log(h)
        init_defaults = self._initial_defaults(h, schema)
        absent_by_fid = (
            self._columns_absent_in_files(h, files, init_defaults)
            if init_defaults
            else {}
        )
        out = {}
        for f in files:
            # buffered overlay files (begin_snapshot None) are newer
            # than every committed rename: no rename postdates them
            fsnap = self._file_begin_snapshot(f)
            later = tuple(
                r for r in renames if fsnap is not None and r[0] > fsnap
            )
            ffill = tuple(
                d for d in field_defaults
                if fsnap is not None and d[0] > fsnap
            )
            fadds = tuple(
                (cid, path) for snap, cid, path in field_adds
                if fsnap is not None and snap > fsnap
            )
            out[f["data_file_id"]] = (
                later, ffill,
                absent_by_fid.get(f["data_file_id"], frozenset()),
                fadds,
            )
        return out, init_defaults

    def _null_added_fields(self, h: TableHandle, part: DataFrame,
                           fadds) -> DataFrame:
        """NULL out nested fields added AFTER the rows in ``part`` were
        stored: a re-added field must not resurrect a dropped
        generation's bytes (the reference gives re-added fields a fresh
        field id — struct_evolution_reuse.test). Shared by the parquet
        epoch-group scan and the inlined-data scan."""
        for cid, path in fadds:
            cname = next((c[1] for c in h.columns if c[0] == cid), None)
            if cname is None or cname not in part.columns:
                continue
            # container hops (map key/value, list element) are not
            # addressable by withField; adds under them read NULL
            # naturally unless bytes were re-added there — out of scope
            segs = path.split(".")
            if any(s in ("key", "value", "element") for s in segs):
                continue
            ctype = next((c[2] for c in h.columns if c[0] == cid), None)
            ftype = _type_at_struct_path(ctype, segs) if ctype else None
            if ftype is None:
                continue  # field since dropped/renamed
            part = part.withColumn(
                cname,
                F.when(
                    F.col(cname).isNotNull(),
                    F.col(cname).withField(
                        ".".join(f"`{s}`" for s in segs),
                        F.lit(None).cast(ducklake_to_spark(ftype)),
                    ),
                ).otherwise(F.col(cname)),
            )
        return part

    def _apply_epoch_evolution(self, h: TableHandle, part: DataFrame,
                               schema: T.StructType,
                               fixups: list, ffill: tuple, absent,
                               init_defaults: dict,
                               fadds: tuple = ()) -> DataFrame:
        """Materialize one epoch group's schema-evolution treatment:
        positional struct cast back to current nested names, NULL-out of
        fields added after the group's files were written (a re-added
        field must not resurrect a dropped generation's bytes —
        struct_evolution_reuse.test), ADD FIELD ... DEFAULT fill, and
        ADD COLUMN ... DEFAULT fill for columns physically absent from
        the group's files."""
        cid_to_name = {c[0]: c[1] for c in h.columns}
        for cname, dtype in fixups:
            part = part.withColumn(cname, F.col(cname).cast(dtype))
        part = self._null_added_fields(h, part, fadds)
        for _snap, cid, fname, dsql in ffill:
            cname = cid_to_name.get(cid)
            if cname is None or cname not in part.columns:
                continue
            ftype = dict(self._struct_parts(
                next(c[2] for c in h.columns if c[0] == cid)
            )).get(fname)
            if ftype is None:
                continue  # field since dropped
            part = part.withColumn(
                cname,
                F.when(
                    F.col(cname).isNotNull(),
                    F.col(cname).withField(
                        fname,
                        F.expr(dsql).cast(ducklake_to_spark(ftype)),
                    ),
                ).otherwise(F.col(cname)),
            )
        for cname in absent:
            part = part.withColumn(
                cname,
                F.coalesce(
                    F.col(cname),
                    F.expr(
                        "try_cast(%s AS %s)"
                        % (_lit_as_string(init_defaults[cname]),
                           schema[cname].dataType.simpleString())
                    ),
                ),
            )
        return part

    def _read_files(self, h: TableHandle, snap: Snapshot, files: list[dict],
                    schema: T.StructType, deletes: list[tuple[int, str]],
                    with_virtual: bool, txn_overlay: bool = False) -> DataFrame | None:
        if not files:
            return None
        # two read groups: native files resolve columns by parquet field id
        # (rename-safe); adopted foreign files (mapping_id set) have no field
        # ids and resolve by name via their recorded name map
        native = [f for f in files if f.get("mapping_id") is None]
        foreign = [f for f in files if f.get("mapping_id") is not None]
        parts = []
        if native:
            reader_schema = self._reader_schema(h, schema)
            # ADD COLUMN ... DEFAULT: files written before the column
            # existed must surface initial_default, not NULL (reference
            # issue #1135; initial_default in ducklake_column). Physical
            # presence is derived from stats-row existence in ONE batched
            # query — the write path records a stats row for every column
            # a file actually contains.
            # group files by the nested renames that postdate them: those
            # files still carry the old field names, so each epoch group
            # reads with its own reverted schema and is rebuilt to the
            # current names by positional struct cast (no rewrite); the
            # absent-default-column set splits groups further so the
            # coalesce fill only touches files that lack the column.
            epoch_keys, init_defaults = self._file_epoch_keys(
                h, native, schema)
            groups: dict[tuple, list[dict]] = {}
            for f in native:
                groups.setdefault(epoch_keys[f["data_file_id"]], []).append(f)
            copts = self._crypto_read_options(native)
            for (later, ffill, absent, fadds), members in groups.items():
                gschema, fixups = self._epoch_schema(h, reader_schema, later)
                part = self.spark.read.options(**copts).schema(gschema).parquet(
                    *[os.path.join(self.data_path, f["path"]) for f in members]
                )
                parts.append(self._apply_epoch_evolution(
                    h, part, schema, fixups, ffill, absent, init_defaults,
                    fadds))
        if foreign:
            init_defaults_f = self._initial_defaults(h, schema)
            absent_f = (
                self._columns_absent_in_files(h, foreign, init_defaults_f)
                if init_defaults_f
                else {}
            )
            # a file's name map binds source column names to the table
            # FIELD IDS live at adoption time (ducklake_name_mapping).
            # A column dropped and re-added later has a NEW id, so old
            # adopted files must read NULL for it even when the file has
            # a column with that name (reference add_files.test:150-160)
            colmap_cur = {c[1]: c[0] for c in h.columns}
            name_map: dict[int, dict[int, str]] = {}
            mids = {f["mapping_id"] for f in foreign}
            if mids:
                qs = ",".join("?" * len(mids))
                for mid_, tgt, src in self.meta.query(
                    "SELECT mapping_id, target_field_id, source_name "
                    f"FROM ducklake_name_mapping WHERE mapping_id IN ({qs})",
                    tuple(mids),
                ):
                    name_map.setdefault(mid_, {})[tgt] = src
            fgroups: dict[tuple, list[dict]] = {}
            for f in foreign:
                fgroups.setdefault(
                    (f["mapping_id"],
                     absent_f.get(f["data_file_id"], frozenset())), []
                ).append(f)
            dl_types = {c[1]: str(c[2] or "").lower() for c in h.columns}
            for (mid_, absent), members in fgroups.items():
                tgt_src = name_map.get(mid_, {})
                # read schema uses the SOURCE names for mapped columns
                read_fields, out_cols = [], []
                for f_ in schema.fields:
                    src = tgt_src.get(colmap_cur.get(f_.name))
                    if src is None and not tgt_src:
                        # no recorded rows (legacy catalogs): by name
                        src = f_.name
                    if src is None:
                        out_cols.append(
                            F.lit(None).cast(f_.dataType).alias(f_.name))
                    elif dl_types.get(f_.name) == "uuid":
                        # adopted UUID columns may be duckdb's
                        # FIXED_LEN_BYTE_ARRAY(16) with a UUID logical
                        # annotation — Spark's schema converter rejects
                        # that outright (PARQUET_TYPE_ILLEGAL) but reads
                        # it fine as BINARY; 16-byte payloads format to
                        # canonical uuid text, longer ones are already
                        # text (add_files_type_check_uuid.test)
                        read_fields.append(
                            T.StructField(src, T.BinaryType(), True))
                        b = F.col(src)
                        hx = F.lower(F.hex(b))
                        canon = F.concat_ws(
                            "-", F.substring(hx, 1, 8),
                            F.substring(hx, 9, 4), F.substring(hx, 13, 4),
                            F.substring(hx, 17, 4), F.substring(hx, 21, 12))
                        out_cols.append(
                            F.when(b.isNull(), F.lit(None).cast("string"))
                            .when(F.length(b) == 16, canon)
                            .otherwise(b.cast("string"))
                            .alias(f_.name))
                    else:
                        read_fields.append(
                            T.StructField(src, f_.dataType, True))
                        out_cols.append(F.col(src).alias(f_.name))
                fdf = self.spark.read.options(
                    **self._crypto_read_options(members)
                ).schema(T.StructType(read_fields)).parquet(
                    *[os.path.join(self.data_path, f["path"]) for f in members]
                ).select(*out_cols, "_metadata")
                for cname in absent:
                    fdf = fdf.withColumn(
                        cname,
                        F.coalesce(
                            F.col(cname),
                            F.expr(init_defaults_f[cname]).cast(
                                schema[cname].dataType
                            ),
                        ),
                    )
                if native and len(parts[0].schema.fields) > len(schema.fields):
                    fdf = fdf.withColumn(
                        ROWID_COL, F.lit(None).cast("long")
                    ).withColumn(SNAPID_COL, F.lit(None).cast("long"))
                parts.append(fdf)
        # ---- overlay-need analysis (driver-side, catalog-only) -------
        # The per-row overlay machinery below (URL-decoded __file key,
        # broadcast join against the per-file map, positional-delete
        # anti-join, embedded-snapshot filter) exists for deletes,
        # virtual columns, foreign hive backfill and compaction
        # visibility. A plain read of a table that needs NONE of those —
        # the common full-scan/aggregate shape — must not pay a per-row
        # string decode + hash join + filter: Spark cannot prune the
        # LeftOuter join itself (it cannot prove the build side unique).
        inline_dels = self._inlined_delete_positions(
            h, snap, [f["data_file_id"] for f in files]
        )
        if txn_overlay and self._txn is not None:
            keep_ids = {f["data_file_id"] for f in files}
            inline_dels = list(inline_dels) + [
                (fid, pos)
                for fid, pos in self._txn.inlined_deletes.get(h.table_id, [])
                if fid in keep_ids
            ]
        # the open transaction's own writes (merged delete files, flushed
        # rows) are stamped with the ANTICIPATED commit snapshot
        # (ducklake_delete.cpp:433: current + 1) — an overlay read must
        # see them, so its snapshot bound is snap+1; committed artifacts
        # never carry ids beyond the committed head, so nothing foreign
        # leaks in
        read_snap = (snap.snapshot_id + 1
                     if txn_overlay and self._txn is not None
                     else snap.snapshot_id)
        # per-file row_id_start / begin-snapshot / hive-value map (small;
        # broadcast join — at 100 TB this is #files rows, not data rows)
        pv_fill = self._foreign_partition_values(h, files)
        # a compacted file's rows can postdate the read snapshot only
        # when its recorded partial_max does (rows are stamped at most
        # partial_max) — at-head reads never need the filter
        partial_need = any(
            f["partial_max"] is not None and f["partial_max"] > read_snap
            for f in files
        )
        if (not with_virtual and not deletes and not inline_dels
                and not any(pv_fill.values()) and not partial_need):
            df = None
            for p in parts:
                if "_metadata" in p.columns:
                    p = p.drop("_metadata")
                df = p if df is None else df.unionByName(p)
            return df.select(*[f.name for f in schema.fields])

        df = None
        for p in parts:
            p = (
                p.withColumn("__file", F.expr(DECODED_FILE_PATH))
                .withColumn("__pos", F.col("_metadata.row_index"))
            )
            if "_metadata" in p.columns:
                # foreign parts select _metadata explicitly to survive
                # the mapped projection; drop it for the union
                p = p.drop("_metadata")
            df = p if df is None else df.unionByName(p)
        inline_files = int(self.meta.option(
            "filemap_inline_limit", "16") or 0)
        if len(files) <= inline_files and not any(pv_fill.values()):
            # literal lookup map instead of a broadcast LeftOuter join:
            # the driver-built map relation costs a scheduler round trip
            # (its RDD must be evaluated to build the broadcast) on
            # EVERY overlay read, and the join survives column pruning
            # even when nothing downstream reads its columns. A
            # try_element_at on a literal map is a plain expression —
            # pruned together with its column, NULL on a missing key
            # exactly like the unmatched LeftOuter probe. Lookup cost is
            # a linear key scan, so past the (configurable) entry limit
            # the broadcast join returns — a million-file read must not
            # inline a million-entry literal into the plan.
            entries = []
            for i, f in enumerate(files):
                entries += [
                    F.lit(self._file_uri(f["path"])),
                    F.struct(
                        F.lit(f["row_id_start"]).cast("long").alias("r"),
                        F.lit(self._file_begin_snapshot(f)).cast(
                            "long").alias("s"),
                        F.lit(f["partial_max"]).cast("long").alias("p"),
                        F.lit(i).cast("long").alias("i"),
                    ),
                ]
            finfo = F.try_element_at(
                F.create_map(*entries), F.col("__file"))
            df = (
                df.withColumn("__row_id_start", finfo["r"])
                .withColumn("__file_snap", finfo["s"])
                .withColumn("__partial_max", finfo["p"])
                .withColumn("__file_index", finfo["i"])
            )
        else:
            file_rows = [
                (self._file_uri(f["path"]), f["row_id_start"],
                 self._file_begin_snapshot(f), f["partial_max"],
                 pv_fill.get(f["data_file_id"]) or {}, i)
                for i, f in enumerate(files)
            ]
            fmap = _local_df(
                self.spark, file_rows,
                "____path string, __row_id_start long, __file_snap long, "
                "__partial_max long, __pv map<string,string>, "
                "__file_index long",
            )
            df = df.join(
                F.broadcast(fmap), df["__file"] == fmap["____path"], "left"
            ).drop("____path")
        # foreign hive-partitioned files: the partition column exists only in
        # the directory name -> backfill from recorded partition values
        if any(pv_fill.values()):
            for f_ in schema.fields:
                pvv = F.element_at(F.col("__pv"), f_.name)
                # hive's NULL sentinel directory name reads back as NULL
                # (reference add_files_hive_partition_cast.test)
                pvv = F.when(
                    pvv == "__HIVE_DEFAULT_PARTITION__", F.lit(None)
                ).otherwise(pvv).cast(f_.dataType)
                df = df.withColumn(
                    f_.name, F.coalesce(F.col(f_.name), pvv)
                )

        # positional deletes -> anti join on (file, pos); positions come
        # from delete parquet files and/or catalog-inlined small deletes
        # (inline_dels / read_snap computed above for the fast-path gate)
        if deletes or inline_dels:
            ddf = None
            pq_dels = [
                e for e in deletes if (e[3] or "parquet").lower() != "puffin"
            ]
            dv_dels = [
                e for e in deletes if (e[3] or "parquet").lower() == "puffin"
            ]
            plain_dels = [e for e in pq_dels if not e[4]]
            enc_dels = [e for e in pq_dels if e[4]]
            if plain_dels:
                # the reference binds a delete file to its data file
                # through the CATALOG (ducklake_delete_file.data_file_id
                # — ScanDeleteFile ignores the embedded file_path text,
                # ducklake_delete_filter.cpp:218-221), so deletes keep
                # applying after a DATA_PATH relocation
                # (delete/delete_ignore_extra_columns.test). Only
                # txn-local buffered deletes (synthetic id -1, data
                # file not yet committed) match on the embedded path.
                path_by_dfid = {f["data_file_id"]: f["path"]
                                for f in files}
                cat_dels = [e for e in plain_dels
                            if e[0] >= 0 and e[0] in path_by_dfid]
                path_dels = [e for e in plain_dels if e[0] < 0]
                if cat_dels:
                    dpaths = [os.path.join(self.data_path, p)
                              for _, p, _, _, _ in cat_dels]
                    mapping = [
                        (self._file_uri(p),
                         self._file_uri(path_by_dfid[fid]))
                        for fid, p, _, _, _ in cat_dels
                    ]
                    # flushed delete files embed a per-position
                    # snapshot column (WriteDeleteFileWithSnapshots):
                    # positions deleted after the read snapshot must
                    # not apply; files without it read NULL
                    ddf = (
                        self.spark.read.schema(
                            f"file_path string, pos long, "
                            f"{SNAPID_COL} long")
                        .parquet(*dpaths)
                        .filter(F.col(SNAPID_COL).isNull()
                                | (F.col(SNAPID_COL)
                                   <= F.lit(read_snap)))
                        .select(
                            F.expr(DECODED_FILE_PATH).alias("__delpath"),
                            F.col("pos").alias("__dpos"))
                    )
                    if len(mapping) <= inline_files:
                        # same literal-map rewrite as the file-info
                        # join above: inner-join semantics preserved
                        # by the not-null filter (a delete path
                        # outside the map contributes nothing)
                        dmap = F.create_map(*[
                            F.lit(x) for pair in mapping for x in pair])
                        ddf = ddf.select(
                            F.try_element_at(
                                dmap, F.col("__delpath")).alias("__dfile"),
                            "__dpos",
                        ).filter(F.col("__dfile").isNotNull())
                    else:
                        mdf = F.broadcast(_local_df(
                            self.spark, mapping,
                            "__delpath string, __dfile string"))
                        ddf = ddf.join(mdf, "__delpath").select(
                            "__dfile", "__dpos")
                if path_dels:
                    del_paths = [os.path.join(self.data_path, p)
                                 for _, p, _, _, _ in path_dels]
                    pdf = (
                        self.spark.read.schema(
                            f"file_path string, pos long, "
                            f"{SNAPID_COL} long")
                        .parquet(*del_paths)
                        .filter(F.col(SNAPID_COL).isNull()
                                | (F.col(SNAPID_COL)
                                   <= F.lit(read_snap)))
                        .select(
                            self._file_uri_col(
                                F.col("file_path")).alias("__dfile"),
                            F.col("pos").alias("__dpos"),
                        )
                    )
                    ddf = pdf if ddf is None else ddf.unionByName(pdf)
            if enc_dels:
                edf = self._read_encrypted_delete_files(
                    [(os.path.join(self.data_path, p), k)
                     for _, p, _, _, k in enc_dels]
                )
                edf = (
                    edf.filter(F.col(SNAPID_COL).isNull()
                               | (F.col(SNAPID_COL)
                                  <= F.lit(read_snap)))
                    .select(
                        self._file_uri_col(F.col("file_path")).alias("__dfile"),
                        F.col("pos").alias("__dpos"),
                    )
                )
                ddf = edf if ddf is None else ddf.unionByName(edf)
            if dv_dels:
                # puffin deletion vectors decode EXECUTOR-side (bounded
                # per-file roaring bitmaps; the driver only lists paths)
                path_by_fid = {f["data_file_id"]: f["path"] for f in files}
                dvdf = self._decode_dv_files(
                    [
                        (
                            os.path.join(self.data_path, p),
                            self._file_uri(path_by_fid[fid]),
                        )
                        for fid, p, _, _, _ in dv_dels
                        if fid in path_by_fid
                    ]
                ).filter(
                    F.col(SNAPID_COL).isNull()
                    | (F.col(SNAPID_COL) <= F.lit(read_snap))
                ).select("__dfile", "__dpos")
                ddf = dvdf if ddf is None else ddf.unionByName(dvdf)
            if inline_dels:
                path_by_fid = {
                    f["data_file_id"]: self._file_uri(f["path"])
                    for f in files
                }
                idf = _local_df(
                    self.spark,
                    [(path_by_fid[fid], pos) for fid, pos in inline_dels],
                    "__dfile string, __dpos long",
                )
                ddf = idf if ddf is None else ddf.unionByName(idf)
            ddf = ddf.distinct()
            # broadcast only a small position set: the catalog's
            # delete_count bounds it without reading the delete parquet.
            # 10% deletes of a billion-row table is ~1e8 (path,pos) pairs
            # — broadcasting that OOMs every executor; fall back to a
            # shuffle anti-join and let AQE pick the strategy (SURVEY §4)
            n_del = sum(int(dc or 0) for _, _, dc, *_ in deletes) + len(inline_dels)
            limit = int(self.meta.option("delete_broadcast_row_limit",
                                         "1000000") or 0)
            if n_del <= limit:
                ddf = F.broadcast(ddf)
            df = df.join(
                ddf,
                (df["__file"] == ddf["__dfile"]) & (df["__pos"] == ddf["__dpos"]),
                "left_anti",
            )

        # compaction partial_max: filter rows committed after the target snapshot
        if SNAPID_COL in df.columns:
            df = df.filter(
                (F.col("__partial_max").isNull())
                | F.col(SNAPID_COL).isNull()
                | (F.col(SNAPID_COL) <= F.lit(read_snap))
            )

        rowid = (
            F.col(ROWID_COL)
            if ROWID_COL in df.columns
            else F.col("__row_id_start") + F.col("__pos")
        )
        if ROWID_COL in df.columns and "__row_id_start" in df.columns:
            rowid = F.coalesce(F.col(ROWID_COL), F.col("__row_id_start") + F.col("__pos"))
        snapid = (
            F.coalesce(F.col(SNAPID_COL), F.col("__file_snap"))
            if SNAPID_COL in df.columns
            else F.col("__file_snap")
        )
        if with_virtual:
            df = (
                df.withColumn("rowid", rowid)
                .withColumn("snapshot_id", snapid)
                .withColumn("filename", F.col("__file"))
                .withColumn("file_row_number", F.col("__pos"))
                .withColumn("file_index", F.col("__file_index"))
            )
            keep = [f.name for f in schema.fields] + [
                "rowid", "snapshot_id", "filename", "file_row_number",
                "file_index"]
        else:
            keep = [f.name for f in schema.fields]
        return df.select(*keep)

    def _crypto_read_options(self, files: list[dict]) -> dict[str, str]:
        """Parquet decryption options for a set of catalog files: the
        key list is built from ducklake_data_file.encryption_key rows
        (reference reads the same column, ducklake_insert.cpp:743-756)."""
        if not self.encrypted:
            return {}
        keys = sorted({
            f.get("encryption_key") for f in files if f.get("encryption_key")
        })
        if not keys:
            return {}
        return {
            "parquet.crypto.factory.class": "ducklake.DuckLakeCrypto",
            "ducklake.encryption.file.keys": ",".join(
                f"{_crypto_key_id(k)}:{k}" for k in keys
            ),
        }

    def _read_encrypted_delete_files(
            self, pairs: list[tuple[str, str | None]]) -> DataFrame:
        """Encrypted delete parquet -> DataFrame(file_path, pos).

        Delete files carry per-file PME keys (reference encrypts them
        like data files, ducklake_delete.cpp:63-70); Spark's reader
        only speaks the Java factory's data-file key format, so these
        decode executor-side with pyarrow (crypto_pme) — Arrow-batched,
        one small positions file per task."""
        import pandas as pd  # noqa: F811

        src = self.spark.createDataFrame(pairs, "path string, key string")

        def decode(batches):
            import pyarrow.parquet as _pq

            from ducklake_spark.crypto_pme import (
                decrypt_properties,
                key_id_for,
            )
            from ducklake_spark.fsio import open_input_any

            for pdf in batches:
                frames = []
                for p, k in zip(pdf["path"], pdf["key"]):
                    props = decrypt_properties({key_id_for(k): k})
                    with open_input_any(p) as fh:
                        # single-threaded read: pyarrow's PME decryptor
                        # is not safe under the threaded column reader
                        # (intermittent 'Failed decryption finalization')
                        t = _pq.ParquetFile(
                            fh, decryption_properties=props
                        ).read(use_threads=False)
                    f = t.to_pandas()
                    if SNAPID_COL not in f.columns:
                        f[SNAPID_COL] = pd.Series(
                            [None] * len(f), dtype="float64")
                    frames.append(f[["file_path", "pos", SNAPID_COL]])
                yield (
                    pd.concat(frames)
                    if frames
                    else pd.DataFrame(
                        {"file_path": [], "pos": [], SNAPID_COL: []})
                )

        return src.repartition(
            min(max(1, len(pairs)), 256)
        ).mapInPandas(decode, f"file_path string, pos long, {SNAPID_COL} long")

    def _decode_dv_files(self, pairs: list[tuple[str, str]]) -> DataFrame:
        """(dv_path, target_file_uri) pairs -> DataFrame(__dfile, __dpos).

        Iceberg-v3 deletion vectors (bare blob or puffin container,
        reference ducklake_puffin.cpp:32-120) decoded in an Arrow batch
        on the executors — DV files are per-data-file roaring bitmaps,
        so each task's memory is bounded by one file's positions."""
        import pandas as pd  # noqa: F811

        src = self.spark.createDataFrame(pairs, "dv_path string, __dfile string")

        def decode(batches):
            from ducklake_spark.functions.roaring import puffin_read

            for pdf in batches:
                out_f: list[str] = []
                out_p: list[int] = []
                out_s: list[int | None] = []
                from ducklake_spark.fsio import open_input_any as _open

                for dvp, target in zip(pdf["dv_path"], pdf["__dfile"]):
                    with _open(dvp) as fh:
                        buf = fh.read()
                    # blobs are cumulative; a position's snapshot is the
                    # FIRST blob carrying it (reference puffin DVs tag
                    # blobs with ducklake-snapshot-id)
                    seen: dict[int, int | None] = {}
                    for blob in puffin_read(buf, dvp):
                        s = blob.get("snapshot_id")
                        for p in blob["positions"]:
                            if p not in seen:
                                seen[p] = s
                    for p in sorted(seen):
                        out_f.append(target)
                        out_p.append(p)
                        out_s.append(seen[p])
                yield pd.DataFrame({"__dfile": out_f, "__dpos": out_p,
                                    SNAPID_COL: pd.Series(
                                        out_s, dtype="float64")})

        return src.mapInPandas(
            decode, f"__dfile string, __dpos long, {SNAPID_COL} long")

    def _delete_file_df(self, rel_path: str, fmt: str | None,
                        target_rel: str = "",
                        with_snap: bool = False) -> DataFrame:
        """One delete file -> DataFrame(file_path, pos) with file_path
        relative to data_path; handles parquet positional files AND
        iceberg-v3 deletion vectors ('puffin' format). ``with_snap``
        adds the embedded per-position snapshot column (NULL for files
        written without history — reference
        WriteDeleteFileWithSnapshots)."""
        cols = (["file_path", "pos", SNAPID_COL] if with_snap
                else ["file_path", "pos"])
        if (fmt or "parquet").lower() == "puffin":
            return (
                self._decode_dv_files(
                    [(os.path.join(self.data_path, rel_path), target_rel)]
                )
                .withColumnRenamed("__dfile", "file_path")
                .withColumnRenamed("__dpos", "pos")
                .select(*cols)
            )
        if self.encrypted:
            # stored paths are TABLE-relative; rel_path arrives
            # data-root-relative — suffix-match (file names carry a
            # uuid, so the suffix is unique)
            krow = self.meta.query(
                "SELECT encryption_key FROM ducklake_delete_file "
                "WHERE (path=? OR ? LIKE '%' || path) "
                "AND encryption_key IS NOT NULL LIMIT 1",
                (rel_path, rel_path),
            )
            if krow:
                return self._read_encrypted_delete_files(
                    [(os.path.join(self.data_path, rel_path), krow[0][0])]
                ).select(*cols)
        schema = ("file_path string, pos long" if not with_snap
                  else f"file_path string, pos long, `{SNAPID_COL}` long")
        return self.spark.read.schema(schema).parquet(
            os.path.join(self.data_path, rel_path)
        )

    def _foreign_partition_values(self, h: TableHandle,
                                  files: list[dict]) -> dict[int, dict[str, str]]:
        """For adopted (name-mapped) files: data_file_id -> {column: hive value}."""
        out: dict[int, dict[str, str]] = {}
        foreign = [f for f in files if f.get("mapping_id") is not None]
        if not foreign:
            return out
        spec = self._partition_spec(h)
        foreign_ids = {f["data_file_id"] for f in foreign}
        # single batched query (not per-file round-trips); each file's
        # values bind to the spec it was ADOPTED under (its stamped
        # partition_id) — resolving them through a later spec would
        # backfill the wrong column after SET PARTITIONED BY changes
        vals = self.meta.query(
            "SELECT pv.data_file_id, pv.partition_key_index, "
            "pv.partition_value, df.partition_id "
            "FROM ducklake_file_partition_value pv "
            "JOIN ducklake_data_file df "
            "ON pv.data_file_id = df.data_file_id "
            "WHERE pv.table_id=?",
            (h.table_id,),
        )
        name_by_cid = {c[0]: c[1] for c in h.columns}
        spec_cols: dict[int, dict[int, tuple[str | None, str]]] = {}
        for pid, kidx, cid, transform in self.meta.query(
            "SELECT partition_id, partition_key_index, column_id, transform "
            "FROM ducklake_partition_column WHERE table_id=?",
            (h.table_id,),
        ):
            spec_cols.setdefault(pid, {})[kidx] = (
                name_by_cid.get(cid), transform)
        for fid, idx, v, fpid in vals:
            if fid not in foreign_ids:
                continue
            if idx < 0:
                # hive value for a column OUTSIDE the partition spec:
                # adoption records it as -(column_id)-1 (the value only
                # exists in the directory name, so the scan must
                # backfill it regardless of the table's partition spec)
                cname = name_by_cid.get(-idx - 1)
                if cname is not None:
                    out.setdefault(fid, {})[cname] = v
            elif fpid is not None and fpid in spec_cols:
                cname, transform = spec_cols[fpid].get(idx, (None, ""))
                if cname is not None and transform == "identity":
                    out.setdefault(fid, {})[cname] = v
            elif fpid is None and idx < len(spec) and spec[idx][1] == "identity":
                # legacy files adopted before partition_id stamping:
                # keep the old current-spec interpretation
                out.setdefault(fid, {})[spec[idx][0]] = v
        return out

    def _file_begin_snapshot(self, f: dict) -> int:
        """begin_snapshot rides along in the file-list SELECT; the SQL
        fallback exists only for dicts built outside _visible_files.
        Never issue this per-file in a loop — at 1M files that is 1M
        driver round-trips (it was: the round-2 verdict's N+1)."""
        if f.get("begin_snapshot") is not None:
            return f["begin_snapshot"]
        if f["data_file_id"] < 0:
            # buffered (uncommitted) overlay file: its snapshot does not
            # exist yet — snapshot_id reads NULL, like the reference
            # (test/sql/virtualcolumns/ducklake_snapshot_id.test)
            return None
        row = self.meta.query(
            "SELECT begin_snapshot FROM ducklake_data_file WHERE data_file_id=?",
            (f["data_file_id"],),
        )
        return row[0][0]

    def _uri_prefix(self) -> str:
        """Prefix P such that P + <relative file path> equals the value
        Spark reports in ``_metadata.file_path`` for files under
        data_path — 'file:/abs/path/' locally (both for bare paths and
        file:// URIs), the untouched URI for object-store schemes."""
        dp = self.data_path  # normalized to end with '/'
        if "://" in dp:
            scheme, rest = dp.split("://", 1)
            if scheme == "file":
                return "file:/" + rest.lstrip("/")
            return dp
        return "file:" + dp

    def _file_uri(self, path: str) -> str:
        """Catalog file path -> the URI Spark reports in
        ``_metadata.file_path``. Handles all three stored forms:
        relative to data_path (normal writes), absolute local
        (adopted foreign files), and scheme-qualified URIs."""
        if "://" in path:
            scheme, rest = path.split("://", 1)
            if scheme == "file":
                return "file:/" + rest.lstrip("/")
            return path
        if path.startswith("/"):
            return "file:" + path
        return self._uri_prefix() + path

    def _file_uri_col(self, c):
        """Column-expression form of :meth:`_file_uri` (delete-file
        contents store the same three path forms)."""
        return (
            F.when(c.startswith("/"), F.concat(F.lit("file:"), c))
            .when(c.contains("://"), c)
            .otherwise(F.concat(F.lit(self._uri_prefix()), c))
        )

    def _reader_schema(self, h: TableHandle, schema: T.StructType) -> T.StructType:
        """Schema used against parquet: table columns (+ embedded rowid /
        snapshot columns if any file carries them)."""
        fields = [
            T.StructField(f.name, f.dataType, True, {"parquet.field.id": cid})
            for (cid, _n, _t, _na), f in zip(h.columns, schema.fields)
        ]
        if self._any_file_has_embedded(h):
            fields.append(T.StructField(ROWID_COL, T.LongType(), True,
                                        {"parquet.field.id": ROWID_FIELD_ID}))
            fields.append(T.StructField(SNAPID_COL, T.LongType(), True,
                                        {"parquet.field.id": SNAPID_FIELD_ID}))
        return T.StructType(fields)

    def _any_file_has_embedded(self, h: TableHandle) -> bool:
        # row_id_start NULL -> embedded rowid column; partial_max set ->
        # embedded snapshot column (a positional rotation-mode compaction
        # output keeps row_id_start but still embeds snapshot ids)
        rows = self.meta.query(
            "SELECT 1 FROM ducklake_data_file WHERE table_id=? "
            "AND (row_id_start IS NULL OR partial_max IS NOT NULL) "
            "AND end_snapshot IS NULL LIMIT 1",
            (h.table_id,),
        )
        if rows:
            return True
        # update/compaction/rewrite buffers in the OPEN transaction also
        # embed rowids — an uncommitted reader must read them through
        # the embedded column, not recompute from positions
        if self._txn is not None:
            buf_key = (str(h.table_id) if h.table_id >= 0
                       else f"{h.schema_name}.{h.table_name}")
            for fi in self._txn.new_data_files.get(buf_key, []):
                if not fi.allocate or fi.partial_max is not None:
                    return True
        return False

    def _inlined_epoch_positions(self, h: TableHandle, tname: str,
                                 idx: dict, schema: T.StructType) -> dict:
        """{current field name -> position in the inlined table} resolved
        through COLUMN IDS of the table's schema-version epoch: a
        renamed column still reads its old-named storage, and a
        dropped-then-readded name does NOT resurrect the old column's
        values. Falls back to name identity when the epoch's snapshot
        is unresolvable (e.g. expired)."""
        colmap = {c[1]: c[0] for c in h.columns}
        row = self.meta.query(
            "SELECT schema_version FROM ducklake_inlined_data_tables "
            "WHERE table_id = ? AND table_name = ?",
            (h.table_id, tname),
        )
        epoch_map: dict[int, str] | None = None
        if row:
            snap_row = self.meta.query(
                "SELECT MIN(snapshot_id) FROM ducklake_snapshot "
                "WHERE schema_version = ?",
                (row[0][0],),
            )
            if snap_row and snap_row[0][0] is not None:
                epoch_snap = snap_row[0][0]
                epoch_map = {
                    cid: cname
                    for cid, cname in self.meta.query(
                        "SELECT column_id, column_name FROM ducklake_column "
                        "WHERE table_id = ? AND begin_snapshot <= ? "
                        "AND (end_snapshot IS NULL OR end_snapshot > ?) "
                        "AND parent_column IS NULL",
                        (h.table_id, epoch_snap, epoch_snap),
                    )
                }
        out = {}
        for f_ in schema.fields:
            stored_name = (
                epoch_map.get(colmap.get(f_.name))
                if epoch_map is not None
                else f_.name
            )
            if stored_name is not None and stored_name in idx:
                out[f_.name] = idx[stored_name]
        return out

    def inlined_frame(self, h: TableHandle, tname: str, rows: list,
                      schema: T.StructType, head: list = (),
                      tail: list = (), colpos: dict | None = None
                      ) -> DataFrame:
        """DataFrame from raw ``SELECT *`` rows of one inlined catalog
        table, mapping its columns to the CURRENT schema through the
        epoch's column ids — an older-epoch inlined table may lack
        columns added later (those fill with initial_default, the same
        semantics as pre-ADD-COLUMN parquet files, reference issue
        #1135) and may store renamed columns under their old names.

        ``head``/``tail``: (StructField, fn(row, idx) -> value) pairs
        prepended/appended to each output row (rowid/snapshot columns
        at the call sites)."""
        idx = colpos if colpos is not None else {
            r[1]: i for i, r in enumerate(
                self.meta.query(f"PRAGMA table_info({tname})")
            )
        }
        pos = self._inlined_epoch_positions(h, tname, idx, schema)
        out_schema = T.StructType(
            [f_ for f_, _fn in head] + list(schema.fields)
            + [f_ for f_, _fn in tail]
        )
        # one inlined table == one schema-version epoch: nested-field
        # renames/adds that POSTDATE the table's epoch replay on read,
        # exactly like the parquet epoch-group treatment (renames remap
        # the stored JSON keys; adds NULL out below so a re-added name
        # never resurrects a dropped generation's values)
        fadds = self._field_added_log(h)
        rlog = self._rename_log(h)
        fdefaults = self._field_default_log(h)  # incl. buffered in-txn
        epoch_snap = None
        if fadds or rlog or fdefaults:
            row = self.meta.query(
                "SELECT MIN(s.snapshot_id) "
                "FROM ducklake_inlined_data_tables t "
                "JOIN ducklake_snapshot s "
                "ON s.schema_version = t.schema_version "
                "WHERE t.table_id = ? AND t.table_name = ?",
                (h.table_id, tname),
            )
            epoch_snap = row[0][0] if row else None
        renames: dict[str, list[tuple[str, str]]] = {}
        if epoch_snap is not None:
            cid_name = {c[0]: c[1] for c in h.columns}
            for snap_s, cid, old, new in rlog:  # snapshot-ordered
                if snap_s > epoch_snap and cid in cid_name:
                    renames.setdefault(cid_name[cid], []).append((old, new))

        def _conv(r, f_):
            if f_.name not in pos:
                return None
            v = r[pos[f_.name]]
            rn = renames.get(f_.name)
            if rn and v is not None and isinstance(
                    f_.dataType, (T.StructType, T.ArrayType, T.MapType)):
                d = json.loads(v) if isinstance(v, str) else v
                for old, new in rn:
                    *hops, leaf = old.split(".")
                    d = _remap_json_rename(d, hops, leaf, new)
                v = d
            return _from_sql_value(v, f_.dataType)

        data = [
            tuple(fn(r, idx) for _f, fn in head)
            + tuple(_conv(r, f_) for f_ in schema.fields)
            + tuple(fn(r, idx) for _f, fn in tail)
            for r in rows
        ]
        df = self.spark.createDataFrame(data, out_schema)
        if fadds and epoch_snap is not None:
            df = self._null_added_fields(
                h, df,
                [(cid, path) for snap_s, cid, path in fadds
                 if snap_s > epoch_snap])
        if fdefaults and epoch_snap is not None:
            # ADD FIELD ... DEFAULT postdating this epoch fills the
            # default into the epoch's rows, exactly like the parquet
            # epoch-group treatment (struct_field_default.test: inlined
            # {'i':1,'j':2} reads k=42 after ADD COLUMN col1.k DEFAULT,
            # including same-transaction reads of a buffered add)
            cid_to_name = {c[0]: c[1] for c in h.columns}
            for _snap, cid, fname, dsql in fdefaults:
                if _snap <= epoch_snap:
                    continue
                cname = cid_to_name.get(cid)
                if cname is None or cname not in df.columns:
                    continue
                ftype = dict(self._struct_parts(
                    next(c[2] for c in h.columns if c[0] == cid)
                )).get(fname)
                if ftype is None:
                    continue  # field since dropped
                df = df.withColumn(
                    cname,
                    F.when(
                        F.col(cname).isNotNull(),
                        F.col(cname).withField(
                            fname,
                            F.expr(dsql).cast(ducklake_to_spark(ftype)),
                        ),
                    ).otherwise(F.col(cname)),
                )
        init_defaults = self._initial_defaults(h, schema)
        for cname in (n for n in schema.fieldNames() if n not in pos):
            if cname in init_defaults:
                df = df.withColumn(
                    cname,
                    F.coalesce(
                        F.col(cname),
                        F.expr(
                            "try_cast(%s AS %s)"
                            % (_lit_as_string(init_defaults[cname]),
                               schema[cname].dataType.simpleString())
                        ),
                    ),
                )
        return df

    def _read_inlined(self, h: TableHandle, snap: Snapshot, schema: T.StructType,
                      with_virtual: bool, txn_overlay: bool = False,
                      findex_base: int = 0) -> DataFrame | None:
        # DISTINCT guards catalogs where a historical registry race
        # double-inserted a row (each duplicate would double every scan)
        tabs = self.meta.query(
            "SELECT DISTINCT table_name FROM ducklake_inlined_data_tables "
            "WHERE table_id=?",
            (h.table_id,),
        )
        txn = self._txn if txn_overlay else None
        ended: set[tuple[str, int]] = set()
        removed: set[tuple[str, tuple]] = set()
        buffered: dict[str, list[tuple]] = {}
        if txn is not None:
            for tname, keys, tuples in txn.inlined_end_updates:
                if keys == ("row_id",) and tuples:
                    ended.update((tname, rid) for (rid,) in tuples)
            # rows an in-txn FLUSH moved to a (buffered) parquet file:
            # the overlay scan reads the flushed file, so the catalog
            # originals must hide or every flushed row doubles
            # (data_inlining_flush_sorted_basic.test: flush inside BEGIN)
            for tname, keys, keyvals in txn.inlined_row_removals:
                if keys == ("row_id", "begin_snapshot"):
                    removed.update((tname, tuple(kv)) for kv in keyvals)
            from ducklake_spark.transaction import PENDING_SNAPSHOT

            # uncommitted rows read snapshot_id NULL, and offset-keyed
            # buffered inserts read TRANSACTION-LOCAL rowids starting at
            # 10^18 in buffer order (reference ducklake_row_id.test /
            # basic_data_inlining.test in-txn reads); preserved-rowid
            # buffers (UPDATE re-inserts) keep their real ids
            for tid, tname, packed in txn.inlined_inserts:
                if tid == h.table_id:
                    buffered.setdefault(tname, []).extend(
                        tuple(None if x is PENDING_SNAPSHOT else x
                              for x in r)
                        for r in packed
                    )
            rebase_seq: dict[str, int] = {}
            for tid, tname, packed in txn.inlined_inserts_rebase:
                if tid == h.table_id:
                    base = rebase_seq.get(tname, 0)
                    buffered.setdefault(tname, []).extend(
                        (TXN_LOCAL_ROWID_BASE + base + r[0],)
                        + tuple(None if x is PENDING_SNAPSHOT else x
                                for x in r[1:])
                        for r in packed
                    )
                    rebase_seq[tname] = base + len(packed)
            # a buffered insert may target an epoch table that has no
            # committed registry row yet — include it
            known = {t for (t,) in tabs}
            tabs = list(tabs) + [(t,) for t in buffered if t not in known]
        def _tail(fname: str, fidx: int) -> list:
            """Virtual-column tail for ONE inlined pseudo-file: the
            reference's multifile list numbers inlined tables after the
            data files and names them by their catalog table
            (basic_data_inlining.test: filename ducklake_inlined_data_…
            file_index after parquet; the txn-local buffer reads
            __ducklake_inlined_transaction_local_data)."""
            if not with_virtual:
                return []
            frn = itertools.count()
            return [
                (T.StructField("rowid", T.LongType()),
                 lambda r, idx: r[idx["row_id"]]),
                (T.StructField("snapshot_id", T.LongType()),
                 lambda r, idx: r[idx["begin_snapshot"]]),
                (T.StructField("filename", T.StringType()),
                 lambda r, idx, v=fname: v),
                (T.StructField("file_row_number", T.LongType()),
                 lambda r, idx, c=frn: next(c)),
                (T.StructField("file_index", T.LongType()),
                 lambda r, idx, v=fidx: v),
            ]

        parts: list[DataFrame] = []
        buffered_frames: list[tuple[str, list]] = []
        for ti, (tname,) in enumerate(tabs):
            rows = self.meta.query(
                f"SELECT * FROM {tname} WHERE begin_snapshot <= ? "
                "AND (end_snapshot IS NULL OR end_snapshot > ?)",
                (snap.snapshot_id, snap.snapshot_id),
            )
            # committed rows sort by row_id so small-table scans read
            # back in insertion order like the reference (test/sql/
            # default/default_values.test relies on it for unsorted
            # expected output)
            rows = sorted(rows, key=lambda r: (r[0] is None, r[0]))
            if txn is not None:
                # read-your-own-writes: hide rows this txn deleted
                if ended:
                    rows = [r for r in rows if (tname, r[0]) not in ended]
                if removed:
                    # (row_id, begin_snapshot) — layout row_id,
                    # begin_snapshot, end_snapshot, data…
                    rows = [r for r in rows
                            if (tname, (r[0], r[1])) not in removed]
                if buffered.get(tname):
                    buffered_frames.append((tname, buffered[tname]))
            if not rows:
                continue
            parts.append(
                self.inlined_frame(h, tname, rows, schema,
                                   tail=_tail(tname, findex_base + ti))
            )
        # this transaction's buffered inserts read as their own
        # pseudo-file AFTER the committed inlined tables
        for bi, (tname, rows) in enumerate(buffered_frames):
            parts.append(self.inlined_frame(
                h, tname, rows, schema,
                tail=_tail("__ducklake_inlined_transaction_local_data",
                           findex_base + len(tabs) + bi)))
        if txn is not None:
            # inlined CTAS rows of a txn-local table (no table id yet)
            key = f"{h.schema_name}.{h.table_name}"
            colpos = {"row_id": 0, "begin_snapshot": 1, "end_snapshot": 2}
            for i, f_ in enumerate(schema.fields):
                colpos[f_.name] = 3 + i
            for ci, (k, packed, _cols) in enumerate(txn.inlined_ctas):
                if k != key or not packed:
                    continue
                rows = [
                    (TXN_LOCAL_ROWID_BASE + r[0], None) + tuple(r[2:])
                    for r in packed
                ]
                parts.append(self.inlined_frame(
                    h, "__ducklake_ctas_buffer", rows, schema,
                    tail=_tail(
                        "__ducklake_inlined_transaction_local_data",
                        findex_base + len(tabs) + len(buffered_frames)
                        + ci),
                    colpos=colpos))
        if not parts:
            return None
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    # -- catalog lookups ---------------------------------------------------

    def _split_name(self, name: str) -> tuple[str, str]:
        parts = name.split(".")
        return (parts[0], parts[1]) if len(parts) == 2 else ("main", parts[0])

    def _migrate_inlined_delete_tables(self) -> None:
        """Rewrite legacy inlined-delete side tables to the
        reference-exact layout ducklake_inlined_delete_{tid}(file_id,
        row_id, begin_snapshot) (ducklake_metadata_manager.cpp:3055).

        Handles two legacy layouts: the old table name
        ducklake_inlined_deletes_{tid} with (data_file_id, pos) columns,
        and the 4-column variant carrying end_snapshot. Consumed rows
        (non-NULL end_snapshot) are kept: positions flushed to a delete
        parquet re-apply idempotently through the anti-join, and rows
        for rewritten files go inert through the dead file's
        visibility."""
        try:
            names = [r[0] for r in self.meta.query(
                "SELECT name FROM sqlite_master WHERE type='table' AND ("
                "name LIKE 'ducklake_inlined_deletes_%' OR "
                "name LIKE 'ducklake_inlined_delete_%')"
            )]
        except Exception:
            return
        for name in names:
            tid = name.rsplit("_", 1)[-1]
            if not tid.isdigit():
                continue
            cols = self.meta.columns(name) or []
            legacy_name = name.startswith("ducklake_inlined_deletes_")
            if not legacy_name and set(cols) == {"file_id", "row_id",
                                                 "begin_snapshot"}:
                continue  # already current
            fcol = "data_file_id" if "data_file_id" in cols else "file_id"
            rcol = "pos" if "pos" in cols else "row_id"
            bexpr = "begin_snapshot" if "begin_snapshot" in cols else "0"
            new = f"ducklake_inlined_delete_{tid}"
            con = self.meta.con
            tmp = f"__mig_inlined_delete_{tid}"
            con.execute(f"DROP TABLE IF EXISTS {tmp}")
            con.execute(
                f"CREATE TABLE {tmp}("
                "file_id BIGINT, row_id BIGINT, begin_snapshot BIGINT)"
            )
            con.execute(
                f"INSERT INTO {tmp} "
                f"SELECT {fcol}, {rcol}, {bexpr} FROM {name}"
            )
            con.execute(f"DROP TABLE {name}")
            still_there = name != new and self.meta.query(
                "SELECT 1 FROM sqlite_master WHERE type='table' AND name=?",
                (new,))
            if still_there:
                # legacy-named table alongside an already-current one:
                # merge the migrated rows in
                con.execute(f"INSERT INTO {new} SELECT * FROM {tmp}")
                con.execute(f"DROP TABLE {tmp}")
            else:
                try:
                    con.execute(f"ALTER TABLE {tmp} RENAME TO {new}")
                except Exception:
                    con.execute(
                        f"CREATE TABLE {new}(file_id BIGINT, row_id BIGINT, "
                        "begin_snapshot BIGINT)")
                    con.execute(f"INSERT INTO {new} SELECT * FROM {tmp}")
                    con.execute(f"DROP TABLE {tmp}")
            try:
                con.commit()
            except Exception:
                pass

    def _find_table(self, schema_name: str, table_name: str,
                    snap: Snapshot | None = None) -> tuple | None:
        # t.path is SCHEMA-RELATIVE in the catalog (reference
        # convention, general/paths.test); resolve the full
        # data-root-relative path here so every downstream consumer
        # keeps seeing h.path as before. Absolute table paths
        # (path_is_relative = false) pass through untouched.
        path_expr = ("CASE WHEN t.path_is_relative "
                     "THEN s.path || t.path ELSE t.path END")
        if snap is None:
            rows = self.meta.query(
                f"SELECT t.table_id, t.table_uuid, t.schema_id, {path_expr} "
                "FROM ducklake_table t JOIN ducklake_schema s ON t.schema_id=s.schema_id "
                "WHERE s.schema_name=? AND t.table_name=? AND t.end_snapshot IS NULL",
                (schema_name, table_name),
            )
        else:
            rows = self.meta.query(
                f"SELECT t.table_id, t.table_uuid, t.schema_id, {path_expr} "
                "FROM ducklake_table t JOIN ducklake_schema s ON t.schema_id=s.schema_id "
                "WHERE s.schema_name=? AND t.table_name=? AND t.begin_snapshot <= ? "
                "AND (t.end_snapshot IS NULL OR t.end_snapshot > ?)",
                (schema_name, table_name, snap.snapshot_id, snap.snapshot_id),
            )
        return rows[0] if rows else None

    def _handle(self, name: str, *, at_version: int | None = None,
                at_timestamp: str | None = None) -> TableHandle:
        schema_name, table_name = self._split_name(name)
        snap = self._resolve_snapshot(at_version, at_timestamp)
        row = self._find_table(schema_name, table_name, snap)
        if (row is not None and self._txn is not None
                and at_version is None and at_timestamp is None
                and row[0] in self._txn.dropped_tables):
            # dropped in THIS transaction: the committed row no longer
            # answers; a same-named txn-local re-create takes over below
            row = None
        # txn-local RENAMEs overlay name resolution for the
        # transaction's own statements (reference dbt workload:
        # test/sql/alter/rename_table_dbt_workload.test — rename old ->
        # backup, tmp -> old, read both before COMMIT)
        if (self._txn is not None and at_version is None
                and at_timestamp is None and self._txn.renamed_tables):
            rmap: dict[int, str] = {}
            for tid, nname in self._txn.renamed_tables:
                rmap[tid] = nname  # last rename wins
            if row is not None and rmap.get(row[0], table_name) != table_name:
                row = None  # renamed AWAY: old name no longer answers
            if row is None:
                for tid, nname in rmap.items():
                    if tid in self._txn.dropped_tables:
                        continue  # renamed THEN dropped in this txn
                    if nname == table_name and tid >= 0:
                        hit = self.meta.query(
                            "SELECT t.table_id, t.table_uuid, t.schema_id, "
                            "CASE WHEN t.path_is_relative "
                            "THEN s.path || t.path ELSE t.path END "
                            "FROM ducklake_table t "
                            "JOIN ducklake_schema s ON t.schema_id=s.schema_id "
                            "WHERE t.table_id=? AND s.schema_name=? "
                            "AND t.begin_snapshot <= ? "
                            "AND (t.end_snapshot IS NULL OR t.end_snapshot > ?)",
                            (tid, schema_name, snap.snapshot_id,
                             snap.snapshot_id),
                        )
                        if hit:
                            row = hit[0]
                        break
        if row is None:
            # a table created earlier in THIS transaction is visible to
            # later statements in it (reference: BEGIN; CREATE TABLE;
            # INSERT; COMMIT — test/sql/checkpoint/
            # many_inserts_transaction.test). Synthetic handle: ids are
            # assigned at commit, so table_id=-1 and buffered files are
            # keyed by name (the CTAS mechanism, _resolve_table_id).
            if (self._txn is not None and at_version is None
                    and at_timestamp is None):
                for td in self._txn.created_tables:
                    if (td.schema_name == schema_name
                            and td.table_name == table_name):
                        if any(c.column_id is None for c in td.columns):
                            self._preassign_column_ids(td)
                        return TableHandle(
                            -1, td.table_uuid, -1, schema_name, table_name,
                            td.path,
                            [(c.column_id, c.name, c.type, c.nulls_allowed)
                             for c in td.columns],
                        )
            raise DuckLakeError(f"table {name!r} does not exist")
        table_id, table_uuid, schema_id, path = row
        cols = [
            tuple(c)
            for c in self.meta.query(
                "SELECT column_id, column_name, column_type, nulls_allowed "
                "FROM ducklake_column WHERE table_id=? AND begin_snapshot <= ? "
                "AND (end_snapshot IS NULL OR end_snapshot > ?) AND parent_column IS NULL "
                "ORDER BY column_order",
                (table_id, snap.snapshot_id, snap.snapshot_id),
            )
        ]
        if any((c[2] or "").lower() in ("struct", "list", "map")
               for c in cols):
            # reference-written catalogs store BARE composite tags on
            # the root row and the shape in per-node child rows
            # (migration/v01_partitioned.test fixtures) — reconstruct
            # the full type text from the children
            cols = [
                (cid, cn,
                 (self._compose_node_type(table_id, snap.snapshot_id,
                                          cid, ct)
                  if (ct or "").lower() in ("struct", "list", "map")
                  else ct), nn)
                for cid, cn, ct, nn in cols
            ]
        # columns ADDED by this open transaction overlay the committed
        # schema for the transaction's own statements (reference
        # txn-local schema; at_version/at_timestamp reads stay pinned)
        if (self._txn is not None and at_version is None
                and at_timestamp is None):
            dropped_cols = {
                c.lower() for c in getattr(
                    self._txn, "pending_column_drops", {}).get(table_id, [])
            }
            if dropped_cols:
                # DROP COLUMN earlier in this txn hides the column from
                # the txn's own statements (drop-readd chains,
                # insert_sorted_transaction.test:190-225)
                cols = [c for c in cols if c[1].lower() not in dropped_cols]
            cols += [
                (cid, cname, ctype, 1)
                for cid, cname, ctype, _dflt
                in self._txn.pending_columns.get(table_id, [])
            ]
            for old, new in self._txn.pending_column_renames.get(
                    table_id, []):
                cols = [
                    (cid, new if cn.lower() == old.lower() else cn, ct, nn)
                    for cid, cn, ct, nn in cols
                ]
            overlay_types = self._txn.pending_column_types.get(table_id)
            if overlay_types:
                cols = [
                    (cid, cn, overlay_types.get(cn, ct), nn)
                    for cid, cn, ct, nn in cols
                ]
        return TableHandle(table_id, table_uuid, schema_id, schema_name,
                           table_name, path, cols)

    def _compose_node_type(self, table_id: int, snap_id: int,
                           cid: int, bare: str) -> str:
        """Rebuild a composite type's full text from its per-node child
        rows (reference catalogs store 'struct'/'list'/'map' on the
        parent and one row per nested node)."""
        kids = self.meta.query(
            "SELECT column_id, column_name, column_type "
            "FROM ducklake_column WHERE table_id=? AND parent_column=? "
            "AND begin_snapshot <= ? "
            "AND (end_snapshot IS NULL OR end_snapshot > ?) "
            "ORDER BY column_order",
            (table_id, cid, snap_id, snap_id))
        parts = [
            (n, (self._compose_node_type(table_id, snap_id, k, t)
                 if (t or "").lower() in ("struct", "list", "map")
                 else t))
            for k, n, t in kids
        ]
        b = (bare or "").lower()
        if b == "struct":
            return ("struct<"
                    + ",".join(f"{n}:{t}" for n, t in parts) + ">")
        if b == "list":
            return f"list<{parts[0][1]}>" if parts else "list<int32>"
        if b == "map":
            by = {n.lower(): t for n, t in parts}
            return (f"map<{by.get('key', 'varchar')},"
                    f"{by.get('value', 'varchar')}>")
        return bare

    def _table_names(self, snap: Snapshot | None = None) -> list[str]:
        if snap is None:
            rows = self.meta.query(
                "SELECT s.schema_name, t.table_name FROM ducklake_table t "
                "JOIN ducklake_schema s ON t.schema_id = s.schema_id "
                "WHERE t.end_snapshot IS NULL "
                # schema-then-creation order: the reference's catalog
                # scan order, which fixes file-id assignment when a
                # bare maintenance call walks every table
                "ORDER BY s.schema_id, t.table_id"
            )
        else:
            rows = self.meta.query(
                "SELECT s.schema_name, t.table_name FROM ducklake_table t "
                "JOIN ducklake_schema s ON t.schema_id = s.schema_id "
                "WHERE t.begin_snapshot <= ? "
                "AND (t.end_snapshot IS NULL OR t.end_snapshot > ?) "
                "ORDER BY s.schema_id, t.table_id",
                (snap.snapshot_id, snap.snapshot_id),
            )
        names = [f"{s}.{t}" for s, t in rows]
        if snap is None and self._txn is not None:
            # transaction-local CREATE/DROP/RENAME visibility (reference:
            # catalog/schema.test txn-local schema.table binding)
            txn = self._txn
            dropped = set(txn.dropped_tables)
            renamed = dict(txn.renamed_tables)
            if dropped or renamed:
                ids = {f"{s}.{t}": tid for tid, s, t in self.meta.query(
                    "SELECT t.table_id, s.schema_name, t.table_name "
                    "FROM ducklake_table t JOIN ducklake_schema s "
                    "ON t.schema_id = s.schema_id "
                    "WHERE t.end_snapshot IS NULL")}
                out = []
                for n in names:
                    tid = ids.get(n)
                    if tid in dropped:
                        continue
                    if tid in renamed:
                        n = n.split(".", 1)[0] + "." + renamed[tid]
                    out.append(n)
                names = out
            names += [f"{td.schema_name}.{td.table_name}"
                      for td in txn.created_tables]
        return names

    def _spark_schema(self, h: TableHandle) -> T.StructType:
        return T.StructType(
            [
                T.StructField(cname, ducklake_to_spark(ctype), True)
                for _cid, cname, ctype, _na in h.columns
            ]
        )

    def _partition_spec(self, h: TableHandle) -> list[tuple[str, str]]:
        if h.table_id < 0:
            if self._txn is not None:
                for td in self._txn.created_tables:
                    if (td.schema_name == h.schema_name
                            and td.table_name == h.table_name):
                        return list(td.partition_spec)
            return []
        if self._txn is not None:
            pend = getattr(self._txn, "pending_partition_specs", {})
            if h.table_id in pend:
                return list(pend[h.table_id])
        rows = self.meta.query(
            "SELECT pc.column_id, pc.transform FROM ducklake_partition_info pi "
            "JOIN ducklake_partition_column pc ON pi.partition_id = pc.partition_id "
            "AND pi.table_id = pc.table_id "
            "WHERE pi.table_id = ? AND pi.end_snapshot IS NULL "
            "ORDER BY pc.partition_key_index",
            (h.table_id,),
        )
        colmap = {c[0]: c[1] for c in h.columns}
        return [(colmap[cid], transform) for cid, transform in rows]

    def _sort_key(self, h: TableHandle):
        """pending_sort_specs / sort_ops key: the table id for committed
        tables, the qualified name for txn-local ones."""
        return (h.table_id if h.table_id >= 0
                else f"{h.schema_name}.{h.table_name}")

    def _sort_spec(self, h: TableHandle) -> list[tuple[str, str, str]]:
        # a SET/RESET SORTED BY buffered in the open transaction is
        # visible to the transaction's own inserts/flushes/compactions
        # (reference: insert_sorted_transaction.test)
        if self._txn is not None:
            k = self._sort_key(h)
            if k in self._txn.pending_sort_specs:
                return list(self._txn.pending_sort_specs[k])
        if h.table_id < 0:
            return []
        rows = self.meta.query(
            "SELECT se.expression, se.sort_direction, se.null_order "
            "FROM ducklake_sort_info si "
            "JOIN ducklake_sort_expression se ON si.sort_id = se.sort_id "
            "AND si.table_id = se.table_id "
            "WHERE si.table_id = ? AND si.end_snapshot IS NULL "
            "ORDER BY se.sort_key_index",
            (h.table_id,),
        )
        xlate = getattr(self, "sort_expr_translator", None)
        out = []
        for e, d, n in rows:
            e2 = xlate(e) if xlate else e
            out.append((e2, (d or "asc").lower(),
                        (n or "nulls_last").lower()))
        if xlate is not None and out:
            # sort text stores RAW macro calls that re-bind here; a
            # macro dropped since SET SORTED BY must fail with the
            # reference's message
            # (data_inlining_flush_sorted_macro_errors.test)
            try:
                probe = self.spark.createDataFrame(
                    [], self._spark_schema(h))
                probe.select(*[F.expr(e2) for e2, _d, _n in out]).schema
            except Exception as ex:
                mfn = re.search(
                    r"UNRESOLVED_ROUTINE[^`]*`([^`]+)`", str(ex))
                if mfn:
                    raise DuckLakeError(
                        "Catalog Error: Scalar Function with name "
                        f"{mfn.group(1)} does not exist!")
                raise
        return out


def _parse_byte_size(v) -> int:
    """'10KB' / '1.5MB' / plain ints -> bytes (duckdb human sizes)."""
    s = str(v).strip().upper()
    m = re.fullmatch(
        r"(\d+(?:\.\d+)?)\s*(B|KB|KIB|MB|MIB|GB|GIB|TB|TIB)?", s)
    if not m:
        raise DuckLakeError(f"cannot parse byte size {v!r}")
    mult = {"B": 1, "KB": 1000, "KIB": 1024, "MB": 1000**2,
            "MIB": 1024**2, "GB": 1000**3, "GIB": 1024**3,
            "TB": 1000**4, "TIB": 1024**4}[m.group(2) or "B"]
    return int(float(m.group(1)) * mult)


def _expr_references(expr: str, col_name: str) -> bool:
    """Whether a stored sort expression references ``col_name`` as an
    identifier (string literals and CAST-target type names are masked
    out first — a column named 'date' must not match the DATE in
    'CAST(x AS DATE)')."""
    import re

    masked = _mask_non_identifiers(expr)
    return re.search(
        _identifier_pattern(col_name), masked, re.IGNORECASE
    ) is not None


def _identifier_pattern(name: str) -> str:
    """Regex matching ``name`` as a bare OR quoted identifier —
    '"date"' / '`date`' in a stored sort expression must behave
    exactly like the bare spelling for RENAME/DROP COLUMN guards."""
    e = re.escape(name)
    return rf'(?<![\w"`]){e}(?![\w"`])|(["`]){e}\1'


def _mask_non_identifiers(expr: str) -> str:
    """Blank string literals and `AS <typename>` cast targets so the
    identifier-match helpers only see column-reference positions."""
    import re

    masked = re.sub(r"'(?:[^']|'')*'", lambda m: "'" + " " * (len(m.group(0)) - 2) + "'", expr)
    return re.sub(
        r"(\bAS\s+)(\w+)",
        lambda m: m.group(1) + " " * len(m.group(2)),
        masked,
        flags=re.IGNORECASE,
    )


def _rename_identifier(expr: str, old: str, new: str) -> str:
    """Rewrite identifier occurrences of ``old`` to ``new`` in a stored
    sort expression, leaving string literals and `AS <type>` cast
    targets untouched."""
    import re

    pat = re.compile(_identifier_pattern(old), re.IGNORECASE)
    masked = _mask_non_identifiers(expr)
    out = []
    last = 0
    for m in pat.finditer(masked):
        out.append(expr[last:m.start()])
        q = m.group(1)  # quoted occurrence keeps its quoting style
        out.append(f"{q}{new}{q}" if q else new)
        last = m.end()
    out.append(expr[last:])
    return "".join(out)


def _sort_columns(sort_spec: list[tuple[str, str, str]]) -> list:
    """Spark sort columns for a stored sort spec — arbitrary SQL
    expressions with explicit null order (the reference's DuckDB
    default is NULLS LAST; Spark's ASC default is NULLS FIRST, so the
    order must always be explicit)."""
    out = []
    for expr, direction, null_order in sort_spec:
        c = F.expr(expr)
        if direction == "desc":
            c = (c.desc_nulls_first() if null_order == "nulls_first"
                 else c.desc_nulls_last())
        else:
            c = (c.asc_nulls_first() if null_order == "nulls_first"
                 else c.asc_nulls_last())
        out.append(c)
    return out


# Iceberg-v3 reserved field ids, which the reference mirrors
# (ducklake_delete.cpp:47-56 "follow icebergs' ids and names";
# _row_id and _last_updated_sequence_number)
ROWID_FIELD_ID = 2147483540
SNAPID_FIELD_ID = 2147483539


def _with_virtual_schema(schema: T.StructType) -> T.StructType:
    return T.StructType(
        list(schema.fields)
        + [
            T.StructField("rowid", T.LongType()),
            T.StructField("snapshot_id", T.LongType()),
            T.StructField("filename", T.StringType()),
            T.StructField("file_row_number", T.LongType()),
            T.StructField("file_index", T.LongType()),
        ]
    )


def _transform_col(cname: str, transform: str):
    """Partition transforms (reference: ducklake_partition_data.cpp:14-66)."""
    t = transform.lower()
    if t == "identity":
        return F.col(cname)
    if t in ("year", "month", "day", "hour"):
        return getattr(F, t)(F.col(cname))
    m = re.fullmatch(r"bucket\((\d+)\)", t)
    if m:
        from ducklake_spark.functions.murmur3 import murmur3_bucket_col

        return murmur3_bucket_col(F.col(cname), int(m.group(1)))
    raise DuckLakeError(f"unknown partition transform {transform!r}")


def _bbox_intersects_udf(box: tuple):
    """Exact row-level bbox intersection over WKB geometries — an
    Arrow-batched pandas UDF (the WKB decode has no JVM builtin).
    Pairs with file-level pruning in DuckLake._bbox_prune."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    qxmin, qymin, qxmax, qymax = (float(v) for v in box)

    def intersects(col):
        from ducklake_spark.extra_stats import GeoStats

        out = []
        for v in col:
            if v is None:
                out.append(False)
                continue
            g = GeoStats()
            try:
                g.update_wkb(bytes(v))
            except (ValueError, IndexError, struct.error):
                out.append(False)
                continue
            out.append(
                not (
                    g.xmax < qxmin or g.xmin > qxmax
                    or g.ymax < qymin or g.ymin > qymax
                )
            )
        return pd.Series(out)

    # real annotation objects: `from __future__ import annotations` would
    # stringify inline hints, which pandas_udf cannot resolve here
    intersects.__annotations__ = {"col": pd.Series, "return": pd.Series}
    return pandas_udf(intersects, "boolean")


def _resolve_rel_path(table_path: str, path: str, is_rel) -> str:
    """Catalog file path -> the engine's data-root-relative form.
    Catalog rows store TABLE-relative paths (reference convention);
    absolute rows (adopted external files, path_is_relative = false)
    pass through — downstream os.path.join treats them as final."""
    if is_rel:
        return (table_path or "") + path
    return path


def _variant_path_key(path: str) -> str:
    """Catalog key for a variant path: strip an exact '$.' prefix (a
    field literally named '$ref' stays intact) and quote each segment
    — stored variant_path text uses the reference's quoted form
    ('"a"', '"a"."b"'; variant_shredded_stats.test listings).
    Already-quoted input and the special 'root'/'element' paths pass
    through."""
    p = re.sub(r"^\$\.", "", str(path))
    if p in ("root", "element") or p.startswith('"'):
        return p
    return ".".join(f'"{seg}"' for seg in p.split("."))


def _variant_row_predicate(cname: str, path: str, op: str, val):
    """Row-level twin of the variant-stats file pruning: extract the
    JSON path and compare with the literal's type semantics. Uses the
    RAW path for extraction (the quoted form in _variant_path_key is
    a catalog-key convention only)."""
    key = re.sub(r"^\$\.", "", str(path)).strip('"')
    jpath = "$." + key if re.fullmatch(r"\w+", key) else f"$['{key}']"
    extracted = F.get_json_object(F.col(cname), jpath)
    if isinstance(val, bool):
        lhs, rhs = extracted, F.lit("true" if val else "false")
    elif isinstance(val, (int, float)):
        lhs, rhs = extracted.cast("double"), F.lit(float(val))
    else:
        lhs, rhs = extracted, F.lit(str(val))
    return {
        "=": lhs == rhs,
        "==": lhs == rhs,
        ">": lhs > rhs,
        ">=": lhs >= rhs,
        "<": lhs < rhs,
        "<=": lhs <= rhs,
    }[op]


def parse_memory_limit(v) -> int:
    """'512MB' / '64KiB' / bare bytes -> int bytes (the reference routes
    target_file_size through DBConfig::ParseMemoryLimit,
    ducklake_catalog.cpp GetTargetFileSize)."""
    if v is None:
        return 0
    s = str(v).strip()
    if not s:
        return 0
    m = re.fullmatch(
        r"(\d+(?:\.\d+)?)\s*([kKmMgGtT]i?[bB]?|[bB])?", s)
    if not m:
        raise DuckLakeError(f"cannot parse size {v!r}")
    num = float(m.group(1))
    unit = (m.group(2) or "b").lower()
    mult = {"b": 1,
            "kb": 1000, "kib": 1024, "k": 1000,
            "mb": 1000**2, "mib": 1024**2, "m": 1000**2,
            "gb": 1000**3, "gib": 1024**3, "g": 1000**3,
            "tb": 1000**4, "tib": 1024**4, "t": 1000**4}[unit]
    return int(num * mult)


def _parse_conjuncts(where: str) -> list[tuple[str, str, object]]:
    """Extract simple ``col <op> literal`` conjuncts for file pruning.
    Handles numeric, quoted-string, and DATE/TIMESTAMP literals (the
    latter compare correctly against ISO-serialized zone-map strings)."""
    def _simple(part):
        m = re.fullmatch(
            r"\s*(\w+(?:\.\w+)*)\s*(=|==|!=|<>|>=|<=|>|<)\s*"
            r"((?:(?i:DATE|TIMESTAMP)\s*)?'(?:[^']*)'|-?\d+(?:\.\d+)?)\s*",
            part,
        )
        if not m:
            return None
        col, op, lit = m.group(1), m.group(2), m.group(3)
        if op == "==":
            op = "="
        if op == "<>":
            op = "!="
        val: object
        if "'" in lit:
            val = lit[lit.index("'") + 1: -1]
        elif "." in lit:
            val = float(lit)
        else:
            val = int(lit)
        return col, op, val

    out = []
    for part in re.split(r"(?i)\s+AND\s+", where):
        mn = re.fullmatch(r"\s*(\w+(?:\.\w+)*)\s+IS\s+(NOT\s+)?NULL\s*",
                          part, re.IGNORECASE)
        if mn:
            out.append((mn.group(1), "notnull" if mn.group(2) else "isnull",
                        None))
            continue
        part = part.strip()
        if part.startswith("(") and part.endswith(")"):
            part = part[1:-1].strip()
        # x IN (a, b, c): a file survives if ANY value could be inside
        # its range (filter_pushdown.test IN reads 1 file)
        mi = re.fullmatch(
            r"\s*(\w+(?:\.\w+)*)\s+IN\s*\(([^()]*)\)\s*", part, re.I)
        if mi:
            vals = []
            ok = True
            for v in mi.group(2).split(","):
                sv = _simple(f"{mi.group(1)} = {v.strip()}")
                if sv is None:
                    ok = False
                    break
                vals.append(("=", sv[2]))
            if ok and vals:
                out.append((mi.group(1), "or", vals))
            continue
        # single-column OR chain: col=a OR col=b (file kept when any
        # branch could match — filter_pushdown.test OR reads 2 files)
        if re.search(r"(?i)\s+OR\s+", part):
            pieces = [_simple(p) for p in re.split(r"(?i)\s+OR\s+", part)]
            if all(p is not None for p in pieces) and len(
                    {p[0] for p in pieces}) == 1:
                out.append((pieces[0][0], "or",
                            [(p[1], p[2]) for p in pieces]))
            continue
        sv = _simple(part)
        if sv is not None:
            out.append(sv)
    return out


def _date_part_of_literal(part: str, iso: str) -> int | None:
    try:
        import datetime

        dt = datetime.datetime.fromisoformat(iso)
    except ValueError:
        return None
    return {"year": dt.year, "month": dt.month, "day": dt.day, "hour": dt.hour}[part]


def _open_parquet_meta(fh, b64key: str | None):
    """ParquetFile for footer harvesting. Encrypted lakes write
    encrypted footers (magic PARE) keyed by the file's catalog key; the
    Java writer's wrapped-DEK key material is the same PKMT1 format
    pyarrow's CryptoFactory parses, so one decrypt path serves files
    written by either stack. Legacy plaintext-footer encrypted files
    (and plain files) open without keys."""
    import pyarrow.parquet as pq

    if b64key:
        fh.seek(-4, 2)
        magic = fh.read(4)
        fh.seek(0)
        if magic == b"PARE":
            from ducklake_spark.crypto_pme import (
                decrypt_properties,
                key_id_for,
            )

            # register the key under BOTH id derivations: Spark-written
            # data files stamp _crypto_key_id, pyarrow-written delete
            # files stamp crypto_pme.key_id_for
            return pq.ParquetFile(
                fh,
                decryption_properties=decrypt_properties({
                    key_id_for(b64key): b64key,
                    _crypto_key_id(b64key): b64key,
                }),
            )
    return pq.ParquetFile(fh)


def _harvest_stats(pf, colmap: dict[str, int]) -> list[ColumnStatsRow]:
    """Per-file zone maps from the parquet footer (SURVEY §1.4: the
    reference harvests these from the writer; we read them back with
    pyarrow on the driver)."""
    md = pf.metadata
    agg: dict[str, ColumnStatsRow] = {}
    unsigned_fixups: set[str] = set()
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            path = col.path_in_schema.split(".")
            name = path[0]
            if name not in colmap:
                continue
            if len(path) > 1:
                # nested leaf: stats key off the leaf node's OWN
                # column id (per-node rows, ducklake_field_data.cpp) —
                # struct leaves ("s.a"), list elements
                # ("l.list.element"), map entries. The reference
                # records NO stats row for the nested parent column
                # itself (add_files_complex_nested_stats_mre.test
                # lists only leaf ids; ducklake_geometry_nested_struct
                # .test:45 expects exactly one row); a leaf without an
                # id (legacy catalogs) contributes nothing.
                leaf = col.path_in_schema
                if leaf not in colmap:
                    continue
                row = agg.setdefault(
                    leaf, ColumnStatsRow(column_id=colmap[leaf])
                )
            else:
                row = agg.setdefault(
                    name, ColumnStatsRow(column_id=colmap[name]))
            row.column_size_bytes += col.total_compressed_size
            s = col.statistics
            if s is None:
                # chunk carries no statistics at all: the file's counts
                # are unknowable — store NULL, never 0, or the IS NULL
                # prune ("null_count = 0" drops the file) silently
                # eats rows of foreign files whose writer omitted stats
                row.value_count = None
                row.null_count = None
                continue
            if row.value_count is not None:
                row.value_count = (
                    None if s.num_values is None
                    else row.value_count + s.num_values
                )
            if row.null_count is not None:
                row.null_count = (
                    None if not s.has_null_count
                    else row.null_count + s.null_count
                )
            if s.has_min_max:
                try:
                    smin, smax = s.min, s.max
                except (NotImplementedError, ValueError):
                    # pyarrow can't decode min/max for DECIMAL logical
                    # types ("Cannot extract statistics") — scale the
                    # raw unscaled ints ourselves so decimal zone maps
                    # prune (filter_pushdown.test k=25.3 reads 1 file)
                    smin = smax = None
                    try:
                        lt = md.schema.column(ci).logical_type
                        msc = re.search(r"scale=(\d+)", str(lt))
                        if (lt is not None
                                and str(lt.type).upper() == "DECIMAL"
                                and msc and isinstance(s.min_raw, int)):
                            import decimal as _dec

                            q = _dec.Decimal(10) ** -int(msc.group(1))
                            smin = _dec.Decimal(s.min_raw) * q
                            smax = _dec.Decimal(s.max_raw) * q
                    except Exception:
                        pass
                    if smin is None:
                        continue  # keep counts, no range
                mn, mx = _stat_str(smin), _stat_str(smax)
                if isinstance(smin, float) and (smin != smin or smax != smax):
                    # parquet-mr's comparator sorts NaN greatest, so a
                    # NaN-bearing file writes max=NaN (sometimes both) —
                    # flag contains_nan and keep whichever bound is real
                    row.contains_nan = True
                    if smin == smin:
                        row.min_value = (mn if row.min_value is None
                                         else _min2(row.min_value, mn, smin))
                    if smax == smax:
                        row.max_value = (mx if row.max_value is None
                                         else _max2(row.max_value, mx, smax))
                else:
                    row.min_value = mn if row.min_value is None else _min2(row.min_value, mn, smin)
                    row.max_value = mx if row.max_value is None else _max2(row.max_value, mx, smax)
            elif "isSigned=false" in str(md.schema.column(ci).logical_type):
                # pyarrow hides min/max behind has_min_max=False for
                # UNSIGNED int columns with legacy footer stats (the
                # parquet UNSIGNED sort-order ambiguity); duckdb both
                # writes and trusts them. Recompute from the data once
                # — adoption-time only, one column read
                # (add_files_complex_nested_stats_mre.test: UINTEGER
                # seq_num must land min=max=100)
                unsigned_fixups.add(col.path_in_schema)
    for pth in unsigned_fixups:
        row = agg.get(pth)  # agg keys ARE parquet paths
        if row is None or row.min_value is not None:
            continue
        try:
            mn_v, mx_v = _arrow_leaf_minmax(pf, pth)
        except Exception:
            continue
        if mn_v is not None:
            row.min_value = _stat_str(mn_v)
            row.max_value = _stat_str(mx_v)
    return list(agg.values())


def _arrow_leaf_minmax(pf, pq_path: str):
    """(min, max) of one parquet leaf column computed from the data —
    the stats-hidden unsigned-int fallback for _harvest_stats. Walks
    synthetic list/key_value segments by flattening."""
    import pyarrow as pa
    import pyarrow.compute as pc

    segs = pq_path.split(".")
    tbl = pf.read([segs[0]])
    arr = tbl.column(0).combine_chunks()
    i = 1
    while i < len(segs):
        t = arr.type
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            arr = arr.flatten()
            i += 2  # 'list' + 'element'
        elif pa.types.is_map(t):
            which = segs[i + 1] if i + 1 < len(segs) else "key"
            arr = (arr.keys if which == "key" else arr.items)
            i += 2  # 'key_value' + key/value
        elif pa.types.is_struct(t):
            arr = arr.field(segs[i])
            i += 1
        else:
            break
    mm = pc.min_max(arr)
    return mm["min"].as_py(), mm["max"].as_py()


def _any_float_nan(table) -> bool:
    """True when any float value anywhere in the (small) table is NaN —
    nested containers included; tables here are <= 4KB so a python walk
    is fine."""
    import pyarrow as _pa

    def _has_float(t) -> bool:
        if _pa.types.is_floating(t):
            return True
        if _pa.types.is_struct(t):
            return any(_has_float(t.field(i).type)
                       for i in range(t.num_fields))
        if (_pa.types.is_list(t) or _pa.types.is_large_list(t)
                or _pa.types.is_fixed_size_list(t)):
            return _has_float(t.value_type)
        if _pa.types.is_map(t):
            return _has_float(t.key_type) or _has_float(t.item_type)
        return False

    def _walk(v) -> bool:
        if isinstance(v, float):
            return v != v
        if isinstance(v, dict):
            return any(_walk(x) for x in v.values())
        if isinstance(v, (list, tuple)):
            return any(_walk(x) for x in v)
        return False

    for i, col in enumerate(table.columns):
        if _has_float(table.schema.field(i).type):
            if _walk(col.to_pylist()):
                return True
    return False


def _parquet_leaf_paths(schema, exclude_prefix: str | None = None) -> list[str]:
    """Dotted parquet leaf-column paths for an arrow schema (the key
    space pyarrow's write_statistics expects: 's.a', 'l.list.element').
    Derived by serializing an empty table once — exact for whatever
    list/struct naming convention the installed pyarrow emits."""
    import io

    import pyarrow.parquet as _pq2

    sink = io.BytesIO()
    _pq2.write_table(schema.empty_table(), sink)
    sink.seek(0)
    ps = _pq2.ParquetFile(sink).schema
    paths = [ps.column(i).path for i in range(len(ps.names))]
    if exclude_prefix:
        paths = [p for p in paths
                 if not p.split(".", 1)[0].startswith(exclude_prefix)]
    return paths


def _spark_type_with_ids(dt: T.DataType, pq_prefix: str,
                         ids: dict) -> T.DataType:
    """Rebuild a Spark DataType with ``parquet.field.id`` metadata on
    every nested StructField, keyed by parquet path (the reference
    stamps per-node ids — ducklake_field_data.cpp). Synthetic list/map
    nodes have no Spark metadata slot; those ids are stamped by the
    pyarrow pass in _slim_small_files."""
    if isinstance(dt, T.StructType):
        fields = []
        for f_ in dt.fields:
            child = f"{pq_prefix}.{f_.name}"
            meta = dict(f_.metadata or {})
            nid = ids.get(child)
            if nid is not None:
                meta["parquet.field.id"] = nid
            fields.append(T.StructField(
                f_.name, _spark_type_with_ids(f_.dataType, child, ids),
                f_.nullable, meta or None))
        return T.StructType(fields)
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(
            _spark_type_with_ids(dt.elementType,
                                 f"{pq_prefix}.list.element", ids),
            dt.containsNull)
    if isinstance(dt, T.MapType):
        return T.MapType(
            _spark_type_with_ids(dt.keyType,
                                 f"{pq_prefix}.key_value.key", ids),
            _spark_type_with_ids(dt.valueType,
                                 f"{pq_prefix}.key_value.value", ids),
            dt.valueContainsNull)
    return dt


def _slim_one_file(lfs, path: str, small: bool, field_ids: dict) -> None:
    """Slim/stamp ONE freshly-written parquet file (see
    _slim_small_files). Module-level and LakeFS-parameterized so it
    runs on executors — pyarrow filesystems pickle, so the driver can
    fan a K-file commit out as a Spark job instead of rewriting
    sequentially. Best-effort: the Spark-written file is always valid."""
    import pyarrow.parquet as _pq

    try:
        rg_rows = None
        if not small:
            # element-stamp path for a 4KB-8MiB file: cheap footer
            # checks first — skip when the file already carries every
            # expected id (re-entrant commits / already-stamped
            # sources), and preserve the original row-group layout
            # (ADVICE r11: the rewrite must not collapse Spark's
            # row groups)
            with lfs.open_input(path) as fh:
                pf = _pq.ParquetFile(fh)
                meta, schema = pf.metadata, pf.schema_arrow
            if meta.num_row_groups >= 1:
                rg_rows = max(meta.row_group(i).num_rows
                              for i in range(meta.num_row_groups))
            try:
                if _stamp_schema(schema, field_ids).equals(
                        schema, check_metadata=True):
                    return
            except Exception:
                pass
        with lfs.open_input(path) as fh:
            table = _pq.read_table(fh)
        if field_ids:
            try:
                table = _stamp_field_ids(table, field_ids)
            except Exception:
                pass  # ids best-effort; Spark's remain valid
        if _any_float_nan(table):
            # pyarrow's writer EXCLUDES NaN from footer min/max
            # while parquet-mr writes max=NaN — re-serializing
            # would erase the contains_nan signal the zone maps
            # need (filter_pushdown_float_nan.test: x <> 1.0
            # must keep the NaN row's file)
            return
        size = lfs.size(path)
        slim = path + ".__slim"
        with lfs.open_output(slim) as out:
            _pq.write_table(
                table.replace_schema_metadata(None), out,
                store_schema=False, use_dictionary=False,
                compression="snappy",
                # an INT96 source column round-trips through
                # arrow as ns — Spark cannot read ns NTZ, so
                # pin the output unit to micros
                coerce_timestamps="us",
                allow_truncated_timestamps=True,
                **({"row_group_size": rg_rows} if rg_rows else {}),
                # zone maps never read internal-column stats;
                # pyarrow keys write_statistics by dotted LEAF
                # path ('s.a', 'l.list.element') — top-level
                # names would silently drop every nested-leaf
                # stat from the slimmed file
                write_statistics=_parquet_leaf_paths(
                    table.schema,
                    exclude_prefix="_ducklake_internal_"))
        # small files replace only when the rewrite shrank
        # them (the whole point of slimming); element-stamp
        # rewrites of bigger files replace unconditionally —
        # the ids are the point there
        if not small or (lfs.size(slim) or size) < size:
            lfs.remove(path)
            lfs.move(slim, path)
        else:
            lfs.remove(slim)
    except Exception:
        try:
            lfs.remove(path + ".__slim")
        except Exception:
            pass


def _stamp_schema(schema, ids: dict):
    """The schema-only core of _stamp_field_ids: return ``schema``
    with parquet field ids stamped on every node from ``ids``."""
    import pyarrow as pa

    def stamp(field, path):
        t = field.type
        if pa.types.is_struct(t):
            t = pa.struct([
                stamp(t.field(i), f"{path}.{t.field(i).name}")
                for i in range(t.num_fields)
            ])
        elif pa.types.is_list(t) or pa.types.is_large_list(t):
            child = stamp(t.value_field.with_name("element"),
                          f"{path}.list.element")
            t = pa.list_(child)
        elif pa.types.is_map(t):
            kf = stamp(
                t.key_field.with_name("key").with_nullable(False),
                f"{path}.key_value.key")
            vf = stamp(t.item_field.with_name("value"),
                       f"{path}.key_value.value")
            t = pa.map_(kf, vf)
        fid = ids.get(path)
        meta = dict(field.metadata or {})
        if fid is not None:
            meta[b"PARQUET:field_id"] = str(fid).encode()
        return pa.field(field.name, t, field.nullable, meta or None)

    return pa.schema([stamp(f, f.name) for f in schema])


def _stamp_field_ids(table, ids: dict):
    """Return ``table`` with parquet field ids stamped on EVERY schema
    node (struct children, list elements, map key/value) from ``ids``
    (parquet path -> column id — _leaf_colmap's key space). pyarrow's
    parquet writer emits a field's b'PARQUET:field_id' metadata as the
    footer field_id, which is how the reference's per-node ids
    (ducklake_field_data.cpp) reach adopted-file readers."""
    return table.cast(_stamp_schema(table.schema, ids))


def _us_to_time_text(us: int) -> str:
    """µs-since-midnight -> duckdb's TIME display text."""
    h, rem = divmod(int(us), 3_600_000_000)
    m, rem = divmod(rem, 60_000_000)
    s, frac = divmod(rem, 1_000_000)
    out = f"{h:02d}:{m:02d}:{s:02d}"
    if frac:
        out += f".{frac:06d}".rstrip("0")
    return out


def _stat_str(v) -> str:
    import datetime
    import math

    if isinstance(v, bytes):
        try:
            return v.decode("utf-8", "replace")
        except Exception:
            return v.hex()
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat(sep=" ") if isinstance(v, datetime.datetime) else v.isoformat()
    if isinstance(v, float) and math.isinf(v):
        # the pruning SQL does CAST(value AS REAL): SQLite parses
        # 'inf' as 0.0 (!) but '1e999' overflows to ±Infinity on both
        # SQLite and DuckDB — store the portable spelling
        return "1e999" if v > 0 else "-1e999"
    return str(v)


def _min2(cur: str, new: str, raw) -> str:
    import decimal

    if isinstance(raw, (int, float, decimal.Decimal)):
        return cur if float(cur) <= float(new) else new
    return min(cur, new)


def _max2(cur: str, new: str, raw) -> str:
    import decimal

    if isinstance(raw, (int, float, decimal.Decimal)):
        return cur if float(cur) >= float(new) else new
    return max(cur, new)


def _crypto_key_id(b64key: str) -> str:
    """Footer key-metadata id for a catalog key: sha256 prefix — derivable
    from the catalog at read time, reveals nothing about the key."""
    import hashlib

    return hashlib.sha256(b64key.encode()).hexdigest()[:16]


def _footer_size_from_handle(fh) -> int:
    """Footer length from an already-open file handle (no reopen)."""
    import struct

    fh.seek(-8, 2)
    return struct.unpack("<I", fh.read(4))[0] + 8


def parquet_footer_size(path: str, fs=None) -> int:
    """Footer length hint recorded per file (reference stores it for the
    reader's footer cache, ducklake_multi_file_list.cpp:181-202): the
    little-endian u32 before the trailing PAR1 magic, plus those 8 bytes.

    ``fs`` is a fsio.LakeFS; without one the path is opened through
    whatever filesystem its scheme names (executor-safe)."""
    import struct

    from ducklake_spark.fsio import open_input_any

    f = fs.open_input(path) if fs is not None else open_input_any(path)
    with f:
        f.seek(-8, 2)
        return struct.unpack("<I", f.read(4))[0] + 8


def _to_sql_value(v, dt: T.DataType | None = None):
    import datetime
    import decimal

    if v is None:
        return None
    if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        import json

        return json.dumps(_to_json_value(v, dt))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat(sep=" ") if isinstance(v, datetime.datetime) else v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.timedelta):
        return v.days * 86_400_000_000 + v.seconds * 1_000_000 + v.microseconds
    if isinstance(v, bytes):
        return v
    return v


def _to_json_value(v, dt: T.DataType):
    """JSON-encodable form of a nested inlined value; decoding is
    type-driven by the matching branch of ``_from_sql_value``. Maps
    become [key, value] pair lists (JSON object keys must be strings;
    DuckLake map keys need not be)."""
    import base64
    import datetime
    import decimal

    if v is None:
        return None
    if isinstance(dt, T.ArrayType):
        return [_to_json_value(x, dt.elementType) for x in v]
    if isinstance(dt, T.MapType):
        return [
            [_to_json_value(k, dt.keyType), _to_json_value(x, dt.valueType)]
            for k, x in v.items()
        ]
    if isinstance(dt, T.StructType):
        d = v.asDict() if hasattr(v, "asDict") else (
            v if isinstance(v, dict) else dict(zip(dt.fieldNames(), v))
        )
        return {
            f_.name: _to_json_value(d.get(f_.name), f_.dataType)
            for f_ in dt.fields
        }
    if isinstance(v, bytes):
        return base64.b64encode(v).decode("ascii")
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.timedelta):
        return v.days * 86_400_000_000 + v.seconds * 1_000_000 + v.microseconds
    return v


def _stats_value(s: str, dt: T.DataType):
    """Parse a ducklake_file_column_stats min/max VARCHAR into the
    column's Python value (stats are serialized as strings, reference
    ducklake_metadata_manager stats rows)."""
    if s is None:
        return None
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return int(s)
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return float(s)
    if isinstance(dt, T.BooleanType):
        return s in ("true", "True", "1", True)
    return _from_sql_value(s, dt)


def _fold_min(cur, v):
    return v if cur is None or v < cur else cur


def _fold_max(cur, v):
    return v if cur is None or v > cur else cur


def _from_sql_value(v, dt: T.DataType):
    import datetime
    import decimal

    if v is None:
        return None
    if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        import json

        return _from_json_value(json.loads(v) if isinstance(v, str) else v, dt)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)) and isinstance(v, str):
        return datetime.datetime.fromisoformat(v)
    if isinstance(dt, T.DateType) and isinstance(v, str):
        return datetime.date.fromisoformat(v)
    if isinstance(dt, T.DecimalType) and not isinstance(v, decimal.Decimal):
        return decimal.Decimal(str(v))
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return float(v)
    if isinstance(dt, T.DayTimeIntervalType):
        if isinstance(v, str) and v.lstrip("-").isdigit():
            v = int(v)
        if isinstance(v, int):
            return datetime.timedelta(microseconds=v)
    if isinstance(dt, T.BooleanType) and isinstance(v, int):
        return bool(v)  # sqlite stores booleans as 0/1
    if isinstance(dt, (T.LongType, T.IntegerType)) and isinstance(v, str):
        return int(v)  # digits round-tripped as text (TIME micros)
    if isinstance(dt, T.BinaryType) and isinstance(v, str):
        return v.encode("utf8")
    return v


def _from_json_value(v, dt: T.DataType):
    import base64
    import datetime
    import decimal

    if v is None:
        return None
    if isinstance(dt, T.ArrayType):
        return [_from_json_value(x, dt.elementType) for x in v]
    if isinstance(dt, T.MapType):
        return {
            _from_json_value(k, dt.keyType): _from_json_value(x, dt.valueType)
            for k, x in v
        }
    if isinstance(dt, T.StructType):
        return tuple(
            _from_json_value(v.get(f_.name), f_.dataType) for f_ in dt.fields
        )
    if isinstance(dt, T.BinaryType):
        return base64.b64decode(v)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return datetime.datetime.fromisoformat(v)
    if isinstance(dt, T.DateType):
        return datetime.date.fromisoformat(v)
    if isinstance(dt, T.DecimalType):
        return decimal.Decimal(v)
    if isinstance(dt, T.DayTimeIntervalType):
        return datetime.timedelta(microseconds=v)
    if isinstance(dt, T.FloatType) or isinstance(dt, T.DoubleType):
        return float(v)
    return v


# Installing DML/maintenance/CDC methods (modules monkeypatch DuckLake on
# import; the bottom-of-module import avoids a circular-import problem).
from ducklake_spark import add_files as _add_files  # noqa: E402,F401
from ducklake_spark import cdc as _cdc  # noqa: E402,F401
from ducklake_spark import dml as _dml  # noqa: E402,F401
from ducklake_spark import macros as _macros  # noqa: E402,F401
from ducklake_spark import maintenance as _maintenance  # noqa: E402,F401
from ducklake_spark import table_functions as _table_functions  # noqa: E402,F401
