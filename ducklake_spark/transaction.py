"""Transactions: txn-local buffered changes + optimistic commit loop.

Mirrors the reference's protocol (src/storage/ducklake_transaction.cpp
:769-791,1341-1393,1418-1545): all changes buffer locally; at commit
we take the next snapshot id, re-check snapshots committed since the
transaction began against a conflict matrix
(ducklake_transaction_changes.cpp:36-135 grammar,
ducklake_transaction_state.cpp:77-214 checks), write all metadata
rows in one catalog-DB transaction, and retry with backoff on
conflict (defaults max_retry_count=10, retry_wait_ms=100,
backoff=1.5 — src/ducklake_extension.cpp:29-35).

Data files are written to storage *before* commit (uniquely named,
invisible until referenced by metadata) — the metadata transaction is
the atomic point, exactly like the reference (SURVEY §2.4).
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass, field

from ducklake_spark.catalog.metadata import (
    ConflictError,
    MetadataManager,
    Snapshot,
    _now_ts,
    safe_rollback,
)

MAX_RETRY_COUNT = 10
RETRY_WAIT_MS = 100
RETRY_BACKOFF = 1.5
# staged snapshots park in this id-space until ducklake_commit remaps
# them onto the committed chain; interval predicates never reach it
STAGED_BASE = 1 << 40


class _PendingSnapshot:
    """Placeholder for 'the snapshot id this transaction commits as'.

    Buffered inlined-row tuples can't know the final id up front (a
    concurrent commit or a retry changes it); _try_commit substitutes
    the real id inside the catalog transaction."""

    __slots__ = ()

    def __repr__(self) -> str:  # pragma: no cover
        return "<PENDING_SNAPSHOT>"


PENDING_SNAPSHOT = _PendingSnapshot()


@dataclass
class ColumnDef:
    name: str
    type: str  # DuckLake type name
    nulls_allowed: bool = True
    column_id: int | None = None  # field id; assigned at commit when None
    parent_column: int | None = None
    default_value: str | None = None
    initial_default: str | None = None


@dataclass
class ColumnStatsRow:
    column_id: int
    column_size_bytes: int = 0
    # None = unknown (a chunk without stats): the prune SQL's
    # "null_count = 0" / "value_count = 0" predicates must not fire
    value_count: int | None = 0
    null_count: int | None = 0
    min_value: str | None = None
    max_value: str | None = None
    contains_nan: bool = False
    # serialized geometry-bbox / shredded-variant JSON (SURVEY §1.4;
    # ducklake_geo_stats.cpp:46-76, ducklake_variant_stats.cpp:59-69)
    extra_stats: str | None = None


@dataclass
class VariantStatsRow:
    """One ducklake_file_variant_stats row (shredded VARIANT field)."""

    column_id: int
    variant_path: str
    shredded_type: str
    value_count: int = 0
    null_count: int = 0
    min_value: str | None = None
    max_value: str | None = None


@dataclass
class DataFileInfo:
    path: str  # relative to table path
    record_count: int
    file_size_bytes: int
    footer_size: int = 0
    row_id_start: int | None = None  # assigned from next_row_id at commit
    partition_id: int | None = None
    partition_values: list[tuple[int, str]] = field(default_factory=list)
    column_stats: list[ColumnStatsRow] = field(default_factory=list)
    variant_stats: list[VariantStatsRow] = field(default_factory=list)
    mapping_id: int | None = None
    partial_max: int | None = None
    file_order: int | None = None
    begin_snapshot_override: int | None = None  # compaction keeps original
    # base64 per-file key for ENCRYPTED lakes (reference stores it in
    # ducklake_data_file.encryption_key, ducklake_insert.cpp:743-756)
    encryption_key: str | None = None
    # False for update/compaction files whose rows carry an embedded
    # _ducklake_internal_row_id column (row ids preserved, not allocated)
    allocate: bool = True
    # parquet footer row-group count (reference ducklake_insert.cpp:132)
    row_group_count: int | None = None


@dataclass
class DeleteFileInfo:
    data_file_id: int
    path: str
    delete_count: int
    file_size_bytes: int
    footer_size: int = 0
    format: str = "parquet"
    encryption_key: str | None = None
    row_group_count: int | None = None  # ducklake_delete.cpp:146-148
    # consolidated delete files spanning several delete snapshots embed
    # a per-position snapshot column; the catalog row records the span
    # (reference WriteDeleteFileWithSnapshotsInput, ducklake_delete.cpp
    # :37-153; test/sql/delete/test_delete_partial_max_snapshot.test)
    partial_max: int | None = None
    begin_snapshot_override: int | None = None


def path_component(name: str, entry_uuid: str) -> str:
    """Directory component for a catalog entry: the name when it is
    path-safe, else the entry's uuid (reference
    DuckLakeCatalog::GeneratePathFromName, ducklake_catalog.cpp:243-262
    — special characters fall back to uuid so '/', '..', unicode, etc.
    never shape the storage layout)."""
    if name and all(c.isalnum() and c.isascii() or c in "_-" for c in name):
        return name + "/"
    return entry_uuid + "/"


@dataclass
class TableDef:
    schema_name: str
    table_name: str
    columns: list[ColumnDef]
    path: str  # relative to data_path
    table_uuid: str = field(default_factory=lambda: str(uuid.uuid4()))
    table_id: int | None = None
    # nested-leaf rows (parent_column = the TOP-LEVEL column's NAME,
    # resolved to its id at commit; column name = dotted leaf path):
    # the reference keys nested zone maps by per-leaf column ids
    child_columns: list[ColumnDef] = field(default_factory=list)
    # SET PARTITIONED BY issued while the table is still txn-local
    # (reference partition_rename_in_transaction.test): the spec rows
    # are written at commit, right after the column ids exist
    partition_spec: list[tuple] = field(default_factory=list)


class Transaction:
    """Buffered txn-local state for one commit."""

    def __init__(self, meta: MetadataManager):
        self.meta = meta
        self.base: Snapshot = meta.latest_snapshot()
        # buffered DDL/DML
        self.created_schemas: list[tuple[str, str]] = []  # (name, uuid)
        self.dropped_schemas: list[int] = []
        self.created_tables: list[TableDef] = []
        self.dropped_tables: list[int] = []
        self.renamed_tables: list[tuple[int, str]] = []
        self.created_views: list[tuple[str, str, str, str, str | None]] = []  # schema, name, dialect, sql, aliases-json
        self.dropped_views: list[int] = []
        self.renamed_views: list[tuple[int, str]] = []
        self.new_data_files: dict[str, list[DataFileInfo]] = {}  # key: table key
        self.new_delete_files: dict[int, list[DeleteFileInfo]] = {}  # table_id ->
        self.replaced_delete_files: list[int] = []  # delete_file_ids superseded
        self.removed_data_files: dict[int, list[int]] = {}  # table_id -> data_file_ids
        # compaction replacements: metadata rows are purged outright (the new
        # compacted file serves ALL snapshots via partial_max + embedded
        # snapshot ids) and the physical file is tombstoned immediately
        self.purged_data_files: dict[int, list[int]] = {}
        self.compacted_files: dict[int, list[tuple[DataFileInfo, list[int]]]] = {}
        self.stats_delta: dict[int, dict] = {}  # table_id -> {records, bytes, rows_needed}
        self.column_changes: dict[int, list] = {}  # table_id -> alter ops
        # adoption name-map ops: run like column_changes but are NOT a
        # schema change (no schema_version bump — ducklake_add_data_files
        # only registers files)
        self.mapping_ops: list = []
        # SET/RESET SORTED BY ops: an alter for conflict purposes but
        # NOT a schema change — the reference keeps schema_version
        # unchanged (test/sql/sorted_table/merge_adjacent_sorted_basic)
        self.sort_ops: dict[int, list] = {}
        # txn-local view of SET/RESET SORTED BY, readable before commit
        # (reference: insert_sorted_transaction.test — inserts in the
        # SAME transaction already sort by the new spec)
        self.pending_sort_specs: dict[int, list] = {}
        # maintenance calls issued INSIDE an explicit transaction
        # (CALL ducklake_expire_snapshots under BEGIN) apply only when
        # the transaction commits; ROLLBACK drops them
        # (issues/issue_852_cache_growth.test)
        self.post_commit_ops: list = []
        self.inlined_inserts: list[tuple[int, str, list[tuple]]] = []
        # like inlined_inserts, but row_id holds a 0-based OFFSET that is
        # rebased onto table_stats.next_row_id inside the commit txn (new
        # inlined rows; preserved-rowid update rows go in inlined_inserts)
        self.inlined_inserts_rebase: list[tuple[int, str, list[tuple]]] = []
        # inlined CTAS output: the table id (and so the inlined-table
        # name) exists only at commit — (name key, packed rows,
        # [(column_id, name, type)]); materialized into
        # inlined_inserts_rebase inside _try_commit
        self.inlined_ctas: list[tuple[str, list, list]] = []
        # session-scoped data_inlining_row_limit default (the SQL
        # surface's 10); the commit's eager inlined-table registration
        # resolves scopes against it
        self.session_inline_default: int = 0
        # buffered `end_snapshot = <committing snapshot>` marks on inlined
        # tables: (table_name, key_cols, key_tuples). Applied inside the
        # commit's catalog transaction with the REAL snapshot id — never on
        # the autocommit connection with a guessed id (an aborted commit
        # must leave inlined rows untouched; reference keeps all
        # inlined-data catalog writes transactional). Keys are explicit
        # columns, not sqlite rowid, so any ANSI backend works.
        self.inlined_end_updates: list[
            tuple[str, tuple[str, ...], list[tuple] | None]
        ] = []
        self.inlined_clears: list[int] = []  # table_ids whose inlined rows flush
        # (table_id, inlined_table_name) flushed by THIS txn: after a
        # successful commit, empty SUPERSEDED inlined tables drop
        # client-side (reference
        # DropEmptySupersededInlinedTablesClientSide,
        # ducklake_transaction.cpp:774)
        self.flushed_inlined_tables: set[tuple[int, str]] = set()
        # inlined-delete rows consumed by a flush: removed outright at
        # commit, like the reference's DELETE FROM after writing the
        # snapshot-embedded delete file
        # (ducklake_flush_inlined_data.cpp:588-593)
        self.inlined_row_removals: list[
            tuple[str, tuple[str, ...], list[tuple]]
        ] = []
        # small deletes absorbed into the catalog instead of a delete
        # parquet (reference: inlined file deletions,
        # ducklake_delete.cpp:530-546): table_id -> [(data_file_id, pos)]
        self.inlined_deletes: dict[int, list[tuple[int, int]]] = {}
        self.schema_bump_tables: set[int] = set()
        # buffered ADD FIELD ... DEFAULTs, visible to same-txn reads:
        # [(table_id, column_id, field_name, default_sql)]
        self.pending_field_defaults: list[tuple[int, int, str, str]] = []
        # txn-local view renames by NAME: (schema, old_name) -> new_name
        # (a comment op recorded under the old name must still bind —
        # rename_view_preserves_comment_in_transaction.test)
        self.view_name_renames: dict[tuple[str, str], str] = {}
        self.change_log: list[str] = []
        self.touched_delete_data_files: set[int] = set()  # for delete/delete conflicts
        self.commit_message: tuple[str | None, str | None, str | None] = (None, None, None)
        self.committed_snapshot: int | None = None
        # live only during _try_commit: [next catalog id] for DDL ops
        self._commit_alloc: list[int] | None = None
        # columns added by THIS open transaction, visible to its own
        # later statements (reference: transaction-local schema —
        # data_inlining_transaction_local_alter.test):
        # table_id -> [(reserved column_id, name, type, default)]
        self.pending_columns: dict[int, list[tuple]] = {}
        # SET/DROP DEFAULT by THIS open transaction, visible to its own
        # later INSERTs (add_column_with_default.test: in-txn ALTER SET
        # DEFAULT then INSERT DEFAULT VALUES uses the NEW default):
        # table_id -> {column_name: (storage_text, kind) | None=DROP}
        self.pending_defaults: dict[int, dict] = {}
        # columns RENAMED by THIS open transaction, applied in order on
        # top of the committed schema + pending_columns so later
        # statements in the txn (e.g. ADD -> RENAME -> DROP chains,
        # test/sql/alter/multi_alter_same_column_transaction.test)
        # resolve the new name: table_id -> [(old_name, new_name)]
        self.pending_column_renames: dict[int, list[tuple[str, str]]] = {}
        # nested-type mutations (ADD/DROP/RENAME FIELD, struct SET DATA
        # TYPE) by THIS open transaction: the column's new type overlays
        # the committed one so the txn's own later reads see the new
        # struct shape (reference txn-local schema,
        # test/sql/alter/struct_evolution_alter.test reads the added
        # field inside the BEGIN): table_id -> {column_name: new_type}
        self.pending_column_types: dict[int, dict[str, str]] = {}
        # whole-file drops from DELETE/UPDATE dml (NOT row-preserving
        # rewrites/compaction): table_id -> [dropped_rows, dropped_bytes].
        # Commit applies the reference's dropped-file stats rule
        # (ducklake_transaction_state.cpp ApplyDroppedFileStats): live
        # rows remain -> global column stats are DELETED (unknown);
        # table emptied -> rows reset to NULL so same-commit inserts
        # seed fresh values.
        self.dropped_file_stats: dict[int, list[int]] = {}
        # highest PER-TABLE column id reserved by this transaction's
        # own ADD COLUMNs (ids are per table, reference GetNextColumnId)
        self.column_id_floor: dict[int, int] = {}
        # columns SET NOT NULL by this open transaction (enforced on
        # its own later inserts before the catalog row flips)
        self.pending_not_null: dict[int, set[str]] = {}

    def alloc_catalog_id(self) -> int:
        """Mint a catalog id from the committing snapshot's allocator.
        Only valid inside a column_changes op (during _try_commit); the
        snapshot row records the advanced counter, so ids are unique
        across commits."""
        if self._commit_alloc is None:
            raise RuntimeError("alloc_catalog_id outside a commit")
        nid = self._commit_alloc[0]
        self._commit_alloc[0] += 1
        return nid

    # -- conflict detection ------------------------------------------------

    _TABLE_LEVEL = {
        "inserted_into_table",
        "deleted_from_table",
        "altered_table",
        "dropped_table",
        "compacted_table",
        "rewrite_delete",
    }

    def _our_table_targets(self, kind: str) -> set[int]:
        out: set[int] = set()
        for entry in self.change_log:
            k, _, payload = entry.partition(":")
            if k == kind and payload.isdigit():
                out.add(int(payload))
        return out

    def _check_conflicts(self, since: list[tuple[int, str]]) -> None:
        """Cross-check our buffered changes against later snapshots.

        Matrix follows ducklake_transaction_state.cpp:77-285:
        - create object vs create of the same name -> conflict
        - insert (file or inlined) conflicts with drop/alter/delete/
          inlined-delete of the same table
        - delete conflicts with insert/drop/alter/compact of same table;
          delete/delete is file-level (only if the same data file was
          touched), but inlined-delete/inlined-delete is table-level
        - inlined deletes conflict with flush_inlined_data (and
          flush/flush), matching tables_deleted_inlined /
          tables_flushed_inlined pairs at :253-263
        - alter conflicts with any concurrent change to the table
        """
        ours_insert = self._our_table_targets("inserted_into_table")
        ours_inl_insert = self._our_table_targets("inlined_insert")
        ours_delete = self._our_table_targets("deleted_from_table")
        ours_inl_delete = self._our_table_targets("inlined_delete")
        ours_flush = self._our_table_targets("flushed_inlined")
        ours_alter = self._our_table_targets("altered_table")
        # renames log created_table:"schema"."new" (reference display
        # parity) but still guard the table id like an alter
        ours_alter |= {tid for tid, _n in self.renamed_tables}
        ours_alter_view = self._our_table_targets("altered_view")
        ours_compact = (self._our_table_targets("compacted_table")
                        | self._our_table_targets("rewrite_delete"))
        ours_any_insert = ours_insert | ours_inl_insert
        ours_any_delete = ours_delete | ours_inl_delete
        # create/create collisions match per NAMESPACE, mirroring the
        # reference's per-kind ConflictCheck sets
        # (ducklake_transaction_state.cpp:176-200): tables and views
        # share one namespace; scalar and table macros are DISTINCT
        # entry types and may carry the same name concurrently
        # (test_macro_multiple_connections.test)
        def _create_ns(kind: str) -> str:
            return "created_view" if kind == "created_table" else kind

        our_creates = {
            (_create_ns(e.partition(":")[0]), e.partition(":")[2])
            for e in self.change_log if e.startswith("created_")
        }
        # drop/drop conflicts (ducklake_transaction_state.cpp:146-166):
        # two transactions dropping the same table/view/macro must not both
        # commit — "dropped it already"
        ours_dropped = {
            k: self._our_table_targets(k)
            for k in ("dropped_table", "dropped_view",
                      "dropped_scalar_macro", "dropped_table_macro")
        }
        ours_dropped_schemas = {
            e.partition(":")[2]
            for e in self.change_log
            if e.startswith("dropped_schema:")
        }
        # schemas in which this transaction creates an entry — a concurrent
        # DROP SCHEMA of one of them conflicts ("created an entry in this
        # schema", ducklake_transaction_state.cpp:162-166,178-191)
        our_created_entry_schemas: set[str] = set()
        for e in self.change_log:
            k, _, p = e.partition(":")
            if k in ("created_table", "created_view", "created_scalar_macro",
                     "created_table_macro") and '"."' in p:
                our_created_entry_schemas.add(p.split('"."', 1)[0].strip('"'))
        for snap_id, changes in since:
            for entry in changes.split(","):
                if not entry:
                    continue
                kind, _, payload = entry.partition(":")
                tid = int(payload) if payload.lstrip("-").isdigit() else None
                if (kind.startswith("created_")
                        and (_create_ns(kind), payload) in our_creates):
                    raise ConflictError(
                        f"snapshot {snap_id} created {payload} concurrently"
                    )
                if kind == "dropped_schema":
                    if payload in ours_dropped_schemas:
                        raise ConflictError(
                            f"schema {payload}: snapshot {snap_id} "
                            "dropped it already"
                        )
                    if payload.strip('"') in our_created_entry_schemas:
                        raise ConflictError(
                            f"schema {payload}: dropped in snapshot "
                            f"{snap_id} but this transaction creates an "
                            "entry in it"
                        )
                if kind.startswith("created_") and '"."' in payload:
                    cs = payload.split('"."', 1)[0].strip('"')
                    if f'"{cs}"' in ours_dropped_schemas:
                        raise ConflictError(
                            f"snapshot {snap_id} created {payload} in a "
                            "schema this transaction drops"
                        )
                if tid is None:
                    continue
                if kind in ours_dropped and tid in ours_dropped[kind]:
                    # drop/drop of the same object
                    # (ducklake_transaction_state.cpp:146-160)
                    raise ConflictError(
                        f"{kind.replace('_', ' ')} {tid}: snapshot "
                        f"{snap_id} dropped it already"
                    )
                if kind == "dropped_table":
                    if tid in (ours_any_insert | ours_any_delete | ours_alter
                               | ours_compact | ours_flush):
                        raise ConflictError(
                            f"table {tid}: {kind} in snapshot {snap_id} conflicts "
                            "with this transaction"
                        )
                if kind == "altered_table":
                    # reference: flush_inline_data does NOT conflict with a
                    # concurrent alter (ducklake_transaction_state.cpp:264-267)
                    if tid in (ours_any_insert | ours_any_delete | ours_alter
                               | ours_compact):
                        raise ConflictError(
                            f"table {tid}: {kind} in snapshot {snap_id} conflicts "
                            "with this transaction"
                        )
                if kind in ("inserted_into_table", "inlined_insert"):
                    # "delete from table" / "inserted into it"
                    # (ducklake_transaction_state.cpp:224-225,261-262)
                    if tid in ours_any_delete:
                        raise ConflictError(
                            f"table {tid}: concurrent insert in snapshot "
                            f"{snap_id} conflicts with this transaction's delete"
                        )
                if kind in ("deleted_from_table", "inlined_delete"):
                    # "insert into table" / "deleted from it"
                    # (ducklake_transaction_state.cpp:209-217)
                    if tid in ours_any_insert:
                        raise ConflictError(
                            f"table {tid}: concurrent delete in snapshot "
                            f"{snap_id} conflicts with this transaction's insert"
                        )
                if kind == "inlined_delete" and tid in ours_inl_delete:
                    # inlined-delete/inlined-delete is TABLE-level — inlined
                    # rows have no data-file granularity to refine on
                    # (ducklake_transaction_state.cpp:255-256)
                    raise ConflictError(
                        f"table {tid}: concurrent inlined delete in snapshot "
                        f"{snap_id} conflicts with this transaction's delete"
                    )
                if kind == "inlined_delete" and tid in ours_flush:
                    # "flush inline data" / "deleted from it" (:271)
                    raise ConflictError(
                        f"table {tid}: concurrent inlined delete in snapshot "
                        f"{snap_id} conflicts with flush_inlined_data"
                    )
                if kind == "flushed_inlined" and tid in (ours_inl_delete | ours_flush):
                    # deleted_inlined / flushed ("flushed the inlined data",
                    # :258) and flush/flush (:272)
                    raise ConflictError(
                        f"table {tid}: concurrent flush_inlined_data in "
                        f"snapshot {snap_id} conflicts with this transaction"
                    )
                if kind in ("altered_view", "dropped_view") and tid in ours_alter_view:
                    # "alter view" vs concurrent alter/drop of the same view
                    # (ducklake_transaction_state.cpp:282-285)
                    raise ConflictError(
                        f"view {tid}: {kind} in snapshot {snap_id} conflicts "
                        "with this transaction's view alter"
                    )
                if kind in ("compacted_table", "rewrite_delete") \
                        and tid in ours_delete | ours_compact:
                    # a committed compaction PURGES its source rows from the
                    # catalog — no end_snapshot marker survives to probe, so
                    # a file-level check cannot see it. Conflict at table
                    # level, as the reference does
                    # (ducklake_transaction_state.cpp:223-224,267-276).
                    raise ConflictError(
                        f"table {tid}: concurrent compaction in snapshot "
                        f"{snap_id} conflicts with this transaction's "
                        "delete/compact"
                    )
                if kind in ("deleted_from_table", "inlined_delete") and (
                    tid in ours_delete | ours_inl_delete | ours_compact
                ):
                    # file-level refinement: conflicting only if the same
                    # data files were touched. Our compactions put their
                    # source files into touched_delete_data_files, so a
                    # concurrent DELETE on a file we are rewriting is caught
                    # here (deleted rows must not resurrect in the rewrite).
                    # Covers catalog-absorbed (inlined) positional deletes
                    # too: their positions land in the per-table side table
                    # probed below.
                    # a CONSOLIDATED delete file keeps the earliest
                    # snapshot as begin and spans to partial_max — match
                    # on the span, not begin equality, or a delete
                    # merged into a pre-existing file slips past
                    # (test_rewrite_transaction_conflict.test)
                    rows = self.meta.query(
                        "SELECT data_file_id FROM ducklake_delete_file "
                        "WHERE table_id = ? AND (begin_snapshot = ? OR "
                        "(partial_max IS NOT NULL AND begin_snapshot <= ? "
                        "AND partial_max >= ?))",
                        (tid, snap_id, snap_id, snap_id),
                    ) + self.meta.query(
                        "SELECT data_file_id FROM ducklake_data_file "
                        "WHERE end_snapshot = ? AND table_id = ?",
                        (snap_id, tid),
                    )
                    touched = {r[0] for r in rows}
                    # inlined (catalog-absorbed) delete positions leave no
                    # delete-file row; probe their side table too
                    if self.meta.query(
                        "SELECT 1 FROM sqlite_master WHERE type='table' AND name=?",
                        (f"ducklake_inlined_delete_{tid}",),
                    ):
                        touched |= {
                            r[0]
                            for r in self.meta.query(
                                "SELECT DISTINCT file_id FROM "
                                f"ducklake_inlined_delete_{tid} "
                                "WHERE begin_snapshot = ?",
                                (snap_id,),
                            )
                        }
                    if touched & self.touched_delete_data_files:
                        raise ConflictError(
                            f"table {tid}: concurrent delete/compact of the "
                            f"same data files in snapshot {snap_id}"
                        )
                if kind in ("deleted_from_table", "inlined_delete",
                            "compacted_table", "rewrite_delete"):
                    if tid in ours_alter:
                        raise ConflictError(
                            f"table {tid}: {kind} in snapshot {snap_id} conflicts "
                            "with alter in this transaction"
                        )
                if kind in ("inserted_into_table", "inlined_insert") and tid in ours_alter:
                    raise ConflictError(
                        f"table {tid}: concurrent insert conflicts with alter"
                    )

    # -- commit ------------------------------------------------------------

    def has_changes(self) -> bool:
        return bool(self.change_log)

    def commit(self, *, staged: bool = False) -> int:
        """Run the optimistic commit loop; returns the new snapshot id.

        ``staged=True`` writes every catalog row but leaves the
        snapshot's ``snapshot_time`` NULL: the id and catalog/file-id
        ranges are reserved, yet no reader or conflict check sees the
        snapshot until :meth:`finalize_staged` stamps it (reference:
        staged commits, ducklake_staged_commit.cpp; finalize =
        ducklake_commit()).
        """
        if not self.has_changes():
            return self.base.snapshot_id
        if (
            (self.meta.option("require_commit_message", "") or "").lower() == "true"
            and self.commit_message[1] is None
        ):
            raise ValueError(
                "require_commit_message is set: call set_commit_message() first "
                "(reference: ducklake_set_option.cpp require_commit_message)"
            )
        # knobs match the reference settings ducklake_max_retry_count /
        # retry_wait_ms / retry_backoff (src/ducklake_extension.cpp:29-35)
        max_retry = int(
            self.meta.option("max_retry_count", str(MAX_RETRY_COUNT))
            or MAX_RETRY_COUNT
        )
        wait_ms = float(
            self.meta.option("retry_wait_ms", str(RETRY_WAIT_MS))
            or RETRY_WAIT_MS
        )
        backoff = float(
            self.meta.option("retry_backoff", str(RETRY_BACKOFF))
            or RETRY_BACKOFF
        )
        if not staged and self.meta.server_commit_supported():
            payload = self._server_commit_payload()
            if payload is not None:
                payload["retry"] = {
                    "max": max_retry, "wait_ms": wait_ms, "backoff": backoff,
                }
                return self._server_commit(payload)
        for attempt in range(max_retry + 1):
            try:
                return self._try_commit(staged=staged)
            except ConflictError:
                raise
            except Exception as exc:  # sqlite busy/locked -> retry
                if not self.meta.is_retryable(exc) or attempt == max_retry:
                    raise
                time.sleep(wait_ms / 1000.0)
                wait_ms *= backoff
        raise RuntimeError("unreachable")

    # change kinds the server-side path can replay: physical inserts,
    # deletes (file or catalog-inlined), and compaction — i.e. every
    # DML/maintenance commit. DDL, adoption maps, sort alters, and
    # inlined-ROW writes (arbitrary per-table schemas + pending-id
    # sentinels) keep the client loop.
    _SERVER_KINDS = {
        "inserted_into_table", "deleted_from_table", "inlined_delete",
        "compacted_table", "rewrite_delete",
    }

    def _server_commit_payload(self) -> dict | None:
        """Serialize this transaction for the server-side ("quack")
        commit path, or None when its shape is not eligible.

        Extends the reference's IsDataOnlyCommit fast path to the full
        DML family — INSERT, DELETE (positional files and inlined
        positions), UPDATE/MERGE (delete+insert), and compaction — all
        of which are plain catalog rows the server can replay. The
        conflict matrix runs SERVER-side via the same _check_conflicts
        method the client uses (quack_metadata_manager.hpp;
        ducklake_server_side_commit.cpp stages the same families)."""
        if (
            self.created_schemas or self.dropped_schemas
            or self.created_tables or self.dropped_tables
            or self.renamed_tables or self.created_views
            or self.dropped_views or self.renamed_views
            or self.compacted_files
            or self.column_changes or self.mapping_ops or self.sort_ops
            or self.inlined_inserts or self.inlined_inserts_rebase
            or self.inlined_end_updates or self.inlined_clears
            or self.inlined_row_removals
            or self.schema_bump_tables
        ):
            return None
        kinds = {e.partition(":")[0] for e in self.change_log}
        if not kinds or not kinds <= self._SERVER_KINDS:
            return None
        con = self.meta.con
        tables = []
        for key, files in self.new_data_files.items():
            if not key.isdigit():  # txn-local names imply DDL in-flight
                return None
            tid = int(key)
            folded: dict[int, ColumnStatsRow] = {}
            file_dicts = []
            for f in files:
                for cs in f.column_stats:
                    folded[cs.column_id] = self._fold_column_stats(
                        con, tid, folded.get(cs.column_id), cs
                    )
                file_dicts.append(
                    {
                        "path": f.path,
                        "record_count": f.record_count,
                        "file_size_bytes": f.file_size_bytes,
                        "footer_size": f.footer_size,
                        "row_id_start": f.row_id_start,
                        "allocate": f.allocate,
                        "partition_id": f.partition_id,
                        "encryption_key": f.encryption_key,
                        "mapping_id": f.mapping_id,
                        "partial_max": f.partial_max,
                        "file_order": f.file_order,
                        "begin_snapshot_override": f.begin_snapshot_override,
                        "row_group_count": f.row_group_count,
                        "partition_values": list(f.partition_values),
                        "column_stats": [
                            (cs.column_id, cs.column_size_bytes,
                             cs.value_count, cs.null_count, cs.min_value,
                             cs.max_value, cs.contains_nan, cs.extra_stats)
                            for cs in f.column_stats
                        ],
                        "variant_stats": [
                            (vr.column_id, vr.variant_path, vr.shredded_type,
                             vr.value_count, vr.null_count, vr.min_value,
                             vr.max_value)
                            for vr in f.variant_stats
                        ],
                    }
                )
            tables.append(
                {
                    "table_id": tid,
                    "files": file_dicts,
                    "folded": [
                        {
                            "column_id": cs.column_id,
                            "numeric": self._column_is_numeric(
                                con, tid, cs.column_id
                            ),
                            "null_count": cs.null_count,
                            "min_value": cs.min_value,
                            "max_value": cs.max_value,
                            "contains_nan": cs.contains_nan,
                            "extra_stats": cs.extra_stats,
                        }
                        for cs in folded.values()
                    ],
                }
            )
        author, message, extra = self.commit_message
        return {
            "protocol": 2,
            "base_snapshot_id": self.base.snapshot_id,
            "change_log": list(self.change_log),
            "author": author,
            "message": message,
            "extra": extra,
            "tables": tables,
            "replaced_delete_files": list(self.replaced_delete_files),
            "delete_files": {
                str(tid): [
                    (df.data_file_id, df.path, df.format, df.delete_count,
                     df.file_size_bytes, df.footer_size, df.encryption_key,
                     df.row_group_count, df.partial_max,
                     df.begin_snapshot_override)
                    for df in dfiles
                ]
                for tid, dfiles in self.new_delete_files.items()
            },
            "inlined_deletes": {
                str(tid): [list(p) for p in pairs]
                for tid, pairs in self.inlined_deletes.items()
            },
            "removed_data_files": {
                str(tid): list(fids)
                for tid, fids in self.removed_data_files.items()
            },
            "purged_data_files": {
                str(tid): list(fids)
                for tid, fids in self.purged_data_files.items()
            },
            "stats_delta": {
                str(tid): d.get("records", 0)
                for tid, d in self.stats_delta.items()
            },
            "touched_files": sorted(self.touched_delete_data_files),
        }

    def _server_commit(self, payload: dict) -> int:
        """One round trip: the server runs the whole commit (conflict
        probes, allocation, inserts, retry loop) atomically."""
        result = self.meta.server_commit(payload)
        # mirror the server's row-id assignment so post-commit callers
        # see the same DataFileInfo state the client path leaves behind
        for t in payload["tables"]:
            next_row_id = result["first_row_ids"].get(str(t["table_id"]))
            if next_row_id is None:
                continue
            for f in self.new_data_files.get(str(t["table_id"]), []):
                if f.allocate and f.row_id_start is None:
                    f.row_id_start = next_row_id
                    next_row_id += f.record_count
        self.committed_snapshot = result["snapshot_id"]
        return self.committed_snapshot

    @classmethod
    def finalize_staged(cls, meta: MetadataManager, snapshot_id: int) -> int:
        """ducklake_commit(cat, snapshot_id): make a staged snapshot
        visible by remapping its high-space id onto the committed chain,
        after conflict-checking against everything committed since it
        was staged. Delete/delete conflicts are re-derived at file
        level from the staged snapshot's own delete rows."""
        con = meta.con
        meta.begin_write()
        try:
            row = con.execute(
                "SELECT snapshot_time FROM ducklake_snapshot WHERE snapshot_id=?",
                (snapshot_id,),
            ).fetchone()
            if row is None:
                raise ValueError(f"no staged snapshot {snapshot_id}")
            if row[0] is not None or snapshot_id < STAGED_BASE:
                raise ValueError(f"snapshot {snapshot_id} is already committed")
            base_row = con.execute(
                "SELECT value FROM ducklake_metadata WHERE key=?",
                (f"staged_base:{snapshot_id}",),
            ).fetchone()
            base = int(base_row[0]) if base_row else 0
            changes = con.execute(
                "SELECT COALESCE(changes_made, '') FROM ducklake_snapshot_changes "
                "WHERE snapshot_id=?",
                (snapshot_id,),
            ).fetchone()
            probe = cls(meta)
            probe.change_log = [e for e in (changes[0] if changes else "").split(",") if e]
            probe.touched_delete_data_files = {
                fid
                for (fid,) in con.execute(
                    "SELECT data_file_id FROM ducklake_delete_file "
                    "WHERE begin_snapshot=? UNION "
                    "SELECT data_file_id FROM ducklake_data_file "
                    "WHERE end_snapshot=?",
                    (snapshot_id, snapshot_id),
                ).fetchall()
            }
            files_row = con.execute(
                "SELECT value FROM ducklake_metadata WHERE key=?",
                (f"staged_files:{snapshot_id}",),
            ).fetchone()
            if files_row and files_row[0]:
                probe.touched_delete_data_files |= {
                    int(x) for x in files_row[0].split(",")
                }
            since = meta.snapshots_since(base)
            if since:
                probe._check_conflicts(since)
            new_id = meta.latest_snapshot().snapshot_id + 1
            # remap the staged id across every snapshot-versioned table
            # (incl. per-table inlined-data tables)
            for (tbl,) in con.execute(
                "SELECT name FROM sqlite_master WHERE type='table'"
            ).fetchall():
                cols = {r[1] for r in con.execute(f"PRAGMA table_info({tbl})").fetchall()}
                for c in ("begin_snapshot", "end_snapshot"):
                    if c in cols:
                        con.execute(
                            f"UPDATE {tbl} SET {c}=? WHERE {c}=?",
                            (new_id, snapshot_id),
                        )
            con.execute(
                "UPDATE ducklake_snapshot SET snapshot_id=?, snapshot_time=? "
                "WHERE snapshot_id=?",
                (new_id, _now_ts(), snapshot_id),
            )
            con.execute(
                "UPDATE ducklake_snapshot_changes SET snapshot_id=? WHERE snapshot_id=?",
                (new_id, snapshot_id),
            )
            con.execute(
                "DELETE FROM ducklake_metadata WHERE key IN (?, ?)",
                (f"staged_base:{snapshot_id}", f"staged_files:{snapshot_id}"),
            )
            con.execute("COMMIT")
            return new_id
        except BaseException:
            safe_rollback(con)
            raise

    @classmethod
    def rollback_staged(cls, meta: MetadataManager, snapshot_id: int) -> None:
        """Abandon a staged snapshot: purge its parked rows and restore
        any still-staged end-markers. Files it wrote become orphans for
        delete_orphaned_files."""
        con = meta.con
        if snapshot_id < STAGED_BASE:
            raise ValueError(f"snapshot {snapshot_id} is not staged")
        meta.begin_write()
        try:
            for (tbl,) in con.execute(
                "SELECT name FROM sqlite_master WHERE type='table'"
            ).fetchall():
                cols = {r[1] for r in con.execute(f"PRAGMA table_info({tbl})").fetchall()}
                if "begin_snapshot" in cols:
                    con.execute(
                        f"DELETE FROM {tbl} WHERE begin_snapshot=?", (snapshot_id,)
                    )
                if "end_snapshot" in cols:
                    con.execute(
                        f"UPDATE {tbl} SET end_snapshot=NULL WHERE end_snapshot=?",
                        (snapshot_id,),
                    )
            con.execute(
                "DELETE FROM ducklake_snapshot WHERE snapshot_id=?", (snapshot_id,)
            )
            con.execute(
                "DELETE FROM ducklake_snapshot_changes WHERE snapshot_id=?",
                (snapshot_id,),
            )
            con.execute(
                "DELETE FROM ducklake_metadata WHERE key IN (?, ?)",
                (f"staged_base:{snapshot_id}", f"staged_files:{snapshot_id}"),
            )
            con.execute("COMMIT")
        except BaseException:
            safe_rollback(con)
            raise

    def _insert_only(self) -> bool:
        # inlined inserts share the insert conflict set (drop/alter/
        # delete/inlined-delete), all of which the fast path probes
        kinds = {e.partition(":")[0] for e in self.change_log}
        return bool(kinds) and kinds <= {"inserted_into_table", "inlined_insert"}

    def _check_append_fast_path(self, con) -> None:
        """Append fast-path (reference CanSkipSnapshotFetch,
        ducklake_metadata_manager.cpp:3939 + quack IsDataOnlyCommit): a
        pure append conflicts only with a concurrent drop/rename/alter
        of its target tables. Verify those directly — O(#tables) probes
        instead of walking every snapshot committed since our base, so
        N concurrent appenders commit without mutual re-checks."""
        base = self.base.snapshot_id
        for tid in (
            self._our_table_targets("inserted_into_table")
            | self._our_table_targets("inlined_insert")
        ):
            live = con.execute(
                "SELECT 1 FROM ducklake_table WHERE table_id=? "
                "AND end_snapshot IS NULL",
                (tid,),
            ).fetchone()
            ended = con.execute(
                "SELECT 1 FROM ducklake_table WHERE table_id=? "
                "AND end_snapshot > ? AND end_snapshot < ?",
                (tid, base, STAGED_BASE),
            ).fetchone()
            if live is None or ended is not None:
                raise ConflictError(
                    f"table {tid} was dropped/renamed concurrently"
                )
            altered = con.execute(
                "SELECT 1 FROM ducklake_column WHERE table_id=? "
                "AND end_snapshot > ? AND end_snapshot < ?",
                (tid, base, STAGED_BASE),
            ).fetchone()
            if altered is None:
                # alters that touch no column rows (SET PARTITIONED BY,
                # SET SORTED BY, comments) still log altered_table —
                # probe the changes log (transaction_conflicts.test:
                # insert vs concurrent partition-key change)
                altered = con.execute(
                    "SELECT 1 FROM ducklake_snapshot_changes "
                    "WHERE snapshot_id > ? AND snapshot_id < ? AND "
                    "',' || changes_made || ',' LIKE ? LIMIT 1",
                    (base, STAGED_BASE, f"%,altered_table:{tid},%"),
                ).fetchone()
            if altered is not None:
                raise ConflictError(f"table {tid} was altered concurrently")
            # insert conflicts with a concurrent DELETE of the same table
            # ("insert into table"/"deleted from it",
            # ducklake_transaction_state.cpp:209,216-217) — one bounded
            # probe of the changes log per target table, keeping the fast
            # path O(#tables)
            deleted = con.execute(
                "SELECT 1 FROM ducklake_snapshot_changes "
                "WHERE snapshot_id > ? AND snapshot_id < ? AND ("
                "',' || changes_made || ',' LIKE ? OR "
                "',' || changes_made || ',' LIKE ?) LIMIT 1",
                (base, STAGED_BASE,
                 f"%,deleted_from_table:{tid},%",
                 f"%,inlined_delete:{tid},%"),
            ).fetchone()
            if deleted is not None:
                raise ConflictError(
                    f"table {tid} was deleted from concurrently"
                )

    def _try_commit(self, *, staged: bool = False) -> int:
        con = self.meta.con
        # 1.0-format catalogs predate the row_group_count column: keep
        # it NULL so other readers see a faithful v1.0 layout
        # (migration/v10_row_group_count.test)
        from ducklake_spark.catalog.migrate import detect_version

        ver = detect_version(self.meta)
        records_rg = not (ver or "").startswith("1.0")
        self.meta.begin_write()
        try:
            if self._insert_only() and not staged:
                self._check_append_fast_path(con)
            else:
                since = self.meta.snapshots_since(self.base.snapshot_id)
                if since:
                    self._check_conflicts(since)
            head = self.meta.allocation_head()  # staged rows hold id reservations
            if staged:
                # staged snapshots live in a high id-space: every interval
                # visibility predicate (begin_snapshot <= S) then hides
                # them from all readers until finalize remaps the id into
                # the committed chain.
                (max_staged,) = con.execute(
                    "SELECT COALESCE(MAX(snapshot_id), ?) FROM ducklake_snapshot "
                    "WHERE snapshot_id >= ?",
                    (STAGED_BASE - 1, STAGED_BASE),
                ).fetchone()
                snap_id = max_staged + 1
            else:
                snap_id = head.snapshot_id + 1
            next_cat = head.next_catalog_id
            # start past any CTAS id reservation (see reserve_catalog_ids)
            resrow = con.execute(
                "SELECT value FROM ducklake_metadata "
                "WHERE key='id_reservation' AND scope IS NULL"
            ).fetchone()
            if resrow:
                next_cat = max(next_cat, int(resrow[0]))
            next_file = head.next_file_id
            schema_version = self.meta.latest_snapshot().schema_version
            bump_schema = bool(
                self.created_schemas
                or self.dropped_schemas
                or self.created_tables
                or self.dropped_tables
                or self.renamed_tables
                or self.created_views
                or self.dropped_views
                or self.renamed_views
                # comments/tags (-2) and SET SORTED BY bump the GLOBAL
                # snapshot schema_version (the altered table entry makes
                # SchemaChangesMade() true) but write no per-table
                # ducklake_schema_versions row — that split is what
                # schema_version_mixed_operations.test and
                # comment_mixed_operations.test pin (1 → 3 on the next
                # real alter)
                or self.column_changes
                or self.sort_ops
                or self.schema_bump_tables
            )
            if bump_schema:
                schema_version += 1

            # --- DDL: schemas
            for name, suuid in self.created_schemas:
                con.execute(
                    "INSERT INTO ducklake_schema VALUES (?, ?, ?, NULL, ?, ?, 1)",
                    (next_cat, suuid, snap_id, name,
                     path_component(name, suuid)),
                )
                next_cat += 1

            # --- DDL: tables
            txn_local_pids: dict[int, int] = {}  # table_id -> partition_id
            for td in self.created_tables:
                sid = self._schema_id(td.schema_name, snap_id)
                td.table_id = next_cat
                next_cat += 1
                # ducklake_table.path stores the SCHEMA-RELATIVE
                # component (reference convention: general/paths.test
                # pins 'test/', not 'main/test/'); handles re-resolve
                # the full path via s.path || t.path on load
                srow = con.execute(
                    "SELECT path FROM ducklake_schema WHERE schema_id=? "
                    "AND end_snapshot IS NULL", (sid,),
                ).fetchone()
                tpath = td.path
                if srow and srow[0] and tpath.startswith(srow[0]):
                    tpath = tpath[len(srow[0]):]
                con.execute(
                    "INSERT INTO ducklake_table VALUES (?, ?, ?, NULL, ?, ?, ?, 1)",
                    (td.table_id, td.table_uuid, snap_id, sid, td.table_name, tpath),
                )
                # per-table column ids, pre-order from 1 (reference:
                # GetNextColumnId allocates within the table; field_ids
                # .test pins the fresh-table numbering)
                if any(c.column_id is None
                       for c in list(td.columns) + list(td.child_columns)):
                    cseq = 1
                    for c in td.columns:
                        if c.column_id is None:
                            c.column_id = cseq
                        cseq = max(cseq, c.column_id) + 1
                        for ch in td.child_columns:
                            # child parent_column = ABSOLUTE dotted
                            # path; pre-order DFS within the list
                            root = str(ch.parent_column).split(".", 1)[0]
                            if root == c.name:
                                if ch.column_id is None:
                                    ch.column_id = cseq
                                cseq = max(cseq, ch.column_id) + 1
                    for ch in td.child_columns:
                        if ch.column_id is None:
                            ch.column_id = cseq
                            cseq += 1
                path_to_id: dict[str, int] = {}
                for c in list(td.columns) + list(td.child_columns):
                    parent = c.parent_column
                    if isinstance(parent, str):  # child row: parent by path
                        path_to_id[f"{parent}.{c.name}"] = c.column_id
                        parent = path_to_id[parent]
                    else:
                        path_to_id[c.name] = c.column_id
                    order = c.column_id  # reference: column_order ==
                    # column_id for every row
                    # (ducklake_metadata_manager.cpp:2636,665)
                    from ducklake_spark.lake import (
                        _default_kind,
                        _default_storage_text,
                    )

                    con.execute(
                        "INSERT INTO ducklake_column VALUES "
                        "(?, ?, NULL, ?, ?, ?, ?, ?, ?, ?, ?, ?, 'duckdb')",
                        (
                            c.column_id,
                            snap_id,
                            td.table_id,
                            order,
                            c.name,
                            c.type,
                            _default_storage_text(c.initial_default),
                            _default_storage_text(c.default_value),
                            c.nulls_allowed,
                            parent,
                            _default_kind(c.default_value),
                        ),
                    )
                    order += 1
                # no stats row at CREATE — the reference materializes
                # ducklake_table_stats lazily on the first data commit
                # (stats/table_stats_without_column_stats.test seeds the
                # row externally between CREATE and INSERT)
                con.execute(
                    "INSERT INTO ducklake_schema_versions VALUES (?, ?, ?)",
                    (snap_id, schema_version, td.table_id),
                )
                if td.partition_spec:
                    pid = next_cat
                    next_cat += 1
                    con.execute(
                        "INSERT INTO ducklake_partition_info VALUES "
                        "(?, ?, ?, NULL)",
                        (pid, td.table_id, snap_id),
                    )
                    for i, (cname, transform) in enumerate(td.partition_spec):
                        con.execute(
                            "INSERT INTO ducklake_partition_column VALUES "
                            "(?, ?, ?, ?, ?)",
                            (pid, td.table_id, i, path_to_id[cname],
                             transform),
                        )
                    txn_local_pids[td.table_id] = pid

            for tid in self.dropped_tables:
                con.execute(
                    "UPDATE ducklake_table SET end_snapshot = ? "
                    "WHERE table_id = ? AND end_snapshot IS NULL",
                    (snap_id, tid),
                )
            for sid_ in self.dropped_schemas:
                con.execute(
                    "UPDATE ducklake_schema SET end_snapshot = ? "
                    "WHERE schema_id = ? AND end_snapshot IS NULL",
                    (snap_id, sid_),
                )
            for tid, new_name in self.renamed_tables:
                if tid in self.dropped_tables:
                    # RENAME then DROP in one transaction: the drop
                    # above already ended the row; no renamed row is
                    # ever visible (alter/
                    # comment_then_drop_same_transaction.test)
                    continue
                row = con.execute(
                    "SELECT table_uuid, schema_id, path, path_is_relative "
                    "FROM ducklake_table WHERE table_id=? AND end_snapshot IS NULL",
                    (tid,),
                ).fetchone()
                con.execute(
                    "UPDATE ducklake_table SET end_snapshot=? "
                    "WHERE table_id=? AND end_snapshot IS NULL",
                    (snap_id, tid),
                )
                con.execute(
                    "INSERT INTO ducklake_table VALUES (?, ?, ?, NULL, ?, ?, ?, ?)",
                    (tid, row[0], snap_id, row[1], new_name, row[2], row[3]),
                )

            # --- DDL: views
            for schema_name, vname, dialect, sql, aliases in self.created_views:
                sid = self._schema_id(schema_name, snap_id)
                con.execute(
                    "INSERT INTO ducklake_view VALUES (?, ?, ?, NULL, ?, ?, ?, ?, ?)",
                    (next_cat, str(uuid.uuid4()), snap_id, sid, vname, dialect,
                     sql, aliases),
                )
                next_cat += 1
            for vid in self.dropped_views:
                con.execute(
                    "UPDATE ducklake_view SET end_snapshot=? "
                    "WHERE view_id=? AND end_snapshot IS NULL",
                    (snap_id, vid),
                )
                # dropping a view expires its comments/tags (reference:
                # comments/drop_view_expires_tags.test,
                # drop_view_expires_view_column_tags.test); a RENAME
                # keeps the view_id, so tags survive renames untouched
                con.execute(
                    "UPDATE ducklake_tag SET end_snapshot=? "
                    "WHERE object_id=? AND end_snapshot IS NULL",
                    (snap_id, vid),
                )
                con.execute(
                    "UPDATE ducklake_view_column_tag SET end_snapshot=? "
                    "WHERE view_id=? AND end_snapshot IS NULL",
                    (snap_id, vid),
                )
            for vid, new_vname in self.renamed_views:
                if vid in self.dropped_views:
                    continue  # renamed THEN dropped in this transaction
                row = con.execute(
                    "SELECT view_uuid, schema_id, dialect, sql, column_aliases "
                    "FROM ducklake_view WHERE view_id=? AND end_snapshot IS NULL",
                    (vid,),
                ).fetchone()
                con.execute(
                    "UPDATE ducklake_view SET end_snapshot=? "
                    "WHERE view_id=? AND end_snapshot IS NULL",
                    (snap_id, vid),
                )
                con.execute(
                    "INSERT INTO ducklake_view VALUES (?, ?, ?, NULL, ?, ?, ?, ?, ?)",
                    (vid, row[0], snap_id, row[1], new_vname, row[2], row[3],
                     row[4]),
                )

            # --- column-level alters (list of SQL thunks prepared by lake).
            # Table-scoped ops run before the macro/comment buckets
            # (negative keys): a comment can target a column ADDED
            # earlier in this transaction, whose ducklake_column row
            # only exists once the add op has run
            # (comments/comment_same_transaction.test)
            ordered_changes = (
                [kv for kv in self.column_changes.items() if kv[0] >= 0]
                + [kv for kv in self.column_changes.items() if kv[0] < 0]
            )
            # ops that mint catalog ids (ADD COLUMN) draw from THIS
            # commit's allocator via alloc_catalog_id(), so the snapshot
            # row below records the post-allocation counter. (The old
            # scheme read latest_snapshot().next_catalog_id inside the
            # op and bumped the PREVIOUS snapshot row — the new
            # snapshot's counter never advanced, so the next ADD COLUMN
            # re-issued the same column id: two adds in a row collided,
            # and the duplicate id made epoch column mapping read the
            # wrong stored column for inlined rows.)
            self._commit_alloc = [next_cat]
            for tid, ops in ordered_changes:
                for op in ops:
                    op(con, snap_id)
                if tid >= 0:  # negative keys = non-table ops (macros, comments)
                    con.execute(
                        "INSERT INTO ducklake_schema_versions VALUES (?, ?, ?)",
                        (snap_id, schema_version, tid),
                    )
            next_cat = self._commit_alloc[0]

            # --- eager inlined-table registration: with inlining
            # enabled, every (table, schema_version) pair gets its
            # catalog table at DDL time like the reference — expire +
            # cleanup then leaves exactly the current version's row
            # (empty_inlined_tables_alter_cleanup.test expects 1, not 0)
            ddl_tids = {td.table_id for td in self.created_tables
                        if td.table_id is not None}
            ddl_tids.update(t for t in self.column_changes if t >= 0)
            for tid in sorted(ddl_tids):
                if self._effective_inline_limit(con, tid) <= 0:
                    continue
                tname = f"ducklake_inlined_data_{tid}_{schema_version}"
                cols = con.execute(
                    "SELECT column_name, column_type FROM ducklake_column "
                    "WHERE table_id=? AND end_snapshot IS NULL "
                    "AND parent_column IS NULL ORDER BY column_order",
                    (tid,),
                ).fetchall()
                if not cols:
                    continue
                from ducklake_spark.catalog.types import (
                    ducklake_to_catalog_sql,
                )

                try:
                    col_ddl = ", ".join(
                        '"{}" {}'.format(n.replace('"', '""'),
                                         ducklake_to_catalog_sql(t))
                        for n, t in cols)
                except Exception:
                    continue  # exotic type: register lazily on insert
                con.execute(
                    f"CREATE TABLE IF NOT EXISTS {tname} "
                    "(row_id BIGINT, begin_snapshot BIGINT, "
                    f"end_snapshot BIGINT, {col_ddl})")
                con.execute(
                    "INSERT INTO ducklake_inlined_data_tables "
                    "SELECT ?, ?, ? WHERE NOT EXISTS "
                    "(SELECT 1 FROM ducklake_inlined_data_tables "
                    "WHERE table_id=? AND table_name=?)",
                    (tid, tname, schema_version, tid, tname),
                )

            # --- adoption name maps (no schema_version bump).
            # mapping_id mints from the FILE-id allocator, BEFORE the
            # data files — reference GetNewNameMaps:
            # `MappingIndex(commit_snapshot.next_file_id++)`
            # (ducklake_transaction_state.cpp:539), which is why a
            # fresh catalog's first adopted file is data_file_id 1,
            # not 0 (add_files_complex_nested_stats_mre.test)
            self._commit_falloc = [next_file]
            for op in self.mapping_ops:
                op(con, snap_id)
            next_file = self._commit_falloc[0]

            # --- sort-spec alters (no schema_version bump, see above;
            # sort_id mints from the commit allocator, so re-sync
            # next_cat after they run)
            for _tid, ops in self.sort_ops.items():
                for op in ops:
                    op(con, snap_id)
            next_cat = self._commit_alloc[0]

            # --- dropped-file global stats rule (reference:
            # ApplyDroppedFileStats, ducklake_transaction_state.cpp:962-998;
            # test/sql/delete/full_file_delete_stats*.test). Runs BEFORE
            # the new-file merge so same-commit inserts seed an emptied
            # table's reset rows, while a partially-emptied table's rows
            # are deleted outright (widen-only stats would otherwise
            # keep the dropped file's min/max forever — and tightening
            # from surviving files could lie when rows live outside
            # file stats, so "unknown" is the only safe answer).
            for tid, (drows, _dbytes) in self.dropped_file_stats.items():
                row = con.execute(
                    "SELECT record_count FROM ducklake_table_stats "
                    "WHERE table_id=?", (tid,),
                ).fetchone()
                if (row[0] if row else 0) - drows > 0:
                    con.execute(
                        "DELETE FROM ducklake_table_column_stats "
                        "WHERE table_id=?", (tid,),
                    )
                else:
                    con.execute(
                        "UPDATE ducklake_table_column_stats SET "
                        "contains_null=?, contains_nan=?, min_value=NULL, "
                        "max_value=NULL, extra_stats=NULL WHERE table_id=?",
                        (False, False, tid),
                    )

            # --- data files
            # path -> assigned id for THIS commit's files: delete files
            # written against a not-yet-committed data file (flush)
            # reference it by path and resolve here
            committed_path_fid: dict[str, int] = {}

            # catalog file paths store the TABLE-relative form
            # (reference convention — general/paths.test,
            # merge_adjacent_external_hive_paths.test); in-memory
            # DataFileInfo paths stay data-root-relative, so strip the
            # table prefix at the catalog boundary. Files outside the
            # table directory (adopted hive/external files) store
            # their full path with path_is_relative = false.
            tpath_cache: dict[int, str] = {}

            def _tpath(tid2: int) -> str:
                tp = tpath_cache.get(tid2)
                if tp is None:
                    row2 = con.execute(
                        "SELECT CASE WHEN t.path_is_relative "
                        "THEN s.path || t.path ELSE t.path END "
                        "FROM ducklake_table t JOIN ducklake_schema s "
                        "ON t.schema_id=s.schema_id "
                        "WHERE t.table_id=? AND t.end_snapshot IS NULL",
                        (tid2,),
                    ).fetchone()
                    tp = tpath_cache[tid2] = (row2[0] if row2 else "")
                return tp

            _data_root = getattr(self, "active_data_root", None)
            if not _data_root:
                drow = con.execute(
                    "SELECT value FROM ducklake_metadata "
                    "WHERE key='data_path' AND scope IS NULL"
                ).fetchone()
                _data_root = (drow[0] if drow and drow[0] else "")
            _data_root = (_data_root.rstrip("/") + "/") if _data_root \
                else ""

            def _cat_path(tid2: int, path: str) -> tuple[str, int]:
                tp = _tpath(tid2)
                if tp is not None and path.startswith(tp) \
                        and not path.startswith("/") \
                        and "://" not in path:
                    # tp == '' (migrated legacy catalogs: the table
                    # dir IS the data root) still means table-relative
                    # (migration/migration.test flush-after-upgrade)
                    return path[len(tp):], 1
                # outside the table directory (adopted hive/external
                # files): absolute path, flag false — readers
                # re-relativize under the data root on load
                if "://" in path or path.startswith("/"):
                    return path, 0
                return _data_root + path, 0

            for key, files in self.new_data_files.items():
                tid = self._resolve_table_id(key)
                stats = con.execute(
                    "SELECT record_count, next_row_id, file_size_bytes "
                    "FROM ducklake_table_stats WHERE table_id = ?",
                    (tid,),
                ).fetchone() or (0, 0, 0)
                rec_cnt, next_row_id, fsize = stats
                # a column-stats row may only be CREATED when every row
                # in the table is covered by this commit's file stats —
                # i.e. the table held no rows before (fresh/emptied)
                allow_seed = rec_cnt == 0
                # batched like the reference's server-side commit /
                # appender paths (ducklake_server_side_commit.cpp,
                # metadata appender tests): a K-file commit issues one
                # statement per ROW FAMILY, not K*(columns+2) statements
                # — over a networked catalog (Postgres) that is the
                # difference between 3 round trips and thousands.
                # Global column stats fold client-side across this
                # commit's files first, so each touched column merges
                # into ducklake_table_column_stats exactly once.
                file_rows, pv_rows, cs_rows = [], [], []
                folded: dict[int, ColumnStatsRow] = {}
                for f in files:
                    fid = next_file
                    next_file += 1
                    committed_path_fid[f.path] = fid
                    if f.allocate and f.row_id_start is None:
                        f.row_id_start = next_row_id
                        next_row_id += f.record_count
                        rec_cnt += f.record_count
                        fsize += f.file_size_bytes
                    elif not f.allocate:
                        rec_cnt += f.record_count
                        fsize += f.file_size_bytes
                    file_rows.append(
                        (
                            fid,
                            tid,
                            f.begin_snapshot_override
                            if f.begin_snapshot_override is not None
                            else snap_id,
                            f.file_order,
                            *_cat_path(tid, f.path),
                            f.record_count,
                            f.file_size_bytes,
                            f.footer_size,
                            f.row_id_start,
                            f.partition_id if f.partition_id is not None
                            else txn_local_pids.get(tid),
                            f.encryption_key,
                            f.mapping_id,
                            f.partial_max,
                            f.row_group_count if records_rg else None,
                        )
                    )
                    pv_rows.extend(
                        (fid, tid, idx, val) for idx, val in f.partition_values
                    )
                    for cs in f.column_stats:
                        cs_rows.append(
                            (
                                fid,
                                tid,
                                cs.column_id,
                                cs.column_size_bytes,
                                cs.value_count,
                                cs.null_count,
                                cs.min_value,
                                cs.max_value,
                                cs.contains_nan,
                                cs.extra_stats,
                            )
                        )
                        folded[cs.column_id] = self._fold_column_stats(
                            con, tid, folded.get(cs.column_id), cs
                        )
                    self._insert_variant_stats(con, fid, tid, f.variant_stats)
                con.executemany(
                    "INSERT INTO ducklake_data_file VALUES "
                    "(?, ?, ?, NULL, ?, ?, ?, 'parquet', ?, ?, ?, ?, ?, ?, ?, ?, ?)",
                    file_rows,
                )
                if pv_rows:
                    con.executemany(
                        "INSERT INTO ducklake_file_partition_value "
                        "VALUES (?, ?, ?, ?)",
                        pv_rows,
                    )
                if cs_rows:
                    con.executemany(
                        "INSERT INTO ducklake_file_column_stats VALUES "
                        "(?, ?, ?, ?, ?, ?, ?, ?, ?, ?)",
                        cs_rows,
                    )
                for cs in folded.values():
                    self._merge_global_column_stats(con, tid, cs,
                                                    allow_seed=allow_seed)
                _upsert_table_stats(con, tid, rec_cnt, next_row_id, fsize)

            # inlined-only data commits consume one file id per table:
            # the reference "force[s] an increment of file_id to signal
            # a data change if we have only inlined data changes"
            # (ducklake_transaction_state.cpp:1145-1148) — keeps file
            # ids bit-identical with reference-written catalogs
            tables_with_files = set()
            for key in self.new_data_files:
                try:
                    tables_with_files.add(self._resolve_table_id(key))
                except Exception:
                    pass
            inlined_tids = {t for t, _n, r in self.inlined_inserts if r}
            inlined_tids |= {t for t, _n, r in self.inlined_inserts_rebase
                             if r}
            for _tid2 in inlined_tids:
                if _tid2 not in tables_with_files:
                    next_file += 1

            # --- delete files
            # an overwritten delete file's catalog row is DELETED
            # outright and the parquet scheduled for disk cleanup — the
            # replacing file serves every snapshot via its embedded
            # per-position snapshots and retroactive begin (reference
            # DeleteOverwrittenDeleteFiles,
            # ducklake_metadata_manager.cpp:4077-4112)
            for dfid in self.replaced_delete_files:
                row = con.execute(
                    "SELECT path, path_is_relative, table_id "
                    "FROM ducklake_delete_file "
                    "WHERE delete_file_id=?", (dfid,)
                ).fetchone()
                con.execute(
                    "DELETE FROM ducklake_delete_file WHERE delete_file_id=?",
                    (dfid,),
                )
                if row:
                    # tombstones store the data-root-relative form
                    p0 = (_tpath(row[2]) + row[0]) if row[1] else row[0]
                    con.execute(
                        "INSERT INTO ducklake_files_scheduled_for_deletion "
                        "VALUES (?, ?, 1, ?)",
                        (dfid, p0, _now_ts()),
                    )
            for tid, pairs in self.inlined_deletes.items():
                # reference-exact layout: exactly (file_id, row_id,
                # begin_snapshot) — no end_snapshot column
                # (ducklake_metadata_manager.cpp:3055-3057); consumed
                # deletes go inert through the owning data file's
                # visibility, flushes DELETE their rows outright
                # (ducklake_flush_inlined_data.cpp:588-593)
                con.execute(
                    f"CREATE TABLE IF NOT EXISTS ducklake_inlined_delete_{tid}("
                    "file_id BIGINT, row_id BIGINT, begin_snapshot BIGINT)"
                )
                con.executemany(
                    f"INSERT INTO ducklake_inlined_delete_{tid} "
                    "VALUES (?, ?, ?)",
                    [(fid, pos, snap_id) for fid, pos in pairs],
                )
            for tid, dfiles in self.new_delete_files.items():
                if isinstance(tid, str):
                    # txn-local tables buffer delete files under their
                    # name key; the table id exists only now
                    tid = self._resolve_table_id(tid)
                for df in dfiles:
                    target_fid = df.data_file_id
                    if isinstance(target_fid, str):
                        # flush wrote this delete against a data file
                        # committed in THIS snapshot — resolve its path
                        target_fid = committed_path_fid[target_fid]
                    con.execute(
                        "INSERT INTO ducklake_delete_file VALUES "
                        "(?, ?, ?, NULL, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?)",
                        (
                            next_file,
                            tid,
                            df.begin_snapshot_override
                            if df.begin_snapshot_override is not None
                            else snap_id,
                            target_fid,
                            *_cat_path(tid, df.path),
                            df.format,
                            df.delete_count,
                            df.file_size_bytes,
                            df.footer_size,
                            df.encryption_key,
                            df.partial_max,
                            df.row_group_count if records_rg else None,
                        ),
                    )
                    next_file += 1

            # --- removed data files (whole-file delete / rewrite): the old
            # file keeps serving snapshots < snap_id (copy-on-write lifetime);
            # physical cleanup happens only once snapshot expiry strands it
            for tid, fids in self.removed_data_files.items():
                for fid in fids:
                    # a committed drop overwrites a staged snapshot's
                    # (>= STAGED_BASE) marker — the staged commit then
                    # fails its file-overlap check at finalize
                    con.execute(
                        "UPDATE ducklake_data_file SET end_snapshot=? "
                        "WHERE data_file_id=? AND (end_snapshot IS NULL "
                        "OR end_snapshot >= ?)",
                        (snap_id, fid, STAGED_BASE),
                    )
                    con.execute(
                        "UPDATE ducklake_delete_file SET end_snapshot=? "
                        "WHERE data_file_id=? AND (end_snapshot IS NULL "
                        "OR end_snapshot >= ?)",
                        (snap_id, fid, STAGED_BASE),
                    )

            # --- purged data files (compaction replacements)
            for tid, fids in self.purged_data_files.items():
                for fid in fids:
                    row = con.execute(
                        "SELECT path, path_is_relative, table_id "
                        "FROM ducklake_data_file WHERE data_file_id=?",
                        (fid,),
                    ).fetchone()
                    con.execute(
                        "DELETE FROM ducklake_data_file WHERE data_file_id=?", (fid,)
                    )
                    con.execute(
                        "DELETE FROM ducklake_file_column_stats WHERE data_file_id=?",
                        (fid,),
                    )
                    con.execute(
                        "DELETE FROM ducklake_file_variant_stats WHERE data_file_id=?",
                        (fid,),
                    )
                    con.execute(
                        "DELETE FROM ducklake_file_partition_value WHERE data_file_id=?",
                        (fid,),
                    )
                    if row:
                        p0 = ((_tpath(row[2]) + row[0]) if row[1]
                              else row[0])
                        con.execute(
                            "INSERT INTO ducklake_files_scheduled_for_deletion "
                            "VALUES (?, ?, 1, ?)",
                            (fid, p0, _now_ts()),
                        )

            # --- row-preserving removals (rewrite/compaction) attempt an
            # EXACT global-stats recompute from the surviving files
            # (reference: the rewrite stats path in
            # ducklake_transaction_state.cpp:880-960 under its
            # delete-free gate); dml whole-file drops took the
            # delete-or-reset rule above instead
            recomputed: set[int] = set()
            for tid in (set(self.removed_data_files)
                        | set(self.purged_data_files)) - set(
                            self.dropped_file_stats):
                if self._recompute_global_column_stats(con, tid):
                    recomputed.add(tid)

            # --- record-count / byte deltas from deletes and rewrites
            # (absolute recompute above already landed the final values
            # for its tables)
            for tid, delta in self.stats_delta.items():
                if tid in recomputed:
                    continue
                if _stats_row_exists(con, tid):
                    con.execute(
                        "UPDATE ducklake_table_stats SET "
                        "record_count = record_count + ?, "
                        "file_size_bytes = file_size_bytes + ? "
                        "WHERE table_id = ?",
                        (delta.get("records", 0), delta.get("bytes", 0), tid),
                    )
                else:
                    con.execute(
                        "INSERT INTO ducklake_table_stats VALUES (?, ?, 0, ?)",
                        (tid, delta.get("records", 0),
                         delta.get("bytes", 0)),
                    )

            # --- inlined data: end-marks BEFORE inserts (an UPDATE of the
            # same row_id must not catch the replacement row an update-DML
            # inserts at this same snapshot)
            for table_name, key_cols, keys in self.inlined_end_updates:
                if keys is None:
                    con.execute(
                        f"UPDATE {table_name} SET end_snapshot=? "
                        "WHERE end_snapshot IS NULL",
                        (snap_id,),
                    )
                else:
                    cond = " AND ".join(f"{c}=?" for c in key_cols)
                    con.executemany(
                        f"UPDATE {table_name} SET end_snapshot=? "
                        f"WHERE {cond} AND end_snapshot IS NULL",
                        [(snap_id, *k) for k in keys],
                    )
            # inlined-delete rows consumed by a flush are removed
            # outright (the flushed delete parquet carries their
            # per-position snapshot ids for time travel — reference
            # ducklake_flush_inlined_data.cpp:588-593)
            for table_name, key_cols, keys in self.inlined_row_removals:
                cond = " AND ".join(f"{c}=?" for c in key_cols)
                con.executemany(
                    f"DELETE FROM {table_name} WHERE {cond}",
                    [tuple(k) for k in keys],
                )
            # inlined CTAS rows: the table id exists NOW — create the
            # schema-version inlined table + registry row, then feed the
            # rows through the normal rebase path (reference inlines
            # small CTAS output, data_inlining_delete.test: no files on
            # disk after CREATE TABLE ... AS SELECT of 3 rows)
            for key, packed, cols in self.inlined_ctas:
                ctid = self._resolve_table_id(key)
                ctname = f"ducklake_inlined_data_{ctid}_{schema_version}"
                from ducklake_spark.catalog.types import (
                    ducklake_to_catalog_sql,
                )

                col_ddl = ", ".join(
                    '"{}" {}'.format(n.replace('"', '""'),
                                     ducklake_to_catalog_sql(t))
                    for _i, n, t in cols)
                con.execute(
                    f"CREATE TABLE IF NOT EXISTS {ctname} "
                    "(row_id BIGINT, begin_snapshot BIGINT, "
                    f"end_snapshot BIGINT, {col_ddl})")
                con.execute(
                    "INSERT INTO ducklake_inlined_data_tables "
                    "SELECT ?, ?, ? WHERE NOT EXISTS "
                    "(SELECT 1 FROM ducklake_inlined_data_tables "
                    "WHERE table_id=? AND table_name=?)",
                    (ctid, ctname, schema_version, ctid, ctname),
                )
                self.inlined_inserts_rebase.append((ctid, ctname, packed))
            for tid, table_name, rows in self.inlined_inserts:
                if rows:
                    rows = [
                        tuple(snap_id if x is PENDING_SNAPSHOT else x for x in r)
                        for r in rows
                    ]
                    placeholders = ",".join("?" * len(rows[0]))
                    con.executemany(
                        f"INSERT INTO {table_name} VALUES ({placeholders})", rows
                    )
            for tid, table_name, rows in self.inlined_inserts_rebase:
                if not rows:
                    continue
                srow = con.execute(
                    "SELECT next_row_id FROM ducklake_table_stats WHERE table_id=?",
                    (tid,),
                ).fetchone()
                base = srow[0] if srow else 0
                rows = [
                    (base + r[0],)
                    + tuple(snap_id if x is PENDING_SNAPSHOT else x for x in r[1:])
                    for r in rows
                ]
                placeholders = ",".join("?" * len(rows[0]))
                con.executemany(
                    f"INSERT INTO {table_name} VALUES ({placeholders})", rows
                )
                if _stats_row_exists(con, tid):
                    con.execute(
                        "UPDATE ducklake_table_stats SET next_row_id = "
                        "next_row_id + ?, record_count = record_count + ? "
                        "WHERE table_id = ?",
                        (len(rows), len(rows), tid),
                    )
                else:
                    con.execute(
                        "INSERT INTO ducklake_table_stats VALUES (?, ?, ?, 0)",
                        (tid, len(rows), len(rows)),
                    )
            self._merge_inlined_insert_stats(con)

            # --- snapshot row (staged commits reserve the id with a NULL
            # time; finalize_staged stamps it later)
            con.execute(
                "INSERT INTO ducklake_snapshot VALUES (?, ?, ?, ?, ?)",
                (snap_id, None if staged else _now_ts(), schema_version,
                 next_cat, next_file),
            )
            author, message, extra = self.commit_message
            # txn-local/CTAS inserts were logged under the table NAME
            # (ids exist only now): rewrite to the assigned id so the
            # changes feed other readers parse carries real ids
            resolved_log = []
            for entry in self.change_log:
                kind, _, payload = entry.partition(":")
                if (kind in ("inserted_into_table", "altered_table",
                             "inlined_insert", "deleted_from_table")
                        and payload and not payload.lstrip("-").isdigit()):
                    try:
                        entry = f"{kind}:{self._resolve_table_id(payload)}"
                    except ValueError:
                        pass
                resolved_log.append(entry)
            con.execute(
                "INSERT INTO ducklake_snapshot_changes VALUES (?, ?, ?, ?, ?)",
                (snap_id, ",".join(resolved_log), author, message, extra),
            )
            if staged:
                # remember the stage-point and touched-file set for
                # finalize's conflict window (catalog markers can be
                # overwritten by later committed drops)
                con.execute(
                    "INSERT INTO ducklake_metadata VALUES (?, ?, NULL, NULL)",
                    (f"staged_base:{snap_id}", str(self.base.snapshot_id)),
                )
                con.execute(
                    "INSERT INTO ducklake_metadata VALUES (?, ?, NULL, NULL)",
                    (
                        f"staged_files:{snap_id}",
                        ",".join(map(str, sorted(self.touched_delete_data_files))),
                    ),
                )
            con.execute("COMMIT")
            self.committed_snapshot = snap_id
            return snap_id
        except BaseException:
            safe_rollback(con)
            raise

    # -- helpers -----------------------------------------------------------

    def _schema_id(self, name: str, snap_id: int) -> int:
        row = self.meta.con.execute(
            "SELECT schema_id FROM ducklake_schema "
            "WHERE schema_name=? AND end_snapshot IS NULL",
            (name,),
        ).fetchone()
        if row is None:
            raise ValueError(f"schema {name!r} does not exist")
        return row[0]

    def _resolve_table_id(self, key: str) -> int:
        if key.isdigit():
            return int(key)
        for td in self.created_tables:
            if f"{td.schema_name}.{td.table_name}" == key:
                assert td.table_id is not None
                return td.table_id
        raise ValueError(f"unknown table key {key!r}")

    _NUMERIC_TYPES = {
        "int8", "int16", "int32", "int64", "uint8", "uint16", "uint32",
        "uint64", "float32", "float", "float64", "double",
    }

    def _column_is_numeric(self, con, tid: int, column_id: int) -> bool:
        # column ids are PER TABLE: the lookup must scope by table
        cache = getattr(self, "_col_numeric_cache", None)
        if cache is None:
            cache = self._col_numeric_cache = {}
        key = (tid, column_id)
        if key not in cache:
            row = con.execute(
                "SELECT column_type FROM ducklake_column "
                "WHERE table_id=? AND column_id=? AND end_snapshot IS NULL",
                (tid, column_id),
            ).fetchone()
            base = (row[0] if row else "").split("(")[0].lower()
            cache[key] = base in self._NUMERIC_TYPES or base.startswith(
                "decimal"
            )
        return cache[key]

    def _column_is_variant(self, con, tid: int, column_id: int) -> bool:
        cache = getattr(self, "_col_variant_cache", None)
        if cache is None:
            cache = self._col_variant_cache = {}
        key = (tid, column_id)
        if key not in cache:
            row = con.execute(
                "SELECT column_type FROM ducklake_column "
                "WHERE table_id=? AND column_id=? AND end_snapshot IS NULL",
                (tid, column_id),
            ).fetchone()
            cache[key] = (row[0] if row else "").strip().lower() == "variant"
        return cache[key]

    def _insert_variant_stats(self, con, fid: int, tid: int, rows) -> None:
        if not rows:
            return
        con.executemany(
            "INSERT INTO ducklake_file_variant_stats VALUES "
            "(?, ?, ?, ?, ?, ?, ?, ?, ?)",
            [
                (fid, tid, vr.column_id, vr.variant_path, vr.shredded_type,
                 vr.value_count, vr.null_count, vr.min_value, vr.max_value)
                for vr in rows
            ],
        )

    def _effective_inline_limit(self, con, tid: int) -> int:
        """data_inlining_row_limit for a table inside the commit:
        table > schema > global catalog scope, else the session
        default captured at transaction start."""
        row = con.execute(
            "SELECT value FROM ducklake_metadata WHERE "
            "key='data_inlining_row_limit' AND scope='table' "
            "AND scope_id=?", (tid,)).fetchone()
        if row is None:
            row = con.execute(
                "SELECT value FROM ducklake_metadata m JOIN ducklake_table "
                "t ON m.scope_id = t.schema_id WHERE "
                "m.key='data_inlining_row_limit' AND m.scope='schema' "
                "AND t.table_id=? AND t.end_snapshot IS NULL",
                (tid,)).fetchone()
        if row is None:
            row = con.execute(
                "SELECT value FROM ducklake_metadata WHERE "
                "key='data_inlining_row_limit' AND scope IS NULL"
            ).fetchone()
        if row is not None:
            try:
                return int(row[0] or 0)
            except (TypeError, ValueError):
                return 0
        return self.session_inline_default

    def _merge_inlined_insert_stats(self, con) -> None:
        """Widen global column stats with this commit's inlined rows —
        the reference merges inlined values into
        ducklake_table_column_stats exactly like file stats
        (TryMergeInlinedStats; add_column_default_stats.test case 2:
        an inlined INSERT of 20 moves MIN from 99 to 20). Scalar roots
        only; nested/binary columns keep their widened rows."""
        from collections import defaultdict

        by_t: dict[tuple[int, str], list] = defaultdict(list)
        for tid, tname, rows in (self.inlined_inserts
                                 + self.inlined_inserts_rebase):
            by_t[(tid, tname)].extend(rows)
        for (tid, tname), rows in by_t.items():
            if not rows:
                continue
            cols = [d[1] for d in con.execute(
                f"PRAGMA table_info({tname})").fetchall()][3:]
            n_inserted = len(rows)
            rc = con.execute(
                "SELECT record_count FROM ducklake_table_stats "
                "WHERE table_id=?", (tid,)).fetchone()
            nfile = con.execute(
                "SELECT COUNT(*) FROM ducklake_data_file WHERE "
                "table_id=? AND end_snapshot IS NULL", (tid,)).fetchone()[0]
            # seed only when the table was EMPTY before this commit —
            # otherwise older rows may lie outside these values
            allow_seed = (nfile == 0 and rc is not None
                          and rc[0] == n_inserted)
            for j, cname in enumerate(cols):
                crow = con.execute(
                    "SELECT column_id, column_type FROM ducklake_column "
                    "WHERE table_id=? AND column_name=? "
                    "AND end_snapshot IS NULL AND parent_column IS NULL",
                    (tid, cname)).fetchone()
                if crow is None:
                    continue
                cid, ctype = crow
                base = str(ctype).split("(")[0].lower()
                if base.startswith(("struct", "list", "map", "array")) \
                        or base in ("geometry", "variant", "json"):
                    # blob/binary DO merge (bytes min/max, text-
                    # serialized like the file-stats harvest —
                    # all_types_column_default_stats.test c_blob row)
                    continue
                vals = [r[3 + j] for r in rows]
                if base in ("decimal", "numeric"):
                    # packed inlined rows carry decimals SQL-serialized
                    # as text — min()/max() over the raw strings is
                    # lexicographic ('10.5' < '9.5'); decode first
                    import decimal as _dec

                    def _dv(v):
                        try:
                            return _dec.Decimal(str(v))
                        except (ArithmeticError, ValueError, TypeError):
                            return v
                    vals = [None if v is None else _dv(v) for v in vals]
                if base.startswith("timestamp"):
                    # duckdb renders timestamps with MINIMAL fractional
                    # digits ('.123', not '.123000')
                    import re as _re

                    def _trim(v):
                        if not isinstance(v, str):
                            return v
                        return _re.sub(
                            r"(\.\d*?)0+(?=$|\+)",
                            lambda m2: m2.group(1).rstrip("."), v)
                    vals = [None if v is None else _trim(v) for v in vals]
                if base in ("time", "timetz"):
                    # packed TIME is µs-since-midnight; duckdb stats
                    # store clock text (all_types_column_default_stats
                    # .test: c_time min '01:00:00', c_time_tz
                    # '01:00:00+00' — offsets normalize to UTC)
                    from ducklake_spark.lake import _us_to_time_text

                    suf = "+00" if base == "timetz" else ""
                    vals = [None if v is None else
                            (_us_to_time_text(v) + suf
                             if isinstance(v, int) else v)
                            for v in vals]
                nonnull = [v for v in vals if v is not None]
                nn = [v for v in nonnull
                      if not (isinstance(v, float) and v != v)]
                has_nan = len(nn) < len(nonnull)
                mn = mx = None
                if nn:
                    try:
                        mn, mx = min(nn), max(nn)
                    except TypeError:
                        continue  # mixed/opaque values: keep widened row

                def _txt(v):
                    if v is None:
                        return None
                    if isinstance(v, bool):
                        return "true" if v else "false"
                    if isinstance(v, (bytes, bytearray)):
                        # same text form the file-stats harvest stores
                        return bytes(v).decode("utf-8", "replace")
                    return str(v)

                self._merge_global_column_stats(con, tid, ColumnStatsRow(
                    column_id=cid, column_size_bytes=0,
                    value_count=len(nonnull),
                    null_count=len(vals) - len(nonnull),
                    min_value=_txt(mn), max_value=_txt(mx),
                    contains_nan=has_nan,
                ), allow_seed=allow_seed)

    def _fold_column_stats(self, con, tid: int,
                           acc: ColumnStatsRow | None,
                           cs: ColumnStatsRow) -> ColumnStatsRow:
        """Combine two per-file stats rows for the same column into one
        widened row, so a K-file commit touches the global
        ducklake_table_column_stats row once instead of K times. The
        fold mirrors _merge_global_column_stats' widening exactly:
        null_count None (unknown) stays None so has-null is assumed."""
        if acc is None:
            return cs
        numeric = self._column_is_numeric(con, tid, cs.column_id)
        if acc.null_count is None or cs.null_count is None:
            nulls = None
        else:
            nulls = acc.null_count + cs.null_count
        extra = acc.extra_stats
        if acc.extra_stats is not None or cs.extra_stats is not None:
            from ducklake_spark.extra_stats import merge_extra_stats_json

            extra = merge_extra_stats_json(acc.extra_stats, cs.extra_stats)
        if self._column_is_variant(con, tid, cs.column_id):
            # VARIANT global stats: min/max always NULL (the shredded
            # stats in extra_stats are the real payload — reference
            # per-file variant column stats carry no min/max), and an
            # emptied shredded set is STICKY: empty ∩ anything = empty
            # (DuckLakeColumnVariantStats::Merge "nothing to merge",
            # ducklake_variant_stats.cpp:25-28;
            # variant_mixed_type_stats.test int-varchar-int -> NULL)
            return ColumnStatsRow(
                column_id=cs.column_id,
                column_size_bytes=(acc.column_size_bytes
                                   + cs.column_size_bytes),
                value_count=None
                if acc.value_count is None or cs.value_count is None
                else acc.value_count + cs.value_count,
                null_count=nulls,
                min_value=None, max_value=None,
                contains_nan=acc.contains_nan or cs.contains_nan,
                extra_stats=(None if acc.extra_stats is None
                             or cs.extra_stats is None else extra),
            )
        return ColumnStatsRow(
            column_id=cs.column_id,
            column_size_bytes=acc.column_size_bytes + cs.column_size_bytes,
            value_count=None
            if acc.value_count is None or cs.value_count is None
            else acc.value_count + cs.value_count,
            null_count=nulls,
            min_value=_merge_min(acc.min_value, cs.min_value, numeric),
            max_value=_merge_max(acc.max_value, cs.max_value, numeric),
            contains_nan=acc.contains_nan or cs.contains_nan,
            extra_stats=extra,
        )

    def _recompute_global_column_stats(self, con, tid: int) -> None:
        """Re-derive ducklake_table_column_stats from the LIVE files'
        per-file stats after a commit removed data files (whole-file
        delete, rewrite, compaction purge).

        The running global stats are widen-only (never tighten), so a
        dropped file's min/max would otherwise linger forever —
        reference behavior is exact: deleting every file NULLs the
        stats (test/sql/delete/full_file_delete_stats.test) and a
        same-transaction reinsert replaces them
        (full_file_delete_stats_reinsert.test).

        Safety rule — stats must never lie: a column is recomputed only
        when EVERY live file carries a stats row for it. Files that
        predate an ADD COLUMN (rows surface initial_default) or adopted
        files with missing columns have no per-file row, so the count
        check keeps the widened global row for those columns. Tables
        with live inlined rows keep their widened COLUMN rows (their
        values are not in any file's stats). Pure catalog work: one
        point count + one stats query per column, no data-file reads.

        Also resets record_count/file_size_bytes to the NET live count
        (reference rewrite recompute sets new_stats.record_count = net
        data rows + net inlined rows) — that re-arms the gross==net
        MIN/MAX fold exactness check after a rewrite consumes the
        table's deletes (min_max_optimization_compaction.test §2).
        Returns True so the commit skips the per-delta arithmetic.
        """
        nrec = con.execute(
            "SELECT COALESCE(SUM(record_count),0), "
            "COALESCE(SUM(file_size_bytes),0) FROM ducklake_data_file "
            "WHERE table_id=? AND end_snapshot IS NULL", (tid,),
        ).fetchone()
        net, nbytes = int(nrec[0]), int(nrec[1])
        net -= int(con.execute(
            "SELECT COALESCE(SUM(delete_count),0) FROM ducklake_delete_file "
            "WHERE table_id=? AND end_snapshot IS NULL", (tid,),
        ).fetchone()[0])
        try:
            net -= int(con.execute(
                f"SELECT COUNT(*) FROM ducklake_inlined_delete_{tid} d "
                "JOIN ducklake_data_file f ON f.data_file_id=d.file_id "
                "AND f.end_snapshot IS NULL",
            ).fetchone()[0])
        except Exception:
            pass  # no inlined-delete side table
        inlined_live = False
        for (tname,) in con.execute(
            "SELECT table_name FROM ducklake_inlined_data_tables "
            "WHERE table_id=?", (tid,),
        ).fetchall():
            live_rows = int(con.execute(
                f"SELECT COUNT(*) FROM {tname} WHERE end_snapshot IS NULL"
            ).fetchone()[0])
            net += live_rows
            inlined_live = inlined_live or live_rows > 0
        if _stats_row_exists(con, tid):
            con.execute(
                "UPDATE ducklake_table_stats SET record_count=?, "
                "file_size_bytes=? WHERE table_id=?",
                (net, nbytes, tid),
            )
        if inlined_live:
            return True
        nlive = con.execute(
            "SELECT COUNT(*) FROM ducklake_data_file "
            "WHERE table_id=? AND end_snapshot IS NULL", (tid,),
        ).fetchone()[0]
        # recompute existing global rows AND seed columns whose global
        # row never existed but whose per-file coverage is complete —
        # inlined-insert seeding only covers top-level columns, so a
        # struct leaf's global row first becomes derivable here
        # (min_max_nested_leaf_rewrite_corruption.test: flush + rewrite
        # must leave s.a with its full [1,100] range)
        cids = [r[0] for r in con.execute(
            "SELECT column_id FROM ducklake_table_column_stats "
            "WHERE table_id=? UNION SELECT DISTINCT f.column_id "
            "FROM ducklake_file_column_stats f "
            "JOIN ducklake_data_file d ON d.data_file_id=f.data_file_id "
            "AND d.end_snapshot IS NULL WHERE f.table_id=?",
            (tid, tid),
        ).fetchall()]
        for cid in cids:
            frows = con.execute(
                "SELECT f.value_count, f.null_count, f.min_value, "
                "f.max_value, f.contains_nan, f.extra_stats "
                "FROM ducklake_file_column_stats f "
                "JOIN ducklake_data_file d ON d.data_file_id=f.data_file_id "
                "AND d.end_snapshot IS NULL "
                "WHERE f.table_id=? AND f.column_id=?", (tid, cid),
            ).fetchall()
            if len(frows) != nlive:
                continue  # some live rows are outside file stats: keep
                # the widened row rather than tighten into a lie
            numeric = self._column_is_numeric(con, tid, cid)
            mn = mx = None
            has_null = has_nan = False
            extra, extra_missing = None, False
            for vc, nc, fmn, fmx, fnan, fextra in frows:
                mn = _merge_min(mn, fmn, numeric)
                mx = _merge_max(mx, fmx, numeric)
                has_null = has_null or nc is None or (nc or 0) > 0
                has_nan = has_nan or bool(fnan)
                if fextra is None:
                    extra_missing = True  # one missing payload
                    # invalidates the merge (widen, never lie)
                else:
                    from ducklake_spark.extra_stats import (
                        merge_extra_stats_json,
                    )

                    extra = (fextra if extra is None
                             else merge_extra_stats_json(extra, fextra))
            if self._column_is_variant(con, tid, cid):
                mn = mx = None
            exists = con.execute(
                "SELECT 1 FROM ducklake_table_column_stats "
                "WHERE table_id=? AND column_id=?", (tid, cid),
            ).fetchone()
            if exists:
                con.execute(
                    "UPDATE ducklake_table_column_stats SET contains_null=?, "
                    "contains_nan=?, min_value=?, max_value=?, extra_stats=? "
                    "WHERE table_id=? AND column_id=?",
                    (has_null, has_nan, mn, mx,
                     None if extra_missing else extra, tid, cid),
                )
            else:
                con.execute(
                    "INSERT INTO ducklake_table_column_stats VALUES "
                    "(?, ?, ?, ?, ?, ?, ?)",
                    (tid, cid, has_null, has_nan, mn, mx,
                     None if extra_missing else extra),
                )
        return True

    def _merge_global_column_stats(self, con, tid: int, cs: ColumnStatsRow,
                                   allow_seed: bool = True) -> None:
        """Merge-only global stats: widen, never tighten
        (reference: DuckLakeColumnStats::MergeStats, ducklake_stats.cpp:102)."""
        row = con.execute(
            "SELECT contains_null, contains_nan, min_value, max_value, extra_stats "
            "FROM ducklake_table_column_stats WHERE table_id=? AND column_id=?",
            (tid, cs.column_id),
        ).fetchone()
        # unknown null_count (no stats) -> conservatively "may have nulls"
        has_null = cs.null_count is None or cs.null_count > 0
        if row is None:
            if not allow_seed:
                # the table already holds rows this commit's stats can't
                # account for (a dropped-file commit DELETEd the global
                # rows, or the column predates its per-file stats):
                # seeding from this commit's files alone would lie —
                # reference UpdateGlobalTableStatsSql UPDATEs only
                return
            smin, smax = cs.min_value, cs.max_value
            if self._column_is_variant(con, tid, cs.column_id):
                smin = smax = None
            con.execute(
                "INSERT INTO ducklake_table_column_stats VALUES (?, ?, ?, ?, ?, ?, ?)",
                (tid, cs.column_id, has_null, cs.contains_nan, smin,
                 smax, cs.extra_stats),
            )
            return
        cn, cnan, mn, mx, extra = row
        numeric = self._column_is_numeric(con, tid, cs.column_id)
        new_min = _merge_min(mn, cs.min_value, numeric)
        new_max = _merge_max(mx, cs.max_value, numeric)
        new_extra = extra
        if extra is not None or cs.extra_stats is not None:
            from ducklake_spark.extra_stats import merge_extra_stats_json

            new_extra = merge_extra_stats_json(extra, cs.extra_stats)
        if self._column_is_variant(con, tid, cs.column_id):
            # VARIANT global stats: min/max always NULL; an emptied
            # shredded set is sticky (see _fold_column_stats)
            new_min = new_max = None
            if extra is None or cs.extra_stats is None:
                new_extra = None
        con.execute(
            "UPDATE ducklake_table_column_stats SET contains_null=?, contains_nan=?, "
            "min_value=?, max_value=?, extra_stats=? WHERE table_id=? AND column_id=?",
            (
                bool(cn) or has_null,
                bool(cnan) or cs.contains_nan,
                new_min,
                new_max,
                new_extra,
                tid,
                cs.column_id,
            ),
        )


def _stats_row_exists(con, tid: int) -> bool:
    """Presence probe for a table's ducklake_table_stats row. Used
    instead of UPDATE+rowcount because DB-API rowcount is -1 on duckdb
    connections, which would silently skip the INSERT fallback."""
    return con.execute(
        "SELECT 1 FROM ducklake_table_stats WHERE table_id=?", (tid,)
    ).fetchone() is not None


def _upsert_table_stats(con, tid: int, rec_cnt: int, next_row_id: int,
                        fsize: int) -> None:
    """Absolute-set of a table's stats row, creating it on first data
    commit (the row does not exist at CREATE TABLE time)."""
    if _stats_row_exists(con, tid):
        con.execute(
            "UPDATE ducklake_table_stats SET record_count=?, next_row_id=?, "
            "file_size_bytes=? WHERE table_id=?",
            (rec_cnt, next_row_id, fsize, tid),
        )
    else:
        con.execute(
            "INSERT INTO ducklake_table_stats VALUES (?, ?, ?, ?)",
            (tid, rec_cnt, next_row_id, fsize),
        )


def _merge_min(a: str | None, b: str | None, numeric: bool) -> str | None:
    """Typed min: a VARCHAR column's numeric-looking values ('10' < '9'
    lexicographically) must merge by STRING order, matching how the
    pruning SQL compares them — float-compare only numeric columns."""
    if a is None:
        return b
    if b is None:
        return a
    if numeric:
        try:
            return a if float(a) <= float(b) else b
        except ValueError:
            pass
    return min(a, b)


def _merge_max(a: str | None, b: str | None, numeric: bool) -> str | None:
    if a is None:
        return b
    if b is None:
        return a
    if numeric:
        try:
            return a if float(a) >= float(b) else b
        except ValueError:
            pass
    return max(a, b)
