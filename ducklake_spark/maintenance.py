"""Maintenance jobs: compaction, rewrite, snapshot expiry, file cleanup,
inlined-data flush, checkpoint orchestration.

Reference: §2.2/§3.3 of SURVEY —
- merge_adjacent_files groups candidate files by (partition values,
  schema compatibility), skips files with deletes, greedily packs
  adjacent files toward target_file_size, rewrites each group
  preserving row ids and embedding the snapshot id column so time
  travel still works over merged files
  (ducklake_compaction_functions.cpp:284-414, operator :80-175).
- rewrite_data_files rewrites files whose deleted fraction >=
  delete_threshold, dropping dead rows (:778-830).
- expire_snapshots / cleanup_old_files / delete_orphaned_files
  (ducklake_expire_snapshots.cpp:25-105, ducklake_cleanup_files.cpp:66-177).
- CHECKPOINT runs all six in the reference's fixed order
  (ducklake_checkpoint.cpp:14-35).
"""

from __future__ import annotations

import os
import threading
import uuid

from pyspark.sql import functions as F

from ducklake_spark.lake import (
    ROWID_COL,
    SNAPID_COL,
    DuckLake,
    DuckLakeError,
    _expr_references,
    _resolve_rel_path,
)
from ducklake_spark.transaction import DataFileInfo


def _rel(h, path, prel):
    """Catalog TABLE-relative file path -> data-root-relative."""
    return _resolve_rel_path(h.path, path, prel)

DEFAULT_TARGET_FILE_SIZE = 512 * 1024 * 1024

# serializes transaction-buffer mutations when pack rewrites run from
# the driver thread pool (the Spark jobs themselves run unlocked)
_TXN_BUF_LOCK = threading.Lock()
# concurrent pack-rewrite jobs per compaction call: enough to hide the
# per-job launch latency, small enough not to starve the executors
PACK_POOL_WORKERS = 8


def _effective_target_file_size(lake, h=None, default: str = "0") -> int:
    """target_file_size with the reference's precedence: session
    SET ducklake_target_file_size overrides every metadata scope
    (compaction_session_target_file_size.test), then table > schema >
    global options."""
    from ducklake_spark.lake import parse_memory_limit

    session_tfs = getattr(lake, "session_target_file_size", None)
    if session_tfs:
        return parse_memory_limit(str(session_tfs))
    kw = {}
    if h is not None:
        kw = dict(scope="table", scope_id=h.table_id, schema_id=h.schema_id)
    return parse_memory_limit(
        lake.meta.option("target_file_size", default, **kw) or default)


def merge_adjacent_files(lake: DuckLake, *, target_file_size: int | None = None,
                         table: str | None = None,
                         schema: str | None = None,
                         max_compacted_files: int | None = None,
                         min_file_size: int | None = None,
                         max_file_size: int | None = None,
                         detail: list | None = None) -> int:
    """Compact small adjacent files; returns number of groups rewritten.

    ``detail``, when a list, collects one row per rewritten group —
    (schema_name, table_name, files_processed, files_created) — the
    reference TVF's result shape (ducklake_compaction_functions.cpp:
    888-893 MergeAdjacentFilesBind, :120-126 one chunk row per
    compaction operator).

    ``max_compacted_files`` caps how many merged files one call creates;
    ``min_file_size``/``max_file_size`` restrict candidates to a size
    band (reference merge_adjacent_max_files.test,
    merge_adjacent_file_size_filter.test;
    ducklake_compaction_functions.cpp:292-293,797-811)."""
    if max_compacted_files is not None and max_compacted_files <= 0:
        raise DuckLakeError(
            "The max_compacted_files option must be greater than zero.")
    if max_file_size is not None and max_file_size <= 0:
        raise DuckLakeError(
            "The max_file_size option must be greater than zero.")
    if (min_file_size is not None and max_file_size is not None
            and min_file_size >= max_file_size):
        raise DuckLakeError(
            "The min_file_size must be less than max_file_size.")
    # target resolves PER TABLE inside the loop when not given
    # explicitly (reference GetTargetFileSize(schema_id, table_id)
    # with the session setting overriding every metadata scope)
    if table:
        if schema and schema != "main" and "." not in table:
            table = f"{schema}.{table}"
        tables = [table]
    else:
        tables = lake._table_names()
        if schema:
            tables = [t for t in tables
                      if (t.split(".")[0] if "." in t else "main")
                      == schema]
    # auto_compact gates EVERY path, named table included (reference
    # ducklake_compaction_functions.cpp:842-845,879-884; table >
    # schema > global scope, default true —
    # merge_adjacent_global_option.test)
    kept = []
    for t in tables:
        ht = lake._handle(t)
        v = (lake.meta.option(
            "auto_compact", "true", scope="table",
            scope_id=ht.table_id, schema_id=ht.schema_id)
            or "true").lower()
        if v in ("true", "1"):
            kept.append(t)
    tables = kept
    # ONE snapshot for the whole call (the reference's compaction plan
    # executes under a single transaction) — a 1000-pack compaction must
    # not write 1000 snapshots; joins an already-open user transaction
    with lake.transaction():
        return _merge_adjacent_in_txn(
            lake, tables, target_file_size, max_compacted_files,
            min_file_size, max_file_size, detail)


def _merge_adjacent_in_txn(lake, tables, target_file_size_arg,
                           max_compacted_files, min_file_size,
                           max_file_size, detail=None) -> int:
    n_groups = 0
    for tname in tables:
        h = lake._handle(tname)
        target_file_size = (target_file_size_arg
                            if target_file_size_arg is not None
                            else _effective_target_file_size(
                                lake, h, str(DEFAULT_TARGET_FILE_SIZE)))
        snap = lake.meta.latest_snapshot()
        files = lake._visible_files(h, snap, None)
        with_deletes = {
            fid
            for (fid,) in lake.meta.query(
                "SELECT DISTINCT data_file_id FROM ducklake_delete_file "
                "WHERE table_id=? AND end_snapshot IS NULL",
                (h.table_id,),
            )
        } | _fids_with_inlined_deletes(lake, h)
        # one batched query for every file's partition values (not one
        # round-trip per file: 1M files must not mean 1M driver queries)
        pv_rows = lake.meta.query(
            "SELECT data_file_id, partition_key_index, partition_value "
            "FROM ducklake_file_partition_value WHERE table_id=?",
            (h.table_id,),
        )
        pv_acc: dict[int, list[tuple[int, str]]] = {}
        for fid_, idx_, v_ in pv_rows:
            pv_acc.setdefault(fid_, []).append((idx_, v_))
        # a pack never mixes files from different partition SPECS: equal
        # value tuples under different specs describe different columns,
        # and the merged file inherits its pack's spec id so pruning
        # still applies to it (ducklake_data_file.partition_id)
        pid_by_fid = dict(lake.meta.query(
            "SELECT data_file_id, partition_id FROM ducklake_data_file "
            "WHERE table_id=?",
            (h.table_id,),
        ))
        part_vals = {
            f["data_file_id"]: tuple(
                v for _, v in sorted(pv_acc.get(f["data_file_id"], []))
            )
            for f in files
        }
        # group by (partition values, evolution-epoch key). The epoch key
        # is EXACTLY what the scan groups by (nested renames / ADD FIELD
        # defaults that postdate the file, physically-absent ADD COLUMN
        # DEFAULT columns) — a pack must never straddle a schema change,
        # or the merged file silently loses its epoch's scan treatment
        # (reference: compaction groups per schema_version and only
        # merges FieldsPreservedInLatest files,
        # ducklake_compaction_functions.cpp:299-348; pinned by
        # compaction_alter_table.test, compaction_multiple_rename_column
        # .test, compaction_schema_version_per_table.test).
        schema = lake._spark_schema(h)
        epoch_keys, init_defaults = lake._file_epoch_keys(h, files, schema)
        sort_spec = lake._sort_spec(h)
        # packs also split per column-generation epoch — the set of
        # ducklake_column generations visible at the file's begin
        # snapshot. The reference groups compaction per schema_version
        # (ducklake_compaction_functions.cpp:299-348); deriving the
        # epoch from column history instead of ducklake_snapshot keeps
        # it correct after the recording snapshots are EXPIRED
        # (merge_files_expired_snapshots.test: 3 files, not 1, after
        # two alters whose snapshots are gone)
        colgens = lake.meta.query(
            "SELECT column_id, begin_snapshot, end_snapshot "
            "FROM ducklake_column WHERE table_id=? "
            "AND parent_column IS NULL",
            (h.table_id,),
        )

        latest_gens = frozenset(
            (c, b) for c, b, e in colgens if e is None)

        def _colgen_epoch(f: dict) -> frozenset:
            fsnap = lake._file_begin_snapshot(f)
            if fsnap is None:
                return frozenset()
            gens = frozenset(
                (c, b) for c, b, e in colgens
                if b <= fsnap and (e is None or e > fsnap))
            # FieldsPreservedInLatest (ducklake_compaction_functions
            # .cpp:264-282): a file whose visible generations all
            # survive in the latest schema merges into the latest group
            # (ADD COLUMN alone never splits —
            # compaction_schema_version_per_table.test "all four files
            # merge"); a file holding since-dropped/renamed/retyped
            # generations only merges with exact epoch peers
            return frozenset() if gens <= latest_gens else gens

        def _epoch_handle(cge: frozenset):
            """Synthetic handle whose columns are the pack's OWN
            generation rows — an isolated old-epoch pack must be
            rewritten in its epoch's physical shape (names, types,
            field ids), or time travel reads NULL for columns dropped
            since (compaction_alter_table.test s2 read)."""
            if not cge:
                return None
            rows = lake.meta.query(
                "SELECT column_id, column_name, column_type, "
                "nulls_allowed, begin_snapshot, column_order "
                "FROM ducklake_column WHERE table_id=? "
                "AND parent_column IS NULL ORDER BY column_order",
                (h.table_id,),
            )
            import dataclasses

            return dataclasses.replace(h, columns=[
                (cid, nm, ty, bool(na))
                for cid, nm, ty, na, b, _o in rows if (cid, b) in cge
            ])

        groups: dict[tuple, list[dict]] = {}
        for f in files:
            if f["data_file_id"] in with_deletes:
                continue
            if f.get("mapping_id") is not None:
                # adopted foreign files resolve columns by NAME, not
                # field id. They can still be compacted — the merged
                # output is a native id-mapped file (reference:
                # add_files/add_files_compaction.test merges adopted
                # files) — but only when the read needs no treatment
                # beyond plain name resolution: trivial evolution epoch,
                # no initial defaults, no stripped partition values,
                # allocated rowids. Anything else keeps the skip.
                epoch = epoch_keys[f["data_file_id"]]
                if (epoch[0] or epoch[1] or epoch[2] or epoch[3]
                        or init_defaults
                        or f["row_id_start"] is None):
                    # non-NULL partition values are fine: the pack read
                    # backfills them from the catalog before the merged
                    # output writes through the partition transform
                    # (merge_adjacent_external_hive_paths.test)
                    continue
                if min_file_size is not None and f["file_size_bytes"] < min_file_size:
                    continue
                if max_file_size is not None and f["file_size_bytes"] > max_file_size:
                    continue
                if target_file_size and (
                        f["file_size_bytes"] or 0) >= target_file_size:
                    continue
                groups.setdefault(
                    (part_vals[f["data_file_id"]],
                     pid_by_fid.get(f["data_file_id"]),
                     (epoch[0], epoch[1], epoch[3]),
                     _colgen_epoch(f)),
                    []).append(f)
                continue
            if min_file_size is not None and f["file_size_bytes"] < min_file_size:
                continue
            if max_file_size is not None and f["file_size_bytes"] > max_file_size:
                continue
            if target_file_size and (
                    f["file_size_bytes"] or 0) >= target_file_size:
                # a file at or above target by itself never merges
                # (ducklake_compaction_functions.cpp:333-336; repeated
                # merge_adjacent calls reach a fixpoint —
                # merge_adjacent_max_files.test count 0)
                continue
            epoch = epoch_keys[f["data_file_id"]]
            if sort_spec and any(
                _expr_references(expr, c)
                for expr, _a, _n in sort_spec for c in epoch[2]
            ):
                # a sorted table whose sort key is a not-yet-materialized
                # ADD COLUMN ... DEFAULT column: re-sorting the pack by
                # the physical bytes (NULL) would disagree with the scan
                # (default-filled) — keep these files isolated
                continue
            # the group key deliberately EXCLUDES the absent-column set
            # (epoch[2]): the reference merges across an ADD COLUMN ...
            # DEFAULT boundary, materializing the default for the files
            # that predate the column (merge_adjacent_cross_schema.test
            # "t_default 3 1" + old rows read 'unknown' after cleanup)
            groups.setdefault(
                (part_vals[f["data_file_id"]],
                 pid_by_fid.get(f["data_file_id"]),
                 (epoch[0], epoch[1], epoch[3]),
                 _colgen_epoch(f)), []).append(f)
        all_packs: list[tuple[list[dict], tuple, int | None, tuple]] = []
        # max_compacted_files caps each TABLE separately — the
        # reference builds one DuckLakeCompactor per table, each with
        # its own max_files counter
        # (ducklake_compaction_functions.cpp:746-760,836-847)
        budget = max_compacted_files
        considered = 0
        for (pv, pid, epoch, cge), members in groups.items():
            # reference packing (ducklake_compaction_functions.cpp:
            # 367-414): accumulate while adding the next file moves the
            # total CLOSER to target (abs-difference rule — may
            # overshoot); singleton packs are skipped but still count
            # toward max_compacted_files (compacted_files++ on the
            # single-file continue path, :391-396)
            start = 0
            while start < len(members):
                cur = 0
                idx = start
                while idx < len(members):
                    fsz = members[idx]["file_size_bytes"] or 0
                    if cur > 0 and abs(cur + fsz - target_file_size)                             >= abs(cur - target_file_size):
                        break
                    cur += fsz
                    idx += 1
                count = idx - start
                if count > 1:
                    all_packs.append(
                        (members[start:idx], pv, pid, epoch, cge))
                    start = idx
                else:
                    start += 1
                considered += 1
                if budget is not None and considered >= budget:
                    break
            if budget is not None and considered >= budget:
                break
        # pack rewrites are independent single-output jobs; running them
        # serially makes compaction wall-clock O(#packs) in per-job
        # launch latency. Submit them from a small driver thread pool —
        # Spark's scheduler accepts concurrent jobs, catalog reads use
        # per-thread connections, and the shared transaction's buffers
        # mutate only under _TXN_BUF_LOCK.
        pack_out: list[int] = []
        if len(all_packs) > 1:
            import concurrent.futures as cf

            with cf.ThreadPoolExecutor(
                max_workers=min(PACK_POOL_WORKERS, len(all_packs))
            ) as pool:
                futs = [
                    pool.submit(_rewrite_pack, lake, h, pack, pv, pid,
                                epoch, _epoch_handle(cge), epoch_keys,
                                init_defaults)
                    for pack, pv, pid, epoch, cge in all_packs
                ]
                pack_out = [fut.result() for fut in futs]
        elif all_packs:
            pack, pv, pid, epoch, cge = all_packs[0]
            pack_out = [_rewrite_pack(lake, h, pack, pv, pid, epoch,
                                      _epoch_handle(cge), epoch_keys,
                                      init_defaults)]
        if detail is not None:
            for (pack, _pv, _pid, _epoch, _cge), nf in zip(
                    all_packs, pack_out):
                detail.append(
                    (h.schema_name, h.table_name, len(pack), nf))
        n_groups += len(all_packs)
    return n_groups


def _spec_for_pid(lake: DuckLake, h, pid: int | None) -> list:
    """Partition spec (column, transform) list for a SPECIFIC spec id —
    a pack written under a retired spec must keep writing through THAT
    spec, not the table's live one (merge_adjacent_cross_schema_
    isolation.test: old-spec pack of 2 merges into ONE file, not one
    per live-spec key value)."""
    if pid is None:
        return []
    if pid == lake._partition_spec_id(h):
        return lake._partition_spec(h)
    rows = lake.meta.query(
        "SELECT pc.column_id, pc.transform FROM ducklake_partition_column "
        "pc WHERE pc.table_id=? AND pc.partition_id=? "
        "ORDER BY pc.partition_key_index",
        (h.table_id, pid))
    colmap = {c[0]: c[1] for c in h.columns}
    return [(colmap[cid], t) for cid, t in rows if cid in colmap]


def _rewrite_pack(lake: DuckLake, h, pack: list[dict], part_vals: tuple,
                  part_pid: int | None, epoch: tuple,
                  h_epoch=None, epoch_keys: dict | None = None,
                  init_defaults: dict | None = None) -> int:
    """Merge one same-epoch pack into one file, preserving the epoch's
    PHYSICAL shape: read with the epoch's reverted nested names and
    write those names back. An ADD COLUMN ... DEFAULT column absent
    from EVERY member stays physically absent (writing it as NULL
    would create stats rows and silently turn off the scan's
    initial_default fill); when members MIX presence, the default is
    materialized for the files that predate the column — the
    reference's bind-to-latest rewrite does the same
    (merge_adjacent_cross_schema.test: 3 files merge into 1 and old
    rows read 'unknown' even after the sources are cleaned up).

    The merged file's begin_snapshot rewinds to the pack minimum
    (time travel), which re-classifies it into the SAME epoch at scan
    — so the scan's rename revert / field-default fill treat it
    exactly like the files it replaced.

    ``h_epoch``: for a pack isolated in an OLD column-generation epoch
    (dropped/renamed/retyped columns since), a synthetic handle with
    that epoch's column rows — the merged file is written in the
    epoch's physical shape so earlier-snapshot reads keep their
    columns (compaction_alter_table.test time travel)."""
    hs = h_epoch or h
    if not any(f["record_count"] for f in pack):
        # an all-empty pack is consumed WITHOUT a replacement file
        # (repro_merge_adjacent_zero_output.test: 4 empty files ->
        # files_processed 4, files_created 0)
        with _TXN_BUF_LOCK:
            txn = lake._begin()
            delta = txn.stats_delta.setdefault(h.table_id, {})
            delta["bytes"] = (delta.get("bytes", 0) - sum(
                f0.get("file_size_bytes") or 0 for f0 in pack))
            for f in pack:
                txn.purged_data_files.setdefault(
                    h.table_id, []).append(f["data_file_id"])
                txn.touched_delete_data_files.add(f["data_file_id"])
            txn.change_log.append(f"compacted_table:{h.table_id}")
        lake._autocommit()
        return 0
    schema = lake._spark_schema(hs)
    if len(epoch) == 4:
        later, _ffill, absent, _fadds = epoch
        absent_by_fid = {f["data_file_id"]: absent for f in pack}
    else:
        later, _ffill, _fadds = epoch
        absent_by_fid = {
            f["data_file_id"]:
                (epoch_keys or {}).get(
                    f["data_file_id"], ((), (), frozenset(), ()))[2]
            for f in pack
        }
        # only columns absent from EVERY member stay absent
        absent = frozenset.intersection(
            *[frozenset(v) for v in absent_by_fid.values()]
        ) if absent_by_fid else frozenset()
    gschema, _fixups = lake._epoch_schema(
        hs, lake._reader_schema(hs, schema), later)
    # adopted files in the pack resolve by NAME (no field ids); the
    # guard in _merge_adjacent_in_txn admits them only with a trivial
    # epoch, so a plain name-based read IS the scan's semantics and the
    # merged output is a native id-mapped file
    from pyspark.sql import types as _T

    plain_schema = _T.StructType(
        [_T.StructField(f_.name, f_.dataType, True) for f_ in schema.fields])
    # physically-absent ADD COLUMN ... DEFAULT columns stay absent:
    # writing them (as NULL) would create stats rows and silently turn
    # off the scan's initial_default fill
    from pyspark.sql import types as T

    gschema = T.StructType(
        [f_ for f_ in gschema.fields if f_.name not in absent])
    out_cols = [x.name for x in schema.fields if x.name not in absent]
    snapmap = {
        f["data_file_id"]: lake._file_begin_snapshot(f) for f in pack
    }
    frames = []
    copts = lake._crypto_read_options(pack)
    # Members needing no per-file column surgery (native, no
    # member-specific default fill) batch into ONE multi-file read with
    # a broadcast per-file map for rowid/snapid — building one
    # DataFrame per member serializes O(|pack|) analysis passes on the
    # driver (~60-90 ms each), which for a 1000-file pack is a minute
    # of driver-side planning before a single task runs.
    simple = [
        f for f in pack
        if f.get("mapping_id") is None
        and f["row_id_start"] is not None
        and not (set(absent_by_fid.get(f["data_file_id"], ()))
                 - set(absent))
    ]
    if len(simple) > 1:
        from ducklake_spark.lake import DECODED_FILE_PATH

        simple_ids = {f["data_file_id"] for f in simple}
        bdf = lake.spark.read.options(**copts).schema(gschema).parquet(
            *[os.path.join(lake.data_path, f["path"]) for f in simple]
        )
        inline_files = int(lake.meta.option(
            "filemap_inline_limit", "16") or 0)
        bdf = (bdf.withColumn("__file", F.expr(DECODED_FILE_PATH))
               .withColumn("__ridx", F.col("_metadata.row_index")))
        if len(simple) <= inline_files:
            # literal lookup map instead of a broadcast LeftOuter join
            # (same rewrite as _read_files' file-info map): no
            # driver-RDD broadcast job per pack, NULL on missing keys
            # like the unmatched LeftOuter probe
            finfo = F.try_element_at(
                F.create_map(*[
                    x for f in simple
                    for x in (
                        F.lit(lake._file_uri(f["path"])),
                        F.struct(
                            F.lit(f["row_id_start"]).cast(
                                "long").alias("r"),
                            F.lit(snapmap[f["data_file_id"]]).cast(
                                "long").alias("s"),
                        ),
                    )
                ]),
                F.col("__file"))
            bdf = (bdf.withColumn("__rid_start", finfo["r"])
                   .withColumn("__fsnap", finfo["s"]))
        else:
            from ducklake_spark.lake import _local_df

            fmap = F.broadcast(_local_df(
                lake.spark,
                [(lake._file_uri(f["path"]), f["row_id_start"],
                  snapmap[f["data_file_id"]]) for f in simple],
                "____path string, __rid_start long, __fsnap long",
            ))
            bdf = bdf.join(
                fmap, F.col("__file") == F.col("____path"), "left")
        rowid_b = F.col("__rid_start") + F.col("__ridx")
        snapid_b = (
            F.coalesce(F.col(SNAPID_COL), F.col("__fsnap"))
            if SNAPID_COL in bdf.columns
            else F.col("__fsnap")
        )
        frames.append(
            bdf.withColumn(ROWID_COL, rowid_b)
            .withColumn(SNAPID_COL, snapid_b)
            .select(*out_cols, ROWID_COL, SNAPID_COL)
        )
        pack_iter = [f for f in pack
                     if f["data_file_id"] not in simple_ids]
    else:
        pack_iter = pack
    for f in pack_iter:
        path = os.path.join(lake.data_path, f["path"])
        fschema = plain_schema if f.get("mapping_id") is not None else gschema
        df = lake.spark.read.options(**copts).schema(fschema).parquet(path)
        if f.get("mapping_id") is not None and part_vals:
            # adopted hive files hold the partition value in the DIR
            # name only — backfill the recorded catalog value so the
            # merged output writes through the partition transform into
            # the canonical hive path
            # (merge_adjacent_external_hive_paths.test)
            for pi_, (pcname, ptf) in enumerate(
                    _spec_for_pid(lake, h, part_pid)):
                if (ptf or "identity") == "identity" \
                        and pi_ < len(part_vals) \
                        and part_vals[pi_] is not None \
                        and pcname in df.columns:
                    df = df.withColumn(
                        pcname,
                        F.coalesce(
                            F.col(pcname),
                            F.lit(part_vals[pi_]).cast(
                                schema[pcname].dataType)))
        for cname in sorted(
                set(absent_by_fid.get(f["data_file_id"], ())) - set(absent)):
            # this member predates the column but another member carries
            # it: materialize the initial default into the merged bytes
            from ducklake_spark.lake import _lit_as_string

            if (init_defaults or {}).get(cname) is None:
                continue
            df = df.withColumn(
                cname,
                F.coalesce(
                    F.col(cname),
                    F.expr("try_cast(%s AS %s)" % (
                        _lit_as_string(init_defaults[cname]),
                        schema[cname].dataType.simpleString()))))
        rowid = (
            F.lit(f["row_id_start"]) + F.col("_metadata.row_index")
            if f["row_id_start"] is not None
            else F.col(ROWID_COL)
        )
        snapid = (
            F.coalesce(F.col(SNAPID_COL), F.lit(snapmap[f["data_file_id"]]))
            if SNAPID_COL in df.columns
            else F.lit(snapmap[f["data_file_id"]])
        )
        frames.append(
            df.withColumn(ROWID_COL, rowid).withColumn(SNAPID_COL, snapid).select(
                *out_cols, ROWID_COL, SNAPID_COL
            )
        )
    merged = frames[0]
    for fr in frames[1:]:
        merged = merged.unionByName(fr)
    # rotation mode (reference merge_adjacent_rotation_mode.test): when
    # the pack's row-id ranges are contiguous and the output keeps rowid
    # order, the merged file needs NO embedded rowid column — a
    # positional row_id_start serves it, saving a BIGINT per row
    sort_spec = lake._sort_spec(h)
    ordered = sorted(pack, key=lambda f: f["row_id_start"] or 0)
    # (target_file_size splitting would shard the single ordered task
    # into several files whose rowid offsets we could no longer assign
    # — keep the embedded form in that case)
    tfs = _effective_target_file_size(lake, h, "0")
    # positional (no embedded rowid) is the reference's adjacency rule
    # (write_row_id = !files_are_adjacent, ducklake_compaction_
    # functions.cpp:586-590). It is only unsafe when the write could
    # SPLIT (maxRecordsPerFile kicks in at target//200 >= 10000 rows
    # and the pack holds more rows than one file would take) — a split
    # would shard the single ordered task into pieces whose rowid
    # offsets we could no longer assign.
    pack_rows = sum(f["record_count"] or 0 for f in pack)
    could_split = (tfs and tfs // 200 >= 10_000
                   and pack_rows > tfs // 200)
    positional = (
        not sort_spec
        and not could_split
        and all(f["row_id_start"] is not None for f in pack)
        and all(
            ordered[i]["row_id_start"] + ordered[i]["record_count"]
            == ordered[i + 1]["row_id_start"]
            for i in range(len(ordered) - 1)
        )
    )
    if sort_spec:
        # a sorted table's compaction output is re-sorted by the sort
        # spec, not rowid (test/sql/sorted_table/merge_adjacent_sorted_basic)
        from ducklake_spark.lake import _sort_columns

        if hs is not h:
            # old-epoch pack: the frame carries the EPOCH's physical
            # column names; rewrite the (current-name) sort text by
            # column id (merge_adjacent_sorted_expression.test renames
            # a column used in the sort expression)
            import re as _re

            cur_by_id = {c[0]: c[1] for c in h.columns}
            old_by_id = {c[0]: c[1] for c in hs.columns}
            ren = {cur_by_id[cid]: old_by_id[cid]
                   for cid in cur_by_id
                   if cid in old_by_id
                   and cur_by_id[cid] != old_by_id[cid]}
            if ren:
                def _ren_expr(e2: str) -> str:
                    for newn, oldn in ren.items():
                        e2 = _re.sub(rf"\b{_re.escape(newn)}\b",
                                     oldn, e2)
                    return e2
                sort_spec = [(_ren_expr(e2), d2, n2)
                             for e2, d2, n2 in sort_spec]
        merged = merged.coalesce(1).sortWithinPartitions(
            *_sort_columns(sort_spec))
    else:
        # coalesce-then-sortWithinPartitions: the output is one file, so
        # a global orderBy's range-partitioning sampling pass (an extra
        # scan of every pack member) buys nothing
        merged = merged.coalesce(1).sortWithinPartitions(ROWID_COL)
    if positional:
        merged = merged.drop(ROWID_COL)
        if len(set(snapmap.values())) == 1:
            merged = merged.drop(SNAPID_COL)

    # a pack is single-partition by construction: writing through the
    # table's partition spec keeps the merged file under its hive path
    # (compaction_hive_structure.test counts %sale_date% paths)
    files = lake._write_parquet(hs, merged, schema,
                                _spec_for_pid(lake, h, part_pid), [],
                                rotate=False)
    if positional and len(files) != 1:  # defensive: offsets unknowable
        raise DuckLakeError(
            "compaction: positional merge unexpectedly split into "
            f"{len(files)} files")
    begin = min(snapmap.values())
    # a previously-merged member contributes its own partial_max, not
    # just its (rewound) begin snapshot: merging AB(pm=3) with CD(pm=6)
    # yields pm=6 (merge_adjacent_partial_file_info.test line 76)
    pmax = max((f.get("partial_max") or snapmap[f["data_file_id"]])
               for f in pack)
    for fi in files:
        fi.allocate = False
        fi.row_id_start = ordered[0]["row_id_start"] if positional else None
        fi.partial_max = (pmax if len(set(snapmap.values())) > 1
                          or pmax != begin else None)
        fi.begin_snapshot_override = begin
        fi.partition_values = [(i, v) for i, v in enumerate(part_vals)]
        fi.partition_id = part_pid
        # compacted rows are not *new* rows: don't bump table stats
        fi.record_count_for_stats = 0
    # buffer mutations run under the pool lock: packs from the driver
    # thread pool share ONE transaction, and the stats_delta
    # read-modify-write below is not atomic on its own
    with _TXN_BUF_LOCK:
        txn = lake._begin()
        # compensate stats: _try_commit adds record_count for
        # allocate=False files
        delta = txn.stats_delta.setdefault(h.table_id, {})
        delta["records"] = (delta.get("records", 0)
                            - sum(f.record_count for f in files))
        # the commit adds the compacted output's bytes; the purged
        # sources must leave file_size_bytes (full_file_delete_stats
        # convention: table_stats track live files exactly)
        delta["bytes"] = (delta.get("bytes", 0)
                          - sum(f0.get("file_size_bytes") or 0 for f0 in pack))
        txn.new_data_files.setdefault(str(h.table_id), []).extend(files)
        for f in pack:
            txn.purged_data_files.setdefault(h.table_id, []).append(
                f["data_file_id"])
            # source files join the touched set so a concurrent DELETE
            # on a file being rewritten conflicts instead of silently
            # resurrecting its rows
            # (ducklake_transaction_state.cpp:223-224,267-276)
            txn.touched_delete_data_files.add(f["data_file_id"])
        txn.change_log.append(f"compacted_table:{h.table_id}")
    lake._autocommit()
    return len(files)


def rewrite_data_files(lake: DuckLake, *, delete_threshold: float | None = None,
                       table: str | None = None,
                       max_compacted_files: int | None = None,
                       detail: list | None = None) -> int:
    """Rewrite files whose deleted fraction >= threshold; returns count.
    One snapshot per call (like merge_adjacent_files).

    ``max_compacted_files`` caps victims PER TABLE per call (reference
    test_rewrite_max_files.test). Outputs rotate at the scoped
    ``target_file_size`` (test_rewrite_target_file_size_rotation.test);
    unlike the reference, victims are rewritten as independent
    copy-on-write jobs (one or more outputs per victim) rather than
    merged into shared outputs — run merge_adjacent_files afterwards to
    pack small survivors."""
    if max_compacted_files is not None:
        if not isinstance(max_compacted_files, int):
            raise DuckLakeError(
                "The max_compacted_files option must be a non-null integer")
        if max_compacted_files <= 0:
            raise DuckLakeError(
                "The max_compacted_files option must be greater than zero.")
    if delete_threshold is not None and not (
            0.0 <= float(delete_threshold) <= 1.0):
        # reference: test_last_snapshot_rewrite.test:141-145
        raise DuckLakeError(
            "The delete_threshold option must be between 0 and 1")
    if delete_threshold is None:
        delete_threshold = float(lake.meta.option("rewrite_delete_threshold", "0.95"))
    tables = [table] if table else lake._table_names()
    with lake.transaction():
        return _rewrite_data_files_in_txn(lake, tables, delete_threshold,
                                          max_compacted_files, detail)


def _rewrite_data_files_in_txn(lake, tables, delete_threshold,
                               max_compacted_files=None,
                               detail=None) -> int:
    n = 0
    for tname in tables:
        h = lake._handle(tname)
        # LEFT JOIN: a file whose only deletes live INLINED in the
        # catalog is still a rewrite victim (reference:
        # test/sql/rewrite_data_files/test_rewrite_inlined_file_deletes
        # .test — files_processed=1 with zero delete files on disk)
        rows = [
            (r[0], _rel(h, r[1], r[2]), r[3], r[4], r[5],
             None if r[6] is None else _rel(h, r[6], r[7]),
             r[8], r[9], r[10], r[11], r[12])
            for r in lake.meta.query(
                "SELECT d.data_file_id, d.path, d.path_is_relative, "
                "d.record_count, d.row_id_start, "
                "del.delete_count, del.path, del.path_is_relative, "
                "del.format, d.encryption_key, "
                "d.begin_snapshot, d.mapping_id, d.file_size_bytes "
                "FROM ducklake_data_file d LEFT JOIN ducklake_delete_file del "
                "ON del.data_file_id = d.data_file_id AND del.end_snapshot IS NULL "
                "WHERE d.table_id=? AND d.end_snapshot IS NULL "
                "ORDER BY d.data_file_id",
                (h.table_id,),
            )
        ]
        schema = lake._spark_schema(h)
        inl_pos = _inlined_delete_positions(lake, h)
        all_fdicts = [{"data_file_id": r[0], "begin_snapshot": r[8]}
                      for r in rows]
        all_epochs, init_defaults = lake._file_epoch_keys(
            h, all_fdicts, schema) if rows else ({}, {})
        victims = []
        for row in rows:
            (fid, _path, rc, _rid, del_cnt, _dp, _dfm, _ek,
             _bs, mapping_id, _fsz) = row
            total_del = (del_cnt or 0) + len(inl_pos.get(fid, ()))
            if rc == 0 or total_del == 0 or total_del / rc < delete_threshold:
                continue
            if mapping_id is not None:
                # adopted foreign files resolve by NAME — rewritable
                # only when the read needs nothing beyond plain name
                # resolution (test_rewrite_inlined_file_deletes_add_
                # files.test rewrites an adopted file); any evolution
                # treatment keeps the skip
                ep = all_epochs[fid]
                if ep[0] or ep[1] or ep[2] or ep[3] or init_defaults                         or row[3] is None:
                    continue
            victims.append((row, inl_pos.get(fid, ())))
        if not victims:
            continue
        # ADJACENT victims sharing an evolution epoch and partition
        # merge into shared outputs up to target_file_size — the
        # reference's rewrite packs like merge_adjacent
        # (test_rewrite_max_files.test: 6 victims -> "example 6 1"
        # under a 512MB target; a 1B target keeps them singletons)
        tfs = _effective_target_file_size(
            lake, h, str(DEFAULT_TARGET_FILE_SIZE))
        epoch_keys = all_epochs
        pv_rows = lake.meta.query(
            "SELECT data_file_id, partition_key_index, partition_value "
            "FROM ducklake_file_partition_value WHERE table_id=?",
            (h.table_id,),
        )
        pv_acc: dict[int, list] = {}
        for fid_, idx_, v_ in pv_rows:
            pv_acc.setdefault(fid_, []).append((idx_, v_))

        def _live_est(v):
            row, pos = v
            rc2 = row[2] or 0
            frac = max(rc2 - (row[4] or 0) - len(pos), 0) / max(rc2, 1)
            return int((row[10] or 0) * frac)

        packs: list[list] = []
        cur, cur_size, cur_key = [], 0, None
        for v in victims:
            fid = v[0][0]
            key = (epoch_keys[fid],
                   tuple(sorted(pv_acc.get(fid, []))))
            est = _live_est(v)
            if cur and (key != cur_key
                        or (tfs and cur_size + est > tfs)):
                packs.append(cur)
                cur, cur_size = [], 0
            cur.append(v)
            cur_size += est
            cur_key = key
        if cur:
            packs.append(cur)
        if max_compacted_files is not None:
            # the cap bounds how many COMPACTED OUTPUT files one call
            # creates, not the victim count: a 512MB pack of 6 victims
            # under max_compacted_files=2 still merges all 6 into one
            # output (test_rewrite_max_files.test "example 6 1")
            packs = packs[:max_compacted_files]
        victims = [v for p in packs for v in p]
        created: list[tuple[int, int]] = []
        if len(packs) > 1:
            import concurrent.futures as cf

            with cf.ThreadPoolExecutor(
                max_workers=min(PACK_POOL_WORKERS, len(packs))
            ) as pool:
                futs = [
                    pool.submit(_rewrite_victims_pack, lake, h, schema,
                                pack, epoch_keys, init_defaults)
                    for pack in packs
                ]
                created = [(len(p), fut.result())
                           for p, fut in zip(packs, futs)]
        else:
            created = [(len(packs[0]),
                        _rewrite_victims_pack(lake, h, schema, packs[0],
                                              epoch_keys, init_defaults))]
        if detail is not None:
            for nproc, nout in created:
                detail.append((h.schema_name, h.table_name, nproc, nout))
        n += len(victims)
    return n


def _rewrite_victims_pack(lake, h, schema, pack, epoch_keys,
                          init_defaults) -> int:
    """Rewrite ONE pack of delete-carrying files into shared live-row
    outputs. The rewritten file gets a NEW begin_snapshot, so the scan
    gives it no evolution treatment — materialize each source file's
    full epoch here (nested-rename cast, ADD FIELD default, absent ADD
    COLUMN default); reading with the current schema raw instead
    silently NULLs those (round-4 verdict repro b). The reference never
    merges across schemas in rewrite mode
    (ducklake_compaction_functions.cpp:305-308) — the caller's pack key
    guarantees one epoch per pack. Output rotation happens on ACTUAL
    written bytes (_rotate_oversized), matching the reference writer
    (test_rewrite_target_file_size_rotation.test: one oversized source
    -> exactly 5 target-sized outputs)."""
    frames = []
    # Homogeneous members — native, allocated rowid range, plain
    # unencrypted parquet deletes — batch into ONE multi-file live read:
    # all members of a pack share an evolution epoch (the caller's pack
    # key), so one reader schema + one epoch treatment serve them all,
    # and their delete files read as one multi-path scan bound to the
    # data files through the catalog mapping (the same binding the
    # table scan uses). The per-member loop below remains for adopted /
    # encrypted / puffin-DV / embedded-rowid members; building one
    # DataFrame per member serializes O(|victims|) driver analysis
    # passes otherwise.
    simple = [
        (row, pos) for row, pos in pack
        if row[9] is None and row[3] is not None and row[7] is None
        and (row[6] or "parquet").lower() != "puffin"
        and not lake.encrypted
    ]
    if len(simple) > 1 and len({epoch_keys[r[0]] for r, _ in simple}) != 1:
        # the caller packs by epoch key, so this cannot happen today —
        # but the batched read applies ONE epoch treatment to every
        # member, so a future caller violating the invariant must fall
        # back to the per-member path, not silently mis-evolve rows
        simple = []
    if len(simple) > 1:
        from ducklake_spark.lake import DECODED_FILE_PATH

        later_b, ffill_b, absent_b, fadds_b = epoch_keys[simple[0][0][0]]
        gschema_b, fixups_b = lake._epoch_schema(
            h, lake._reader_schema(h, schema), later_b)
        bdf = (
            lake.spark.read.schema(gschema_b).parquet(
                *[os.path.join(lake.data_path, r[1]) for r, _ in simple])
            .withColumn("__file", F.expr(DECODED_FILE_PATH))
            .withColumn("__pos", F.col("_metadata.row_index"))
        )
        bdf = lake._apply_epoch_evolution(
            h, bdf, schema, fixups_b, ffill_b, absent_b, init_defaults,
            fadds_b)
        from ducklake_spark.lake import _local_df

        inline_files = int(lake.meta.option(
            "filemap_inline_limit", "16") or 0)
        ddf = None
        with_dels = [(r, p) for r, p in simple if r[5] is not None]
        if with_dels:
            dmapping = [(lake._file_uri(r[5]), lake._file_uri(r[1]))
                        for r, _ in with_dels]
            ddf = (
                lake.spark.read.schema("file_path string, pos long")
                .parquet(*[os.path.join(lake.data_path, r[5])
                           for r, _ in with_dels])
                .select(F.expr(DECODED_FILE_PATH).alias("__delpath"),
                        F.col("pos").alias("__dpos"))
            )
            if len(dmapping) <= inline_files:
                # literal map instead of a broadcast join (same rewrite
                # as _read_files): inner-join semantics preserved by
                # the not-null filter
                ddf = ddf.select(
                    F.try_element_at(
                        F.create_map(*[
                            F.lit(x) for pair in dmapping for x in pair]),
                        F.col("__delpath")).alias("__dfile"),
                    "__dpos",
                ).filter(F.col("__dfile").isNotNull())
            else:
                mdf = F.broadcast(_local_df(
                    lake.spark, dmapping,
                    "__delpath string, __dfile string"))
                ddf = ddf.join(mdf, "__delpath").select(
                    "__dfile", "__dpos")
        inl_rows = [(lake._file_uri(r[1]), int(p))
                    for r, pos in simple for p in (pos or ())]
        if inl_rows:
            idf = _local_df(
                lake.spark, inl_rows, "__dfile string, __dpos long")
            ddf = idf if ddf is None else ddf.unionByName(idf)
        live_b = bdf
        if ddf is not None:
            n_del = sum((r[4] or 0) for r, _ in with_dels) + len(inl_rows)
            limit = int(lake.meta.option("delete_broadcast_row_limit",
                                         "1000000") or 0)
            if n_del <= limit:
                ddf = F.broadcast(ddf)
            live_b = bdf.join(
                ddf,
                (bdf["__file"] == ddf["__dfile"])
                & (bdf["__pos"] == ddf["__dpos"]),
                "left_anti",
            )
        if len(simple) <= inline_files:
            live_b = live_b.withColumn(
                "__rid",
                F.try_element_at(
                    F.create_map(*[
                        x for r, _ in simple
                        for x in (F.lit(lake._file_uri(r[1])),
                                  F.lit(r[3]).cast("long"))]),
                    F.col("__file")))
        else:
            rmap = F.broadcast(_local_df(
                lake.spark,
                [(lake._file_uri(r[1]), r[3]) for r, _ in simple],
                "____path string, __rid long"))
            live_b = live_b.join(
                rmap, live_b["__file"] == rmap["____path"], "left")
        frames.append(
            live_b.withColumn(ROWID_COL, F.col("__rid") + F.col("__pos"))
            .select(*[x.name for x in schema.fields], ROWID_COL)
        )
        simple_ids = {r[0] for r, _ in simple}
        pack_iter = [(r, p) for r, p in pack if r[0] not in simple_ids]
    else:
        pack_iter = pack
    for row, inl_positions in pack_iter:
        (fid, path, rc, rid_start, del_cnt, del_path, del_fmt, enc_key,
         begin_snap, mapping_id, file_size) = row
        later, ffill, absent, fadds = epoch_keys[fid]
        gschema, fixups = lake._epoch_schema(
            h, lake._reader_schema(h, schema), later)
        if mapping_id is not None:
            # adopted foreign file: plain NAME resolution (no field
            # ids in the file); the caller admits these only with a
            # trivial epoch
            from pyspark.sql import types as _T

            gschema = _T.StructType(
                [_T.StructField(f_.name, f_.dataType, True)
                 for f_ in schema.fields])
        df = (
            lake.spark.read.options(
                **lake._crypto_read_options([{"encryption_key": enc_key}])
            )
            .schema(gschema)
            .parquet(os.path.join(lake.data_path, path))
            .withColumn("__pos", F.col("_metadata.row_index"))
        )
        df = lake._apply_epoch_evolution(
            h, df, schema, fixups, ffill, absent, init_defaults, fadds)
        dels = None
        if del_path is not None:
            dels = lake._delete_file_df(del_path, del_fmt).select(
                F.col("pos").alias("__pos")
            )
        if inl_positions:
            # catalog-inlined delete positions are consumed by the
            # rewrite exactly like delete-file positions
            inl_df = lake.spark.createDataFrame(
                [(int(p),) for p in inl_positions], "__pos long")
            dels = inl_df if dels is None else dels.union(inl_df)
        live = df.join(F.broadcast(dels), "__pos", "left_anti")
        rowid = (
            F.lit(rid_start) + F.col("__pos")
            if rid_start is not None
            else F.col(ROWID_COL)
        )
        frames.append(live.withColumn(ROWID_COL, rowid).select(
            *[x.name for x in schema.fields], ROWID_COL
        ))
    merged = frames[0]
    for fr in frames[1:]:
        merged = merged.unionByName(fr)
    merged = merged.coalesce(1).sortWithinPartitions(ROWID_COL)
    # the reference's rewrite streams the scan THROUGH the delete
    # anti-join, so the writer's source chunks shrink by the live
    # fraction — which changes its row-group flush (and so rotation)
    # boundaries; mirror that in the rotation model
    # (test_rewrite_target_file_size_rotation.test: 20000-row source,
    # 10% deleted, row groups land on 3686-row boundaries -> 5 files)
    total_rows = sum((r[2] or 0) for r, _p in pack)
    del_rows = sum((r[4] or 0) + len(p or ()) for r, p in pack)
    frac = max(0.01, (total_rows - del_rows) / total_rows) if total_rows else 1.0
    files = lake._write_parquet(h, merged, schema, [], [], rotate=True,
                                rotate_chunk_rows=2048.0 * frac)
    # the output keeps the sources' partition identity (pack members
    # share one partition — test_rewrite_partitioning.test: the later
    # merge_adjacent still groups per partition)
    pvs = lake.meta.query(
        "SELECT partition_key_index, partition_value "
        "FROM ducklake_file_partition_value WHERE data_file_id=? "
        "AND table_id=? ORDER BY partition_key_index",
        (pack[0][0][0], h.table_id))
    pid_row = lake.meta.query(
        "SELECT partition_id FROM ducklake_data_file WHERE data_file_id=?",
        (pack[0][0][0],))
    with _TXN_BUF_LOCK:
        txn = lake._begin()
        for fi in files:
            if pvs:
                fi.partition_values = [(i, v) for i, v in pvs]
                fi.partition_id = pid_row[0][0] if pid_row else None
            # copy-on-write: new file begins at the rewrite snapshot;
            # the old files keep serving earlier snapshots (incl. rows
            # that were live before the deletes being collected here)
            fi.allocate = False
            fi.row_id_start = None
        delta = txn.stats_delta.setdefault(h.table_id, {})
        # GROSS record_count: the retired source files contributed
        # their full (pre-delete) counts; the commit adds the survivors
        # from the new files — together stats land on live rows exactly
        delta["records"] = delta.get("records", 0) - sum(
            r[2] or 0 for r, _p in pack)
        delta["bytes"] = delta.get("bytes", 0) - sum(
            r[10] or 0 for r, _p in pack)
        txn.new_data_files.setdefault(str(h.table_id), []).extend(files)
        for r, _p in pack:
            txn.removed_data_files.setdefault(h.table_id, []).append(r[0])
            txn.touched_delete_data_files.add(r[0])
        # consumed catalog-inlined delete rows need no end-mark: the
        # retired source file stops being scanned at snapshots >= this
        # commit, so its rows go inert through file visibility (and
        # still apply correctly to time-travel reads of the old file) —
        # matching the reference, which never closes these rows on
        # rewrite.
        # the reference logs rewrite-deletes compaction under its OWN
        # change kind (ducklake_transaction_state.cpp:402 AddChangeInfo
        # "rewrite_delete"; snapshots() shows rewrite_delete=[id])
        if f"rewrite_delete:{h.table_id}" not in txn.change_log:
            txn.change_log.append(f"rewrite_delete:{h.table_id}")
    lake._autocommit()
    return len(files)


def expire_snapshots(lake: DuckLake, *, older_than: str | None = None,
                     versions: list[int] | None = None,
                     dry_run: bool = False) -> list[int]:
    """Expire old snapshots (never the latest —
    ducklake_expire_snapshots.cpp:25-105). Returns expired ids."""
    if older_than is not None and versions is not None:
        raise ValueError("cannot specify both 'versions' and 'older_than'")
    if not dry_run and lake._txn is not None:
        # inside an explicit transaction: defer to commit so ROLLBACK
        # discards the expire (issues/issue_852_cache_growth.test)
        victims = expire_snapshots(lake, older_than=older_than,
                                   versions=versions, dry_run=True)
        lake._txn.post_commit_ops.append(
            lambda: expire_snapshots(lake, older_than=older_than,
                                     versions=versions))
        return victims
    latest = lake.meta.latest_snapshot().snapshot_id
    if older_than is None and versions is None:
        # bare call: the global expire_older_than option supplies the
        # cutoff (reference expire_snapshot_global_option.test; the
        # option is global-only — see DuckLake.set_option's guard)
        import datetime

        iv = lake.meta.option("expire_older_than", None)
        if iv:
            older_than = (
                datetime.datetime.now(datetime.timezone.utc)
                - _parse_interval(iv)
            ).strftime("%Y-%m-%d %H:%M:%S.%f")
    if versions is not None:
        # NULL entries are ignored (expire_snapshots_empty_versions)
        victims = [v for v in versions if v is not None and v != latest]
    elif older_than is not None:
        victims = [
            sid
            for (sid,) in lake.meta.query(
                "SELECT snapshot_id FROM ducklake_snapshot "
                "WHERE snapshot_time < ? AND snapshot_id <> ?",
                (older_than, latest),
            )
        ]
    else:
        raise ValueError("need older_than= or versions=")
    if dry_run or not victims:
        return victims
    con = lake.meta.con
    lake.meta.begin_write()
    try:
        qs = ",".join("?" * len(victims))
        con.execute(f"DELETE FROM ducklake_snapshot WHERE snapshot_id IN ({qs})", victims)
        con.execute(
            f"DELETE FROM ducklake_snapshot_changes WHERE snapshot_id IN ({qs})", victims
        )
        # files whose lifetime no longer intersects any live snapshot
        # (keys are the PK id columns — ANSI-portable, no sqlite rowid)
        from ducklake_spark.catalog.metadata import _now_ts

        live = [s for (s,) in con.execute("SELECT snapshot_id FROM ducklake_snapshot").fetchall()]
        # tombstoned paths store the DATA-ROOT-relative form (the
        # owning table row may be purged before cleanup runs), so
        # resolve the catalog's TABLE-relative file paths now; capture
        # every table version's path before any purging below
        tbl_paths: dict[int, str] = {}
        for tid3, tp3 in con.execute(
            "SELECT t.table_id, CASE WHEN t.path_is_relative "
            "THEN s.path || t.path ELSE t.path END "
            "FROM ducklake_table t JOIN ducklake_schema s "
            "ON t.schema_id = s.schema_id ORDER BY t.begin_snapshot"
        ).fetchall():
            tbl_paths[tid3] = tp3

        def _sched_path(tid3, path3, prel3):
            return (tbl_paths.get(tid3, "") + path3) if prel3 else path3

        for table, pk in (("ducklake_data_file", "data_file_id"),
                          ("ducklake_delete_file", "delete_file_id")):
            rows = con.execute(
                f"SELECT {pk}, begin_snapshot, end_snapshot, path, "
                f"path_is_relative, table_id FROM {table} "
                "WHERE end_snapshot IS NOT NULL"
            ).fetchall()
            for rid, b, e, path, prel, tid3 in rows:
                if not any(b <= s < e for s in live):
                    con.execute(f"DELETE FROM {table} WHERE {pk}=?", (rid,))
                    con.execute(
                        "INSERT INTO ducklake_files_scheduled_for_deletion "
                        "VALUES (NULL, ?, 1, ?)",
                        (_sched_path(tid3, path, prel), _now_ts()),
                    )
        # files purged above leave no orphaned per-file metadata
        con.execute(
            "DELETE FROM ducklake_file_column_stats WHERE data_file_id "
            "NOT IN (SELECT data_file_id FROM ducklake_data_file)")
        con.execute(
            "DELETE FROM ducklake_file_variant_stats WHERE data_file_id "
            "NOT IN (SELECT data_file_id FROM ducklake_data_file)")
        con.execute(
            "DELETE FROM ducklake_file_partition_value WHERE data_file_id "
            "NOT IN (SELECT data_file_id FROM ducklake_data_file)")
        # catalog ENTITIES whose every version row misses every live
        # snapshot are unreachable history: purge the rows and, once an
        # entity is fully gone, its dependent metadata (reference
        # expire_snapshots_drop_macro / _drop_table / _schema /
        # _metadata_cleanup tests)
        def _purge_versions(table: str) -> None:
            # ANSI-portable (no sqlite rowid): the versioned row itself
            # names its lifetime
            con.execute(
                f"DELETE FROM {table} WHERE end_snapshot IS NOT NULL "
                "AND NOT EXISTS (SELECT 1 FROM ducklake_snapshot s "
                f"WHERE s.snapshot_id >= {table}.begin_snapshot "
                f"AND s.snapshot_id < {table}.end_snapshot)"
            )

        for t in ("ducklake_schema", "ducklake_table", "ducklake_view",
                  "ducklake_column", "ducklake_macro", "ducklake_tag",
                  "ducklake_column_tag", "ducklake_view_column_tag",
                  "ducklake_partition_info", "ducklake_sort_info"):
            _purge_versions(t)
        # dependents of fully-vanished entities
        con.execute(
            "DELETE FROM ducklake_macro_impl WHERE macro_id NOT IN "
            "(SELECT macro_id FROM ducklake_macro)")
        con.execute(
            "DELETE FROM ducklake_macro_parameters WHERE macro_id NOT IN "
            "(SELECT macro_id FROM ducklake_macro)")
        con.execute(
            "DELETE FROM ducklake_partition_column WHERE partition_id "
            "NOT IN (SELECT partition_id FROM ducklake_partition_info)")
        con.execute(
            "DELETE FROM ducklake_sort_expression WHERE sort_id NOT IN "
            "(SELECT sort_id FROM ducklake_sort_info)")
        for t in ("ducklake_column", "ducklake_table_stats",
                  "ducklake_table_column_stats",
                  "ducklake_schema_versions",
                  # a fully-vanished table's live sort/partition specs
                  # too (merge_adjacent_sorted_basic.test: sort_info
                  # empties once no snapshot relies on the table)
                  "ducklake_sort_info", "ducklake_partition_info"):
            con.execute(
                f"DELETE FROM {t} WHERE table_id IS NOT NULL AND "
                "table_id NOT IN (SELECT table_id FROM ducklake_table)")
        con.execute(
            "DELETE FROM ducklake_partition_column WHERE partition_id "
            "NOT IN (SELECT partition_id FROM ducklake_partition_info)")
        con.execute(
            "DELETE FROM ducklake_sort_expression WHERE sort_id NOT IN "
            "(SELECT sort_id FROM ducklake_sort_info)")
        # data/delete files of fully-vanished tables (a dropped table's
        # files keep end_snapshot at the DROP snapshot of the TABLE row,
        # or may still be NULL): once no table version survives, the
        # files are unreachable (expire_snapshots_drop_table.test)
        for table, pk in (("ducklake_data_file", "data_file_id"),
                          ("ducklake_delete_file", "delete_file_id")):
            rows = con.execute(
                f"SELECT {pk}, path, path_is_relative, table_id "
                f"FROM {table} WHERE table_id NOT IN "
                "(SELECT table_id FROM ducklake_table)"
            ).fetchall()
            for rid, path, prel, tid3 in rows:
                con.execute(f"DELETE FROM {table} WHERE {pk}=?", (rid,))
                con.execute(
                    "INSERT INTO ducklake_files_scheduled_for_deletion "
                    "VALUES (NULL, ?, 1, ?)",
                    (_sched_path(tid3, path, prel), _now_ts()),
                )
            con.execute(
                f"DELETE FROM ducklake_file_column_stats WHERE "
                "data_file_id NOT IN "
                "(SELECT data_file_id FROM ducklake_data_file)")
            con.execute(
                f"DELETE FROM ducklake_file_variant_stats WHERE "
                "data_file_id NOT IN "
                "(SELECT data_file_id FROM ducklake_data_file)")
            con.execute(
                f"DELETE FROM ducklake_file_partition_value WHERE "
                "data_file_id NOT IN "
                "(SELECT data_file_id FROM ducklake_data_file)")
        # inlined history whose lifetime no longer intersects any live
        # snapshot, then epoch tables left unreachable — the reference
        # reclaims superseded inlined tables in maintenance
        # (test/sql/data_inlining/empty_inlined_tables_alter_cleanup,
        # inlined_data_table_leak)
        reg = con.execute(
            "SELECT table_id, table_name, schema_version "
            "FROM ducklake_inlined_data_tables"
        ).fetchall()
        cur_sv = {}
        for tid, _tname, sv in reg:
            cur_sv[tid] = max(cur_sv.get(tid, -1), sv)
        for tid, tname, sv in reg:
            con.execute(
                f"DELETE FROM {tname} WHERE end_snapshot IS NOT NULL "
                "AND NOT EXISTS (SELECT 1 FROM ducklake_snapshot s "
                f"WHERE s.snapshot_id >= {tname}.begin_snapshot "
                f"AND s.snapshot_id < {tname}.end_snapshot)"
            )
            table_live = con.execute(
                "SELECT 1 FROM ducklake_table t JOIN ducklake_snapshot s "
                "ON s.snapshot_id >= t.begin_snapshot "
                "AND (t.end_snapshot IS NULL OR s.snapshot_id < t.end_snapshot) "
                "WHERE t.table_id = ?",
                (tid,),
            ).fetchone()
            n_rows = con.execute(
                f"SELECT COUNT(*) FROM {tname}"
            ).fetchone()[0]
            if table_live is None or (sv < cur_sv[tid] and n_rows == 0):
                # the whole lake table is unreachable, or this is an
                # empty superseded epoch: drop registry row + storage
                con.execute(
                    "DELETE FROM ducklake_inlined_data_tables "
                    "WHERE table_id=? AND table_name=?",
                    (tid, tname),
                )
                con.execute(f"DROP TABLE IF EXISTS {tname}")
            if table_live is None:
                con.execute(
                    f"DROP TABLE IF EXISTS ducklake_inlined_delete_{tid}"
                )
        # adoption name/column mapping rows whose data files are all
        # gone are unreachable — expire releases them (the issue-852
        # cache-growth fix; issues/issue_852_cache_growth.test expects
        # both mapping tables emptied once no file references remain)
        for mtab in ("ducklake_name_mapping", "ducklake_column_mapping"):
            con.execute(
                f"DELETE FROM {mtab} WHERE mapping_id NOT IN ("
                "SELECT mapping_id FROM ducklake_data_file "
                "WHERE mapping_id IS NOT NULL)")
        con.execute("COMMIT")
    except BaseException:
        from ducklake_spark.catalog.metadata import safe_rollback
        safe_rollback(con)
        raise
    # release file-list cache entries held for the expired snapshots
    # (issues/issue_852_cache_growth.test)
    lake._file_cache.clear()
    return victims


def cleanup_old_files(lake: DuckLake, *, older_than: str | None = None,
                      cleanup_all: bool = False, dry_run: bool = False) -> list[str]:
    """Physically remove tombstoned files (ducklake_cleanup_files.cpp:66-177).

    Without arguments the cutoff comes from the ``delete_older_than``
    option ('2 days' default), like the reference."""
    if not cleanup_all and older_than is None:
        import datetime

        iv = lake.meta.option("delete_older_than", "2 days") or "2 days"
        older_than = (
            datetime.datetime.now(datetime.timezone.utc)
            - _parse_interval(iv)
        ).strftime("%Y-%m-%d %H:%M:%S.%f")  # match _now_ts precision
    where, params = "", ()
    if older_than is not None and not cleanup_all:
        where, params = " WHERE schedule_start < ?", (older_than,)
    rows = lake.meta.query(
        "SELECT path FROM ducklake_files_scheduled_for_deletion" + where, params
    )
    out = [path for (path,) in rows]
    if not dry_run and out:
        # physical deletes first (concurrent batch), catalog rows after:
        # a failed delete leaves its row behind for the next cleanup
        lake.lfs.remove_batch([
            lake.lfs.strip_scheme(os.path.join(lake.data_path, p))
            for p in out
        ])
        lake.meta.con.executemany(
            "DELETE FROM ducklake_files_scheduled_for_deletion WHERE path=?",
            [(p,) for p in out],
        )
    return out


def _parse_interval(text: str):
    """'2 days' / '3 hours' / '1 week' -> timedelta."""
    import datetime
    import re

    m = re.fullmatch(
        r"\s*(\d+)\s*(microsecond|millisecond|second|minute|hour|day"
        r"|week|month|year)s?\s*",
        text.lower(),
    )
    if not m:
        raise ValueError(f"cannot parse interval {text!r}")
    n, unit = int(m.group(1)), m.group(2)
    if unit == "month":
        return datetime.timedelta(days=30 * n)
    if unit == "year":
        return datetime.timedelta(days=365 * n)
    return datetime.timedelta(**{unit + "s": n})


def delete_orphaned_files(lake: DuckLake, *, older_than: str | None = None,
                          cleanup_all: bool = False,
                          dry_run: bool = False) -> list[str]:
    """Remove data files on disk that no metadata row references.

    Age guard (reference ducklake_cleanup_files.cpp:61-91): by default
    only files older than the ``delete_older_than`` option ('2 days')
    are eligible — a concurrent writer's pre-commit files look like
    orphans but must survive (remove_orphans/
    concurrent_insert_orphan_cleanup.test). ``cleanup_all=True``
    bypasses the guard; ``older_than`` is an ISO timestamp cutoff.
    """
    import datetime

    cutoff = None
    if not cleanup_all:
        if older_than is not None:
            cutoff = datetime.datetime.fromisoformat(older_than)
        else:
            iv = lake.meta.option("delete_older_than", "2 days") or "2 days"
            cutoff = datetime.datetime.now(datetime.timezone.utc) - _parse_interval(iv)
    _resolve_sql = (
        "SELECT CASE WHEN f.path_is_relative THEN "
        "(CASE WHEN t.path_is_relative THEN s.path || t.path "
        " ELSE t.path END) || f.path ELSE f.path END "
        "FROM ducklake_{kind}_file f "
        # join EVERY table-row version (a dropped table's files must
        # stay in the known set or cleanup would orphan-delete them);
        # duplicate resolutions are harmless in a set union
        "JOIN ducklake_table t ON f.table_id = t.table_id "
        "JOIN ducklake_schema s ON t.schema_id = s.schema_id")
    known = {
        p
        for (p,) in lake.meta.query(_resolve_sql.format(kind="data"))
    } | {
        p for (p,) in lake.meta.query(_resolve_sql.format(kind="delete"))
    } | {
        p for (p,) in lake.meta.query(
            "SELECT path FROM ducklake_files_scheduled_for_deletion")
    }
    # ABSOLUTE rows (adopted files outside their table's directory,
    # path_is_relative = false) normalize back under the data root so
    # they match the scan's root-relative candidates
    # (remove_orphans/mixed_paths.test)
    _roots = (lake.lfs.strip_scheme(lake.data_path).rstrip("/") + "/",
              str(lake.data_path).rstrip("/") + "/")
    known |= {
        p[len(r):] for p in list(known) for r in _roots if p.startswith(r)
    }
    orphans = []
    doomed = []
    # one recursive LIST, never a per-directory walk (object-store-safe);
    # covers puffin deletion vectors too (reference
    # remove_orphans/puffin_orphan.test), and never touches a catalog DB
    # that happens to live inside the data path (suffix allowlist)
    data_fs = lake.lfs.strip_scheme(lake.data_path).rstrip("/") + "/"
    for p, mtime in lake.lfs.list_infos(data_fs.rstrip("/")):
        if not p.endswith((".parquet", ".puffin")):
            continue
        if cutoff is not None and mtime is not None:
            mt = mtime
            if mt.tzinfo is None:
                mt = mt.replace(tzinfo=datetime.timezone.utc)
            cut = cutoff if cutoff.tzinfo else cutoff.replace(
                tzinfo=datetime.timezone.utc)
            if mt > cut:
                continue  # too fresh: may belong to an in-flight commit
        rel = p[len(data_fs):] if p.startswith(data_fs) else p
        if rel not in known:
            orphans.append(rel)
            doomed.append(p)
    if not dry_run:
        lake.lfs.remove_batch(doomed)
    return orphans


# in-process claims of tables whose inlined data an OPEN transaction
# is flushing: db_path -> {table_id: id(txn)}; released at commit/
# rollback (transaction_conflict_inlining.test)
_PENDING_FLUSHES: dict[str, dict[int, int]] = {}


def release_flush_claims(txn) -> None:
    for db_path, tid in getattr(txn, "_flush_claims", ()):  # noqa: B007
        claims = _PENDING_FLUSHES.get(db_path, {})
        if claims.get(tid) == id(txn):
            del claims[tid]


def flush_inlined_data(lake: DuckLake, *, table: str | None = None,
                       schema: str | None = None,
                       report: bool = False) -> int | list[tuple[str, int]]:
    """Move inlined rows to parquet, preserving row ids
    (ducklake_flush_inlined_data.cpp; honors sort spec :355-356).
    One snapshot per call (like merge_adjacent_files). ``report=True``
    returns the reference table function's (table_name, rows_flushed)
    rows instead of the total; ``schema`` narrows to one schema
    (data_inlining_flush_schema.test)."""
    if table:
        tables = [table]
        lake._handle(table)  # "does not exist" before any work
    else:
        tables = lake._table_names()
        if schema is not None:
            if not lake.meta.query(
                "SELECT 1 FROM ducklake_schema WHERE schema_name=? "
                "AND end_snapshot IS NULL", (schema,)
            ):
                raise DuckLakeError(f"schema {schema!r} not found")
            tables = [t for t in tables
                      if t.split(".", 1)[0] == schema]
    # auto_compact gates EVERY path, named table included (reference
    # ducklake_flush_inlined_data.cpp:659-662; table > schema > global
    # scope, default true — inlining_global_options.test)
    kept = []
    for t in tables:
        ht = lake._handle(t)
        v = (lake.meta.option(
            "auto_compact", "true", scope="table",
            scope_id=ht.table_id, schema_id=ht.schema_id) or "true")
        if str(v).lower() in ("true", "1"):
            kept.append(t)
    tables = kept
    per_table: list[tuple[str, int]] = []
    flushed_tids: set[int] = set()
    if lake._txn is not None:
        # two OPEN transactions must not both flush the same table's
        # inlined rows: the reference's immediate-mode metadata txn
        # holds row locks, so the second CALL errors at the statement
        # (transaction/transaction_conflict_inlining.test). Commit-time
        # detection still backstops cross-process writers.
        claims = _PENDING_FLUSHES.setdefault(lake.meta.db_path, {})
        mine = id(lake._txn)
        for t in tables:
            tid = lake._handle(t).table_id
            owner = claims.get(tid)
            if owner is not None and owner != mine:
                err = DuckLakeError(
                    "Conflict on flush_inlined_data: another open "
                    "transaction is flushing this table's inlined data")
                # duckdb reports this without poisoning the txn —
                # COMMIT afterwards still succeeds
                err.no_invalidate = True
                raise err
        own = lake._txn._flush_claims = getattr(
            lake._txn, "_flush_claims", set())
        for t in tables:
            tid = lake._handle(t).table_id
            claims[tid] = mine
            own.add((lake.meta.db_path, tid))
    with lake.transaction():
        total = _flush_inlined_data_in_txn(lake, tables, per_table)
        if lake._txn is not None:
            flushed_tids = {t for t, _n in lake._txn.flushed_inlined_tables}
    _drop_empty_superseded_inlined(lake, flushed_tids)
    return per_table if report else total


def _drop_empty_superseded_inlined(lake: DuckLake, table_ids) -> None:
    """Post-commit client-side cleanup (reference
    DropEmptySupersededInlinedTablesClientSide,
    ducklake_transaction.cpp:774): an inlined-data table for an OLD
    schema version that a flush emptied is dropped together with its
    registry row; the current-version table stays registered even when
    empty (test/sql/data_inlining/superseded_inlined_table_flush_drop)."""
    for tid in table_ids:
        regs = lake.meta.query(
            "SELECT table_name, schema_version "
            "FROM ducklake_inlined_data_tables WHERE table_id=?", (tid,))
        if len(regs) < 2:
            continue
        cur_sv = max(sv for _n, sv in regs)
        con = lake.meta.con
        for tname2, sv in regs:
            if sv == cur_sv:
                continue
            if lake.meta.query(f"SELECT COUNT(*) FROM {tname2}")[0][0]:
                continue
            lake.meta.begin_write()
            try:
                con.execute(f"DROP TABLE IF EXISTS {tname2}")
                con.execute(
                    "DELETE FROM ducklake_inlined_data_tables "
                    "WHERE table_id=? AND table_name=?", (tid, tname2))
                con.execute("COMMIT")
            except Exception:
                from ducklake_spark.catalog.metadata import safe_rollback

                safe_rollback(con)
                raise


def _flush_inlined_data_in_txn(lake, tables, per_table=None) -> int:
    n_flushed = 0
    for tname in tables:
        before = n_flushed
        h = lake._handle(tname)
        tabs = lake.meta.query(
            "SELECT table_name FROM ducklake_inlined_data_tables WHERE table_id=?",
            (h.table_id,),
        )
        schema = lake._spark_schema(h)
        # snapshots at which an OLD-layout flush end-stamped its rows:
        # those rows are already served by a flushed parquet — skip
        # them (migration guard for catalogs written before the
        # reference-exact flush landed)
        legacy_flush_snaps = {
            sid for sid, changes in lake.meta.query(
                "SELECT snapshot_id, changes_made FROM "
                "ducklake_snapshot_changes WHERE changes_made LIKE "
                "'%flushed_inlined:%'")
            if f"flushed_inlined:{h.table_id}"
            in (changes or "").split(",")
        }
        for (itname,) in tabs:
            idx = {r[1]: i for i, r in enumerate(
                lake.meta.query(f"PRAGMA table_info({itname})"))}
            all_rows = lake.meta.query(f"SELECT * FROM {itname}")
            rows = [
                r for r in all_rows
                if r[idx["end_snapshot"]] is None
                or r[idx["end_snapshot"]] not in legacy_flush_snaps
            ]
            if not rows:
                continue
            from pyspark.sql import types as T

            # reference flush (ducklake_flush_inlined_data.cpp): write
            # EVERY row — deleted ones included — with its row id and
            # begin snapshot embedded; the file goes in retroactively
            # (begin_snapshot = min embedded snapshot, partial_max =
            # max) so history reads it with row-level snapshot
            # filtering, and pre-flush deletions become a positional
            # delete file carrying per-position end snapshots.
            # by-name mapping + initial_default fill: flushing an
            # older-epoch inlined table after ADD COLUMN ... DEFAULT must
            # materialize the default into the parquet, not NULL
            df = lake.inlined_frame(
                h, itname, rows, schema,
                tail=[(T.StructField(ROWID_COL, T.LongType()),
                       lambda r, i2: r[i2["row_id"]]),
                      (T.StructField(SNAPID_COL, T.LongType()),
                       lambda r, i2: r[i2["begin_snapshot"]])],
            )
            sort_spec = lake._sort_spec(h)
            if not sort_spec:
                # reference flush order: row_id, begin_snapshot
                df = df.repartition(1).sortWithinPartitions(
                    ROWID_COL, SNAPID_COL)
            # flushed files honor the table's partition spec (reference:
            # data_inlining_partitions.test — flush writes partitioned
            # files so pruning applies to them like any insert)
            files = lake._write_parquet(
                h, df, schema, lake._partition_spec(h), sort_spec,
                rotate=False
            )
            # key by (row_id, begin_snapshot): an inlined UPDATE
            # end-stamps the old generation and re-inserts the live row
            # with the SAME row_id — only the exact end-stamped
            # generation's file position may be marked deleted
            # (ducklake_flush_inlined_data.cpp:151-164)
            deleted = {
                (r[idx["row_id"]], r[idx["begin_snapshot"]]):
                    r[idx["end_snapshot"]]
                for r in rows if r[idx["end_snapshot"]] is not None
            }
            txn = lake._begin()
            for fi in files:
                rowids, snapids = _read_flushed_ids(lake, fi)
                fi.allocate = False
                fi.row_id_start = None
                if snapids:
                    fi.begin_snapshot_override = min(snapids)
                    fi.partial_max = max(snapids)
                if deleted:
                    positions = {
                        pos: deleted[(rid, snap)]
                        for pos, (rid, snap)
                        in enumerate(zip(rowids, snapids))
                        if (rid, snap) in deleted
                    }
                    if positions:
                        # data file id unknown until commit: reference
                        # the file by path, resolved in the same commit
                        dinfo = _write_positional_delete_file(
                            lake, h, fi.path, positions)
                        txn.new_delete_files.setdefault(
                            h.table_id, []).append(dinfo)
            txn.stats_delta.setdefault(h.table_id, {}).setdefault("records", 0)
            txn.stats_delta[h.table_id]["records"] -= sum(f.record_count for f in files)
            txn.new_data_files.setdefault(str(h.table_id), []).extend(files)
            txn.change_log.append(f"flushed_inlined:{h.table_id}")
            # exactly the flushed rows are DELETED from the catalog
            # inside the commit transaction (reference
            # DeleteFlushedInlinedData — a concurrent inlined insert
            # between here and commit must not be eaten)
            txn.inlined_row_removals.append(
                (itname, ("row_id", "begin_snapshot"),
                 [(r[idx["row_id"]], r[idx["begin_snapshot"]])
                  for r in rows])
            )
            txn.flushed_inlined_tables.add((h.table_id, itname))
            lake._autocommit()
            n_flushed += len(rows)
        n_flushed += _flush_inlined_deletes(lake, h)
        if per_table is not None and n_flushed > before:
            # keep the schema qualifier: the TVF result carries
            # (schema_name, table_name) and 's1.example_2' must not
            # report as main (inlining_global_options.test:97)
            per_table.append((tname, n_flushed - before))
    return n_flushed


def _read_flushed_ids(lake, fi) -> tuple[list[int], list[int]]:
    """(row_ids, begin_snapshots) of a just-written flushed file, in
    file order — drives per-file delete positions and the retroactive
    begin_snapshot/partial_max range."""
    import pyarrow.parquet as pq

    from ducklake_spark.lake import ROWID_COL, SNAPID_COL

    full = lake.lfs.strip_scheme(os.path.join(lake.data_path, fi.path))
    dec = {}
    if fi.encryption_key:
        from ducklake_spark.crypto_pme import decrypt_properties, key_id_for
        from ducklake_spark.lake import _crypto_key_id

        # Spark's Java factory stamps the BARE key id; pyarrow-written
        # delete files carry the dlk-prefixed one — offer both
        # (compaction/compaction_encrypted.test flush-then-read)
        dec = {"decryption_properties": decrypt_properties(
            {key_id_for(fi.encryption_key): fi.encryption_key,
             _crypto_key_id(fi.encryption_key): fi.encryption_key})}
    with lake.lfs.open_input(full) as fh:
        t = pq.ParquetFile(fh, **dec).read(
            columns=[ROWID_COL, SNAPID_COL], use_threads=False)
    return t[ROWID_COL].to_pylist(), t[SNAPID_COL].to_pylist()


def _write_positional_delete_file(lake, h, data_rel_path: str,
                                  positions: dict[int, int]):
    """Write a positional delete parquet with per-position snapshot ids
    (reference WriteDeleteFileWithSnapshots) against a
    NOT-YET-COMMITTED data file, referenced by its catalog-relative
    path; returns the DeleteFileInfo (data_file_id = path string,
    resolved to the real id inside the same commit)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ducklake_spark.lake import (
        SNAPID_COL,
        SNAPID_FIELD_ID,
        parquet_footer_size as _pfs,
    )
    from ducklake_spark.transaction import DeleteFileInfo

    delete_dir = os.path.join(lake.data_path, h.path)
    schema = pa.schema(
        [
            pa.field("file_path", pa.string(),
                     metadata={b"PARQUET:field_id": b"2147483546"}),
            pa.field("pos", pa.int64(),
                     metadata={b"PARQUET:field_id": b"2147483545"}),
            pa.field(SNAPID_COL, pa.int64(),
                     metadata={b"PARQUET:field_id":
                               str(SNAPID_FIELD_ID).encode()}),
        ]
    )
    ordered = sorted(positions)
    out = pa.table(
        {"file_path": [data_rel_path] * len(ordered), "pos": ordered,
         SNAPID_COL: [positions[p] for p in ordered]}, schema=schema
    )
    final = os.path.join(
        delete_dir, f"ducklake-{uuid.uuid4()}-delete.parquet")
    final_fs = lake.lfs.strip_scheme(final)
    enc_key = None
    wopts = {}
    if lake.encrypted:
        import base64 as _b64

        from ducklake_spark.crypto_pme import encrypt_properties, key_id_for

        enc_key = _b64.b64encode(os.urandom(16)).decode()
        wopts = {"encryption_properties": encrypt_properties(
            key_id_for(enc_key), enc_key)}
    with lake.lfs.open_output(final_fs) as fh:
        pq.write_table(out, fh, **wopts)
    from ducklake_spark.lake import _open_parquet_meta

    with lake.lfs.open_input(final_fs) as fh:
        nrgs = _open_parquet_meta(fh, enc_key).metadata.num_row_groups
    snaps = [positions[p] for p in ordered]
    return DeleteFileInfo(
        data_file_id=data_rel_path,
        path=os.path.relpath(final, lake.data_path),
        delete_count=len(ordered),
        file_size_bytes=lake.lfs.size(final_fs),
        footer_size=_pfs(final_fs, fs=lake.lfs),
        encryption_key=enc_key,
        row_group_count=nrgs,
        # the reference data-flush path leaves max_snapshot unset on
        # this file (only the inlined-DELETIONS flush sets it —
        # ducklake_flush_inlined_data.cpp:573 vs :196); the embedded
        # per-position snapshot column carries time-travel visibility
        partial_max=None,
        begin_snapshot_override=min(snaps),
    )


def _inlined_delete_positions(lake: DuckLake, h) -> dict[int, list[int]]:
    """Live catalog-inlined delete positions grouped by data file —
    rewrite victims consume these like delete-file positions
    (reference: test_rewrite_inlined_file_deletes.test)."""
    tname = f"ducklake_inlined_delete_{h.table_id}"
    if not lake.meta.query(
        "SELECT 1 FROM sqlite_master WHERE type='table' AND name=?", (tname,)
    ):
        return {}
    out: dict[int, list[int]] = {}
    for fid, pos in lake.meta.query(
        f"SELECT file_id, row_id FROM {tname}"
    ):
        out.setdefault(fid, []).append(pos)
    return out


def _fids_with_inlined_deletes(lake: DuckLake, h) -> set[int]:
    """Files whose delete positions live inlined in the catalog — they
    must be treated exactly like files with delete parquet by every
    rewrite path, or deleted rows resurrect."""
    tname = f"ducklake_inlined_delete_{h.table_id}"
    if not lake.meta.query(
        "SELECT 1 FROM sqlite_master WHERE type='table' AND name=?", (tname,)
    ):
        return set()
    return {
        fid
        for (fid,) in lake.meta.query(
            f"SELECT DISTINCT file_id FROM {tname}"
        )
    }


def _flush_inlined_deletes(lake: DuckLake, h) -> int:
    """Convert catalog-inlined delete positions to positional delete
    parquet (reference: ducklake_flush_inlined_data.cpp:459-529 flushes
    inlined deletions), merging any existing delete file per target."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ducklake_spark.lake import parquet_footer_size as _pfs

    tname = f"ducklake_inlined_delete_{h.table_id}"
    if not lake.meta.query(
        "SELECT 1 FROM sqlite_master WHERE type='table' AND name=?", (tname,)
    ):
        return 0
    rows = lake.meta.query(
        f"SELECT file_id, row_id, begin_snapshot FROM {tname}"
    )
    if not rows:
        return 0
    from collections import defaultdict

    from ducklake_spark.lake import SNAPID_COL, SNAPID_FIELD_ID
    from ducklake_spark.transaction import DeleteFileInfo

    # per-position delete snapshot: the flushed parquet embeds it so
    # time travel keeps row-level delete visibility after the catalog
    # rows are removed (reference WriteDeleteFileWithSnapshots,
    # ducklake_delete.cpp:37-155; ducklake_flush_inlined_data.cpp)
    by_fid: dict[int, dict[int, int]] = defaultdict(dict)
    for fid, pos, bsnap in rows:
        by_fid[fid][pos] = bsnap
    txn = lake._begin()
    delete_dir = os.path.join(lake.data_path, h.path)
    for fid, positions in by_fid.items():
        frow = lake.meta.query(
            "SELECT path, path_is_relative FROM ducklake_data_file "
            "WHERE data_file_id=?", (fid,)
        )
        if not frow:
            continue
        rel = _rel(h, frow[0][0], frow[0][1])
        prev = [
            (r[0], _rel(h, r[1], r[2]), r[3], r[4], r[5])
            for r in lake.meta.query(
                "SELECT delete_file_id, path, path_is_relative, format, "
                "encryption_key, "
                "begin_snapshot FROM ducklake_delete_file "
                "WHERE data_file_id=? AND end_snapshot IS NULL", (fid,)
            )
        ]
        if prev:
            # inherited positions take the previous file's
            # begin_snapshot (reference MergeDeletesWithSnapshots)
            prev_begin = prev[0][4]
            if (prev[0][2] or "parquet").lower() == "puffin":
                from ducklake_spark.functions.roaring import puffin_read

                buf = lake.lfs.read_bytes(
                    lake.lfs.strip_scheme(
                        os.path.join(lake.data_path, prev[0][1])))
                for blob in puffin_read(buf):
                    for p in blob["positions"]:
                        positions.setdefault(p, prev_begin)
            else:
                dec = {}
                if prev[0][3]:
                    from ducklake_spark.crypto_pme import (
                        decrypt_properties,
                        key_id_for,
                    )

                    dec = {"decryption_properties": decrypt_properties(
                        {key_id_for(prev[0][3]): prev[0][3]})}
                with lake.lfs.open_input(lake.lfs.strip_scheme(
                        os.path.join(lake.data_path, prev[0][1]))) as fh:
                    # use_threads=False: pyarrow PME decryption races
                    # under the threaded column reader
                    pt = pq.ParquetFile(fh, **dec).read(use_threads=False)
                    psnaps = (pt[SNAPID_COL].to_pylist()
                              if SNAPID_COL in pt.column_names
                              else [prev_begin] * pt.num_rows)
                    for p, s in zip(pt["pos"].to_pylist(), psnaps):
                        positions.setdefault(
                            p, s if s is not None else prev_begin)
            txn.replaced_delete_files.append(prev[0][0])
        schema = pa.schema(
            [
                pa.field("file_path", pa.string(),
                         metadata={b"PARQUET:field_id": b"2147483546"}),
                pa.field("pos", pa.int64(),
                         metadata={b"PARQUET:field_id": b"2147483545"}),
                pa.field(SNAPID_COL, pa.int64(),
                         metadata={b"PARQUET:field_id":
                                   str(SNAPID_FIELD_ID).encode()}),
            ]
        )
        ordered = sorted(positions)
        use_dv = (
            lake.meta.option("write_deletion_vectors", "false",
                             scope="table", scope_id=h.table_id,
                             schema_id=h.schema_id) or "false"
        ).lower() == "true"
        if use_dv:
            # flush emits an iceberg-v3 deletion vector when the lake
            # writes DVs (deletion_vector_inlined_flush.test):
            # cumulative snapshot-tagged blobs, like the delete path
            from ducklake_spark.functions.roaring import puffin_write

            final = os.path.join(
                delete_dir, f"ducklake-{uuid.uuid4()}-delete.puffin")
            snaps = [positions[p] for p in ordered]
            blobs = [
                (s, sorted(p for p in ordered if positions[p] <= s))
                for s in sorted(set(snaps))
            ]
            r = puffin_write(lake.lfs.strip_scheme(final), blobs, rel)
            txn.new_delete_files.setdefault(h.table_id, []).append(
                DeleteFileInfo(
                    data_file_id=fid,
                    path=os.path.relpath(final, lake.data_path),
                    delete_count=len(ordered),
                    file_size_bytes=r["file_size_bytes"],
                    footer_size=r["footer_size"],
                    format="puffin",
                    partial_max=max(snaps),
                    begin_snapshot_override=min(snaps),
                )
            )
            txn.touched_delete_data_files.add(fid)
            continue
        out = pa.table(
            {"file_path": [rel] * len(ordered), "pos": ordered,
             SNAPID_COL: [positions[p] for p in ordered]}, schema=schema
        )
        final = os.path.join(delete_dir, f"ducklake-{uuid.uuid4()}-delete.parquet")
        final_fs = lake.lfs.strip_scheme(final)
        enc_key = None
        wopts = {}
        if lake.encrypted:
            import base64 as _b64

            from ducklake_spark.crypto_pme import (
                encrypt_properties,
                key_id_for,
            )

            enc_key = _b64.b64encode(os.urandom(16)).decode()
            wopts = {"encryption_properties": encrypt_properties(
                key_id_for(enc_key), enc_key)}
        with lake.lfs.open_output(final_fs) as fh:
            pq.write_table(out, fh, **wopts)
        from ducklake_spark.lake import _open_parquet_meta

        with lake.lfs.open_input(final_fs) as fh:
            nrgs = _open_parquet_meta(fh, enc_key).metadata.num_row_groups
        snaps = [positions[p] for p in ordered]
        txn.new_delete_files.setdefault(h.table_id, []).append(
            DeleteFileInfo(
                data_file_id=fid,
                path=os.path.relpath(final, lake.data_path),
                delete_count=len(ordered),
                file_size_bytes=lake.lfs.size(final_fs),
                footer_size=_pfs(final_fs, fs=lake.lfs),
                encryption_key=enc_key,
                row_group_count=nrgs,
                # the file spans several delete snapshots: visible from
                # the earliest, positions filtered row-level by the
                # embedded snapshot column up to partial_max (reference
                # flush: "begin_snapshot is the minimum snapshot")
                partial_max=max(snaps),
                begin_snapshot_override=min(snaps),
            )
        )
        txn.touched_delete_data_files.add(fid)
    # flushing inlined DELETIONS writes delete files — the reference
    # logs that as a delete, not an inline flush
    # (test_deletion_inlining_compaction.test snapshot 6:
    # tables_deleted_from)
    txn.change_log.append(f"deleted_from_table:{h.table_id}")
    # exactly the consumed positions are removed from the catalog inside
    # the commit transaction (reference DELETE FROM after the flush,
    # ducklake_flush_inlined_data.cpp:588-593)
    txn.inlined_row_removals.append(
        (tname, ("file_id", "row_id"), [(r[0], r[1]) for r in rows])
    )
    lake._autocommit()
    return len(rows)


def checkpoint(lake: DuckLake) -> None:
    """Fixed maintenance order per reference ducklake_checkpoint.cpp:14-35.

    Runs in its OWN transactions even when called inside an open user
    transaction — the reference's CHECKPOINT is an independent commit,
    and the user transaction then conflict-checks against it at COMMIT
    (test/sql/checkpoint/checkpoint_updates_interleaved.test: a
    buffered DELETE whose files the checkpoint compacted aborts)."""
    saved_txn, lake._txn = lake._txn, None
    saved_flag, lake._explicit_txn = lake._explicit_txn, False
    try:
        flush_inlined_data(lake)
        # expire/cleanup need an age cutoff; checkpoint uses configured
        # defaults
        # bare calls: the options hold INTERVAL strings ('1 week') that
        # the bare paths convert to cutoffs — passing them through as
        # older_than= would compare an interval against snapshot_time
        # (checkpoint_ducklake.test '1 millisecond')
        if lake.meta.option("expire_older_than", None):
            expire_snapshots(lake)
        merge_adjacent_files(lake)
        rewrite_data_files(lake)
        if lake.meta.option("delete_older_than", None):
            cleanup_old_files(lake)
        delete_orphaned_files(lake)
    finally:
        lake._txn, lake._explicit_txn = saved_txn, saved_flag


DuckLake.merge_adjacent_files = (
    lambda self, **kw: merge_adjacent_files(self, **kw)
)
DuckLake.rewrite_data_files = lambda self, **kw: rewrite_data_files(self, **kw)
DuckLake.expire_snapshots = lambda self, **kw: expire_snapshots(self, **kw)
DuckLake.cleanup_old_files = lambda self, **kw: cleanup_old_files(self, **kw)
DuckLake.delete_orphaned_files = lambda self, **kw: delete_orphaned_files(self, **kw)
DuckLake.flush_inlined_data = lambda self, **kw: flush_inlined_data(self, **kw)
DuckLake.checkpoint = lambda self: checkpoint(self)
