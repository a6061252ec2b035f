"""Format-version detection + in-place catalog migration.

Reference: ``MIGRATE_IF_REQUIRED`` / MigrateV01-V03
(ducklake_metadata_manager.cpp:308-380) upgrade old catalogs to the
current layout on attach. This port does the same schema-diff way:

1. create any table the current layout has and the catalog lacks
   (SCHEMA_STATEMENTS are all CREATE TABLE IF NOT EXISTS),
2. rename ``ducklake_file_column_statistics`` (v0.1 name) to
   ``ducklake_file_column_stats``,
3. ALTER-add every column the current layout defines that the stored
   table lacks,
4. version-specific data fixups:
   - v0.1 stored ``ducklake_partition_column.column_id`` as a column
     ORDINAL — remap to real column ids (MigrateV01's UPDATE),
   - backfill ``ducklake_schema_versions`` from the snapshot history
     when empty (MigrateV02),
   - extract ``partial_max`` from a legacy ``partial_file_info``
     string column when present (MigrateV03),
5. stamp ``version`` to the current FORMAT_VERSION.

Tested against the reference's own ``data/old_ducklake/v0*.db.gz``
fixtures (DuckDB catalogs) and synthetic downgraded sqlite catalogs.
"""

from __future__ import annotations

import re

from ducklake_spark.catalog.metadata import (
    FORMAT_VERSION,
    MetadataManager,
    SCHEMA_STATEMENTS,
    safe_rollback,
)

_CREATE_RE = re.compile(
    r"CREATE TABLE IF NOT EXISTS\s+(\w+)\s*\((.*)\)\s*$", re.S
)


def _expected_schema() -> dict[str, list[tuple[str, str]]]:
    """table -> [(column, type)] parsed from the canonical DDL."""
    out: dict[str, list[tuple[str, str]]] = {}
    for stmt in SCHEMA_STATEMENTS:
        m = _CREATE_RE.search(stmt)
        name, body = m.group(1), m.group(2)
        cols = []
        depth = 0
        col = ""
        parts = []
        for ch in body:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                parts.append(col)
                col = ""
            else:
                col += ch
        parts.append(col)
        for p in parts:
            toks = p.split()
            if not toks:
                continue
            cols.append((toks[0], toks[1] if len(toks) > 1 else "VARCHAR"))
        out[name] = cols
    return out


def detect_version(meta: MetadataManager) -> str | None:
    try:
        row = meta.con.execute(
            "SELECT value FROM ducklake_metadata WHERE key='version'"
        ).fetchone()
    except Exception:
        return None
    return row[0] if row else None


def migrate_if_required(meta: MetadataManager) -> list[str]:
    """Upgrade the attached catalog to the current layout; returns the
    list of applied actions (empty when already current)."""
    version = detect_version(meta)
    if version is None or version == FORMAT_VERSION:
        return []
    con = meta.con
    actions: list[str] = []
    meta.begin_write()
    try:
        existing = {
            t
            for (t,) in con.execute(
                "SELECT name FROM sqlite_master WHERE type='table'"
            ).fetchall()
        }
        # v0.1 table name
        if (
            "ducklake_file_column_statistics" in existing
            and "ducklake_file_column_stats" not in existing
        ):
            con.execute(
                "ALTER TABLE ducklake_file_column_statistics "
                "RENAME TO ducklake_file_column_stats"
            )
            existing.discard("ducklake_file_column_statistics")
            existing.add("ducklake_file_column_stats")
            actions.append("rename:ducklake_file_column_stats")

        expected = _expected_schema()
        for table, cols in expected.items():
            if table not in existing:
                stmt = next(s for s in SCHEMA_STATEMENTS if f" {table}(" in s)
                con.execute(stmt)
                actions.append(f"create:{table}")
                continue
            have = {
                r[1]
                for r in con.execute(f"PRAGMA table_info({table})").fetchall()
            }
            for cname, ctype in cols:
                if cname not in have:
                    con.execute(
                        f"ALTER TABLE {table} ADD COLUMN {cname} {ctype}"
                    )
                    actions.append(f"addcol:{table}.{cname}")
        # reference migration defaults: schema/table path columns are
        # '' + relative, NOT NULL (ducklake_metadata_manager.cpp:310-313
        # ADD COLUMN path VARCHAR DEFAULT ''); NULL paths break every
        # os.path.join downstream (migration/v01_partitioned.test)
        for table in ("ducklake_schema", "ducklake_table"):
            con.execute(
                f"UPDATE {table} SET path='' WHERE path IS NULL")
            con.execute(
                f"UPDATE {table} SET path_is_relative=TRUE "
                "WHERE path_is_relative IS NULL")

        # --- v0.1 fixup: partition_column.column_id held an ORDINAL
        if version.startswith("0.1"):
            rows = con.execute(
                "SELECT partition_id, partition_key_index, table_id, column_id "
                "FROM ducklake_partition_column"
            ).fetchall()
            for pid, kidx, tid, ordinal in rows:
                row = con.execute(
                    "SELECT column_id FROM ducklake_column WHERE table_id=? "
                    "AND parent_column IS NULL AND end_snapshot IS NULL "
                    "ORDER BY column_order LIMIT 1 OFFSET ?",
                    (tid, ordinal),
                ).fetchone()
                if row:
                    con.execute(
                        "UPDATE ducklake_partition_column SET column_id=? "
                        "WHERE partition_id=? AND partition_key_index=? "
                        "AND table_id=?",
                        (row[0], pid, kidx, tid),
                    )
            if rows:
                actions.append("fixup:partition_column_ordinals")

        # --- backfill schema_versions from snapshot history (MigrateV02)
        n_sv = con.execute(
            "SELECT COUNT(*) FROM ducklake_schema_versions"
        ).fetchone()[0]
        if n_sv == 0:
            con.execute(
                "INSERT INTO ducklake_schema_versions "
                "(begin_snapshot, schema_version, table_id) "
                "SELECT MIN(snapshot_id), schema_version, NULL "
                "FROM ducklake_snapshot GROUP BY schema_version"
            )
            actions.append("fixup:schema_versions_backfill")

        # --- global -> per-table schema versions: legacy catalogs
        # recorded one (begin_snapshot, schema_version) row for the
        # WHOLE lake; the current format keys them by table. Explode
        # each global row across every table alive at that snapshot
        # (migration/per_table_schema.test pins the expansion)
        glob_rows = con.execute(
            "SELECT begin_snapshot, schema_version "
            "FROM ducklake_schema_versions WHERE table_id IS NULL"
        ).fetchall()
        tbl_rows = con.execute(
            "SELECT table_id, MIN(begin_snapshot) FROM ducklake_table "
            "GROUP BY table_id"
        ).fetchall()
        if glob_rows and tbl_rows:
            con.execute(
                "DELETE FROM ducklake_schema_versions "
                "WHERE table_id IS NULL")
            for tid, tbegin in sorted(tbl_rows):
                for begin, ver in sorted(glob_rows):
                    if begin >= (tbegin or 0):
                        con.execute(
                            "INSERT INTO ducklake_schema_versions "
                            "(begin_snapshot, schema_version, table_id) "
                            "VALUES (?, ?, ?)", (begin, ver, tid))
            actions.append("fixup:schema_versions_per_table")

        # --- legacy partial_file_info -> partial_max (MigrateV03)
        df_cols = {
            r[1]
            for r in con.execute(
                "PRAGMA table_info(ducklake_data_file)"
            ).fetchall()
        }
        if "partial_file_info" in df_cols:
            for fid, info in con.execute(
                "SELECT data_file_id, partial_file_info FROM ducklake_data_file "
                "WHERE partial_file_info IS NOT NULL"
            ).fetchall():
                m = re.search(r"partial_max:(\d+)", info or "")
                if m:
                    con.execute(
                        "UPDATE ducklake_data_file SET partial_max=? "
                        "WHERE data_file_id=?",
                        (int(m.group(1)), fid),
                    )
            # dropping legacy columns isn't portable everywhere; NULL it
            con.execute(
                "UPDATE ducklake_data_file SET partial_file_info=NULL"
            )
            actions.append("fixup:partial_file_info")

        # canonical column ORDER: the engine's catalog writes are
        # positional INSERTs — a reference-written legacy table whose
        # surviving columns sit in a different order (or that carries
        # dropped legacy extras like file_order/partial_file_info)
        # must be rebuilt into the canonical shape
        # (migration/v01_partitioned.test)
        for table, cols in expected.items():
            want_order = [c[0] for c in cols]
            have_order = [
                r[1] for r in con.execute(
                    f"PRAGMA table_info({table})").fetchall()
            ]
            if have_order == want_order:
                continue
            tmp = table + "__mig"
            stmt = next(s for s in SCHEMA_STATEMENTS if f" {table}(" in s)
            con.execute(f"DROP TABLE IF EXISTS {tmp}")
            con.execute(stmt.replace(f" {table}(", f" {tmp}(", 1))
            collist = ", ".join(want_order)
            con.execute(
                f"INSERT INTO {tmp}({collist}) "
                f"SELECT {collist} FROM {table}")
            con.execute(f"DROP TABLE {table}")
            con.execute(f"ALTER TABLE {tmp} RENAME TO {table}")
            actions.append(f"reorder:{table}")

        con.execute(
            "UPDATE ducklake_metadata SET value=? WHERE key='version'",
            (FORMAT_VERSION,),
        )
        actions.append(f"version:{version}->{FORMAT_VERSION}")
        con.execute("COMMIT")
    except BaseException:
        safe_rollback(con)
        raise
    return actions


def migrate_table_paths(meta: MetadataManager) -> int:
    """Strip the schema-path prefix from ducklake_table.path rows that
    still store the full data-root-relative form ('main/test/') — the
    reference convention is SCHEMA-relative ('test/',
    general/paths.test), and handle loading now resolves
    ``s.path || t.path``. Idempotent: rows already schema-relative (or
    absolute, path_is_relative = false) don't start with their
    schema's path and pass through. Returns the number of rows
    rewritten."""
    con = meta.con
    rows = con.execute(
        "SELECT t.table_id, t.begin_snapshot, t.path, s.path "
        "FROM ducklake_table t "
        "JOIN ducklake_schema s ON t.schema_id = s.schema_id "
        "WHERE t.path_is_relative AND s.path IS NOT NULL "
        "AND s.path != '' AND t.path LIKE s.path || '%' "
        "AND LENGTH(t.path) > LENGTH(s.path)"
    ).fetchall()
    if not rows:
        return 0
    meta.begin_write()
    try:
        for tid, begin, tpath, spath in rows:
            con.execute(
                "UPDATE ducklake_table SET path=? "
                "WHERE table_id=? AND begin_snapshot=?",
                (tpath[len(spath):], tid, begin),
            )
        meta.commit()
    except Exception:
        meta.rollback()
        raise
    return len(rows)


def migrate_file_paths(meta: MetadataManager,
                       legacy_hint: bool = False) -> int:
    """Strip the table-path prefix from ducklake_data_file /
    ducklake_delete_file rows that still store the data-root-relative
    form — the reference convention is TABLE-relative
    (general/paths.test, merge_adjacent_external_hive_paths.test).
    Run AFTER migrate_table_paths (the resolution joins the schema
    path). Idempotent; absolute rows (path_is_relative = false) and
    already-relative rows pass through. Returns rows rewritten."""
    con = meta.con
    total = 0
    tpaths = {
        tid: tp
        for tid, tp in con.execute(
            "SELECT t.table_id, CASE WHEN t.path_is_relative "
            "THEN s.path || t.path ELSE t.path END "
            "FROM ducklake_table t JOIN ducklake_schema s "
            "ON t.schema_id = s.schema_id ORDER BY t.begin_snapshot"
        ).fetchall()
    }
    data_root = (con.execute(
        "SELECT value FROM ducklake_metadata WHERE key='data_path'"
    ).fetchone() or ("",))[0] or ""
    if data_root and not data_root.endswith("/"):
        data_root += "/"
    # (new_path, new_is_rel, rid, begin)
    updates: dict[str, list[tuple]] = {"ducklake_data_file": [],
                                       "ducklake_delete_file": []}
    # Rows not matching their table prefix are ambiguous: in a LEGACY
    # (data-root-relative) catalog they are adopted external files that
    # must become absolute (_resolve_rel_path would wrongly prepend the
    # table path — ADVICE r11); in a new-format catalog they are the
    # normal table-relative rows and must pass through. Disambiguate by
    # whether this attach found any legacy-layout rows at all (a row
    # matching its table prefix, or migrate_table_paths rewrites).
    external: dict[str, list[tuple]] = {"ducklake_data_file": [],
                                        "ducklake_delete_file": []}
    legacy = bool(legacy_hint)
    for table, pk in (("ducklake_data_file", "data_file_id"),
                      ("ducklake_delete_file", "delete_file_id")):
        for rid, begin, tid, path in con.execute(
            f"SELECT {pk}, begin_snapshot, table_id, path FROM {table} "
            "WHERE path_is_relative"
        ).fetchall():
            tp = tpaths.get(tid)
            if tp and path.startswith(tp) and len(path) > len(tp):
                updates[table].append((path[len(tp):], 1, rid, begin))
                legacy = True
            else:
                if "://" in path or path.startswith("/"):
                    newp = path
                else:
                    newp = data_root + path
                external[table].append((newp, 0, rid, begin))
    if legacy:
        for table in updates:
            updates[table].extend(external[table])
    if not any(updates.values()):
        return 0
    meta.begin_write()
    try:
        for table, pk in (("ducklake_data_file", "data_file_id"),
                          ("ducklake_delete_file", "delete_file_id")):
            for newp, newrel, rid, begin in updates[table]:
                con.execute(
                    f"UPDATE {table} SET path=?, path_is_relative=? "
                    f"WHERE {pk}=? AND begin_snapshot=?",
                    (newp, bool(newrel), rid, begin),
                )
                total += 1
        meta.commit()
    except Exception:
        meta.rollback()
        raise
    return total
