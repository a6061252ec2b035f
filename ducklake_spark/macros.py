"""Stored SQL macros + comments/tags.

Reference: macros are stored SQL with per-dialect bodies
(ducklake_macro/_impl/_parameters tables §1.1;
src/storage/ducklake_macro_entry.cpp; 13 test files test/sql/macros/).
We persist dialect 'spark' bodies and expand textually at call time
(scalar macros can also be exposed through ``spark.sql`` expressions).
Comments/tags are versioned rows in ducklake_tag / ducklake_column_tag.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from ducklake_spark.lake import DuckLake, DuckLakeError


def _literal_type(default: str | None) -> str:
    """DuckLake type name of a macro default literal (reference stores
    it in ducklake_macro_parameters.default_value_type; 'unknown' when
    there is no default or the literal isn't obviously typed)."""
    if default is None:
        return "unknown"
    d = str(default).strip()
    if re.fullmatch(r"-?\d+", d):
        return "int32"
    if re.fullmatch(r"-?\d*\.\d+", d):
        return "float64"
    if d.startswith("'") and d.endswith("'"):
        return "varchar"
    if d.lower() in ("true", "false"):
        return "boolean"
    return "unknown"


def _parse_param(p) -> tuple[str, str | None, str]:
    """'a' -> (a, None, unknown); 'b := 5' -> (b, '5', unknown);
    'x INTEGER' -> (x, None, int32) (typed macro parameters,
    test_defined_types.test); ('b', '5') pairs pass through."""
    if isinstance(p, (tuple, list)):
        return p[0], (None if len(p) < 2 else p[1]), "unknown"
    m = re.fullmatch(r"\s*(\w+)\s*:=\s*(.+?)\s*", p)
    if m:
        return m.group(1), m.group(2), "unknown"
    mtd = re.fullmatch(
        r"\s*(\w+)\s+([A-Za-z_][\w ()<>,]*?)\s*:=\s*(.+?)\s*", p)
    if mtd:
        from ducklake_spark.sqlfront import duck_type_to_ducklake

        try:
            return (mtd.group(1), mtd.group(3),
                    duck_type_to_ducklake(mtd.group(2)))
        except Exception:
            return mtd.group(1), mtd.group(3), "unknown"
    mt = re.fullmatch(r"\s*(\w+)\s+([A-Za-z_][\w ()<>,]*?)\s*", p)
    if mt:
        from ducklake_spark.sqlfront import duck_type_to_ducklake

        try:
            return mt.group(1), None, duck_type_to_ducklake(mt.group(2))
        except Exception:
            pass
    return p.strip(), None, "unknown"


def _normalize_body(body: str, is_table: bool) -> str:
    """Store the reference's deparsed text: duckdb's parser round-trip
    adds canonical parens/quoting ((a + b); WHERE ((id >= a) OR ...)) —
    ducklake_macro_impl.sql dumps are byte-compared by the macro tests."""
    import duckdb

    q = body if re.match(r"\s*(SELECT|WITH|FROM|VALUES)\b", body, re.I) \
        else "SELECT " + body
    try:
        out = duckdb.connect().execute(
            "SELECT json_deserialize_sql(json_serialize_sql('%s'))"
            % q.replace("'", "''")
        ).fetchone()[0]
    except Exception:
        return body
    if not re.match(r"\s*(SELECT|WITH|FROM|VALUES)\b", body, re.I) \
            and out.upper().startswith("SELECT "):
        return out[len("SELECT "):]
    return out


def create_macro(lake: DuckLake, name: str, parameters: list | None = None,
                 body: str | None = None, *, overloads=None,
                 is_table_macro: bool = False, dialect: str = "spark") -> None:
    """CREATE MACRO. ``parameters`` entries are names, 'name := default'
    strings, or (name, default) pairs (reference
    test_default_parameter.test); ``overloads=[(params, body), ...]``
    stores several implementations resolved by arity
    (test_multiple_implementations.test)."""
    schema_name, mname = lake._split_name(name)
    rows = lake.meta.query(
        "SELECT schema_id FROM ducklake_schema WHERE schema_name=? AND end_snapshot IS NULL",
        (schema_name,),
    )
    sid = rows[0][0] if rows else None
    if sid is None:
        # schema created in THIS open transaction: resolve its id at
        # commit time (drop_schema_transaction_local_entries.test)
        if lake._txn is None or not any(
                n == schema_name for n, _u in lake._txn.created_schemas):
            raise DuckLakeError(f"no schema {schema_name!r}")
    impls = (list(overloads) if overloads is not None
             else [(parameters or [], body)])
    parsed = [([_parse_param(p) for p in ps],
               _normalize_body(b, is_table_macro) if dialect == "duckdb"
               else b)
              for ps, b in impls]
    arities = [len(ps) for ps, _ in parsed]
    if len(set(arities)) != len(arities):
        raise DuckLakeError(
            "macro overloads must have distinct parameter counts")
    for ps, _b in parsed:
        seen_default = False
        for _n, d, _t in ps:
            if d is not None:
                seen_default = True
            elif seen_default:
                raise DuckLakeError(
                    "macro default parameters must come last")
    # duplicate-name guard (reference test_simple_macro.test:88-91):
    # a live committed macro — unless dropped earlier in this open
    # transaction — or one created earlier in this txn blocks
    # re-creation
    # scalar and table macros are distinct entry types: the same name
    # may exist once per type (test_scalar_table_macros.test)
    mtype0 = "table" if is_table_macro else "scalar"
    committed = [] if sid is None else lake.meta.query(
        "SELECT m.macro_id FROM ducklake_macro m WHERE m.schema_id=? "
        "AND m.macro_name=? AND m.end_snapshot IS NULL AND EXISTS ("
        "SELECT 1 FROM ducklake_macro_impl i WHERE i.macro_id=m.macro_id "
        "AND i.type=?)", (sid, mname, mtype0))
    if lake._txn is not None:
        dropped_mids = _txn_dropped_macro_ids(lake)
        committed = [r for r in committed if r[0] not in dropped_mids]
        pend = getattr(lake._txn, "_pending_macros", {}).get(
            (schema_name, mname, is_table_macro))
        if pend is not None:
            committed = committed or [("txn-local",)]
    if committed:
        raise DuckLakeError(
            ('Table Macro Function' if is_table_macro
             else 'Macro Function')
            + f' with name "{mname}" already exists')
    txn = lake._begin()

    def op(con, snap_id):
        # macros share the global catalog-id sequence with schemas/
        # tables/views (reference: GetLocalCatalogId remap — the test
        # expectation scalar_macros_dropped=[1] counts main=0, macro=1)
        mid = txn.alloc_catalog_id()
        sid2 = sid
        if sid2 is None:
            # txn-local schema: its row was inserted earlier in this
            # same commit
            sid2 = con.execute(
                "SELECT schema_id FROM ducklake_schema WHERE "
                "schema_name=? AND end_snapshot IS NULL",
                (schema_name,),
            ).fetchone()[0]
        con.execute(
            "INSERT INTO ducklake_macro VALUES (?, ?, ?, ?, NULL)",
            (sid2, mid, mname, snap_id),
        )
        mtype = "table" if is_table_macro else "scalar"
        for ii, (ps, b) in enumerate(parsed):
            con.execute(
                "INSERT INTO ducklake_macro_impl VALUES (?, ?, ?, ?, ?)",
                (mid, ii, dialect, b, mtype),
            )
            for i, (pname, pdefault, ptype) in enumerate(ps):
                con.execute(
                    "INSERT INTO ducklake_macro_parameters VALUES "
                    "(?, ?, ?, ?, ?, ?, ?)",
                    (mid, ii, i, pname, ptype, pdefault,
                     _literal_type(pdefault)),
                )

    wrapped = lambda con, snap_id: op(con, snap_id)  # noqa: E731
    txn.column_changes.setdefault(-1, []).append(wrapped)
    # txn-local registry: a macro created in this transaction is
    # callable and droppable before commit (reference
    # catalog/create_then_drop_macro.test)
    pending = getattr(txn, "_pending_macros", None)
    if pending is None:
        pending = txn._pending_macros = {}
    # keyed by kind too: a scalar and a table macro may share a name,
    # even when both are created in ONE transaction
    # (test_multi_macro_transaction.test)
    pending[(schema_name, mname, is_table_macro)] = (
        wrapped, parsed, is_table_macro)
    # reference change-type vocabulary (ducklake_transaction_changes.cpp:
    # 47-51): scalar vs table macros log distinct change types
    _kind = "created_table_macro" if is_table_macro else "created_scalar_macro"
    txn.change_log.append(f'{_kind}:"{schema_name}"."{mname}"')
    lake._autocommit()


def drop_macro(lake: DuckLake, name: str) -> None:
    """DROP MACRO: end-marks the live row (time travel keeps the old
    definition readable); a macro created in THIS transaction unwinds
    from the buffer instead (reference
    catalog/create_then_drop_macro.test — create + drop in one BEGIN
    commits nothing)."""
    schema_name, mname = lake._split_name(name)
    txn = lake._begin()
    pending = getattr(txn, "_pending_macros", {})
    entry_p = (pending.pop((schema_name, mname, False), None)
               or pending.pop((schema_name, mname, True), None))
    if entry_p is not None:
        wrapped = entry_p[0]
        txn.column_changes[-1].remove(wrapped)
        if not txn.column_changes[-1]:
            del txn.column_changes[-1]
        for _kind in ("created_scalar_macro", "created_table_macro"):
            entry = f'{_kind}:"{schema_name}"."{mname}"'
            while entry in txn.change_log:
                txn.change_log.remove(entry)
        lake._autocommit()
        return
    rows = lake.meta.query(
        "SELECT m.macro_id, "
        " (SELECT i.type FROM ducklake_macro_impl i "
        "  WHERE i.macro_id = m.macro_id LIMIT 1) "
        "FROM ducklake_macro m "
        "JOIN ducklake_schema s ON m.schema_id = s.schema_id "
        "WHERE s.schema_name=? AND m.macro_name=? AND m.end_snapshot IS NULL",
        (schema_name, mname),
    )
    if not rows:
        raise DuckLakeError(f"no macro {name!r}")
    mid, was_table = rows[0][0], rows[0][1] == "table"

    def op(con, snap_id, mid=mid):
        con.execute(
            "UPDATE ducklake_macro SET end_snapshot=? "
            "WHERE macro_id=? AND end_snapshot IS NULL",
            (snap_id, mid),
        )

    txn.column_changes.setdefault(-1, []).append(op)
    txn.change_log.append(
        f"dropped_table_macro:{mid}" if was_table
        else f"dropped_scalar_macro:{mid}")
    lake._autocommit()


def _macro_live_clause(lake: DuckLake) -> str:
    """Visibility clause honoring an ATTACH pinned at a snapshot — a
    macro dropped later is callable again through time travel
    (reference test/sql/macros/test_attach_timetravel.test)."""
    pinned = getattr(lake, "_pinned", None)
    if pinned is None:
        return "m.end_snapshot IS NULL"
    sid = pinned.snapshot_id
    return (f"m.begin_snapshot <= {int(sid)} AND "
            f"(m.end_snapshot IS NULL OR m.end_snapshot > {int(sid)})")


def _txn_dropped_macro_ids(lake: DuckLake) -> set[int]:
    """Macro ids dropped earlier in the OPEN transaction — the committed
    rows still show end_snapshot NULL but must stop resolving
    (reference test_macro_transactions.test: DROP then call errors
    'does not exist' before commit)."""
    if lake._txn is None:
        return set()
    return {
        int(e.rpartition(":")[2]) for e in lake._txn.change_log
        if e.startswith(("dropped_scalar_macro:", "dropped_table_macro:"))
    }


def live_macro_names(lake: DuckLake) -> list[tuple[str, str, str]]:
    """[(schema, name, 'scalar'|'table')] of callable macros
    (pinned-snapshot aware), plus transaction-local pending ones."""
    dropped = _txn_dropped_macro_ids(lake)
    out = [tuple(r[1:]) for r in lake.meta.query(
        "SELECT m.macro_id, s.schema_name, m.macro_name, "
        " (SELECT i.type FROM ducklake_macro_impl i "
        "  WHERE i.macro_id = m.macro_id LIMIT 1) "
        "FROM ducklake_macro m "
        "JOIN ducklake_schema s ON m.schema_id = s.schema_id "
        f"WHERE {_macro_live_clause(lake)}") if r[0] not in dropped]
    if lake._txn is not None:
        for (s, n, is_table), _e in getattr(
                lake._txn, "_pending_macros", {}).items():
            out.append((s, n, "table" if is_table else "scalar"))
    return out


def _subst_param(body: str, pname: str, value: str) -> str:
    """Replace a macro parameter reference with its argument text.
    Matches the bare name and duckdb's deparsed quoted form ("name"),
    but never text inside single-quoted string literals
    (catalog/macro_special_characters.test: greet('bob') must not
    rewrite the 'name' inside 'hello ').
    """
    from ducklake_spark.sqlfront import _sub_outside_quotes

    pat = rf'"{re.escape(pname)}"|\b{re.escape(pname)}\b'
    return _sub_outside_quotes(pat, lambda m: value, body)


def _bind_macro_args(ps, args) -> list | None:
    """Bind call args (positional + 'name := value') to the parameter
    list ``ps`` (tuples whose [0] is the name, [1] the default).
    Returns the value list or None when the call doesn't fit."""
    named = {}
    pos = []
    for a in args:
        m = re.match(r"\s*(\w+)\s*:=\s*(.+)$", str(a), re.S)
        if m and any(p[0] == m.group(1) for p in ps):
            named[m.group(1)] = m.group(2).strip()
        else:
            pos.append(a)
    if len(pos) + len(named) > len(ps):
        return None
    values = []
    for i, p in enumerate(ps):
        if p[0] in named:
            values.append(named[p[0]])
        elif i < len(pos):
            values.append(pos[i])
        elif p[1] is not None:
            values.append(p[1])
        else:
            return None
    return values


def call_macro(lake: DuckLake, name: str, *args,
               kind: str | None = None) -> DataFrame | str:
    """Expand a stored macro; table macros return a DataFrame.
    ``kind`` ('scalar'|'table') prefers that entry type when a scalar
    and a table macro share the name (test_scalar_table_macros.test —
    SELECT xt(1) vs FROM xt(5,'tom'))."""
    schema_name, mname = lake._split_name(name)
    if lake._txn is not None:
        pend = getattr(lake._txn, "_pending_macros", {})
        order = ([kind == "table"] if kind is not None
                 else [False, True])
        entries = [pend.get((schema_name, mname, it)) for it in order]
        for entry_p in entries:
            if entry_p is None:
                continue
            _w, parsed, is_table = entry_p
            chosen = None
            for ps, b in parsed:
                vals = _bind_macro_args(ps, args)
                if vals is not None:
                    chosen = (ps, b, vals)
                    break
            if chosen is None:
                if any(e is not None for e in entries[1:]):
                    continue
                raise DuckLakeError(
                    f"macro {name!r} has no implementation "
                    f"taking {len(args)} args")
            ps, expanded, values = chosen
            for (p, _d, _t), a in zip(ps, values):
                expanded = _subst_param(expanded, p, str(a))
            from ducklake_spark.sqlfront import _dq_to_backticks

            expanded = _dq_to_backticks(expanded)
            return lake.sql(expanded) if is_table else expanded
    dropped = _txn_dropped_macro_ids(lake)
    rows = [r for r in lake.meta.query(
        "SELECT m.macro_id, i.type, i.sql FROM ducklake_macro m "
        "JOIN ducklake_macro_impl i ON m.macro_id = i.macro_id "
        f"WHERE m.macro_name=? AND {_macro_live_clause(lake)}",
        (mname,),
    ) if r[0] not in dropped]
    if not rows:
        raise DuckLakeError(f"no macro {name!r}")
    if kind is not None and any(r[1] == kind for r in rows):
        rows = [r for r in rows if r[1] == kind]
    mid, is_table = rows[0][0], rows[0][1] == "table"
    bodies = dict(
        (ii, b) for ii, b in lake.meta.query(
            "SELECT impl_id, sql FROM ducklake_macro_impl "
            "WHERE macro_id=?", (mid,))
    )
    params_by_impl: dict[int, list[tuple[str, str | None]]] = {}
    for ii, pname, pdefault in lake.meta.query(
        "SELECT impl_id, parameter_name, default_value "
        "FROM ducklake_macro_parameters WHERE macro_id=? "
        "ORDER BY impl_id, column_id",
        (mid,),
    ):
        params_by_impl.setdefault(ii, []).append((pname, pdefault))
    # overload resolution by arity: required <= len(args) <= declared
    # (named 'p := v' args bind by name — insert_sorted_macro_expression)
    chosen = values = None
    for ii in sorted(bodies):
        ps = params_by_impl.get(ii, [])
        vals = _bind_macro_args(ps, args)
        if vals is not None:
            chosen, values = ii, vals
            break
    if chosen is None:
        raise DuckLakeError(
            f"macro {name!r} has no implementation taking {len(args)} args")
    ps = params_by_impl.get(chosen, [])
    expanded = bodies[chosen]
    for (p, _d), a in zip(ps, values):
        expanded = _subst_param(expanded, p, str(a))
    # stored duckdb-deparsed bodies quote identifiers ("name"); Spark
    # wants backticks
    from ducklake_spark.sqlfront import _dq_to_backticks

    expanded = _dq_to_backticks(expanded)
    if is_table:
        return lake.sql(expanded)
    return expanded


def set_comment(lake: DuckLake, object_name: str, comment: str,
                column: str | None = None) -> None:
    """COMMENT ON TABLE/COLUMN/VIEW (versioned tag rows).

    A view name (no table of that name) resolves to the view's object
    id — COMMENT ON VIEW stores a plain ducklake_tag row like tables
    (reference: comment_on_view.test)."""
    from ducklake_spark.lake import DuckLakeError as _DLE

    try:
        h = lake._handle(object_name)
    except _DLE:
        if column is not None:
            raise
        vid = _live_view_id(lake, object_name)
        sn, vn = lake._split_name(object_name)
        txn_open = lake._txn
        txn_local_view = vid is None and txn_open is not None and any(
            s == sn and v == vn
            for s, v, _d, _s, _a in txn_open.created_views)
        if vid is None and not txn_local_view:
            raise
        txn = lake._begin()

        def vop(con, snap_id, vid=vid, sn=sn, vn=vn, txn=txn):
            if vid is None:
                # view created earlier in THIS transaction: its id is
                # allocated when the DDL applies, before column ops run
                # (reference comment_same_transaction.test); a later
                # same-txn RENAME moved the name — chase it
                # (rename_view_preserves_comment_in_transaction.test)
                seen = set()
                while (sn, vn) in txn.view_name_renames and vn not in seen:
                    seen.add(vn)
                    vn = txn.view_name_renames[(sn, vn)]
                got = con.execute(
                    "SELECT v.view_id FROM ducklake_view v "
                    "JOIN ducklake_schema s ON v.schema_id=s.schema_id "
                    "WHERE s.schema_name=? AND v.view_name=? "
                    "AND v.end_snapshot IS NULL", (sn, vn)).fetchone()
                if got is None:
                    return
                vid = got[0]
            con.execute(
                "UPDATE ducklake_tag SET end_snapshot=? "
                "WHERE object_id=? AND key='comment' AND end_snapshot IS NULL",
                (snap_id, vid),
            )
            con.execute(
                "INSERT INTO ducklake_tag VALUES (?, ?, NULL, 'comment', ?)",
                (vid, snap_id, comment),
            )

        txn.column_changes.setdefault(-2, []).append(vop)
        if vid is not None:
            txn.change_log.append(f"altered_view:{vid}")
        _note_pending_comment(txn, "view", sn, vn, None, comment)
        lake._autocommit()
        return
    txn = lake._begin()

    def op(con, snap_id):
        if column is None:
            con.execute(
                "UPDATE ducklake_tag SET end_snapshot=? "
                "WHERE object_id=? AND key='comment' AND end_snapshot IS NULL",
                (snap_id, h.table_id),
            )
            con.execute(
                "INSERT INTO ducklake_tag VALUES (?, ?, NULL, 'comment', ?)",
                (h.table_id, snap_id, comment),
            )
        else:
            # resolve the column id INSIDE the commit transaction: a
            # column ADDED earlier in this same transaction only gets
            # its id here (reference comment_same_transaction.test —
            # COMMENT ON a just-added column inside one BEGIN works);
            # the committed-schema map handles the common case
            committed = {c[1]: c[0] for c in h.columns}
            cid = committed.get(column)
            if cid is None:
                row = con.execute(
                    "SELECT column_id FROM ducklake_column "
                    "WHERE table_id=? AND column_name=? "
                    "AND end_snapshot IS NULL",
                    (h.table_id, column),
                ).fetchone()
                if row is None:
                    raise DuckLakeError(
                        f"no column {column!r} on {object_name!r}")
                cid = row[0]
            con.execute(
                "UPDATE ducklake_column_tag SET end_snapshot=? WHERE table_id=? "
                "AND column_id=? AND key='comment' AND end_snapshot IS NULL",
                (snap_id, h.table_id, cid),
            )
            con.execute(
                "INSERT INTO ducklake_column_tag VALUES (?, ?, ?, NULL, 'comment', ?)",
                (h.table_id, cid, snap_id, comment),
            )

    txn.column_changes.setdefault(-2, []).append(lambda con, snap_id: op(con, snap_id))
    txn.change_log.append(f"altered_table:{h.table_id}")
    _note_pending_comment(txn, "table", h.schema_name, h.table_name,
                          column, comment)
    lake._autocommit()


def _note_pending_comment(txn, kind: str, schema: str, name: str,
                          column: str | None, comment) -> None:
    """Record an uncommitted COMMENT so same-transaction introspection
    (duckdb_tables()/columns()/views()) sees it before COMMIT —
    reference comments run inside BEGIN and read back immediately
    (test/sql/comments/comment_on_column.test:38-47)."""
    pend = getattr(txn, "_pending_comments", None)
    if pend is None:
        pend = txn._pending_comments = {}
    pend[(kind, schema.lower(), name.lower(),
          column.lower() if column else None)] = comment


def pending_comment(lake, kind: str, schema: str, name: str,
                    column: str | None = None):
    """(found, value) for an uncommitted COMMENT in the open txn."""
    txn = lake._txn
    pend = getattr(txn, "_pending_comments", None) if txn else None
    if not pend:
        return False, None
    key = (kind, schema.lower(), name.lower(),
           column.lower() if column else None)
    if key in pend:
        return True, pend[key]
    return False, None


def _live_view_id(lake: DuckLake, name: str) -> int | None:
    schema_name, vname = lake._split_name(name)
    rows = lake.meta.query(
        "SELECT v.view_id FROM ducklake_view v JOIN ducklake_schema s "
        "ON v.schema_id = s.schema_id "
        "WHERE s.schema_name=? AND v.view_name=? AND v.end_snapshot IS NULL",
        (schema_name, vname),
    )
    return rows[0][0] if rows else None


def set_view_column_comment(lake: DuckLake, view_name: str, column: str,
                            comment: str) -> None:
    """COMMENT ON COLUMN of a VIEW: view output columns have no column
    ids, so tags key by (view_id, column_name) in
    ``ducklake_view_column_tag`` (reference 1.1-dev1;
    test/sql/comments/comment_on_view_column*.test). The column is
    matched case-insensitively against the view's output and stored
    under its canonical name — re-commenting COL_A after col_a updates
    the ONE live row. Logged as an ``altered_view`` change, so it
    conflicts with a concurrent alter/drop of the same view
    (comment_on_view_column_conflict.test)."""
    from ducklake_spark.lake import DuckLakeError

    from ducklake_spark.catalog.migrate import detect_version

    ver = detect_version(lake.meta)
    if ver is not None and ver.startswith("1.0"):
        # view-column tags arrived in 1.1 (comment_on_view_column_v10)
        raise DuckLakeError(
            "DuckLake 1.0 does not support COMMENT ON COLUMN for views")
    vid = _live_view_id(lake, view_name)
    if vid is None:
        raise DuckLakeError(f"no view {view_name!r}")
    # a view with an explicit alias list only exposes THOSE names to
    # COMMENT ON COLUMN (reference: comment_on_view_column.test —
    # 'View "pv" does not have a column with name "y"' even though the
    # unaliased tail column binds as y)
    arow = lake.meta.query(
        "SELECT column_aliases FROM ducklake_view "
        "WHERE view_id=?", (vid,))
    aliases = None
    if arow and arow[0][0]:
        import json as _json

        try:
            aliases = _json.loads(arow[0][0])
        except Exception:
            aliases = None
    cols = aliases if aliases else lake.view(view_name).columns
    canon = {c.lower(): c for c in cols}.get(column.lower())
    if canon is None:
        _, bare = lake._split_name(view_name)
        raise DuckLakeError(
            f'View "{bare}" does not have a column with name '
            f'"{column}"')
    txn = lake._begin()

    def op(con, snap_id, vid=vid, canon=canon, comment=comment):
        con.execute(
            "UPDATE ducklake_view_column_tag SET end_snapshot=? "
            "WHERE view_id=? AND lower(column_name)=lower(?) "
            "AND key='comment' AND end_snapshot IS NULL",
            (snap_id, vid, canon),
        )
        con.execute(
            "INSERT INTO ducklake_view_column_tag "
            "VALUES (?, ?, ?, NULL, 'comment', ?)",
            (vid, canon, snap_id, comment),
        )

    txn.column_changes.setdefault(-2, []).append(op)
    txn.change_log.append(f"altered_view:{vid}")
    _sn, _vn = lake._split_name(view_name)
    _note_pending_comment(txn, "view", _sn, _vn, canon, comment)
    lake._autocommit()


def get_view_column_comment(lake: DuckLake, view_name: str,
                            column: str) -> str | None:
    vid = _live_view_id(lake, view_name)
    if vid is None:
        from ducklake_spark.lake import DuckLakeError

        raise DuckLakeError(f"no view {view_name!r}")
    rows = lake.meta.query(
        "SELECT value FROM ducklake_view_column_tag "
        "WHERE view_id=? AND lower(column_name)=lower(?) "
        "AND key='comment' AND end_snapshot IS NULL",
        (vid, column),
    )
    return rows[0][0] if rows else None


def get_comment(lake: DuckLake, object_name: str, column: str | None = None) -> str | None:
    h = lake._handle(object_name)
    if column is None:
        rows = lake.meta.query(
            "SELECT value FROM ducklake_tag WHERE object_id=? AND key='comment' "
            "AND end_snapshot IS NULL",
            (h.table_id,),
        )
    else:
        cid = {c[1]: c[0] for c in h.columns}[column]
        rows = lake.meta.query(
            "SELECT value FROM ducklake_column_tag WHERE table_id=? AND column_id=? "
            "AND key='comment' AND end_snapshot IS NULL",
            (h.table_id, cid),
        )
    return rows[0][0] if rows else None


DuckLake.create_macro = (
    lambda self, name, parameters=None, body=None, **kw: create_macro(
        self, name, parameters, body, **kw)
)
DuckLake.call_macro = lambda self, name, *args: call_macro(self, name, *args)
DuckLake.set_comment = (
    lambda self, object_name, comment, column=None: set_comment(self, object_name, comment, column)
)
DuckLake.get_comment = (
    lambda self, object_name, column=None: get_comment(self, object_name, column)
)
DuckLake.set_view_column_comment = (
    lambda self, view_name, column, comment: set_view_column_comment(
        self, view_name, column, comment)
)
DuckLake.get_view_column_comment = (
    lambda self, view_name, column: get_view_column_comment(
        self, view_name, column)
)
DuckLake.drop_macro = lambda self, name: drop_macro(self, name)
