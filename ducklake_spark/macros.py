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


def create_macro(lake: DuckLake, name: str, parameters: list[str], body: str,
                 *, is_table_macro: bool = False, dialect: str = "spark") -> None:
    schema_name, mname = lake._split_name(name)
    sid = lake.meta.query(
        "SELECT schema_id FROM ducklake_schema WHERE schema_name=? AND end_snapshot IS NULL",
        (schema_name,),
    )[0][0]
    txn = lake.begin()

    def op(con, snap_id):
        mid = con.execute(
            "SELECT COALESCE(MAX(macro_id), -1) + 1 FROM ducklake_macro"
        ).fetchone()[0]
        con.execute(
            "INSERT INTO ducklake_macro VALUES (?, ?, NULL, ?, ?, ?)",
            (mid, snap_id, sid, mname, is_table_macro),
        )
        con.execute(
            "INSERT INTO ducklake_macro_impl VALUES (?, 0, ?, ?)",
            (mid, dialect, body),
        )
        for i, p in enumerate(parameters):
            con.execute(
                "INSERT INTO ducklake_macro_parameters VALUES (?, 0, ?, ?, NULL)",
                (mid, i, p),
            )

    txn.column_changes.setdefault(-1, []).append(lambda con, snap_id: op(con, snap_id))
    txn.change_log.append(f'created_macro:"{schema_name}"."{mname}"')
    lake._autocommit()


def call_macro(lake: DuckLake, name: str, *args) -> DataFrame | str:
    """Expand a stored macro; table macros return a DataFrame."""
    schema_name, mname = lake._split_name(name)
    rows = lake.meta.query(
        "SELECT m.macro_id, m.is_table_macro, i.body FROM ducklake_macro m "
        "JOIN ducklake_macro_impl i ON m.macro_id = i.macro_id "
        "WHERE m.macro_name=? AND m.end_snapshot IS NULL",
        (mname,),
    )
    if not rows:
        raise DuckLakeError(f"no macro {name!r}")
    mid, is_table, body = rows[0]
    params = [
        p
        for (p,) in lake.meta.query(
            "SELECT parameter_name FROM ducklake_macro_parameters "
            "WHERE macro_id=? ORDER BY parameter_index",
            (mid,),
        )
    ]
    if len(args) != len(params):
        raise DuckLakeError(f"macro {name!r} expects {len(params)} args")
    expanded = body
    for p, a in zip(params, args):
        expanded = re.sub(rf"\b{re.escape(p)}\b", str(a), expanded)
    if is_table:
        return lake.sql(expanded)
    return expanded


def set_comment(lake: DuckLake, object_name: str, comment: str,
                column: str | None = None) -> None:
    """COMMENT ON TABLE/COLUMN (versioned tag rows)."""
    h = lake._handle(object_name)
    txn = lake.begin()

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
            cid = {c[1]: c[0] for c in h.columns}[column]
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
    lake._autocommit()


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
    lambda self, name, parameters, body, **kw: create_macro(self, name, parameters, body, **kw)
)
DuckLake.call_macro = lambda self, name, *args: call_macro(self, name, *args)
DuckLake.set_comment = (
    lambda self, object_name, comment, column=None: set_comment(self, object_name, comment, column)
)
DuckLake.get_comment = (
    lambda self, object_name, column=None: get_comment(self, object_name, column)
)
