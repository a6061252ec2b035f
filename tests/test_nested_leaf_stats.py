"""Nested-leaf zone maps: per-leaf child column rows + file stats +
pruning on dotted struct predicates.

Mirrors test/sql/stats/min_max_nested_leaf_rewrite_corruption.test —
the reference keys every nested leaf's stats by its own column id; a
rewrite must not collapse an un-rewritten file's leaf range. Our global
stats are merge-only (widen, never tighten), so the reference's exact-
recompute corruption cannot occur; this pins the whole surface: child
rows created with the table, harvested per file, merged globally, and
used to prune dotted predicates at the file-list level.
"""
from __future__ import annotations

import pytest


@pytest.fixture()
def lk(spark, tmp_path):
    from ducklake_spark.lake import DuckLake

    return DuckLake.attach(
        spark, str(tmp_path / "m.db"), str(tmp_path / "d")
    )


def _mk(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "cast(id as int) i",
        "named_struct('a', cast(id as int)) s",
        "array(cast(id as int)) l",
    ).coalesce(1)


def test_nested_leaf_stats_and_pruning(lk, spark):
    from ducklake_spark.dml import delete
    from ducklake_spark.maintenance import rewrite_data_files

    lk.create_table("t", [("i", "int32"), ("s", "struct<a:int32>"),
                          ("l", "list<int32>")])
    # per-NODE child rows (reference ducklake_field_data.cpp): the
    # struct leaf AND the list element each get a row
    kids = lk.meta.query(
        "SELECT column_name, column_type, parent_column FROM ducklake_column "
        "WHERE parent_column IS NOT NULL AND end_snapshot IS NULL")
    # per-table pre-order ids: i=1, s=2, s.a=3, l=4, l.element=5
    assert [tuple(k) for k in kids] == [("a", "int32", 2),
                                        ("element", "int32", 4)]
    # the handle's schema is unaffected by child rows
    assert [c[1] for c in lk._handle("t").columns] == ["i", "s", "l"]

    lk.insert("t", _mk(spark, 1, 51))    # file A: s.a in [1,50]
    lk.insert("t", _mk(spark, 51, 101))  # file B: s.a in [51,100]
    delete(lk, "t", "i = 75")            # only file B gets a delete
    rewrite_data_files(lk, delete_threshold=0)

    # results: file A must never be pruned by file B's range
    assert lk.table("t", where="s.a < 51").count() == 50
    assert lk.table("t", where="s.a = 10").count() == 1
    assert lk.table("t", where="i < 51").count() == 50

    # global leaf stats keep the full range after the rewrite
    stats = {
        cid: (mn, mx)
        for cid, mn, mx in lk.meta.query(
            "SELECT c.column_id, s.min_value, s.max_value "
            "FROM ducklake_table_column_stats s "
            "JOIN ducklake_column c ON c.column_id = s.column_id "
            "WHERE c.parent_column IS NOT NULL")
    }
    # struct leaf AND list element both carry global leaf stats now
    assert list(stats.values()) == [("1", "100"), ("1", "100")]

    # file-level pruning on the dotted leaf predicate
    snap = lk._resolve_snapshot(None, None)
    h = lk._handle("t")
    assert len(lk._visible_files(h, snap, None)) == 2
    assert len(lk._visible_files(h, snap, "s.a < 51")) == 1
    assert len(lk._visible_files(h, snap, "s.a > 60")) == 1
    # no-stats columns never prune
    assert len(lk._visible_files(h, snap, "l = 3")) == 2


def test_nested_leaf_rows_follow_ddl(lk, spark):
    """ADD COLUMN of a struct creates leaf rows; field ops regenerate
    them; DROP COLUMN retires them."""
    lk.create_table("t", [("i", "int32")])
    lk.add_column("t", "s", "struct<a:int32,b:varchar>")

    def kids():
        return sorted(
            (n, t) for n, t, _p in lk.meta.query(
                "SELECT column_name, column_type, parent_column "
                "FROM ducklake_column WHERE parent_column IS NOT NULL "
                "AND end_snapshot IS NULL")
        )

    assert kids() == [("a", "int32"), ("b", "varchar")]
    lk.add_field("t", "s", "c", "int64")
    assert kids() == [("a", "int32"), ("b", "varchar"), ("c", "int64")]
    lk.rename_field("t", "s", "a", "a2")
    assert kids() == [("a2", "int32"), ("b", "varchar"), ("c", "int64")]
    lk.drop_field("t", "s", "b")
    assert kids() == [("a2", "int32"), ("c", "int64")]
    lk.drop_column("t", "s")
    assert kids() == []

    # pruning after evolution stays correct: new files' stats key off
    # the regenerated ids, pre-evolution files keep (no stats => keep)
    lk.add_column("t", "s", "struct<x:int32>")
    lk.insert("t", spark.range(5).selectExpr(
        "cast(id as int) i", "named_struct('x', cast(id as int)) s"
    ).coalesce(1))
    assert lk.table("t", where="s.x >= 3").count() == 2


def test_nested_leaf_stats_ctas(lk, spark):
    """CTAS preassigns leaf ids so its files harvest leaf stats too."""
    lk.create_table_as("t", spark.range(10).selectExpr(
        "cast(id as int) i", "named_struct('a', cast(id as int)) s"
    ).coalesce(1))
    rows = lk.meta.query(
        "SELECT s.min_value, s.max_value FROM ducklake_file_column_stats s "
        "JOIN ducklake_column c ON c.column_id = s.column_id "
        "WHERE c.parent_column IS NOT NULL")
    assert [tuple(r) for r in rows] == [("0", "9")]


def test_slimmed_small_file_keeps_struct_leaf_stats(lk, spark):
    """Files under SLIM_FILE_MAX_BYTES are re-serialized via pyarrow;
    write_statistics is keyed by dotted LEAF path ('s.a'), so a
    top-level-names include list silently dropped every nested-leaf
    stat from slimmed files (round-9 advisor finding)."""
    lk.create_table("t", [("i", "int64"), ("s", "struct<a:int64,b:varchar>")])
    lk.insert("t", spark.createDataFrame(
        [(1, (10, "x")), (2, (20, "y"))],
        "i long, s struct<a: long, b: string>").coalesce(1))
    stats = {r[0]: (r[1], r[2]) for r in lk.meta.con.execute(
        "SELECT column_id, min_value, max_value "
        "FROM ducklake_file_column_stats").fetchall()}
    cols = {r[1]: r[0] for r in lk.meta.con.execute(
        "SELECT column_id, column_name FROM ducklake_column "
        "WHERE end_snapshot IS NULL").fetchall()}
    assert stats[cols["a"]] == ("10", "20")
    assert stats[cols["b"]] == ("x", "y")


def test_flush_then_rewrite_seeds_nested_leaf_global_stats(lk, spark):
    """Inlined-insert seeding covers only top-level columns; after a
    flush + rewrite_data_files the recompute must SEED the struct
    leaf's global stats row from complete per-file coverage — not just
    update existing rows (reference
    min_max_nested_leaf_rewrite_corruption.test: s.a keeps [1,100])."""
    import conftest
    from ducklake_spark.dml import delete
    from ducklake_spark.lake import DuckLake
    from ducklake_spark.maintenance import (
        flush_inlined_data,
        rewrite_data_files,
    )

    lk2 = lk  # reuse fixture attach but with inlining via option
    lk2.meta.set_option("data_inlining_row_limit", "100")
    lk2.create_table("fl", [("i", "int32"), ("s", "struct<a:int32>")])
    lk2.insert("fl", spark.range(1, 51).selectExpr(
        "cast(id as int) i", "named_struct('a', cast(id as int)) s"))
    flush_inlined_data(lk2)
    lk2.insert("fl", spark.range(51, 101).selectExpr(
        "cast(id as int) i", "named_struct('a', cast(id as int)) s"))
    flush_inlined_data(lk2)
    delete(lk2, "fl", "i = 75")
    rewrite_data_files(lk2, delete_threshold=0)
    assert lk2.table("fl", where="s.a < 51").count() == 50
    assert lk2.table("fl", where="s.a = 10").count() == 1
    cols = {r[1]: r[0] for r in lk2.meta.con.execute(
        "SELECT column_id, column_name FROM ducklake_column "
        "WHERE end_snapshot IS NULL").fetchall()}
    stats = {r[0]: (r[1], r[2]) for r in lk2.meta.con.execute(
        "SELECT column_id, min_value, max_value "
        "FROM ducklake_table_column_stats").fetchall()}
    assert stats[cols["i"]] == ("1", "100")
    assert stats[cols["a"]] == ("1", "100")
