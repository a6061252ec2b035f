"""Reference-exact inlined-delete side-table layout
(ducklake_metadata_manager.cpp:3055-3057): exactly (file_id, row_id,
begin_snapshot) — no end_snapshot column — and the legacy-layout
migration on attach. Flushes DELETE the consumed rows and embed
per-position snapshot ids in the delete parquet
(ducklake_flush_inlined_data.cpp:430-593, WriteDeleteFileWithSnapshots
ducklake_delete.cpp:37-155)."""

from __future__ import annotations

import sqlite3

import pytest

from pyspark.sql import functions as F


@pytest.fixture()
def mklake(spark, tmp_path):
    from ducklake_spark.lake import DuckLake

    def make(name: str, **kw):
        return DuckLake.attach(
            spark, str(tmp_path / f"{name}.db"), str(tmp_path / name), **kw
        )

    return make


def _inlined_delete_table(lk):
    rows = lk.meta.query(
        "SELECT name FROM sqlite_master WHERE type='table' "
        "AND name LIKE 'ducklake_inlined_delete_%'")
    return rows[0][0] if rows else None


def test_inlined_delete_table_is_three_columns(mklake, spark):
    """New catalogs write the reference's exact layout: 3 columns,
    3-tuple inserts, no end_snapshot."""
    lk = mklake("layout", data_inlining_row_limit=10)
    lk.create_table("t", [("i", "int64")])
    lk.insert("t", spark.range(100).select(F.col("id").alias("i")))
    lk.delete("t", "i < 3")  # small -> absorbed into the catalog
    tname = _inlined_delete_table(lk)
    assert tname is not None
    assert lk.meta.columns(tname) == ["file_id", "row_id", "begin_snapshot"]
    assert lk.table("t").count() == 97


def test_flush_removes_rows_and_embeds_snapshots(mklake, spark):
    """flush_inlined_data DELETEs the consumed rows outright; the
    flushed delete parquet carries _ducklake_internal_snapshot_id so
    time travel before the flush still sees row-level deletes."""
    import pyarrow.parquet as pq

    lk = mklake("flush", data_inlining_row_limit=10)
    lk.create_table("t", [("i", "int64")])
    lk.insert("t", spark.range(100).select(F.col("id").alias("i")))
    s_before_deletes = lk.current_snapshot()
    lk.delete("t", "i < 3")
    s_after_first = lk.current_snapshot()
    lk.delete("t", "i >= 97")
    lk.flush_inlined_data()
    tname = _inlined_delete_table(lk)
    assert lk.meta.query(f"SELECT COUNT(*) FROM {tname}")[0][0] == 0
    # current read: both deletes applied
    assert lk.table("t").count() == 94
    # time travel before any delete: everything
    assert lk.table("t", at_version=s_before_deletes).count() == 100
    # time travel between the deletes: only the first applies
    assert lk.table("t", at_version=s_after_first).count() == 97
    # each flushed delete parquet (one per data file) embeds
    # per-position snapshots and the catalog row records the span
    h = lk._handle("t")
    drows = [
        ((h.path + p) if prel else p, b, pm)
        for p, prel, b, pm in lk.meta.query(
            "SELECT path, path_is_relative, begin_snapshot, partial_max "
            "FROM ducklake_delete_file WHERE end_snapshot IS NULL")
    ]
    assert drows
    import os

    all_snaps: set[int] = set()
    for path, begin, pmax in drows:
        assert pmax is not None and begin <= pmax
        t = pq.read_table(os.path.join(lk.data_path, path))
        assert "_ducklake_internal_snapshot_id" in t.column_names
        all_snaps |= set(t["_ducklake_internal_snapshot_id"].to_pylist())
    assert len(all_snaps) == 2  # two delete snapshots embedded


def test_flush_merge_preserves_existing_delete_file(mklake, spark):
    """A large delete (delete parquet) followed by a small inlined
    delete: the flush merges both into one snapshot-embedded file and
    time travel stays row-accurate."""
    lk = mklake("merge", data_inlining_row_limit=0)
    lk.create_table("t", [("i", "int64")])
    lk.insert("t", spark.range(1000).select(F.col("id").alias("i")))
    lk.delete("t", "i < 100")  # parquet delete file (inlining off)
    s_mid = lk.current_snapshot()
    lk2 = mklake("merge", data_inlining_row_limit=10)
    lk2.delete("t", "i >= 995")  # absorbed inline
    lk2.flush_inlined_data()
    assert lk2.table("t").count() == 895
    assert lk2.table("t", at_version=s_mid).count() == 900


def test_migration_from_legacy_plural_name(mklake, spark, tmp_path):
    """ADVICE r6 (high): catalogs written with the r5-era
    ducklake_inlined_deletes_{tid}(data_file_id, pos, …) layout must
    migrate on attach — otherwise previously deleted rows resurrect."""
    from ducklake_spark.lake import DuckLake

    lk = mklake("legacy", data_inlining_row_limit=10)
    lk.create_table("t", [("i", "int64")])
    lk.insert("t", spark.range(50).select(F.col("id").alias("i")))
    lk.delete("t", "i < 5")
    tname = _inlined_delete_table(lk)
    tid = tname.rsplit("_", 1)[-1]
    snap = lk.current_snapshot()
    lk.meta.close()
    # rewrite the side table into the legacy layout out-of-band
    con = sqlite3.connect(str(tmp_path / "legacy.db"))
    rows = con.execute(
        f"SELECT file_id, row_id, begin_snapshot FROM {tname}").fetchall()
    assert rows
    con.execute(f"DROP TABLE {tname}")
    con.execute(
        f"CREATE TABLE ducklake_inlined_deletes_{tid}("
        "data_file_id BIGINT, pos BIGINT, begin_snapshot BIGINT, "
        "end_snapshot BIGINT)")
    con.executemany(
        f"INSERT INTO ducklake_inlined_deletes_{tid} VALUES (?, ?, ?, NULL)",
        rows)
    con.commit()
    con.close()
    relk = DuckLake.attach(spark, str(tmp_path / "legacy.db"),
                           str(tmp_path / "legacy"))
    assert _inlined_delete_table(relk) == tname
    assert relk.meta.columns(tname) == ["file_id", "row_id",
                                        "begin_snapshot"]
    assert relk.table("t").count() == 45  # deletes did NOT resurrect
    assert relk.table("t", at_version=snap).count() == 45


def test_migration_from_four_column_layout(mklake, spark, tmp_path):
    """r6-era 4-column layout (end_snapshot) migrates to 3 columns,
    keeping consumed rows (they re-apply idempotently)."""
    from ducklake_spark.lake import DuckLake

    lk = mklake("fourcol", data_inlining_row_limit=10)
    lk.create_table("t", [("i", "int64")])
    lk.insert("t", spark.range(50).select(F.col("id").alias("i")))
    lk.delete("t", "i < 5")
    tname = _inlined_delete_table(lk)
    lk.meta.close()
    con = sqlite3.connect(str(tmp_path / "fourcol.db"))
    rows = con.execute(
        f"SELECT file_id, row_id, begin_snapshot FROM {tname}").fetchall()
    con.execute(f"DROP TABLE {tname}")
    con.execute(
        f"CREATE TABLE {tname}(file_id BIGINT, row_id BIGINT, "
        "begin_snapshot BIGINT, end_snapshot BIGINT)")
    con.executemany(f"INSERT INTO {tname} VALUES (?, ?, ?, NULL)", rows)
    con.commit()
    con.close()
    relk = DuckLake.attach(spark, str(tmp_path / "fourcol.db"),
                           str(tmp_path / "fourcol"))
    assert relk.meta.columns(tname) == ["file_id", "row_id",
                                        "begin_snapshot"]
    assert relk.table("t").count() == 45


def test_rewrite_leaves_rows_inert_via_file_visibility(mklake, spark):
    """rewrite_data_files consumes inlined deletes without end-marking:
    the retired file's rows go inert through file visibility, and time
    travel before the rewrite still applies them."""
    from ducklake_spark import maintenance as maint

    lk = mklake("rw", data_inlining_row_limit=10)
    lk.create_table("t", [("i", "int64")])
    lk.insert("t", spark.range(100).select(F.col("id").alias("i")))
    lk.delete("t", "i < 4")
    s_pre_rewrite = lk.current_snapshot()
    maint.rewrite_data_files(lk)
    tname = _inlined_delete_table(lk)
    # rows stay (reference never closes them on rewrite) …
    assert lk.meta.query(f"SELECT COUNT(*) FROM {tname}")[0][0] == 4
    # … but are inert for current reads and exact for time travel
    assert lk.table("t").count() == 96
    assert lk.table("t", at_version=s_pre_rewrite).count() == 96
    assert sorted(r.i for r in lk.table("t").collect())[:3] == [4, 5, 6]
