"""Data-inlining parity with the reference's update/delete interplay.

Mirrors:
- test/sql/data_inlining/data_inlining_update_inline_verification.test
  (small UPDATE on file-backed rows writes NO new file: insert half ->
  inlined data with preserved rowid, delete half -> inlined deletions)
- test/sql/data_inlining/data_inlining_interleaved_update.test
  (INSERT -> UPDATE -> INSERT on inlined data inside one transaction)
- ducklake_delete.cpp:530-546: the inlined-file-deletions threshold is
  data_inlining_row_limit itself, applied PER data file.
"""
from __future__ import annotations

import glob
import os

import pytest


def _files(data_path: str, pat: str = "*") -> list[str]:
    return [
        f for f in glob.glob(f"{data_path}/**/{pat}", recursive=True)
        if os.path.isfile(f)
    ]


def _delete_files(data_path: str) -> list[str]:
    return [f for f in _files(data_path)
            if "delete" in os.path.basename(f)]


@pytest.fixture()
def mklake(spark, tmp_path):
    from ducklake_spark.lake import DuckLake

    def make(name: str, **kw):
        return DuckLake.attach(
            spark, str(tmp_path / f"{name}.db"), str(tmp_path / name), **kw
        )

    return make


def test_update_inline_verification(mklake, spark):
    """data_inlining_update_inline_verification.test: a small update on
    file-backed data creates no new file and preserves the rowid."""
    from ducklake_spark.dml import update

    lk = mklake("u1", data_inlining_row_limit=10)
    lk.create_table("t", [("i", "int64"), ("j", "varchar")])
    lk.insert("t", spark.range(20).selectExpr(
        "id AS i", "concat('val_', id) AS j").coalesce(1))
    assert len(_files(lk.data_path)) == 1

    assert update(lk, "t", {"j": "'updated'"}, "i=5") == 1
    assert len(_files(lk.data_path)) == 1  # no new data or delete file
    assert [(r.i, r.j) for r in lk.table("t", where="i=5").collect()] == \
        [(5, "updated")]
    got = lk.table("t", with_virtual=True).where("i=5").select(
        "rowid", "i", "j").collect()
    assert [(r.rowid, r.i, r.j) for r in got] == [(5, 5, "updated")]

    assert update(lk, "t", {"j": "'changed'"}, "i=10") == 1
    assert len(_files(lk.data_path)) == 1
    rows = sorted((r.i, r.j) for r in lk.table("t").collect())
    assert len(rows) == 20
    assert rows[5] == (5, "updated") and rows[10] == (10, "changed")
    assert rows[11] == (11, "val_11")


def test_delete_inlining_per_file_threshold(mklake, spark):
    """The inline decision is per data file and driven by
    data_inlining_row_limit (no separate deletion option set): 6+6
    deletes across two files both absorb into the catalog even though
    the total exceeds the limit."""
    from ducklake_spark.cdc import table_changes
    from ducklake_spark.dml import delete

    lk = mklake("d1", data_inlining_row_limit=10)
    lk.create_table("t", [("i", "int64")])
    lk.insert("t", spark.range(11, 111).selectExpr("id AS i").coalesce(1))
    lk.insert("t", spark.range(111, 211).selectExpr("id AS i").coalesce(1))
    assert len(_files(lk.data_path)) == 2
    s0 = lk.current_snapshot()

    assert delete(lk, "t", "i % 100 < 6") == 12
    assert len(_files(lk.data_path)) == 2  # no delete parquet appeared
    assert lk.table("t").count() == 188
    ch = table_changes(lk, "t", s0 + 1, lk.current_snapshot())
    assert ch.where("change_type='delete'").count() == 12

    # a per-file overflow still writes a delete file for THAT file only
    assert delete(lk, "t", "i BETWEEN 20 AND 40") == 21
    assert len(_delete_files(lk.data_path)) == 1
    assert lk.table("t").count() == 167


def test_interleaved_insert_update_insert_inlined(mklake, spark):
    """data_inlining_interleaved_update.test: INSERT -> UPDATE -> INSERT
    inside one transaction on committed inlined data; the update keeps
    its rowid, inserts extend sequentially, CDC reports an update."""
    from ducklake_spark.cdc import table_changes
    from ducklake_spark.dml import update

    lk = mklake("i1", data_inlining_row_limit=10)
    lk.create_table("t", [("id", "int32"), ("val", "varchar")])
    lk.insert("t", spark.createDataFrame([(1, "a"), (2, "b")],
                                         "id int, val string"))
    with lk.transaction():
        lk.insert("t", spark.createDataFrame([(3, "c")], "id int, val string"))
        assert update(lk, "t", {"val": "'aa'"}, "id=1") == 1
        lk.insert("t", spark.createDataFrame([(4, "d")], "id int, val string"))
    got = sorted((r.rowid, r.id, r.val) for r in lk.table(
        "t", with_virtual=True).select("rowid", "id", "val").collect())
    assert got == [(0, 1, "aa"), (1, 2, "b"), (2, 3, "c"), (3, 4, "d")]

    snap = lk.current_snapshot()
    ch = sorted((r.rowid, r.change_type, r.id, r.val)
                for r in table_changes(lk, "t", snap, snap).collect())
    assert ch == [
        (0, "update_postimage", 1, "aa"),
        (0, "update_preimage", 1, "a"),
        (2, "insert", 3, "c"),
        (3, "insert", 4, "d"),
    ]

    # UPDATE -> INSERT in one transaction (only preserved ids in the
    # existing data, then a fresh sequential id)
    with lk.transaction():
        assert update(lk, "t", {"val": "'bb'"}, "id=2") == 1
        lk.insert("t", spark.createDataFrame([(5, "e")], "id int, val string"))
    got = sorted((r.rowid, r.id, r.val) for r in lk.table(
        "t", with_virtual=True).select("rowid", "id", "val").collect())
    assert got == [(0, 1, "aa"), (1, 2, "bb"), (2, 3, "c"),
                   (3, 4, "d"), (4, 5, "e")]


def test_update_inline_merges_with_existing_delete_file(mklake, spark):
    """A file carrying a committed delete PARQUET takes further small
    deletes as catalog absorption; the delete file stays live and the
    scan merges both sources."""
    from ducklake_spark.dml import delete

    lk = mklake("m1")  # inlining OFF at attach
    lk.create_table("t", [("i", "int64")])
    lk.insert("t", spark.range(100).selectExpr("id AS i").coalesce(1))
    assert delete(lk, "t", "i < 30") == 30  # big: delete parquet
    dels = _delete_files(lk.data_path)
    assert len(dels) == 1

    lk.set_option("data_inlining_row_limit", "10", table_name="t")
    assert delete(lk, "t", "i BETWEEN 30 AND 34") == 5  # small: inlined
    assert _delete_files(lk.data_path) == dels
    assert lk.table("t").count() == 65
    assert lk.table("t").agg({"i": "min"}).collect()[0][0] == 35


def test_add_column_ids_unique_across_commits(mklake, spark):
    """Consecutive ADD COLUMNs must mint distinct column ids and keep
    snapshot allocators monotone. The old allocator read the counter
    from latest_snapshot() inside the op and bumped a PREVIOUS
    snapshot's row, so two adds in a row collided — and the duplicate
    id made the inlined epoch mapping read the WRONG stored column
    (an in-txn insert before ADD COLUMN l DEFAULT 42 surfaced l as a
    copy of k instead of 42)."""
    from ducklake_spark.dml import update  # noqa: F401 (import parity)

    lk = mklake("ids")
    lk.create_table("t", [("i", "int32")])
    lk.add_column("t", "a", "int32")
    lk.add_column("t", "b", "int32")
    lk.add_column("t", "c", "int32")
    ids = [cid for cid, _ in lk.meta.query(
        "SELECT column_id, column_name FROM ducklake_column "
        "WHERE table_id=1")]
    assert len(ids) == len(set(ids)), f"duplicate column ids: {ids}"
    counters = [c for _, c in lk.meta.query(
        "SELECT snapshot_id, next_catalog_id FROM ducklake_snapshot "
        "ORDER BY snapshot_id")]
    assert counters == sorted(counters), f"non-monotone allocator: {counters}"


def test_insert_then_add_default_same_txn_inlined(mklake, spark):
    """data_inlining_transaction_local_alter.test (commit-visible half):
    a row inserted (inlined) BEFORE an in-txn ADD COLUMN ... DEFAULT
    surfaces the default after commit, not a neighboring column's
    value."""
    lk = mklake("txnalter", data_inlining_row_limit=10)
    lk.create_table("test", [("i", "int32"), ("j", "int32")])
    with lk.transaction():
        lk.insert("test", spark.createDataFrame([(42, 84)],
                                                "i int, j int"))
        lk.add_column("test", "k", "int32")
        # the added column is visible to the txn's own reads
        assert [tuple(r) for r in lk.table("test").collect()] == \
            [(42, 84, None)]
    assert [tuple(r) for r in lk.table("test").collect()] == [(42, 84, None)]
    with lk.transaction():
        lk.insert("test", spark.createDataFrame([(100, 200, 300)],
                                                "i int, j int, k int"))
        lk.add_column("test", "l", "int32", default="42")
        assert sorted(tuple(r) for r in lk.table("test").collect()) == [
            (42, 84, None, 42), (100, 200, 300, 42)]
    assert sorted(tuple(r) for r in lk.table("test").collect()) == [
        (42, 84, None, 42), (100, 200, 300, 42)]
    # ALTER -> INSERT: the insert carries the txn-locally-added column
    with lk.transaction():
        lk.add_column("test", "m", "varchar")
        lk.insert("test", spark.createDataFrame(
            [(500, 600, 700, 800, "hello")],
            "i int, j int, k int, l int, m string"))
    assert sorted(tuple(r) for r in lk.table("test").collect()) == [
        (42, 84, None, 42, None), (100, 200, 300, 42, None),
        (500, 600, 700, 800, "hello")]


def test_txn_local_add_column_file_backed_and_rollback(mklake, spark):
    """In-txn ADD COLUMN DEFAULT over committed parquet rows backfills
    for the txn's own reads; a rollback removes the column again."""
    lk = mklake("txnfile")
    lk.create_table("t", [("a", "int64")])
    lk.insert("t", spark.range(5).selectExpr("id AS a").coalesce(1))
    with lk.transaction():
        lk.add_column("t", "b", "int32", default="7")
        assert sorted(tuple(r) for r in lk.table("t").collect()) == [
            (i, 7) for i in range(5)]
        lk.insert("t", spark.createDataFrame([(10, 11)], "a long, b int"))
    assert sorted(tuple(r) for r in lk.table("t").collect()) == [
        (0, 7), (1, 7), (2, 7), (3, 7), (4, 7), (10, 11)]

    try:
        with lk.transaction():
            lk.add_column("t", "c", "int32")
            assert len(lk.table("t").columns) == 3
            raise RuntimeError("abort")
    except RuntimeError:
        pass
    assert lk.table("t").columns == ["a", "b"]


def test_multi_alter_same_column_transaction(mklake, spark):
    """test/sql/alter/multi_alter_same_column_transaction.test: chained
    ALTERs on one column in one transaction (SET/DROP NOT NULL, SET
    DEFAULT, RENAME; ADD+RENAME+DROP; two ADDs then two RENAMEs)."""
    lk = mklake("malter", data_inlining_row_limit=10)
    lk.create_table("t", [("id", "int32"), ("col1", "int32")])
    lk.insert("t", spark.createDataFrame([(1, 10), (2, 20)],
                                         "id int, col1 int"))
    with lk.transaction():
        lk.set_not_null("t", "col1")
        lk.drop_not_null("t", "col1")
        lk.set_default("t", "col1", "42")
        lk.rename_column("t", "col1", "col1_final")
    lk.insert("t", spark.createDataFrame([(3, None)],
                                         "id int, col1_final int"))
    lk.insert("t", spark.createDataFrame([(4,)], "id int"))
    assert sorted((r.id, r.col1_final) for r in lk.table("t").collect()) == [
        (1, 10), (2, 20), (3, None), (4, 42)]

    lk.create_table("ard", [("id", "int32"), ("val", "varchar")])
    lk.insert("ard", spark.createDataFrame([(1, "a"), (2, "b")],
                                           "id int, val string"))
    with lk.transaction():
        lk.add_column("ard", "tmp_col", "int32")
        lk.rename_column("ard", "tmp_col", "renamed_col")
        lk.drop_column("ard", "renamed_col")
    assert lk.table("ard").columns == ["id", "val"]
    assert sorted(tuple(r) for r in lk.table("ard").collect()) == [
        (1, "a"), (2, "b")]

    lk.create_table("two", [("id", "int32")])
    lk.insert("two", spark.createDataFrame([(1,), (2,), (3,)], "id int"))
    with lk.transaction():
        lk.add_column("two", "col_a", "varchar")
        lk.add_column("two", "col_b", "int32")
        lk.rename_column("two", "col_a", "col_a_renamed")
        lk.rename_column("two", "col_b", "col_b_renamed")
    lk.insert("two", spark.createDataFrame(
        [(4, "hello", 42)], "id int, col_a_renamed string, col_b_renamed int"))
    assert sorted(tuple(r) for r in lk.table("two").collect()) == [
        (1, None, None), (2, None, None), (3, None, None),
        (4, "hello", 42)]


def test_inlined_table_reclamation(mklake, spark):
    """empty_inlined_tables_alter_cleanup.test + inlined_data_table_leak
    .test: expire_snapshots reclaims unreachable inlined history —
    empty superseded epoch tables are dropped, and dropping the lake
    table frees every epoch once no live snapshot can see it."""
    from ducklake_spark.maintenance import (
        cleanup_old_files,
        expire_snapshots,
        flush_inlined_data,
    )

    lk = mklake("reclaim", data_inlining_row_limit=10)
    lk.create_table("t1", [("i", "int32")])
    lk.insert("t1", spark.createDataFrame([(1,), (2,), (3,)], "i int"))
    lk.add_column("t1", "j", "int32")
    lk.insert("t1", spark.createDataFrame([(4, 40)], "i int, j int"))
    lk.add_column("t1", "k", "int32")
    lk.insert("t1", spark.createDataFrame([(5, 50, 500)],
                                          "i int, j int, k int"))
    assert len(lk.meta.query(
        "SELECT 1 FROM ducklake_inlined_data_tables")) == 3

    # flush empties the older epochs; expiring all history lets the
    # empty superseded tables go (the current epoch's stays)
    flush_inlined_data(lk)
    expire_snapshots(lk, older_than="9999-01-01")
    cleanup_old_files(lk, cleanup_all=True)
    regs = lk.meta.query(
        "SELECT table_name, schema_version FROM ducklake_inlined_data_tables "
        "ORDER BY schema_version")
    assert len(regs) <= 1
    assert sorted(tuple(r) for r in lk.table("t1").collect()) == [
        (1, None, None), (2, None, None), (3, None, None),
        (4, 40, None), (5, 50, 500)]
    # inserts keep working (table recreated lazily if dropped)
    lk.insert("t1", spark.createDataFrame([(6, 60, 600)],
                                          "i int, j int, k int"))
    assert lk.table("t1").count() == 6

    # DROP TABLE then expire: every epoch table and the registry go
    lk2 = mklake("leak", data_inlining_row_limit=10)
    lk2.create_table("t1", [("i", "int32")])
    lk2.insert("t1", spark.createDataFrame([(1,), (2,)], "i int"))
    lk2.add_column("t1", "j", "int32")
    lk2.insert("t1", spark.createDataFrame([(4, 40)], "i int, j int"))
    lk2.drop_table("t1")
    expire_snapshots(lk2, older_than="9999-01-01")
    cleanup_old_files(lk2, cleanup_all=True)
    assert lk2.meta.query("SELECT 1 FROM ducklake_inlined_data_tables") == []
    assert lk2.meta.query(
        "SELECT name FROM sqlite_master WHERE name LIKE "
        "'ducklake_inlined_data_1_%'") == []


def test_session_default_inlining_knob(mklake, spark):
    """spark.ducklake.defaultDataInliningRowLimit is the session
    analogue of the reference's GLOBAL
    ducklake_default_data_inlining_row_limit (ducklake_extension.cpp:36):
    it applies when no catalog scope sets the option, and any catalog
    scope (including an explicit 0) overrides it."""
    lk = mklake("knob")
    lk.create_table("t", [("i", "int64")])
    try:
        spark.conf.set("spark.ducklake.defaultDataInliningRowLimit", "10")
        lk.insert("t", spark.createDataFrame([(1,), (2,)], "i long"))
        assert _files(lk.data_path) == []  # inlined via the session knob
        assert lk.table("t").count() == 2
        lk.set_option("data_inlining_row_limit", "0", table_name="t")
        lk.insert("t", spark.createDataFrame([(3,)], "i long"))
        assert len(_files(lk.data_path)) == 1  # catalog scope wins
        assert lk.table("t").count() == 3
    finally:
        spark.conf.unset("spark.ducklake.defaultDataInliningRowLimit")


def test_rename_table_dbt_workload(mklake, spark):
    """test/sql/alter/rename_table_dbt_workload.test: one transaction
    does CREATE tmp AS ...; RENAME old -> backup; RENAME tmp -> old —
    the txn's own reads see the swapped names, and COMMIT makes them
    durable."""
    lk = mklake("dbt")
    lk.create_table_as("my_table", spark.range(42).selectExpr("id AS i"))
    with lk.transaction():
        lk.create_table_as("my_table_tmp",
                           spark.range(84).selectExpr("id AS i"))
        lk.rename_table("my_table", "my_table_backup")
        lk.rename_table("my_table_tmp", "my_table")
        assert lk.table("my_table").count() == 84
        assert lk.table("my_table_backup").count() == 42
        with pytest.raises(Exception):
            lk.table("my_table_tmp")
    assert lk.table("my_table").count() == 84
    assert lk.table("my_table_backup").count() == 42
    with pytest.raises(Exception):
        lk.table("my_table_tmp")


def test_drop_partition_column_guard(mklake, spark):
    """test/sql/partitioning/drop_partition_column.test: DROP of the
    partition key is rejected; RESET PARTITIONED BY unblocks it."""
    lk = mklake("droppart")
    lk.create_table("p", [("part_key", "int32"), ("vals", "varchar")])
    lk.set_partitioned_by("p", [("part_key", "identity")])
    lk.insert("p", spark.range(100).selectExpr(
        "cast(id % 2 as int) part_key", "concat('s_', id) vals"))
    with pytest.raises(Exception, match="partitioned by"):
        lk.drop_column("p", "part_key")
    lk.set_partitioned_by("p", [])
    lk.drop_column("p", "part_key")
    assert lk.table("p").columns == ["vals"]
    assert lk.table("p").count() == 100


def test_partition_rename_in_transaction(mklake, spark):
    """test/sql/partitioning/partition_rename_in_transaction.test:
    CREATE + SET PARTITIONED BY + INSERT + RENAME in one transaction
    leaves a fully populated partition spec on the renamed table."""
    lk = mklake("partrename")
    lk.create_schema("s")
    with lk.transaction():
        lk.create_table("s.t1", [("dt", "date")])
        lk.set_partitioned_by("s.t1", [("dt", "identity")])
        lk.insert("s.t1", spark.sql(
            "SELECT DATE'2026-04-30' dt UNION ALL SELECT DATE'2026-04-29'"))
        lk.rename_table("s.t1", "auto_probe_after")
    assert lk.table("s.auto_probe_after").count() == 2
    rows = lk.meta.query(
        "SELECT t.table_name, c.column_name, pc.partition_key_index, "
        "pc.transform FROM ducklake_table t "
        "JOIN ducklake_column c ON c.table_id = t.table_id "
        "JOIN ducklake_partition_column pc "
        "ON pc.column_id = c.column_id AND pc.table_id = t.table_id "
        "WHERE t.end_snapshot IS NULL")
    assert [tuple(r) for r in rows] == [
        ("auto_probe_after", "dt", 0, "identity")]
    # files carry the new spec's partition_id + values
    pids = lk.meta.query(
        "SELECT DISTINCT partition_id FROM ducklake_data_file "
        "WHERE end_snapshot IS NULL")
    assert len(pids) == 1 and pids[0][0] is not None


def test_add_files_edges(mklake, spark, tmp_path):
    """add_empty_file.test + add_rollback.test: a 0-row foreign parquet
    registers cleanly, and a rolled-back add leaves the source file."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ducklake_spark.add_files import add_data_files

    lk = mklake("addedge")
    lk.create_table("test", [("col1", "int32"), ("col2", "varchar")])
    lk.insert("test", spark.createDataFrame([(100, "hello")],
                                            "col1 int, col2 string"))
    empty = str(tmp_path / "empty_file.parquet")
    pq.write_table(pa.table({"col1": pa.array([], pa.int32()),
                             "col2": pa.array([], pa.string())}), empty)
    add_data_files(lk, "test", empty)
    assert [tuple(r) for r in lk.table("test").collect()] == [(100, "hello")]

    src = str(tmp_path / "file.parquet")
    pq.write_table(pa.table({"col1": pa.array([200], pa.int32()),
                             "col2": pa.array(["world"], pa.string())}), src)
    with pytest.raises(RuntimeError):
        with lk.transaction():
            add_data_files(lk, "test", src)
            raise RuntimeError("force rollback")
    assert os.path.exists(src)
    assert lk.table("test").count() == 1


def test_drop_entry_same_schema_txn_local(mklake, spark):
    """test/sql/catalog/drop_entry_same_schema.test: dropping one
    txn-local table (or view) must not remove its sibling, and the
    txn's own statements see the drop."""
    lk = mklake("dropsame")
    with lk.transaction():
        lk.create_table("t1", [("x", "int32")])
        lk.create_table("t2", [("y", "int32")])
        lk.insert("t1", spark.createDataFrame([(1,)], "x int"))
        lk.insert("t2", spark.createDataFrame([(2,)], "y int"))
        lk.drop_table("t1")
        with pytest.raises(Exception):
            lk.table("t1")
        assert [tuple(r) for r in lk.table("t2").collect()] == [(2,)]
    assert [tuple(r) for r in lk.table("t2").collect()] == [(2,)]

    with lk.transaction():
        lk.create_view("va", "SELECT 10 AS a")
        lk.create_view("vb", "SELECT 20 AS b")
        lk.drop_view("va")
        assert [tuple(r) for r in lk.view("vb").collect()] == [(20,)]
        with pytest.raises(Exception):
            lk.view_sql("va")
    assert [tuple(r) for r in lk.view("vb").collect()] == [(20,)]
    with pytest.raises(Exception):
        lk.view_sql("va")


def test_update_replacement_rows_partitioned(mklake, spark):
    """update_partitioning.test: replacement rows of an UPDATE land
    under their (possibly new) partition directories with partition
    values recorded, so file-level partition pruning covers them."""
    import re

    from ducklake_spark.dml import update

    lk = mklake("updpart")
    lk.create_table("p", [("part_key", "int32"), ("vals", "varchar")])
    lk.set_partitioned_by("p", [("part_key", "identity")])
    lk.insert("p", spark.range(1000).selectExpr(
        "cast(id % 2 as int) part_key", "concat('s_', id) vals"))
    v0 = lk.current_snapshot()
    assert update(lk, "p", {"part_key": "2"}, "part_key = 0") == 500
    parts = sorted({
        m.group(1)
        for (p,) in lk.meta.query(
            "SELECT path FROM ducklake_data_file WHERE end_snapshot IS NULL")
        if (m := re.search(r"(part_key=\d+)", p))
    })
    assert parts == ["part_key=1", "part_key=2"]
    assert lk.table("p", where="part_key = 2").count() == 500
    # partition values recorded for the replacement file
    h = lk._handle("p")
    snap = lk._resolve_snapshot(None, None)
    assert len(lk._visible_files(h, snap, "part_key = 2")) == 1
    assert lk.table("p", at_version=v0, where="part_key = 0").count() == 500


def test_update_not_null_rejected(mklake, spark):
    """test/sql/update/update_not_null.test: UPDATE SET col=NULL on a
    NOT NULL column fails and leaves the table intact and readable
    (previously it committed the NULL and broke every later scan)."""
    from ducklake_spark.dml import update

    lk = mklake("updnn")
    lk.create_table("test", [("i", "int32"), ("j", "int32")],
                    not_null=("i",))
    lk.insert("test", spark.createDataFrame([(42, None)], "i int, j int"))
    with pytest.raises(Exception, match="NOT NULL"):
        update(lk, "test", {"i": "NULL"})
    assert [tuple(r) for r in lk.table("test").collect()] == [(42, None)]

    # inlined rows take a driver-side path — same rejection
    lk2 = mklake("updnn2", data_inlining_row_limit=10)
    lk2.create_table("t", [("i", "int32")], not_null=("i",))
    lk2.insert("t", spark.createDataFrame([(1,)], "i int"))
    with pytest.raises(Exception, match="NOT NULL"):
        update(lk2, "t", {"i": "NULL"})
    assert [tuple(r) for r in lk2.table("t").collect()] == [(1,)]


def test_encrypted_partitioned_paths_leak_nothing(mklake, spark):
    """test/sql/encryption/partitioning_encryption.test: an ENCRYPTED
    lake's partitioned files carry no part_key=... path segment; the
    catalog's partition values still drive pruning."""
    lk = mklake("encpart", encrypted=True)
    lk.create_table("p", [("part_key", "int32"), ("vals", "varchar")])
    lk.set_partitioned_by("p", [("part_key", "identity")])
    lk.insert("p", spark.range(1000).selectExpr(
        "cast(id % 2 as int) part_key", "concat('s_', id) vals"))
    paths = [p for (p,) in lk.meta.query(
        "SELECT path FROM ducklake_data_file")]
    assert paths and all("part_key=" not in p for p in paths)
    assert lk.meta.query(
        "SELECT COUNT(*) FROM ducklake_file_partition_value")[0][0] == 2
    h = lk._handle("p")
    snap = lk._resolve_snapshot(None, None)
    assert len(lk._visible_files(h, snap, "part_key = 0")) == 1
    assert lk.table("p", where="part_key = 0").count() == 500


def test_merge_insert_values_forms(mklake, spark):
    """merge_update_insert.test: MERGE's NOT MATCHED INSERT supports the
    reference's positional VALUES form and an explicit column mapping
    (a source column named differently previously landed as NULL)."""
    from ducklake_spark.dml import merge_into

    lk = mklake("mergeins")
    lk.create_table("stock", [("item_id", "int32"), ("balance", "int32")])
    lk.insert("stock", spark.createDataFrame(
        [(10, 2200), (20, 1900)], "item_id int, balance int"))
    buy = spark.createDataFrame([(10, 1000), (30, 300)],
                                "item_id int, volume int")
    res = merge_into(lk, "stock", buy, ["item_id"],
                     when_matched_update={"balance": "t.balance + s.volume"},
                     when_not_matched_insert=["item_id", "volume"])
    assert res == {"updated": 1, "deleted": 0, "inserted": 1}
    assert sorted(tuple(r) for r in lk.table("stock").collect()) == [
        (10, 3200), (20, 1900), (30, 300)]

    res = merge_into(
        lk, "stock",
        spark.createDataFrame([(40, 77)], "item_id int, volume int"),
        ["item_id"],
        when_not_matched_insert={"item_id": "item_id", "balance": "volume"})
    assert res["inserted"] == 1
    assert (40, 77) in {tuple(r) for r in lk.table("stock").collect()}

    with pytest.raises(Exception, match="expressions"):
        merge_into(lk, "stock",
                   spark.createDataFrame([(50, 1)], "item_id int, volume int"),
                   ["item_id"], when_not_matched_insert=["item_id"])


def test_timestamp_literal_pruning_and_multi_transform(mklake, spark):
    """merge_timestamp.test family: a date-only TIMESTAMP literal must
    not prune the file holding that midnight (the stat serializes with
    a time part), year+month transforms on ONE column emit per-
    transform dirs (year=2025/month=9) and both prune clauses."""
    from ducklake_spark.dml import merge_into, update

    lk = mklake("tslit")
    lk.create_table("ts", [("ts", "timestamp"), ("x", "float64")])
    lk.set_partitioned_by("ts", [("ts", "year"), ("ts", "month")])
    lk.insert("ts", spark.sql(
        "SELECT TIMESTAMP'2025-09-17' ts, CAST(42 AS DOUBLE) x"))
    assert update(lk, "ts", {"x": "44"}, "ts = TIMESTAMP'2025-09-17'") == 1
    assert [r.x for r in lk.table("ts").collect()] == [44.0]
    paths = [p for (p,) in lk.meta.query(
        "SELECT path FROM ducklake_data_file WHERE end_snapshot IS NULL")]
    assert all("year=2025/month=9" in p for p in paths)
    res = merge_into(
        lk, "ts",
        spark.sql("SELECT TIMESTAMP'2025-09-17' ts, CAST(43 AS DOUBLE) x"),
        ["ts"], when_matched_update={"x": None})
    assert res == {"updated": 1, "deleted": 0, "inserted": 0}

    # pruning keeps the matching month and drops others
    lk.insert("ts", spark.sql(
        "SELECT TIMESTAMP'2024-03-02' ts, CAST(1 AS DOUBLE) x"))
    h = lk._handle("ts")
    snap = lk._resolve_snapshot(None, None)
    assert len(lk._visible_files(h, snap, None)) == 2
    assert len(lk._visible_files(
        h, snap, "ts = TIMESTAMP'2025-09-17'")) == 1


def test_target_file_size_human_readable(mklake, spark):
    """insert_file_size.test / test_rewrite_target_file_size_rotation
    .test: target_file_size accepts the reference's memory-limit syntax
    ('100KB', '512MB'), splits big inserts, and the rewrite rotates an
    oversized source into several files with rowids preserved."""
    import glob as g

    from ducklake_spark.dml import delete
    from ducklake_spark.maintenance import rewrite_data_files

    lk = mklake("fsize")
    lk.create_table("t", [("id", "int64"), ("s", "varchar")])
    lk.set_option("target_file_size", "100KB")
    lk.insert("t", spark.range(200000).selectExpr(
        "id", "concat('thisisalongstring', id) s").coalesce(1))
    assert len(g.glob(f"{lk.data_path}/main/t/*.parquet")) > 1

    lk2 = mklake("fsize2")
    lk2.create_table("t", [("id", "int64"), ("payload", "varchar")])
    lk2.set_option("parquet_compression", "uncompressed")
    # the reference test also pins parquet_row_group_size 2000 — with
    # the 122880-row default duckdb's writer never flushes mid-file on
    # 18000 rows, so NO rotation happens (verified against duckdb COPY)
    lk2.set_option("parquet_row_group_size", "2000")
    lk2.insert("t", spark.range(20000).selectExpr(
        "id", "repeat(md5(cast(id as string)), 4) payload").coalesce(1))
    delete(lk2, "t", "id % 10 = 0")
    lk2.set_option("target_file_size", "64KB")
    assert rewrite_data_files(lk2, delete_threshold=0) == 1
    live = lk2.meta.query(
        "SELECT COUNT(*) FROM ducklake_data_file WHERE end_snapshot IS NULL"
    )[0][0]
    assert live == 5  # reference-exact rotation count
    assert lk2.table("t").selectExpr("sum(id)").collect()[0][0] == 180000000
    assert lk2.table("t", with_virtual=True).selectExpr(
        "sum(rowid)").collect()[0][0] == 180000000


def test_parse_memory_limit_units(spark):
    from ducklake_spark.lake import parse_memory_limit

    assert parse_memory_limit("512MB") == 512 * 1000**2
    assert parse_memory_limit("64KiB") == 64 * 1024
    assert parse_memory_limit("1.5GB") == int(1.5 * 1000**3)
    assert parse_memory_limit("123456") == 123456
    assert parse_memory_limit(None) == 0
    import pytest as _p
    with _p.raises(Exception):
        parse_memory_limit("twelve")


def test_row_count_fold_on_gross_record_count(mklake, spark):
    """Interop: a reference-written catalog keeps record_count GROSS
    (ducklake_scan.cpp:217 nets delete counts independently); our fold
    must not trust the raw number once delete artifacts exist."""
    from ducklake_spark.dml import delete

    lk = mklake("grossrc")
    lk.create_table_as("t", spark.range(100).selectExpr(
        "cast(id as int) id").coalesce(1))
    delete(lk, "t", "id < 30")
    # simulate the reference's convention: bump record_count back to
    # the gross value a reference writer would have left
    lk.meta.con.execute(
        "UPDATE ducklake_table_stats SET record_count = 100")
    assert lk.row_count("t") == 70  # nets per-file, ignores the gross
    assert lk.table("t").count() == 70


def test_buffered_inlined_dml_in_transaction(mklake, spark):
    """transaction/transaction_insert_update_delete.test: BEGIN;
    INSERT (inlined buffer); UPDATE; DELETE — the transaction's own
    buffered inlined rows must answer to its later DML."""
    lk = mklake("bufdml", data_inlining_row_limit=10)
    lk.create_table("t1", [("c1", "int32")])
    with lk.transaction():
        lk.insert("t1", spark.createDataFrame([(1,), (2,)], "c1 int"))
        assert lk.update("t1", {"c1": "3"}, "c1 = 1") == 1
        assert lk.delete("t1", "c1 = 2") == 1
        assert [tuple(r) for r in lk.table("t1").collect()] == [(3,)]
    assert [tuple(r) for r in lk.table("t1").collect()] == [(3,)]
