"""Round-6 reference-test mining: deletion_inlining/ and table_changes/
sequences replayed against the lake (visible semantics — counts, values,
per-row CDC attribution, delete-file consolidation).

Mirrors:
- test/sql/deletion_inlining/test_deletion_inlining.test
- test/sql/deletion_inlining/test_deletion_inlining_alter.test
- test/sql/deletion_inlining/test_deletion_inlining_stats.test
- test/sql/deletion_inlining/test_deletion_from_inlined_insertion.test
- test/sql/deletion_inlining/test_deletion_inlining_partitions.test
- test/sql/table_changes/window_partition_row_loss.test
- test/sql/table_changes/ducklake_table_deletions_projection_order.test
- test/sql/table_changes/ducklake_table_deletions_filter_unprojected.test
- test/sql/table_changes/ducklake_lower_timestamp.test
- test/sql/table_changes/ducklake_table_deletions_compacted.test
"""

from __future__ import annotations

import datetime

import pytest

import conftest


@pytest.fixture()
def mklake(spark, tmp_path):
    from ducklake_spark.lake import DuckLake

    n = [0]

    def make(**kw):
        n[0] += 1
        return DuckLake.attach(
            spark, conftest.catalog_url(tmp_path / str(n[0])),
            str(tmp_path / str(n[0]) / "data"), **kw)

    return make


def test_deletion_inlining_sequence(mklake, spark):
    """test_deletion_inlining.test: inline → flush → reinline → flush →
    mixed-storage delete, end-to-end value check."""
    from ducklake_spark import maintenance as maint

    lake = mklake(data_inlining_row_limit=10)
    lake.create_table("t", [("a", "int64")])
    lake.insert("t", spark.range(0, 50).coalesce(1).selectExpr("id as a"))
    lake.delete("t", "a < 5")
    assert lake.table("t").count() == 45
    lake.delete("t", "a < 9")
    assert lake.table("t").count() == 41
    lake.delete("t", "a = 15")
    assert lake.table("t").count() == 40
    maint.flush_inlined_data(lake)
    assert lake.table("t").count() == 40
    lake.delete("t", "a < 15")
    lake.delete("t", "a > 45")
    assert lake.table("t").count() == 30
    maint.flush_inlined_data(lake)
    assert lake.table("t").count() == 30
    lake.insert("t", spark.createDataFrame(
        [(x,) for x in range(51, 56)], "a long"))       # inlined
    lake.insert("t", spark.createDataFrame(
        [(x,) for x in range(56, 71)], "a long").coalesce(1))  # file
    assert lake.table("t").count() == 50
    # one statement deleting from flushed file, inlined rows, and new file
    lake.delete("t", "a = 40 or a = 53 or a > 65")
    assert lake.table("t").count() == 43
    maint.flush_inlined_data(lake)
    want = sorted(set(range(16, 40)) | set(range(41, 46))
                  | {51, 52, 54, 55} | set(range(56, 66)))
    assert sorted(r.a for r in lake.table("t").collect()) == want


def test_deletion_inlining_alter_interplay(mklake, spark):
    """test_deletion_inlining_alter.test: inlined deletions survive
    ADD/DROP COLUMN and type widening, before and after flush."""
    from ducklake_spark import maintenance as maint

    lake = mklake(data_inlining_row_limit=10)
    lake.create_table("t", [("i", "int64"), ("j", "int32")])
    lake.insert("t", spark.range(0, 50).coalesce(1)
                .selectExpr("id as i", "CAST(id*2 AS INT) as j"))
    lake.delete("t", "i < 5")
    row = lake.table("t").selectExpr("COUNT(*) c", "SUM(j) s").collect()[0]
    assert (row.c, row.s) == (45, 2430)
    lake.add_column("t", "k", "int32")
    lake.insert("t", spark.createDataFrame(
        [(100, 200, 300)], "i long, j int, k int"))
    row = lake.table("t").selectExpr("COUNT(*) c", "SUM(k) s").collect()[0]
    assert (row.c, row.s) == (46, 300)
    lake.delete("t", "i = 100")  # deletes an inlined row post-ALTER
    row = lake.table("t").selectExpr("COUNT(*) c", "SUM(k) s").collect()[0]
    assert (row.c, row.s) == (45, None)
    maint.flush_inlined_data(lake)
    row = lake.table("t").selectExpr("COUNT(*) c", "SUM(j) s").collect()[0]
    assert (row.c, row.s) == (45, 2430)
    lake.drop_column("t", "k")
    lake.delete("t", "i >= 45")
    assert lake.table("t").count() == 40
    lake.change_column_type("t", "j", "int64")
    lake.insert("t", spark.createDataFrame(
        [(1000, 2000000000000)], "i long, j long"))
    assert lake.table("t").count() == 41
    lake.delete("t", "i = 1000")
    assert lake.table("t").count() == 40
    maint.flush_inlined_data(lake)
    assert lake.table("t").count() == 40


def test_flush_merges_delete_file_per_data_file(mklake, spark):
    """test_deletion_inlining_stats.test: a second flush against the same
    data file replaces the live delete file with one consolidated file
    (delete_count 5 → 10), never accumulating per-flush delete files."""
    from ducklake_spark import maintenance as maint

    lake = mklake(data_inlining_row_limit=10)
    lake.create_table("t", [("a", "int64")])
    lake.insert("t", spark.range(0, 50).coalesce(1).selectExpr("id as a"))
    lake.delete("t", "a < 5")
    maint.flush_inlined_data(lake)
    live = lake.meta.query(
        "SELECT delete_count FROM ducklake_delete_file WHERE end_snapshot IS NULL")
    assert [r[0] for r in live] == [5]
    lake.delete("t", "a >= 45")
    maint.flush_inlined_data(lake)
    live = lake.meta.query(
        "SELECT delete_count FROM ducklake_delete_file WHERE end_snapshot IS NULL")
    assert [r[0] for r in live] == [10]
    assert lake.table("t").count() == 40


def test_delete_from_inlined_insertion_cdc(mklake, spark):
    """test_deletion_from_inlined_insertion.test: deleting rows that only
    ever existed inlined, CDC shows them, flush preserves the result."""
    from ducklake_spark import maintenance as maint

    lake = mklake(data_inlining_row_limit=10)
    lake.create_table("t", [("a", "int64")])
    lake.insert("t", spark.createDataFrame([(1,), (2,), (3,)], "a long"))
    lake.insert("t", spark.createDataFrame([(4,), (5,)], "a long"))
    lake.delete("t", "a = 2 or a = 5")
    assert sorted(r.a for r in lake.table("t").collect()) == [1, 3, 4]
    maint.flush_inlined_data(lake)
    assert sorted(r.a for r in lake.table("t").collect()) == [1, 3, 4]
    end = lake.current_snapshot()
    dels = sorted(r.a for r in lake.table_deletions("t", 0, end).collect())
    assert dels == [2, 5]


def test_inlined_deletes_partitioned_table(mklake, spark):
    """test_deletion_inlining_partitions.test: inlined deletions across
    identity partitions, then flushed."""
    from ducklake_spark import maintenance as maint

    lake = mklake(data_inlining_row_limit=10)
    lake.create_table("p", [("k", "int64"), ("v", "int64")])
    lake.set_partitioned_by("p", [("k", "identity")])
    lake.insert("p", spark.range(0, 40).selectExpr("id % 4 as k", "id as v"))
    lake.delete("p", "v < 4")  # one inlined deletion in each of 4 partitions
    assert lake.table("p").count() == 36
    lake.delete("p", "k = 2 and v < 20")
    assert lake.table("p").count() == 32
    maint.flush_inlined_data(lake)
    assert lake.table("p").count() == 32
    assert sorted(r.v for r in lake.table("p").where("k = 2").collect()) == \
        [22, 26, 30, 34, 38]


def test_changes_counts_stable_after_flush(mklake, spark):
    """window_partition_row_loss.test: insertions(0,end)=3 and
    changes(0,end)=4 after an UPDATE, identical before and after flush."""
    from ducklake_spark import maintenance as maint

    lake = mklake()
    lake.create_table("t", [("id", "int64"), ("val", "int64")])
    lake.insert("t", spark.createDataFrame(
        [(1, 100), (2, 200)], "id long, val long"))
    lake.update("t", {"val": "150"}, "id = 1")
    end = lake.current_snapshot()
    assert lake.table_insertions("t", 0, end).count() == 3
    assert lake.table_changes("t", 0, end).count() == 4
    maint.flush_inlined_data(lake, table="t")
    assert lake.table_insertions("t", 0, end).count() == 3
    assert lake.table_changes("t", 0, end).count() == 4


def test_deletions_per_row_snapshot_on_accumulated_file(mklake, spark):
    """ducklake_table_deletions_projection_order.test: when a second
    DELETE replaces the first delete file, each deleted row still reports
    the snapshot that deleted IT, not the merged file's begin snapshot."""
    lake = mklake(data_inlining_row_limit=0)
    lake.create_table("d", [("k", "int64"), ("v", "int64")])
    lake.insert("d", spark.createDataFrame(
        [(1, 100), (2, 200), (3, 300)], "k long, v long").coalesce(1))
    lake.delete("d", "k = 1")
    s_a = lake.current_snapshot()
    lake.delete("d", "k = 2")
    s_b = lake.current_snapshot()
    df = lake.table_deletions("d", s_a, s_b)
    rid = ("_ducklake_internal_row_id"
           if "_ducklake_internal_row_id" in df.columns else "rowid")
    rows = sorted((r[rid], r["snapshot_id"], r["k"]) for r in df.collect())
    assert rows == [(0, s_a, 1), (1, s_b, 2)]
    # single-snapshot windows see exactly their own rows
    assert [r["k"] for r in lake.table_deletions("d", s_a, s_a).collect()] == [1]
    assert [r["k"] for r in lake.table_deletions("d", s_b, s_b).collect()] == [2]


def test_deletions_multi_file_row_id_start(mklake, spark):
    """ducklake_table_deletions_filter_unprojected.test (multi-file part):
    per-file row_id_start applied; filtering on a column later projected
    away leaves rowid/snapshot attribution intact."""
    lake = mklake(data_inlining_row_limit=0)
    lake.create_table("m", [("k", "int64"), ("v", "int64")])
    lake.insert("m", spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "k long, v long").coalesce(1))
    lake.insert("m", spark.createDataFrame(
        [(4, 40), (5, 50), (6, 60)], "k long, v long").coalesce(1))
    lake.delete("m", "k = 2")
    s_c = lake.current_snapshot()
    lake.delete("m", "k = 5")
    s_d = lake.current_snapshot()
    df = lake.table_deletions("m", 1, s_d)
    rid = ("_ducklake_internal_row_id"
           if "_ducklake_internal_row_id" in df.columns else "rowid")
    rows = sorted((r[rid], r["snapshot_id"], r["k"])
                  for r in df.where("v > 0").select(rid, "snapshot_id", "k")
                  .collect())
    assert rows == [(1, s_c, 2), (4, s_d, 5)]
    assert df.where("v > 1000").count() == 0


def test_table_changes_timestamp_bounds(mklake, spark):
    """ducklake_lower_timestamp.test (issue #330): timestamp bounds from
    before the first snapshot through now() see every change."""
    lake = mklake()
    lake.create_table("repro", [("foo", "int64"), ("bar", "varchar")])
    for i in (1, 2, 3):
        lake.insert("repro", spark.createDataFrame(
            [(i, str(i))], "foo long, bar string"))
    end = lake.current_snapshot()
    assert lake.table_changes("repro", 0, end).count() == 3
    assert lake.table_changes(
        "repro", datetime.datetime(1970, 1, 1),
        datetime.datetime.now() + datetime.timedelta(days=1)).count() == 3


def test_deletions_over_compacted_file(mklake, spark):
    """ducklake_table_deletions_compacted.test: multiple DELETEs against a
    merged (compacted) file report correct counts and per-snapshot
    attribution."""
    from ducklake_spark import maintenance as maint

    lake = mklake()
    lake.create_table("test", [("i", "int64")])
    for base in (0, 100, 200):
        lake.insert("test", spark.range(base, base + 100).coalesce(1)
                    .selectExpr("id as i"))
    maint.merge_adjacent_files(lake, table="test")
    assert lake.table("test").count() == 300
    lake.delete("test", "i < 120")
    s1 = lake.current_snapshot()
    assert lake.table("test").count() == 180
    lake.delete("test", "i < 250")
    s2 = lake.current_snapshot()
    assert lake.table("test").count() == 50
    assert lake.table_deletions("test", s1, s1).count() == 120
    assert lake.table_deletions("test", s2, s2).count() == 130
    per = {r["snapshot_id"]: r["n"]
           for r in lake.table_deletions("test", s1, s2)
           .groupBy("snapshot_id").count().withColumnRenamed("count", "n")
           .collect()}
    assert per == {s1: 120, s2: 130}


def test_insert_into_self_explicit_txn(mklake, spark):
    """insert/insert_into_self.test: inside one explicit transaction the
    table reads back its own txn-local rows, doubling per self-insert;
    a self-cross-join insert squares the count. One snapshot commits."""
    from pyspark.sql import functions as F  # noqa: F401

    lake = mklake()
    lake.create_table("test", [("i", "int32"), ("j", "varchar")])
    lake.begin()
    lake.insert("test", spark.createDataFrame(
        [(1, "2"), (None, "3")], "i int, j string"))
    for expect in (4, 8, 16):
        lake.insert("test", lake.table("test"))
        assert lake.table("test").count() == expect
    a = lake.table("test").alias("a")
    b = lake.table("test").selectExpr("i AS bi").alias("b")
    lake.insert("test", a.crossJoin(b).select("a.i", "a.j"))
    assert lake.table("test").count() == 272
    snap_before = lake.meta.latest_snapshot().snapshot_id
    lake.commit()
    row = lake.table("test").selectExpr(
        "SUM(i) s", "SUM(LENGTH(j)) l", "COUNT(*) c").collect()[0]
    assert (row.s, row.l, row.c) == (136, 272, 272)
    # the whole explicit transaction published exactly one snapshot
    assert lake.meta.latest_snapshot().snapshot_id == snap_before + 1


def test_insert_column_subset_and_defaults(mklake, spark):
    """insert/insert_column_list.test: DataFrames carrying a column
    subset (any order) fill the missing columns with NULL, or with the
    declared DEFAULT when one exists."""
    lake = mklake()
    lake.create_table("t2", [("i", "int32"), ("j", "varchar")])
    lake.insert("t2", spark.createDataFrame([("hello", 84)], "j string, i int"))
    assert [tuple(r) for r in lake.table("t2").select("i", "j").collect()] == \
        [(84, "hello")]
    lake.insert("t2", spark.createDataFrame([("world",)], "j string"))
    lake.insert("t2", spark.createDataFrame([(100,)], "i int"))
    got = sorted([tuple(r) for r in lake.table("t2").select("i", "j").collect()],
                 key=lambda r: (r[0] is None, r[0] if r[0] is not None else 0))
    assert got == [(84, "hello"), (100, None), (None, "world")]
    lake.create_table("t3", [("i", "int32"), ("j", "varchar")])
    lake.set_default("t3", "j", "'dflt'")
    lake.insert("t3", spark.createDataFrame([(1,)], "i int"))
    assert [tuple(r) for r in lake.table("t3").select("i", "j").collect()] == \
        [(1, "dflt")]


def test_rewrite_rollback_cleans_written_files(mklake, spark):
    """rewrite_data_files/test_rewrite_rollback_cleanup.test: a rewrite
    inside an explicit transaction joins it; ROLLBACK removes the files
    the rewrite wrote and leaves the table untouched; a fresh rewrite
    afterwards commits cleanly."""
    import glob

    from ducklake_spark import maintenance as maint

    lake = mklake(data_inlining_row_limit=0)
    lake.create_table("t", [("id", "int64"), ("payload", "varchar")])
    lake.insert("t", spark.range(0, 2000).coalesce(1)
                .selectExpr("id", "md5(CAST(id AS STRING)) AS payload"))
    lake.delete("t", "id % 10 = 0")
    n0 = len(glob.glob(lake.data_path + "/**/*.parquet", recursive=True))
    lake.begin()
    maint.rewrite_data_files(lake, delete_threshold=0.0, table="t")
    lake.rollback()
    assert len(glob.glob(lake.data_path + "/**/*.parquet", recursive=True)) == n0
    assert lake.table("t").count() == 1800
    assert maint.rewrite_data_files(lake, delete_threshold=0.0, table="t") == 1
    assert lake.table("t").count() == 1800


def test_rewrite_consumes_inlined_deletes(mklake, spark):
    """rewrite_data_files/test_rewrite_inlined_file_deletes.test: a file
    whose only deletes are catalog-inlined is still a rewrite victim;
    the rewrite drops the dead rows and closes the inlined positions."""
    from ducklake_spark import maintenance as maint

    lake = mklake(data_inlining_row_limit=10)
    lake.create_table("t", [("a", "int64")])
    lake.insert("t", spark.range(0, 50).coalesce(1).selectExpr("id AS a"))
    lake.delete("t", "a = 25")  # inlined: no delete file on disk
    assert lake.meta.query(
        "SELECT COUNT(*) FROM ducklake_delete_file WHERE end_snapshot IS NULL"
    )[0][0] == 0
    assert maint.rewrite_data_files(lake, delete_threshold=0.0, table="t") == 1
    assert sorted(r.a for r in lake.table("t").collect()) == \
        [x for x in range(50) if x != 25]
    # one live data file, still no delete file; the consumed inlined
    # delete rows carry no end-mark in the reference-exact 3-column
    # layout (ducklake_metadata_manager.cpp:3055-3057) — they go inert
    # because their owning data file is end-stamped by the rewrite
    # (ducklake_transaction.cpp:774 family), so no inlined delete may
    # reference a LIVE data file
    assert lake.meta.query(
        "SELECT COUNT(*) FROM ducklake_data_file WHERE end_snapshot IS NULL"
    )[0][0] == 1
    h = lake._handle("t")
    assert lake.meta.query(
        f"SELECT COUNT(*) FROM ducklake_inlined_delete_{h.table_id} d "
        "JOIN ducklake_data_file f ON f.data_file_id = d.file_id "
        "WHERE f.end_snapshot IS NULL")[0][0] == 0


def test_table_info_counts(mklake, spark):
    """functions/ducklake_table_info.test: per-table file/delete-file
    counts and sizes."""
    from ducklake_spark import table_functions as tf

    lake = mklake(data_inlining_row_limit=0)
    lake.create_table("test", [("i", "int64")])
    lake.insert("test", spark.range(0, 1000).coalesce(1).selectExpr("id as i"))
    lake.delete("test", "i % 2 = 0")
    r = [x for x in tf.table_info(lake).collect() if x.table_name == "test"][0]
    assert (r.file_count, r.file_size_bytes > 0,
            r.delete_file_count, r.delete_file_size_bytes > 0) == \
        (1, True, 1, True)


def test_current_snapshot_stable_inside_txn(mklake, spark):
    """snapshot_info/ducklake_current_commit.test +
    ducklake_last_commit.test: the committed snapshot id is unchanged by
    an open transaction's writes, advances on commit, survives rollback."""
    lake = mklake()
    lake.create_table("integer", [("i", "int64")])
    s1 = lake.current_snapshot()
    lake.begin()
    lake.insert("integer", spark.createDataFrame([(0,)], "i long"))
    assert lake.current_snapshot() == s1
    lake.commit()
    assert lake.current_snapshot() == s1 + 1
    lake.begin()
    lake.insert("integer", spark.createDataFrame([(1,)], "i long"))
    lake.rollback()
    assert lake.current_snapshot() == s1 + 1


def test_txn_local_rowids(mklake, spark):
    """rowid/ducklake_row_id.test: uncommitted rows expose rowids from
    10^18 in insertion order (filterable); commit reassigns real ids
    continuing the table's sequence."""
    lake = mklake(data_inlining_row_limit=0)
    lake.create_table("test", [("i", "int64")])
    assert lake.table("test", with_virtual=True).select("rowid").count() == 0
    lake.begin()
    lake.insert("test", spark.createDataFrame(
        [(i,) for i in range(3)], "i long").coalesce(1))
    lake.insert("test", spark.createDataFrame(
        [(5,), (6,)], "i long").coalesce(1))
    local = sorted(r[0] for r in lake.table("test", with_virtual=True)
                   .select("rowid").collect())
    assert local == [10**18 + k for k in range(5)]
    assert lake.table("test", with_virtual=True).where(
        f"rowid = {10**18 + 1}").count() == 1
    lake.commit()
    lake.insert("test", spark.createDataFrame(
        [(i,) for i in range(10, 15)], "i long").coalesce(1))
    got = [(r[0], r[1]) for r in lake.table("test", with_virtual=True)
           .select("rowid", "i").orderBy("rowid").collect()]
    assert got == [(0, 0), (1, 1), (2, 2), (3, 5), (4, 6),
                   (5, 10), (6, 11), (7, 12), (8, 13), (9, 14)]
    assert [(r[0], r[1]) for r in lake.table("test", with_virtual=True)
            .select("rowid", "i").where("rowid = 3").collect()] == [(3, 5)]


def test_txn_local_rewrite_keeps_embedded_rowids(mklake, spark):
    """A rewrite buffered in an open transaction serves the ORIGINAL
    embedded rowids (not synthetic 10^18 ones) to txn-local readers."""
    from ducklake_spark import maintenance as maint

    lake = mklake(data_inlining_row_limit=0)
    lake.create_table("t", [("a", "int64")])
    lake.insert("t", spark.range(0, 10).coalesce(1).selectExpr("id as a"))
    lake.delete("t", "a >= 8")
    lake.begin()
    maint.rewrite_data_files(lake, delete_threshold=0.0, table="t")
    got = sorted((r[0], r[1]) for r in lake.table("t", with_virtual=True)
                 .select("rowid", "a").collect())
    assert got == [(k, k) for k in range(8)]
    lake.rollback()
    assert lake.table("t").count() == 8


def test_merge_update_preserves_rowids_partitioned(mklake, spark):
    """rowid/ducklake_row_id_update.test: MERGE matched-UPDATE keeps the
    victims' rowids on a partitioned table."""
    from ducklake_spark import dml

    lake = mklake(data_inlining_row_limit=0)
    lake.create_table("test", [("i", "int64"), ("j", "int64")])
    lake.set_partitioned_by("test", [("i", "identity")])
    lake.insert("test", spark.createDataFrame(
        [(1, 5), (2, 5)], "i long, j long").coalesce(1))
    dml.merge_into(lake, "test", spark.createDataFrame(
        [(1, 5)], "i long, j long"), ["j"],
        when_matched_update={"i": None, "j": None},
        when_not_matched_insert=False)
    got = sorted((r[0], r[1], r[2]) for r in lake.table("test", with_virtual=True)
                 .select("rowid", "i", "j").collect())
    assert got == [(0, 1, 5), (1, 1, 5)]


def test_list_files_data_and_delete(mklake, spark):
    """list_files/ducklake_list_files.test: one row per live data file,
    delete file attached where one exists."""
    from ducklake_spark import maintenance as maint
    from ducklake_spark import table_functions as tf

    lake = mklake(data_inlining_row_limit=1000)
    lake.create_table("test", [("i", "int64")])
    for base in (0, 100, 200):
        lake.insert("test", spark.range(base, base + 100).selectExpr("id as i"))
        maint.flush_inlined_data(lake)
    assert tf.list_files(lake, "test").count() == 3
    lake.set_option("data_inlining_row_limit", "0")
    lake.delete("test", "i < 50")
    rows = tf.list_files(lake, "test").collect()
    assert sum(1 for r in rows if r.delete_file is not None) == 1


def test_rewrite_max_compacted_files(mklake, spark):
    """rewrite_data_files/test_rewrite_max_files.test: per-table victim
    cap; 0/negative/non-int rejected."""
    from ducklake_spark import maintenance as maint
    from ducklake_spark.lake import DuckLakeError

    lake = mklake(data_inlining_row_limit=0)
    lake.create_table("e", [("k", "int64")])
    for base in (0, 10, 20):
        lake.insert("e", spark.range(base, base + 10).coalesce(1)
                    .selectExpr("id as k"))
    # the reference test pins '1B' so every victim is its own pack
    # ("each delete file is processed individually"); the cap counts
    # PACKS, and a 512MB pack of 6 victims under max=2 still merges
    # into one output ("example 6 1")
    lake.set_option("target_file_size", "1B")
    lake.delete("e", "k % 10 = 2")
    assert maint.rewrite_data_files(
        lake, delete_threshold=0.0, table="e", max_compacted_files=1) == 1
    assert maint.rewrite_data_files(
        lake, delete_threshold=0.0, table="e", max_compacted_files=2) == 2
    assert lake.table("e").count() == 27
    # (None is the Python default for "no cap" — the SQL-surface NULL
    # error has no analogue in a keyword-argument API)
    for bad in (0, -1):
        with pytest.raises(DuckLakeError):
            maint.rewrite_data_files(lake, max_compacted_files=bad)


def test_rewrite_target_file_size_rotation(mklake, spark):
    """rewrite_data_files/test_rewrite_target_file_size_rotation.test: a
    rewrite splits its output at the scoped target_file_size, keeping
    rowid order across the rotated files. The reference test sets
    parquet_row_group_size 2000 + parquet_compression uncompressed and
    pins EXACTLY 5 output files (its writer flushes row groups on
    delete-thinned ~1843-row chunk multiples: 3686-row groups, one
    rotation per flush past 64KB)."""
    from ducklake_spark import maintenance as maint

    lake = mklake(data_inlining_row_limit=0)
    lake.create_table("t", [("id", "int64"), ("payload", "varchar")])
    lake.set_option("parquet_compression", "uncompressed")
    lake.set_option("parquet_row_group_size", "2000")
    lake.insert("t", spark.range(0, 20000).coalesce(1)
                .selectExpr("id", "repeat(md5(CAST(id AS STRING)), 4) AS payload"))
    lake.delete("t", "id % 10 = 0")
    lake.set_option("target_file_size", "64KB")
    assert maint.rewrite_data_files(lake, delete_threshold=0.0, table="t") == 1
    live = lake.meta.query(
        "SELECT COUNT(*) FROM ducklake_data_file WHERE end_snapshot IS NULL"
    )[0][0]
    assert live == 5  # reference-exact rotation count
    assert lake.table("t").count() == 18000
    # rowids survive the rotation intact
    rows = lake.table("t", with_virtual=True).select("rowid", "id").collect()
    assert sorted(r[0] for r in rows) == sorted(
        i for i in range(20000) if i % 10 != 0)


def test_rewrite_over_puffin_deletion_vectors(mklake, spark):
    """rewrite_data_files/rewrite_deletion_vectors.test: a file deleted
    through puffin DVs is rewritten (DV consumed, rowids preserved)."""
    from ducklake_spark import maintenance as maint

    lake = mklake(data_inlining_row_limit=0)
    lake.meta.set_option("write_deletion_vectors", "true")
    lake.create_table("test", [("i", "int64")])
    lake.insert("test", spark.range(0, 100).coalesce(1).selectExpr("id as i"))
    lake.delete("test", "i < 10")
    assert [r[0] for r in lake.meta.query(
        "SELECT DISTINCT format FROM ducklake_delete_file "
        "WHERE end_snapshot IS NULL")] == ["puffin"]
    assert maint.rewrite_data_files(
        lake, delete_threshold=0.05, table="test") == 1
    assert sorted(r.i for r in lake.table("test").collect()) == \
        list(range(10, 100))
    assert lake.meta.query(
        "SELECT COUNT(*) FROM ducklake_delete_file WHERE end_snapshot IS NULL"
    )[0][0] == 0
    rows = sorted((r[0], r[1]) for r in lake.table("test", with_virtual=True)
                  .select("rowid", "i").collect())
    assert rows == [(k, k) for k in range(10, 100)]


def test_rewrite_insert_delete_loop(mklake, spark):
    """rewrite_data_files/insert_delete_loop.test: repeated
    insert → delete → rewrite cycles stay correct; a below-threshold
    delete fraction leaves the file alone."""
    from ducklake_spark import maintenance as maint

    lake = mklake(data_inlining_row_limit=0)
    lake.create_table("t", [("i", "int64")])
    for k in range(3):
        lake.insert("t", spark.range(k * 100, (k + 1) * 100).coalesce(1)
                    .selectExpr("id as i"))
        lake.delete("t", f"i % 2 = 0 AND i >= {k * 100}")
        maint.rewrite_data_files(lake, delete_threshold=0.3)
    assert sorted(r.i for r in lake.table("t").collect()) == \
        [i for i in range(300) if i % 2 == 1]
    assert lake.meta.query(
        "SELECT COUNT(*) FROM ducklake_delete_file WHERE end_snapshot IS NULL"
    )[0][0] == 0
    lake.delete("t", "i = 1")
    assert maint.rewrite_data_files(lake, delete_threshold=0.5) == 0
    assert lake.table("t").count() == 149


def test_delete_mixed_formats(mklake, spark):
    """delete/delete_mixed_formats.test: consecutive deletes under
    alternating write_deletion_vectors settings consolidate across
    formats (puffin → parquet → puffin), and CDC still attributes each
    row to its own delete snapshot."""
    lake = mklake(data_inlining_row_limit=0)
    lake.create_table("mix", [("id", "int64")])
    lake.insert("mix", spark.range(0, 100).coalesce(1).selectExpr("id"))
    lake.meta.set_option("write_deletion_vectors", "true")
    lake.delete("mix", "id < 10")
    q = ("SELECT format, delete_count FROM ducklake_delete_file "
         "WHERE end_snapshot IS NULL")
    assert [(r[0], r[1]) for r in lake.meta.query(q)] == [("puffin", 10)]
    lake.meta.set_option("write_deletion_vectors", "false")
    lake.delete("mix", "id >= 10 AND id < 20")
    assert [(r[0], r[1]) for r in lake.meta.query(q)] == [("parquet", 20)]
    lake.meta.set_option("write_deletion_vectors", "true")
    lake.delete("mix", "id >= 20 AND id < 30")
    assert [(r[0], r[1]) for r in lake.meta.query(q)] == [("puffin", 30)]
    assert sorted(r.id for r in lake.table("mix").collect()) == \
        list(range(30, 100))
    per = {}
    for r in lake.table_deletions("mix", 0, lake.current_snapshot()).collect():
        per[r["snapshot_id"]] = per.get(r["snapshot_id"], 0) + 1
    assert sorted(per.values()) == [10, 10, 10]


def test_delete_same_transaction_ctas(mklake, spark):
    """delete/delete_same_transaction.test: CTAS then two DELETEs inside
    ONE explicit transaction — each statement sees the previous one's
    txn-local effects; one consolidated delete artifact after commit."""
    lake = mklake()
    lake.begin()
    lake.create_table_as("test", spark.range(0, 1000).coalesce(1)
                         .selectExpr("id"))
    assert lake.delete("test", "id % 2 = 0") == 500
    assert lake.table("test").where("id <= 250").count() == 125
    assert lake.delete("test", "id <= 250") == 125
    assert lake.table("test").where("id <= 250").count() == 0
    row = lake.table("test").selectExpr(
        "COUNT(*) c", "COUNT(CASE WHEN id % 2 = 0 THEN 1 END) e").collect()[0]
    assert (row.c, row.e) == (375, 0)
    lake.commit()
    row = lake.table("test").selectExpr(
        "COUNT(*) c", "COUNT(CASE WHEN id % 2 = 0 THEN 1 END) e").collect()[0]
    assert (row.c, row.e) == (375, 0)


def test_concurrent_create_no_false_id_conflict(mklake, spark):
    """concurrent/concurrent_catalog_id_false_conflict.test: two handles
    CTAS different tables inside concurrent explicit transactions; both
    commit (no catalog-id false conflict), and a drop in between lands."""
    from ducklake_spark.lake import DuckLake

    lake = mklake()
    lake.create_table_as("seed", spark.createDataFrame([(1,)], "x long"))
    con2 = DuckLake.attach(lake.spark, lake.metadata_path, lake.data_path)
    lake.begin()
    lake.table("seed").count()
    con2.begin()
    con2.table("seed").count()
    lake.create_table_as("tmp_a", spark.createDataFrame([(1,)], "x long"))
    con2.create_table_as("tmp_b", spark.createDataFrame([(2,)], "x long"))
    lake.commit()
    lake.drop_table("tmp_a")
    con2.commit()  # must not raise
    assert lake.table("tmp_b").count() == 1
    names = {n.split(".")[-1] for n in lake._table_names()}
    assert {"seed", "tmp_b"} <= names and "tmp_a" not in names


def test_concurrent_deletes_different_files_commit(mklake, spark):
    """concurrent/file_level_conflict.test: concurrent deletes touching
    DIFFERENT data files both commit (file-granular conflicts)."""
    from ducklake_spark.lake import DuckLake

    lake = mklake(data_inlining_row_limit=0)
    lake.create_table("tbl", [("key", "int64")])
    lake.insert("tbl", spark.range(0, 100).coalesce(1).selectExpr("id as key"))
    lake.insert("tbl", spark.range(100, 200).coalesce(1).selectExpr("id as key"))
    con2 = DuckLake.attach(lake.spark, lake.metadata_path, lake.data_path,
                           data_inlining_row_limit=0)
    lake.begin()
    con2.begin()
    lake.delete("tbl", "key = 5")     # file 1
    con2.delete("tbl", "key = 150")   # file 2
    lake.commit()
    con2.commit()  # must not raise
    assert lake.table("tbl").count() == 198


def test_expire_snapshots_across_renames_keeps_files(mklake, spark):
    """alter/expire_snapshot_bug.test: expiring snapshots from before a
    table rename (and then cleaning up) must not delete the renamed
    table's still-live files."""
    from ducklake_spark import maintenance as maint

    lake = mklake()
    lake.create_table("a", [("i", "int64")])
    lake.insert("a", spark.createDataFrame([(0,)], "i long"))
    maint.flush_inlined_data(lake)
    lake.rename_table("a", "b")
    s_rename_b = lake.current_snapshot()
    lake.insert("b", spark.createDataFrame([(1,)], "i long"))
    maint.flush_inlined_data(lake)
    before = [sid for (sid,) in lake.meta.query(
        "SELECT snapshot_id FROM ducklake_snapshot WHERE snapshot_id < ?",
        (s_rename_b,))]
    maint.expire_snapshots(lake, versions=before)
    assert sorted(r.i for r in lake.table("b").collect()) == [0, 1]
    maint.expire_snapshots(lake, versions=[s_rename_b])
    lake.rename_table("b", "c")
    s_rename_c = lake.current_snapshot()
    before_c = [sid for (sid,) in lake.meta.query(
        "SELECT snapshot_id FROM ducklake_snapshot WHERE snapshot_id < ?",
        (s_rename_c,))]
    maint.expire_snapshots(lake, versions=before_c)
    maint.cleanup_old_files(lake, older_than="2100-01-01")
    assert sorted(r.i for r in lake.table("c").collect()) == [0, 1]


def test_multi_alter_same_column_one_transaction(mklake, spark):
    """alter/multi_alter_same_column_transaction.test:17-41: SET NOT
    NULL -> DROP NOT NULL -> SET DEFAULT -> RENAME on the same column
    inside one transaction (the reference sets NOT NULL first — DROP
    NOT NULL on a column without the constraint errors, see
    constraints/not_null.test:41-45); chained renames of a freshly
    added column in one transaction."""
    lake = mklake()
    lake.create_table("t", [("id", "int64"), ("col1", "int64")])
    lake.insert("t", spark.createDataFrame(
        [(1, 10), (2, 20)], "id long, col1 long"))
    lake.begin()
    lake.set_not_null("t", "col1")
    lake.drop_not_null("t", "col1")
    lake.set_default("t", "col1", "42")
    lake.rename_column("t", "col1", "col1_final")
    lake.commit()
    lake.insert("t", spark.createDataFrame(
        [(3, None)], "id long, col1_final long"))
    lake.insert("t", spark.createDataFrame([(4,)], "id long"))
    got = sorted((r[0], r[1]) for r in lake.table("t")
                 .selectExpr("id", "col1_final").collect())
    assert got == [(1, 10), (2, 20), (3, None), (4, 42)]
    lake.create_table("e", [("x", "int64")])
    lake.begin()
    lake.add_column("e", "rename_column_1", "varchar")
    lake.rename_column("e", "rename_column_1", "rename_column_2")
    lake.rename_column("e", "rename_column_2", "rename_column_3")
    lake.commit()
    assert "rename_column_3" in lake.table("e").columns


def test_inlined_interleaved_insert_update_insert(mklake, spark):
    """data_inlining/data_inlining_interleaved_update.test: UPDATE then
    INSERT on inlined rows inside one transaction — updated rows keep
    their rowids, inserts continue the sequence, CDC shows pre/post
    images and inserts at the same snapshot."""
    lake = mklake(data_inlining_row_limit=10)
    lake.create_table("test", [("id", "int64"), ("val", "varchar")])
    lake.insert("test", spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, val string"))
    lake.begin()
    lake.update("test", {"val": "'aa'"}, "id = 1")
    lake.insert("test", spark.createDataFrame(
        [(3, "c"), (4, "d")], "id long, val string"))
    assert sorted((r[0], r[1]) for r in lake.table("test").collect()) == \
        [(1, "aa"), (2, "b"), (3, "c"), (4, "d")]
    lake.commit()
    rows = sorted((r[0], r[1], r[2]) for r in lake.table("test", with_virtual=True)
                  .selectExpr("rowid", "id", "val").collect())
    assert rows == [(0, 1, "aa"), (1, 2, "b"), (2, 3, "c"), (3, 4, "d")]
    snap = lake.current_snapshot()
    ch = sorted((r["change_type"], r["id"], r["val"])
                for r in lake.table_changes("test", snap, snap).collect())
    assert ch == [("insert", 3, "c"), ("insert", 4, "d"),
                  ("update_postimage", 1, "aa"), ("update_preimage", 1, "a")]


def test_inlined_sequential_updates_flush(mklake, spark):
    """data_inlining/data_inlining_flush_sequential_updates.test: ten
    sequential UPDATEs on inlined rows survive the flush."""
    from ducklake_spark import maintenance as maint

    lake = mklake(data_inlining_row_limit=100)
    lake.create_table("t", [("i", "int64"), ("val", "int64")])
    lake.insert("t", spark.range(0, 20).selectExpr(
        "id as i", "CAST(0 AS LONG) as val"))
    for _ in range(10):
        lake.update("t", {"val": "val + 1"}, "TRUE")
    assert set(r.val for r in lake.table("t").collect()) == {10}
    maint.flush_inlined_data(lake)
    assert set(r.val for r in lake.table("t").collect()) == {10}
    assert lake.table("t").count() == 20


def test_txn_delete_on_file_with_existing_delete_file(mklake, spark):
    """data_inlining/data_inlining_txn_delete_visibility.test: a DELETE
    inside an open transaction on a file that already has a COMMITTED
    delete file is invisible to subsequent txn reads."""
    lake = mklake(data_inlining_row_limit=0)
    lake.create_table("test", [("id", "int64"), ("val", "int64")])
    lake.insert("test", spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "id long, val long").coalesce(1))
    lake.delete("test", "id = 1")
    assert sorted(r.id for r in lake.table("test").collect()) == [2, 3]
    lake.begin()
    lake.delete("test", "id = 2")
    assert sorted(r.id for r in lake.table("test").collect()) == [3]
    lake.commit()
    assert sorted(r.id for r in lake.table("test").collect()) == [3]


def test_json_type_round_trip_reattach(mklake, spark):
    """types/json.test: JSON column type survives write, read, and a
    fresh attach (catalog keeps the declared type)."""
    from ducklake_spark.lake import DuckLake

    lake = mklake()
    lake.create_table("test", [("l", "json")])
    assert lake.table("test").count() == 0
    lake.insert("test", spark.createDataFrame(
        [('{"key": "value"}',)], "l string"))
    fresh = DuckLake.attach(lake.spark, lake.metadata_path, lake.data_path)
    assert [r.l for r in fresh.table("test").collect()] == ['{"key": "value"}']
    assert [r[0] for r in fresh.meta.query(
        "SELECT column_type FROM ducklake_column WHERE end_snapshot IS NULL"
    )] == ["json"]


def test_nul_bytes_in_varchar(mklake, spark):
    """types/null_byte.test: NUL bytes survive write/read and string
    predicates (including the zone-map stats path)."""
    lake = mklake(data_inlining_row_limit=0)
    lake.create_table("tbl", [("s", "varchar")])
    lake.insert("tbl", spark.createDataFrame(
        [("goo\x00se",), ("hello",)], "s string"))
    assert sorted(r.s for r in lake.table("tbl").collect()) == \
        ["goo\x00se", "hello"]
    assert [r.s for r in lake.table("tbl", where="s < 'hello'").collect()] == \
        ["goo\x00se"]


def test_nested_types_inline_and_flush(mklake, spark):
    """types/list.test + map.test + struct.test: list/map/struct round
    trips through the inlined store and the flushed parquet path, with a
    dotted struct predicate."""
    from ducklake_spark import maintenance as maint

    lake = mklake(data_inlining_row_limit=10)
    lake.create_table("lst", [("l", "list<int64>")])
    lake.insert("lst", spark.createDataFrame(
        [([1, 2, 3],), ([],), (None,)], "l array<long>"))
    want = sorted((x is None, x) for x in [[1, 2, 3], [], None])
    assert sorted((x is None, x) for x in
                  (r.l for r in lake.table("lst").collect())) == want
    maint.flush_inlined_data(lake)
    assert sorted((x is None, x) for x in
                  (r.l for r in lake.table("lst").collect())) == want
    lake.create_table("mp", [("m", "map<varchar,int64>")])
    lake.insert("mp", spark.createDataFrame(
        [({"a": 1, "b": 2},)], "m map<string,long>"))
    maint.flush_inlined_data(lake)
    assert [dict(r.m) for r in lake.table("mp").collect()] == [{"a": 1, "b": 2}]
    lake.create_table("st", [("s", "struct<a:int64,b:varchar>")])
    lake.insert("st", spark.createDataFrame(
        [((7, "x"),)], "s struct<a:long,b:string>"))
    maint.flush_inlined_data(lake)
    assert [(r.s.a, r.s.b) for r in lake.table("st").collect()] == [(7, "x")]
    assert lake.table("st").where("s.a = 7").count() == 1


def test_compaction_merges_adopted_files(mklake, spark):
    """add_files/add_files_compaction.test: manually added (adopted)
    files compact together with native files into one output, rowids
    preserved; a second call is a no-op."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ducklake_spark import maintenance as maint
    from ducklake_spark.add_files import add_data_files

    lake = mklake()
    lake.create_table("test", [("i", "int64")])
    lake.insert("test", spark.createDataFrame([(1,)], "i long"))
    maint.flush_inlined_data(lake)
    import tempfile

    d = tempfile.mkdtemp(prefix="afc_")
    for i in range(2, 6):
        pq.write_table(pa.table({"i": pa.array([i], pa.int64())}),
                       f"{d}/my_file{i}.parquet")
        add_data_files(lake, "test", f"{d}/my_file{i}.parquet")
    rows = sorted((r[0], r[1]) for r in lake.table("test", with_virtual=True)
                  .selectExpr("rowid", "i").collect())
    assert rows == [(k, k + 1) for k in range(5)]
    assert maint.merge_adjacent_files(lake, table="test") == 1
    live = lake.meta.query(
        "SELECT COUNT(*) FROM ducklake_data_file WHERE end_snapshot IS NULL "
        "AND table_id = (SELECT table_id FROM ducklake_table "
        "WHERE table_name='test' AND end_snapshot IS NULL)")[0][0]
    assert live == 1
    rows = sorted((r[0], r[1]) for r in lake.table("test", with_virtual=True)
                  .selectExpr("rowid", "i").collect())
    assert rows == [(k, k + 1) for k in range(5)]
    assert maint.merge_adjacent_files(lake, table="test") == 0


def test_readopt_removed_file_via_list_files(mklake, spark):
    """add_files/add_removed_files.test: list_files returns directly
    readable paths; a dropped table's flushed file (which embeds the
    internal rowid column) re-adopts with ignore_extra_columns."""
    from ducklake_spark import maintenance as maint
    from ducklake_spark import table_functions as tf
    from ducklake_spark.add_files import add_data_files

    lake = mklake()
    lake.create_table("test", [("col1", "int64"), ("col2", "varchar")])
    lake.insert("test", spark.createDataFrame(
        [(100, "hello")], "col1 long, col2 string"))
    maint.flush_inlined_data(lake)
    files = [r.data_file for r in tf.list_files(lake, "test").collect()]
    assert len(files) == 1 and files[0].startswith("/")
    lake.drop_table("test")
    lake.create_table("test", [("col1", "int64"), ("col2", "varchar")])
    add_data_files(lake, "test", files[0], ignore_extra_columns=True)
    assert [(r[0], r[1]) for r in lake.table("test").collect()] == \
        [(100, "hello")]


def test_set_sorted_by_txn_visibility_and_rollback(mklake, spark):
    """sorted_table/set_sorted_by_rollback_basic.test +
    insert_sorted_transaction.test: SET SORTED BY inside an open
    transaction is visible to the transaction's own operations and
    vanishes on rollback."""
    lake = mklake()
    lake.create_table("t", [("a", "int64"), ("b", "int64")])
    lake.begin()
    lake.set_sorted_by("t", [("a", "desc")])
    assert lake._sort_spec(lake._handle("t"))
    lake.rollback()
    assert not lake._sort_spec(lake._handle("t"))
    lake.set_sorted_by("t", [("a", "asc")])
    assert lake._sort_spec(lake._handle("t"))


def test_sort_spec_follows_rename_with_default(mklake, spark):
    """sorted_table/set_default_preserves_sort_key.test: SET DEFAULT
    then RENAME of the sort column in one transaction; the spec follows
    the rename and later inserts still sort."""
    lake = mklake(data_inlining_row_limit=0)
    lake.create_table("t", [("k", "int64"), ("v", "int64")])
    lake.set_sorted_by("t", [("k", "asc")])
    lake.insert("t", spark.createDataFrame([(3, 30), (1, 10)], "k long, v long"))
    lake.begin()
    lake.set_default("t", "k", "7")
    lake.rename_column("t", "k", "k2")
    lake.commit()
    lake.insert("t", spark.createDataFrame([(2, 20)], "k2 long, v long"))
    assert [r.k2 for r in lake.table("t").orderBy("k2").collect()] == [1, 2, 3]
    spec = lake._sort_spec(lake._handle("t"))
    assert any("k2" in str(s[0]) for s in spec)


def test_reset_sorted_by_and_case_insensitive_key(mklake, spark):
    """sorted_table/merge_adjacent_sorted_reset.test +
    merge_adjacent_sorted_case_insensitivity.test: RESET clears the
    spec without touching data; a sort key differing only in case from
    the column still sorts merges."""
    from ducklake_spark import maintenance as maint

    lake = mklake(data_inlining_row_limit=0)
    lake.create_table("t", [("a", "int64")])
    lake.set_sorted_by("t", [("a", "asc")])
    lake.insert("t", spark.createDataFrame([(5,), (3,), (9,)], "a long").coalesce(1))
    lake.reset_sorted_by("t")
    assert not lake._sort_spec(lake._handle("t"))
    lake.insert("t", spark.createDataFrame([(8,), (2,)], "a long").coalesce(1))
    maint.merge_adjacent_files(lake, table="t")
    assert sorted(r.a for r in lake.table("t").collect()) == [2, 3, 5, 8, 9]
    lake.create_table("c", [("colA", "int64")])
    lake.set_sorted_by("c", [("COLA", "asc")])
    lake.insert("c", spark.createDataFrame([(2,), (1,)], "colA long").coalesce(1))
    lake.insert("c", spark.createDataFrame([(4,), (3,)], "colA long").coalesce(1))
    maint.merge_adjacent_files(lake, table="c")
    assert sorted(r.colA for r in lake.table("c").collect()) == [1, 2, 3, 4]
