"""SQL frontend (ducklake_spark/sqlfront.py): the reference's SQL-first
surface over the Spark engine.

These tests pin the statement grammar -> API dispatch itself; the
reference's own sqllogictest files run through tools/slt_runner.py on
top of this layer.
"""

from __future__ import annotations

import pytest

import conftest


@pytest.fixture()
def sess(spark, tmp_path):
    from ducklake_spark.sqlfront import SQLSession

    s = SQLSession(spark)
    url = conftest.catalog_url(tmp_path)
    scheme = ("duckdb:" + url[len("duckdb://"):] if url.startswith("duckdb://")
              else url)
    s.execute(
        f"ATTACH 'ducklake:{scheme}' AS dl (DATA_PATH '{tmp_path}/files')")
    s.execute("USE dl")
    yield s
    for name in list(s.lakes):
        try:
            s.lakes.pop(name).meta.close()
        except Exception:
            pass


def rows(df):
    return [tuple(r) for r in df.collect()]


def test_create_insert_select_roundtrip(sess):
    sess.execute("CREATE TABLE dl.t(i INTEGER, j VARCHAR)")
    n = sess.execute("INSERT INTO dl.t VALUES (1, 'a'), (2, 'b'), (NULL, 'c')")
    assert rows(n) == [(3,)]
    assert rows(sess.execute(
        "SELECT i, j FROM dl.t ORDER BY j")) == [(1, "a"), (2, "b"), (None, "c")]
    # bare name via USE
    assert rows(sess.execute("SELECT COUNT(*) FROM t")) == [(3,)]
    # FROM-first syntax
    assert len(rows(sess.execute("FROM t"))) == 3


def test_insert_column_list_and_defaults(sess):
    sess.execute("CREATE TABLE t2(a INTEGER, b VARCHAR DEFAULT 'dflt', "
                 "c INTEGER DEFAULT 7)")
    sess.execute("INSERT INTO t2 (a) VALUES (1)")
    sess.execute("INSERT INTO t2 BY NAME SELECT 2 AS c, 9 AS a")
    out = rows(sess.execute("SELECT a, b, c FROM t2 ORDER BY a"))
    assert out == [(1, "dflt", 7), (9, "dflt", 2)]


def test_delete_update_counts(sess):
    # DuckDB names range()'s output column `range`; the frontend keeps
    # those semantics on Spark (whose TVF column is `id`)
    sess.execute("CREATE TABLE d AS SELECT range AS i FROM range(100)")
    assert rows(sess.execute("DELETE FROM d WHERE i % 2 = 0")) == [(50,)]
    assert rows(sess.execute("UPDATE d SET i = i + 1000 WHERE i < 10")) \
        == [(5,)]
    assert rows(sess.execute("SELECT COUNT(*) FROM d WHERE i >= 1000")) \
        == [(5,)]
    assert rows(sess.execute("TRUNCATE d")) == [(50,)]
    assert rows(sess.execute("SELECT COUNT(*) FROM d")) == [(0,)]


def test_ctas_and_or_replace(sess):
    sess.execute("CREATE TABLE c AS SELECT 1 AS x")
    sess.execute("CREATE OR REPLACE TABLE c AS SELECT 2 AS x, 'y' AS y")
    assert rows(sess.execute("SELECT * FROM c")) == [(2, "y")]
    sess.execute("CREATE TABLE IF NOT EXISTS c(i INTEGER)")  # no-op
    assert rows(sess.execute("SELECT * FROM c")) == [(2, "y")]


def test_alter_family(sess):
    sess.execute("CREATE TABLE a(i INTEGER)")
    sess.execute("INSERT INTO a VALUES (1)")
    sess.execute("ALTER TABLE a ADD COLUMN j VARCHAR DEFAULT 'x'")
    sess.execute("ALTER TABLE a RENAME COLUMN j TO k")
    sess.execute("ALTER TABLE a ALTER COLUMN i SET DATA TYPE BIGINT")
    assert rows(sess.execute("SELECT i, k FROM a")) == [(1, "x")]
    sess.execute("ALTER TABLE a DROP COLUMN k")
    sess.execute("ALTER TABLE a RENAME TO b")
    assert rows(sess.execute("SELECT * FROM dl.b")) == [(1,)]
    with pytest.raises(Exception):
        sess.execute("SELECT * FROM dl.a")


def test_transactions(sess):
    sess.execute("CREATE TABLE tx(i INTEGER)")
    sess.execute("BEGIN")
    sess.execute("INSERT INTO tx VALUES (1)")
    assert rows(sess.execute("SELECT COUNT(*) FROM tx")) == [(1,)]
    sess.execute("ROLLBACK")
    assert rows(sess.execute("SELECT COUNT(*) FROM tx")) == [(0,)]
    sess.execute("BEGIN TRANSACTION")
    sess.execute("INSERT INTO tx VALUES (2)")
    sess.execute("COMMIT")
    assert rows(sess.execute("SELECT i FROM tx")) == [(2,)]


def test_time_travel_and_snapshots(sess):
    sess.execute("CREATE TABLE tt(i INTEGER)")
    sess.execute("INSERT INTO tt VALUES (1)")
    v = sess.lakes["dl"].current_snapshot()
    sess.execute("INSERT INTO tt VALUES (2)")
    assert rows(sess.execute(
        f"SELECT COUNT(*) FROM tt AT (VERSION => {v})")) == [(1,)]
    snaps = rows(sess.execute("SELECT COUNT(*) FROM dl.snapshots()"))
    assert snaps[0][0] >= 3
    got = rows(sess.execute(
        "SELECT snapshot_id FROM ducklake_snapshots('dl') "
        "ORDER BY snapshot_id LIMIT 1"))
    assert got == [(0,)]


def test_views_and_comments(sess):
    sess.execute("CREATE TABLE vt(i INTEGER)")
    sess.execute("INSERT INTO vt VALUES (3)")
    sess.execute("CREATE VIEW v1 AS SELECT i * 2 AS d FROM dl.vt")
    assert rows(sess.execute("SELECT d FROM dl.v1")) == [(6,)]
    sess.execute("CREATE OR REPLACE VIEW v1(dd) AS SELECT i * 3 FROM dl.vt")
    assert rows(sess.execute("SELECT dd FROM dl.v1")) == [(9,)]
    sess.execute("COMMENT ON TABLE vt IS 'my table'")
    sess.execute("COMMENT ON COLUMN vt.i IS 'my col'")
    sess.execute("COMMENT ON VIEW v1 IS 'my view'")
    from ducklake_spark import macros as M

    lake = sess.lakes["dl"]
    assert M.get_comment(lake, "vt") == "my table"
    assert M.get_comment(lake, "vt", column="i") == "my col"
    sess.execute("ALTER VIEW v1 RENAME TO v2")
    assert rows(sess.execute("SELECT dd FROM dl.v2")) == [(9,)]
    sess.execute("DROP VIEW v2")


def test_schemas_and_qualified_names(sess):
    sess.execute("CREATE SCHEMA dl.s1")
    sess.execute("CREATE TABLE dl.s1.t(i INTEGER)")
    sess.execute("INSERT INTO dl.s1.t VALUES (5)")
    assert rows(sess.execute("SELECT i FROM dl.s1.t")) == [(5,)]
    sess.execute("USE dl.s1")
    assert rows(sess.execute("SELECT i FROM t")) == [(5,)]
    sess.execute("USE dl")
    sess.execute("DROP SCHEMA dl.s1 CASCADE")


def test_call_maintenance(sess):
    sess.execute("CREATE TABLE m(i INTEGER)")
    for k in range(3):
        sess.execute(f"INSERT INTO m VALUES ({k})")
    # single-row inserts inline under the reference's session default
    # (10); flush first so compaction has files to merge
    sess.execute("CALL ducklake_flush_inlined_data('dl')")
    sess.execute("CALL dl.merge_adjacent_files()")
    assert rows(sess.execute("SELECT COUNT(*) FROM m")) == [(3,)]
    files = rows(sess.execute("SELECT COUNT(*) FROM dl.list_files('m')"))
    assert files == [(1,)]
    sess.execute("CALL dl.set_option('parquet_compression', 'zstd')")
    sess.execute("DELETE FROM m WHERE i = 0")
    sess.execute("CALL ducklake_expire_snapshots('dl', versions => [1])")
    sess.execute("CALL ducklake_cleanup_old_files('dl', cleanup_all => true)")


def test_constraint_rejected_like_reference(sess):
    from ducklake_spark.lake import DuckLakeError

    with pytest.raises(DuckLakeError):
        sess.execute("CREATE TABLE pk(i INTEGER PRIMARY KEY)")
    with pytest.raises(DuckLakeError):
        sess.execute("CREATE TABLE ck(i INTEGER CHECK (i > 0))")
    sess.execute("CREATE TABLE nn(i INTEGER NOT NULL)")
    with pytest.raises(Exception):
        sess.execute("INSERT INTO nn VALUES (NULL)")


def test_unsupported_is_distinguishable(sess):
    from ducklake_spark.sqlfront import SQLFrontUnsupported

    with pytest.raises(SQLFrontUnsupported):
        sess.execute("EXPORT DATABASE 'x'")


def test_macros_via_sql(sess):
    sess.execute("CREATE MACRO dl.add2(a, b) AS a + b")
    from ducklake_spark import macros as M

    # stored body is the reference's deparsed text: (a + b)
    assert M.call_macro(sess.lakes["dl"], "add2", 1, 2) == "(1 + 2)"
    sess.execute("DROP MACRO dl.add2")


def test_detach_reattach_persistence(spark, tmp_path):
    from ducklake_spark.sqlfront import SQLSession

    s = SQLSession(spark)
    s.execute(f"ATTACH 'ducklake:{tmp_path}/m.db' AS one "
              f"(DATA_PATH '{tmp_path}/files')")
    s.execute("CREATE TABLE one.t AS SELECT 42 AS x")
    s.execute("DETACH one")
    # no DATA_PATH on re-attach: catalog records it
    s.execute(f"ATTACH 'ducklake:{tmp_path}/m.db' AS two")
    assert rows(s.execute("SELECT x FROM two.t")) == [(42,)]
    s.lakes["two"].meta.close()


def test_scalar_snapshot_after_select_list_comma(sess):
    """ADVICE r6: SELECT a, ducklake_current_snapshot() must stay a
    scalar — the FROM-position relation rewrite's ',' alternative must
    not capture a select-list comma."""
    sess.execute("CREATE TABLE dl.sx(a INTEGER)")
    sess.execute("INSERT INTO dl.sx VALUES (7)")
    out = rows(sess.execute(
        "SELECT a, ducklake_current_snapshot('dl') AS s FROM sx"))
    assert len(out) == 1 and out[0][0] == 7 and out[0][1] >= 1
    # FROM-position probe still becomes a one-row relation
    out = rows(sess.execute("FROM ducklake_current_snapshot('dl')"))
    assert len(out) == 1 and out[0][0] >= 1


def test_tvf_call_after_identifier_prefix(sess):
    """ADVICE r6: an identifier that merely PREFIXES a TVF name earlier
    in the statement must not stop the later genuine call from
    rewriting (first-occurrence scan in _sub_balanced_calls)."""
    sess.execute("CREATE TABLE dl.ducklake_snapshots_v2(i INTEGER)")
    sess.execute("INSERT INTO dl.ducklake_snapshots_v2 VALUES (1)")
    out = rows(sess.execute(
        "SELECT (SELECT COUNT(*) FROM dl.ducklake_snapshots_v2) AS a, "
        "(SELECT COUNT(*) FROM ducklake_snapshots('dl')) AS b"))
    assert len(out) == 1 and out[0][0] == 1 and out[0][1] >= 1


def test_attach_or_replace_unaliased_uses_path_alias(spark, tmp_path):
    """ATTACH OR REPLACE without AS must replace the existing
    attachment keyed by its path-derived alias (never the literal '')
    — round-9 advisor finding."""
    from ducklake_spark.sqlfront import SQLSession

    s = SQLSession(spark)
    s.execute(f"ATTACH 'ducklake:{tmp_path}/meta.db' "
              f"(DATA_PATH '{tmp_path}/files')")
    assert "meta" in s.lakes
    s.execute("USE meta")
    s.execute("CREATE TABLE meta.t(i INTEGER)")
    # re-attach over the same alias: must not raise "already attached"
    s.execute(f"ATTACH OR REPLACE 'ducklake:{tmp_path}/meta.db' "
              f"(DATA_PATH '{tmp_path}/files')")
    assert list(s.lakes) == ["meta"]
    assert [tuple(r) for r in
            s.query("SELECT COUNT(*) AS n FROM meta.t").collect()] == [(0,)]
    for name in list(s.lakes):
        s.lakes.pop(name).meta.close()


def test_joined_update_large_key_set_distributed(sess, spark):
    """A target-only joined UPDATE whose source has more distinct keys
    than the literal-predicate cap must route through the distributed
    merge join (it used to raise 'unsupported' above 100k keys and
    build a Catalyst-hostile OR chain below it)."""
    sess.execute("CREATE TABLE dl.big(k INTEGER, v INTEGER)")
    spark.range(15_000).selectExpr(
        "cast(id as int) k", "cast(0 as int) v"
    ).createOrReplaceTempView("big_src_all")
    sess.lakes["dl"].insert(
        "big", spark.table("big_src_all").repartition(4))
    # 12k distinct source keys > the 10k literal cap
    spark.range(12_000).selectExpr(
        "cast(id as int) k").createOrReplaceTempView("big_keys")
    n = sess.execute(
        "UPDATE dl.big SET v = 1 FROM big_keys WHERE big.k = big_keys.k")
    assert [tuple(r) for r in n.collect()] == [(12_000,)]
    got = sess.execute(
        "SELECT SUM(v) AS s, COUNT(*) AS c FROM dl.big").collect()
    assert [tuple(r) for r in got] == [(12_000, 15_000)]
