"""Audit trail + metadata-catalog regressions.

Mirrors the last unmined reference tests:
- test/sql/audit/test_base_audit.test — author/commit_message/
  commit_extra_info over snapshots(), NULL vs empty handling, rollback
  hygiene, require_commit_message, last-set-wins.
- test/sql/metadata/appender_data_files.test /
  appender_partition_values.test — the catalog rows a write must leave
  behind: data-file counts, per-column min/max/value_count/null_count
  stats, per-file partition values, and the pruning they drive.
- test/sql/metadata/hide_metadata_catalog.test — the metadata catalog
  stays invisible to the query surface (lake.sql sees only user
  tables); access is explicit via lake.meta.
"""

from __future__ import annotations

import pytest

import conftest


@pytest.fixture()
def lake(spark, tmp_path):
    from ducklake_spark.lake import DuckLake

    return DuckLake.attach(
        spark, conftest.catalog_url(tmp_path), str(tmp_path / "data")
    )


def _snap_row(lake, sid):
    from ducklake_spark.table_functions import snapshots

    row = snapshots(lake).filter(f"snapshot_id = {sid}").collect()
    assert len(row) == 1
    r = row[0]
    return (r.author, r.commit_message, r.commit_extra_info)


def test_audit_trail(lake, spark):
    lake.create_table("t", [("a", "int32"), ("b", "varchar")])
    # plain autocommit: no commit info
    lake.insert("t", spark.createDataFrame([(0, "oogie")], "a int, b string"))
    assert _snap_row(lake, lake.current_snapshot()) == (None, None, None)

    # author + message inside a txn
    with lake.transaction():
        lake.insert("t", spark.createDataFrame([(1, "pedro")], "a int, b string"))
        lake.set_commit_message("Pedro", "Inserting myself")
    assert _snap_row(lake, lake.current_snapshot()) == (
        "Pedro", "Inserting myself", None)

    # empty message is stored as empty, not NULL
    with lake.transaction():
        lake.insert("t", spark.createDataFrame([(2, "Thijs")], "a int, b string"))
        lake.set_commit_message("Pedro", "")
    assert _snap_row(lake, lake.current_snapshot()) == ("Pedro", "", None)

    # author may be NULL with a message
    with lake.transaction():
        lake.insert("t", spark.createDataFrame([(3, "Mark")], "a int, b string"))
        lake.set_commit_message(None, "Adding Mark")
    assert _snap_row(lake, lake.current_snapshot()) == (None, "Adding Mark", None)

    # last-set-wins inside one txn
    with lake.transaction():
        lake.insert("t", spark.createDataFrame([(9, "Teddy")], "a int, b string"))
        lake.set_commit_message("Pedro", "bla")
        lake.set_commit_message("Mark", "Inserting Teddy")
    assert _snap_row(lake, lake.current_snapshot()) == (
        "Mark", "Inserting Teddy", None)

    # extra_info round-trips; empty extra_info stays empty
    with lake.transaction():
        lake.insert("t", spark.createDataFrame([(10, "Ollie")], "a int, b string"))
        lake.set_commit_message("Pedro", "Inserting Ollie",
                                extra_info="{'barks':7, 'cuteness':10}")
    assert _snap_row(lake, lake.current_snapshot()) == (
        "Pedro", "Inserting Ollie", "{'barks':7, 'cuteness':10}")
    with lake.transaction():
        lake.insert("t", spark.createDataFrame([(11, "JB")], "a int, b string"))
        lake.set_commit_message("Pedro", "greatest", extra_info="")
    assert _snap_row(lake, lake.current_snapshot()) == ("Pedro", "greatest", "")


def test_audit_rollback_does_not_leak_note(lake, spark):
    lake.create_table("t", [("a", "int32")])
    try:
        with lake.transaction():
            lake.insert("t", spark.createDataFrame([(6,)], "a int"))
            lake.set_commit_message("Pedro", "Adding Hannes")
            raise RuntimeError("abort")
    except RuntimeError:
        pass
    lake.insert("t", spark.createDataFrame([(6,)], "a int"))
    assert _snap_row(lake, lake.current_snapshot()) == (None, None, None)


def test_require_commit_message_toggle(lake, spark):
    lake.create_table("t", [("a", "int32")])
    lake.set_option("require_commit_message", "true")
    with pytest.raises(Exception, match="require_commit_message|Commit"):
        lake.insert("t", spark.createDataFrame([(7,)], "a int"))
    with lake.transaction():
        lake.insert("t", spark.createDataFrame([(7,)], "a int"))
        lake.set_commit_message("Pedro", "Adding Morgana")
    assert _snap_row(lake, lake.current_snapshot()) == (
        "Pedro", "Adding Morgana", None)
    # back off: plain inserts work again, without info
    lake.set_option("require_commit_message", "false")
    lake.insert("t", spark.createDataFrame([(8,)], "a int"))
    assert _snap_row(lake, lake.current_snapshot()) == (None, None, None)


def _tid(lake, name):
    return lake.meta.query(
        "SELECT table_id FROM ducklake_table WHERE table_name = ? "
        "AND end_snapshot IS NULL", (name,))[0][0]


def test_appender_data_file_and_stats_rows(lake, spark):
    lake.create_table("basic_test", [("id", "int32"), ("value", "varchar")])
    lake.insert("basic_test", spark.createDataFrame(
        [(1, "hello"), (2, "world"), (3, "test")], "id int, value string"
    ).coalesce(1))
    tid = _tid(lake, "basic_test")
    q = lake.meta.query
    assert q("SELECT COUNT(*) FROM ducklake_data_file WHERE table_id=?",
             (tid,))[0][0] == 1
    assert q("SELECT COUNT(*) FROM ducklake_file_column_stats "
             "WHERE table_id=?", (tid,))[0][0] == 2
    lake.insert("basic_test", spark.createDataFrame(
        [(4, "foo"), (5, "bar")], "id int, value string").coalesce(1))
    assert q("SELECT COUNT(*) FROM ducklake_data_file WHERE table_id=?",
             (tid,))[0][0] == 2
    got = [(r.id, r.value) for r in lake.table("basic_test").orderBy("id").collect()]
    assert got == [(1, "hello"), (2, "world"), (3, "test"), (4, "foo"), (5, "bar")]

    # min/max/value_count recorded per column (appender_data_files:75-81)
    lake.create_table("stats_test", [("i", "int32"), ("s", "varchar")])
    lake.insert("stats_test", spark.range(1000).selectExpr(
        "CAST(id AS INT) AS i", "format_string('%06d', id) AS s").coalesce(1))
    tid = _tid(lake, "stats_test")
    stats = q("SELECT column_id, min_value, max_value, value_count "
              "FROM ducklake_file_column_stats WHERE table_id=? "
              "ORDER BY column_id", (tid,))
    assert [tuple(r) for r in stats] == [
        (stats[0][0], "0", "999", 1000),
        (stats[1][0], "000000", "000999", 1000),
    ]
    # stats drive zone-map pruning and the filtered result is right
    assert lake.table("stats_test", where="i > 900").count() == 99

    # null counts (appender_data_files:100-120)
    lake.create_table("null_test", [("id", "int32"), ("value", "varchar")])
    lake.insert("null_test", spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, None)],
        "id int, value string").coalesce(1))
    tid = _tid(lake, "null_test")
    nulls = q("SELECT column_id, null_count FROM ducklake_file_column_stats "
              "WHERE table_id=? ORDER BY column_id", (tid,))
    assert [r[1] for r in nulls] == [0, 2]


def test_appender_partition_value_rows(lake, spark):
    lake.create_table(
        "single_partition",
        [("id", "int32"), ("category", "varchar"), ("value", "int32")],
    )
    lake.set_partitioned_by("single_partition", [("category", "identity")])
    rows = [
        [(1, "A", 100), (2, "A", 200)],
        [(3, "A", 300)],
        [(4, "B", 400), (5, "B", 500)],
        [(6, "C", 600)],
    ]
    for batch in rows:
        lake.insert("single_partition", spark.createDataFrame(
            batch, "id int, category string, value int").coalesce(1))
    tid = _tid(lake, "single_partition")
    q = lake.meta.query
    assert q("SELECT COUNT(*) FROM ducklake_data_file WHERE table_id=?",
             (tid,))[0][0] == 4
    assert q("SELECT COUNT(*) FROM ducklake_file_partition_value "
             "WHERE table_id=?", (tid,))[0][0] == 4
    assert q("SELECT COUNT(DISTINCT partition_value) "
             "FROM ducklake_file_partition_value WHERE table_id=?",
             (tid,))[0][0] == 3
    got = [(r.id, r.category, r.value)
           for r in lake.table("single_partition",
                               where="category = 'A'").orderBy("id").collect()]
    assert got == [(1, "A", 100), (2, "A", 200), (3, "A", 300)]


def test_metadata_catalog_hidden_from_query_surface(lake, spark):
    """The analogue of hide_metadata_catalog.test: lake.sql and the
    table listing expose only user tables — no ducklake_* internals —
    and metadata access is the explicit lake.meta seam."""
    lake.create_table("test", [("i", "int32")])
    lake.insert("test", spark.createDataFrame([(i,) for i in range(10)], "i int"))
    names = lake._table_names()
    assert any(n.endswith("test") for n in names)
    assert not any("ducklake_" in n for n in names)
    # lake.sql registers exactly the user tables; querying an internal
    # catalog table through the SQL surface fails
    assert lake.sql("SELECT COUNT(*) AS n FROM test").first().n == 10
    from pyspark.sql.utils import AnalysisException

    with pytest.raises(AnalysisException):
        lake.sql("SELECT * FROM ducklake_snapshot").collect()
