"""Run the lake's catalog traffic through the Postgres translation
adapter against the wire-faithful fake (tests/pg_wire_fake.py).

This certifies the ``_PgConnection`` layer end-to-end: every statement
the lake emits must survive qmark→%s translation, introspection
rewrites, psycopg2 transaction semantics, and a Postgres-grammar
parser with enforced column types — the full lifecycle the reference
exercises on a real server via test/configs/postgres.json.
"""

from __future__ import annotations

import pytest

from pg_wire_fake import WireProtocolError, install


@pytest.fixture()
def pg_lake(spark, tmp_path):
    from ducklake_spark.lake import DuckLake

    dsn = install(str(tmp_path / "pgcat.duckdb"))
    return DuckLake.attach(spark, dsn, str(tmp_path / "data"))


def test_pg_wire_full_lifecycle(pg_lake, spark):
    lake = pg_lake
    lake.create_table("t", [("i", "int64"), ("v", "varchar")])
    lake.insert("t", spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], "i long, v string"))
    assert lake.table("t").count() == 20
    s1 = lake.current_snapshot()
    assert lake.delete("t", "i < 5") == 5
    assert lake.update("t", {"v": "'x'"}, "i >= 18") == 2
    assert lake.table("t").count() == 15
    assert lake.table("t", at_version=s1).count() == 20
    # DDL + maintenance rounds
    lake.add_column("t", "j", "int32")
    lake.insert("t", spark.createDataFrame([(100, "y", 7)],
                                           "i long, v string, j int"))
    lake.merge_adjacent_files()
    assert lake.table("t").count() == 16
    lake.expire_snapshots(versions=list(range(1, lake.current_snapshot())))
    lake.cleanup_old_files(cleanup_all=True)
    assert lake.table("t").count() == 16
    # stats / functions surface touch the catalog too
    assert lake.row_count("t") == 16


def test_pg_wire_transactionality(pg_lake, spark):
    lake = pg_lake
    lake.create_table("t", [("i", "int64")])
    with lake.transaction():
        lake.insert("t", spark.range(5))
        lake.insert("t", spark.range(5, 8))
    assert lake.table("t").count() == 8
    # rollback leaves nothing
    try:
        with lake.transaction():
            lake.insert("t", spark.range(100, 103))
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert lake.table("t").count() == 8


def test_pg_wire_rejects_sqlite_isms(tmp_path):
    from pg_wire_fake import FakePgRawConnection, FakePgServer

    raw = FakePgRawConnection(FakePgServer(str(tmp_path / "w.duckdb")))
    with pytest.raises(WireProtocolError, match="qmark"):
        raw._run("SELECT * FROM t WHERE x = ?", ("v",))
    with pytest.raises(WireProtocolError, match="sqlite-ism"):
        raw._run("PRAGMA table_info(t)", ())
    with pytest.raises(WireProtocolError, match="placeholders"):
        raw._run("SELECT %s, %s", ("only-one",))
    # a string literal containing '?' is fine
    raw.duck.execute("CREATE TABLE q(s VARCHAR)")
    raw._run("INSERT INTO q VALUES ('what?')", ())
