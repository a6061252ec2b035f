"""Server-side ("quack") commit over the TCP catalog.

reference: src/storage/ducklake_server_side_commit.cpp,
src/include/metadata_manager/quack_metadata_manager.hpp,
test/sql/quack/server_side_commit_atomicity.test.

A data-only commit ships the whole change set in ONE wire statement;
the server replays conflict probes, id allocation, row inserts, and
the global stats merge atomically. These tests prove the path is
actually taken (the client-side writer is stubbed out to fail), that
its catalog rows are byte-identical to the client path's, that
conflicts surface as ConflictError, and — the reference's atomicity
repro — that a failed server commit leaves no orphan snapshot.
"""

from __future__ import annotations

import pytest

from pg_tcp_server import DuckPgServer


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    srv = DuckPgServer(str(tmp_path_factory.mktemp("qroot")))
    yield srv
    srv.close()


@pytest.fixture()
def pg_lake(spark, tmp_path, server):
    from ducklake_spark.lake import DuckLake

    db = "db_" + tmp_path.name.replace("-", "_")
    return DuckLake.attach(spark, server.dsn(db), str(tmp_path / "data"))


def _df(spark, n=10, base=0):
    return spark.createDataFrame(
        [(base + i, f"v{base + i}") for i in range(n)], "i long, v string"
    )


def test_payload_roundtrip_hostile_content():
    from ducklake_spark.catalog.server_commit import (
        decode_payload,
        encode_payload,
    )

    p = {
        "message": "what? 'quoted' %s \\ é",
        "tables": [{"files": [{"path": "a?b'c.parquet"}]}],
    }
    assert decode_payload(encode_payload(p)) == p


def test_data_only_insert_uses_server_path(pg_lake, spark, monkeypatch):
    from ducklake_spark.transaction import Transaction

    lake = pg_lake
    lake.create_table("t", [("i", "int64"), ("v", "varchar")])
    assert lake.meta.server_commit_supported()

    def _boom(self, *, staged=False):
        raise AssertionError("client-side commit ran for a data-only insert")

    monkeypatch.setattr(Transaction, "_try_commit", _boom)
    lake.set_commit_message("ci", "batch 1 ('quack?')")
    lake.insert("t", _df(spark, 20))
    monkeypatch.undo()

    assert sorted(
        r.i for r in lake.table("t").select("i").collect()
    ) == list(range(20))
    snaps = {r["snapshot_id"]: r for r in lake.snapshots().collect()}
    last = snaps[max(snaps)]
    assert last["author"] == "ci"
    assert last["commit_message"] == "batch 1 ('quack?')"
    # global stats written by the server merge drive the metadata fold
    assert lake.row_count("t") == 20


def test_server_rows_match_client_path(spark, tmp_path, server):
    from ducklake_spark.lake import DuckLake

    def catalog_rows(lake):
        con = lake.meta.con
        stats = con.execute(
            "SELECT record_count, file_size_bytes FROM ducklake_table_stats"
        ).fetchall()
        gcs = con.execute(
            "SELECT column_id, contains_null, contains_nan, min_value, "
            "max_value FROM ducklake_table_column_stats ORDER BY column_id"
        ).fetchall()
        files = con.execute(
            "SELECT record_count, row_id_start FROM ducklake_data_file "
            "ORDER BY data_file_id"
        ).fetchall()
        head = con.execute(
            "SELECT snapshot_id, schema_version FROM ducklake_snapshot "
            "ORDER BY snapshot_id DESC LIMIT 1"
        ).fetchone()
        return stats, gcs, files, head

    results = []
    for dsn in (
        server.dsn("parity_srv"),
        str(tmp_path / "client.sqlite"),
    ):
        lake = DuckLake.attach(spark, dsn, str(tmp_path / f"d{len(results)}"))
        lake.create_table("t", [("i", "int64"), ("v", "varchar")])
        lake.insert("t", _df(spark, 10))
        lake.insert("t", _df(spark, 5, base=100))
        results.append(catalog_rows(lake))
    srv_rows, cli_rows = results
    # column ids differ only if allocation diverged — they must not
    assert srv_rows == cli_rows


def test_concurrent_drop_is_a_conflict(pg_lake, spark, server, tmp_path):
    from ducklake_spark.catalog.metadata import ConflictError
    from ducklake_spark.lake import DuckLake

    lake = pg_lake
    lake.create_table("t", [("i", "int64"), ("v", "varchar")])
    lake.insert("t", _df(spark, 3))
    with pytest.raises(ConflictError):
        with lake.transaction():
            lake.insert("t", _df(spark, 3, base=10))
            # second attachment drops the table mid-transaction
            other = DuckLake.attach(
                spark, lake.meta.db_path, str(tmp_path / "data")
            )
            other.drop_table("t")


def test_failed_server_commit_leaves_no_orphan_snapshot(pg_lake, spark):
    """Mirror of test/sql/quack/server_side_commit_atomicity.test: seed
    an orphan ducklake_snapshot_changes row at the next snapshot id so
    the commit's final insert collides on the primary key; the whole
    server-side transaction must roll back — no orphan snapshot, no
    leaked file rows, table unchanged."""
    lake = pg_lake
    lake.create_table("t", [("i", "int64"), ("v", "varchar")])
    lake.insert("t", _df(spark, 4))
    con = lake.meta.con
    (head,) = con.execute(
        "SELECT MAX(snapshot_id) FROM ducklake_snapshot"
    ).fetchone()
    con.execute(
        "INSERT INTO ducklake_snapshot_changes VALUES "
        f"({head + 1}, 'orphan', NULL, NULL, NULL)"
    )
    (files_before,) = con.execute(
        "SELECT COUNT(*) FROM ducklake_data_file"
    ).fetchone()
    with pytest.raises(Exception, match="(?i)duplicate|constraint"):
        lake.insert("t", _df(spark, 4, base=50))
    (orphans,) = con.execute(
        "SELECT COUNT(*) FROM ducklake_snapshot WHERE snapshot_id > ?",
        (head,),
    ).fetchone()
    assert orphans == 0
    (files_after,) = con.execute(
        "SELECT COUNT(*) FROM ducklake_data_file"
    ).fetchone()
    assert files_after == files_before
    assert sorted(r.i for r in lake.table("t").select("i").collect()) == [
        0, 1, 2, 3,
    ]


def test_ddl_commits_build_no_payload_but_dml_does(pg_lake, spark):
    """DDL keeps the client-side loop; DELETE/UPDATE ship server-side
    (the protocol-2 extension past the reference's IsDataOnlyCommit)."""
    lake = pg_lake
    seen = []
    from ducklake_spark import transaction as txn_mod

    orig = txn_mod.Transaction._server_commit_payload

    def spy(self):
        p = orig(self)
        seen.append(p is not None)
        return p

    txn_mod.Transaction._server_commit_payload = spy
    try:
        lake.create_table("t", [("i", "int64"), ("v", "varchar")])
        assert seen == [False]  # DDL declined
        lake.insert("t", _df(spark, 8))
        lake.delete("t", "i >= 6")
        from ducklake_spark import dml

        dml.update(lake, "t", {"v": "'upd'"}, "i = 1")
    finally:
        txn_mod.Transaction._server_commit_payload = orig
    assert seen == [False, True, True, True]  # insert+delete+update ship
    assert lake.table("t").count() == 6
    assert [r.v for r in lake.table("t").filter("i = 1").collect()] == ["upd"]


def test_server_delete_compact_round_trip(pg_lake, spark):
    """The full DML/maintenance family over the wire: inserts, a
    positional delete, compaction (purged sources ride the payload),
    and time travel across all of it."""
    from ducklake_spark import maintenance as maint

    lake = pg_lake
    lake.create_table("t", [("i", "int64"), ("v", "varchar")])
    for b in range(3):
        lake.insert("t", _df(spark, 20, base=b * 100))
    snap_full = lake.current_snapshot()
    n = maint.merge_adjacent_files(lake)
    assert n >= 1  # compaction (with purged sources) rode the payload
    con = lake.meta.con
    (sched,) = con.execute(
        "SELECT COUNT(*) FROM ducklake_files_scheduled_for_deletion"
    ).fetchone()
    assert sched > 0
    lake.delete("t", "i % 100 >= 15")
    assert sorted(r.i for r in lake.table("t").collect()) == sorted(
        b * 100 + i for b in range(3) for i in range(15))
    # time travel back across the server-side compaction + delete
    assert lake.table("t", at_version=snap_full).count() == 60


def test_server_commit_encrypted_lake(spark, tmp_path, server):
    """Per-file AES keys ride the payload intact; readback decrypts."""
    from ducklake_spark.lake import DuckLake

    lake = DuckLake.attach(
        spark, server.dsn("encdb"), str(tmp_path / "edata"), encrypted=True
    )
    lake.create_table("t", [("i", "int64"), ("v", "varchar")])
    assert lake.meta.server_commit_supported()
    lake.insert("t", _df(spark, 12))
    keys = lake.meta.con.execute(
        "SELECT encryption_key FROM ducklake_data_file"
    ).fetchall()
    assert keys and all(k[0] for k in keys)
    assert sorted(r.i for r in lake.table("t").collect()) == list(range(12))


def test_concurrent_server_commits(spark, tmp_path, server):
    """N writers appending to one table over the wire: every commit
    lands (the server serializes them), snapshots are distinct, and no
    rows are lost — the quack analogue of the reference's concurrent
    append matrix."""
    import threading

    from ducklake_spark.lake import DuckLake

    dsn = server.dsn("concdb")
    boot = DuckLake.attach(spark, dsn, str(tmp_path / "cdata"))
    boot.create_table("t", [("i", "int64"), ("v", "varchar")])
    errs = []

    def writer(k: int):
        try:
            lk = DuckLake.attach(spark, dsn, str(tmp_path / "cdata"))
            lk.insert("t", _df(spark, 10, base=k * 100))
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(k,)) for k in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    got = sorted(r.i for r in boot.table("t").select("i").collect())
    assert got == sorted(k * 100 + i for k in range(4) for i in range(10))
    snaps = [r["snapshot_id"] for r in boot.snapshots().collect()]
    assert len(snaps) == len(set(snaps)) and len(snaps) >= 6


def test_full_script_parity_server_vs_client(spark, tmp_path, server):
    """An identical DML+maintenance script over the server-commit wire
    backend and the client-side sqlite backend must converge to the
    same logical state: same rows, same live file/stat shapes, same
    snapshot count."""
    from ducklake_spark import dml
    from ducklake_spark import maintenance as maint
    from ducklake_spark.lake import DuckLake

    def run(dsn: str, data: str):
        lake = DuckLake.attach(spark, dsn, data)
        lake.create_table("t", [("i", "int64"), ("v", "varchar")])
        for b in range(3):
            lake.insert("t", _df(spark, 20, base=b * 100))
        maint.merge_adjacent_files(lake)
        dml.delete(lake, "t", "i % 100 >= 15")
        dml.update(lake, "t", {"v": "concat(v, '!')"}, "i % 100 < 3")
        lake.insert("t", _df(spark, 5, base=900))
        rows = sorted(tuple(r) for r in lake.table("t").collect())
        con = lake.meta.con
        (snaps,) = con.execute(
            "SELECT COUNT(*) FROM ducklake_snapshot").fetchone()
        stats = con.execute(
            "SELECT record_count FROM ducklake_table_stats").fetchall()
        (live_files,) = con.execute(
            "SELECT COUNT(*) FROM ducklake_data_file "
            "WHERE end_snapshot IS NULL").fetchone()
        return rows, snaps, stats, live_files, lake.row_count("t")

    srv = run(server.dsn("scriptdb"), str(tmp_path / "sdata"))
    cli = run(str(tmp_path / "cli.sqlite"), str(tmp_path / "cdata"))
    assert srv == cli
    assert len(srv[0]) == 50  # 45 survivors + 5 late inserts
