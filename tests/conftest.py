from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from ducklake_spark.session import get_spark

    s = get_spark("tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF_ORACLE}/{t}.parquet'"
        )
    yield con
    con.close()


# Catalog backend under test: DUCKLAKE_TEST_BACKEND=duckdb runs every
# lake fixture on a DuckDB catalog (the reference's own default engine);
# DUCKLAKE_TEST_BACKEND=pgtcp runs it over a REAL TCP socket speaking
# the Postgres v3 wire protocol (tests/pg_tcp_server.py + the vendored
# pure-Python client in catalog/pg_client.py — psycopg2 is not
# installable here); a postgresql:// DSN targets an external server.
# Default is sqlite.
import os as _os

CATALOG_BACKEND = _os.environ.get("DUCKLAKE_TEST_BACKEND", "sqlite")


_PG_SERVER = None


def _pgtcp_server():
    """Lazy session-wide DuckDB-backed Postgres wire server (pgtcp)."""
    global _PG_SERVER
    if _PG_SERVER is None:
        import tempfile

        from pg_tcp_server import DuckPgServer

        _PG_SERVER = DuckPgServer(tempfile.mkdtemp(prefix="pgtcp_"))
    return _PG_SERVER


def catalog_url(tmp_path) -> str:
    from pathlib import Path

    Path(tmp_path).mkdir(parents=True, exist_ok=True)
    if CATALOG_BACKEND == "duckdb":
        return "duckdb://" + str(tmp_path / "meta.duckdb")
    if CATALOG_BACKEND == "pgtcp":
        # per-test database on the shared wire server: the db name is
        # derived from tmp_path, which pytest makes unique per test
        import hashlib

        db = "t" + hashlib.md5(str(tmp_path).encode()).hexdigest()[:16]
        return _pgtcp_server().dsn(db)
    if CATALOG_BACKEND.startswith(("postgresql://", "postgres://")):
        return CATALOG_BACKEND  # external server DSN
    return str(tmp_path / "meta.db")
