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
# default is sqlite. Postgres needs a server + psycopg2 (not in this
# container) — its SQL translation layer has dedicated unit tests.
import os as _os

CATALOG_BACKEND = _os.environ.get("DUCKLAKE_TEST_BACKEND", "sqlite")


def catalog_url(tmp_path) -> str:
    from pathlib import Path

    Path(tmp_path).mkdir(parents=True, exist_ok=True)
    if CATALOG_BACKEND == "duckdb":
        return "duckdb://" + str(tmp_path / "meta.duckdb")
    if CATALOG_BACKEND.startswith(("postgresql://", "postgres://")):
        return CATALOG_BACKEND  # external server DSN
    return str(tmp_path / "meta.db")
