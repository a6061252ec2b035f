"""Lake-backed driver-gate queries (queries/lakeq.py) vs the DuckDB oracle.

Mirrors the driver's compare (columns sorted by name, rows sorted,
type-strict cells) at sf0.001 so the whole build→DML→compact→read
script stays green without the driver in the loop.
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ("lineitem", "orders", "customer", "part")

LAKE_QUERIES = [
    "lake_scan_filter",
    "lake_delete_readback",
    "lake_update_readback",
    "lake_evolution_default",
    "lake_time_travel",
    "lake_topn",
    "lake_sql_join",
    "lake_cdc_insertions",
    "lake_partition_prune",
    "lake_nested_prune",
]


def _norm_cell(v):
    if v is None:
        return ("n", "")
    if isinstance(v, bool):
        return ("b", str(v))
    if isinstance(v, int):
        return ("i", str(v))
    if isinstance(v, decimal.Decimal):
        return ("d", str(v))
    if isinstance(v, float):
        return ("f", "NaN" if math.isnan(v) else repr(v))
    if isinstance(v, datetime.datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("D", v.isoformat())
    return (type(v).__name__, str(v))


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )
    return con


@pytest.mark.parametrize("name", LAKE_QUERIES)
def test_lake_query_matches_oracle(spark, oracle_con, name):
    from ducklake_spark.queries import all_queries

    q = all_queries()[name]
    sdf = q.run(spark, SF)
    s_cols, s_rows = _normalize(sdf.columns, [tuple(r) for r in sdf.collect()])
    tbl = oracle_con.execute(q.oracle).arrow()
    o_rows = [tuple(d[c] for c in tbl.column_names) for d in tbl.to_pylist()]
    o_cols, o_rows = _normalize(tbl.column_names, o_rows)
    assert s_cols == o_cols
    assert len(s_rows) == len(o_rows)
    assert s_rows == o_rows


def test_gate_build_is_memoized(spark):
    """Second access attaches the on-disk lake; no rebuild."""
    from ducklake_spark.queries import lakeq

    d = lakeq._gate_dir(SF)
    assert (d / "DONE").exists()
    mtime = (d / "DONE").stat().st_mtime
    lakeq._ATTACHED.clear()
    lake, snaps = lakeq._gate_lake(spark, SF)
    assert (d / "DONE").stat().st_mtime == mtime
    assert snaps["load"] < snaps["ins"] <= lake.current_snapshot()


def test_gate_nested_prune_skips_files(spark):
    """The orders_nested gate table keeps a 4-file range layout and the
    dotted leaf predicate prunes to a strict subset."""
    from ducklake_spark.queries.lakeq import _gate_lake

    lake, _ = _gate_lake(spark, SF)
    h = lake._handle("orders_nested")
    snap = lake._resolve_snapshot(None, None)
    n_all = len(lake._visible_files(h, snap, None))
    n_pruned = len(lake._visible_files(h, snap, "meta.total < 50000.0"))
    assert n_all == 4
    assert 1 <= n_pruned < n_all
