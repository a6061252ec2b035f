"""Lake-backed driver-gate queries: certify the engine, not just Spark SQL.

Every other registered query family reads raw parquet temp views, so a
green CORRECTNESS row there certifies Spark SQL over plain files. These
queries read *through the lake* — the pruned ``ducklake_scan``
(``lake.table``), the positional-delete anti-join (``DuckLakeDelete``),
the preserved-rowid update path (``DuckLakeUpdate``), the
ADD COLUMN ... DEFAULT evolution read groups, post-``merge_adjacent_files``
compacted files, snapshot time travel, Top-N dynamic file pruning
(``lake.topn``) and CDC (``ducklake_table_insertions``) — with DuckDB
over the same *logical* rows as the oracle.

Reference parity: the DML script below mirrors the shapes of
``test/sql/ducklake_basic.test``, ``test/sql/alter/add_column_default``,
``test/sql/compaction/basic_compaction.test`` and
``test/sql/cdc/table_insertions.test`` — load, delete a slice, update a
slice, evolve the schema, insert post-evolution rows, compact, then read
back at head and at a pinned snapshot.

Build is memoized on disk (keyed by source-parquet fingerprint) so the
expensive part runs once per testdata generation, not once per query or
per process; each query then pays only a catalog attach.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ducklake_spark.queries import df_query

# bump when the DML script below changes: the on-disk gate lake is only
# valid for the script that built it
GATE_VERSION = 6  # v6: per-table column ids + rendered literal defaults

_SOURCE_TABLES = ("lineitem", "orders", "customer", "part", "documents")

# applicationId, sf_dir -> (DuckLake, snapshots dict)
_ATTACHED: dict[tuple[str, str], tuple] = {}

_NEW_PARTS = [
    (9000001 + i, f"gate part {i}", "Brand#99", "GATE TYPE", 10 + i,
     100.25 + i, "new")
    for i in range(5)
]


def _fingerprint(sf_dir: str) -> str:
    parts = []
    for t in _SOURCE_TABLES:
        st = os.stat(f"{sf_dir}/{t}.parquet")
        parts.append(f"{t}:{st.st_size}:{int(st.st_mtime)}")
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:10]


def _gate_dir(sf_dir: str) -> Path:
    root = Path(__file__).resolve().parents[2] / ".gate_lake"
    return root / f"v{GATE_VERSION}_{Path(sf_dir).name}_{_fingerprint(sf_dir)}"


def _build(spark: SparkSession, sf_dir: str, d: Path) -> None:
    from ducklake_spark import dml
    from ducklake_spark.lake import DuckLake
    from ducklake_spark.maintenance import merge_adjacent_files

    d.mkdir(parents=True, exist_ok=True)
    lake = DuckLake.attach(spark, str(d / "meta.db"), str(d / "data"))
    # range-partitioned loads give the scans a multi-file layout so
    # zone-map / Top-N pruning has real file boundaries to prune against
    lake.create_table_as(
        "lineitem",
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .repartitionByRange(8, "l_shipdate"),
    )
    lake.create_table_as(
        "orders",
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .repartitionByRange(8, "o_totalprice"),
    )
    lake.create_table_as(
        "customer", spark.read.parquet(f"{sf_dir}/customer.parquet")
    )
    lake.create_table_as(
        "part", spark.read.parquet(f"{sf_dir}/part.parquet").repartition(4)
    )
    snaps = {"load": lake.current_snapshot()}
    # positional-delete path: ~12% of lineitem gets delete files
    dml.delete(lake, "lineitem", "l_quantity >= 45")
    # update path: delete+insert preserving rowids
    dml.update(
        lake, "customer", {"c_acctbal": "c_acctbal + 1000"},
        where="c_mktsegment = 'BUILDING'",
    )
    # schema evolution: every pre-existing part row surfaces the default
    lake.add_column("part", "p_grade", "varchar", default="'na'")
    lake.insert(
        "part",
        spark.createDataFrame(
            _NEW_PARTS,
            "p_partkey bigint, p_name string, p_brand string, p_type string, "
            "p_size int, p_retailprice double, p_grade string",
        ),
    )
    snaps["ins"] = lake.current_snapshot()
    # identity-partitioned table: partition pruning + the per-spec
    # value binding (round-6 partition_id fix) under the driver gate
    from ducklake_spark.catalog.types import spark_to_ducklake

    odf = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lake.create_table(
        "orders_part",
        [(f.name, spark_to_ducklake(f.dataType)) for f in odf.schema.fields],
    )
    lake.set_partitioned_by("orders_part", [("o_orderpriority", "identity")])
    lake.insert("orders_part", odf)
    # persisted MinHash signature index over the FIRST half of the
    # documents corpus (operators/dedup_index.py): the gate query
    # dedups the second half against it incrementally
    from ducklake_spark.operators import dedup_index

    ddf = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dedup_index.create_index(lake)
    dedup_index.add_documents(lake, ddf.filter("doc_id < 250"))
    # compact across the delete files AND the evolution epoch boundary —
    # the round-5 epoch-grouping fix is on this exact path
    merge_adjacent_files(lake)
    # nested-struct table: per-leaf zone maps (child column rows) +
    # dotted-predicate pruning through the engine; range-partitioned on
    # the leaf so files keep disjoint meta.total ranges (created after
    # the compact call so the 4-file layout survives)
    nested = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .selectExpr(
            "o_orderkey",
            "named_struct('priority', o_orderpriority, "
            "'total', o_totalprice) AS meta",
        )
        .repartitionByRange(4, F.col("meta.total"))
    )
    lake.create_table_as("orders_nested", nested)
    (d / "snaps.json").write_text(json.dumps(snaps))
    (d / "DONE").write_text("ok")


def _gate_lake(spark: SparkSession, sf_dir: str):
    key = (spark.sparkContext.applicationId, sf_dir)
    got = _ATTACHED.get(key)
    if got is not None:
        return got
    from ducklake_spark.lake import DuckLake

    d = _gate_dir(sf_dir)
    done = d / "DONE"
    if not done.exists():
        d.parent.mkdir(parents=True, exist_ok=True)
        lock = d.parent / (d.name + ".lock")
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            # another process is building the same gate lake; wait for it
            for _ in range(600):
                if done.exists():
                    break
                time.sleep(1)
            else:
                raise RuntimeError(f"gate lake build stalled: {d}")
        else:
            try:
                if d.exists():  # partial build from a killed process
                    shutil.rmtree(d)
                _build(spark, sf_dir, d)
            finally:
                os.close(fd)
                lock.unlink(missing_ok=True)
    lake = DuckLake.attach(spark, str(d / "meta.db"), str(d / "data"))
    snaps = json.loads((d / "snaps.json").read_text())
    got = (lake, snaps)
    _ATTACHED[key] = got
    return got


def _dec_sum(col: str, alias: str):
    # DECIMAL-exact sum cast to double at the end: order-independent, so
    # Spark's and DuckDB's aggregation orders hash identically
    return F.sum(F.col(col).cast("decimal(18,2)")).cast("double").alias(alias)


# ---------------------------------------------------------------- queries

_LIVE = "NOT COALESCE(l_quantity >= 45, FALSE)"  # rows the DELETE left


def _scan_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    lake, _ = _gate_lake(spark, sf_dir)
    return (
        lake.table("lineitem", where="l_shipdate >= TIMESTAMP '1997-01-01'")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("cnt"), _dec_sum("l_quantity", "sum_qty"))
        .orderBy("l_returnflag")
    )


df_query(
    "lake_scan_filter",
    _scan_filter,
    oracle=f"""
SELECT l_returnflag, COUNT(*) AS cnt,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
WHERE {_LIVE} AND l_shipdate >= TIMESTAMP '1997-01-01'
GROUP BY l_returnflag ORDER BY l_returnflag
""",
    tables=(),
    doc="pruned ducklake_scan + zone-map where + delete anti-join",
)


def _delete_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    lake, _ = _gate_lake(spark, sf_dir)
    return (
        lake.table("lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("cnt"), _dec_sum("l_quantity", "sum_qty"))
        .orderBy("l_returnflag", "l_linestatus")
    )


df_query(
    "lake_delete_readback",
    _delete_agg,
    oracle=f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem WHERE {_LIVE}
GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
""",
    tables=(),
    doc="DuckLakeDelete positional deletes survive compaction",
)


def _update_readback(spark: SparkSession, sf_dir: str) -> DataFrame:
    lake, _ = _gate_lake(spark, sf_dir)
    return (
        lake.table("customer")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("cnt"), _dec_sum("c_acctbal", "sum_bal"))
        .orderBy("c_mktsegment")
    )


df_query(
    "lake_update_readback",
    _update_readback,
    oracle="""
SELECT c_mktsegment, COUNT(*) AS cnt,
       CAST(SUM(CAST(CASE WHEN c_mktsegment = 'BUILDING'
                          THEN c_acctbal + 1000 ELSE c_acctbal END
                     AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
""",
    tables=(),
    doc="DuckLakeUpdate delete+insert readback",
)


def _evolution_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    lake, _ = _gate_lake(spark, sf_dir)
    return (
        lake.table("part")
        .groupBy("p_grade")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("p_grade")
    )


df_query(
    "lake_evolution_default",
    _evolution_default,
    oracle="""
SELECT p_grade, cnt FROM (
  SELECT 'na' AS p_grade, COUNT(*) AS cnt FROM part
  UNION ALL
  SELECT 'new' AS p_grade, CAST(5 AS BIGINT) AS cnt
) ORDER BY p_grade
""",
    tables=(),
    doc="ADD COLUMN DEFAULT: old files surface the default, post-compact",
)


def _time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    lake, snaps = _gate_lake(spark, sf_dir)
    return (
        lake.table("lineitem", at_version=snaps["load"])
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("cnt"), _dec_sum("l_quantity", "sum_qty"))
        .orderBy("l_returnflag")
    )


df_query(
    "lake_time_travel",
    _time_travel,
    oracle="""
SELECT l_returnflag, COUNT(*) AS cnt,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
    tables=(),
    doc="AT VERSION pre-delete snapshot sees every original row",
)


def _topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    lake, _ = _gate_lake(spark, sf_dir)
    return (
        lake.topn("orders", "o_totalprice", 10)
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
    )


df_query(
    "lake_topn",
    _topn,
    oracle="""
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
""",
    tables=(),
    doc="Top-N dynamic file pruning (two-phase adaptive)",
)


def _sql_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    lake, _ = _gate_lake(spark, sf_dir)
    df = lake.sql("""
SELECT c_mktsegment, COUNT(*) AS cnt,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
""")
    # lake.sql registered every lake table as a temp view, clobbering the
    # raw-parquet views the rest of the registry owns. The returned df is
    # already analyzed (spark.sql binds views eagerly), so restore the
    # raw views NOW and invalidate both memo caches.
    import ducklake_spark.queries as Q
    from ducklake_spark.lake import _SQL_VIEW_OWNER

    _SQL_VIEW_OWNER.pop(id(spark), None)
    Q._LOADED.pop(spark.sparkContext.applicationId, None)
    Q.load_tables(spark, sf_dir)
    return df


df_query(
    "lake_sql_join",
    _sql_join,
    oracle="""
SELECT c_mktsegment, COUNT(*) AS cnt,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       CAST(SUM(CAST(CASE WHEN c_mktsegment = 'BUILDING'
                          THEN c_acctbal + 1000 ELSE c_acctbal END
                     AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
""",
    tables=(),
    doc="lake.sql() join across two lake tables, updated values flow through",
)


def _cdc_insertions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ducklake_spark import cdc

    lake, snaps = _gate_lake(spark, sf_dir)
    return (
        cdc.table_insertions(lake, "part", snaps["ins"], snaps["ins"])
        .select("p_partkey", "p_name", "p_grade")
        .orderBy("p_partkey")
    )


_CDC_VALUES = ", ".join(
    f"({k}, '{n}', '{g}')" for k, n, _b, _t, _s, _p, g in _NEW_PARTS
)

df_query(
    "lake_cdc_insertions",
    _cdc_insertions,
    oracle=f"""
SELECT CAST(col0 AS BIGINT) AS p_partkey, col1 AS p_name, col2 AS p_grade
FROM (VALUES {_CDC_VALUES}) AS t(col0, col1, col2)
ORDER BY p_partkey
""",
    tables=(),
    doc="ducklake_table_insertions over the post-evolution insert snapshot",
)


def _partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    lake, _ = _gate_lake(spark, sf_dir)
    return (
        lake.table("orders_part", where="o_orderpriority = '1-URGENT'")
        .filter("o_orderpriority = '1-URGENT'")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"),
             _dec_sum("o_totalprice", "sum_price"))
        .orderBy("o_orderstatus")
    )


df_query(
    "lake_partition_prune",
    _partition_prune,
    oracle="""
SELECT o_orderstatus, COUNT(*) AS cnt,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders
WHERE o_orderpriority = '1-URGENT'
GROUP BY o_orderstatus ORDER BY o_orderstatus
""",
    tables=("orders",),
    doc="identity-partition pruning through the lake: the scan's file "
        "list keeps only the predicate's partition (one file per value "
        "via partition_write_shuffle)",
)


def _incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-batch near-dup candidates against the PERSISTED signature
    index (no recomputation of indexed docs) — must equal the batch
    LSH pairs involving a new doc, which is exactly what the DuckDB
    oracle computes from scratch."""
    from ducklake_spark.operators import dedup_index

    lake, _ = _gate_lake(spark, sf_dir)
    new_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        "doc_id >= 250")
    return (
        dedup_index.neardup_candidates(lake, new_docs)
        .orderBy("doc_a", "doc_b")
    )


def _incremental_neardup_oracle() -> str:
    from ducklake_spark.queries.dedup import _minhash_sql

    return f"""
    SELECT doc_a, doc_b FROM ({_minhash_sql("duckdb")}) p
    WHERE doc_a >= 250 OR doc_b >= 250
    ORDER BY doc_a, doc_b
    """


df_query(
    "lake_dedup_index_incremental",
    _incremental_neardup,
    oracle=_incremental_neardup_oracle(),
    tables=("documents",),
    doc="incremental near-dup against the lake-persisted MinHash index "
        "(band-bucket equi-join, zero recomputation of indexed docs) vs "
        "a from-scratch batch LSH oracle",
)


def _nested_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan with a dotted struct predicate: the engine prunes files by
    the leaf's zone map (child ducklake_column rows keyed per leaf —
    reference min_max_nested_leaf_rewrite_corruption.test family)."""
    lake, _ = _gate_lake(spark, sf_dir)
    return (
        lake.table("orders_nested", where="meta.total < 50000.0")
        .groupBy(F.col("meta.priority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.sum(F.col("meta.total").cast("decimal(18,2)"))
             .cast("double").alias("sum_total"))
        .orderBy("priority")
    )


df_query(
    "lake_nested_prune",
    _nested_prune,
    oracle="""
SELECT o_orderpriority AS priority, COUNT(*) AS cnt,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS sum_total
FROM orders WHERE o_totalprice < 50000.0
GROUP BY o_orderpriority ORDER BY priority
""",
    tables=("orders",),
    doc="dotted struct-leaf predicate pruned by per-leaf zone maps "
        "through the lake scan (nested child column rows)",
)
