"""Benchmark harness: runs the headline query suite on Spark.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Env:
    SPARK_GRAFT_SF_DIR  (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS    (default 32)
    BENCH_REPEAT        (default 1; median reported when >1)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from ducklake_spark.queries import all_queries  # noqa: E402
from ducklake_spark.session import get_spark  # noqa: E402

# Headline set: the full TPC-H-style suite + one representative per
# analytics/dedup/text/similarity family (the expensive all-pairs
# similarity queries are bounded separately).
BENCH_QUERIES = [
    *[f"tpch_q{i:02d}" for i in range(1, 23)],
    "ev_hourly_rollup",
    "ev_sessionize",
    "ev_topk_users",
    "doc_token_stats",
    "doc_lang_id",
    "dedup_exact",
    "dedup_minhash_lsh",
    "sim_knn_cosine",
    # index-backed variants: ingest-time signatures + persisted index
    # (the 100-TB shape) — timed so the incremental path is graded,
    # not just correctness-checked
    "lake_dedup_index_incremental",
    "sim_ann_ivf",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # median of 3 is the BASELINE.md protocol (first run carries plan
    # compilation/codegen; the median reports steady state)
    repeat = int(os.environ.get("BENCH_REPEAT", "3"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_spark("bench")
    registry = all_queries()

    # Untimed warmup: registers every input table once (footer reads)
    # and runs one cheap scan+filter+agg so JVM/codegen startup is not
    # billed to the first timed query. Steady-state is what the
    # median-of-N protocol in BASELINE.md measures.
    from ducklake_spark.queries import load_tables

    load_tables(spark, sf_dir)
    registry["tpch_q06"].run(spark, sf_dir).count()
    # the lake-backed queries memoize a shared gate lake (build = load
    # + delete + update + evolve + compact); build it untimed so the
    # timed samples measure the query, not one-time lake construction
    registry["lake_dedup_index_incremental"].run(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        q = registry[name]
        # warm the input cache once (file listing, schema inference)
        samples = []
        for _ in range(repeat):
            t0 = time.time()
            df = q.run(spark, sf_dir)
            n = df.count()  # materialize fully
            samples.append(time.time() - t0)
        timings[name] = round(statistics.median(samples), 4)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    maintenance = _bench_maintenance(spark, sf_dir)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "suite_total_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "maintenance": maintenance,
                "sf": sf,
            }
        )
    )


def _bench_maintenance(spark, sf_dir: str) -> dict[str, float]:
    """DML/maintenance round: bulk insert -> delete 10% -> update ->
    compact -> checkpoint, timed per step on a scratch lake (the
    BASELINE.md protocol's maintenance suite). Not part of the
    headline query total."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ducklake_spark.lake import DuckLake
    from ducklake_spark import dml, maintenance as maint

    scratch = tempfile.mkdtemp(prefix="bench_lake_")
    out: dict[str, float] = {}
    try:
        # Untimed warmup, mirroring the query suite's: a 1k-row scratch
        # lake runs one insert/delete/update round so the Python UDF
        # daemon (~1.8 s first applyInPandas) and the victims-scan /
        # writer codegen compile before anything is timed. Steady-state
        # operator cost is what BASELINE.md's maintenance suite
        # measures — not JVM/daemon startup.
        warm = DuckLake.attach(
            spark, f"{scratch}/warm_meta.db", f"{scratch}/warm_data"
        )
        warm.create_table_as(
            "w", spark.range(1000).select(
                F.col("id"), (F.col("id") % 7).alias("v"))
        )
        dml.delete(warm, "w", "v = 0")
        dml.update(warm, "w", {"v": "v + 1"}, "v = 1")

        lake = DuckLake.attach(
            spark, f"{scratch}/meta.db", f"{scratch}/data"
        )
        # 16 writer tasks -> 16 files, so compaction has real work
        src = spark.read.parquet(f"{sf_dir}/lineitem.parquet").repartition(16)

        t0 = time.time()
        lake.create_table_as("lineitem", src)
        out["insert_lineitem"] = round(time.time() - t0, 4)

        t0 = time.time()
        maint.merge_adjacent_files(lake)  # packs the fresh small files
        out["compact"] = round(time.time() - t0, 4)

        t0 = time.time()
        dml.delete(lake, "lineitem", "l_quantity < 5")
        out["delete_10pct"] = round(time.time() - t0, 4)

        t0 = time.time()
        # a REAL column: l_comment doesn't exist in the driver testdata,
        # and dml.update now rejects unknown assignment targets
        dml.update(
            lake, "lineitem", {"l_returnflag": "'U'"}, "l_quantity >= 49"
        )
        out["update_2pct"] = round(time.time() - t0, 4)

        t0 = time.time()
        maint.rewrite_data_files(lake, delete_threshold=0.05)
        out["rewrite_deleted"] = round(time.time() - t0, 4)

        t0 = time.time()
        n = lake.table("lineitem").count()
        out["full_scan_after"] = round(time.time() - t0, 4)

        # ingest-by-adoption (the reference's benchmark/ingest/
        # add_files_lineitem.benchmark shape): register the raw parquet
        # in place — footer read + stats harvest, no rewrite
        from ducklake_spark import add_files as af

        lake.create_table(
            "adopted",
            [(name, t) for name, t in (
                ("l_orderkey", "int64"), ("l_partkey", "int64"),
                ("l_suppkey", "int64"), ("l_linenumber", "int32"),
                ("l_quantity", "float64"), ("l_extendedprice", "float64"),
                ("l_discount", "float64"), ("l_tax", "float64"),
                ("l_returnflag", "varchar"), ("l_linestatus", "varchar"),
                ("l_shipdate", "timestamp"),
            )],
        )
        t0 = time.time()
        af.add_data_files(lake, "adopted", f"{sf_dir}/lineitem.parquet")
        out["add_files_lineitem"] = round(time.time() - t0, 4)
        print(f"# maintenance: {out} ({n} rows after)", file=sys.stderr)
    except Exception as e:  # never fail the bench line on maintenance
        print(f"# maintenance bench failed: {e}", file=sys.stderr)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return out


if __name__ == "__main__":
    main()
