"""Round-13 interleaved A/B: OLD (round-12) vs NEW implementations, in
ONE warm session, median-of-N — the only timing protocol that survives
this box's +/-20% ambient drift (BENCH_NOTES).

Modes:
    dedup_index  old (bucket-size window) vs new (two-level aggregation)
    update       old (extra matched.count() pass) vs new (probe-derived
                 zero-check), on fresh scratch lakes per sample
    regressions  q04/q06/q10 median-of-N in one session (no code change
                 round-over-round: the question is whether the driver's
                 r12 'regression' reproduces at all outside cold-JVM
                 cross-process noise)

Usage: python tools/ab_r13.py [--n 7] [which ...]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time
import uuid
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from ducklake_spark.queries import all_queries, load_tables  # noqa: E402
from ducklake_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def old_neardup_candidates(lake, new_docs):
    """Round-12 neardup_candidates: single signature pass, bucket size
    via COUNT(*) OVER (PARTITION BY band, minhash)."""
    from ducklake_spark.operators.dedup_index import signatures
    from ducklake_spark.queries.dedup import MAX_LSH_BUCKET

    spark = lake.spark
    sigs_new = signatures(spark, new_docs)
    nview = f"_ab13_new_{uuid.uuid4().hex}"
    iview = f"_ab13_idx_{uuid.uuid4().hex}"
    sigs_new.createOrReplaceTempView(nview)
    lake.table("minhash_index").createOrReplaceTempView(iview)
    out = spark.sql(f"""
        WITH rows_ AS (
            SELECT doc_id, band, minhash, 0 AS is_new FROM {iview}
            UNION ALL
            SELECT doc_id, band, minhash, 1 AS is_new FROM {nview}
        ),
        sized AS (
            SELECT doc_id, band, minhash, is_new,
                   COUNT(*) OVER (PARTITION BY band, minhash) AS n
            FROM rows_
        ),
        docs_ AS (
            SELECT band, minhash, doc_id,
                   MAX(is_new) AS any_new, MAX(1 - is_new) AS any_idx
            FROM sized WHERE n BETWEEN 2 AND {MAX_LSH_BUCKET}
            GROUP BY band, minhash, doc_id
        ),
        buckets AS (
            SELECT array_sort(collect_list(
                       struct(doc_id, any_new, any_idx))) AS ds
            FROM docs_ GROUP BY band, minhash
        ),
        pairs AS (
            SELECT explode(flatten(transform(ds, (x, i) ->
                filter(transform(slice(ds, i + 2, size(ds)),
                           y -> named_struct('doc_a', x.doc_id,
                                             'doc_b', y.doc_id,
                                             'keep', x.any_new = 1 OR y.any_new = 1)),
                       p -> p.keep)))) AS p
            FROM buckets
        )
        SELECT DISTINCT p.doc_a AS doc_a, p.doc_b AS doc_b FROM pairs
    """)
    spark.catalog.dropTempView(nview)
    spark.catalog.dropTempView(iview)
    return out


def _scratch_lineitem_lake(spark, base: Path, tag: str):
    from ducklake_spark.lake import DuckLake

    d = base / f"lake_{tag}_{uuid.uuid4().hex[:8]}"
    d.mkdir(parents=True)
    lake = DuckLake.attach(spark, str(d / "meta.db"), str(d / "data"))
    src = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").repartition(16)
    lake.create_table_as("lineitem", src)
    return lake


def run_update_ab(spark, n: int):
    """Fresh scratch lake per sample; OLD = the round-12 shape emulated
    by one extra full matched.count() pass before the concurrent jobs."""
    import shutil
    import tempfile

    from ducklake_spark import dml

    base = Path(tempfile.mkdtemp(prefix="ab13_update_"))
    real_update_files = dml._update_files

    def old_update_files(lake, h, matched, assignments, where):
        matched.count()  # the pass round 13 removed
        return real_update_files(lake, h, matched, assignments, where)

    samples = {"update.old": [], "update.new": []}
    try:
        for i in range(n):
            for key, impl in (("update.old", old_update_files),
                              ("update.new", real_update_files)):
                lake = _scratch_lineitem_lake(spark, base, key)
                dml._update_files = impl
                spark.sparkContext.setJobDescription(f"{key}#{i}")
                t0 = time.time()
                nrows = dml.update(
                    lake, "lineitem", {"l_returnflag": "'U'"},
                    "l_quantity >= 49")
                samples[key].append(time.time() - t0)
                spark.sparkContext.setJobDescription(None)
                assert nrows > 0
    finally:
        dml._update_files = real_update_files
        shutil.rmtree(base, ignore_errors=True)
    return samples


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("which", nargs="*",
                    default=["dedup_index", "update", "regressions"])
    ap.add_argument("--n", type=int, default=7)
    args = ap.parse_args()
    spark = get_spark("ab_r13")
    load_tables(spark, SF_DIR)
    registry = all_queries()

    samples: dict[str, list[float]] = {}

    if "dedup_index" in args.which:
        from ducklake_spark.operators import dedup_index
        from ducklake_spark.queries.lakeq import _gate_lake

        lake, _ = _gate_lake(spark, SF_DIR)
        new_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
            "doc_id >= 250")
        o = sorted(map(tuple,
                       old_neardup_candidates(lake, new_docs).collect()))
        nw = sorted(map(tuple, dedup_index.neardup_candidates(
            lake, new_docs).collect()))
        print(f"dedup_index rows old={len(o)} new={len(nw)} equal={o == nw}")
        assert o == nw
        runs = {
            "dedup_index.old": lambda: old_neardup_candidates(
                lake, new_docs).orderBy("doc_a", "doc_b").count(),
            "dedup_index.new": lambda: dedup_index.neardup_candidates(
                lake, new_docs).orderBy("doc_a", "doc_b").count(),
        }
        for fn in runs.values():
            fn()
        for k in runs:
            samples[k] = []
        for i in range(args.n):
            for k, fn in runs.items():
                spark.sparkContext.setJobDescription(f"{k}#{i}")
                t0 = time.time()
                fn()
                samples[k].append(time.time() - t0)
                spark.sparkContext.setJobDescription(None)

    if "regressions" in args.which:
        names = ["tpch_q04", "tpch_q06", "tpch_q10"]
        for name in names:
            registry[name].run(spark, SF_DIR).count()  # warm
            samples[name] = []
        for i in range(args.n):
            for name in names:
                spark.sparkContext.setJobDescription(f"{name}#{i}")
                t0 = time.time()
                registry[name].run(spark, SF_DIR).count()
                samples[name].append(time.time() - t0)
                spark.sparkContext.setJobDescription(None)

    if "update" in args.which:
        samples.update(run_update_ab(spark, args.n))

    for k, ts in samples.items():
        print(f"{k}: median={statistics.median(ts):.3f}s "
              f"all={[round(t, 3) for t in ts]}")


if __name__ == "__main__":
    main()
