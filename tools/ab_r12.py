"""Round-12 interleaved A/B: OLD (round-11) vs NEW implementations of the
three restructured operators, in ONE warm session, median-of-N.

The old implementations are inlined here verbatim (they are self-
contained SQL / DataFrame pipelines), so both sides run in the same
process against the same warmed inputs — the only timing protocol that
survives this box's +/-20% ambient drift (BENCH_NOTES).

Usage: python tools/ab_r12.py [--n 7] [which ...]
       which in {dedup_index, ivf, sessionize}
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


# ---------------------------------------------------------------- old impls

def old_neardup_candidates(lake, new_docs):
    """Round-11 neardup_candidates (3 references to the sig pipeline)."""
    from ducklake_spark.operators.dedup_index import signatures
    from ducklake_spark.queries.dedup import MAX_LSH_BUCKET

    spark = lake.spark
    sigs_new = signatures(spark, new_docs)
    nview = f"_ab_old_new_{uuid.uuid4().hex}"
    iview = f"_ab_old_idx_{uuid.uuid4().hex}"
    sigs_new.createOrReplaceTempView(nview)
    lake.table("minhash_index").createOrReplaceTempView(iview)
    both = (
        f"SELECT doc_id, band, minhash FROM {iview} "
        f"UNION ALL SELECT * FROM {nview}"
    )
    out = spark.sql(f"""
        WITH others AS ({both}),
        bsize AS (
            SELECT band, minhash, COUNT(*) AS n
            FROM others GROUP BY band, minhash
        ),
        pairs AS (
            SELECT LEAST(n.doc_id, o.doc_id) AS doc_a,
                   GREATEST(n.doc_id, o.doc_id) AS doc_b
            FROM {nview} n
            JOIN bsize z ON z.band = n.band AND z.minhash = n.minhash
                        AND z.n BETWEEN 2 AND {MAX_LSH_BUCKET}
            JOIN others o ON o.band = n.band AND o.minhash = n.minhash
                         AND o.doc_id <> n.doc_id
        )
        SELECT DISTINCT doc_a, doc_b FROM pairs
    """)
    spark.catalog.dropTempView(nview)
    spark.catalog.dropTempView(iview)
    return out


def old_ivf_assign(vectors, centroids):
    from pyspark.sql.window import Window

    from ducklake_spark.operators.similarity import cosine

    v, c = vectors.alias("v"), F.broadcast(centroids).alias("c")
    scored = v.join(c).select(
        "v.*",
        F.col("c.centroid_id").alias("cell_id"),
        cosine(F.col("v.embedding"), F.col("c.centroid")).alias("__sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("__sim"), F.asc("cell_id"))
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter("__rk = 1")
        .drop("__rk", "__sim")
    )


def old_ivf_topk(spark):
    from pyspark.sql.window import Window

    from ducklake_spark.operators.similarity import cosine
    from ducklake_spark.queries.ann import CENT_HI, CENT_LO, N_QUERIES, TOP_K

    emb = spark.table("embeddings")
    centroids = emb.filter(
        (F.col("vec_id") >= CENT_LO) & (F.col("vec_id") < CENT_HI)
    ).select(F.col("vec_id").alias("centroid_id"),
             F.col("embedding").alias("centroid"))
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    indexed = old_ivf_assign(emb, centroids)
    q, c = queries.alias("q"), F.broadcast(centroids).alias("c")
    probe_w = Window.partitionBy("query_id").orderBy(
        F.desc("__sim"), F.asc("cell_id"))
    probes = (
        q.join(c)
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("q.embedding").alias("qvec"),
            F.col("c.centroid_id").alias("cell_id"),
            cosine(F.col("q.embedding"), F.col("c.centroid")).alias("__sim"),
        )
        .withColumn("__rk", F.row_number().over(probe_w))
        .filter(F.col("__rk") <= 1)
        .drop("__rk", "__sim")
    )
    cand = probes.join(indexed.alias("x"), on="cell_id").filter(
        F.col("query_id") != F.col("x.vec_id"))
    rank_w = Window.partitionBy("query_id").orderBy(
        F.desc("__sim"), F.asc("x.vec_id"))
    return (
        cand.withColumn("__sim", cosine(F.col("qvec"), F.col("x.embedding")))
        .withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", F.col("x.vec_id").alias("neighbor_id"), "rank")
        .orderBy("query_id", "rank")
    )


OLD_SESSIONIZE = """
    WITH flagged AS (
        SELECT
            user_id,
            ts,
            CASE
                WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
                WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     > INTERVAL 30 MINUTE THEN 1
                ELSE 0
            END AS new_session
        FROM events
    ),
    sessions AS (
        SELECT
            user_id,
            SUM(new_session) OVER (
                PARTITION BY user_id ORDER BY ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS session_id
        FROM flagged
    )
    SELECT user_id,
           COUNT(DISTINCT session_id) AS n_sessions,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id
    ORDER BY user_id
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("which", nargs="*",
                    default=["dedup_index", "ivf", "sessionize"])
    ap.add_argument("--n", type=int, default=7)
    args = ap.parse_args()
    spark = get_spark("ab_r12")
    load_tables(spark, SF_DIR)
    registry = all_queries()

    runs = {}
    if "dedup_index" in args.which:
        from ducklake_spark.operators import dedup_index
        from ducklake_spark.queries.lakeq import _gate_lake

        lake, _ = _gate_lake(spark, SF_DIR)
        new_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
            "doc_id >= 250")
        runs["dedup_index.old"] = lambda: old_neardup_candidates(
            lake, new_docs).orderBy("doc_a", "doc_b").count()
        runs["dedup_index.new"] = lambda: dedup_index.neardup_candidates(
            lake, new_docs).orderBy("doc_a", "doc_b").count()
    if "ivf" in args.which:
        runs["ivf.old"] = lambda: old_ivf_topk(spark).count()
        runs["ivf.new"] = lambda: registry["sim_ann_ivf"].run(
            spark, SF_DIR).count()
    if "sessionize" in args.which:
        runs["sessionize.old"] = lambda: spark.sql(OLD_SESSIONIZE).count()
        runs["sessionize.new"] = lambda: registry["ev_sessionize"].run(
            spark, SF_DIR).count()

    # correctness cross-check first (old vs new must be row-identical)
    if "dedup_index" in args.which:
        from ducklake_spark.operators import dedup_index
        from ducklake_spark.queries.lakeq import _gate_lake

        lake, _ = _gate_lake(spark, SF_DIR)
        new_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
            "doc_id >= 250")
        o = sorted(map(tuple, old_neardup_candidates(lake, new_docs).collect()))
        n = sorted(map(tuple, dedup_index.neardup_candidates(
            lake, new_docs).collect()))
        print(f"dedup_index rows old={len(o)} new={len(n)} equal={o == n}")
        assert o == n
    if "ivf" in args.which:
        o = sorted(map(tuple, old_ivf_topk(spark).collect()))
        n = sorted(map(tuple,
                       registry["sim_ann_ivf"].run(spark, SF_DIR).collect()))
        print(f"ivf rows old={len(o)} new={len(n)} equal={o == n}")
        assert o == n
    if "sessionize" in args.which:
        o = sorted(map(tuple, spark.sql(OLD_SESSIONIZE).collect()))
        n = sorted(map(tuple,
                       registry["ev_sessionize"].run(spark, SF_DIR).collect()))
        print(f"sessionize rows old={len(o)} new={len(n)} equal={o == n}")
        assert o == n

    # warmup each once, then interleave
    for fn in runs.values():
        fn()
    samples = {k: [] for k in runs}
    for i in range(args.n):
        for k, fn in runs.items():
            spark.sparkContext.setJobDescription(f"{k}#{i}")
            t0 = time.time()
            fn()
            samples[k].append(time.time() - t0)
            spark.sparkContext.setJobDescription(None)
    for k, ts in samples.items():
        print(f"{k}: median={statistics.median(ts):.3f}s "
              f"all={[round(t, 3) for t in ts]}")


if __name__ == "__main__":
    main()
