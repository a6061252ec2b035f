"""Approximate nearest-neighbor queries over ``embeddings``.

The Spark side runs the *DataFrame operator implementations* from
:mod:`ducklake_spark.operators.similarity` (IVF coarse quantization,
sign-random-projection LSH); the oracle re-derives the identical
semantics in DuckDB SQL — same centroids, same md5-seeded
projections, same id tiebreaks — so the driver hash-checks the whole
approximate pipeline, not just a brute-force reference.

Scale story vs the brute-force baseline (``sim_knn_cosine``): these
replace the O(n·q) all-pairs join with one broadcast join against a
tiny centroid/plane set plus one equi-join on the cell/bucket key, so
the candidate set per query is |cell| ≈ n/C instead of n.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ducklake_spark.queries import df_query

N_QUERIES = 10          # vec_id < 10 probe
CENT_LO, CENT_HI = 10, 18  # vec_id in [10,18) are the 8 IVF centroids
TOP_K = 5
N_PLANES = 6            # 64 LSH buckets


def _duck_cos(x: str, y: str) -> str:
    return f"""
    list_sum(list_transform(list_zip({x}, {y}),
                            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
    / (sqrt(list_sum(list_transform({x}, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
     * sqrt(list_sum(list_transform({y}, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))))
    """


def _run_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ducklake_spark.operators.similarity import ivf_topk
    from ducklake_spark.queries import load_tables

    load_tables(spark, sf_dir, ["embeddings"])
    emb = spark.table("embeddings")
    centroids = emb.filter(
        (F.col("vec_id") >= CENT_LO) & (F.col("vec_id") < CENT_HI)
    ).select(F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid"))
    probes = emb.filter(F.col("vec_id") < N_QUERIES)
    return ivf_topk(emb, probes, centroids, k=TOP_K, nprobe=1).orderBy(
        "query_id", "rank"
    )


_IVF_ORACLE = f"""
WITH cents AS (
    SELECT vec_id AS cid, embedding AS cvec FROM embeddings
    WHERE vec_id >= {CENT_LO} AND vec_id < {CENT_HI}
),
scored AS (
    SELECT e.vec_id, e.embedding, c.cid,
           ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY ({_duck_cos('e.embedding', 'c.cvec')}) DESC, c.cid
           ) AS rk
    FROM embeddings e CROSS JOIN cents c
),
cells AS (SELECT vec_id, embedding, cid FROM scored WHERE rk = 1),
probes AS (
    SELECT vec_id AS query_id, embedding AS qvec, cid
    FROM cells WHERE vec_id < {N_QUERIES}
),
ranked AS (
    SELECT p.query_id, x.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (
               PARTITION BY p.query_id
               ORDER BY ({_duck_cos('p.qvec', 'x.embedding')}) DESC, x.vec_id
           ) AS rank
    FROM probes p JOIN cells x ON x.cid = p.cid AND x.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, rank FROM ranked
WHERE rank <= {TOP_K} ORDER BY query_id, rank
"""

df_query(
    "sim_ann_ivf",
    _run_ivf,
    oracle=_IVF_ORACLE,
    tables=["embeddings"],
    doc=f"IVF ANN top-{TOP_K} (8 centroid cells, nprobe=1, broadcast centroids)",
)


def _run_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ducklake_spark.operators.similarity import lsh_topk
    from ducklake_spark.queries import load_tables

    load_tables(spark, sf_dir, ["embeddings"])
    emb = spark.table("embeddings")
    probes = emb.filter(F.col("vec_id") < N_QUERIES)
    return lsh_topk(emb, probes, k=TOP_K, n_planes=N_PLANES).orderBy(
        "query_id", "rank"
    )


def _duck_bucket(col: str) -> str:
    """64-bucket sign-random-projection key; projections derived from
    md5('p<plane>_<dim>') first-hex-digit parity — mirrors
    operators.similarity._projection_sign bit-for-bit."""
    bits = []
    for p in range(N_PLANES):
        dot = f"""
        list_sum(list_transform(range(1, len({col}) + 1),
            i -> CAST({col}[i] AS DOUBLE) *
                 CASE WHEN (strpos('0123456789abcdef',
                            substring(md5('p{p}_' || CAST(i - 1 AS VARCHAR)), 1, 1)) - 1) % 2 = 0
                      THEN 1.0 ELSE -1.0 END))
        """
        bits.append(f"(CASE WHEN ({dot}) >= 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


_LSH_ORACLE = f"""
WITH tagged AS (
    SELECT vec_id, embedding, {_duck_bucket('embedding')} AS bucket FROM embeddings
),
probes AS (
    SELECT vec_id AS query_id, embedding AS qvec, bucket
    FROM tagged WHERE vec_id < {N_QUERIES}
),
ranked AS (
    SELECT p.query_id, x.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (
               PARTITION BY p.query_id
               ORDER BY ({_duck_cos('p.qvec', 'x.embedding')}) DESC, x.vec_id
           ) AS rank
    FROM probes p JOIN tagged x ON x.bucket = p.bucket AND x.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, rank FROM ranked
WHERE rank <= {TOP_K} ORDER BY query_id, rank
"""

df_query(
    "sim_ann_lsh",
    _run_lsh,
    oracle=_LSH_ORACLE,
    tables=["embeddings"],
    doc=f"LSH ANN top-{TOP_K} ({N_PLANES} sign-projection planes, bucket equi-join)",
)


def _run_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs restricted to LSH bucket collisions: the scale
    path for all-pairs similarity (``sim_neardup_cosine``) — candidate
    generation is an equi-join on the bucket key, exact cosine only
    inside buckets."""
    from pyspark.sql import functions as F

    from ducklake_spark.operators.similarity import cosine, lsh_bucket
    from ducklake_spark.queries import load_tables

    load_tables(spark, sf_dir, ["embeddings"])
    emb = spark.table("embeddings")
    tagged = emb.select(
        "vec_id", "embedding", lsh_bucket(F.col("embedding"), N_PLANES).alias("b")
    )
    a, b = tagged.alias("a"), tagged.alias("b")
    return (
        a.join(b, (F.col("a.b") == F.col("b.b"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .filter(cosine(F.col("a.embedding"), F.col("b.embedding")) > 0.45)
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .orderBy("vec_a", "vec_b")
    )


_NEARDUP_LSH_ORACLE = f"""
WITH tagged AS (
    SELECT vec_id, embedding, {_duck_bucket('embedding')} AS b FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
FROM tagged a JOIN tagged b ON a.b = b.b AND a.vec_id < b.vec_id
WHERE ({_duck_cos('a.embedding', 'b.embedding')}) > 0.45
ORDER BY vec_a, vec_b
"""

df_query(
    "sim_neardup_lsh",
    _run_neardup_lsh,
    oracle=_NEARDUP_LSH_ORACLE,
    tables=["embeddings"],
    doc="LSH-bucketed near-duplicate pairs (cosine > 0.45 within buckets)",
)


# --- SemDeDup: semantic dedup inside coarse clusters ----------------------
# The SemDeDup recipe (Abbas et al.): cluster embeddings coarsely, then
# drop within-cluster vectors whose cosine to an earlier-kept member
# exceeds a threshold — all-pairs work is bounded to |cell|², never
# corpus². Threshold 0.45 is calibrated to the synthetic corpus (max
# pairwise cosine ≈ 0.51); real corpora use ~0.95+. The oracle
# re-derives cells and pair decisions in DuckDB SQL, so the driver
# hash-checks assignment + dedup logic end-to-end.

SEM_THRESH = 0.45


def _run_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ducklake_spark.operators.similarity import cosine, ivf_assign
    from ducklake_spark.queries import load_tables

    load_tables(spark, sf_dir, ["embeddings"])
    emb = spark.table("embeddings")
    centroids = emb.filter(
        (F.col("vec_id") >= CENT_LO) & (F.col("vec_id") < CENT_HI)
    ).select(F.col("vec_id").alias("centroid_id"),
             F.col("embedding").alias("centroid"))
    cells = ivf_assign(emb.select("vec_id", "embedding"), centroids)
    a, b = cells.alias("a"), cells.alias("b")
    dup_of = (
        a.join(b, (F.col("a.cell_id") == F.col("b.cell_id"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .filter(cosine(F.col("a.embedding"), F.col("b.embedding"))
                >= SEM_THRESH)
        .groupBy(F.col("b.vec_id").alias("vec_id"))
        .agg(F.min("a.vec_id").alias("dup_of"))
    )
    return (
        cells.join(dup_of, "vec_id", "left")
        .groupBy("cell_id")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(F.when(F.col("dup_of").isNull(), 1).otherwise(0))
            .alias("n_kept"),
        )
        .orderBy("cell_id")
    )


_SEM_ORACLE = f"""
WITH cents AS (
    SELECT vec_id AS cid, embedding AS cvec FROM embeddings
    WHERE vec_id >= {CENT_LO} AND vec_id < {CENT_HI}
),
scored AS (
    SELECT e.vec_id, e.embedding, c.cid,
           ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY ({_duck_cos('e.embedding', 'c.cvec')}) DESC, c.cid
           ) AS rk
    FROM embeddings e CROSS JOIN cents c
),
cells AS (SELECT vec_id, embedding, cid FROM scored WHERE rk = 1),
dup AS (
    SELECT b.vec_id, MIN(a.vec_id) AS dup_of
    FROM cells a JOIN cells b
      ON a.cid = b.cid AND a.vec_id < b.vec_id
    WHERE ({_duck_cos('a.embedding', 'b.embedding')}) >= {SEM_THRESH}
    GROUP BY b.vec_id
)
SELECT c.cid AS cell_id,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(CASE WHEN d.dup_of IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_kept
FROM cells c LEFT JOIN dup d ON d.vec_id = c.vec_id
GROUP BY c.cid
ORDER BY c.cid
"""

df_query(
    "sim_semantic_dedup",
    _run_semantic_dedup,
    oracle=_SEM_ORACLE,
    tables=["embeddings"],
    doc="SemDeDup: coarse IVF clustering then within-cell cosine dedup "
        "(keep min vec_id) — all-pairs bounded to cell size, never corpus",
)
