"""Similarity search over the ``embeddings`` table (array<float>, 64-d).

Brute-force cosine top-k is the baseline (exact, O(n·q)); the scale
path lives in ``ducklake_spark.operators.similarity`` (LSH-bucketed
variant). Query outputs are id/rank-only: float similarity values are
used for ordering but never emitted, so last-ulp accumulation-order
differences between engines cannot break the oracle hash (ranking
flips would need two cosines within ~1e-12, i.e. duplicate vectors,
which the vec_id tiebreak resolves identically in both engines).

Spark side uses higher-order functions (zip_with/aggregate) — JVM
codegen, no Python UDF.
"""

from __future__ import annotations

from ducklake_spark.queries import sql_query

N_QUERIES = 10  # vec_id < 10 are the probe vectors
TOP_K = 5

_SPARK_COS = """
    aggregate(zip_with(a.embedding, b.embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
              CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)
    / (sqrt(aggregate(transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                      CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))
     * sqrt(aggregate(transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                      CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)))
"""

_DUCK_COS = """
    list_sum(list_transform(list_zip(a.embedding, b.embedding),
                            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
    / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
     * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
"""


# Spark-side pair cosine over PRE-NORMALIZED rows: the all-pairs join
# evaluates the cosine per PAIR, so computing each row's norm inside the
# pair expression does |a|x|b| norm evaluations where |a|+|b| suffice.
# The normed CTE computes sqrt(sum(x^2)) once per row; the pair
# expression divides by (a.nrm * b.nrm) — the identical float operation
# tree (sqrt per side, then multiply), so every cosine is bit-identical
# to the inline form and the ranking/threshold semantics cannot move.
_SPARK_NORMED = """
    normed AS (
        SELECT *,
               sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                              CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)) AS nrm
        FROM embeddings
    )
"""

_SPARK_COS_PRE = """
    aggregate(zip_with(a.embedding, b.embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
              CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)
    / (a.nrm * b.nrm)
"""


def _knn_sql(cos: str, *, spark_normed: bool = False) -> str:
    src = "normed" if spark_normed else "embeddings"
    with_cte = f"WITH {_SPARK_NORMED}" if spark_normed else ""
    return f"""
    {with_cte}
    SELECT query_id, neighbor_id, rank
    FROM (
        SELECT
            a.vec_id AS query_id,
            b.vec_id AS neighbor_id,
            ROW_NUMBER() OVER (
                PARTITION BY a.vec_id
                ORDER BY ({cos}) DESC, b.vec_id
            ) AS rank
        FROM {src} a
        JOIN {src} b ON a.vec_id < {N_QUERIES} AND b.vec_id <> a.vec_id
    ) ranked
    WHERE rank <= {TOP_K}
    ORDER BY query_id, rank
    """


sql_query(
    "sim_knn_cosine",
    _knn_sql(_SPARK_COS_PRE, spark_normed=True),
    oracle=_knn_sql(_DUCK_COS),
    tables=["embeddings"],
    doc=f"brute-force cosine top-{TOP_K} for {N_QUERIES} probe vectors (id/rank output)",
)


def _neardup_sql(cos: str, *, spark_normed: bool = False) -> str:
    src = "normed" if spark_normed else "embeddings"
    with_cte = f"WITH {_SPARK_NORMED}" if spark_normed else ""
    return f"""
    {with_cte}
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM {src} a
    JOIN {src} b ON a.vec_id < b.vec_id
    WHERE ({cos}) > 0.45
    ORDER BY vec_a, vec_b
    """


sql_query(
    "sim_neardup_cosine",
    _neardup_sql(_SPARK_COS_PRE, spark_normed=True),
    oracle=_neardup_sql(_DUCK_COS),
    tables=["embeddings"],
    doc="embedding near-duplicate pairs (cosine > 0.45, all-pairs)",
)


def _label_knn_sql(cos: str, *, spark_normed: bool = False) -> str:
    src = "normed" if spark_normed else "embeddings"
    with_cte = f"WITH {_SPARK_NORMED}" if spark_normed else ""
    return f"""
    {with_cte}
    SELECT query_id, rank, neighbor_label
    FROM (
        SELECT
            a.vec_id AS query_id,
            b.label AS neighbor_label,
            ROW_NUMBER() OVER (
                PARTITION BY a.vec_id
                ORDER BY ({cos}) DESC, b.vec_id
            ) AS rank
        FROM {src} a
        JOIN {src} b ON a.vec_id < {N_QUERIES} AND b.vec_id <> a.vec_id
    ) ranked
    WHERE rank <= {TOP_K}
    ORDER BY query_id, rank
    """


sql_query(
    "sim_knn_label_vote",
    _label_knn_sql(_SPARK_COS_PRE, spark_normed=True),
    oracle=_label_knn_sql(_DUCK_COS),
    tables=["embeddings"],
    doc="kNN label lookup (classification-style vote inputs)",
)
