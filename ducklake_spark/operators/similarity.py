"""Approximate nearest-neighbor search over embedding columns.

The brute-force baseline lives in ``queries/similarity.py`` (exact,
O(n·q) — fine for probes, wrong at 100 TB). The two scale paths here
cut the candidate set before any exact distance is computed:

- **IVF** (inverted-file coarse quantization): pick C centroids,
  assign every vector to its nearest centroid (one broadcast join —
  centroids are tiny), then answer a query by scanning only the
  ``nprobe`` nearest cells. The expensive all-pairs join becomes a
  co-partitioned equi-join on ``cell_id``; at 1000 executors each
  cell's vectors shuffle once and the probe set is broadcast.

- **LSH** (sign random projection): bucket = the sign bits of P
  pseudo-random projections. Vectors agree on the bucket key with
  probability that grows with cosine similarity, so an equi-join on
  ``bucket`` yields candidates. Projections are derived from md5 so
  they are deterministic across engines and cluster restarts — no
  state to persist, no fit() step, any executor can recompute them.

Both are pure DataFrame pipelines: JVM higher-order functions for the
dot products (no Python on the hot path), equi-joins Catalyst can
plan as broadcast or shuffled-hash as sizes dictate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _maybe_broadcast_probes(
    df: DataFrame, base: DataFrame, factor: int = 1
) -> DataFrame:
    """Broadcast hint for the probe side of an ANN join, gated on a
    driver-side size estimate with a shuffle-join fallback.

    The probe side is small *by contract* (a handful of query vectors x
    nprobe), but a caller passing a huge query set must degrade to a
    slow shuffle join, not a driver/executor OOM. Catalyst's own
    estimate after the probe pipeline (cross join x window) is garbage
    — the join inflates sizeInBytes multiplicatively — so the gate
    reads the estimate of the RAW query relation (before the pipeline)
    times ``factor`` (= nprobe copies) and compares it against
    ``spark.graft.probeBroadcastBytes`` (default 256 MB). Estimates of
    genuinely large inputs are large, so the fallback errs safe; AQE
    can still broadcast at runtime if the probe side turns out tiny.
    """
    try:
        est = int(
            str(base._jdf.queryExecution().optimizedPlan().stats()
                .sizeInBytes())
        )
        limit = int(
            base.sparkSession.conf.get(
                "spark.graft.probeBroadcastBytes", str(256 << 20)
            )
        )
    except Exception:
        return df
    return F.broadcast(df) if est * max(factor, 1) <= limit else df


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns (JVM codegen)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


# --------------------------------------------------------------------------
# IVF


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "centroid",
) -> DataFrame:
    """Assign every vector to its nearest centroid (max cosine).

    ``centroids`` is expected to be small (hundreds–thousands of rows)
    and is broadcast; the cross join is C-per-row work, pruned to the
    argmax with one grouped ``max_by``. Returns ``vectors`` + ``cell_id``.

    The argmax is an aggregation, NOT a window: the C scored copies of
    each vector are born co-located (broadcast join), so map-side
    partial aggregation collapses them C->1 before the exchange — the
    shuffle carries |vectors| rows instead of C x |vectors| sorted rows
    (guide 2.3, "aggregate before you shuffle"). The ordering struct
    (__sim, -cell_id) is unique per group (each centroid scores once),
    so the result is deterministic and identical to the previous
    row_number window (ORDER BY __sim DESC, cell_id ASC): max of the
    struct is max __sim, ties broken to the smallest cell_id; NaN sorts
    greatest in both forms.
    """
    v, c = vectors.alias("v"), F.broadcast(centroids).alias("c")
    scored = v.join(c).select(
        "v.*",
        F.col(f"c.{centroid_id_col}").alias("cell_id"),
        cosine(F.col(f"v.{vec_col}"), F.col(f"c.{centroid_vec_col}")).alias("__sim"),
    )
    payload = [name for name in vectors.columns if name != id_col]
    best = F.max_by(
        F.struct(*[F.col(name) for name in payload], F.col("cell_id")),
        F.struct(F.col("__sim").alias("s"), (-F.col("cell_id")).alias("t")),
    )
    agg = scored.groupBy(id_col).agg(best.alias("__best"))
    return agg.select(
        *[
            F.col(name) if name == id_col
            else F.col(f"__best.{name}").alias(name)
            for name in vectors.columns
        ],
        F.col("__best.cell_id").alias("cell_id"),
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    *,
    k: int = 5,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF top-k: probe the ``nprobe`` nearest cells per query.

    Output: (query_id, neighbor_id, rank). Recall < 1 by construction
    (that is the point); determinism is total — centroid assignment
    and ranking tiebreak on ids.
    """
    from pyspark.sql.window import Window

    cid, cvec = "centroid_id", "centroid"
    indexed = ivf_assign(vectors, centroids, id_col=id_col, vec_col=vec_col)

    q, c = queries.alias("q"), F.broadcast(centroids).alias("c")
    probe_w = Window.partitionBy("query_id").orderBy(
        F.desc("__sim"), F.asc("cell_id")
    )
    probes = (
        q.join(c)
        .select(
            F.col(f"q.{id_col}").alias("query_id"),
            F.col(f"q.{vec_col}").alias("qvec"),
            F.col(f"c.{cid}").alias("cell_id"),
            cosine(F.col(f"q.{vec_col}"), F.col(f"c.{cvec}")).alias("__sim"),
        )
        .withColumn("__rk", F.row_number().over(probe_w))
        .filter(F.col("__rk") <= nprobe)
        .drop("__rk", "__sim")
    )

    # probes are |queries| x nprobe rows by construction — broadcast
    # them so the (huge) indexed side is NOT shuffled by cell_id; the
    # planner's size estimate after the window pipeline is way off and
    # plans a sort-merge join otherwise (both sides exchanged + sorted).
    # Gated on the raw query relation's size estimate so a huge query
    # set degrades to a shuffle join instead of an OOM.
    probes = _maybe_broadcast_probes(probes, queries, factor=nprobe)
    cand = probes.join(indexed.alias("x"), on="cell_id").filter(
        F.col("query_id") != F.col(f"x.{id_col}")
    )
    rank_w = Window.partitionBy("query_id").orderBy(
        F.desc("__sim"), F.asc(f"x.{id_col}")
    )
    return (
        cand.withColumn("__sim", cosine(F.col("qvec"), F.col(f"x.{vec_col}")))
        .withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", F.col(f"x.{id_col}").alias("neighbor_id"), "rank"
        )
    )


# --------------------------------------------------------------------------
# LSH (sign random projection)


# The projection signs are derived from md5('p<plane>_<i>') — a pure
# function of (plane, dimension index). Computing that md5 INSIDE the
# per-element lambda made every row pay dims x planes md5+conv calls
# (the optimizer cannot fold a lambda-variable-dependent expression),
# and the pushed-down isnotnull filter evaluated the whole bucket
# expression a second time. The signs are precomputed driver-side into
# one literal '+'/'-' string per plane; dimensions beyond the
# precomputed range (none in practice) keep the exact original md5
# expression as a dormant fallback, so semantics are unchanged for any
# input shape.
_SIGNS_MAX_DIM = 4096


def _plane_sign_str(plane: int) -> str:
    import functools
    import hashlib

    @functools.lru_cache(maxsize=None)
    def _cached(p: int) -> str:
        return "".join(
            "+" if int(hashlib.md5(
                f"p{p}_{i}".encode()).hexdigest()[0], 16) % 2 == 0
            else "-"
            for i in range(_SIGNS_MAX_DIM)
        )

    return _cached(plane)


def _projection_sign(vec_col: Column, plane: int) -> Column:
    """Sign bit of <v, r_plane> with r derived from md5 — deterministic,
    engine-portable, computed inline (no fitted model to ship).

    r_plane[i] = +1 if the first hex digit of md5('p<plane>_<i>') is
    even else -1.
    """
    signs = F.lit(_plane_sign_str(plane))

    def _sign_of(i: Column) -> Column:
        # exact md5 form, evaluated only for i >= _SIGNS_MAX_DIM
        slow = F.when(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"p{plane}_"), i.cast("string"))),
                    1, 1),
                16,
                10,
            ).cast("int")
            % 2
            == 0,
            F.lit(1.0),
        ).otherwise(F.lit(-1.0))
        fast = F.when(
            F.substr(signs, i + F.lit(1), F.lit(1)) == "+", F.lit(1.0)
        ).otherwise(F.lit(-1.0))
        return F.when(i < F.lit(_SIGNS_MAX_DIM), fast).otherwise(slow)

    signed = F.transform(
        vec_col, lambda x, i: x.cast("double") * _sign_of(i))
    dot = F.aggregate(signed, F.lit(0.0), lambda acc, v: acc + v)
    return (dot >= 0).cast("int")


def lsh_bucket(vec_col: Column, n_planes: int = 8) -> Column:
    """Bucket id in [0, 2^n_planes) from sign-random-projection bits."""
    bits = [
        _projection_sign(vec_col, p) * F.lit(1 << p) for p in range(n_planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH top-k: exact rerank within the query's bucket.

    One narrow map to tag buckets, one equi-join on the bucket key
    (shuffle by bucket — co-partitioned, skew-safe for n_planes ≥ 8),
    exact cosine only within candidates.
    """
    from pyspark.sql.window import Window

    tagged = vectors.withColumn("__bucket", lsh_bucket(F.col(vec_col), n_planes))
    qtagged = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        lsh_bucket(F.col(vec_col), n_planes).alias("__bucket"),
    )
    # query set is small by contract: broadcast it so the corpus side
    # joins in place instead of shuffling by bucket (size-estimate
    # gated — a huge query set falls back to the shuffle join)
    qtagged = _maybe_broadcast_probes(qtagged, queries)
    cand = qtagged.join(tagged.alias("x"), on="__bucket").filter(
        F.col("query_id") != F.col(f"x.{id_col}")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("__sim"), F.asc(f"x.{id_col}"))
    return (
        cand.withColumn("__sim", cosine(F.col("qvec"), F.col(f"x.{vec_col}")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(f"x.{id_col}").alias("neighbor_id"), "rank")
    )
