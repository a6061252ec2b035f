"""Persisted IVF (inverted-file) ANN index in the lake.

The in-memory IVF operator (:mod:`similarity`) re-assigns every
vector on every query run. At 100 TB the assignment is the expensive
pass, so a production index persists it: centroids and per-vector
cell assignments live as lake tables, new vectors assign
incrementally against the FROZEN centroids (one broadcast join per
batch), and a query scans only its ``nprobe`` cells — which the lake
serves via identity-partition pruning on ``cell_id``, so the scan
reads only the probed cells' files (verifiable in the metadata file
listing, not just the Spark plan).

Centroid choice is deterministic (the ``n_cells`` vectors with the
smallest ``md5(vec_id)`` — a fixed pseudo-random sample, stable
across engines and restarts), so index builds are reproducible and
the regression test can compare the incremental path to a from-
scratch batch run exactly.

Tables:
- ``<prefix>_centroids``: (centroid_id BIGINT, centroid list<float32>)
- ``<prefix>_cells``: (vec_id BIGINT, cell_id BIGINT,
  embedding list<float32>), identity-partitioned by ``cell_id``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ducklake_spark.operators.similarity import cosine, ivf_assign


def build_ivf_index(
    lake,
    vectors: DataFrame,
    *,
    n_cells: int = 16,
    prefix: str = "ivf",
) -> int:
    """Create the centroid + cell tables and index ``vectors``
    (columns ``vec_id``, ``embedding``). Returns indexed row count."""
    centroids = (
        vectors.select(
            F.col("vec_id").alias("centroid_id"),
            F.col("embedding").alias("centroid"),
        )
        .orderBy(F.md5(F.col("centroid_id").cast("string")), "centroid_id")
        .limit(n_cells)
    )
    lake.create_table(
        f"{prefix}_centroids",
        [("centroid_id", "int64"), ("centroid", "list<float32>")],
    )
    lake.insert(f"{prefix}_centroids", centroids)
    lake.create_table(
        f"{prefix}_cells",
        [("vec_id", "int64"), ("cell_id", "int64"),
         ("embedding", "list<float32>")],
    )
    lake.set_partitioned_by(f"{prefix}_cells", [("cell_id", "identity")])
    return add_vectors(lake, vectors, prefix=prefix)


def add_vectors(lake, vectors: DataFrame, *, prefix: str = "ivf") -> int:
    """Incrementally index a new vector batch against the frozen
    centroids (one broadcast assign + one partitioned append)."""
    centroids = lake.table(f"{prefix}_centroids")
    assigned = ivf_assign(vectors, centroids).select(
        "vec_id", F.col("cell_id").cast("long").alias("cell_id"), "embedding"
    )
    return lake.insert(f"{prefix}_cells", assigned)


def topk(
    lake,
    queries: DataFrame,
    *,
    k: int = 5,
    nprobe: int = 2,
    prefix: str = "ivf",
) -> DataFrame:
    """(query_id, neighbor_id, rank): exact cosine rerank inside the
    ``nprobe`` nearest cells per query. The cell scan goes through
    ``lake.table(where=...)`` so identity-partition pruning drops
    every unprobed cell's files before Spark plans the scan."""
    from pyspark.sql.window import Window

    centroids = F.broadcast(lake.table(f"{prefix}_centroids"))
    probe_w = Window.partitionBy("query_id").orderBy(
        F.desc("__sim"), F.asc("cell_id")
    )
    probes = (
        queries.alias("q")
        .join(centroids.alias("c"))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("q.embedding").alias("qvec"),
            F.col("c.centroid_id").alias("cell_id"),
            cosine(F.col("q.embedding"), F.col("c.centroid")).alias("__sim"),
        )
        .withColumn("__rk", F.row_number().over(probe_w))
        .filter(F.col("__rk") <= nprobe)
        .drop("__rk", "__sim")
    )
    # the probed cell set is tiny (|queries| x nprobe distinct ids):
    # push it into the scan as a partition-pruning predicate. One
    # grouped collect yields both the distinct cells AND the probe row
    # count (for the broadcast gate below) — no extra action.
    cell_rows = probes.groupBy("cell_id").count().collect()
    cells = sorted(int(r["cell_id"]) for r in cell_rows)
    n_probe_rows = sum(int(r["count"]) for r in cell_rows)
    if not cells:
        return probes.select(
            "query_id", F.lit(None).cast("long").alias("neighbor_id"),
            F.lit(0).alias("rank"),
        ).limit(0)
    # ONE pruned scan for every probed cell: the predicate compiler
    # prunes IN-lists file-by-file (identity partitioning keeps each
    # cell in its own files), so a single cell_id IN (...) read plans
    # one scan node instead of one DataFrame per cell — O(1) driver
    # analysis passes instead of O(nprobe)
    in_list = ", ".join(str(c) for c in cells)
    indexed = lake.table(f"{prefix}_cells", where=f"cell_id IN ({in_list})")
    # probes are |queries| x nprobe rows by construction — broadcast
    # them so the pruned cell scan is NOT shuffled by cell_id; a huge
    # caller-supplied query set must not OOM the driver, so the hint is
    # gated on the exact probe row count (same limit pattern as
    # delete_broadcast_row_limit) with a shuffle-join fallback
    bcast_limit = int(
        lake.meta.option("probe_broadcast_row_limit", "1000000") or 0
    )
    if n_probe_rows <= bcast_limit:
        probes = F.broadcast(probes)
    cand = probes.join(indexed.alias("x"), on="cell_id").filter(
        F.col("query_id") != F.col("x.vec_id")
    )
    rank_w = Window.partitionBy("query_id").orderBy(
        F.desc("__sim"), F.asc("x.vec_id")
    )
    return (
        cand.withColumn("__sim", cosine(F.col("qvec"), F.col("x.embedding")))
        .withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("x.vec_id").alias("neighbor_id"), "rank")
    )
