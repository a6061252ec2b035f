"""Unit tests for the scale-path operators (ANN, multimodal, as-of)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_ivf_assign_covers_all_vectors(emb):
    from ducklake_spark.operators.similarity import ivf_assign

    centroids = emb.filter("vec_id >= 10 AND vec_id < 18").select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid")
    )
    assigned = ivf_assign(emb, centroids)
    assert assigned.count() == emb.count()  # exactly one cell per vector
    cells = {r.cell_id for r in assigned.select("cell_id").distinct().collect()}
    assert cells <= set(range(10, 18))
    # a centroid's own vector must land in its own cell (cos=1 maximum)
    own = assigned.filter("vec_id >= 10 AND vec_id < 18")
    assert all(r.vec_id == r.cell_id for r in own.collect())


def test_ivf_topk_matches_bruteforce_within_cell(emb, spark):
    from ducklake_spark.operators.similarity import cosine, ivf_topk

    centroids = emb.filter("vec_id >= 10 AND vec_id < 18").select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid")
    )
    probes = emb.filter("vec_id < 3")
    out = ivf_topk(emb, probes, centroids, k=5, nprobe=1).collect()
    assert {r.query_id for r in out} <= {0, 1, 2}
    for qid in {r.query_id for r in out}:
        ranks = sorted(r.rank for r in out if r.query_id == qid)
        assert ranks == list(range(1, len(ranks) + 1))
        assert all(r.neighbor_id != qid for r in out if r.query_id == qid)


def test_lsh_bucket_is_deterministic(emb):
    from ducklake_spark.operators.similarity import lsh_bucket

    tagged = emb.select("vec_id", lsh_bucket(F.col("embedding"), 6).alias("b"))
    a = {r.vec_id: r.b for r in tagged.collect()}
    b = {r.vec_id: r.b for r in tagged.collect()}
    assert a == b
    assert all(0 <= v < 64 for v in a.values())
    assert len(set(a.values())) > 8  # projections actually spread the space


def test_multimodal_image_features_schema_and_determinism(docs):
    from ducklake_spark.operators.multimodal import (
        _decode_image_fake,
        attach_fake_media,
        image_features,
    )

    media = attach_fake_media(docs.limit(20))
    feats = image_features(media).collect()
    assert len(feats) == 20
    row = {r.doc_id: r for r in feats}
    src = {r.doc_id: r.text for r in docs.limit(20).collect()}
    for did, r in row.items():
        img = _decode_image_fake(src[did].encode()).astype(float)
        assert r.mean_intensity == pytest.approx(img.mean())
        assert r.byte_len == len(src[did].encode())


def test_multimodal_frame_bytes_cross_arrow_boundary(docs):
    from ducklake_spark.operators.multimodal import attach_fake_media, sample_frames

    media = attach_fake_media(docs.limit(5))
    frames = sample_frames(media, every=10).collect()
    src = {r.doc_id: r.text.encode() for r in docs.limit(5).collect()}
    for fr in frames:
        expect = hashlib.sha256(src[fr.doc_id] + f"#{fr.frame_idx}".encode()).digest()
        assert bytes(fr.frame) == expect


def test_multimodal_real_codec_is_explicit_stub(docs):
    from ducklake_spark.operators.multimodal import _decode_image_real

    with pytest.raises(NotImplementedError):
        _decode_image_real(b"\x89PNG")


def test_asof_join_backward(spark):
    from ducklake_spark.operators.asof import asof_join

    trades = spark.createDataFrame(
        [("A", 10, 100.0), ("A", 20, 101.0), ("B", 15, 50.0)],
        "sym string, t long, px double",
    )
    quotes = spark.createDataFrame(
        [("A", 5, 99.0), ("A", 12, 100.5), ("A", 25, 102.0), ("B", 20, 51.0)],
        "sym string, t long, bid double",
    )
    out = asof_join(trades, quotes, on="sym", time_col="t").collect()
    got = {(r.sym, r.t): r.bid_right for r in out}
    assert got == {("A", 10): 99.0, ("A", 20): 100.5, ("B", 15): None}


def test_range_join_buckets(spark):
    import datetime as dt

    from ducklake_spark.operators.asof import range_join

    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, base), (2, base + dt.timedelta(hours=3))], "id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(10, base + dt.timedelta(minutes=30)), (11, base + dt.timedelta(hours=5))],
        "rid long, rts timestamp",
    )
    out = range_join(
        left,
        right,
        left_time="ts",
        right_time="rts",
        lower=F.expr("INTERVAL 0 seconds"),
        upper=F.expr("INTERVAL 1 hour"),
        bucket="1 hour",
    ).collect()
    assert {(r.id, r.rid) for r in out} == {(1, 10)}


def test_incremental_neardup_index_matches_batch(spark, tmp_path):
    import conftest
    from ducklake_spark.lake import DuckLake

    lake = DuckLake.attach(
        spark, conftest.catalog_url(tmp_path), str(tmp_path / "data"))
    """The persisted-index incremental path emits EXACTLY the pairs a
    batch LSH over the combined corpus emits for pairs involving a new
    document — same signatures, same bucket cap — without recomputing
    any old document's shingles."""
    from ducklake_spark.operators.dedup_index import (
        add_documents,
        create_index,
        neardup_candidates,
    )
    from ducklake_spark.queries.dedup import _minhash_sql

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    old = docs.filter("doc_id < 250")
    new = docs.filter("doc_id >= 250")
    create_index(lake)
    assert add_documents(lake, old) > 0

    inc = {(r.doc_a, r.doc_b)
           for r in neardup_candidates(lake, new).collect()}
    # _minhash_sql reads the `documents` view, which the shared-session
    # query registry also owns (memoized per sf_dir in queries._LOADED).
    # Register our sf0.01 frame AND purge the memo entry so the next
    # load_tables() caller re-registers its own sf rather than silently
    # reading this test's data (broke test_oracle_parity[dedup_*]).
    import ducklake_spark.queries as Q

    docs.createOrReplaceTempView("documents")
    Q._LOADED.get(spark.sparkContext.applicationId, {}).pop("documents", None)
    batch = {(r.doc_a, r.doc_b)
             for r in spark.sql(_minhash_sql("spark")).collect()}
    new_ids = {r.doc_id for r in new.select("doc_id").collect()}
    want = {p for p in batch if p[0] in new_ids or p[1] in new_ids}
    assert inc == want
    assert inc  # the synthetic corpus has cross-half near-dups

    # the index is a normal lake table: band-partitioned, time-travels
    add_documents(lake, new)
    idx = lake.table("minhash_index")
    assert idx.count() == docs.count() * 8
    assert idx.filter("band = 3").count() == docs.count()


def test_persisted_ivf_index_prunes_and_matches(spark, tmp_path):
    """The lake-persisted IVF index returns the same top-k as the
    in-memory IVF operator over the same vectors + centroid choice,
    incremental adds assign against the frozen centroids, and the
    probed scan reads only the probed cells' files (metadata-level
    partition pruning, checked via the pruned file list)."""
    import conftest
    from ducklake_spark.lake import DuckLake
    from ducklake_spark.operators import ann_index
    from ducklake_spark.operators.similarity import ivf_topk

    lake = DuckLake.attach(
        spark, conftest.catalog_url(tmp_path), str(tmp_path / "data"))
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding")
    first = emb.filter("vec_id < 40")
    second = emb.filter("vec_id >= 40")
    n1 = ann_index.build_ivf_index(lake, first, n_cells=4)
    assert n1 == first.count()
    ann_index.add_vectors(lake, second)

    queries = emb.filter("vec_id IN (1, 17, 33)")
    got = {(r.query_id, r.neighbor_id, r.rank)
           for r in ann_index.topk(lake, queries, k=3, nprobe=2).collect()}
    centroids = lake.table("ivf_centroids")
    want = {(r.query_id, r.neighbor_id, r.rank)
            for r in ivf_topk(emb, queries, centroids, k=3, nprobe=2)
            .collect()}
    assert got == want and got

    # pruning: a single-cell predicate keeps only that cell's files
    h = lake._handle("ivf_cells")
    snap = lake.meta.latest_snapshot()
    all_files = lake._visible_files(h, snap, None)
    one_cell = lake._visible_files(h, snap, "cell_id = %d" % (
        centroids.collect()[0].centroid_id))
    assert len(one_cell) < len(all_files)


def test_semantic_dedup_drops_synthetic_duplicates(spark):
    """With genuinely near-duplicate vectors injected, the SemDeDup
    query keeps the min-id member per duplicate group within a cell."""
    from pyspark.sql import functions as F

    from ducklake_spark.operators.similarity import cosine, ivf_assign

    base = [float(i % 7) + 1.0 for i in range(8)]
    near = [v * 1.001 for v in base]  # cosine ~1.0 with base
    other = [1.0 if i == 0 else 0.0 for i in range(8)]
    emb = spark.createDataFrame(
        [(1, base), (2, near), (3, other), (10, base), (11, other)],
        "vec_id long, embedding array<float>")
    cents = spark.createDataFrame(
        [(10, base), (11, other)],
        "centroid_id long, centroid array<float>")
    cells = ivf_assign(emb, cents)
    a, b = cells.alias("a"), cells.alias("b")
    dups = (a.join(b, (F.col("a.cell_id") == F.col("b.cell_id"))
                   & (F.col("a.vec_id") < F.col("b.vec_id")))
            .filter(cosine(F.col("a.embedding"), F.col("b.embedding"))
                    >= 0.99)
            .select(F.col("a.vec_id").alias("keep"),
                    F.col("b.vec_id").alias("drop")).collect())
    got = {(r.keep, r.drop) for r in dups}
    # 1,2,10 are mutual near-dups in the `base` cell; 3,11 are identical
    assert (1, 2) in got and (1, 10) in got and (2, 10) in got
    assert (3, 11) in got
    groups = ({1, 2, 10}, {3, 11})
    assert all(any(k in g and d in g for g in groups) for k, d in got)
