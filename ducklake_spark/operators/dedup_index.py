"""Incremental near-duplicate index persisted in the lake.

Production near-dup at 100 TB is not a batch job over the whole
corpus: signatures are computed ONCE per document at ingest and
persisted, and each new batch deduplicates against the index with a
band-bucket equi-join — no recomputation over old text, no all-pairs
work. This module maintains a ``(doc_id, band, minhash)`` lake table
(N_BANDS rows per document, identity-partitioned by band so a band's
buckets prune to one partition) and answers "which new documents
collide with the existing corpus" incrementally.

The signature pipeline is the SAME SQL the batch operator and its
DuckDB oracle run (queries/dedup.py: one md5 per shingle,
Kirsch-Mitzenmacher band hashes, wide grouped MIN then stack) — so
index-driven candidates are bit-identical to a batch re-run, which
the regression test asserts.

Scale shape: signatures shuffle |docs| rows (map-side partial MIN
over shingles); the candidate join is an equi-join on (band, minhash)
against an index that Spark shuffles by the same key; the hot-bucket
cap from the batch path applies identically.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession

from ducklake_spark.queries.dedup import (
    MAX_LSH_BUCKET,
    N_BANDS,
    _SPARK_SHINGLES_DUP,
    _spark_sig_wide,
)

INDEX_SCHEMA = [("doc_id", "int64"), ("band", "int32"), ("minhash", "int64")]


def signatures(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """(doc_id, band, minhash) MinHash signatures for ``docs``
    (columns ``doc_id``, ``text``) — N_BANDS rows per document."""
    view = f"_dedup_idx_docs_{uuid.uuid4().hex}"
    docs.createOrReplaceTempView(view)
    sql = (
        f"WITH {_SPARK_SHINGLES_DUP}, {_spark_sig_wide()} "
        "SELECT doc_id, CAST(band AS INT) AS band, minhash FROM sig"
    ).replace("FROM documents", f"FROM {view}")
    out = spark.sql(sql)  # analysis resolves the view eagerly ...
    spark.catalog.dropTempView(view)  # ... so it can drop right away
    return out


def create_index(lake, *, table: str = "minhash_index") -> None:
    """Create the signature index table, identity-partitioned by band."""
    lake.create_table(table, INDEX_SCHEMA)
    lake.set_partitioned_by(table, [("band", "identity")])


def add_documents(lake, docs: DataFrame, *, table: str = "minhash_index") -> int:
    """Compute and persist signatures for a new document batch; one
    lake snapshot. Returns the number of index rows written."""
    return lake.insert(table, signatures(lake.spark, docs))


def neardup_candidates(
    lake,
    new_docs: DataFrame,
    *,
    table: str = "minhash_index",
    include_new_vs_new: bool = True,
) -> DataFrame:
    """Candidate near-dup pairs for a NEW batch against the persisted
    corpus index (plus, by default, within the new batch itself),
    without recomputing any old document's signature.

    Returns DISTINCT (doc_a, doc_b) with doc_a < doc_b — the same pair
    set a batch LSH over (corpus ∪ new) would emit for pairs that
    involve at least one new document, including the hot-bucket cap
    (bucket size measured over the COMBINED corpus, exactly like the
    batch operator)."""
    spark = lake.spark
    sigs_new = signatures(spark, new_docs)
    nview = f"_dedup_idx_new_{uuid.uuid4().hex}"
    iview = f"_dedup_idx_idx_{uuid.uuid4().hex}"
    sigs_new.createOrReplaceTempView(nview)
    lake.table(table).createOrReplaceTempView(iview)
    both = (
        f"SELECT doc_id, band, minhash FROM {iview} "
        f"UNION ALL SELECT * FROM {nview}"
        if include_new_vs_new
        else f"SELECT doc_id, band, minhash FROM {iview}"
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
    # analysis has resolved both views into the plan: drop them so a
    # long-lived session doesn't accumulate one pair per call
    spark.catalog.dropTempView(nview)
    spark.catalog.dropTempView(iview)
    return out
