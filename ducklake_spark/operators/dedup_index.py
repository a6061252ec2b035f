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
    # Single-pass shape: the old form referenced the new-batch signature
    # CTE three times (the bucket-size count, the join build side and
    # the pair probe side) and Spark plans each reference as a fresh
    # subtree — the whole shingle+md5 pipeline executed 3x. Grouping
    # each (band, minhash) bucket once and emitting in-bucket pairs
    # from the sorted doc list (the batch operator's shape,
    # queries/dedup.py) computes every signature exactly once, and one
    # explicit repartition on the bucket key serves BOTH group-bys
    # (hash partitioning on (band, minhash) satisfies the per-doc
    # group's (band, minhash, doc_id) clustering too) — no window, no
    # per-bucket sort of the raw signature rows. The bucket size n is
    # per-bucket-CONSTANT, so summing the per-doc row counts and
    # filtering whole buckets in HAVING keeps exactly the rows the old
    # per-row window filter kept. Pair semantics are unchanged:
    #  - bucket size n counts the same rows the old bsize counted
    #    (index + new when include_new_vs_new, else index only);
    #  - a pair is kept iff one side is from the new batch (and, for
    #    include_new_vs_new=False, the other side is from the index);
    #  - the hot-bucket cap and the final DISTINCT are identical.
    count_expr = (
        "COUNT(*)" if include_new_vs_new else "SUM(1 - is_new)"
    )
    keep_cond = (
        "x.any_new = 1 OR y.any_new = 1"
        if include_new_vs_new
        else "(x.any_new = 1 AND y.any_idx = 1) "
             "OR (y.any_new = 1 AND x.any_idx = 1)"
    )
    out = spark.sql(f"""
        WITH rows_ AS (
            SELECT /*+ REPARTITION(band, minhash) */
                   doc_id, band, minhash, is_new FROM (
                SELECT doc_id, band, minhash, 0 AS is_new FROM {iview}
                UNION ALL
                SELECT doc_id, band, minhash, 1 AS is_new FROM {nview}
            )
        ),
        docs_ AS (
            SELECT band, minhash, doc_id,
                   MAX(is_new) AS any_new, MAX(1 - is_new) AS any_idx,
                   {count_expr} AS cnt
            FROM rows_
            GROUP BY band, minhash, doc_id
        ),
        buckets AS (
            SELECT array_sort(collect_list(
                       struct(doc_id, any_new, any_idx))) AS ds
            FROM docs_ GROUP BY band, minhash
            HAVING SUM(cnt) BETWEEN 2 AND {MAX_LSH_BUCKET}
        ),
        pairs AS (
            SELECT explode(flatten(transform(ds, (x, i) ->
                filter(transform(slice(ds, i + 2, size(ds)),
                           y -> named_struct('doc_a', x.doc_id,
                                             'doc_b', y.doc_id,
                                             'keep', {keep_cond})),
                       p -> p.keep)))) AS p
            FROM buckets
        )
        SELECT DISTINCT p.doc_a AS doc_a, p.doc_b AS doc_b FROM pairs
    """)
    # analysis has resolved both views into the plan: drop them so a
    # long-lived session doesn't accumulate one pair per call
    spark.catalog.dropTempView(nview)
    spark.catalog.dropTempView(iview)
    return out
