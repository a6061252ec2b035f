"""Round-12 optimization regression tests.

Each test pins an internals change from the optimization round:
- the lake-scan fast path (clean tables skip the per-file overlay join;
  dirty/time-travel/virtual reads still take it and stay correct);
- the batched compaction pack read (rowids and content survive a
  multi-file merge read through one DataFrame);
- neardup_candidates' single-pass bucket grouping with
  include_new_vs_new=False (the new-vs-index-only contract).
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_scan_fast_path_and_overlay_gating(spark, tmp_path):
    import conftest
    from ducklake_spark import dml
    from ducklake_spark.lake import DuckLake

    lake = DuckLake.attach(
        spark, conftest.catalog_url(tmp_path), str(tmp_path / "data"))
    src = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("v"))
    lake.create_table_as("t", src)
    pre_delete_snap = lake.current_snapshot()

    # clean table at head: no overlay join, no per-row file-path decode
    plan = _plan(lake.table("t"))
    assert "Join" not in plan and "UrlCodec" not in plan
    assert lake.table("t").count() == 1000

    # virtual columns force the overlay (rowid needs the per-file
    # info). Round 13 replaced the small-file-set overlay JOIN with
    # literal map lookups on the decoded path, so the overlay's
    # signature in the plan is the per-row UrlCodec decode (a join
    # remains only past filemap_inline_limit).
    vplan = _plan(lake.table("t", with_virtual=True))
    assert "UrlCodec" in vplan

    # deletes force the overlay and apply (the positional anti-join
    # is a genuine join in any mode)
    dml.delete(lake, "t", "v = 0")
    live = 1000 - 1000 // 7 - 1  # ids with id%7==0 in [0,1000)
    assert lake.table("t").count() == live
    dirty_plan = _plan(lake.table("t"))
    assert "Join" in dirty_plan and "UrlCodec" in dirty_plan

    # time travel to the pre-delete snapshot sees every row
    assert lake.table("t", at_version=pre_delete_snap).count() == 1000


def test_compaction_batched_pack_read_rowids(spark, tmp_path):
    import conftest
    from ducklake_spark.lake import DuckLake
    from ducklake_spark.maintenance import merge_adjacent_files

    lake = DuckLake.attach(
        spark, conftest.catalog_url(tmp_path), str(tmp_path / "data"))
    lake.create_table_as(
        "t", spark.range(5000).select(
            F.col("id"), (F.col("id") * 3).alias("y")).repartition(8))
    merge_adjacent_files(lake)
    v = lake.table("t", with_virtual=True)
    stats = v.agg(
        F.countDistinct("rowid").alias("d"),
        F.min("rowid").alias("mn"), F.max("rowid").alias("mx"),
        F.sum("y").alias("s")).collect()[0]
    assert (stats.d, stats.mn, stats.mx) == (5000, 0, 4999)
    assert stats.s == sum(i * 3 for i in range(5000))
    # merged down to one live file
    assert v.select("filename").distinct().count() == 1


def test_neardup_candidates_index_only(spark, tmp_path):
    """include_new_vs_new=False pairs new docs against the INDEX only,
    with the bucket-size cap counted over index rows alone — the
    round-11 join semantics, now produced by the single-pass bucket
    grouping."""
    import conftest
    from ducklake_spark.lake import DuckLake
    from ducklake_spark.operators.dedup_index import (
        add_documents, create_index, neardup_candidates, signatures)
    from ducklake_spark.queries.dedup import MAX_LSH_BUCKET

    lake = DuckLake.attach(
        spark, conftest.catalog_url(tmp_path), str(tmp_path / "data"))
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    old = docs.filter("doc_id < 100")
    new = docs.filter("doc_id >= 100")
    create_index(lake)
    add_documents(lake, old)

    got = {(r.doc_a, r.doc_b) for r in neardup_candidates(
        lake, new, include_new_vs_new=False).collect()}

    # reference result straight from the definition: buckets over the
    # INDEX signatures; each new doc pairs with every index doc sharing
    # a bucket whose index-size is in [2, cap]
    idx = [(r.doc_id, r.band, r.minhash)
           for r in lake.table("minhash_index").collect()]
    sig_new = [(r.doc_id, r.band, r.minhash)
               for r in signatures(spark, new).collect()]
    from collections import defaultdict
    bucket_idx = defaultdict(set)
    for d, b, m in idx:
        bucket_idx[(b, m)].add(d)
    want = set()
    for d, b, m in sig_new:
        members = bucket_idx.get((b, m), set())
        if 2 <= len(members) <= MAX_LSH_BUCKET:
            for o in members:
                if o != d:
                    want.add((min(d, o), max(d, o)))
    assert got == want
    assert got  # corpus has cross-half near-dups
