"""Round-13 optimization regression tests.

Each test pins an internals change (or hardens a round-12 one):
- ann_index.topk reads all probed cells through ONE pruned scan
  (cell_id IN (...)) instead of one DataFrame per cell, and its probe
  broadcast is gated on a row limit with a shuffle-join fallback;
- the similarity operators' probe broadcasts are gated on a size
  estimate (spark.graft.probeBroadcastBytes) with the same fallback;
- neardup_candidates' bucket sizing runs as aggregation (no window
  sort over the raw signature rows);
- UPDATE's concurrent writer thread drains cleanly when the
  delete-apply half fails, leaving the transaction aborted and the
  table untouched;
- the lake-scan fast path is exact at the time-travel boundary
  read_snap == partial_max (vacuous filter) and one below it
  (overlay filter required).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def _build_small_ivf(spark, tmp_path):
    import conftest
    from ducklake_spark.lake import DuckLake
    from ducklake_spark.operators import ann_index

    lake = DuckLake.attach(
        spark, conftest.catalog_url(tmp_path), str(tmp_path / "data"))
    emb = spark.range(40).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 5).cast("float"),
            (F.col("id") % 3).cast("float"),
            F.lit(1.0).cast("float"),
        ).alias("embedding"),
    )
    ann_index.build_ivf_index(lake, emb, n_cells=4)
    queries = emb.filter("vec_id < 3")
    return lake, queries


def test_ann_topk_single_cell_scan(spark, tmp_path):
    """All probed cells read through ONE scan node (cell_id IN (...)),
    not one unioned scan per cell."""
    from ducklake_spark.operators import ann_index

    lake, queries = _build_small_ivf(spark, tmp_path)
    df = ann_index.topk(lake, queries, k=3, nprobe=2)
    plan = _plan(df)
    import re

    cell_scans = [
        blk for blk in re.split(r"\n\n", plan)
        if re.match(r"\(\d+\) Scan parquet", blk) and "_cells" in blk
    ]
    # the formatted detail lists each scan node once; the cells table
    # must appear as exactly one scan regardless of nprobe, with the
    # IN-list pushed into it
    assert len(cell_scans) == 1, plan
    assert "In(cell_id" in cell_scans[0], cell_scans[0]
    assert "BroadcastHashJoin" in plan  # probes still broadcast
    assert df.count() > 0


def test_ann_topk_broadcast_gate_falls_back(spark, tmp_path):
    """probe_broadcast_row_limit=0 forces the non-broadcast join path;
    results must be identical to the broadcast path."""
    from ducklake_spark.operators import ann_index

    lake, queries = _build_small_ivf(spark, tmp_path)
    want = sorted(
        map(tuple, ann_index.topk(lake, queries, k=3, nprobe=2).collect()))
    lake.set_option("probe_broadcast_row_limit", "0")
    try:
        got_df = ann_index.topk(lake, queries, k=3, nprobe=2)
        got = sorted(map(tuple, got_df.collect()))
    finally:
        lake.set_option("probe_broadcast_row_limit", "1000000")
    assert got == want and got


def test_similarity_probe_broadcast_gate(spark):
    """spark.graft.probeBroadcastBytes=0 drops the broadcast hint on
    the probe side of ivf_topk/lsh_topk; rows are unchanged."""
    from ducklake_spark.operators.similarity import ivf_topk, lsh_topk

    emb = spark.range(60).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 7).cast("float"),
            (F.col("id") % 4).cast("float"),
            F.lit(1.0).cast("float"),
        ).alias("embedding"),
    )
    cents = emb.filter("vec_id >= 50").select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid"))
    queries = emb.filter("vec_id < 3")

    ivf_want = sorted(map(tuple, ivf_topk(
        emb, queries, cents, k=3, nprobe=2).collect()))
    lsh_want = sorted(map(tuple, lsh_topk(
        emb, queries, k=3, n_planes=4).collect()))
    # the gate controls the HINT (the planner may still auto-broadcast
    # small sides on its own — that is the intended fallback behavior)
    from ducklake_spark.operators.similarity import _maybe_broadcast_probes

    def _has_hint(df):
        return "hint" in df._jdf.queryExecution().logical().toString().lower()

    assert _has_hint(_maybe_broadcast_probes(queries, queries))
    spark.conf.set("spark.graft.probeBroadcastBytes", "0")
    try:
        assert not _has_hint(_maybe_broadcast_probes(queries, queries))
        ivf_df = ivf_topk(emb, queries, cents, k=3, nprobe=2)
        lsh_df = lsh_topk(emb, queries, k=3, n_planes=4)
        assert sorted(map(tuple, ivf_df.collect())) == ivf_want
        assert sorted(map(tuple, lsh_df.collect())) == lsh_want
    finally:
        spark.conf.unset("spark.graft.probeBroadcastBytes")
    assert ivf_want and lsh_want


def test_neardup_candidates_plan_has_no_window(spark, tmp_path):
    """Bucket sizing is an aggregation now — the plan must carry no
    Window node and at most one exchange keyed on the bucket before
    the pair emission (plus the final DISTINCT's)."""
    import conftest
    from ducklake_spark.lake import DuckLake
    from ducklake_spark.operators.dedup_index import (
        add_documents, create_index, neardup_candidates)

    lake = DuckLake.attach(
        spark, conftest.catalog_url(tmp_path), str(tmp_path / "data"))
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    create_index(lake)
    add_documents(lake, docs.filter("doc_id < 100"))
    df = neardup_candidates(lake, docs.filter("doc_id >= 100"))
    plan = _plan(df)
    assert "Window" not in plan, plan
    assert df.count() > 0


def test_update_writer_thread_drains_on_delete_apply_failure(
        spark, tmp_path, monkeypatch):
    """Inject a failure into the delete-apply half of UPDATE while the
    replacement-file writer runs on its thread: the transaction must
    abort cleanly (no partial registration), the writer must drain,
    and the table must be updatable afterwards."""
    import conftest
    from ducklake_spark import dml
    from ducklake_spark.lake import DuckLake

    lake = DuckLake.attach(
        spark, conftest.catalog_url(tmp_path), str(tmp_path / "data"))
    lake.create_table_as(
        "t", spark.range(2000).select(
            F.col("id"), (F.col("id") % 10).alias("v")))
    # force the file path (no inline probe) so the concurrent
    # writer-thread + delete-apply shape actually runs
    lake.set_option("data_inlining_row_limit", "0", table_name="t")
    before = sorted(map(tuple, lake.table("t").collect()))

    real = dml._apply_file_deletes

    def boom(*a, **k):
        raise RuntimeError("injected delete-apply failure")

    monkeypatch.setattr(dml, "_apply_file_deletes", boom)
    with pytest.raises(RuntimeError, match="injected"):
        dml.update(lake, "t", {"v": "v + 100"}, "v = 3")
    monkeypatch.setattr(dml, "_apply_file_deletes", real)

    # aborted cleanly: content unchanged, no stray rows or files
    assert sorted(map(tuple, lake.table("t").collect())) == before
    # and the path still works end to end
    n = dml.update(lake, "t", {"v": "v + 100"}, "v = 3")
    assert n == 200
    assert lake.table("t").filter("v = 103").count() == 200


def test_fast_path_time_travel_partial_max_boundary(spark, tmp_path):
    """A compacted file spanning snapshots s1..s2 (partial_max == s2):
    reading AT s2 takes the fast path (the embedded-snapshot filter is
    provably vacuous) and sees both batches; reading at s1 takes the
    overlay and sees only the first batch."""
    import conftest
    from ducklake_spark.lake import DuckLake
    from ducklake_spark.maintenance import merge_adjacent_files

    lake = DuckLake.attach(
        spark, conftest.catalog_url(tmp_path), str(tmp_path / "data"))
    lake.create_table_as("t", spark.range(100).select(F.col("id")))
    s1 = lake.current_snapshot()
    lake.insert("t", spark.range(100, 250).select(F.col("id")))
    s2 = lake.current_snapshot()
    merge_adjacent_files(lake)

    # the merged file must actually span history (partial_max == s2),
    # otherwise this test pins nothing
    pms = [pm for (pm,) in lake.meta.query(
        "SELECT partial_max FROM ducklake_data_file "
        "WHERE table_id=? AND end_snapshot IS NULL",
        (lake._handle("t").table_id,))]
    assert pms == [s2]

    at_head = lake.table("t")
    assert at_head.count() == 250
    assert "Join" not in _plan(at_head)
    assert "UrlCodec" not in _plan(at_head)

    at_s2 = lake.table("t", at_version=s2)
    assert at_s2.count() == 250
    # read_snap == partial_max: filter vacuous, fast path taken
    assert "Join" not in _plan(at_s2)
    assert "UrlCodec" not in _plan(at_s2)

    at_s1 = lake.table("t", at_version=s1)
    # read_snap < partial_max: overlay filter required and correct.
    # The overlay's per-file info now comes from a literal map lookup
    # on the decoded path (no join below filemap_inline_limit), so its
    # plan signature is the UrlCodec decode feeding the snapshot filter
    s1_plan = _plan(at_s1)
    assert "UrlCodec" in s1_plan
    assert at_s1.count() == 100
    assert at_s1.agg(F.max("id")).collect()[0][0] == 99


def test_filemap_inline_vs_join_paths_identical(spark, tmp_path):
    """The literal-map overlay (filemap_inline_limit >= #files) and the
    broadcast-join overlay (limit 0) must return identical rows for a
    virtual-column read over a deleted + compacted table, and the
    inline plan must carry no join for the file-info lookup."""
    import conftest
    from ducklake_spark import dml
    from ducklake_spark.lake import DuckLake
    from ducklake_spark.maintenance import merge_adjacent_files

    lake = DuckLake.attach(
        spark, conftest.catalog_url(tmp_path), str(tmp_path / "data"))
    lake.create_table_as(
        "t", spark.range(3000).select(
            F.col("id"), (F.col("id") % 13).alias("v")).repartition(4))
    merge_adjacent_files(lake)
    dml.delete(lake, "t", "v = 5")

    def rows():
        return sorted(map(tuple, lake.table("t", with_virtual=True).select(
            "id", "v", "rowid", "snapshot_id", "file_row_number").collect()))

    inline = rows()
    plan_inline = _plan(lake.table("t", with_virtual=True))
    lake.set_option("filemap_inline_limit", "0")
    try:
        joined = rows()
        plan_join = _plan(lake.table("t", with_virtual=True))
    finally:
        lake.set_option("filemap_inline_limit", "16")
    assert inline == joined and inline
    # join mode has the LeftOuter fmap join; inline mode only the
    # positional-delete anti-join
    assert plan_join.count("Join") > plan_inline.count("Join")


def test_lsh_literal_signs_match_md5_expression(spark):
    """The precomputed sign-string bucket equals the original
    md5-in-lambda bucket for ragged arrays of every size."""
    from ducklake_spark.operators.similarity import lsh_bucket

    def old_sign(vec_col, plane):
        signed = F.transform(
            vec_col,
            lambda x, i: x.cast("double")
            * F.when(
                F.conv(
                    F.substring(F.md5(F.concat(
                        F.lit(f"p{plane}_"), i.cast("string"))), 1, 1),
                    16, 10).cast("int") % 2 == 0,
                F.lit(1.0)).otherwise(F.lit(-1.0)))
        dot = F.aggregate(signed, F.lit(0.0), lambda acc, v: acc + v)
        return (dot >= 0).cast("int")

    def old_bucket(vec_col, n_planes):
        bits = [old_sign(vec_col, p) * F.lit(1 << p)
                for p in range(n_planes)]
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return out

    df = spark.range(300).select(
        F.transform(
            F.sequence(F.lit(0), (F.col("id") % 97 + 1).cast("int")),
            lambda i: F.rand(7) * 2 - 1).alias("v"))
    bad = df.select(
        (lsh_bucket(F.col("v"), 8) == old_bucket(F.col("v"), 8)).alias("eq")
    ).filter("NOT eq").count()
    assert bad == 0
