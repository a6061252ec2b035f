"""Round-13 interleaved A/B #2: the small-filemap rewrite.

Modes:
    victims   noop-sink the DELETE victims scan (overlay read with
              virtual filename/pos) under three interleaved configs:
                inline   literal-map lookups (filemap_inline_limit=64)
                join1    broadcast join, 1-slice local DF (limit=0)
                join32   broadcast join, default createDataFrame
                         (the round-12 shape)
    ops       full delete_10pct / update_2pct on fresh scratch lakes,
              interleaved inline (new) vs join32 (round-12 shape)

Usage: python tools/ab_r13b.py [--n 7] [victims ops]
"""

from __future__ import annotations

import argparse
import os
import shutil
import statistics
import sys
import tempfile
import time
import uuid
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from ducklake_spark import dml, maintenance as maint  # noqa: E402
from ducklake_spark import lake as lake_mod  # noqa: E402
from ducklake_spark.lake import DuckLake  # noqa: E402
from ducklake_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_real_local_df = lake_mod._local_df


def _local_df_32slice(spark, rows, schema):
    """The round-12 shape: default-parallelism createDataFrame."""
    return spark.createDataFrame(list(rows), schema)


def _mk_lake(spark, base, tag):
    d = base / f"lake_{tag}_{uuid.uuid4().hex[:8]}"
    d.mkdir(parents=True)
    lake = DuckLake.attach(spark, str(d / "meta.db"), str(d / "data"))
    src = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").repartition(16)
    lake.create_table_as("lineitem", src)
    maint.merge_adjacent_files(lake)
    return lake


def run_victims(spark, n):
    base = Path(tempfile.mkdtemp(prefix="ab13b_v_"))
    lake = _mk_lake(spark, base, "victims")
    h = lake._handle("lineitem")
    snap = lake._resolve_snapshot(None, None)
    where = "l_quantity < 5"
    files = dml._live_files(lake, h, snap, where)
    schema = lake._spark_schema(h)
    dels = lake._delete_entries(
        h, snap, [f["data_file_id"] for f in files], txn_overlay=True)

    def build():
        df = lake._read_files(h, snap, files, schema, dels,
                              with_virtual=True)
        return df.filter(where).select(
            F.col("filename"), F.col("file_row_number").alias("pos"))

    configs = {
        "victims.inline": ("64", _real_local_df),
        "victims.join1": ("0", _real_local_df),
        "victims.join32": ("0", _local_df_32slice),
    }
    samples = {k: [] for k in configs}
    # warm each once
    for key, (limit, ldf) in configs.items():
        lake.set_option("filemap_inline_limit", limit)
        lake_mod._local_df = ldf
        build().write.format("noop").mode("overwrite").save()
    for i in range(n):
        for key, (limit, ldf) in configs.items():
            lake.set_option("filemap_inline_limit", limit)
            lake_mod._local_df = ldf
            spark.sparkContext.setJobDescription(f"{key}#{i}")
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            samples[key].append(time.time() - t0)
            spark.sparkContext.setJobDescription(None)
    lake_mod._local_df = _real_local_df
    lake.set_option("filemap_inline_limit", "64")
    shutil.rmtree(base, ignore_errors=True)
    return samples


def run_ops(spark, n):
    base = Path(tempfile.mkdtemp(prefix="ab13b_o_"))
    samples = {"delete.inline": [], "delete.join32": [],
               "update.inline": [], "update.join32": []}
    try:
        for i in range(n):
            for mode, limit, ldf in (
                    ("inline", "64", _real_local_df),
                    ("join32", "0", _local_df_32slice)):
                lake = _mk_lake(spark, base, mode)
                lake.set_option("filemap_inline_limit", limit)
                lake_mod._local_df = ldf
                spark.sparkContext.setJobDescription(f"delete.{mode}#{i}")
                t0 = time.time()
                nd = dml.delete(lake, "lineitem", "l_quantity < 5")
                samples[f"delete.{mode}"].append(time.time() - t0)
                spark.sparkContext.setJobDescription(f"update.{mode}#{i}")
                t0 = time.time()
                nu = dml.update(lake, "lineitem", {"l_returnflag": "'U'"},
                                "l_quantity >= 49")
                samples[f"update.{mode}"].append(time.time() - t0)
                spark.sparkContext.setJobDescription(None)
                assert nd > 0 and nu > 0
    finally:
        lake_mod._local_df = _real_local_df
        shutil.rmtree(base, ignore_errors=True)
    return samples


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("which", nargs="*", default=["victims", "ops"])
    ap.add_argument("--n", type=int, default=7)
    args = ap.parse_args()
    spark = get_spark("ab_r13b")
    samples: dict[str, list[float]] = {}
    if "victims" in args.which:
        samples.update(run_victims(spark, args.n))
    if "ops" in args.which:
        samples.update(run_ops(spark, args.n))
    for k, ts in samples.items():
        print(f"{k}: median={statistics.median(ts):.3f}s "
              f"all={[round(t, 3) for t in ts]}", flush=True)


if __name__ == "__main__":
    main()
