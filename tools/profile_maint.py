"""Per-phase wall-clock profile of the maintenance suite (guide §1).

Builds the same scratch lake as bench.py's _bench_maintenance (same
warmup), runs insert -> compact -> delete -> update -> rewrite ->
full_scan, and prints, for each op, the total and the time spent inside
the wrapped internals (write/commit/read/apply), so the dominant phase
is measured instead of guessed.

Usage: python tools/profile_maint.py [--repeat 1]
"""

from __future__ import annotations

import argparse
import functools
import os
import shutil
import sys
import tempfile
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from ducklake_spark import dml, maintenance as maint  # noqa: E402
from ducklake_spark.lake import DuckLake  # noqa: E402
from ducklake_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

ACC: dict[str, list[float]] = defaultdict(lambda: [0, 0.0])


def _wrap(obj, name: str, label: str):
    fn = getattr(obj, name)

    @functools.wraps(fn)
    def timed(*a, **k):
        t0 = time.time()
        try:
            return fn(*a, **k)
        finally:
            acc = ACC[label]
            acc[0] += 1
            acc[1] += time.time() - t0

    setattr(obj, name, timed)


def _dump(op: str, total: float):
    parts = "  ".join(
        f"{k}={v[1]:.3f}s/{v[0]}x" for k, v in sorted(ACC.items()) if v[0]
    )
    print(f"{op}: total={total:.3f}s  {parts}", flush=True)
    ACC.clear()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeat", type=int, default=1)
    args = ap.parse_args()
    spark = get_spark("profile_maint")

    _wrap(DuckLake, "_write_parquet", "write_parquet")
    _wrap(DuckLake, "_autocommit", "commit")
    _wrap(DuckLake, "_read_files", "read_files")
    _wrap(maint, "_rewrite_pack", "rewrite_pack")
    _wrap(maint, "_rewrite_victims_pack", "victims_pack")
    _wrap(dml, "_write_delete_files_distributed", "write_del_files")
    _wrap(dml, "_apply_file_deletes_fused", "apply_deletes")
    _wrap(dml, "_delete_inlined", "delete_inlined")

    for it in range(args.repeat):
        scratch = tempfile.mkdtemp(prefix="prof_lake_")
        try:
            warm = DuckLake.attach(
                spark, f"{scratch}/warm_meta.db", f"{scratch}/warm_data")
            warm.create_table_as(
                "w", spark.range(1000).select(
                    F.col("id"), (F.col("id") % 7).alias("v")))
            dml.delete(warm, "w", "v = 0")
            dml.update(warm, "w", {"v": "v + 1"}, "v = 1")
            ACC.clear()

            lake = DuckLake.attach(
                spark, f"{scratch}/meta.db", f"{scratch}/data")
            src = spark.read.parquet(
                f"{SF_DIR}/lineitem.parquet").repartition(16)

            t0 = time.time()
            lake.create_table_as("lineitem", src)
            _dump("insert", time.time() - t0)

            t0 = time.time()
            maint.merge_adjacent_files(lake)
            _dump("compact", time.time() - t0)

            t0 = time.time()
            dml.delete(lake, "lineitem", "l_quantity < 5")
            _dump("delete_10pct", time.time() - t0)

            t0 = time.time()
            dml.update(
                lake, "lineitem", {"l_returnflag": "'U'"},
                "l_quantity >= 49")
            _dump("update_2pct", time.time() - t0)

            t0 = time.time()
            maint.rewrite_data_files(lake, delete_threshold=0.05)
            _dump("rewrite", time.time() - t0)

            t0 = time.time()
            n = lake.table("lineitem").count()
            _dump(f"full_scan({n})", time.time() - t0)
        finally:
            shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
