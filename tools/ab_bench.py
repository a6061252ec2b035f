"""Interleaved A/B timing for individual bench queries in ONE warm session.

The box drifts +/-20% between processes; the only timing evidence this
repo accepts is interleaved medians inside a single warm session
(BENCH_NOTES protocol). This harness times the CURRENT working-tree
implementation of the named queries, interleaved round-robin, and
reports per-query medians.

Usage:
    python tools/ab_bench.py q1 [q2 ...] [--n 7] [--action count|noop]

``--action noop`` times df.write.format("noop") (guide section 1.4:
computes every column, no sink cost) instead of bench.py's count().
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ducklake_spark.queries import all_queries, load_tables  # noqa: E402
from ducklake_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--n", type=int, default=7)
    ap.add_argument("--action", default="count", choices=["count", "noop"])
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_bench")
    load_tables(spark, sf_dir)
    registry = all_queries()
    samples: dict[str, list[float]] = {q: [] for q in args.queries}
    # one untimed warmup pass
    for name in args.queries:
        registry[name].run(spark, sf_dir).count()
    for i in range(args.n):
        for name in args.queries:
            spark.sparkContext.setJobDescription(f"{name}#{i}")
            t0 = time.time()
            df = registry[name].run(spark, sf_dir)
            if args.action == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            samples[name].append(time.time() - t0)
            spark.sparkContext.setJobDescription(None)
    for name, ts in samples.items():
        print(
            f"{name}: median={statistics.median(ts):.3f}s "
            f"min={min(ts):.3f} max={max(ts):.3f} "
            f"all={[round(t, 3) for t in ts]}"
        )


if __name__ == "__main__":
    main()
