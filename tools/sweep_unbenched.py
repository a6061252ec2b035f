"""Time every registered query OUTSIDE bench.py's timed set (the
clickbench / pipeline / tpch-tail / text / multimodal families) at
sf0.1, warm, median-of-N — the round-13 plan-audit sweep (VERDICT
item 10). Prints a sorted table; the slowest get .explain dumps via
tools/capture_plans.py.

Usage: python tools/sweep_unbenched.py [--n 3] [--top 12]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import BENCH_QUERIES  # noqa: E402
from ducklake_spark.queries import all_queries, load_tables  # noqa: E402
from ducklake_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--top", type=int, default=12)
    args = ap.parse_args()
    spark = get_spark("sweep_unbenched")
    registry = all_queries()
    load_tables(spark, SF_DIR)
    names = [n for n in registry if n not in BENCH_QUERIES]
    print(f"# {len(names)} unbenched queries", flush=True)
    meds: dict[str, float] = {}
    for name in names:
        q = registry[name]
        try:
            q.run(spark, SF_DIR).count()  # warm (plans + input cache)
            ts = []
            for i in range(args.n):
                spark.sparkContext.setJobDescription(f"{name}#{i}")
                t0 = time.time()
                q.run(spark, SF_DIR).count()
                ts.append(time.time() - t0)
                spark.sparkContext.setJobDescription(None)
            meds[name] = statistics.median(ts)
        except Exception as e:  # pragma: no cover - sweep robustness
            print(f"{name}: FAILED {e}", flush=True)
    for name, med in sorted(meds.items(), key=lambda kv: -kv[1]):
        print(f"{med:8.3f}s  {name}", flush=True)
    print("# top candidates:",
          " ".join(n for n, _ in sorted(
              meds.items(), key=lambda kv: -kv[1])[: args.top]),
          flush=True)


if __name__ == "__main__":
    main()
