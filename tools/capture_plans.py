"""Capture .explain("formatted") for bench queries into plans/<round>/
(round from $PLANS_ROUND, default r13).

Usage:
    python tools/capture_plans.py before [query ...]
    python tools/capture_plans.py after  [query ...]

With no query names, captures every query in bench.py's BENCH_QUERIES.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import BENCH_QUERIES  # noqa: E402
from ducklake_spark.queries import all_queries, load_tables  # noqa: E402
from ducklake_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or BENCH_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = (Path(__file__).resolve().parents[1] / "plans"
               / os.environ.get("PLANS_ROUND", "r13"))
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("capture_plans")
    load_tables(spark, sf_dir)
    registry = all_queries()
    for name in names:
        q = registry[name]
        df = q.run(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{tag}.txt").write_text(plan)
        print(f"wrote {name}_{tag}.txt ({plan.count('Exchange')} Exchange)")


if __name__ == "__main__":
    main()
