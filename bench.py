"""Benchmark harness: runs the headline query suite on Spark.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Env:
    SPARK_GRAFT_SF_DIR  (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS    (default 32)
    BENCH_REPEAT        (default 1; median reported when >1)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from ducklake_spark.queries import all_queries  # noqa: E402
from ducklake_spark.session import get_spark  # noqa: E402

# Headline set: the full TPC-H-style suite + one representative per
# analytics/dedup/text/similarity family (the expensive all-pairs
# similarity queries are bounded separately).
BENCH_QUERIES = [
    *[f"tpch_q{i:02d}" for i in range(1, 23)],
    "ev_hourly_rollup",
    "ev_sessionize",
    "ev_topk_users",
    "doc_token_stats",
    "doc_lang_id",
    "dedup_exact",
    "dedup_minhash_lsh",
    "sim_knn_cosine",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeat = int(os.environ.get("BENCH_REPEAT", "1"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_spark("bench")
    registry = all_queries()

    # Untimed warmup: registers every input table once (footer reads)
    # and runs one cheap scan+filter+agg so JVM/codegen startup is not
    # billed to the first timed query. Steady-state is what the
    # median-of-N protocol in BASELINE.md measures.
    from ducklake_spark.queries import load_tables

    load_tables(spark, sf_dir)
    registry["tpch_q06"].run(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        q = registry[name]
        # warm the input cache once (file listing, schema inference)
        samples = []
        for _ in range(repeat):
            t0 = time.time()
            df = q.run(spark, sf_dir)
            n = df.count()  # materialize fully
            samples.append(time.time() - t0)
        timings[name] = round(statistics.median(samples), 4)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "suite_total_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
