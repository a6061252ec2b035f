"""Local mirror of the driver's correctness gate.

Runs each registered query on Spark and its oracle SQL on DuckDB over
the same parquet tables, then compares row count, column names, and
order-insensitive values (columns sorted by name, rows sorted).

Usage:
    python tools/check_oracle.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import math
import sys
import time
import traceback

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm_cell(v):
    """Type-strict canonical form.

    The driver hashes concrete values, so representation differences the
    eye ignores (int vs float vs Decimal, decimal scale, float last-ulp)
    MUST be visible here: each cell becomes a (type-tag, exact-string)
    pair.  A DuckDB HUGEINT that arrow-converts to float, or a Spark
    double that differs in the last bit, fails this gate like it fails
    the driver's hash.
    """
    import datetime
    import decimal

    if v is None:
        return ("n", "")
    if isinstance(v, bool):
        return ("b", str(v))
    if isinstance(v, int):
        return ("i", str(v))
    if isinstance(v, decimal.Decimal):
        return ("d", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        return ("f", repr(v))
    if isinstance(v, datetime.datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("D", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_norm_cell(x) for x in v))
    if isinstance(v, (bytes, bytearray)):
        return ("y", bytes(v).hex())
    return (type(v).__name__, str(v))


def normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--report", help="write per-query JSON results here")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from ducklake_spark.queries import all_queries
    from ducklake_spark.session import get_spark

    queries = all_queries()
    names = args.names or sorted(queries)
    spark = get_spark("check_oracle")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    n_pass = n_fail = 0
    report: dict[str, dict] = {}
    for name in names:
        q = queries[name]
        t0 = time.time()
        try:
            sdf = q.run(spark, args.sf)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            if q.oracle is None:
                print(f"  {name}: rows-only ({len(s_rows)} rows) [no oracle] "
                      f"{time.time()-t0:.1f}s")
                report[name] = {"status": "rows-only", "rows": len(s_rows),
                                "seconds": round(time.time() - t0, 1)}
                n_pass += 1
                continue
            # fetch via Arrow, not fetchall(): fetchall() coerces DuckDB
            # HUGEINT -> python int (invisible), Arrow surfaces it as
            # Decimal — which is what a driver hashing Arrow values sees.
            tbl = con.execute(q.oracle).arrow()
            o_cols = tbl.column_names
            o_rows = [tuple(d[c] for c in o_cols) for d in tbl.to_pylist()]
            sc, sr = normalize(s_cols, s_rows)
            oc, orows = normalize(o_cols, o_rows)
            problems = []
            if sc != oc:
                problems.append(f"cols spark={sc} duck={oc}")
            if len(sr) != len(orows):
                problems.append(f"rowcount spark={len(sr)} duck={len(orows)}")
            elif sc == oc and sr != orows:
                # find first mismatching row for debugging
                for i, (a, b) in enumerate(zip(sr, orows)):
                    if a != b:
                        problems.append(f"values differ at sorted row {i}:\n"
                                        f"    spark={a}\n    duck ={b}")
                        break
            if problems:
                n_fail += 1
                print(f"✗ {name} ({time.time()-t0:.1f}s)")
                for p in problems:
                    print(f"    {p}")
                report[name] = {"status": "FAIL", "problems": problems,
                                "seconds": round(time.time() - t0, 1)}
            else:
                n_pass += 1
                print(f"✓ {name} ({len(sr)} rows, {time.time()-t0:.1f}s)")
                report[name] = {"status": "PASS", "rows": len(sr),
                                "seconds": round(time.time() - t0, 1)}
        except Exception:
            n_fail += 1
            print(f"✗ {name} EXCEPTION")
            traceback.print_exc()
            report[name] = {"status": "EXCEPTION",
                            "error": traceback.format_exc()[-500:],
                            "seconds": round(time.time() - t0, 1)}
    print(f"\n{n_pass} pass, {n_fail} fail")
    if args.report:
        import json
        with open(args.report, "w") as fh:
            json.dump({"sf": args.sf, "pass": n_pass, "fail": n_fail,
                       "queries": report}, fh, indent=1)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
