"""Randomized DML sequences vs an in-memory model.

The reference ships no property-based tests (SURVEY §5); this goes
beyond it: each scenario replays a random interleaving of insert /
delete / update / compaction / flush / inlined ops against both the
lake and a plain dict model, checking full-table equality after every
step and time-travel correctness against remembered snapshots at the
end. Seeds are fixed — failures reproduce.
"""

from __future__ import annotations

import random

import pytest

import conftest
from pyspark.sql import functions as F


def _run_scenario(spark, tmp_path, seed: int, *, inline_rows: int, inline_dels: int):
    from ducklake_spark import maintenance as maint
    from ducklake_spark.dml import delete, update
    from ducklake_spark.lake import DuckLake

    rng = random.Random(seed)
    lake = DuckLake.attach(
        spark,
        str(tmp_path / f"meta_{seed}.db"),
        str(tmp_path / f"data_{seed}"),
        data_inlining_row_limit=inline_rows,
    )
    lake.create_table("t", [("k", "int64"), ("v", "int64")])
    if inline_dels:
        lake.set_option("deletion_inlining_row_limit", str(inline_dels), table_name="t")

    model: dict[int, int] = {}
    next_k = 0
    history: list[tuple[int, dict[int, int]]] = []

    def check():
        got = {r.k: r.v for r in lake.table("t").collect()}
        assert got == model, f"seed {seed}: mismatch after op"

    for step in range(14):
        op = rng.choice(
            ["insert", "insert", "delete", "update", "merge", "compact",
             "flush", "rewrite"]
        )
        if op == "insert":
            n = rng.randint(1, 40)
            rows = [(next_k + j, rng.randint(0, 99)) for j in range(n)]
            next_k += n
            lake.insert(
                "t", spark.createDataFrame(rows, "k long, v long")
            )
            model.update(dict(rows))
        elif op == "merge":
            from ducklake_spark.dml import merge_into

            src = list(dict(
                (rng.randrange(max(next_k, 1) + 5), rng.randint(0, 99))
                for _ in range(rng.randint(1, 6))
            ).items())
            merge_into(
                lake, "t", spark.createDataFrame(src, "k long, v long"),
                ["k"], when_matched_update={"v": None},
            )
            model.update(dict(src))
            next_k = max([next_k] + [k + 1 for k, _ in src])
        elif op == "rewrite":
            maint.rewrite_data_files(lake, delete_threshold=0.3)
        elif op == "delete" and model:
            cut = rng.choice(sorted(model))
            mode = rng.choice(["<", "=", ">="])
            delete(lake, "t", f"k {mode} {cut}")
            model = {
                k: v
                for k, v in model.items()
                if not ((mode == "<" and k < cut) or (mode == "=" and k == cut)
                        or (mode == ">=" and k >= cut))
            }
        elif op == "update" and model:
            cut = rng.choice(sorted(model))
            update(lake, "t", {"v": "v + 1000"}, f"k <= {cut}")
            model = {k: (v + 1000 if k <= cut else v) for k, v in model.items()}
        elif op == "compact":
            maint.merge_adjacent_files(lake)
        elif op == "flush":
            maint.flush_inlined_data(lake)
        check()
        history.append((lake.current_snapshot(), dict(model)))

    # time travel: every remembered snapshot replays exactly
    for snap_id, snapshot_model in rng.sample(history, min(4, len(history))):
        got = {r.k: r.v for r in lake.table("t", at_version=snap_id).collect()}
        assert got == snapshot_model, f"seed {seed}: time travel @{snap_id}"
    # maintenance invariants
    assert lake.row_count("t") == len(model)


@pytest.mark.parametrize("seed", [7, 23])
def test_random_dml_parquet_only(spark, tmp_path, seed):
    _run_scenario(spark, tmp_path, seed, inline_rows=0, inline_dels=0)


def test_random_dml_with_inlining(spark, tmp_path):
    _run_scenario(spark, tmp_path, 99, inline_rows=8, inline_dels=6)


def test_random_dml_extra_stats_pruning_never_loses_rows(spark, tmp_path):
    """Geometry + variant columns under random DML/compaction: the
    bbox- and variant-stats-pruned scans must always return exactly the
    model's matching rows (pruning may only skip files that cannot
    match)."""
    import json
    import struct as _struct

    from ducklake_spark import maintenance as maint
    from ducklake_spark.dml import delete
    from ducklake_spark.lake import DuckLake

    def point(x, y):
        return _struct.pack("<BI2d", 1, 1, float(x), float(y))

    seed = 41
    rng = random.Random(seed)
    lake = DuckLake.attach(
        spark, str(tmp_path / "meta.db"), str(tmp_path / "data")
    )
    lake.create_table(
        "g", [("k", "int64"), ("geom", "geometry"), ("props", "variant")]
    )

    model: dict[int, tuple[int, int, int]] = {}  # k -> (x, y, n)
    next_k = 0

    def check():
        got = {
            r.k: (bytes(r.geom), r.props) for r in lake.table("g").collect()
        }
        want = {
            k: (point(x, y), json.dumps({"n": n}))
            for k, (x, y, n) in model.items()
        }
        assert got == want, f"seed {seed}: table mismatch"
        # random bbox window
        x0, y0 = rng.randint(-50, 50), rng.randint(-50, 50)
        box = (float(x0), float(y0), float(x0 + 30), float(y0 + 30))
        got_b = {
            r.k for r in lake.table("g", bbox={"geom": box}).collect()
        }
        want_b = {
            k for k, (x, y, _n) in model.items()
            if box[0] <= x <= box[2] and box[1] <= y <= box[3]
        }
        assert got_b == want_b, f"seed {seed}: bbox scan mismatch"
        # random variant predicate
        cut = rng.randint(0, 99)
        got_v = {
            r.k
            for r in lake.table(
                "g", variant_where=[("props", "n", ">=", cut)]
            ).collect()
        }
        want_v = {k for k, (_x, _y, n) in model.items() if n >= cut}
        assert got_v == want_v, f"seed {seed}: variant scan mismatch"

    for _step in range(10):
        op = rng.choice(["insert", "insert", "insert", "delete", "compact"])
        if op == "insert":
            n_rows = rng.randint(1, 20)
            rows = [
                (
                    next_k + j,
                    rng.randint(-60, 60),
                    rng.randint(-60, 60),
                    rng.randint(0, 99),
                )
                for j in range(n_rows)
            ]
            next_k += n_rows
            lake.insert(
                "g",
                spark.createDataFrame(
                    [(k, point(x, y), json.dumps({"n": n})) for k, x, y, n in rows],
                    "k long, geom binary, props string",
                ),
            )
            model.update({k: (x, y, n) for k, x, y, n in rows})
        elif op == "delete" and model:
            cut = rng.choice(sorted(model))
            delete(lake, "g", f"k >= {cut}")
            model = {k: v for k, v in model.items() if k < cut}
        elif op == "compact":
            maint.merge_adjacent_files(lake)
        check()


@pytest.mark.parametrize("transform", ["identity", "bucket(3)"])
def test_random_dml_partitioned(spark, tmp_path, transform):
    """Randomized DML over a partitioned table: model equality plus
    pruned-read (where=) parity with the model on every step."""
    import random

    from ducklake_spark import maintenance as maint
    from ducklake_spark.dml import delete, update
    from ducklake_spark.lake import DuckLake

    rng = random.Random(17)
    lake = DuckLake.attach(
        spark, str(tmp_path / f"m_{transform[:2]}.db"), str(tmp_path / f"d_{transform[:2]}")
    )
    lake.create_table("t", [("k", "int64"), ("p", "int64"), ("v", "int64")])
    lake.set_partitioned_by("t", [("p", transform)])
    model, next_k = {}, 0
    for _ in range(8):
        op = rng.choice(["insert", "insert", "delete", "update", "compact"])
        if op == "insert":
            n = rng.randint(1, 30)
            rows = [(next_k + j, (next_k + j) % 5, rng.randint(0, 99)) for j in range(n)]
            next_k += n
            lake.insert("t", spark.createDataFrame(rows, "k long, p long, v long"))
            model.update({r[0]: r for r in rows})
        elif op == "delete" and model:
            pv = rng.randrange(5)
            delete(lake, "t", f"p = {pv}")
            model = {k: r for k, r in model.items() if r[1] != pv}
        elif op == "update" and model:
            cut = rng.choice(sorted(model))
            update(lake, "t", {"v": "v + 7"}, f"k <= {cut}")
            model = {k: (r[0], r[1], r[2] + 7 if k <= cut else r[2])
                     for k, r in model.items()}
        elif op == "compact":
            maint.merge_adjacent_files(lake)
        got = {r.k: (r.k, r.p, r.v) for r in lake.table("t").collect()}
        assert got == model
        pv = rng.randrange(5)
        pruned = {r.k for r in lake.table("t", where=f"p = {pv}").collect()}
        assert pruned == {k for k, r in model.items() if r[1] == pv}


def test_random_schema_evolution_with_dml(spark, tmp_path):
    """Column add/rename interleaved with insert/delete/compaction:
    model equality per step, then time travel replayed with each
    snapshot's historical schema."""
    import random

    from ducklake_spark import maintenance as maint
    from ducklake_spark.dml import delete
    from ducklake_spark.lake import DuckLake

    rng = random.Random(13)
    lake = DuckLake.attach(spark, conftest.catalog_url(tmp_path), str(tmp_path / "d"))
    lake.create_table("t", [("k", "int64"), ("v", "int64")])
    cols, model, next_k, extra_i, hist = ["k", "v"], {}, 0, 0, []
    for _ in range(10):
        op = rng.choice(["insert", "insert", "delete", "add_col", "rename_col",
                         "compact"])
        if op == "insert":
            n = rng.randint(1, 20)
            rows = [
                {"k": next_k + j, **{c: rng.randint(0, 99) for c in cols[1:]}}
                for j in range(n)
            ]
            next_k += n
            lake.insert(
                "t",
                spark.createDataFrame(
                    [tuple(r[c] for c in cols) for r in rows],
                    ", ".join(f"{c} long" for c in cols),
                ),
            )
            for r in rows:
                model[r["k"]] = {c: r.get(c) for c in cols}
        elif op == "delete" and model:
            cut = rng.choice(sorted(model))
            delete(lake, "t", f"k <= {cut}")
            model = {k: r for k, r in model.items() if k > cut}
        elif op == "add_col":
            cname = f"c{extra_i}"
            extra_i += 1
            lake.add_column("t", cname, "int64")
            cols.append(cname)
            for r in model.values():
                r[cname] = None
        elif op == "rename_col" and len(cols) > 2:
            old = rng.choice(cols[1:])
            lake.rename_column("t", old, old + "r")
            cols[cols.index(old)] = old + "r"
            for r in model.values():
                r[old + "r"] = r.pop(old)
        elif op == "compact":
            maint.merge_adjacent_files(lake)
        got = {
            r["k"]: {c: r[c] for c in cols}
            for r in (row.asDict() for row in lake.table("t").collect())
        }
        assert got == {k: {c: r.get(c) for c in cols} for k, r in model.items()}
        hist.append(
            (lake.current_snapshot(), {k: dict(r) for k, r in model.items()},
             list(cols))
        )
    for sid, m, cs in rng.sample(hist, 3):
        got = {
            r["k"]: r
            for r in (row.asDict()
                      for row in lake.table("t", at_version=sid).collect())
        }
        assert {k: {c: got[k].get(c) for c in cs} for k in got} == \
            {k: {c: r.get(c) for c in cs} for k, r in m.items()}


def test_random_cdc_feed_matches_model_diffs(spark, tmp_path):
    """table_changes per commit must equal the model's diff — including
    deletes/updates of rows living in files that UPDATE wrote earlier
    (row_id_start NULL, rowid in the embedded column)."""
    import random

    from ducklake_spark.cdc import table_changes
    from ducklake_spark.dml import delete, update
    from ducklake_spark.lake import DuckLake

    rng = random.Random(501)  # this seed hit the embedded-rowid path
    lake = DuckLake.attach(spark, conftest.catalog_url(tmp_path), str(tmp_path / "d"))
    lake.create_table("t", [("k", "int64"), ("v", "int64")])
    model, next_k = {}, 0
    for _ in range(8):
        op = rng.choice(["insert", "insert", "delete", "update"])
        s0 = lake.current_snapshot()
        expected = None
        if op == "insert":
            n = rng.randint(1, 15)
            rows = [(next_k + j, rng.randint(0, 99)) for j in range(n)]
            next_k += n
            lake.insert("t", spark.createDataFrame(rows, "k long, v long"))
            model.update(dict(rows))
            expected = {(k, "insert") for k, _ in rows}
        elif op == "delete" and model:
            cut = rng.choice(sorted(model))
            delete(lake, "t", f"k <= {cut}")
            gone = {k for k in model if k <= cut}
            model = {k: v for k, v in model.items() if k > cut}
            expected = {(k, "delete") for k in gone}
        elif op == "update" and model:
            cut = rng.choice(sorted(model))
            update(lake, "t", {"v": "v + 1000"}, f"k <= {cut}")
            touched = {k for k in model if k <= cut}
            model = {k: (v + 1000 if k <= cut else v) for k, v in model.items()}
            expected = {(k, "update_preimage") for k in touched} | {
                (k, "update_postimage") for k in touched
            }
        if expected is None:
            continue
        got = {
            (r.k, r.change_type)
            for r in table_changes(lake, "t", s0 + 1, lake.current_snapshot()).collect()
        }
        assert got == expected
