#!/usr/bin/env python3
"""Build SLT_MANIFEST.json — the triaged state of the reference's
sqllogictest corpus against this engine.

Input: a full-sweep report from tools/slt_runner.py (--dir test/sql
--report). Every FAIL must either be fixed or appear in
DOCUMENTED_DIVERGENCES below with an adjudicated reason; an
unadjudicated FAIL makes this script exit non-zero, so the manifest
cannot be regenerated around an unexplained regression.

Usage:
    python tools/slt_runner.py --dir test/sql --report sweep.json
    python tools/slt_manifest.py sweep.json > SLT_MANIFEST.json
"""

from __future__ import annotations

import json
import sys

# FAILs adjudicated as known divergences — each entry is a deliberate
# engineering decision, not an unexplained failure.
DOCUMENTED_DIVERGENCES: dict[str, str] = {
    "test/sql/delete/delete_legacy_missing_mapping_after_rename_add_files.test": (
        "legacy v0.3 files with neither a name mapping nor parquet field "
        "ids would need a per-file footer probe inside the scan hot path "
        "to detect name-resolution fallback; at cluster scale that is a "
        "driver-side footer read per data file per scan. Re-adopting the "
        "files via ducklake_add_data_files restores them. Deliberate "
        "scale trade-off."),
    "test/sql/compaction/merge_adjacent_external_hive_paths.test": (
        "the reference stores ducklake_data_file.path relative to the "
        "TABLE directory; this engine stores it relative to the data "
        "root. The test pins an anchored 'source=audio/...' regex on the "
        "raw catalog path. All data/path joins are consistent internally; "
        "changing the storage convention is a catalog migration, tracked "
        "as future work. The compaction behavior itself (canonical hive "
        "output paths, external files preserved) passes."),
    "test/sql/general/paths.test": (
        "same path-namespace convention as merge_adjacent_external_"
        "hive_paths.test: ducklake_table.path stores data-root-relative "
        "('main/test/'), the reference stores schema-relative "
        "('test/'). Internally consistent; migration tracked."),
    "test/sql/general/default_path.test": (
        "same path-namespace convention as general/paths.test."),
    "test/sql/settings/parquet_compression.test": (
        "parquet-mr (Spark's writer) encodes V2 strings as "
        "DELTA_BYTE_ARRAY; duckdb's writer uses DELTA_LENGTH_BYTE_ARRAY. "
        "The encoding choice is not configurable in parquet-mr. Readers "
        "handle both; the test pins the writer's encoding name."),
    "test/sql/schema_evolution/field_ids.test": (
        "the reference's ducklake_column catalog assigns a field id to "
        "EVERY schema node (struct children, list elements) in DFS "
        "order and stamps them all into parquet; this engine's catalog "
        "stores dotted struct-LEAF child rows (c2.n1) with their own id "
        "sequence — top-level and struct-leaf ids are stable and id-"
        "resolved on scan, but intermediate/list-element nodes carry no "
        "ids, so the pinned per-node id listing differs. Changing the "
        "catalog shape is a cross-cutting migration of the stats/"
        "evolution machinery, tracked as future work; schema evolution "
        "itself (rename/add/drop fields) passes the corpus."),
    "test/sql/add_files/add_files_type_check_string_blob.test": (
        "the reference accepts only Json-converted_type parquet into a "
        "JSON column; neither pip duckdb (writes UTF8 for ::JSON) nor "
        "pyarrow 16 (no pa.json_) can WRITE that annotation, so the "
        "json fixture is indistinguishable from the string fixture and "
        "this engine accepts both (string/blob sections all pass; only "
        "the json-section negative check diverges)."),
    "test/sql/add_files/add_files_complex_nested_stats_mre.test": (
        "expects per-file stats rows for LIST-element / nested-struct "
        "leaf ids (the reference's per-node DFS column ids); this "
        "engine's catalog stores dotted struct-leaf child rows only — "
        "same class as schema_evolution/field_ids.test."),
    "test/sql/add_files/add_files_type_check_integer.test": (
        "adopting a MIX of uint8..uint64 files into one UHUGEINT "
        "(DECIMAL(38,0)) column: Spark's vectorized parquet reader "
        "cannot up-cast unsigned physicals to decimal in one fixed "
        "read schema. Homogeneous unsigned adoption passes; the mixed "
        "UHUGEINT read is the single diverging step."),
    "test/sql/add_files/add_files_type_check_timestamp.test": (
        "TIME columns run as BIGINT micros-since-midnight (Spark 4.1's "
        "TimeType cannot be cast to, written to parquet, or used in "
        "most expressions), so a raw SELECT of a TIME column shows the "
        "micros int, not duckdb's clock text. All the adoption "
        "accept/reject checks in this file pass; only the one raw TIME "
        "display row diverges. Stats/catalog text renders clock form."),
    "test/sql/stats/min_max_nested_leaf_rewrite_corruption.test": (
        "the functional guard passes (s.a keeps [1,100] after flush + "
        "rewrite; files never wrongly pruned) — the residual diff is "
        "the pinned per-node column-id listing: the reference ids "
        "EVERY schema node incl. list elements / map key+value (ids "
        "5,7,8), this engine's catalog ids struct leaves only. Same "
        "class as schema_evolution/field_ids.test."),
    "test/sql/stats/variant_mixed_type_stats.test": (
        "the stats semantics pass (per-file shredded rows int32/"
        "varchar, global min/max+extra_stats dropped on inconsistent "
        "roots, sticky invalidation, stats(v) SHREDDED/INCONSISTENT "
        "display) — the residual diff is duckdb's VARIANT value "
        "RENDERING: this engine stores VARIANT as JSON text, so "
        "SELECT v shows '{\"a\": 1}' where duckdb shows {'a': 1}, and "
        "ORDER BY v::VARCHAR sorts the JSON text form."),
    "test/sql/geo/ducklake_geometry_nested_struct.test": (
        "data, display, bbox harvest and stats(g) child rendering all "
        "pass — the residual diff is the per-file stats ROW SHAPE: the "
        "reference emits one stats row (the geometry leaf, carrying "
        "the bbox), this engine emits the struct parent row (bbox) "
        "plus the dotted leaf row. Same per-node-id catalog class as "
        "schema_evolution/field_ids.test."),
    "test/sql/geo/ducklake_geometry_nested_map.test": (
        "map<int, geometry>: data, display and bbox harvest pass; "
        "stats(g) needs the map KEY leaf's min/max, which duckdb holds "
        "only in its in-memory statistics — this catalog records no "
        "stats rows for map key/value leaves (same class as "
        "field_ids.test), so the nested stats text cannot be derived."),
    "test/sql/types/timestamp.test": (
        "duckdb's 'infinity'/'-infinity' TIMESTAMP sentinels have no "
        "Spark representation (TimestampNTZ is bounded); casting "
        "raises. Finite-timestamp behavior in the file passes via the "
        "other statements."),
    "test/sql/types/variant.test": (
        "VARIANT is stored as JSON text: duckdb's per-value type tags "
        "(INT32 vs DATE vs VARCHAR) do not survive, so variant_typeof "
        "returns coarser classes and typed display/order differ. "
        "Mixed-literal VALUES, nested inserts, shredded stats, "
        "subfield pruning and global-stat merges all pass elsewhere "
        "(variant_shredded_stats sections, appender_variant_stats)."),
    "test/sql/data_inlining/data_inlining_variant.test": (
        "same JSON-text VARIANT representation class as "
        "types/variant.test (variant_typeof granularity)."),
    "test/sql/stats/variant_shredded_stats.test": (
        "stats(col) display, per-file shredded rows and global merges "
        "pass; the residual diff is ORDER BY over variant values "
        "(duckdb orders typed values, this engine orders the JSON "
        "text) — same representation class as types/variant.test."),
    "test/sql/data_inlining/data_inlining_types.test": (
        "same TIME/TIMETZ raw-display class as "
        "add_files_type_check_timestamp.test, plus INTERVAL display "
        "(stored micros)."),
    "test/sql/default/all_types_column_default_stats.test": (
        "TIMESTAMP_NS values truncate to microseconds (Spark's "
        "TimestampNTZ precision), so the pinned ns-precision stats "
        "text ('...123456789') reads '...123456'. Every other column "
        "type's stats row matches. Spark has no nanosecond timestamp "
        "runtime type; documented engine-wide (TESTDATA nanos note)."),
}


def main() -> int:
    with open(sys.argv[1]) as fh:
        sweep = json.load(fh)
    manifest = {"pass": [], "documented_divergence": {}, "skip": {},
                "unadjudicated_fail": {}}
    for name, r in sorted(sweep.items()):
        if r["status"] == "PASS":
            manifest["pass"].append(name)
        elif r["status"] == "SKIP":
            manifest["skip"][name] = r["detail"]
        elif name in DOCUMENTED_DIVERGENCES:
            manifest["documented_divergence"][name] = {
                "detail": r["detail"],
                "reason": DOCUMENTED_DIVERGENCES[name],
            }
        else:
            manifest["unadjudicated_fail"][name] = r["detail"]
    manifest["counts"] = {
        "pass": len(manifest["pass"]),
        "documented_divergence": len(manifest["documented_divergence"]),
        "skip": len(manifest["skip"]),
        "unadjudicated_fail": len(manifest["unadjudicated_fail"]),
    }
    json.dump(manifest, sys.stdout, indent=1)
    print(file=sys.stderr)
    print("counts:", manifest["counts"], file=sys.stderr)
    return 1 if manifest["unadjudicated_fail"] else 0


if __name__ == "__main__":
    sys.exit(main())
