"""Pinned fast subset of the reference sqllogictest corpus.

The full 500+-file sweep runs out-of-band (tools/slt_runner.py --dir
test/sql → SLT_MANIFEST.json); this pytest pins ~30 fast,
behavior-dense files so the manifest cannot rot between sweeps. Every
file here must PASS — a FAIL is an engine regression, a SKIP means a
dialect translation regressed.

Selection: ≤ ~5s each, at least one file per major subsystem
(DML, inlining, deletion inlining, compaction, alter, transaction,
time travel, stats pruning, partitioning, macros, views, CDC).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = os.environ.get("DUCKLAKE_REF", "/root/reference")

SUBSET = [
    "test/sql/transaction/basic_transaction.test",
    "test/sql/time_travel/basic_time_travel.test",
    "test/sql/general/detach_ducklake.test",
    "test/sql/transaction/create_conflict.test",
    "test/sql/alter/add_column.test",
    "test/sql/alter/struct_evolution.test",
    "test/sql/alter/add_column_default_stats.test",
    "test/sql/delete/basic_delete.test",
    "test/sql/delete/delete_same_transaction.test",
    "test/sql/delete/delete_mixed_formats.test",
    "test/sql/deletion_inlining/test_deletion_inlining.test",
    "test/sql/deletion_inlining/test_deletion_inlining_compaction.test",
    "test/sql/data_inlining/basic_data_inlining.test",
    "test/sql/data_inlining/data_inlining_delete.test",
    "test/sql/data_inlining/table_stats.test",
    "test/sql/data_inlining/empty_inlined_tables_alter_cleanup.test",
    "test/sql/compaction/compaction_schema_version_per_table.test",
    "test/sql/compaction/merge_files_expired_snapshots.test",
    "test/sql/rewrite_data_files/rewrite_deletion_vectors.test",
    "test/sql/cleanup/drop_table_cleans_delete_files.test",
    "test/sql/cleanup/create_drop_cleanup.test",
    "test/sql/transaction/transaction_conflicts.test",
    "test/sql/partitioning/partition_null.test",
    "test/sql/stats/min_max_optimization_deletes.test",
    "test/sql/stats/topn_file_pruning.test",
    "test/sql/table_changes/ducklake_table_deletions.test",
    "test/sql/macros/test_simple_macro.test",
    "test/sql/view/ducklake_view.test",
    "test/sql/functions/ducklake_snapshots.test",
    "test/sql/types/unsupported.test",
    "test/sql/types/json.test",
    "test/sql/general/ducklake_metadata_logging.test",
]


@pytest.mark.parametrize("slt", SUBSET, ids=lambda p: p.split("/")[-1])
def test_slt_subset(slt, slt_batch_report):
    status, detail = slt_batch_report(slt)
    assert status == "PASS", f"{slt}: {status} — {detail}"


@pytest.fixture(scope="module")
def slt_batch_report():
    """Run the WHOLE subset once through one runner process (one Spark
    session, ~3 min) and serve per-file results."""
    missing = [p for p in SUBSET if not os.path.exists(os.path.join(REF, p))]
    if missing:
        pytest.skip(f"reference corpus not available: {missing[:3]}")
    import json
    import tempfile

    report = os.path.join(tempfile.mkdtemp(), "subset.json")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "slt_runner.py"),
         *[os.path.join(REF, p) for p in SUBSET], "--report", report],
        cwd=REPO, timeout=3000, capture_output=True,
    )
    with open(report) as fh:
        results = json.load(fh)

    def lookup(slt: str):
        r = results.get(slt) or {}
        return r.get("status", "MISSING"), r.get("detail", "")

    return lookup
