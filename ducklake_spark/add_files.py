"""ducklake_add_data_files: register existing parquet without rewrite.

Reference (src/functions/ducklake_add_data_files.cpp:22-75,147-188,
1361 LoC): reads parquet footers, maps file columns to table field
ids by name (recorded in ducklake_column_mapping/ducklake_name_mapping
so scans resolve them later), optionally infers hive partition values
from the path, harvests per-file stats, and commits
``ducklake_data_file`` rows — data is adopted, never copied.

Spark note: our scans read with a field-id-annotated requested schema
*plus* name-based fallback, so foreign files (no field ids) resolve by
name exactly like the reference's name maps.
"""

from __future__ import annotations

import os
import re

from ducklake_spark.lake import DuckLake, DuckLakeError, _harvest_stats


def add_data_files(lake: DuckLake, table: str, pattern: str, *,
                   allow_missing: bool = False,
                   ignore_extra_columns: bool = False,
                   hive_partitioning: bool = False) -> int:
    """Register parquet files matching ``pattern``; returns #files added."""
    import pyarrow.parquet as pq

    h = lake._handle(table)
    # adoption never assumes POSIX: the pattern resolves through the
    # lake's pyarrow.fs seam (one recursive LIST, client-side match)
    paths = lake.lfs.glob(lake.lfs.strip_scheme(pattern))
    if not paths:
        raise DuckLakeError(f"no files match {pattern!r}")
    table_cols = {c[1]: c for c in h.columns}
    part_spec = lake._partition_spec(h)
    part_index = {cname: i for i, (cname, _t) in enumerate(part_spec)}

    txn = lake.begin()
    from ducklake_spark.lake import parquet_footer_size as _footer_size
    from ducklake_spark.transaction import DataFileInfo

    colmap = {c[1]: c[0] for c in h.columns}
    mapping_id = (lake.meta.query(
        "SELECT COALESCE(MAX(mapping_id), -1) + 1 FROM ducklake_column_mapping"
    ))[0][0]
    added = 0
    infos: list[DataFileInfo] = []
    for path in paths:
        pf = pq.ParquetFile(lake.lfs.open_input(path))
        file_cols = {c.split(".")[0] for c in pf.schema_arrow.names}
        hive_vals: dict[str, str] = {}
        if hive_partitioning:
            from urllib.parse import unquote

            for seg in os.path.dirname(path).split(os.sep):
                m = re.fullmatch(r"([\w.]+)=([^/]*)", seg)
                if m:
                    # store RAW values: hive escapes specials in dir names
                    # ('%20' etc.), the insert path records row values —
                    # the catalog must hold one encoding for pruning
                    hive_vals[m.group(1)] = unquote(m.group(2))
        missing = [
            c for c in table_cols
            if c not in file_cols and c not in hive_vals
        ]
        extra = [c for c in file_cols if c not in table_cols]
        if missing and not allow_missing:
            raise DuckLakeError(
                f"{path}: missing columns {missing} (use allow_missing=True)"
            )
        if extra and not ignore_extra_columns:
            raise DuckLakeError(
                f"{path}: extra columns {extra} (use ignore_extra_columns=True)"
            )
        # name map rows: source file column name -> table field id
        lake.meta.con.execute(
            "INSERT INTO ducklake_column_mapping VALUES (?, ?, 'map_by_name')",
            (mapping_id, h.table_id),
        )
        for cname in file_cols & set(table_cols):
            lake.meta.con.execute(
                "INSERT INTO ducklake_name_mapping VALUES (?, ?, ?, ?, NULL, 0)",
                (mapping_id, colmap[cname], cname, colmap[cname]),
            )
        part_values = []
        for cname, v in hive_vals.items():
            if cname in part_index:
                part_values.append((part_index[cname], v))
        stats = _harvest_stats(pf, colmap)
        data_fs = lake.lfs.strip_scheme(lake.data_path).rstrip("/") + "/"
        info = DataFileInfo(
            path=path[len(data_fs):] if path.startswith(data_fs) else path,
            record_count=pf.metadata.num_rows,
            row_group_count=pf.metadata.num_row_groups,
            file_size_bytes=lake.lfs.size(path),
            footer_size=_footer_size(path, fs=lake.lfs),
            partition_values=part_values,
            column_stats=stats,
            mapping_id=mapping_id,
        )
        txn.new_data_files.setdefault(str(h.table_id), []).append(info)
        infos.append(info)
        added += 1
    # adopted files get the same extended stats (geometry bbox /
    # shredded variant) as written ones — one distributed pass
    lake._attach_extra_stats(h, infos, None)
    txn.change_log.append(f"inserted_into_table:{h.table_id}")
    lake._autocommit()
    return added


DuckLake.add_data_files = (
    lambda self, table, pattern, **kw: add_data_files(self, table, pattern, **kw)
)
