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


# reference DuckLakeParquetTypeChecker acceptance sets
# (ducklake_add_data_files.cpp:692-860): a file type is adoptable when
# every value it can hold fits the table type losslessly.
_INT_ACCEPT = {
    "int8": ("int8",),
    "int16": ("int16", "int8", "uint8"),
    "int32": ("int32", "int16", "int8", "uint16", "uint8"),
    "int64": ("int64", "int32", "int16", "int8",
              "uint32", "uint16", "uint8"),
    "uint8": ("uint8",),
    "uint16": ("uint16", "uint8"),
    "uint32": ("uint32", "uint16", "uint8"),
    "uint64": ("uint64", "uint32", "uint16", "uint8"),
}


def _legacy_list_columns(pf) -> frozenset:
    """Top-level column names whose PARQUET schema contains a legacy
    2-level LIST encoding: under a LIST-annotated group, the repeated
    node is the element itself (a repeated non-group, a repeated group
    named 'array'/'<col>_tuple', or a repeated group carrying its own
    LIST annotation — parquet-format LogicalTypes.md backward-compat
    rules). Arrow field names alone can't distinguish these from a
    genuine list<struct<array: T>> (round-9 advisor finding)."""
    node = re.compile(
        r"^(required|optional|repeated)\s+(\S+)\s+"
        r"(?:field_id=\S+\s+)?(\S+?)(?:\s+\(([^)]*)\))?\s*([{;])$")
    out: set[str] = set()
    # stack entries: (name, annotation); stack[0] is the schema root,
    # stack[1] the top-level column (the object-repr header line and
    # any other non-node line simply doesn't match the regex)
    stack: list[tuple[str, str | None]] = []
    try:
        lines = str(pf.schema).splitlines()
    except Exception:
        return frozenset()
    for ln in lines:
        s = ln.strip()
        if s == "}":
            if stack:
                stack.pop()
            continue
        m = node.match(s)
        if not m:
            continue
        rep, typ, name, annot, tail = m.groups()
        parent_annot = stack[-1][1] if stack else None
        if (rep == "repeated"
                and parent_annot in ("List", "LIST")
                and (typ != "group"
                     or name == "array"
                     or name.endswith("_tuple")
                     or annot in ("List", "LIST"))):
            out.add(stack[1][0] if len(stack) > 1 else name)
        if tail == "{":
            stack.append((name, annot))
    return frozenset(out)


def _file_type_ok(dl_type: str, at, enum_names=frozenset(),
                  fname: str = "", legacy_list: bool = False,
                  min_stat=None) -> str | None:
    """None when the parquet arrow type ``at`` may serve a column of
    DuckLake type ``dl_type``; else an error description.
    ``enum_names``: leaf names whose PARQUET logical type is Enum —
    those byte-array columns hold string bytes and serve varchar
    (avro enums, add_file_with_three_level_list.test), while a plain
    BLOB does not (add_files_type_check_string_blob.test)."""
    import pyarrow as pa

    t = dl_type.strip().lower()
    name = str(at)
    if t in _INT_ACCEPT:
        return (None if name in _INT_ACCEPT[t]
                else f"Expected {t}, found type {name}")
    if t in ("float32", "float"):
        return None if name == "float" else f"Expected float32, found {name}"
    if t in ("float64", "double"):
        return (None if name in ("double", "float")
                else f"Expected float64, found {name}")
    if t in ("boolean", "bool"):
        return None if name == "bool" else f"Expected boolean, found {name}"
    if t == "json":
        # the reference adopts only Json-annotated files into JSON
        # columns. The local duckdb/pyarrow writers can't EMIT that
        # annotation, so when it is absent fall back to sniffing the
        # footer min statistic: valid JSON text adopts, a plain string
        # is refused like the reference
        # (add_files_type_check_string_blob.test json section)
        if isinstance(enum_names, dict) and fname in enum_names.get(
                "json", frozenset()):
            return None
        if pa.types.is_string(at) or pa.types.is_large_string(at):
            if min_stat is None:
                return None  # no stats recorded: stay permissive
            try:
                import json as _json

                sample = (min_stat.decode("utf-8", "replace")
                          if isinstance(min_stat, bytes) else str(min_stat))
                _json.loads(sample)
                return None
            except Exception:
                return "Expected json, found VARCHAR"
        return f"Expected json, found {name}"
    if t == "varchar":
        # plain BINARY does NOT serve a varchar column (the reference
        # rejects blob->varchar, add_files_type_check_string_blob.test);
        # ENUM-annotated dictionary columns do (avro enums,
        # add_file_with_three_level_list.test fixtures)
        if pa.types.is_string(at) or pa.types.is_large_string(at):
            return None
        if pa.types.is_dictionary(at) and (
                pa.types.is_string(at.value_type)
                or pa.types.is_large_string(at.value_type)):
            return None
        ok_names = (enum_names.get("enum", frozenset())
                    | enum_names.get("json", frozenset())
                    if isinstance(enum_names, dict) else enum_names)
        if (pa.types.is_binary(at) or pa.types.is_large_binary(at)) \
                and fname in ok_names:
            return None
        return f"Expected varchar, found {name}"
    if t == "blob":
        return (None if pa.types.is_binary(at) or pa.types.is_large_binary(at)
                or pa.types.is_fixed_size_binary(at)
                else f"Expected blob, found {name}")
    if t == "uuid":
        return (None if pa.types.is_string(at)
                or (pa.types.is_fixed_size_binary(at) and at.byte_width == 16)
                or str(at) == "uuid"
                else f"Expected uuid, found {name}")
    if t == "date":
        return (None if pa.types.is_date(at)
                else f"Expected date, found {name}")
    if t.startswith("time") and not t.startswith("timestamp"):
        return (None if pa.types.is_time(at)
                else f"Expected {t}, found {name}")
    if t.startswith("timestamp"):
        # reference CheckTimestamp (add_files_type_check_timestamp.test):
        # tz-ness must match; s/ms columns refuse ns files (lossy),
        # us/ns columns accept every unit
        if not pa.types.is_timestamp(at):
            return f"Expected {t}, found {name}"
        tz_col = "tz" in t.replace("timestamp", "", 1)
        if tz_col != (at.tz is not None):
            return f"Expected {t}, found TIMESTAMP{'' if tz_col else 'TZ'}"
        if t in ("timestamp_s", "timestamp_ms") and at.unit == "ns":
            return f"Expected {t}, found TIMESTAMP_NS"
        return None
    m = re.fullmatch(r"decimal\((\d+),\s*(\d+)\)", t)
    if m:
        if not pa.types.is_decimal(at):
            return f'Expected type "DECIMAL", found {name}'
        p, s = int(m.group(1)), int(m.group(2))
        if at.precision > p or at.scale > s:
            return (f"Incompatible decimal precision/scale - found "
                    f"precision {at.precision}, scale {at.scale} - but "
                    f"table is defined with precision {p}, scale {s}")
        return None
    if t.startswith("struct"):
        if not pa.types.is_struct(at):
            return f"Expected struct, found {name}"
        from ducklake_spark.lake import DuckLake as _DL

        parts = dict(_DL._struct_parts(dl_type))
        for i in range(at.num_fields):
            f = at.field(i)
            if f.name in parts:
                err = _file_type_ok(parts[f.name], f.type,
                                    enum_names, f.name, legacy_list)
                if err:
                    return f"field {f.name!r}: {err}"
        return None
    if t.startswith(("list", "array")):
        if not (pa.types.is_list(at) or pa.types.is_large_list(at)):
            return f"Expected list, found {name}"
        m = re.fullmatch(r"(?:list|array)[<(](.+)[)>]", t)
        vt = at.value_type
        # legacy avro 2-level lists surface in arrow as
        # list<struct<array: T>> — Spark's reader unwraps them, and so
        # does the reference (add_old_list.test). Gate on the PARQUET
        # schema's verdict (legacy_list) so a genuine
        # list<struct<array: T>> column is checked against the struct
        if (legacy_list and pa.types.is_struct(vt) and vt.num_fields == 1
                and vt.field(0).name in ("array", "element", "item")):
            vt = vt.field(0).type
        return (_file_type_ok(m.group(1), vt, enum_names, fname,
                              legacy_list)
                if m else None)
    if t.startswith("map"):
        if not pa.types.is_map(at):
            return f"Expected map, found {name}"
        m = re.fullmatch(r"map[<(](.+)[)>]", t, re.S)
        if m:
            from ducklake_spark.catalog.types import _split_top as _st

            parts = _st(m.group(1))
            if len(parts) == 2:
                err = _file_type_ok(parts[0].strip(), at.key_type,
                                    enum_names, fname, legacy_list)
                if err:
                    return f"map key: {err}"
                err = _file_type_ok(parts[1].strip(), at.item_type,
                                    enum_names, fname, legacy_list)
                if err:
                    return f"map value: {err}"
        return None
    return None  # unknown table type: defer to scan-time behavior


def _hive_value_castable(dl_type: str, v: str) -> bool:
    t = dl_type.strip().lower()
    try:
        if t.startswith(("int", "uint")):
            int(v)
        elif t in ("float32", "float64", "float", "double") or \
                t.startswith("decimal"):
            float(v)
        elif t in ("boolean", "bool"):
            if v.lower() not in ("true", "false", "0", "1"):
                return False
        elif t == "date":
            import datetime

            datetime.date.fromisoformat(v)
        elif t.startswith("timestamp"):
            import datetime

            datetime.datetime.fromisoformat(v)
    except (ValueError, TypeError):
        return False
    return True


def _missing_struct_fields(ctype: str, at, prefix: str) -> list[str]:
    """Dotted paths of struct fields declared in the table type but
    absent from the file's arrow type (recursive)."""
    import pyarrow as pa

    from ducklake_spark.catalog.types import _split_top

    m = re.fullmatch(r"\s*struct<(.+)>\s*", ctype, re.I | re.S)
    if not m or not pa.types.is_struct(at):
        return []
    anames = {at.field(i).name: at.field(i).type
              for i in range(at.num_fields)}
    out: list[str] = []
    for part in _split_top(m.group(1)):
        fname, ftype = part.split(":", 1)
        fname = fname.strip()
        if fname not in anames:
            out.append(f"{prefix}.{fname}")
        else:
            out += _missing_struct_fields(
                ftype, anames[fname], f"{prefix}.{fname}")
    return out


def add_data_files(lake: DuckLake, table: str, pattern, *,
                   allow_missing: bool = False,
                   ignore_extra_columns: bool = False,
                   hive_partitioning: bool | None = None) -> int:
    """Register parquet files matching ``pattern`` (one glob or a list
    of globs/paths); returns #files added. Duplicate and equivalent
    paths within one call collapse to one registration (reference
    add_files_equivalent_path_duplicate / add_files_overlapping_globs);
    file column types are checked against the table schema up front
    (type_check_* family) so a bad file fails at ADD, not at scan."""
    import pyarrow.parquet as pq

    h = lake._handle(table)
    # adoption never assumes POSIX: the pattern resolves through the
    # lake's pyarrow.fs seam (one recursive LIST, client-side match)
    patterns = [pattern] if isinstance(pattern, str) else list(pattern)
    if getattr(lake, "_s3fs", None) is not None:
        # mirror-mode lake: pull any fresh object-store files into the
        # mirror, then adopt via the mirror path
        # (add_files/add_files_s3_settings.test)
        lake._s3_sync_down()
        rd = lake.remote_data_path.rstrip("/") + "/"
        patterns = [
            (os.path.join(lake.data_path, p[len(rd):])
             if str(p).startswith(rd) else p)
            for p in patterns
        ]
    paths: list[str] = []
    seen: set[str] = set()
    for pat in patterns:
        for p in lake.lfs.glob(lake.lfs.strip_scheme(pat)):
            norm = os.path.normpath(p)
            if norm not in seen:
                seen.add(norm)
                paths.append(norm)
    if not paths:
        raise DuckLakeError(f"no files match {pattern!r}")
    table_cols = {c[1]: c for c in h.columns}
    part_spec = lake._partition_spec(h)
    part_index = {cname: i for i, (cname, _t) in enumerate(part_spec)}
    part_pid = lake._partition_spec_id(h) if part_spec else None

    txn = lake._begin()
    from ducklake_spark.lake import TableHandle, parquet_footer_size as _footer_size
    from ducklake_spark.transaction import DataFileInfo

    if h.table_id < 0:
        # adoption into a table created in THIS transaction (reference
        # add_files_transaction_local.test): pre-assign real column ids
        # (the CTAS mechanism) so the name map binds to the committed
        # ids, and buffer by name since the table id exists only after
        # commit
        td = next(
            t for t in txn.created_tables
            if t.schema_name == h.schema_name
            and t.table_name == h.table_name
        )
        lake._preassign_column_ids(td)
        h = TableHandle(
            table_id=-1, table_uuid=td.table_uuid, schema_id=-1,
            schema_name=h.schema_name, table_name=h.table_name,
            path=td.path,
            columns=[(c.column_id, c.name, c.type, c.nulls_allowed)
                     for c in td.columns],
        )
        table_cols = {c[1]: c for c in h.columns}
    table_key = (str(h.table_id) if h.table_id >= 0
                 else f"{h.schema_name}.{h.table_name}")
    # parquet path -> id including per-node nested ids ("a.list
    # .element"): _harvest_stats keys footer chunks by path_in_schema,
    # so adopted files gain list-element / struct-in-list leaf stats
    # rows like the reference (add_files_complex_nested_stats_mre.test)
    colmap = lake._leaf_colmap(h)
    added = 0
    infos: list[DataFileInfo] = []
    name_map_rows: list[tuple[int, str]] = []
    # files the lake already manages are skipped when a GLOB swept them
    # up ('**/*.parquet' over the lake root catches internal files,
    # add_files_hive.test) — an explicitly named path still validates
    # (add_file_partitioned.test re-adds one and expects the error)
    if any(re.search(r"[*?\[]", str(pat)) for pat in patterns):
        data_fs = lake.lfs.strip_scheme(lake.data_path).rstrip("/") + "/"
        # per-TABLE: the same physical file may be adopted into a
        # DIFFERENT table (add_files_overlapping_globs.test test2 swept
        # files already registered to another table and expects them
        # added)
        from ducklake_spark.lake import _resolve_rel_path as _rrp

        def _rrp2(tp, p, prel):
            # adopted-outside-table rows store ABSOLUTE paths
            # (flag 0); normalize back under the data root so the
            # re-adoption check compares root-relative on both sides
            p = _rrp(tp, p, prel)
            for root in (data_fs, str(lake.data_path).rstrip("/") + "/"):
                if p.startswith(root):
                    return p[len(root):]
            return p

        registered = {
            _rrp2(h.path, p, prel) for (p, prel) in lake.meta.query(
                "SELECT path, path_is_relative FROM ducklake_data_file "
                "WHERE table_id=?",
                (h.table_id,))
        } | {
            _rrp2(h.path, p, prel) for (p, prel) in lake.meta.query(
                "SELECT path, path_is_relative FROM ducklake_delete_file "
                "WHERE table_id=?",
                (h.table_id,))
        }
        if lake._txn is not None:
            for fl in lake._txn.new_data_files.values():
                registered |= {f.path for f in fl}
        paths = [
            p for p in paths
            if (p[len(data_fs):] if p.startswith(data_fs) else p)
            not in registered
        ]
    for path in paths:
        pf = pq.ParquetFile(lake.lfs.open_input(path))
        file_cols = {c.split(".")[0] for c in pf.schema_arrow.names}
        arrow_types = {f.name: f.type for f in pf.schema_arrow}
        hive_segs: list[tuple[str, str]] = []
        # default AUTOMATIC (reference HivePartitioningType::AUTOMATIC):
        # hive key=value path segments bind when present unless the
        # caller explicitly disabled hive partitioning; ORDER matters —
        # transformed partition keys (year(dt), bucket(4, c)) map to the
        # spec positionally, their dir names are arbitrary
        if hive_partitioning is not False:
            from urllib.parse import unquote

            for seg in os.path.dirname(path).split(os.sep):
                m = re.fullmatch(r"([\w.]+)=([^/]*)", seg)
                if m:
                    # store RAW values: hive escapes specials in dir names
                    # ('%20' etc.), the insert path records row values —
                    # the catalog must hold one encoding for pruning
                    hive_segs.append((m.group(1), unquote(m.group(2))))
        hive_vals = dict(hive_segs)
        try:
            _ps = pf.schema
            enum_leaves = {
                "enum": frozenset(
                    _ps.column(i).name for i in range(len(_ps.names))
                    if str(_ps.column(i).logical_type) == "Enum"),
                "json": frozenset(
                    _ps.column(i).name for i in range(len(_ps.names))
                    if str(_ps.column(i).logical_type).startswith("JSON")
                    or str(_ps.column(i).logical_type) == "Json"),
            }
        except Exception:
            enum_leaves = {"enum": frozenset(), "json": frozenset()}
        legacy_cols = _legacy_list_columns(pf)
        # GeoParquet v1 stores geometry as BLOB + a "geo" footer key;
        # the reference accepts only native Parquet(V3) GEOMETRY
        # (ducklake_add_data_files.cpp:828-835). Our own writer emits
        # un-annotated WKB binary, so plain binary stays adoptable —
        # only the GeoParquet v1 metadata marker rejects.
        geo_cols = [cn for cn, tup in table_cols.items()
                    if str(tup[2] or "").lower() == "geometry"]
        if geo_cols:
            fmeta = pf.metadata.metadata or {}
            if b"geo" in fmeta or "geo" in fmeta:
                raise DuckLakeError(
                    f'Failed to map column "{geo_cols[0]}" from file '
                    f'"{path}": Expected type "GEOMETRY" but found type '
                    '"BLOB". Is this a GeoParquet v1.*.* file? DuckLake '
                    "only supports GEOMETRY types stored in native "
                    "Parquet(V3) format, not GeoParquet(v1.*.*)")
        for cname, (cid, _n, ctype, _na) in table_cols.items():
            if cname in hive_vals:
                # hive partition value takes PRECEDENCE over a parquet
                # column of the same name — the file column is neither
                # validated nor read (reference
                # add_files_hive_partition_cast.test precedence section)
                continue
            at = arrow_types.get(cname)
            if at is None:
                continue
            mstat = None
            if str(ctype or "").lower() == "json":
                try:
                    _md = pf.metadata
                    _ci = list(pf.schema_arrow.names).index(cname)
                    _st = _md.row_group(0).column(_ci).statistics
                    mstat = _st.min if _st and _st.has_min_max else None
                except Exception:
                    mstat = None
            err = _file_type_ok(ctype, at, enum_leaves, cname,
                                legacy_list=cname in legacy_cols,
                                min_stat=mstat)
            if err:
                raise DuckLakeError(
                    f'Failed to map column "{cname}" from file "{path}" '
                    f'to the column in table "{h.table_name}"\n* {err}')
        missing = [
            c for c in table_cols
            if c not in file_cols and c not in hive_vals
        ]
        # this engine's own rowid/snapshot carrier columns (written by
        # flush/compaction to preserve row ids) are engine internals,
        # not user data — adopting our own files back must not trip the
        # extra-column check (bucket_partitioning.test re-adds flushed
        # bucket files)
        extra = [c for c in file_cols
                 if c not in table_cols
                 and not c.startswith("_ducklake_internal_")]
        # nested struct fields must be present too (reference
        # add_files_missing_fields.test: 'Column "s.i" exists in table
        # ... but was not found in file' without allow_missing)
        if not allow_missing:
            for cname, (cid, _n, ctype, _na) in table_cols.items():
                at = arrow_types.get(cname)
                if at is None:
                    continue
                for miss in _missing_struct_fields(ctype, at, cname):
                    raise DuckLakeError(
                        f'Column "{miss}" exists in table '
                        f'"{h.table_name}" but was not found in file '
                        f'"{path}" (use allow_missing=True)')
        if missing and not allow_missing:
            raise DuckLakeError(
                f"{path}: missing columns {missing} (use allow_missing=True)"
            )
        if extra and not ignore_extra_columns:
            raise DuckLakeError(
                f"{path}: extra columns {extra} (use ignore_extra_columns=True)"
            )
        # name map rows: source file column name -> table field id
        # (recorded at COMMIT, inside the catalog transaction — an
        # eager insert would survive a rollback and race a concurrent
        # adopter's mapping_id allocation)
        name_map_rows.extend((file_cols & set(table_cols))
                             - set(hive_vals))
        # hive values must cast to their table column's type up front
        # (reference add_files_hive_mismatch.test: "Unable to cast")
        for cname, v in hive_vals.items():
            col = table_cols.get(cname)
            if col is None or v in ("__HIVE_DEFAULT_PARTITION__", "NULL"):
                # duckdb's COPY PARTITION_BY renders NULL partition
                # values as the literal dir name x=NULL
                # (add_files_hive_partition_cast.test null section)
                continue
            if not _hive_value_castable(col[2], v):
                raise DuckLakeError(
                    f"Unable to cast {v!r} (from hive partition column "
                    f"{cname!r}) to: {col[2]!r}")
        # the TRAILING len(spec) hive segments map to the partition keys
        # POSITIONALLY (reference ducklake_add_data_files.cpp:117-140):
        # identity keys must match the column name, transformed keys
        # (year(dt), bucket(N, c)) accept any dir name but bucket values
        # must fit the modulus
        part_values = []
        consumed = 0
        if part_spec:
            if len(hive_segs) < len(part_spec):
                raise DuckLakeError(
                    f'file "{path}" contains an invalid partition '
                    "value for the table configuration")
            tail = hive_segs[-len(part_spec):]
            consumed = len(part_spec)
            for i, ((k, v), (pk_name, pk_transform)) in enumerate(
                    zip(tail, part_spec)):
                tf = (pk_transform or "identity").lower()
                if tf in ("", "identity"):
                    if k != pk_name:
                        raise DuckLakeError(
                            f'file "{path}" contains an invalid '
                            "partition value for the table configuration")
                else:
                    mb = re.fullmatch(r"bucket\s*\(\s*(\d+)\s*\)", tf)
                    if mb and v in ("__HIVE_DEFAULT_PARTITION__", "NULL"):
                        # a NULL bucket value (NULL key column) is a
                        # valid partition dir (bucket_partitioning.test
                        # re-adds flushed files incl. the NULL bucket)
                        mb = None
                    if mb and not (
                            v.lstrip("-").isdigit()
                            and 0 <= int(v) < int(mb.group(1))):
                        raise DuckLakeError(
                            f'file "{path}" contains an invalid '
                            "partition value for the table configuration")
                # hive's NULL sentinel records as SQL NULL (reference
                # merge_adjacent_null_partition.test part 2)
                part_values.append(
                    (i, None
                     if v in ("__HIVE_DEFAULT_PARTITION__", "NULL")
                     else v))
        for k, v in hive_segs[:len(hive_segs) - consumed]:
            if k in table_cols:
                # hive column outside the partition spec: keyed by
                # -(column_id)-1 so the scan can still backfill it
                # (reference adopts hive files into unpartitioned
                # tables too, add_files_hive_mismatch.test)
                part_values.append(
                    (-colmap[k] - 1,
                     None if v in ("__HIVE_DEFAULT_PARTITION__", "NULL")
                     else v))
        stats = _harvest_stats(pf, colmap)
        # FLBA(16)-UUID footer stats decode as mojibake text through the
        # generic bytes path — rewrite them from the raw footer bytes
        # into canonical uuid text (FLBA byte order == hex-text order,
        # so zone-map compares stay consistent with query literals)
        uuid_cols = {cn for cn, tup in table_cols.items()
                     if str(tup[2] or "").lower() == "uuid"}
        if uuid_cols:
            import uuid as _uuidlib

            rawmm: dict[str, tuple[bytes, bytes]] = {}
            md_ = pf.metadata
            for rg_ in range(md_.num_row_groups):
                g_ = md_.row_group(rg_)
                for ci_ in range(g_.num_columns):
                    col_ = g_.column(ci_)
                    nm_ = col_.path_in_schema.split(".")[0]
                    if nm_ not in uuid_cols:
                        continue
                    s_ = col_.statistics
                    if s_ is None or not s_.has_min_max:
                        continue
                    mn_, mx_ = s_.min, s_.max
                    if not (isinstance(mn_, bytes) and len(mn_) == 16
                            and isinstance(mx_, bytes) and len(mx_) == 16):
                        continue
                    cur_ = rawmm.get(nm_)
                    rawmm[nm_] = ((mn_, mx_) if cur_ is None
                                  else (min(cur_[0], mn_),
                                        max(cur_[1], mx_)))
            if rawmm:
                cid2name = {colmap[n]: n for n in rawmm if n in colmap}
                for cs in stats:
                    nm_ = cid2name.get(cs.column_id)
                    if nm_ is not None:
                        mn_, mx_ = rawmm[nm_]
                        cs.min_value = str(_uuidlib.UUID(bytes=mn_))
                        cs.max_value = str(_uuidlib.UUID(bytes=mx_))
        # hive-derived columns are constant across the file: synthesize
        # the stats row min=max=value so zone-map pruning covers adopted
        # hive files (reference add_file_partitioned.test: the added
        # file gains a partition-column stats row)
        have_stats = {cs.column_id for cs in stats}
        from ducklake_spark.transaction import ColumnStatsRow

        for cname, v in hive_vals.items():
            cid = colmap.get(cname)
            if cid is None or cid in have_stats:
                continue
            sval = (None if v in ("__HIVE_DEFAULT_PARTITION__", "NULL")
                    else v)
            stats.append(ColumnStatsRow(
                column_id=cid, column_size_bytes=0,
                value_count=pf.metadata.num_rows,
                null_count=pf.metadata.num_rows if sval is None else 0,
                min_value=sval, max_value=sval))
        data_fs = lake.lfs.strip_scheme(lake.data_path).rstrip("/") + "/"
        info = DataFileInfo(
            path=path[len(data_fs):] if path.startswith(data_fs) else path,
            record_count=pf.metadata.num_rows,
            row_group_count=pf.metadata.num_row_groups,
            file_size_bytes=lake.lfs.size(path),
            footer_size=_footer_size(path, fs=lake.lfs),
            partition_values=part_values,
            # spec-index values only bind under the spec they were
            # adopted into (negative backfill keys are spec-independent)
            partition_id=part_pid if any(
                i >= 0 for i, _v in part_values) else None,
            column_stats=stats,
            mapping_id=-1,  # allocated inside the commit transaction
        )
        infos.append(info)
        added += 1
    # buffer only after EVERY file validated: a mid-loop error must not
    # leave earlier files adopted (the next autocommit would publish a
    # partial ADD)
    if not infos:
        lake._autocommit()
        return 0
    txn.new_data_files.setdefault(table_key, []).extend(infos)

    def map_op(con, snap_id, colmap=colmap, infos=infos,
               cols=sorted(set(name_map_rows))):
        # txn-local tables resolve their committed id here
        tid = txn._resolve_table_id(table_key)
        # duplicate elimination (reference add_files.test:78-82): an
        # existing mapping for this table with the identical name->field
        # rows is reused instead of allocating a new mapping_id
        want = sorted((colmap[c], c, colmap[c]) for c in cols)
        mid = None
        for (mid0,) in con.execute(
            "SELECT mapping_id FROM ducklake_column_mapping "
            "WHERE table_id=? AND type='map_by_name'", (tid,)
        ).fetchall():
            rows = sorted(con.execute(
                "SELECT column_id, source_name, target_field_id "
                "FROM ducklake_name_mapping WHERE mapping_id=?", (mid0,)
            ).fetchall())
            if [tuple(r) for r in rows] == want:
                mid = mid0
                break
        if mid is None:
            # mapping ids live in the FILE-id space (reference
            # ducklake_transaction_state.cpp:539 allocates
            # next_file_id++ per new name map at commit); fall back to
            # the old MAX+1 scheme if the allocator isn't wired (older
            # callers)
            falloc = getattr(txn, "_commit_falloc", None)
            if falloc is not None:
                mid = falloc[0]
                falloc[0] += 1
            else:
                mid = con.execute(
                    "SELECT COALESCE(MAX(mapping_id), -1) + 1 "
                    "FROM ducklake_column_mapping"
                ).fetchone()[0]
            con.execute(
                "INSERT INTO ducklake_column_mapping VALUES "
                "(?, ?, 'map_by_name')",
                (mid, tid),
            )
            for cname in cols:
                con.execute(
                    "INSERT INTO ducklake_name_mapping VALUES "
                    "(?, ?, ?, ?, NULL, 0)",
                    (mid, colmap[cname], cname, colmap[cname]),
                )
        for info in infos:  # ops run before the data-file inserts
            info.mapping_id = mid

    txn.mapping_ops.append(map_op)
    # adopted files get the same extended stats (geometry bbox /
    # shredded variant) as written ones — one distributed pass
    lake._attach_extra_stats(h, infos, None)
    txn.change_log.append(f"inserted_into_table:{table_key}")
    lake._autocommit()
    return added


DuckLake.add_data_files = (
    lambda self, table, pattern, **kw: add_data_files(self, table, pattern, **kw)
)
