"""DuckLake <-> Spark type mapping.

Type names follow the reference's declared set
(src/common/ducklake_types.cpp:17-49 + aliases :58-67); the Spark
equivalents use the widening rules documented in SURVEY §1.2 (Spark
has no unsigned ints / TIME, so those widen, with the original
DuckLake type name retained in the catalog's ``column_type`` string).
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

_SIMPLE_TO_SPARK: dict[str, T.DataType] = {
    "boolean": T.BooleanType(),
    "int8": T.ByteType(),
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "int128": T.DecimalType(38, 0),
    "uint8": T.ShortType(),
    "uint16": T.IntegerType(),
    "uint32": T.LongType(),
    "uint64": T.DecimalType(20, 0),
    "uint128": T.DecimalType(38, 0),
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
    "date": T.DateType(),
    "time": T.LongType(),  # micros since midnight; Spark has no TIME type
    "time_ns": T.LongType(),  # nanos since midnight (ducklake_types.cpp:32)
    "timetz": T.LongType(),  # packed micros+offset (ducklake_types.cpp:44)
    "timestamp": T.TimestampNTZType(),
    "timestamp_us": T.TimestampNTZType(),
    "timestamp_ms": T.TimestampNTZType(),
    "timestamp_ns": T.TimestampNTZType(),
    "timestamp_s": T.TimestampNTZType(),
    "timestamptz": T.TimestampType(),
    "timestamptz_ns": T.TimestampType(),
    "varchar": T.StringType(),
    "blob": T.BinaryType(),
    "uuid": T.StringType(),
    "json": T.StringType(),
    "variant": T.StringType(),
    "geometry": T.BinaryType(),
    "interval": T.DayTimeIntervalType(),
}

_SPARK_TO_SIMPLE: dict[str, str] = {
    "boolean": "boolean",
    "byte": "int8",
    "short": "int16",
    "integer": "int32",
    "long": "int64",
    "float": "float32",
    "double": "float64",
    "date": "date",
    "timestamp_ntz": "timestamp",
    "timestamp": "timestamptz",
    "string": "varchar",
    "binary": "blob",
}


class UnsupportedTypeError(ValueError):
    """reference: CheckSupportedType, src/storage/ducklake_insert.cpp:869-871
    + negative tests test/sql/types/unsupported.test (enums, collations,
    user-defined types are rejected)."""


def ducklake_to_spark(name: str) -> T.DataType:
    name = name.strip().lower()
    if name in _SIMPLE_TO_SPARK:
        return _SIMPLE_TO_SPARK[name]
    m = re.fullmatch(r"decimal\((\d+)\s*,\s*(\d+)\)", name)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    m = re.fullmatch(r"(\w+)\[\]", name) or re.fullmatch(r"list<(.+)>", name)
    if m:
        return T.ArrayType(ducklake_to_spark(m.group(1)))
    m = re.fullmatch(r"map<(.+)>", name)
    if m:
        kv = _split_top(m.group(1))
        if len(kv) == 2:  # top-level comma only: the value type may be
            # a struct/map with its own commas
            return T.MapType(ducklake_to_spark(kv[0]),
                             ducklake_to_spark(kv[1]))
    m = re.fullmatch(r"struct<(.+)>", name)
    if m:
        fields = []
        for part in _split_top(m.group(1)):
            fname, ftype = part.split(":", 1)
            fields.append(T.StructField(fname.strip(), ducklake_to_spark(ftype)))
        if not fields:
            raise UnsupportedTypeError("empty struct not supported")
        return T.StructType(fields)
    raise UnsupportedTypeError(f"unsupported DuckLake type: {name!r}")


def spark_to_ducklake(dt: T.DataType) -> str:
    tn = dt.typeName()
    if tn in _SPARK_TO_SIMPLE:
        return _SPARK_TO_SIMPLE[tn]
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, T.ArrayType):
        return f"list<{spark_to_ducklake(dt.elementType)}>"
    if isinstance(dt, T.MapType):
        return f"map<{spark_to_ducklake(dt.keyType)}, {spark_to_ducklake(dt.valueType)}>"
    if isinstance(dt, T.StructType):
        if not dt.fields:
            raise UnsupportedTypeError("empty struct not supported")
        inner = ",".join(f"{f.name}:{spark_to_ducklake(f.dataType)}" for f in dt.fields)
        return f"struct<{inner}>"
    if isinstance(dt, T.VariantType):
        # CTAS from a ::VARIANT select lands as a VARIANT column
        # (stored as JSON text; variant_shredded_stats.test)
        return "variant"
    raise UnsupportedTypeError(f"unsupported Spark type: {dt}")


def check_supported(dt: T.DataType) -> None:
    spark_to_ducklake(dt)


def ducklake_to_catalog_sql(name: str) -> str:
    """SQL column type for INLINED data stored in the catalog DB.

    Must parse on every backend (SQLite ignores declared types, DuckDB
    and Postgres enforce them). Temporal/decimal/nested values are
    serialized as ISO / repr strings by ``_to_sql_value`` → VARCHAR."""
    base = name.split("(")[0].lower()
    if base in ("int8", "int16", "int32", "int64",
                "uint8", "uint16", "uint32", "uint64"):
        return "BIGINT"
    if base in ("float32", "float", "float64", "double"):
        return "DOUBLE"
    if base == "boolean":
        return "BOOLEAN"
    if base in ("blob", "geometry"):
        # geometry is WKB bytes — a VARCHAR column on a DuckDB catalog
        # would cast them through duckdb's blob-text escaping and read
        # back as mangled text (geo/ducklake_geometry_inlining.test)
        return "BLOB"
    return "VARCHAR"


# Widening promotion rule: ALTER ... CHANGE TYPE is allowed iff the
# promotion is lossless (reference: ducklake_table_entry.cpp:912-921,
# "MaxLogicalType(source, target) == target").
# the reference allows exactly DuckDB's MaxLogicalType lattice
# (TypePromotionIsAllowed, ducklake_table_entry.cpp:912-921): promotion
# is legal iff max(source, target) == target. This literal matrix is
# the lattice evaluated over the DuckLake type set (verified against
# duckdb's COALESCE typing; test/sql/alter/promote_type_all.test).
_PROMOTIONS: dict[str, set[str]] = {
    "int8": {"int16", "int32", "int64", "int128", "float32", "float64"},
    "int16": {"int32", "int64", "int128", "float32", "float64"},
    "int32": {"int64", "int128", "float32", "float64"},
    "int64": {"int128", "float32", "float64"},
    "int128": {"float32", "float64"},
    "uint8": {"uint16", "uint32", "uint64", "uint128",
              "int16", "int32", "int64", "int128", "float32", "float64"},
    "uint16": {"uint32", "uint64", "uint128",
               "int32", "int64", "int128", "float32", "float64"},
    "uint32": {"uint64", "uint128", "int64", "int128",
               "float32", "float64"},
    "uint64": {"uint128", "int128", "float32", "float64"},
    "uint128": {"float32", "float64"},
    "float32": {"float64"},
    "timestamp_s": {"timestamp_ms", "timestamp", "timestamp_ns"},
    "timestamp_ms": {"timestamp", "timestamp_ns"},
    "timestamp": {"timestamp_ns", "timestamptz"},
    "date": {"timestamp", "timestamptz"},
}


def is_widening(src: str, dst: str) -> bool:
    """Widening-only promotion, recursively through nested types:
    map/list widen when their parts widen; a struct widens when every
    existing field widens in place and new (nullable) fields are only
    APPENDED (reference struct-in-map evolution,
    test/sql/alter/struct_in_map_evolution.test)."""
    src, dst = src.strip().lower(), dst.strip().lower()
    if src == dst:
        return True
    sm = re.fullmatch(r"map<(.+)>", src, re.S)
    dm = re.fullmatch(r"map<(.+)>", dst, re.S)
    if sm and dm:
        skv, dkv = _split_top(sm.group(1)), _split_top(dm.group(1))
        return (len(skv) == 2 and len(dkv) == 2
                and is_widening(skv[0], dkv[0])
                and is_widening(skv[1], dkv[1]))
    sl = re.fullmatch(r"list<(.+)>", src, re.S)
    dl = re.fullmatch(r"list<(.+)>", dst, re.S)
    if sl and dl:
        return is_widening(sl.group(1), dl.group(1))
    ss = re.fullmatch(r"struct<(.+)>", src, re.S)
    ds = re.fullmatch(r"struct<(.+)>", dst, re.S)
    if ss and ds:
        sf = [p.split(":", 1) for p in _split_top(ss.group(1))]
        df = [p.split(":", 1) for p in _split_top(ds.group(1))]
        if len(df) < len(sf):
            return False
        for (sn, st), (dn, dt) in zip(sf, df):
            if sn.strip() != dn.strip() or not is_widening(st, dt):
                return False
        return True  # extra dst fields are appended, read as NULL
    return dst in _PROMOTIONS.get(src, set())


_DISPLAY = {
    "int8": "TINYINT", "int16": "SMALLINT", "int32": "INTEGER",
    "int64": "BIGINT", "int128": "HUGEINT",
    "uint8": "UTINYINT", "uint16": "USMALLINT", "uint32": "UINTEGER",
    "uint64": "UBIGINT", "uint128": "UHUGEINT",
    "float32": "FLOAT", "float64": "DOUBLE", "boolean": "BOOLEAN",
    "varchar": "VARCHAR", "blob": "BLOB", "date": "DATE",
    "time": "TIME", "time_ns": "TIME_NS",
    "timetz": "TIME WITH TIME ZONE",
    "timestamp": "TIMESTAMP", "timestamp_us": "TIMESTAMP",
    "timestamp_s": "TIMESTAMP_S", "timestamp_ms": "TIMESTAMP_MS",
    "timestamp_ns": "TIMESTAMP_NS",
    "timestamptz": "TIMESTAMP WITH TIME ZONE",
    "uuid": "UUID", "json": "JSON", "interval": "INTERVAL",
    "variant": "VARIANT", "geometry": "GEOMETRY",
}


def ducklake_type_display(name: str) -> str:
    """DuckLake catalog type name -> DuckDB's display name (the text
    ``duckdb_columns().data_type`` / DESCRIBE show — reference renders
    LogicalType::ToString)."""
    low = name.strip().lower()
    if low in _DISPLAY:
        return _DISPLAY[low]
    m = re.fullmatch(r"decimal\((\d+)\s*,\s*(\d+)\)", low)
    if m:
        return f"DECIMAL({m.group(1)},{m.group(2)})"
    m = re.fullmatch(r"list<(.+)>", low, re.S)
    if m:
        return ducklake_type_display(m.group(1)) + "[]"
    m = re.fullmatch(r"map<(.+)>", low, re.S)
    if m:
        kv = _split_top(m.group(1))
        if len(kv) == 2:
            return (f"MAP({ducklake_type_display(kv[0])}, "
                    f"{ducklake_type_display(kv[1])})")
    m = re.fullmatch(r"struct<(.+)>", low, re.S)
    if m:
        parts = []
        for p in _split_top(m.group(1)):
            fname, ftype = p.split(":", 1)
            parts.append(f"{fname.strip()} {ducklake_type_display(ftype)}")
        return "STRUCT(" + ", ".join(parts) + ")"
    return name.upper()


def _split_top(s: str) -> list[str]:
    out, depth, cur = [], 0, []
    for ch in s:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


def nested_evolution(src: str, dst: str) -> list[str]:
    """Reference SET DATA TYPE semantics for nested types
    (GetNestedEvolution, ducklake_table_entry.cpp:972-1025): the
    container kind must match; struct fields are matched by name
    case-insensitively — matched fields promote recursively, fields
    only in the target are ADDED, fields only in the source are
    DROPPED. Returns the dotted paths of added fields (container hops
    appear as ``key``/``value``/``element`` segments). Raises
    ValueError when a matched pair is not a legal promotion."""
    added: list[str] = []

    def walk(s: str, d: str, prefix: list[str]) -> None:
        s, d = s.strip(), d.strip()
        sl, dl = s.lower(), d.lower()
        if sl == dl:
            return
        sm = re.fullmatch(r"map<(.+)>", s, re.I | re.S)
        dm = re.fullmatch(r"map<(.+)>", d, re.I | re.S)
        if sm and dm:
            skv, dkv = _split_top(sm.group(1)), _split_top(dm.group(1))
            if len(skv) != 2 or len(dkv) != 2:
                raise ValueError(f"malformed map type {s!r} / {d!r}")
            walk(skv[0], dkv[0], prefix + ["key"])
            walk(skv[1], dkv[1], prefix + ["value"])
            return
        ss = re.fullmatch(r"list<(.+)>", s, re.I | re.S)
        ds = re.fullmatch(r"list<(.+)>", d, re.I | re.S)
        if ss and ds:
            walk(ss.group(1), ds.group(1), prefix + ["element"])
            return
        ss = re.fullmatch(r"struct<(.+)>", s, re.I | re.S)
        ds = re.fullmatch(r"struct<(.+)>", d, re.I | re.S)
        if ss and ds:
            sfields = {n.strip().lower(): t for n, t in
                       (p.split(":", 1) for p in _split_top(ss.group(1)))}
            for part in _split_top(ds.group(1)):
                dn, dt = part.split(":", 1)
                key = dn.strip().lower()
                st = sfields.pop(key, None)
                if st is None:
                    added.append(".".join(prefix + [dn.strip()]))
                else:
                    walk(st, dt, prefix + [dn.strip()])
            # fields remaining in sfields are dropped — always allowed
            return
        # primitive (or kind-mismatched) pair
        if dl in _PROMOTIONS.get(sl, set()):
            return
        raise ValueError(
            f"type change {s} -> {d} is not a widening promotion")

    walk(src, dst, [])
    return added


def field_nodes(type_name: str) -> list[dict]:
    """Pre-order DFS rows for EVERY schema node nested under a column
    of the given type — the reference assigns each node its own
    ``ducklake_column`` row and parquet field id
    (DuckLakeFieldId::FieldIdFromType, ducklake_field_data.cpp:75-121:
    struct children in order, list/array -> one child named
    ``element``, map -> ``key`` then ``value``; ids allocated parent
    first, then children, depth-first).

    Each dict: ``name`` (plain segment name), ``type`` (the node's
    ducklake type TEXT, sliced from the input so spellings like
    ``geometry`` survive), ``path`` (dotted catalog path relative to
    the top-level column, '' prefix excluded), ``parent_path`` ('' =
    the top-level column itself), ``pq_path`` (the parquet
    path_in_schema relative to the top-level column: lists interpose a
    ``list`` group, maps a ``key_value`` group). Scalar types yield
    []."""
    out: list[dict] = []

    def walk(t: str, cat: str, pq: str) -> None:
        t = t.strip()
        low = t.lower()

        def add(name: str, typ: str, pq_seg: str) -> str:
            """Append a node; returns its cat path."""
            cpath = f"{cat}.{name}" if cat else name
            ppath = f"{pq}.{pq_seg}" if pq else pq_seg
            out.append({
                "name": name, "type": typ.strip(), "path": cpath,
                "parent_path": cat, "pq_path": ppath,
            })
            return cpath

        inner = None
        if low.startswith("list<") and t.endswith(">"):
            inner = t[5:-1]
        elif t.endswith("[]"):
            inner = t[:-2]
        if inner is not None:
            cp = add("element", inner, "list.element")
            walk(inner, cp, f"{pq}.list.element" if pq else "list.element")
            return
        if low.startswith("map<") and t.endswith(">"):
            kv = _split_top(t[4:-1])
            if len(kv) == 2:
                kp = add("key", kv[0], "key_value.key")
                walk(kv[0], kp,
                     f"{pq}.key_value.key" if pq else "key_value.key")
                vp = add("value", kv[1], "key_value.value")
                walk(kv[1], vp,
                     f"{pq}.key_value.value" if pq else "key_value.value")
            return
        if low.startswith("struct<") and t.endswith(">"):
            for part in _split_top(t[7:-1]):
                if ":" not in part:
                    continue
                n, ty = part.split(":", 1)
                n = n.strip()
                cp = add(n, ty, n)
                walk(ty, cp, f"{pq}.{n}" if pq else n)
            return

    walk(type_name, "", "")
    return out


