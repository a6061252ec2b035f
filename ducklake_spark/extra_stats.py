"""Extended per-file column statistics: geometry bboxes and shredded
VARIANT field stats.

The reference stores two kinds of "extra" stats beside the plain
min/max zone maps (SURVEY §1.4):

- GEOMETRY columns get a bounding box + the set of geometry types seen,
  serialized as JSON ``{"bbox": {...}, "types": [...]}`` into
  ``ducklake_file_column_stats.extra_stats``
  (src/storage/statistics/ducklake_geo_stats.cpp:16-72, merge :31-44).
- VARIANT columns get per-shredded-field stats — field name, shredded
  type, null count, min/max — written both as rows of
  ``ducklake_file_variant_stats`` and as a JSON array in
  ``extra_stats`` (src/storage/statistics/ducklake_variant_stats.cpp:59-69,
  156-192; table-level merge keeps only fields present in every file
  with an identical shredded type, :25-51).

Spark mapping: the reference harvests these from its writer; we run ONE
distributed pass over the just-written files — reading only the
geometry/variant columns plus ``_metadata.file_path`` — and compute
per-(file, column) partial aggregates inside ``mapInPandas`` (no
shuffle; the driver merges the tiny partials). Geometry values are WKB
bytes (the storage encoding Spark/Sedona/GeoParquet share); variant
values are JSON text.
"""

from __future__ import annotations

import json
import math
import re
import struct
from dataclasses import dataclass, field

__all__ = [
    "GeoStats",
    "VariantStats",
    "VariantFieldAcc",
    "wkb_bbox",
    "harvest_extra_stats",
    "merge_extra_stats_json",
    "bbox_disjoint_json",
    "variant_rows_from_json",
]


# --------------------------------------------------------------------------
# WKB parsing (bbox + geometry-type extraction)
# --------------------------------------------------------------------------

_BASE_NAMES = {
    0: "unknown",
    1: "point",
    2: "linestring",
    3: "polygon",
    4: "multipoint",
    5: "multilinestring",
    6: "multipolygon",
    7: "geometrycollection",
}

_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000
_EWKB_SRID = 0x20000000


@dataclass
class GeoStats:
    """Running bbox + type set for one geometry column in one file.

    JSON layout matches the reference serializer
    (ducklake_geo_stats.cpp:46-72): unset extremes serialize as null.
    """

    xmin: float = math.inf
    xmax: float = -math.inf
    ymin: float = math.inf
    ymax: float = -math.inf
    zmin: float = math.inf
    zmax: float = -math.inf
    mmin: float = math.inf
    mmax: float = -math.inf
    types: set = field(default_factory=set)

    def update_wkb(self, buf: bytes) -> None:
        name = _scan(buf, 0, self)[1]
        self.types.add(name)

    def merge(self, other: "GeoStats") -> None:
        self.xmin = min(self.xmin, other.xmin)
        self.xmax = max(self.xmax, other.xmax)
        self.ymin = min(self.ymin, other.ymin)
        self.ymax = max(self.ymax, other.ymax)
        self.zmin = min(self.zmin, other.zmin)
        self.zmax = max(self.zmax, other.zmax)
        self.mmin = min(self.mmin, other.mmin)
        self.mmax = max(self.mmax, other.mmax)
        self.types |= other.types

    def to_json(self) -> str:
        # reference-exact text (ducklake_geo_stats.cpp serializes with
        # printf %f — ducklake_geometry.test pins "xmin": 1.000000)
        def lo(v):
            return "null" if v == math.inf else f"{v:.6f}"

        def hi(v):
            return "null" if v == -math.inf else f"{v:.6f}"

        bbox = (f'"xmin": {lo(self.xmin)}, "xmax": {hi(self.xmax)}, '
                f'"ymin": {lo(self.ymin)}, "ymax": {hi(self.ymax)}, '
                f'"zmin": {lo(self.zmin)}, "zmax": {hi(self.zmax)}, '
                f'"mmin": {lo(self.mmin)}, "mmax": {hi(self.mmax)}')
        types = ", ".join(json.dumps(t) for t in sorted(self.types))
        return '{"bbox": {' + bbox + '}, "types": [' + types + "]}"

    @classmethod
    def from_json(cls, s: str) -> "GeoStats":
        doc = json.loads(s)
        g = cls()
        bbox = doc.get("bbox") or {}
        for k, default in (
            ("xmin", math.inf), ("ymin", math.inf),
            ("zmin", math.inf), ("mmin", math.inf),
        ):
            v = bbox.get(k)
            setattr(g, k, default if v is None else float(v))
        for k, default in (
            ("xmax", -math.inf), ("ymax", -math.inf),
            ("zmax", -math.inf), ("mmax", -math.inf),
        ):
            v = bbox.get(k)
            setattr(g, k, default if v is None else float(v))
        g.types = set(doc.get("types") or [])
        return g


def wkb_bbox(buf: bytes) -> tuple:
    """(xmin, xmax, ymin, ymax) of a single WKB geometry — test/debug
    helper; the harvest path uses GeoStats.update_wkb directly."""
    g = GeoStats()
    g.update_wkb(buf)
    return (g.xmin, g.xmax, g.ymin, g.ymax)


def _scan(buf: bytes, off: int, st: GeoStats) -> tuple:
    """Parse one geometry at ``off``; fold coords into ``st``.
    Returns (next_offset, type_name). Accepts ISO WKB (type = base +
    1000·dim) and EWKB (Z/M/SRID flag bits)."""
    order = buf[off]
    off += 1
    fmt = "<" if order == 1 else ">"
    (code,) = struct.unpack_from(fmt + "I", buf, off)
    off += 4
    has_z = bool(code & _EWKB_Z)
    has_m = bool(code & _EWKB_M)
    has_srid = bool(code & _EWKB_SRID)
    code &= 0x0FFFFFFF
    iso = code // 1000
    base = code % 1000
    if iso == 1:
        has_z = True
    elif iso == 2:
        has_m = True
    elif iso == 3:
        has_z = has_m = True
    if has_srid:
        off += 4
    ndim = 2 + has_z + has_m
    name = _BASE_NAMES.get(base, "unknown") + (
        "_zm" if has_z and has_m else "_z" if has_z else "_m" if has_m else ""
    )

    def points(n: int, o: int) -> int:
        nonlocal st
        vals = struct.unpack_from(f"{fmt}{n * ndim}d", buf, o)
        for i in range(0, n * ndim, ndim):
            x, y = vals[i], vals[i + 1]
            if x == x:  # empty points encode as NaN coords
                st.xmin = min(st.xmin, x)
                st.xmax = max(st.xmax, x)
            if y == y:
                st.ymin = min(st.ymin, y)
                st.ymax = max(st.ymax, y)
            j = i + 2
            if has_z:
                z = vals[j]
                j += 1
                if z == z:
                    st.zmin = min(st.zmin, z)
                    st.zmax = max(st.zmax, z)
            if has_m:
                m = vals[j]
                if m == m:
                    st.mmin = min(st.mmin, m)
                    st.mmax = max(st.mmax, m)
        return o + 8 * n * ndim

    if base == 1:  # point
        off = points(1, off)
    elif base == 2:  # linestring
        (n,) = struct.unpack_from(fmt + "I", buf, off)
        off = points(n, off + 4)
    elif base == 3:  # polygon
        (nrings,) = struct.unpack_from(fmt + "I", buf, off)
        off += 4
        for _ in range(nrings):
            (n,) = struct.unpack_from(fmt + "I", buf, off)
            off = points(n, off + 4)
    elif base in (4, 5, 6, 7):  # multi* / collection: nested full headers
        (n,) = struct.unpack_from(fmt + "I", buf, off)
        off += 4
        for _ in range(n):
            off = _scan(buf, off, st)[0]
    else:
        raise ValueError(f"unsupported WKB geometry type code {base}")
    return off, name


# --------------------------------------------------------------------------
# Shredded VARIANT stats
# --------------------------------------------------------------------------

# scalar JSON value -> DuckLake shredded type; numerics widen WITHIN a
# file (int32 -> int64 -> double), but across files any type mismatch
# un-shreds the field (the reference drops fields whose shredded types
# differ, ducklake_variant_stats.cpp:39-43). int32 for INTEGER-ranged
# values matches duckdb's 42::VARIANT (variant_mixed_type_stats.test
# pins 'root int32 42 42' in ducklake_file_variant_stats).
_NUM_TYPES = {"int32", "int64", "double"}


def _classify(v) -> str | None:
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "int32" if -2**31 <= v < 2**31 else "int64"
    if isinstance(v, float):
        return "double"
    if isinstance(v, str):
        return "varchar"
    return None  # null / nested object / array: not a shredded scalar


@dataclass
class VariantFieldAcc:
    shredded_type: str | None = None
    value_count: int = 0
    min_value: object = None
    max_value: object = None
    dropped: bool = False

    def add(self, v) -> None:
        if self.dropped:
            return
        t = _classify(v)
        if t is None:
            if v is None:
                return  # explicit null: counted via object_rows - value_count
            self.dropped = True  # nested object/array: not shreddable
            return
        self._absorb_type(t)
        if self.dropped:
            return
        self.value_count += 1
        key = _order_key(v)
        if self.min_value is None or key < _order_key(self.min_value):
            self.min_value = v
        if self.max_value is None or key > _order_key(self.max_value):
            self.max_value = v

    def _absorb_type(self, t: str) -> None:
        if self.shredded_type is None or self.shredded_type == t:
            self.shredded_type = t
        elif t in _NUM_TYPES and self.shredded_type in _NUM_TYPES:
            # within-file numeric widening: int32 -> int64 -> double
            self.shredded_type = ("double" if "double" in
                                  (t, self.shredded_type) else "int64")
        else:
            self.dropped = True

    def merge(self, other: "VariantFieldAcc") -> None:
        if self.dropped or other.dropped:
            self.dropped = True
            return
        if other.shredded_type is not None:
            self._absorb_type(other.shredded_type)
        if self.dropped:
            return
        self.value_count += other.value_count
        for v in (other.min_value,):
            if v is not None and (
                self.min_value is None or _order_key(v) < _order_key(self.min_value)
            ):
                self.min_value = v
        for v in (other.max_value,):
            if v is not None and (
                self.max_value is None or _order_key(v) > _order_key(self.max_value)
            ):
                self.max_value = v


def _order_key(v):
    if isinstance(v, bool):
        return (0, int(v))
    if isinstance(v, (int, float)):
        return (1, v)
    return (2, v)


def _stat_text(v) -> str | None:
    if v is None:
        return None
    if isinstance(v, bool):
        # duckdb serializes boolean shredded min/max as 1/0
        # (variant_shredded_stats.test pins "b" boolean 1 1)
        return "1" if v else "0"
    return str(v)


@dataclass
class VariantStats:
    """Per-file shredded-field stats for one VARIANT/JSON column.

    ``object_rows`` counts rows whose value is a JSON object — a
    field's null_count is ``object_rows - value_count`` (missing and
    explicit-null both count), computed at serialization so partials
    from different Arrow batches of the same file merge exactly.
    """

    object_rows: int = 0
    fields: dict = field(default_factory=dict)
    total_rows: int = 0     # every row, NULLs included
    nonnull_rows: int = 0
    root: object = None     # scalar accumulator -> variant_path 'root'
    element: object = None  # list-element accumulator -> 'element'
    root_kind: str | None = None  # scalar | list | object | mixed

    def _note_kind(self, kind: str) -> None:
        if self.root_kind is None:
            self.root_kind = kind
        elif self.root_kind != kind:
            # mixed top-level shapes: nothing shreds (reference
            # variant_shredded_stats.test "completely inconsistent")
            self.root_kind = "mixed"

    def add_json(self, text) -> None:
        self.total_rows += 1
        if text is None:
            return
        try:
            doc = json.loads(text)
        except (ValueError, TypeError):
            return
        self.nonnull_rows += 1
        if isinstance(doc, dict):
            self._note_kind("object")
            self.object_rows += 1
            for k, v in doc.items():
                self.fields.setdefault(k, VariantFieldAcc()).add(v)
            return
        if isinstance(doc, list):
            self._note_kind("list")
            if self.element is None:
                self.element = VariantFieldAcc()
            for el in doc:
                self.element.add(el)
            return
        self._note_kind("scalar")
        if self.root is None:
            self.root = VariantFieldAcc()
        self.root.add(doc)

    def merge(self, other: "VariantStats") -> None:
        """Same-file partial merge: union of fields."""
        self.object_rows += other.object_rows
        self.total_rows += other.total_rows
        self.nonnull_rows += other.nonnull_rows
        if other.root_kind is not None:
            self._note_kind(other.root_kind)
        for mine_attr in ("root", "element"):
            theirs = getattr(other, mine_attr)
            if theirs is None:
                continue
            mine = getattr(self, mine_attr)
            if mine is None:
                setattr(self, mine_attr, theirs)
            else:
                mine.merge(theirs)
        for k, acc in other.fields.items():
            mine = self.fields.get(k)
            if mine is None:
                self.fields[k] = acc
            else:
                mine.merge(acc)

    def rows(self):
        """[(variant_path, shredded_type, value_count, null_count,
        min_value, max_value)] for ducklake_file_variant_stats.
        Top-level scalars shred under 'root', homogeneous lists under
        'element' — each ONLY when the top-level shape is uniformly
        that kind. Object FIELDS always shred (a mixed object+scalar
        file still lists its sub-fields — variant_shredded_stats.test
        not_fully_shredded_object: "a"/"b"/"c" rows with no root
        row)."""
        out = []
        if self.root_kind == "scalar" and self.root is not None \
                and not self.root.dropped \
                and self.root.shredded_type is not None:
            out.append((
                "root", self.root.shredded_type, self.root.value_count,
                self.total_rows - self.nonnull_rows,
                _stat_text(self.root.min_value),
                _stat_text(self.root.max_value),
            ))
        if self.root_kind == "list" and self.element is not None \
                and not self.element.dropped \
                and self.element.shredded_type is not None:
            out.append((
                "element", self.element.shredded_type,
                self.element.value_count,
                self.total_rows - self.nonnull_rows,
                _stat_text(self.element.min_value),
                _stat_text(self.element.max_value),
            ))
        for name in sorted(self.fields):
            acc = self.fields[name]
            if acc.dropped or acc.shredded_type is None:
                continue
            out.append(
                (
                    # object-field paths store QUOTED segments — the
                    # reference's variant_path / field_name text is
                    # '"a"' (variant_shredded_stats.test listings)
                    f'"{name}"',
                    acc.shredded_type,
                    acc.value_count,
                    # null_count counts every row NOT carrying the
                    # field — top-level NULL variants included
                    # (variant_shredded_stats.test
                    # fully_shredded_object_with_nulls: "a" over
                    # (NULL, {a,b}, NULL, {a,c}) -> null_count 2)
                    self.total_rows - acc.value_count,
                    _stat_text(acc.min_value),
                    _stat_text(acc.max_value),
                )
            )
        return out

    def to_json(self) -> str | None:
        """Reference-shaped array (ducklake_variant_stats.cpp:156-192);
        None when nothing shredded (TrySerialize returns false, :194-198)."""
        rows = self.rows()
        if not rows:
            return None
        return json.dumps(
            [
                {
                    "field_name": n,
                    "shredded_type": t,
                    "num_values": vc,
                    "null_count": nc,
                    "min": mn,
                    "max": mx,
                }
                for n, t, vc, nc, mn, mx in rows
            ],
            separators=(", ", ": "),
        )

    @staticmethod
    def _acc_doc(a):
        if a is None:
            return None
        return {"shredded_type": a.shredded_type,
                "value_count": a.value_count,
                "min": a.min_value, "max": a.max_value,
                "dropped": a.dropped}

    @staticmethod
    def _acc_from(d):
        if d is None:
            return None
        return VariantFieldAcc(
            shredded_type=d["shredded_type"],
            value_count=d["value_count"],
            min_value=d["min"], max_value=d["max"],
            dropped=d["dropped"])

    def to_partial_json(self) -> str:
        return json.dumps(
            {
                "object_rows": self.object_rows,
                "total_rows": self.total_rows,
                "nonnull_rows": self.nonnull_rows,
                "root_kind": self.root_kind,
                "root": self._acc_doc(self.root),
                "element": self._acc_doc(self.element),
                "fields": {
                    k: self._acc_doc(a) for k, a in self.fields.items()
                },
            }
        )

    @classmethod
    def from_partial_json(cls, s: str) -> "VariantStats":
        doc = json.loads(s)
        vs = cls(object_rows=doc["object_rows"],
                 total_rows=doc.get("total_rows", 0),
                 nonnull_rows=doc.get("nonnull_rows", 0),
                 root_kind=doc.get("root_kind"),
                 root=cls._acc_from(doc.get("root")),
                 element=cls._acc_from(doc.get("element")))
        for k, a in doc["fields"].items():
            vs.fields[k] = cls._acc_from(a)
        return vs


def variant_rows_from_json(s: str) -> list:
    """Parse a serialized extra_stats array back into catalog-row tuples."""
    return [
        (
            d["field_name"],
            d["shredded_type"],
            d.get("num_values", 0),
            d.get("null_count", 0),
            d.get("min"),
            d.get("max"),
        )
        for d in json.loads(s)
    ]


# --------------------------------------------------------------------------
# Table-level (cross-file) merge of serialized extra stats
# --------------------------------------------------------------------------


def merge_extra_stats_json(old: str | None, new: str | None) -> str | None:
    """Merge two serialized extra_stats payloads for the global
    ducklake_table_column_stats row.

    Geometry merges widen-only (bbox union, type-set union —
    ducklake_geo_stats.cpp:31-44). Variant merges keep the intersection
    of fields with identical shredded types (ducklake_variant_stats.cpp:
    25-51) — so a missing side empties the result.
    """
    if old is None:
        return new
    if new is None:
        # a file contributing NO extra stats (e.g. an encrypted write,
        # where the harvest is skipped) invalidates the global payload:
        # keeping the old bbox would report bounds that exclude the new
        # file's data — stats must widen, never lie. (A file of NULL
        # geometries is NOT this case: it contributes an empty-bbox
        # payload and merges harmlessly.)
        return None
    if old.lstrip().startswith("{"):  # geometry
        g = GeoStats.from_json(old)
        g.merge(GeoStats.from_json(new))
        return g.to_json()
    # variant: intersect on (field, type)
    a = {d[0]: d for d in variant_rows_from_json(old)}
    b = {d[0]: d for d in variant_rows_from_json(new)}
    merged = []
    for name in sorted(a.keys() & b.keys()):
        an, bn = a[name], b[name]
        if an[1] != bn[1]:
            continue
        typ = an[1]
        numeric = typ in ("int32", "int64", "bigint", "double")

        def _key(x):
            return float(x) if numeric else x

        mins = [v for v in (an[4], bn[4]) if v is not None]
        maxs = [v for v in (an[5], bn[5]) if v is not None]
        merged.append(
            {
                "field_name": name,
                "shredded_type": typ,
                "num_values": an[2] + bn[2],
                "null_count": an[3] + bn[3],
                "min": min(mins, key=_key) if mins else None,
                "max": max(maxs, key=_key) if maxs else None,
            }
        )
    if not merged:
        return None
    return json.dumps(merged, separators=(", ", ": "))


def bbox_disjoint_json(extra: str, box: tuple) -> bool:
    """True when the file's stored bbox provably cannot intersect
    ``box`` = (xmin, ymin, xmax, ymax) — the pruning contradiction."""
    try:
        g = GeoStats.from_json(extra)
    except (ValueError, TypeError):
        return False
    if g.xmin == math.inf or g.ymin == math.inf:
        return False  # no coordinate evidence: keep the file
    qxmin, qymin, qxmax, qymax = box
    return g.xmax < qxmin or g.xmin > qxmax or g.ymax < qymin or g.ymin > qymax


# --------------------------------------------------------------------------
# Distributed harvest
# --------------------------------------------------------------------------


def variant_display_text(txt):
    """duckdb's VARIANT rendering from JSON-text storage: unquoted
    strings (nested too), NULL for json null, {'k': v} objects and
    [a, b] arrays (types/variant.test; VARIANT::VARCHAR casts sort by
    this text — variant_mixed_type_stats.test ORDER BY v::VARCHAR)."""
    if txt is None:
        return None
    try:
        val = json.loads(txt)
    except (ValueError, TypeError):
        return txt

    def r(v) -> str:
        if v is None:
            return "NULL"
        if v is True:
            return "true"
        if v is False:
            return "false"
        if isinstance(v, str):
            return v
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, int):
            return str(v)
        if isinstance(v, list):
            return "[" + ", ".join(r(x) for x in v) + "]"
        if isinstance(v, dict):
            return "{" + ", ".join(f"'{k}': {r(x)}"
                                   for k, x in v.items()) + "}"
        return str(v)

    return r(val)


def harvest_extra_stats(spark, paths, geo_cols, var_cols):
    """One pass over ``paths`` (absolute parquet file paths) computing
    per-file GeoStats / VariantStats for the named columns.

    Reads only the needed columns plus ``_metadata.file_path``;
    ``mapInPandas`` emits one partial row per (input-batch, file,
    column) and the driver merges partials — no shuffle, and the
    full column data never lands on the driver.

    Returns {absolute_path: {column_name: GeoStats | VariantStats}}.
    """
    from urllib.parse import unquote, urlparse

    from pyspark.sql import functions as F

    if not paths:
        return {}
    reader = spark.read.parquet(*paths)
    avail = set(reader.columns)  # adopted foreign files may lack columns
    geo_cols = [c for c in geo_cols if c in avail]
    var_cols = [c for c in var_cols if c in avail]
    cols = geo_cols + var_cols
    if not cols:
        return {}
    df = reader.select(
        F.col("_metadata.file_path").alias("__fp"), *[F.col(c) for c in cols]
    )

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for fp, grp in pdf.groupby("__fp", sort=False):
                for c in geo_cols:
                    # always emitted for geometry columns (a file of
                    # NULLs still records an empty bbox + type set);
                    # malformed WKB values are skipped — extended stats
                    # are a pruning aid and must never fail the write.
                    # Values may be NESTED (list/struct/map of
                    # geometry): walk containers and fold every WKB
                    # payload into the one column-level bbox, like the
                    # reference (geo/ducklake_geometry_nested_*.test)
                    gs = GeoStats()

                    def _fold(v):
                        if v is None:
                            return
                        if isinstance(v, (bytes, bytearray)):
                            try:
                                gs.update_wkb(bytes(v))
                            except (ValueError, IndexError,
                                    struct.error):
                                pass
                            return
                        if isinstance(v, dict):
                            for k2, v2 in v.items():
                                _fold(k2)
                                _fold(v2)
                            return
                        if hasattr(v, "__iter__") and not isinstance(
                                v, str):
                            for x in v:
                                _fold(x)

                    for v in grp[c]:
                        _fold(v)
                    out.append((fp, c, "geo", gs.to_json()))
                for c in var_cols:
                    vs = VariantStats()
                    for v in grp[c]:
                        vs.add_json(v)
                    out.append((fp, c, "variant", vs.to_partial_json()))
            yield pd.DataFrame(
                out, columns=["file", "column", "kind", "payload"]
            )

    partials = df.mapInPandas(
        gen, "file string, column string, kind string, payload string"
    ).collect()

    result: dict = {}
    for row in partials:
        path = unquote(urlparse(row["file"]).path) or row["file"]
        per_col = result.setdefault(path, {})
        if row["kind"] == "geo":
            gs = GeoStats.from_json(row["payload"])
            if row["column"] in per_col:
                per_col[row["column"]].merge(gs)
            else:
                per_col[row["column"]] = gs
        else:
            vs = VariantStats.from_partial_json(row["payload"])
            if row["column"] in per_col:
                per_col[row["column"]].merge(vs)
            else:
                per_col[row["column"]] = vs
    return result


# ------------------------------------------------------------- WKT <-> WKB
# The engine stores GEOMETRY as ISO WKB (little-endian); duckdb's SQL
# surface speaks WKT ('POINT (1 2)'::GEOMETRY, and GEOMETRY values
# display as WKT). These converters back the dialect translation and
# the sqllogictest renderer (test/sql/geo/*).

_WKT_CODES = {v.upper(): k for k, v in _BASE_NAMES.items() if k}


def _wkt_tokens(s: str) -> list:
    return re.findall(r"[A-Za-z]+|\(|\)|,|-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?",
                      s)


def wkt_to_wkb(wkt: str) -> bytes:
    """Parse a WKT literal into ISO little-endian WKB. Supports all 7
    geometry types with Z/M/ZM dimensions and EMPTY."""
    toks = _wkt_tokens(wkt)
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def take():
        nonlocal pos
        t = peek()
        pos += 1
        return t

    def expect(t):
        got = take()
        if got != t:
            raise ValueError(f"WKT: expected {t!r}, got {got!r}")

    def number():
        return float(take())

    def coords(ndims):
        return [number() for _ in range(ndims)]

    def point_seq(ndims):
        out = []
        expect("(")
        while True:
            out.append(coords(ndims))
            if peek() == ",":
                take()
                continue
            break
        expect(")")
        return out

    def geometry() -> bytes:
        nonlocal pos
        name = take()
        if name is None:
            raise ValueError("WKT: empty input")
        base = _WKT_CODES.get(name.upper())
        if base is None:
            raise ValueError(f"WKT: unknown type {name!r}")
        dim = ""
        if peek() and peek().upper() in ("Z", "M", "ZM"):
            dim = take().upper()
        code = base + {"": 0, "Z": 1000, "M": 2000, "ZM": 3000}[dim]
        ndims = 2 + len(dim)
        hdr = struct.pack("<BI", 1, code)
        if peek() and peek().upper() == "EMPTY":
            take()
            if base == 1:  # empty point: NaN coords
                return hdr + struct.pack(f"<{ndims}d",
                                         *([float("nan")] * ndims))
            return hdr + struct.pack("<I", 0)
        if base == 1:
            expect("(")
            c = coords(ndims)
            expect(")")
            return hdr + struct.pack(f"<{ndims}d", *c)
        if base == 2:
            pts = point_seq(ndims)
            return hdr + struct.pack("<I", len(pts)) + b"".join(
                struct.pack(f"<{ndims}d", *p) for p in pts)
        if base == 3:
            expect("(")
            rings = []
            while True:
                rings.append(point_seq(ndims))
                if peek() == ",":
                    take()
                    continue
                break
            expect(")")
            return hdr + struct.pack("<I", len(rings)) + b"".join(
                struct.pack("<I", len(r)) + b"".join(
                    struct.pack(f"<{ndims}d", *p) for p in r)
                for r in rings)
        if base in (4, 5, 6):
            # parts are written as full WKB children; WKT allows the
            # bare form (MULTIPOINT (1 2, 3 4)) and the parenthesized
            # form (MULTIPOINT ((1 2), (3 4)))
            child_name = {4: "POINT", 5: "LINESTRING", 6: "POLYGON"}[base]
            expect("(")
            parts = []
            while True:
                sub = (f"{child_name} {dim} " if dim else f"{child_name} ")
                if peek() == "(" or (base == 4 and peek() not in (")",)):
                    # reconstruct the child's token stream
                    depth = 0
                    start = pos
                    if peek() != "(":  # bare multipoint coords
                        c = coords(ndims)
                        parts.append(wkt_to_wkb(
                            sub + "(" + " ".join(map(repr, c)) + ")"))
                    else:
                        while pos < len(toks):
                            t = toks[pos]
                            if t == "(":
                                depth += 1
                            elif t == ")":
                                depth -= 1
                            pos += 1
                            if depth == 0:
                                break
                        inner = " ".join(
                            t if t not in (",",) else ", "
                            for t in toks[start:pos])
                        parts.append(wkt_to_wkb(sub + inner))
                if peek() == ",":
                    take()
                    continue
                break
            expect(")")
            return hdr + struct.pack("<I", len(parts)) + b"".join(parts)
        # geometrycollection
        expect("(")
        parts = []
        while True:
            parts.append(geometry())
            if peek() == ",":
                take()
                continue
            break
        expect(")")
        return hdr + struct.pack("<I", len(parts)) + b"".join(parts)

    out = geometry()
    if pos != len(toks):
        raise ValueError("WKT: trailing tokens")
    return out


def _wkt_num(v: float) -> str:
    if v == v and v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def wkb_to_wkt(buf: bytes) -> str:
    """Render ISO/EWKB bytes as duckdb-style WKT text. Raises on
    anything that is not a complete, valid WKB payload."""
    if not isinstance(buf, (bytes, bytearray)) or len(buf) < 5:
        raise ValueError("not wkb")

    def parse(off: int) -> tuple:
        if off + 5 > len(buf):
            raise ValueError("truncated")
        endian = buf[off]
        if endian not in (0, 1):
            raise ValueError("bad endian byte")
        fmt = "<" if endian == 1 else ">"
        (code,) = struct.unpack_from(fmt + "I", buf, off + 1)
        off += 5
        has_srid = bool(code & 0x20000000)
        z = bool(code & _EWKB_Z)
        m = bool(code & _EWKB_M)
        code &= ~(0x20000000 | _EWKB_Z | _EWKB_M)
        if has_srid:
            off += 4
        if code >= 3000:
            base, z, m = code - 3000, True, True
        elif code >= 2000:
            base, m = code - 2000, True
        elif code >= 1000:
            base, z = code - 1000, True
        else:
            base = code
        if base not in _BASE_NAMES or base == 0:
            raise ValueError(f"bad geometry code {code}")
        ndims = 2 + z + m
        dim = (" Z" if z and not m else " M" if m and not z
               else " ZM" if z and m else "")
        name = _BASE_NAMES[base].upper()

        def pt(off):
            if off + 8 * ndims > len(buf):
                raise ValueError("truncated point")
            vals = struct.unpack_from(f"{fmt}{ndims}d", buf, off)
            return " ".join(_wkt_num(v) for v in vals), off + 8 * ndims

        def count(off):
            if off + 4 > len(buf):
                raise ValueError("truncated count")
            (n,) = struct.unpack_from(fmt + "I", buf, off)
            if n > 10_000_000:
                raise ValueError("implausible count")
            return n, off + 4

        if base == 1:
            txt, off = pt(off)
            if "nan" in txt:
                return f"{name}{dim} EMPTY", off
            return f"{name}{dim} ({txt})", off
        if base == 2:
            n, off = count(off)
            pts = []
            for _ in range(n):
                t, off = pt(off)
                pts.append(t)
            if not pts:
                return f"{name}{dim} EMPTY", off
            return f"{name}{dim} (" + ", ".join(pts) + ")", off
        if base == 3:
            n, off = count(off)
            rings = []
            for _ in range(n):
                k, off = count(off)
                pts = []
                for _ in range(k):
                    t, off = pt(off)
                    pts.append(t)
                rings.append("(" + ", ".join(pts) + ")")
            if not rings:
                return f"{name}{dim} EMPTY", off
            return f"{name}{dim} (" + ", ".join(rings) + ")", off
        # multi*/collection: children are full WKB geometries
        n, off = count(off)
        parts = []
        for _ in range(n):
            t, off = parse(off)
            parts.append(t)
        if not parts:
            return f"{name}{dim} EMPTY", off
        if base in (4, 5, 6):
            # duckdb strips the child's type name inside multis:
            # MULTIPOINT ((1 2), (3 4)), MULTILINESTRING ((0 0, 1 1));
            # an EMPTY child has no "(" — rendered as bare EMPTY
            inner = ", ".join(
                "(" + p.split("(", 1)[1] if "(" in p else "EMPTY"
                for p in parts)
        else:
            inner = ", ".join(parts)
        return f"{name}{dim} (" + inner + ")", off

    txt, end = parse(0)
    if end != len(buf):
        raise ValueError("trailing bytes")
    return txt
