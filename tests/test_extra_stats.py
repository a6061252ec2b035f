"""Extended column statistics: geometry bboxes + shredded VARIANT stats.

Mirrors the reference's extra-stats behavior
(src/storage/statistics/ducklake_geo_stats.cpp,
src/storage/statistics/ducklake_variant_stats.cpp): per-file
extra_stats JSON, ducklake_file_variant_stats rows, widen-only /
intersection table-level merges, and pruning through both.
"""

from __future__ import annotations

import json
import math
import struct

import pytest

import conftest


@pytest.fixture()
def lake(spark, tmp_path):
    from ducklake_spark.lake import DuckLake

    return DuckLake.attach(
        spark, conftest.catalog_url(tmp_path), str(tmp_path / "data")
    )


# ---------------------------------------------------------------- WKB helpers


def wkb_point(x, y, z=None, m=None, *, big=False, srid=None):
    """Build ISO/EWKB point bytes for tests."""
    fmt = ">" if big else "<"
    code = 1
    if srid is not None:
        code |= 0x20000000
    if z is not None and m is not None:
        code += 3000
    elif z is not None:
        code += 1000
    elif m is not None:
        code += 2000
    buf = struct.pack(fmt + "BI", 0 if big else 1, code)
    if srid is not None:
        buf += struct.pack(fmt + "I", srid)
    coords = [x, y] + ([z] if z is not None else []) + ([m] if m is not None else [])
    return buf + struct.pack(f"{fmt}{len(coords)}d", *coords)


def wkb_linestring(points):
    buf = struct.pack("<BII", 1, 2, len(points))
    for x, y in points:
        buf += struct.pack("<2d", x, y)
    return buf


def wkb_polygon(rings):
    buf = struct.pack("<BII", 1, 3, len(rings))
    for ring in rings:
        buf += struct.pack("<I", len(ring))
        for x, y in ring:
            buf += struct.pack("<2d", x, y)
    return buf


def wkb_multipoint(points):
    buf = struct.pack("<BII", 1, 4, len(points))
    for x, y in points:
        buf += wkb_point(x, y)
    return buf


def wkb_collection(geoms):
    buf = struct.pack("<BII", 1, 7, len(geoms))
    for g in geoms:
        buf += g
    return buf


# ---------------------------------------------------------------- parser unit


def test_wkb_bbox_point_variants():
    from ducklake_spark.extra_stats import GeoStats

    g = GeoStats()
    g.update_wkb(wkb_point(1.0, 2.0))
    g.update_wkb(wkb_point(-3.0, 7.5, z=10.0))
    g.update_wkb(wkb_point(0.0, 0.0, m=42.0))
    g.update_wkb(wkb_point(5.0, 5.0, z=1.0, m=2.0))
    assert (g.xmin, g.xmax) == (-3.0, 5.0)
    assert (g.ymin, g.ymax) == (0.0, 7.5)
    assert (g.zmin, g.zmax) == (1.0, 10.0)
    assert (g.mmin, g.mmax) == (2.0, 42.0)
    assert g.types == {"point", "point_z", "point_m", "point_zm"}


def test_wkb_bbox_big_endian_and_srid():
    from ducklake_spark.extra_stats import wkb_bbox

    assert wkb_bbox(wkb_point(3.0, -4.0, big=True)) == (3.0, 3.0, -4.0, -4.0)
    assert wkb_bbox(wkb_point(1.5, 2.5, srid=4326)) == (1.5, 1.5, 2.5, 2.5)


def test_wkb_bbox_nested_geometries():
    from ducklake_spark.extra_stats import GeoStats

    g = GeoStats()
    g.update_wkb(wkb_linestring([(0, 0), (10, 5)]))
    g.update_wkb(wkb_polygon([[(1, 1), (2, 1), (2, 2), (1, 1)]]))
    g.update_wkb(wkb_multipoint([(-5, 3)]))
    g.update_wkb(wkb_collection([wkb_point(20, -1)]))
    assert (g.xmin, g.xmax, g.ymin, g.ymax) == (-5.0, 20.0, -1.0, 5.0)
    assert g.types == {
        "linestring", "polygon", "multipoint", "geometrycollection",
    }


def test_wkb_empty_point_nan_skipped():
    from ducklake_spark.extra_stats import GeoStats

    g = GeoStats()
    g.update_wkb(wkb_point(float("nan"), float("nan")))
    assert g.xmin == math.inf and g.xmax == -math.inf
    assert g.to_json().startswith('{"bbox": {"xmin": null')


def test_geo_json_roundtrip_and_merge():
    from ducklake_spark.extra_stats import GeoStats

    a = GeoStats()
    a.update_wkb(wkb_point(0, 0))
    b = GeoStats.from_json(a.to_json())
    assert (b.xmin, b.ymax) == (0.0, 0.0) and b.types == {"point"}
    c = GeoStats()
    c.update_wkb(wkb_point(9, -9, z=4))
    b.merge(c)
    assert (b.xmin, b.xmax, b.ymin, b.ymax) == (0.0, 9.0, -9.0, 0.0)
    assert b.types == {"point", "point_z"}


# ----------------------------------------------------------- variant shredding


def test_variant_stats_shred_and_nulls():
    from ducklake_spark.extra_stats import VariantStats

    vs = VariantStats()
    vs.add_json('{"a": 1, "b": "x", "flag": true}')
    vs.add_json('{"a": 9, "b": "m"}')
    vs.add_json('{"a": null}')
    vs.add_json(None)
    vs.add_json("not json")
    rows = {r[0]: r for r in vs.rows()}
    # reference shape (variant_shredded_stats.test): quoted field
    # paths, null_count = total rows - value_count (NULL/garbage rows
    # included), boolean min/max as 1/0
    assert rows['"a"'] == ('"a"', "int32", 2, 3, "1", "9")
    assert rows['"b"'] == ('"b"', "varchar", 2, 3, "m", "x")
    assert rows['"flag"'] == ('"flag"', "boolean", 1, 4, "1", "1")


def test_variant_stats_type_conflict_drops_field():
    from ducklake_spark.extra_stats import VariantStats

    vs = VariantStats()
    vs.add_json('{"a": 1, "c": {"nested": 1}}')
    vs.add_json('{"a": "oops"}')
    assert vs.rows() == []  # int+string conflict, nested object: both dropped


def test_variant_stats_int_float_widens():
    from ducklake_spark.extra_stats import VariantStats

    vs = VariantStats()
    vs.add_json('{"a": 1}')
    vs.add_json('{"a": 2.5}')
    (row,) = vs.rows()
    assert row[1] == "double" and row[4] == "1" and row[5] == "2.5"


def test_variant_partial_merge_accounts_missing_fields():
    from ducklake_spark.extra_stats import VariantStats

    a = VariantStats()
    a.add_json('{"a": 1}')
    b = VariantStats()
    b.add_json('{"b": 2}')
    b.add_json('{"b": 3}')
    a.merge(VariantStats.from_partial_json(b.to_partial_json()))
    rows = {r[0]: r for r in a.rows()}
    # 3 object rows total; "a" appears once -> 2 nulls, "b" twice -> 1 null
    assert rows['"a"'][2:4] == (1, 2)
    assert rows['"b"'][2:4] == (2, 1)


def test_table_level_merge_semantics():
    from ducklake_spark.extra_stats import merge_extra_stats_json

    geo_a = '{"bbox": {"xmin": 0, "xmax": 1, "ymin": 0, "ymax": 1, "zmin": null, "zmax": null, "mmin": null, "mmax": null}, "types": ["point"]}'
    geo_b = '{"bbox": {"xmin": -5, "xmax": 0.5, "ymin": 2, "ymax": 3, "zmin": null, "zmax": null, "mmin": null, "mmax": null}, "types": ["polygon"]}'
    merged = json.loads(merge_extra_stats_json(geo_a, geo_b))
    assert merged["bbox"]["xmin"] == -5 and merged["bbox"]["ymax"] == 3
    assert merged["types"] == ["point", "polygon"]
    # a side with NO stats payload invalidates the global bbox — keeping
    # it would report bounds that exclude the stats-less file's data
    assert merge_extra_stats_json(geo_a, None) is None

    var_a = '[{"field_name": "a", "shredded_type": "int32", "num_values": 2, "null_count": 0, "min": "1", "max": "9"}, {"field_name": "b", "shredded_type": "varchar", "num_values": 1, "null_count": 1, "min": "x", "max": "x"}]'
    var_b = '[{"field_name": "a", "shredded_type": "int32", "num_values": 1, "null_count": 2, "min": "-4", "max": "0"}, {"field_name": "b", "shredded_type": "int32", "num_values": 1, "null_count": 0, "min": "1", "max": "1"}]'
    out = json.loads(merge_extra_stats_json(var_a, var_b))
    # "b" dropped (type mismatch, reference ducklake_variant_stats.cpp:39-43),
    # "a" merged with numeric min/max
    assert [d["field_name"] for d in out] == ["a"]
    assert out[0]["min"] == "-4" and out[0]["max"] == "9"
    assert out[0]["num_values"] == 3 and out[0]["null_count"] == 2
    # variant intersection with a stats-less side is empty
    assert merge_extra_stats_json(var_a, None) is None


# -------------------------------------------------------------- lake end-to-end


def _geo_rows(spark, pts):
    from pyspark.sql import types as T

    return spark.createDataFrame(
        [(i, wkb_point(x, y)) for i, (x, y) in enumerate(pts)],
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("geom", T.BinaryType()),
            ]
        ),
    ).coalesce(1)  # one data file per insert, so file counts are exact


def test_geometry_file_and_table_stats(lake, spark):
    lake.create_table("geo", [("id", "int64"), ("geom", "geometry")])
    lake.insert("geo", _geo_rows(spark, [(0, 0), (10, 20)]))
    lake.insert("geo", _geo_rows(spark, [(-5, 3)]))

    h = lake._handle("geo")
    gid = {c[1]: c[0] for c in h.columns}["geom"]
    extras = [
        json.loads(e)
        for (e,) in lake.meta.query(
            "SELECT extra_stats FROM ducklake_file_column_stats "
            "WHERE table_id=? AND column_id=? AND extra_stats IS NOT NULL "
            "ORDER BY data_file_id",
            (h.table_id, gid),
        )
    ]
    assert len(extras) == 2
    assert extras[0]["bbox"]["xmin"] == 0 and extras[0]["bbox"]["ymax"] == 20
    assert extras[1]["bbox"] == {
        "xmin": -5, "xmax": -5, "ymin": 3, "ymax": 3,
        "zmin": None, "zmax": None, "mmin": None, "mmax": None,
    }
    # table-level widen-only merge
    stats = {r["column_name"]: r for r in lake.column_stats("geo").collect()}
    merged = json.loads(stats["geom"]["extra_stats"])
    assert merged["bbox"]["xmin"] == -5 and merged["bbox"]["xmax"] == 10
    assert merged["types"] == ["point"]


def test_bbox_scan_prunes_files_and_filters_rows(lake, spark):
    lake.create_table("geo2", [("id", "int64"), ("geom", "geometry")])
    lake.insert("geo2", _geo_rows(spark, [(0, 0), (1, 1)]))        # west file
    lake.insert("geo2", _geo_rows(spark, [(100, 100), (101, 99)]))  # east file

    h = lake._handle("geo2")
    snap = lake._resolve_snapshot(None, None)
    all_files = lake._visible_files(h, snap, None)
    colmap = {c[1]: c[0] for c in h.columns}
    window = {"geom": (-10.0, -10.0, 50.0, 50.0)}
    kept = lake._bbox_prune(h, all_files, window, colmap)
    assert len(all_files) == 2 and len(kept) == 1  # east file pruned

    out = lake.table("geo2", bbox=window).select("id").collect()
    assert sorted(r.id for r in out) == [0, 1]
    # a window straddling both files keeps everything
    assert lake.table("geo2", bbox={"geom": (0.0, 0.0, 200.0, 200.0)}).count() == 4


def test_variant_lake_stats_and_pruning(lake, spark):
    lake.create_table("vt", [("id", "int64"), ("props", "variant")])
    df1 = spark.createDataFrame(
        [(0, '{"width": 10, "tag": "a"}'), (1, '{"width": 20}')],
        "id long, props string",
    ).coalesce(1)
    df2 = spark.createDataFrame(
        [(2, '{"width": 500, "tag": "z"}'), (3, '{"width": 900, "extra": 1}')],
        "id long, props string",
    ).coalesce(1)
    lake.insert("vt", df1)
    lake.insert("vt", df2)

    vs = lake.variant_stats("vt").collect()
    widths = [r for r in vs if r.variant_path == '"width"']
    assert len(widths) == 2
    assert {(r.shredded_type, r.min_value, r.max_value) for r in widths} == {
        ("int32", "10", "20"),
        ("int32", "500", "900"),
    }
    tags = [r for r in vs if r.variant_path == '"tag"']
    assert {(r.value_count, r.null_count) for r in tags} == {(1, 1)}

    # file pruning via shredded stats
    h = lake._handle("vt")
    snap = lake._resolve_snapshot(None, None)
    all_files = lake._visible_files(h, snap, None)
    colmap = {c[1]: c[0] for c in h.columns}
    kept = lake._variant_prune(
        h, all_files, [("props", "width", ">=", 400)], colmap
    )
    assert len(all_files) == 2 and len(kept) == 1

    out = lake.table("vt", variant_where=[("props", "width", ">=", 400)])
    assert sorted(r.id for r in out.collect()) == [2, 3]
    out2 = lake.table("vt", variant_where=[("props", "tag", "=", "a")])
    assert [r.id for r in out2.collect()] == [0]


def test_variant_native_roundtrip(lake, spark):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    lake.create_table("vn", [("id", "int64"), ("props", "variant")])
    native = spark.createDataFrame(
        [(1, '{"a": 1, "b": {"c": "deep"}}')], "id long, props string"
    ).withColumn("props", F.parse_json(F.col("props")))
    assert isinstance(native.schema["props"].dataType, T.VariantType)
    lake.insert("vn", native)  # VariantType -> stored JSON text

    df = lake.table("vn", variant_as_native=True)
    assert isinstance(df.schema["props"].dataType, T.VariantType)
    got = df.select(
        F.variant_get(F.col("props"), "$.b.c", "string").alias("c")
    ).collect()
    assert got[0]["c"] == "deep"


def test_add_data_files_harvests_extra_stats(lake, spark, tmp_path):
    ext = tmp_path / "external"
    spark.createDataFrame(
        [(1, '{"n": 5}'), (2, '{"n": 50}')], "id long, props string"
    ).coalesce(1).write.parquet(str(ext))
    lake.create_table("adopted_v", [("id", "int64"), ("props", "variant")])
    assert lake.add_data_files("adopted_v", str(ext / "*.parquet")) == 1
    vs = lake.variant_stats("adopted_v").collect()
    assert [(r.variant_path, r.shredded_type, r.min_value, r.max_value) for r in vs] == [
        ('"n"', "int32", "5", "50")
    ]


def test_compaction_preserves_extra_stats(lake, spark):
    from ducklake_spark import maintenance

    lake.create_table("geoc", [("id", "int64"), ("geom", "geometry")])
    lake.insert("geoc", _geo_rows(spark, [(0, 0)]))
    lake.insert("geoc", _geo_rows(spark, [(7, -2)]))
    maintenance.merge_adjacent_files(lake, table="geoc")

    h = lake._handle("geoc")
    snap = lake._resolve_snapshot(None, None)
    files = lake._visible_files(h, snap, None)
    assert len(files) == 1  # compacted
    gid = {c[1]: c[0] for c in h.columns}["geom"]
    (extra,) = lake.meta.query(
        "SELECT extra_stats FROM ducklake_file_column_stats "
        "WHERE data_file_id=? AND column_id=?",
        (files[0]["data_file_id"], gid),
    )[0]
    bbox = json.loads(extra)["bbox"]
    assert bbox["xmin"] == 0 and bbox["xmax"] == 7
    assert bbox["ymin"] == -2 and bbox["ymax"] == 0


def test_variant_boolean_and_type_mismatch_pruning(lake, spark):
    """Boolean literals prune via their own type class; a numeric
    literal never prunes through varchar-shredded stats (string order
    '10' < '9' would misprune)."""
    lake.create_table("vb", [("id", "int64"), ("props", "variant")])
    lake.insert(
        "vb",
        spark.createDataFrame(
            [(0, '{"flag": true, "n": "10"}'), (1, '{"flag": true, "n": "9"}')],
            "id long, props string",
        ).coalesce(1),
    )
    lake.insert(
        "vb",
        spark.createDataFrame(
            [(2, '{"flag": false, "n": "300"}')], "id long, props string"
        ).coalesce(1),
    )
    out = lake.table("vb", variant_where=[("props", "flag", "=", True)])
    assert sorted(r.id for r in out.collect()) == [0, 1]
    out2 = lake.table("vb", variant_where=[("props", "flag", "=", False)])
    assert [r.id for r in out2.collect()] == [2]
    # numeric literal vs varchar-shredded field: no pruning, row filter
    # (double cast) decides
    out3 = lake.table("vb", variant_where=[("props", "n", ">=", 100)])
    assert [r.id for r in out3.collect()] == [2]
    # unsupported operator is an explicit error
    import pytest as _pytest

    from ducklake_spark.lake import DuckLakeError

    with _pytest.raises(DuckLakeError, match="operator"):
        lake.table("vb", variant_where=[("props", "n", "!=", 5)]).count()


def test_malformed_wkb_does_not_fail_write(lake, spark):
    from pyspark.sql import types as T

    lake.create_table("gbad", [("id", "int64"), ("geom", "geometry")])
    rows = [(0, wkb_point(1, 2)), (1, b""), (2, b"\x01\xff"), (3, None)]
    lake.insert(
        "gbad",
        spark.createDataFrame(
            rows,
            T.StructType(
                [
                    T.StructField("id", T.LongType()),
                    T.StructField("geom", T.BinaryType()),
                ]
            ),
        ).coalesce(1),
    )
    assert lake.table("gbad").count() == 4
    stats = {r["column_name"]: r for r in lake.column_stats("gbad").collect()}
    bbox = json.loads(stats["geom"]["extra_stats"])["bbox"]
    assert bbox["xmin"] == 1 and bbox["ymax"] == 2  # good row still counted


def test_adopted_files_fill_added_default(lake, spark, tmp_path):
    """Foreign (adopted) files written before ADD COLUMN ... DEFAULT
    surface the default like native files do."""
    ext = tmp_path / "ext_default"
    spark.createDataFrame([(1,), (2,)], "i long").coalesce(1).write.parquet(
        str(ext)
    )
    lake.create_table("adf", [("i", "int64")])
    lake.add_data_files("adf", str(ext / "*.parquet"))
    lake.add_column("adf", "d", "int64", default="5")
    got = lake.table("adf").orderBy("i").collect()
    assert [(r.i, r.d) for r in got] == [(1, 5), (2, 5)]
    assert lake.table("adf", where="d = 5").count() == 2
