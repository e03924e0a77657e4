"""r5 packed flat transport (VERDICT r4 #3 "next bite of the bandwidth
wall"): geom carries one (qx<<16|qy) int per VERTEX (half the array
elements) and off is NULL for single-piece rows. These tests pin the
relational decode and producer/consumer consistency; the end-to-end
equality of all three props_modes packed-vs-unpacked is exercised through
build_tile_features here, and the nested-reference parity pytest runs with
the packed default."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tile_gen_spark.operators import tiles as T


def test_packed_nest_expr_decodes(spark):
    """PACKED_NEST_GEOM_EXPR: null off → single ring; explicit off → ring
    split at vertex offsets; values unpack via shift/mask."""
    pk = lambda x, y: (x << 16) | y
    df = spark.createDataFrame(
        [(1, [pk(3, 4), pk(5, 6)], None),
         (2, [pk(1, 2), pk(3, 4), pk(5, 6)], [0, 2, 3])],
        "feature_id bigint, geom array<int>, off array<int>")
    out = {r["feature_id"]: r["geom"]
           for r in T.nest_geom(df, packed=True).collect()}
    assert out[1] == [[3, 4, 5, 6]]
    assert out[2] == [[1, 2, 3, 4], [5, 6]]


def test_packed_points_flat_matches_unpacked(spark):
    pts = spark.createDataFrame(
        [(i, "point", [[float(i) / 7.0 - 10.0, float(i) / 11.0 + 5.0]], None)
         for i in range(50)],
        "feature_id bigint, kind string, coords array<array<double>>, "
        "props map<string,string>")
    a = T.nest_geom(T.clip_points_flat(pts, [4, 8], pack=False), packed=False)
    b = T.nest_geom(T.clip_points_flat(pts, [4, 8], pack=True), packed=True)
    ka = sorted((r["feature_id"], r["z"], r["x"], r["y"], tuple(map(tuple, r["geom"])))
                for r in a.collect())
    kb = sorted((r["feature_id"], r["z"], r["x"], r["y"], tuple(map(tuple, r["geom"])))
                for r in b.collect())
    assert ka == kb and len(ka) == 100


def test_packed_build_equals_unpacked_all_modes(spark, features, monkeypatch):
    """build_tile_features output must be identical packed vs unpacked in
    every props_mode (the transport is an encoding, not a semantic)."""

    def canon(df):
        out = {}
        for r in df.collect():
            out[(r["z"], r["x"], r["y"])] = tuple(
                (f["feature_id"], f["kind"],
                 tuple(tuple(p) for p in f["geom"]),
                 tuple(sorted((f["props"] or {}).items())))
                for f in r["features"])
        return out

    for mode in ("dim", "inline", "dim2"):
        monkeypatch.setenv("TILEGEN_PROPS_MODE", mode)
        monkeypatch.setenv("TILEGEN_GEOM_PACK", "0")
        a = canon(T.build_tile_features(features, [3], salt=2))
        monkeypatch.setenv("TILEGEN_GEOM_PACK", "1")
        b = canon(T.build_tile_features(features, [3], salt=2))
        assert len(a) > 20
        assert a == b, f"packed transport diverged in props_mode={mode}"


def test_pack_disabled_for_oversized_extent(monkeypatch):
    monkeypatch.setenv("TILEGEN_GEOM_PACK", "1")
    assert T._pack_for(4096) is True
    assert T._pack_for(32767) is True
    assert T._pack_for(65536) is False
    monkeypatch.setenv("TILEGEN_GEOM_PACK", "0")
    assert T._pack_for(4096) is False


def test_packed_tile_key_equals_unpacked(spark, features, monkeypatch):
    """r6 packed tile key (TILEGEN_KEY_PACK): (z,x,y) ride the two agg
    exchanges as ONE bigint. Pure transport — output must be bit-identical
    to the unpacked key path, salted and unsalted."""

    def canon(df):
        out = {}
        for r in df.collect():
            out[(r["z"], r["x"], r["y"])] = tuple(
                (f["feature_id"], f["kind"],
                 tuple(tuple(p) for p in f["geom"]),
                 tuple(sorted((f["props"] or {}).items())))
                for f in r["features"])
        return out

    for salt in (0, 2):
        monkeypatch.setenv("TILEGEN_KEY_PACK", "0")
        a = canon(T.build_tile_features(features, [3, 6], salt=salt))
        monkeypatch.setenv("TILEGEN_KEY_PACK", "1")
        b = canon(T.build_tile_features(features, [3, 6], salt=salt))
        assert len(a) > 20
        assert a == b, f"packed tile key diverged at salt={salt}"
    # z > 29 must refuse the packed key (guard in build_tile_features)
    assert T.key_pack() is True
    assert (T.key_pack() and max([3, 30]) <= 29) is False


def test_packed_tile_key_pack_roundtrip(spark):
    """The pack/unpack SQL pair is exact across the full domain corners."""
    rows = [(0, 0, 0), (12, 4095, 4095), (29, (1 << 29) - 1, (1 << 29) - 1),
            (7, 1, 127)]
    df = spark.createDataFrame(rows, "z int, x bigint, y bigint")
    out = (df.select(F.expr(T._TXY_PACK).alias("_txy"))
           .select(F.expr("CAST(shiftright(_txy, 58) AS INT)").alias("z"),
                   F.expr(f"shiftright(_txy, 29) & {T._TXY_MASK}").alias("x"),
                   F.expr(f"_txy & {T._TXY_MASK}").alias("y")))
    assert sorted(map(tuple, out.collect())) == sorted(rows)


def test_arrow_agg_tail_equals_jvm(spark, features, monkeypatch):
    """r7 Arrow aggregation tail (TILEGEN_AGG_ARROW, default off — measured
    slower fused, kept as a profiling/reference variant): unpack + nest +
    per-tile collect + feature_id sort in one vectorized Arrow pass must be
    bit-identical to the JVM finish() path."""

    def canon(df):
        out = {}
        for r in df.collect():
            out[(r["z"], r["x"], r["y"])] = tuple(
                (f["feature_id"], f["kind"],
                 tuple(tuple(p) for p in f["geom"]),
                 tuple(sorted((f["props"] or {}).items())))
                for f in r["features"])
        return out

    monkeypatch.setenv("TILEGEN_GEOM_PACK", "1")   # the tail reads packed
    monkeypatch.setenv("TILEGEN_AGG_ARROW", "0")
    a = canon(T.build_tile_features(features, [3, 6], salt=2))
    monkeypatch.setenv("TILEGEN_AGG_ARROW", "1")
    b = canon(T.build_tile_features(features, [3, 6], salt=2))
    assert len(a) > 20
    assert a == b, "arrow agg tail diverged from the JVM tail"
