"""S2 (SURVEY.md §2.1): deterministic synthetic Common-Crawl-style corpus.

Generates the authoritative input table ``pages(url, warc_ts, html, text,
lang)`` (``BASELINE.json:15``) plus the ``zones`` polygon table (FIXTURES.md
§2) entirely from counter-based splitmix64 hashing: every value is a pure
function of (seed, row index), so the tables are byte-identical regardless of
partition count or cluster size — required for the exact-match contracts
(``BASELINE.json:2,6,15``).

Distribution design (FIXTURES.md §1):
 - ~5% duplicate urls re-emitted at a later warc_ts (exercises J5 dedup)
 - ~60% of pages carry 1–3 inline geo spans
 - 70% of geo coordinates cluster around 40 hot "city" centers (dense-tile
   skew, ``BASELINE.json:6``), 30% uniform world-wide
 - text is generated FIRST, html wraps it; the P5 extractor must recover text
   byte-for-byte (``BASELINE.json:15``)

Implemented as ``mapInPandas`` over ``spark.range(n)`` — Arrow-batched, no
per-row Python UDF calls (``BASELINE.json:15``).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..functions.kernels import MAX_LAT, h64, hu

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"
ZONES_SCHEMA = "zone_id bigint, name string, ring array<double>"

_WORDS = np.array(
    "the quick brown fox jumps over lazy dog data tile map spark query shuffle "
    "join index cluster page crawl web text vector raster zoom level city river "
    "road park lake north south east west alpha beta gamma delta".split()
)
_LANGS = np.array(["en", "en", "en", "en", "de", "fr", "es", "zh", "pt", "ru"])

N_CITIES = 40


def _city_centers(seed: int) -> tuple[np.ndarray, np.ndarray]:
    idx = np.arange(N_CITIES, dtype=np.uint64)
    lon = hu(idx, seed, 101) * 360.0 - 180.0
    lat = hu(idx, seed, 102) * 150.0 - 75.0
    return lon, lat


def _coord_pair(i: np.ndarray, seed: int, stream: int) -> tuple[np.ndarray, np.ndarray]:
    """Skewed lon/lat per FIXTURES.md: 70% near hot cities, 30% uniform."""
    clon, clat = _city_centers(seed)
    hot = hu(i, seed, stream) < 0.7
    city = (h64(i, seed, stream + 1) % np.uint64(N_CITIES)).astype(np.int64)
    jit_lon = (hu(i, seed, stream + 2) - 0.5) * 0.8
    jit_lat = (hu(i, seed, stream + 3) - 0.5) * 0.8
    ulon = hu(i, seed, stream + 4) * 360.0 - 180.0
    ulat = hu(i, seed, stream + 5) * 2 * MAX_LAT - MAX_LAT
    lon = np.where(hot, clon[city] + jit_lon, ulon)
    lat = np.where(hot, np.clip(clat[city] + jit_lat, -MAX_LAT, MAX_LAT), ulat)
    return np.round(lon, 6), np.round(lat, 6)


def _page_batch(ids: np.ndarray, seed: int) -> pd.DataFrame:
    i = ids.astype(np.uint64)
    n = i.size
    # ~5% recrawls: re-emit the url of (i - 1000) at a later timestamp
    is_dup = (hu(i, seed, 1) < 0.05) & (ids >= 1000)
    url_key = np.where(is_dup, ids - 1000, ids)
    host = (h64(url_key.astype(np.uint64), seed, 2) % np.uint64(1000)).astype(np.int64)
    urls = pd.Series(
        ["https://host%d.example/p%d" % (h, k) for h, k in zip(host, url_key)], dtype="string"
    )
    base = np.datetime64("2026-01-01T00:00:00")
    day = (h64(i, seed, 3) % np.uint64(180)).astype("timedelta64[D]")
    sec = (h64(i, seed, 4) % np.uint64(86400)).astype("timedelta64[s]")
    dup_bump = np.where(is_dup, np.timedelta64(200, "D"), np.timedelta64(0, "D"))
    ts = base + day + sec + dup_bump

    lang = _LANGS[(h64(i, seed, 5) % np.uint64(len(_LANGS))).astype(np.int64)]

    # paragraphs: 2-5 per page, 6-14 words each, all hash-driven
    n_para = 2 + (h64(i, seed, 6) % np.uint64(4)).astype(np.int64)
    has_geo = hu(i, seed, 7) < 0.6
    n_geo = np.where(has_geo, 1 + (h64(i, seed, 8) % np.uint64(3)).astype(np.int64), 0)

    texts = []
    for j in range(n):
        rid = int(ids[j])
        title_w = _WORDS[h64(np.arange(3, dtype=np.uint64) + np.uint64(rid * 31), seed, 9) % np.uint64(len(_WORDS))]
        lines = [" ".join(title_w) + " #%d" % rid]
        for p in range(int(n_para[j])):
            wi = h64(np.arange(6 + int(h64(np.array([rid * 7 + p], dtype=np.uint64), seed, 10)[0] % np.uint64(9)),
                               dtype=np.uint64) + np.uint64(rid * 131 + p * 17), seed, 11)
            lines.append(" ".join(_WORDS[wi % np.uint64(len(_WORDS))]))
        for g in range(int(n_geo[j])):
            gi = np.array([rid * 13 + g * 5], dtype=np.uint64)
            kind = int(h64(gi, seed, 12)[0] % np.uint64(3))
            if kind == 0:
                lon, lat = _coord_pair(gi, seed, 20)
                span = "@@geo point %.6f %.6f@@" % (lon[0], lat[0])
            elif kind == 2 and int(h64(gi, seed, 60)[0] % np.uint64(4)) == 0:
                # donut polygon (~25% of polys): regular octagon exterior +
                # concentric 0.35× hole — exercises the multi-ring/hole path
                # end-to-end (FIXTURES.md §1: '|' separates rings, ring 0
                # exterior, rings 1+ holes)
                clon, clat = _coord_pair(gi, seed, 30)
                r0 = 0.002 + float(hu(gi, seed, 61)[0]) * 0.01
                # keep the whole donut off the mercator lat clamp so the hole
                # stays strictly inside the exterior
                clat0 = float(np.clip(clat[0], -MAX_LAT + 0.013, MAX_LAT - 0.013))
                ang = 2 * np.pi * np.arange(8) / 8.0 + float(hu(gi, seed, 62)[0]) * np.pi
                ex_lon = np.round(clon[0] + r0 * np.cos(ang), 6)
                ex_lat = np.round(clat0 + r0 * np.sin(ang), 6)
                h_lon = np.round(clon[0] + 0.35 * r0 * np.cos(ang), 6)
                h_lat = np.round(clat0 + 0.35 * r0 * np.sin(ang), 6)
                ext = "; ".join("%.6f %.6f" % (lo, la) for lo, la in zip(ex_lon, ex_lat))
                hole = "; ".join("%.6f %.6f" % (lo, la) for lo, la in zip(h_lon, h_lat))
                span = "@@geo poly %s | %s@@" % (ext, hole)
            else:
                nv = 3 + int(h64(gi, seed, 13)[0] % np.uint64(4))
                vi = np.arange(nv, dtype=np.uint64) + gi[0] * np.uint64(977)
                lons, lats = _coord_pair(vi, seed, 30)
                # keep multi-vertex shapes city-scale: anchor to first vertex
                # (≤ ~0.36° spread → a few covering tiles at z12, hundreds for
                # the largest — realistic MVT feature sizes)
                lons = np.round(lons[0] + (lons - lons[0]) * 0.002, 6)
                lats = np.round(np.clip(lats[0] + (lats - lats[0]) * 0.002, -MAX_LAT, MAX_LAT), 6)
                coords = "; ".join("%.6f %.6f" % (lo, la) for lo, la in zip(lons, lats))
                span = "@@geo %s %s@@" % ("line" if kind == 1 else "poly", coords)
            lines.append(span)
        texts.append("\n".join(lines))

    text = pd.Series(texts, dtype="string")
    html = ("<html><head><title>" + text.str.split("\n").str[0]
            + "</title></head><body>"
            + text.str.split("\n").str[1:].map(lambda ls: "".join("<p>%s</p>" % l for l in ls))
            + "</body></html>")
    return pd.DataFrame({
        "url": urls,
        "warc_ts": pd.Series(ts),
        "html": html.str.encode("utf-8"),
        "text": text,
        "lang": pd.Series(lang, dtype="string"),
    })


def gen_pages(spark: SparkSession, n: int, seed: int = 42, parallelism: int | None = None) -> DataFrame:
    """Deterministic pages corpus: identical content at any partition count."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield _page_batch(b["id"].to_numpy(), seed)

    rng = spark.range(n, numPartitions=parallelism)
    return rng.mapInPandas(fn, PAGES_SCHEMA)


def _zone_batch(ids: np.ndarray, seed: int, radius_scale: float = 1.0,
                nv_extra: int = 0) -> pd.DataFrame:
    i = ids.astype(np.uint64)
    clon, clat = _city_centers(seed)
    hot = hu(i, seed, 40) < 0.2
    city = (h64(i, seed, 41) % np.uint64(N_CITIES)).astype(np.int64)
    lon0 = np.where(hot, clon[city], hu(i, seed, 42) * 340.0 - 170.0)
    lat0 = np.where(hot, clat[city], hu(i, seed, 43) * 140.0 - 70.0)
    radius = (0.05 + hu(i, seed, 44) * 2.95) * radius_scale
    nv = 5 + nv_extra + (h64(i, seed, 45) % np.uint64(8)).astype(np.int64)
    rings = []
    for j in range(i.size):
        k = int(nv[j])
        ang = 2 * np.pi * np.arange(k) / k + float(hu(i[j:j + 1], seed, 46)[0]) * np.pi
        r = radius[j] * (0.6 + 0.4 * hu(np.arange(k, dtype=np.uint64) + i[j] * np.uint64(53), seed, 47))
        xs = np.round(lon0[j] + r * np.cos(ang), 6)
        ys = np.round(np.clip(lat0[j] + r * np.sin(ang), -MAX_LAT, MAX_LAT), 6)
        rings.append(np.column_stack([xs, ys]).ravel().tolist())
    return pd.DataFrame({
        "zone_id": ids.astype(np.int64),
        "name": ["zone-%d" % z for z in ids],
        "ring": rings,
    })


def gen_zones(spark: SparkSession, m: int, seed: int = 42,
              radius_scale: float = 1.0, nv_extra: int = 0) -> DataFrame:
    """radius_scale shrinks zones uniformly; nv_extra adds vertices per zone
    (bench uses many small high-vertex zones so candidate volume stays
    constant while per-candidate refine work is real)."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield _zone_batch(b["id"].to_numpy(), seed, radius_scale, nv_extra)

    # small dim table: few fat partitions beat 64 tiny python batches
    return spark.range(m, numPartitions=max(2, m // 500)).mapInPandas(fn, ZONES_SCHEMA)
