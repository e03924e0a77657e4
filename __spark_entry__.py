"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship tile pipeline on sf0.001.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2; the driver runs the Spark query and the DuckDB oracle on the
same parquet and compares row count + schema + order-insensitive value hash.

Correctness-by-construction strategy: the geo math (synthetic lon/lat from
lineitem keys, G2 tile formulas, G4 quadkeys, G10 haversine, zone polygon
synthesis) is emitted from ONE fragment builder (tile_gen_spark/plans/
sqlgen.py) in both dialects, so both engines evaluate the same expression
tree. Non-SQL-expressible kernels (Sutherland–Hodgman clip, raster↔vector)
are exposed as rows-only queries (no oracle entry) per the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tile_gen_spark.plans import sqlgen as S
from tile_gen_spark.sources.testdata import register_views

SEED = 42
N_ZONES = 150
PIP_POINT_FILTER = "l_orderkey % 5 = 0"  # subset keeps the O(N·M) oracle fast


# ---------------------------------------------------------------------------
# shared dialect-parametrized SQL text
# ---------------------------------------------------------------------------

def _points_cte(d: str, where: str = "") -> str:
    # DISTINCT: the driver's lineitem has duplicate (orderkey, linenumber)
    # pairs, and point_id must be a key for exact join-row matching
    return (f"SELECT DISTINCT {S.pt_key()} AS point_id, {S.pt_lon()} AS lon, "
            f"{S.pt_lat()} AS lat FROM lineitem {where}")


def _zones_range(d: str, n: int) -> str:
    idc = "id" if d == S.SPARK else "range"
    return f"SELECT {idc} AS zone_id FROM range({n})"


def _zone_vertices(d: str, n: int, nv: int = 6) -> str:
    """Per-vertex zone rows: regular nv-gon, hash-seeded center/radius/phase."""
    zk = "(zone_id * 131 + 7)"
    vidc = "id" if d == S.SPARK else "range"
    theta = f"(2.0 * pi() * v / {nv}.0 + {S.lcg(zk, 214013, 2531011, 6283185)} / 1000000.0)"
    return (
        f"SELECT zone_id, v, "
        f"round({S.zone_center_lon(zk)} + {S.zone_radius(zk)} * cos({theta}), 6) AS vx, "
        f"round({S.zone_center_lat(zk)} + {S.zone_radius(zk)} * sin({theta}), 6) AS vy "
        f"FROM ({_zones_range(d, n)}) z CROSS JOIN (SELECT {vidc} AS v FROM range({nv})) vs"
    )


def q_tile_assign_z8(d: str) -> str:
    x, y = S.tile_x(S.pt_lon(), 8), S.tile_y(S.pt_lat(), 8)
    return (f"SELECT {x} AS tx, {y} AS ty, CAST(count(*) AS BIGINT) AS n_points "
            f"FROM lineitem GROUP BY 1, 2")


def q_tile_assign_multizoom(d: str) -> str:
    parts = []
    for z in range(0, 13):
        x, y = S.tile_x(S.pt_lon(), z), S.tile_y(S.pt_lat(), z)
        parts.append(f"SELECT {z} AS z, {x} AS tx, {y} AS ty FROM lineitem")
    un = " UNION ALL ".join(parts)
    return (f"SELECT z, CAST(count(*) AS BIGINT) AS n_assignments, "
            f"CAST(count(DISTINCT (tx * 8192 + ty)) AS BIGINT) AS n_tiles "
            f"FROM ({un}) a GROUP BY z")


def q_quadkey_buckets(d: str) -> str:
    x, y = S.tile_x(S.pt_lon(), 6), S.tile_y(S.pt_lat(), 6)
    qk = S.quadkey(x, y, 6, d)
    return (f"SELECT {qk} AS qk, CAST(count(*) AS BIGINT) AS n_points "
            f"FROM lineitem GROUP BY 1 HAVING count(*) >= 3")


def q_tile_bounds(d: str) -> str:
    x, y = S.tile_x(S.pt_lon(), 5), S.tile_y(S.pt_lat(), 5)
    b = S.tile_bounds_cols(5, "tx", "ty")
    return (f"SELECT tx, ty, round({b['west']}, 6) AS west, round({b['east']}, 6) AS east, "
            f"round({b['north']}, 6) AS north, round({b['south']}, 6) AS south "
            f"FROM (SELECT DISTINCT {x} AS tx, {y} AS ty FROM lineitem) t")


def q_latest_order_per_customer(d: str) -> str:
    return (
        "SELECT o_custkey, o_orderkey AS latest_orderkey, "
        "CAST(o_totalprice AS DOUBLE) AS latest_totalprice FROM ("
        "SELECT o_custkey, o_orderkey, o_totalprice, "
        "row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn "
        "FROM orders) t WHERE rn = 1")


def q_pip_join(d: str) -> str:
    """Even-odd ray-cast PIP in pure SQL (both dialects) — the oracle twin of
    the quadkey-bucketed pip_join operator."""
    pts = _points_cte(d, f"WHERE {PIP_POINT_FILTER}")
    verts = _zone_vertices(d, N_ZONES)
    return f"""
WITH pts AS ({pts}),
verts AS ({verts}),
edges AS (
  SELECT a.zone_id, a.vx AS x1, a.vy AS y1, b.vx AS x2, b.vy AS y2
  FROM verts a JOIN verts b
    ON a.zone_id = b.zone_id AND b.v = (a.v + 1) % 6
)
SELECT p.point_id, e.zone_id
FROM pts p JOIN edges e
  ON ((e.y1 > p.lat) <> (e.y2 > p.lat))
 AND p.lon < (e.x2 - e.x1) * (p.lat - e.y1) / (e.y2 - e.y1) + e.x1
GROUP BY p.point_id, e.zone_id
HAVING count(*) % 2 = 1
"""


def q_knn_geo(d: str) -> str:
    """Brute-force oracle for the hex-cell-indexed kNN operator."""
    q = (f"SELECT (c_custkey * 17 + 3) AS query_id, "
         f"{S.pt_lon('(c_custkey * 17 + 3)')} AS lon, "
         f"{S.pt_lat('(c_custkey * 17 + 3)')} AS lat "
         f"FROM customer WHERE c_custkey % 20 = 0")
    c = (f"SELECT (s_suppkey * 29 + 11) AS cand_id, "
         f"{S.pt_lon('(s_suppkey * 29 + 11)')} AS clon, "
         f"{S.pt_lat('(s_suppkey * 29 + 11)')} AS clat FROM supplier")
    dist = S.haversine("q.lon", "q.lat", "c.clon", "c.clat")
    return f"""
WITH q AS ({q}), c AS ({c}), ranked AS (
  SELECT q.query_id, c.cand_id AS neighbor_id,
         row_number() OVER (PARTITION BY q.query_id ORDER BY {dist}, c.cand_id) AS rank
  FROM q CROSS JOIN c
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 5
"""


def q_knn_embeddings(d: str) -> str:
    if d == S.DUCK:
        return """
WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS e FROM embeddings WHERE vec_id % 50 = 0),
c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS e FROM embeddings),
scored AS (
  SELECT q.qid, c.cid,
         list_dot_product(q.e, c.e) / (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))) AS cos_sim
  FROM q CROSS JOIN c WHERE q.qid <> c.cid)
SELECT qid AS query_id, cid AS neighbor_id, CAST(rank AS INT) AS rank FROM (
  SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid) AS rank FROM scored) t
WHERE rank <= 5
"""
    return """
WITH q AS (SELECT vec_id AS qid, CAST(embedding AS array<double>) AS e FROM embeddings WHERE vec_id % 50 = 0),
c AS (SELECT vec_id AS cid, CAST(embedding AS array<double>) AS e FROM embeddings),
scored AS (
  SELECT q.qid, c.cid,
         aggregate(zip_with(q.e, c.e, (a, b) -> a * b), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)
         / (sqrt(aggregate(zip_with(q.e, q.e, (a, b) -> a * b), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))
            * sqrt(aggregate(zip_with(c.e, c.e, (a, b) -> a * b), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))) AS cos_sim
  FROM q CROSS JOIN c WHERE q.qid <> c.cid)
SELECT qid AS query_id, cid AS neighbor_id, CAST(rank AS INT) AS rank FROM (
  SELECT qid, cid, row_number() OVER (PARTITION BY qid ORDER BY cos_sim DESC, cid) AS rank FROM scored) t
WHERE rank <= 5
"""


def q_pricing_summary(d: str) -> str:
    return (
        "SELECT l_returnflag, l_linestatus, "
        "CAST(sum(l_quantity) AS DOUBLE) AS sum_qty, "
        "round(sum(l_extendedprice), 2) AS sum_base_price, "
        "round(avg(l_discount), 6) AS avg_disc, "
        "CAST(count(*) AS BIGINT) AS count_order "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus")


def q_anti_join(d: str) -> str:
    return ("SELECT c_custkey, c_name FROM customer c "
            "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)")


def q_semi_join(d: str) -> str:
    return ("SELECT s_suppkey, s_name FROM supplier s "
            "WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey "
            "AND l.l_quantity > 45)")


def q_dedup_exact(d: str) -> str:
    return (
        "SELECT md5(text) AS text_hash, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(min(doc_id) AS BIGINT) AS keeper_doc_id "
        "FROM documents GROUP BY md5(text)")


def q_token_stats(d: str) -> str:
    tok = ("size(split(trim(text), '\\\\s+'))" if d == S.SPARK
           else "len(regexp_split_to_array(trim(text), '\\s+'))")
    return (
        f"SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
        f"CAST(sum({tok}) AS BIGINT) AS total_tokens, "
        f"CAST(max({tok}) AS BIGINT) AS max_tokens "
        f"FROM documents WHERE n_chars > 0 GROUP BY lang")


def q_events_tumbling(d: str) -> str:
    win = ("CAST(floor(unix_timestamp(ts) / 600) AS BIGINT)" if d == S.SPARK
           else "CAST(floor(epoch(ts) / 600) AS BIGINT)")
    return (
        f"SELECT {win} AS window_id, event_type, "
        f"CAST(count(*) AS BIGINT) AS n_events, "
        f"round(sum(value), 4) AS sum_value "
        f"FROM events GROUP BY 1, 2")


def q_tile_rollup(d: str) -> str:
    x, y = S.tile_x(S.pt_lon(), 4), S.tile_y(S.pt_lat(), 4)
    gs = "GROUPING SETS ((tx, ty), (tx), ())"
    return (
        f"SELECT tx, ty, CAST(count(*) AS BIGINT) AS n_points "
        f"FROM (SELECT {x} AS tx, {y} AS ty FROM lineitem) t "
        f"GROUP BY {gs}")


# ---------------------------------------------------------------------------
# Spark-side runners
# ---------------------------------------------------------------------------

def _sql_runner(text_fn: Callable[[str], str]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(text_fn(S.SPARK))
    return run


def _run_pip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quadkey-bucketed PIP join operator (J1) — oracle is the even-odd SQL."""
    from pyspark.sql import functions as F
    from tile_gen_spark.operators.spatial_join import pip_join

    register_views(spark, sf_dir)
    pts = spark.sql(_points_cte(S.SPARK, f"WHERE {PIP_POINT_FILTER}"))
    verts = spark.sql(_zone_vertices(S.SPARK, N_ZONES))
    zones = (verts.orderBy("zone_id", "v")
             .groupBy("zone_id")
             .agg(F.flatten(F.array_sort(F.collect_list(
                 F.struct(F.col("v"), F.array("vx", "vy").alias("p")))).getField("p"))
                 .alias("ring")))
    return (pip_join(pts, zones, res=4)
            .select("point_id", "zone_id"))


def _run_knn_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    from tile_gen_spark.operators.knn import knn_geo

    register_views(spark, sf_dir)
    q = spark.sql(
        f"SELECT (c_custkey * 17 + 3) AS query_id, "
        f"{S.pt_lon('(c_custkey * 17 + 3)')} AS lon, "
        f"{S.pt_lat('(c_custkey * 17 + 3)')} AS lat FROM customer WHERE c_custkey % 20 = 0")
    c = spark.sql(
        f"SELECT (s_suppkey * 29 + 11) AS cand_id, "
        f"{S.pt_lon('(s_suppkey * 29 + 11)')} AS lon, "
        f"{S.pt_lat('(s_suppkey * 29 + 11)')} AS lat FROM supplier")
    return (knn_geo(q, c, k=5, res=1, kring=1)
            .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank")))


def _run_knn_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    from tile_gen_spark.operators.knn import knn_embeddings

    register_views(spark, sf_dir)
    emb = spark.table("embeddings")
    q = emb.filter(F.col("vec_id") % 50 == 0)
    return (knn_embeddings(q, emb, k=5)
            .select("query_id", "neighbor_id", F.col("rank").cast("int").alias("rank")))


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthetic points from sf0.001 lineitem → zoom-0..12 tile
    assignment (pure relational G2) → per-tile counts."""
    sf_dir = "/root/testdata/sf0.001"
    register_views(spark, sf_dir)
    return spark.sql(q_tile_assign_multizoom(S.SPARK))


from tile_gen_spark.operators import textops as T

_SQL_QUERIES: dict[str, Callable[[str], str]] = {
    "minhash_pairs": T.q_minhash_pairs,
    "simhash": T.q_simhash,
    "simhash_near_dups": T.q_simhash_near_dups,
    "lang_id": T.q_lang_id,
    "quality_score": T.q_quality_score,
    "fingerprint": T.q_fingerprint,
    "dedup_groups": T.q_dedup_groups,
    "tile_assign_z8": q_tile_assign_z8,
    "tile_assign_multizoom": q_tile_assign_multizoom,
    "quadkey_buckets": q_quadkey_buckets,
    "tile_bounds": q_tile_bounds,
    "latest_order_per_customer": q_latest_order_per_customer,
    "pricing_summary": q_pricing_summary,
    "anti_join": q_anti_join,
    "semi_join": q_semi_join,
    "dedup_exact": q_dedup_exact,
    "token_stats": q_token_stats,
    "events_tumbling": q_events_tumbling,
    "tile_rollup": q_tile_rollup,
}

_OPERATOR_QUERIES: dict[str, tuple[Callable, Callable[[str], str] | None]] = {
    "pip_join": (_run_pip_join, q_pip_join),
    "knn_geo": (_run_knn_geo, q_knn_geo),
    "knn_embeddings": (_run_knn_embeddings, q_knn_embeddings),
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, fn in _SQL_QUERIES.items():
        out[name] = _sql_runner(fn)
    for name, (runner, _oracle) in _OPERATOR_QUERIES.items():
        out[name] = runner
    return out


def oracle_sql() -> dict[str, str]:
    out = {name: fn(S.DUCK) for name, fn in _SQL_QUERIES.items()}
    for name, (_runner, oracle) in _OPERATOR_QUERIES.items():
        if oracle is not None:
            out[name] = oracle(S.DUCK)
    return out
