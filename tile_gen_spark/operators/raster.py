"""G13/G14 (SURVEY.md §2.8): raster↔vector conversion over tile grids.

``BASELINE.json:6,14``: "rasterize polygons to tile grids and vectorize back
... as pandas/Arrow batch UDFs over cell arrays". Implemented as grouped-map
``applyInPandas`` per tile: all of a tile's polygons are rasterized into one
W×H coverage grid (scanline even-odd fill); vectorize runs exact boundary
tracing back to rings. The round trip is exact: re-rasterizing the vectorized
rings reproduces the grid bit-for-bit (kernel property, tested).

Grids live in tile-local quantized space (MVT extent 4096 → W×H cells);
rasters are ``array<float>`` row-major (row 0 = tile's north edge).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..functions import kernels as K

RASTER_SCHEMA = "z int, x bigint, y bigint, grid array<float>, mass double"
VECTOR_SCHEMA = ("z int, x bigint, y bigint, ring_id int, "
                 "geom array<int>, area double")


def rasterize_tiles(clipped: DataFrame, width: int = 256, height: int = 256,
                    extent: int = K.MVT_EXTENT) -> DataFrame:
    """Per-tile coverage grid from clipped polygon features (grouped-map).

    Input: the clip_* output schema (z, x, y, feature_id, kind, geom, props).
    Quantized geom is y-down; the kernel frame is y-up, so rings are flipped
    going in and the produced grid keeps row 0 = north.
    """

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        z, x, y = int(pdf["z"].iloc[0]), int(pdf["x"].iloc[0]), int(pdf["y"].iloc[0])
        rings = []
        for kind, geom in zip(pdf["kind"], pdf["geom"]):
            if kind != "polygon":
                continue
            for piece in geom:
                arr = np.asarray(piece, dtype=np.float64).reshape(-1, 2)
                arr[:, 1] = extent - arr[:, 1]  # y-down → y-up
                rings.append(arr.ravel())
        grid = K.rasterize_rings(rings, 0, 0, float(extent), float(extent),
                                 width=width, height=height)
        return pd.DataFrame({
            "z": [z], "x": [x], "y": [y],
            "grid": [grid.ravel().tolist()],
            "mass": [float(grid.sum())],
        })

    return (clipped.groupBy("z", "x", "y").applyInPandas(fn, RASTER_SCHEMA))


def zoom_density_stats(rasters: DataFrame) -> DataFrame:
    """Grouped-agg pandas UDF (SURVEY.md §2.11): per-zoom mean coverage mass.

    A true GROUPED_AGG vectorized aggregate (Series → scalar), demonstrating
    the custom-numeric-agg path next to the grouped-map one."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # Spark 4.x raises INVALID_PANDAS_UDF_PLACEMENT when a GROUPED_AGG pandas
    # UDF shares an agg() with built-in aggregates, so n_tiles is a second
    # pandas UDF rather than F.count("*").
    @pandas_udf("double")
    def mean_mass(mass: pd.Series) -> float:
        return float(mass.mean())

    @pandas_udf("long")
    def n_tiles(mass: pd.Series) -> int:
        return int(mass.size)

    return (rasters.groupBy("z")
            .agg(mean_mass("mass").alias("mean_mass"),
                 n_tiles("mass").alias("n_tiles")))


def vectorize_tiles(rasters: DataFrame, width: int = 256, height: int = 256,
                    extent: int = K.MVT_EXTENT) -> DataFrame:
    """Grids → boundary rings in quantized tile coords (mapInPandas)."""
    sx = extent / width
    sy = extent / height

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows: dict[str, list] = {k: [] for k in ("z", "x", "y", "ring_id", "geom", "area")}
            for z, x, y, grid in zip(b["z"], b["x"], b["y"], b["grid"]):
                g = np.asarray(grid, dtype=np.float32).reshape(height, width)
                rings = K.vectorize_grid(g)
                for i, r in enumerate(rings):
                    q = r.copy()
                    q[:, 0] *= sx
                    q[:, 1] = extent - q[:, 1] * sy  # y-up → y-down quantized
                    rows["z"].append(int(z))
                    rows["x"].append(int(x))
                    rows["y"].append(int(y))
                    rows["ring_id"].append(i)
                    rows["geom"].append(np.rint(q).astype(np.int32).ravel().tolist())
                    rows["area"].append(abs(K.ring_signed_area(r)))
            yield pd.DataFrame({
                "z": pd.Series(rows["z"], dtype="int32"),
                "x": pd.Series(rows["x"], dtype="int64"),
                "y": pd.Series(rows["y"], dtype="int64"),
                "ring_id": pd.Series(rows["ring_id"], dtype="int32"),
                "geom": pd.Series(rows["geom"], dtype=object),
                "area": pd.Series(rows["area"], dtype="float64"),
            })

    return rasters.mapInPandas(fn, VECTOR_SCHEMA)


def raster_roundtrip_check(clipped: DataFrame, width: int = 64,
                           height: int = 64) -> DataFrame:
    """Rows-only correctness artifact: rasterize each tile, vectorize, re-
    rasterize the rings — exact mass equality per tile (kernel guarantee)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {"z": [], "x": [], "y": [], "mass": [], "mass_rt": [], "n_rings": []}
            for z, x, y, grid in zip(b["z"], b["x"], b["y"], b["grid"]):
                g = np.asarray(grid, dtype=np.float32).reshape(height, width)
                rings = K.vectorize_grid(g)
                g2 = K.rasterize_rings([r.ravel() for r in rings], 0, 0,
                                       float(width), float(height), width, height)
                out["z"].append(int(z))
                out["x"].append(int(x))
                out["y"].append(int(y))
                out["mass"].append(float(g.sum()))
                out["mass_rt"].append(float(g2.sum()))
                out["n_rings"].append(len(rings))
            yield pd.DataFrame({
                "z": pd.Series(out["z"], dtype="int32"),
                "x": pd.Series(out["x"], dtype="int64"),
                "y": pd.Series(out["y"], dtype="int64"),
                "mass": pd.Series(out["mass"], dtype="float64"),
                "mass_rt": pd.Series(out["mass_rt"], dtype="float64"),
                "n_rings": pd.Series(out["n_rings"], dtype="int32"),
            })

    rasters = rasterize_tiles(clipped, width=width, height=height)
    return rasters.mapInPandas(fn, "z int, x bigint, y bigint, mass double, mass_rt double, n_rings int")
