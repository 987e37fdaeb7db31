"""Raster<->vector tile materialization.

``tile_materialize``: explode each geometry to every tile its
envelope overlaps (native), compute the tile bbox natively from the
grid ordinates, then clip the geometry to its tile in one vectorized
pUDF pass (per-batch factorized decode). Output rows carry the tile
cell id, the clipped fragment (canonical NDR WKB), its area, and
whether the tile is fully covered — exactly the
``(url, cell, clipped_wkb, covers_fully)`` shape of the reference's
tile fixture (FIXTURES.md §6; clip semantics per
``src/operation/intersection/RectangleIntersection.cpp``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from geos_spark.functions.hilbert_native import with_tile_cells_exploded
from geos_spark.functions.st import DEFAULT_EXTENT

_CLIP_SCHEMA = T.StructType(
    [
        T.StructField("clipped_wkb", T.BinaryType()),
        T.StructField("clipped_area", T.DoubleType()),
        T.StructField("covers_fully", T.BooleanType()),
    ]
)


@pandas_udf(_CLIP_SCHEMA)
def _clip_udf(
    wkb: pd.Series,
    txmin: pd.Series,
    tymin: pd.Series,
    txmax: pd.Series,
    tymax: pd.Series,
) -> pd.DataFrame:
    from geos_spark.kernels.clip import clip_geom
    from geos_spark.kernels.scalars import geom_area
    from geos_spark.kernels.wkb import parse_wkb, write_wkb

    codes, uniques = pd.factorize(wkb.map(bytes))
    geoms = [parse_wkb(u) for u in uniques]
    out_wkb = []
    out_area = []
    out_full = []
    for c, x0, y0, x1, y1 in zip(
        codes, txmin.to_numpy(), tymin.to_numpy(),
        txmax.to_numpy(), tymax.to_numpy(),
    ):
        clipped = clip_geom(geoms[c], x0, y0, x1, y1)
        if clipped.is_empty:
            out_wkb.append(None)
            out_area.append(0.0)
            out_full.append(False)
            continue
        area = geom_area(clipped)
        out_wkb.append(write_wkb(clipped))
        out_area.append(area)
        out_full.append(area == (x1 - x0) * (y1 - y0))
    return pd.DataFrame(
        {
            "clipped_wkb": pd.Series(out_wkb, dtype=object),
            "clipped_area": out_area,
            "covers_fully": out_full,
        }
    )


def tile_materialize_rects(
    df: DataFrame,
    level: int,
    *,
    bbox_cols: tuple[str, str, str, str] = ("xmin", "ymin", "xmax", "ymax"),
    extent: tuple[float, float, float, float] = DEFAULT_EXTENT,
) -> DataFrame:
    """Rectangle fast path: when the geometry IS its envelope (tiles,
    doc squares, raster footprints), the per-tile clip is a pure
    envelope intersection — the whole tiling materializes natively
    with zero python (the RectangleIntersection fast-path analogue,
    ``src/operation/intersection/RectangleIntersection.cpp``).
    Output: input cols + (cell, fxmin, fymin, fxmax, fymax,
    clipped_area, covers_fully).
    """
    minx, miny, maxx, maxy = extent
    n = 1 << level
    sx = (maxx - minx) / n
    sy = (maxy - miny) / n
    xmin, ymin, xmax, ymax = (F.col(c) for c in bbox_cols)
    e = with_tile_cells_exploded(
        df, bbox_cols, level, extent, out="cell", keep_grid=True
    )
    tx0 = F.lit(minx) + F.col("gx") * F.lit(sx)
    ty0 = F.lit(miny) + F.col("gy") * F.lit(sy)
    tx1 = F.lit(minx) + (F.col("gx") + 1) * F.lit(sx)
    ty1 = F.lit(miny) + (F.col("gy") + 1) * F.lit(sy)
    fx0 = F.greatest(xmin, tx0)
    fy0 = F.greatest(ymin, ty0)
    fx1 = F.least(xmax, tx1)
    fy1 = F.least(ymax, ty1)
    area = F.greatest(F.lit(0.0), fx1 - fx0) * F.greatest(F.lit(0.0), fy1 - fy0)
    return (
        e.withColumn("fxmin", fx0)
        .withColumn("fymin", fy0)
        .withColumn("fxmax", fx1)
        .withColumn("fymax", fy1)
        .withColumn("clipped_area", area)
        .withColumn(
            "covers_fully", area == F.lit(sx) * F.lit(sy)
        )
        .where(area > 0)
        .drop("gx", "gy")
    )


def tile_materialize(
    df: DataFrame,
    level: int,
    *,
    bbox_cols: tuple[str, str, str, str] = ("xmin", "ymin", "xmax", "ymax"),
    wkb_col: str = "wkb",
    extent: tuple[float, float, float, float] = DEFAULT_EXTENT,
    drop_empty: bool = True,
) -> DataFrame:
    """Materialize per-tile clipped fragments for each input geometry."""
    minx, miny, maxx, maxy = extent
    n = 1 << level
    sx = (maxx - minx) / n
    sy = (maxy - miny) / n
    e = with_tile_cells_exploded(
        df, bbox_cols, level, extent, out="cell", keep_grid=True
    )
    e = (
        e.withColumn("tile_xmin", F.lit(minx) + F.col("gx") * F.lit(sx))
        .withColumn("tile_ymin", F.lit(miny) + F.col("gy") * F.lit(sy))
        .withColumn("tile_xmax", F.lit(minx) + (F.col("gx") + 1) * F.lit(sx))
        .withColumn("tile_ymax", F.lit(miny) + (F.col("gy") + 1) * F.lit(sy))
    )
    e = e.withColumn(
        "clip",
        _clip_udf(
            F.col(wkb_col),
            F.col("tile_xmin"),
            F.col("tile_ymin"),
            F.col("tile_xmax"),
            F.col("tile_ymax"),
        ),
    )
    out = e.select(
        *df.columns,
        "cell",
        F.col("clip.clipped_wkb").alias("clipped_wkb"),
        F.col("clip.clipped_area").alias("clipped_area"),
        F.col("clip.covers_fully").alias("covers_fully"),
    )
    if drop_empty:
        out = out.where(F.col("clipped_wkb").isNotNull())
    return out
