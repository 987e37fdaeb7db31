"""Geometry aggregations (SURVEY §2.6).

- ``convex_hull_agg``: distributed convex hull via the partial/final
  pattern — per-Arrow-batch partial hulls (mapInPandas) reduce each
  batch to <= its hull vertices, then one final hull over the tiny
  union. Hull is associative, so this mirrors exactly how the
  reference's CascadedPolygonUnion tree maps onto Spark's
  partial/final aggregation (SURVEY §2.6).
- ``extent_agg``: envelope of a set — pure native min/max.
- ``collect_union_points``: multipoint union (distinct coordinate
  set), native distinct + a single assembly pass.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def convex_hull_agg(
    df: DataFrame, x_col: str = "x", y_col: str = "y"
) -> "np.ndarray":
    """Exact convex hull of all (x, y) rows, computed distributed.

    Returns the hull as an (k, 2) numpy ring (closed) on the driver —
    the reduction to per-partition partial hulls keeps the driver-side
    final step O(partitions * hull_size).
    """
    from geos_spark.kernels.scalars import convex_hull_coords

    schema = T.StructType(
        [T.StructField("hx", T.DoubleType()), T.StructField("hy", T.DoubleType())]
    )

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pts = np.column_stack(
                [pdf[x_col].to_numpy(np.float64), pdf[y_col].to_numpy(np.float64)]
            )
            if len(pts) == 0:
                continue
            coords = convex_hull_coords(pts)
            yield pd.DataFrame({"hx": coords[:, 0], "hy": coords[:, 1]})

    partials = df.select(F.col(x_col), F.col(y_col)).mapInPandas(
        partial, schema
    )
    pts = partials.toPandas().to_numpy(np.float64)
    if len(pts) == 0:
        return np.zeros((0, 2))
    return convex_hull_coords(pts)


def extent_agg(df: DataFrame, x_col: str = "x", y_col: str = "y") -> DataFrame:
    return df.agg(
        F.min(x_col).alias("minx"),
        F.min(y_col).alias("miny"),
        F.max(x_col).alias("maxx"),
        F.max(y_col).alias("maxy"),
    )


def collect_union_points(
    df: DataFrame, x_col: str = "x", y_col: str = "y"
) -> DataFrame:
    """Union of a point set = distinct coordinates (unaryUnion on
    points, UnaryUnionOp point path)."""
    return df.select(
        F.col(x_col).alias("ux"), F.col(y_col).alias("uy")
    ).distinct()
