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


def convex_hull_agg_df(
    df: DataFrame, x_col: str = "x", y_col: str = "y"
) -> DataFrame:
    """Exact convex hull of all (x, y) rows as a DataFrame of ordered
    hull vertices (vertex_idx, hx, hy) — fully distributed:

    stage 1 (partial): per-Arrow-batch hulls via mapInPandas reduce
    each batch to <= its hull vertices (map-side combine);
    stage 2 (final): one single-group applyInPandas hull over the tiny
    partial union. Hull is associative, so the tree computes the exact
    global hull; nothing ever lands on the driver.
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

    final_schema = T.StructType(
        [
            T.StructField("vertex_idx", T.IntegerType()),
            T.StructField("hx", T.DoubleType()),
            T.StructField("hy", T.DoubleType()),
        ]
    )

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        pts = pdf[["hx", "hy"]].to_numpy(np.float64)
        if len(pts) == 0:
            return pd.DataFrame({"vertex_idx": [], "hx": [], "hy": []})
        coords = convex_hull_coords(pts)
        return pd.DataFrame(
            {
                "vertex_idx": np.arange(len(coords), dtype=np.int32),
                "hx": coords[:, 0],
                "hy": coords[:, 1],
            }
        )

    return (
        partials.withColumn("_g", F.lit(0))
        .groupBy("_g")
        .applyInPandas(lambda pdf: final(pdf), final_schema)
    )


def convex_hull_agg(
    df: DataFrame, x_col: str = "x", y_col: str = "y"
) -> "np.ndarray":
    """Convenience wrapper: the global hull as a closed (k, 2) numpy
    ring (collects the tiny final-hull DataFrame)."""
    rows = (
        convex_hull_agg_df(df, x_col, y_col)
        .orderBy("vertex_idx")
        .collect()
    )
    if not rows:
        return np.zeros((0, 2))
    return np.array([[r.hx, r.hy] for r in rows], dtype=np.float64)


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


def unary_union_agg(
    df: DataFrame,
    wkb_col: str = "wkb",
    group_cols: list[str] | None = None,
    out_col: str = "union_wkb",
    algorithm: str = "cascaded",
) -> DataFrame:
    """Distributed unaryUnion aggregate — the reference's
    CascadedPolygonUnion merge tree (CascadedPolygonUnion.cpp:89-122)
    mapped onto Spark's partial/final aggregation:

    stage 1 (partial): union within each (group, input-partition) via
    applyInPandas — map-side combine, bounds the data shipped to the
    final stage to one geometry per group per partition;
    stage 2 (final): union of the partials per group.

    Union is associative, so the two-level tree computes the same
    result as a single cascade (float merge order can differ only in
    snap-fallback robustness cases, as in the reference's own tree).
    """
    from geos_spark.kernels import geom as G
    from geos_spark.kernels.union import (
        disjoint_subset_union,
        unary_union,
    )
    from geos_spark.kernels.wkb import parse_wkb, write_wkb

    # "disjoint_subsets" = GEOSDisjointSubsetUnion per merge step
    # (capi geos_c.h.in:1085): cluster by intersects, union each
    # cluster, structurally combine — same result, no cross-cluster
    # overlay work
    union_fn = (
        disjoint_subset_union
        if algorithm == "disjoint_subsets"
        else unary_union
    )
    group_cols = list(group_cols or [])

    def union_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
        geoms = [
            parse_wkb(b) for b in pdf[wkb_col].to_numpy() if b is not None
        ]
        parts = []
        for g in geoms:
            parts.extend(g.geoms() if g.is_collection else [g])
        u = union_fn(G.Geom.collection(G.GEOMETRYCOLLECTION, parts))
        row = {c: [pdf[c].iloc[0]] for c in group_cols}
        row[wkb_col] = [write_wkb(u)]
        return pd.DataFrame(row)

    fields = [df.schema[c] for c in group_cols] + [
        T.StructField(wkb_col, T.BinaryType())
    ]
    schema = T.StructType(fields)

    partial = (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy(*(group_cols + ["_pid"]))
        .applyInPandas(
            lambda pdf: union_pdf(pdf.drop(columns=["_pid"])), schema
        )
    )
    final = partial.groupBy(*group_cols).applyInPandas(union_pdf, schema)
    return final.withColumnRenamed(wkb_col, out_col)
