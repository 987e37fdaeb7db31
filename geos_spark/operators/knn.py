"""kNN and within-distance joins over point geometries.

- ``within_distance_join``: the global phase assigns each build-side
  geometry to every tile its d-expanded envelope overlaps (exactly the
  DBSCAN-style expanded-envelope query of the reference,
  ``include/geos/operation/cluster/DBSCANClusterFinder.h:34-38``);
  probe points join on their containing tile; a native squared-
  distance filter refines. No python in the plan at all for
  point-to-point distance.

- ``knn_join_broadcast``: exact kNN against a small build side —
  broadcast + window top-k (ties by id, matching GEOSSTRtree_nearest
  determinism).

- ``knn_join``: cell-ring-expansion kNN for large build sides:
  candidates from the probe's tile ring r=0,1,2... until the k-th
  candidate distance is below the ring lower bound. Implemented as a
  bounded iterative DataFrame loop (driver-side ring counter, no
  collect of data rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geos_spark.functions.hilbert_native import (
    with_tile_cell,
    with_tile_cells_exploded,
)
from geos_spark.functions.st import DEFAULT_EXTENT


def within_distance_join(
    probe: DataFrame,
    build: DataFrame,
    distance: float,
    *,
    probe_xy: tuple[str, str] = ("x", "y"),
    build_xy: tuple[str, str] = ("cx", "cy"),
    level: int = 6,
    extent=DEFAULT_EXTENT,
) -> DataFrame:
    """Pairs (probe, build) with euclidean distance <= d. Native-only
    plan: tile equijoin + codegen'd squared-distance filter."""
    px, py = probe_xy
    bx, by = build_xy
    p = with_tile_cell(probe, px, py, level, extent, out="__cell")
    b = with_tile_cells_exploded(
        build, (bx, by, bx, by), level, extent, out="__cell", pad=distance
    )
    d2 = (F.col(px) - F.col(bx)) ** 2 + (F.col(py) - F.col(by)) ** 2
    return p.join(b, "__cell").where(d2 <= F.lit(distance * distance)).drop(
        "__cell"
    )


def knn_join_broadcast(
    probe: DataFrame,
    build: DataFrame,
    k: int,
    *,
    probe_id: str = "doc_id",
    build_id: str = "poly_id",
    probe_xy: tuple[str, str] = ("x", "y"),
    build_xy: tuple[str, str] = ("cx", "cy"),
) -> DataFrame:
    """Exact kNN vs a broadcastable build side.

    Returns probe columns + (rank, build_id, dist2). Ties break by
    build id ascending (GEOSSTRtree_nearest tie determinism).
    """
    px, py = probe_xy
    bx, by = build_xy
    d2 = (F.col(px) - F.col(bx)) ** 2 + (F.col(py) - F.col(by)) ** 2
    scored = probe.join(F.broadcast(build)).withColumn("dist2", d2)
    w = Window.partitionBy(probe_id).orderBy(
        F.col("dist2").asc(), F.col(build_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def knn_join(
    probe: DataFrame,
    build: DataFrame,
    k: int,
    *,
    probe_id: str = "doc_id",
    build_id: str = "poly_id",
    probe_xy: tuple[str, str] = ("x", "y"),
    build_xy: tuple[str, str] = ("cx", "cy"),
    level: int = 4,
    extent=DEFAULT_EXTENT,
    max_rings: int | None = None,
) -> DataFrame:
    """Cell-ring-expansion kNN (scale path for large build sides).

    Ring r candidates = build rows whose tile is within Chebyshev
    distance r of the probe's tile. A probe's result is final once its
    k-th best squared distance <= ((r) * tile_side)^2 — the minimum
    possible distance to any cell in ring r+1 or beyond (points in
    adjacent rings can be arbitrarily close to the shared border, so
    the bound uses r, not r+1). The loop unions per-ring candidate
    sets and stops when every probe is final or rings are exhausted;
    correctness does not depend on the stopping ring because the final
    window re-ranks over all accumulated candidates.

    Uses grid (gx, gy) keys rather than Hilbert ids for the ring
    predicate (Chebyshev rings are axis-aligned).
    """
    minx, miny, maxx, maxy = extent
    n = 1 << level
    sx = (maxx - minx) / n
    sy = (maxy - miny) / n
    px, py = probe_xy
    bx, by = build_xy
    if max_rings is None:
        max_rings = n  # worst case: whole grid

    def grid(df: DataFrame, xc: str, yc: str, pre: str) -> DataFrame:
        gx = F.greatest(
            F.lit(0),
            F.least(F.lit(n - 1), F.floor((F.col(xc) - F.lit(minx)) / F.lit(sx))),
        )
        gy = F.greatest(
            F.lit(0),
            F.least(F.lit(n - 1), F.floor((F.col(yc) - F.lit(miny)) / F.lit(sy))),
        )
        return df.withColumn(pre + "gx", gx).withColumn(pre + "gy", gy)

    p = grid(probe, px, py, "p_")
    b = grid(build, bx, by, "b_")

    d2 = (F.col(px) - F.col(bx)) ** 2 + (F.col(py) - F.col(by)) ** 2
    tile_min = min(sx, sy)

    results = None
    pending = p
    r = 0
    while r <= max_rings:
        # candidates in Chebyshev ring <= r (recomputed per round on the
        # pending probes only; dedup by window at the end)
        cheb = F.greatest(
            F.abs(F.col("p_gx") - F.col("b_gx")),
            F.abs(F.col("p_gy") - F.col("b_gy")),
        )
        cand = pending.join(
            b, cheb <= F.lit(r), "left"
        ).withColumn("dist2", d2)
        w = Window.partitionBy(probe_id).orderBy(
            F.col("dist2").asc_nulls_last(), F.col(build_id).asc_nulls_last()
        )
        ranked = cand.withColumn("rank", F.row_number().over(w))
        topk = ranked.where(F.col("rank") <= k)
        # a probe is final if it has k candidates and its kth dist2 fits
        # inside radius r*tile_min (safe lower bound of ring r+1)
        bound = (r * tile_min) ** 2
        kth = topk.groupBy(probe_id).agg(
            F.count(F.lit(1)).alias("__n"), F.max("dist2").alias("__kth")
        )
        final_ids = kth.where(
            (F.col("__n") >= k) & (F.col("__kth") <= F.lit(bound))
        ).select(probe_id)
        done = topk.join(final_ids, probe_id, "left_semi")
        results = done if results is None else results.unionByName(done)
        pending = pending.join(final_ids, probe_id, "left_anti")
        # cheap emptiness check per round (metadata-only count)
        if pending.limit(1).count() == 0:
            break
        r = max(1, r * 2)
    out_cols = [c for c in probe.columns] + ["rank", build_id, "dist2"]
    return results.select(*out_cols)
