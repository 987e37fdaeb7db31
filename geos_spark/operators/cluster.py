"""Clustering operators (SURVEY §2.6): within-distance / DBSCAN
connected components over the spatial pair table.

The reference clusters with a union-find over STRtree queries
(``src/operation/cluster/AbstractClusterFinder.cpp``,
``DBSCANClusterFinder.h:28-38`` — each item's envelope expanded by
eps drives the candidate search).  Distributed shape:

1. candidate pairs from the cell-partitioned within-distance join
   (the same expanded-envelope prefilter, Catalyst equijoin on cell);
2. iterative min-label propagation with pointer doubling (path
   halving: ``cluster <- label(cluster)`` after each propagation) to
   a fixpoint — the union-find re-expressed as a bounded loop of
   shuffles converging in O(log(diameter)) rounds even on chain
   graphs; each round is a groupBy plus two joins, all on the point
   id — AQE-coalesced at scale.

No GraphFrames dependency; the loop materialises each round with
``localCheckpoint`` to cut the growing lineage (the scale-safe
pattern for iterative DataFrame algorithms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def neighbor_pairs(
    df: DataFrame,
    eps: float,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    level: int = 6,
    extent=(0.0, 0.0, 4096.0, 4096.0),
) -> DataFrame:
    """Symmetric candidate pairs within ``eps`` (id_a < id_b).

    Native two-phase join: assign each point to every grid cell its
    eps-expanded envelope touches (the DBSCAN envelope expansion),
    equijoin on cell, exact distance refine, reference-point dedup by
    the cell equijoin + distinct."""
    from geos_spark.functions.hilbert_native import with_hilbert_cell

    x0, y0, x1, y1 = extent
    n = (1 << level) - 1
    stride_x = (x1 - x0) / n if n else 1.0
    stride_y = (y1 - y0) / n if n else 1.0

    def cells(df_in, expand):
        gx_lo = F.floor((F.col(x_col) - expand - F.lit(x0)) / F.lit(stride_x))
        gx_hi = F.floor((F.col(x_col) + expand - F.lit(x0)) / F.lit(stride_x))
        gy_lo = F.floor((F.col(y_col) - expand - F.lit(y0)) / F.lit(stride_y))
        gy_hi = F.floor((F.col(y_col) + expand - F.lit(y0)) / F.lit(stride_y))
        clamp = lambda c: F.greatest(
            F.lit(0), F.least(c, F.lit(n))
        ).cast("long")
        out = df_in.withColumn(
            "gx", F.explode(F.sequence(clamp(gx_lo), clamp(gx_hi)))
        ).withColumn(
            "gy", F.explode(F.sequence(clamp(gy_lo), clamp(gy_hi)))
        )
        return with_hilbert_cell(out, "gx", "gy", level, out="cell")

    a = cells(
        df.select(
            F.col(id_col).alias("id_a"),
            F.col(x_col).alias("xa"),
            F.col(y_col).alias("ya"),
        ).withColumnRenamed("xa", x_col).withColumnRenamed("ya", y_col),
        0.0,
    ).select("id_a", F.col(x_col).alias("xa"), F.col(y_col).alias("ya"), "cell")
    b = cells(
        df.select(
            F.col(id_col).alias("id_b"),
            F.col(x_col).alias("xb"),
            F.col(y_col).alias("yb"),
        ).withColumnRenamed("xb", x_col).withColumnRenamed("yb", y_col),
        eps,
    ).select("id_b", F.col(x_col).alias("xb"), F.col(y_col).alias("yb"), "cell")
    pairs = (
        a.join(b, "cell")
        .where(F.col("id_a") < F.col("id_b"))
        .where(
            (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
            + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb"))
            <= F.lit(eps * eps)
        )
        .select("id_a", "id_b")
        .distinct()
    )
    return pairs


def _materialize(df: DataFrame) -> DataFrame:
    """Cut lineage AND stop recomputation: iterative loops below read
    the same table every round — without materialization each round's
    job re-runs the full upstream plan (the candidate pair join), the
    classic iterative-DataFrame trap at any scale."""
    try:
        return df.localCheckpoint(eager=True)
    except Exception:  # noqa: BLE001 - e.g. checkpointing disabled
        df = df.cache()
        df.count()
        return df


def connected_components(
    ids: DataFrame, pairs: DataFrame, max_iter: int = 50
) -> DataFrame:
    """(id, cluster) with cluster = min id reachable through pairs.

    Min-label propagation to fixpoint; every iteration is a shuffle
    on id (large-large sort-merge join at scale, AQE-managed)."""
    edges = _materialize(
        pairs.select(
            F.col("id_a").alias("src"), F.col("id_b").alias("dst")
        )
        .union(
            pairs.select(
                F.col("id_b").alias("src"), F.col("id_a").alias("dst")
            )
        )
        .distinct()
    )
    labels = _materialize(
        ids.select(F.col("id"), F.col("id").alias("cluster"))
    )

    def label_sum(df: DataFrame):
        # labels are monotone non-increasing per id, so the total is
        # strictly decreasing until the fixpoint — an O(1)-shuffle
        # convergence check (no join). decimal(38,0) keeps the sum
        # exact at 10^12-row x 64-bit-id scale.
        return df.agg(
            F.sum(F.col("cluster").cast("decimal(38,0)"))
        ).collect()[0][0]

    prev_sum = label_sum(labels)
    converged = False
    for _ in range(max_iter):
        # one-hop min-label propagation over the edge table
        nbr_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("cluster").alias("nbr_cluster"))
        )
        prop = (
            labels.join(nbr_min, labels.id == nbr_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("cluster"),
                    F.coalesce(F.col("nbr_cluster"), F.col("cluster")),
                ).alias("cluster"),
            )
        )
        # pointer doubling (path halving): cluster <- label(cluster).
        # labels are monotone non-increasing (label(x) <= x), so the
        # hop distance to the component minimum roughly halves every
        # round — O(log diameter) rounds even for chain graphs, where
        # plain propagation needs O(diameter).
        parent = prop.select(
            F.col("id").alias("p_id"), F.col("cluster").alias("p_cluster")
        )
        new_labels = (
            prop.join(parent, prop.cluster == parent.p_id, "left")
            .select(
                "id",
                F.coalesce(F.col("p_cluster"), F.col("cluster")).alias(
                    "cluster"
                ),
            )
        )
        new_labels = _materialize(new_labels)
        new_sum = label_sum(new_labels)
        # drop the previous round's blocks eagerly — a long chain of
        # retained checkpoint/cache blocks is what OOMs small heaps
        try:
            labels.unpersist()
        except Exception:  # noqa: BLE001
            pass
        labels = new_labels
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        import warnings

        warnings.warn(
            f"connected_components: no fixpoint after {max_iter} rounds; "
            "cluster labels may be split",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels


def cluster_within_distance(
    df: DataFrame,
    eps: float,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    **kw,
) -> DataFrame:
    """GEOSClusterGeometryDistance semantics for points: components of
    the within-eps graph."""
    pairs = neighbor_pairs(df, eps, id_col, x_col, y_col, **kw)
    ids = df.select(F.col(id_col).alias("id"))
    return connected_components(ids, pairs)


def cluster_dbscan(
    df: DataFrame,
    eps: float,
    min_pts: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    **kw,
) -> DataFrame:
    """GEOSClusterDBSCAN (capi geos_c.h.in:1939): core points have
    >= min_pts neighbours (self included); clusters = components of
    the core-core graph; border points join a neighbouring core's
    cluster; noise gets cluster NULL."""
    # the pair table feeds four consumers (degree, core filter, the
    # component loop, border adoption) — materialize it once
    pairs = _materialize(neighbor_pairs(df, eps, id_col, x_col, y_col, **kw))
    sym = pairs.select(
        F.col("id_a").alias("id"), F.col("id_b").alias("nbr")
    ).union(
        pairs.select(F.col("id_b").alias("id"), F.col("id_a").alias("nbr"))
    )
    degree = sym.groupBy("id").agg(F.count(F.lit(1)).alias("deg"))
    ids = df.select(F.col(id_col).alias("id"))
    core = (
        ids.join(degree, "id", "left")
        .select("id", (F.coalesce("deg", F.lit(0)) + 1 >= min_pts).alias("is_core"))
    )
    core_ids = core.where("is_core").select("id")
    core_pairs = (
        pairs.join(core_ids.withColumnRenamed("id", "id_a"), "id_a")
        .join(core_ids.withColumnRenamed("id", "id_b"), "id_b")
        .select("id_a", "id_b")
    )
    cc = connected_components(core_ids, core_pairs)
    # border points: min cluster among neighbouring cores
    border = (
        sym.join(cc.withColumnRenamed("id", "nbr"), "nbr")
        .groupBy("id")
        .agg(F.min("cluster").alias("border_cluster"))
    )
    return (
        core.join(cc, "id", "left")
        .join(border, "id", "left")
        .select(
            "id",
            F.when(F.col("is_core"), F.col("cluster"))
            .otherwise(F.col("border_cluster"))
            .alias("cluster"),
        )
    )
