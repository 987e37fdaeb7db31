"""Deterministic corpus-shaping operators for training-data
pipelines: hash-based sampling and per-source quota capping.

Both are the shapes a 100 TB pipeline actually uses:

- ``hash_sample`` is a stateless map (zero shuffle, reproducible
  across reruns and cluster sizes — unlike ``df.sample`` whose
  output depends on partitioning).  The hash is the engine's
  portable md5-prefix integer (operators/dedup.py md5_i64), so any
  SQL engine can replay the exact row set.
- ``source_quota`` caps documents per source/domain (boilerplate
  and crawl-skew control).  Implemented as a salted two-phase
  top-k: a partial window over (source, salt-bucket) first reduces
  every source to at most k*salt_buckets rows, so the final exact
  window never shuffles a mega-domain's full row set — the classic
  skew-safe top-k shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from geos_spark.operators.dedup import md5_i64

_DENOM = 1_000_000


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Keep rows where md5(key:salt) mod 1e6 < fraction*1e6.

    Deterministic per (key, salt): re-running, repartitioning, or
    changing cluster size yields the identical sample; changing the
    salt draws an independent sample.
    """
    thresh = int(round(fraction * _DENOM))
    h = md5_i64(
        F.concat(F.col(key_col).cast("string"), F.lit(":" + salt))
    )
    return df.where(F.pmod(h, F.lit(_DENOM)) < F.lit(thresh))


def source_quota(
    df: DataFrame,
    k: int,
    source_col: str = "source",
    order_col: str = "n_chars",
    id_col: str = "doc_id",
    salt_buckets: int = 16,
) -> DataFrame:
    """At most ``k`` rows per source, keeping the largest
    ``order_col`` (ties broken by ascending ``id_col``).  Output adds
    ``rank`` (1-based within the source).

    Phase 1 caps each (source, hash-bucket) at k rows — map-scale
    shuffle keyed on a salted key, so a source with 10^9 rows ships
    at most k*salt_buckets rows onward.  Phase 2 is the exact
    window.  Top-k of a union of per-bucket top-ks is exact.
    """
    bucket = F.pmod(F.hash(F.col(id_col)), F.lit(salt_buckets))
    order = [
        F.col(order_col).desc_nulls_last(),
        F.col(id_col).asc(),
    ]
    partial = Window.partitionBy(F.col(source_col), bucket).orderBy(
        *order
    )
    pruned = (
        df.withColumn("__pr", F.row_number().over(partial))
        .where(F.col("__pr") <= k)
        .drop("__pr")
    )
    final = Window.partitionBy(source_col).orderBy(*order)
    return (
        pruned.withColumn("rank", F.row_number().over(final))
        .where(F.col("rank") <= k)
    )


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a hash-chosen
    ``fractions[stratum]`` of each stratum (language rebalancing,
    domain downweighting).

    Same determinism contract as :func:`hash_sample` — the kept set
    is a pure function of (key, salt), invariant under partitioning
    and cluster size. The per-stratum thresholds ride along as a
    BROADCAST dim join (the fractions map is tiny by construction),
    so the corpus-side scan never shuffles: at 100 TB this stays a
    map-only pass.

    Strata absent from ``fractions`` keep ``default_fraction``.
    """
    spark = df.sparkSession
    dim = spark.createDataFrame(
        [(k, int(round(v * _DENOM))) for k, v in sorted(fractions.items())],
        schema=f"{strata_col} string, __thresh int",
    )
    h = md5_i64(
        F.concat(F.col(key_col).cast("string"), F.lit(":" + salt))
    )
    default_thresh = int(round(default_fraction * _DENOM))
    joined = df.join(F.broadcast(dim), on=strata_col, how="left")
    return joined.where(
        F.pmod(h, F.lit(_DENOM))
        < F.coalesce(F.col("__thresh"), F.lit(default_thresh))
    ).drop("__thresh")
