"""Crawl snapshot operators: incremental merge / delta
classification between two crawls of the same url space.

The recrawl bookkeeping every crawl pipeline runs: which urls are
new, which disappeared, which changed content, which are byte-stable
(the freshness signal feeding recrawl scheduling and dedup).

Scale shape: content is fingerprinted (md5) BEFORE the join, so the
url-keyed full-outer shuffle moves (url, 32-hex) rows, never page
bodies; at 100 TB this is one sort-merge join of two slim
projections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def crawl_delta(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    content_col: str = "text",
) -> DataFrame:
    """Classify every url across two snapshots: ``added`` (new only),
    ``removed`` (old only), ``changed`` (both, different content
    fingerprint), ``unchanged``. Returns (url, status, old_md5,
    new_md5)."""
    o = old.select(
        F.col(url_col).alias("url"),
        F.md5(F.col(content_col)).alias("old_md5"),
    )
    n = new.select(
        F.col(url_col).alias("url"),
        F.md5(F.col(content_col)).alias("new_md5"),
    )
    j = o.join(n, on="url", how="full_outer")
    status = (
        F.when(F.col("old_md5").isNull(), F.lit("added"))
        .when(F.col("new_md5").isNull(), F.lit("removed"))
        .when(F.col("old_md5") == F.col("new_md5"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select("url", status.alias("status"), "old_md5", "new_md5")
