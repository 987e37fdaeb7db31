"""Distributed geometry aggregates vs local kernels."""

import numpy as np

from geos_spark.kernels.scalars import convex_hull_coords
from geos_spark.operators.aggregates import convex_hull_agg
from geos_spark.sources.pages import with_doc_point


def test_hull_agg_matches_local(spark):
    pts = with_doc_point(
        spark.range(0, 20000, 1, 16).withColumnRenamed("id", "doc_id")
    )
    got = convex_hull_agg(pts)
    local = pts.select("x", "y").toPandas().to_numpy(np.float64)
    exp = convex_hull_coords(local)
    # same vertex set, same ring (canonical start may differ: compare sets)
    gs = {tuple(p) for p in got}
    es = {tuple(p) for p in exp}
    assert gs == es
    assert len(got) >= 4
