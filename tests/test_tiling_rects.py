"""Rectangle tiling fast path == general clip tiler on rect inputs."""

from pyspark.sql import functions as F

from geos_spark.functions.st import st_point
from geos_spark.operators.tiling import tile_materialize, tile_materialize_rects
from geos_spark.sources.pages import EXTENT, with_doc_point


def test_rect_fast_path_matches_general(spark):
    pts = with_doc_point(spark.range(0, 500).withColumnRenamed("id", "doc_id"))
    sq = (
        pts.withColumn("xmin", F.col("x") - 8)
        .withColumn("ymin", F.col("y") - 8)
        .withColumn("xmax", F.col("x") + 8)
        .withColumn("ymax", F.col("y") + 8)
    )
    fast = tile_materialize_rects(sq, level=6, extent=EXTENT)
    got = {
        (r.doc_id, r.cell): (r.clipped_area, r.covers_fully)
        for r in fast.collect()
    }

    # general path needs a wkb polygon column for the same squares
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf
    import pandas as pd

    @pandas_udf(T.BinaryType())
    def _sq_wkb(x0, y0, x1, y1):
        from geos_spark.kernels import geom as G
        from geos_spark.kernels.wkb import write_wkb

        out = []
        for a, b, c, d in zip(x0, y0, x1, y1):
            out.append(
                write_wkb(
                    G.Geom.polygon([[(a, b), (c, b), (c, d), (a, d), (a, b)]])
                )
            )
        return pd.Series(out, dtype=object)

    wk = sq.withColumn(
        "wkb", _sq_wkb(F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"))
    )
    gen = tile_materialize(wk, level=6, extent=EXTENT)
    exp = {
        (r.doc_id, r.cell): (r.clipped_area, r.covers_fully)
        for r in gen.collect()
    }
    assert set(got) == set(exp)
    for k in got:
        assert abs(got[k][0] - exp[k][0]) < 1e-9, k
        assert got[k][1] == exp[k][1], k
