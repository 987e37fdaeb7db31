"""kNN join exactness: the cell-ring-expansion kNN must equal the
broadcast brute-force kNN (which is itself oracle-verified against
DuckDB in the parity suite), including tie-breaks and hot-window skew
rows. Termination bound: a probe finalizes only when its k-th distance
fits inside the explored radius."""

from pyspark.sql import functions as F

from geos_spark.operators.knn import knn_join, knn_join_broadcast
from geos_spark.queries import _centers
from geos_spark.sources.pages import EXTENT, with_doc_point


def _pairs(df):
    return {
        (r.doc_id, r.rank, r.poly_id)
        for r in df.select("doc_id", "rank", "poly_id").collect()
    }


def test_ring_knn_matches_broadcast(spark):
    pts = with_doc_point(spark.range(0, 5000).withColumnRenamed("id", "doc_id"))
    centers = _centers(spark)
    exact = knn_join_broadcast(pts, centers, k=4)
    ring = knn_join(pts, centers, k=4, level=4, extent=EXTENT)
    assert _pairs(ring) == _pairs(exact)


def test_ring_knn_k_larger_than_cell(spark):
    # k large enough that many rings must expand
    pts = with_doc_point(spark.range(0, 300).withColumnRenamed("id", "doc_id"))
    centers = _centers(spark).where(F.col("poly_id") % 16 == 0)  # sparse build
    exact = knn_join_broadcast(pts, centers, k=6)
    ring = knn_join(pts, centers, k=6, level=5, extent=EXTENT)
    assert _pairs(ring) == _pairs(exact)
