"""SemDeDup: cluster-blocked embedding dedup — planted exact clones
are dropped, cross-cluster near-dups are (by design) not candidates,
and the keep rule is the deterministic smallest-id representative."""

from pyspark.sql import functions as F

from geos_spark.operators.similarity import semdedup


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semdedup_drops_planted_clones_keeps_representative(spark):
    # two well-separated clusters of 3, plus exact clones of one
    # member of each cluster (higher ids) -> clones dropped, all
    # originals kept
    base = [
        (0, [1.0, 0.0, 0.1]), (1, [0.9, 0.1, 0.0]), (2, [1.0, 0.1, 0.1]),
        (10, [0.0, 1.0, 0.1]), (11, [0.1, 0.9, 0.0]), (12, [0.0, 1.0, 0.2]),
    ]
    clones = [(100, [1.0, 0.0, 0.1]), (110, [0.0, 1.0, 0.1])]
    out = {
        r.vec_id: r.keep
        for r in semdedup(
            _vecs(spark, base + clones), k=2, iterations=4, tau=0.999
        ).collect()
    }
    assert len(out) == 8
    assert out[100] == 0 and out[110] == 0  # clones lose to originals
    assert all(out[i] == 1 for i, _ in base)  # tau=0.999: only clones


def test_semdedup_keep_rule_is_smallest_id_per_group(spark):
    # three mutual near-dups in one cluster: only the smallest id kept
    rows = [
        (5, [1.0, 0.0]), (7, [1.0, 0.001]), (9, [0.999, 0.0]),
        (20, [0.0, 1.0]),
    ]
    out = {
        r.vec_id: r.keep
        for r in semdedup(_vecs(spark, rows), k=2, iterations=4, tau=0.99).collect()
    }
    assert out == {5: 1, 7: 0, 9: 0, 20: 1}
