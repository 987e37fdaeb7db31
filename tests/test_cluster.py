"""Connected components / DBSCAN operator tests.

Reference semantics: GEOSClusterGeometryDistance /
GEOSClusterDBSCAN (capi/geos_c.h.in:1914,1939) — components of the
within-eps graph, min-reachable-id labels, DBSCAN core/border/noise
per src/operation/cluster/DBSCANClusterFinder.cpp.
"""

import pytest
from pyspark.sql import functions as F

from geos_spark.operators.cluster import (
    cluster_dbscan,
    cluster_within_distance,
    connected_components,
)


def _labels(df):
    return {r["id"]: r["cluster"] for r in df.collect()}


def _ids(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def _pairs(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], "id_a long, id_b long"
    )


def test_cc_chain_and_singleton(spark):
    # chain 1-2-3-4-5, pair {10,11}, singleton 20
    out = _labels(
        connected_components(
            _ids(spark, [1, 2, 3, 4, 5, 10, 11, 20]),
            _pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)]),
        )
    )
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 20: 20}


def test_cc_forced_contraction_rounds(spark):
    # driver_cap=1 forces the contraction + unwind path on a long
    # chain (worst case for local collapse across partitions)
    n = 200
    ids = list(range(n))
    pairs = [(i, i + 1) for i in range(n - 1)]
    out = _labels(
        connected_components(
            _ids(spark, ids), _pairs(spark, pairs), driver_cap=1
        )
    )
    assert set(out.values()) == {0}
    assert len(out) == n


def test_cc_fallback_propagation(spark):
    # max_contractions=0 + cap below the edge count -> pointer-
    # doubling fallback must produce identical labels
    pairs = [(3, 7), (7, 9), (1, 2), (5, 5)]
    out = _labels(
        connected_components(
            _ids(spark, [1, 2, 3, 5, 7, 9]),
            _pairs(spark, pairs),
            driver_cap=0,
            max_contractions=0,
        )
    )
    assert out == {1: 1, 2: 1, 3: 3, 7: 3, 9: 3, 5: 5}


def test_cc_empty_pairs(spark):
    out = _labels(
        connected_components(_ids(spark, [4, 8]), _pairs(spark, []))
    )
    assert out == {4: 4, 8: 8}


def test_cc_min_label_survives_contraction(spark):
    # global min (0) sits at the END of a chain whose edges land in
    # different hash partitions; contraction must still label all 0
    pairs = [(0, 99), (99, 50), (50, 75), (75, 60)]
    out = _labels(
        connected_components(
            _ids(spark, [0, 50, 60, 75, 99]),
            _pairs(spark, pairs),
            driver_cap=1,
        )
    )
    assert set(out.values()) == {0}


@pytest.fixture(scope="module")
def grid_points(spark):
    # 3 separate blobs + 2 isolated points on a line
    rows = []
    rid = 0
    for bx in (0.0, 100.0, 200.0):
        for dx in range(4):
            for dy in range(4):
                rows.append((rid, bx + dx * 0.5, dy * 0.5))
                rid += 1
    rows.append((rid, 500.0, 500.0))
    rows.append((rid + 1, 600.0, 600.0))
    return spark.createDataFrame(rows, "id long, x double, y double")


def test_cluster_within_distance_blobs(grid_points):
    out = _labels(
        cluster_within_distance(
            grid_points, 0.75, level=5, extent=(0.0, 0.0, 1024.0, 1024.0)
        )
    )
    # blobs of 16 points each cluster to their min id
    assert [out[i] for i in range(16)] == [0] * 16
    assert [out[i] for i in range(16, 32)] == [16] * 16
    assert [out[i] for i in range(32, 48)] == [32] * 16
    assert out[48] == 48 and out[49] == 49


def test_dbscan_core_border_noise(spark):
    # line of 5 tight points (core), 1 border point, 1 noise point
    rows = [(i, float(i) * 0.1, 0.0) for i in range(5)]
    rows.append((5, 0.52, 0.0))  # within eps of cluster edge
    rows.append((6, 50.0, 50.0))  # noise
    df = spark.createDataFrame(rows, "id long, x double, y double")
    out = _labels(
        cluster_dbscan(
            df, 0.15, 3, level=5, extent=(0.0, 0.0, 1024.0, 1024.0)
        )
    )
    # endpoints 0 and 5 have only 2 neighbours incl. self -> border;
    # 1..4 are core and form one component labelled min core id = 1
    assert [out[i] for i in range(1, 5)] == [1, 1, 1, 1]
    assert out[0] == 1 and out[5] == 1  # borders adopt the core cluster
    assert out[6] is None  # noise
