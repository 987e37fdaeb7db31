"""Embedding-cosine near-dup: exact baseline vs banded-LSH scale path."""

import pytest
from pyspark.sql import functions as F

from geos_spark.operators.dedup import embedding_neardup_pairs


@pytest.fixture(scope="module")
def emb(spark):
    base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dupes = base.where(F.col("vec_id") % 10 == 0).withColumn(
        "vec_id", F.col("vec_id") + 100000
    )
    return base.unionByName(dupes)


def test_exact_finds_planted_clones(emb):
    out = embedding_neardup_pairs(emb, 0.9999).collect()
    pairs = {(r.a_id, r.b_id) for r in out}
    n_dupes = emb.where(F.col("vec_id") >= 100000).count()
    assert len(pairs) == n_dupes
    assert all(b - a == 100000 for a, b in pairs)
    assert all(abs(r.cos - 1.0) < 1e-12 for r in out)


def test_lsh_full_recall_on_clones(emb):
    """Exact duplicates have identical sign bits in every band, so
    the banded LSH must find ALL of them regardless of planes."""
    out = embedding_neardup_pairs(
        emb, 0.9999, n_planes=16, bands=4, dim=64
    ).collect()
    pairs = {(r.a_id, r.b_id) for r in out}
    n_dupes = emb.where(F.col("vec_id") >= 100000).count()
    assert len(pairs) == n_dupes


def test_lsh_subset_of_exact(emb):
    exact = {
        (r.a_id, r.b_id)
        for r in embedding_neardup_pairs(emb, 0.4).collect()
    }
    lsh = {
        (r.a_id, r.b_id)
        for r in embedding_neardup_pairs(
            emb, 0.4, n_planes=8, bands=4, dim=64
        ).collect()
    }
    assert lsh <= exact  # verification is exact: no false positives
    assert lsh  # and the candidates aren't empty


def test_lsh_scored_row_plan_is_band_equijoin(spark):
    """The scored catalog row (embed_neardup_lsh) must execute the
    scale plan: band-value equijoin candidates, NO cartesian/nested-
    loop self-join anywhere — that is the whole point of scoring the
    LSH path separately from the exact quadratic baseline."""
    from geos_spark.queries import QUERIES

    plan = QUERIES["embed_neardup_lsh"](
        spark, "/root/testdata/sf0.001"
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # and the exact baseline IS the quadratic ground truth
    exact_plan = QUERIES["embed_neardup"](
        spark, "/root/testdata/sf0.001"
    )._jdf.queryExecution().executedPlan().toString()
    assert (
        "CartesianProduct" in exact_plan
        or "BroadcastNestedLoopJoin" in exact_plan
    )


def test_lsh_scored_row_recall_bound(spark):
    """The pinned background-recall contract of the scored row, checked
    end-to-end on real data: every planted clone found (recall 1.0) and
    >= 0.6 of the exact near-threshold background pairs survive the
    banded plan (the oracle SQL enforces the same bound gate-side)."""
    from pyspark.sql import functions as F

    from geos_spark.operators.dedup import embedding_neardup_pairs
    from geos_spark.queries import QUERIES

    sf = "/root/testdata/sf0.01"
    found = {
        (r.a_id, r.b_id)
        for r in QUERIES["embed_neardup_lsh"](spark, sf).collect()
    }
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    dupes = emb.where(F.col("vec_id") % 10 == 0).withColumn(
        "vec_id", F.col("vec_id") + 100000
    )
    exact = {
        (r.a_id, r.b_id)
        for r in embedding_neardup_pairs(
            emb.unionByName(dupes), 0.454
        ).collect()
    }
    clones = {p for p in exact if p[1] == p[0] + 100000 and p[0] % 10 == 0}
    bg = exact - clones
    assert clones <= found  # clone recall 1.0
    assert found <= exact  # exact verify: no false positives
    assert len(found & bg) >= 0.6 * len(bg)
