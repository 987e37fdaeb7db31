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
