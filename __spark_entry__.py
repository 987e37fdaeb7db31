"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship point-in-polygon spatial join at sf0.001.
queries()     -> operator catalog (geos_spark.queries.QUERIES; 124 as
                 of round 5) — synthetic-table operators (joins,
                 tiling, kNN, clustering, coverage
                 validate/simplify/clean, dedup + the full near-dup
                 pipeline + paragraph dedup + exact duplicated-
                 substring removal (dedup_cut) + benchmark
                 decontamination, raster<->vector (rasterize +
                 polygonize-back, rasterize/raster_vectorize +
                 the block-decomposed raster_vectorize_tiled, zonal
                 statistics, overview pyramids),
                 corpus shaping (hash/stratified
                 sampling, source quota, boilerplate line removal,
                 URL canonicalization, PII redaction, Gopher/C4
                 quality filter, char entropy), lexical retrieval
                 (BM25, inverted index), web link graph
                 (anchor extraction, host PageRank — unweighted /
                 weighted / TrustRank-personalized / incremental
                 warm-start), ANN
                 (exact/LSH/matmul/IVF/IVF-PQ + the certified
                 IVF-PQ recall contract ann_pq_recall), the scored
                 banded-LSH near-dup scale path (embed_neardup_lsh),
                 text, html->text
                 extraction with the cross-engine byte-identity
                 oracle (pages_extract), Z/M ordinate surface
                 (geom_zm), SQL/MM curve measures, structural
                 accessors),
                 Structured-Streaming twins run to completion
                 (stream_dedup/tiles/sessions/first_seen/pip/quota/
                 ann/ppl/cut), plus the xmltester corpus promoted as xt_*
                 fixture queries (the corpus audit is CLOSED: every
                 case in general/misc/robust/issue/validate is
                 scored or in the 8-entry analysed SKIP list; the
                 failure/ directory holds cases the reference itself
                 fails and is excluded by that definition).
oracle_sql()  -> per-query DuckDB ANSI-SQL oracles (one per query;
                 the xt_* oracles are VALUES tables of the
                 reference's own XML/unit-test expectations).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: distributed ray-casting point-in-polygon join of
    deterministic doc-derived points against the star-polygon dim table
    (Hilbert-tile partitioned, envelope short-circuit, RayCrossingCounter
    as Catalyst higher-order functions — zero python in the hot path)."""
    from geos_spark.queries import q_pip_native

    return q_pip_native(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from geos_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from geos_spark.queries import ORACLES

    return dict(ORACLES)
