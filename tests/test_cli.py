"""Smoke tests for the geosop-style spark-submit driver (cli.main) —
the north rule's launch path. Runs main() in-process with parquet
inputs (spark-submit wraps exactly this entry point)."""

import json
import os

from pyspark.sql import functions as F

from geos_spark.sources.pages import with_doc_point


def _write_points(spark, path, n=2000):
    with_doc_point(
        spark.range(0, n, 1, 4).withColumnRenamed("id", "doc_id")
    ).select("doc_id", "x", "y").write.mode("overwrite").parquet(path)


def _write_polys(spark, path):
    from geos_spark.queries import star_polygons

    star_polygons(spark).write.mode("overwrite").parquet(path)


def test_cli_intersects_join(spark, tmp_path, capsys):
    from geos_spark.cli import main
    from geos_spark.operators.spatial_join import point_in_polygon_join
    from geos_spark.queries import star_polygons

    a = str(tmp_path / "pts")
    b = str(tmp_path / "polys")
    out = str(tmp_path / "out")
    _write_points(spark, a)
    _write_polys(spark, b)
    main(
        [
            "--op", "intersects", "--a", a, "--b", b, "--out", out,
            "--level", "6",
        ]
    )
    # one-line JSON timing summary (geosop -t analogue) on stdout
    lines = [
        ln for ln in capsys.readouterr().out.splitlines()
        if ln.startswith("{")
    ]
    summary = json.loads(lines[-1])
    assert summary["op"] == "intersects" and summary["rows"] > 0
    # output parquet matches the operator called directly
    got = spark.read.parquet(out)
    want = point_in_polygon_join(
        spark.read.parquet(a), star_polygons(spark), "intersects", level=6,
    )
    assert got.count() == summary["rows"] == want.count()


def test_cli_cell_assignment(spark, tmp_path, capsys):
    from geos_spark.cli import main

    a = str(tmp_path / "pts")
    out = str(tmp_path / "cells")
    _write_points(spark, a, n=500)
    main(["--op", "cell", "--a", a, "--out", out, "--level", "8"])
    got = spark.read.parquet(out)
    assert got.count() == 500
    assert "cell" in got.columns
    n_cells = 1 << 16  # level 8 => 4^8 cells
    bad = got.where((F.col("cell") < 0) | (F.col("cell") >= n_cells))
    assert bad.count() == 0
