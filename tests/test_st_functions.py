"""st_* column functions: pUDF wrappers over the kernels, exercised
through real Spark plans."""

from pyspark.sql import functions as F


def test_st_functions_roundtrip(spark):
    from geos_spark.functions.st import (
        st_area,
        st_asgeojson,
        st_astext,
        st_boundary,
        st_centroid_x,
        st_convexhull,
        st_densify,
        st_distance,
        st_geomfromgeojson,
        st_geomfromtext,
        st_issimple,
        st_isvalid,
        st_length,
        st_relate,
        st_simplify,
    )

    rows = [
        (1, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))",
            "POLYGON ((5 5, 15 5, 15 15, 5 15, 5 5))"),
        (2, "LINESTRING (0 0, 10 0, 10 10)", "POINT (5 0)"),
        (3, "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", "POINT (20 20)"),
    ]
    df = spark.createDataFrame(rows, "id long, wa string, wb string")
    g = df.withColumn("a", st_geomfromtext(F.col("wa"))).withColumn(
        "b", st_geomfromtext(F.col("wb"))
    )
    out = g.select(
        "id",
        st_area(F.col("a")).alias("area"),
        st_length(F.col("a")).alias("length"),
        st_centroid_x(F.col("a")).alias("cx"),
        st_issimple(F.col("a")).alias("simple"),
        st_isvalid(F.col("a")).alias("valid"),
        st_relate(F.col("a"), F.col("b")).alias("im"),
        st_distance(F.col("a"), F.col("b")).alias("dist"),
        st_astext(st_boundary(F.col("a"))).alias("bdy"),
        st_astext(st_convexhull(F.col("a"))).alias("hull"),
        st_astext(st_simplify(1.0)(F.col("a"))).alias("simp"),
        st_astext(st_densify(5.0)(F.col("a"))).alias("dens"),
        st_asgeojson(F.col("a")).alias("gj"),
    ).collect()
    r = {x.id: x for x in out}
    assert r[1].area == 100.0 and r[1].length == 40.0
    assert r[1].cx == 5.0
    assert r[1].simple and r[1].valid
    assert r[1].im == "212101212"  # overlapping squares
    assert r[2].im[0] == "0"  # point on line interior
    assert r[3].dist == ((20 - 4) ** 2 * 2) ** 0.5
    assert r[1].bdy.startswith("LINESTRING")
    assert "Polygon" in r[1].gj

    # geojson roundtrip through Spark
    back = (
        g.select(st_astext(st_geomfromgeojson(st_asgeojson(F.col("a")))).alias("w"))
        .collect()
    )
    assert back[0].w == rows[0][1]


def test_st_invalid_detection(spark):
    from geos_spark.functions.st import st_geomfromtext, st_isvalid, st_issimple

    df = spark.createDataFrame(
        [("POLYGON ((100 100, 100 200, 200 100, 200 200, 100 100))",)],
        "w string",
    )
    out = df.select(
        st_isvalid(st_geomfromtext(F.col("w"))).alias("v"),
        st_issimple(st_geomfromtext(F.col("w"))).alias("s"),
    ).collect()[0]
    assert not out.v and not out.s  # bowtie
