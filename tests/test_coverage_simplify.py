"""Coverage TPVW simplification vs the reference unit suite,
extracted at test time from
tests/unit/coverage/CoverageSimplifierTest.cpp."""

import re

import pytest

from geos_spark.kernels.coverage_simplify import coverage_simplify
from geos_spark.kernels.geom import geoms_equal_normalized
from geos_spark.kernels.wkt import write_wkt
from geos_spark.kernels.xmltester import parse_geom_text as P

_SRC = "/root/reference/tests/unit/coverage/CoverageSimplifierTest.cpp"


def _strings(s):
    return re.findall(r'"((?:[^"\\]|\\.)*)"', s)


def _cases():
    src = open(_SRC).read()
    bodies = re.split(r"void object::test<\d+> \(\)", src)[1:]
    cases = []
    for body in bodies:
        m = re.search(
            r"(checkNoop|checkResultInner|checkResult)\s*\(\s*"
            r"readArray\(\{(.*?)\}\)\s*(?:,\s*([\d.eE+-]+)\s*,\s*"
            r"readArray\(\{(.*?)\}\))?\s*\);",
            body,
            re.S,
        )
        if not m:
            continue
        fn = m.group(1)
        inp = _strings(m.group(2))
        if fn == "checkNoop":
            cases.append(("noop", inp, 0.0, inp))
        else:
            tol = float(m.group(3))
            exp = _strings(m.group(4))
            cases.append(
                ("inner" if fn == "checkResultInner" else "full", inp, tol, exp)
            )
    return cases


_CASES = _cases()


def test_corpus_extracted():
    assert len(_CASES) >= 20


@pytest.mark.parametrize("i", range(len(_CASES)))
def test_coverage_simplify_case(i):
    mode, inp, tol, exp = _CASES[i]
    geoms = [P(w) for w in inp]
    out = coverage_simplify(geoms, tol, inner_only=(mode == "inner"))
    assert len(out) == len(exp)
    for got, ew in zip(out, exp):
        want = P(ew)
        assert geoms_equal_normalized(got, want, 0.0), (
            f"case {i} ({mode}, tol={tol}):\n got {write_wkt(got)}\n"
            f"want {ew}"
        )


def test_st_coveragesimplify(spark):
    from pyspark.sql import functions as F

    from geos_spark.functions import st

    # two squares sharing an edge, redundant midpoints everywhere
    gc = (
        "GEOMETRYCOLLECTION ("
        "POLYGON ((0 0, 5 0, 10 0, 10 5, 10 10, 5 10, 0 10, 0 5, 0 0)), "
        "POLYGON ((10 0, 15 0, 20 0, 20 5, 20 10, 15 10, 10 10, 10 5, 10 0)))"
    )
    df = spark.createDataFrame([(gc,)], ["wkt"]).select(
        st.st_geomfromtext("wkt").alias("g")
    )
    out = df.select(
        st.st_astext(st.st_coveragesimplify(1.0)(F.col("g"))).alias("t")
    ).collect()[0]["t"]
    # all collinear midpoints removed; shared edge identical in both
    assert "5 0" not in out and "10 5" not in out and "15 0" not in out
    assert "POLYGON" in out


def test_partitioned_matches_global_away_from_seams(spark):
    """Partitioned simplify equals the global kernel for members whose
    edges never touch a partition seam."""
    import numpy as np

    from geos_spark.functions import st
    from geos_spark.kernels.wkb import parse_wkb
    from geos_spark.kernels.coverage_simplify import coverage_simplify
    from geos_spark.kernels.xmltester import parse_geom_text as P
    from geos_spark.operators.coverage import coverage_simplify_partitioned

    # 2x2 rect block fully inside one level-2 partition (tile 256)
    wkts = []
    for gx in range(2):
        for gy in range(2):
            x0, y0 = 10.0 + 20 * gx, 10.0 + 20 * gy
            x1, y1 = x0 + 20, y0 + 20
            xm, ym = x0 + 10, y0 + 10
            wkts.append(
                f"POLYGON (({x0} {y0}, {xm} {y0}, {x1} {y0}, {x1} {ym},"
                f" {x1} {y1}, {xm} {y1}, {x0} {y1}, {x0} {ym}, {x0} {y0}))"
            )
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(wkts)], "id long, wkt string"
    ).select("id", st.st_geomfromtext("wkt").alias("wkb"))
    got = {
        r["id"]: parse_wkb(bytes(r["simplified_wkb"]))
        for r in coverage_simplify_partitioned(
            df, 1.0, level=2, extent=(0.0, 0.0, 1024.0, 1024.0)
        ).collect()
    }
    want = coverage_simplify([P(w) for w in wkts], 1.0)
    for i, wg in enumerate(want):
        assert np.array_equal(got[i].data[0], wg.data[0]), i
