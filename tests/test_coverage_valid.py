"""Coverage validation vs the reference unit suites, extracted at
test time from tests/unit/coverage/CoverageValidatorTest.cpp and
CoveragePolygonValidatorTest.cpp."""

import re

import pytest

from geos_spark.fixtures import canon_wkt
from geos_spark.kernels.coverage_valid import (
    validate_coverage,
    validate_coverage_polygon,
)
from geos_spark.kernels.xmltester import parse_geom_text as P

_REF = "/root/reference/tests/unit/coverage"


def _bodies(path):
    src = open(path).read()
    parts = re.split(r"void object::test<\d+> \(\)", src)
    return parts[1:]


def _strings(arg_src):
    # join C++ adjacent-literal concatenation
    out = []
    for chunk in re.split(r",(?=(?:[^\"]*\"[^\"]*\")*[^\"]*$)", arg_src):
        lits = re.findall(r'"((?:[^"\\]|\\.)*)"', chunk)
        if lits:
            out.append("".join(lits))
    return out


def _validator_cases():
    cases = []
    for body in _bodies(f"{_REF}/CoverageValidatorTest.cpp"):
        vecs = {}
        for m in re.finditer(
            r"std::vector<std::string>\s+(\w+)\s*\{(.*?)\};", body, re.S
        ):
            vecs[m.group(1)] = _strings(m.group(2))
        for m in re.finditer(
            r"(checkInvalidWithGaps|checkInvalid|checkValid)\s*\(([^;]*)\);",
            body,
            re.S,
        ):
            fn, args = m.group(1), m.group(2)
            names = re.findall(r"\b(\w+)\b", args)
            cov = vecs.get("coverage", [])
            if fn == "checkValid":
                cases.append((cov, 0.0, [None] * len(cov)))
            elif fn == "checkInvalid":
                cases.append((cov, 0.0, vecs.get("expected", [])))
            else:
                gap = float(re.search(r"([\d.]+),\s*expected", args).group(1))
                cases.append((cov, gap, vecs.get("expected", [])))
    return cases


def _polygon_cases():
    cases = []
    for body in _bodies(f"{_REF}/CoveragePolygonValidatorTest.cpp"):
        for m in re.finditer(
            r"(checkInvalidGap|checkInvalid|checkValid)\s*\(([^;]*)\);",
            body,
            re.S,
        ):
            fn, args = m.group(1), m.group(2)
            lits = _strings(args)
            if fn == "checkValid":
                cases.append((lits[0], lits[1], 0.0, None))
            elif fn == "checkInvalid":
                cases.append((lits[0], lits[1], 0.0, lits[2]))
            else:
                gap = float(
                    re.search(r",\s*([\d.eE+-]+)\s*,\s*\"", args).group(1)
                )
                cases.append((lits[0], lits[1], gap, lits[2]))
    return cases


_V_CASES = _validator_cases()
_P_CASES = _polygon_cases()


def test_corpus_extracted():
    assert len(_V_CASES) >= 12
    assert len(_P_CASES) >= 24


@pytest.mark.parametrize("i", range(len(_V_CASES)))
def test_coverage_validator_case(i):
    cov, gap, expected = _V_CASES[i]
    res = validate_coverage([P(w) for w in cov], gap)
    assert len(res) == len(expected)
    for got, exp in zip(res, expected):
        if exp == "":  # reference readList: empty string = null = valid
            exp = None
        if exp is None:
            assert got is None, canon_wkt(got)
        else:
            eg = P(exp)
            if got is None:
                assert eg.is_empty, exp
            else:
                assert canon_wkt(got) == canon_wkt(eg)


@pytest.mark.parametrize("i", range(len(_P_CASES)))
def test_coverage_polygon_validator_case(i):
    tgt, adj, gap, expected = _P_CASES[i]
    from geos_spark.kernels import geom as G

    adj_geom = P(adj)
    adj_parts = [
        G.Geom(G.POLYGON, p.data)
        for p in adj_geom.geoms()
        if p.type_id == G.POLYGON and p.data
    ]
    got = validate_coverage_polygon(P(tgt), adj_parts, gap)
    if expected is None:
        assert got is None, canon_wkt(got)
    else:
        eg = P(expected)
        if got is None:
            assert eg.is_empty, expected
        else:
            assert canon_wkt(got) == canon_wkt(eg)


def test_coverage_validate_operator(spark):
    """Distributed operator: valid 2x2 grid + one duplicated member
    -> both copies fully invalid, neighbours stay valid."""
    from pyspark.sql import functions as F

    from geos_spark.functions import st
    from geos_spark.operators.coverage import coverage_validate

    rows = []
    mid = 0
    for gx in range(2):
        for gy in range(2):
            x0, y0 = gx * 10.0, gy * 10.0
            wkt = (
                f"POLYGON (({x0} {y0}, {x0 + 10} {y0}, {x0 + 10} "
                f"{y0 + 10}, {x0} {y0 + 10}, {x0} {y0}))"
            )
            rows.append((mid, wkt))
            mid += 1
    rows.append((99, rows[0][1]))  # duplicate of member 0
    df = spark.createDataFrame(rows, "id long, wkt string").select(
        "id", st.st_geomfromtext("wkt").alias("wkb")
    )
    out = {
        r["id"]: (r["is_valid"], r["invalid_wkb"])
        for r in coverage_validate(
            df, level=4, extent=(0.0, 0.0, 1024.0, 1024.0)
        ).collect()
    }
    assert out[0][0] is False and out[99][0] is False
    assert out[1][0] and out[2][0] and out[3][0]
    assert out[0][1] is not None and out[1][1] is None


def test_st_coverage_isvalid(spark):
    from pyspark.sql import functions as F

    from geos_spark.functions import st

    good = (
        "GEOMETRYCOLLECTION (POLYGON ((0 0, 5 0, 5 5, 0 5, 0 0)), "
        "POLYGON ((5 0, 10 0, 10 5, 5 5, 5 0)))"
    )
    bad = (
        "GEOMETRYCOLLECTION (POLYGON ((1 9, 6 9, 6 4, 1 4, 1 9)), "
        "POLYGON ((9 1, 4 1, 4 6, 9 6, 9 1)))"
    )
    df = spark.createDataFrame([(good,), (bad,)], ["wkt"]).select(
        st.st_geomfromtext("wkt").alias("g")
    )
    vals = df.select(
        st.st_coverageisvalid()(F.col("g")).alias("v"),
        st.st_astext(st.st_coverageinvalidedges()(F.col("g"))).alias("e"),
    ).collect()
    assert vals[0]["v"] is True
    assert "EMPTY" in vals[0]["e"]  # no invalid linework anywhere
    assert vals[1]["v"] is False
    assert "LINESTRING" in vals[1]["e"].replace("MULTILINESTRING EMPTY", "")
