"""buildArea / makeValid vs the xmltester golden corpus
(misc/buildarea.xml, misc/makevalid.xml — exact normalized compare).

Full parity.  The two historic misses were recovered by:
- the chain-granularity PolygonizeGraph (nodes at linestring
  endpoints only) + the faithful findEdgeRingContaining hole test
  (buildarea.xml:7:0, self-touching rings);
- honoring the run-level FIXED precisionModel: OverlayNGRobust
  dispatches to fixed-PM snap-rounding when the input factory
  carries one (OverlayNGRobust.cpp:96-100), so every overlay inside
  MakeValid/BuildArea rounds to the file's grid (makevalid.xml:13:0,
  scale=10).
"""

import pytest

from geos_spark.kernels.geom import geoms_equal_normalized
from geos_spark.kernels.polygonize import build_area, make_valid
from geos_spark.kernels.wkt import parse_wkt
from geos_spark.kernels.xmltester import load_cases

BASE = "/root/reference/tests/xmltester/tests/misc"

KNOWN_MISSES: set = set()


def _cases():
    for f in ("buildarea.xml", "makevalid.xml"):
        for c in load_cases(f"{BASE}/{f}"):
            if c.op in ("buildarea", "makevalid"):
                marks = (
                    [pytest.mark.xfail(reason="nested-face pairing")]
                    if c.case_id in KNOWN_MISSES
                    else []
                )
                yield pytest.param(c, id=c.case_id + ":" + c.op, marks=marks)


@pytest.mark.parametrize("case", list(_cases()))
def test_buildarea_makevalid(case):
    g = parse_wkt(case.wkt_a)
    got = (
        build_area(g, case.pm_scale)
        if case.op == "buildarea"
        else make_valid(g, case.pm_scale)
    )
    exp = parse_wkt(case.expected)
    assert geoms_equal_normalized(got, exp), case.case_id
