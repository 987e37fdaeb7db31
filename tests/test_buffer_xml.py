"""Buffer vs the xmltester corpus, using the reference's tolerance
matcher (BufferResultMatcher.cpp: relative symdiff area < 1e-3,
boundary discrete-Hausdorff < distance/100, densify 0.25).

The two large stress files (fme.xml, safe-TestBufferJagged.xml) are
exercised by the standalone harness, not per-commit pytest — each
runs minutes of corpus; the suites here cover every buffer semantics
path (round/mitre joins, negative distances, holes, multilines).
"""

import math

import numpy as np
import pytest

from geos_spark.kernels import overlay as OV
from geos_spark.kernels.buffer import buffer_geom
from geos_spark.kernels.dd import _point_to_segment
from geos_spark.kernels.scalars import geom_area, geom_boundary
from geos_spark.kernels.wkt import parse_wkt
from geos_spark.kernels.xmltester import load_cases

BASE = "/root/reference/tests/xmltester/tests"

SUITES = [
    "misc/Buffer-1.xml",
    "misc/Buffer-2.xml",
    "misc/hole_from_shell.xml",
    "misc/hole_red.xml",
]


def _bdy_segs(g):
    b = geom_boundary(g)
    segs = []
    for p in b.geoms():
        if p.type_id == 2 and len(p.data) > 1:
            c = p.data
            segs.append(np.hstack([c[:-1], c[1:]]))
    return np.concatenate(segs) if segs else np.zeros((0, 4))


def _densified(segs, frac=0.25):
    out = []
    n = int(1.0 / frac)
    for x1, y1, x2, y2 in segs:
        for i in range(n + 1):
            t = i * frac
            out.append((x1 + t * (x2 - x1), y1 + t * (y2 - y1)))
    return out


def _max_min_dist(pts, segs):
    if not len(pts):
        return 0.0
    if not len(segs):
        return math.inf
    worst = 0.0
    for p in pts:
        d = min(
            _point_to_segment(p, (s[0], s[1]), (s[2], s[3])) for s in segs
        )
        worst = max(worst, d)
    return worst


def buffer_match(actual, expected, dist) -> bool:
    """BufferResultMatcher::isBufferResultMatch."""
    if actual.is_empty and expected.is_empty:
        return True
    area = geom_area(expected)
    sym_area = geom_area(OV.overlay_robust(actual, expected, OV.SYMDIFFERENCE))
    if sym_area > 0.0:
        if area <= 0:
            return False
        if sym_area / area >= 1.0e-3:
            return False
    tol = max(abs(dist) / 100.0, 1e-8)
    sa = _bdy_segs(actual)
    se = _bdy_segs(expected)
    if len(sa) == 0 and len(se) == 0:
        return True
    return (
        max(
            _max_min_dist(_densified(sa), se),
            _max_min_dist(_densified(se), sa),
        )
        <= tol
    )


def _cases():
    for suite in SUITES:
        for c in load_cases(f"{BASE}/{suite}"):
            if c.op in ("buffer", "buffermitredjoin"):
                yield pytest.param(c, id=c.case_id + ":" + c.op)


@pytest.mark.parametrize("case", list(_cases()))
def test_buffer_oracle(case):
    g = parse_wkt(case.wkt_a)
    dist = float(case.args[1])
    qs = int(case.args[2]) if len(case.args) > 2 else 8
    join = "mitre" if case.op == "buffermitredjoin" else "round"
    got = buffer_geom(g, dist, quad_segs=qs, join=join)
    exp = parse_wkt(case.expected)
    assert buffer_match(got, exp, dist), case.case_id
