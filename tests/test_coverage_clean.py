"""Coverage cleaning vs the reference unit suite, extracted at test
time from tests/unit/coverage/CoverageCleanerTest.cpp."""

import re

import pytest

from geos_spark.fixtures import canon_wkt
from geos_spark.kernels.coverage_clean import (
    MERGE_LONGEST_BORDER,
    coverage_clean,
)
from geos_spark.kernels.coverage_valid import validate_coverage
from geos_spark.kernels.valid import is_valid
from geos_spark.kernels.wkt import write_wkt
from geos_spark.kernels.xmltester import parse_geom_text as P

_SRC = "/root/reference/tests/unit/coverage/CoverageCleanerTest.cpp"


def _strings(s):
    return re.findall(r'"((?:[^"\\]|\\.)*)"', s)


def _split_args(args):
    """Split top-level call args on commas outside quotes/braces."""
    out = []
    depth = 0
    q = False
    cur = ""
    for ch in args:
        if ch == '"':
            q = not q
        if not q:
            if ch in "({":
                depth += 1
            elif ch in ")}":
                depth -= 1
            if ch == "," and depth == 0:
                out.append(cur)
                cur = ""
                continue
        cur += ch
    if cur.strip():
        out.append(cur)
    return out


def _cases():
    src = open(_SRC).read()
    # file-scope string variables
    gvars = {
        m.group(1): "".join(_strings(m.group(2)))
        for m in re.finditer(
            r"std::string\s+(\w+)\s*=\s*((?:\s*\"(?:[^\"\\]|\\.)*\")+)\s*;",
            src,
        )
    }
    bodies = re.split(r"void object::test<\d+>\s*\(\)", src)[1:]
    cases = []
    for body in bodies:
        for m in re.finditer(
            r"(checkCleanSnap|checkCleanGapWidth|checkCleanOverlapMerge|"
            r"checkClean)\s*\(((?:[^;])*?)\);",
            body,
            re.S,
        ):
            fn = m.group(1)
            parts = _split_args(m.group(2))

            def arr(tok):
                tok = tok.strip()
                if tok.startswith("{"):
                    return _strings(tok)
                if tok in gvars:
                    gc = P(gvars[tok])
                    return [write_wkt(p) for p in gc.data]
                lits = _strings(tok)
                if lits:
                    gc = P("".join(lits))
                    return [write_wkt(p) for p in gc.data]
                return None

            if fn == "checkClean":
                cases.append(
                    ("clean", arr(parts[0]), None, None, arr(parts[1]))
                )
            elif fn == "checkCleanSnap":
                exp = arr(parts[2]) if len(parts) > 2 else None
                cases.append(
                    ("snap", arr(parts[0]), float(parts[1]), None, exp)
                )
            elif fn == "checkCleanGapWidth":
                cases.append(
                    (
                        "gap",
                        arr(parts[0]),
                        None,
                        float(parts[1]),
                        arr(parts[2]),
                    )
                )
            else:  # checkCleanOverlapMerge
                strat = parts[1].strip().rsplit("::", 1)[-1]
                cases.append(
                    ("overlap", arr(parts[0]), strat, None, arr(parts[2]))
                )
    return cases


_CASES = _cases()


def test_corpus_extracted():
    assert len(_CASES) >= 16


@pytest.mark.parametrize("i", range(len(_CASES)))
def test_coverage_clean_case(i):
    kind, cov_wkts, p1, p2, exp = _CASES[i]
    cov = [P(w) for w in cov_wkts]
    if kind == "clean":
        out = coverage_clean(cov, gap_maximum_width=0.0)
    elif kind == "snap":
        out = coverage_clean(cov, snapping_distance=p1)
    elif kind == "gap":
        out = coverage_clean(cov, gap_maximum_width=p2)
    else:
        strat = {
            "MERGE_LONGEST_BORDER": 0,
            "MERGE_MAX_AREA": 1,
            "MERGE_MIN_AREA": 2,
            "MERGE_MIN_INDEX": 3,
        }[p1]
        out = coverage_clean(
            cov, snapping_distance=-1.0, overlap_merge_strategy=strat
        )
    # the result must always be a valid coverage of valid polygons
    kept = [g for g in out if g is not None]
    for g in kept:
        assert is_valid(g), write_wkt(g)
    res = validate_coverage(kept, 0.0)
    assert all(r is None for r in res), "clean result not a valid coverage"
    if exp is not None:
        assert len(out) == len(exp)
        for got, ew in zip(out, exp):
            want = P(ew)
            if got is None:
                assert want.is_empty, (i, ew)
            else:
                assert canon_wkt(got) == canon_wkt(want), (
                    f"case {i} ({kind}):\n got {write_wkt(got)}\n"
                    f"want {ew}"
                )
