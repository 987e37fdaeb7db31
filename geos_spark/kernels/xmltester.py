"""Loader for the reference's XML test-oracle corpus.

Parses ``tests/xmltester/tests/**.xml`` case files (format per
``tests/xmltester/tests/general/TestRelateAA.xml:3-17``; dispatch
semantics per ``tests/xmltester/XMLTester.cpp:1037-1060``) into plain
dicts usable by pytest and by the parquet fixture builder.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from dataclasses import dataclass


@dataclass
class OracleCase:
    case_id: str
    wkt_a: str
    wkt_b: str | None
    op: str
    args: list[str]
    expected: str
    pm_scale: float | None = None  # run-level <precisionModel scale=.../>


def load_cases(path: str) -> list[OracleCase]:
    txt = open(path, encoding="utf-8", errors="replace").read()
    # strip control chars some files contain
    txt = re.sub(r"[\x00-\x08\x0b\x0c\x0e-\x1f]", "", txt)
    root = ET.fromstring(txt)
    out: list[OracleCase] = []
    fname = path.rsplit("/", 1)[-1]
    pm_scale = None
    pm = root.find("precisionModel")
    if pm is not None and pm.attrib.get("scale"):
        pm_scale = float(pm.attrib["scale"])
    for ci, case in enumerate(root.iter("case")):
        a = case.find("a")
        b = case.find("b")
        wkt_a = a.text.strip() if a is not None and a.text else None
        wkt_b = b.text.strip() if b is not None and b.text else None
        for ti, test in enumerate(case.iter("test")):
            op = test.find("op")
            if op is None:
                continue
            name = op.attrib.get("name", "").lower()
            args = []
            for k in ("arg1", "arg2", "arg3", "arg4"):
                if k in op.attrib:
                    args.append(op.attrib[k])
            expected = (op.text or "").strip()
            out.append(
                OracleCase(
                    case_id=f"{fname}:{ci}:{ti}",
                    wkt_a=wkt_a,
                    wkt_b=wkt_b,
                    op=name,
                    args=args,
                    expected=expected,
                    pm_scale=pm_scale,
                )
            )
    return out


def parse_geom_text(s: str):
    """Parse a case geometry: WKT, or hex WKB (either byte order) —
    XMLTester::parseGeometry accepts both."""
    from geos_spark.kernels.wkb import parse_wkb
    from geos_spark.kernels.wkt import parse_wkt

    t = s.strip()
    if re.fullmatch(r"[0-9A-Fa-f]+", t) and len(t) % 2 == 0 and len(t) >= 10:
        return parse_wkb(bytes.fromhex(t))
    return parse_wkt(t)
