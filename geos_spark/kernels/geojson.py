"""GeoJSON codec (RFC 7946), mirroring the reference's
GeoJSONReader/GeoJSONWriter surface (``src/io/GeoJSONWriter.cpp``,
capi ``geos_c.h.in:6378-6454``): geometry-only, Feature /
FeatureCollection unwrapped to their geometries on read.
"""

from __future__ import annotations

import json

import numpy as np

from geos_spark.kernels import geom as G

_NAME_BY_TYPE = {
    G.POINT: "Point",
    G.LINESTRING: "LineString",
    G.POLYGON: "Polygon",
    G.MULTIPOINT: "MultiPoint",
    G.MULTILINESTRING: "MultiLineString",
    G.MULTIPOLYGON: "MultiPolygon",
    G.GEOMETRYCOLLECTION: "GeometryCollection",
}
_TYPE_BY_NAME = {v: k for k, v in _NAME_BY_TYPE.items()}


def geom_to_geojson(g: G.Geom) -> str:
    return json.dumps(_to_obj(g), separators=(",", ":"))


def _coords(arr: np.ndarray) -> list:
    return [[float(x), float(y)] for x, y in arr]


def _to_obj(g: G.Geom) -> dict:
    t = _NAME_BY_TYPE[g.type_id]
    if g.type_id == G.POINT:
        c = [] if g.is_empty else [float(g.data[0, 0]), float(g.data[0, 1])]
        return {"type": t, "coordinates": c}
    if g.type_id == G.LINESTRING:
        return {"type": t, "coordinates": _coords(g.data)}
    if g.type_id == G.POLYGON:
        return {"type": t, "coordinates": [_coords(r) for r in g.data]}
    if g.type_id == G.MULTIPOINT:
        return {
            "type": t,
            "coordinates": [
                [float(p.data[0, 0]), float(p.data[0, 1])]
                for p in g.data
                if not p.is_empty
            ],
        }
    if g.type_id == G.MULTILINESTRING:
        return {"type": t, "coordinates": [_coords(p.data) for p in g.data]}
    if g.type_id == G.MULTIPOLYGON:
        return {
            "type": t,
            "coordinates": [[_coords(r) for r in p.data] for p in g.data],
        }
    return {"type": t, "geometries": [_to_obj(p) for p in g.data]}


def geojson_to_geom(s: str | dict) -> G.Geom:
    obj = json.loads(s) if isinstance(s, str) else s
    t = obj.get("type")
    if t == "Feature":
        return geojson_to_geom(obj["geometry"])
    if t == "FeatureCollection":
        return G.Geom(
            G.GEOMETRYCOLLECTION,
            [geojson_to_geom(f["geometry"]) for f in obj["features"]],
        )
    if t == "GeometryCollection":
        return G.Geom(
            G.GEOMETRYCOLLECTION,
            [geojson_to_geom(x) for x in obj["geometries"]],
        )
    tid = _TYPE_BY_NAME[t]
    c = obj["coordinates"]
    if tid == G.POINT:
        if not c:
            return G.Geom.empty(G.POINT)
        return G.Geom.point(float(c[0]), float(c[1]))
    if tid == G.LINESTRING:
        return G.Geom.linestring([p[:2] for p in c])
    if tid == G.POLYGON:
        return G.Geom(
            G.POLYGON,
            [np.asarray([p[:2] for p in r], dtype=np.float64) for r in c],
        )
    if tid == G.MULTIPOINT:
        return G.Geom(
            G.MULTIPOINT, [G.Geom.point(float(p[0]), float(p[1])) for p in c]
        )
    if tid == G.MULTILINESTRING:
        return G.Geom(
            G.MULTILINESTRING,
            [G.Geom.linestring([p[:2] for p in line]) for line in c],
        )
    if tid == G.MULTIPOLYGON:
        return G.Geom(
            G.MULTIPOLYGON,
            [
                G.Geom(
                    G.POLYGON,
                    [np.asarray([p[:2] for p in r], dtype=np.float64) for r in poly],
                )
                for poly in c
            ],
        )
    raise ValueError(f"unsupported GeoJSON type {t!r}")
