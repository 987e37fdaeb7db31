"""GeoJSON codec (RFC 7946), mirroring the reference's
GeoJSONReader/GeoJSONWriter surface (``src/io/GeoJSONWriter.cpp``,
capi ``geos_c.h.in:6378-6454``): geometry-only, Feature /
FeatureCollection unwrapped to their geometries on read. The Z
ordinate round-trips as the third array element — written only where
present and non-NaN (``GeoJSONWriter::convertCoordinate``,
GeoJSONWriter.cpp:327-333); RFC 7946 has no M channel.
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


def _coords(arr: np.ndarray, zs=None) -> list:
    if zs is None:
        return [[float(x), float(y)] for x, y in arr]
    return [
        [float(arr[i, 0]), float(arr[i, 1])]
        if np.isnan(zs[i])
        else [float(arr[i, 0]), float(arr[i, 1]), float(zs[i])]
        for i in range(len(arr))
    ]


def _point_coords(p: G.Geom) -> list:
    if p.is_empty:
        return []
    c = [float(p.data[0, 0]), float(p.data[0, 1])]
    if p.zs is not None and not np.isnan(p.zs[0]):
        c.append(float(p.zs[0]))
    return c


def _to_obj(g: G.Geom) -> dict:
    t = _NAME_BY_TYPE[g.type_id]
    if g.type_id == G.POINT:
        return {"type": t, "coordinates": _point_coords(g)}
    if g.type_id == G.LINESTRING:
        return {"type": t, "coordinates": _coords(g.data, g.zs)}
    if g.type_id == G.POLYGON:
        zl = g.zs if g.zs is not None else [None] * len(g.data)
        return {
            "type": t,
            "coordinates": [
                _coords(r, z) for r, z in zip(g.data, zl)
            ],
        }
    if g.type_id == G.MULTIPOINT:
        return {
            "type": t,
            "coordinates": [
                _point_coords(p) for p in g.data if not p.is_empty
            ],
        }
    if g.type_id == G.MULTILINESTRING:
        return {
            "type": t,
            "coordinates": [_coords(p.data, p.zs) for p in g.data],
        }
    if g.type_id == G.MULTIPOLYGON:
        return {
            "type": t,
            "coordinates": [
                [
                    _coords(r, z)
                    for r, z in zip(
                        p.data,
                        p.zs if p.zs is not None else [None] * len(p.data),
                    )
                ]
                for p in g.data
            ],
        }
    return {"type": t, "geometries": [_to_obj(p) for p in g.data]}


def _seq(rows) -> tuple[np.ndarray, np.ndarray | None]:
    """Coordinate array rows -> (coords(k,2), zs|None). A third element
    anywhere in the sequence declares Z (GeoJSONReader::readCoordinate,
    missing thirds fill NaN)."""
    coords = np.asarray(
        [[float(p[0]), float(p[1])] for p in rows], dtype=np.float64
    ).reshape(-1, 2)
    if any(len(p) > 2 for p in rows):
        zs = np.array(
            [float(p[2]) if len(p) > 2 else np.nan for p in rows],
            dtype=np.float64,
        )
        return coords, zs
    return coords, None


def _mk_point(p) -> G.Geom:
    g = G.Geom.point(float(p[0]), float(p[1]))
    if len(p) > 2:
        g.zs = np.array([float(p[2])], dtype=np.float64)
    return g


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
        return _mk_point(c)
    if tid == G.LINESTRING:
        coords, zs = _seq(c)
        return G.Geom(G.LINESTRING, coords, zs=zs)
    if tid == G.POLYGON:
        rings = [_seq(r) for r in c]
        any_z = any(z is not None for _, z in rings)
        return G.Geom(
            G.POLYGON,
            [r for r, _ in rings],
            zs=[
                z if z is not None else np.full(len(r), np.nan)
                for r, z in rings
            ]
            if any_z
            else None,
        )
    if tid == G.MULTIPOINT:
        return G.Geom(G.MULTIPOINT, [_mk_point(p) for p in c])
    if tid == G.MULTILINESTRING:
        parts = []
        for line in c:
            coords, zs = _seq(line)
            parts.append(G.Geom(G.LINESTRING, coords, zs=zs))
        return G.Geom(G.MULTILINESTRING, parts)
    if tid == G.MULTIPOLYGON:
        parts = []
        for poly in c:
            rings = [_seq(r) for r in poly]
            any_z = any(z is not None for _, z in rings)
            parts.append(
                G.Geom(
                    G.POLYGON,
                    [r for r, _ in rings],
                    zs=[
                        z if z is not None else np.full(len(r), np.nan)
                        for r, z in rings
                    ]
                    if any_z
                    else None,
                )
            )
        return G.Geom(G.MULTIPOLYGON, parts)
    raise ValueError(f"unsupported GeoJSON type {t!r}")
