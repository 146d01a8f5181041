"""Shapefile .prj sidecar: ESRI WKT1 CRS parser → engine datum/projection
parameters (SURVEY.md §2.1 S16 bundle surface, §2.8 geo scalars).

Capability parity: the reference gets CRS handling free from pyproj/GDAL —
``geopandas.read_file`` attaches the .prj CRS and demeter reprojects with it
(e.g. demeter/raster/reprojection.py). Here the WKT1 grammar (public OGC
01-009 / ESRI dialect) is parsed with a ~40-line recursive-descent reader,
and the CRS is resolved to the parameter sets the engine's closed-form warp
kernels consume (reproject.lonlat_to_tm_ell / lonlat_to_albers_ell /
lonlat_to_lcc_ell): projection kind, central meridian / parallels, scale,
false easting/northing (returned for the caller's affine composition — the
kernels emit natural-origin meters), spheroid (a, 1/f), and the EPSG code
when an AUTHORITY node names one.

Driver-side metadata only — a .prj is a few hundred bytes per bundle; the
parse never touches the row path.
"""

from __future__ import annotations

import re

# projections the engine warps natively (normalized ESRI/OGC names)
_PROJ_KINDS = {
    "transverse_mercator": "tm",
    "albers": "albers",
    "albers_conic_equal_area": "albers",
    "lambert_conformal_conic": "lcc",
    "lambert_conformal_conic_2sp": "lcc",
}

_TOKEN = re.compile(r'\s*(?:("(?:[^"]|"")*")|([A-Za-z_][A-Za-z0-9_]*)|'
                    r"([-+]?\d+\.?\d*(?:[eE][-+]?\d+)?)|([\[\],]))")


def tokenize(text: str) -> list[str]:
    out, pos, n = [], 0, len(text)
    while True:
        while pos < n and text[pos].isspace():
            pos += 1
        if pos >= n:
            return out
        m = _TOKEN.match(text, pos)
        if not m or m.end() == pos:
            raise ValueError(f"bad WKT at offset {pos}: {text[pos:pos+20]!r}")
        out.append(m.group(0).strip())
        pos = m.end()


def parse_wkt(text: str):
    """WKT1 -> nested (keyword, [args...]) tuples; strings unquoted, numbers
    as float. Fails loudly on unbalanced brackets / trailing garbage."""
    toks = tokenize(text)
    pos = 0

    def node():
        nonlocal pos
        kw = toks[pos]
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", kw):
            raise ValueError(f"expected keyword, got {kw!r}")
        pos += 1
        if pos >= len(toks) or toks[pos] != "[":
            raise ValueError(f"{kw}: expected '['")
        pos += 1
        args = []
        while True:
            t = toks[pos]
            if t == "]":
                pos += 1
                return (kw.upper(), args)
            if t == ",":
                pos += 1
                continue
            if t.startswith('"'):
                args.append(t[1:-1].replace('""', '"'))
                pos += 1
            elif re.fullmatch(r"[-+]?\d+\.?\d*(?:[eE][-+]?\d+)?", t):
                args.append(float(t))
                pos += 1
            else:
                args.append(node())

    root = node()
    if pos != len(toks):
        raise ValueError(f"trailing WKT tokens: {toks[pos:]}")
    return root


def _find(args, kw):
    return [a for a in args if isinstance(a, tuple) and a[0] == kw]


def _authority(args):
    for auth in _find(args, "AUTHORITY"):
        name, code = auth[1][0], auth[1][1]
        if str(name).upper() == "EPSG":
            return int(float(code))
    return None


def crs_info(text: str) -> dict:
    """.prj text -> {kind, name, epsg, a, inv_f, unit_m, projection, params}.

    ``kind`` is 'geographic' or 'projected'; ``params`` holds the PARAMETER
    nodes lowercased with values in the CRS's declared linear unit;
    ``unit_m`` is that unit's meter factor (ESRI state-plane feet bundles
    carry 0.3048006...); ``projection`` is the normalized engine kind
    ('tm' | 'albers' | 'lcc') or the raw lowercased name if the engine has
    no native kernel for it."""
    kw, args = parse_wkt(text)
    if kw == "GEOGCS":
        geog, proj_args = (kw, args), None
    elif kw == "PROJCS":
        g = _find(args, "GEOGCS")
        if not g:
            raise ValueError("PROJCS without GEOGCS")
        geog, proj_args = g[0], args
    else:
        raise ValueError(f"unsupported CRS root {kw}")

    datums = _find(geog[1], "DATUM")
    if not datums:
        raise ValueError("CRS without DATUM")
    sph = _find(datums[0][1], "SPHEROID")
    if not sph:
        raise ValueError("DATUM without SPHEROID")
    a, inv_f = float(sph[0][1][1]), float(sph[0][1][2])

    out = {
        "kind": "geographic" if proj_args is None else "projected",
        "name": args[0],
        "a": a,
        "inv_f": inv_f,
        "epsg": _authority(args),
        "unit_m": 1.0,
        "projection": None,
        "params": {},
    }
    if proj_args is None:
        return out

    projs = _find(proj_args, "PROJECTION")
    if not projs:
        raise ValueError("PROJCS without PROJECTION")
    raw = str(projs[0][1][0]).lower()
    out["projection"] = _PROJ_KINDS.get(raw, raw)
    for p in _find(proj_args, "PARAMETER"):
        out["params"][str(p[1][0]).lower()] = float(p[1][1])
    units = _find(proj_args, "UNIT")
    if units:
        out["unit_m"] = float(units[0][1][1])
    return out


def to_engine(text: str) -> dict:
    """.prj text -> the kwargs of the matching engine warp kernel plus the
    false-origin shift (meters) for affine composition:

    - tm     -> {lon0, k0, lat0} for reproject.lonlat_to_tm_ell
    - albers -> {lat1, lat2, lat0, lon0} for reproject.lonlat_to_albers_ell
    - lcc    -> {lat1, lat2, lat0, lon0} for reproject.lonlat_to_lcc_ell
    plus {a, inv_f, false_easting, false_northing, epsg}. Raises on
    projections the engine has no native kernel for (fail loudly, the
    codec-family contract)."""
    c = crs_info(text)
    if c["kind"] == "geographic":
        return {"projection": None, "a": c["a"], "inv_f": c["inv_f"], "epsg": c["epsg"]}
    p, u = c["params"], c["unit_m"]
    if c["projection"] not in ("tm", "albers", "lcc"):
        raise ValueError(f"no native kernel for projection {c['projection']!r}")
    out = {
        "projection": c["projection"],
        "a": c["a"],
        "inv_f": c["inv_f"],
        "epsg": c["epsg"],
        "false_easting": p.get("false_easting", 0.0) * u,
        "false_northing": p.get("false_northing", 0.0) * u,
        "lon0": p.get("central_meridian", p.get("longitude_of_center", 0.0)),
        "lat0": p.get(
            "latitude_of_origin", p.get("latitude_of_center", 0.0)
        ),
    }
    if c["projection"] == "tm":
        out["k0"] = p.get("scale_factor", 1.0)
    else:
        if "standard_parallel_1" not in p:
            raise ValueError(f"{c['projection']} without standard parallels")
        out["lat1"] = p["standard_parallel_1"]
        out["lat2"] = p.get("standard_parallel_2", p["standard_parallel_1"])
    return out
