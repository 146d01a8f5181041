"""Hexagonal cell index (H3-style) over lon/lat, vectorized in numpy.

The quad grid (``cellgrid.py``) is the engine's S2-style index: Morton
locality, exact 4-way hierarchy, compact covers. This module adds the
H3-style *hexagonal* counterpart (BASELINE.json north_star names both:
"H3 compact cell covers and S2 coverings"). Hexagons matter for the kNN
and density paths: every neighbor is edge-adjacent at the SAME
center-to-center distance (a square grid's diagonal neighbors are ~41%
farther), so a hex k-ring is a much tighter disk approximation and a
hex-binned density map has no axis-aligned aliasing. The trade-off is
public knowledge too: hexagons have no exact finer-resolution
subdivision (H3's aperture-7 children only approximate the parent), so
`compact`/`parent` stay quad-grid-only and the hex grid is flat
per-resolution.

Geometry: pointy-top hexagons in the lon/lat plane, axial coordinates
(q, r) following the standard cube-coordinate construction (Red Blob
Games' hexagonal-grids reference; the same math H3 uses within a base
cell). Resolution ``res`` sets the circumradius ``s = 180 / 2^res``
degrees, halving per level like the quad grid.

Cross-engine bit-stability: every kernel here must reproduce in DuckDB
SQL for the oracle gate. All arithmetic is +,-,*,/,sqrt — IEEE-exact and
identical across numpy/Catalyst/DuckDB (established by the exp() finding
in tests/test_reproject.py: only transcendentals diverge). Rounding uses
``floor(x + 0.5)`` — NOT numpy's round() (banker's) or SQL round()
(half-away-from-zero), which disagree at ties — so the cube-rounding
branch is the same function in all three engines. ``hexgrid_sql()``
emits the matching DuckDB/Spark-SQL expression from the same constants.

id layout (int64, always positive): ``res * 2^53 + (q + 2^25) * 2^26 +
(r + 2^25)`` — res in the same bit position as the quad grid's ids, q/r
offset-encoded in 26 bits each (covers |q|,|r| < 2^25, i.e. every res
<= 23 over the full lon/lat domain).
"""

from __future__ import annotations

import math

import numpy as np

SQRT3 = math.sqrt(3.0)
_K_Q = SQRT3 / 3.0  # d(qf)/d(x) per unit size
_K_THIRD = 1.0 / 3.0
_K_R = 2.0 / 3.0
_RES_SHIFT = 9007199254740992  # 2^53
_COORD_SHIFT = 67108864  # 2^26
_COORD_OFF = 33554432  # 2^25


def hex_size(res: int) -> float:
    """Circumradius (center->corner) in degrees at resolution ``res``."""
    return 180.0 / (1 << res)


def _frac_axial(
    lon: np.ndarray, lat: np.ndarray, res: int
) -> tuple[np.ndarray, np.ndarray]:
    s = hex_size(res)
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    qf = (lon * _K_Q - lat * _K_THIRD) / s
    rf = (lat * _K_R) / s
    return qf, rf


def _cube_round(
    qf: np.ndarray, rf: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Cube rounding: nearest hex center in cube space, ties broken by
    re-deriving the coordinate with the largest rounding error from the
    other two (cube invariant x+y+z=0)."""
    cx, cz = qf, rf
    cy = -qf - rf
    rx = np.floor(cx + 0.5)
    ry = np.floor(cy + 0.5)
    rz = np.floor(cz + 0.5)
    dx = np.abs(rx - cx)
    dy = np.abs(ry - cy)
    dz = np.abs(rz - cz)
    fix_x = (dx > dy) & (dx > dz)
    fix_z = ~fix_x & ~(dy > dz)
    q = np.where(fix_x, -ry - rz, rx)
    r = np.where(fix_z, -rx - ry, rz)
    return q.astype(np.int64), r.astype(np.int64)


def axial_of(
    lon: np.ndarray, lat: np.ndarray, res: int
) -> tuple[np.ndarray, np.ndarray]:
    """Point -> axial (q, r) of the containing hexagon."""
    return _cube_round(*_frac_axial(lon, lat, res))


def encode(q: np.ndarray, r: np.ndarray, res: int) -> np.ndarray:
    q = np.asarray(q, dtype=np.int64)
    r = np.asarray(r, dtype=np.int64)
    return (
        np.int64(res) * np.int64(_RES_SHIFT)
        + (q + np.int64(_COORD_OFF)) * np.int64(_COORD_SHIFT)
        + (r + np.int64(_COORD_OFF))
    )


def decode(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """ids -> (q, r, res)."""
    ids = np.asarray(ids, dtype=np.int64)
    res = ids // np.int64(_RES_SHIFT)
    rem = ids - res * np.int64(_RES_SHIFT)
    q = rem // np.int64(_COORD_SHIFT) - np.int64(_COORD_OFF)
    r = rem % np.int64(_COORD_SHIFT) - np.int64(_COORD_OFF)
    return q, r, res


def hex_of(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """Point -> hex id at resolution ``res`` (the H3 geo-to-cell analogue)."""
    q, r = axial_of(lon, lat, res)
    return encode(q, r, res)


def hex_center(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Hex id -> center (lon, lat). Exact inverse of hex_of away from
    edges; centers are strictly interior so round-trips are exact."""
    q, r, res = decode(ids)
    # mixed resolutions allowed; sizes are exact powers of two so the
    # per-row divide is exact float arithmetic
    s = 180.0 / np.exp2(res.astype(np.float64))
    qf = q.astype(np.float64)
    rf = r.astype(np.float64)
    lon = s * (SQRT3 * (qf + rf * 0.5))
    lat = s * (1.5 * rf)
    return lon, lat


def hex_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Hex grid distance (minimum number of edge-adjacent steps)."""
    qa, ra, resa = decode(a)
    qb, rb, resb = decode(b)
    if not np.all(resa == resb):
        raise ValueError("hex_distance requires equal resolutions")
    dq = qa - qb
    dr = ra - rb
    return (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2


def kring_offsets(k: int) -> tuple[np.ndarray, np.ndarray]:
    """Axial offsets of the filled k-ring disk: 3k(k+1)+1 hexes, every one
    within grid distance k (vs the square grid's (2k+1)^2 box whose
    corners are ~1.41k away)."""
    dqs, drs = [], []
    for dq in range(-k, k + 1):
        lo = max(-k, -dq - k)
        hi = min(k, -dq + k)
        for dr in range(lo, hi + 1):
            dqs.append(dq)
            drs.append(dr)
    return np.asarray(dqs, dtype=np.int64), np.asarray(drs, dtype=np.int64)


def kring(ids: np.ndarray, k: int) -> np.ndarray:
    """(n,) ids -> (n, 3k(k+1)+1) ids of all hexes within distance k.

    Mirrors cellgrid.kring for the hex index; the kNN expansion ring
    (BASELINE.json: "kNN via H3 k-ring expansion")."""
    ids = np.asarray(ids, dtype=np.int64)
    q, r, res = decode(ids)
    if len(ids) and not np.all(res == res[0]):
        raise ValueError("kring requires uniform resolution")
    dq, dr = kring_offsets(k)
    nq = q[:, None] + dq[None, :]
    nr = r[:, None] + dr[None, :]
    if len(ids) == 0:
        return np.empty((0, len(dq)), dtype=np.int64)
    return encode(nq, nr, int(res[0]) if len(ids) else 0)


def ring(ids: np.ndarray, k: int) -> np.ndarray:
    """(n,) ids -> (n, 6k) ids at EXACT distance k (hollow ring), k >= 1.

    Walk construction: start k steps in direction 4 (+q diagonal down in
    cube space), then 6 sides of k steps each — the standard H3
    gridRingUnsafe traversal."""
    if k < 1:
        raise ValueError("ring requires k >= 1")
    # six axial direction vectors, in walk order
    dirs = np.array(
        [(0, -1), (1, -1), (1, 0), (0, 1), (-1, 1), (-1, 0)],
        dtype=np.int64,
    )
    offs = []
    # start at direction 4 scaled by k ( (-k, k) ), walk each side
    cq, cr = -k, k
    for side in range(6):
        for _ in range(k):
            offs.append((cq, cr))
            cq += dirs[side][0]
            cr += dirs[side][1]
    off = np.asarray(offs, dtype=np.int64)
    ids = np.asarray(ids, dtype=np.int64)
    q, r, res = decode(ids)
    if len(ids) == 0:
        return np.empty((0, 6 * k), dtype=np.int64)
    if not np.all(res == res[0]):
        raise ValueError("ring requires uniform resolution")
    return encode(q[:, None] + off[None, :, 0], r[:, None] + off[None, :, 1], int(res[0]))


def neighbors(ids: np.ndarray) -> np.ndarray:
    """(n,) -> (n, 6) edge-adjacent hexes (ring(ids, 1))."""
    return ring(ids, 1)


def hex_corners(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(n,) ids -> (n, 6) corner lon / lat arrays (pointy-top: first
    corner at 30 degrees, then every 60)."""
    lon, lat = hex_center(ids)
    _, _, res = decode(ids)
    s = 180.0 / np.exp2(res.astype(np.float64))
    ang = np.deg2rad(60.0 * np.arange(6) + 30.0)
    cx = lon[:, None] + s[:, None] * np.cos(ang)[None, :]
    cy = lat[:, None] + s[:, None] * np.sin(ang)[None, :]
    return cx, cy


def polyfill_hex(
    xs: np.ndarray, ys: np.ndarray, res: int, classify: bool = False
) -> np.ndarray | tuple[np.ndarray, np.ndarray]:
    """Hexes intersecting the polygon ring (xs, ys): conservative superset
    (interior centers + edge-sampled boundary dilated one ring), same
    filter-refine contract as cellgrid.polyfill. With ``classify=True``
    also marks provably fully-inside hexes."""
    return polyfill_hex_part([(np.asarray(xs), np.asarray(ys))], res, classify)


def polyfill_hex_part(
    rings: list[tuple[np.ndarray, np.ndarray]], res: int, classify: bool = False
):
    """polyfill_hex for a polygon part with holes (rings[0] = outer)."""
    from demeter_spark.functions import geom as _geom

    s = hex_size(res)
    outer_xs = np.asarray(rings[0][0], dtype=np.float64)
    outer_ys = np.asarray(rings[0][1], dtype=np.float64)

    # Candidate axial window: qf is monotone in x and y, rf in y, so the
    # extrema over the bbox corners bound the polygon's axial range.
    bx = np.array(
        [outer_xs.min(), outer_xs.min(), outer_xs.max(), outer_xs.max()]
    )
    by = np.array(
        [outer_ys.min(), outer_ys.max(), outer_ys.min(), outer_ys.max()]
    )
    qf, rf = _frac_axial(bx, by, res)
    q0, q1 = int(np.floor(qf.min())) - 1, int(np.ceil(qf.max())) + 1
    r0, r1 = int(np.floor(rf.min())) - 1, int(np.ceil(rf.max())) + 1
    gq, gr = np.meshgrid(
        np.arange(q0, q1 + 1, dtype=np.int64),
        np.arange(r0, r1 + 1, dtype=np.int64),
        indexing="ij",
    )
    cand = encode(gq.ravel(), gr.ravel(), res)
    cx, cy = hex_center(cand)
    inside = np.zeros(len(cand), dtype=bool)
    for rxs, rys in rings:
        inside ^= _geom.points_in_ring(
            cx, cy, np.asarray(rxs, dtype=np.float64), np.asarray(rys, dtype=np.float64)
        )
    interior = cand[inside]

    # Boundary supercover: sample every ring edge at half the hex inradius
    # (inradius = s*sqrt(3)/2 is the minimum center-to-edge distance), map
    # samples to hexes, dilate one ring.
    step = 0.5 * (s * SQRT3 / 2.0)
    ex0 = np.concatenate([np.asarray(r[0], dtype=np.float64) for r in rings])
    ey0 = np.concatenate([np.asarray(r[1], dtype=np.float64) for r in rings])
    ex1 = np.concatenate(
        [np.roll(np.asarray(r[0], dtype=np.float64), -1) for r in rings]
    )
    ey1 = np.concatenate(
        [np.roll(np.asarray(r[1], dtype=np.float64), -1) for r in rings]
    )
    seg_len = np.hypot(ex1 - ex0, ey1 - ey0)
    n_samp = np.maximum((seg_len / step).astype(np.int64) + 2, 2)
    total = int(n_samp.sum())
    seg_idx = np.repeat(np.arange(len(ex0)), n_samp)
    within = np.arange(total) - np.repeat(np.cumsum(n_samp) - n_samp, n_samp)
    t = within / (n_samp[seg_idx] - 1).astype(np.float64)
    px = ex0[seg_idx] + (ex1[seg_idx] - ex0[seg_idx]) * t
    py = ey0[seg_idx] + (ey1[seg_idx] - ey0[seg_idx]) * t
    bhex = np.unique(hex_of(px, py, res))
    if len(bhex):
        boundary = np.unique(kring(bhex, 1).ravel())
    else:
        boundary = np.empty(0, dtype=np.int64)

    cells = np.unique(np.concatenate([interior, boundary]))
    if not classify:
        return cells
    full = np.isin(cells, interior) & ~np.isin(cells, boundary)
    return cells, full


def hex_of_sql(lon_expr: str, lat_expr: str, res: int) -> str:
    """DuckDB/ANSI SQL expression computing hex_of(lon, lat, res) —
    literal-for-literal the same float64 arithmetic as the numpy kernel
    (same constants, same floor(x+0.5) rounding, same CASE branch order),
    so the oracle comparison is bit-exact."""
    s = repr(hex_size(res))
    qf = f"(({lon_expr}) * (sqrt(3.0)/3.0) - ({lat_expr}) * (1.0/3.0)) / {s}"
    rf = f"(({lat_expr}) * (2.0/3.0)) / {s}"
    return f"""(
      SELECT CAST({res} AS BIGINT) * 9007199254740992
           + (CAST(CASE WHEN t.dx > t.dy AND t.dx > t.dz
                        THEN -t.ry - t.rz ELSE t.rx END AS BIGINT) + 33554432) * 67108864
           + (CAST(CASE WHEN NOT (t.dx > t.dy AND t.dx > t.dz) AND NOT (t.dy > t.dz)
                        THEN -t.rx - t.ry ELSE t.rz END AS BIGINT) + 33554432)
      FROM (
        SELECT rx, ry, rz,
               abs(rx - cx) AS dx, abs(ry - cy) AS dy, abs(rz - cz) AS dz
        FROM (
          SELECT cx, cy, cz,
                 floor(cx + 0.5) AS rx, floor(cy + 0.5) AS ry, floor(cz + 0.5) AS rz
          FROM (SELECT {qf} AS cx, -({qf}) - ({rf}) AS cy, {rf} AS cz) b
        ) rr
      ) t
    )"""
