"""Arrow-batched pandas UDF wrappers over the numpy cell/geometry kernels.

These are the only Python-side computations in the hot path, and every one is
vectorized Series->Series (BASELINE.json input_hint: "vectorized pandas/Arrow
UDFs (no per-row Python) throughout").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StringType

from demeter_spark.functions import cellgrid as cg


def cell_of(lon: Column, lat: Column, res: int) -> Column:
    """Column expression: point -> cell id at resolution ``res``.

    Pure Catalyst bit arithmetic (Morton interleave via magic-number spread,
    same constants as cellgrid._part1by1) — the point side of the cover join
    stays inside whole-stage codegen with NO Python in the 10^12-row path.
    Equivalence with the numpy kernel is property-tested.
    """
    n = 1 << res

    def _clip(idx: Column) -> Column:
        return F.least(F.greatest(idx, F.lit(0)), F.lit(n - 1)).cast("long")

    ix = _clip(F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n))))
    iy = _clip(F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(n))))

    def _spread(v: Column) -> Column:
        # 64-bit part1by1: spread low 32 bits into even positions
        for shift, mask in (
            (16, 0x0000FFFF0000FFFF),
            (8, 0x00FF00FF00FF00FF),
            (4, 0x0F0F0F0F0F0F0F0F),
            (2, 0x3333333333333333),
            (1, 0x5555555555555555),
        ):
            v = (v.bitwiseOR(F.shiftleft(v, shift))).bitwiseAND(F.lit(mask))
        return v

    morton = _spread(ix).bitwiseOR(F.shiftleft(_spread(iy), 1))
    return morton.bitwiseOR(F.lit(res << 53)).cast("long")


def cell_of_pandas(lon: Column, lat: Column, res: int) -> Column:
    """pandas-UDF variant of cell_of (kept for parity testing)."""

    @F.pandas_udf(LongType())
    def _cell_of(lo: pd.Series, la: pd.Series) -> pd.Series:
        return pd.Series(cg.cell_of(lo.to_numpy(), la.to_numpy(), res))

    return _cell_of(lon, lat)


def ancestors_of(cell: Column, res_min: int) -> Column:
    """Column: cell id -> array of self + ancestors down to res_min
    (point side of a compact-cover join)."""

    @F.pandas_udf(ArrayType(LongType()))
    def _anc(c: pd.Series) -> pd.Series:
        arr = cg.ancestors(c.to_numpy(), res_min)
        return pd.Series(list(arr))

    return _anc(cell)


def kring_of(cell: Column, k: int) -> Column:
    """Column: cell id -> array of Chebyshev-k neighbor cell ids."""

    @F.pandas_udf(ArrayType(LongType()))
    def _kring(c: pd.Series) -> pd.Series:
        arr = cg.kring(c.to_numpy(), k)
        return pd.Series(list(arr))

    return _kring(cell)


def simplify_wkt(geom: Column, eps: float) -> Column:
    """Column: (MULTI)POLYGON WKT -> Douglas-Peucker-simplified
    MULTIPOLYGON WKT (NULL when every part collapses below ``eps``).

    Arrow-batched Series->Series over the numpy DP kernel
    (geom.simplify_parts) — the tiling engine's zoom-level geometry
    reduction: rings keep every vertex that deviates more than ``eps``
    from the simplified chain (the DP guarantee), so per-zoom parcel
    boundaries stay within one screen pixel of the source geometry while
    vertex counts drop by orders of magnitude.
    """
    from demeter_spark.functions import geom as gm

    @F.pandas_udf(StringType())
    def _simp(w: pd.Series) -> pd.Series:
        out = []
        for wkt in w:
            if wkt is None:
                out.append(None)
                continue
            parts = gm.simplify_parts(gm.parse_wkt_polygons(wkt), eps)
            out.append(gm.multipolygon_wkt(parts) if parts else None)
        return pd.Series(out, dtype=object)

    return _simp(geom)


def hex_of(lon: Column, lat: Column, res: int) -> Column:
    """Column expression: point -> H3-style hexagonal cell id at ``res``.

    Pure Catalyst (no Python in the hot path): fractional axial
    coordinates, cube rounding with floor(x+0.5) (the cross-engine-stable
    rounding — see functions/hexgrid.py), offset-encoded into the int64
    layout hexgrid.encode uses. Literal-for-literal the same float64
    arithmetic as the numpy kernel and hexgrid.hex_of_sql's DuckDB text,
    so all three agree bit-for-bit; equivalence with numpy is
    property-tested in tests/test_hexgrid.py.
    """
    from demeter_spark.functions import hexgrid as hx

    s = F.lit(hx.hex_size(res))
    qf = (lon * F.lit(hx._K_Q) - lat * F.lit(hx._K_THIRD)) / s
    rf = (lat * F.lit(hx._K_R)) / s
    cx, cz = qf, rf
    cy = -qf - rf
    rx = F.floor(cx + F.lit(0.5)).cast("double")
    ry = F.floor(cy + F.lit(0.5)).cast("double")
    rz = F.floor(cz + F.lit(0.5)).cast("double")
    dx = F.abs(rx - cx)
    dy = F.abs(ry - cy)
    dz = F.abs(rz - cz)
    fix_x = (dx > dy) & (dx > dz)
    q = F.when(fix_x, -ry - rz).otherwise(rx).cast("long")
    r = (
        F.when(~fix_x & ~(dy > dz), -rx - ry).otherwise(rz).cast("long")
    )
    return (
        F.lit(res).cast("long") * F.lit(hx._RES_SHIFT)
        + (q + F.lit(hx._COORD_OFF)) * F.lit(hx._COORD_SHIFT)
        + (r + F.lit(hx._COORD_OFF))
    )


def hex_of_pandas(lon: Column, lat: Column, res: int) -> Column:
    """pandas-UDF variant of hex_of (kept for parity testing)."""
    from demeter_spark.functions import hexgrid as hx

    @F.pandas_udf(LongType())
    def _hex_of(lo: pd.Series, la: pd.Series) -> pd.Series:
        return pd.Series(hx.hex_of(lo.to_numpy(), la.to_numpy(), res))

    return _hex_of(lon, lat)


def hex_kring_of(cell: Column, k: int) -> Column:
    """Column: hex id -> array of the filled k-ring (3k(k+1)+1 ids) —
    the hex analogue of kring_of for kNN expansion."""
    from demeter_spark.functions import hexgrid as hx

    @F.pandas_udf(ArrayType(LongType()))
    def _hkring(c: pd.Series) -> pd.Series:
        arr = hx.kring(c.to_numpy(), k)
        return pd.Series(list(arr))

    return _hkring(cell)
