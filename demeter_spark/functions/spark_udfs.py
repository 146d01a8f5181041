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
