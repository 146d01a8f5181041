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
from pyspark.sql.types import ArrayType, LongType

from demeter_spark.functions import cellgrid as cg


def cell_of(lon: Column, lat: Column, res: int) -> Column:
    """Column expression: point -> cell id at resolution ``res``."""

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
