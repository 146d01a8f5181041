"""As-of join (SURVEY.md §2.3 J13 — absent in the reference, mandated by the
task's custom-operator list).

For each left row, attach the most recent right row for the same key with
right_ts <= left_ts (backward direction, inclusive — DuckDB ASOF semantics).

Spark shape — the scale-correct formulation is a UNION + one window, not a
range join: tag both sides, sort each key's timeline once (right rows before
left rows on timestamp ties so ties match inclusively), and carry the latest
right values forward with last(ignorenulls) over an unbounded-preceding
frame. One shuffle on the key, O(n log n) per key, no candidate-pair
explosion — a range join would explode on hot keys and is why naive as-of
implementations die at 10^12 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    value_cols: tuple[str, ...] = ("value",),
    prefix: str = "r_",
) -> DataFrame:
    """Left as-of join: left columns + prefixed right ``value_cols`` and
    ``{prefix}{ts}`` (the matched right timestamp); NULLs when no right row
    precedes the left row."""
    carried = [ts, *[c for c in value_cols if c != ts]]
    r = right.select(
        F.col(on),
        F.col(ts),
        *[F.col(c).alias(f"{prefix}{c}") for c in carried],
    ).withColumn("_is_l", F.lit(0))
    l = left.withColumn("_is_l", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)
    # the prefixed value columns join the sort key as a deterministic final
    # tiebreak: if the right side has duplicate (key, ts) rows, last()
    # would otherwise pick a partition-order-dependent row (ADVICE r02).
    # Among equal timestamps the GREATEST value tuple sorts last and wins —
    # documented, engine-stable semantics. NULLs (left rows' empty carried
    # columns) sort first, so they never displace a real right row.
    w = (
        Window.partitionBy(on)
        .orderBy(
            F.col(ts).asc(),
            F.col("_is_l").asc(),
            *[F.asc_nulls_first(f"{prefix}{c}") for c in carried],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in carried:
        u = u.withColumn(
            f"{prefix}{c}", F.last(f"{prefix}{c}", ignorenulls=True).over(w)
        )
    return u.filter(F.col("_is_l") == 1).drop("_is_l")
