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
    # ONE struct carries the whole right row, so the matched values are
    # always row-consistent: last(ignorenulls) picks a single winning right
    # row and every output column comes from it (per-column last() could
    # stitch together values from different duplicate rows when some carried
    # columns are NULL — ADVICE r03).
    r = right.select(
        F.col(on),
        F.col(ts),
        F.struct(*[F.col(c).alias(c) for c in carried]).alias("_r_row"),
    ).withColumn("_is_l", F.lit(0))
    l = left.withColumn("_is_l", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)
    # Struct comparison is lexicographic by field (ts first, then the value
    # columns), giving a deterministic final tiebreak: among duplicate
    # (key, ts) right rows the GREATEST (ts, *values) tuple sorts last and
    # wins — documented, engine-stable semantics. NULL structs (left rows)
    # sort first, so they never displace a real right row.
    w = (
        Window.partitionBy(on)
        .orderBy(
            F.col(ts).asc(),
            F.col("_is_l").asc(),
            F.asc_nulls_first("_r_row"),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("_r_row", F.last("_r_row", ignorenulls=True).over(w))
    for c in carried:
        u = u.withColumn(f"{prefix}{c}", F.col("_r_row").getField(c))
    return u.filter(F.col("_is_l") == 1).drop("_is_l", "_r_row")
