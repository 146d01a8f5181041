"""Evaluation fence — stop predicate pushdown from re-expanding
expensive projected expressions.

Catalyst's ``PushDownPredicates`` substitutes aliases into the pushed
condition with no cost guard: filtering a frame on a flag whose alias
chain bottoms out in an O(L^2) higher-order expression re-materialises
that expression inside every pushed Filter, once per Project layer it
crosses (measured on ``curation.curate``: the top-gram ``array_max``
kernel appeared 7x in the optimised plan and the filtered count ran 21x
slower than the same count with ``PushDownPredicates`` excluded).
``CollapseProject`` has a cheap-expression guard for exactly this
hazard; predicate pushdown does not.

``eval_fence`` routes the computed columns through
``explode(array(struct(...)))`` — a 1:1, map-only, zero-shuffle
Generate. ``PushPredicateThroughGenerate`` only pushes predicates that
do NOT reference generator outputs, so any filter on a fenced column
stops above the Generate and reads the struct field: the expensive
expression is evaluated exactly once per row, in the Generate.

Cost of the fence: column pruning stops at the struct (a consumer that
selects one fenced column still computes all of them). Use it on
decision frames whose columns are consumed together (signal + flag
bundles), not on wide pass-through tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def eval_fence(df: DataFrame, passthrough: list[str]) -> DataFrame:
    """Fence every column of ``df`` except ``passthrough`` behind a 1:1
    Generate so predicates on them cannot be pushed into (and duplicate)
    the expressions that compute them. Row-preserving: the exploded
    array literal always has exactly one element, so NULL/empty-array
    row loss cannot occur."""
    fenced = [c for c in df.columns if c not in passthrough]
    if not fenced:
        return df
    out = df.select(
        *passthrough,
        F.explode(F.array(F.struct(*fenced))).alias("_fence"),
    )
    return out.select(*passthrough, *[f"_fence.{c}" for c in fenced])
