"""Deterministic sampling / split assignment for training-data curation.

The operations every large-scale training pipeline runs after filtering
and dedup: carve train/valid/test splits and draw per-stratum samples
(language/domain balancing) — REPRODUCIBLY. Randomness comes from a
salted md5 of a stable row key, never from an RNG: re-running the
pipeline, resuming from a checkpoint, or adding executors yields the
same assignment for every row (rand()-based sampling is not stable
under retries/re-partitioning — a documented Spark footgun).

All map-only, pure JVM expressions (md5 + string slicing + integer
compares): ZERO shuffle, no Python, and the identical SQL evaluates in
DuckDB for the oracle gate (md5 hex strings are engine-portable — the
same trick the SimHash oracle uses, operators/dedup.py:274).

Reference anchor: the reference has no sampling layer (its tests fix
tiny AOIs by hand, e.g. demeter/tests/raster/test_polaris.py); these are
the webtext-payload counterpart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1 << 32


def _bucket_expr(key_col: str, salt: str) -> str:
    """Uniform [0, 2^32) bucket from a salted md5 of the key — Spark SQL
    text; sampling_oracle_bucket() emits the DuckDB twin."""
    return (
        f"CAST(conv(substring(md5(concat('{salt}', ':', {key_col})), 1, 8),"
        " 16, 10) AS BIGINT)"
    )


def sampling_oracle_bucket(key_col: str, salt: str) -> str:
    """DuckDB expression computing the same bucket (hex parse via ::BIGINT
    of a 0x literal; md5 of identical input bytes => identical hex)."""
    return (
        f"CAST(('0x' || substring(md5('{salt}' || ':' || {key_col}), 1, 8))"
        " AS BIGINT)"
    )


def split_assign(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    key_col: str = "url",
    salt: str = "split-v1",
) -> DataFrame:
    """Add a ``split`` column assigning each row to a named split with the
    given weights (default 90/5/5 train/valid/test).

    Assignment is by bucket ranges over the salted hash: thresholds are
    EXACT integers (floor of cumulative weight * 2^32), so the boundary
    comparison is integer-only and cross-engine stable. Keying on url
    (not doc_id) keeps the assignment stable across re-crawls that renumber
    documents — the property that prevents test-set leakage between runs.
    """
    weights = weights or {"train": 0.90, "valid": 0.05, "test": 0.05}
    total = sum(weights.values())
    b = _bucket_expr(key_col, salt)
    cases, acc = [], 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w / total
        cases.append((name, int(acc * _BUCKETS)))
    expr = "CASE"
    for name, thr in cases:
        expr += f" WHEN {b} < {thr} THEN '{name}'"
    expr += f" ELSE '{items[-1][0]}' END AS split"
    return docs.selectExpr("*", expr)


def split_assign_oracle_case(
    weights: dict[str, float] | None = None,
    key_col: str = "url",
    salt: str = "split-v1",
) -> str:
    """The DuckDB CASE expression mirroring split_assign (same thresholds,
    same hash) for oracle SQL composition."""
    weights = weights or {"train": 0.90, "valid": 0.05, "test": 0.05}
    total = sum(weights.values())
    b = sampling_oracle_bucket(key_col, salt)
    items = list(weights.items())
    expr, acc = "CASE", 0.0
    for name, w in items[:-1]:
        acc += w / total
        expr += f" WHEN {b} < {int(acc * _BUCKETS)} THEN '{name}'"
    return expr + f" ELSE '{items[-1][0]}' END"


def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    stratum_col: str = "lang",
    key_col: str = "url",
    salt: str = "sample-v1",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample: keep a row iff its
    bucket < fraction[stratum] * 2^32 (exact integer threshold).

    The language/domain re-balancing draw of corpus curation: e.g.
    {"en": 0.1, "fr": 1.0} keeps 10% of English, all French. Map-only —
    the per-stratum thresholds compile into ONE CASE expression (no join,
    no shuffle, works at any number of strata that fits a CASE; for
    thousands of strata broadcast-join a threshold dim instead). Expected
    counts concentrate tightly (Chernoff) because buckets are uniform;
    exactness of per-row membership — not of counts — is the contract.
    """
    b = _bucket_expr(key_col, salt)
    thr = "CASE"
    for s, f in fractions.items():
        thr += f" WHEN {stratum_col} = '{s}' THEN {int(f * _BUCKETS)}"
    thr += f" ELSE {int(default_fraction * _BUCKETS)} END"
    return docs.where(f"{b} < ({thr})")


def pack_sequences(
    docs: DataFrame,
    budget: int,
    tokens_col: str = "n_tokens",
    order_col: str = "doc_id",
    n_groups: int = 1024,
    key_col: str | None = None,
) -> DataFrame:
    """Assign documents to fixed-token-budget training sequences — the
    packing stage between curation and tokenization.

    Deterministic greedy-by-order packing: within a group, documents are
    taken in ``order_col`` order and a document starts a new pack when the
    tokens consumed before it reach the next multiple of ``budget``
    (pack index = (running_sum - own_tokens) div budget — integer-exact,
    so the same window evaluates identically in any engine). Documents
    larger than the budget get their own pack(s) without blocking the
    group.

    Scale: a single global greedy pass is inherently sequential, so
    packing parallelizes the standard way — documents are salted into
    ``n_groups`` independent streams (hash of ``key_col`` or the order
    column) and each group packs independently inside ONE window
    partition: n_groups-way parallel, one shuffle, no Python. Pack
    identity is (group, pack_in_group) encoded as one BIGINT. Packing
    quality loss vs global greedy is the usual O(1 doc) tail per group —
    at 10^12 docs / 1024 groups the waste fraction is ~n_groups/n_docs,
    negligible, while a global window would serialize the corpus through
    one task.
    """
    from pyspark.sql import Window

    key = key_col or order_col
    g = F.pmod(F.xxhash64(F.col(key)), F.lit(n_groups))
    w = (
        Window.partitionBy("_g")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = F.sum(F.col(tokens_col)).over(w)
    return (
        docs.withColumn("_g", g)
        .withColumn("_run", run)
        .withColumn(
            # integer div keeps the pack index exact at any corpus size
            # (a double division would lose bits past 2^53 group-tokens)
            "pack_id",
            F.col("_g") * F.lit(1 << 40)
            + F.expr(f"(_run - {tokens_col}) div {budget}"),
        )
        .drop("_run")
        .withColumnRenamed("_g", "pack_group")
    )


def domain_quota(
    docs: DataFrame,
    quota: int,
    domain_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "quota-v1",
) -> DataFrame:
    """Cap documents per domain at ``quota`` — the head-domain damper of
    web-corpus curation (a handful of hosts dominate any crawl; capping
    them is the standard C4-era rebalancing step).

    WHICH rows survive is deterministic and layout-independent: rows rank
    within their domain by the salted hash bucket (then key as the total
    tie-break), so re-crawls, retries and repartitionings keep the same
    winners — the same stability contract as split_assign. ONE window
    shuffle keyed on the domain; the heavy hitters this exists to cap are
    exactly the skewed partitions, which is fine because the window only
    materializes rank <= quota per task after partial sort.
    """
    from pyspark.sql import Window

    b = _bucket_expr(key_col, salt)
    w = Window.partitionBy(domain_col).orderBy(
        F.expr(b).asc(), F.col(key_col).asc()
    )
    return (
        docs.withColumn("_qrank", F.row_number().over(w))
        .where(F.col("_qrank") <= quota)
        .drop("_qrank")
    )


def temperature_weights(
    docs: DataFrame,
    alpha: float = 0.7,
    domain_col: str = "source",
    size_col: str | None = None,
) -> DataFrame:
    """Temperature-based mixture weights (the multilingual-corpus /
    Pile-style rebalancing rule): sampling probability of domain i is
    p_i ∝ n_i^alpha, so alpha<1 upweights small domains and alpha=1 is
    natural sampling. Returns (domain, n, weight, keep_fraction) where
    keep_fraction = p_i * N / n_i capped at 1 — the per-domain Bernoulli
    rate that realizes the mixture WITHOUT upsampling (epoch replication
    of the capped domains is the caller's knob).

    One map-side-combined aggregate over the corpus; the result is a
    domain-cardinality dimension. ``size_col`` weighs domains by tokens
    (or bytes) instead of document counts.
    """
    agg = (
        F.sum(size_col).alias("n")
        if size_col is not None
        else F.count(F.lit(1)).alias("n")
    )
    dims = docs.groupBy(F.col(domain_col).alias("domain")).agg(agg)
    tot = dims.selectExpr(
        "sum(n) AS n_total", f"sum(pow(n, {alpha}e0)) AS z"
    )
    return dims.crossJoin(F.broadcast(tot)).selectExpr(
        "domain",
        "n",
        f"pow(n, {alpha}e0) / z AS weight",
        f"least(1e0, pow(n, {alpha}e0) / z * n_total / n) AS keep_fraction",
    )


def mixture_sample(
    docs: DataFrame,
    alpha: float = 0.7,
    domain_col: str = "source",
    key_col: str = "url",
    salt: str = "mixture-v1",
) -> DataFrame:
    """Deterministic realization of the temperature mixture: keep a row
    iff its salted-md5 bucket clears its domain's keep_fraction — the
    same exact-integer draw as stratified_sample, with thresholds from
    temperature_weights broadcast-joined (domains can number millions;
    a CASE would not scale). Adds the domain's weight column so
    downstream loaders can replicate capped domains across epochs."""
    w = temperature_weights(docs, alpha, domain_col)
    thr = w.selectExpr(
        "domain",
        "weight",
        f"CAST(keep_fraction * {_BUCKETS} AS BIGINT) AS _thr",
    )
    b = _bucket_expr(key_col, salt)
    return (
        docs.join(
            F.broadcast(thr),
            F.col(domain_col) == F.col("domain"),
        )
        .where(f"{b} < _thr")
        .drop("domain", "_thr")
    )
