"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (geocode -> cell-cover join ->
exact PIP refine) at sf0.001. ``queries()``/``oracle_sql()`` expose each
implemented operator from SURVEY.md §2 with a DuckDB oracle over the
pre-registered testdata views (the synthetic spatial world is regenerated
inside the oracle SQL itself via closed-form CTEs — see
demeter_spark/sources/synth.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from demeter_spark.operators import joins
    from demeter_spark.sources import synth

    sf_dir = "/root/testdata/sf0.001"
    pts = synth.page_points(spark, sf_dir)
    par = synth.parcels(spark)
    return joins.spatial_join(pts, par, res=8).select(
        "url", "doc_id", "lon", "lat", "parcel_id"
    )


# --------------------------------------------------------------------------
# queries: name -> (spark, sf_dir) -> DataFrame
# --------------------------------------------------------------------------

def _q_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1-style scan + byte-identical text extraction from html binary
    (BASELINE.json input_hint invariant)."""
    from demeter_spark.sources import synth

    return synth.pages(spark, sf_dir).selectExpr(
        "url", f"{synth.extract_text_expr('html')} AS text"
    )


def _q_geocode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geocoding: regex place extraction + broadcast gazetteer join (S5/J2),
    plus the two cell indexes side by side — quad (S2-style Morton) and hex
    (H3-style axial, round 6) — both pure Catalyst; the hex id is
    oracle-checked bit-for-bit against hexgrid.hex_of_sql's DuckDB text."""
    from pyspark.sql import functions as F

    from demeter_spark.functions import spark_udfs as su
    from demeter_spark.sources import synth

    pts = synth.page_points(spark, sf_dir)
    return pts.withColumn(
        "hex_id", su.hex_of(F.col("lon"), F.col("lat"), 7)
    )


def _q_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship J1: cell-cover equi-join + exact PIP refine."""
    from demeter_spark.operators import joins
    from demeter_spark.sources import synth

    pts = synth.page_points(spark, sf_dir)
    par = synth.parcels(spark)
    # hot_cells="auto" engages the data-driven skew decision on the
    # production path (VERDICT r05 #6); on the broadcast cover join it
    # resolves to no salting (no shuffle to skew), so the plan is the
    # plain cover join — asserted by tests/test_spatial_join.py
    return joins.spatial_join(pts, par, res=8, hot_cells="auto").select(
        "url", "parcel_id"
    )


def _q_web_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperlink graph + exact PageRank (round 6): href extraction from
    stored HTML (map-only regexp explode), host-edge projection via
    parse_url, then 3 power iterations in 2^-40 fixed point — integer sums
    make the ranks BIT-IDENTICAL to the DuckDB oracle's unrolled-CTE
    iteration (operators/linkgraph.py). One row per distinct host edge,
    carrying the source host's rank."""
    from pyspark.sql import functions as F

    from demeter_spark.operators import linkgraph
    from demeter_spark.sources import synth

    lp = synth.linked_pages(spark, sf_dir)
    edges = linkgraph.host_edges(linkgraph.extract_links(lp))
    ranks = linkgraph.pagerank(edges, n_iter=3, mode="int")
    ha = linkgraph.hits(edges, n_iter=3)
    return (
        edges.join(ranks.withColumnRenamed("node", "src"), "src")
        .join(
            ha.select(
                F.col("node").alias("src"),
                F.col("hub_fp").alias("src_hub_fp"),
                F.col("auth_fp").alias("src_auth_fp"),
            ),
            "src",
        )
        .select(
            "src",
            "dst",
            F.col("rank_fp").alias("src_rank_fp"),
            "src_hub_fp",
            "src_auth_fp",
        )
    )


def _q_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC container round trip (sources/warc.py): render pages into
    multi-member-gzip WARC/1.0 bytes per Arrow batch, parse them back,
    split the HTTP envelope, and re-extract the article text — the
    byte-identical-text-per-url invariant (BASELINE.json input_hint)
    carried through a full write->read cycle of the Common Crawl
    container format."""
    import pandas as pd

    from demeter_spark.sources import synth, warc

    p = synth.pages(spark, sf_dir).select("url", "warc_ts", "html")

    def _rt(batches):
        for pdf in batches:
            recs = [
                {
                    "type": "response",
                    "url": u,
                    "date": ts.strftime("%Y-%m-%dT%H:%M:%SZ"),
                    "payload": warc.http_response_bytes(bytes(h)),
                }
                for u, ts, h in zip(pdf["url"], pdf["warc_ts"], pdf["html"])
            ]
            blob = warc.warc_bytes(recs, compress=True)
            rows = {"url": [], "html": [], "http_status": [], "mime": []}
            for rec in warc.parse_warc(blob):
                if rec["type"] != "response":
                    continue
                st, mime, body = warc.split_http_response(rec["payload"])
                rows["url"].append(rec["url"])
                rows["html"].append(body)
                rows["http_status"].append(st)
                rows["mime"].append(mime)
            yield pd.DataFrame(rows)

    out = p.mapInPandas(
        _rt, "url string, html binary, http_status int, mime string"
    )
    return out.selectExpr(
        "url",
        "http_status",
        "mime",
        "CAST(length(html) AS INT) AS n_bytes",
        f"{synth.extract_text_expr('html')} AS text",
    )


def _q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J12: kNN via k-ring expansion (k=3 places per page, doc_id < 40)."""
    from demeter_spark.operators import joins
    from demeter_spark.sources import synth
    from pyspark.sql import functions as F

    pts = synth.page_points(spark, sf_dir).filter(F.col("doc_id") < 40)
    gaz = synth.gazetteer(spark)
    return joins.knn_join(pts, gaz, k=3, res=6).select(
        "url", "place_id", F.col("rank").alias("rnk")
    )


def _q_zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R12: raster<->vector zonal stats — cells join parcels through the same
    cover-join + PIP machinery, then null-skipping aggregates (A15)."""
    from demeter_spark.operators import zonal
    from demeter_spark.sources import synth

    cells = synth.raster_cells(spark)
    par = synth.parcels(spark)
    return zonal.zonal_stats(cells, par)


def _q_zonal_depth_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/A7: null-aware depth-weighted mean (om, 0-50 cm) per parcel."""
    from demeter_spark.operators import zonal
    from demeter_spark.sources import synth
    from pyspark.sql import functions as F

    cells = synth.raster_cells(spark).filter(F.col("dataset") == "om")
    par = synth.parcels(spark)
    joined = zonal.cells_in_parcels(cells, par)
    return zonal.depth_weighted_mean(joined, 0, 50)


def _q_zonal_stats_touched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1 all_touched=True variant: the reference's PRODUCTION mask semantics
    (every call site passes all_touched — usgs/utils.py:50, polaris.py:274,
    slga.py:212, ndvi.py:434): edge pixels with any overlap contribute to the
    zonal aggregates, not only center-inside pixels."""
    from demeter_spark.operators import zonal
    from demeter_spark.sources import synth

    cells = synth.raster_cells(spark)
    par = synth.parcels(spark)
    return zonal.zonal_stats_touched(cells, par, synth.CELL_DEG, synth.CELL_DEG)


def _q_zonal_stats_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Area-weighted zonal stats (exactextract-style weighted mean):
    per-pixel coverage fraction from a 4x4 subcell supersample — integer
    weights, so the whole aggregate is exact and fully oracle-checkable."""
    from demeter_spark.operators import zonal
    from demeter_spark.sources import synth

    return zonal.zonal_stats_weighted(
        synth.raster_cells(spark), synth.parcels(spark), synth.CELL_DEG
    )


def _q_tile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10/A11/R3: overlap-resolving merge, all methods in one groupBy, plus
    the variance-of-sources-around-the-merged-mean raster (the reference's
    _copy_variance_from_stacked_mean) joined per cell so both operators
    re-verify in one driver row (VERDICT r03 #1)."""
    from demeter_spark.operators import tilemerge
    from demeter_spark.sources import synth

    src = synth.merge_sources(spark)
    merged = tilemerge.merge_cells(src)
    var_am = tilemerge.merge_variance_around_mean(
        src, merged.select("ix", "iy", "mean_value")
    )
    return merged.join(var_am, ["ix", "iy"])


def _q_merge_conflicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: overlap-consistency check — disagreeing overlaps as metrics."""
    from demeter_spark.operators import tilemerge
    from demeter_spark.sources import synth

    return tilemerge.overlap_conflicts(synth.merge_sources(spark))


def _q_primary_soil(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.2 pipeline: TOP-1-WITH-TIES window, semi-join key propagation,
    interval range join, null-aware depth-weighted averages, sorted-unique
    concat (J2-J4, J10-J11, W1-W2, A2-A6)."""
    from demeter_spark.operators import ssurgo_q
    from demeter_spark.sources import synth

    return ssurgo_q.primary_soil_components(
        synth.parcels(spark),
        synth.components(spark),
        synth.horizons(spark),
        synth.fragments(spark),
        top=0,
        bottom=50,
    )


def _q_empty_parcels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: anti-join disjointness check — parcels containing no page points."""
    from demeter_spark.operators import joins
    from demeter_spark.sources import synth
    from pyspark.sql import functions as F

    pts = synth.page_points(spark, sf_dir)
    par = synth.parcels(spark)
    hits = joins.spatial_join(pts, par, res=8).select("parcel_id").distinct()
    return par.join(hits, "parcel_id", "left_anti").select("parcel_id", "kind")


def _q_ndvi_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5/P10/R13/R14: per-(zone, datatake) applyInPandas NDVI kernel with
    half-resolution cloud masking and dyadic quantization."""
    from demeter_spark.operators import ndvi
    from demeter_spark.sources import synth

    return ndvi.ndvi_per_datatake(synth.band_cells(spark))


def _q_ndvi_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10/A11: per-cell statistic rasters across datatake passes."""
    from demeter_spark.operators import ndvi
    from demeter_spark.sources import synth

    return ndvi.ndvi_statistics(ndvi.ndvi_per_datatake(synth.band_cells(spark)))


def _q_point_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.1 front-end: N-way multi-source join per point (parcel containment,
    raster value_at, nearest place, primary soil component)."""
    from demeter_spark.operators import enrich
    from demeter_spark.sources import synth
    from pyspark.sql import functions as F

    return enrich.enrich_points(
        synth.page_points(spark, sf_dir),
        synth.parcels(spark),
        synth.raster_cells(spark).filter(F.col("dataset") == "elevation"),
        synth.gazetteer(spark),
        synth.components(spark),
        synth.horizons(spark),
    )


def _q_regrid_coarsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R6 Resampling.average analogue: factor-4 downsample with kernels."""
    from demeter_spark.operators import regrid
    from demeter_spark.sources import synth
    from pyspark.sql import functions as F

    cells = synth.raster_cells(spark).filter(F.col("dataset") == "elevation")
    return regrid.coarsen(cells, 4)


def _q_regrid_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R6 Resampling.nearest analogue: factor-2 upsample."""
    from demeter_spark.operators import regrid
    from demeter_spark.sources import synth
    from pyspark.sql import functions as F

    cells = synth.raster_cells(spark).filter(F.col("dataset") == "elevation")
    return regrid.refine_nearest(cells.select("dataset", "ix", "iy", "value"), 2)


def _q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: binary payloads decoded to typed features in an
    Arrow mapInPandas kernel (codec stubbed; batch shape real)."""
    from demeter_spark.sources import multimodal

    return multimodal.decode_features(multimodal.media(spark, sf_dir))


def _q_media_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL codec decode: actual PNG (zlib inflate + scanline unfilter) and
    RIFF PCM16 WAV bitstreams parsed in the Arrow kernel; the oracle derives
    the same features closed-form from the generator parameters, so the
    encoder and decoder are checked against an independent derivation."""
    from demeter_spark.sources import multimodal

    return multimodal.decode_real(multimodal.real_media(spark, sf_dir))


def _q_tiff_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 completed (VERDICT r03 'What's missing' #1): REAL GeoTIFF byte
    decode — stdlib-only IFD walk / strip+tile reassembly / DEFLATE inflate
    / predictor undo / geo-tag extraction over a deterministic layout
    matrix (striped+tiled, none+deflate, 4 dtypes, both byte orders), with
    decoded features verified against a closed-form oracle. Reference
    front door: demeter/raster/__init__.py:36-47 Raster.from_file."""
    from demeter_spark.sources import multimodal

    return multimodal.decode_tiff(multimodal.tiff_media(spark, sf_dir))


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: content-hash clusters with canonical ids."""
    from demeter_spark.operators import dedup
    from demeter_spark.sources import synth

    return dedup.exact_duplicates(synth.dedup_corpus(spark, sf_dir))


def _q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard near-dup pairs (J >= 0.6) with the document-
    frequency cap engaged (max_df=32): ultra-common shingles are dropped
    BEFORE the self-join — the bounded path is the wired path, and the
    oracle applies the identical cap so the hash match proves equivalence."""
    from demeter_spark.operators import dedup
    from demeter_spark.sources import synth

    return dedup.jaccard_pairs(synth.dedup_corpus(spark, sf_dir), 0.6, max_df=32)


def _q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidates verified with exact Jaccard (J >= 0.8) —
    must equal the exhaustive pairs up to LSH recall (~1-3e-8/pair here)."""
    from demeter_spark.operators import dedup
    from demeter_spark.sources import synth

    return dedup.minhash_lsh_pairs(synth.dedup_corpus(spark, sf_dir), 0.8)


def _q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash banded near-dup pairs (Hamming <= 3), md5-derived token hashes
    so the ENTIRE pipeline (hash -> vote fold -> banding -> popcount verify)
    is oracle-checked: by pigeonhole, Hamming<=3 pairs always share a 16-bit
    band, so the blocked result must equal DuckDB's exhaustive pair scan."""
    from demeter_spark.operators import dedup
    from demeter_spark.sources import synth

    return dedup.simhash_near_pairs(
        synth.dedup_corpus(spark, sf_dir), token_hash=dedup.TOKEN_HASH_MD5
    )


def _q_soil_quantile_sigma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 sourcing: derive the p5/p95 quantiles from raw per-cell values
    (exact interpolated percentile, null-skipping) and recover sigma =
    (p5 - p95) / (2*1.645) — the stage upstream of carbon_stock_stats when
    quantile rasters aren't precomputed."""
    from pyspark.sql import functions as F

    from demeter_spark.operators import statistics as st
    from demeter_spark.sources import synth

    cells = synth.raster_cells(spark)
    agg = cells.groupBy("dataset", "depth_lo").agg(
        F.expr("percentile(value, 0.05e0)").alias("p5"),
        F.expr("percentile(value, 0.95e0)").alias("p95"),
        F.count("value").alias("n_valid"),
    )
    return agg.select(
        "dataset",
        "depth_lo",
        "p5",
        "p95",
        "n_valid",
        st.stddev_from_p5_p95(F.col("p5"), F.col("p95")).alias("sigma"),
    )


def _q_url_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-corpus URL analytics: host extraction (parse_url, JVM-side) +
    per-host page/path counts — the by-domain grouping every crawl pipeline
    starts with. Also carries the P13/O4/O5 surface folded in from the
    retired site_prefixes query (VERDICT r03 #1): a startswith-derived
    prefix flag, a deterministic ORDER BY, and a LIMIT."""
    from pyspark.sql import functions as F

    from demeter_spark.sources import synth

    return (
        synth.pages(spark, sf_dir)
        .select(
            F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
            F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
            F.col("url").startswith("https://site1").alias("is_site1"),
        )
        .groupBy("host")
        .agg(
            F.count("*").alias("n_pages"),
            F.countDistinct("path").alias("n_paths"),
            F.max("is_site1").alias("has_site1_prefix"),
        )
        .orderBy("host")
        .limit(60)
    )


def _q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal resize planning: aspect-preserving target dims capped at
    max_side, computed from the Arrow-decoded headers."""
    from demeter_spark.sources import multimodal

    return multimodal.resize_meta(multimodal.media(spark, sf_dir), max_side=32)


def _q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame sampling over REAL MJPEG-in-AVI payloads (VERDICT
    r05 #3): a RIFF/AVI chunk walk + the stdlib JPEG decoder per frame,
    sampling every 2nd frame with the avih frame clock and per-frame pixel
    means. DC-only-flat frames keep the lossy-family codec bit-exact, so
    the oracle is closed form."""
    from demeter_spark.sources import multimodal

    return multimodal.sample_video_frames(
        multimodal.video_media(spark, sf_dir), stride=2
    )


def _q_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End of the dedup pipeline: keep ONE canonical doc per near-dup
    cluster (min doc id) with its cluster size — what actually ships to
    training."""
    from pyspark.sql import functions as F

    from demeter_spark.operators import dedup
    from demeter_spark.sources import synth

    corpus = synth.dedup_corpus(spark, sf_dir)
    comps = dedup.connected_components(
        dedup.minhash_lsh_pairs(corpus, 0.8), corpus
    )
    return comps.groupBy(F.col("cluster_id").alias("doc_id")).agg(
        F.count("*").alias("cluster_size")
    )


def _q_asof_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J13 as-of join: each purchase matched to the user's most recent click
    at-or-before it (backward inclusive). Union + single window — one
    shuffle on user_id, no range-join explosion; oracle is DuckDB's native
    ASOF LEFT JOIN."""
    from demeter_spark.operators.asof import asof_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    purchases = ev.filter("event_type = 'purchase'").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter("event_type = 'click'").select("user_id", "ts", "value")
    return asof_join(purchases, clicks, on="user_id").select(
        "event_id", "user_id", "r_ts", "r_value"
    )


def _q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A16 rollup: event counts at (type, user-bucket), (type), and grand
    total levels in one pass (partial aggregation at every level)."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "user_bucket", F.expr("user_id % 10")
    )
    return ev.rollup("event_type", "user_bucket").agg(
        F.count("*").alias("n_events"),
        F.min("event_id").alias("min_event_id"),
        F.max("event_id").alias("max_event_id"),
    )


def _q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTER formation: MinHash/LSH pairs -> connected components
    (iterative min-label propagation). Dedup at corpus scale keeps one doc
    per component, so the component id is the operator output; the oracle
    recomputes components with a recursive CTE over exhaustive pairs."""
    from demeter_spark.operators import dedup
    from demeter_spark.sources import synth

    corpus = synth.dedup_corpus(spark, sf_dir)
    pairs = dedup.minhash_lsh_pairs(corpus, 0.8)
    return dedup.connected_components(pairs, corpus)


def _q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text analysis, three operators joined on doc_id so the
    driver gate re-verifies all of them every round (VERDICT r03 #1):
    token/type counts + stopword ratio + language guess + quality flag
    (text_stats), whitespace + BPE-ish subword token counting
    (token_counts), raw/normalized content fingerprints (fingerprints), and
    the deterministic salted-hash train/valid/test assignment
    (sampling.split_assign, round 6 — md5-bucket ranges, engine-portable),
    and corpus-wide segment-level dedup stats (dedup.segment_dedup, the
    CCNet paragraph-dedup stage: first occurrence kept, md5 of the
    deduplicated text oracle-checked)."""
    from demeter_spark.operators import dedup, sampling, textstats
    from demeter_spark.sources import synth

    docs = synth.documents(spark, sf_dir)
    joined = (
        textstats.text_stats(docs)
        .join(textstats.token_counts(docs), "doc_id")
        .join(textstats.fingerprints(docs), "doc_id")
        .join(dedup.segment_dedup(docs), "doc_id")
    )
    return sampling.split_assign(joined, key_col="doc_id")


def _q_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc distinctive-term extraction (integer-exact TF-IDF ranking:
    tf desc, df asc, token asc — no float log, bit-stable across engines)."""
    from demeter_spark.operators import textstats
    from demeter_spark.sources import synth

    return textstats.top_terms(synth.documents(spark, sf_dir), k=3)


def _q_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full webtext filter-gate pass, three operators in one row (the
    registry rides the driver's 50-query budget, so the per-doc gates are
    folded like fingerprints into text_stats):

    - quality_flags: Gopher top-word/TTR/stopword gates (map-only),
    - repetition_stats: Gopher n-gram repetition gates — top-2-gram coverage
      + duplicate-3-gram fraction (map-only, zero Exchange pytest-asserted),
    - boilerplate_ngrams: CCNet-style corpus-shared-span fraction (distinct
      6-grams appearing in >= 3 docs; ONE gram-keyed shuffle, no all-pairs),
    - bigram_surprise: CCNet perplexity-filter analogue — corpus bigram LM
      counts, per-doc improbable-transition fraction, integer-exact so the
      oracle comparison is bit-stable (round 6),
    - pii_stats: C4/Dolma-style scrub signals — email/IPv4/phone match
      counts + md5 of the placeholder-redacted text, backslash-free
      patterns so both regex dialects read identical bytes (round 6).

    Joined 1:1 on doc_id (every synthetic doc has >= 10 words, so the
    gram explode drops nothing — pinned by the row-count gate)."""
    from demeter_spark.operators import textstats
    from demeter_spark.sources import synth

    docs = synth.documents(spark, sf_dir)
    rep = textstats.repetition_stats(docs).drop("n_words")
    bp = textstats.boilerplate_ngrams(docs)
    lm = textstats.bigram_surprise(docs)
    pii = textstats.pii_stats(docs)
    return (
        textstats.quality_flags(docs)
        .join(rep, "doc_id")
        .join(bp, "doc_id")
        .join(lm, "doc_id")
        .join(pii, "doc_id")
    )


def _q_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-URL canonicalization (case/port/www/fragment/tracking-params/
    trailing-slash normalization + param sort) over closed-form dirty URLs;
    the oracle derives the expected canonical INDEPENDENTLY from the
    generator parameters, not by mirroring the regex pipeline."""
    from demeter_spark.operators.textstats import canonical_url_expr
    from demeter_spark.sources import synth

    dirty = synth.documents(spark, sf_dir).selectExpr(
        "doc_id",
        """concat('HTTPS://WWW.Site', CAST(doc_id % 50 AS STRING),
                  '.Example:443/p/', CAST(doc_id AS STRING),
                  CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END,
                  CASE WHEN doc_id % 3 = 0 THEN '?utm_source=x&b=2&a=1'
                       WHEN doc_id % 3 = 1 THEN '?gclid=abc' ELSE '' END,
                  CASE WHEN doc_id % 4 = 0 THEN '#frag' ELSE '' END) AS url""",
    )
    return dirty.selectExpr(
        "doc_id", "url", canonical_url_expr("url") + " AS url_canonical"
    )


def _q_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 (queries: vec_id < 10) — exactness baseline."""
    from demeter_spark.operators import simsearch
    from demeter_spark.sources import synth
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return simsearch.brute_force_topk(emb, emb.filter(F.col("vec_id") < 10), 5)


def _q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cos >= 0.999 — engineered exact dups).

    Wired through centroid blocking (the 100 TB path: inverted-list self-join,
    n_probe=2); the oracle is the exhaustive pair scan, so the hash match
    proves blocking loses none of the qualifying pairs."""
    from demeter_spark.operators import simsearch
    from demeter_spark.sources import synth

    return simsearch.embedding_near_dup_blocked(synth.emb_corpus(spark, sf_dir))


def _q_ann_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True-IVF ANN: nearest-centroid assignment + multi-probe search;
    approximate, so rows-only driver check + pytest recall vs brute force."""
    from demeter_spark.operators import simsearch
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return simsearch.ivf_multiprobe_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=5, n_probe=3
    )


def _q_events_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-windowed event aggregation, BOTH flavors in one result so the
    driver gate re-verifies each every round (VERDICT r03 #1): tumbling
    1-hour windows per event type (batch view of the streaming agg, F.window)
    and 30-min-inactivity-gap sessionization per user (lag + cumulative-sum
    window frames, W3). Rows are discriminated by ``kind``; the session half
    carries NULL sum_value, the tumbling half NULL sid."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    tum = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.lit("tumbling").alias("kind"),
            F.col("event_type").alias("k"),
            F.lit(None).cast("bigint").alias("sid"),
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "n_events",
            "sum_value",
        )
    )
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w_user))
    new_session = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = (
        ev.withColumn(
            "session_id",
            F.sum(new_session).over(
                w_user.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select(
            F.lit("session").alias("kind"),
            F.col("user_id").cast("string").alias("k"),
            F.col("session_id").cast("bigint").alias("sid"),
            F.col("session_start").alias("win_start"),
            F.col("session_end").alias("win_end"),
            "n_events",
            F.lit(None).cast("double").alias("sum_value"),
        )
    )
    return tum.unionByName(sess)


def _q_remap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 + A13: pixel value -> catchment id via broadcast dim lookup (miss
    -> NULL) + pixel-count histogram per catchment."""
    from demeter_spark.sources import synth
    from pyspark.sql import functions as F

    cells = synth.raster_cells(spark).filter(F.col("dataset") == "elevation")
    dim = spark.range(10).selectExpr(
        "id AS vid", "1000 + id * 7 AS catchment_id"
    )
    return (
        cells.withColumn("vid", (F.col("value").cast("bigint") % 13))
        .join(F.broadcast(dim), "vid", "left")
        .groupBy("catchment_id")
        .agg(F.count("*").alias("n_cells"))
    )


def _q_parcel_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14: bounds aggregate (total_bounds analogue) per parcel kind."""
    from demeter_spark.sources import synth
    from pyspark.sql import functions as F

    return synth.parcels(spark).groupBy("kind").agg(
        F.min("xmin").alias("bx0"),
        F.min("ymin").alias("by0"),
        F.max("xmax").alias("bx1"),
        F.max("ymax").alias("by1"),
    )


_SRC_GRID = dict(ox=0.0, oy=0.0, rx=0.25, ry=0.25, nx=144, ny=128)
_DST_GRID = dict(ox=-32.0, oy=-16.0, rx=6.0, ry=4.0, nx=96, ny=64)
_WARP_AFFINE = (1.0 / 64.0, 0.5, 1.0 / 16.0, 1.0)  # dst meters -> src degrees


def _warp_setup(spark: SparkSession):
    from demeter_spark.operators import reproject as rp
    from demeter_spark.sources import synth

    src = synth.raster_cells(spark).filter("dataset = 'elevation'")
    return (
        src,
        rp.Grid(**_SRC_GRID),
        rp.Grid(**_DST_GRID),
        rp.affine_transform(*_WARP_AFFINE),
    )


def _q_reproject_kernels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R6 general case: cross-CRS warp (affine synthetic CRS, dyadic coeffs)
    with ALL FOUR interpolating kernels side by side per destination pixel —
    nearest (destination-driven equi-join, zero Python), null-aware bilinear
    (corner explode + one join + fixed-order combine), cubic convolution
    (Keys a=-0.5, the rasterio Resampling.cubic default; 16-neighbor join,
    combine text shared verbatim with the oracle, NULL where the 4x4 stencil
    has any masked pixel) and cubic B-spline (smoothing; same stencil shape).

    One query so the driver's 50-row gate re-verifies every kernel every
    round (VERDICT r03 'Next round' #1); each kernel's value column is part
    of the row hash, so any single-kernel regression still fails the gate."""
    from demeter_spark.operators import reproject as rp

    src, sg, dg, t = _warp_setup(spark)
    nn = rp.reproject_nearest(src, sg, dg, t, broadcast_src=True)
    bl = rp.reproject_bilinear(src, sg, dg, t, broadcast_src=True)
    # the two cubic kernels SHARE one 16-neighbor join/pivot: both combine
    # expressions (texts unchanged from their oracles) evaluate over the
    # same _stencil16_agg output, halving the stencil-join work per round
    agg = rp._stencil16_agg(src, sg, dg, t, "value", True)
    cu_expr, cu_valid = rp.cubic_combine_expr(
        "_fx", "_fy", lambda o, p: f"_v{o}{p}"
    )
    cs_expr, cs_valid = rp.cubic_combine_expr(
        "_fx", "_fy", lambda o, p: f"_v{o}{p}",
        weights=rp.cubic_spline_weight_exprs,
    )
    stencils = agg.selectExpr(
        "ix",
        "iy",
        f"CASE WHEN {cu_valid} THEN {cu_expr} END AS v_cubic",
        f"CASE WHEN {cs_valid} THEN {cs_expr} END AS v_cubic_spline",
    )
    return (
        nn.withColumnRenamed("value", "v_nearest")
        .join(bl.withColumnRenamed("value", "v_bilinear"), ["ix", "iy"])
        .join(stencils, ["ix", "iy"])
    )


_ALBERS = dict(phi1=8.0, phi2=24.0, phi0=16.0, lon0=18.0)
_ALBERS_DST = dict(ox=-1536000.0, oy=-1280000.0, rx=32000.0, ry=32000.0,
                   nx=96, ny=80)
# ellipsoidal transverse-Mercator destination grid (same 96x80 pixel index
# space, TM meters): inverse lands inside the source extent with >=3.1e-4
# cells of floor() margin (tests/test_ellipsoidal.py)
_TM_DST = dict(ox=-1200000.0, oy=200000.0, rx=25000.0, ry=40000.0,
               nx=96, ny=80)
# ellipsoidal Lambert-Conformal-Conic destination grid (same 96x80 pixel
# index space, LCC meters, std parallels 8/24 like _ALBERS): inverse lands
# inside the source extent with >=2.0e-4 cells of floor() margin
# (tests/test_lcc.py) — enough to absorb the pow(_, 1/n) ~1-ulp
# cross-engine budget on top of the trig calls
_LCC_DST = dict(ox=-1500000.0, oy=-1396750.0, rx=31250.0, ry=36250.0,
                nx=96, ny=80)


def _q_reproject_albers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R6 through a CONIC CRS (VERDICT r03 #5 + r04 #2): nearest-kernel warp
    of the elevation raster onto an Albers equal-area grid, through BOTH the
    spherical closed form (v_sph) and the GRS80 ELLIPSOIDAL Snyder series
    (v_ell, closed-form authalic-latitude inverse) side by side per
    destination pixel — std parallels 8/24, origin 16N 18E, the EPSG:5070
    construction scaled to the synthetic world's extent (reference:
    demeter/api.py:183-219 to_crs(5070), which is GRS80-ellipsoidal via
    pyproj) — plus a THIRD column, v_tm_ell, the nearest warp through the
    ellipsoidal TRANSVERSE MERCATOR inverse (the EPSG:269xx UTM datum math,
    reference api.py:132-151 to_crs(utm)) on its own meters grid joined on
    the shared pixel index space — plus a FOURTH column, v_lcc_ell, the
    ellipsoidal LAMBERT CONFORMAL CONIC inverse (the SPCS/StatePlane
    Lambert construction, Snyder 15 + conformal-latitude series). Nearest
    is the oracle-able kernel through trig: only floor() agreement is
    needed and every source coordinate clears cell boundaries by >=5e-5
    cells for all four warps (asserted in tests/test_albers.py,
    tests/test_ellipsoidal.py and tests/test_lcc.py — the LCC margin also
    absorbs its pow(_, 1/n) ulp budget); interpolating kernels through the
    conic are pytest-verified. All four value columns ride the row hash,
    so a regression in any datum's math fails the gate."""
    from demeter_spark.operators import reproject as rp
    from demeter_spark.sources import synth

    src = synth.raster_cells(spark).filter("dataset = 'elevation'")
    sg, dg = rp.Grid(**_SRC_GRID), rp.Grid(**_ALBERS_DST)
    sph = rp.reproject_nearest(
        src, sg, dg, rp.albers_to_lonlat(**_ALBERS), broadcast_src=True
    )
    ell = rp.reproject_nearest(
        src, sg, dg, rp.albers_ell_to_lonlat(**_ALBERS), broadcast_src=True
    )
    # third datum/projection family in the same row: ellipsoidal transverse
    # Mercator (the EPSG:269xx UTM construction) on its own meters grid,
    # joined on the shared 96x80 pixel index space
    tm = rp.reproject_nearest(
        src, sg, rp.Grid(**_TM_DST),
        rp.tm_ell_to_lonlat(lon0=_ALBERS["lon0"]), broadcast_src=True,
    )
    # fourth datum/projection family: ellipsoidal Lambert Conformal Conic
    # (the SPCS/StatePlane Lambert construction, Snyder 15) on its own
    # meters grid, same pixel index space
    lcc = rp.reproject_nearest(
        src, sg, rp.Grid(**_LCC_DST),
        rp.lcc_ell_to_lonlat(**_ALBERS), broadcast_src=True,
    )
    return (
        sph.withColumnRenamed("value", "v_sph")
        .join(ell.withColumnRenamed("value", "v_ell"), ["ix", "iy"])
        .join(tm.withColumnRenamed("value", "v_tm_ell"), ["ix", "iy"])
        .join(lcc.withColumnRenamed("value", "v_lcc_ell"), ["ix", "iy"])
    )


def _albers_oracle_sql() -> str:
    from demeter_spark.operators.reproject import (
        albers_ell_inverse_sql,
        albers_inverse_sql,
        lcc_ell_inverse_sql,
        tm_ell_inverse_sql,
    )

    x = "(-1536000e0 + (x.ix + 0.5e0) * 32000e0)"
    y = "(-1280000e0 + (y.iy + 0.5e0) * 32000e0)"
    lon_s, lat_s = albers_inverse_sql(x, y, **_ALBERS)
    lon_e, lat_e = albers_ell_inverse_sql(x, y, **_ALBERS)
    tx = "(-1200000e0 + (x.ix + 0.5e0) * 25000e0)"
    ty = "(200000e0 + (y.iy + 0.5e0) * 40000e0)"
    lon_t, lat_t = tm_ell_inverse_sql(tx, ty, lon0=_ALBERS["lon0"])
    lx = "(-1500000e0 + (x.ix + 0.5e0) * 31250e0)"
    ly = "(-1396750e0 + (y.iy + 0.5e0) * 36250e0)"
    lon_l, lat_l = lcc_ell_inverse_sql(lx, ly, **_ALBERS)
    return f"""
            SELECT d.ix, d.iy, s.value AS v_sph, e.value AS v_ell,
                   t.value AS v_tm_ell, l.value AS v_lcc_ell
            FROM (
              SELECT x.ix, y.iy,
                     CAST(floor(({lon_s} - 0e0) / 0.25e0) AS BIGINT) AS six,
                     CAST(floor(({lat_s} - 0e0) / 0.25e0) AS BIGINT) AS siy,
                     CAST(floor(({lon_e} - 0e0) / 0.25e0) AS BIGINT) AS eix,
                     CAST(floor(({lat_e} - 0e0) / 0.25e0) AS BIGINT) AS eiy,
                     CAST(floor(({lon_t} - 0e0) / 0.25e0) AS BIGINT) AS tix,
                     CAST(floor(({lat_t} - 0e0) / 0.25e0) AS BIGINT) AS tiy,
                     CAST(floor(({lon_l} - 0e0) / 0.25e0) AS BIGINT) AS lix,
                     CAST(floor(({lat_l} - 0e0) / 0.25e0) AS BIGINT) AS liy
              FROM range(96) x(ix), range(80) y(iy)) d
            LEFT JOIN (SELECT ix, iy, value FROM raster_cells
                       WHERE dataset = 'elevation') s
              ON s.ix = d.six AND s.iy = d.siy
            LEFT JOIN (SELECT ix, iy, value FROM raster_cells
                       WHERE dataset = 'elevation') e
              ON e.ix = d.eix AND e.iy = d.eiy
            LEFT JOIN (SELECT ix, iy, value FROM raster_cells
                       WHERE dataset = 'elevation') t
              ON t.ix = d.tix AND t.iy = d.tiy
            LEFT JOIN (SELECT ix, iy, value FROM raster_cells
                       WHERE dataset = 'elevation') l
              ON l.ix = d.lix AND l.iy = d.liy
    """


def _q_reproject_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R6 source-driven stat family (min/max/sum/rms/count downsampling)."""
    from demeter_spark.operators import reproject as rp
    from demeter_spark.sources import synth

    src = synth.raster_cells(spark).filter("dataset = 'elevation'")
    sg = rp.Grid(**_SRC_GRID)
    dst = rp.Grid(0.0, 0.0, 1.0, 1.0, 36, 32)
    return rp.reproject_aggregate(src, sg, dst)


def _stencil_cte(alias: str, weights=None) -> str:
    """16 LEFT JOINs + the SAME combine text the stencil warp compiles,
    as a CTE body over the shared ``corner``/``ev`` CTEs; ``alias`` keeps
    the join aliases of the two cubic kernels from colliding."""
    from demeter_spark.operators.reproject import cubic_combine_expr

    joins = "\n              ".join(
        f"LEFT JOIN ev {alias}{o}{p} ON {alias}{o}{p}.ix = c.i0 + {o - 1} "
        f"AND {alias}{o}{p}.iy = c.j0 + {p - 1}"
        for o in range(4)
        for p in range(4)
    )
    value_expr, valid = cubic_combine_expr(
        "fx", "fy", lambda o, p: f"{alias}{o}{p}.value", weights=weights
    )
    return f"""
              SELECT c.ix, c.iy,
                     CASE WHEN {valid} THEN {value_expr} END AS value
              FROM corner c
              {joins}"""


def _split_oracle_case() -> str:
    from demeter_spark.operators import sampling

    return sampling.split_assign_oracle_case(key_col="doc_id")


def _geocode_oracle_sql() -> str:
    """page_points + the H3-style hex id (bit-exact: hexgrid.hex_of_sql
    emits the same float64 arithmetic the Catalyst expression runs)."""
    from demeter_spark.functions import hexgrid as hx

    return (
        "SELECT url, doc_id, place_id, lon, lat, "
        f"{hx.hex_of_sql('lon', 'lat', 7)} AS hex_id FROM page_points"
    )


def _kernels_oracle_sql() -> str:
    """All four interpolating kernels per destination pixel, each kernel's
    expression text unchanged from its previously-verified standalone oracle
    (bit-parity is preserved by identical parse trees; only the final join
    on integer pixel keys is new)."""
    from demeter_spark.operators.reproject import cubic_spline_weight_exprs

    return f"""
            , dstb AS (
              SELECT x.ix, y.iy,
                     (0.015625e0 * (-32e0 + (x.ix + 0.5e0) * 6e0) + 0.5e0)
                       / 0.25e0 - 0.5e0 AS gx,
                     (0.0625e0 * (-16e0 + (y.iy + 0.5e0) * 4e0) + 1e0)
                       / 0.25e0 - 0.5e0 AS gy
              FROM range(96) x(ix), range(64) y(iy)),
            corner AS (
              SELECT ix, iy, gx - floor(gx) AS fx, gy - floor(gy) AS fy,
                     CAST(floor(gx) AS BIGINT) AS i0,
                     CAST(floor(gy) AS BIGINT) AS j0
              FROM dstb),
            ev AS (SELECT ix, iy, value FROM raster_cells
                   WHERE dataset = 'elevation'),
            nn AS (
              SELECT d.ix, d.iy, s.value
              FROM (
                SELECT x.ix, y.iy,
                       CAST(floor((0.015625e0 * (-32e0 + (x.ix + 0.5e0) * 6e0)
                                   + 0.5e0) / 0.25e0) AS BIGINT) AS six,
                       CAST(floor((0.0625e0 * (-16e0 + (y.iy + 0.5e0) * 4e0)
                                   + 1e0) / 0.25e0) AS BIGINT) AS siy
                FROM range(96) x(ix), range(64) y(iy)) d
              LEFT JOIN ev s ON s.ix = d.six AND s.iy = d.siy),
            bl AS (
              SELECT ix, iy, CASE WHEN den > 0 THEN num / den END AS value
              FROM (
                SELECT c.ix, c.iy,
                  coalesce((1e0-fx)*(1e0-fy) * v00.value, 0e0)
                    + coalesce(fx*(1e0-fy) * v10.value, 0e0)
                    + coalesce((1e0-fx)*fy * v01.value, 0e0)
                    + coalesce(fx*fy * v11.value, 0e0) AS num,
                  (CASE WHEN v00.value IS NOT NULL THEN (1e0-fx)*(1e0-fy) ELSE 0e0 END)
                    + (CASE WHEN v10.value IS NOT NULL THEN fx*(1e0-fy) ELSE 0e0 END)
                    + (CASE WHEN v01.value IS NOT NULL THEN (1e0-fx)*fy ELSE 0e0 END)
                    + (CASE WHEN v11.value IS NOT NULL THEN fx*fy ELSE 0e0 END) AS den
                FROM corner c
                LEFT JOIN ev v00 ON v00.ix = c.i0     AND v00.iy = c.j0
                LEFT JOIN ev v10 ON v10.ix = c.i0 + 1 AND v10.iy = c.j0
                LEFT JOIN ev v01 ON v01.ix = c.i0     AND v01.iy = c.j0 + 1
                LEFT JOIN ev v11 ON v11.ix = c.i0 + 1 AND v11.iy = c.j0 + 1)),
            cu AS ({_stencil_cte("k")}),
            cs AS ({_stencil_cte("m", weights=cubic_spline_weight_exprs)})
            SELECT ix, iy, nn.value AS v_nearest, bl.value AS v_bilinear,
                   cu.value AS v_cubic, cs.value AS v_cubic_spline
            FROM nn
            JOIN bl USING (ix, iy)
            JOIN cu USING (ix, iy)
            JOIN cs USING (ix, iy)
    """


def _q_reproject_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R6 order-statistic kernels (VERDICT r03 #7): rasterio Resampling.mode
    /.med/.q1/.q3 as one sorted-array pass per destination cell, explicit
    rank/tie semantics shared with the oracle (engine-native quantile
    aggregates interpolate differently and are deliberately avoided)."""
    from demeter_spark.operators import reproject as rp
    from demeter_spark.sources import synth

    src = synth.raster_cells(spark).filter("dataset = 'elevation'")
    return rp.reproject_order_stats(
        src,
        rp.Grid(**_SRC_GRID),
        rp.Grid(0.0, 0.0, 1.0, 1.0, 36, 32),
        mode_quantize=8.0,
    )


def _quantiles_oracle_sql() -> str:
    from demeter_spark.operators.reproject import order_stat_oracle_exprs

    k = order_stat_oracle_exprs("s")
    kq = order_stat_oracle_exprs("sq")
    return f"""
            , cellagg AS (
              SELECT CAST(floor(cx) AS BIGINT) AS ix,
                     CAST(floor(cy) AS BIGINT) AS iy,
                     list_sort(list(value) FILTER (WHERE value IS NOT NULL)) AS s,
                     list_sort(list(floor(value / 8e0) * 8e0)
                               FILTER (WHERE value IS NOT NULL)) AS sq,
                     count(value) AS n_valid
              FROM raster_cells WHERE dataset = 'elevation'
              GROUP BY 1, 2)
            SELECT ix, iy,
                   {k["med"]} AS med_value,
                   {k["q1"]} AS q1_value,
                   {k["q3"]} AS q3_value,
                   {kq["mode"]} AS mode_value,
                   CAST(n_valid AS INT) AS n_valid
            FROM cellagg
    """


def _q_carbon_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8+A9 variance algebra (demeter/utils.py:59-103): per-layer sigma from
    p5/p95, squared-weight layer averaging of variances, depth-weighted
    means, then Var(XY) product combination per cell. Layers are pivoted so
    every float combine is one fixed-order expression — bit-reproducible by
    the SQL oracle."""
    from pyspark.sql import functions as F

    from demeter_spark.operators import statistics as st
    from demeter_spark.sources import synth

    om = synth.raster_cells(spark).filter("dataset = 'om'")
    piv = om.groupBy("ix", "iy").agg(
        *[
            F.max(F.when(F.col("depth_lo") == d, F.col("value"))).alias(f"v{d}")
            for d in (0, 10, 30)
        ]
    )

    def soc_var(v):
        s = st.stddev_from_p5_p95(v * F.lit(0.75), v * F.lit(1.25))
        return s * s

    def bd_mean(v):
        return v / F.lit(16.0) + F.lit(1.0)

    def bd_var(v):
        m = bd_mean(v)
        s = st.stddev_from_p5_p95(m * F.lit(0.875), m * F.lit(1.125))
        return s * s

    v0, v10, v30 = F.col("v0"), F.col("v10"), F.col("v30")
    socm = (v0 * F.lit(10.0) + v10 * F.lit(20.0) + v30 * F.lit(30.0)) / F.lit(60.0)
    socv = (
        soc_var(v0) * F.lit(100.0)
        + soc_var(v10) * F.lit(400.0)
        + soc_var(v30) * F.lit(900.0)
    ) / F.lit(1400.0)
    bdm = (
        bd_mean(v0) * F.lit(10.0)
        + bd_mean(v10) * F.lit(20.0)
        + bd_mean(v30) * F.lit(30.0)
    ) / F.lit(60.0)
    bdv = (
        bd_var(v0) * F.lit(100.0)
        + bd_var(v10) * F.lit(400.0)
        + bd_var(v30) * F.lit(900.0)
    ) / F.lit(1400.0)
    return piv.select(
        "ix",
        "iy",
        st.carbon_stock_mean(socm, bdm).alias("stock_mean"),
        st.carbon_stock_stddev(socm, F.sqrt(socv), bdm, F.sqrt(bdv)).alias(
            "stock_stddev"
        ),
    )


def _q_geojson_parcels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 GeoJSON ingestion end-to-end: closed-form Feature strings (Polygon
    with holes every 10th, MultiPolygon every 7th) -> from_json coordinate
    parse -> WKT assembly (pure Catalyst) -> P11 type guard -> vectorized
    bbox derivation. Output is numeric (dyadic coords round-trip exactly
    through JSON text), so the oracle recomputes bboxes closed-form."""
    from pyspark.sql import functions as F

    from demeter_spark.sources import geojson

    n = 500
    feats = spark.range(n).selectExpr(
        "id AS fid",
        "CAST(id AS DOUBLE) * 0.5e0 AS x0",
        "CAST(id % 16 AS DOUBLE) * 0.25e0 AS y0",
    ).selectExpr(
        "fid",
        """CASE
           WHEN fid % 7 = 0 THEN concat(
             '{"type": "Feature", "properties": {"name": "f', CAST(fid AS STRING),
             '"}, "geometry": {"type": "MultiPolygon", "coordinates": [[[',
             '[', CAST(x0 AS STRING), ', ', CAST(y0 AS STRING), '], ',
             '[', CAST(x0 + 0.5e0 AS STRING), ', ', CAST(y0 AS STRING), '], ',
             '[', CAST(x0 + 0.5e0 AS STRING), ', ', CAST(y0 + 0.25e0 AS STRING), '], ',
             '[', CAST(x0 AS STRING), ', ', CAST(y0 AS STRING), ']]], [[',
             '[', CAST(x0 + 100e0 AS STRING), ', ', CAST(y0 AS STRING), '], ',
             '[', CAST(x0 + 100.5e0 AS STRING), ', ', CAST(y0 AS STRING), '], ',
             '[', CAST(x0 + 100.5e0 AS STRING), ', ', CAST(y0 + 0.25e0 AS STRING), '], ',
             '[', CAST(x0 + 100e0 AS STRING), ', ', CAST(y0 AS STRING), ']]]]}}')
           WHEN fid % 10 = 0 THEN concat(
             '{"type": "Feature", "properties": {"name": "f', CAST(fid AS STRING),
             '"}, "geometry": {"type": "Polygon", "coordinates": [[',
             '[', CAST(x0 AS STRING), ', ', CAST(y0 AS STRING), '], ',
             '[', CAST(x0 + 0.5e0 AS STRING), ', ', CAST(y0 AS STRING), '], ',
             '[', CAST(x0 + 0.5e0 AS STRING), ', ', CAST(y0 + 0.25e0 AS STRING), '], ',
             '[', CAST(x0 AS STRING), ', ', CAST(y0 AS STRING), ']], [',
             '[', CAST(x0 + 0.125e0 AS STRING), ', ', CAST(y0 + 0.0625e0 AS STRING), '], ',
             '[', CAST(x0 + 0.25e0 AS STRING), ', ', CAST(y0 + 0.0625e0 AS STRING), '], ',
             '[', CAST(x0 + 0.25e0 AS STRING), ', ', CAST(y0 + 0.125e0 AS STRING), '], ',
             '[', CAST(x0 + 0.125e0 AS STRING), ', ', CAST(y0 + 0.0625e0 AS STRING), ']]]}}')
           ELSE concat(
             '{"type": "Feature", "properties": {"name": "f', CAST(fid AS STRING),
             '"}, "geometry": {"type": "Polygon", "coordinates": [[',
             '[', CAST(x0 AS STRING), ', ', CAST(y0 AS STRING), '], ',
             '[', CAST(x0 + 0.5e0 AS STRING), ', ', CAST(y0 AS STRING), '], ',
             '[', CAST(x0 + 0.5e0 AS STRING), ', ', CAST(y0 + 0.25e0 AS STRING), '], ',
             '[', CAST(x0 AS STRING), ', ', CAST(y0 AS STRING), ']]]}}')
           END AS feature""",
    )
    parsed = geojson.features(feats, "feature", {"name": "string"})
    guarded = geojson.assert_geometry_types(parsed)
    return geojson.with_bbox(guarded, "geom_wkt").select(
        "fid", "name", "geom_type", "n_parts", "xmin", "ymin", "xmax", "ymax"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "extract_text": _q_extract_text,
        "geocode_points": _q_geocode,
        "reproject_kernels": _q_reproject_kernels,
        "reproject_albers": _q_reproject_albers,
        "reproject_agg_stats": _q_reproject_agg,
        "reproject_agg_quantiles": _q_reproject_quantiles,
        "carbon_stock_stats": _q_carbon_stock,
        "geojson_parcels": _q_geojson_parcels,
        "spatial_join": _q_spatial_join,
        # spatial_join_compact retired r06 (J1 compact path pytest-covered:
        # tests/test_spatial_join.py compact=True vs DuckDB truth) to stay
        # under the 50-row driver gate; lang_counts (smoke) likewise —
        # replaced by web_graph + warc_roundtrip.
        "web_graph": _q_web_graph,
        "warc_roundtrip": _q_warc_roundtrip,
        "knn_kring": _q_knn,
        "primary_soil_components": _q_primary_soil,
        "empty_parcels": _q_empty_parcels,
        "zonal_stats": _q_zonal_stats,
        "zonal_stats_touched": _q_zonal_stats_touched,
        "zonal_stats_weighted": _q_zonal_stats_weighted,
        "zonal_depth_weighted": _q_zonal_depth_weighted,
        "tile_merge": _q_tile_merge,
        "merge_conflicts": _q_merge_conflicts,
        "point_enrichment": _q_point_enrichment,
        "regrid_coarsen": _q_regrid_coarsen,
        "regrid_refine": _q_regrid_refine,
        "media_features": _q_media_features,
        "media_real_decode": _q_media_real_decode,
        "tiff_decode": _q_tiff_decode,
        "ndvi_cells": _q_ndvi_cells,
        "ndvi_stats": _q_ndvi_stats,
        "dedup_exact": _q_dedup_exact,
        "dedup_jaccard": _q_dedup_jaccard,
        "dedup_minhash": _q_dedup_minhash,
        "simhash_pairs": _q_simhash_pairs,
        "dedup_clusters": _q_dedup_clusters,
        "asof_clicks": _q_asof_clicks,
        "url_hosts": _q_url_hosts,
        "soil_quantile_sigma": _q_soil_quantile_sigma,
        "media_resize": _q_media_resize,
        "frame_sample": _q_frame_sample,
        "dedup_keep": _q_dedup_keep,
        "events_rollup": _q_events_rollup,
        "text_stats": _q_text_stats,
        "quality_flags": _q_quality_flags,
        "top_terms": _q_top_terms,
        "url_canonical": _q_url_canonical,
        "ann_bruteforce": _q_ann_bruteforce,
        "ann_ivf_multiprobe": _q_ann_ivf_multiprobe,
        "dedup_embedding": _q_dedup_embedding,
        "remap_histogram": _q_remap_histogram,
        "parcel_bounds": _q_parcel_bounds,
        "events_windows": _q_events_windows,
    }


def _contains_pred(px: str, py: str) -> str:
    """Closed-form point-in-parcel truth for the synthetic parcel kinds,
    parameterized over the point expressions."""
    return f"""{px} > pa.xmin AND {px} < pa.xmax AND {py} > pa.ymin AND {py} < pa.ymax
         AND (pa.kind = 'rect'
              OR (pa.kind = 'diamond' AND
                  abs({px} - pa.cx) * pa.b + abs({py} - pa.cy) * pa.a < pa.a * pa.b)
              OR (pa.kind = 'holed' AND NOT ({px} > pa.cx AND {px} < pa.a
                                             AND {py} > pa.cy AND {py} < pa.b)))"""


_CONTAINS = _contains_pred("c.cx", "c.cy")

# all_touched=True truth (rasterize_touched semantics): a 0.25-degree pixel
# box is touched iff the polygon's INTERIOR overlaps its open box —
# closed-form per synthetic parcel kind. rect: open-interval overlap per
# axis; diamond: the weighted-L1 infimum over the closed box (attained at
# the clamped nearest point) must be strictly inside; holed: outer-rect
# overlap minus boxes whose outer-clipped extent sits inside the CLOSED hole
# (pa.cx/pa.cy/pa.a/pa.b carry the hole bounds for the holed parcel).
_TOUCHES = """(c.ix + 1) * 0.25e0 > pa.xmin AND c.ix * 0.25e0 < pa.xmax
         AND (c.iy + 1) * 0.25e0 > pa.ymin AND c.iy * 0.25e0 < pa.ymax
         AND (pa.kind = 'rect'
              OR (pa.kind = 'diamond' AND
                  greatest(0e0, pa.cx - (c.ix + 1) * 0.25e0,
                           c.ix * 0.25e0 - pa.cx) * pa.b
                + greatest(0e0, pa.cy - (c.iy + 1) * 0.25e0,
                           c.iy * 0.25e0 - pa.cy) * pa.a
                  < pa.a * pa.b)
              OR (pa.kind = 'holed' AND NOT (
                      greatest(c.ix * 0.25e0, pa.xmin) >= pa.cx
                  AND least((c.ix + 1) * 0.25e0, pa.xmax) <= pa.a
                  AND greatest(c.iy * 0.25e0, pa.ymin) >= pa.cy
                  AND least((c.iy + 1) * 0.25e0, pa.ymax) <= pa.b)))"""


def _jaccard_oracle_tail(threshold: float, max_df: int | None = None) -> str:
    """Exhaustive word-3-gram Jaccard pairs over dedup_corpus (CTE tail).
    ``max_df`` mirrors jaccard_pairs' shingle document-frequency cap."""
    src = "doc_shingles"
    cap = ""
    if max_df is not None:
        src = "capped_shingles"
        cap = f"""
            , capped_shingles AS (
                SELECT s.doc_id, s.shingle FROM doc_shingles s
                JOIN (SELECT shingle FROM doc_shingles
                      GROUP BY shingle HAVING count(*) <= {max_df}) f
                USING (shingle)
            )"""
    return f"""{cap}
            , sizes AS (
                SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh
                FROM {src} GROUP BY doc_id
            ),
            inter AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
                FROM {src} a
                JOIN {src} b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id
            )
            SELECT doc_a, doc_b,
                   CAST(n_inter AS DOUBLE) / (na.n_sh + nb.n_sh - n_inter) AS jaccard
            FROM inter
            JOIN sizes na ON inter.doc_a = na.doc_id
            JOIN sizes nb ON inter.doc_b = nb.doc_id
            WHERE CAST(n_inter AS DOUBLE) / (na.n_sh + nb.n_sh - n_inter) >= {threshold}
    """


def _ann_oracle_tail(pruned: bool) -> str:
    """Cosine top-5 for vec_id < 10 (optionally cell-pruned by label)."""
    cell = "AND c.label = q.label" if pruned else ""
    return f"""
            SELECT query_id, neighbor_id, rnk FROM (
              SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                     row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(
                                  q.embedding::DOUBLE[], c.embedding::DOUBLE[]
                                ) DESC, c.vec_id
                     ) AS rnk
              FROM embeddings q, embeddings c
              WHERE q.vec_id < 10 AND c.vec_id != q.vec_id {cell}
            ) WHERE rnk <= 5
    """


def oracle_sql() -> dict[str, str]:
    from demeter_spark.sources.multimodal import MEDIA_ORACLE_SQL as _MEDIA_ORACLE
    from demeter_spark.sources.multimodal import (
        REAL_MEDIA_ORACLE_SQL as _REAL_MEDIA_ORACLE,
    )
    from demeter_spark.sources.multimodal import TIFF_ORACLE_SQL as _TIFF_ORACLE
    from demeter_spark.sources.synth import HTML_PREFIX as _HTML_PREFIX
    from demeter_spark.sources.synth import HTML_SUFFIX as _HTML_SUFFIX
    from demeter_spark.sources.synth import oracle_query

    return {
        "extract_text": oracle_query("SELECT url, text FROM pages", ("pages",)),
        "geocode_points": oracle_query(_geocode_oracle_sql()),
        "reproject_kernels": oracle_query(
            _kernels_oracle_sql(), ("raster_cells",)
        ),
        "reproject_albers": oracle_query(
            _albers_oracle_sql(), ("raster_cells",)
        ),
        "reproject_agg_quantiles": oracle_query(
            _quantiles_oracle_sql(), ("raster_cells",)
        ),
        "geojson_parcels": oracle_query(
            """
            SELECT fid, 'f' || CAST(fid AS STRING) AS name,
                   CASE WHEN fid % 7 = 0 THEN 'MultiPolygon'
                        ELSE 'Polygon' END AS geom_type,
                   CAST(CASE WHEN fid % 7 = 0 THEN 2 ELSE 1 END AS INT) AS n_parts,
                   CAST(fid AS DOUBLE) * 0.5e0 AS xmin,
                   CAST(fid % 16 AS DOUBLE) * 0.25e0 AS ymin,
                   CASE WHEN fid % 7 = 0
                        THEN CAST(fid AS DOUBLE) * 0.5e0 + 100.5e0
                        ELSE CAST(fid AS DOUBLE) * 0.5e0 + 0.5e0 END AS xmax,
                   CAST(fid % 16 AS DOUBLE) * 0.25e0 + 0.25e0 AS ymax
            FROM range(500) r(fid)
            """,
            (),
        ),
        "carbon_stock_stats": oracle_query(
            """
            , om3 AS (
              SELECT ix, iy,
                     max(CASE WHEN depth_lo = 0 THEN value END) AS v0,
                     max(CASE WHEN depth_lo = 10 THEN value END) AS v10,
                     max(CASE WHEN depth_lo = 30 THEN value END) AS v30
              FROM raster_cells WHERE dataset = 'om' GROUP BY ix, iy),
            lay AS (
              SELECT ix, iy,
                (v0 * 10e0 + v10 * 20e0 + v30 * 30e0) / 60e0 AS socm,
                (((v0 * 0.75e0 - v0 * 1.25e0) / 3.29e0)
                   * ((v0 * 0.75e0 - v0 * 1.25e0) / 3.29e0) * 100e0
                 + ((v10 * 0.75e0 - v10 * 1.25e0) / 3.29e0)
                   * ((v10 * 0.75e0 - v10 * 1.25e0) / 3.29e0) * 400e0
                 + ((v30 * 0.75e0 - v30 * 1.25e0) / 3.29e0)
                   * ((v30 * 0.75e0 - v30 * 1.25e0) / 3.29e0) * 900e0
                ) / 1400e0 AS socv,
                ((v0 / 16e0 + 1e0) * 10e0 + (v10 / 16e0 + 1e0) * 20e0
                 + (v30 / 16e0 + 1e0) * 30e0) / 60e0 AS bdm,
                ((((v0 / 16e0 + 1e0) * 0.875e0 - (v0 / 16e0 + 1e0) * 1.125e0)
                    / 3.29e0)
                   * (((v0 / 16e0 + 1e0) * 0.875e0 - (v0 / 16e0 + 1e0) * 1.125e0)
                      / 3.29e0) * 100e0
                 + (((v10 / 16e0 + 1e0) * 0.875e0 - (v10 / 16e0 + 1e0) * 1.125e0)
                      / 3.29e0)
                   * (((v10 / 16e0 + 1e0) * 0.875e0 - (v10 / 16e0 + 1e0) * 1.125e0)
                      / 3.29e0) * 400e0
                 + (((v30 / 16e0 + 1e0) * 0.875e0 - (v30 / 16e0 + 1e0) * 1.125e0)
                      / 3.29e0)
                   * (((v30 / 16e0 + 1e0) * 0.875e0 - (v30 / 16e0 + 1e0) * 1.125e0)
                      / 3.29e0) * 900e0
                ) / 1400e0 AS bdv
              FROM om3)
            SELECT ix, iy,
                   socm * bdm AS stock_mean,
                   sqrt(sqrt(socv) * sqrt(socv) * (sqrt(bdv) * sqrt(bdv))
                        + sqrt(socv) * sqrt(socv) * (bdm * bdm)
                        + sqrt(bdv) * sqrt(bdv) * (socm * socm)) AS stock_stddev
            FROM lay
            """,
            ("raster_cells",),
        ),
        "reproject_agg_stats": oracle_query(
            """
            SELECT CAST(floor(cx) AS BIGINT) AS ix,
                   CAST(floor(cy) AS BIGINT) AS iy,
                   min(value) AS min_value,
                   max(value) AS max_value,
                   sum(value) AS sum_value,
                   CAST(count(value) AS BIGINT) AS n_valid,
                   sqrt(sum(value * value) / count(value)) AS rms_value
            FROM raster_cells WHERE dataset = 'elevation'
            GROUP BY 1, 2
            """,
            ("raster_cells",),
        ),
        "spatial_join": oracle_query(
            "SELECT url, parcel_id FROM point_parcel_truth"
        ),
        # web_graph: ranks re-derived by the SAME 2^-40 fixed-point power
        # iteration, unrolled as three exact-integer CTE layers — integer
        # sums are order-independent, so Spark and DuckDB hash-match
        # bit-for-bit (operators/linkgraph.py docstring).
        "web_graph": oracle_query(
            """
            , nodes AS (SELECT DISTINCT node FROM (
                SELECT src AS node FROM host_edges
                UNION ALL SELECT dst FROM host_edges)),
            nn AS (SELECT count(*) AS n FROM nodes),
            deg AS (SELECT src, count(*) AS out_deg
                    FROM host_edges GROUP BY src),
            ed AS (SELECT e.src, e.dst, d.out_deg
                   FROM host_edges e JOIN deg d USING (src)),
            r0 AS (SELECT node, CAST(1099511627776 // nn.n AS BIGINT) AS rk
                   FROM nodes CROSS JOIN nn),
            c1 AS (SELECT ed.dst AS node, SUM(p.rk // ed.out_deg) AS inflow
                   FROM ed JOIN r0 p ON ed.src = p.node GROUP BY ed.dst),
            g1 AS (SELECT COALESCE(SUM(p.rk), 0) AS dang FROM r0 p
                   LEFT JOIN deg ON p.node = deg.src WHERE deg.src IS NULL),
            r1 AS (SELECT n0.node, CAST(164926324736 // nn.n
                     + ((COALESCE(c1.inflow, 0) + g1.dang // nn.n) * 891290)
                       // 1048576 AS BIGINT) AS rk
                   FROM nodes n0 CROSS JOIN nn CROSS JOIN g1
                   LEFT JOIN c1 ON n0.node = c1.node),
            c2 AS (SELECT ed.dst AS node, SUM(p.rk // ed.out_deg) AS inflow
                   FROM ed JOIN r1 p ON ed.src = p.node GROUP BY ed.dst),
            g2 AS (SELECT COALESCE(SUM(p.rk), 0) AS dang FROM r1 p
                   LEFT JOIN deg ON p.node = deg.src WHERE deg.src IS NULL),
            r2 AS (SELECT n0.node, CAST(164926324736 // nn.n
                     + ((COALESCE(c2.inflow, 0) + g2.dang // nn.n) * 891290)
                       // 1048576 AS BIGINT) AS rk
                   FROM nodes n0 CROSS JOIN nn CROSS JOIN g2
                   LEFT JOIN c2 ON n0.node = c2.node),
            c3 AS (SELECT ed.dst AS node, SUM(p.rk // ed.out_deg) AS inflow
                   FROM ed JOIN r2 p ON ed.src = p.node GROUP BY ed.dst),
            g3 AS (SELECT COALESCE(SUM(p.rk), 0) AS dang FROM r2 p
                   LEFT JOIN deg ON p.node = deg.src WHERE deg.src IS NULL),
            r3 AS (SELECT n0.node, CAST(164926324736 // nn.n
                     + ((COALESCE(c3.inflow, 0) + g3.dang // nn.n) * 891290)
                       // 1048576 AS BIGINT) AS rk
                   FROM nodes n0 CROSS JOIN nn CROSS JOIN g3
                   LEFT JOIN c3 ON n0.node = c3.node),
            h0 AS (SELECT node, CAST(1099511627776 // nn.n AS BIGINT) AS v
                   FROM nodes CROSS JOIN nn),
            a1r AS (SELECT n0.node, COALESCE(s.v, 0) AS v FROM nodes n0
                    LEFT JOIN (SELECT e.dst AS node, SUM(h.v) AS v
                      FROM host_edges e JOIN h0 h ON e.src = h.node
                      GROUP BY e.dst) s ON n0.node = s.node),
            a1t AS (SELECT SUM(v) AS t FROM a1r),
            a1 AS (SELECT node, CAST((v * 1099511627776) // t AS BIGINT) AS v
                   FROM a1r CROSS JOIN a1t),
            h1r AS (SELECT n0.node, COALESCE(s.v, 0) AS v FROM nodes n0
                    LEFT JOIN (SELECT e.src AS node, SUM(a.v) AS v
                      FROM host_edges e JOIN a1 a ON e.dst = a.node
                      GROUP BY e.src) s ON n0.node = s.node),
            h1t AS (SELECT SUM(v) AS t FROM h1r),
            h1 AS (SELECT node, CAST((v * 1099511627776) // t AS BIGINT) AS v
                   FROM h1r CROSS JOIN h1t),
            a2r AS (SELECT n0.node, COALESCE(s.v, 0) AS v FROM nodes n0
                    LEFT JOIN (SELECT e.dst AS node, SUM(h.v) AS v
                      FROM host_edges e JOIN h1 h ON e.src = h.node
                      GROUP BY e.dst) s ON n0.node = s.node),
            a2t AS (SELECT SUM(v) AS t FROM a2r),
            a2 AS (SELECT node, CAST((v * 1099511627776) // t AS BIGINT) AS v
                   FROM a2r CROSS JOIN a2t),
            h2r AS (SELECT n0.node, COALESCE(s.v, 0) AS v FROM nodes n0
                    LEFT JOIN (SELECT e.src AS node, SUM(a.v) AS v
                      FROM host_edges e JOIN a2 a ON e.dst = a.node
                      GROUP BY e.src) s ON n0.node = s.node),
            h2t AS (SELECT SUM(v) AS t FROM h2r),
            h2 AS (SELECT node, CAST((v * 1099511627776) // t AS BIGINT) AS v
                   FROM h2r CROSS JOIN h2t),
            a3r AS (SELECT n0.node, COALESCE(s.v, 0) AS v FROM nodes n0
                    LEFT JOIN (SELECT e.dst AS node, SUM(h.v) AS v
                      FROM host_edges e JOIN h2 h ON e.src = h.node
                      GROUP BY e.dst) s ON n0.node = s.node),
            a3t AS (SELECT SUM(v) AS t FROM a3r),
            a3 AS (SELECT node, CAST((v * 1099511627776) // t AS BIGINT) AS v
                   FROM a3r CROSS JOIN a3t),
            h3r AS (SELECT n0.node, COALESCE(s.v, 0) AS v FROM nodes n0
                    LEFT JOIN (SELECT e.src AS node, SUM(a.v) AS v
                      FROM host_edges e JOIN a3 a ON e.dst = a.node
                      GROUP BY e.src) s ON n0.node = s.node),
            h3t AS (SELECT SUM(v) AS t FROM h3r),
            h3 AS (SELECT node, CAST((v * 1099511627776) // t AS BIGINT) AS v
                   FROM h3r CROSS JOIN h3t)
            SELECT e.src, e.dst, r3.rk AS src_rank_fp,
                   h3.v AS src_hub_fp, a3.v AS src_auth_fp
            FROM host_edges e
            JOIN r3 ON e.src = r3.node
            JOIN h3 ON e.src = h3.node
            JOIN a3 ON e.src = a3.node
            """,
            ("host_edges",),
        ),
        "knn_kring": oracle_query(
            """
            SELECT url, place_id, rnk FROM (
              SELECT pp.url, g.place_id,
                     row_number() OVER (
                       PARTITION BY pp.url
                       ORDER BY (pp.lon-g.lon)*(pp.lon-g.lon)
                              + (pp.lat-g.lat)*(pp.lat-g.lat), g.place_id
                     ) AS rnk
              FROM page_points pp, gazetteer g
              WHERE pp.doc_id < 40
            ) WHERE rnk <= 3
            """
        ),
        # warc_roundtrip: the oracle re-renders the html closed-form and
        # checks byte length + byte-identical text; status/mime are the
        # constants the Spark side must recover from the HTTP envelope it
        # itself serialized into the WARC container.
        "warc_roundtrip": oracle_query(
            f"""
            SELECT url,
                   CAST(200 AS INT) AS http_status,
                   'text/html' AS mime,
                   CAST(strlen('{_HTML_PREFIX}'
                     || replace(replace(replace(text, '&', '&amp;'),
                                '<', '&lt;'), '>', '&gt;')
                     || '{_HTML_SUFFIX}') AS INT) AS n_bytes,
                   text
            FROM pages
            """,
            ("pages",),
        ),
        "primary_soil_components": oracle_query(
            """
            , prim AS (
                SELECT * FROM (
                  SELECT c.*, rank() OVER (PARTITION BY parcel_id ORDER BY comppct DESC) AS rnk
                  FROM components c WHERE majcompflag = 'Yes'
                ) WHERE rnk = 1
            ),
            hz AS (
                SELECT h.*,
                       CAST(least(50, bottom_depth_cm) - greatest(0, top_depth_cm) AS DOUBLE) AS w
                FROM horizons h
                WHERE h.component_key IN (SELECT component_key FROM prim)
                  AND h.bottom_depth_cm > 0 AND h.top_depth_cm < 50
            ),
            comp_frag AS (
                SELECT hz.component_key,
                       sum(f.fragment_pct) AS total_fragment_pct,
                       array_to_string(list_sort(list_distinct(
                           list(f.fragment_kind) FILTER (WHERE f.fragment_kind IS NOT NULL)
                       )), ', ') AS fragment_kinds
                FROM fragments f JOIN hz ON f.horizon_key = hz.horizon_key
                GROUP BY hz.component_key
            ),
            props AS (
                SELECT component_key,
                       sum(sand*w)/sum(CASE WHEN sand IS NOT NULL THEN w END) AS sand_dw,
                       sum(clay*w)/sum(CASE WHEN clay IS NOT NULL THEN w END) AS clay_dw,
                       sum(om*w)/sum(CASE WHEN om IS NOT NULL THEN w END) AS om_dw
                FROM hz GROUP BY component_key
            )
            SELECT p.parcel_id, pa.kind, p.component_key, p.compname, p.comppct,
                   p.drainagecl, props.sand_dw, props.clay_dw, props.om_dw,
                   cf.total_fragment_pct, cf.fragment_kinds
            FROM prim p
            LEFT JOIN props USING (component_key)
            LEFT JOIN comp_frag cf USING (component_key)
            LEFT JOIN parcels pa USING (parcel_id)
            """,
            ("components", "horizons", "fragments", "parcels"),
        ),
        "empty_parcels": oracle_query(
            """
            SELECT parcel_id, kind FROM parcels
            WHERE parcel_id NOT IN (SELECT parcel_id FROM point_parcel_truth)
            """
        ),
        "zonal_stats": oracle_query(
            f"""
            SELECT pa.parcel_id, c.dataset, c.depth_lo,
                   CAST(count(c.value) AS BIGINT) AS n_valid,
                   avg(c.value) AS mean_value,
                   min(c.value) AS min_value,
                   max(c.value) AS max_value,
                   sum(c.value) AS sum_value
            FROM raster_cells c JOIN parcels pa ON {_CONTAINS}
            GROUP BY pa.parcel_id, c.dataset, c.depth_lo
            """,
            ("raster_cells", "parcels"),
        ),
        "zonal_stats_touched": oracle_query(
            f"""
            SELECT pa.parcel_id, c.dataset, c.depth_lo,
                   CAST(count(c.value) AS BIGINT) AS n_valid,
                   avg(c.value) AS mean_value,
                   min(c.value) AS min_value,
                   max(c.value) AS max_value,
                   sum(c.value) AS sum_value
            FROM raster_cells c JOIN parcels pa ON {_TOUCHES}
            GROUP BY pa.parcel_id, c.dataset, c.depth_lo
            """,
            ("raster_cells", "parcels"),
        ),
        "zonal_stats_weighted": oracle_query(
            f"""
            , subhits AS (
              SELECT pa.parcel_id, c.dataset, c.depth_lo, c.ix, c.iy, c.value,
                     CAST(count(*) AS BIGINT) AS w
              FROM raster_cells c, range(16) t(sub), parcels pa
              WHERE {_contains_pred(
                "(c.ix * 0.25e0 + (CAST(t.sub % 4 AS DOUBLE) + 0.5e0) * 0.0625e0)",
                "(c.iy * 0.25e0 + (CAST(t.sub // 4 AS DOUBLE) + 0.5e0) * 0.0625e0)",
              )}
              GROUP BY pa.parcel_id, c.dataset, c.depth_lo, c.ix, c.iy, c.value
            )
            SELECT parcel_id, dataset, depth_lo,
                   sum(value * CAST(w AS DOUBLE))
                     / sum(CASE WHEN value IS NOT NULL
                                THEN CAST(w AS DOUBLE) END) AS w_mean,
                   sum(CASE WHEN value IS NOT NULL
                            THEN CAST(w AS DOUBLE) END) AS w_valid,
                   CAST(count(value) AS BIGINT) AS n_pixels,
                   CAST(sum(CASE WHEN value IS NOT NULL THEN w END) AS BIGINT)
                     AS n_subhits
            FROM subhits GROUP BY parcel_id, dataset, depth_lo
            """,
            ("raster_cells", "parcels"),
        ),
        "zonal_depth_weighted": oracle_query(
            f"""
            SELECT parcel_id,
                   sum(value * w) / sum(CASE WHEN value IS NOT NULL THEN w END) AS dw_mean,
                   sum(CASE WHEN value IS NOT NULL THEN w END) AS w_valid
            FROM (
              SELECT pa.parcel_id, c.value,
                     CAST(greatest(0, least(50, c.depth_hi) - greatest(0, c.depth_lo)) AS DOUBLE) AS w
              FROM raster_cells c JOIN parcels pa ON {_CONTAINS}
              WHERE c.dataset = 'om'
            ) WHERE w > 0
            GROUP BY parcel_id
            """,
            ("raster_cells", "parcels"),
        ),
        "tile_merge": oracle_query(
            """
            , merged AS (
            SELECT ix, iy,
                   min_by(value, priority) FILTER (WHERE value IS NOT NULL) AS first_value,
                   max_by(value, priority) FILTER (WHERE value IS NOT NULL) AS last_value,
                   min(value) AS min_value,
                   max(value) AS max_value,
                   sum(value) AS sum_value,
                   CAST(count(value) AS BIGINT) AS count_value,
                   sum(value) / count(value) AS mean_value,
                   (sum(value*value) - sum(value)*sum(value)/count(value)) / count(value) AS var_value,
                   sqrt((sum(value*value) - sum(value)*sum(value)/count(value)) / count(value)) AS stddev_value
            FROM merge_sources GROUP BY ix, iy
            ),
            vam AS (
            SELECT s.ix, s.iy,
                   sum((s.value - m.mean_value) * (s.value - m.mean_value))
                     / count(s.value) AS var_around_mean
            FROM merge_sources s JOIN merged m USING (ix, iy)
            GROUP BY s.ix, s.iy
            )
            SELECT merged.*, vam.var_around_mean
            FROM merged JOIN vam USING (ix, iy)
            """,
            ("merge_sources",),
        ),
        "point_enrichment": oracle_query(
            """
            , hits AS (
                SELECT url, CAST(min(parcel_id) AS BIGINT) AS parcel_id,
                       CAST(count(*) AS BIGINT) AS n_parcels
                FROM point_parcel_truth GROUP BY url
            ),
            elev AS (
                SELECT pp.url, c.value AS elevation
                FROM page_points pp
                LEFT JOIN raster_cells c
                  ON c.dataset = 'elevation'
                 AND c.ix = CAST(floor(pp.lon / 0.25e0) AS INT)
                 AND c.iy = CAST(floor(pp.lat / 0.25e0) AS INT)
            ),
            nn AS (
                SELECT url, place_id AS nearest_place_id, dist AS nearest_dist
                FROM (
                  SELECT pp.url, g.place_id,
                         sqrt((pp.lon - g.lon) * (pp.lon - g.lon)
                              + (pp.lat - g.lat) * (pp.lat - g.lat)) AS dist,
                         row_number() OVER (
                           PARTITION BY pp.url
                           ORDER BY sqrt((pp.lon - g.lon) * (pp.lon - g.lon)
                                         + (pp.lat - g.lat) * (pp.lat - g.lat)),
                                    g.place_id
                         ) AS rn
                  FROM page_points pp, gazetteer g
                ) WHERE rn = 1
            ),
            prim1 AS (
                SELECT parcel_id, component_key, compname, comppct FROM (
                  SELECT c.*, row_number() OVER (
                           PARTITION BY parcel_id
                           ORDER BY comppct DESC, component_key
                         ) AS rn
                  FROM components c WHERE majcompflag = 'Yes'
                ) WHERE rn = 1
            ),
            hz1 AS (
                SELECT h.*,
                       CAST(least(50, bottom_depth_cm) - greatest(0, top_depth_cm) AS DOUBLE) AS w
                FROM horizons h
                WHERE h.component_key IN (SELECT component_key FROM prim1)
                  AND h.bottom_depth_cm > 0 AND h.top_depth_cm < 50
            ),
            soil AS (
                SELECT p.parcel_id, p.compname AS soil_compname,
                       p.comppct AS soil_comppct, pr.sand_dw AS soil_sand_dw
                FROM prim1 p LEFT JOIN (
                  SELECT component_key,
                         sum(sand*w)/sum(CASE WHEN sand IS NOT NULL THEN w END) AS sand_dw
                  FROM hz1 GROUP BY component_key
                ) pr USING (component_key)
            )
            SELECT pp.url, pp.doc_id, pp.lon, pp.lat, hits.parcel_id,
                   hits.n_parcels, elev.elevation, nn.nearest_place_id,
                   nn.nearest_dist, soil.soil_compname, soil.soil_comppct,
                   soil.soil_sand_dw
            FROM page_points pp
            LEFT JOIN hits USING (url)
            LEFT JOIN elev USING (url)
            LEFT JOIN nn USING (url)
            LEFT JOIN soil ON soil.parcel_id = hits.parcel_id
            """,
            ("point_parcel_truth", "raster_cells", "components", "horizons"),
        ),
        "regrid_coarsen": oracle_query(
            """
            SELECT dataset, CAST(ix // 4 AS INT) AS ix, CAST(iy // 4 AS INT) AS iy,
                   CAST(count(value) AS BIGINT) AS n_valid,
                   avg(value) AS mean_value,
                   min(value) AS min_value,
                   max(value) AS max_value
            FROM raster_cells WHERE dataset = 'elevation'
            GROUP BY dataset, ix // 4, iy // 4
            """,
            ("raster_cells",),
        ),
        "regrid_refine": oracle_query(
            """
            SELECT dataset,
                   CAST(ix * 2 + k % 2 AS INT) AS ix,
                   CAST(iy * 2 + k // 2 AS INT) AS iy,
                   value
            FROM raster_cells, range(4) t(k) WHERE dataset = 'elevation'
            """,
            ("raster_cells",),
        ),
        "media_features": _MEDIA_ORACLE,
        "media_real_decode": _REAL_MEDIA_ORACLE,
        "tiff_decode": _TIFF_ORACLE,
        "ndvi_cells": oracle_query(
            "SELECT * FROM ndvi_cells_oracle", ("ndvi_cells_oracle",)
        ),
        "ndvi_stats": oracle_query(
            """
            SELECT zone, ix, iy,
                   CAST(count(ndvi) AS BIGINT) AS n_passes,
                   sum(ndvi) / count(ndvi) AS ndvi_mean,
                   min(ndvi) AS ndvi_min,
                   max(ndvi) AS ndvi_max,
                   sqrt((sum(ndvi*ndvi) - sum(ndvi)*sum(ndvi)/count(ndvi))
                        / count(ndvi)) AS ndvi_stddev
            FROM ndvi_cells_oracle GROUP BY zone, ix, iy
            """,
            ("ndvi_cells_oracle",),
        ),
        "dedup_exact": oracle_query(
            """
            SELECT md5(text) AS content_hash,
                   CAST(min(doc_id) AS BIGINT) AS canonical_id,
                   CAST(count(*) AS BIGINT) AS n_docs
            FROM dedup_corpus GROUP BY md5(text)
            """,
            ("dedup_corpus",),
        ),
        "dedup_jaccard": oracle_query(_jaccard_oracle_tail(0.6, max_df=32)),
        "dedup_minhash": oracle_query(_jaccard_oracle_tail(0.8)),
        "soil_quantile_sigma": oracle_query(
            """
            SELECT dataset, depth_lo,
                   quantile_cont(value, 0.05e0) AS p5,
                   quantile_cont(value, 0.95e0) AS p95,
                   CAST(count(value) AS BIGINT) AS n_valid,
                   (quantile_cont(value, 0.05e0) - quantile_cont(value, 0.95e0))
                     / 3.29e0 AS sigma
            FROM raster_cells GROUP BY dataset, depth_lo
            """,
            ("raster_cells",),
        ),
        "url_hosts": oracle_query(
            """
            SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS host,
                   count(*) AS n_pages,
                   count(DISTINCT regexp_extract(url, '^https?://[^/]+(/.*)$', 1))
                     AS n_paths,
                   max(url LIKE 'https://site1%') AS has_site1_prefix
            FROM pages GROUP BY host
            ORDER BY host LIMIT 60
            """,
            ("pages",),
        ),
        "media_resize": oracle_query(
            """
            SELECT doc_id,
                   CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                        ELSE 'video' END AS kind,
                   CAST(doc_id % 64 + 1 AS INT) AS width,
                   CAST(doc_id % 48 + 1 AS INT) AS height,
                   CAST(floor(CAST(doc_id % 64 + 1 AS DOUBLE) *
                        (CASE WHEN greatest(doc_id % 64 + 1, doc_id % 48 + 1) > 32
                              THEN 32e0 / CAST(greatest(doc_id % 64 + 1,
                                                        doc_id % 48 + 1) AS DOUBLE)
                              ELSE 1e0 END)) AS INT) AS new_w,
                   CAST(floor(CAST(doc_id % 48 + 1 AS DOUBLE) *
                        (CASE WHEN greatest(doc_id % 64 + 1, doc_id % 48 + 1) > 32
                              THEN 32e0 / CAST(greatest(doc_id % 64 + 1,
                                                        doc_id % 48 + 1) AS DOUBLE)
                              ELSE 1e0 END)) AS INT) AS new_h
            FROM documents
            """,
            (),
        ),
        "frame_sample": oracle_query(
            """
            -- MJPEG-in-AVI: DC-only flat 8x8 blocks, pixel = 2*((i*5 +
            -- j*11 + f*17 + doc_id) % 128); frame clock from avih
            -- (usec/frame 250000/200000/125000 -> fps 4/5/8)
            SELECT d.doc_id,
                   CAST(d.doc_id % 5 + 2 AS INT) AS n_frames,
                   CAST(CASE d.doc_id % 3 WHEN 0 THEN 4 WHEN 1 THEN 5
                        ELSE 8 END AS INT) AS fps,
                   CAST(f.f AS INT) AS frame_idx,
                   CAST(f.f * (CASE d.doc_id % 3 WHEN 0 THEN 250
                               WHEN 1 THEN 200 ELSE 125 END) AS INT) AS t_ms,
                   CAST((d.doc_id % 3 + 1) * 8 AS INT) AS width,
                   CAST((d.doc_id % 2 + 1) * 8 AS INT) AS height,
                   (SELECT CAST(sum(2 * ((i.i * 5 + j.j * 11 + f.f * 17
                                          + d.doc_id) % 128)) AS DOUBLE)
                    FROM range(3) i(i), range(2) j(j)
                    WHERE i.i < d.doc_id % 3 + 1 AND j.j < d.doc_id % 2 + 1)
                     / ((d.doc_id % 3 + 1) * (d.doc_id % 2 + 1)) AS mean_value
            FROM documents d,
                 LATERAL (SELECT unnest(range(0, CAST(d.doc_id % 5 + 2 AS BIGINT), 2))
                          AS f) f
            """,
            (),
        ),
        "dedup_keep": oracle_query(
            """
            , sizes AS (
                SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh
                FROM doc_shingles GROUP BY doc_id
            ),
            inter AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
                FROM doc_shingles a
                JOIN doc_shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id
            ),
            jp AS (
                SELECT doc_a, doc_b FROM inter
                JOIN sizes na ON inter.doc_a = na.doc_id
                JOIN sizes nb ON inter.doc_b = nb.doc_id
                WHERE CAST(n_inter AS DOUBLE) / (na.n_sh + nb.n_sh - n_inter) >= 0.8
            ),
            cedges AS (
                SELECT doc_a AS src, doc_b AS dst FROM jp
                UNION ALL
                SELECT doc_b AS src, doc_a AS dst FROM jp
            ),
            reach AS (
                SELECT doc_id AS doc, doc_id AS lbl FROM dedup_corpus
                UNION
                SELECT e.dst AS doc, r.lbl FROM reach r JOIN cedges e ON e.src = r.doc
            ),
            comp AS (
                SELECT doc, min(lbl) AS cluster_id FROM reach GROUP BY doc
            )
            SELECT cluster_id AS doc_id, CAST(count(*) AS BIGINT) AS cluster_size
            FROM comp GROUP BY cluster_id
            """,
            None,
            True,
        ),
        "asof_clicks": oracle_query(
            """
            SELECT l.event_id, l.user_id, r.ts AS r_ts, r.value AS r_value
            FROM (SELECT event_id, user_id, ts FROM events
                  WHERE event_type = 'purchase') l
            ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                            WHERE event_type = 'click') r
              ON l.user_id = r.user_id AND l.ts >= r.ts
            """,
            (),
        ),
        "events_rollup": oracle_query(
            """
            SELECT event_type, user_id % 10 AS user_bucket,
                   count(*) AS n_events,
                   min(event_id) AS min_event_id,
                   max(event_id) AS max_event_id
            FROM events GROUP BY ROLLUP (event_type, (user_id % 10))
            """,
            (),
        ),
        "dedup_clusters": oracle_query(
            """
            , sizes AS (
                SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh
                FROM doc_shingles GROUP BY doc_id
            ),
            inter AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
                FROM doc_shingles a
                JOIN doc_shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id
            ),
            jp AS (
                SELECT doc_a, doc_b FROM inter
                JOIN sizes na ON inter.doc_a = na.doc_id
                JOIN sizes nb ON inter.doc_b = nb.doc_id
                WHERE CAST(n_inter AS DOUBLE) / (na.n_sh + nb.n_sh - n_inter) >= 0.8
            ),
            cedges AS (
                SELECT doc_a AS src, doc_b AS dst FROM jp
                UNION ALL
                SELECT doc_b AS src, doc_a AS dst FROM jp
            ),
            reach AS (
                SELECT doc_id AS doc, doc_id AS lbl FROM dedup_corpus
                UNION
                SELECT e.dst AS doc, r.lbl FROM reach r JOIN cedges e ON e.src = r.doc
            )
            SELECT doc AS doc_id, CAST(min(lbl) AS BIGINT) AS cluster_id
            FROM reach GROUP BY doc
            """,
            None,
            True,
        ),
        "simhash_pairs": oracle_query(
            """
            , toks AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS t
              FROM dedup_corpus),
            votes AS (
              SELECT doc_id, r.b,
                 sum(CASE WHEN ((strpos('0123456789abcdef',
                        substr(md5(t), 16 - (r.b // 4), 1)) - 1)
                        >> (r.b % 4)) & 1 = 1
                     THEN 1 ELSE -1 END) AS v
              FROM toks, range(64) r(b) GROUP BY doc_id, r.b),
            bands AS (
              SELECT doc_id,
                 CAST(sum(CASE WHEN v > 0 AND b // 16 = 0
                          THEN 1 << (b % 16) ELSE 0 END) AS BIGINT) AS b0,
                 CAST(sum(CASE WHEN v > 0 AND b // 16 = 1
                          THEN 1 << (b % 16) ELSE 0 END) AS BIGINT) AS b1,
                 CAST(sum(CASE WHEN v > 0 AND b // 16 = 2
                          THEN 1 << (b % 16) ELSE 0 END) AS BIGINT) AS b2,
                 CAST(sum(CASE WHEN v > 0 AND b // 16 = 3
                          THEN 1 << (b % 16) ELSE 0 END) AS BIGINT) AS b3
              FROM votes GROUP BY doc_id)
            SELECT doc_a, doc_b, hamming FROM (
              SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
                     CAST(bit_count(xor(x.b0, y.b0)) + bit_count(xor(x.b1, y.b1))
                        + bit_count(xor(x.b2, y.b2)) + bit_count(xor(x.b3, y.b3))
                          AS INT) AS hamming
              FROM bands x, bands y
              WHERE x.doc_id < y.doc_id)
            WHERE hamming <= 3
            """,
        ),
        "ann_ivf_multiprobe": oracle_query(
            """
            WITH dims AS (
              SELECT label, generate_subscripts(embedding, 1) AS dim,
                     unnest(embedding)::DOUBLE AS x
              FROM embeddings),
            cents AS (
              SELECT centroid_id, list(m ORDER BY dim) AS centroid FROM (
                SELECT label AS centroid_id, dim, avg(x) AS m
                FROM dims GROUP BY label, dim)
              GROUP BY centroid_id),
            vass AS (
              SELECT neighbor_id, emb, centroid_id FROM (
                SELECT e.vec_id AS neighbor_id, e.embedding::DOUBLE[] AS emb,
                       c.centroid_id,
                       row_number() OVER (PARTITION BY e.vec_id ORDER BY
                          (list_dot_product(e.embedding::DOUBLE[], c.centroid)
                           / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                                    e.embedding::DOUBLE[]))
                              * sqrt(list_dot_product(c.centroid, c.centroid))))
                          DESC, c.centroid_id) AS rk
                FROM embeddings e, cents c) WHERE rk <= 1),
            qass AS (
              SELECT query_id, qemb, centroid_id FROM (
                SELECT e.vec_id AS query_id, e.embedding::DOUBLE[] AS qemb,
                       c.centroid_id,
                       row_number() OVER (PARTITION BY e.vec_id ORDER BY
                          (list_dot_product(e.embedding::DOUBLE[], c.centroid)
                           / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                                    e.embedding::DOUBLE[]))
                              * sqrt(list_dot_product(c.centroid, c.centroid))))
                          DESC, c.centroid_id) AS rk
                FROM embeddings e, cents c WHERE e.vec_id < 10) WHERE rk <= 3)
            SELECT query_id, neighbor_id, rnk FROM (
              SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cos DESC, neighbor_id) AS rnk
              FROM (SELECT DISTINCT q.query_id, v.neighbor_id,
                      list_dot_product(q.qemb, v.emb)
                        / (sqrt(list_dot_product(q.qemb, q.qemb))
                           * sqrt(list_dot_product(v.emb, v.emb))) AS cos
                    FROM qass q JOIN vass v USING (centroid_id)
                    WHERE q.query_id != v.neighbor_id))
            WHERE rnk <= 5
            """,
            (),
        ),
        "text_stats": oracle_query(
            """
            WITH segx AS (
              SELECT doc_id, s.pos AS pos, s.seg AS seg
              FROM (
                SELECT doc_id,
                       unnest(list_transform(
                         range(0, CAST(ceil(len(ws) / 10e0) AS INT)),
                         i -> {{'pos': i, 'seg': array_to_string(
                                 list_slice(ws, i * 10 + 1, i * 10 + 10), ' ')}}))
                         AS s
                FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
              )
            ),
            segr AS (
              SELECT doc_id, pos, seg,
                     row_number() OVER (PARTITION BY seg
                                        ORDER BY doc_id, pos) AS rn
              FROM segx
            ),
            segd AS (
              SELECT doc_id,
                     CAST(count(*) AS INT) AS n_segs,
                     CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS INT)
                       AS n_dup_segs,
                     md5(string_agg(seg, ' ' ORDER BY pos)
                         FILTER (WHERE rn = 1)) AS dedup_fp
              FROM segr GROUP BY doc_id
            )
            SELECT ts.*, segd.n_segs, segd.n_dup_segs,
                   coalesce(segd.dedup_fp, md5('')) AS dedup_fp,
                   {split_case} AS split
            FROM (
              SELECT doc_id,
                   CAST(length(text) AS INT) AS n_chars_text,
                   CAST(len(ws) AS INT) AS n_tokens,
                   CAST(len(list_distinct(ws)) AS INT) AS n_types,
                   CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) AS ttr,
                   CAST(len(list_filter(ws, w -> w = 'the' OR w = 'a' OR w = 'of'
                        OR w = 'and' OR w = 'to' OR w = 'in' OR w = 'is')) AS DOUBLE)
                     / len(ws) AS stop_ratio,
                   CAST(length(replace(array_to_string(ws, ' '), ' ', '')) AS DOUBLE)
                     / len(ws) AS mean_word_len,
                   CASE WHEN CAST(len(list_filter(ws, w -> w = 'the' OR w = 'a' OR w = 'of'
                        OR w = 'and' OR w = 'to' OR w = 'in' OR w = 'is')) AS DOUBLE)
                        / len(ws) >= 0.02 THEN 'en' ELSE 'xx' END AS lang_guess,
                   CAST(CASE WHEN len(ws) >= 20
                        AND CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) >= 0.3
                        THEN 1 ELSE 0 END AS INT) AS quality_ok,
                   CAST(len(ws) AS INT) AS n_ws_tokens,
                   CAST(len(regexp_extract_all(lower(text),
                        '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INT) AS n_subtokens,
                   md5(text) AS fp_raw,
                   md5(lower(regexp_replace(text, ' +', ' ', 'g'))) AS fp_norm
              FROM (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents)
            ) ts JOIN segd USING (doc_id)
            """.format(split_case=_split_oracle_case()),
            (),
        ),
        "top_terms": oracle_query(
            """
            WITH tf AS (
              SELECT doc_id, t AS token, CAST(count(*) AS BIGINT) AS tf
              FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
                    FROM documents)
              GROUP BY doc_id, t
            ),
            dfx AS (
              SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf
              GROUP BY token
            )
            SELECT doc_id, token, tf, df, rnk FROM (
              SELECT tf.doc_id, tf.token, tf.tf, dfx.df,
                     row_number() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY tf.tf DESC, dfx.df, tf.token
                     ) AS rnk
              FROM tf JOIN dfx USING (token)
            ) WHERE rnk <= 3
            """,
            (),
        ),
        "quality_flags": oracle_query(
            """
            WITH qf AS (
              SELECT doc_id,
                   CAST(len(ws) AS INT) AS n_words,
                   CAST(list_max(list_transform(list_distinct(ws),
                        w -> len(list_filter(ws, x -> x = w)))) AS INT)
                     AS top_word_n,
                   CAST(list_max(list_transform(list_distinct(ws),
                        w -> len(list_filter(ws, x -> x = w)))) AS DOUBLE)
                     / len(ws) AS top_word_frac,
                   CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws) AS ttr,
                   CAST(len(list_intersect(list_distinct(ws),
                        ['the','a','of','and','to','in','is'])) AS INT)
                     AS n_stop,
                   CAST(CASE WHEN len(ws) >= 20
                        AND CAST(list_max(list_transform(list_distinct(ws),
                              w -> len(list_filter(ws, x -> x = w)))) AS DOUBLE)
                            / len(ws) <= 0.2e0
                        AND CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws)
                            >= 0.3e0
                        AND len(list_intersect(list_distinct(ws),
                              ['the','a','of','and','to','in','is'])) >= 1
                        THEN 1 ELSE 0 END AS INT) AS keep
              FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
            ),
            rg AS (
              SELECT doc_id, len(ws) AS n_words,
                CASE WHEN len(ws) >= 2 THEN list_transform(range(1, len(ws)),
                  i -> array_to_string(list_slice(ws, i, i+1), ' '))
                  ELSE [] END AS gt,
                CASE WHEN len(ws) >= 3 THEN list_transform(range(1, len(ws)-1),
                  i -> array_to_string(list_slice(ws, i, i+2), ' '))
                  ELSE [] END AS gd
              FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
            ),
            rc AS (
              SELECT doc_id, n_words,
                CAST(coalesce(list_max(list_transform(list_distinct(gt),
                     g -> len(list_filter(gt, x -> x = g)))), 0) AS INT)
                  AS top_gram_n,
                CAST(len(list_filter(gd,
                     g -> len(list_filter(gd, x -> x = g)) > 1)) AS INT)
                  AS dup_gram_n,
                CAST(len(gd) AS INT) AS n_dup_positions
              FROM rg
            ),
            rep AS (
              SELECT doc_id, top_gram_n,
                   CAST(top_gram_n * 2 AS DOUBLE) / n_words AS top_gram_frac,
                   dup_gram_n,
                   CASE WHEN n_dup_positions > 0
                        THEN CAST(dup_gram_n AS DOUBLE) / n_dup_positions
                        ELSE CAST(0 AS DOUBLE) END AS dup_gram_frac,
                   CAST(CASE WHEN CAST(top_gram_n * 2 AS DOUBLE) / n_words
                          <= 0.18e0
                        AND (CASE WHEN n_dup_positions > 0
                             THEN CAST(dup_gram_n AS DOUBLE) / n_dup_positions
                             ELSE 0 END) <= 0.60e0
                        THEN 1 ELSE 0 END AS INT) AS keep_repetition
              FROM rc
            ),
            pdx AS (
              SELECT doc_id, unnest(CASE WHEN len(ws) >= 6 THEN
                list_distinct(list_transform(range(1, len(ws)-4),
                  i -> array_to_string(list_slice(ws, i, i+5), ' ')))
                ELSE [] END) AS gram
              FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
            ),
            gdc AS (
              SELECT gram, CAST(count(*) AS BIGINT) AS gram_docs
              FROM pdx GROUP BY gram
            ),
            bp AS (
              SELECT doc_id,
                   CAST(count(*) AS INT) AS n_grams,
                   CAST(sum(CASE WHEN gram_docs >= 3 THEN 1 ELSE 0 END) AS INT)
                     AS n_shared,
                   CAST(sum(CASE WHEN gram_docs >= 3 THEN 1 ELSE 0 END)
                        AS DOUBLE) / count(*) AS shared_frac,
                   CAST(CASE WHEN CAST(sum(CASE WHEN gram_docs >= 3
                               THEN 1 ELSE 0 END) AS DOUBLE) / count(*) > 0.5e0
                        THEN 1 ELSE 0 END AS INT) AS boilerplate
              FROM pdx JOIN gdc USING (gram) GROUP BY doc_id
            ),
            tr AS (
              SELECT doc_id, unnest(gt) AS g FROM rg
            ),
            bgc AS (
              SELECT g, CAST(count(*) AS BIGINT) AS c_bg FROM tr GROUP BY g
            ),
            prc AS (
              SELECT string_split(g, ' ')[1] AS w1,
                     CAST(count(*) AS BIGINT) AS c_pre
              FROM tr GROUP BY 1
            ),
            lm AS (
              SELECT doc_id,
                   CAST(count(*) AS INT) AS lm_n_trans,
                   CAST(sum(CASE WHEN c_bg * 32 < c_pre THEN 1 ELSE 0 END)
                        AS INT) AS lm_n_improbable,
                   CAST(sum(c_bg) AS BIGINT) AS lm_sum_cbg
              FROM tr
              JOIN bgc USING (g)
              JOIN prc ON string_split(g, ' ')[1] = prc.w1
              GROUP BY doc_id
            )
            ,
            pii AS (
              SELECT doc_id,
                   CAST(len(regexp_extract_all(text,
                     '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z]{2,}'))
                     AS INT) AS n_email,
                   CAST(len(regexp_extract_all(text,
                     '([0-9]{1,3}[.]){3}[0-9]{1,3}')) AS INT) AS n_ipv4,
                   CAST(len(regexp_extract_all(text,
                     '[+][0-9][0-9() -]{6,14}[0-9]')) AS INT) AS n_phone,
                   md5(regexp_replace(regexp_replace(regexp_replace(text,
                     '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z]{2,}',
                     '<EMAIL>', 'g'),
                     '([0-9]{1,3}[.]){3}[0-9]{1,3}', '<IP>', 'g'),
                     '[+][0-9][0-9() -]{6,14}[0-9]', '<PHONE>', 'g'))
                     AS redacted_fp
              FROM documents
            )
            SELECT qf.*, rep.top_gram_n, rep.top_gram_frac, rep.dup_gram_n,
                   rep.dup_gram_frac, rep.keep_repetition,
                   bp.n_grams, bp.n_shared, bp.shared_frac, bp.boilerplate,
                   lm.lm_n_trans, lm.lm_n_improbable, lm.lm_sum_cbg,
                   CAST(lm.lm_n_improbable AS DOUBLE) / lm.lm_n_trans
                     AS lm_improbable_frac,
                   CAST(CASE WHEN CAST(lm.lm_n_improbable AS DOUBLE)
                          / lm.lm_n_trans <= 0.5e0
                        THEN 1 ELSE 0 END AS INT) AS keep_lm,
                   pii.n_email, pii.n_ipv4, pii.n_phone,
                   CAST(CASE WHEN pii.n_email + pii.n_ipv4 + pii.n_phone = 0
                        THEN 1 ELSE 0 END AS INT) AS pii_free,
                   pii.redacted_fp
            FROM qf JOIN rep USING (doc_id) JOIN bp USING (doc_id)
                    JOIN lm USING (doc_id) JOIN pii USING (doc_id)
            """,
            (),
        ),
        "url_canonical": oracle_query(
            """
            SELECT doc_id,
                   concat('HTTPS://WWW.Site', CAST(doc_id % 50 AS VARCHAR),
                          '.Example:443/p/', CAST(doc_id AS VARCHAR),
                          CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END,
                          CASE WHEN doc_id % 3 = 0 THEN '?utm_source=x&b=2&a=1'
                               WHEN doc_id % 3 = 1 THEN '?gclid=abc'
                               ELSE '' END,
                          CASE WHEN doc_id % 4 = 0 THEN '#frag' ELSE '' END)
                     AS url,
                   concat('https://site', CAST(doc_id % 50 AS VARCHAR),
                          '.example/p/', CAST(doc_id AS VARCHAR),
                          CASE WHEN doc_id % 3 = 0 THEN '?a=1&b=2'
                               ELSE '' END) AS url_canonical
            FROM documents
            """,
            (),
        ),
        "ann_bruteforce": oracle_query(_ann_oracle_tail(pruned=False)),
        "remap_histogram": oracle_query(
            """
            SELECT CASE WHEN CAST(value AS BIGINT) % 13 < 10
                        THEN 1000 + (CAST(value AS BIGINT) % 13) * 7 END AS catchment_id,
                   CAST(count(*) AS BIGINT) AS n_cells
            FROM raster_cells WHERE dataset = 'elevation'
            GROUP BY 1
            """,
            ("raster_cells",),
        ),
        "parcel_bounds": oracle_query(
            """
            SELECT kind, min(xmin) AS bx0, min(ymin) AS by0,
                   max(xmax) AS bx1, max(ymax) AS by1
            FROM parcels GROUP BY kind
            """,
            ("parcels",),
        ),
        "dedup_embedding": oracle_query(
            """
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
            FROM emb_corpus a, emb_corpus b
            WHERE a.vec_id < b.vec_id
              AND list_cosine_similarity(a.embedding::DOUBLE[],
                                         b.embedding::DOUBLE[]) >= 0.999
            """,
            ("emb_corpus",),
        ),
        "events_windows": oracle_query(
            """
            SELECT 'tumbling' AS kind, event_type AS k,
                   CAST(NULL AS BIGINT) AS sid,
                   date_trunc('hour', ts) AS win_start,
                   date_trunc('hour', ts) + INTERVAL 1 HOUR AS win_end,
                   CAST(count(*) AS BIGINT) AS n_events,
                   round(sum(value), 6) AS sum_value
            FROM events GROUP BY event_type, date_trunc('hour', ts)
            UNION ALL
            SELECT 'session' AS kind, CAST(user_id AS VARCHAR) AS k,
                   session_id AS sid,
                   min(ts) AS win_start, max(ts) AS win_end,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(NULL AS DOUBLE) AS sum_value
            FROM (
              SELECT user_id, ts,
                     CAST(sum(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) AS BIGINT) AS session_id
              FROM (
                SELECT user_id, ts, event_id,
                       CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                                 OR date_diff('second',
                                      lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                                      ts) > 1800
                            THEN 1 ELSE 0 END AS new_session
                FROM events
              )
            ) GROUP BY user_id, session_id
            """,
            (),
        ),
        "merge_conflicts": oracle_query(
            """
            SELECT ix, iy,
                   CAST(count(DISTINCT value) AS BIGINT) AS n_distinct,
                   CAST(count(value) AS BIGINT) AS n_sources
            FROM merge_sources WHERE value IS NOT NULL
            GROUP BY ix, iy HAVING count(DISTINCT value) > 1
            """,
            ("merge_sources",),
        ),
    }
