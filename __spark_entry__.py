"""Driver contract for the spark-graft builder (PySpark target).

`queries()` maps every implemented operator from SURVEY.md §2 (plus the
training-data-pipeline operators) onto the driver's parquet tables;
`oracle_sql()` holds the DuckDB-equivalent ANSI SQL. Engine operators run
over a `transcripts` relation derived deterministically from the `events`
table (sources/transcripts.py TRANSCRIPTS_FROM_EVENTS_SQL) so Spark and
DuckDB query literally the same input rows.

Column-name/alias parity and float determinism rules:
  * every computed column aliased identically on both sides
  * sums/counts stay in the integer domain (bit-exact re-aggregation)
  * unavoidable float outputs are produced by the same literal expression
    tree (same fold order) and rounded to 6 dp on both sides
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sac2mseed_spark.functions import text as T
from sac2mseed_spark.functions.hashing import h60, h60_sql
from sac2mseed_spark.functions.metrics import derive_turn_metrics, ts_us_col
from sac2mseed_spark.functions.multimodal import extract_features, synth_media
from sac2mseed_spark.operators import dedup as D
from sac2mseed_spark.operators import similarity as S
from sac2mseed_spark.functions.selections import (
    apply_selections,
    override_source,
    override_sql,
    selections_sql,
)
from sac2mseed_spark.functions.ratapprox import rat_approx, rat_approx_sql
from sac2mseed_spark.operators.gapfill import gap_fill
from sac2mseed_spark.operators.ivf import knn_ivf, train_centroids
from sac2mseed_spark.operators.gaps import gap_report
from sac2mseed_spark.operators.pack import (
    pack_tier,
    read_tier_selection,
    repack_tier,
    unpack_tier,
)
from sac2mseed_spark.operators.rollup import (
    rollup_calendar,
    rollup_cascade,
    rollup_from_turns,
)
from sac2mseed_spark.operators.retention import retention_sweep, serve_tiered
from sac2mseed_spark.operators.sessionize import segments
from sac2mseed_spark.sources.tables import load_table
from sac2mseed_spark.sources.transcripts import (
    TRANSCRIPTS_FROM_EVENTS_SQL,
    transcripts_from_events,
)

# ----------------------------------------------------------------------
# shared DuckDB CTE prefix: transcripts + per-turn metrics
# ----------------------------------------------------------------------

_TOKENS_SQL = (
    "CASE WHEN length(trim({t})) = 0 THEN CAST([] AS VARCHAR[]) "
    "ELSE regexp_split_to_array(trim({t}), '\\s+') END"
)

_ORACLE_PREFIX = f"""
WITH transcripts AS ({TRANSCRIPTS_FROM_EVENTS_SQL}),
m AS (
  SELECT conv_id, turn_idx, role, text, tool,
         epoch_us(ts) AS ts_us,
         epoch_us(ts) - lag(epoch_us(ts)) OVER
           (PARTITION BY conv_id ORDER BY turn_idx, epoch_us(ts)) AS latency_us,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT)
           AS token_count
  FROM transcripts
)
"""

_TIER_US = {"1m": 60_000_000, "1h": 3_600_000_000, "1d": 86_400_000_000}


def _tier_body_sql(tier: str) -> str:
    """Rollup aggregate for one tier, as a bare SELECT over CTE ``m``
    (reused as a CTE by the retention oracles)."""
    w = _TIER_US[tier]
    return f"""SELECT conv_id,
       CAST(floor(ts_us / {w}.0) AS BIGINT) * {w} AS window_start_us,
       count(*) AS n_points,
       count(latency_us) AS n_latency,
       CAST(sum(latency_us) AS BIGINT) AS sum_latency_us,
       min(latency_us) AS min_latency_us,
       max(latency_us) AS max_latency_us,
       CAST(sum(token_count) AS BIGINT) AS sum_tokens,
       min(ts_us) AS min_ts_us,
       max(ts_us) AS max_ts_us,
       '{tier}' AS tier
FROM m GROUP BY 1, 2"""


def _rollup_sql(tier: str) -> str:
    return f"{_ORACLE_PREFIX}\n{_tier_body_sql(tier)}\n"


_STOPWORDS_SQL = "[" + ",".join(f"'{s}'" for s in T.EN_STOPWORDS) + "]"

# documents corpus augmented with deterministic near-duplicates: docs with
# doc_id < 50 get a variant (id + 100000) missing the first 5 tokens —
# guarantees the near-dup operators have true positives at every sf.
_AUG_DOCS_SQL = f"""
aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id,
         array_to_string(({_TOKENS_SQL.format(t='text')})[6:], ' ') AS text
  FROM documents WHERE doc_id < 50
),
tok AS (
  SELECT doc_id, {_TOKENS_SQL.format(t='text')} AS toks FROM aug
),
sh AS (
  SELECT doc_id AS doc, unnest(
    CASE WHEN len(toks) >= 3
         THEN [array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)]
         ELSE [array_to_string(toks, ' ')] END) AS sh
  FROM tok
),
shs AS (SELECT DISTINCT doc, {h60_sql('sh')} AS sh_h FROM sh),
sizes AS (SELECT doc, count(*) AS sz FROM shs GROUP BY doc)
"""


def _aug_docs(spark_docs: DataFrame) -> DataFrame:
    toks = T.ws_tokens("text")
    variants = (
        spark_docs.filter(F.col("doc_id") < 50)
        .select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.array_join(F.slice(toks, 6, F.greatest(F.size(toks) - 5, F.lit(0))), " ").alias("text"),
        )
    )
    return spark_docs.select("doc_id", "text").unionByName(variants)


# ----------------------------------------------------------------------
# Spark query callables
# ----------------------------------------------------------------------

def _metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fused single-window derivation; value-identical to
    # derive_turn_metrics(transcripts_from_events(...)) — see
    # sources/transcripts.metrics_from_events
    from sac2mseed_spark.sources.transcripts import metrics_from_events

    return metrics_from_events(spark, sf_dir)


def q_transcripts(spark, sf_dir):
    t = transcripts_from_events(spark, sf_dir)
    return t.select(
        "conv_id", "turn_idx", "role", "text", "tool", ts_us_col("ts").alias("ts_us")
    )


def q_rollup_1m(spark, sf_dir):
    return rollup_from_turns(_metrics(spark, sf_dir), "1m")


def q_rollup_1h(spark, sf_dir):
    # cascaded: 1h re-aggregated FROM the 1m tier (oracle aggregates raw
    # turns directly — passing proves the cascade is exactly associative)
    return rollup_cascade(_metrics(spark, sf_dir))["1h"]


def q_rollup_1d(spark, sf_dir):
    return rollup_cascade(_metrics(spark, sf_dir))["1d"]


def q_tier_derived_1h(spark, sf_dir):
    t = rollup_cascade(_metrics(spark, sf_dir))["1h"]
    return t.select(
        "conv_id",
        "window_start_us",
        "n_points",
        F.round(F.col("n_points") / F.lit(3600.0), 6).alias("turn_rate"),
        F.round(
            F.when(F.col("n_latency") > 0, F.col("sum_latency_us") / F.col("n_latency")),
            6,
        ).alias("avg_latency_us"),
    )


def q_segments(spark, sf_dir):
    return segments(_metrics(spark, sf_dir))


def q_gap_report(spark, sf_dir):
    return gap_report(_metrics(spark, sf_dir), min_gap_us=600_000_000)


def q_gapfill_locf_1h(spark, sf_dir):
    t1h = rollup_from_turns(_metrics(spark, sf_dir), "1h")
    filled = gap_fill(t1h, "1h", ["sum_tokens"], method="locf")
    return filled.select(
        "conv_id", "window_start_us", "n_points", "is_filled", "sum_tokens"
    )


def q_gapfill_linear_1h(spark, sf_dir):
    t1h = rollup_from_turns(_metrics(spark, sf_dir), "1h")
    filled = gap_fill(t1h, "1h", ["sum_tokens"], method="linear")
    return filled.select(
        "conv_id",
        "window_start_us",
        "n_points",
        "is_filled",
        F.round(F.col("sum_tokens"), 6).alias("sum_tokens_f"),
    )


def q_selections(spark, sf_dir):
    t = transcripts_from_events(spark, sf_dir)
    lo, hi = 1_704_067_200_000_000, 1_704_240_000_000_000  # 2024-01-01 .. 01-03
    return (
        t.withColumn("ts_us", ts_us_col("ts"))
        .filter(F.col("conv_id").like("conv_1%") & F.col("ts_us").between(lo, hi))
        .select("conv_id", "turn_idx", "role", "tool", "text", "ts_us")
    )


# glob selections (ms_globmatch, libmseed/selection.c:604-700): `?` one
# char, `*` any run, `[...]` sets with ranges, `[^...]` negation, `]`
# literal when first in a set — all four grammar features exercised
SEL_GLOB = [
    ("conv_1?3*", 1_704_067_200_000_000, None),
    ("conv_2[0-47-9]*", None, 1_704_240_000_000_000),
    ("conv_[]5]", None, None),  # ']' first in set = literal member
]


def q_selections_glob(spark, sf_dir):
    t = transcripts_from_events(spark, sf_dir).withColumn("ts_us", ts_us_col("ts"))
    return apply_selections(t, SEL_GLOB).select(
        "conv_id", "turn_idx", "role", "tool", "text", "ts_us"
    )


def q_overrides(spark, sf_dir):
    # forced-field dot-splice (src/sac2mseed.c:318-337): override chars
    # replace, '.' passes the original through, tail is kept
    t = transcripts_from_events(spark, sf_dir).withColumn("ts_us", ts_us_col("ts"))
    o = override_source(t, conv_id="CONV_....", role="R...", tool="forced")
    return o.select("conv_id", "turn_idx", "role", "tool", "ts_us")


def q_autoscale(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    grp = ev.groupBy("user_id").agg(
        F.max(F.abs("value")).alias("max_abs"),
        (F.max(F.when(F.abs(F.col("value") - F.col("value").cast("long")) > 1e-9, 1).otherwise(0)) == 1).alias("has_frac"),
    )
    digits = F.length(F.floor("max_abs").cast("long").cast("string"))
    grp = grp.withColumn(
        "scale",
        F.when(
            F.col("has_frac"), F.round(F.pow(10.0, F.greatest(F.lit(6) - digits, F.lit(0)))).cast("long")
        ).otherwise(F.lit(1).cast("long")),
    )
    joined = ev.join(F.broadcast(grp), "user_id")
    return joined.groupBy("user_id", "max_abs", "has_frac", "scale").agg(
        F.sum((F.col("value") * F.col("scale")).cast("long")).alias("sum_scaled_trunc"),
        F.sum(F.floor(F.col("value") * F.col("scale") + 0.5).cast("long")).alias("sum_scaled_round"),
    ).select(
        "user_id", F.round("max_abs", 6).alias("max_abs"), "has_frac", "scale",
        "sum_scaled_trunc", "sum_scaled_round",
    )


def q_pack_stats_1m(spark, sf_dir):
    packed = pack_tier(_metrics(spark, sf_dir), "1m")
    return packed.select(
        "conv_id", "window_start_us", "n_points", "n_chunks", "first_ts_us", "last_ts_us"
    )


def q_roundtrip_1m(spark, sf_dir):
    packed = pack_tier(_metrics(spark, sf_dir), "1m")
    up = unpack_tier(packed)
    lat = F.col("latency_us_f")
    return up.select(
        "conv_id",
        "ts_us",
        F.when(F.isnan(lat), None).otherwise(lat).alias("latency_us"),
        F.col("token_count_f").alias("token_count"),
    )


def q_tier_read_1m(spark, sf_dir):
    # ms_readtraces_selection path (SURVEY §3.2): selections prune whole
    # blobs on the packed table before any decode, then exact point filter
    packed = pack_tier(_metrics(spark, sf_dir), "1m")
    pts = read_tier_selection(packed, SEL_GLOB)
    lat = F.col("latency_us_f")
    return pts.select(
        "conv_id",
        "ts_us",
        F.when(F.isnan(lat), None).otherwise(lat).alias("latency_us"),
        F.col("token_count_f").alias("token_count"),
    )


def q_repack_1h(spark, sf_dir):
    # msrepack path (SURVEY §3.3): 1m payloads decoded and re-encoded at
    # 1h without touching the raw table; stats checked against raw SQL
    packed_1m = pack_tier(_metrics(spark, sf_dir), "1m")
    re1h = repack_tier(packed_1m, "1h")
    return re1h.select(
        "conv_id", "window_start_us", "n_points", "n_chunks",
        "first_ts_us", "last_ts_us",
    )


def q_time_functions(spark, sf_dir):
    # calendar/time conversions (ms_hptime2isotimestr / ms_doy2md family,
    # genutils.c:331-430, 625-666): epoch-us <-> calendar fields round-trip,
    # plus the 0.1-ms + [-50,+49]us round-half-up split of
    # ms_hptime2btime (genutils.c:588-614)
    t = transcripts_from_events(spark, sf_dir)
    ts = F.col("ts").cast("timestamp")
    us_frac = ts_us_col("ts") % 1_000_000
    tms = F.floor((us_frac + F.lit(50)) / F.lit(100.0)).cast("long")
    return t.select(
        "conv_id",
        "turn_idx",
        ts_us_col("ts").alias("ts_us"),
        F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss").alias("iso_s"),
        F.dayofyear(ts).cast("int").alias("doy"),
        F.year(ts).cast("int").alias("yr"),
        F.month(ts).cast("int").alias("mon"),
        F.dayofmonth(ts).cast("int").alias("dom"),
        us_frac.alias("us_frac"),
        tms.alias("tenth_ms"),
        (us_frac - tms * 100).alias("us_offset"),
    )


def q_conv_summary(spark, sf_dir):
    # trace-summary analogue (mst_printtracelist, traceutils.c:1301-1427)
    m = _metrics(spark, sf_dir)
    return m.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.min("ts_us").alias("first_ts_us"),
        F.max("ts_us").alias("last_ts_us"),
        F.sum("token_count").alias("sum_tokens"),
        F.count(F.when(F.col("role") == "tool", 1)).alias("n_tool_turns"),
    )


def q_validation_report(spark, sf_dir):
    from sac2mseed_spark.operators.validate import validation_report

    return validation_report(transcripts_from_events(spark, sf_dir))


def q_dedup_exact(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return D.dedup_exact(_aug_docs(docs))


def q_text_quality(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return T.text_profile(docs)


def q_doc_fingerprint(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return T.doc_fingerprints(docs)


def q_dedup_ngram_jaccard(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(_aug_docs(docs), threshold=0.5)


def q_dedup_minhash_lsh(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(_aug_docs(docs), threshold=0.5)


def q_dedup_clusters(spark, sf_dir):
    """Duplicate-cluster assignment (operators/dedup.dedup_clusters):
    connected components over the verified MinHash-LSH pair graph by
    iterative min-label propagation; the DuckDB twin computes the same
    components with a recursive CTE. Non-trivial on the aug corpus: every
    near-dup family (original, truncated variant, exact copies) collapses
    to one cluster_id."""
    docs = load_table(spark, sf_dir, "documents")
    return D.dedup_clusters(_aug_docs(docs), threshold=0.5)


def _pii_docs(docs: DataFrame) -> DataFrame:
    """documents with deterministic PII injected (emails for doc_id % 3,
    phones % 5, IPv4s % 7) so the scrub operator has true positives at
    every sf. The suffix expression is mirrored literally in
    _pii_scrub_sql."""
    d = F.col("doc_id")
    suffix = F.concat(
        F.when(
            d % 3 == 0,
            F.concat(F.lit(" contact user"), d.cast("string"), F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            d % 5 == 0,
            F.concat(
                F.lit(" call 555-0"),
                F.lpad((d % 1000).cast("string"), 3, "0"),
                F.lit(" now"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 7 == 0,
            F.concat(F.lit(" host 10.0."), (d % 256).cast("string"), F.lit(".7")),
        ).otherwise(F.lit("")),
    )
    return docs.select("doc_id", F.concat(F.col("text"), suffix).alias("text"))


def q_pii_scrub(spark, sf_dir):
    """PII detection + redaction stats (functions/text.pii_profile): pure
    regexp codegen — the 100 TB scrub is scan-shaped, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return T.pii_profile(_pii_docs(docs))


def q_topk_ngrams(spark, sf_dir):
    """Corpus top-20 word bigrams (functions/text.top_ngrams): explode ->
    count aggregate -> distributed TakeOrdered; ties broken on the ngram
    string so ranks are deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    return T.top_ngrams(docs, k_top=20, n=2)


# stratified-sample rates used by the query and its oracle (and the
# report query): mixture weights over documents.lang
SAMPLE_RATES = {"en": 0.25, "de": 1.0, "zh": 0.5}
SAMPLE_DEFAULT = 0.1


def q_stratified_sample(spark, sf_dir):
    """Deterministic hash-bucket stratified sampling
    (operators/sample.py): the same row keeps/drops at any parallelism
    or partitioning — df.sample() guarantees neither."""
    from sac2mseed_spark.operators.sample import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(
        docs, "lang", SAMPLE_RATES, default_rate=SAMPLE_DEFAULT
    ).select("doc_id", "lang", "bucket")


# mixture resampling weights: de upsampled 2.5x, en kept at 25%,
# everything else passed through (rate 1.0)
RESAMPLE_RATES = {"de": 2.5, "en": 0.25}
RESAMPLE_DEFAULT = 1.0


def q_stratified_resample(spark, sf_dir):
    """Deterministic mixture resampling with upsampling
    (operators/sample.py stratified_resample): integral rate part
    replicates, fractional part keeps the hash-bucket subset; exploded
    copy_idx keys each replica."""
    from sac2mseed_spark.operators.sample import stratified_resample

    docs = load_table(spark, sf_dir, "documents")
    return stratified_resample(
        docs, "lang", RESAMPLE_RATES, default_rate=RESAMPLE_DEFAULT
    ).select(
        "doc_id", "lang", "bucket", F.col("copy_idx").cast("long").alias("copy_idx")
    )


def q_sample_report(spark, sf_dir):
    """Per-stratum sampling lineage: rows in/kept + realized rate — the
    metadata row a curation job appends (writemetadata analogue,
    /root/reference/src/sac2mseed.c:944-1100)."""
    from sac2mseed_spark.operators.sample import sample_rates_report

    docs = load_table(spark, sf_dir, "documents")
    return sample_rates_report(
        docs, "lang", SAMPLE_RATES, default_rate=SAMPLE_DEFAULT
    )


def q_embedding_quantize(spark, sf_dir):
    """Per-vector int8 quantization stats (operators/quantize.py):
    expression-level HOFs with a sequential error fold — the mse float
    matches DuckDB's list fold bit-for-bit before the 6dp round."""
    from sac2mseed_spark.operators.quantize import quantize_embeddings

    emb = load_table(spark, sf_dir, "embeddings")
    return quantize_embeddings(emb)


# trailing z-score anomaly parameters (shared by query and oracle)
ANOMALY_K = 12
ANOMALY_TAU = 2.0
ROBUST_TAU = 3.5
ROBUST_MIN_WINDOWS = 8
COOCCUR_K = 4
TOPK_CONVS = 3
UTIL_IDLE_S = 300
SEASONAL_TAU = 3.0


def q_anomaly_zscore(spark, sf_dir):
    """Trailing z-score latency anomalies over the 1m tier
    (operators/anomaly.py): integer window sums keep the floats
    bit-identical across engines despite differing frame-aggregation
    orders. The scored value is whole seconds of window latency —
    floored BEFORE the window sums so squares stay inside int64 (raw
    µs squares would overflow: Spark wraps, DuckDB promotes)."""
    from sac2mseed_spark.operators.anomaly import zscore_anomalies

    t1m = rollup_from_turns(_metrics(spark, sf_dir), "1m").withColumn(
        "lat_s",
        F.floor(F.col("sum_latency_us") / F.lit(1000000.0)).cast("long"),
    )
    return zscore_anomalies(
        t1m, k=ANOMALY_K, tau=ANOMALY_TAU, value_col="lat_s"
    )


# shared parameters for the smoothing / percentile / downsample queries
EWMA_K = 8
EWMA_ALPHA = 0.5
M4_BUCKET_US = 7 * 86_400_000_000  # 1-week pixel buckets over the 1m tier


def q_ewma_smooth(spark, sf_dir):
    """Bounded-kernel EWMA of per-window token sums over the 1h tier
    (operators/smooth.py): explicit lag-chain with exact binary-fraction
    weights — no frame-aggregation order, bit-identical across engines."""
    from sac2mseed_spark.operators.smooth import ewma_smooth

    t1h = rollup_from_turns(_metrics(spark, sf_dir), "1h")
    return ewma_smooth(t1h, k=EWMA_K, alpha=EWMA_ALPHA, value_col="sum_tokens")


def q_latency_percentiles(spark, sf_dir):
    """Exact p50/p95 of per-window latency seconds per conversation over
    the 1h tier (operators/percentiles.py): Spark's exact percentile vs
    DuckDB quantile_cont, both rank p*(n-1) linear interpolation on
    integer inputs."""
    from sac2mseed_spark.operators.percentiles import key_percentiles

    t1h = rollup_from_turns(_metrics(spark, sf_dir), "1h").withColumn(
        "lat_s",
        F.floor(F.col("sum_latency_us") / F.lit(1000000.0)).cast("long"),
    )
    return key_percentiles(t1h, pcts=(0.5, 0.95), value_col="lat_s")


def q_m4_downsample(spark, sf_dir):
    """M4 visualization downsample of the 1m token series into weekly
    pixel buckets (operators/downsample.py): per bucket keep only rows
    achieving min/max value and first/last timestamp (lexicographic
    struct tiebreak) — ~6.6x reduction on the synthetic corpus."""
    from sac2mseed_spark.operators.downsample import m4_downsample

    t1m = rollup_from_turns(_metrics(spark, sf_dir), "1m")
    return m4_downsample(t1m, bucket_us=M4_BUCKET_US, value_col="sum_tokens")


def q_rollup_month(spark, sf_dir):
    """Calendar-aligned monthly tier (operators/rollup.py
    rollup_calendar): date_trunc bucketing under the pinned-UTC session,
    same integer-domain statistics as the fixed tiers."""
    return rollup_calendar(_metrics(spark, sf_dir), "month")


TREND_K = 8


def q_trend_slope(spark, sf_dir):
    """Trailing-k OLS trend slope of token sums over the 1h tier
    (operators/trend.py): integer lag-chain dot products, one final
    float division — engine-order-proof."""
    from sac2mseed_spark.operators.trend import trend_slope

    t1h = rollup_from_turns(_metrics(spark, sf_dir), "1h")
    return trend_slope(t1h, k=TREND_K, value_col="sum_tokens")


def q_concurrency_peak(spark, sf_dir):
    """Peak concurrent conversations per hour (operators/concurrency.py):
    sweep-line +1/-1 events with a two-pass distributed prefix sum —
    the scale-safe running total over a global time order."""
    from sac2mseed_spark.operators.concurrency import (
        concurrency_series,
        peak_concurrency,
    )

    segs = segments(_metrics(spark, sf_dir))
    return peak_concurrency(concurrency_series(segs))


def q_hourly_profile(spark, sf_dir):
    """Diurnal profile: average tokens/latency by hour-of-day and role
    (operators/profile.py)."""
    from sac2mseed_spark.operators.profile import hourly_profile

    return hourly_profile(_metrics(spark, sf_dir))


BURST_WINDOW_US = 86_400_000_000  # trailing 1 day (corpus averages
BURST_MIN_EVENTS = 6              # ~2.8 turns/day; >=6 is a real burst)


def q_burst_detect(spark, sf_dir):
    """Turns whose trailing-1d in-conversation turn count reaches the
    burst threshold (operators/rate.py): time-RANGE frame window, exact
    on the irregular grid."""
    from sac2mseed_spark.operators.rate import bursts

    return bursts(
        _metrics(spark, sf_dir),
        window_us=BURST_WINDOW_US,
        min_events=BURST_MIN_EVENTS,
    )


SALIENT_K = 3


def q_salient_terms(spark, sf_dir):
    """Top-3 salient terms per document by the log-free tf * N/df score
    (operators/tfidf.py): rational salience keeps the floats exact and
    engine-identical where ln would differ in the last ulp."""
    from sac2mseed_spark.operators.tfidf import salient_terms

    docs = load_table(spark, sf_dir, "documents")
    return salient_terms(docs, k=SALIENT_K)


# BM25 retrieval: query set = the first few corpus documents, top-k hits
BM25_QUERY_MAX_ID = 5
BM25_K = 5


def q_bm25_search(spark, sf_dir):
    """Top-5 corpus documents per seed query by the log-free rational
    BM25 score (operators/bm25.py): exact-int64 numerator/denominator,
    one IEEE division per term, sequential term-order fold for the sum
    — bit-identical to the DuckDB twin."""
    from sac2mseed_spark.operators.bm25 import bm25_retrieval

    docs = load_table(spark, sf_dir, "documents")
    queries = docs.filter(F.col("doc_id") < BM25_QUERY_MAX_ID).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    return bm25_retrieval(docs, queries, k=BM25_K)


def q_role_transitions(spark, sf_dir):
    """Role-transition Markov matrix (operators/transitions.py): lag over
    the stable turn order, two integer aggregates, broadcast totals."""
    from sac2mseed_spark.operators.transitions import role_transitions

    return role_transitions(_metrics(spark, sf_dir))


def q_sft_pairs(spark, sf_dir):
    """SFT training-pair extraction (operators/sft.py): adjacent
    user->assistant turns with token quality gates, content digests, and
    kept-pair numbering — one conv-partitioned exchange end to end."""
    from sac2mseed_spark.operators.sft import sft_pairs

    return sft_pairs(_metrics(spark, sf_dir))


# horizons for the driver tables: generator conversations span a month,
# so the curve bends in the multi-week range (1h/1d anchor the flat head)
SURVIVAL_HORIZONS_US = (
    3_600_000_000,            # 1h
    86_400_000_000,           # 1d
    7 * 86_400_000_000,       # 7d
    27 * 86_400_000_000,      # 27d
    28 * 86_400_000_000,      # 28d
    29 * 86_400_000_000,      # 29d
    29 * 86_400_000_000 + 43_200_000_000,  # 29.5d
    30 * 86_400_000_000,      # 30d
)


def q_conv_survival(spark, sf_dir):
    """Conversation-duration survival curve (operators/survival.py):
    fraction of conversations lasting >= each fixed horizon — one
    conv hash aggregate, compile-time-constant horizon fan-out over the
    conv-level frame, len(horizons) output groups."""
    from sac2mseed_spark.operators.survival import conv_survival

    return conv_survival(_metrics(spark, sf_dir), SURVIVAL_HORIZONS_US)


def q_pref_pairs(spark, sf_dir):
    """RLHF preference-pair candidates (operators/sft.py): prompts with
    >= 2 distinct responses across the corpus, deterministic
    chosen/rejected by (tokens DESC, latency ASC, digest ASC) — digest-only
    shuffles, map-side-combinable struct min/max selection."""
    from sac2mseed_spark.operators.sft import preference_pairs

    return preference_pairs(_metrics(spark, sf_dir))


def q_template_turns(spark, sf_dir):
    """Cross-conversation boilerplate detection (operators/templates.py):
    turn texts recurring in >= 3 conversations, digest-keyed — the
    template-masking removal list; one digest exchange, text never
    shuffles."""
    from sac2mseed_spark.operators.templates import template_turns

    return template_turns(_metrics(spark, sf_dir))


def q_context_fit(spark, sf_dir):
    """Context-window fit audit (operators/sft.py): longest turn suffix
    per conversation under the token budget (truncate-from-the-left),
    reverse running sum + aggregate on one conv exchange."""
    from sac2mseed_spark.operators.sft import context_fit

    return context_fit(_metrics(spark, sf_dir))


# benchmark set for the contamination screen: docs below this id
CONTAM_BENCH_MAX_ID = 20


def q_contamination(spark, sf_dir):
    """Benchmark-contamination screen (operators/contamination.py):
    per-doc shingle overlap with a broadcast benchmark set — the
    decontamination pass every pretraining corpus runs against eval
    sets."""
    from sac2mseed_spark.operators.contamination import contamination_screen

    docs = load_table(spark, sf_dir, "documents")
    return contamination_screen(
        docs, F.col("doc_id") < CONTAM_BENCH_MAX_ID
    )


# token budget per training shard (shared by query and oracle)
SHARD_BUDGET_TOKENS = 2000


def q_token_shards(spark, sf_dir):
    """Token-budget shard assignment (operators/shards.py): distributed
    two-pass prefix sum over (lang, doc_id) order — partition-count-
    invariant shard ids, never a whole-stratum window."""
    from sac2mseed_spark.operators.shards import pack_shards

    docs = load_table(spark, sf_dir, "documents")
    return pack_shards(docs, SHARD_BUDGET_TOKENS).select(
        F.col("key").alias("doc_id"),
        F.col("stratum").alias("lang"),
        "n_tokens",
        "shard_id",
        "shard_offset",
    )


def q_shard_manifest(spark, sf_dir):
    """Per-shard export manifest (doc count, token total, key range)."""
    from sac2mseed_spark.operators.shards import pack_shards, shard_manifest

    docs = load_table(spark, sf_dir, "documents")
    m = shard_manifest(pack_shards(docs, SHARD_BUDGET_TOKENS))
    return m.select(
        F.col("stratum").alias("lang"),
        "shard_id",
        "n_docs",
        "n_tokens",
        F.col("first_key").alias("first_doc_id"),
        F.col("last_key").alias("last_doc_id"),
    )


# as-of attribution tolerance: a purchase is credited to the user's
# latest click within this window (shared by query and oracle)
ASOF_TOLERANCE_US = 86_400_000_000  # 24 h


def q_asof_attribution(spark, sf_dir):
    """Purchase->click as-of attribution (operators/asof.py): latest
    click at-or-before each purchase per user, 24h tolerance. One
    shuffle by user_id via the union+running-last formulation — the
    scale-correct as-of; oracle is DuckDB's native ASOF JOIN."""
    from sac2mseed_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts_us"
    )
    out = asof_join(
        purchases,
        clicks,
        key_cols=["user_id"],
        ts_col="ts_us",
        right_payload=["event_id"],
        tolerance_us=ASOF_TOLERANCE_US,
        tiebreak_col="event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts_us",
        "value",
        F.col("event_id_r").alias("click_event_id"),
        F.col("ts_r").alias("click_ts_us"),
        (F.col("ts_us") - F.col("ts_r")).alias("gap_us"),
    )


def q_dedup_simhash(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash(_aug_docs(docs))


def q_simhash_pairs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_pairs(_aug_docs(docs), max_hamming=3)


def q_knn_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return S.knn_bruteforce(emb, emb.filter(F.col("vec_id") % 50 == 0), k=5)


def q_knn_lsh(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    # expect_dims pins the kernel to the oracle's 64-d plane literals
    return S.knn_lsh(emb, emb.filter(F.col("vec_id") % 50 == 0), k=5, expect_dims=64)


# Retention horizons used by the retention queries/oracles: the sf tables
# span ~30 days, so 2d of 1m windows / 10d of 1h windows / 1d forever
# exercises every band.
_RET_H1M_US = 2 * 86_400_000_000
_RET_H1H_US = 10 * 86_400_000_000
_RET_HORIZONS = {"1m": _RET_H1M_US, "1h": _RET_H1H_US, "1d": None}


def _now_us(spark, sf_dir) -> int:
    return _metrics(spark, sf_dir).agg(F.max("ts_us")).collect()[0][0]


def q_retention_sweep(spark, sf_dir):
    """Downsample-and-expire accounting (operators/retention.py): per tier,
    windows/points kept vs evicted under the default horizons — the report
    a metadata-only Iceberg DELETE job writes to the metrics table."""
    m = _metrics(spark, sf_dir)
    return retention_sweep(rollup_cascade(m), _now_us(spark, sf_dir), _RET_HORIZONS)


def q_tiered_serve(spark, sf_dir):
    """Age-banded serving view: finest retained tier per age band — recent
    windows at 1m resolution, mid-age at 1h, old at 1d; disjoint bands,
    pure partition-prunable filters + union."""
    m = _metrics(spark, sf_dir)
    return serve_tiered(rollup_cascade(m), _now_us(spark, sf_dir), _RET_HORIZONS)


def q_knn_ivf(spark, sf_dir):
    """IVF inverted-list ANN (operators/ivf.py): corpus assigned once to 8
    medoid-seeded centroids, each query probes its 2 nearest lists, exact
    cosine re-ranks. Same candidate-then-verify shape as the reference's
    selection short-circuit (parseutils.c:163-201)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_ivf(
        emb, emb.filter(F.col("vec_id") % 50 == 0), k=5, expect_dims=64
    )


def q_knn_ivf_trained(spark, sf_dir):
    """IVF ANN over PRODUCTION-TRAINED centroids: the deterministic
    sampled spherical k-means trainer (operators/ivf.train_centroids —
    bottom-256-by-md5 sample, farthest-point init, 10 Lloyd iterations,
    every reduction a defined sequential fold) replaces the medoid seed;
    the DuckDB twin replays the training bit-for-bit as unrolled CTEs
    (_knn_ivf_trained_sql), so this row proves the trainer itself, not
    just the probe pipeline."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = train_centroids(emb, n_centroids=8, n_iters=10, sample_cap=256)
    return knn_ivf(
        emb,
        emb.filter(F.col("vec_id") % 50 == 0),
        k=5,
        expect_dims=64,
        centroids=cents,
    )


def q_rat_approx(spark, sf_dir):
    """F4 ms_ratapprox analogue (genutils.c:1455-1521): per-conversation
    mean turn rate (turns/hour — the natural unit at transcript cadence,
    like samples/sec at seismic cadence) approximated as a bounded-
    denominator rational via fixed-length continued-fraction expansion —
    pure Catalyst expressions, bit-matched by the unrolled-CTE DuckDB twin
    (functions/ratapprox.py)."""
    t = transcripts_from_events(spark, sf_dir)
    g = (
        t.groupBy("conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.min(ts_us_col("ts")).alias("min_ts"),
            F.max(ts_us_col("ts")).alias("max_ts"),
        )
        .filter((F.col("n_turns") >= 2) & (F.col("max_ts") > F.col("min_ts")))
        .withColumn(
            "rate_per_hour",
            (F.col("n_turns") - 1).cast("double")
            * F.lit(3600000000.0)
            / (F.col("max_ts") - F.col("min_ts")).cast("double"),
        )
        # ratapprox precondition (functions/ratapprox.py): x < ~1e9 keeps
        # every live convergent step inside int64 on BOTH engines (Spark
        # wraps silently, DuckDB raises — so out-of-range rows must never
        # reach either). Degenerate microsecond-span conversations can
        # push turns/hour past this; they carry no rate information.
        .filter(F.col("rate_per_hour") < F.lit(1e9))
    )
    return rat_approx(g, "rate_per_hour", 1000).select(
        "conv_id",
        "n_turns",
        F.round("rate_per_hour", 6).alias("rate_per_hour"),
        "rat_num",
        "rat_den",
    )


def q_dedup_embedding(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return S.embedding_dup_pairs(emb, threshold=0.4, expect_dims=64)


def q_multimodal_features(spark, sf_dir):
    # mean_level is rounded JVM-side (HALF_UP, matching DuckDB's round)
    # so the kernel emits the raw double and both engines round once
    docs = load_table(spark, sf_dir, "documents")
    media = synth_media(docs)
    return extract_features(media, fake_decode=True).select(
        "media_id", "kind", "n_bytes", "width", "height", "n_frames",
        F.round("mean_level", 6).alias("mean_level"), "digest",
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full tier cascade over sf0.001 transcripts, 1h derived."""
    return q_tier_derived_1h(spark, "/root/testdata/sf0.001")


def q_interval_overlap(spark, sf_dir):
    """Bucketed interval-overlap join (operators/rangejoin.py): session
    segments x hot "incident" hours (global count > 1.5x hourly mean),
    exploded to hour buckets so the overlap is an equi-join, never a
    nested-loop range product."""
    from sac2mseed_spark.operators.rangejoin import interval_overlap

    return interval_overlap(_metrics(spark, sf_dir))


def q_latency_histogram(spark, sf_dir):
    """Log2-bucket latency histogram per role (operators/histogram.py):
    bucket index from integer bit length (length(bin(x))-1), never
    float log2 — exact at power-of-2 boundaries in both engines."""
    from sac2mseed_spark.operators.histogram import latency_histogram

    return latency_histogram(_metrics(spark, sf_dir))


def q_counter_rate(spark, sf_dir):
    """PromQL-style reset-aware counter increase/rate over the running
    within-segment token counter (operators/counters.py): the counter
    climbs turn-by-turn and resets at every session boundary, and the
    operator recovers the true increase across resets."""
    from sac2mseed_spark.operators.counters import counter_rate

    return counter_rate(_metrics(spark, sf_dir))


def q_distinct_kmv(spark, sf_dir):
    """K-minimum-values distinct-conversation sketch per hour window
    (operators/sketch.py) next to the exact count it estimates — the
    engine-portable cardinality sketch (md5-hash order statistic, one
    IEEE division; no float log boundaries)."""
    from sac2mseed_spark.operators.sketch import kmv_distinct

    return kmv_distinct(_metrics(spark, sf_dir))


def q_burstiness(spark, sf_dir):
    """Inter-arrival CV^2 + per-minute Fano factor per conversation
    (operators/burstiness.py) — point-process burstiness from exact
    integer sums with one final float expression per statistic."""
    from sac2mseed_spark.operators.burstiness import burstiness

    return burstiness(_metrics(spark, sf_dir))


# shared parameters for the ACF / CUSUM / seasonal-naive / SAX queries
ACF_LAGS = (1, 2, 3)
ACF_MIN_PAIRS = 8
CUSUM_TAU = 1.0
SEASON_US = 86_400_000_000  # 1-day season over the 1h tier


def q_autocorr(spark, sf_dir):
    """Lag-1/2/3 autocorrelation of per-hour token sums per conversation
    (operators/autocorr.py): all covariance pieces are exact integer
    sums; one canonical float expression mirrored in the oracle."""
    from sac2mseed_spark.operators.autocorr import autocorrelation

    t1h = rollup_from_turns(_metrics(spark, sf_dir), "1h")
    return autocorrelation(t1h, lags=ACF_LAGS, min_pairs=ACF_MIN_PAIRS)


def q_changepoint_cusum(spark, sf_dir):
    """CUSUM level-shift changepoint per conversation over the 1h token
    series (operators/changepoint.py): integer prefix sums make the
    bridge floats bit-identical across engines; argmax row selected by
    (|D| desc, window asc) — identical doubles, identical order."""
    from sac2mseed_spark.operators.changepoint import cusum_changepoints

    t1h = rollup_from_turns(_metrics(spark, sf_dir), "1h")
    return cusum_changepoints(t1h, tau=CUSUM_TAU)


def q_seasonal_naive(spark, sf_dir):
    """Seasonal-naive (value 24h ago) forecast MAE/RMSE per conversation
    over the 1h tier (operators/forecast.py): the forecast baseline is
    a co-partitioned self-equi-join on (conv, window − 1d); errors are
    exact ints, MAE/RMSE one canonical float expression each."""
    from sac2mseed_spark.operators.forecast import seasonal_naive_error

    t1h = rollup_from_turns(_metrics(spark, sf_dir), "1h")
    return seasonal_naive_error(t1h, season_us=SEASON_US)


def q_sax_words(spark, sf_dir):
    """SAX symbolization of each conversation's z-normalized hourly
    token series into an a-d word (operators/sax.py): z from exact
    integer conv totals, word by order-defined aggregation (sorted
    structs here, string_agg ORDER BY in the oracle)."""
    from sac2mseed_spark.operators.sax import sax_words

    t1h = rollup_from_turns(_metrics(spark, sf_dir), "1h")
    return sax_words(t1h)


CCF_LAGS = (0, 1, 2)
LTTB_BUCKET_US = 4 * 3_600_000_000  # 4h pixel buckets over the 1m tier


def q_cross_corr(spark, sf_dir):
    """Lagged cross-correlation corr(latency_t, turn_count_{t-k}) per
    conversation over the 1h tier (operators/autocorr.py
    cross_correlation): does past turn volume lead latency? Shares the
    ACF kernel — both series ride the same tier row, so no join."""
    from sac2mseed_spark.operators.autocorr import cross_correlation

    t1h = rollup_from_turns(_metrics(spark, sf_dir), "1h").withColumn(
        "lat_s",
        F.floor(F.col("sum_latency_us") / F.lit(1000000.0)).cast("long"),
    )
    return cross_correlation(
        t1h, "lat_s", "n_points", lags=CCF_LAGS, min_pairs=ACF_MIN_PAIRS
    )


def q_lttb_downsample(spark, sf_dir):
    """Parallel LTTB shape-preserving downsample of the 1m token series
    into 4h buckets (operators/lttb.py): neighbor-bucket mean anchors
    from exact integer sums, per-bucket max-area argmax with an
    engine-identical ordering."""
    from sac2mseed_spark.operators.lttb import lttb_downsample

    t1m = rollup_from_turns(_metrics(spark, sf_dir), "1m")
    return lttb_downsample(t1m, bucket_us=LTTB_BUCKET_US)


def q_response_latency(spark, sf_dir):
    """Per-conversation time-to-next-assistant-response profile
    (operators/response.py): reversed unbounded-following min frame —
    no self-join; integer second gaps, one float division."""
    from sac2mseed_spark.operators.response import response_latency

    return response_latency(_metrics(spark, sf_dir))


def q_cohort_retention(spark, sf_dir):
    """Daily cohort retention matrix over conversations (operators/
    cohort.py): (conv, day) distinct → cohort min → (cohort, day)
    counts, cohort sizes broadcast; rate is one double division."""
    from sac2mseed_spark.operators.cohort import cohort_retention

    return cohort_retention(_metrics(spark, sf_dir))


def q_tool_gini(spark, sf_dir):
    """Tool-usage Gini impurity per conversation (operators/
    diversity.py): log-free diversity from integer counts — the same
    rational-arithmetic discipline as salient_terms."""
    from sac2mseed_spark.operators.diversity import tool_gini

    return tool_gini(transcripts_from_events(spark, sf_dir))


def q_activity_streaks(spark, sf_dir):
    """Longest consecutive-window activity streak per conversation
    over the 1h tier (operators/streaks.py): gaps-and-islands via
    idx - row_number(), all-integer, ties to earliest start."""
    from sac2mseed_spark.operators.streaks import activity_streaks

    return activity_streaks(
        rollup_from_turns(_metrics(spark, sf_dir), "1h"), "1h"
    )


def q_robust_outliers(spark, sf_dir):
    """Median/MAD robust outliers on 1h window latency seconds
    (operators/robust.py; same floored-seconds value as
    anomaly_zscore — the token/point columns of the event-derived
    corpus are cadence-regular, MAD 0 by construction): exact
    interpolated percentiles over integers are half/quarter-integers,
    bit-equal across engines; the robust z is one shared float
    expression rounded 6dp."""
    from sac2mseed_spark.operators.robust import robust_outliers

    t1h = rollup_from_turns(_metrics(spark, sf_dir), "1h").withColumn(
        "lat_s",
        F.floor(F.col("sum_latency_us") / F.lit(1000000.0)).cast("long"),
    )
    return robust_outliers(
        t1h,
        value_col="lat_s",
        tau=ROBUST_TAU,
        min_windows=ROBUST_MIN_WINDOWS,
    )


def q_term_cooccurrence(spark, sf_dir):
    """Top-4-terms-per-document co-occurrence with doc-set Jaccard
    (operators/cooccur.py): tf top-k bounds the per-doc pair fan-out
    at 6; integer pair counts, one final division."""
    from sac2mseed_spark.operators.cooccur import term_cooccurrence

    return term_cooccurrence(
        load_table(spark, sf_dir, "documents"), k=COOCCUR_K
    )


def q_ohlc_1h(spark, sf_dir):
    """Per-(conv, hour) OHLC bars of token_count (operators/ohlc.py):
    first/last by the stable (ts, turn_idx) order via two row_number
    directions folded into one hash aggregate — all-integer."""
    from sac2mseed_spark.operators.ohlc import ohlc_bars

    return ohlc_bars(_metrics(spark, sf_dir), "1h", "token_count")


def q_window_topk(spark, sf_dir):
    """Hourly top-k conversation leaderboard (operators/
    leaderboard.py): salted two-phase top-k so a hot hour never
    builds a fat rank partition; deterministic (value desc, conv asc)
    total order."""
    from sac2mseed_spark.operators.leaderboard import window_topk

    return window_topk(
        rollup_from_turns(_metrics(spark, sf_dir), "1h"), k=TOPK_CONVS
    )


def q_funnel(spark, sf_dir):
    """user → tool → assistant ordered funnel per conversation
    (operators/funnel.py): conditional min-after-min aggregates on
    one conv partitioning, strictly-after semantics for determinism
    on shared timestamps."""
    from sac2mseed_spark.operators.funnel import funnel_steps

    return funnel_steps(_metrics(spark, sf_dir))


def q_utilization(spark, sf_dir):
    """Gap-threshold active/idle duty cycle per conversation
    (operators/utilization.py): integer least/greatest sums, one
    float division."""
    from sac2mseed_spark.operators.utilization import utilization

    return utilization(_metrics(spark, sf_dir), idle_after_s=UTIL_IDLE_S)


def q_seasonal_anomaly(spark, sf_dir):
    """Hour-of-day baseline anomalies on 1h window latency seconds
    (operators/seasonal_anomaly.py): 24-row integer baseline,
    broadcast join back, canonical float z — no second shuffle."""
    from sac2mseed_spark.operators.seasonal_anomaly import (
        seasonal_anomalies,
    )

    t1h = rollup_from_turns(_metrics(spark, sf_dir), "1h").withColumn(
        "lat_s",
        F.floor(F.col("sum_latency_us") / F.lit(1000000.0)).cast("long"),
    )
    return seasonal_anomalies(
        t1h, value_col="lat_s", tau=SEASONAL_TAU, min_per_hod=24
    )


def q_dispersion_stats(spark, sf_dir):
    """Exact quartile spread + crest factor of 1h window latency
    seconds (operators/dispersion.py): one sort aggregate per conv;
    quarter-integer quantiles are bit-equal across engines."""
    from sac2mseed_spark.operators.dispersion import dispersion_stats

    t1h = rollup_from_turns(_metrics(spark, sf_dir), "1h").withColumn(
        "lat_s",
        F.floor(F.col("sum_latency_us") / F.lit(1000000.0)).cast("long"),
    )
    return dispersion_stats(t1h, value_col="lat_s", min_windows=4)


def q_weekly_growth(spark, sf_dir):
    """Week-over-week corpus growth (operators/growth.py): one global
    hash aggregate to weeks-count rows, lag over the tiny result."""
    from sac2mseed_spark.operators.growth import weekly_growth

    return weekly_growth(_metrics(spark, sf_dir))


def q_verbosity_drift(spark, sf_dir):
    """Per-conversation OLS of token_count on turn_idx (operators/
    drift.py): integer normal equations, two float divisions."""
    from sac2mseed_spark.operators.drift import verbosity_drift

    return verbosity_drift(_metrics(spark, sf_dir), min_turns=8)


def q_role_mix_daily(spark, sf_dir):
    """Daily role-mix composition shares (operators/rolemix.py): one
    hash aggregate to (day, role); per-day totals from a window over
    that tiny result."""
    from sac2mseed_spark.operators.rolemix import role_mix_daily

    return role_mix_daily(_metrics(spark, sf_dir))


def q_lexical_diversity(spark, sf_dir):
    """Per-conversation type-token ratio (operators/lexical.py):
    explode once, totals + distinct-types on one conv partitioning,
    one float division."""
    from sac2mseed_spark.operators.lexical import lexical_diversity

    return lexical_diversity(
        transcripts_from_events(spark, sf_dir), min_tokens=20
    )


def q_tool_stall(spark, sf_dir):
    """Per-tool resume-latency bill (operators/toolstall.py): two more
    lag() columns on the existing conv exchange, then a tiny per-tool
    aggregate — floored-seconds integer sums."""
    from sac2mseed_spark.operators.toolstall import tool_stall

    return tool_stall(_metrics(spark, sf_dir), min_uses=3)


def q_conv_outcomes(spark, sf_dir):
    """Who got the last word (operators/outcomes.py): reversed
    row_number folded into the conv aggregate — no join-back."""
    from sac2mseed_spark.operators.outcomes import conv_outcomes

    return conv_outcomes(_metrics(spark, sf_dir))


def q_conv_dedup(spark, sf_dir):
    """Whole-conversation exact dedup (operators/convdedup.py):
    per-turn 60-bit digests combined order-defined — 8 bytes per turn
    on the wire, never text."""
    from sac2mseed_spark.operators.convdedup import conv_dedup

    return conv_dedup(transcripts_from_events(spark, sf_dir))


def q_layout_audit(spark, sf_dir):
    """Z-order vs time-sorted file-layout audit (operators/layout.py):
    per-file conversation/hour clustering stats — all-integer, the
    footer-stats-pruning evidence behind the tier write order."""
    from sac2mseed_spark.operators.layout import layout_audit

    t = transcripts_from_events(spark, sf_dir).select(
        "conv_id", "turn_idx", ts_us_col("ts").alias("ts_us")
    )
    return layout_audit(t, n_files=64)


def q_dup_ngram_coverage(spark, sf_dir):
    """Per-document duplicated-shingle coverage (operators/dedup.py
    dup_ngram_coverage): the exact-substring-dedup curation metric;
    one reused sh_h exchange, only 8-byte digests shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return D.dup_ngram_coverage(_aug_docs(docs), k=3)


def q_repetition_loops(spark, sf_dir):
    """Degenerate-loop detection (operators/repetition.py): consecutive
    same-role turn token-set Jaccard; digests shuffle, text never
    does."""
    from sac2mseed_spark.operators.repetition import repetition_loops

    return repetition_loops(
        transcripts_from_events(spark, sf_dir), threshold=0.9, min_pairs=3
    )


def q_corpus_mix(spark, sf_dir):
    """Corpus mixture accounting (operators/mix.py): docs + tokens by
    (lang, source), shares from a window over the tiny aggregate —
    the baseline table stratified_sample rates are chosen against."""
    from sac2mseed_spark.operators.mix import corpus_mix

    return corpus_mix(load_table(spark, sf_dir, "documents"))


def _aug_transcripts(t: DataFrame) -> DataFrame:
    """Transcripts plus deterministic near-duplicate conversations:
    convs with numeric suffix < 20 get a replay variant (conv_id ~v)
    missing its first two turns — guarantees conv_near_dup true
    positives at every sf (the _aug_docs idiom on conversations)."""
    n = F.element_at(F.split("conv_id", "_"), 2).cast("int")
    variants = (
        t.filter((n < 20) & (F.col("turn_idx") >= 2))
        .withColumn("conv_id", F.concat(F.col("conv_id"), F.lit("~v")))
    )
    return t.unionByName(variants)


def q_conv_near_dup(spark, sf_dir):
    """Near-duplicate conversation pairs (operators/convdedup.py):
    Jaccard over distinct turn-digest sets, df-capped inverted index —
    the order-free complement of conv_dedup's exact digest."""
    from sac2mseed_spark.operators.convdedup import conv_near_dup

    t = _aug_transcripts(
        transcripts_from_events(spark, sf_dir).select(
            "conv_id", "turn_idx", "text"
        )
    )
    return conv_near_dup(t, threshold=0.9)


def q_conv_dup_clusters(spark, sf_dir):
    """Conversation duplicate families (operators/convdedup.py): min-
    label propagation over the conv_near_dup pair graph — the conv-
    level twin of dedup_clusters."""
    from sac2mseed_spark.operators.convdedup import conv_dup_clusters

    t = _aug_transcripts(
        transcripts_from_events(spark, sf_dir).select(
            "conv_id", "turn_idx", "text"
        )
    )
    return conv_dup_clusters(t, threshold=0.9)


def q_source_quality(spark, sf_dir):
    """Per-source macro quality dashboard (operators/mix.py): one
    map-side-combining hash aggregate to |sources| rows; every share a
    ratio of integer sums, all-codegen counting expressions."""
    from sac2mseed_spark.operators.mix import source_quality

    return source_quality(load_table(spark, sf_dir, "documents"))


def q_shingle_novelty(spark, sf_dir):
    """Per-day never-seen-before shingle share (operators/novelty.py):
    one collect_set exchange of (digest, day) pairs, explode + per-day
    agg — the crawl-loop-vs-growth freshness curve."""
    from sac2mseed_spark.operators.novelty import shingle_novelty

    t = transcripts_from_events(spark, sf_dir).select(
        "text", ts_us_col("ts").alias("ts_us")
    )
    return shingle_novelty(t)


def q_source_overlap(spark, sf_dir):
    """Cross-source shingle-overlap matrix (operators/mix.py): distinct
    (source, digest) self-join, per-source totals broadcast back —
    shows which sources re-crawl each other before mixture weighting."""
    from sac2mseed_spark.operators.mix import source_overlap

    return source_overlap(load_table(spark, sf_dir, "documents"))


def q_sliding_1h15m(spark, sf_dir):
    """Hopping-window rollup, 1h width / 15m slide (operators/sliding.py):
    native `F.window(ts, width, slide)` — Catalyst expands each row into
    its 4 containing windows inside the aggregate (no join/explode) and
    hash-aggregates with map-side partial combine; integer-domain stats."""
    from sac2mseed_spark.operators.sliding import sliding_rollup

    return sliding_rollup(
        _metrics(spark, sf_dir), 3_600_000_000, 900_000_000
    )


def q_latency_cube(spark, sf_dir):
    """CUBE (role, tool) latency dashboard (operators/cube.py): one
    Expand + single-shuffle hash aggregate answers all four grouping
    sets; gid = 2*grouping(role)+grouping(tool) separates data NULLs
    from rollup-total NULLs identically on both engines."""
    from sac2mseed_spark.operators.cube import latency_cube

    return latency_cube(_metrics(spark, sf_dir))


def q_daily_coverage(spark, sf_dir):
    """Per (conv, day) 1h-tier completeness (operators/coverage.py):
    SYNC-listing inverse — hour-slots present, coverage ratio, first/last
    populated slot. Second exchange moves only tier rows; Catalyst prunes
    the unused latency window out of the whole plan (scan reads ts+user
    only — plan-gated)."""
    from sac2mseed_spark.operators.coverage import daily_coverage

    return daily_coverage(
        rollup_from_turns(_metrics(spark, sf_dir), "1h")
    )


def q_latency_rollup_hier(spark, sf_dir):
    """Hierarchical ROLLUP (day -> role) drill-down (operators/cube.py):
    3 grouping sets (day x role, day subtotal, grand total) in one
    Expand + one shuffle; engine-neutral gid as in the cube."""
    from sac2mseed_spark.operators.cube import latency_rollup_hier

    return latency_rollup_hier(_metrics(spark, sf_dir))


def q_twa_1h(spark, sf_dir):
    """Time-weighted hourly average of token_count (operators/twa.py):
    LOCF step function capped at the 30 min segment tolerance, hold
    intervals apportioned EXACTLY across hourly windows in integer
    microseconds. explode(sequence) fan-out is the constant
    ceil(tol/width)+1 = 2 — bounded by config, not data (plan-gated)."""
    from sac2mseed_spark.operators.twa import time_weighted_avg

    return time_weighted_avg(_metrics(spark, sf_dir), 3_600_000_000)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "transcripts": q_transcripts,
        "rollup_1m": q_rollup_1m,
        "rollup_1h": q_rollup_1h,
        "rollup_1d": q_rollup_1d,
        "tier_derived_1h": q_tier_derived_1h,
        "segments": q_segments,
        "gap_report": q_gap_report,
        "gapfill_locf_1h": q_gapfill_locf_1h,
        "gapfill_linear_1h": q_gapfill_linear_1h,
        "selections": q_selections,
        "selections_glob": q_selections_glob,
        "overrides": q_overrides,
        "autoscale": q_autoscale,
        "pack_stats_1m": q_pack_stats_1m,
        "roundtrip_1m": q_roundtrip_1m,
        "tier_read_1m": q_tier_read_1m,
        "repack_1h": q_repack_1h,
        "time_functions": q_time_functions,
        "conv_summary": q_conv_summary,
        "validation_report": q_validation_report,
        "dedup_exact": q_dedup_exact,
        "text_quality": q_text_quality,
        "doc_fingerprint": q_doc_fingerprint,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_simhash": q_dedup_simhash,
        "dedup_clusters": q_dedup_clusters,
        "pii_scrub": q_pii_scrub,
        "topk_ngrams": q_topk_ngrams,
        "stratified_sample": q_stratified_sample,
        "sample_report": q_sample_report,
        "stratified_resample": q_stratified_resample,
        "embedding_quantize": q_embedding_quantize,
        "asof_attribution": q_asof_attribution,
        "token_shards": q_token_shards,
        "shard_manifest": q_shard_manifest,
        "contamination": q_contamination,
        "anomaly_zscore": q_anomaly_zscore,
        "ewma_smooth": q_ewma_smooth,
        "latency_percentiles": q_latency_percentiles,
        "m4_downsample": q_m4_downsample,
        "rollup_month": q_rollup_month,
        "trend_slope": q_trend_slope,
        "concurrency_peak": q_concurrency_peak,
        "hourly_profile": q_hourly_profile,
        "burst_detect": q_burst_detect,
        "role_transitions": q_role_transitions,
        "salient_terms": q_salient_terms,
        "bm25_search": q_bm25_search,
        "sft_pairs": q_sft_pairs,
        "pref_pairs": q_pref_pairs,
        "conv_survival": q_conv_survival,
        "template_turns": q_template_turns,
        "context_fit": q_context_fit,
        "simhash_pairs": q_simhash_pairs,
        "knn_bruteforce": q_knn_bruteforce,
        "knn_lsh": q_knn_lsh,
        "knn_ivf": q_knn_ivf,
        "knn_ivf_trained": q_knn_ivf_trained,
        "rat_approx": q_rat_approx,
        "retention_sweep": q_retention_sweep,
        "tiered_serve": q_tiered_serve,
        "dedup_embedding": q_dedup_embedding,
        "multimodal_features": q_multimodal_features,
        "counter_rate": q_counter_rate,
        "distinct_kmv": q_distinct_kmv,
        "burstiness": q_burstiness,
        "interval_overlap": q_interval_overlap,
        "latency_histogram": q_latency_histogram,
        "autocorr": q_autocorr,
        "changepoint_cusum": q_changepoint_cusum,
        "seasonal_naive": q_seasonal_naive,
        "sax_words": q_sax_words,
        "tool_gini": q_tool_gini,
        "cross_corr": q_cross_corr,
        "lttb_downsample": q_lttb_downsample,
        "response_latency": q_response_latency,
        "cohort_retention": q_cohort_retention,
        "activity_streaks": q_activity_streaks,
        "robust_outliers": q_robust_outliers,
        "term_cooccurrence": q_term_cooccurrence,
        "ohlc_1h": q_ohlc_1h,
        "window_topk": q_window_topk,
        "funnel": q_funnel,
        "utilization": q_utilization,
        "seasonal_anomaly": q_seasonal_anomaly,
        "dispersion_stats": q_dispersion_stats,
        "weekly_growth": q_weekly_growth,
        "verbosity_drift": q_verbosity_drift,
        "role_mix_daily": q_role_mix_daily,
        "lexical_diversity": q_lexical_diversity,
        "tool_stall": q_tool_stall,
        "conv_outcomes": q_conv_outcomes,
        "conv_dedup": q_conv_dedup,
        "repetition_loops": q_repetition_loops,
        "dup_ngram_coverage": q_dup_ngram_coverage,
        "layout_audit": q_layout_audit,
        "corpus_mix": q_corpus_mix,
        "source_overlap": q_source_overlap,
        "shingle_novelty": q_shingle_novelty,
        "conv_near_dup": q_conv_near_dup,
        "conv_dup_clusters": q_conv_dup_clusters,
        "source_quality": q_source_quality,
        "sliding_1h15m": q_sliding_1h15m,
        "latency_cube": q_latency_cube,
        "daily_coverage": q_daily_coverage,
        "twa_1h": q_twa_1h,
        "latency_rollup_hier": q_latency_rollup_hier,
    }


# ----------------------------------------------------------------------
# DuckDB oracles
# ----------------------------------------------------------------------

def _segments_sql() -> str:
    return f"""{_ORACLE_PREFIX},
s AS (
  SELECT *, CASE WHEN ts_us - lag(ts_us) OVER
      (PARTITION BY conv_id ORDER BY ts_us, turn_idx) > 1800000000
    THEN 1 ELSE 0 END AS brk
  FROM m
),
seg AS (
  SELECT *, CAST(sum(brk) OVER (PARTITION BY conv_id ORDER BY ts_us, turn_idx
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS segment_id
  FROM s
)
SELECT conv_id, segment_id,
       min(ts_us) AS seg_start_us, max(ts_us) AS seg_end_us,
       count(*) AS n_turns, CAST(sum(token_count) AS BIGINT) AS sum_tokens
FROM seg GROUP BY 1, 2
"""


def _gap_report_sql() -> str:
    return f"""{_ORACLE_PREFIX},
g AS (
  SELECT conv_id, turn_idx, ts_us,
         lag(ts_us) OVER w AS prev_ts_us,
         lag(turn_idx) OVER w AS prev_turn_idx
  FROM m WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx, ts_us)
)
SELECT conv_id, prev_turn_idx, turn_idx, prev_ts_us, ts_us,
       ts_us - prev_ts_us AS gap_us
FROM g
WHERE prev_ts_us IS NOT NULL
  AND (ts_us - prev_ts_us >= 600000000 OR ts_us - prev_ts_us < 0)
"""


def _gapfill_sql(method: str) -> str:
    w = _TIER_US["1h"]
    if method == "locf":
        fill = (
            "last_value(t.sum_tokens IGNORE NULLS) OVER "
            "(PARTITION BY g.conv_id ORDER BY g.window_start_us "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sum_tokens"
        )
    else:
        fill = """
    round(CASE WHEN t.sum_tokens IS NOT NULL THEN CAST(t.sum_tokens AS DOUBLE)
      WHEN pv IS NOT NULL AND nv IS NOT NULL AND nt <> pt THEN
        CAST(pv AS DOUBLE) + CAST(nv - pv AS DOUBLE)
          * (g.window_start_us - pt) / (nt - pt)
      ELSE CAST(coalesce(pv, nv) AS DOUBLE) END, 6) AS sum_tokens_f"""
    prev_next = """
         last_value(t.sum_tokens IGNORE NULLS) OVER wb AS pv,
         last_value(CASE WHEN t.sum_tokens IS NOT NULL
             THEN g.window_start_us END IGNORE NULLS) OVER wb AS pt,
         first_value(t.sum_tokens IGNORE NULLS) OVER wf AS nv,
         first_value(CASE WHEN t.sum_tokens IS NOT NULL
             THEN g.window_start_us END IGNORE NULLS) OVER wf AS nt,
    """ if method == "linear" else ""
    select_fill = fill if method == "locf" else "sum_tokens_f"
    inner = f"""
  SELECT g.conv_id, g.window_start_us,
         coalesce(t.n_points, 0) AS n_points,
         t.conv_id IS NULL AS is_filled,
         {prev_next}
         t.sum_tokens
  FROM grid g LEFT JOIN t1h t
    ON g.conv_id = t.conv_id AND g.window_start_us = t.window_start_us
  WINDOW wb AS (PARTITION BY g.conv_id ORDER BY g.window_start_us
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY g.conv_id ORDER BY g.window_start_us
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
"""
    outer_val = (
        "last_value(sum_tokens IGNORE NULLS) OVER (PARTITION BY conv_id "
        "ORDER BY window_start_us ROWS BETWEEN UNBOUNDED PRECEDING AND "
        "CURRENT ROW) AS sum_tokens"
        if method == "locf"
        else fill.replace("t.sum_tokens", "sum_tokens").replace("g.window_start_us", "window_start_us")
    )
    return f"""{_ORACLE_PREFIX},
t1h AS (
  SELECT conv_id,
         CAST(floor(ts_us / {w}.0) AS BIGINT) * {w} AS window_start_us,
         count(*) AS n_points,
         CAST(sum(token_count) AS BIGINT) AS sum_tokens
  FROM m GROUP BY 1, 2
),
b AS (SELECT conv_id, min(window_start_us) AS mn, max(window_start_us) AS mx
      FROM t1h GROUP BY 1),
grid AS (SELECT conv_id, unnest(generate_series(mn, mx, {w})) AS window_start_us
         FROM b),
dense AS ({inner})
SELECT conv_id, window_start_us, n_points, is_filled, {outer_val}
FROM dense
"""


def _autoscale_sql() -> str:
    return """
WITH grp AS (
  SELECT user_id,
         max(abs(value)) AS max_abs,
         max(CASE WHEN abs(value - trunc(value)) > 1e-9 THEN 1 ELSE 0 END) = 1
           AS has_frac
  FROM events GROUP BY 1
),
sc AS (
  SELECT *, CASE WHEN has_frac THEN CAST(round(pow(10,
      greatest(6 - length(CAST(CAST(floor(max_abs) AS BIGINT) AS VARCHAR)), 0)
    )) AS BIGINT) ELSE 1 END AS scale
  FROM grp
)
SELECT e.user_id, round(s.max_abs, 6) AS max_abs, s.has_frac, s.scale,
       CAST(sum(CAST(trunc(e.value * s.scale) AS BIGINT)) AS BIGINT)
         AS sum_scaled_trunc,
       CAST(sum(CAST(floor(e.value * s.scale + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_scaled_round
FROM events e JOIN sc s ON e.user_id = s.user_id
GROUP BY 1, 2, 3, 4
"""


def _pack_stats_sql() -> str:
    w = _TIER_US["1m"]
    return f"""{_ORACLE_PREFIX}
SELECT conv_id,
       CAST(floor(ts_us / {w}.0) AS BIGINT) * {w} AS window_start_us,
       count(*) AS n_points,
       CAST(count(DISTINCT CAST(floor(turn_idx / 4096.0) AS INTEGER)) AS INTEGER)
         AS n_chunks,
       min(ts_us) AS first_ts_us,
       max(ts_us) AS last_ts_us
FROM m GROUP BY 1, 2
"""


def _text_quality_sql() -> str:
    toks = _TOKENS_SQL.format(t="text")
    sw = f"len(list_filter({toks}, t -> list_contains({_STOPWORDS_SQL}, lower(t))))"
    ntok = f"len({toks})"
    swr = f"CASE WHEN {ntok} > 0 THEN {sw} / {ntok} ELSE 0.0 END"
    punct = (
        "CASE WHEN length(text) > 0 THEN "
        "len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) / length(text) "
        "ELSE 0.0 END"
    )
    quality = f"round(least(length(text) / 500.0, 1.0) * (1.0 - {punct}) * (0.5 + 0.5 * {swr}), 6)"
    lang = f"CASE WHEN {ntok} < 3 THEN 'und' WHEN {swr} >= 0.05 THEN 'en' ELSE 'xx' END"
    return f"""
SELECT doc_id,
       CAST({ntok} AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '{T.BPE_TOKEN_RE}')) AS BIGINT) AS bpe_tokens,
       round({punct}, 6) AS punct_ratio,
       round({swr}, 6) AS stopword_ratio,
       {quality} AS quality,
       {lang} AS lang_pred
FROM documents
"""


def _fingerprint_sql() -> str:
    g = h60_sql("substr(trim(text), i, 8)")
    return f"""
SELECT doc_id,
       list_min([{g} FOR i IN range(1, greatest(length(trim(text)) - 6, 2))])
         AS fingerprint
FROM documents
"""


def _dedup_exact_sql() -> str:
    return f"""
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id,
         array_to_string(({_TOKENS_SQL.format(t='text')})[6:], ' ') AS text
  FROM documents WHERE doc_id < 50
)
SELECT min(doc_id) AS keep_id, count(*) AS n_dups,
       {h60_sql('text')} AS text_h60
FROM aug GROUP BY 3
"""


def _jaccard_sql(threshold: float) -> str:
    # document-frequency cap mirrored from operators/dedup.NGRAM_DF_CAP:
    # shingles appearing in more than cap docs leave both the inverted
    # index and the set sizes, exactly as the Spark operator does
    cap = D.NGRAM_DF_CAP
    return f"""
WITH {_AUG_DOCS_SQL},
keep AS (SELECT sh_h FROM shs GROUP BY sh_h HAVING count(*) <= {cap}),
shc AS (SELECT s.doc, s.sh_h FROM shs s JOIN keep k ON s.sh_h = k.sh_h),
sizesc AS (SELECT doc, count(*) AS sz FROM shc GROUP BY doc),
pairs AS (
  SELECT l.doc AS a, r.doc AS b, count(*) AS inter
  FROM shc l JOIN shc r ON l.sh_h = r.sh_h AND l.doc < r.doc
  GROUP BY 1, 2
)
SELECT p.a, p.b, p.inter,
       round(p.inter / (sa.sz + sb.sz - p.inter), 6) AS jaccard
FROM pairs p JOIN sizesc sa ON p.a = sa.doc JOIN sizesc sb ON p.b = sb.doc
WHERE round(p.inter / (sa.sz + sb.sz - p.inter), 6) >= {threshold}
"""


def _minhash_sql(threshold: float) -> str:
    k, band_rows = D.MINHASH_K, D.MINHASH_BAND
    n_bands = k // band_rows
    h1, h2 = h60_sql("sh"), h60_sql("sh", seed="mh2")
    mins = ",\n         ".join(
        f"min(({h1} + {j} * (({h2}) % {D.MH_H2_MOD})) % {D.MH_MOD}) AS s{j}"
        for j in range(k)
    )
    band_rels = "\n  UNION ALL\n".join(
        "  SELECT doc, {b} AS band, concat({expr}) AS bucket FROM sigs".format(
            b=b,
            expr=", ':', ".join(
                f"CAST(s{b * band_rows + r} AS VARCHAR)" for r in range(band_rows)
            ),
        )
        for b in range(n_bands)
    )
    return f"""
WITH {_AUG_DOCS_SQL},
sigs AS (
  SELECT doc, {mins}
  FROM sh GROUP BY doc
),
bands AS (
{band_rels}
),
cand AS (
  SELECT DISTINCT l.doc AS a, r.doc AS b
  FROM bands l JOIN bands r
    ON l.band = r.band AND l.bucket = r.bucket AND l.doc < r.doc
),
inter AS (
  SELECT c.a, c.b, count(*) AS inter
  FROM cand c
  JOIN shs la ON la.doc = c.a
  JOIN shs lb ON lb.doc = c.b AND lb.sh_h = la.sh_h
  GROUP BY 1, 2
)
SELECT i.a, i.b, round(i.inter / (sa.sz + sb.sz - i.inter), 6) AS jaccard
FROM inter i JOIN sizes sa ON i.a = sa.doc JOIN sizes sb ON i.b = sb.doc
WHERE round(i.inter / (sa.sz + sb.sz - i.inter), 6) >= {threshold}
"""


def _dedup_clusters_sql(threshold: float) -> str:
    """Connected components over the minhash pair graph: the full minhash
    statement nests as the `pairs` CTE; a recursive CTE enumerates every
    (node, reachable-label) pair — finite because UNION dedups — and
    min() per node is the component id, exactly what min-label
    propagation converges to."""
    return f"""
WITH RECURSIVE pairs AS (
{_minhash_sql(threshold)}
),
edges AS (SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs),
vertices AS (SELECT DISTINCT a AS node FROM edges),
cc AS (
  SELECT node, node AS lbl FROM vertices
  UNION
  SELECT e.b AS node, c.lbl FROM cc c JOIN edges e ON e.a = c.node
),
lab AS (SELECT node, min(lbl) AS cluster_id FROM cc GROUP BY node)
SELECT node AS doc_id, cluster_id,
       CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
FROM lab
"""


def _pii_scrub_sql() -> str:
    email, phone, ip = T.PII_EMAIL_RE, T.PII_PHONE_RE, T.PII_IPV4_RE
    return f"""
WITH pii AS (
  SELECT doc_id, concat(text,
    CASE WHEN doc_id % 3 = 0
         THEN concat(' contact user', CAST(doc_id AS VARCHAR), '@example.com')
         ELSE '' END,
    CASE WHEN doc_id % 5 = 0
         THEN concat(' call 555-0', lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0'), ' now')
         ELSE '' END,
    CASE WHEN doc_id % 7 = 0
         THEN concat(' host 10.0.', CAST(doc_id % 256 AS VARCHAR), '.7')
         ELSE '' END) AS text
  FROM documents
),
red AS (
  SELECT doc_id, text,
         regexp_replace(
           regexp_replace(
             regexp_replace(text, '{email}', '<EMAIL>', 'g'),
             '{phone}', '<PHONE>', 'g'),
           '{ip}', '<IP>', 'g') AS redacted
  FROM pii
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{email}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{phone}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(text, '{ip}')) AS BIGINT) AS n_ips,
       CAST(length(redacted) AS BIGINT) AS redacted_len,
       {h60_sql('redacted')} AS redacted_h60
FROM red
"""


def _topk_ngrams_sql(k_top: int = 20) -> str:
    # bigram shingles with the same <2-token whole-text fallback as
    # functions/text.shingles(k=2)
    return f"""
WITH tok AS (
  SELECT doc_id, {_TOKENS_SQL.format(t='text')} AS toks, trim(text) AS t
  FROM documents
),
grams AS (
  SELECT unnest(
    CASE WHEN len(toks) >= 2
         THEN [array_to_string(toks[i:i+1], ' ') FOR i IN range(1, len(toks))]
         ELSE [regexp_replace(t, '\\s+', ' ', 'g')] END) AS ngram
  FROM tok
),
counts AS (SELECT ngram, count(*) AS n_occurrences FROM grams GROUP BY 1)
SELECT ngram, n_occurrences,
       CAST(row_number() OVER w AS INTEGER) AS rank
FROM counts
WINDOW w AS (ORDER BY n_occurrences DESC, ngram)
QUALIFY row_number() OVER w <= {k_top}
"""


def _sample_case_sql() -> str:
    from sac2mseed_spark.operators.sample import SAMPLE_MOD

    arms = " ".join(
        f"WHEN lang = '{k}' THEN {int(round(r * SAMPLE_MOD))}"
        for k, r in sorted(SAMPLE_RATES.items())
    )
    return f"CASE {arms} ELSE {int(round(SAMPLE_DEFAULT * SAMPLE_MOD))} END"


def _sample_bucket_sql() -> str:
    from sac2mseed_spark.operators.sample import SAMPLE_MOD

    return f"{h60_sql('CAST(doc_id AS VARCHAR)', seed='strat')} % {SAMPLE_MOD}"


def _stratified_sample_sql() -> str:
    return f"""
WITH b AS (
  SELECT doc_id, lang, {_sample_bucket_sql()} AS bucket FROM documents
)
SELECT doc_id, lang, bucket FROM b WHERE bucket < {_sample_case_sql()}
"""


def _stratified_resample_sql() -> str:
    from sac2mseed_spark.operators.sample import SAMPLE_MOD

    int_arms = " ".join(
        f"WHEN lang = '{k}' THEN {int(r)}"
        for k, r in sorted(RESAMPLE_RATES.items())
    )
    frac_arms = " ".join(
        f"WHEN lang = '{k}' THEN {int(round((r % 1.0) * SAMPLE_MOD))}"
        for k, r in sorted(RESAMPLE_RATES.items())
    )
    int_default = int(RESAMPLE_DEFAULT)
    frac_default = int(round((RESAMPLE_DEFAULT % 1.0) * SAMPLE_MOD))
    return f"""
WITH b AS (
  SELECT doc_id, lang, {_sample_bucket_sql()} AS bucket FROM documents
),
c AS (
  SELECT doc_id, lang, bucket,
         (CASE {int_arms} ELSE {int_default} END)
         + (CASE WHEN bucket < (CASE {frac_arms} ELSE {frac_default} END)
                 THEN 1 ELSE 0 END) AS n_copies
  FROM b
)
SELECT doc_id, lang, bucket, unnest(range(0, n_copies)) AS copy_idx
FROM c WHERE n_copies > 0
"""


def _sample_report_sql() -> str:
    return f"""
WITH b AS (
  SELECT doc_id, lang, {_sample_bucket_sql()} AS bucket FROM documents
),
kept AS (SELECT lang, count(*) AS n_kept FROM b
         WHERE bucket < {_sample_case_sql()} GROUP BY 1),
total AS (SELECT lang, count(*) AS n_rows FROM b GROUP BY 1)
SELECT t.lang, t.n_rows, coalesce(k.n_kept, 0) AS n_kept,
       round(coalesce(k.n_kept, 0) / t.n_rows, 6) AS realized_rate
FROM total t LEFT JOIN kept k ON t.lang = k.lang
"""


def _embedding_quantize_sql() -> str:
    return """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings
),
s AS (
  SELECT vec_id, ev, len(ev) AS dims,
         list_max(list_transform(ev, x -> abs(x))) AS absmax
  FROM v
),
sc AS (
  SELECT vec_id, ev, dims,
         CASE WHEN absmax > 0 THEN absmax / 127 ELSE 0.0 END AS scale
  FROM s
),
q AS (
  SELECT vec_id, ev, dims, scale,
         list_transform(ev, x -> CAST(least(greatest(
           CASE WHEN scale > 0 THEN round(x / scale, 0) ELSE 0.0 END,
           -127.0), 127.0) AS INTEGER)) AS qv
  FROM sc
)
SELECT vec_id, CAST(dims AS INTEGER) AS dims, round(scale, 6) AS scale,
       CAST(list_aggregate(qv, 'sum') AS BIGINT) AS q_sum,
       list_min(qv) AS q_min, list_max(qv) AS q_max,
       round(list_sum(list_transform(
         range(1, CAST(dims AS INTEGER) + 1),
         i -> (ev[i] - qv[i] * scale) * (ev[i] - qv[i] * scale))) / dims, 6)
         AS mse
FROM q
"""


def _anomaly_zscore_sql() -> str:
    k = ANOMALY_K
    mean = f"CAST(s AS DOUBLE)/{float(k)}"
    var = f"CAST(ss AS DOUBLE)/{float(k)} - ({mean})*({mean})"
    return f"""
{_ORACLE_PREFIX},
t1m AS ({_tier_body_sql('1m')}),
v AS (
  SELECT conv_id, window_start_us,
         CAST(floor(sum_latency_us / 1000000.0) AS BIGINT) AS value
  FROM t1m
),
w AS (
  SELECT conv_id, window_start_us, value,
         count(value) OVER tw AS cnt,
         sum(value) OVER tw AS s,
         sum(value * value) OVER tw AS ss
  FROM v
  WINDOW tw AS (PARTITION BY conv_id ORDER BY window_start_us
                ROWS BETWEEN {k} PRECEDING AND 1 PRECEDING)
)
SELECT conv_id, window_start_us, value,
       round({mean}, 6) AS trail_mean,
       round(sqrt({var}), 6) AS trail_std,
       round((CAST(value AS DOUBLE) - ({mean})) / sqrt({var}), 6) AS z
FROM w
WHERE cnt = {k} AND ({var}) > 0
  AND abs((CAST(value AS DOUBLE) - ({mean})) / sqrt({var})) >= {ANOMALY_TAU}
"""


def _ewma_smooth_sql() -> str:
    k, a = EWMA_K, EWMA_ALPHA
    terms = ["CAST(value AS DOUBLE) * 1.0"]
    wsum = 1.0
    for j in range(1, k):
        terms.append(f"CAST(l{j} AS DOUBLE) * {a**j!r}")
        wsum += a**j
    num = " + ".join(terms)
    lags = ",\n         ".join(
        f"lag(value, {j}) OVER tw AS l{j}" for j in range(1, k)
    )
    return f"""
{_ORACLE_PREFIX},
t1h AS ({_tier_body_sql('1h')}),
v AS (SELECT conv_id, window_start_us, sum_tokens AS value FROM t1h),
w AS (
  SELECT conv_id, window_start_us, value,
         {lags}
  FROM v
  WINDOW tw AS (PARTITION BY conv_id ORDER BY window_start_us)
)
SELECT conv_id, window_start_us, value,
       round(({num}) / {wsum!r}, 6) AS ewma
FROM w WHERE l{k - 1} IS NOT NULL
"""


def _latency_percentiles_sql() -> str:
    return f"""
{_ORACLE_PREFIX},
t1h AS ({_tier_body_sql('1h')}),
v AS (
  SELECT conv_id,
         CAST(floor(sum_latency_us / 1000000.0) AS BIGINT) AS lat_s
  FROM t1h
)
SELECT conv_id, count(lat_s) AS n,
       round(quantile_cont(lat_s, 0.5), 6) AS p50,
       round(quantile_cont(lat_s, 0.95), 6) AS p95
FROM v GROUP BY 1
"""


def _m4_downsample_sql() -> str:
    b = M4_BUCKET_US
    return f"""
{_ORACLE_PREFIX},
t1m AS ({_tier_body_sql('1m')}),
pts AS (
  SELECT conv_id, window_start_us AS ts, sum_tokens AS value,
         CAST(floor(window_start_us / {b}.0) AS BIGINT) * {b}
           AS bucket_start_us
  FROM t1m
),
ext AS (
  SELECT conv_id, bucket_start_us,
         min(ROW(value, ts)) AS vmin, max(ROW(value, ts)) AS vmax,
         min(ROW(ts, value)) AS tmin, max(ROW(ts, value)) AS tmax
  FROM pts GROUP BY 1, 2
)
SELECT p.conv_id, p.ts, p.value, p.bucket_start_us
FROM pts p JOIN ext e
  ON p.conv_id = e.conv_id AND p.bucket_start_us = e.bucket_start_us
WHERE ROW(p.value, p.ts) = e.vmin OR ROW(p.value, p.ts) = e.vmax
   OR ROW(p.ts, p.value) = e.tmin OR ROW(p.ts, p.value) = e.tmax
"""


def _trend_slope_sql() -> str:
    k = TREND_K
    sx = k * (k - 1) // 2
    sxx = k * (k - 1) * (2 * k - 1) // 6
    denom = float(k * sxx - sx * sx)
    lags = ",\n         ".join(
        f"lag(value, {j}) OVER tw AS l{j}" for j in range(1, k)
    )
    sy = " + ".join(["value"] + [f"l{j}" for j in range(1, k)])
    sxy = " + ".join(
        [f"value * {k - 1}"]
        + [f"l{j} * {k - 1 - j}" for j in range(1, k)]
    )
    return f"""
{_ORACLE_PREFIX},
t1h AS ({_tier_body_sql('1h')}),
v AS (SELECT conv_id, window_start_us, sum_tokens AS value FROM t1h),
w AS (
  SELECT conv_id, window_start_us, value,
         {lags}
  FROM v
  WINDOW tw AS (PARTITION BY conv_id ORDER BY window_start_us)
)
SELECT conv_id, window_start_us, value,
       round(CAST({k} * ({sxy}) - {sx} * ({sy}) AS DOUBLE) / {denom!r}, 6)
         AS slope
FROM w WHERE l{k - 1} IS NOT NULL
"""


def _concurrency_peak_sql() -> str:
    seg_body = """SELECT conv_id, segment_id,
       min(ts_us) AS seg_start_us, max(ts_us) AS seg_end_us
FROM seg GROUP BY 1, 2"""
    return f"""{_ORACLE_PREFIX},
s AS (
  SELECT *, CASE WHEN ts_us - lag(ts_us) OVER
      (PARTITION BY conv_id ORDER BY ts_us, turn_idx) > 1800000000
    THEN 1 ELSE 0 END AS brk
  FROM m
),
seg AS (
  SELECT *, CAST(sum(brk) OVER (PARTITION BY conv_id ORDER BY ts_us, turn_idx
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS segment_id
  FROM s
),
spans AS ({seg_body}),
ev AS (
  SELECT seg_start_us AS ts_us, 1 AS delta FROM spans
  UNION ALL
  SELECT seg_end_us AS ts_us, -1 AS delta FROM spans
),
series AS (
  SELECT ts_us,
         CAST(sum(delta) OVER (ORDER BY ts_us, -delta
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS active
  FROM ev
)
SELECT CAST(floor(ts_us / 3600000000.0) AS BIGINT) * 3600000000
         AS window_start_us,
       max(active) AS peak_active
FROM series GROUP BY 1
"""


def _salient_terms_sql() -> str:
    toks = _TOKENS_SQL.format(t="text")
    return f"""
WITH terms AS (
  SELECT doc_id AS doc, unnest({toks}) AS term FROM documents
),
ft AS (SELECT doc, term FROM terms WHERE lower(term) NOT IN
       (SELECT unnest({_STOPWORDS_SQL}))),
tf AS (SELECT doc, term, count(*) AS tf FROM ft GROUP BY 1, 2),
dfq AS (SELECT term, count(DISTINCT doc) AS df FROM ft GROUP BY 1),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc, tf.term, tf.tf, dfq.df,
         round(CAST(tf.tf AS DOUBLE) * (SELECT n_docs FROM n) / dfq.df, 6)
           AS score
  FROM tf JOIN dfq ON tf.term = dfq.term
),
r AS (
  SELECT *, CAST(row_number() OVER
           (PARTITION BY doc ORDER BY score DESC, term ASC) AS INTEGER)
           AS rank
  FROM scored
)
SELECT doc, term, tf, df, score, rank FROM r WHERE rank <= {SALIENT_K}
"""


def _bm25_search_sql() -> str:
    toks = _TOKENS_SQL.format(t="text")
    return f"""
WITH terms AS (
  SELECT doc_id AS doc, lower(unnest({toks})) AS term FROM documents
),
ft AS (SELECT doc, term FROM terms WHERE term NOT IN
       (SELECT unnest({_STOPWORDS_SQL}))),
tf AS (SELECT doc, term, CAST(count(*) AS BIGINT) AS tf FROM ft GROUP BY 1, 2),
dl AS (SELECT doc, CAST(count(*) AS BIGINT) AS dl FROM ft GROUP BY 1),
tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM ft),
nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM documents),
dfq AS (SELECT term, CAST(count(DISTINCT doc) AS BIGINT) AS df
        FROM ft GROUP BY 1),
qt AS (SELECT DISTINCT doc AS query_id, term FROM ft
       WHERE doc < {BM25_QUERY_MAX_ID}),
s AS (
  SELECT qt.query_id, tf.doc, tf.term,
         CAST(22 * tf.tf * t * (2 * n - 2 * dfq.df + 1) AS DOUBLE) /
         CAST(((10 * tf.tf + 3) * t + 9 * dl.dl * n)
              * (2 * dfq.df + 1) AS DOUBLE) AS s
  FROM tf
  JOIN dfq ON tf.term = dfq.term
  JOIN qt ON tf.term = qt.term
  JOIN dl ON dl.doc = tf.doc, tot, nd
  WHERE tf.doc <> qt.query_id
),
g AS (
  SELECT query_id, doc AS doc_id, CAST(count(*) AS BIGINT) AS n_terms,
         round(list_reduce(list_prepend(0.0, list(s ORDER BY term)),
                           (a, b) -> a + b), 6) AS score
  FROM s GROUP BY 1, 2
)
SELECT query_id, doc_id, n_terms, score,
       CAST(row_number() OVER w AS INTEGER) AS rank
FROM g
WINDOW w AS (PARTITION BY query_id ORDER BY score DESC, doc_id)
QUALIFY row_number() OVER w <= {BM25_K}
"""


def _role_transitions_sql() -> str:
    return f"""{_ORACLE_PREFIX},
e AS (
  SELECT coalesce(lag(role) OVER
           (PARTITION BY conv_id ORDER BY turn_idx, ts_us), '<start>')
           AS prev_role,
         role
  FROM m
),
c AS (SELECT prev_role, role, count(*) AS n FROM e GROUP BY 1, 2),
t AS (SELECT prev_role, sum(n) AS tot FROM c GROUP BY 1)
SELECT c.prev_role, c.role, c.n, round(c.n / t.tot, 6) AS p
FROM c JOIN t ON c.prev_role = t.prev_role
"""


def _sft_pairs_sql() -> str:
    from sac2mseed_spark.operators.sft import (
        MAX_PAIR_TOKENS,
        MIN_PROMPT_TOKENS,
        MIN_RESPONSE_TOKENS,
    )

    return f"""{_ORACLE_PREFIX},
p AS (
  SELECT conv_id, turn_idx, role, ts_us, token_count,
         {h60_sql('text')} AS digest,
         lag(role) OVER w AS prev_role,
         lag(turn_idx) OVER w AS prev_turn_idx,
         lag(ts_us) OVER w AS prev_ts_us,
         lag(token_count) OVER w AS prev_tokens,
         lag({h60_sql('text')}) OVER w AS prev_digest
  FROM m
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx, ts_us)
),
pairs AS (
  SELECT conv_id,
         prev_turn_idx AS user_turn_idx,
         turn_idx AS assistant_turn_idx,
         prev_tokens AS prompt_tokens,
         token_count AS response_tokens,
         prev_tokens + token_count AS pair_tokens,
         ts_us - prev_ts_us AS response_latency_us,
         prev_digest AS prompt_digest,
         digest AS response_digest,
         (prev_tokens >= {MIN_PROMPT_TOKENS}
          AND token_count >= {MIN_RESPONSE_TOKENS}
          AND prev_tokens + token_count <= {MAX_PAIR_TOKENS}) AS kept
  FROM p WHERE role = 'assistant' AND prev_role = 'user'
)
SELECT *, CASE WHEN kept THEN CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END)
           OVER (PARTITION BY conv_id ORDER BY assistant_turn_idx)
           AS INTEGER) END AS pair_idx
FROM pairs
"""


def _conv_survival_sql() -> str:
    hs = ", ".join(str(h) for h in sorted(SURVIVAL_HORIZONS_US))
    return f"""{_ORACLE_PREFIX},
durs AS (
  SELECT conv_id, max(ts_us) - min(ts_us) AS duration_us
  FROM m GROUP BY conv_id
),
h AS (SELECT unnest([{hs}]) AS horizon_us)
SELECT h.horizon_us,
       count(*) AS n_convs,
       CAST(sum(CASE WHEN durs.duration_us >= h.horizon_us
                THEN 1 ELSE 0 END) AS BIGINT) AS n_surviving,
       round(CAST(sum(CASE WHEN durs.duration_us >= h.horizon_us
                THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
           AS survival_frac
FROM durs CROSS JOIN h
GROUP BY h.horizon_us
"""


def _pref_pairs_sql() -> str:
    from sac2mseed_spark.operators.sft import PREF_MIN_RESPONSES

    return f"""{_ORACLE_PREFIX},
p AS (
  SELECT conv_id, turn_idx, role, ts_us, token_count,
         {h60_sql('text')} AS digest,
         lag(role) OVER w AS prev_role,
         lag(ts_us) OVER w AS prev_ts_us,
         lag(token_count) OVER w AS prev_tokens,
         lag({h60_sql('text')}) OVER w AS prev_digest
  FROM m
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx, ts_us)
),
ex AS (
  SELECT prev_digest AS prompt_digest, digest AS response_digest,
         prev_tokens, token_count, ts_us - prev_ts_us AS latency_us
  FROM p WHERE role = 'assistant' AND prev_role = 'user'
),
resp AS (
  SELECT prompt_digest, response_digest,
         CAST(min(prev_tokens) AS BIGINT) AS prompt_tokens,
         CAST(min(token_count) AS BIGINT) AS response_tokens,
         CAST(min(latency_us) AS BIGINT) AS min_latency_us,
         count(*) AS n_occ
  FROM ex GROUP BY 1, 2
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY prompt_digest
            ORDER BY response_tokens DESC, min_latency_us ASC,
                     response_digest ASC) AS rnk,
         count(*) OVER (PARTITION BY prompt_digest) AS n_responses,
         CAST(sum(n_occ) OVER (PARTITION BY prompt_digest) AS BIGINT)
             AS n_exchanges,
         min(prompt_tokens) OVER (PARTITION BY prompt_digest) AS p_tok
  FROM resp
)
SELECT c.prompt_digest,
       c.p_tok AS prompt_tokens,
       c.n_responses,
       c.n_exchanges,
       c.response_digest AS chosen_digest,
       c.response_tokens AS chosen_tokens,
       c.min_latency_us AS chosen_latency_us,
       r.response_digest AS rejected_digest,
       r.response_tokens AS rejected_tokens,
       c.response_tokens - r.response_tokens AS token_margin
FROM ranked c JOIN ranked r USING (prompt_digest)
WHERE c.rnk = 1 AND r.rnk = r.n_responses
  AND c.n_responses >= {PREF_MIN_RESPONSES}
"""


def _template_turns_sql() -> str:
    from sac2mseed_spark.operators.templates import TEMPLATE_MIN_CONVS

    return f"""{_ORACLE_PREFIX},
h AS (
  SELECT conv_id, role, token_count, {h60_sql('text')} AS digest FROM m
),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS n_turns FROM h)
SELECT digest,
       count(DISTINCT conv_id) AS n_convs,
       count(*) AS n_occurrences,
       count(DISTINCT role) AS n_roles,
       CAST(min(token_count) AS BIGINT) AS token_count,
       CAST(sum(token_count) AS BIGINT) AS total_tokens,
       round(count(*) / (SELECT n_turns FROM tot), 6) AS turn_frac
FROM h GROUP BY digest
HAVING count(DISTINCT conv_id) >= {TEMPLATE_MIN_CONVS}
"""


def _context_fit_sql() -> str:
    from sac2mseed_spark.operators.sft import CONTEXT_BUDGET_TOKENS

    b = CONTEXT_BUDGET_TOKENS
    return f"""{_ORACLE_PREFIX},
tail AS (
  SELECT conv_id, token_count,
         sum(token_count) OVER (PARTITION BY conv_id
           ORDER BY turn_idx DESC, ts_us DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS suffix_tokens
  FROM m
)
SELECT conv_id,
       count(*) AS n_turns,
       CAST(sum(token_count) AS BIGINT) AS total_tokens,
       CAST(sum(CASE WHEN suffix_tokens <= {b} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_turns_fit,
       CAST(coalesce(max(CASE WHEN suffix_tokens <= {b}
                          THEN suffix_tokens END), 0) AS BIGINT) AS tokens_fit,
       round(sum(CASE WHEN suffix_tokens <= {b} THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS fit_frac
FROM tail GROUP BY conv_id
"""


def _burst_detect_sql() -> str:
    w, k = BURST_WINDOW_US, BURST_MIN_EVENTS
    per_min = 60_000_000.0 / float(w)
    return f"""{_ORACLE_PREFIX},
r AS (
  SELECT conv_id, ts_us,
         count(*) OVER (PARTITION BY conv_id ORDER BY ts_us
           RANGE BETWEEN {w} PRECEDING AND CURRENT ROW) AS n_in_window
  FROM m
)
SELECT conv_id, ts_us, n_in_window,
       round(n_in_window * {per_min!r}, 6) AS rate_per_min
FROM r WHERE n_in_window >= {k}
"""


def _hourly_profile_sql() -> str:
    return f"""{_ORACLE_PREFIX}
SELECT CAST(hour(make_timestamp(ts_us)) AS INTEGER) AS hour, role,
       count(*) AS n_turns,
       CAST(sum(token_count) AS BIGINT) AS sum_tokens,
       round(sum(token_count) / count(*), 6) AS avg_tokens,
       round(CASE WHEN count(latency_us) > 0
             THEN CAST(sum(latency_us) AS BIGINT) / count(latency_us)
                  / 1000000.0 END, 6)
         AS avg_latency_s
FROM m GROUP BY 1, 2
"""


def _rollup_month_sql() -> str:
    return f"""{_ORACLE_PREFIX}
SELECT conv_id,
       epoch_us(date_trunc('month', make_timestamp(ts_us))) AS window_start_us,
       count(*) AS n_points,
       count(latency_us) AS n_latency,
       CAST(sum(latency_us) AS BIGINT) AS sum_latency_us,
       min(latency_us) AS min_latency_us,
       max(latency_us) AS max_latency_us,
       CAST(sum(token_count) AS BIGINT) AS sum_tokens,
       min(ts_us) AS min_ts_us,
       max(ts_us) AS max_ts_us,
       'month' AS tier
FROM m GROUP BY 1, 2
"""


def _contamination_sql() -> str:
    toks = _TOKENS_SQL.format(t="text")
    return f"""
WITH tok AS (
  SELECT doc_id, {toks} AS toks FROM documents
),
sh AS (
  SELECT doc_id, unnest(
    CASE WHEN len(toks) >= 3
         THEN [array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)]
         ELSE [array_to_string(toks, ' ')] END) AS sh
  FROM tok
),
bench AS (
  SELECT DISTINCT sh FROM sh WHERE doc_id < {CONTAM_BENCH_MAX_ID}
)
SELECT doc_id,
       count(sh) AS n_shingles,
       CAST(sum(CASE WHEN sh IN (SELECT sh FROM bench) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hits,
       round(sum(CASE WHEN sh IN (SELECT sh FROM bench) THEN 1 ELSE 0 END)
             / greatest(count(sh), 1), 6) AS contam_rate
FROM sh WHERE doc_id >= {CONTAM_BENCH_MAX_ID}
GROUP BY 1
"""


def _token_shards_core_sql() -> str:
    toks = _TOKENS_SQL.format(t="text")
    return f"""
t AS (
  SELECT doc_id, lang, CAST(len({toks}) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, lang, n_tokens,
         sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_tokens AS cum_start
  FROM t
),
shards AS (
  SELECT doc_id, lang, n_tokens,
         CAST(floor(cum_start / {SHARD_BUDGET_TOKENS}) AS BIGINT) AS shard_id,
         cum_start % {SHARD_BUDGET_TOKENS} AS shard_offset
  FROM c
)"""


def _token_shards_sql() -> str:
    return f"""
WITH {_token_shards_core_sql().lstrip()}
SELECT doc_id, lang, n_tokens, shard_id, shard_offset FROM shards
"""


def _shard_manifest_sql() -> str:
    return f"""
WITH {_token_shards_core_sql().lstrip()}
SELECT lang, shard_id, count(*) AS n_docs, sum(n_tokens) AS n_tokens,
       min(doc_id) AS first_doc_id, max(doc_id) AS last_doc_id
FROM shards GROUP BY 1, 2
"""


def _asof_attribution_sql() -> str:
    return f"""
WITH p AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
  FROM events WHERE event_type = 'purchase'
),
c0 AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id
  FROM events WHERE event_type = 'click'
),
c AS (  -- deterministic tiebreak: one click per (user, instant)
  SELECT user_id, ts_us, max(event_id) AS event_id FROM c0 GROUP BY 1, 2
)
SELECT p.event_id, p.user_id, p.ts_us, p.value,
       c.event_id AS click_event_id, c.ts_us AS click_ts_us,
       p.ts_us - c.ts_us AS gap_us
FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts_us >= c.ts_us
WHERE p.ts_us - c.ts_us <= {ASOF_TOLERANCE_US}
"""


def _simhash_core_sql() -> str:
    bits = D.SIMHASH_BITS
    sums = ",\n         ".join(
        f"sum(CASE WHEN (th >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(bits)
    )
    fp = " + ".join(
        f"CASE WHEN s{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END"
        for b in range(bits)
    )
    return f"""
toks AS (
  SELECT doc_id AS doc, unnest({_TOKENS_SQL.format(t='text')}) AS tok FROM aug
),
th AS (SELECT doc, {h60_sql('tok')} AS th FROM toks),
bitsums AS (
  SELECT doc, {sums}
  FROM th GROUP BY doc
),
fps AS (SELECT doc AS doc_id, {fp} AS simhash FROM bitsums)
"""


def _simhash_sql() -> str:
    return f"""
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id,
         array_to_string(({_TOKENS_SQL.format(t='text')})[6:], ' ') AS text
  FROM documents WHERE doc_id < 50
),
{_simhash_core_sql()}
SELECT doc_id, simhash FROM fps
"""


def _simhash_pairs_sql(max_hamming: int = 3) -> str:
    n_bands, bw = 4, D.SIMHASH_BITS // 4
    band_rels = "\n  UNION ALL\n".join(
        f"  SELECT doc_id AS doc, simhash, {i} AS band, "
        f"(simhash >> {i * bw}) & {(1 << bw) - 1} AS key FROM fps"
        for i in range(n_bands)
    )
    return f"""
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id,
         array_to_string(({_TOKENS_SQL.format(t='text')})[6:], ' ') AS text
  FROM documents WHERE doc_id < 50
),
{_simhash_core_sql()},
banded AS (
{band_rels}
),
cand AS (
  SELECT DISTINCT l.doc AS a, r.doc AS b, l.simhash AS ha, r.simhash AS hb
  FROM banded l JOIN banded r
    ON l.band = r.band AND l.key = r.key AND l.doc < r.doc
)
SELECT a, b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= {max_hamming}
"""


def _knn_sql(k: int = 5) -> str:
    return f"""
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id % 50 = 0),
c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings),
s AS (
  SELECT query_id, neighbor_id,
         round(list_dot_product(qv, cv) /
               (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))),
               6) AS sim
  FROM q, c WHERE neighbor_id <> query_id
)
SELECT query_id, neighbor_id,
       CAST(row_number() OVER w AS INTEGER) AS rank, sim
FROM s
WINDOW w AS (PARTITION BY query_id ORDER BY sim DESC, neighbor_id)
QUALIFY row_number() OVER w <= {k}
"""


# band edges ceil-aligned to the coarser tier's window, then the finer
# edge clamped up to the coarser one (integer math — identical to
# operators/retention.py band_edges_us, including the greatest() clamp
# that prevents band overlap when alignment inverts close horizons)
_RET_TIERS_CTE = (
    "t1m AS ({b1m}),\nt1h AS ({b1h}),\nt1d AS ({b1d}),\n"
    "nw AS (SELECT now_us, greatest(edge1_raw, edge2) AS edge1, edge2 FROM (\n"
    "  SELECT max(ts_us) AS now_us,\n"
    f"       ((max(ts_us) - {_RET_H1M_US} + {_TIER_US['1h']} - 1) // {_TIER_US['1h']}) * {_TIER_US['1h']} AS edge1_raw,\n"
    f"       ((max(ts_us) - {_RET_H1H_US} + {_TIER_US['1d']} - 1) // {_TIER_US['1d']}) * {_TIER_US['1d']} AS edge2\n"
    "FROM m))"
)


def _ret_tiers_prefix() -> str:
    return f"{_ORACLE_PREFIX},\n" + _RET_TIERS_CTE.format(
        b1m=_tier_body_sql("1m"), b1h=_tier_body_sql("1h"), b1d=_tier_body_sql("1d")
    )


def _retention_sweep_sql() -> str:
    def band(tier: str, lo: str | None) -> str:
        keep = "TRUE" if lo is None else f"window_start_us >= {lo}"
        drop = "FALSE" if lo is None else f"window_start_us < {lo}"
        return f"""SELECT '{tier}' AS tier,
       count(CASE WHEN {keep} THEN 1 END) AS n_kept,
       count(CASE WHEN {drop} THEN 1 END) AS n_evicted,
       CAST(coalesce(sum(CASE WHEN {keep} THEN n_points END), 0) AS BIGINT) AS pts_kept,
       CAST(coalesce(sum(CASE WHEN {drop} THEN n_points END), 0) AS BIGINT) AS pts_evicted
FROM t{tier}, nw"""

    return (
        _ret_tiers_prefix()
        + "\n"
        + band("1m", f"now_us - {_RET_H1M_US}")
        + "\nUNION ALL\n"
        + band("1h", f"now_us - {_RET_H1H_US}")
        + "\nUNION ALL\n"
        + band("1d", None)
    )


def _tiered_serve_sql() -> str:
    cols = (
        "conv_id, window_start_us, n_points, n_latency, sum_latency_us, "
        "min_latency_us, max_latency_us, sum_tokens, min_ts_us, max_ts_us, tier"
    )
    return f"""{_ret_tiers_prefix()}
SELECT {cols} FROM t1m, nw WHERE window_start_us >= edge1
UNION ALL
SELECT {cols} FROM t1h, nw WHERE window_start_us >= edge2
                             AND window_start_us < edge1
UNION ALL
SELECT {cols} FROM t1d, nw WHERE window_start_us < edge2"""


def _knn_ivf_sql(k: int = 5, n_cent: int = 8, nprobe: int = 2) -> str:
    return f"""
WITH c AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cent AS (SELECT id AS cid, v AS cv FROM c ORDER BY id LIMIT {n_cent}),
sim_cc AS (
  SELECT c.id, c.v, cent.cid,
         list_dot_product(c.v, cent.cv) /
           (sqrt(list_dot_product(c.v, c.v)) *
            sqrt(list_dot_product(cent.cv, cent.cv))) AS s
  FROM c, cent
),
asg AS (
  SELECT id, v, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY id ORDER BY s DESC, cid) AS rn
    FROM sim_cc
  ) WHERE rn = 1
),
probes AS (
  SELECT id AS query_id, v AS qv, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY id ORDER BY s DESC, cid) AS rn
    FROM sim_cc WHERE id % 50 = 0
  ) WHERE rn <= {nprobe}
),
cand AS (
  SELECT p.query_id, p.qv, a.id AS neighbor_id, a.v AS cv
  FROM probes p JOIN asg a USING (cid)
  WHERE a.id <> p.query_id
),
s AS (
  SELECT query_id, neighbor_id,
         round(list_dot_product(qv, cv) /
               (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))),
               6) AS sim
  FROM cand
)
SELECT query_id, neighbor_id,
       CAST(row_number() OVER w AS INTEGER) AS rank, sim
FROM s
WINDOW w AS (PARTITION BY query_id ORDER BY sim DESC, neighbor_id)
QUALIFY row_number() OVER w <= {k}
"""


def _knn_ivf_trained_sql(
    k: int = 5,
    n_cent: int = 8,
    nprobe: int = 2,
    n_iters: int = 10,
    cap: int = 256,
    dims: int = 64,
) -> str:
    """DuckDB twin of q_knn_ivf_trained: replays train_centroids as
    unrolled CTEs — bottom-``cap``-by-(md5, id) sample, per-row unit
    normalization, farthest-point init (n_cent-1 steps), ``n_iters``
    Lloyd iterations — then the standard IVF assign/probe/re-rank. Bit
    parity holds because the Spark trainer uses ONLY defined sequential
    folds: dims left-to-right == list_dot_product, member sums in sample
    order with the first member as seed == list_reduce, scalar max ==
    greatest, first-argmax/argmin ties == row_number tie-breaks."""
    ew = f"list_transform(range(1, {dims + 1}), i -> a[i] + b[i])"
    parts = [
        f"""
WITH samp AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS ord,
         CAST(embedding AS DOUBLE[]) AS v0
  FROM embeddings
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {cap}
),
snorm AS MATERIALIZED (
  SELECT ord,
         list_transform(
           v0, x -> x / greatest(sqrt(list_dot_product(v0, v0)), 1e-300)
         ) AS sv
  FROM samp
),
ch1 AS MATERIALIZED (SELECT 0 AS cid, sv FROM snorm WHERE ord = 1),
bs1 AS MATERIALIZED (
  SELECT s.ord, s.sv, list_dot_product(s.sv, c.sv) AS s
  FROM snorm s, (SELECT sv FROM snorm WHERE ord = 1) c
)"""
    ]
    for i in range(2, n_cent + 1):
        parts.append(
            f""",
nx{i} AS MATERIALIZED (SELECT ord AS nord FROM bs{i - 1} ORDER BY s ASC, ord ASC LIMIT 1),
ch{i} AS MATERIALIZED (
  SELECT * FROM ch{i - 1}
  UNION ALL
  SELECT {i - 1} AS cid, sv FROM snorm, nx{i} WHERE ord = nord
),
bs{i} AS MATERIALIZED (
  SELECT b.ord, b.sv, greatest(b.s, list_dot_product(b.sv, c.sv)) AS s
  FROM bs{i - 1} b,
       (SELECT s2.sv FROM snorm s2, nx{i} WHERE s2.ord = nord) c
)"""
        )
    parts.append(f",\nm0 AS MATERIALIZED (SELECT cid, sv AS mv FROM ch{n_cent})")
    for i in range(1, n_iters + 1):
        parts.append(
            f""",
lab{i} AS MATERIALIZED (
  SELECT ord, sv, cid FROM (
    SELECT s.ord, s.sv, m.cid,
           row_number() OVER (
             PARTITION BY s.ord
             ORDER BY list_dot_product(s.sv, m.mv) DESC, m.cid
           ) AS rn
    FROM snorm s, m{i - 1} m
  ) WHERE rn = 1
),
agg{i} AS MATERIALIZED (
  SELECT cid, list_reduce(list(sv ORDER BY ord), (a, b) -> {ew}) AS vsum
  FROM lab{i} GROUP BY cid
),
m{i} AS MATERIALIZED (
  SELECT m.cid,
         CASE WHEN a.vsum IS NOT NULL
                   AND sqrt(list_dot_product(a.vsum, a.vsum)) > 0
              THEN list_transform(
                     a.vsum,
                     x -> x / sqrt(list_dot_product(a.vsum, a.vsum)))
              ELSE m.mv END AS mv
  FROM m{i - 1} m LEFT JOIN agg{i} a USING (cid)
)"""
        )
    parts.append(
        f""",
c AS MATERIALIZED (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cent AS MATERIALIZED (SELECT cid, mv AS cv FROM m{n_iters}),
sim_cc AS MATERIALIZED (
  SELECT c.id, c.v, cent.cid,
         list_dot_product(c.v, cent.cv) /
           (sqrt(list_dot_product(c.v, c.v)) *
            sqrt(list_dot_product(cent.cv, cent.cv))) AS s
  FROM c, cent
),
asg AS MATERIALIZED (
  SELECT id, v, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY id ORDER BY s DESC, cid) AS rn
    FROM sim_cc
  ) WHERE rn = 1
),
probes AS MATERIALIZED (
  SELECT id AS query_id, v AS qv, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY id ORDER BY s DESC, cid) AS rn
    FROM sim_cc WHERE id % 50 = 0
  ) WHERE rn <= {nprobe}
),
cand AS MATERIALIZED (
  SELECT p.query_id, p.qv, a.id AS neighbor_id, a.v AS cv
  FROM probes p JOIN asg a USING (cid)
  WHERE a.id <> p.query_id
),
sc AS MATERIALIZED (
  SELECT query_id, neighbor_id,
         round(list_dot_product(qv, cv) /
               (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))),
               6) AS sim
  FROM cand
)
SELECT query_id, neighbor_id,
       CAST(row_number() OVER w AS INTEGER) AS rank, sim
FROM sc
WINDOW w AS (PARTITION BY query_id ORDER BY sim DESC, neighbor_id)
QUALIFY row_number() OVER w <= {k}"""
    )
    return "".join(parts)


def _rat_approx_sql() -> str:
    inner = f"""{_ORACLE_PREFIX}
SELECT conv_id, n_turns,
       CAST(n_turns - 1 AS DOUBLE) * 3600000000.0
         / CAST(max_ts - min_ts AS DOUBLE) AS rate_per_hour
FROM (SELECT conv_id, count(*) AS n_turns,
             min(ts_us) AS min_ts, max(ts_us) AS max_ts
      FROM m GROUP BY 1)
WHERE n_turns >= 2 AND max_ts > min_ts
  AND CAST(n_turns - 1 AS DOUBLE) * 3600000000.0
        / CAST(max_ts - min_ts AS DOUBLE) < 1e9"""
    return (
        "SELECT conv_id, n_turns, round(rate_per_hour, 6) AS rate_per_hour, "
        f"rat_num, rat_den FROM ({rat_approx_sql(inner, 'rate_per_hour', 1000)})"
    )


def _plane_literal(p: int, dims: int = 64) -> str:
    import hashlib

    ws = []
    for d in range(dims):
        h = int(hashlib.md5(f"pl{p}:{d}".encode()).hexdigest()[:15], 16)
        ws.append("1.0" if h % 2 == 0 else "-1.0")
    return "[" + ",".join(ws) + "]"


def _knn_lsh_sql(k: int = 5) -> str:
    n_planes, bands = S.N_PLANES, S.PLANE_BANDS
    bw = n_planes // bands
    sig_terms = " + ".join(
        f"CASE WHEN list_dot_product(v, {_plane_literal(p)}) > 0 "
        f"THEN CAST({1 << p} AS BIGINT) ELSE 0 END"
        for p in range(n_planes)
    )
    band_rels = "\n  UNION ALL\n".join(
        f"  SELECT id, v, {i} AS band, (sig >> {i * bw}) & {(1 << bw) - 1} AS key FROM sigs"
        for i in range(bands)
    )
    return f"""
WITH base AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
sigs AS (SELECT id, v, {sig_terms} AS sig FROM base),
banded AS (
{band_rels}
),
cand AS (
  SELECT DISTINCT q.id AS query_id, q.v AS qv, c.id AS neighbor_id, c.v AS cv
  FROM banded c JOIN banded q
    ON c.band = q.band AND c.key = q.key
  WHERE q.id % 50 = 0 AND c.id <> q.id
),
s AS (
  SELECT query_id, neighbor_id,
         round(list_dot_product(qv, cv) /
               (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))),
               6) AS sim
  FROM cand
)
SELECT query_id, neighbor_id,
       CAST(row_number() OVER w AS INTEGER) AS rank, sim
FROM s
WINDOW w AS (PARTITION BY query_id ORDER BY sim DESC, neighbor_id)
QUALIFY row_number() OVER w <= {k}
"""


def _embedding_dup_sql(threshold: float) -> str:
    n_planes, bands = S.N_PLANES, S.PLANE_BANDS
    bw = n_planes // bands
    sig_terms = " + ".join(
        f"CASE WHEN list_dot_product(v, {_plane_literal(p)}) > 0 "
        f"THEN CAST({1 << p} AS BIGINT) ELSE 0 END"
        for p in range(n_planes)
    )
    band_rels = "\n  UNION ALL\n".join(
        f"  SELECT id, v, {i} AS band, (sig >> {i * bw}) & {(1 << bw) - 1} AS key FROM sigs"
        for i in range(bands)
    )
    return f"""
WITH base AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
sigs AS (SELECT id, v, {sig_terms} AS sig FROM base),
banded AS (
{band_rels}
),
cand AS (
  SELECT DISTINCT l.id AS a, l.v AS av, r.id AS b, r.v AS bv
  FROM banded l JOIN banded r
    ON l.band = r.band AND l.key = r.key AND l.id < r.id
),
s AS (
  SELECT a, b,
         round(list_dot_product(av, bv) /
               (sqrt(list_dot_product(av, av)) * sqrt(list_dot_product(bv, bv))),
               6) AS sim
  FROM cand
)
SELECT a, b, sim FROM s WHERE sim >= {threshold}
"""


def _multimodal_sql() -> str:
    """Fake-decode feature oracle: every feature is a pure function of the
    payload bytes (= utf-8 of the text), so md5/strlen reproduce the kernel
    exactly. Digest bytes d[0..2] come from the md5 hex string via nibble
    lookups (portable — no blob indexing)."""
    def dbyte(i: int) -> str:  # digest byte i from hex chars 2i+1, 2i+2
        hi = f"strpos('0123456789abcdef', substr(h, {2 * i + 1}, 1)) - 1"
        lo = f"strpos('0123456789abcdef', substr(h, {2 * i + 2}, 1)) - 1"
        return f"(({hi}) * 16 + ({lo}))"

    # mean_level: payload = utf-8 text and the corpus is ASCII, so the
    # per-character codepoint sum equals the byte sum ('(?s).' spans
    # newlines); both engines round the same raw double to 6 dp
    mean_level = (
        "round(list_sum(list_transform(regexp_extract_all(text, '(?s).'),"
        " c -> unicode(c))) / strlen(text) / 255.0, 6)"
    )
    return f"""
WITH d AS (SELECT doc_id, text, md5(text) AS h FROM documents)
SELECT doc_id AS media_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
            ELSE 'video' END AS kind,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       CAST(16 + {dbyte(0)} % 64 AS INTEGER) AS width,
       CAST(16 + {dbyte(1)} % 64 AS INTEGER) AS height,
       CAST(CASE WHEN doc_id % 3 = 0 THEN 1
            ELSE 1 + {dbyte(2)} % 32 END AS INTEGER) AS n_frames,
       {mean_level} AS mean_level,
       h AS digest
FROM d
"""


def _interval_overlap_sql(factor: float) -> str:
    return f"""{_ORACLE_PREFIX},
s AS (
  SELECT *, CASE WHEN ts_us - lag(ts_us) OVER
      (PARTITION BY conv_id ORDER BY ts_us, turn_idx) > 1800000000
    THEN 1 ELSE 0 END AS brk
  FROM m
),
seg0 AS (
  SELECT *, CAST(sum(brk) OVER (PARTITION BY conv_id ORDER BY ts_us, turn_idx
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS segment_id
  FROM s
),
seg AS (
  SELECT conv_id, segment_id, min(ts_us) AS seg_start_us,
         max(ts_us) AS seg_end_us
  FROM seg0 GROUP BY 1, 2
),
ph AS (
  SELECT CAST(floor(ts_us / 3600000000.0) AS BIGINT) * 3600000000 AS hour_us,
         count(*) AS n_turns_hour
  FROM m GROUP BY 1
),
inc AS (
  SELECT hour_us, n_turns_hour FROM ph
  WHERE CAST(n_turns_hour AS DOUBLE) >
    (SELECT CAST(sum(n_turns_hour) AS DOUBLE) / CAST(count(*) AS DOUBLE)
            * {factor} FROM ph)
)
SELECT conv_id, segment_id, seg_start_us, seg_end_us,
       count(*) AS n_inc_hours,
       CAST(sum(n_turns_hour) AS BIGINT) AS inc_turns
FROM seg JOIN inc
  ON inc.hour_us BETWEEN
       CAST(floor(seg_start_us / 3600000000.0) AS BIGINT) * 3600000000
   AND CAST(floor(seg_end_us / 3600000000.0) AS BIGINT) * 3600000000
GROUP BY 1, 2, 3, 4"""


def _latency_histogram_sql() -> str:
    return f"""{_ORACLE_PREFIX},
l AS (
  SELECT role, CAST(floor(latency_us / 1000000.0) AS BIGINT) AS lat_s
  FROM m WHERE latency_us IS NOT NULL AND latency_us >= 0
),
b AS (
  SELECT role, lat_s,
         CASE WHEN lat_s = 0 THEN -1
              ELSE CAST(length(bin(lat_s)) - 1 AS INTEGER) END AS bucket
  FROM l
)
SELECT role, bucket,
       CASE WHEN bucket < 0 THEN 0
            ELSE CAST(power(2.0, CAST(bucket AS DOUBLE)) AS BIGINT) END AS lo_s,
       CAST(power(2.0, CAST(bucket + 1 AS DOUBLE)) AS BIGINT) - 1 AS hi_s,
       count(*) AS n, min(lat_s) AS min_lat_s, max(lat_s) AS max_lat_s,
       CAST(sum(lat_s) AS BIGINT) AS sum_lat_s
FROM b GROUP BY 1, 2"""


def _counter_rate_sql() -> str:
    inc = (
        "CASE WHEN counter >= prev_counter THEN counter - prev_counter "
        "ELSE counter END"
    )
    return f"""{_ORACLE_PREFIX},
s AS (
  SELECT *, CASE WHEN ts_us - lag(ts_us) OVER
      (PARTITION BY conv_id ORDER BY ts_us, turn_idx) > 1800000000
    THEN 1 ELSE 0 END AS brk
  FROM m
),
seg AS (
  SELECT *, CAST(sum(brk) OVER (PARTITION BY conv_id ORDER BY ts_us, turn_idx
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS segment_id
  FROM s
),
c AS (
  SELECT conv_id, turn_idx, ts_us,
         CAST(sum(token_count) OVER (PARTITION BY conv_id, segment_id
           ORDER BY ts_us, turn_idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS counter
  FROM seg
),
p AS (
  SELECT *, lag(counter) OVER w AS prev_counter,
         lag(ts_us) OVER w AS prev_ts_us
  FROM c WINDOW w AS (PARTITION BY conv_id ORDER BY ts_us, turn_idx)
)
SELECT conv_id, turn_idx, ts_us, counter,
       {inc} AS increase,
       CASE WHEN ts_us - prev_ts_us > 0
            THEN round(({inc}) * 60000000.0 / (ts_us - prev_ts_us), 6)
       END AS rate_per_min
FROM p WHERE prev_counter IS NOT NULL"""


def _distinct_kmv_sql(k: int, window_us: int) -> str:
    kth = f"max(CASE WHEN rk = {k} THEN h END)"
    space = float(2**60)
    return f"""{_ORACLE_PREFIX},
d AS (
  SELECT DISTINCT CAST(floor(ts_us / {window_us}.0) AS BIGINT) * {window_us}
           AS window_start_us, conv_id
  FROM m
),
h AS (SELECT window_start_us, {h60_sql('conv_id')} AS h, conv_id FROM d),
r AS (
  SELECT *, row_number() OVER (PARTITION BY window_start_us
    ORDER BY h, conv_id) AS rk
  FROM h
)
SELECT window_start_us, count(*) AS n_exact, {kth} AS kth_hash,
       round(CASE WHEN {kth} IS NULL THEN CAST(count(*) AS DOUBLE)
             ELSE {float(k - 1)} * {space!r} / CAST({kth} AS DOUBLE) END, 4)
         AS n_kmv_est
FROM r GROUP BY 1"""


def _burstiness_sql() -> str:
    nwin = "CAST((last_win_us - first_win_us) / 60000000 + 1 AS DOUBLE)"
    return f"""{_ORACLE_PREFIX},
g0 AS (
  SELECT conv_id,
         CAST(floor((ts_us - lag(ts_us) OVER (PARTITION BY conv_id
           ORDER BY ts_us, turn_idx)) / 1000000.0) AS BIGINT) AS gap_s
  FROM m
),
g AS (
  SELECT conv_id, count(*) AS n_turns, count(gap_s) AS n_gaps,
         CAST(sum(gap_s) AS BIGINT) AS sum_gap_s,
         CAST(sum(gap_s * gap_s) AS BIGINT) AS sum_gap_sq
  FROM g0 GROUP BY 1
),
t AS (
  SELECT conv_id, CAST(floor(ts_us / 60000000.0) AS BIGINT) * 60000000 AS w,
         count(*) AS c
  FROM m GROUP BY 1, 2
),
tc AS (
  SELECT conv_id, CAST(sum(c) AS BIGINT) AS n_pts,
         CAST(sum(c * c) AS BIGINT) AS sum_cnt_sq,
         min(w) AS first_win_us, max(w) AS last_win_us
  FROM t GROUP BY 1
)
SELECT g.conv_id, n_turns, n_gaps, sum_gap_s,
       CASE WHEN n_gaps >= 2 AND sum_gap_s > 0 THEN
         round((CAST(n_gaps AS DOUBLE) * CAST(sum_gap_sq AS DOUBLE)
                - CAST(sum_gap_s * sum_gap_s AS DOUBLE))
               / CAST(sum_gap_s * sum_gap_s AS DOUBLE), 6)
       END AS cv2,
       round(({nwin} * CAST(sum_cnt_sq AS DOUBLE)
              - CAST(n_pts * n_pts AS DOUBLE))
             / ({nwin} * CAST(n_pts AS DOUBLE)), 6) AS fano
FROM g JOIN tc ON g.conv_id = tc.conv_id"""


def _autocorr_sql() -> str:
    lags = ACF_LAGS
    lag_cols = ",\n         ".join(
        f"lag(x, {j}) OVER tw AS y{j}" for j in lags
    )
    unions = "\n  UNION ALL\n  ".join(
        f"SELECT conv_id, CAST({j} AS BIGINT) AS lag, x, y{j} AS y "
        f"FROM l WHERE y{j} IS NOT NULL"
        for j in lags
    )
    n, sx, sy = "CAST(n_pairs AS DOUBLE)", "CAST(sx AS DOUBLE)", "CAST(sy AS DOUBLE)"
    sxy, sxx, syy = "CAST(sxy AS DOUBLE)", "CAST(sxx AS DOUBLE)", "CAST(syy AS DOUBLE)"
    cov = f"({n}*{sxy} - {sx}*{sy})"
    vx = f"({n}*{sxx} - {sx}*{sx})"
    vy = f"({n}*{syy} - {sy}*{sy})"
    return f"""{_ORACLE_PREFIX},
t1h AS ({_tier_body_sql('1h')}),
v AS (SELECT conv_id, window_start_us, sum_tokens AS x FROM t1h),
l AS (
  SELECT conv_id, x,
         {lag_cols}
  FROM v WINDOW tw AS (PARTITION BY conv_id ORDER BY window_start_us)
),
p AS (
  {unions}
),
a AS (
  SELECT conv_id, lag, count(*) AS n_pairs,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x*y) AS BIGINT) AS sxy,
         CAST(sum(x*x) AS BIGINT) AS sxx,
         CAST(sum(y*y) AS BIGINT) AS syy
  FROM p GROUP BY 1, 2
)
SELECT conv_id, lag, n_pairs,
       round({cov} / sqrt({vx}*{vy}), 6) AS acf
FROM a
WHERE n_pairs >= {ACF_MIN_PAIRS} AND {vx} > 0 AND {vy} > 0"""


def _changepoint_cusum_sql() -> str:
    m_ = "CAST(s AS DOUBLE)/CAST(n AS DOUBLE)"
    var = f"CAST(ss AS DOUBLE)/CAST(n AS DOUBLE) - ({m_})*({m_})"
    d = f"CAST(cum AS DOUBLE) - CAST(i AS DOUBLE)*({m_})"
    return f"""{_ORACLE_PREFIX},
t1h AS ({_tier_body_sql('1h')}),
v AS (SELECT conv_id, window_start_us AS w, sum_tokens AS x FROM t1h),
s0 AS (
  SELECT conv_id, w, x,
         row_number() OVER tw AS i,
         CAST(sum(x) OVER (PARTITION BY conv_id ORDER BY w
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         count(x) OVER cw AS n,
         CAST(sum(x) OVER cw AS BIGINT) AS s,
         CAST(sum(x*x) OVER cw AS BIGINT) AS ss
  FROM v
  WINDOW tw AS (PARTITION BY conv_id ORDER BY w),
         cw AS (PARTITION BY conv_id)
),
sc AS (
  SELECT conv_id, w, i, cum, n, s,
         abs({d}) AS absd, ({var}) AS var
  FROM s0
  WHERE n >= 8 AND ({var}) > 0
),
best AS (
  SELECT *, row_number() OVER
    (PARTITION BY conv_id ORDER BY absd DESC, w ASC) AS rk
  FROM sc
)
SELECT conv_id, w AS cp_window_start_us, n AS n_windows,
       round(absd / (sqrt(var) * sqrt(CAST(n AS DOUBLE))), 6) AS cusum_stat,
       round(CAST(cum AS DOUBLE) / CAST(i AS DOUBLE), 6) AS level_before,
       round(CASE WHEN i < n
         THEN CAST(s - cum AS DOUBLE) / CAST(n - i AS DOUBLE) END, 6)
         AS level_after
FROM best
WHERE rk = 1 AND absd / (sqrt(var) * sqrt(CAST(n AS DOUBLE))) >= {CUSUM_TAU}"""


def _seasonal_naive_sql() -> str:
    return f"""{_ORACLE_PREFIX},
t1h AS ({_tier_body_sql('1h')}),
v AS (SELECT conv_id, window_start_us AS w, sum_tokens AS x FROM t1h),
p AS (
  SELECT a.conv_id, a.x - b.x AS e
  FROM v a JOIN v b ON a.conv_id = b.conv_id AND a.w = b.w + {SEASON_US}
),
g AS (
  SELECT conv_id, count(*) AS n_pairs,
         CAST(sum(abs(e)) AS BIGINT) AS sae,
         CAST(sum(e*e) AS BIGINT) AS sse
  FROM p GROUP BY 1
)
SELECT conv_id, n_pairs,
       round(CAST(sae AS DOUBLE) / CAST(n_pairs AS DOUBLE), 6) AS mae,
       round(sqrt(CAST(sse AS DOUBLE) / CAST(n_pairs AS DOUBLE)), 6) AS rmse
FROM g WHERE n_pairs >= 4"""


def _sax_words_sql() -> str:
    m_ = "CAST(s AS DOUBLE)/CAST(n AS DOUBLE)"
    var = f"CAST(ss AS DOUBLE)/CAST(n AS DOUBLE) - ({m_})*({m_})"
    z = f"(CAST(x AS DOUBLE) - ({m_})) / sqrt({var})"
    return f"""{_ORACLE_PREFIX},
t1h AS ({_tier_body_sql('1h')}),
v AS (SELECT conv_id, window_start_us AS w, sum_tokens AS x FROM t1h),
s0 AS (
  SELECT conv_id, w, x,
         count(x) OVER cw AS n,
         CAST(sum(x) OVER cw AS BIGINT) AS s,
         CAST(sum(x*x) OVER cw AS BIGINT) AS ss
  FROM v WINDOW cw AS (PARTITION BY conv_id)
)
SELECT conv_id, max(n) AS n_windows,
       string_agg(
         CASE WHEN {z} < -0.6745 THEN 'a'
              WHEN {z} < 0.0 THEN 'b'
              WHEN {z} < 0.6745 THEN 'c'
              ELSE 'd' END, '' ORDER BY w) AS sax_word
FROM s0
WHERE n >= 4 AND ({var}) > 0
GROUP BY conv_id"""


def _cross_corr_sql() -> str:
    lags = CCF_LAGS
    lag_cols = ",\n         ".join(
        f"lag(y, {j}) OVER tw AS y{j}" for j in lags
    )
    unions = "\n  UNION ALL\n  ".join(
        f"SELECT conv_id, CAST({j} AS BIGINT) AS lag, x, y{j} AS y "
        f"FROM l WHERE y{j} IS NOT NULL"
        for j in lags
    )
    n, sx, sy = "CAST(n_pairs AS DOUBLE)", "CAST(sx AS DOUBLE)", "CAST(sy AS DOUBLE)"
    sxy, sxx, syy = "CAST(sxy AS DOUBLE)", "CAST(sxx AS DOUBLE)", "CAST(syy AS DOUBLE)"
    cov = f"({n}*{sxy} - {sx}*{sy})"
    vx = f"({n}*{sxx} - {sx}*{sx})"
    vy = f"({n}*{syy} - {sy}*{sy})"
    return f"""{_ORACLE_PREFIX},
t1h AS ({_tier_body_sql('1h')}),
v AS (
  SELECT conv_id, window_start_us,
         CAST(floor(sum_latency_us / 1000000.0) AS BIGINT) AS x,
         n_points AS y
  FROM t1h
),
l AS (
  SELECT conv_id, x,
         {lag_cols}
  FROM v WINDOW tw AS (PARTITION BY conv_id ORDER BY window_start_us)
),
p AS (
  {unions}
),
a AS (
  SELECT conv_id, lag, count(*) AS n_pairs,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x*y) AS BIGINT) AS sxy,
         CAST(sum(x*x) AS BIGINT) AS sxx,
         CAST(sum(y*y) AS BIGINT) AS syy
  FROM p GROUP BY 1, 2
)
SELECT conv_id, lag, n_pairs,
       round({cov} / sqrt({vx}*{vy}), 6) AS ccf
FROM a
WHERE n_pairs >= {ACF_MIN_PAIRS} AND {vx} > 0 AND {vy} > 0"""


def _lttb_sql() -> str:
    ax = "CAST(pst AS DOUBLE)/CAST(pn AS DOUBLE)"
    ay = "CAST(psv AS DOUBLE)/CAST(pn AS DOUBLE)"
    cx = "CAST(nst AS DOUBLE)/CAST(nn AS DOUBLE)"
    cy = "CAST(nsv AS DOUBLE)/CAST(nn AS DOUBLE)"
    bx, by = "CAST(ts AS DOUBLE)", "CAST(value AS DOUBLE)"
    area2 = (
        f"abs(({ax} - {cx})*({by} - {ay}) - ({ax} - {bx})*({cy} - {ay}))"
    )
    return f"""{_ORACLE_PREFIX},
t1m AS ({_tier_body_sql('1m')}),
pts AS (
  SELECT conv_id, window_start_us AS ts, sum_tokens AS value,
         CAST(floor(window_start_us / {float(LTTB_BUCKET_US)!r}) AS BIGINT) AS b
  FROM t1m
),
st AS (
  SELECT conv_id, b, count(*) AS n,
         CAST(sum(ts) AS BIGINT) AS st, CAST(sum(value) AS BIGINT) AS sv
  FROM pts GROUP BY 1, 2
),
j AS (
  SELECT p.conv_id, p.b, p.ts, p.value,
         pr.n AS pn, pr.st AS pst, pr.sv AS psv,
         nx.n AS nn, nx.st AS nst, nx.sv AS nsv
  FROM pts p
  LEFT JOIN st pr ON pr.conv_id = p.conv_id AND pr.b = p.b - 1
  LEFT JOIN st nx ON nx.conv_id = p.conv_id AND nx.b = p.b + 1
),
sc AS (
  SELECT conv_id, b, ts, value,
         pn IS NULL AS fst, nn IS NULL AS lst,
         CASE WHEN pn IS NOT NULL AND nn IS NOT NULL
              THEN {area2} END AS area2
  FROM j
),
rk AS (
  SELECT conv_id, b, ts, value,
         row_number() OVER (PARTITION BY conv_id, b ORDER BY
           CASE WHEN fst AND NOT lst THEN ts
                WHEN lst THEN -ts ELSE -1 END ASC,
           area2 DESC NULLS LAST, ts ASC) AS r
  FROM sc
)
SELECT conv_id, b * {LTTB_BUCKET_US} AS bucket_start_us, ts, value
FROM rk WHERE r = 1"""


def _response_latency_sql() -> str:
    return f"""{_ORACLE_PREFIX},
r AS (
  SELECT conv_id, role, ts_us,
         min(CASE WHEN role = 'assistant' THEN ts_us END) OVER
           (PARTITION BY conv_id ORDER BY turn_idx, ts_us
            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS na
  FROM m
),
u AS (
  SELECT conv_id,
         CASE WHEN na IS NOT NULL THEN
           CAST(floor((na - ts_us) / 1000000.0) AS BIGINT) END AS resp_s
  FROM r WHERE role = 'user'
),
g AS (
  SELECT conv_id, count(*) AS n_user_turns, count(resp_s) AS n_answered,
         CAST(sum(resp_s) AS BIGINT) AS ss,
         max(resp_s) AS max_response_s
  FROM u GROUP BY 1
)
SELECT conv_id, n_user_turns, n_answered,
       round(CAST(ss AS DOUBLE) / CAST(n_answered AS DOUBLE), 6)
         AS mean_response_s,
       max_response_s
FROM g WHERE n_answered > 0"""


def _cohort_retention_sql() -> str:
    d = 86_400_000_000
    return f"""{_ORACLE_PREFIX},
cd AS (
  SELECT DISTINCT conv_id,
         CAST(floor(ts_us / {float(d)!r}) AS BIGINT) * {d} AS active_day_us
  FROM m
),
wc AS (
  SELECT conv_id, active_day_us,
         min(active_day_us) OVER (PARTITION BY conv_id) AS cohort_day_us
  FROM cd
),
a AS (
  SELECT cohort_day_us, active_day_us, count(*) AS n_active
  FROM wc GROUP BY 1, 2
),
s AS (
  SELECT cohort_day_us, count(*) AS cohort_size
  FROM wc WHERE active_day_us = cohort_day_us GROUP BY 1
)
SELECT a.cohort_day_us, active_day_us,
       CAST((active_day_us - a.cohort_day_us) / {d} AS BIGINT) AS age_days,
       n_active, cohort_size,
       round(CAST(n_active AS DOUBLE) / CAST(cohort_size AS DOUBLE), 6)
         AS retention_rate
FROM a JOIN s ON a.cohort_day_us = s.cohort_day_us"""


def _tool_gini_sql() -> str:
    return f"""{_ORACLE_PREFIX},
b AS (
  SELECT conv_id,
         CASE WHEN tool IS NULL OR trim(tool) = '' THEN 'none'
              ELSE tool END AS tool
  FROM m
),
c AS (SELECT conv_id, tool, count(*) AS c FROM b GROUP BY 1, 2),
g AS (
  SELECT conv_id, CAST(sum(c) AS BIGINT) AS n_turns,
         count(*) AS n_tools,
         CAST(sum(c*c) AS BIGINT) AS sc2
  FROM c GROUP BY 1
)
SELECT conv_id, n_turns, n_tools,
       round(CAST(n_turns*n_turns - sc2 AS DOUBLE)
             / CAST(n_turns*n_turns AS DOUBLE), 6) AS gini
FROM g WHERE n_turns >= 1"""


def _activity_streaks_sql() -> str:
    w = _TIER_US["1h"]
    return f"""{_ORACLE_PREFIX},
t1h AS ({_tier_body_sql('1h')}),
i AS (
  SELECT conv_id, window_start_us, window_start_us // {w} AS idx
  FROM t1h
),
g AS (
  SELECT conv_id, window_start_us,
         idx - row_number() OVER (PARTITION BY conv_id ORDER BY idx) AS grp
  FROM i
),
st AS (
  SELECT conv_id, grp, count(*) AS len,
         min(window_start_us) AS start FROM g GROUP BY 1, 2
),
r AS (
  SELECT conv_id,
         CAST(sum(len) OVER (PARTITION BY conv_id) AS BIGINT) AS n_windows,
         count(*) OVER (PARTITION BY conv_id) AS n_streaks,
         len AS longest_streak, start AS longest_start_us,
         row_number() OVER (PARTITION BY conv_id
                            ORDER BY len DESC, start ASC) AS rk
  FROM st
)
SELECT conv_id, n_windows, n_streaks, longest_streak, longest_start_us
FROM r WHERE rk = 1"""


def _robust_outliers_sql() -> str:
    return f"""{_ORACLE_PREFIX},
t1h AS ({_tier_body_sql('1h')}),
v AS (SELECT conv_id, window_start_us,
             CAST(floor(sum_latency_us / 1000000.0) AS BIGINT) AS value
      FROM t1h),
medt AS (
  SELECT conv_id, quantile_cont(value, 0.5) AS med, count(*) AS n
  FROM v GROUP BY 1
),
j AS (SELECT v.*, medt.med, medt.n FROM v JOIN medt USING (conv_id)),
madt AS (
  SELECT conv_id,
         quantile_cont(abs(CAST(value AS DOUBLE) - med), 0.5) AS mad
  FROM j GROUP BY 1
),
o AS (
  SELECT j.conv_id, j.window_start_us, j.value, j.med, d.mad,
         round(0.6745 * (CAST(j.value AS DOUBLE) - j.med) / d.mad, 6)
           AS rz
  FROM j JOIN madt d USING (conv_id)
  WHERE j.n >= {ROBUST_MIN_WINDOWS} AND d.mad > 0
)
SELECT conv_id, window_start_us, value, med, mad, rz
FROM o WHERE abs(rz) >= {ROBUST_TAU}"""


def _term_cooccurrence_sql() -> str:
    toks = _TOKENS_SQL.format(t="text")
    return f"""
WITH terms AS (
  SELECT doc_id AS doc, unnest({toks}) AS term FROM documents
),
ft AS (SELECT doc, term FROM terms WHERE lower(term) NOT IN
       (SELECT unnest({_STOPWORDS_SQL}))),
tf AS (SELECT doc, term, count(*) AS tf FROM ft GROUP BY 1, 2),
tk AS (
  SELECT doc, term FROM (
    SELECT doc, term, row_number() OVER
           (PARTITION BY doc ORDER BY tf DESC, term ASC) AS rk
    FROM tf
  ) WHERE rk <= {COOCCUR_K}
),
p AS (
  SELECT a.term AS term_a, b.term AS term_b, count(*) AS n_ab
  FROM tk a JOIN tk b ON a.doc = b.doc AND a.term < b.term
  GROUP BY 1, 2
),
t AS (SELECT term, count(*) AS n_t FROM tk GROUP BY 1)
SELECT p.term_a, p.term_b, p.n_ab, ta.n_t AS n_a, tb.n_t AS n_b,
       round(CAST(p.n_ab AS DOUBLE)
             / CAST(ta.n_t + tb.n_t - p.n_ab AS DOUBLE), 6) AS jaccard
FROM p JOIN t ta ON p.term_a = ta.term JOIN t tb ON p.term_b = tb.term
WHERE p.n_ab >= 1"""


def _ohlc_sql() -> str:
    w = _TIER_US["1h"]
    return f"""{_ORACLE_PREFIX},
i AS (
  SELECT conv_id,
         CAST(floor(ts_us / {w}.0) AS BIGINT) * {w} AS window_start_us,
         ts_us, turn_idx, CAST(token_count AS BIGINT) AS v
  FROM m
),
r AS (
  SELECT *, row_number() OVER
            (PARTITION BY conv_id, window_start_us
             ORDER BY ts_us ASC, turn_idx ASC) AS rn,
         row_number() OVER
            (PARTITION BY conv_id, window_start_us
             ORDER BY ts_us DESC, turn_idx DESC) AS rnd
  FROM i
)
SELECT conv_id, window_start_us,
       max(CASE WHEN rn = 1 THEN v END) AS open,
       max(v) AS high, min(v) AS low,
       max(CASE WHEN rnd = 1 THEN v END) AS close,
       count(*) AS n_points
FROM r GROUP BY 1, 2"""


def _window_topk_sql() -> str:
    return f"""{_ORACLE_PREFIX},
t1h AS ({_tier_body_sql('1h')}),
r AS (
  SELECT window_start_us, conv_id, CAST(sum_tokens AS BIGINT) AS value,
         CAST(row_number() OVER
              (PARTITION BY window_start_us
               ORDER BY sum_tokens DESC, conv_id ASC) AS INTEGER) AS rank
  FROM t1h
)
SELECT window_start_us, rank, conv_id, value
FROM r WHERE rank <= {TOPK_CONVS}"""


def _funnel_sql() -> str:
    return f"""{_ORACLE_PREFIX},
s1 AS (
  SELECT conv_id,
         min(CASE WHEN role = 'user' THEN ts_us END) AS t1_us
  FROM m GROUP BY 1
),
s2 AS (
  SELECT m.conv_id, s1.t1_us,
         min(CASE WHEN m.role = 'tool' AND m.ts_us > s1.t1_us
                  THEN m.ts_us END) AS t2_us
  FROM m JOIN s1 USING (conv_id) GROUP BY 1, 2
),
s3 AS (
  SELECT m.conv_id, s2.t1_us, s2.t2_us,
         min(CASE WHEN m.role = 'assistant' AND m.ts_us > s2.t2_us
                  THEN m.ts_us END) AS t3_us
  FROM m JOIN s2 USING (conv_id) GROUP BY 1, 2, 3
)
SELECT conv_id, t1_us, t2_us, t3_us,
       CAST((CASE WHEN t1_us IS NOT NULL THEN 1 ELSE 0 END)
          + (CASE WHEN t2_us IS NOT NULL THEN 1 ELSE 0 END)
          + (CASE WHEN t3_us IS NOT NULL THEN 1 ELSE 0 END)
          AS INTEGER) AS steps_completed
FROM s3"""


def _utilization_sql() -> str:
    thr = UTIL_IDLE_S * 1_000_000
    return f"""{_ORACLE_PREFIX},
g AS (
  SELECT conv_id, count(latency_us) AS n_gaps,
         CAST(sum(least(latency_us, {thr})) AS BIGINT) AS active_us,
         CAST(sum(greatest(latency_us - {thr}, 0)) AS BIGINT) AS idle_us
  FROM m WHERE latency_us IS NOT NULL GROUP BY 1
)
SELECT conv_id, n_gaps, active_us, idle_us,
       round(CAST(active_us AS DOUBLE)
             / CAST(active_us + idle_us AS DOUBLE), 6) AS utilization
FROM g WHERE n_gaps >= 1 AND active_us + idle_us > 0"""


def _seasonal_anomaly_sql() -> str:
    m_ = "CAST(s AS DOUBLE)/CAST(n AS DOUBLE)"
    var = f"CAST(ss AS DOUBLE)/CAST(n AS DOUBLE) - ({m_})*({m_})"
    z = f"(CAST(value AS DOUBLE) - ({m_})) / sqrt({var})"
    return f"""{_ORACLE_PREFIX},
t1h AS ({_tier_body_sql('1h')}),
v AS (
  SELECT conv_id, window_start_us,
         CAST((window_start_us // 3600000000) % 24 AS INTEGER) AS hod,
         CAST(floor(sum_latency_us / 1000000.0) AS BIGINT) AS value
  FROM t1h
),
bl AS (
  SELECT hod, count(*) AS n, CAST(sum(value) AS BIGINT) AS s,
         CAST(sum(value*value) AS BIGINT) AS ss
  FROM v GROUP BY 1
),
j AS (
  SELECT v.conv_id, v.window_start_us, v.hod, v.value,
         round({z}, 6) AS z
  FROM v JOIN bl USING (hod)
  WHERE bl.n >= 24 AND ({var}) > 0
)
SELECT conv_id, window_start_us, hod, value, z
FROM j WHERE abs(z) >= {SEASONAL_TAU}"""


def _dispersion_stats_sql() -> str:
    return f"""{_ORACLE_PREFIX},
t1h AS ({_tier_body_sql('1h')}),
v AS (SELECT conv_id,
             CAST(floor(sum_latency_us / 1000000.0) AS BIGINT) AS value
      FROM t1h),
g AS (
  SELECT conv_id, count(*) AS n_windows,
         quantile_cont(value, 0.25) AS q1,
         quantile_cont(value, 0.75) AS q3,
         CAST(sum(value) AS BIGINT) AS s,
         max(value) AS peak
  FROM v GROUP BY 1
)
SELECT conv_id, n_windows, q1, q3, q3 - q1 AS iqr,
       round(CAST(s AS DOUBLE) / CAST(n_windows AS DOUBLE), 6) AS mean,
       peak,
       round(CAST(peak AS DOUBLE)
             / (CAST(s AS DOUBLE) / CAST(n_windows AS DOUBLE)), 6) AS par
FROM g WHERE n_windows >= 4 AND s > 0"""


def _weekly_growth_sql() -> str:
    wk = 7 * 86_400_000_000
    return f"""{_ORACLE_PREFIX},
g AS (
  SELECT CAST(floor(ts_us / {wk}.0) AS BIGINT) * {wk} AS week_start_us,
         count(*) AS n_turns,
         CAST(sum(token_count) AS BIGINT) AS sum_tokens
  FROM m GROUP BY 1
),
l AS (
  SELECT *, lag(sum_tokens) OVER (ORDER BY week_start_us) AS prev
  FROM g
)
SELECT week_start_us, n_turns, sum_tokens,
       CASE WHEN prev > 0 THEN
         round(CAST(sum_tokens - prev AS DOUBLE)
               / CAST(prev AS DOUBLE), 6) END AS growth
FROM l"""


def _verbosity_drift_sql() -> str:
    den = "CAST(n*sxx - sx*sx AS DOUBLE)"
    return f"""{_ORACLE_PREFIX},
g AS (
  SELECT conv_id, count(*) AS n,
         CAST(sum(turn_idx) AS BIGINT) AS sx,
         CAST(sum(token_count) AS BIGINT) AS sy,
         CAST(sum(turn_idx * token_count) AS BIGINT) AS sxy,
         CAST(sum(CAST(turn_idx AS BIGINT) * turn_idx) AS BIGINT) AS sxx
  FROM m GROUP BY 1
)
SELECT conv_id, n AS n_turns,
       round(CAST(n*sxy - sx*sy AS DOUBLE) / {den}, 6) AS slope,
       round(CAST(sy*sxx - sx*sxy AS DOUBLE) / {den}, 6) AS intercept
FROM g WHERE n >= 8"""


def _role_mix_daily_sql() -> str:
    d = 86_400_000_000
    return f"""{_ORACLE_PREFIX},
g AS (
  SELECT CAST(floor(ts_us / {d}.0) AS BIGINT) * {d} AS day_start_us,
         role, count(*) AS n_turns,
         CAST(sum(token_count) AS BIGINT) AS sum_tokens
  FROM m GROUP BY 1, 2
),
t AS (
  SELECT *,
         CAST(sum(n_turns) OVER (PARTITION BY day_start_us) AS BIGINT)
           AS tt,
         CAST(sum(sum_tokens) OVER (PARTITION BY day_start_us) AS BIGINT)
           AS tk
  FROM g
)
SELECT day_start_us, role, n_turns, sum_tokens,
       CASE WHEN tt > 0 THEN
         round(CAST(n_turns AS DOUBLE) / CAST(tt AS DOUBLE), 6)
       END AS turn_share,
       CASE WHEN tk > 0 THEN
         round(CAST(sum_tokens AS DOUBLE) / CAST(tk AS DOUBLE), 6)
       END AS token_share
FROM t"""


def _lexical_diversity_sql() -> str:
    toks = _TOKENS_SQL.format(t="text")
    return f"""{_ORACLE_PREFIX},
terms AS (SELECT conv_id, unnest({toks}) AS term FROM m),
tot AS (SELECT conv_id, count(*) AS n_tokens FROM terms GROUP BY 1),
ty AS (
  SELECT conv_id, count(*) AS n_types
  FROM (SELECT DISTINCT conv_id, term FROM terms) GROUP BY 1
)
SELECT tot.conv_id, tot.n_tokens, ty.n_types,
       round(CAST(ty.n_types AS DOUBLE)
             / CAST(tot.n_tokens AS DOUBLE), 6) AS ttr
FROM tot JOIN ty USING (conv_id)
WHERE tot.n_tokens >= 20"""


def _tool_stall_sql() -> str:
    return f"""{_ORACLE_PREFIX},
p AS (
  SELECT conv_id, latency_us,
         lag(role) OVER
           (PARTITION BY conv_id ORDER BY turn_idx, ts_us) AS prev_role,
         lag(tool) OVER
           (PARTITION BY conv_id ORDER BY turn_idx, ts_us) AS prev_tool
  FROM m
),
s AS (
  SELECT prev_tool AS tool,
         CAST(floor(latency_us / 1000000.0) AS BIGINT) AS stall_s
  FROM p
  WHERE prev_role = 'tool' AND prev_tool IS NOT NULL
        AND latency_us IS NOT NULL
),
g AS (
  SELECT tool, count(*) AS n_stalls,
         CAST(sum(stall_s) AS BIGINT) AS s,
         max(stall_s) AS max_stall_s
  FROM s GROUP BY 1
)
SELECT tool, n_stalls,
       round(CAST(s AS DOUBLE) / CAST(n_stalls AS DOUBLE), 6)
         AS mean_stall_s,
       max_stall_s
FROM g WHERE n_stalls >= 3"""


def _conv_outcomes_sql() -> str:
    return f"""{_ORACLE_PREFIX},
r AS (
  SELECT conv_id, ts_us, role,
         row_number() OVER
           (PARTITION BY conv_id
            ORDER BY turn_idx DESC, ts_us DESC) AS rnd
  FROM m
),
g AS (
  SELECT conv_id, count(*) AS n_turns,
         max(ts_us) - min(ts_us) AS duration_us,
         max(CASE WHEN rnd = 1 THEN role END) AS last_role
  FROM r GROUP BY 1
)
SELECT conv_id, n_turns, duration_us, last_role,
       CAST(CASE WHEN last_role = 'assistant' THEN 1 ELSE 0 END
            AS INTEGER) AS ended_answered
FROM g"""


def _conv_dedup_sql() -> str:
    from sac2mseed_spark.functions.hashing import h60_sql

    agg = "string_agg(CAST(h AS VARCHAR), ',' ORDER BY turn_idx)"
    return f"""{_ORACLE_PREFIX},
t AS (SELECT conv_id, turn_idx, {h60_sql('text')} AS h FROM m),
c AS (
  SELECT conv_id, {h60_sql(agg)} AS conv_h60
  FROM t GROUP BY 1
)
SELECT min(conv_id) AS keep_conv, count(*) AS n_dups, conv_h60
FROM c GROUP BY conv_h60"""


def _conv_near_dup_sql(threshold: float = 0.9, df_cap: int = 256) -> str:
    return f"""{_ORACLE_PREFIX},
augt AS (
  SELECT conv_id, text FROM m
  UNION ALL
  SELECT conv_id || '~v' AS conv_id, text FROM m
  WHERE CAST(split_part(conv_id, '_', 2) AS INTEGER) < 20
    AND turn_idx >= 2
),
ts AS (SELECT DISTINCT conv_id, {h60_sql('text')} AS turn_h FROM augt),
dfreq AS (SELECT turn_h, count(*) AS c FROM ts GROUP BY 1),
kept AS (SELECT ts.* FROM ts JOIN dfreq USING (turn_h) WHERE dfreq.c <= {df_cap}),
sz AS (SELECT conv_id, count(*) AS sz FROM kept GROUP BY 1),
p AS (
  SELECT l.conv_id AS a, r.conv_id AS b, count(*) AS inter
  FROM kept l JOIN kept r ON l.turn_h = r.turn_h AND l.conv_id < r.conv_id
  GROUP BY 1, 2
)
SELECT a, b, inter,
       round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) AS jaccard
FROM p JOIN sz sa ON sa.conv_id = p.a JOIN sz sb ON sb.conv_id = p.b
WHERE round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) >= {threshold}"""


def _layout_audit_sql(n_files: int = 64) -> str:
    from sac2mseed_spark.functions.zorder import (
        conv_bucket_sql,
        hour_bucket_sql,
        interleave_sql,
    )

    def leg(layout: str, order: str) -> str:
        return f"""SELECT '{layout}' AS layout,
       CAST(ntile({n_files}) OVER (ORDER BY {order}) AS INTEGER) AS file_id,
       conv_id, hb, zkey
FROM z"""

    body = (
        "SELECT layout, file_id, count(*) AS n_rows,\n"
        "       count(DISTINCT conv_id) AS n_convs,\n"
        "       count(DISTINCT hb) AS n_hours,\n"
        "       max(zkey) - min(zkey) AS z_span\n"
        "FROM f GROUP BY 1, 2"
    )
    return f"""{_ORACLE_PREFIX},
keyed AS (
  SELECT conv_id, turn_idx, ts_us,
         {conv_bucket_sql('conv_id')} AS cb,
         {hour_bucket_sql('ts_us')} AS hb
  FROM m
),
z AS (SELECT *, {interleave_sql('cb', 'hb')} AS zkey FROM keyed),
f AS (
  {leg('zorder', 'zkey, conv_id, ts_us, turn_idx')}
  UNION ALL
  {leg('time', 'ts_us, conv_id, turn_idx')}
)
{body}"""


def _corpus_mix_sql() -> str:
    ntok = "len(" + _TOKENS_SQL.format(t="text") + ")"
    return f"""
WITH g AS (
  SELECT lang, source, count(*) AS n_docs,
         CAST(sum({ntok}) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1, 2
),
t AS (
  SELECT *,
         CAST(sum(n_docs) OVER () AS BIGINT) AS td,
         CAST(sum(n_tokens) OVER () AS BIGINT) AS tt
  FROM g
)
SELECT lang, source, n_docs, n_tokens,
       round(CAST(n_docs AS DOUBLE) / CAST(td AS DOUBLE), 6) AS doc_share,
       round(CAST(n_tokens AS DOUBLE) / CAST(tt AS DOUBLE), 6) AS token_share
FROM t"""


def _shingle_novelty_sql() -> str:
    d = 86_400_000_000
    toks = _TOKENS_SQL.format(t="text")
    return f"""{_ORACLE_PREFIX},
tok AS (
  SELECT CAST(floor(ts_us / {d}.0) AS BIGINT) * {d} AS day_start_us,
         {toks} AS toks
  FROM m
),
sh AS (
  SELECT day_start_us, unnest(
    CASE WHEN len(toks) >= 3
         THEN [array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)]
         ELSE [array_to_string(toks, ' ')] END) AS sh
  FROM tok
),
d AS (SELECT DISTINCT day_start_us, {h60_sql('sh')} AS sh_h FROM sh),
f AS (SELECT sh_h, min(day_start_us) AS first_day FROM d GROUP BY 1)
SELECT d.day_start_us,
       count(*) AS n_shingles,
       CAST(sum(CASE WHEN f.first_day = d.day_start_us THEN 1 ELSE 0 END)
            AS BIGINT) AS n_new,
       round(CAST(sum(CASE WHEN f.first_day = d.day_start_us THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*), 6) AS novelty_share
FROM d JOIN f USING (sh_h)
GROUP BY 1"""


def _conv_dup_clusters_sql() -> str:
    """Connected components over the conv_near_dup pair graph — the
    same recursive-CTE min-label argument as _dedup_clusters_sql, with
    the full conv_near_dup statement nested as the pairs CTE."""
    return f"""
WITH RECURSIVE pairs AS (
{_conv_near_dup_sql()}
),
edges AS (SELECT a, b FROM pairs UNION SELECT b AS a, a AS b FROM pairs),
vertices AS (SELECT DISTINCT a AS node FROM edges),
cc AS (
  SELECT node, node AS lbl FROM vertices
  UNION
  SELECT e.b AS node, c.lbl FROM cc c JOIN edges e ON e.a = c.node
),
lab AS (SELECT node, min(lbl) AS cluster_id FROM cc GROUP BY node)
SELECT node AS conv_id, cluster_id,
       CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
FROM lab
"""


def _source_quality_sql(short_tokens: int = 10) -> str:
    toks = _TOKENS_SQL.format(t="text")
    ntok = f"len({toks})"
    nsw = f"len(list_filter({toks}, t -> list_contains({_STOPWORDS_SQL}, lower(t))))"
    npunct = "len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))"
    return f"""
WITH g AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum({ntok}) AS BIGINT) AS sum_tokens,
         CAST(sum({npunct}) AS BIGINT) AS sum_punct,
         CAST(sum(length(text)) AS BIGINT) AS sum_chars,
         CAST(sum({nsw}) AS BIGINT) AS sum_stopwords,
         CAST(sum(CASE WHEN {ntok} < {short_tokens} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_short
  FROM documents GROUP BY 1
)
SELECT source, n_docs, sum_tokens,
       CASE WHEN n_docs > 0 THEN
         round(CAST(sum_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
       END AS tokens_per_doc,
       CASE WHEN sum_chars > 0 THEN
         round(CAST(sum_punct AS DOUBLE) / CAST(sum_chars AS DOUBLE), 6)
       END AS punct_share,
       CASE WHEN sum_tokens > 0 THEN
         round(CAST(sum_stopwords AS DOUBLE) / CAST(sum_tokens AS DOUBLE), 6)
       END AS stopword_share,
       CASE WHEN n_docs > 0 THEN
         round(CAST(n_short AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
       END AS short_doc_share
FROM g"""


def _source_overlap_sql() -> str:
    toks = _TOKENS_SQL.format(t="text")
    return f"""
WITH tok AS (SELECT source, {toks} AS toks FROM documents),
sh AS (
  SELECT source, unnest(
    CASE WHEN len(toks) >= 3
         THEN [array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)]
         ELSE [array_to_string(toks, ' ')] END) AS sh
  FROM tok
),
d AS (SELECT DISTINCT source, {h60_sql('sh')} AS h FROM sh),
per AS (SELECT source, count(*) AS n FROM d GROUP BY 1),
p AS (
  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
  FROM d a JOIN d b ON a.h = b.h AND a.source < b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b, n_shared,
       pa.n AS n_a, pb.n AS n_b,
       round(CAST(n_shared AS DOUBLE) / least(pa.n, pb.n), 6)
         AS overlap_share
FROM p
JOIN per pa ON pa.source = p.src_a
JOIN per pb ON pb.source = p.src_b"""


def _dup_ngram_coverage_sql() -> str:
    return f"""
WITH {_AUG_DOCS_SQL},
dfreq AS (SELECT sh_h, count(*) AS df FROM shs GROUP BY 1)
SELECT doc AS doc_id, count(*) AS n_shingles,
       CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       round(CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS dup_frac
FROM shs JOIN dfreq USING (sh_h)
GROUP BY 1"""


def _repetition_loops_sql(threshold: float = 0.9, min_pairs: int = 3) -> str:
    from sac2mseed_spark.functions.hashing import h60_sql

    toks = _TOKENS_SQL.format(t="text")
    return f"""{_ORACLE_PREFIX},
t AS (
  SELECT conv_id, role,
         row_number() OVER
           (PARTITION BY conv_id, role ORDER BY turn_idx, ts_us) AS rn,
         {toks} AS toks
  FROM m
),
terms AS (
  SELECT DISTINCT conv_id, role, rn, {h60_sql('term')} AS term_h
  FROM (SELECT conv_id, role, rn, unnest(toks) AS term FROM t)
),
sz AS (
  SELECT b.conv_id, b.role, b.rn, coalesce(c.n, 0) AS sz
  FROM (SELECT conv_id, role, rn FROM t) b
  LEFT JOIN (SELECT conv_id, role, rn, count(*) AS n
             FROM terms GROUP BY 1, 2, 3) c
    USING (conv_id, role, rn)
),
pairs AS (
  SELECT conv_id, role, rn AS p, sz + sz_next AS sz_sum
  FROM (SELECT conv_id, role, rn, sz,
               lead(sz) OVER
                 (PARTITION BY conv_id, role ORDER BY rn) AS sz_next
        FROM sz)
  WHERE sz_next IS NOT NULL
),
inter AS (
  SELECT a.conv_id, a.role, a.rn AS p, count(*) AS n_inter
  FROM terms a JOIN terms b
    ON a.conv_id = b.conv_id AND a.role = b.role
       AND b.rn = a.rn + 1 AND a.term_h = b.term_h
  GROUP BY 1, 2, 3
),
scored AS (
  SELECT pairs.conv_id, pairs.role,
         CASE WHEN pairs.sz_sum - coalesce(inter.n_inter, 0) = 0
              THEN CAST(1.0 AS DOUBLE)
              ELSE round(CAST(coalesce(inter.n_inter, 0) AS DOUBLE)
                   / CAST(pairs.sz_sum - coalesce(inter.n_inter, 0)
                          AS DOUBLE), 6) END AS jacc
  FROM pairs LEFT JOIN inter
    ON pairs.conv_id = inter.conv_id AND pairs.role = inter.role
       AND pairs.p = inter.p
)
SELECT conv_id, role, count(*) AS n_pairs,
       CAST(sum(CASE WHEN jacc >= {threshold} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_repeats,
       round(CAST(sum(CASE WHEN jacc >= {threshold} THEN 1 ELSE 0 END)
                  AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS repeat_ratio,
       max(jacc) AS max_jaccard
FROM scored GROUP BY 1, 2
HAVING count(*) >= {min_pairs}"""


def _sliding_sql(width_us: int, slide_us: int) -> str:
    f = width_us // slide_us
    return f"""{_ORACLE_PREFIX},
e AS (
  SELECT m.*,
         CAST(floor(ts_us / {slide_us}.0) AS BIGINT) * {slide_us}
           - k.k * {slide_us} AS window_start_us
  FROM m CROSS JOIN
       (SELECT CAST(range AS BIGINT) AS k FROM range({f})) k
)
SELECT conv_id, window_start_us,
       count(*) AS n_points,
       count(latency_us) AS n_latency,
       CAST(sum(latency_us) AS BIGINT) AS sum_latency_us,
       max(latency_us) AS max_latency_us,
       CAST(sum(token_count) AS BIGINT) AS sum_tokens
FROM e GROUP BY 1, 2"""


def _latency_cube_sql() -> str:
    return f"""{_ORACLE_PREFIX}
SELECT role, tool,
       CAST(2 * GROUPING(role) + GROUPING(tool) AS INTEGER) AS gid,
       count(*) AS n_turns,
       count(latency_us) AS n_latency,
       CAST(sum(latency_us) AS BIGINT) AS sum_latency_us,
       max(latency_us) AS max_latency_us
FROM m GROUP BY CUBE (role, tool)"""


def _daily_coverage_sql() -> str:
    d = 86_400_000_000
    return f"""{_ORACLE_PREFIX},
t1h AS ({_tier_body_sql('1h')})
SELECT conv_id,
       CAST(floor(window_start_us / {d}.0) AS BIGINT) * {d} AS day_start_us,
       count(*) AS n_hours,
       round(count(*) / 24.0, 6) AS coverage,
       min(window_start_us) AS first_window_us,
       max(window_start_us) AS last_window_us,
       CAST(sum(n_points) AS BIGINT) AS n_points
FROM t1h GROUP BY 1, 2"""


def _latency_rollup_hier_sql() -> str:
    d = 86_400_000_000
    return f"""{_ORACLE_PREFIX},
md AS (
  SELECT CAST(floor(ts_us / {d}.0) AS BIGINT) * {d} AS day_start_us,
         role, latency_us
  FROM m
)
SELECT day_start_us, role,
       CAST(2 * GROUPING(day_start_us) + GROUPING(role) AS INTEGER) AS gid,
       count(*) AS n_turns,
       count(latency_us) AS n_latency,
       CAST(sum(latency_us) AS BIGINT) AS sum_latency_us,
       max(latency_us) AS max_latency_us
FROM md GROUP BY ROLLUP (day_start_us, role)"""


def _twa_sql(width_us: int, tol_us: int) -> str:
    return f"""{_ORACLE_PREFIX},
seg AS (
  SELECT conv_id, ts_us, token_count AS v,
         least(lead(ts_us) OVER
                 (PARTITION BY conv_id ORDER BY ts_us, turn_idx) - ts_us,
               CAST({tol_us} AS BIGINT)) AS d_us
  FROM m
  -- least() skips NULLs; the WHERE d_us > 0 below still admits the
  -- last turn unless the gap itself is NULL-propagated first
  QUALIFY lead(ts_us) OVER
            (PARTITION BY conv_id ORDER BY ts_us, turn_idx) IS NOT NULL
),
e AS (
  SELECT conv_id, ts_us, v, d_us,
         unnest(generate_series(
           CAST(floor(ts_us / {width_us}.0) AS BIGINT) * {width_us},
           CAST(floor((ts_us + d_us - 1) / {width_us}.0) AS BIGINT)
             * {width_us},
           {width_us})) AS window_start_us
  FROM seg WHERE d_us > 0
),
o AS (
  SELECT conv_id, window_start_us, v,
         least(ts_us + d_us, window_start_us + {width_us})
           - greatest(ts_us, window_start_us) AS ov_us
  FROM e
)
SELECT conv_id, window_start_us,
       CAST(sum(v * ov_us) AS BIGINT) AS sum_weighted,
       CAST(sum(ov_us) AS BIGINT) AS covered_us,
       count(*) AS n_segments,
       round(CAST(sum(v * ov_us) AS DOUBLE) / sum(ov_us), 6) AS twa
FROM o GROUP BY 1, 2"""


def oracle_sql() -> dict[str, str]:
    lo, hi = 1_704_067_200_000_000, 1_704_240_000_000_000
    return {
        "transcripts": f"{_ORACLE_PREFIX} SELECT conv_id, turn_idx, role, text, tool, ts_us FROM m",
        "rollup_1m": _rollup_sql("1m"),
        "rollup_1h": _rollup_sql("1h"),
        "rollup_1d": _rollup_sql("1d"),
        "tier_derived_1h": f"""{_ORACLE_PREFIX},
t AS ({_rollup_sql('1h').replace(_ORACLE_PREFIX, '')})
SELECT conv_id, window_start_us, n_points,
       round(n_points / 3600.0, 6) AS turn_rate,
       round(CASE WHEN n_latency > 0
             THEN sum_latency_us / n_latency END, 6) AS avg_latency_us
FROM t""",
        "segments": _segments_sql(),
        "gap_report": _gap_report_sql(),
        "gapfill_locf_1h": _gapfill_sql("locf"),
        "gapfill_linear_1h": _gapfill_sql("linear"),
        "selections": f"""{_ORACLE_PREFIX}
SELECT conv_id, turn_idx, role, tool, text, ts_us FROM m
WHERE conv_id LIKE 'conv_1%' AND ts_us BETWEEN {lo} AND {hi}""",
        "selections_glob": f"""{_ORACLE_PREFIX}
SELECT conv_id, turn_idx, role, tool, text, ts_us FROM m
WHERE {selections_sql(SEL_GLOB)}""",
        "overrides": f"""{_ORACLE_PREFIX}
SELECT {override_sql('conv_id', 'CONV_....')} AS conv_id, turn_idx,
       {override_sql('role', 'R...')} AS role,
       {override_sql('tool', 'forced')} AS tool, ts_us
FROM m""",
        "autoscale": _autoscale_sql(),
        "pack_stats_1m": _pack_stats_sql(),
        "roundtrip_1m": f"""{_ORACLE_PREFIX}
SELECT conv_id, ts_us, CAST(latency_us AS DOUBLE) AS latency_us,
       CAST(token_count AS DOUBLE) AS token_count
FROM m""",
        "tier_read_1m": f"""{_ORACLE_PREFIX}
SELECT conv_id, ts_us, CAST(latency_us AS DOUBLE) AS latency_us,
       CAST(token_count AS DOUBLE) AS token_count
FROM m WHERE {selections_sql(SEL_GLOB)}""",
        "repack_1h": f"""{_ORACLE_PREFIX},
rn AS (
  SELECT conv_id, ts_us,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx, ts_us) - 1
           AS pos
  FROM m
)
SELECT conv_id,
       CAST(floor(ts_us / {_TIER_US['1h']}.0) AS BIGINT) * {_TIER_US['1h']}
         AS window_start_us,
       count(*) AS n_points,
       CAST(count(DISTINCT CAST(floor(pos / 4096.0) AS INTEGER)) AS INTEGER)
         AS n_chunks,
       min(ts_us) AS first_ts_us,
       max(ts_us) AS last_ts_us
FROM rn GROUP BY 1, 2""",
        "time_functions": f"""
WITH transcripts AS ({TRANSCRIPTS_FROM_EVENTS_SQL})
SELECT conv_id, turn_idx,
       epoch_us(ts) AS ts_us,
       strftime(ts, '%Y-%m-%dT%H:%M:%S') AS iso_s,
       CAST(dayofyear(ts) AS INTEGER) AS doy,
       CAST(year(ts) AS INTEGER) AS yr,
       CAST(month(ts) AS INTEGER) AS mon,
       CAST(day(ts) AS INTEGER) AS dom,
       epoch_us(ts) % 1000000 AS us_frac,
       CAST(floor((epoch_us(ts) % 1000000 + 50) / 100.0) AS BIGINT) AS tenth_ms,
       epoch_us(ts) % 1000000
         - CAST(floor((epoch_us(ts) % 1000000 + 50) / 100.0) AS BIGINT) * 100
         AS us_offset
FROM transcripts""",
        "conv_summary": f"""{_ORACLE_PREFIX}
SELECT conv_id, count(*) AS n_turns, min(ts_us) AS first_ts_us,
       max(ts_us) AS last_ts_us, CAST(sum(token_count) AS BIGINT) AS sum_tokens,
       count(CASE WHEN role = 'tool' THEN 1 END) AS n_tool_turns
FROM m GROUP BY 1""",
        "validation_report": f"""
WITH transcripts AS ({TRANSCRIPTS_FROM_EVENTS_SQL}),
v AS (
  SELECT CASE WHEN conv_id IS NULL OR length(conv_id) = 0 THEN 'null_conv_id' END AS r1,
         CASE WHEN ts IS NULL THEN 'null_ts' END AS r2,
         CASE WHEN turn_idx < 0 THEN 'negative_turn_idx' END AS r3,
         CASE WHEN role NOT IN ('user','assistant','tool','system') THEN 'bad_role' END AS r4,
         CASE WHEN ts IS NOT NULL AND epoch_us(ts) NOT BETWEEN 0 AND 4102444800000000
              THEN 'ts_out_of_range' END AS r5
  FROM transcripts
),
bad AS (
  SELECT reason, count(*) AS n_rows FROM (
    SELECT unnest([x FOR x IN [r1, r2, r3, r4, r5] IF x IS NOT NULL]) AS reason
    FROM v
  ) GROUP BY 1
),
good AS (
  SELECT 'valid' AS reason, count(*) AS n_rows FROM v
  WHERE r1 IS NULL AND r2 IS NULL AND r3 IS NULL AND r4 IS NULL AND r5 IS NULL
)
SELECT * FROM bad UNION ALL SELECT * FROM good""",
        "dedup_exact": _dedup_exact_sql(),
        "text_quality": _text_quality_sql(),
        "doc_fingerprint": _fingerprint_sql(),
        "dedup_ngram_jaccard": _jaccard_sql(0.5),
        "dedup_minhash_lsh": _minhash_sql(0.5),
        "dedup_simhash": _simhash_sql(),
        "dedup_clusters": _dedup_clusters_sql(0.5),
        "pii_scrub": _pii_scrub_sql(),
        "topk_ngrams": _topk_ngrams_sql(20),
        "stratified_sample": _stratified_sample_sql(),
        "sample_report": _sample_report_sql(),
        "stratified_resample": _stratified_resample_sql(),
        "embedding_quantize": _embedding_quantize_sql(),
        "asof_attribution": _asof_attribution_sql(),
        "token_shards": _token_shards_sql(),
        "shard_manifest": _shard_manifest_sql(),
        "contamination": _contamination_sql(),
        "anomaly_zscore": _anomaly_zscore_sql(),
        "ewma_smooth": _ewma_smooth_sql(),
        "latency_percentiles": _latency_percentiles_sql(),
        "m4_downsample": _m4_downsample_sql(),
        "rollup_month": _rollup_month_sql(),
        "trend_slope": _trend_slope_sql(),
        "concurrency_peak": _concurrency_peak_sql(),
        "hourly_profile": _hourly_profile_sql(),
        "burst_detect": _burst_detect_sql(),
        "role_transitions": _role_transitions_sql(),
        "salient_terms": _salient_terms_sql(),
        "bm25_search": _bm25_search_sql(),
        "sft_pairs": _sft_pairs_sql(),
        "pref_pairs": _pref_pairs_sql(),
        "conv_survival": _conv_survival_sql(),
        "template_turns": _template_turns_sql(),
        "context_fit": _context_fit_sql(),
        "simhash_pairs": _simhash_pairs_sql(3),
        "knn_bruteforce": _knn_sql(5),
        "knn_lsh": _knn_lsh_sql(5),
        "knn_ivf": _knn_ivf_sql(5),
        "knn_ivf_trained": _knn_ivf_trained_sql(5),
        "rat_approx": _rat_approx_sql(),
        "retention_sweep": _retention_sweep_sql(),
        "tiered_serve": _tiered_serve_sql(),
        "dedup_embedding": _embedding_dup_sql(0.4),
        "multimodal_features": _multimodal_sql(),
        "counter_rate": _counter_rate_sql(),
        "distinct_kmv": _distinct_kmv_sql(64, 3_600_000_000),
        "burstiness": _burstiness_sql(),
        "interval_overlap": _interval_overlap_sql(1.5),
        "latency_histogram": _latency_histogram_sql(),
        "autocorr": _autocorr_sql(),
        "changepoint_cusum": _changepoint_cusum_sql(),
        "seasonal_naive": _seasonal_naive_sql(),
        "sax_words": _sax_words_sql(),
        "tool_gini": _tool_gini_sql(),
        "cross_corr": _cross_corr_sql(),
        "lttb_downsample": _lttb_sql(),
        "response_latency": _response_latency_sql(),
        "cohort_retention": _cohort_retention_sql(),
        "activity_streaks": _activity_streaks_sql(),
        "robust_outliers": _robust_outliers_sql(),
        "term_cooccurrence": _term_cooccurrence_sql(),
        "ohlc_1h": _ohlc_sql(),
        "window_topk": _window_topk_sql(),
        "funnel": _funnel_sql(),
        "utilization": _utilization_sql(),
        "seasonal_anomaly": _seasonal_anomaly_sql(),
        "dispersion_stats": _dispersion_stats_sql(),
        "weekly_growth": _weekly_growth_sql(),
        "verbosity_drift": _verbosity_drift_sql(),
        "role_mix_daily": _role_mix_daily_sql(),
        "lexical_diversity": _lexical_diversity_sql(),
        "tool_stall": _tool_stall_sql(),
        "conv_outcomes": _conv_outcomes_sql(),
        "conv_dedup": _conv_dedup_sql(),
        "repetition_loops": _repetition_loops_sql(),
        "dup_ngram_coverage": _dup_ngram_coverage_sql(),
        "layout_audit": _layout_audit_sql(),
        "corpus_mix": _corpus_mix_sql(),
        "source_overlap": _source_overlap_sql(),
        "shingle_novelty": _shingle_novelty_sql(),
        "conv_near_dup": _conv_near_dup_sql(),
        "conv_dup_clusters": _conv_dup_clusters_sql(),
        "source_quality": _source_quality_sql(),
        "sliding_1h15m": _sliding_sql(3_600_000_000, 900_000_000),
        "latency_cube": _latency_cube_sql(),
        "daily_coverage": _daily_coverage_sql(),
        "twa_1h": _twa_sql(3_600_000_000, 30 * 60 * 1_000_000),
        "latency_rollup_hier": _latency_rollup_hier_sql(),
    }
