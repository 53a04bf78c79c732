"""IncrementalRollup.serve(): the age-banded dashboard view read straight
off the maintained delta chains (operators/retention.serve_tiered over
IncrementalRollup.tier), SURVEY §2.9 + retention serving combined."""

import pytest
from pyspark.sql import functions as F

from sac2mseed_spark.functions.metrics import derive_turn_metrics
from sac2mseed_spark.operators.retention import serve_tiered
from sac2mseed_spark.operators.rollup import rollup_from_turns
from sac2mseed_spark.plans.pipeline import IncrementalRollup
from sac2mseed_spark.sources.transcripts import generate_transcripts


@pytest.fixture(scope="module")
def served(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("serve_snaps")
    t = generate_transcripts(spark, "t_small", seed=42)
    for i, (lo, hi) in enumerate([(0, 30), (30, 10_000)], start=1):
        part = t.filter((F.col("turn_idx") >= lo) & (F.col("turn_idx") < hi))
        part.write.mode("overwrite").parquet(str(base / f"snap_{i:08d}"))
    inc = IncrementalRollup(
        spark, str(base), str(tmp_path_factory.mktemp("serve_work"))
    )
    assert inc.process_pending() == 2
    m = derive_turn_metrics(t)
    now_us = int(
        m.agg(F.max("ts_us")).collect()[0][0]
    ) + 60_000_000  # just past the newest point
    return inc, m, now_us


def test_serve_matches_operator_on_tier_reads(spark, served):
    """serve() is exactly serve_tiered over the chain-resolved tiers —
    no drift between the pipeline method and the standalone operator."""
    inc, _, now_us = served
    via_method = inc.serve(now_us).collect()
    via_op = serve_tiered(
        {t: inc.tier(t) for t in ("1m", "1h", "1d")}, now_us
    ).collect()
    key = lambda r: (r["tier"], r["conv_id"], r["window_start_us"])
    assert sorted(via_method, key=key) == sorted(via_op, key=key)


def test_serve_covers_every_point_exactly_once(spark, served):
    """Within each band the finest retained tier serves; across bands the
    n_points sums reproduce the raw turn count exactly (no point dropped,
    none double-served) when every tier's horizon covers the data."""
    inc, m, now_us = served
    horizons = {  # wide enough that nothing has expired
        "1m": 400 * 86_400_000_000,
        "1h": 500 * 86_400_000_000,
        "1d": None,
    }
    out = inc.serve(now_us, horizons)
    n_served = out.agg(F.sum("n_points")).collect()[0][0]
    assert n_served == m.count()
    # all-finest horizons -> everything comes from the 1m band
    assert out.filter(F.col("tier") != "1m").count() == 0


def test_serve_exact_when_alignment_inverts_edges(spark, served):
    """Close horizons whose ceil-aligned edges would INVERT (the 1h->1d
    edge day-aligns past the 1m->1h edge) must still serve every point
    exactly once: band_edges_us clamps the finer edge up to the coarser
    one, so the contested range is served (once) by the coarser tier.
    Without the clamp this fixture double-serves ~25% of its points."""
    inc, m, now_us = served
    span_us = now_us - int(m.agg(F.min("ts_us")).collect()[0][0])
    horizons = {"1m": span_us // 3, "1h": (2 * span_us) // 3, "1d": None}
    out = inc.serve(now_us, horizons)
    n_served = out.agg(F.sum("n_points")).collect()[0][0]
    assert n_served == m.count()


def test_serve_two_tier_bands_are_disjoint(spark, served):
    """1m/1h serving (hour-aligned edge inside the 20h fixture span):
    mixed-tier view, disjoint window ranges, exact point total."""
    inc, m, now_us = served
    span_us = now_us - int(m.agg(F.min("ts_us")).collect()[0][0])
    horizons = {"1m": span_us // 3, "1h": None, "1d": None}
    tiers = {"1m": inc.tier("1m"), "1h": inc.tier("1h")}
    out = serve_tiered(tiers, now_us, horizons).cache()
    tiers_present = {r["tier"] for r in out.select("tier").distinct().collect()}
    assert tiers_present == {"1m", "1h"}, tiers_present
    n_served = out.agg(F.sum("n_points")).collect()[0][0]
    assert n_served == m.count()
    rows = (
        out.groupBy("tier")
        .agg(F.min("window_start_us").alias("lo"), F.max("window_start_us").alias("hi"))
        .collect()
    )
    spans = {r["tier"]: (r["lo"], r["hi"]) for r in rows}
    # every 1h-band window ends before every 1m-band window starts
    assert spans["1h"][1] < spans["1m"][0]
    out.unpersist()
