"""Tier rollup: direct-vs-cascade bit-exactness, window alignment."""

from pyspark.sql import functions as F

from sac2mseed_spark import TIERS
from sac2mseed_spark.functions.metrics import derive_turn_metrics
from sac2mseed_spark.operators.rollup import (
    rollup_cascade,
    rollup_from_turns,
)
from sac2mseed_spark.sources.transcripts import generate_transcripts


def _metrics(spark, fixture="t_small"):
    return derive_turn_metrics(generate_transcripts(spark, fixture))


def test_cascade_equals_direct(spark):
    """1h and 1d computed through the cascade must equal direct rollup from
    raw turns — integer-domain sums make re-aggregation exactly associative
    (BASELINE.json bit-exact tier parity)."""
    m = _metrics(spark, "t_gaps")
    tiers = rollup_cascade(m)
    for tier in ("1h", "1d"):
        direct = rollup_from_turns(m, tier)
        via = tiers[tier]
        assert direct.exceptAll(via).count() == 0, f"{tier}: direct ⊄ cascade"
        assert via.exceptAll(direct).count() == 0, f"{tier}: cascade ⊄ direct"


def test_window_alignment_and_counts(spark):
    m = _metrics(spark)
    t1m = rollup_cascade(m)["1m"]
    misaligned = t1m.filter(F.col("window_start_us") % TIERS["1m"] != 0).count()
    assert misaligned == 0
    assert t1m.agg(F.sum("n_points")).first()[0] == m.count()


def test_out_of_order_input_same_tiers(spark):
    """Shuffled delivery order yields identical tier tables (mst_groupheal
    analogue: declarative re-sort makes order irrelevant)."""
    ordered = _metrics(spark, "t_small")
    shuffled = derive_turn_metrics(
        generate_transcripts(spark, "t_small").orderBy(F.xxhash64("text", "turn_idx"))
    )
    a = rollup_cascade(ordered)["1m"]
    b = rollup_cascade(shuffled)["1m"]
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_latency_null_on_first_turn_only(spark):
    m = _metrics(spark)
    nulls = m.filter(F.col("latency_us").isNull())
    assert nulls.count() == nulls.filter(F.col("turn_idx") == 0).count()
    n_convs = m.select("conv_id").distinct().count()
    assert nulls.count() == n_convs
