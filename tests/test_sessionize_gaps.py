"""Sessionization, gap report, gap-fill."""

from pyspark.sql import functions as F

from sac2mseed_spark.functions.metrics import derive_turn_metrics
from sac2mseed_spark.operators.gapfill import gap_fill
from sac2mseed_spark.operators.gaps import gap_report
from sac2mseed_spark.operators.rollup import rollup_from_turns
from sac2mseed_spark.operators.sessionize import segments, sessionize
from sac2mseed_spark.sources.transcripts import FIXTURES, generate_transcripts

TOL = 30 * 60 * 1_000_000  # 30 min


def _metrics(spark, fixture="t_gaps"):
    return derive_turn_metrics(generate_transcripts(spark, fixture))


def test_gap_fixture_produces_segments(spark):
    m = _metrics(spark)
    seg = segments(m, TOL)
    per_conv = seg.groupBy("conv_id").count()
    # t_gaps injects a 6h gap every 40 turns on 50-500-turn convs
    assert per_conv.filter("count > 1").count() == FIXTURES["t_gaps"].n_convs


def test_segment_count_matches_gap_count(spark):
    m = _metrics(spark)
    n_gaps = gap_report(m, min_gap_us=TOL).filter(F.col("gap_us") > 0).count()
    n_segs = segments(m, TOL).count()
    n_convs = m.select("conv_id").distinct().count()
    assert n_segs == n_convs + n_gaps


def test_sessionize_order_insensitive(spark):
    a = sessionize(_metrics(spark), TOL).select("conv_id", "turn_idx", "segment_id")
    b = sessionize(
        derive_turn_metrics(
            generate_transcripts(spark, "t_gaps").orderBy(F.xxhash64("text"))
        ),
        TOL,
    ).select("conv_id", "turn_idx", "segment_id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_gapfill_locf_dense_grid(spark):
    m = _metrics(spark)
    t1m = rollup_from_turns(m, "1m")
    dense = gap_fill(t1m, "1m", ["sum_tokens"], method="locf")
    # grid is dense: per conv, row count == (max-min)/step + 1
    from sac2mseed_spark import TIERS

    expect = (
        t1m.groupBy("conv_id")
        .agg(
            (
                (F.max("window_start_us") - F.min("window_start_us")) / TIERS["1m"] + 1
            ).cast("long").alias("expect_rows")
        )
    )
    got = dense.groupBy("conv_id").count()
    bad = expect.join(got, "conv_id").filter(F.col("expect_rows") != F.col("count"))
    assert bad.count() == 0
    # LOCF leaves no nulls after the first observed window
    assert dense.filter(F.col("sum_tokens").isNull()).count() == 0
    # filled rows exist and carry the previous observation
    assert dense.filter("is_filled").count() > 0


def test_gapfill_linear_between_neighbors(spark):
    m = _metrics(spark)
    t1m = rollup_from_turns(m, "1m")
    dense = gap_fill(t1m, "1m", ["sum_tokens"], method="linear")
    filled = dense.filter("is_filled")
    assert filled.count() > 0
    # interpolated values lie within [min, max] of the conversation's
    # observed values (linear interp between neighbors cannot overshoot)
    bounds = t1m.groupBy("conv_id").agg(
        F.min("sum_tokens").alias("lo"), F.max("sum_tokens").alias("hi")
    )
    bad = (
        filled.join(bounds, "conv_id")
        .filter((F.col("sum_tokens") < F.col("lo")) | (F.col("sum_tokens") > F.col("hi")))
        .count()
    )
    assert bad == 0
