"""Tier-table sink layout: round-trip, partition pruning, payload-column
skip (the msr_parse_selection short-circuit as columnar physics)."""

import pytest
from pyspark.sql import functions as F

from sac2mseed_spark.functions.metrics import derive_turn_metrics
from sac2mseed_spark.operators.pack import pack_tier, unpack_tier
from sac2mseed_spark.sinks.tier_tables import read_tier, write_tier
from sac2mseed_spark.sources.transcripts import generate_transcripts


@pytest.fixture(scope="module")
def tier_store(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tiers") / "packed")
    m = derive_turn_metrics(generate_transcripts(spark, "t_small", seed=42))
    packed = pack_tier(m, "1h")
    write_tier(packed, path, mode="overwrite")
    return path, packed


def test_roundtrip_through_store(spark, tier_store):
    path, packed = tier_store
    back = read_tier(spark, path, tier="1h")
    assert back.count() == packed.count()
    # payload survives storage byte-for-byte: decode succeeds w/ Xn check
    pts = unpack_tier(back)
    assert pts.count() == packed.agg(F.sum("n_points")).collect()[0][0]


def test_selection_pushdown_in_plan(spark, tier_store):
    path, _ = tier_store
    df = read_tier(
        spark,
        path,
        tier="1h",
        conv_like="conv_0000000%",
        ts_min_us=1_700_000_000_000_000,
    ).select("conv_id", "window_start_us", "n_points")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # predicates reached the parquet scan
    assert "PushedFilters" in plan
    assert "conv_id" in plan.split("PushedFilters")[1][:300]
    # projection pruned the payload column out of the scan entirely
    read_schema = plan.split("ReadSchema")[1][:400]
    assert "payload" not in read_schema


def test_partition_pruning(spark, tier_store):
    path, packed = tier_store
    # a tier filter must not even list the other tier's directories
    df = read_tier(spark, path, tier="nope")
    assert df.count() == 0
    sel = read_tier(spark, path, tier="1h")
    assert sel.count() == packed.count()
