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


def test_zorder_write_clusters_conversations(spark, tmp_path):
    """zorder=True must produce files that each touch FEW conversations
    (footer-prunable for conv predicates), where a time-clustered write
    of the same rows puts every conversation in every file."""
    from sac2mseed_spark.functions.zorder import HOUR_US

    rows = [
        (f"conv_{c}", "1h", h * HOUR_US, 1)
        for c in range(8)
        for h in range(48)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, tier string, window_start_us long, n_points int"
    )

    def convs_per_file(path):
        back = spark.read.parquet(path).withColumn(
            "f", F.input_file_name()
        )
        stats = (
            back.groupBy("f")
            .agg(F.countDistinct("conv_id").alias("nc"))
            .collect()
        )
        return [r["nc"] for r in stats]

    zp = str(tmp_path / "z")
    write_tier(df, zp, mode="overwrite", zorder=True, n_files=4)
    # time-clustered control: range-partition by hour only
    tp = str(tmp_path / "t")
    from sac2mseed_spark.sinks.tier_tables import with_partition_cols

    with_partition_cols(df).repartitionByRange(
        4, "window_start_us"
    ).write.mode("overwrite").partitionBy("tier", "window_day").parquet(tp)

    z_stats, t_stats = convs_per_file(zp), convs_per_file(tp)
    # every time-file sees all 8 convs; z files must average strictly fewer
    assert max(t_stats) == 8
    assert sum(z_stats) / len(z_stats) < 8
    # and the z write still round-trips completely
    assert spark.read.parquet(zp).count() == len(rows)
