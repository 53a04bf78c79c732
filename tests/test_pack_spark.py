"""Spark-integration tests for the pack/unpack path (operators/pack.py).

The pure-python codec tests (test_codec.py) pin the byte format; these pin
the Spark plumbing: grouping, chunk split/assemble determinism at different
parallelism, and the unpack round-trip — the engine-level analogue of the
reference's read-back golden tests (/root/reference/libmseed/test/README:1-14).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sac2mseed_spark.codec import oracle
from sac2mseed_spark.functions.metrics import derive_turn_metrics
from sac2mseed_spark.operators.pack import (
    STREAMS,
    pack_tier,
    unpack_tier,
    verify_continuity,
)
from sac2mseed_spark.sources.transcripts import generate_transcripts


@pytest.fixture(scope="module")
def packed_1m(spark):
    t = generate_transcripts(spark, "t_small", seed=42)
    m = derive_turn_metrics(t)
    return m, pack_tier(m, "1m").cache()


def test_point_conservation(spark, packed_1m):
    m, packed = packed_1m
    n_turns = m.count()
    assert packed.agg(F.sum("n_points")).collect()[0][0] == n_turns


def test_unpack_roundtrip_values(spark, packed_1m):
    m, packed = packed_1m
    up = unpack_tier(packed)
    # every (conv_id, ts_us) decodes back with identical latency/token values
    joined = m.select(
        "conv_id",
        "ts_us",
        F.col("latency_us").cast("double").alias("lat_in"),
        F.col("token_count").cast("double").alias("tok_in"),
    ).join(up, ["conv_id", "ts_us"], "full_outer")
    n = m.count()
    assert joined.count() == n
    bad = joined.filter(
        ~(
            (F.col("lat_in") == F.col("latency_us_f"))
            | (F.isnan("lat_in") & F.isnan("latency_us_f"))
            | (F.col("lat_in").isNull() & F.isnan("latency_us_f"))
        )
        | (F.col("tok_in") != F.col("token_count_f"))
    )
    assert bad.count() == 0


def test_parallelism_invariance(spark):
    """Identical payload bytes at 1 vs 8 upstream partitions (the skew-split
    bit-exactness contract, operators/skew.py)."""
    t = generate_transcripts(spark, "t_small", seed=42)
    m = derive_turn_metrics(t)
    a = pack_tier(m.coalesce(1), "1m")
    b = pack_tier(m.repartition(8, "conv_id"), "1m")
    rows_a = {
        (r["conv_id"], r["window_start_us"]): (bytes(r["payload"]), r["crc32"])
        for r in a.collect()
    }
    rows_b = {
        (r["conv_id"], r["window_start_us"]): (bytes(r["payload"]), r["crc32"])
        for r in b.collect()
    }
    assert rows_a == rows_b


def test_out_of_order_input_same_bytes(spark):
    """Out-of-order delivery packs to identical bytes (mst_groupheal
    property, traceutils.c:776-915)."""
    spec = "t_small"
    m1 = derive_turn_metrics(generate_transcripts(spark, spec, seed=42))
    shuffled = generate_transcripts(spark, spec, seed=42).orderBy(F.xxhash64("text"))
    m2 = derive_turn_metrics(shuffled)
    pa = {(r["conv_id"], r["window_start_us"]): bytes(r["payload"]) for r in pack_tier(m1, "1h").collect()}
    pb = {(r["conv_id"], r["window_start_us"]): bytes(r["payload"]) for r in pack_tier(m2, "1h").collect()}
    assert pa == pb


def test_salted_path_same_bytes(spark):
    """The skew-split (salted) two-stage plan and the flat one-shuffle plan
    must produce byte-identical blobs — chunk boundaries depend only on
    turn_idx values, never on physical partitioning."""
    m = derive_turn_metrics(generate_transcripts(spark, "t_gaps", seed=42))
    flat = {
        (r["conv_id"], r["window_start_us"]): (bytes(r["payload"]), r["crc32"])
        for r in pack_tier(m, "1h").collect()
    }
    salted = {
        (r["conv_id"], r["window_start_us"]): (bytes(r["payload"]), r["crc32"])
        for r in pack_tier(m, "1h", salted=True).collect()
    }
    assert flat == salted


def test_assume_sorted_same_bytes(spark):
    """assume_sorted=True packs the lag-window output (already in
    (conv_id, turn_idx, ts) order within partitions, unique turn_idx,
    monotone ts) to byte-identical blobs while skipping both the exchange
    and the Tungsten sort."""
    t = generate_transcripts(spark, "t_small", seed=42)
    m = derive_turn_metrics(t)
    pa = {
        (r["conv_id"], r["window_start_us"]): (bytes(r["payload"]), r["crc32"])
        for r in pack_tier(m, "1m").collect()
    }
    pb = {
        (r["conv_id"], r["window_start_us"]): (bytes(r["payload"]), r["crc32"])
        for r in pack_tier(m, "1m", assume_sorted=True).collect()
    }
    assert pa == pb
    # same through a cache (the scaling-job shape: persist then pack)
    mc = m.select("conv_id", "turn_idx", "ts_us", "latency_us", "token_count").persist()
    mc.count()
    pc = {
        (r["conv_id"], r["window_start_us"]): (bytes(r["payload"]), r["crc32"])
        for r in pack_tier(mc, "1m", assume_sorted=True).collect()
    }
    mc.unpersist()
    assert pa == pc


def test_chunk_split_across_windows(spark):
    """Conversations long enough to cross the CHUNK_POINTS turn boundary
    inside one window produce multi-chunk blobs that decode whole."""
    from pyspark.sql import functions as F

    from sac2mseed_spark.operators.skew import CHUNK_POINTS

    n = CHUNK_POINTS + 500
    df = spark.range(n).select(
        F.lit("c0").alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        (F.lit(1_700_000_000_000_000) + F.col("id") * 1000).alias("ts_us"),
        (F.col("id") % 97).cast("long").alias("latency_us"),
        (F.col("id") % 13).cast("long").alias("token_count"),
    )
    packed = pack_tier(df, "1d").collect()
    assert len(packed) == 1
    row = packed[0]
    assert row["n_chunks"] == 2 and row["n_points"] == n
    ts, streams = oracle.decode_blob(
        bytes(row["payload"]), expect_xn=int(np.uint64(np.int64(row["xn"])))
    )
    assert len(ts) == n and ts == list(range(1_700_000_000_000_000, 1_700_000_000_000_000 + 1000 * n, 1000))


def test_hot_conversation_salted_equals_flat(spark):
    """Zipf-head fixture (3 convs x 100k turns): hot conversations split
    across chunk groups on the salted path and still produce blobs
    byte-identical to the flat plan."""
    m = derive_turn_metrics(generate_transcripts(spark, "t_hot", seed=42))
    m = m.filter(F.col("conv_id") < "conv_00000010")  # the hot head + a few
    flat = {
        (r["conv_id"], r["window_start_us"]): (r["crc32"], r["n_points"], r["n_chunks"])
        for r in pack_tier(m, "1d").collect()
    }
    salted = {
        (r["conv_id"], r["window_start_us"]): (r["crc32"], r["n_points"], r["n_chunks"])
        for r in pack_tier(m, "1d", salted=True).collect()
    }
    assert flat == salted
    assert any(v[2] > 1 for v in flat.values())  # hot windows really split


def test_repack_equals_direct_pack(spark):
    """msrepack analogue: 1m payloads decoded and re-encoded at 1h must be
    byte-identical to packing 1h directly from raw metrics (dense turn_idx
    fixture) — the decode→re-window→encode loop loses nothing."""
    from sac2mseed_spark.operators.pack import repack_tier

    m = derive_turn_metrics(generate_transcripts(spark, "t_gaps", seed=42))
    direct = {
        (r["conv_id"], r["window_start_us"]): (bytes(r["payload"]), r["crc32"])
        for r in pack_tier(m, "1h").collect()
    }
    re1h = {
        (r["conv_id"], r["window_start_us"]): (bytes(r["payload"]), r["crc32"])
        for r in repack_tier(pack_tier(m, "1m"), "1h").collect()
    }
    assert re1h == direct


def test_read_tier_selection_prunes_and_matches(spark):
    """Selection read path: coarse blob pruning + exact point filter equals
    filtering the raw metrics directly."""
    from sac2mseed_spark.operators.pack import read_tier_selection

    m = derive_turn_metrics(generate_transcripts(spark, "t_small", seed=42))
    packed = pack_tier(m, "1m")
    lo = m.agg(F.expr("percentile(ts_us, 0.25)")).collect()[0][0]
    hi = m.agg(F.expr("percentile(ts_us, 0.75)")).collect()[0][0]
    sels = [("conv_0000000[0-4]", int(lo), int(hi)), ("conv_0000001?", None, None)]
    got = {
        (r["conv_id"], r["ts_us"])
        for r in read_tier_selection(packed, sels).collect()
    }
    from sac2mseed_spark.functions.selections import apply_selections

    want = {
        (r["conv_id"], r["ts_us"])
        for r in apply_selections(m, sels).select("conv_id", "ts_us").collect()
    }
    assert got == want and got


def test_adaptive_pack_engages_salted_on_hot_keys(spark):
    """pack_tier_adaptive's sampled heavy-hitter probe: picks the salted
    plan on the Zipf-head fixture, the flat plan on a uniform one, and the
    salted decision changes nothing about the bytes."""
    from sac2mseed_spark.operators.pack import pack_tier_adaptive
    from sac2mseed_spark.operators.skew import heavy_hitters

    m_hot = derive_turn_metrics(generate_transcripts(spark, "t_hot", seed=42))
    m_hot = m_hot.filter(F.col("conv_id") < "conv_00000020").cache()
    hot = heavy_hitters(m_hot, ["conv_id"], threshold=50_000, sample_frac=0.05)
    hot_keys = {r["conv_id"] for r in hot.collect()}
    # the 3 Zipf-head conversations (100k turns each) and nothing else
    assert hot_keys == {"conv_00000000", "conv_00000001", "conv_00000002"}

    adaptive = {
        (r["conv_id"], r["window_start_us"]): (r["crc32"], r["n_points"])
        for r in pack_tier_adaptive(m_hot, "1d", hot_rows=50_000, sample_frac=0.05).collect()
    }
    flat = {
        (r["conv_id"], r["window_start_us"]): (r["crc32"], r["n_points"])
        for r in pack_tier(m_hot, "1d").collect()
    }
    assert adaptive == flat
    m_hot.unpersist()

    # uniform fixture: no heavy hitters -> flat plan chosen (no error path)
    m_uni = derive_turn_metrics(generate_transcripts(spark, "t_small", seed=42))
    assert not heavy_hitters(m_uni, ["conv_id"], threshold=50_000, sample_frac=0.5).take(1)
    assert pack_tier_adaptive(m_uni, "1h", hot_rows=50_000).count() > 0


def test_payload_decodes_with_oracle(spark, packed_1m):
    _, packed = packed_1m
    row = packed.orderBy("conv_id", "window_start_us").first()
    ts, streams = oracle.decode_blob(
        bytes(row["payload"]), expect_xn=int(np.uint64(np.int64(row["xn"])))
    )
    assert len(ts) == row["n_points"]
    assert len(streams) == len(STREAMS)
    assert ts[0] == row["first_ts_us"] and ts[-1] == row["last_ts_us"]


def test_continuity_audit_shape(spark, packed_1m):
    _, packed = packed_1m
    cont = verify_continuity(packed)
    n_adj = cont.filter("adjacent").count()
    # adjacent windows must see a non-null prev_xn
    assert cont.filter(F.col("adjacent") & F.col("prev_xn").isNull()).count() == 0
    assert n_adj > 0
