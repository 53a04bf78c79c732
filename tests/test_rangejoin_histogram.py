"""interval_overlap (bucketed range join) and latency_histogram."""

from pyspark.sql import functions as F

from sac2mseed_spark.operators.histogram import latency_histogram
from sac2mseed_spark.operators.rangejoin import incident_hours, interval_overlap

HOUR = 3_600_000_000
MIN = 60_000_000


def _m(spark, rows):
    """rows: (conv, turn_idx, ts_us)."""
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts_us long"
    ).withColumn("token_count", F.lit(1))


def test_incident_hours_threshold(spark):
    # hour 0: 10 turns, hours 1..4: 1 turn each -> mean 2.8; only hour 0 hot
    rows = [("a", i, i * MIN) for i in range(10)]
    rows += [(f"s{h}", 0, h * HOUR) for h in range(1, 5)]
    inc = incident_hours(_m(spark, rows)).collect()
    assert len(inc) == 1
    assert inc[0]["hour_us"] == 0 and inc[0]["n_turns_hour"] == 10


def test_interval_overlap_counts_covered_hot_hours(spark):
    # conv "a" makes hours 0 and 1 hot (12 turns each); background hours
    # 2..9 get 1 turn. conv "b" has one 25-min-gap segment spanning hours
    # 0-2: it overlaps both hot hours but not quiet hour 2. conv "c"
    # sits in quiet hour 5: no overlap.
    rows = [("a", i, (i % 2) * HOUR + (i // 2) * MIN) for i in range(24)]
    rows += [(f"s{h}", 0, h * HOUR) for h in range(2, 10)]
    rows += [("b", i, (50 + 25 * i) * MIN) for i in range(4)]  # 50..125min
    rows += [("c", 0, 5 * HOUR), ("c", 1, 5 * HOUR + MIN)]
    out = {
        (r["conv_id"], r["segment_id"]): r
        for r in interval_overlap(_m(spark, rows)).collect()
    }
    # hot hours: hour 0 (12a+1b=13 turns) and hour 1 (12a+2b=14) vs
    # mean 3.8 over 10 observed hours
    assert ("c", 0) not in out
    b = out[("b", 0)]
    assert b["n_inc_hours"] == 2
    assert b["inc_turns"] == 13 + 14
    a = out[("a", 0)]  # first "a" segment lives entirely in hot hour 0
    assert a["n_inc_hours"] == 1 and a["inc_turns"] == 13


def _lat(spark, rows):
    """rows: (role, latency_us)."""
    return spark.createDataFrame(rows, "role string, latency_us long")


def test_histogram_bucket_edges(spark):
    rows = [
        ("u", 0),            # sub-second -> bucket -1
        ("u", 999_999),      # still 0s -> bucket -1
        ("u", 1_000_000),    # 1s -> bucket 0 [1,1]
        ("u", 2_000_000),    # 2s -> bucket 1 [2,3]
        ("u", 3_999_999),    # 3s -> bucket 1
        ("u", 4_000_000),    # 4s -> bucket 2 [4,7]
        ("a", 1024_000_000),  # 1024s -> bucket 10 [1024,2047]
    ]
    out = {(r["role"], r["bucket"]): r for r in latency_histogram(_lat(spark, rows)).collect()}
    assert out[("u", -1)]["n"] == 2 and out[("u", -1)]["lo_s"] == 0 and out[("u", -1)]["hi_s"] == 0
    assert out[("u", 0)]["n"] == 1 and out[("u", 0)]["lo_s"] == 1 and out[("u", 0)]["hi_s"] == 1
    b1 = out[("u", 1)]
    assert b1["n"] == 2 and b1["lo_s"] == 2 and b1["hi_s"] == 3
    assert b1["min_lat_s"] == 2 and b1["max_lat_s"] == 3 and b1["sum_lat_s"] == 5
    assert out[("u", 2)]["lo_s"] == 4 and out[("u", 2)]["hi_s"] == 7
    a10 = out[("a", 10)]
    assert a10["lo_s"] == 1024 and a10["hi_s"] == 2047


def test_histogram_drops_null_and_negative(spark):
    rows = [("u", None), ("u", -5), ("u", 1_000_000)]
    out = latency_histogram(_lat(spark, rows)).collect()
    assert len(out) == 1 and out[0]["n"] == 1
