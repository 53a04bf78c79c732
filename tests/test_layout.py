"""Z-order key correctness + layout-audit clustering contrast.

Engine-vs-oracle parity at sf0.01 is covered by the driver harness
(`layout_audit`).
"""

from pyspark.sql import functions as F

from sac2mseed_spark.functions.zorder import HOUR_US, interleave
from sac2mseed_spark.operators.layout import layout_audit


def _morton(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_interleave_matches_reference_bit_math(spark):
    cases = [(0, 0), (1, 0), (0, 1), (65535, 0), (0, 65535),
             (65535, 65535), (12345, 54321), (43210, 1)]
    df = spark.createDataFrame(cases, "x long, y long").select(
        "x", "y", interleave(F.col("x"), F.col("y")).alias("z")
    )
    for r in df.collect():
        assert r["z"] == _morton(r["x"], r["y"]), (r["x"], r["y"])


def test_layout_audit_clusters_convs(spark):
    # 8 conversations x 64 hourly turns: a time layout slices every
    # conversation across every file; the z layout must beat it on
    # mean distinct-convs-per-file.
    rows = [
        (f"conv_{c}", h, h * HOUR_US)
        for c in range(8)
        for h in range(64)
    ]
    t = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts_us long")
    audit = layout_audit(t, n_files=8).collect()
    by_layout = {}
    for r in audit:
        by_layout.setdefault(r["layout"], []).append(r)
    assert len(by_layout["zorder"]) == 8 and len(by_layout["time"]) == 8
    for r in audit:  # equal-row files
        assert r["n_rows"] == 64
    mean_convs = {
        k: sum(r["n_convs"] for r in v) / len(v)
        for k, v in by_layout.items()
    }
    # every time-file sees all 8 convs (8 convs in every hour slice)
    assert mean_convs["time"] == 8.0
    assert mean_convs["zorder"] < mean_convs["time"]
    # z rectangles are tight: span bounded by the data's key range
    assert all(r["z_span"] >= 0 for r in audit)


def test_layout_audit_rejects_bad_n_files(spark):
    t = spark.createDataFrame(
        [("a", 0, 0)], "conv_id string, turn_idx int, ts_us long"
    )
    try:
        layout_audit(t, n_files=0)
        assert False, "expected ValueError"
    except ValueError:
        pass
