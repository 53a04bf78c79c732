"""Benchmark harness — prints ONE JSON line.

Headline: rolled-up points/sec across the 1m/1h/1d tier cascade + packed
payloads on a deterministic synthetic transcripts table (~1.7M turns,
FIXTURES['t_bench']), plus per-operator timings over the driver's sf tables
($SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.1).

Every query is forced with a noop-sink write (full computation, zero
driver-side collection cost) — the number measures the engine, not py4j.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from sac2mseed_spark.functions.metrics import (  # noqa: E402
    derive_turn_metrics,
    slim_metrics,
)
from sac2mseed_spark.operators.pack import (  # noqa: E402
    pack_tier,
    repack_tier,
    unpack_tier,
)
from sac2mseed_spark.operators.rollup import rollup_cascade  # noqa: E402
from sac2mseed_spark.session import get_spark  # noqa: E402
from sac2mseed_spark.sources.transcripts import generate_transcripts  # noqa: E402


def force(df):
    df.write.format("noop").mode("overwrite").save()


def timed(fn):
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    queries: dict[str, float] = {}

    # warm the Python worker pool (one tiny Arrow UDF round-trip) so the
    # timings below measure the engine, not 32 interpreter cold-starts
    warm = spark.range(64).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    )
    force(warm)

    # ---- headline: synthetic cascade + pack (rolled-up points/sec) ----
    t = generate_transcripts(spark, "t_bench", seed=42)
    m = slim_metrics(derive_turn_metrics(t)).persist()
    n_turns = m.count()  # materializes the persist; excluded from timing of tiers

    def run_cascade():
        tiers = rollup_cascade(m)
        t1m = tiers["1m"].persist()
        force(t1m)
        force(tiers["1h"])  # re-aggregates the persisted 1m
        force(tiers["1d"])
        run_cascade.t1m = t1m

    queries["synth_cascade"] = timed(run_cascade)
    tiers = rollup_cascade(m)
    rolled_points = (
        tiers["1m"].count() + tiers["1h"].count() + tiers["1d"].count()
    )
    queries["synth_pack_1m"] = timed(
        lambda: force(pack_tier(m, "1m", clustered_by_conv=True))
    )
    packed_1m = pack_tier(m, "1m", clustered_by_conv=True).persist()
    packed_1m.count()  # materialize so the unpack timing is decode-only
    queries["synth_unpack_1m"] = timed(lambda: force(unpack_tier(packed_1m)))
    queries["synth_repack_1h"] = timed(lambda: force(repack_tier(packed_1m, "1h")))
    packed_1m.unpersist()
    # compression measured at 1h (1m windows on this fixture hold ~4 points,
    # so fixed headers dominate there — same physics as short miniSEED
    # records); raw point = 8B ts + 8B per value stream (2 streams)
    comp = {
        tier: pack_tier(m, tier)
        .agg(F.sum(F.length("payload")).alias("b"), F.sum("n_points").alias("p"))
        .collect()[0]
        for tier in ("1m", "1h")
    }
    bytes_per_point = {t: round(c["b"] / c["p"], 2) for t, c in comp.items()}
    compression_ratio = {t: round(24.0 * c["p"] / c["b"], 2) for t, c in comp.items()}
    m.unpersist()

    pps = rolled_points / queries["synth_cascade"]

    # ---- driver-table operator suite at sf_dir ----
    qs = E.queries()
    for name in [
        "rollup_1m",
        "rollup_1d",
        "pack_stats_1m",
        "segments",
        "gapfill_linear_1h",
        "gap_report",
        "dedup_exact",
        "text_quality",
        "doc_fingerprint",
        "dedup_minhash_lsh",
        "simhash_pairs",
        "knn_bruteforce",
        "knn_lsh",
        "multimodal_features",
    ]:
        queries[name] = timed(lambda n=name: force(qs[n](spark, sf_dir)))

    total = round(sum(queries.values()), 3)
    out = {
        "metric": "rolled-up points/sec across 1m/1h/1d tiers (synthetic transcripts, ~1.7M turns) + operator suite wall time",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        "cpus": int(cpus),
        "n_turns": n_turns,
        "rolled_points": rolled_points,
        "points_per_sec": round(pps, 1),
        "pack_bytes_per_point": bytes_per_point,
        "pack_compression_ratio": compression_ratio,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
