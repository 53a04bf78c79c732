"""Decompose the gate job's dominant stage (metrics) into its physical
costs, on one emulated executor's workload (conv_slice of the t_scale8
fixture at local[4], 12g — exactly the 4N per-executor shape).

Phases (cumulative plans, so successive deltas isolate each cost):
  scan       read fixture slice, noop-write the raw projection the
             metrics stage consumes (conv_id, turn_idx, ts, text)
  stateless  + ts_us / token_count / text_len + slim projection
             (drops text BEFORE any exchange) — delta vs scan =
             tokenize+arith cost
  window     + lag(ts_us) over (conv_id order turn_idx, ts) — delta vs
             stateless = the hash exchange + sort + lag (the only
             shuffle in the whole gate job)

Usage: taskset -c 0-3 python tools/profile_metrics.py [p P] [iters]
Prints one JSON line per iteration; iteration 0 warms codegen/workers.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scaling_bench import FIXTURE_DIR  # noqa: E402


def main():
    p, np_ = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (0, 4)
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "12g")
    os.environ.setdefault("SPARK_GRAFT_PROC_COUNT", "4")
    from sac2mseed_spark.functions.metrics import (
        derive_turn_metrics,
        slim_metrics,
        token_count_col,
        ts_us_col,
    )
    from sac2mseed_spark.session import get_spark
    from sac2mseed_spark.sources.transcripts import read_transcripts_table

    from pyspark.sql import functions as F

    spark = get_spark("profile_metrics", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    def t_read():
        return read_transcripts_table(spark, FIXTURE_DIR, conv_slice=(p, np_))

    def phase_scan():
        force(t_read().select("conv_id", "turn_idx", "ts", "text"))

    def phase_stateless():
        df = (
            t_read()
            .withColumn("ts_us", ts_us_col("ts"))
            .withColumn("token_count", token_count_col().cast("long"))
            .withColumn("text_len", F.length("text").cast("long"))
        )
        force(slim_metrics(df.withColumn("latency_us", F.lit(0).cast("long"))))

    def phase_window():
        force(slim_metrics(derive_turn_metrics(t_read())))

    phases = [
        ("scan", phase_scan),
        ("stateless", phase_stateless),
        ("window", phase_window),
    ]
    for i in range(iters):
        out = {"iter": i, "slice": f"{p}/{np_}"}
        for name, fn in phases:
            t0 = time.perf_counter()
            fn()
            out[name] = round(time.perf_counter() - t0, 2)
        print("PROFILE_METRICS " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
