"""Per-query isolation bench + plan capture (guide §1.4/§7.2).

NOT the driver-timed bench (bench.py is frozen); this is the round-6
measurement harness: time individual declared queries with the noop sink,
best-of-N, and optionally dump .explain("formatted") to plans/<tag>/.

Usage:
  python bench_extra.py [--sf DIR] [--rounds N] [--plans plans/r06 --suffix before] q1 q2 ...
  python bench_extra.py --all            # every query in SUITE order
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E  # noqa: E402
from sac2mseed_spark.session import get_spark  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--plans", default=None, help="directory to write explain output")
    ap.add_argument("--suffix", default="", help="plan filename suffix (before/after)")
    ap.add_argument("--all", action="store_true")
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("bench_extra", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    # warm python worker pool once
    spark.range(64).mapInPandas(lambda it: (p for p in it), schema="id long").write.format(
        "noop"
    ).mode("overwrite").save()

    qs = E.queries()
    names = list(qs) if args.all else args.queries
    out = {}
    for name in names:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = qs[name](spark, args.sf)
            suffix = f"_{args.suffix}" if args.suffix else ""
            with open(os.path.join(args.plans, f"{name}{suffix}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        best = None
        samples = []
        for _ in range(args.rounds):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            samples.append(dt)
            best = dt if best is None or dt < best else best
        out[name] = best
        print(f"{name}: best={best} samples={samples}", flush=True)
    print(json.dumps({"sf": args.sf, "best": out}))


if __name__ == "__main__":
    main()
