"""Precompute the per-slice counts sidecar (_COUNTS.json) off-window.

exec_worker computes a slice's deterministic (n_turns, rolled_points)
once EVER and caches them; without this prep the first gate leg on a new
fixture pays a full with-counts pipeline pass INSIDE the held quiet
window. Run this any time (no window needed): one local[32] session
computes every (p, n_exec) pair the gate families use.

Usage: SCALE_FIXTURE=t_scale16 python tools/prep_counts.py [n_exec ...]
       (default slice configs: 1 2 4 8)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import scaling_bench as sb  # noqa: E402


def main():
    sb.ensure_fixture()
    configs = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    from sac2mseed_spark.session import get_spark

    spark = get_spark("prep_counts", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    for n_exec in configs:
        for p in range(n_exec):
            if sb._cached_counts(p, n_exec) is not None:
                print(f"cached  {p}/{n_exec}", flush=True)
                continue
            n_turns, rolled, _, _ = sb._pipeline_once(
                spark, conv_slice=(p, n_exec)
            )
            sb._store_counts(p, n_exec, n_turns, rolled)
            print(f"stored  {p}/{n_exec}: {n_turns} turns, {rolled} rolled",
                  flush=True)


if __name__ == "__main__":
    main()
