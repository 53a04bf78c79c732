"""Append extra interleaved rounds to the cached scaling phases.

The best-of-N methodology (BENCH/BASELINE.md) scores each cluster size by
its least-contended observation; on a noisy shared host, more interleaved
rounds tighten that floor. This appends one (1,4,2,8)-executor round per
invocation to BENCH/phases/*.json; re-running
`SCALE_USE_CACHE=1 python tools/scaling_bench.py` then reassembles the
report from the enlarged evidence set.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import scaling_bench as sb

PH = os.path.join(sb.REPO, "BENCH", "phases")
G = os.path.join(PH, "gate_1_to_4.json")
FB = os.path.join(PH, "fullbox_2_to_8.json")


def _save(path, obj):
    with open(path, "w") as f:
        json.dump(obj, f)


CONFIGS = {
    # mode -> (phase file, key, n_executors, per-executor heap); heap is
    # constant within each N-vs-4N pair (fullbox pair 12g: 8 pre-touched
    # 16g heaps would exceed the box's 125G)
    "gate_n": (G, "rounds_n", 1, "16g"),
    "gate_4n": (G, "rounds_4n", 4, "16g"),
    "fb_n": (FB, "rounds_n", 2, "12g"),
    "fb_4n": (FB, "rounds_4n", 8, "12g"),
}


def main():
    sb.ensure_fixture()  # rebuild the parquet fixture if /tmp was cleaned
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    modes = sys.argv[2:] or ["gate_n", "gate_4n", "fb_n", "fb_4n"]
    for i in range(rounds):
        for mode in modes:
            path, key, p, mem = CONFIGS[mode]
            with open(path) as f:
                d = json.load(f)
            d[key].append(sb.run_executors(p, 4, mem=mem))
            _save(path, d)
            print(f"round {i}: {mode} appended", flush=True)


if __name__ == "__main__":
    main()
