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


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    with open(G) as f:
        g = json.load(f)
    with open(FB) as f:
        fb = json.load(f)
    for i in range(rounds):
        g["rounds_n"].append(sb.run_executors(1, 4))
        _save(G, g)
        g["rounds_4n"].append(sb.run_executors(4, 4))
        _save(G, g)
        fb["rounds_n"].append(sb.run_executors(2, 4))
        _save(FB, fb)
        fb["rounds_4n"].append(sb.run_executors(8, 4))
        _save(FB, fb)
        print(f"extra round {i} appended", flush=True)


if __name__ == "__main__":
    main()
