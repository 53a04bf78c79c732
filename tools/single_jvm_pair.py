"""Measure the §2 transparency variant: one shared JVM at local[8] vs
local[32] over the SAME fixture, back-to-back in one session.

This is the parallelism-levels evidence shape the sandbox brief names
explicitly ("local[8] and local[32] ... on the same input"); the
multi-executor emulation (tools/gate_paired.py, BASELINE.md §1) remains
the cluster analogue because a shared JVM couples GC/Arrow/page cache
across all tasks. Records steal over the whole session and writes
BENCH/phases/single_jvm.json for tools/build_baseline.py to render.

Usage: SCALE_FIXTURE=t_scale16 python tools/single_jvm_pair.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import scaling_bench as sb


def main() -> None:
    sb.ensure_fixture()
    s0 = sb._stat_snapshot()
    r8 = sb.run_single_jvm(8)
    r32 = sb.run_single_jvm(32)
    s1 = sb._stat_snapshot()
    d = [b - a for a, b in zip(s0, s1)]
    steal_pct = round(100.0 * d[7] / max(sum(d), 1), 2)
    out = {
        "fixture": sb.FIXTURE,
        "steal_pct": steal_pct,
        "8": r8,
        "32": r32,
        "efficiency_8_to_32": round(r8["wall_s"] / (4 * r32["wall_s"]), 3),
    }
    ph = os.path.join(sb.REPO, "BENCH", "phases")
    os.makedirs(ph, exist_ok=True)
    with open(os.path.join(ph, "single_jvm.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("SINGLE_JVM_RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
