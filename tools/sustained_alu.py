"""Sustained vs burst all-core ALU: does the host throttle under load?

The fb_4n collapse (BENCH/phases/fullbox_2_to_8.json, pair p0818_1124:
per-executor throughput 5.5x below fb_n with 75% user / 4% sys inside the
timed window) is not reproduced by the engine-independent pack kernel
(pack_kernel_conc.json: x1.39 per-core inflation at 32 pinned workers) nor
by the window-open ALU calibration (eff_4_to_32 0.88-0.92). But the ALU
calibration is a ~1 s burst; a power/thermal cap or host-side scheduler
throttle would only bind under SUSTAINED all-core load — exactly what a
400 s leg is and a probe is not.

This runs P pinned ALU workers for DURATION seconds, each reporting ops/s
per 2 s tick, and prints the per-decile aggregate so decay over time is
visible. Run at 8 and 32 workers back-to-back:

  python tools/sustained_alu.py 8 32

If 32p throughput decays toward ~0.2x of its first ticks, the host caps
sustained all-core compute and the fb pair measures that cap, not the
engine. If it holds flat, the collapse is specific to the 8-JVM leg and
the hunt moves to cross-JVM interference (TLB/IPI, page cache, GC).

Appends BENCH/phases/sustained_alu.json.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DURATION = float(os.environ.get("SUSTAINED_ALU_S", "120"))

WORKER_SRC = r"""
import sys, time
dur = float(sys.argv[1])
x = 7
t_end = time.perf_counter() + dur
while time.perf_counter() < t_end:
    t0 = time.perf_counter(); n = 0
    while time.perf_counter() - t0 < 2.0:
        for _ in range(100000):
            x = (x * 1664525 + 1013904223) & 0xFFFFFFFF
        n += 100000
    print(f"{time.time():.2f} {n / (time.perf_counter() - t0) / 1e6:.3f}",
          flush=True)
"""


def run_level(p: int) -> dict:
    procs = []
    outs = []
    for i in range(p):
        f = open(f"/tmp/sustained_alu_{i}.log", "w")
        outs.append(f)
        procs.append(
            subprocess.Popen(
                ["taskset", "-c", str(i), sys.executable, "-c", WORKER_SRC,
                 str(DURATION)],
                stdout=f,
                stderr=subprocess.DEVNULL,
            )
        )
    for pr in procs:
        pr.wait()
    for f in outs:
        f.close()
    # aggregate ticks into deciles of the run
    samples = []  # (t, mops)
    for i in range(p):
        with open(f"/tmp/sustained_alu_{i}.log") as f:
            for line in f:
                try:
                    t, v = line.split()
                    samples.append((float(t), float(v)))
                except ValueError:
                    continue
    t0 = min(t for t, _ in samples)
    t1 = max(t for t, _ in samples)
    span = max(t1 - t0, 1e-9)
    deciles = [[] for _ in range(10)]
    for t, v in samples:
        d = min(int((t - t0) / span * 10), 9)
        deciles[d].append(v)
    per_decile = [
        round(sum(d) / len(d) * p, 1) if d else None for d in deciles
    ]  # aggregate Mops across workers
    first = next(x for x in per_decile if x)
    last = next(x for x in reversed(per_decile) if x)
    return {
        "procs": p,
        "duration_s": DURATION,
        "aggregate_Mops_per_decile": per_decile,
        "first_decile": first,
        "last_decile": last,
        "decay": round(last / first, 3),
    }


def main():
    levels = [int(a) for a in sys.argv[1:]] or [8, 32]
    out = []
    for p in levels:
        r = run_level(p)
        out.append(r)
        print(
            f"{p:3d} procs: deciles={r['aggregate_Mops_per_decile']} "
            f"decay={r['decay']}",
            flush=True,
        )
        time.sleep(5)
    path = os.path.join(REPO, "BENCH", "phases", "sustained_alu.json")
    hist = []
    if os.path.exists(path):
        with open(path) as f:
            hist = json.load(f)
    hist.append({"ts": round(time.time(), 1), "levels": out})
    with open(path, "w") as f:
        json.dump(hist, f, indent=1)
    print(f"appended -> {path}")


if __name__ == "__main__":
    main()
