"""Why does the in-leg ALU sidecar collapse during 4N legs? (round 5)

Observed: during every gate2_4n leg (4 executor JVMs pinned to cores 0-7,
8 busy cores, box 72% idle, steal 0.00%, sys ~1%), the pure-ALU sidecar
pinned to core 31 drops from ~9 Mops to 0.9-1.6 Mops (0.10-0.18x) — yet
the leg walls replicate within 0.5% across windows (247.0s vs 248.3s),
which a 7-10x exogenous host degradation could not produce. Hypothesis:
the dip is ENDOGENOUS — caused by the leg's own memory traffic through
the shared L3/DRAM subsystem slowing the (not-quite-cache-free) CPython
interpreter loop on an otherwise-idle core — so gating leg validity on
"sidecar must stay near session best" can never pass a 4N leg.

This experiment separates the candidate mechanisms WITHOUT Spark:

  phase idle    — sidecar alone on core 31 (baseline)
  phase alu8    — + 8 pure-ALU python loops pinned to cores 0-7
                  (pure compute load, ~zero memory traffic)
  phase triad8  — + 8 STREAM-triad numpy loops pinned to cores 0-7
                  (the leg's memory footprint without any JVM)
  phase triad16 — + 16 triad loops pinned 0-15 (the 4-core-spec footprint)

If alu8 leaves the sidecar at baseline but triad8 reproduces the dip, the
mechanism is shared-memory-subsystem contention: endogenous, deterministic,
and NOT evidence of a lost window. The gate protocol then must not use
the raw sidecar level as a validity criterion for legs that load DRAM;
see gate_paired.py for the criterion this experiment calibrates.

Appends BENCH/phases/sidecar_mechanism.json.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SIDECAR_SRC = r"""
import time
x = 1
while True:
    t0 = time.perf_counter(); n = 0
    while time.perf_counter() - t0 < 0.5:
        for _ in range(100000):
            x = (x * 1664525 + 1013904223) & 0xFFFFFFFF
        n += 100000
    print(f"{time.time():.1f} {n / (time.perf_counter() - t0) / 1e6:.2f}",
          flush=True)
"""

ALU_SRC = r"""
x = 7
while True:
    x = (x * 1103515245 + 12345) & 0x7FFFFFFF
"""

TRIAD_SRC = r"""
import numpy as np
n = 8 * 1024 * 1024
b = np.full(n, 1.5); c = np.full(n, 2.0); a = np.zeros(n)
np.add(b, c, out=a)
while True:
    np.multiply(c, 0.5, out=a)
    np.add(a, b, out=a)
"""


def _spawn(src: str, core: int, stdout=subprocess.DEVNULL):
    return subprocess.Popen(
        ["taskset", "-c", str(core), sys.executable, "-c", src],
        stdout=stdout, stderr=subprocess.DEVNULL,
    )


def _kill(procs):
    for p in procs:
        p.terminate()
    for p in procs:
        try:
            p.wait(timeout=5)
        except subprocess.TimeoutExpired:
            p.kill()


def _read_samples(path):
    out = []
    with open(path) as f:
        for line in f:
            try:
                t, v = line.split()
                out.append((float(t), float(v)))
            except ValueError:
                continue
    return out


def main():
    dur = float(sys.argv[1]) if len(sys.argv) > 1 else 30.0
    log = "/tmp/sidecar_mech.log"
    f = open(log, "w")
    sidecar = _spawn(SIDECAR_SRC, 31, stdout=f)
    phases = []  # (name, t0, t1)

    def phase(name, workers_src, n_workers):
        procs = [_spawn(workers_src, core) for core in range(n_workers)]
        time.sleep(5)  # settle
        t0 = time.time()
        time.sleep(dur)
        t1 = time.time()
        _kill(procs)
        phases.append((name, t0, t1))
        print(f"phase {name}: done", flush=True)
        time.sleep(3)

    # baseline
    time.sleep(5)
    t0 = time.time()
    time.sleep(dur)
    phases.append(("idle", t0, time.time()))
    print("phase idle: done", flush=True)

    phase("alu8", ALU_SRC, 8)
    phase("triad8", TRIAD_SRC, 8)
    phase("triad16", TRIAD_SRC, 16)

    # trailing baseline (recovery check)
    t0 = time.time()
    time.sleep(dur)
    phases.append(("idle_post", t0, time.time()))

    _kill([sidecar])
    f.close()
    samples = _read_samples(log)

    result = {"t_wall": time.strftime("%m%d_%H%M"), "dur_s": dur, "phases": {}}
    for name, t0, t1 in phases:
        vals = [v for t, v in samples if t0 + 2 <= t <= t1]
        if vals:
            result["phases"][name] = {
                "sidecar_mean_Mops": round(sum(vals) / len(vals), 2),
                "sidecar_min_Mops": round(min(vals), 2),
                "n": len(vals),
            }
    base = result["phases"].get("idle", {}).get("sidecar_mean_Mops")
    if base:
        for name, d in result["phases"].items():
            d["vs_idle"] = round(d["sidecar_mean_Mops"] / base, 3)

    path = os.path.join(REPO, "BENCH", "phases", "sidecar_mechanism.json")
    hist = []
    if os.path.exists(path):
        with open(path) as fh:
            prev = json.load(fh)
            hist = prev if isinstance(prev, list) else [prev]
    hist.append(result)
    with open(path, "w") as fh:
        json.dump(hist, fh, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
