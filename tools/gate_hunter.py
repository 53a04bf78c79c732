"""Append gate rounds only in demonstrably quiet host windows.

The VM shares a physical host whose contention comes and goes in bursts;
best-of-N scoring needs at least one round per cluster size to land in a
clean window. Rather than burning rounds blind (extra_rounds.py), this
loop probes host conditions first and only launches a measurement when
the box looks quiet:

  probe = 20 s /proc/stat steal < max_steal  AND  a 4-proc ALU
  calibration within tol of the session's best (frequency/oversubscription
  check — steal alone misses slow-but-not-stolen vCPU windows).

Modes, rounds and thresholds via argv/env:
  python tools/gate_hunter.py [max_minutes] [mode ...]
  (default: 120 minutes, modes gate_4n gate_n — 4N first, it is the
  scarce measurement; every K-th quiet window runs an N round too.)

Each accepted round appends to BENCH/phases/*.json exactly like
extra_rounds.py; rejected probes just sleep. Ctrl-C-safe: the phase file
is written by scaling_bench.run_executors only on completion.
"""

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import scaling_bench as sb

PH = os.path.join(sb.REPO, "BENCH", "phases")
CONFIGS = {
    # mode -> (phase file, key, n_executors, cores/executor, heap). Heaps
    # and cores are constant within each N-vs-4N pair (a node spec); the
    # fullbox pair runs 12g so 8 pre-touched executors fit the box.
    # gate2_* is the 2-core-executor variant: its 4N busies only 8 cores,
    # inside the host's measured linear ALU/membw envelope, so the
    # emulation artifact (shared DRAM at 16+ busy cores) stays out of the
    # measurement — see BENCH/BASELINE.md §0.
    "gate_n": (os.path.join(PH, "gate_1_to_4.json"), "rounds_n", 1, 4, "16g"),
    "gate_4n": (os.path.join(PH, "gate_1_to_4.json"), "rounds_4n", 4, 4, "16g"),
    "gate2_n": (os.path.join(PH, "gate2_1_to_4.json"), "rounds_n", 1, 2, "12g"),
    "gate2_4n": (os.path.join(PH, "gate2_1_to_4.json"), "rounds_4n", 4, 2, "12g"),
    "fb_n": (os.path.join(PH, "fullbox_2_to_8.json"), "rounds_n", 2, 4, "12g"),
    "fb_4n": (os.path.join(PH, "fullbox_2_to_8.json"), "rounds_4n", 8, 4, "12g"),
}
MAX_STEAL = float(os.environ.get("HUNT_MAX_STEAL", "0.005"))
ALU_TOL = float(os.environ.get("HUNT_ALU_TOL", "0.90"))
PROBE_S = 20
SLEEP_S = 90


def steal_frac(window_s: float) -> float:
    def snap():
        with open("/proc/stat") as f:
            v = list(map(int, f.readline().split()[1:]))
        return sum(v), v[7]
    t0, s0 = snap()
    time.sleep(window_s)
    t1, s1 = snap()
    return (s1 - s0) / max(t1 - t0, 1)


def alu_4p() -> float:
    with mp.Pool(4) as pool:
        pool.map(sb._alu_probe, range(4))  # warm
        return sum(pool.map(sb._alu_probe, range(4))) / 1e6


def append_round(mode: str) -> dict:
    path, key, p, cores, mem = CONFIGS[mode]
    r = sb.run_executors(p, cores, mem=mem)
    if not os.path.exists(path):
        with open(path, "w") as f:
            json.dump({"rounds_n": [], "rounds_4n": []}, f)
    with open(path) as f:
        d = json.load(f)
    d[key].append(r)
    tmp = f"{path}.tmp"
    with open(tmp, "w") as f:
        json.dump(d, f)
    os.replace(tmp, path)
    return r


def main():
    sb.ensure_fixture()
    max_min = float(sys.argv[1]) if len(sys.argv) > 1 else 120.0
    modes = sys.argv[2:] or ["gate_4n", "gate_n"]
    # session-best ALU rate seeds the quality bar; refreshed upward
    best_alu = alu_4p()
    print(f"hunter: ALU 4p baseline {best_alu:.1f} Mops, "
          f"steal gate {MAX_STEAL:.1%}", flush=True)
    deadline = time.time() + 60 * max_min
    n_done = 0
    while time.time() < deadline:
        st = steal_frac(PROBE_S)
        alu = alu_4p()
        best_alu = max(best_alu, alu)
        quiet = st < MAX_STEAL and alu >= ALU_TOL * best_alu
        print(f"probe steal={st:.2%} alu={alu:.1f}/{best_alu:.1f} "
              f"-> {'RUN' if quiet else 'wait'}", flush=True)
        if not quiet:
            time.sleep(SLEEP_S)
            continue
        mode = modes[n_done % len(modes)]
        r = append_round(mode)
        n_done += 1
        print(f"APPENDED {mode}: wall={r['wall_s']}s "
              f"steal={r['host_steal_frac']:.2%} stages={r['stages']}",
              flush=True)
    print(f"hunter done: {n_done} rounds appended", flush=True)


if __name__ == "__main__":
    main()
