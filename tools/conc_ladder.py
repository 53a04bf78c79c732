"""Concurrency ladder: fixed per-JVM work, varying neighbor count.

The fb pair (BENCH/phases/fullbox_2_to_8.json, p0818_1124) shows each
4-core/12g executor processing a 1/8 slice of t_scale16 in ~360-400 s
when EIGHT of them run concurrently — while two executors processing 4x
the data each take only ~286 s (fb_n). Engine-independent probes do not
explain it: the production pack kernel inflates only x1.39 per-core at
32 pinned workers (pack_kernel_conc.json) and sustained 32p ALU holds
flat for 120 s (sustained_alu.json, decay 0.99).

This ladder launches K in {1,2,4,8} concurrent executor JVMs, each with
IDENTICAL work (one 1/8 conv-slice, local[4], 12g, pinned to its own
disjoint 4-core set — the exact fb_4n per-executor spec), and records the
wall vs K. Fixed per-JVM work means an ideal host and engine give a FLAT
curve; the knee locates where interference starts, and its magnitude
says how much of the fb_4n 5.5x per-executor slowdown is concurrency-
induced vs inherent to the slice.

Usage: python tools/conc_ladder.py [K ...]   (default 1 2 4 8)
Appends BENCH/phases/conc_ladder.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import scaling_bench as sb

N_SLICES = 8
CORES = 4
MEM = "12g"


def run_level(k: int) -> dict:
    import tempfile

    barrier = tempfile.mkdtemp(prefix="conc_ladder_")
    os.environ["SCALING_BARRIER_DIR"] = barrier
    t0 = time.perf_counter()
    procs = [
        sb._spawn(
            ["exec", str(p), str(N_SLICES), str(CORES)],
            cpus=f"{p * CORES}-{(p + 1) * CORES - 1}",
            env_extra={
                "SPARK_GRAFT_DRIVER_MEM": MEM,
                "SCALING_BARRIER_DIR": barrier,
            },
        )
        for p in range(k)
    ]
    while sum(
        os.path.exists(os.path.join(barrier, f"warm_{p}")) for p in range(k)
    ) < k:
        time.sleep(0.5)
        if any(pr.poll() is not None for pr in procs):
            break
    open(os.path.join(barrier, "GO"), "w").close()
    stat0 = sb._stat_snapshot()
    results = []
    for pr in procs:
        out, _ = pr.communicate(timeout=3600)
        for line in out.splitlines():
            if line.startswith("EXEC_RESULT "):
                results.append(json.loads(line[len("EXEC_RESULT "):]))
    stat1 = sb._stat_snapshot()
    ticks = max(stat1[0] - stat0[0], 1)
    if len(results) != k:
        raise RuntimeError(f"only {len(results)}/{k} executors reported")
    return {
        "k": k,
        "launch_wall_s": round(time.perf_counter() - t0, 1),
        "wall_s": max(r["wall_s"] for r in results),
        "walls": sorted(round(r["wall_s"], 1) for r in results),
        "stages_slowest": max(results, key=lambda r: r["wall_s"])["stages"],
        "host_steal_frac": round((stat1[1] - stat0[1]) / ticks, 4),
        "host_sys_frac": round((stat1[2] - stat0[2]) / ticks, 4),
    }


def _prewarm() -> None:
    """Same symmetric page-cache prewarm as gate_paired: every level
    starts cache-hot, so the curve measures concurrency, not IO order."""
    t0 = time.perf_counter()
    total = 0
    for root, _, files in os.walk(sb.FIXTURE_DIR):
        for fn in files:
            with open(os.path.join(root, fn), "rb") as f:
                while True:
                    b = f.read(1 << 22)
                    if not b:
                        break
                    total += len(b)
    print(
        f"prewarm: {total/2**30:.2f} GiB in {time.perf_counter()-t0:.1f}s",
        flush=True,
    )


def main():
    sb.ensure_fixture()
    levels = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    out = []
    for k in levels:
        _prewarm()
        r = run_level(k)
        out.append(r)
        print(
            f"K={k}: wall={r['wall_s']}s walls={r['walls']} "
            f"stages={r['stages_slowest']} sys={r['host_sys_frac']:.2%}",
            flush=True,
        )
        time.sleep(10)
    path = os.path.join(sb.REPO, "BENCH", "phases", "conc_ladder.json")
    hist = []
    if os.path.exists(path):
        with open(path) as f:
            hist = json.load(f)
    hist.append(
        {
            "ts": round(time.time(), 1),
            "fixture": sb.FIXTURE,
            "mem": MEM,
            "levels": out,
        }
    )
    with open(path, "w") as f:
        json.dump(hist, f, indent=1)
    print(f"appended -> {path}")


if __name__ == "__main__":
    main()
