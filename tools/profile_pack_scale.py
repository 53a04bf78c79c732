"""Pack-stage-only N vs 4N scaling experiment.

Round-4 paired gate evidence: the pack stage is the gate's worst scaler
(N=99s -> 4N=121s in pair p0817_2141 — SLOWER on 4x the cores) and
bimodal across 4N runs (44-146s). This tool isolates it: each emulated
executor materializes its slice's metrics into cache first (untimed),
then all executors pack in lockstep (barrier), with SPARK_GRAFT_PACK_PROF
splitting per-worker numpy-kernel seconds from the Arrow-socket/schedule
time around it, and a host /proc/stat sampler attributing sys/steal to
the timed region.

Interpretation grid:
  kernel_s scales, wall doesn't   -> socket/scheduling/GC contention
  kernel_s itself inflates at 4N  -> DRAM bandwidth (see membw cal)
  one straggler executor          -> skew/layout, not contention

Usage: python tools/profile_pack_scale.py [P ...]   (default: 1 4)
       child mode: profile_pack_scale.py child p P
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from scaling_bench import FIXTURE_DIR, _stat_snapshot  # noqa: E402


def child(p: int, np_: int) -> None:
    os.environ["SPARK_GRAFT_DRIVER_MEM"] = os.environ.get("PACK_MEM", "12g")
    os.environ["SPARK_GRAFT_PROC_COUNT"] = "4"
    os.environ["SPARK_GRAFT_PACK_PROF"] = "1"
    from sac2mseed_spark.functions.metrics import derive_turn_metrics, slim_metrics
    from sac2mseed_spark.operators.pack import pack_tier
    from sac2mseed_spark.session import get_spark
    from sac2mseed_spark.sources.transcripts import read_transcripts_table

    local_dir = f"/dev/shm/sac2mseed_packprof_p{p}"
    os.makedirs(local_dir, exist_ok=True)
    spark = get_spark(
        f"packprof_{p}_{np_}",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.local.dir": local_dir},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    m = slim_metrics(
        derive_turn_metrics(
            read_transcripts_table(spark, FIXTURE_DIR, conv_slice=(p, np_))
        )
    ).persist()
    n = m.count()
    force(pack_tier(m, "1m", assume_sorted=True))  # warm plan+workers
    barrier = os.environ.get("PACK_BARRIER")
    if barrier:
        open(os.path.join(barrier, f"warm_{p}"), "w").close()
        while not os.path.exists(os.path.join(barrier, "GO")):
            time.sleep(0.2)
    t0 = time.perf_counter()
    force(pack_tier(m, "1m", assume_sorted=True))
    wall = time.perf_counter() - t0
    print(f"PACK_RESULT {json.dumps({'p': p, 'rows': n, 'wall_s': round(wall, 2)})}")
    import shutil

    shutil.rmtree(local_dir, ignore_errors=True)


def run_level(np_: int) -> dict:
    barrier = tempfile.mkdtemp(prefix="packprof_barrier_")
    env = dict(os.environ)
    env["PACK_BARRIER"] = barrier
    procs = [
        subprocess.Popen(
            ["taskset", "-c", f"{p * 4}-{p * 4 + 3}", sys.executable,
             os.path.abspath(__file__), "child", str(p), str(np_)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            cwd=REPO,
        )
        for p in range(np_)
    ]
    while sum(
        os.path.exists(os.path.join(barrier, f"warm_{p}")) for p in range(np_)
    ) < np_:
        time.sleep(0.5)
        if any(pr.poll() is not None for pr in procs):
            break
    s0 = _stat_snapshot()
    open(os.path.join(barrier, "GO"), "w").close()
    out = {"executors": np_, "per_exec": []}
    for pr in procs:
        so, se = pr.communicate(timeout=1800)
        r = None
        for line in so.splitlines():
            if line.startswith("PACK_RESULT "):
                r = json.loads(line[len("PACK_RESULT "):])
        # the LAST half of PACK_PROF lines belong to the timed pass
        # (first half is the warm pass); workers print on exhaustion
        profs = [
            (float(m.group(1)), int(m.group(2)))
            for m in re.finditer(r"PACK_PROF kernel_s=([\d.]+) rows=(\d+)", se)
        ]
        if r is not None:
            half = len(profs) // 2
            timed = profs[half:] if half else profs
            r["kernel_s_sum"] = round(sum(k for k, _ in timed), 2)
            r["prof_workers"] = len(timed)
            out["per_exec"].append(r)
    s1 = _stat_snapshot()
    ticks = max(s1[0] - s0[0], 1)
    out["host_steal_frac"] = round((s1[1] - s0[1]) / ticks, 4)
    out["host_sys_frac"] = round((s1[2] - s0[2]) / ticks, 4)
    out["wall_s"] = max((r["wall_s"] for r in out["per_exec"]), default=None)
    return out


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        child(int(sys.argv[2]), int(sys.argv[3]))
        return
    levels = [int(x) for x in sys.argv[1:]] or [1, 4]
    results = [run_level(np_) for np_ in levels]
    for r in results:
        print("PACK_SCALE " + json.dumps(r), flush=True)
    if len(results) == 2 and results[0]["executors"] * 4 == results[1]["executors"]:
        eff = results[0]["wall_s"] / (4 * results[1]["wall_s"])
        print(f"PACK_EFFICIENCY {eff:.3f}")


if __name__ == "__main__":
    main()
