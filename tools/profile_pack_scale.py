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

Round-5 upgrade (chasing the paired-gate sys-time signature: N pack
sys ~0.09 cores-equiv vs 4N 2.19 — 15x more total kernel time for the
same data): the timed region now also records
  * per-executor process-tree CPU split by command (java vs python
    workers vs driver) with minor/major fault counts — WHO burns the
    sys time, and
  * host /proc/vmstat deltas (pgfault, NUMA balancing, THP/compaction
    stalls) — WHAT kernel machinery it is.
PACK_CORES sets cores per executor (default 4; the 2-core node spec of
the primary gate is PACK_CORES=2).

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

VMSTAT_KEYS = (
    "pgfault", "pgmajfault", "numa_pte_updates", "numa_hint_faults",
    "numa_pages_migrated", "pgmigrate_success", "thp_fault_alloc",
    "thp_collapse_alloc", "compact_stall", "compact_fail",
)


def _vmstat() -> dict:
    out = {}
    with open("/proc/vmstat") as f:
        for line in f:
            k, v = line.split()
            if k in VMSTAT_KEYS:
                out[k] = int(v)
    return out


def _tree_cpu() -> dict:
    """utime/stime/faults of this process and every live descendant,
    grouped by comm — attributes the timed region's CPU to the JVM vs
    the python workers vs this driver. Counters are cumulative since
    process start; callers diff two snapshots."""
    me = os.getpid()
    procs = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                raw = f.read()
        except OSError:
            continue
        # comm may contain spaces/parens: split around the LAST ')'
        lp, rp = raw.index("("), raw.rindex(")")
        comm = raw[lp + 1 : rp]
        # fields after ')': state ppid pgrp session tty tpgid flags
        #                   minflt cminflt majflt cmajflt utime stime ...
        fields = raw[rp + 2 :].split()
        procs[int(d)] = {
            "comm": comm,
            "ppid": int(fields[1]),
            "minflt": int(fields[7]),
            "majflt": int(fields[9]),
            "utime": int(fields[11]),
            "stime": int(fields[12]),
        }
    members = {me}
    changed = True
    while changed:
        changed = False
        for pid, st in procs.items():
            if pid not in members and st["ppid"] in members:
                members.add(pid)
                changed = True
    hz = os.sysconf("SC_CLK_TCK")
    by = {}
    for pid in members:
        st = procs.get(pid)
        if st is None:
            continue
        g = by.setdefault(
            st["comm"], {"utime_s": 0.0, "stime_s": 0.0, "minflt": 0, "majflt": 0, "n": 0}
        )
        g["utime_s"] += st["utime"] / hz
        g["stime_s"] += st["stime"] / hz
        g["minflt"] += st["minflt"]
        g["majflt"] += st["majflt"]
        g["n"] += 1
    return by


def _jvm_threads_cpu() -> dict:
    """Per-thread-name CPU of every descendant java process — splits the
    JVM's utime into GC / JIT / task-executor / Py4J / other, the level
    the fixed-cost hypothesis needs. Thread names collapse to their
    alpha prefix (e.g. 'GC Thread#3' -> 'GC Thread#')."""
    me = os.getpid()
    ppids = {}
    comms = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                raw = f.read()
        except OSError:
            continue
        lp, rp = raw.index("("), raw.rindex(")")
        comms[int(d)] = raw[lp + 1 : rp]
        ppids[int(d)] = int(raw[rp + 2 :].split()[1])
    members = {me}
    changed = True
    while changed:
        changed = False
        for pid, pp in ppids.items():
            if pid not in members and pp in members:
                members.add(pid)
                changed = True
    hz = os.sysconf("SC_CLK_TCK")
    by = {}
    for pid in members:
        if comms.get(pid) != "java":
            continue
        try:
            tids = os.listdir(f"/proc/{pid}/task")
        except OSError:
            continue
        for tid in tids:
            try:
                with open(f"/proc/{pid}/task/{tid}/stat") as f:
                    raw = f.read()
            except OSError:
                continue
            lp, rp = raw.index("("), raw.rindex(")")
            name = raw[lp + 1 : rp]
            fields = raw[rp + 2 :].split()
            key = name.rstrip("0123456789# ").strip() or name
            g = by.setdefault(key, {"utime_s": 0.0, "stime_s": 0.0, "n": 0})
            g["utime_s"] += int(fields[11]) / hz
            g["stime_s"] += int(fields[12]) / hz
            g["n"] += 1
    return by


def _tree_cpu_diff(a: dict, b: dict) -> dict:
    out = {}
    for comm, g1 in b.items():
        g0 = a.get(comm, {})
        out[comm] = {
            "utime_s": round(g1["utime_s"] - g0.get("utime_s", 0), 2),
            "stime_s": round(g1["stime_s"] - g0.get("stime_s", 0), 2),
            "n": g1["n"],
        }
        if "minflt" in g1:
            out[comm]["minflt"] = g1["minflt"] - g0.get("minflt", 0)
            out[comm]["majflt"] = g1["majflt"] - g0.get("majflt", 0)
    return out


def child(p: int, np_: int) -> None:
    os.environ["SPARK_GRAFT_DRIVER_MEM"] = os.environ.get("PACK_MEM", "12g")
    os.environ["SPARK_GRAFT_PROC_COUNT"] = "4"
    os.environ["SPARK_GRAFT_PACK_PROF"] = "1"
    from sac2mseed_spark.functions.metrics import derive_turn_metrics, slim_metrics
    from sac2mseed_spark.operators.pack import pack_tier
    from sac2mseed_spark.session import get_spark
    from sac2mseed_spark.sources.transcripts import read_transcripts_table

    cores = int(os.environ.get("PACK_CORES", "4"))
    local_dir = f"/dev/shm/sac2mseed_packprof_p{p}"
    os.makedirs(local_dir, exist_ok=True)
    spark = get_spark(
        f"packprof_{p}_{np_}",
        master=f"local[{cores}]",
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
    cpu0 = _tree_cpu()
    jt0 = _jvm_threads_cpu()
    t0 = time.perf_counter()
    force(pack_tier(m, "1m", assume_sorted=True))
    wall = time.perf_counter() - t0
    cpu = _tree_cpu_diff(cpu0, _tree_cpu())
    jt = {
        k: v
        for k, v in _tree_cpu_diff(jt0, _jvm_threads_cpu()).items()
        if v["utime_s"] + v["stime_s"] >= 1.0
    }
    print(
        "PACK_RESULT "
        + json.dumps(
            {
                "p": p,
                "rows": n,
                "wall_s": round(wall, 2),
                "tree_cpu": cpu,
                "jvm_threads": jt,
            }
        )
    )
    import shutil

    shutil.rmtree(local_dir, ignore_errors=True)


def run_level(np_: int) -> dict:
    barrier = tempfile.mkdtemp(prefix="packprof_barrier_")
    env = dict(os.environ)
    env["PACK_BARRIER"] = barrier
    cores = int(os.environ.get("PACK_CORES", "4"))
    procs = [
        subprocess.Popen(
            ["taskset", "-c", f"{p * cores}-{p * cores + cores - 1}",
             sys.executable,
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
    vm0 = _vmstat()
    open(os.path.join(barrier, "GO"), "w").close()
    out = {"executors": np_, "cores": cores, "per_exec": []}
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
        else:
            sys.stderr.write(f"child failed:\n{se[-2000:]}\n")
    s1 = _stat_snapshot()
    vm1 = _vmstat()
    out["vmstat_delta"] = {k: vm1[k] - vm0[k] for k in vm1}
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
    if (
        len(results) == 2
        and results[0]["executors"] * 4 == results[1]["executors"]
        and results[0]["wall_s"] and results[1]["wall_s"]
    ):
        eff = results[0]["wall_s"] / (4 * results[1]["wall_s"])
        print(f"PACK_EFFICIENCY {eff:.3f}")


if __name__ == "__main__":
    main()
