"""Paired same-window gate rounds (round-5 methodology upgrade).

Round-4 verdict finding: best-of-N across *different* quiet windows biases
the N->4N ratio — N's best landed in the session's cleanest window, 4N's in
a worse one. This runner executes the cluster sizes BACK-TO-BACK inside one
probe-verified window, tagging every appended round with a shared pair_id,
so gate efficiency can be scored on paired ratios instead of cross-window
best-ofs.

It also addresses the round-4 "4N host_sys_frac 0.09 vs N ~0.016" lead:
  * the fixture is pre-warmed into page cache before each round (symmetric
    IO conditions at both cluster sizes — the warm pass then re-reads from
    cache at N and 4N alike), and
  * a 2 s /proc/stat sampler runs for the whole session, phase-tagged, so
    any residual sys-time excess is attributable to a specific round and
    minute rather than inferred after the fact.

The runner GATES on the window like gate_hunter (steal < 0.5% over a 15 s
probe AND 4-proc ALU calibration >= 90% of the session's best, seeded at
30 Mops — the bar below which this host is known-degraded), because a
degraded host hurts 16-busy-cores more than 4-busy-cores (the ALU
eff_4_to_16 ceiling collapses with it) and would bias the ratio DOWN. At
window-open it also measures the 4p/16p ALU pair so every scored round
ships with the hardware ceiling it ran under.

Coordination files (so correctness tests can interleave with hunting):
  /tmp/gate_hold  — while present, the runner probes but will not launch
  /tmp/gate_busy  — present while a measurement pair is actually running

Usage:
  python tools/gate_paired.py [max_minutes] [mem] [mode ...]
    mem   per-executor heap for every round in the session (default 12g —
          constant node spec shared with the fullbox 2->8 variant)
    modes default: gate_n gate_4n   (N first: at t_scale16 the N leg is
          the long, never-yet-measured number; 4N is already replicated
          at 247-274s across three windows, so if the window closes
          mid-pair the scarce leg is the one banked)
Appends rounds to BENCH/phases/gate_1_to_4.json / fullbox_2_to_8.json in
the exact shape gate_hunter/extra_rounds use, plus pair_id/mem/note, and
writes the sampler series to BENCH/phases/diag_<pair_id>.json.
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import gate_hunter as gh
import scaling_bench as sb

PH = os.path.join(sb.REPO, "BENCH", "phases")


def prewarm_fixture() -> float:
    """Read every fixture byte so the timed rounds start cache-hot.

    Symmetric at both cluster sizes: N re-reads 6 GiB from cache exactly
    like 4N does. (Without this, whichever size runs first in a session
    pays the cold read inside its warm pass while later rounds inherit a
    hot cache — an ordering artifact.)
    """
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
    dt = time.perf_counter() - t0
    print(f"prewarm: {total/2**30:.2f} GiB in {dt:.1f}s", flush=True)
    return dt


class StatSampler(threading.Thread):
    """2 s /proc/stat samples, phase-tagged, for post-hoc sys/steal audit."""

    def __init__(self):
        super().__init__(daemon=True)
        self.samples = []
        self.phase = "idle"
        self.stop_flag = False

    @staticmethod
    def _snap():
        with open("/proc/stat") as f:
            v = list(map(int, f.readline().split()[1:]))
        # user, nice, sys, idle, iowait, irq, softirq, steal
        return v

    def run(self):
        prev = self._snap()
        while not self.stop_flag:
            time.sleep(2)
            cur = self._snap()
            d = [c - p for c, p in zip(cur, prev)]
            tot = max(sum(d), 1)
            self.samples.append(
                {
                    "t": round(time.time(), 1),
                    "phase": self.phase,
                    "user": round(d[0] / tot, 4),
                    "sys": round(d[2] / tot, 4),
                    "idle": round(d[3] / tot, 4),
                    "iowait": round(d[4] / tot, 4),
                    "steal": round(d[7] / tot, 4),
                }
            )
            prev = cur


def run_round(mode: str, mem: str, pair_id: str, extra_note: str) -> dict:
    _path, _key, p, cores, _default_mem = gh.CONFIGS[mode]
    r = sb.run_executors(p, cores, mem=mem)
    r["pair_id"] = pair_id
    r["mem"] = mem
    r["note"] = f"paired-window ({extra_note})"
    return r


def append_round(mode: str, r: dict) -> None:
    path, key, _p, _cores, _default_mem = gh.CONFIGS[mode]
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


HOLD = "/tmp/gate_hold"
BUSY = "/tmp/gate_busy"
ALU_FLOOR = 30.0  # Mops: below this the host is known-degraded (r4 record)
ALU_TOL = 0.90
MAX_STEAL = 0.005


def alu_16p() -> float:
    import multiprocessing as mp

    with mp.Pool(16) as pool:
        pool.map(sb._alu_probe, range(16))
        return sum(pool.map(sb._alu_probe, range(16))) / 1e6


def alu_32p() -> float:
    """Full-width ALU calibration — the same-window compute ceiling a
    32-busy-core leg (fb_4n) runs under. Across sessions this swings
    0.74-0.98 of linear with host conditions, so a full-box pair is only
    interpretable against ITS OWN window's ceiling."""
    import multiprocessing as mp

    with mp.Pool(32) as pool:
        pool.map(sb._alu_probe, range(32))
        return sum(pool.map(sb._alu_probe, range(32))) / 1e6


SIDECAR_CORE = 31
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


class AluSidecar:
    """One ALU loop pinned to a core no executor uses, sampling ~2 Hz for
    the whole pair. DIAGNOSTIC ONLY as of round 5: it was briefly a
    validity criterion (catch the fb_anomaly.json incident — a leg that
    ran 4x slow with passing edge probes), but every gate2_4n leg at
    t_scale16 "failed" it (sidecar 0.10-0.18x of session best) while the
    leg walls themselves replicated to 0.5% across independent verified
    windows (247.0s vs 248.3s) — impossible under a real 7-10x host
    degradation. tools/sidecar_mechanism.py then showed the dip is NOT
    reproduced by 8 pure-ALU (1.10x of idle) or 8 STREAM-triad (1.11x)
    pinned workers, and only mildly by 16 triad (0.80x): it is an
    endogenous artifact of the Spark leg itself (JVM mmap/page-cache/TLB
    traffic interrupting an otherwise-idle core), so gating on it can
    never pass a 4N leg. Validity now rests on edge probes (window-open
    + settled post-leg ALU), leg steal, and cross-window wall
    replication; the sidecar min is still recorded on every round for
    post-hoc audit."""

    def __init__(self, path: str):
        import subprocess

        self.path = path
        self.f = open(path, "w")
        self.proc = subprocess.Popen(
            ["taskset", "-c", str(SIDECAR_CORE), sys.executable, "-c",
             SIDECAR_SRC],
            stdout=self.f,
            stderr=subprocess.DEVNULL,
        )

    def stop(self):
        self.proc.terminate()
        self.proc.wait(timeout=10)
        self.f.close()

    def pause(self):
        """SIGSTOP for legs that busy every core (fb_4n) — the sidecar
        would otherwise share core 31 with an executor, contaminating
        both the leg and its own samples."""
        import signal

        self.proc.send_signal(signal.SIGSTOP)

    def resume(self):
        import signal

        self.proc.send_signal(signal.SIGCONT)

    def samples(self):
        out = []
        with open(self.path) as f:
            for line in f:
                try:
                    t, v = line.split()
                    out.append((float(t), float(v)))
                except ValueError:
                    continue
        return out

    @staticmethod
    def _window_means(samples, win=30.0):
        means = []
        for i, (t0, _) in enumerate(samples):
            block = [v for t, v in samples if t0 <= t < t0 + win]
            if len(block) >= win / 0.6:  # reasonably full window
                means.append((t0, sum(block) / len(block)))
        return means

    def leg_health(self, t_start: float, t_end: float):
        """(worst 30s mean inside the leg, best 30s mean of the session).
        Returns (None, None) if too few samples."""
        s = self.samples()
        all_means = self._window_means(s)
        leg_means = [m for t0, m in all_means if t_start <= t0 <= t_end - 30]
        if not all_means or not leg_means:
            return None, None
        return min(leg_means), max(m for _, m in all_means)


LEG_MAX_STEAL = 0.02    # a leg that ran under more steal than this is void
POST_ALU_TOL = 0.85     # post-leg ALU must stay within this of window-open
POST_PROBE_SETTLE_S = 20  # initial settle before the post-leg probe
POST_PROBE_RETRY_S = 75   # first re-probe delay after a failed +20s probe.
                          # Evidence (huntlog_0808_0925): after EVERY 4N
                          # leg — including the best-ever 241.7s one whose
                          # stages all replicated — the +20s probe read a
                          # consistent 32.4-33.5 Mops (0.74-0.77x of open),
                          # then the next hunt probe ~2 min later read
                          # 42.9-44.0 (full recovery); after 1-JVM N legs
                          # the +20s probe passes. The +20s reading is the
                          # teardown of 4 x 12g pre-touched heaps (48 GiB
                          # munmap + page-cache repopulation), not the
                          # window; a genuinely degraded window stays low
                          # (and is voided).
POST_PROBE_RECOVERY_CAP_S = 360  # keep re-probing every RECOVERY_STEP up
POST_PROBE_RECOVERY_STEP_S = 45  # to this total settle. Evidence (pairs
                          # p0818_1547 / p0818_2128): after 8-JVM FULL-BOX
                          # legs (96 GiB of pre-touched heap) the +20s AND
                          # +95s probes both read ~28.5 (0.68x), yet the
                          # hunter's NEXT window-open probe minutes later
                          # read 41.2-43.4 (full recovery) and the voided
                          # legs' walls (164.7s, 123.9s) sat in the clean
                          # replication band — the 95s schedule calibrated
                          # on 4-JVM teardown under-waits the 2x-larger
                          # 8-JVM teardown and voids healthy windows. The
                          # published post_leg_alu_recovery_s records how
                          # long teardown actually took; a window that
                          # never recovers within the cap is still voided.


def run_pair(modes, mem, deadline, st, alu, best_alu) -> bool:
    """One paired attempt inside an open window. Every leg is validated
    AFTER it runs (leg steal + post-leg ALU re-probe): host IPC
    degradation inflates guest CPU time without showing up as steal
    (proven by BENCH/phases/pack_scale_2core.json — the same 4-executor
    pack ran 154s in a window whose ALU collapsed 34->21 Mops
    mid-session and 57s in a verified-quiet one), so a pair is scored
    only if the window held for BOTH legs. Invalid legs are still
    appended, tagged valid=false + reason — raws are never discarded.
    Returns True if every leg validated (the pair is scorable)."""
    pair_id = time.strftime("p%m%d_%H%M")
    cal16 = alu_16p()
    eff_4_16 = cal16 / (4 * alu)
    cal32 = None
    if any(m.startswith("fb") for m in modes):
        cal32 = alu_32p()
    print(
        f"window-open ALU: 4p={alu:.1f} 16p={cal16:.1f} "
        f"eff_4_to_16={eff_4_16:.3f}"
        + (f" 32p={cal32:.1f} eff_4_to_32={cal32 / (8 * alu):.3f}"
           if cal32 else ""),
        flush=True,
    )
    sampler = StatSampler()
    sampler.start()
    sidecar = AluSidecar(f"/tmp/alu_sidecar_{pair_id}.log")
    results = {}
    all_valid = True
    try:
        for mode in modes:
            sampler.phase = f"prewarm_{mode}"
            prewarm_fixture()
            sampler.phase = mode
            note = (
                f"prewarmed cache, window steal {st:.2%}, alu4p {alu:.0f}, "
                f"alu16p {cal16:.0f} (eff {eff_4_16:.2f})"
            )
            if cal32:
                note += f", alu32p {cal32:.0f} (eff {cal32 / (8 * alu):.2f})"
            _path, _key, p_exec, cores_exec, _m = gh.CONFIGS[mode]
            full_width = p_exec * cores_exec > SIDECAR_CORE - 1
            if full_width:
                sidecar.pause()
            t_leg0 = time.time()
            try:
                r = run_round(mode, mem, pair_id, note)
            finally:
                if full_width:
                    sidecar.resume()
            t_leg1 = time.time()
            sampler.phase = "settle"
            time.sleep(POST_PROBE_SETTLE_S)
            sampler.phase = "probe"
            st2 = gh.steal_frac(10)
            alu2 = gh.alu_4p()
            alu2_first = alu2
            settled = POST_PROBE_SETTLE_S
            recovery_s = settled if alu2 >= POST_ALU_TOL * alu else None
            if recovery_s is None:
                # teardown vs weather: keep re-probing on a backoff until
                # the cap (see POST_PROBE_RECOVERY_*). All readings kept.
                wait = POST_PROBE_RETRY_S
                while settled < POST_PROBE_RECOVERY_CAP_S:
                    sampler.phase = "settle_retry"
                    time.sleep(wait)
                    settled += wait
                    wait = POST_PROBE_RECOVERY_STEP_S
                    sampler.phase = "probe_retry"
                    st2 = max(st2, gh.steal_frac(10))
                    alu2 = max(alu2, gh.alu_4p())
                    if alu2 >= POST_ALU_TOL * alu:
                        recovery_s = settled
                        break
            reasons = []
            if r["host_steal_frac"] > LEG_MAX_STEAL:
                reasons.append(f"leg steal {r['host_steal_frac']:.2%}")
            if alu2 < POST_ALU_TOL * alu:
                reasons.append(f"post-leg ALU {alu2:.1f} < {POST_ALU_TOL} x {alu:.1f}")
            if not full_width:
                worst, best = sidecar.leg_health(t_leg0, t_leg1)
                if worst is not None:
                    # diagnostic only (see AluSidecar docstring): the leg's
                    # own JVM activity starves the sidecar core, so the
                    # level cannot distinguish weather from work.
                    r["sidecar_leg_min_Mops"] = round(worst, 2)
                    r["sidecar_session_best_Mops"] = round(best, 2)
            else:
                r["sidecar_leg_min_Mops"] = None  # leg busies every core
            r["valid"] = not reasons
            r["post_leg_alu4p"] = round(alu2, 1)
            r["post_leg_alu4p_at_20s"] = round(alu2_first, 1)
            r["post_leg_alu_recovery_s"] = recovery_s
            r["post_leg_steal"] = round(st2, 4)
            if reasons:
                r["invalid_reason"] = "; ".join(reasons)
                all_valid = False
            append_round(mode, r)
            results[mode] = r
            print(
                f"APPENDED {mode}@{mem}: wall={r['wall_s']}s "
                f"steal={r['host_steal_frac']:.2%} sys={r['host_sys_frac']:.2%} "
                f"{'VALID' if r['valid'] else 'INVALID (' + r['invalid_reason'] + ')'} "
                f"stages={r['stages']}",
                flush=True,
            )
            if not r["valid"]:
                print("window lost — aborting pair, back to hunting", flush=True)
                break
            if time.time() > deadline:
                break
            if mode != modes[-1]:
                # mid-pair re-probe: the first leg can run 15+ min; require
                # the window to still hold before spending the next leg.
                if st2 > MAX_STEAL or alu2 < ALU_TOL * alu:
                    print(
                        f"window closed mid-pair (steal {st2:.2%}, "
                        f"ALU {alu2:.1f} vs open {alu:.1f}) — banking "
                        f"completed legs, back to hunting",
                        flush=True,
                    )
                    all_valid = False
                    break
    finally:
        sampler.stop_flag = True
        sidecar.stop()
    diag = os.path.join(PH, f"diag_{pair_id}.json")
    with open(diag, "w") as f:
        json.dump(
            {
                "pair_id": pair_id,
                "mem": mem,
                "alu4p": alu,
                "alu16p": cal16,
                "eff_4_to_16": round(eff_4_16, 3),
                "alu32p": cal32,
                "sidecar_samples": sidecar.samples(),
                "samples": sampler.samples,
            },
            f,
        )
    print(f"sampler -> {diag}", flush=True)

    complete = True
    for fam in {m.rsplit("_", 1)[0] for m in modes}:
        n_r, x_r = results.get(f"{fam}_n"), results.get(f"{fam}_4n")
        if n_r and x_r:
            eff = n_r["wall_s"] / (4 * x_r["wall_s"])
            tag = "VALID" if (n_r["valid"] and x_r["valid"]) else "INVALID"
            print(
                f"PAIRED EFFICIENCY {fam} ({pair_id}@{mem}, {tag}): "
                f"N={n_r['wall_s']}s 4N={x_r['wall_s']}s -> {eff:.3f}",
                flush=True,
            )
        elif f"{fam}_n" in modes and f"{fam}_4n" in modes:
            complete = False
    return all_valid and complete


def main():
    sb.ensure_fixture()
    max_min = float(sys.argv[1]) if len(sys.argv) > 1 else 480.0
    mem = sys.argv[2] if len(sys.argv) > 2 else "12g"
    modes = sys.argv[3:] or ["gate_n", "gate_4n"]
    deadline = time.time() + 60 * max_min
    best_alu = ALU_FLOOR

    while True:
        # -- hunt a window -----------------------------------------------
        while True:
            if time.time() > deadline:
                print("deadline hit without a validated pair; exiting", flush=True)
                return
            st = gh.steal_frac(15)
            alu = gh.alu_4p()
            best_alu = max(best_alu, alu)
            held = os.path.exists(HOLD)
            quiet = st < MAX_STEAL and alu >= ALU_TOL * best_alu and not held
            print(
                f"probe steal={st:.2%} alu={alu:.1f}/{best_alu:.1f}"
                f"{' HELD' if held else ''} -> {'RUN' if quiet else 'wait'}",
                flush=True,
            )
            if quiet:
                break
            time.sleep(75)

        open(BUSY, "w").close()
        try:
            if run_pair(modes, mem, deadline, st, alu, best_alu):
                print("validated pair complete", flush=True)
                return
        finally:
            if os.path.exists(BUSY):
                os.remove(BUSY)
        if time.time() > deadline:
            print("deadline hit; exiting", flush=True)
            return
        time.sleep(60)


if __name__ == "__main__":
    main()
