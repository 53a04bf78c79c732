"""Annotate rounds that ran inside a host compute-degradation episode.

This box has multi-hour windows where guest user-mode CPU runs several
times slower with ZERO steal and passing edge probes — first documented
in BENCH/phases/fb_anomaly.json (an fb_n leg at 510.7s whose identical
config reproduced at 126.5s minutes later). On 2026-08-18 the fb_4n
config (8 executors x 4 cores, 12g, t_scale16, pinned, prewarmed)
measured 397.0 / 405.1 / 257.3 / 159.6 / 112.0 s across five runs of
IDENTICAL deterministic work in probe-verified windows, while the N
config replicated 262.7-315.1s (1.2x) throughout. Per-stage
decomposition attributes the dispersion: in the 257.3s leg only the
DRAM-streaming metrics stage inflated (204s vs 68.7s clean; cascade
10.0s and pack 43.1s both clean), and in the ~400s legs cascade/pack
inflated too — i.e. the legs measure the host's time-varying memory
capacity at full width, not the engine.

An earlier revision of this tool re-tagged slow outliers invalid
(wall > 1.5x fastest valid identical-config round). That was reverted:
with a continuum of host states (112-405s), a wall-based void criterion
either filters toward the best window (selection bias) or voids most of
the data. Instead this tool ANNOTATES: every valid round whose wall
exceeds EPISODE_FACTOR x the fastest valid identical-config round gets
an `episode_note` naming the replications, and the BASELINE.md fullbox
section reports the full dispersion rather than a single scored median
(see tools/build_baseline.py). Validity flags are untouched; nothing is
hidden or discarded.

Idempotent; run: python tools/retag_episode_rounds.py
"""

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PH = os.path.join(REPO, "BENCH", "phases")

EPISODE_FACTOR = 1.5
FILES = ["fullbox_2_to_8.json", "gate2_1_to_4.json", "gate_1_to_4.json"]


def _config(r: dict) -> tuple:
    return (
        r.get("fixture"),
        r.get("executors"),
        r.get("cores_per_executor"),
        r.get("mem"),
    )


def annotate(fname: str) -> int:
    path = os.path.join(PH, fname)
    if not os.path.exists(path):
        return 0
    with open(path) as f:
        d = json.load(f)
    n = 0
    for key in ("rounds_n", "rounds_4n"):
        rounds = d.get(key, [])
        best: dict[tuple, float] = {}
        for r in rounds:
            if r.get("valid"):
                c = _config(r)
                best[c] = min(best.get(c, float("inf")), r["wall_s"])
        for r in rounds:
            if not r.get("valid") or "episode_note" in r:
                continue
            ref = best.get(_config(r))
            if ref and r["wall_s"] > EPISODE_FACTOR * ref:
                r["episode_note"] = (
                    f"host-episode suspect: wall {r['wall_s']}s vs {ref}s "
                    f"fastest valid identical-config replication (factor "
                    f"{round(r['wall_s'] / ref, 2)}; criterion "
                    f"{EPISODE_FACTOR}x, tools/retag_episode_rounds.py)"
                )
                n += 1
    if n:
        tmp = f"{path}.tmp"
        with open(tmp, "w") as f:
            json.dump(d, f)
        os.replace(tmp, path)
    print(f"{fname}: {n} round(s) annotated")
    return n


if __name__ == "__main__":
    total = sum(annotate(f) for f in FILES)
    print(f"total annotated: {total}")
