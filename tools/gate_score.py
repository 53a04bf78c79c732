"""Score the scaling gate from the cached BENCH/phases evidence.

Prints, for gate (1->4 executors) and fullbox (2->8), every recorded
round's (wall, steal, stages) plus the best-of efficiency the report
would publish. Read-only — run any time, even mid-measurement.
"""

import json
import os

PH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH", "phases")


def show(name, path, factor=4):
    with open(path) as f:
        d = json.load(f)
    best = {}
    for key in ("rounds_n", "rounds_4n"):
        print(f"{name}.{key}:")
        for r in d[key]:
            print(
                f"  wall={r['wall_s']:8.1f}s steal={100*r['host_steal_frac']:5.2f}% "
                f"stages={r['stages']}"
            )
        best[key] = min(d[key], key=lambda r: r["wall_s"])
    eff = best["rounds_n"]["wall_s"] / (factor * best["rounds_4n"]["wall_s"])
    print(
        f"{name}: best N={best['rounds_n']['wall_s']}s "
        f"best 4N={best['rounds_4n']['wall_s']}s  efficiency={eff:.3f}\n"
    )
    return eff


if __name__ == "__main__":
    for name in ("gate_1_to_4", "fullbox_2_to_8"):
        p = os.path.join(PH, f"{name}.json")
        if os.path.exists(p):
            show(name, p)
        else:
            print(f"{name}: no rounds recorded on the current fixture "
                  f"(archived t_scale4 evidence: {name}_t_scale4.json)\n")
