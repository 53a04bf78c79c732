"""Score the scaling gate from the cached BENCH/phases evidence.

Prints, for gate (1->4 executors) and fullbox (2->8):
  * every recorded round (wall, steal, sys, mem, stages, pair_id),
  * best-of efficiency (the cross-window score),
  * paired efficiency for every pair_id that has both cluster sizes
    (the same-window score — round-5 methodology),
  * best-known per-stage walls at each size and the per-stage scaling
    ratios, for decomposition against the ALU / memory-bandwidth
    hardware calibrations (BENCH/phases/cal.json, membw.json).

Read-only — run any time, even mid-measurement.
"""

import json
import os

PH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH", "phases"
)


def _fmt(r):
    sys_f = r.get("host_sys_frac")
    return (
        f"  wall={r['wall_s']:8.1f}s steal={100 * r['host_steal_frac']:5.2f}% "
        f"sys={'  n/a' if sys_f is None else f'{100 * sys_f:5.2f}%'} "
        f"mem={r.get('mem', '?'):>4} pair={r.get('pair_id', '-'):>11} "
        f"stages={r['stages']}"
    )


def show(name, path, factor=4):
    with open(path) as f:
        d = json.load(f)
    best = {}
    for key in ("rounds_n", "rounds_4n"):
        print(f"{name}.{key}:")
        for r in d[key]:
            print(_fmt(r))
        if not d[key]:
            print("  (no rounds)")
    if not (d["rounds_n"] and d["rounds_4n"]):
        print(f"{name}: no scorable rounds\n")
        return
    for key in ("rounds_n", "rounds_4n"):
        best[key] = min(d[key], key=lambda r: r["wall_s"])
    eff = best["rounds_n"]["wall_s"] / (factor * best["rounds_4n"]["wall_s"])
    print(
        f"{name}: best N={best['rounds_n']['wall_s']}s "
        f"best 4N={best['rounds_4n']['wall_s']}s  best-of efficiency={eff:.3f}"
    )

    # paired (same-window) scores
    pairs_n = {r["pair_id"]: r for r in d["rounds_n"] if r.get("pair_id")}
    for r in d["rounds_4n"]:
        pid = r.get("pair_id")
        if pid and pid in pairs_n:
            n, x = pairs_n[pid], r
            peff = n["wall_s"] / (factor * x["wall_s"])
            print(
                f"  paired {pid} ({x.get('mem', '?')}): N={n['wall_s']}s "
                f"4N={x['wall_s']}s -> {peff:.3f}"
            )

    # per-stage decomposition: best-known stage walls at each size
    stage_names = list(best["rounds_n"]["stages"].keys())
    bs = {
        key: {
            s: min(r["stages"][s] for r in d[key] if r.get("stages"))
            for s in stage_names
        }
        for key in ("rounds_n", "rounds_4n")
    }
    print("  per-stage best-known walls and scaling ratios:")
    for s in stage_names:
        n_w, x_w = bs["rounds_n"][s], bs["rounds_4n"][s]
        print(
            f"    {s:>8}: N={n_w:7.1f}s 4N={x_w:7.1f}s "
            f"ratio={n_w / x_w:5.2f}x eff={n_w / (factor * x_w):.3f}"
        )
    composite = sum(bs["rounds_n"][s] for s in stage_names) / (
        factor * sum(bs["rounds_4n"][s] for s in stage_names)
    )
    print(f"  composite best-known-stages efficiency: {composite:.3f}")

    for cal_name in ("cal", "membw"):
        p = os.path.join(PH, f"{cal_name}.json")
        if os.path.exists(p):
            with open(p) as f:
                print(f"  {cal_name}: {json.load(f)}")
    print()
    return eff


if __name__ == "__main__":
    for name in ("gate2_1_to_4", "gate_1_to_4", "fullbox_2_to_8"):
        p = os.path.join(PH, f"{name}.json")
        if os.path.exists(p):
            show(name, p)
        else:
            print(f"{name}: no rounds recorded on the current fixture "
                  f"(archived t_scale4 evidence: {name}_t_scale4.json)\n")
