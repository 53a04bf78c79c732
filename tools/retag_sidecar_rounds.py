"""Re-tag rounds voided SOLELY by the retired in-leg-sidecar criterion.

Round 5 demoted the in-leg ALU sidecar from validity criterion to
diagnostic (see tools/sidecar_mechanism.py and the gate_paired.py
AluSidecar docstring: the dip is endogenous to the Spark leg, so the
criterion could never pass a 4N leg). Rounds that were voided ONLY for
the sidecar dip — steal and post-leg ALU both inside tolerance — are
valid under the corrected protocol; rounds with any other reason keep
their void. This script applies that re-tag mechanically and records the
original reason in `retag_note`, so the raw history stays auditable.

Idempotent; run: python tools/retag_sidecar_rounds.py
"""

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PH = os.path.join(REPO, "BENCH", "phases")

SIDECAR = "in-leg ALU sidecar dipped"


def retag(fname: str) -> int:
    path = os.path.join(PH, fname)
    if not os.path.exists(path):
        return 0
    with open(path) as f:
        d = json.load(f)
    n = 0
    for key in ("rounds_n", "rounds_4n"):
        for r in d.get(key, []):
            reason = r.get("invalid_reason", "")
            if r.get("valid") is False and SIDECAR in reason:
                other = [
                    p for p in reason.split("; ") if SIDECAR not in p
                ]
                if not other:
                    r["valid"] = True
                    r["retag_note"] = (
                        "voided only by the retired in-leg-sidecar "
                        "criterion (endogenous dip — see "
                        "sidecar_mechanism.json); steal and post-leg ALU "
                        "were in tolerance. original: " + reason
                    )
                    del r["invalid_reason"]
                    n += 1
    if n:
        tmp = f"{path}.tmp"
        with open(tmp, "w") as f:
            json.dump(d, f)
        os.replace(tmp, path)
    print(f"{fname}: re-tagged {n} rounds")
    return n


# --- second mechanical retag (same session): the +20s post-leg ALU probe ---
# After every 4-executor leg the +20s post-leg ALU probe read a consistent
# 32.4-33.5 Mops (0.74-0.77x of window-open) — including after the
# best-ever 241.7s leg whose stage walls all replicated the known-good
# cluster — and the next hunt probe ~2 min later read 42.9-44.0 (full
# recovery) every time; N legs never trip it. The +20s reading is the
# teardown of 4 x 12g pre-touched heaps, not the window (evidence:
# BENCH/phases/gate2_t16_huntlog_0808_0925.txt; protocol now re-probes
# after +95s — see gate_paired.POST_PROBE_RETRY_S). Legs voided ONLY by
# that probe, in pairs where the hunt log shows the recovery, are valid
# under the corrected protocol. Explicit whitelist — nothing else is
# touched.
TEARDOWN_PAIRS = {"p0818_0808", "p0818_0837", "p0818_0908"}
POST_ALU = "post-leg ALU"


def retag_teardown(fname: str) -> int:
    path = os.path.join(PH, fname)
    if not os.path.exists(path):
        return 0
    with open(path) as f:
        d = json.load(f)
    n = 0
    for key in ("rounds_n", "rounds_4n"):
        for r in d.get(key, []):
            reason = r.get("invalid_reason", "")
            if (
                r.get("valid") is False
                and r.get("pair_id") in TEARDOWN_PAIRS
                and reason.startswith(POST_ALU)
                and "; " not in reason
            ):
                r["valid"] = True
                r["retag_note"] = (
                    "voided only by the +20s post-leg ALU probe, shown to "
                    "read 4-JVM heap-teardown reclaim rather than the "
                    "window (recovery to 42.9-44.0 Mops at the next probe "
                    "~2 min later, gate2_t16_huntlog_0808_0925.txt). "
                    "original: " + reason
                )
                del r["invalid_reason"]
                n += 1
    if n:
        tmp = f"{path}.tmp"
        with open(tmp, "w") as f:
            json.dump(d, f)
        os.replace(tmp, path)
    print(f"{fname}: re-tagged {n} teardown-probe rounds")
    return n


if __name__ == "__main__":
    for fn in ("gate2_1_to_4.json", "gate_1_to_4.json", "fullbox_2_to_8.json"):
        retag(fn)
        retag_teardown(fn)
