"""Pack-kernel concurrency microharness (no Spark).

Reproduces the gate's pack-stage inflation in seconds instead of
20-minute gate rounds: N identical processes, each pinned to one core,
loop `_run_block_arrow` over production-geometry Arrow batches (10k rows,
4-point windows — the t_scale8 shape) and report per-core throughput.
The gate's pack stage showed per-core kernel time inflating ~2x from 2 ->
16 busy cores (BENCH/phases/pack_scale_kernel.json); if that inflation
reproduces here, it is a property of the kernel's memory behavior
(working set vs shared LLC), and any kernel change can be scored against
it immediately.

Usage: python tools/profile_pack_kernel.py [procs ...] (default 1 2 8 16)
Appends {procs: Mpts/s-per-core} to BENCH/phases/pack_kernel_conc.json.
"""

import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROWS = 10_000
PTS_PER_WIN = 4
SECONDS = 8.0


def make_tbl():
    import numpy as np
    import pyarrow as pa

    from sac2mseed_spark.operators import pack as P

    rng = np.random.default_rng(0)
    W = ROWS // PTS_PER_WIN
    n = W * PTS_PER_WIN
    conv = np.repeat(np.arange(W // 10), PTS_PER_WIN * 10)
    ws = np.repeat(np.arange(W, dtype=np.int64) * 60_000_000, PTS_PER_WIN)
    turn = np.tile(np.arange(PTS_PER_WIN, dtype=np.int64), W) + np.repeat(
        (np.arange(W, dtype=np.int64) % 10) * PTS_PER_WIN, PTS_PER_WIN
    )
    ts = ws + np.tile(np.arange(PTS_PER_WIN, dtype=np.int64) * 15_000_000, W)
    cols = {
        "conv_id": pa.array(np.char.add("conv_", conv.astype("U8"))),
        "window_start_us": pa.array(ws),
        "turn_idx": pa.array(turn),
        "ts_us": pa.array(ts),
    }
    for s in P.STREAMS:
        cols[s] = pa.array(rng.normal(100, 5, n))
    return pa.table(cols)


def worker(core: int, q) -> None:
    os.sched_setaffinity(0, {core})
    from sac2mseed_spark.operators import pack as P

    tbl = make_tbl()
    P._run_block_arrow(tbl)  # warm (imports, codegen'd LUTs)
    n_rows = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < SECONDS:
        P._run_block_arrow(tbl)
        n_rows += ROWS
    q.put(n_rows / (time.perf_counter() - t0))


def run_level(procs: int) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(i, q)) for i in range(procs)]
    for p in ps:
        p.start()
    rates = [q.get() for _ in ps]
    for p in ps:
        p.join()
    per_core = sum(rates) / len(rates) / 1e6
    print(f"{procs:>3} procs: {per_core:.3f} Mpts/s per core "
          f"(aggregate {sum(rates)/1e6:.2f})", flush=True)
    return per_core


def main():
    levels = [int(a) for a in sys.argv[1:]] or [1, 2, 8, 16]
    out = {}
    for p in levels:
        out[str(p)] = round(run_level(p), 4)
    base = out.get("1") or out[str(levels[0])]
    for p in levels:
        print(f"inflation x{base / out[str(p)]:.2f} at {p} procs")
    path = os.path.join(REPO, "BENCH", "phases", "pack_kernel_conc.json")
    hist = []
    if os.path.exists(path):
        with open(path) as f:
            hist = json.load(f)
    hist.append({"rows_per_batch": ROWS, "pts_per_window": PTS_PER_WIN,
                 "per_core_Mpts": out})
    with open(path, "w") as f:
        json.dump(hist, f, indent=1)
    print(f"appended -> {path}")


if __name__ == "__main__":
    main()
