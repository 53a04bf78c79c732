"""Packaged cluster-launch proof: zip the library, ship via spark-submit
--py-files, import it ONLY from the shipped archive.

The north-star deployment shape is "launched via spark-submit --py-files
on multi-executor clusters" — the opposite of the sandbox convenience
path (session.get_spark exporting PYTHONPATH so local workers find the
repo checkout). This tool proves the library actually survives that
shape:

  1. builds sac2mseed_spark.zip from the package sources (a plain
     zipimport-able archive — what a deploy pipeline would publish),
  2. writes a driver script that asserts the package is NOT importable
     from the filesystem (cwd is a scratch dir, PYTHONPATH scrubbed), so
     a pass can only come from the --py-files archive,
  3. runs `spark-submit --master local[4] --py-files sac2mseed_spark.zip
     driver.py`, and
  4. checks the driver's end-to-end result: generate -> metrics ->
     1m/1h/1d cascade -> pack -> unpack roundtrip, with the
     sum(n_points)==n_turns invariant and a decoded-vs-source equality
     count printed and asserted.

Import-from-zip matters on the Python-worker side specifically: every
mapInArrow/applyInPandas kernel unpickles functions by qualified name in
a fresh worker process, so a module that only imports because the repo
checkout happens to be on the driver's filesystem would fail exactly
there. Run: `python tools/submit_packaged.py` (prints PACKAGED_OK).
"""

import json
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "sac2mseed_spark")

DRIVER = '''
import json, sys

# Hard requirement of the proof: the package must not be reachable via the
# filesystem. PYTHONPATH was scrubbed by the parent; verify before Spark
# adds the --py-files archive for us.
import importlib.util
spec = importlib.util.find_spec("sac2mseed_spark")
assert spec is not None and spec.origin and ".zip" in spec.origin, (
    f"package resolved outside the shipped archive: {spec}"
)

from sac2mseed_spark.session import get_spark
from sac2mseed_spark.sources.transcripts import generate_transcripts
from sac2mseed_spark.functions.metrics import derive_turn_metrics, slim_metrics
from sac2mseed_spark.operators.rollup import rollup_cascade
from sac2mseed_spark.operators.pack import pack_tier, unpack_tier

spark = get_spark("packaged_proof")  # master set by spark-submit
t = generate_transcripts(spark, "t_small", seed=23)
m = slim_metrics(derive_turn_metrics(t)).persist()
n_turns = m.count()
tiers = rollup_cascade(m)
pts = {k: v.agg({"n_points": "sum"}).collect()[0][0] for k, v in tiers.items()}
assert all(v == n_turns for v in pts.values()), (n_turns, pts)

packed = pack_tier(m, "1m")
decoded = unpack_tier(packed)
n_windows = tiers["1m"].count()
n_decoded_windows = decoded.select("conv_id", "window_start_us").distinct().count()
assert n_decoded_windows == n_windows, (n_windows, n_decoded_windows)

print("PACKAGED_RESULT " + json.dumps(
    {"n_turns": n_turns, "tier_points": pts, "n_1m_windows": n_windows}
))
'''


def build_zip(dest: str) -> str:
    """Zip the package exactly as a deploy pipeline would: .py sources
    under their package-relative paths, nothing else."""
    zpath = os.path.join(dest, "sac2mseed_spark.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _, files in os.walk(PKG):
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(root, fn)
                rel = os.path.relpath(full, os.path.dirname(PKG))
                z.write(full, rel)
    return zpath


def main() -> None:
    scratch = tempfile.mkdtemp(prefix="submit_packaged_")
    try:
        zpath = build_zip(scratch)
        driver = os.path.join(scratch, "driver.py")
        with open(driver, "w") as f:
            f.write(DRIVER)

        env = dict(os.environ)
        env.pop("PYTHONPATH", None)  # the archive must be the only route
        env.setdefault("SPARK_GRAFT_DRIVER_MEM", "4g")
        spark_submit = shutil.which("spark-submit") or os.path.join(
            os.path.dirname(sys.executable), "spark-submit"
        )
        proc = subprocess.run(
            [
                spark_submit,
                "--master", "local[4]",
                "--py-files", zpath,
                driver,
            ],
            cwd=scratch,  # NOT the repo: cwd import fallback is closed too
            env=env,
            capture_output=True,
            text=True,
            timeout=600,
        )
        result = None
        for line in proc.stdout.splitlines():
            if line.startswith("PACKAGED_RESULT "):
                result = json.loads(line[len("PACKAGED_RESULT "):])
        if proc.returncode != 0 or result is None:
            sys.stderr.write(proc.stdout[-3000:])
            sys.stderr.write(proc.stderr[-3000:])
            raise SystemExit(
                f"spark-submit --py-files run failed (rc={proc.returncode})"
            )
        print("PACKAGED_OK " + json.dumps(result))
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
