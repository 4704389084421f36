"""Cheap scaling-window health probe (~2 min, no engine workload).

Runs ONLY bench_scaling's ALU control (pure-JVM range->hash->sum) in a
fresh JVM at local[2] and local[8], twice each, interleaved — the same
shape as the full scaling run but without the ~13-minute index builds.
Prints one JSON line:

  alu_eff        best-pair ALU scaling efficiency (clean box: 0.86-0.96)
  lo/hi repeats  same-level swing is the degradation tell (clean: <1.1x)

Use before committing to a full `python -m pyspark_codesearch.bench_scaling`
window: alu_eff >= 0.85 with tight repeats = worth running; anything
else = the window would land in the replication table as degraded.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_W = """
import sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from pyspark_codesearch.session import get_spark
cpus = int(sys.argv[1])
spark = get_spark(f"probe-{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=max(cpus * 2, 8))
spark.sparkContext.setLogLevel("ERROR")
t0 = time.perf_counter()
spark.range(0, 6_000_000_000, 1, cpus * 2).select(
    F.sum(F.hash("id").cast("double"))).collect()
print(time.perf_counter() - t0)
spark.stop()
"""


def run_level(cpus: int, repo: str) -> float:
    out = subprocess.run(
        [sys.executable, "-c", _W.format(repo=repo), str(cpus)],
        capture_output=True, text=True, check=True,
    )
    return float(out.stdout.strip().splitlines()[-1])


def main() -> dict:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    lo, hi = [], []
    for _ in range(2):  # interleaved like the real run
        lo.append(run_level(2, repo))
        hi.append(run_level(8, repo))
    eff = (min(lo) / min(hi)) / 4.0
    res = {
        "alu_eff": round(eff, 3),
        "lo_sec": [round(x, 2) for x in lo],
        "hi_sec": [round(x, 2) for x in hi],
        "lo_swing": round(max(lo) / min(lo), 2),
        "hi_swing": round(max(hi) / min(hi), 2),
        "healthy": eff >= 0.85 and max(lo) / min(lo) < 1.15 and max(hi) / min(hi) < 1.15,
    }
    print(json.dumps(res))
    return res


if __name__ == "__main__":
    main()
