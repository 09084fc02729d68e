"""Scaling-efficiency evidence (north rule: throughput efficiency >= 0.8
between N and 4N executors). No real cluster exists in this sandbox, so
the same job runs at two parallelism levels — local[8] vs local[32] —
on the same materialized input (the task-mandated proxy).

Writes BENCH_SCALING.json and prints a summary.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run(cpus: int, docs: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "fulltext_bench.py"),
         "--cpus", str(cpus), "--docs", str(docs)],
        capture_output=True, text=True, timeout=3600, check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    docs = int(os.environ.get("LSS_SCALE_DOCS", "327680"))
    hi = run(32, docs)   # first: generates the shared corpus at full width
    lo = run(8, docs)
    build_eff = hi["build_docs_per_sec"] / (4 * lo["build_docs_per_sec"])
    query_eff = hi["queries_per_sec"] / (4 * lo["queries_per_sec"])
    result = {
        "n_docs": docs,
        "local8": lo,
        "local32": hi,
        "build_scaling_efficiency": round(build_eff, 3),
        "query_scaling_efficiency": round(query_eff, 3),
        "note": (
            "efficiency = throughput(4N) / (4 * throughput(N)); "
            "N=8, 4N=32 local cores as the sandbox proxy for executors"
        ),
    }
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
