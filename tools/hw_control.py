"""Hardware-ceiling control for the scaling-efficiency evidence.

Runs the engine's pure-Python build kernel (analyze_with_positions ->
invert_segment -> block encode) in N INDEPENDENT processes over
identical per-process inputs — no Spark, no shuffle, no shared state,
i.e. embarrassingly parallel by construction. Any efficiency loss
between two N levels is therefore the single sandbox VM's hardware
(memory bus / SMT / turbo), NOT the engine. On a real cluster each
executor brings its own memory bus, so the control's N->4N efficiency
is the CEILING any Spark job can reach here; BENCH_SCALING.json's
engine numbers should be read against it.

Usage: python tools/hw_control.py [--docs-per-proc 2000] [--levels 1,4,16]
Prints one JSON line {level: {docs_per_sec}, ceilings: {"4->16": eff}}.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _worker(args) -> float:
    n_docs, seed = args
    from lucene_solr_spark.corpusgen import doc_content
    from lucene_solr_spark.functions.analysis import analyze_with_positions
    from lucene_solr_spark.indexing.build import invert_segment
    import numpy as np

    docs = [doc_content(seed * 100003 + i) for i in range(n_docs)]
    t0 = time.time()
    CHUNK = 1024
    done = 0
    while done < n_docs:
        chunk = docs[done:done + CHUNK]
        toks, poss = [], []
        for d in chunk:
            tp = analyze_with_positions(d)
            toks.append([t for t, _ in tp])
            poss.append([p for _, p in tp])
        ids = np.arange(done, done + len(chunk), dtype=np.int64)
        invert_segment(int(ids[0]), ids, toks, poss,
                       ["0" * 64] * len(chunk))
        done += len(chunk)
    return n_docs / (time.time() - t0)


def run_level(procs: int, docs_per_proc: int) -> float:
    with mp.get_context("spawn").Pool(procs) as pool:
        rates = pool.map(
            _worker, [(docs_per_proc, k) for k in range(procs)]
        )
    # aggregate throughput while all N were running
    return sum(rates)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs-per-proc", type=int, default=4000)
    ap.add_argument("--levels", default="1,4,16")
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]
    out = {}
    for lv in levels:
        rate = run_level(lv, args.docs_per_proc)
        out[str(lv)] = {"docs_per_sec": round(rate, 1)}
        print(f"level {lv}: {rate:.0f} docs/s", file=sys.stderr)
    ceil = {}
    for lo, hi in zip(levels, levels[1:]):
        r = out[str(hi)]["docs_per_sec"] / out[str(lo)]["docs_per_sec"]
        ceil[f"{lo}->{hi}"] = round(r / (hi / lo), 3)
    print(json.dumps({"levels": out, "ceiling_efficiency": ceil}))


if __name__ == "__main__":
    main()
