"""Query-concurrency ladder (round-5 scaling axis): saturated QPS at
1/2/4 concurrent clients against ONE fixed engine at local[16], same
idle-machine discipline as tools/bench_scaling.py (best-of-reps, load
average recorded). Certifies the serving shape the 100 TB story
implies: a batch engine whose throughput holds (or improves) as
concurrent clients contend for the same executor pool — the fixed
total work is split across clients, so a flat wall-clock means the
scheduler overlaps in-flight jobs instead of serializing them.

Prints one JSON line:
  {"cpus": 16, "n_docs": ..., "total_jobs": J, "levels": {
     "c1": {"wall_sec": ..., "qps": ...},
     "c2": {...}, "c4": {...}},
   "qps_ratio_c2_over_c1": ..., "qps_ratio_c4_over_c1": ...,
   "loadavg_before": [...], "loadavg_after": [...]}
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_solr_spark.corpusgen import generate_corpus  # noqa: E402
from lucene_solr_spark.fixtures import PHRASE_QUERY_SET, QUERY_SET  # noqa: E402
from lucene_solr_spark.indexing.build import (  # noqa: E402
    IndexWriter,
    merge_postings,
)
from lucene_solr_spark.search.executor import IndexSearcher  # noqa: E402
from lucene_solr_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--docs", type=int, default=327680)
    ap.add_argument("--dps", type=int, default=1024)
    ap.add_argument("--work-dir", default="/tmp/lss_scalebench")
    ap.add_argument("--total-jobs", type=int, default=8,
                    help="fixed total batch-jobs per level (split "
                         "across clients)")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    load_before = os.getloadavg()
    spark = get_spark("lss_qps_ladder", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    corpus_path = os.path.join(args.work_dir, f"corpus_{args.docs}")
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        generate_corpus(
            spark, args.docs, partitions=max(args.cpus * 4, 32)
        ).write.mode("overwrite").parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)

    index_dir = os.path.join(
        args.work_dir, f"idx_{args.docs}_{args.cpus}")
    if not os.path.exists(os.path.join(index_dir, "segments")):
        shutil.rmtree(index_dir, ignore_errors=True)
        IndexWriter(spark, index_dir, docs_per_segment=args.dps,
                    n_batches=1).build(corpus, resume=False)
        merge_postings(spark, index_dir, segs_per_group=8)
    searcher = IndexSearcher(spark, index_dir)

    workload = list(QUERY_SET) + list(PHRASE_QUERY_SET)
    batch = [
        (q if isinstance(q, str)
         else {"query_text": q["query_text"], "mode": q["mode"],
               "mm": q["mm"], "exclude": q["exclude"]})
        for q in workload
    ] * 8                               # the bench_scaling batch shape
    searcher.search_many(batch, k=10).collect()   # warm

    total_jobs = args.total_jobs
    levels = {}
    for clients in (1, 2, 4):
        per_client = total_jobs // clients
        best = None
        for _ in range(args.reps):
            t0 = time.time()
            if clients == 1:
                for _j in range(per_client):
                    searcher.search_many(batch, k=10).collect()
            else:
                def run_client(_c):
                    for _j in range(per_client):
                        searcher.search_many(batch, k=10).collect()
                with ThreadPoolExecutor(clients) as pool:
                    list(pool.map(run_client, range(clients)))
            wall = time.time() - t0
            best = wall if best is None else min(best, wall)
        n_queries = len(batch) * total_jobs
        levels[f"c{clients}"] = {
            "clients": clients,
            "jobs_per_client": per_client,
            "wall_sec": round(best, 2),
            "qps": round(n_queries / best, 1),
        }

    out = {
        "cpus": args.cpus,
        "n_docs": args.docs,
        "batch_queries": len(batch),
        "total_jobs": total_jobs,
        "levels": levels,
        "qps_ratio_c2_over_c1": round(
            levels["c2"]["qps"] / levels["c1"]["qps"], 3),
        "qps_ratio_c4_over_c1": round(
            levels["c4"]["qps"] / levels["c1"]["qps"], 3),
        "loadavg_before": [round(x, 2) for x in load_before],
        "loadavg_after": [round(x, 2) for x in os.getloadavg()],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
