"""Phase-timed build profile at a given parallelism — finds what
anti-scales between local[8] and local[32]. Mirrors IndexWriter.build
stage boundaries with explicit timers. Not part of the driver gates.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_solr_spark.corpusgen import generate_corpus  # noqa: E402
from lucene_solr_spark.indexing.build import (  # noqa: E402
    IndexWriter,
    compute_key_bounds,
    count_keys_per_bucket,
    _keyed_corpus,
    make_stream_builder,
    merge_postings,
    offsets_from_counts,
    SEGMENT_OUT_SCHEMA,
)
from lucene_solr_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--docs", type=int, default=81920)
    ap.add_argument("--dps", type=int, default=1024)
    ap.add_argument("--work-dir", default="/tmp/lss_profile")
    args = ap.parse_args()

    spark = get_spark("lss_profile", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    corpus_path = os.path.join(args.work_dir, f"corpus_{args.docs}")
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        generate_corpus(
            spark, args.docs, partitions=128
        ).write.mode("overwrite").parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)

    index_dir = os.path.join(args.work_dir, f"idx_{args.docs}_{args.cpus}")
    shutil.rmtree(index_dir, ignore_errors=True)

    stamps = {}

    def mark(name, t0):
        stamps[name] = round(time.time() - t0, 2)
        print(f"  [{args.cpus}cpu] {name}: {stamps[name]}s", flush=True)
        return time.time()

    w = IndexWriter(spark, index_dir, docs_per_segment=args.dps, n_batches=1)

    P = 4 * spark.sparkContext.defaultParallelism
    t = time.time()
    bounds = compute_key_bounds(corpus, P)
    keyed = _keyed_corpus(corpus, bounds)
    counts = count_keys_per_bucket(corpus, bounds)
    offsets, n_docs = offsets_from_counts(counts)
    t = mark("counts(narrow shuffle)", t)

    out = keyed.mapInPandas(
        make_stream_builder(offsets, args.dps), schema=SEGMENT_OUT_SCHEMA
    )
    path = w.catalog.path("seg", "batch=0")
    out.write.mode("overwrite").partitionBy("is_meta").parquet(path)
    t = mark("segment_pass(shuffle+tokenize+encode+write)", t)

    lin = w._batch_lineage(path, 0)
    t = mark("lineage", t)
    props = {
        "n_docs": n_docs, "docs_per_segment": args.dps, "n_batches": 1,
        "key_bounds": bounds,
        "counts": {str(k): v for k, v in counts.items()},
    }
    w._finalize(props, [0], lin)
    t = mark("finalize(term_stats+docs)", t)
    t = time.time()
    merge_postings(spark, index_dir, segs_per_group=8)
    mark("merge", t)
    total = sum(stamps.values())
    print(f"TOTAL {args.cpus}cpu: {round(total, 2)}s  {stamps}")


if __name__ == "__main__":
    main()
