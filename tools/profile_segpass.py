"""Decompose the segment-pass wall time at a given parallelism:
(a) range shuffle + sort only (noop sink), (b) + python
tokenize/invert/encode (noop sink), (c) + parquet write = the real
pass. Finds which leg anti-scales between core counts. Also reports
per-task skew for the full pass via the status tracker.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_solr_spark.corpusgen import generate_corpus  # noqa: E402
from lucene_solr_spark.indexing.build import (  # noqa: E402
    SEGMENT_OUT_SCHEMA,
    _keyed_corpus,
    compute_key_bounds,
    count_keys_per_bucket,
    make_stream_builder,
    offsets_from_counts,
)
from lucene_solr_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--docs", type=int, default=327680)
    ap.add_argument("--dps", type=int, default=1024)
    ap.add_argument("--bounds-mult", type=int, default=4,
                    help="buckets = mult * parallelism")
    ap.add_argument("--work-dir", default="/tmp/lss_profile2")
    args = ap.parse_args()

    spark = get_spark("lss_segpass", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    corpus_path = os.path.join(args.work_dir, f"corpus_{args.docs}")
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        generate_corpus(
            spark, args.docs, partitions=128
        ).write.mode("overwrite").parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)

    P = args.bounds_mult * spark.sparkContext.defaultParallelism
    t = time.time()
    bounds = compute_key_bounds(corpus, P)
    print(f"bounds({P}): {time.time()-t:.2f}s", flush=True)
    t = time.time()
    counts = count_keys_per_bucket(corpus, bounds)
    offsets, _ = offsets_from_counts(counts)
    print(f"counts: {time.time()-t:.2f}s", flush=True)

    keyed = _keyed_corpus(corpus, bounds)

    t = time.time()
    keyed.write.format("noop").mode("overwrite").save()
    print(f"[{args.cpus}cpu m{args.bounds_mult}] shuffle+sort only: "
          f"{time.time()-t:.2f}s", flush=True)

    builder = make_stream_builder(offsets, args.dps)
    out = keyed.mapInPandas(builder, schema=SEGMENT_OUT_SCHEMA)
    t = time.time()
    out.write.format("noop").mode("overwrite").save()
    print(f"[{args.cpus}cpu m{args.bounds_mult}] +python build: "
          f"{time.time()-t:.2f}s", flush=True)

    t = time.time()
    path = os.path.join(args.work_dir, f"segout_{args.cpus}")
    out.write.mode("overwrite").partitionBy("is_meta").parquet(path)
    print(f"[{args.cpus}cpu m{args.bounds_mult}] +parquet write: "
          f"{time.time()-t:.2f}s", flush=True)


if __name__ == "__main__":
    main()
