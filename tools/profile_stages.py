"""Substage decomposition of the segment pass at a given parallelism:
(1) shuffle map + count, (2) shuffle + Arrow round trip with a noop
kernel, (3) noop + tokenize only, (4) the full builder + parquet write.
Isolates the non-scaling component. Not part of the driver gates."""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_solr_spark.indexing.build import (  # noqa: E402
    SEGMENT_OUT_SCHEMA,
    compute_key_bounds,
    count_keys_per_bucket,
    _keyed_corpus,
    make_stream_builder,
    offsets_from_counts,
)
from lucene_solr_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--docs", type=int, default=327680)
    ap.add_argument("--dps", type=int, default=1024)
    ap.add_argument("--work-dir", default="/tmp/lss_scalebench")
    args = ap.parse_args()

    spark = get_spark("lss_stageprof", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    corpus = spark.read.parquet(
        os.path.join(args.work_dir, f"corpus_{args.docs}")
    )

    def t(name, fn):
        t0 = time.time()
        fn()
        print(f"  [{args.cpus}cpu] {name}: {round(time.time() - t0, 2)}s",
              flush=True)

    bounds = compute_key_bounds(corpus, 4 * args.cpus)
    keyed = _keyed_corpus(corpus, bounds)
    counts = count_keys_per_bucket(corpus, bounds)
    offsets, _ = offsets_from_counts(counts)
    t("warm count (map reused?)", lambda: keyed.count())
    t("shuffle map + count", lambda: keyed.count())

    def noop(batches):
        n = 0
        for pdf in batches:
            n += len(pdf)
        yield pd.DataFrame({"n": [n]})

    t("shuffle+arrow noop", lambda: keyed.mapInPandas(noop, "n long").count())

    def tok_only(batches):
        from lucene_solr_spark.functions.analysis import (
            tokenize_series_positions,
        )
        n = 0
        for pdf in batches:
            toks, _ = tokenize_series_positions(pdf["content"].tolist())
            n += sum(len(x) for x in toks)
        yield pd.DataFrame({"n": [n]})

    t("shuffle+arrow+tokenize", lambda: keyed.mapInPandas(
        tok_only, "n long").count())

    builder = make_stream_builder(offsets, args.dps)
    t("full kernel no write", lambda: keyed.mapInPandas(
        builder, schema=SEGMENT_OUT_SCHEMA).count())
    out_dir = os.path.join(args.work_dir, f"stageprof_{args.cpus}")
    shutil.rmtree(out_dir, ignore_errors=True)
    t("full kernel + write", lambda: keyed.mapInPandas(
        builder, schema=SEGMENT_OUT_SCHEMA
    ).write.mode("overwrite").partitionBy("is_meta").parquet(out_dir))
    shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
