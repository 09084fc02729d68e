"""Cluster entrypoint: every engine verb behind one CLI, runnable
locally or via spark-submit on a real cluster (the north rule's
`spark-submit --py-files` deployment shape):

    zip -r lss.zip lucene_solr_spark/
    spark-submit --py-files lss.zip -m lucene_solr_spark.cli ...  # or:
    spark-submit --py-files lss.zip cli.py build \\
        --corpus s3://bucket/corpus_parquet --index s3://bucket/index \\
        --docs-per-segment 65536 --batches 16

Subcommands:
    build   corpus parquet/Iceberg dir -> full index (resumable)
    merge   salted segment compaction
    append  incremental NRT generation append
    search  run a query against an index, print top-k
    bench   one-line build+query timing on the given corpus

Local runs create their own session (local[N]); under spark-submit the
existing session/master is reused.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _spark(args):
    from lucene_solr_spark.session import get_spark

    return get_spark("lucene_solr_spark_cli", cpus=args.cpus)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="lucene_solr_spark.cli")
    ap.add_argument("--cpus", type=int, default=None,
                    help="local[N] cores (ignored under spark-submit "
                         "with an external master)")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--corpus", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--docs-per-segment", type=int, default=65536)
    b.add_argument("--batches", type=int, default=4)
    b.add_argument("--no-resume", action="store_true")
    b.add_argument("--analyzer", default="standard",
                   help="standard | whitespace | simple | stop | keyword")

    m = sub.add_parser("merge")
    m.add_argument("--index", required=True)
    m.add_argument("--segs-per-group", type=int, default=16)

    a = sub.add_parser("append")
    a.add_argument("--corpus", required=True)
    a.add_argument("--index", required=True)

    q = sub.add_parser("search")
    q.add_argument("--index", required=True)
    q.add_argument("query")
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--mode", default="or", choices=["or", "and"])
    q.add_argument("--similarity", default="bm25",
                   choices=["bm25", "classic", "lmdirichlet"])
    q.add_argument("--phrase", action="store_true")
    q.add_argument("--display", action="store_true",
                   help="hydrate stored fields for the winners")

    args = ap.parse_args(argv)
    spark = _spark(args)
    spark.sparkContext.setLogLevel("WARN")

    if args.cmd == "build":
        from lucene_solr_spark.indexing.build import IndexWriter

        t0 = time.time()
        snap = IndexWriter(
            spark, args.index, docs_per_segment=args.docs_per_segment,
            n_batches=args.batches, analyzer=args.analyzer,
        ).build(spark.read.parquet(args.corpus),
                resume=not args.no_resume)
        print(json.dumps({
            "stage": snap.stage, "snapshot_id": snap.snapshot_id,
            "n_docs": snap.props.get("n_docs"),
            "build_sec": round(time.time() - t0, 2),
            "lineage_rows": len(snap.lineage),
        }))
    elif args.cmd == "merge":
        from lucene_solr_spark.indexing.build import merge_postings

        t0 = time.time()
        snap = merge_postings(spark, args.index,
                              segs_per_group=args.segs_per_group)
        print(json.dumps({
            "stage": snap.stage, "snapshot_id": snap.snapshot_id,
            "group_factor": snap.props.get("group_factor"),
            "merge_sec": round(time.time() - t0, 2),
        }))
    elif args.cmd == "append":
        from lucene_solr_spark.indexing.build import append_documents

        t0 = time.time()
        snap = append_documents(
            spark, args.index, spark.read.parquet(args.corpus)
        )
        print(json.dumps({
            "stage": snap.stage, "snapshot_id": snap.snapshot_id,
            "max_doc": snap.props.get("max_doc"),
            "append_sec": round(time.time() - t0, 2),
        }))
    elif args.cmd == "search":
        from lucene_solr_spark.search.executor import IndexSearcher

        s = IndexSearcher(spark, args.index)
        if args.phrase:
            df = s.search_phrase(args.query, k=args.k)
        elif args.display:
            df = s.search_display(args.query, k=args.k, mode=args.mode)
        else:
            df = s.search(args.query, k=args.k, mode=args.mode,
                          similarity=args.similarity)
        for r in df.collect():
            print(json.dumps(r.asDict()))
    return 0


if __name__ == "__main__":
    sys.exit(main())
