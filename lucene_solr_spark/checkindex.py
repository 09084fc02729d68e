"""CheckIndex analogue: distributed integrity verification of a
committed index snapshot.

Re-expresses the invariants Lucene's CheckIndex verifies
(`lucene/core/src/java/org/apache/lucene/index/CheckIndex.java` —
term checks: postings in docID order, docFreq/totalTermFreq agree with
the enumerated postings, `checkFields` ~:580-980; norms check :560-578;
stored-fields/doc-count cross-checks :980-1060) over the engine's
relational layout:

  1. codec structure  — every posting row decodes; docIDs strictly
     increasing; count == df; sum(tf) == cf; tf >= 1; skip entries'
     last_doc / count / max_tf match the decoded blocks (the block-max
     metadata WAND trusts).
  2. term stats       — the committed term_stats table equals a full
     recount (sum df / sum cf per term) from the postings themselves.
  3. collection stats — max_doc == segment doc_count sum == docs-table
     row count; sum_ttf == sum of per-doc lengths.
  4. norms            — each segment's norm bytes equal
     byte315(1/sqrt(doc_len)) recomputed from the stored doc lengths.
  5. docs table       — doc_ids unique and dense per segment range;
     doc key (repo, path, commit) unique among live docs.
  6. doc lengths      — per-doc sum(tf) over all terms equals the
     stored doc_len (valid for analyzers without posInc-0 injection;
     skipped otherwise, like CheckIndex skips checks the codec can't
     support).

All heavy passes are executor-side (mapInPandas over posting rows /
segment meta; one shuffle for the per-doc length recount); the driver
only collects per-check violation COUNTS plus a bounded sample of
offending keys — the shape that still works when the index is 100 TB.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F


class CheckIndexFailure(RuntimeError):
    pass


_VIOL_SCHEMA = "term string, kind string, detail string"


def _check_posting_rows(batches: Iterator[pd.DataFrame]
                        ) -> Iterator[pd.DataFrame]:
    from lucene_solr_spark.indexing.codec import (decode_postings,
                                                  decode_skips)

    for pdf in batches:
        out = []
        for r in pdf.itertuples(index=False):
            term = r.term
            try:
                if r.sdoc is not None and not pd.isna(r.sdoc):
                    # singleton: df must be 1, no blocks
                    if int(r.df) != 1 or int(r.cf) != int(r.stf):
                        out.append((term, "singleton",
                                    f"df={r.df} cf={r.cf} stf={r.stf}"))
                    continue
                docs, tfs = decode_postings(
                    bytes(r.doc_ids_enc), bytes(r.tfs_enc),
                    bytes(r.skips_enc))
                skips = decode_skips(bytes(r.skips_enc))
            except Exception as e:  # decode failure IS the finding
                out.append((term, "decode", repr(e)[:200]))
                continue
            if len(docs) != int(r.df):
                out.append((term, "df", f"decoded={len(docs)} df={r.df}"))
            if int(tfs.sum()) != int(r.cf):
                out.append((term, "cf", f"sum_tf={tfs.sum()} cf={r.cf}"))
            if len(docs) and (np.diff(docs) <= 0).any():
                out.append((term, "order", "docIDs not strictly increasing"))
            if len(tfs) and int(tfs.min()) < 1:
                out.append((term, "tf", f"min_tf={tfs.min()}"))
            if int(skips["count"].sum()) != len(docs):
                out.append((term, "skip_count",
                            f"{skips['count'].sum()} != {len(docs)}"))
            off = 0
            for s in skips:
                n = int(s["count"])
                blk_docs = docs[off:off + n]
                blk_tfs = tfs[off:off + n]
                off += n
                if not n:
                    continue
                if int(blk_docs[-1]) != int(s["last_doc"]):
                    out.append((term, "skip_last",
                                f"{blk_docs[-1]} != {s['last_doc']}"))
                if int(blk_tfs.max()) != int(s["max_tf"]):
                    out.append((term, "skip_max_tf",
                                f"{blk_tfs.max()} != {s['max_tf']}"))
        yield pd.DataFrame(out, columns=["term", "kind", "detail"])


def _check_segment_meta(batches: Iterator[pd.DataFrame]
                        ) -> Iterator[pd.DataFrame]:
    from lucene_solr_spark.functions.smallfloat import float_to_byte315

    for pdf in batches:
        out = []
        for r in pdf.itertuples(index=False):
            n = int(r.doc_count)
            lens = np.frombuffer(r.doc_lens_enc, dtype="<i4")[:n]
            norms = np.frombuffer(r.norms_enc, dtype=np.uint8)[:n]
            with np.errstate(divide="ignore"):
                inv = np.float32(1.0) / np.sqrt(lens.astype(np.float64)
                                                ).astype(np.float32)
            want = float_to_byte315(inv.astype(np.float32))
            want = np.where(lens == 0, np.uint8(255), want)
            bad = int((want != norms).sum())
            if bad:
                out.append((f"seg:{r.doc_base}", "norms",
                            f"{bad} mismatching norm bytes"))
            if int(r.sum_len) != int(lens.sum()):
                out.append((f"seg:{r.doc_base}", "sum_len",
                            f"{lens.sum()} != {r.sum_len}"))
        yield pd.DataFrame(out, columns=["term", "kind", "detail"])


def check_index(spark: SparkSession, index_dir: str,
                check_doc_lens: bool = True, sample: int = 20,
                raise_on_failure: bool = False) -> dict:
    """Verify a committed snapshot. Returns
    {ok, checks: {name: violation_count}, samples: [...]}."""
    from lucene_solr_spark.catalog import Catalog
    from lucene_solr_spark.indexing.build import (_as_list,
                                                  read_postings_any,
                                                  read_segments_any)

    snap = Catalog(index_dir).latest()
    if snap is None:
        raise CheckIndexFailure(f"no committed snapshot in {index_dir}")
    posts = read_postings_any(spark, snap.tables["postings"])
    segs = read_segments_any(spark, snap.tables["segments"])
    docs = spark.read.parquet(*_as_list(snap.tables["docs"]))
    tomb_path = snap.tables.get("tombstones")
    live = docs
    if tomb_path:
        tomb = spark.read.parquet(tomb_path)
        live = docs.join(tomb.select("doc_id"), "doc_id", "left_anti")

    checks: dict = {}
    samples: list = []

    def record(name: str, viol_df):
        cnt = viol_df.count()
        checks[name] = int(cnt)
        if cnt:
            samples.extend(
                (name,) + tuple(r) for r in viol_df.limit(sample).collect())

    # 1. codec structure (distributed decode of every posting row)
    record("codec", posts.mapInPandas(_check_posting_rows,
                                      schema=_VIOL_SCHEMA))

    # 2. term stats parity: full recount vs committed table
    recount = posts.groupBy("term").agg(
        F.sum("df").alias("rdf"), F.sum("cf").alias("rcf"))
    ts = spark.read.parquet(snap.tables["term_stats"])
    record(
        "term_stats",
        ts.join(recount, "term", "full")
        .filter((F.col("df") != F.col("rdf"))
                | (F.col("cf") != F.col("rcf"))
                | F.col("df").isNull() | F.col("rdf").isNull())
        .select("term", F.lit("term_stats").alias("kind"),
                F.concat_ws(" ", "df", "rdf", "cf", "rcf").alias("detail")),
    )

    # 3. collection stats vs segment meta vs docs table
    meta = segs.select("doc_base", "doc_count", "sum_len")
    agg = meta.agg(F.sum("doc_count").alias("n"),
                   F.sum("sum_len").alias("ttf")).collect()[0]
    import json

    with open(snap.tables["collection_stats"]) as f:
        cs = json.load(f)
    n_docs = docs.count()
    coll_bad = []
    if int(cs["max_doc"]) != int(agg["n"]) or int(agg["n"]) != n_docs:
        coll_bad.append(f"max_doc {cs['max_doc']} segs {agg['n']} "
                        f"docs {n_docs}")
    if int(cs["sum_total_term_freq"]) != int(agg["ttf"]):
        coll_bad.append(f"sum_ttf {cs['sum_total_term_freq']} "
                        f"!= {agg['ttf']}")
    checks["collection_stats"] = len(coll_bad)
    samples.extend(("collection_stats", "-", "coll", d) for d in coll_bad)

    # 4. norms recompute (per segment meta row, executor-side)
    record("norms", segs.select(
        "doc_base", "doc_count", "sum_len", "norms_enc", "doc_lens_enc"
    ).mapInPandas(_check_segment_meta, schema=_VIOL_SCHEMA))

    # 5. docs table: doc_id dense + unique; live doc-key unique
    dup_ids = (docs.groupBy("doc_id").count().filter("count > 1"))
    checks["doc_id_unique"] = dup_ids.count()
    dup_keys = (live.groupBy("repo", "path", "commit").count()
                .filter("count > 1"))
    checks["live_key_unique"] = dup_keys.count()
    id_range = docs.agg(F.min("doc_id").alias("lo"),
                        F.max("doc_id").alias("hi")).collect()[0]
    dense = (n_docs == 0
             or (int(id_range["lo"]) == 0
                 and int(id_range["hi"]) == n_docs - 1))
    checks["doc_id_dense"] = 0 if dense else 1

    # 6. per-doc length recount from postings (one shuffle), analyzer-
    # gated: posInc-0 injecting chains store discountOverlaps lengths
    analyzer = (snap.props or {}).get("analyzer", "standard")
    one_to_one = {"standard", "whitespace", "simple", "stop", "keyword",
                  "english"}
    if check_doc_lens and analyzer in one_to_one:
        def explode_doc_tf(batches):
            from lucene_solr_spark.indexing.codec import decode_postings
            for pdf in batches:
                ds, ts_ = [], []
                for r in pdf.itertuples(index=False):
                    if r.sdoc is not None and not pd.isna(r.sdoc):
                        ds.append(np.array([int(r.sdoc)], dtype=np.int64))
                        ts_.append(np.array([int(r.stf)], dtype=np.int64))
                        continue
                    d, t = decode_postings(
                        bytes(r.doc_ids_enc), bytes(r.tfs_enc),
                        bytes(r.skips_enc))
                    ds.append(d.astype(np.int64))
                    ts_.append(t.astype(np.int64))
                if ds:
                    yield pd.DataFrame({
                        "doc_id": np.concatenate(ds),
                        "tf": np.concatenate(ts_)})

        per_doc = (
            posts.mapInPandas(explode_doc_tf, schema="doc_id long, tf long")
            .groupBy("doc_id").agg(F.sum("tf").alias("rlen"))
        )

        def seg_lens(batches):
            for pdf in batches:
                for r in pdf.itertuples(index=False):
                    n = int(r.doc_count)
                    lens = np.frombuffer(r.doc_lens_enc, dtype="<i4")[:n]
                    yield pd.DataFrame({
                        "doc_id": np.arange(n, dtype=np.int64)
                        + int(r.doc_base),
                        "doc_len": lens.astype(np.int64)})

        stored = segs.select("doc_base", "doc_count", "doc_lens_enc") \
            .mapInPandas(seg_lens, schema="doc_id long, doc_len long")
        record(
            "doc_lens",
            stored.join(per_doc, "doc_id", "left")
            .filter(F.coalesce(F.col("rlen"), F.lit(0))
                    != F.col("doc_len"))
            .select(F.col("doc_id").cast("string").alias("term"),
                    F.lit("doc_len").alias("kind"),
                    F.concat_ws(" ", "doc_len", "rlen").alias("detail")),
        )

    ok = all(v == 0 for v in checks.values())
    result = {"ok": ok, "checks": checks, "samples": samples[:200]}
    if raise_on_failure and not ok:
        raise CheckIndexFailure(str(result))
    return result
