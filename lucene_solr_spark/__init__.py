"""lucene_solr_spark — a brand-new PySpark-native inverted-index build +
BM25 query engine with the query/data-processing capabilities of the
reference Lucene/Solr snapshot (nikeshsingh/lucene-solr @ /root/reference).

NOT a port: the reference's Java execution engine (doc-at-a-time scorer
trees, byte-sliced RAM inversion, file-based codecs) is re-expressed as a
batch-relational Spark design:

  corpus (repo,path,commit,lang,content)
    -> deterministic docID assignment (range-partitioned dense rank)
    -> vectorized analysis chain (pandas/Arrow UDF; StandardTokenizer
       UAX#29 subset + LowerCase + StopFilter, SURVEY.md section 2.2)
    -> per-segment posting lists via groupBy+applyInPandas with
       delta + FOR(128) block compression, skip pointers and per-block
       max-score metadata (SURVEY.md sections 2.4-2.5)
    -> salted segment merge that splits skewed high-DF terms
    -> multi-term BM25 (k1=1.2,b=0.75) top-k: per-partition block-max
       WAND + bounded heap, then global score desc / docID asc merge
    -> snapshot/manifest checkpoints with per-partition lineage rows
       (Iceberg snapshot model re-expressed over parquet manifests).

Every kernel that affects ranking is bit-compatible with the reference
semantics (float32 accumulation order, SmallFloat norm quantization,
idf/avgdl double->float casts) and validated against the pure-Python
oracle in oracle.py, mirroring the reference's dual-execution test
strategy (lucene/core/src/test/.../search/TestBoolean2.java:132-144).
"""

from lucene_solr_spark.constants import K1, B, BLOCK_SIZE, STOPWORDS

__all__ = ["K1", "B", "BLOCK_SIZE", "STOPWORDS"]
__version__ = "0.1.0"
