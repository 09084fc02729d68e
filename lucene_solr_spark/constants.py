"""Normative constants of the engine format + scoring semantics.

Sources (reference files under /root/reference):
  - k1/b defaults: lucene/core/src/java/org/apache/lucene/search/
    similarities/BM25Similarity.java:59-61
  - posting block size 128: lucene/core/src/java/org/apache/lucene/codecs/
    lucene41/Lucene41PostingsFormat.java:384 (BLOCK_SIZE)
  - max token length 255: lucene/analysis/common/src/java/org/apache/
    lucene/analysis/standard/StandardAnalyzer.java:58
  - 33 English stopwords: lucene/analysis/common/src/java/org/apache/
    lucene/analysis/core/StopAnalyzer.java:50-61
"""

K1 = 1.2
B = 0.75

# Posting-list encoding
BLOCK_SIZE = 128          # docs per FOR-compressed block (Lucene41 BLOCK_SIZE)
MAX_TOKEN_LENGTH = 255    # StandardAnalyzer.DEFAULT_MAX_TOKEN_LENGTH

# StopAnalyzer.ENGLISH_STOP_WORDS_SET (33 words), StopAnalyzer.java:50-61
STOPWORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or
    such that the their then there these they this to was will with""".split()
)

# Index layout ------------------------------------------------------------
# Target docs per segment (a segment is a contiguous docID range — the
# relational analogue of a Lucene segment / DWPT flush unit,
# lucene/core/src/java/org/apache/lucene/index/DocumentsWriterPerThread.java).
# At 10^12 docs this yields ~10^6 segments; tune per deployment.
DEFAULT_DOCS_PER_SEGMENT = 1 << 16

# Max postings carried by a single postings row after merge. Terms with
# df above this stay split across multiple rows (the skew split: the
# salted merge groups by (term, seg_group) instead of bare term, so one
# reducer never owns a whole high-DF posting list).
MAX_POSTINGS_PER_ROW = 1 << 19

# df threshold above which a term is treated as "skewed" at merge time and
# routed through the salted two-level path (SegmentMerger analogue,
# lucene/core/src/java/org/apache/lucene/index/SegmentMerger.java:71-119,
# skew handling is ours — AQE cannot split inside one groupBy key).
SKEW_DF_THRESHOLD = 1 << 20

# v3: seg_id = doc_base (doc-unit groups), meta key arrays
# v4: self-contained blocks (skip entries carry the docID base) ->
#     concat-only merge; multi-part prox streams with pos_cnts
FORMAT_VERSION = 4
