"""MemoryIndex-style percolation (memory.percolate_predicate): the
compiled Catalyst predicate must agree with brute-force Python matching
over the same token lists (BooleanQuery semantics: all MUST, no NOT,
>= mm SHOULD)."""

import pytest

from pyspark.sql import functions as F

from lucene_solr_spark.memory import percolate_predicate

DOCS = [
    (0, ["table", "window", "stream", "join"]),
    (1, ["table", "stream"]),
    (2, ["window", "table"]),
    (3, ["scan", "merge"]),
    (4, ["tablet", "windows"]),
    (5, []),
]


def _run(spark, query, mm=0):
    df = spark.createDataFrame(DOCS, "doc_id long, toks array<string>")
    out = df.select(
        "doc_id",
        percolate_predicate(query, F.col("toks"), mm=mm).alias("m"),
    ).collect()
    return {r["doc_id"] for r in out if r["m"]}


def test_must_clauses(spark):
    assert _run(spark, "+table +window") == {0, 2}


def test_must_not(spark):
    assert _run(spark, "+table -stream") == {2}


def test_pure_should_needs_one(spark):
    assert _run(spark, "scan stream") == {0, 1, 3}


def test_min_should_match(spark):
    assert _run(spark, "table window stream", mm=2) == {0, 1, 2}


def test_prefix_and_wildcard(spark):
    assert _run(spark, "tab*") == {0, 1, 2, 4}
    assert _run(spark, "wind?w") == {0, 2}


def test_regexp(spark):
    assert _run(spark, "/w.*s/") == {4}


def test_term_range(spark):
    # [scan TO table] inclusive: scan, stream, table (not tablet)
    assert _run(spark, "[scan TO table]") == {0, 1, 2, 3}


def test_phrase_exact(spark):
    """Exact phrase over hole-free token arrays (positions default to
    the array index): adjacency in order, not just co-presence."""
    assert _run(spark, '"table window"') == {0}
    assert _run(spark, '"window table"') == {2}
    assert _run(spark, '+"table stream" join') == {1}


def test_phrase_with_stop_holes(spark):
    """Positions with StopFilter holes: the phrase 'big the table'
    analyzes to offsets [(big,0),(table,2)] — 'table' must sit
    EXACTLY two positions after 'big' (ExactPhraseScorer adjacency
    over analyzer positions), so hole-adjacent matches and
    directly-adjacent ones don't."""
    docs = [
        # raw: "big the table" -> kept (big@0, table@2): MATCH
        (0, ["big", "table"], [0, 2]),
        # raw: "big table" -> kept (big@0, table@1): no hole, NO match
        (1, ["big", "table"], [0, 1]),
        # raw: "big the fast table": gap of 3, NO match
        (2, ["big", "fast", "table"], [0, 2, 3]),
        (3, ["table", "big"], [0, 1]),
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, toks array<string>, poss array<int>")
    out = df.select(
        "doc_id",
        percolate_predicate('"big the table"', F.col("toks"),
                            pos_col=F.col("poss")).alias("m"),
    ).collect()
    assert {r["doc_id"] for r in out if r["m"]} == {0}


def test_phrase_sloppy(spark):
    """Sloppy phrase boolean = SloppyPhraseScorer window condition:
    max(adjusted) - min(adjusted) <= slop. Transposition costs 2
    (class javadoc), an intervening token costs 1."""
    # doc 0: table@0 window@1 -> in order adjacent, window 0
    # doc 2: window@0 table@1 -> transposed, window 2
    assert _run(spark, '"table window"~0') == {0}
    assert _run(spark, '"table window"~1') == {0}
    assert _run(spark, '"table window"~2') == {0, 2}
    # 3-term: doc 0 has table@0 window@1 stream@2 (exact); intervening
    # 'join' between window and stream nowhere, so slop 0 suffices
    assert _run(spark, '"table window stream"~0') == {0}
    assert _run(spark, '"table stream join"~0') == set()
    # table@0 stream@2 join@3: adjusted 0,1,1 -> window 1
    assert _run(spark, '"table stream join"~1') == {0}


def test_phrase_sloppy_with_holes(spark):
    """Sloppy matching over analyzer positions with stop holes:
    '"big the table"~1' has offsets [(big,0),(table,2)] so the raw
    gap p_table - p_big must land in [1, 3]."""
    docs = [
        (0, ["big", "table"], [0, 2]),   # gap 2: window 0, MATCH
        (1, ["big", "table"], [0, 1]),   # gap 1: window 1, MATCH
        (2, ["big", "fast", "table"], [0, 2, 3]),  # gap 3: window 1
        (3, ["table", "big"], [0, 1]),   # gap -1: window 3, NO
        (4, ["big", "x", "y", "z", "table"], [0, 1, 2, 3, 5]),  # gap 5
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, toks array<string>, poss array<int>")
    out = df.select(
        "doc_id",
        percolate_predicate('"big the table"~1', F.col("toks"),
                            pos_col=F.col("poss")).alias("m"),
    ).collect()
    assert {r["doc_id"] for r in out if r["m"]} == {0, 1, 2}


def test_phrase_sloppy_repeats_unsupported(spark):
    """Repeated-term sloppy phrases stay on the indexed path (the
    repeat-group walk is sequential) — explicit contract, not a
    silent wrong answer."""
    with pytest.raises(NotImplementedError):
        _run(spark, '"table window table"~2')


def test_sloppy_matches_indexed_path(spark):
    """Dual-exec: percolation sloppy matching == the indexed
    SloppyPhraseScorer match SET (freq > 0) on real corpus docs,
    2-term and 3-term repeat-free phrases."""
    import os

    from lucene_solr_spark.driver_entry import get_searcher

    sf = "/root/testdata/sf0.001"
    s = get_searcher(spark, sf)
    path_of = {int(r["doc_id"]): int(r["path"])
               for r in s._docs.select("doc_id", "path").collect()}

    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    from lucene_solr_spark.constants import STOPWORDS
    raw = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    zipped = F.filter(
        F.transform(raw, lambda t, i: F.struct(t.alias("t"),
                                               i.alias("p"))),
        lambda st: (F.length(st["t"]) <= 255)
        & ~st["t"].isin(*sorted(STOPWORDS)),
    )
    w = docs.select(
        "doc_id",
        F.transform(zipped, lambda st: st["t"]).alias("toks"),
        F.transform(zipped, lambda st: st["p"]).alias("poss"),
    )
    for phrase, slop in (("merge data", 2), ("merge data", 0),
                         ("big fast table", 3), ("table merge", 1)):
        indexed = {int(r["doc_id"]) for r in
                   s.search_phrase(phrase, k=None, slop=slop).collect()}
        indexed_corpus = {path_of[d] for d in indexed}
        pred = percolate_predicate(f'"{phrase}"~{slop}', F.col("toks"),
                                   pos_col=F.col("poss"))
        perc = {int(r["doc_id"]) for r in
                w.select("doc_id", pred.alias("m")).collect()
                if r["m"]}
        assert perc == indexed_corpus, (phrase, slop)
    assert len(perc) >= 0


def test_phrase_matches_indexed_path(spark):
    """Dual-exec: percolation phrase matching == the indexed
    ExactPhraseScorer match SET on real corpus docs."""
    import os

    from lucene_solr_spark.driver_entry import get_searcher

    sf = "/root/testdata/sf0.001"
    s = get_searcher(spark, sf)
    indexed = {int(r["doc_id"]) for r in
               s.search_phrase("big the table", k=None).collect()}
    # map index doc_ids -> corpus doc_ids via path
    path_of = {int(r["doc_id"]): int(r["path"])
               for r in s._docs.select("doc_id", "path").collect()}
    indexed_corpus = {path_of[d] for d in indexed}

    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    from lucene_solr_spark.constants import STOPWORDS
    raw = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    zipped = F.filter(
        F.transform(raw, lambda t, i: F.struct(t.alias("t"),
                                               i.alias("p"))),
        lambda st: (F.length(st["t"]) <= 255)
        & ~st["t"].isin(*sorted(STOPWORDS)),
    )
    w = docs.select(
        "doc_id",
        F.transform(zipped, lambda st: st["t"]).alias("toks"),
        F.transform(zipped, lambda st: st["p"]).alias("poss"),
    )
    pred = percolate_predicate('"big the table"', F.col("toks"),
                               pos_col=F.col("poss"))
    perc = {int(r["doc_id"]) for r in
            w.select("doc_id", pred.alias("m")).collect() if r["m"]}
    assert perc == indexed_corpus
    assert len(perc) > 0
