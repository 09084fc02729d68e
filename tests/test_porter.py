"""Porter stemmer golden vectors — pairs from the published algorithm
paper (Porter 1980, step examples) and its distributed sample
vocabulary; the reference PorterStemFilter implements the same
published steps."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_solr_spark.functions.porter import porter_stem  # noqa: E402

GOLDEN = {
    # step 1a
    "caresses": "caress", "ponies": "poni", "ties": "ti",
    "caress": "caress", "cats": "cat",
    # step 1b
    "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall",
    "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file",
    # step 1c
    "happy": "happi", "sky": "sky",
    # step 2
    "relational": "relat", "conditional": "condit",
    "rational": "ration", "valenci": "valenc", "hesitanci": "hesit",
    "digitizer": "digit", "conformabli": "conform",
    "radicalli": "radic", "differentli": "differ", "vileli": "vile",
    "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper",
    "feudalism": "feudal", "decisiveness": "decis",
    "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit",
    "sensibiliti": "sensibl",
    # step 3
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good",
    # step 4
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens",
    "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend",
    "adoption": "adopt", "communism": "commun", "activate": "activ",
    "angulariti": "angular", "homologous": "homolog",
    "effective": "effect", "bowdlerize": "bowdler",
    # step 5
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
}


@pytest.mark.parametrize("word,stem", sorted(GOLDEN.items()))
def test_porter_golden(word, stem):
    assert porter_stem(word) == stem


def test_english_analyzer_chain(spark, small_corpus, tmp_path):
    """EnglishAnalyzer-style chain (letter runs + lowercase + stop +
    porter) is registered, pinned in the snapshot, and rank-identical
    engine-vs-oracle like every other chain."""
    import numpy as np

    from lucene_solr_spark.corpusgen import CORPUS_SCHEMA
    from lucene_solr_spark.functions.analysis import get_analyzer
    from lucene_solr_spark.indexing.build import IndexWriter
    from lucene_solr_spark.oracle import OracleIndex
    from lucene_solr_spark.search.executor import IndexSearcher

    spec = get_analyzer("english")
    assert spec.analyze("The running searches stemmed!") == [
        "run", "search", "stem"
    ]
    index_dir = str(tmp_path / "enidx")
    corpus = spark.createDataFrame(small_corpus, schema=CORPUS_SCHEMA)
    IndexWriter(spark, index_dir, docs_per_segment=64, n_batches=1,
                analyzer="english").build(corpus)
    searcher = IndexSearcher(spark, index_dir)
    assert searcher.analyzer.name == "english"
    docs_sorted = sorted(
        small_corpus, key=lambda r: (r["repo"], r["path"], r["commit"])
    )
    oracle = OracleIndex.build(
        [(i, r["content"]) for i, r in enumerate(docs_sorted)],
        analyzer="english",
    )
    for q in ["merges", "common", "handler scanning"]:
        got = [(r["doc_id"], np.float32(r["score"]))
               for r in searcher.search(q, k=10).collect()]
        want = oracle.search(q, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (dg, sg), (dw, sw) in zip(got, want):
            assert sg.tobytes() == np.float32(sw).tobytes(), (q, dg)
