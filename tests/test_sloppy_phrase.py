"""SloppyPhraseScorer gates: hand-traced golden vectors for the greedy
phraseFreq traversal (SloppyPhraseScorer.java:103-137 — the javadoc's
own examples), then engine-vs-oracle duels over the built fixture
(dual execution: codec-decoded kernel path vs raw-token oracle path)."""

import numpy as np
import pytest

from lucene_solr_spark.search.executor import IndexSearcher
from lucene_solr_spark.search.sloppy import sloppy_phrase_freq
from lucene_solr_spark.fixtures import PHRASE_QUERY_SET

F32 = np.float32


def _freq(poss, offs, terms, slop):
    return sloppy_phrase_freq(
        [np.asarray(p, dtype=np.int64) for p in poss], offs, terms, slop
    )


class TestGoldenVectors:
    def test_javadoc_x_a_b_a_y(self):
        """Javadoc: for "a b"~2 on "x a b a y" the doc is scored twice,
        once for "a b" (distance 0) and once for "b a" (distance 2):
        freq = 1/(0+1) + 1/(2+1)."""
        f = _freq([[1, 3], [2]], [0, 1], ["a", "b"], 2)
        assert f.tobytes() == (
            F32(F32(1.0) + F32(F32(1.0) / F32(3)))
        ).tobytes()

    def test_javadoc_order_dependence(self):
        """Javadoc: "a b c"~4 and "c b a"~4 score DIFFERENTLY on
        "a b c b a" — the traversal always propagates the least
        PhrasePosition (documented, intentional)."""
        pa, pb, pc = [0, 4], [1, 3], [2]
        f1 = _freq([pa, pb, pc], [0, 1, 2], ["a", "b", "c"], 4)
        f2 = _freq([pc, pb, pa], [0, 1, 2], ["c", "b", "a"], 4)
        assert f1 > 0 and f2 > 0 and f1 != f2

    def test_exact_alignment(self):
        assert _freq([[0], [1]], [0, 1], ["a", "b"], 0) == F32(1.0)

    def test_miss_outside_slop(self):
        assert _freq([[0], [2]], [0, 1], ["a", "b"], 0) == F32(0.0)
        assert _freq([[0], [2]], [0, 1], ["a", "b"], 1) > 0

    def test_repeating_term(self):
        """"a b a" on doc "a b a": repeat-group init advances the
        second 'a' clause past the first (advanceRepeatGroups), exact
        match freq 1."""
        assert _freq(
            [[0, 2], [1], [0, 2]], [0, 1, 2], ["a", "b", "a"], 2
        ) == F32(1.0)

    def test_hole_offsets(self):
        """Stop-hole offsets: clause offsets (0, 2) require one
        position between the terms."""
        assert _freq([[5], [7]], [0, 2], ["a", "b"], 0) == F32(1.0)
        assert _freq([[5], [6]], [0, 2], ["a", "b"], 0) == F32(0.0)
        # off-by-one only reachable with slop
        assert _freq([[5], [6]], [0, 2], ["a", "b"], 1) > 0


@pytest.mark.parametrize("slop", [1, 2, 5])
@pytest.mark.parametrize("phrase", PHRASE_QUERY_SET[:4])
def test_sloppy_rank_identical(spark, built, phrase, slop):
    """Engine sloppy kernel vs oracle raw-position path: docIDs and f32
    score bits identical for every (phrase, slop)."""
    index_dir, oracle = built
    searcher = IndexSearcher(spark, index_dir)
    got = [
        (r["doc_id"], np.float32(r["score"]))
        for r in searcher.search_phrase(phrase, k=10, slop=slop).collect()
    ]
    want = oracle.search_phrase(phrase, k=10, slop=slop)
    assert [d for d, _ in got] == [d for d, _ in want], (phrase, slop)
    for (dg, sg), (dw, sw) in zip(got, want):
        assert sg.tobytes() == np.float32(sw).tobytes(), (phrase, slop)


def test_sloppy_superset_of_exact(spark, built):
    """slop=0 result docs are a subset of any slop>0 result set (with
    k=None), and exact-aligned docs keep freq >= 1."""
    index_dir, oracle = built
    searcher = IndexSearcher(spark, index_dir)
    phrase = PHRASE_QUERY_SET[0]
    exact = {r["doc_id"]
             for r in searcher.search_phrase(phrase, k=None).collect()}
    sloppy = {r["doc_id"]
              for r in searcher.search_phrase(phrase, k=None,
                                              slop=3).collect()}
    assert exact <= sloppy


def test_boolean_with_sloppy_clause(spark, built):
    """Parser surface '"p q"~2' inside a boolean tree matches the
    oracle's boolean evaluation with the same slop."""
    from lucene_solr_spark.oracle import OracleBoolean

    index_dir, oracle = built
    searcher = IndexSearcher(spark, index_dir)
    q = f'+"{PHRASE_QUERY_SET[0]}"~2 doc'
    got = [
        (r["doc_id"], np.float32(r["score"]))
        for r in searcher.search_boolean(q, k=10).collect()
    ]
    want = OracleBoolean(oracle).search(q, k=10)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (dg, sg), (dw, sw) in zip(got, want):
        assert sg.tobytes() == np.float32(sw).tobytes()
