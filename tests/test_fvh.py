"""FastVectorHighlighter gates (lucene/highlighter/.../vectorhighlight/):
hand-traced golden fragments for the pure per-doc pipeline
(FieldPhraseList greedy match, BaseFragListBuilder fragment walk,
ScoreOrder sorting, makeFragment tagging with boundary snapping), then
a Spark round-trip over the built fixture."""

import pytest

from lucene_solr_spark.functions.analysis import get_analyzer
from lucene_solr_spark.search.fvh import (
    _field_phrase_list,
    _build_trie,
    _term_stack,
    highlight_doc,
)

STD = get_analyzer("standard")


class TestTermStack:
    def test_offsets_and_stop_holes(self):
        stack = _term_stack("the Quick fox", STD)
        # 'the' is a stopword: absent from the stack, position advances
        assert stack == [("quick", 1, 4, 9), ("fox", 2, 10, 13)]


class TestPhraseList:
    def _wpl(self, text, phrases, slop=0):
        return _field_phrase_list(
            _term_stack(text, STD), _build_trie(phrases), slop)

    def test_single_term_match(self):
        wpl = self._wpl("aa bb cc", [("bb",)])
        assert len(wpl) == 1
        start, end, boost, seq, offs = wpl[0][:5]
        assert (start, end) == (3, 5) and offs == [(3, 5)]

    def test_adjacent_phrase_merges_toffs(self):
        wpl = self._wpl("aa bb cc dd", [(("bb", "cc"), 2.0)])
        start, end, boost, seq, offs = wpl[0][:5]
        # consecutive positions -> ONE merged highlight span (:183-189)
        assert (start, end) == (3, 8) and offs == [(3, 8)]
        assert boost == 2.0

    def test_longest_match_preferred_with_backtrack(self):
        # trie has both "bb" and "bb cc dd"; text breaks the long one
        # at 'dd' -> backtrack accepts "bb" then continues
        wpl = self._wpl("bb cc xx", [("bb",), (("bb", "cc", "dd"), 1.0)])
        assert [(w[0], w[1]) for w in wpl] == [(0, 2)]

    def test_overlap_keeps_first(self):
        # "aa bb" accepted first; overlapping "bb" dropped (:113-124)
        wpl = self._wpl("aa bb", [(("aa", "bb"), 1.0), ("bb",)])
        assert len(wpl) == 1 and wpl[0][4] == [(0, 5)]

    def test_stop_hole_breaks_adjacency(self):
        # 'the' advances position: bb(0) the(1) cc(2) -> gap 2, no
        # exact-phrase match (FieldQuery.java:438-445)
        wpl = self._wpl("bb the cc", [(("bb", "cc"), 1.0)])
        assert wpl == []
        # slop 1 admits it, with TWO Toffs (gap -> new Toffs)
        wpl = self._wpl("bb the cc", [(("bb", "cc"), 1.0)])
        wpl1 = _field_phrase_list(
            _term_stack("bb the cc", STD),
            _build_trie([(("bb", "cc"), 1.0)]), 1)
        assert len(wpl1) == 1 and wpl1[0][4] == [(0, 2), (7, 9)]


class TestHighlightDoc:
    def test_basic_fragment(self):
        frags = highlight_doc("aa bb cc dd", [("bb",)], STD,
                              frag_char_size=18)
        assert frags == ["aa <b>bb</b> cc dd"]

    def test_phrase_single_tag(self):
        frags = highlight_doc("aa bb cc dd", [(("bb", "cc"), 1.0)], STD,
                              frag_char_size=18)
        assert frags == ["aa <b>bb cc</b> dd"]

    def test_fragment_scoring_order(self):
        # two fragments; the one with two matches (boost sum 2) first
        text = ("xx yy " * 20) + "qq " + ("zz " * 40) + "qq rr qq"
        frags = highlight_doc(text, [("qq",)], STD, frag_char_size=30,
                              max_num_fragments=2)
        assert len(frags) == 2
        assert frags[0].count("<b>qq</b>") == 2  # totalBoost 2 sorts first

    def test_no_match_empty(self):
        assert highlight_doc("aa bb", [("zz",)], STD) == []

    def test_min_frag_size_guard(self):
        with pytest.raises(ValueError):
            highlight_doc("aa bb", [("aa",)], STD, frag_char_size=10)

    def test_boundary_snap(self):
        # fragment start snaps back to the char after a boundary
        # within maxScan=20 (SimpleBoundaryScanner.java:60-75)
        text = "hdr. " + "a" * 10 + " target " + "b" * 200
        frags = highlight_doc(text, [("target",)], STD,
                              frag_char_size=30)
        assert frags and frags[0].startswith(
            ("hdr. ", "aaaaaaaaaa ", "target", " target"))
        assert "<b>target</b>" in frags[0]


class TestSparkRoundTrip:
    def test_fvh_over_fixture(self, spark, built, small_corpus):
        from lucene_solr_spark.search.executor import IndexSearcher
        from lucene_solr_spark.search.fvh import fast_vector_highlight

        index_dir, oracle = built
        s = IndexSearcher(spark, index_dir)
        # the corpus table IS the row store (stored-fields row in
        # SURVEY.md); docIDs = rank over (repo, path, commit)
        docs_sorted = sorted(
            small_corpus, key=lambda r: (r["repo"], r["path"], r["commit"]))
        store = spark.createDataFrame(
            [(i, r["content"]) for i, r in enumerate(docs_sorted)],
            "doc_id long, content string")
        out = fast_vector_highlight(
            s, store, "hundred",
            [("hundred",), (("one", "hundred"), 2.0)],
            text_col="content", k=5, frag_char_size=60).collect()
        assert out
        assert all(r["fragments"] and "<b>" in r["fragments"][0]
                   for r in out)
        # the 2-boosted phrase fragment tags the full bigram
        assert any("<b>one hundred</b>" in r["fragments"][0] for r in out)
