"""Classic Highlighter gates (lucene/highlighter/.../highlight/
Highlighter.java + QueryTermScorer + SimpleFragmenter +
SimpleHTMLFormatter): hand-traced golden fragments for the pure
per-doc walk — SimpleFragmenter boundaries on the CURRENT token's
endOffset, QueryTermScorer unique-term fragment sums, FragmentQueue
score-desc/fragNum-asc order, mergeContiguousFragments collapse with
max score, interstitial/trailing text handling, stop-token
passthrough, maxDocCharsToAnalyze cutoff."""

import pytest

from lucene_solr_spark.functions.analysis import get_analyzer
from lucene_solr_spark.search.classic_highlighter import (
    InvalidTokenOffsetsError,
    get_best_text_fragments,
    token_stream,
)

STD = get_analyzer("standard")

# tokens: alpha(0,5) beta(6,10) [the: stop hole] gamma(15,20) alpha(21,26)
TEXT = "alpha beta the gamma alpha"
W = {"alpha": 1.0, "gamma": 2.0}


class TestTokenStream:
    def test_stop_tokens_absent_positions_advance(self):
        # 'the' is position 2: absent from the stream, hole preserved
        assert token_stream(TEXT, STD) == [
            ("alpha", 0, 0, 5), ("beta", 1, 6, 10),
            ("gamma", 3, 15, 20), ("alpha", 4, 21, 26),
        ]


class TestFragmentWalk:
    """Hand trace with fragment_size=12 over TEXT:
    - frag0 boundary fires on gamma (endOffset 20 >= 12*1) AFTER the
      'beta' group flushes -> frag0 text '<B>alpha</B> beta', score
      1.0 (alpha); gamma's score accrues to frag1.
    - frag1 boundary fires on the second alpha (26 >= 24) -> frag1
      text ' the <B>gamma</B>', score 2.0.
    - frag2 text ' <B>alpha</B>', score 1.0 (unique-terms set resets
      per fragment so alpha counts again)."""

    def test_all_fragments_no_merge(self):
        frags = get_best_text_fragments(
            TEXT, W, STD, fragment_size=12, max_num_fragments=3,
            merge_contiguous=False)
        assert frags == [
            (" the <B>gamma</B>", 2.0, 1),
            ("<B>alpha</B> beta", 1.0, 0),
            (" <B>alpha</B>", 1.0, 2),
        ]

    def test_queue_tie_lower_fragnum_wins(self):
        # top-2 of scores (1.0, 2.0, 1.0): tie between frag0 and
        # frag2 broken by LOWER fragNum (Highlighter.java:525-530)
        frags = get_best_text_fragments(
            TEXT, W, STD, fragment_size=12, max_num_fragments=2,
            merge_contiguous=False)
        assert [f[2] for f in frags] == [1, 0]

    def test_merge_contiguous_max_score(self):
        # frag1 follows frag0 in markup coords -> selected pair merges
        # into one span with max(1.0, 2.0) (TextFragment.merge)
        frags = get_best_text_fragments(
            TEXT, W, STD, fragment_size=12, max_num_fragments=2,
            merge_contiguous=True)
        assert frags == [("<B>alpha</B> beta the <B>gamma</B>", 2.0, 0)]

    def test_unbounded_fragment_whole_text(self):
        # fragment_size beyond the text: one fragment = the whole
        # markup; score = distinct weighted terms present (1+2)
        frags = get_best_text_fragments(
            TEXT, W, STD, fragment_size=10000, max_num_fragments=1)
        assert frags == [
            ("<B>alpha</B> beta the <B>gamma</B> <B>alpha</B>", 3.0, 0)]

    def test_duplicate_term_counts_once_per_fragment(self):
        frags = get_best_text_fragments(
            "alpha alpha alpha", {"alpha": 1.0}, STD,
            fragment_size=10000, max_num_fragments=1)
        assert frags == [
            ("<B>alpha</B> <B>alpha</B> <B>alpha</B>", 1.0, 0)]

    def test_zero_score_fragments_dropped(self):
        assert get_best_text_fragments(
            "beta delta", W, STD, fragment_size=10000,
            max_num_fragments=2) == []

    def test_stop_word_weight_never_matches(self):
        # 'the' is stop-filtered before the scorer sees it
        assert get_best_text_fragments(
            "alpha the beta", {"the": 5.0}, STD,
            fragment_size=10000, max_num_fragments=1) == []

    def test_trailing_and_interstitial_preserved(self):
        frags = get_best_text_fragments(
            "xx gamma  yy", W, STD, fragment_size=10000,
            max_num_fragments=1)
        # leading 'xx ', double interior space, trailing ' yy' intact
        assert frags == [("xx <B>gamma</B>  yy", 2.0, 0)]

    def test_max_chars_cutoff(self):
        # second gamma starts past max_chars: not analyzed, and the
        # trailing text is NOT appended when len(text) > max_chars
        # (Highlighter.java:280-291)
        text = "gamma " + "x" * 20 + " gamma"
        frags = get_best_text_fragments(
            text, W, STD, fragment_size=10000, max_num_fragments=1,
            max_chars=10)
        # the x-run still starts before the cutoff so it is analyzed;
        # the second gamma (start 27 >= 10) is not, and the trailing
        # ' gamma' is dropped because len(text) > max_chars
        assert frags == [("<B>gamma</B> " + "x" * 20, 2.0, 0)]

    def test_invalid_offsets_raise(self):
        class Fake:
            stopwords = frozenset()
            lowercase = True

        import lucene_solr_spark.search.classic_highlighter as ch
        orig = ch.token_stream
        ch.token_stream = lambda t, a: [("zz", 0, 0, len(t) + 5)]
        try:
            with pytest.raises(InvalidTokenOffsetsError):
                get_best_text_fragments("abc", {"zz": 1.0}, Fake())
        finally:
            ch.token_stream = orig


class TestQueryScorer:
    """QueryScorer / WeightedSpanTermExtractor (position-sensitive
    phrase highlighting — hl.usePhraseHighlighter)."""

    def _extract(self, text, clauses):
        from lucene_solr_spark.search.classic_highlighter import (
            extract_weighted_span_terms,
        )
        return extract_weighted_span_terms(
            clauses, token_stream(text, STD))

    def test_phrase_spans_only_adjacent(self):
        text = "table hash x table y hash table hash"
        w = self._extract(text, [("phrase", ("table", "hash"), 1.0)])
        assert w["table"].position_sensitive
        assert sorted(w["table"].spans) == [(0, 1), (6, 7)]
        frags = get_best_text_fragments(
            text, w, STD, fragment_size=10000, max_num_fragments=1)
        assert frags == [(
            "<B>table</B> <B>hash</B> x table y hash "
            "<B>table</B> <B>hash</B>", 2.0, 0)]

    def test_stop_hole_breaks_phrase(self):
        # 'the' advances position so 'table hash' is NOT adjacent
        w = self._extract("table the hash",
                          [("phrase", ("table", "hash"), 1.0)])
        assert w == {}
        assert get_best_text_fragments(
            "table the hash", w, STD, fragment_size=10000,
            max_num_fragments=1) == []

    def test_term_clause_overwrites_sensitive_entry(self):
        # extractWeightedTerms PUTs unconditionally
        # (WeightedSpanTermExtractor.java:330-341): a later term
        # clause makes 'aa' position-INsensitive
        text = "aa bb cc aa"
        w = self._extract(text, [("phrase", ("aa", "bb"), 2.0),
                                 ("term", "aa", 1.0)])
        assert not w["aa"].position_sensitive and w["aa"].weight == 1.0
        assert w["bb"].position_sensitive and w["bb"].weight == 2.0
        frags = get_best_text_fragments(
            text, w, STD, fragment_size=10000, max_num_fragments=1)
        # both aa occurrences now tag; unique-term sum = 1.0 + 2.0
        assert frags == [("<B>aa</B> <B>bb</B> cc <B>aa</B>", 3.0, 0)]

    def test_in_span_second_occurrence_highlights(self):
        # checkPosition is an inclusive range test, not an exact
        # occurrence list: 'fast fast merge' with phrase (fast, merge)
        # spans (1, 2) — the first 'fast' (pos 0) stays untagged
        text = "fast fast merge"
        w = self._extract(text, [("phrase", ("fast", "merge"), 1.0)])
        assert w["fast"].spans == [(1, 2)]
        frags = get_best_text_fragments(
            text, w, STD, fragment_size=10000, max_num_fragments=1)
        assert frags == [("fast <B>fast</B> <B>merge</B>", 2.0, 0)]


class TestFragmenters:
    """Pluggable fragmenters: Solr GapFragmenter (relative sizing +
    increment-gap rule), NullFragmenter, SimpleSpanFragmenter (literal
    port incl. the flush-event position accounting)."""

    SIX = "aa bb cc dd ee ff"   # offsets (0,2)(3,5)(6,8)(9,11)(12,14)(15,17)

    def test_gap_relative_vs_simple_absolute(self):
        w = {"aa": 1.0, "dd": 1.0, "ff": 1.0}
        # gap: boundary at cc (8 >= 0+7, fragOffset=8) then ff (17 >= 15)
        gap = get_best_text_fragments(
            self.SIX, w, STD, fragment_size=7, max_num_fragments=3,
            merge_contiguous=False, fragmenter="gap")
        assert sorted(f[0] for f in gap) == [
            " <B>ff</B>", " cc <B>dd</B> ee", "<B>aa</B> bb"]
        # simple: absolute multiples -> boundaries at cc (8>=7) and
        # ee (14>=14)
        simple = get_best_text_fragments(
            self.SIX, w, STD, fragment_size=7, max_num_fragments=3,
            merge_contiguous=False, fragmenter="simple")
        assert sorted(f[0] for f in simple) == [
            " cc <B>dd</B>", " ee <B>ff</B>", "<B>aa</B> bb"]

    def test_gap_position_increment_threshold(self):
        # 51 stopword holes -> position increment 52 > 50 forces a
        # boundary even though fragment_size is huge
        text = "alpha " + "the " * 51 + "beta gamma"
        frags = get_best_text_fragments(
            text, {"alpha": 1.0, "beta": 1.0}, STD, fragment_size=10000,
            max_num_fragments=2, merge_contiguous=False, fragmenter="gap")
        assert [f[0] for f in frags] == [
            "<B>alpha</B>",
            " " + "the " * 51 + "<B>beta</B> gamma",
        ] or [f[0] for f in frags] == [
            " " + "the " * 51 + "<B>beta</B> gamma",
            "<B>alpha</B>",
        ]

    def test_null_fragmenter_whole_text(self):
        frags = get_best_text_fragments(
            self.SIX, {"aa": 1.0}, STD, fragment_size=3,
            max_num_fragments=5, fragmenter="null")
        assert frags == [("<B>aa</B> bb cc dd ee ff", 1.0, 0)]

    def test_span_fragmenter_protects_past_span(self):
        from lucene_solr_spark.search.classic_highlighter import (
            extract_weighted_span_terms,
        )
        w = extract_weighted_span_terms(
            [("phrase", ("cc", "dd"), 1.0)], token_stream(self.SIX, STD))
        assert w["cc"].spans == [(2, 3)]
        # simple at size 7 splits at cc AND ee
        simple = get_best_text_fragments(
            self.SIX, w, STD, fragment_size=7, max_num_fragments=2,
            merge_contiguous=False, fragmenter="simple")
        assert simple == [(" <B>cc</B> <B>dd</B>", 2.0, 1)]
        # span fragmenter: the wait armed at dd (fragmenter position 2
        # == span start, one flush behind the scorer) suppresses the
        # ee boundary; the ff boundary dies on the half-size tail
        # guard -> one fragment from cc to the end
        span = get_best_text_fragments(
            self.SIX, w, STD, fragment_size=7, max_num_fragments=2,
            merge_contiguous=False, fragmenter="span")
        assert span == [(" <B>cc</B> <B>dd</B> ee ff", 2.0, 1)]


class TestRegexFragmenter:
    """Solr LuceneRegexFragmenter hand traces: hotspot snapping within
    the slop window, the sub-minFragLen suppression, and the
    increment-gap rule."""

    def _frag(self, text, w, **kw):
        from functools import partial

        from lucene_solr_spark.search.classic_highlighter import (
            RegexFragmenterState,
        )
        factory = partial(RegexFragmenterState, pattern="[a-z]+",
                          slop=0.5)
        return get_best_text_fragments(
            text, w, STD, fragment_size=10, max_num_fragments=4,
            merge_contiguous=False, fragmenter=factory, **kw)

    def test_hotspot_snap_trace(self):
        # tokens aaa(0,3) bbb(4,7) ccc(8,11) ddd(12,15) eee(16,19)
        # fff(20,23); target 10, slop 0.5 -> minLen 5, window +15.
        # At bbb: hotspot 7 within window -> target 7; boundary fires
        # at ccc (11 > 7). Then cur=11: ddd suppressed (4 < minLen 5),
        # at eee hotspot 19 snaps the target; boundary at fff.
        text = "aaa bbb ccc ddd eee fff"
        frags = self._frag(text, {"aaa": 1.0, "ddd": 1.0, "fff": 1.0})
        assert [(f[0], f[2]) for f in frags] == [
            ("<B>aaa</B> bbb", 0),
            (" ccc <B>ddd</B> eee", 1),
            (" <B>fff</B>", 2),
        ]

    def test_increment_gap_forces_boundary(self):
        text = "alpha " + "the " * 51 + "beta"
        frags = self._frag(text, {"alpha": 1.0, "beta": 1.0})
        assert sorted(f[0] for f in frags) == [
            " " + "the " * 51 + "<B>beta</B>", "<B>alpha</B>"]


class TestGradientFormatters:
    def test_hex_parse_and_color_interpolation(self):
        from lucene_solr_spark.search.classic_highlighter import (
            GradientFormatter,
        )
        f = GradientFormatter(2.0, min_fg="#FFFFFF", max_fg="#000000")
        # getColorVal: min(cMin,cMax) + int(|cMin-cMax| * rel) — the
        # direction-insensitive reference rule: white->black at half
        # score gives 0 + int(255*0.5) = 127 = 0x7F
        assert f("abc", 1.0) == '<font color="#7F7F7F" >abc</font>'
        # score above maxScore clamps to the max color END of the
        # scale computed from the min side: 0 + 255 = 255
        assert f("abc", 5.0) == '<font color="#FFFFFF" >abc</font>'
        # zero-score groups pass through (== 0 gate)
        assert f("abc", 0.0) == "abc"

    def test_bg_and_span_variant(self):
        from lucene_solr_spark.search.classic_highlighter import (
            GradientFormatter,
            SpanGradientFormatter,
        )
        f = GradientFormatter(1.0, min_bg="#000000", max_bg="#FF0000")
        assert f("x", 1.0) == '<font bgcolor="#FF0000" >x</font>'
        s = SpanGradientFormatter(
            1.0, min_fg="#000000", max_fg="#0000FF")
        assert s("x", 1.0) == '<span style="color: #0000FF; ">x</span>'

    def test_formatter_in_fragment_walk(self):
        from lucene_solr_spark.search.classic_highlighter import (
            GradientFormatter,
        )
        f = GradientFormatter(2.0, min_fg="#FFFFFF", max_fg="#000000")
        frags = get_best_text_fragments(
            "xx gamma yy", W, STD, fragment_size=10000,
            max_num_fragments=1, formatter=f)
        # gamma weight 2.0 -> full-scale color
        assert frags == [
            ('xx <font color="#FFFFFF" >gamma</font> yy', 2.0, 0)]

    def test_bad_hex_length_raises(self):
        from lucene_solr_spark.search.classic_highlighter import (
            GradientFormatter,
        )
        with pytest.raises(ValueError):
            GradientFormatter(1.0, min_fg="#FFF", max_fg="#000000")


class TestProperties:
    """Hypothesis invariants over the fragment walk."""

    WORDS = ["alpha", "beta", "gamma", "the", "to", "zz", "table",
             "hash", "a"]

    def test_unbounded_markup_strips_to_original(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=120, deadline=None)
        @given(st.lists(st.sampled_from(self.WORDS), min_size=1,
                        max_size=12),
               st.sets(st.sampled_from(self.WORDS), max_size=3))
        def prop(tokens, weighted):
            text = " ".join(tokens)
            w = {t: 1.0 for t in weighted}
            frags = get_best_text_fragments(
                text, w, STD, fragment_size=10**6, max_num_fragments=1)
            if not frags:
                # no non-stop weighted token present
                assert not any(
                    t in w and t not in ("the", "to", "a")
                    for t in tokens)
                return
            plain = frags[0][0].replace("<B>", "").replace("</B>", "")
            assert plain == text
            # every weighted non-stop occurrence is tagged, nothing else
            import re
            tagged = re.findall(r"<B>([^<]*)</B>", frags[0][0])
            expect = [t for t in tokens
                      if t in w and t not in ("the", "to", "a")]
            assert tagged == expect

        prop()

    def test_fragments_partition_markup(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=120, deadline=None)
        @given(st.lists(st.sampled_from(self.WORDS), min_size=1,
                        max_size=15),
               st.integers(min_value=3, max_value=40))
        def prop(tokens, size):
            # weight EVERY word so no fragment is score-0-dropped
            text = " ".join(tokens)
            w = {t: 1.0 for t in self.WORDS}
            frags = get_best_text_fragments(
                text, w, STD, fragment_size=size,
                max_num_fragments=100, merge_contiguous=False)
            if not frags:
                assert all(t in ("the", "to", "a") for t in tokens)
                return
            # fragNum order reassembles the full markup text exactly
            joined = "".join(
                f[0] for f in sorted(frags, key=lambda f: f[2]))
            plain = joined.replace("<B>", "").replace("</B>", "")
            assert plain == text

        prop()


class TestSparkRoundTrip:
    def test_classic_over_fixture(self, spark, built, small_corpus):
        from lucene_solr_spark.search.executor import IndexSearcher
        from lucene_solr_spark.search.classic_highlighter import (
            classic_highlight,
        )

        index_dir, oracle = built
        s = IndexSearcher(spark, index_dir)
        docs_sorted = sorted(
            small_corpus, key=lambda r: (r["repo"], r["path"], r["commit"]))
        store = spark.createDataFrame(
            [(i, r["content"]) for i, r in enumerate(docs_sorted)],
            "doc_id long, content string")
        out = classic_highlight(
            s, store, "hundred", {"hundred": 1.0},
            text_col="content", k=5, fragment_size=10**6,
            max_num_fragments=1).collect()
        assert out
        for r in out:
            assert r["fragments"] and "<B>hundred</B>" in r["fragments"][0]
            assert r["frag_scores"][0] == 1.0
            # whole-text fragment: tags stripped returns the original
            stored = dict((i, d["content"])
                          for i, d in enumerate(docs_sorted))
            plain = r["fragments"][0].replace("<B>", "").replace("</B>", "")
            assert plain == stored[r["doc_id"]]


class TestSloppyPhraseGoldens:
    """HighlighterTest sloppy/gapped-phrase cases transferred as
    golden vectors (lucene/highlighter/src/test/.../HighlighterTest
    .java). The reference analyzer is MockTokenizer.SIMPLE (letter
    runs, lowercased) + MockTokenFilter.ENGLISH_STOPSET — which is
    byte-identical to the engine's 33-word STOPWORDS set. Hit docs
    are derived with the engine's own SloppyPhraseScorer port
    (search/sloppy.py) — the same scorer the reference's doSearching
    runs; numHighlights replicates the test class's Formatter
    counter (one per positive-score TokenGroup across the WHOLE
    token walk, HighlighterTest.java:1837-1843)."""

    TEXTS = [
        "Hello this is a piece of text that is very long and contains "
        "too much preamble and the meat is really here which says "
        "kennedy has been shot",
        "This piece of text refers to Kennedy at the beginning then "
        "has a longer piece of text that is very long in the middle "
        "and finally ends with another reference to Kennedy",
        "JFK has been shot", "John Kennedy has been shot",
        "This text has a typo in referring to Keneddy",
        "wordx wordy wordz wordx wordy wordx worda wordb wordy wordc",
        "y z x y z a b",
        "lets is a the lets is a the lets is a the lets",
    ]

    @staticmethod
    def _analyzer():
        import re

        from lucene_solr_spark.constants import STOPWORDS
        from lucene_solr_spark.functions.analysis import AnalyzerSpec

        return AnalyzerSpec("mock_simple",
                            re.compile("[a-zA-Z]+").findall,
                            lowercase=True, stopwords=STOPWORDS)

    def _hits(self, phrase, slop):
        """Doc ids matching the PhraseQuery via the engine's
        SloppyPhraseScorer port (freq > 0) — the reference's
        doSearching."""
        import numpy as np

        from lucene_solr_spark.search.sloppy import sloppy_phrase_freq

        an = self._analyzer()
        terms = [t for t, _ in phrase]
        offs = [p for _, p in phrase]
        hits = []
        for i, text in enumerate(self.TEXTS):
            pos_of = {}
            for t, p, _, _ in token_stream(text, an):
                pos_of.setdefault(t, []).append(p)
            arrs = [np.asarray(pos_of.get(t, []), dtype=np.int64)
                    for t in terms]
            if any(len(a) == 0 for a in arrs):
                continue
            if sloppy_phrase_freq(arrs, offs, terms, slop) > 0:
                hits.append(i)
        return hits

    def _count_highlights(self, phrase, slop, fragment_size=40,
                          max_num_fragments=2):
        """Sum of positive-score groups over all hit docs — the
        reference tests' numHighlights."""
        from lucene_solr_spark.search.classic_highlighter import (
            extract_weighted_span_terms,
        )

        an = self._analyzer()
        n = {"count": 0}

        def fmt(tok, tot):
            if tot <= 0:
                return tok
            n["count"] += 1
            return "<B>" + tok + "</B>"

        for i in self._hits(phrase, slop):
            text = self.TEXTS[i]
            w = extract_weighted_span_terms(
                [("phrase", tuple(phrase), 1.0, slop)],
                token_stream(text, an))
            get_best_text_fragments(
                text, w, an, fragment_size=fragment_size,
                max_num_fragments=max_num_fragments, formatter=fmt)
        return n["count"]

    def test_default_field_slop3(self):
        """testHighlightingWithDefaultField (:208-233): slop-3 phrase
        (world, flatland), whole-text fragment markup."""
        from lucene_solr_spark.search.classic_highlighter import (
            extract_weighted_span_terms,
        )

        an = self._analyzer()
        s1 = ("I call our world Flatland, not because we call it so,")
        w = extract_weighted_span_terms(
            [("phrase", (("world", 0), ("flatland", 1)), 1.0, 3)],
            token_stream(s1, an))
        frags = get_best_text_fragments(
            s1, w, an, fragment_size=1 << 30, max_num_fragments=1)
        assert frags[0][0] == (
            "I call our <B>world</B> <B>Flatland</B>, not because we "
            "call it so,")

    def test_gapped_phrase_very_long_contains(self):
        """testSimpleQueryScorerPhraseHighlighting case 1 (:337-362):
        phrase very@0 long@1 contains@3 — the position gap converts
        to an UNORDERED slop-2 span near; 3 highlights."""
        assert self._count_highlights(
            [("very", 0), ("long", 1), ("contains", 3)], 0) == 3

    def test_gapped_phrase_piece_text_refers_kennedy(self):
        """case 2 (:364-391): piece@1 text@3 refers@4 kennedy@6 — 4
        highlights, the doc's LATER piece/text/kennedy occurrences
        outside the span stay unhighlighted."""
        assert self._count_highlights(
            [("piece", 1), ("text", 3), ("refers", 4),
             ("kennedy", 6)], 0) == 4

    def test_repeated_term_phrase_lets(self):
        """case 3 (:393-420): lets@0 lets@4 lets@8 lets@12 — repeated
        phrase terms through the span repeat machinery; 4
        highlights."""
        assert self._count_highlights(
            [("lets", 0), ("lets", 4), ("lets", 8), ("lets", 12)],
            0) == 4

    def test_sloppy_phrase_slop5(self):
        """testSimpleQueryScorerPhraseHighlighting2 (:520-545): slop-5
        (text, piece, long) — unordered matching (piece precedes text
        in both hit docs); 6 highlights across the two hits."""
        assert self._count_highlights(
            [("text", 0), ("piece", 1), ("long", 2)], 5) == 6

    def test_exact_phrase_xyz(self):
        """testSimpleQueryScorerPhraseHighlighting3 (:547-571): exact
        x y z on 'y z x y z a b' — ordered slop-0 path; 3 highlights,
        the leading y z pair unhighlighted."""
        assert self._count_highlights(
            [("x", 0), ("y", 1), ("z", 2)], 0) == 3


def test_repeating_terms_in_mult_booleans():
    """testRepeatingTermsInMultBooleans (HighlighterTest.java:286-336):
    two MUST sub-booleans whose phrases SHARE terms — (a b c d) and
    (b c g) over 'x y z a b c d e f g b c g'. b and c must carry the
    UNION of both phrases' spans (extract merge rule :302-318,
    wst.spans extend on existing entries); 7 positive groups."""
    import re

    from lucene_solr_spark.functions.analysis import AnalyzerSpec
    from lucene_solr_spark.search.classic_highlighter import (
        extract_weighted_span_terms,
    )

    an = AnalyzerSpec("mock_ws", re.compile(r"\S+").findall,
                      lowercase=False)
    content = "x y z a b c d e f g b c g"
    n = {"count": 0}

    def fmt(tok, tot):
        if tot <= 0:
            return tok
        n["count"] += 1
        return "<B>" + tok + "</B>"

    w = extract_weighted_span_terms(
        [("phrase", ("a", "b", "c", "d"), 1.0),
         ("phrase", ("b", "c", "g"), 1.0)],
        token_stream(content, an))
    # merged spans: b/c belong to both phrase matches
    assert sorted(w["b"].spans) == [(3, 6), (10, 12)]
    assert sorted(w["c"].spans) == [(3, 6), (10, 12)]
    assert sorted(w["a"].spans) == [(3, 6)]
    assert sorted(w["g"].spans) == [(10, 12)]
    get_best_text_fragments(content, w, an, fragment_size=1 << 30,
                            max_num_fragments=1, formatter=fmt)
    assert n["count"] == 7


class TestEncoderAndTails:
    """Encoder seam + two more HighlighterTest transfers."""

    def test_simple_html_encoder_rules(self):
        """SimpleHTMLEncoder.htmlEncode (SimpleHTMLEncoder.java:37-81):
        quote/amp/lt/gt entities, >= U+0080 as decimal entities."""
        from lucene_solr_spark.search.classic_highlighter import (
            simple_html_encoder as enc,
        )
        assert enc('"a" & <b> > c') == "&quot;a&quot; &amp; &lt;b&gt; &gt; c"
        assert enc("café") == "caf&#233;"
        assert enc("") == ""

    def test_encoding_applied_to_all_pieces(self):
        """testEncoding (:1479-1525) semantics: token, interstitial
        and trailing text all pass through the encoder, so stripping
        the <B> tags and decoding entities recovers the raw text."""
        import html

        raw = "\"Smith & sons' prices < 3 and >4\" claims article"
        frags = get_best_text_fragments(
            raw, {"smith": 1.0}, STD, fragment_size=2000,
            max_num_fragments=1, encoder="html")
        assert frags and "<B>Smith</B>" in frags[0][0]
        decoded = html.unescape(
            frags[0][0].replace("<B>", "").replace("</B>", ""))
        assert decoded == raw
        assert "&amp;" in frags[0][0] and "&lt;" in frags[0][0] \
            and "&gt;" in frags[0][0] and "&quot;" in frags[0][0]

    def test_off_by_one(self):
        """testOffByOne (:1013-1029): NullFragmenter, bracketed
        numerics flow through as unhighlighted text."""
        frags = get_best_text_fragments(
            "help me [54-65]", {"help": 1.0}, STD,
            fragmenter="null", max_num_fragments=1)
        assert frags == [("<B>help</B> me [54-65]", 1.0, 0)]

    def test_max_size_end_highlight(self):
        """testMaxSizeEndHighlight (:1385-1404): with
        maxDocCharsToAnalyze == len(text), the trailing stop-worded
        tail stays in the fragment."""
        import re

        from lucene_solr_spark.functions.analysis import AnalyzerSpec

        an = AnalyzerSpec("mock_stop_int", re.compile("[a-z]+").findall,
                         lowercase=True,
                         stopwords=frozenset({"in", "it"}))
        text = "this is a text with searchterm in it"
        frags = get_best_text_fragments(
            text, {"searchterm": 1.0}, an, fragmenter="null",
            max_num_fragments=1, max_chars=36)
        assert frags and frags[0][0].endswith("in it")
        assert "<B>searchterm</B>" in frags[0][0]


class TestQueryTermExtractor:
    """QueryTermExtractor port (QueryTermExtractor.java:46-108)."""

    def test_weights_from_query(self, spark, built):
        from lucene_solr_spark.search.classic_highlighter import (
            query_term_weights,
        )
        from lucene_solr_spark.search.executor import IndexSearcher

        index_dir, _ = built
        s = IndexSearcher(spark, index_dir)
        w = query_term_weights(s, '+seven hundred^2.0 -thousand')
        assert w == {"seven": 1.0, "hundred": 2.0}
        wp = query_term_weights(s, '+seven hundred^2.0 -thousand',
                                prohibited=True)
        assert wp == {"seven": 1.0, "hundred": 2.0, "thousand": 1.0}
        # phrase terms contribute at the clause boost; duplicate keeps
        # the highest weight
        w2 = query_term_weights(s, 'seven "seven hundred"^3.0')
        assert w2 == {"seven": 3.0, "hundred": 3.0}

    def test_idf_weighted(self, spark, built):
        import math

        import numpy as np

        from lucene_solr_spark.search.classic_highlighter import (
            query_term_weights,
        )
        from lucene_solr_spark.search.executor import IndexSearcher

        index_dir, _ = built
        s = IndexSearcher(spark, index_dir)
        w = query_term_weights(s, "seven", idf_weighted=True)
        df = s._lookup_dfs(["seven"])["seven"]
        exp = float(np.float32(
            1.0 * np.float32(math.log(s.max_doc / (df + 1)) + 1.0)))
        assert w == {"seven": exp}

    def test_classic_highlight_defaults_to_extractor(self, spark, built,
                                                     small_corpus):
        """classic_highlight with NEITHER weights nor clauses mirrors
        Highlighter(new QueryTermScorer(query))."""
        from lucene_solr_spark.search.classic_highlighter import (
            classic_highlight,
        )
        from lucene_solr_spark.search.executor import IndexSearcher

        index_dir, _ = built
        s = IndexSearcher(spark, index_dir)
        docs_sorted = sorted(
            small_corpus, key=lambda r: (r["repo"], r["path"], r["commit"]))
        store = spark.createDataFrame(
            [(i, r["content"]) for i, r in enumerate(docs_sorted)],
            "doc_id long, content string")
        out = classic_highlight(
            s, store, "hundred", text_col="content", k=3,
            fragment_size=10**6, max_num_fragments=1).collect()
        assert out
        for r in out:
            assert "<B>hundred</B>" in r["fragments"][0]
