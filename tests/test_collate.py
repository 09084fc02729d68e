"""PossibilityIterator + SpellCheckCollator golden gates, ported from
solr/core/src/test/org/apache/solr/spelling/SpellPossibilityIteratorTest.java
(exact counts and first-combination assertions) plus hand-traced
getCollation vectors from SpellCheckCollatorTest scenarios."""

import pytest

from lucene_solr_spark.search.collate import (
    PossibilityIterator,
    SpellCheckCorrection,
    Token,
    TERM_IN_BOOLEAN_QUERY_FLAG,
    collate,
    get_collation,
)

TOKEN_AYE = Token("AYE", 0, 3)
TOKEN_BEE = Token("BEE", 4, 7)
TOKEN_AYE_BEE = Token("AYE BEE", 0, 7)
TOKEN_CEE = Token("CEE", 8, 11)

AYE = [(w, 0) for w in
       ["I", "II", "III", "IV", "V", "VI", "VII", "VIII"]]
BEE = [(w, 0) for w in
       ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
        "theta", "iota"]]
AYE_BEE = [(w, 0) for w in
           ["one-alpha", "two-beta", "three-gamma", "four-delta",
            "five-epsilon", "six-zeta", "seven-eta", "eight-theta",
            "nine-iota"]]
CEE = [(w, 0) for w in
       ["one", "two", "three", "four", "five", "six", "seven",
        "eight", "nine", "ten"]]


def test_possibility_iterator_counts_and_first():
    # SpellPossibilityIteratorTest.testSpellPossibilityIterator
    suggestions = [(TOKEN_AYE, AYE), (TOKEN_BEE, BEE), (TOKEN_CEE, CEE)]
    it = PossibilityIterator(suggestions, 1000, 10000, False)
    combos = list(it)
    assert combos[0].corrections[0].correction == "I"
    assert combos[0].corrections[1].correction == "alpha"
    assert combos[0].corrections[2].correction == "one"
    assert len(combos) == 720  # 8*9*10

    it = PossibilityIterator(suggestions[:2], 100, 10000, False)
    assert len(list(it)) == 72  # 8*9

    it = PossibilityIterator(suggestions[:1], 5, 10000, False)
    assert len(list(it)) == 5  # capped at maximumRequiredSuggestions

    it = PossibilityIterator([], 2 ** 31 - 1, 10000, False)
    assert len(list(it)) == 0


def test_possibility_iterator_scalability():
    # SpellPossibilityIteratorTest.testScalability
    lots = []
    for n in range(5):
        sfx = "" if n == 0 else str(n)
        lots.append((Token("AYE" + sfx, 0, 3), AYE))
        lots.append((Token("BEE" + sfx, 4, 7), BEE))
        lots.append((Token("CEE" + sfx, 8, 11), CEE))
    it = PossibilityIterator(lots, 1000, 10000, False)
    assert len(list(it)) == 1000

    for n in range(1, 5):
        lots.append((Token("AYE_BEE" + str(n), 0, 7), AYE_BEE))
    it = PossibilityIterator(lots, 1000, 10000, True)
    assert len(list(it)) < 100


def test_possibility_iterator_overlap():
    # SpellPossibilityIteratorTest.testOverlappingTokens
    overlapping = [(TOKEN_AYE, AYE), (TOKEN_BEE, BEE),
                   (TOKEN_AYE_BEE, AYE_BEE), (TOKEN_CEE, CEE)]
    it = PossibilityIterator(
        overlapping, 2 ** 31 - 1, 2 ** 31 - 1, True)
    a_count = 0
    ab_count = 0
    seen = set()
    n = 0
    for rsp in it:
        n += 1
        a = b = ab = c = None
        for scc in rsp.corrections:
            if scc.original is TOKEN_AYE:
                a = scc.original
            elif scc.original is TOKEN_BEE:
                b = scc.original
            elif scc.original is TOKEN_AYE_BEE:
                ab = scc.original
            elif scc.original is TOKEN_CEE:
                c = scc.original
            if ab is not None:
                ab_count += 1
            else:
                a_count += 1
        assert c is not None
        assert ab is not None or (a is not None and b is not None)
        assert ab is None or (a is None and b is None)
        key = tuple(id(x) for x in rsp.corrections)
        assert key not in seen
        seen.add(key)
    assert a_count == 2160
    assert ab_count == 180


def test_ranks_are_sum_of_indices_and_order():
    suggestions = [(TOKEN_AYE, AYE[:3]), (TOKEN_BEE, BEE[:3])]
    it = PossibilityIterator(suggestions, 1000, 10000, False)
    combos = list(it)
    assert len(combos) == 9
    ranks = [c.rank for c in combos]
    assert ranks == sorted(ranks)  # best-first
    assert ranks == [0, 1, 1, 2, 2, 2, 3, 3, 4]
    # rank == sum of the selected suggestion indices
    for c in combos:
        idx_sum = 0
        for corr in c.corrections:
            pool = AYE if corr.original is TOKEN_AYE else BEE
            idx_sum += [w for w, _ in pool].index(corr.correction)
        assert idx_sum == c.rank


def test_max_evaluations_cuts_odometer_tail():
    # Odometer order: last token's index fastest. 4 evaluations of the
    # 3x3 grid evaluate (0,0) (0,1) (0,2) (1,0) only.
    suggestions = [(TOKEN_AYE, AYE[:3]), (TOKEN_BEE, BEE[:3])]
    it = PossibilityIterator(suggestions, 1000, 4, False)
    combos = [(c.corrections[0].correction, c.corrections[1].correction)
              for c in it]
    assert set(combos) == {("I", "alpha"), ("I", "beta"),
                           ("I", "gamma"), ("II", "alpha")}


def test_for_real_filter_drops_identity_combo():
    tok = Token("alpha", 0, 5)
    suggestions = [(tok, [("alpha", 3), ("beta", 2)])]
    it = PossibilityIterator(suggestions, 10, 100, False)
    combos = list(it)
    assert [c.corrections[0].correction for c in combos] == ["beta"]


def test_get_collation_simple_replacement():
    q = "tabel windoq"
    corrections = [
        SpellCheckCorrection(Token("tabel", 0, 5), "table", 1),
        SpellCheckCorrection(Token("windoq", 6, 12), "window", 1),
    ]
    assert get_collation(q, corrections) == "table window"


def test_get_collation_growing_and_shrinking():
    q = "aa bb cc"
    corrections = [
        SpellCheckCorrection(Token("aa", 0, 2), "aaaa", 1),
        SpellCheckCorrection(Token("cc", 6, 8), "c", 1),
    ]
    assert get_collation(q, corrections) == "aaaa bb c"


def test_get_collation_word_break_parenthesis():
    # correction containing a space -> wrapped in parens; preceding '+'
    # replicated onto each broken word, hoisted inside the paren, and
    # the original operator consumed via the oneForReqOrProhib start
    # shift (SpellCheckCollator.java:199-231 traced by hand)
    q = "+portable notebooks"
    corrections = [
        SpellCheckCorrection(Token("portable", 1, 9), "port able", 1),
    ]
    assert get_collation(q, corrections) == "(+port +able) notebooks"


def test_get_collation_word_break_boolean_and():
    q = "portable AND notebooks"
    corrections = [
        SpellCheckCorrection(
            Token("portable", 0, 8, flags=TERM_IN_BOOLEAN_QUERY_FLAG),
            "port able", 1),
    ]
    assert get_collation(q, corrections) == \
        "(port AND able) AND notebooks"


def test_get_collation_pos_inc_zero_skipped():
    q = "tabel windoq"
    corrections = [
        SpellCheckCorrection(Token("tabel", 0, 5, pos_inc=0), "table", 1),
        SpellCheckCorrection(Token("windoq", 6, 12), "window", 1),
    ]
    assert get_collation(q, corrections) == "tabel window"


def test_collate_verify_loop():
    suggestions = [
        (Token("tabel", 0, 5), [("table", 5), ("label", 2)]),
        (Token("windoq", 6, 12), [("window", 4), ("windows", 1)]),
    ]
    hit_map = {
        "table window": 7,
        "table windows": 0,
        "label window": 2,
        "label windows": 1,
    }
    out = collate(suggestions, "tabel windoq", hit_map.__getitem__,
                  max_collations=10, max_collation_tries=10)
    assert [(c.collation_query, c.hits, c.internal_rank)
            for c in out] == [
        ("table window", 7, 0),
        ("label window", 2, 1),
        ("label windows", 1, 2),
    ]
    # maxTries doubles as maximumRequiredSuggestions: the possibility
    # queue itself is capped at 2, so only the two best-rank combos
    # surface and the 0-hit one is dropped by verification
    out = collate(suggestions, "tabel windoq", hit_map.__getitem__,
                  max_collations=10, max_collation_tries=2)
    assert [c.collation_query for c in out] == ["table window"]
    # maxTries < 1 -> no verification, iterate up to maxCollations
    out = collate(suggestions, "tabel windoq", None,
                  max_collations=2, max_collation_tries=0)
    assert [(c.collation_query, c.hits) for c in out] == [
        ("table window", 0), ("table windows", 0)]


def test_collate_max_collations_stops_early():
    suggestions = [
        (Token("tabel", 0, 5), [("table", 5), ("label", 2)]),
    ]
    calls = []

    def counter(q):
        calls.append(q)
        return 3

    out = collate(suggestions, "tabel", counter,
                  max_collations=1, max_collation_tries=10)
    assert [c.collation_query for c in out] == ["table"]
    assert calls == ["table"]


def test_conjunction_spellchecker_merge():
    """ConjunctionSolrSpellChecker.mergeCheckers (:96-142) —
    round-robin interleave in checker order, numSug cap, last-wins
    token frequencies, exhausted-checkers early stop."""
    from lucene_solr_spark.search.collate import (
        conjunction_merge_spelling)

    a = ({"helo": [("hello", 10), ("help", 5)],
          "wrld": [("world", 9)]},
         {"helo": 1})
    b = ({"helo": [("halo", 7), ("held", 3), ("helm", 2)]},
         {"helo": 4, "wrld": 2})
    merged, tf = conjunction_merge_spelling([a, b], num_sug=4)
    # pass 1: hello (a), halo (b); pass 2: help (a), held (b) -> cap
    assert merged["helo"] == [("hello", 10), ("halo", 7),
                              ("help", 5), ("held", 3)]
    # single-checker token passes through; early stop when dry
    assert merged["wrld"] == [("world", 9)]
    # putAll order: b's frequency for helo wins
    assert tf == {"helo": 4, "wrld": 2}
    # cap smaller than one pass
    merged2, _ = conjunction_merge_spelling([a, b], num_sug=1)
    assert merged2["helo"] == [("hello", 10)]
