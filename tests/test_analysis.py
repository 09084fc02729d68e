"""Analyzer golden vectors (FIXTURES.md section 4), mirroring the
reference's assertTokenStreamContents pinning style
(lucene/test-framework/.../analysis/BaseTokenStreamTestCase.java:114-254,
lucene/analysis/common/src/test/.../core/TestStandardAnalyzer.java).
"""

import pytest

from lucene_solr_spark.functions.analysis import (
    analyze,
    analyze_with_positions,
    tokenize,
    tokenize_series,
)

VECTORS = [
    ("foo_bar_baz", ["foo_bar_baz"]),              # _ = ExtendNumLet (WB13a/b)
    ("a.b(c)", ["a.b", "c"]),                       # . = MidNumLet between letters
    ("SHA256 == sha-256", ["sha256", "sha", "256"]),  # digits+letters fuse; - splits
    ("don't", ["don't"]),                           # ' = MidNumLet (Unicode 6.1)
    ("x+y", ["x", "y"]),
    ("1_000", ["1_000"]),
    ("wi.fi 3.14 v1.2.3", ["wi.fi", "3.14", "v1.2.3"]),
    ("0x1F", ["0x1f"]),
    ("a;b", ["b"]),                                  # 'a' is a stopword
    ("+-*/ && || ...", []),                          # pure operators vanish
    ("tab\tnew\nline", ["tab", "new", "line"]),
]


@pytest.mark.parametrize("text,expected", VECTORS)
def test_golden_vectors(text, expected):
    assert analyze(text) == expected


def test_stopfilter_position_holes():
    # 'the quick if not' -> [quick@1]; StopFilter keeps increments
    assert analyze_with_positions("the quick if not") == [("quick", 1)]


def test_overlong_token_skipped_but_position_advances():
    text = "y " + "x" * 256 + " z"
    assert analyze_with_positions(text) == [("y", 0), ("z", 2)]
    assert analyze("x" * 256) == []
    # exactly 255 chars is kept (StandardAnalyzer.java:58 boundary)
    assert analyze("x" * 255) == ["x" * 255]


def test_cjk():
    # Han: one token per ideograph (WB14); Hiragana: per char;
    # Katakana: runs kept together (WB13)
    assert tokenize("你好") == ["你", "好"]
    assert tokenize("ひらがな") == ["ひ", "ら", "が", "な"]
    assert tokenize("カタカナ") == ["カタカナ"]


def test_fullwidth_digits_are_num():
    assert tokenize("１２３") == ["１２３"]


def test_stopword_set_is_33_words():
    from lucene_solr_spark.constants import STOPWORDS

    assert len(STOPWORDS) == 33
    assert "the" in STOPWORDS and "quick" not in STOPWORDS


def test_batch_equals_scalar(small_corpus):
    texts = [r["content"] for r in small_corpus[:50]]
    assert tokenize_series(texts) == [analyze(t) for t in texts]


def test_ascii_fast_path_equivalence():
    """The ASCII fast path must reproduce the full UAX#29 pattern's
    output exactly — random adversarial strings over the delimiter/mid
    alphabet plus pinned fixtures."""
    import random

    from lucene_solr_spark.functions.analysis import (
        TOKEN_PATTERN,
        _findall_ascii,
        findall_tokens,
    )

    rng = random.Random(17)
    alphabet = list("abzAZ09_.,:;'()+= -\t\n/\\\"#!|&*<>[]{}~`?%^@$")
    for _ in range(5000):
        s = "".join(
            rng.choice(alphabet) for _ in range(rng.randint(0, 48))
        )
        assert _findall_ascii(s) == TOKEN_PATTERN.findall(s), repr(s)
    for s in ["foo_bar_baz", "a.b", "a..b", "wi.fi's", "1,000.5",
              "a:b:c", "_x_", "___", "sha256", "don't", "a.1", "1.a",
              "x,;y", "a_.b", "3.14.15", "1_000", "::a::", "_9_a_"]:
        assert _findall_ascii(s) == TOKEN_PATTERN.findall(s), s
    # non-ASCII routes through the full pattern
    assert findall_tokens("héllo wörld") == TOKEN_PATTERN.findall(
        "héllo wörld"
    )


# ---------------------------------------------------------------------------
# analysis introspection (FieldAnalysisRequestHandler analogue): the
# final reported stage must ALWAYS equal analyze_with_positions — the
# debugger view cannot drift from what the index build executes.
# ---------------------------------------------------------------------------

def test_analyze_stages_final_equals_execution():
    from lucene_solr_spark.functions.analysis import (
        analyze_stages, get_analyzer,
    )

    texts = [
        "The Quick a brown FOX",
        "",
        "x" * 300 + " tail",          # over-long token leaves a hole
        "3.5 O'Neil can't the-end",
        "MiXeD CaSe AND such that",
        "naïve café déjà-vu",          # non-ASCII path
    ]
    for name in ("standard", "whitespace", "simple", "stop", "keyword",
                 "english"):
        spec = get_analyzer(name)
        for text in texts:
            st = analyze_stages(spec, text)
            want = spec.analyze_with_positions(text)
            if not st:
                assert want == []
                continue
            last = max(s for s, _, _, _ in st)
            got = [(t, p) for s, _, p, t in st if s == last]
            assert got == want, (name, text, got, want)


def test_analyze_stages_order_and_holes():
    from lucene_solr_spark.functions.analysis import (
        analyze_stages, get_analyzer,
    )

    st = analyze_stages(get_analyzer("stop"), "The Quick a brown FOX")
    names = []
    for _, n, _, _ in st:
        if n not in names:
            names.append(n)
    assert names == ["tokenizer", "lowercase", "stop"]
    stop_stage = [(p, t) for s, n, p, t in st if n == "stop"]
    # 'the'(0) and 'a'(2) dropped, positions 1,3,4 survive as holes
    assert stop_stage == [(1, "quick"), (3, "brown"), (4, "fox")]
