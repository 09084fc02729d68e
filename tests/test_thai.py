"""ThaiAnalyzer default chain gates — the reference's own
TestThaiAnalyzer vectors (lucene/analysis/common/src/test/org/apache/
lucene/analysis/th/TestThaiAnalyzer.java) run through th_default
(StandardTokenizer → LowerCase → ThaiWordFilter(libthai) →
StopFilter). Skipped wholesale when the platform segmenter is absent,
exactly like the reference's DBBI_AVAILABLE assumeTrue (:44-46)."""

import pytest

from lucene_solr_spark.functions.analysis import get_analyzer
from lucene_solr_spark.functions.thai import (
    is_thai_leading,
    thai_available,
    thai_segment,
)

pytestmark = pytest.mark.skipif(
    not thai_available(),
    reason="platform Thai segmenter (libthai) not available")

TH = "การที่ได้ต้องแสดงว่างานดี"


def _an():
    return get_analyzer("th_default")


def test_segment_probe():
    assert thai_segment("ภาษาไทย") == ["ภาษา", "ไทย"]
    assert is_thai_leading("ภาษา") and not is_thai_leading("abc")


def test_offsets_segmentation():
    """testOffsets (:50-56) segmentation (empty stop set there; the
    stop-free token sequence is the same vector)."""
    words = [w for tok in (TH,) for w in thai_segment(tok)]
    assert words == ["การ", "ที่", "ได้", "ต้อง",
                     "แสดง", "ว่า", "งาน", "ดี"]


def test_stopwords_and_positions():
    """testStopWords (:58-64): default th stop set removes
    การ/ที่/ได้/ต้อง/ว่า leaving (แสดง,4) (งาน,6) (ดี,7) — position
    increments 5, 2, 1."""
    tp = _an().analyze_with_positions(TH)
    assert tp == [("แสดง", 4), ("งาน", 6), ("ดี", 7)]


def test_mixed_script_reuse_vector():
    """testReusableTokenStream (:96-108): Thai + Latin + email; the
    chain lowercases Latin and splits only Thai-leading tokens."""
    out = _an().analyze("บริษัทชื่อ XY&Z - คุยกับ xyz@demo.com")
    # กับ is in the default th stop set (StopFilter runs AFTER the
    # split); the reference vector there uses an EMPTY stop set, so
    # compare against the stop-filtered expectation
    assert out == ["บริษัท", "ชื่อ", "xy", "z",
                   "คุย", "xyz", "demo.com"]


def test_mixed_script_positions_with_english_stop():
    """testPositionIncrements (:79-94) shape: a stopped English token
    between Thai runs leaves exactly one position hole."""
    tp = _an().analyze_with_positions("การที่ได้ต้อง the แสดงว่างานดี")
    # การ/ที่/ได้/ต้อง are th stopwords (positions 0-3), 'the' is NOT
    # in the th set so it surfaces at position 4
    assert ("the", 4) in tp
    assert ("แสดง", 5) in tp and ("งาน", 7) in tp and ("ดี", 8) in tp


def test_numeric_token_passthrough():
    """testTokenType (:66-75): Thai digits tokenize as one <NUM>-ish
    token, not segmented."""
    out = _an().analyze(TH + " ๑๒๓")
    assert out[-1] == "๑๒๓"


def test_determinism_and_empty():
    a = _an()
    assert a.analyze("") == []
    s = "ภาษาไทย การ kennedy ๑๒๓ ภาษาไทย"
    assert a.analyze(s) == a.analyze(s)
    tp = a.analyze_with_positions(s)
    poss = [p for _, p in tp]
    assert poss == sorted(poss) and len(set(poss)) == len(poss)
