"""Gates for the PhoneticFilterFactory encoder pack: DoubleMetaphone
(functions/dmetaphone.py), RefinedSoundex and Caverphone 2.0
(functions/phonetic.py). Vectors: the reference's own
DoubleMetaphoneFilterTest.java cases, plus published commons-codec /
algorithm-paper vectors."""

import pytest

from lucene_solr_spark.functions.dmetaphone import double_metaphone
from lucene_solr_spark.functions.phonetic import (
    caverphone2,
    double_metaphone_post,
    generic_phonetic_post,
    refined_soundex,
)


class TestDoubleMetaphone:
    # DoubleMetaphoneFilterTest.java vectors
    def test_reference_filter_vectors(self):
        assert double_metaphone("international", 4) == ("ANTR", None)
        assert double_metaphone("international", 8) == ("ANTRNXNL", None)
        assert double_metaphone("Kuczewski", 4) == ("KSSK", "KXFS")
        assert double_metaphone("hello", 8) == ("HL", None)

    def test_non_convertible(self):
        assert double_metaphone("12345", 8) == ("", None)
        assert double_metaphone("#$%@#^%&", 8) == ("", None)
        assert double_metaphone("", 4) == ("", None)

    # published algorithm vectors (Philips CUJ 2000 examples and the
    # widely-reproduced commons-codec test set)
    @pytest.mark.parametrize("word,primary,alternate", [
        ("Smith", "SM0", "XMT"),
        ("Schmidt", "XMT", "SMT"),
        ("Jose", "HS", None),
        ("maurice", "MRS", None),
        ("cambrillo", "KMPR", None),
        ("otto", "AT", None),
        ("aubrey", "APR", None),
        ("Xavier", "SF", "SFR"),
        ("Wasserman", "ASRM", "FSRM"),
        ("Tymczak", "TMSK", "TMXK"),
        ("knight", "NT", None),
        ("ghost", "KST", None),
        ("accident", "AKST", None),
        ("michael", "MKL", "MXL"),
        ("Filipowicz", "FLPT", "FLPF"),
        ("Thompson", "TMPS", None),
        ("edge", "AJ", None),
        ("edgar", "ATKR", None),
        ("school", "SKL", None),
        ("thames", "TMS", None),
    ])
    def test_public_vectors(self, word, primary, alternate):
        assert double_metaphone(word, 4) == (primary, alternate)

    def test_case_and_whitespace_insensitive(self):
        assert double_metaphone(" SMITH ") == double_metaphone("smith")

    def test_filter_inject_semantics(self):
        post = double_metaphone_post(4, inject=True)
        out = post([("international", 0), ("12345", 1)])
        assert out == [("international", 0), ("ANTR", 0), ("12345", 1)]
        out = post([("kuczewski", 0)])
        assert out == [("kuczewski", 0), ("KSSK", 0), ("KXFS", 0)]

    def test_filter_replace_semantics(self):
        post = double_metaphone_post(4, inject=False)
        assert post([("hello", 0), ("#$%", 1)]) == [("HL", 0), ("#$%", 1)]


class TestRefinedSoundex:
    # commons-codec RefinedSoundexTest.testEncode vectors
    @pytest.mark.parametrize("word,code", [
        ("testing", "T6036084"),
        ("TESTING", "T6036084"),
        ("The", "T60"),
        ("quick", "Q503"),
        ("brown", "B1908"),
        ("fox", "F205"),
        ("jumped", "J408106"),
        ("over", "O0209"),
        ("lazy", "L7050"),
        ("dogs", "D6043"),
    ])
    def test_vectors(self, word, code):
        assert refined_soundex(word) == code

    def test_empty(self):
        assert refined_soundex("") == ""
        assert refined_soundex("123") == ""


class TestCaverphone2:
    # spec examples (Hood 2004) + commons-codec Caverphone2Test
    @pytest.mark.parametrize("word,code", [
        ("Peter", "PTA1111111"),
        ("Stevenson", "STFNSN1111"),
        ("Thompson", "TMPSN11111"),
        ("David", "TFT1111111"),
        ("Whittle", "WTA1111111"),
        ("Carlene", "KLN1111111"),
    ])
    def test_vectors(self, word, code):
        assert caverphone2(word) == code

    def test_length_always_10(self):
        for w in ("a", "", "superlongwordindeed", "zzz"):
            assert len(caverphone2(w)) == 10

    def test_generic_post_inject(self):
        post = generic_phonetic_post(caverphone2, inject=True)
        out = post([("peter", 0)])
        assert out == [("peter", 0), ("PTA1111111", 0)]
