"""Turkish / Greek / Irish lowercase filters — reference vectors from
TestTurkishLowerCaseFilter, TestGreekLowerCaseFilterFactory,
TestIrishLowerCaseFilter + GreekAnalyzerTest."""

from lucene_solr_spark.functions.lowercase import (
    greek_lowercase,
    greek_lowercase_post,
    irish_lowercase,
    turkish_lowercase,
)


def test_turkish_composed():
    """testTurkishLowerCaseFilter: composed dotted capital I."""
    assert turkish_lowercase("İSTANBUL") == "istanbul"
    assert turkish_lowercase("İZMİR") == "izmir"
    assert turkish_lowercase("ISPARTA") == "ısparta"


def test_turkish_decomposed():
    """testDecomposed: I + combining dot above == dotted i."""
    assert turkish_lowercase("İSTANBUL") == "istanbul"
    assert turkish_lowercase("İZMİR") == "izmir"


def test_turkish_decomposed_with_extra_accents():
    """testDecomposed2: other NSMs may sit between I and the dot; a
    plain I with a non-dot NSM stays dotless."""
    assert (turkish_lowercase("İ̖STANBUL")
            == "i̖stanbul")
    assert turkish_lowercase("I̖SPARTA") == "ı̖sparta"


def test_turkish_decomposed3():
    """testDecomposed3: bare I + dot -> just 'i' (dot deleted)."""
    assert turkish_lowercase("İ") == "i"


def test_greek_normalization_vector():
    """TestGreekLowerCaseFilterFactory.testNormalization."""
    assert greek_lowercase("Μάϊος") == "μαιοσ"
    assert greek_lowercase("ΜΆΪΟΣ") == "μαιοσ"


def test_greek_switch_completeness():
    """Every case of the GreekLowerCaseFilter.lowerCase switch
    (:67-127), including the U+03A2 reserved compat branch."""
    pairs = {
        0x3C2: 0x3C3, 0x386: 0x3B1, 0x3AC: 0x3B1, 0x388: 0x3B5,
        0x3AD: 0x3B5, 0x389: 0x3B7, 0x3AE: 0x3B7, 0x38A: 0x3B9,
        0x3AA: 0x3B9, 0x3AF: 0x3B9, 0x3CA: 0x3B9, 0x390: 0x3B9,
        0x38E: 0x3C5, 0x3AB: 0x3C5, 0x3CD: 0x3C5, 0x3CB: 0x3C5,
        0x3B0: 0x3C5, 0x38C: 0x3BF, 0x3CC: 0x3BF, 0x38F: 0x3C9,
        0x3CE: 0x3C9, 0x3A2: 0x3C2,
    }
    for src, dst in pairs.items():
        assert greek_lowercase(chr(src)) == chr(dst), hex(src)
    # plain capitals take the default per-codepoint lowercase
    assert greek_lowercase("ΑΒΓ") == "αβγ"


def test_irish_vectors():
    """TestIrishLowerCaseFilter: n-eclipsis, t-prothesis, h is not
    prothetic; fada vowels count; lowercase n/t before lowercase
    vowel untouched."""
    assert irish_lowercase("nAthair") == "n-athair"
    assert irish_lowercase("tUISCE") == "t-uisce"
    assert irish_lowercase("hARD") == "hard"
    assert irish_lowercase("nÁIT") == "n-áit"
    assert irish_lowercase("nathair") == "nathair"
    assert irish_lowercase("t") == "t"
    assert irish_lowercase("") == ""


def test_post_adapter_preserves_positions():
    post = greek_lowercase_post()
    assert post([("ΜΆΪΟΣ", 0), ("x", 2)]) == [("μαιοσ", 0), ("x", 2)]
