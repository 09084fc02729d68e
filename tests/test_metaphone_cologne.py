"""Metaphone + ColognePhonetic encoder gates (PhoneticFilterFactory.java
:48-49 registry rows "Metaphone" and "ColognePhonetic"; commons-codec
Metaphone.java / ColognePhonetic.java semantics).

Three layers, no Spark needed:
  1. published commons-codec test vectors (MetaphoneTest.java /
     ColognePhoneticTest.java);
  2. branch-targeted hand vectors for the commons quirks (initial-pair
     transforms, CH-consonant rule, DGE triple consume, X -> '48');
  3. a DuckDB duel: the entry's recursive-CTE oracle SQL replayed over
     an adversarial word list must match the Python encoder bit-exactly.
"""

import random
import string

import duckdb
import pytest

from lucene_solr_spark.functions.phonetic import (cologne_phonetic,
                                                  metaphone)


METAPHONE_VECTORS = [
    # commons-codec MetaphoneTest.java
    ("howl", "HL"), ("testing", "TSTN"), ("The", "0"), ("quick", "KK"),
    ("brown", "BRN"), ("fox", "FKS"), ("jumped", "JMPT"),
    ("over", "OFR"), ("the", "0"), ("lazy", "LS"), ("dogs", "TKS"),
    # branch-targeted
    ("knight", "NT"),        # KN- initial drop, silent GH
    ("gnome", "NM"),         # GN- initial drop
    ("pneumonia", "NMN"),    # PN- initial drop
    ("wrack", "RK"),         # WR- initial drop
    ("aeon", "EN"),          # AE- initial drop
    ("xylophone", "SLFN"),   # initial X -> S
    ("whale", "WL"),         # WH- -> W
    ("dodge", "TJ"),         # DGE triple consume
    ("school", "SKL"),       # SCH -> K
    ("science", "SNS"),      # SC + frontv: C silent
    ("nation", "NXN"),       # TIO -> X
    ("match", "MX"),         # TCH: T silent, CH -> X
    ("box", "BKS"),          # X -> KS
    ("a", "A"), ("x", "X"),  # single char returns uppercase verbatim
]

COLOGNE_VECTORS = [
    # commons-codec ColognePhoneticTest.java / Postel's examples
    ("Müller-Lüdenscheidt", "65752682"), ("Breschnew", "17863"),
    ("Wikipedia", "3412"), ("peter", "127"), ("pharma", "376"),
    ("mönchengladbach", "664645214"), ("deutsch", "28"),
    ("deutz", "28"), ("hamburg", "06174"),
    ("christstollen", "478256"), ("Xanthippe", "48621"),
    ("Zacharias", "8478"), ("Holzbau", "0581"), ("matsch", "68"),
    ("matz", "68"), ("Arbeitsamt", "071862"), ("Eberhard", "01772"),
    ("Eberhardt", "01772"), ("heithabu", "021"), ("Aabjoe", "01"),
    ("Aaclan", "0856"),
]


@pytest.mark.parametrize("word,code", METAPHONE_VECTORS)
def test_metaphone_vectors(word, code):
    assert metaphone(word) == code


@pytest.mark.parametrize("word,code", COLOGNE_VECTORS)
def test_cologne_vectors(word, code):
    assert cologne_phonetic(word) == code


def test_metaphone_cap_and_empty():
    assert metaphone("") == ""
    assert metaphone("supercalifragilistic") == metaphone(
        "supercalifragilistic")[:4]
    assert len(metaphone("xylophones")) <= 4


def test_cologne_terminal_c_and_nonletters():
    # '' in "AHK..." is True in Python — the regression this guards:
    # a terminal C has no next letter and must take the 8 branch
    assert cologne_phonetic("c") == "8"
    assert cologne_phonetic("potfc") == "1238"
    assert cologne_phonetic("123") == ""


def _oracle_duel(entry_name, encoder, seed):
    import lucene_solr_spark.driver_entry as de

    words = [
        "dodge", "knight", "gnome", "pneumonia", "wrack", "whale",
        "xylophone", "aeon", "school", "science", "christopher",
        "ache", "match", "thought", "laughing", "signed", "magnet",
        "shack", "mission", "nation", "pitch", "the", "with", "xx",
        "x", "a", "q", "comb", "phone", "quick", "czar", "knuckle",
        "way", "you", "hymn", "rhythm", "schedule", "chrome", "watch",
        "patio", "vision", "war", "edge", "midget", "w", "h", "c",
        "deutsch", "holzbau",
    ]
    rng = random.Random(seed)
    for _ in range(300):
        n = rng.randint(1, 12)
        words.append("".join(
            rng.choice(string.ascii_lowercase) for _ in range(n)))
    for _ in range(60):
        n = rng.randint(1, 10)
        words.append("".join(
            rng.choice(string.ascii_lowercase + "_0123456789")
            for _ in range(n)))
    words = sorted(set(words))

    con = duckdb.connect()
    con.execute("SET threads=2")
    con.execute("CREATE TABLE documents(text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?)",
                    [(w,) for w in words])
    rows = con.execute(de.ORACLES[entry_name]).fetchall()
    assert len(rows) == len(words)
    bad = [(t, c, encoder(t)) for t, c in rows if c != encoder(t)]
    assert not bad, bad[:10]


def test_metaphone_oracle_duel():
    _oracle_duel("metaphone_codes", metaphone, 1234)


def test_cologne_oracle_duel():
    _oracle_duel("cologne_codes", cologne_phonetic, 5678)
