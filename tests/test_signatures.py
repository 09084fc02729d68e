"""TextProfileSignature gates — pure-Python re-derivation of
solr/update/processor/TextProfileSignature.java as the oracle for the
Catalyst expression in lucene_solr_spark/signatures.py."""

import hashlib
import math
import re
from collections import Counter

import numpy as np
import pytest

from lucene_solr_spark.signatures import text_profile_signature


def _py_profile_sig(content: str, quant_rate: float = 0.01,
                    min_token_len: int = 2):
    """Line-by-line port of TextProfileSignature.add/getSignature
    semantics (token scan :73-106, QUANT :110-116, quantize :118-125,
    profile join :127-135) with the documented deterministic tie-break
    (token asc) replacing HashMap order."""
    toks = [t for t in re.findall(r"[^\W_]+", content.lower())
            if len(t) > min_token_len]
    cnt = Counter(toks)
    maxf = max(cnt.values()) if cnt else 0
    quant = int(math.floor(np.float32(maxf) * np.float32(quant_rate)
                           + 0.5))
    if quant < 2:
        quant = 2 if maxf > 1 else 1
    prof = []
    for tok, c in cnt.items():
        qc = (c // quant) * quant
        if qc >= quant:
            prof.append((tok, qc))
    prof.sort(key=lambda tc: (-tc[1], tc[0]))
    profile = "\n".join(f"{t} {c}" for t, c in prof)
    return hashlib.md5(profile.encode("utf-8")).hexdigest(), len(prof)


CASES = [
    "The quick brown fox jumps over the lazy dog the the the",
    "a bb ccc dddd ccc ccc bb a",          # len<=2 tokens dropped
    "one-token",                            # hyphen splits
    "",                                     # empty -> md5('')
    "xy zz a b c",                          # everything filtered out
    "Repeat repeat REPEAT tail tail word",  # case folding + counts
    ("license " * 250) + "unique tail words here",  # maxf 250: QUANT=2+
]


def test_text_profile_matches_python_port(spark):
    df = spark.createDataFrame([(i, c) for i, c in enumerate(CASES)],
                               "doc_id int, text string")
    s = text_profile_signature("text")
    got = {r["doc_id"]: (r["sig"], r["n_profile"])
           for r in df.select("doc_id", s["sig"].alias("sig"),
                              s["n_profile"].alias("n_profile"))
           .collect()}
    for i, c in enumerate(CASES):
        assert got[i] == _py_profile_sig(c), f"case {i}: {c[:40]!r}"


def test_quant_clamp_edges():
    # maxf == 1 -> quant 1 (tokens kept); maxf 2..149 -> quant 2
    sig1, n1 = _py_profile_sig("alpha beta gamma")
    assert n1 == 3
    _, n2 = _py_profile_sig("alpha alpha beta")
    assert n2 == 1  # beta (freq 1) discarded at quant 2


def test_near_dup_same_signature(spark):
    """The point of the profile: docs differing only in rare-word noise
    collapse to one signature once maxFreq pushes QUANT >= 2."""
    base = ("spark " * 40) + ("index " * 38) + "alpha"
    variant = ("spark " * 40) + ("index " * 39) + "omega"
    df = spark.createDataFrame([(0, base), (1, variant)],
                               "doc_id int, text string")
    s = text_profile_signature("text")
    sigs = [r["sig"] for r in
            df.select(s["sig"].alias("sig")).collect()]
    assert sigs[0] == sigs[1]


def test_soundex_published_vectors():
    """Commons-codec Soundex vectors (SoundexTest.java / NARA examples)
    — incl. the HW-transparency (Ashcraft) and vowel-reset (Tymczak)
    rules and the first-letter duplicate seed (Pfister)."""
    from lucene_solr_spark.functions.phonetic import soundex

    vectors = {
        "Robert": "R163", "Rupert": "R163", "Ashcraft": "A261",
        "Ashcroft": "A261", "Tymczak": "T522", "Pfister": "P236",
        "Honeyman": "H555", "Washington": "W252", "Lee": "L000",
        "Gutierrez": "G362", "Jackson": "J250", "VanDeusen": "V532",
        "": "", "123": "",
    }
    for word, want in vectors.items():
        assert soundex(word) == want, word


def test_phonetic_post_inject_modes():
    from lucene_solr_spark.functions.phonetic import phonetic_post

    tp = [("robert", 0), ("lee", 1)]
    inj = phonetic_post(inject=True)(tp)
    assert ("robert", 0) in inj and ("R163", 0) in inj
    assert ("lee", 1) in inj and ("L000", 1) in inj
    rep = phonetic_post(inject=False)(tp)
    assert rep == [("R163", 0), ("L000", 1)]
