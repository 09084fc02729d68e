"""Porter stemming (M.F. Porter, "An algorithm for suffix stripping",
Program 14(3) 1980 — the exact algorithm the reference's
PorterStemFilter applies, lucene/analysis/common/.../en/
PorterStemFilter.java + PorterStemmer.java, which is the author's own
implementation of the same published steps). Re-implemented here from
the published algorithm description (steps 1a-5b, measure m, *v*, *d,
*o conditions); not a translation of the Java.

Golden vectors in tests/test_porter.py come from the published
sample vocabulary (the voc.txt/output.txt pairs distributed with the
algorithm)."""

from __future__ import annotations

_VOWELS = set("aeiou")


def _is_consonant(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_consonant(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """m = number of VC sequences in the c/v form of the stem."""
    m = 0
    i = 0
    n = len(stem)
    # skip initial consonants
    while i < n and _is_consonant(stem, i):
        i += 1
    while i < n:
        # in a vowel run
        while i < n and not _is_consonant(stem, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _is_consonant(stem, i):
            i += 1
    return m


def _contains_vowel(stem: str) -> bool:
    return any(not _is_consonant(stem, i) for i in range(len(stem)))


def _ends_double_consonant(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_consonant(word, len(word) - 1)
    )


def _ends_cvc(word: str) -> bool:
    """*o: stem ends cvc where the final c is not w, x or y."""
    if len(word) < 3:
        return False
    i = len(word) - 1
    if not _is_consonant(word, i):
        return False
    if _is_consonant(word, i - 1):
        return False
    if not _is_consonant(word, i - 2):
        return False
    return word[i] not in "wxy"


def _replace(word: str, suffix: str, repl: str, min_m: int) -> str | None:
    """If word ends with suffix and measure(base) > min_m - ... — here:
    m(base) >= min_m? No: callers pass the exact m condition via
    min_m = required m of the base (condition m > min_m - 1)."""
    if not word.endswith(suffix):
        return None
    base = word[: len(word) - len(suffix)]
    if _measure(base) >= min_m:
        return base + repl
    return word  # suffix matched but condition failed: stop this step


def porter_stem(w: str) -> str:
    if len(w) <= 2:
        return w
    word = w

    # step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith("ies"):
        word = word[:-2]
    elif word.endswith("ss"):
        pass
    elif word.endswith("s"):
        word = word[:-1]

    # step 1b
    flag_1b = False
    if word.endswith("eed"):
        if _measure(word[:-3]) > 0:
            word = word[:-1]
    elif word.endswith("ed"):
        if _contains_vowel(word[:-2]):
            word = word[:-2]
            flag_1b = True
    elif word.endswith("ing"):
        if _contains_vowel(word[:-3]):
            word = word[:-3]
            flag_1b = True
    if flag_1b:
        if word.endswith(("at", "bl", "iz")):
            word += "e"
        elif _ends_double_consonant(word) and not word.endswith(
            ("l", "s", "z")
        ):
            word = word[:-1]
        elif _measure(word) == 1 and _ends_cvc(word):
            word += "e"

    # step 1c
    if word.endswith("y") and _contains_vowel(word[:-1]):
        word = word[:-1] + "i"

    # step 2 (m > 0 suffix mappings; longest match by suffix list order
    # per the published table, keyed on penultimate letter)
    step2 = [
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
        ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
        ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
        ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
        ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
        ("biliti", "ble"),
    ]
    for suf, rep in step2:
        if word.endswith(suf):
            base = word[: len(word) - len(suf)]
            if _measure(base) > 0:
                word = base + rep
            break

    # step 3
    step3 = [
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ]
    for suf, rep in step3:
        if word.endswith(suf):
            base = word[: len(word) - len(suf)]
            if _measure(base) > 0:
                word = base + rep
            break

    # step 4 (m > 1 deletions)
    step4 = [
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant",
        "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti",
        "ous", "ive", "ize",
    ]
    for suf in sorted(step4, key=len, reverse=True):
        if word.endswith(suf):
            base = word[: len(word) - len(suf)]
            if suf == "ion" and not base.endswith(("s", "t")):
                continue
            if _measure(base) > 1:
                word = base
            break

    # step 5a
    if word.endswith("e"):
        base = word[:-1]
        m = _measure(base)
        if m > 1 or (m == 1 and not _ends_cvc(base)):
            word = base

    # step 5b
    if (
        _measure(word) > 1
        and _ends_double_consonant(word)
        and word.endswith("l")
    ):
        word = word[:-1]

    return word


def english_minimal_stem(w: str) -> str:
    """EnglishMinimalStemmer (lucene/analysis/common/.../en/
    EnglishMinimalStemmer.java:28-46 — the Harman S-stemmer behind
    EnglishMinimalStemFilter): plural-only stripping. Rules verbatim:
    keep words < 3 chars or not ending in 's'; keep -us/-ss; '-ies'
    with a non-a/e letter before the i becomes '-y'; keep -ies/-aes/
    -oes/-ees otherwise; else drop the final 's'."""
    n = len(w)
    if n < 3 or w[-1] != "s":
        return w
    c = w[-2]
    if c in ("u", "s"):
        return w
    if c == "e":
        if n > 3 and w[-3] == "i" and w[-4] not in ("a", "e"):
            return w[:-3] + "y"
        if w[-3] in ("i", "a", "o", "e"):
            return w
        return w[:-1]
    return w[:-1]


# memoized at the module name (pure function over a heavily repeated
# token vocabulary; binding the wrapper to the module attribute keeps
# pickled analyzer specs resolving to the cached form on executors) —
# the same discipline every other stemmer module applies; porter was
# the one chain the round-3 memoization pass missed, which made
# en_default the slowest language entry (2.7s vs ~0.9s peers at sf0.1)
from functools import lru_cache as _lru_cache  # noqa: E402

porter_stem = _lru_cache(maxsize=1 << 17)(porter_stem)
