"""Greek stemmer + casefold (el/GreekStemmer.java — Ntais,
"Development of a Stemmer for the Greek Language"; el/
GreekLowerCaseFilter.java): 22 ordered rules over casefolded Greek
(final sigma standardized, tonos/dialytika removed). Ported
rule-for-rule INCLUDING the reference's operator-precedence quirks —
rule0's ``(len > 6 && endsWith("σκαγιου")) || endsWith(...)`` chain
guards only the FIRST alternative (Java && binds tighter than ||),
and rule8's 7/6/5-length else-if arms share the same shape; both are
kept bug-compatible. Gated over TestGreekStemmer.java's 343
checkOneTerm vectors parsed from the test source
(tests/test_greek.py)."""

from __future__ import annotations

_GREEK_FOLD = {
    "ς": "σ",
    "Ά": "α", "ά": "α",
    "Έ": "ε", "έ": "ε",
    "Ή": "η", "ή": "η",
    "Ί": "ι", "Ϊ": "ι", "ί": "ι",
    "ϊ": "ι", "ΐ": "ι",
    "Ύ": "υ", "Ϋ": "υ", "ύ": "υ",
    "ϋ": "υ", "ΰ": "υ",
    "Ό": "ο", "ό": "ο",
    "Ώ": "ω", "ώ": "ω",
    "΢": "ς",
}


def greek_lowercase(text: str) -> str:
    """GreekLowerCaseFilter.lowerCase (:68-127)."""
    return "".join(
        _GREEK_FOLD.get(c) or _GREEK_FOLD.get(c.lower(), c.lower())
        for c in text)


def _mk(suffixes):
    return tuple(suffixes.split())


_VOWELS = frozenset("αεηιουω")
_VOWELS_NO_Y = frozenset("αεηιοω")

_EXC4 = frozenset(_mk("θ δ ελ γαλ ν π ιδ παρ"))
_EXC6 = frozenset(_mk(
    "αλ αδ ενδ αμαν αμμοχαλ ηθ ανηθ αντιδ φυσ βρωμ γερ εξωδ καλπ καλλιν"
    " καταδ μουλ μπαν μπαγιατ μπολ μποσ νιτ ξικ συνομηλ πετσ πιτσ πικαντ"
    " πλιατσ ποστελν πρωτοδ σερτ συναδ τσαμ υποδ φιλον φυλοδ χασ"))
_EXC7 = frozenset(_mk("αναπ αποθ αποκ αποστ βουβ ξεθ ουλ πεθ πικρ ποτ"
                      " σιχ χ"))
_EXC8A = frozenset(_mk("τρ τσ"))
_EXC8B = frozenset(_mk(
    "βετερ βουλκ βραχμ γ δραδουμ θ καλπουζ καστελ κορμορ λαοπλ μωαμεθ μ"
    " μουσουλμ ν ουλ π πελεκ πλ πολισ πορτολ σαρακατσ σουλτ τσαρλατ ορφ"
    " τσιγγ τσοπ φωτοστεφ χ ψυχοπλ αγ γαλ γερ δεκ διπλ αμερικαν ουρ πιθ"
    " πουριτ σ ζωντ ικ καστ κοπ λιχ λουθηρ μαιντ μελ σιγ σπ στεγ τραγ"
    " τσαγ φ ερ αδαπ αθιγγ αμηχ ανικ ανοργ απηγ απιθ ατσιγγ βασ βασκ"
    " βαθυγαλ βιομηχ βραχυκ διατ διαφ ενοργ θυσ καπνοβιομηχ καταγαλ κλιβ"
    " κοιλαρφ λιβ μεγλοβιομηχ μικροβιομηχ νταβ ξηροκλιβ ολιγοδαμ ολογαλ"
    " πενταρφ περηφ περιτρ πλατ πολυδαπ πολυμηχ στεφ ταβ τετ υπερηφ"
    " υποκοπ χαμηλοδαπ ψηλοταβ"))
_EXC9 = frozenset(_mk(
    "αβαρ βεν εναρ αβρ αδ αθ αν απλ βαρον ντρ σκ κοπ μπορ νιφ παγ"
    " παρακαλ σερπ σκελ συρφ τοκ υ δ εμ θαρρ θ"))
_EXC12A = frozenset(_mk("π απ συμπ ασυμπ ακαταπ αμεταμφ"))
_EXC12B = frozenset(_mk("αλ αρ εκτελ ζ μ ξ παρακαλ προ νισ"))
_EXC13 = frozenset(_mk("διαθ θ παρακαταθ προσθ συνθ"))
_EXC14 = frozenset(_mk(
    "φαρμακ χαδ αγκ αναρρ βρομ εκλιπ λαμπιδ λεχ μ πατ ρ λ μεδ μεσαζ"
    " υποτειν αμ αιθ ανηκ δεσποζ ενδιαφερ δε δευτερευ καθαρευ πλε τσα"))
_EXC15A = frozenset(_mk(
    "αβαστ πολυφ αδηφ παμφ ρ ασπ αφ αμαλ αμαλλι ανυστ απερ ασπαρ αχαρ"
    " δερβεν δροσοπ ξεφ νεοπ νομοτ ολοπ ομοτ προστ προσωποπ συμπ συντ τ"
    " υποτ χαρ αειπ αιμοστ ανυπ αποτ αρτιπ διατ εν επιτ κροκαλοπ σιδηροπ"
    " λ ναυ ουλαμ ουρ π τρ μ"))
_EXC15B = frozenset(_mk("ψοφ ναυλοχ"))
_EXC16 = frozenset(_mk("ν χερσον δωδεκαν ερημον μεγαλον επταν"))
_EXC17 = frozenset(_mk("ασβ σβ αχρ χρ απλ αειμν δυσχρ ευχρ κοινοχρ"
                       " παλιμψ"))
_EXC18 = frozenset(_mk("ν ρ σπι στραβομουτσ κακομουτσ εξων"))
_EXC19 = frozenset(_mk("παρασουσ φ χ ωριοπλ αζ αλλοσουσ ασουσ"))


class _G:
    """One stem() invocation: s is a char list, n the logical length
    (the Java char[]/len discipline — add-back rules may rewrite
    chars past n, so the buffer keeps removed chars)."""

    __slots__ = ("s",)

    def __init__(self, word: str):
        self.s = list(word)

    def ew(self, n: int, suf: str) -> bool:
        ln = len(suf)
        if ln > n:
            return False
        return "".join(self.s[n - ln:n]) == suf

    def vowel(self, n: int) -> bool:
        return n != 0 and self.s[n - 1] in _VOWELS

    def vowel_no_y(self, n: int) -> bool:
        return n != 0 and self.s[n - 1] in _VOWELS_NO_Y

    def word(self, n: int) -> str:
        return "".join(self.s[:n])


def greek_stem(term: str) -> str:
    """GreekStemmer.stem (:35-67)."""
    n = len(term)
    if n < 4:
        return term
    g = _G(term)
    ew = g.ew
    orig = n
    n = _r0(g, n)
    n = _r1(g, n)
    n = _r2(g, n)
    n = _r3(g, n)
    n = _r4(g, n)
    n = _r5(g, n)
    n = _r6(g, n)
    n = _r7(g, n)
    n = _r8(g, n)
    n = _r9(g, n)
    n = _r10(g, n)
    n = _r11(g, n)
    n = _r12(g, n)
    n = _r13(g, n)
    n = _r14(g, n)
    n = _r15(g, n)
    n = _r16(g, n)
    n = _r17(g, n)
    n = _r18(g, n)
    n = _r19(g, n)
    n = _r20(g, n)
    if n == orig:
        n = _r21(g, n)
    n = _r22(g, n)
    return g.word(n)


def _r0(g, n):
    ew = g.ew
    if n > 9 and (ew(n, "καθεστωτοσ") or ew(n, "καθεστωτων")):
        return n - 4
    if n > 8 and (ew(n, "γεγονοτοσ") or ew(n, "γεγονοτων")):
        return n - 4
    if n > 8 and ew(n, "καθεστωτα"):
        return n - 3
    if n > 7 and (ew(n, "τατογιου") or ew(n, "τατογιων")):
        return n - 4
    if n > 7 and ew(n, "γεγονοτα"):
        return n - 3
    if n > 7 and ew(n, "καθεστωσ"):
        return n - 2
    # reference precedence quirk: the len>6 guard binds ONLY to the
    # first alternative (GreekStemmer.java:88-97)
    if ((n > 6 and ew(n, "σκαγιου")) or ew(n, "σκαγιων")
            or ew(n, "ολογιου") or ew(n, "ολογιων") or ew(n, "κρεατοσ")
            or ew(n, "κρεατων") or ew(n, "περατοσ") or ew(n, "περατων")
            or ew(n, "τερατοσ") or ew(n, "τερατων")):
        return n - 4
    if n > 6 and ew(n, "τατογια"):
        return n - 3
    if n > 6 and ew(n, "γεγονοσ"):
        return n - 2
    if n > 5 and (ew(n, "φαγιου") or ew(n, "φαγιων")
                  or ew(n, "σογιου") or ew(n, "σογιων")):
        return n - 4
    if n > 5 and (ew(n, "σκαγια") or ew(n, "ολογια") or ew(n, "κρεατα")
                  or ew(n, "περατα") or ew(n, "τερατα")):
        return n - 3
    if n > 4 and (ew(n, "φαγια") or ew(n, "σογια")
                  or ew(n, "φωτοσ") or ew(n, "φωτων")):
        return n - 3
    if n > 4 and (ew(n, "κρεασ") or ew(n, "περασ") or ew(n, "τερασ")):
        return n - 2
    if n > 3 and ew(n, "φωτα"):
        return n - 2
    if n > 2 and ew(n, "φωσ"):
        return n - 1
    return n


def _r1(g, n):
    ew = g.ew
    if n > 4 and (ew(n, "αδεσ") or ew(n, "αδων")):
        n -= 4
        if not (ew(n, "οκ") or ew(n, "μαμ") or ew(n, "μαν")
                or ew(n, "μπαμπ") or ew(n, "πατερ") or ew(n, "γιαγι")
                or ew(n, "νταντ") or ew(n, "κυρ") or ew(n, "θει")
                or ew(n, "πεθερ")):
            n += 2
    return n


def _r2(g, n):
    ew = g.ew
    if n > 4 and (ew(n, "εδεσ") or ew(n, "εδων")):
        n -= 4
        if (ew(n, "οπ") or ew(n, "ιπ") or ew(n, "εμπ") or ew(n, "υπ")
                or ew(n, "γηπ") or ew(n, "δαπ") or ew(n, "κρασπ")
                or ew(n, "μιλ")):
            n += 2
    return n


def _r3(g, n):
    ew = g.ew
    if n > 5 and (ew(n, "ουδεσ") or ew(n, "ουδων")):
        n -= 5
        if (ew(n, "αρκ") or ew(n, "καλιακ") or ew(n, "πεταλ")
                or ew(n, "λιχ") or ew(n, "πλεξ") or ew(n, "σκ")
                or ew(n, "σ") or ew(n, "φλ") or ew(n, "φρ")
                or ew(n, "βελ") or ew(n, "λουλ") or ew(n, "χν")
                or ew(n, "σπ") or ew(n, "τραγ") or ew(n, "φε")):
            n += 3
    return n


def _r4(g, n):
    ew = g.ew
    if n > 3 and (ew(n, "εωσ") or ew(n, "εων")):
        n -= 3
        if g.word(n) in _EXC4:
            n += 1
    return n


def _r5(g, n):
    ew = g.ew
    if n > 2 and ew(n, "ια"):
        n -= 2
        if g.vowel(n):
            n += 1
    elif n > 3 and (ew(n, "ιου") or ew(n, "ιων")):
        n -= 3
        if g.vowel(n):
            n += 1
    return n


def _r6(g, n):
    ew = g.ew
    removed = False
    if n > 3 and (ew(n, "ικα") or ew(n, "ικο")):
        n -= 3
        removed = True
    elif n > 4 and (ew(n, "ικου") or ew(n, "ικων")):
        n -= 4
        removed = True
    if removed and (g.vowel(n) or g.word(n) in _EXC6):
        n += 2
    return n


def _r7(g, n):
    ew = g.ew
    if n == 5 and ew(n, "αγαμε"):
        return n - 1
    if n > 7 and ew(n, "ηθηκαμε"):
        n -= 7
    elif n > 6 and ew(n, "ουσαμε"):
        n -= 6
    elif n > 5 and (ew(n, "αγαμε") or ew(n, "ησαμε") or ew(n, "ηκαμε")):
        n -= 5
    if n > 3 and ew(n, "αμε"):
        n -= 3
        if g.word(n) in _EXC7:
            n += 2
    return n


def _r8(g, n):
    ew = g.ew
    removed = False
    if n > 8 and ew(n, "ιουντανε"):
        n -= 8
        removed = True
    elif ((n > 7 and ew(n, "ιοντανε")) or ew(n, "ουντανε")
          or ew(n, "ηθηκανε")):  # precedence quirk kept (:305-308)
        n -= 7
        removed = True
    elif ((n > 6 and ew(n, "ιοτανε")) or ew(n, "οντανε")
          or ew(n, "ουσανε")):
        n -= 6
        removed = True
    elif ((n > 5 and ew(n, "αγανε")) or ew(n, "ησανε")
          or ew(n, "οτανε") or ew(n, "ηκανε")):
        n -= 5
        removed = True
    if removed and g.word(n) in _EXC8A:
        n += 4
        g.s[n - 4:n] = list("αγαν")
    if n > 3 and ew(n, "ανε"):
        n -= 3
        if g.vowel_no_y(n) or g.word(n) in _EXC8B:
            n += 2
    return n


def _r9(g, n):
    ew = g.ew
    if n > 5 and ew(n, "ησετε"):
        n -= 5
    if n > 3 and ew(n, "ετε"):
        n -= 3
        if (g.word(n) in _EXC9 or g.vowel_no_y(n) or ew(n, "οδ")
                or ew(n, "αιρ") or ew(n, "φορ") or ew(n, "ταθ")
                or ew(n, "διαθ") or ew(n, "σχ") or ew(n, "ενδ")
                or ew(n, "ευρ") or ew(n, "τιθ") or ew(n, "υπερθ")
                or ew(n, "ραθ") or ew(n, "ενθ") or ew(n, "ροθ")
                or ew(n, "σθ") or ew(n, "πυρ") or ew(n, "αιν")
                or ew(n, "συνδ") or ew(n, "συν") or ew(n, "συνθ")
                or ew(n, "χωρ") or ew(n, "πον") or ew(n, "βρ")
                or ew(n, "καθ") or ew(n, "ευθ") or ew(n, "εκθ")
                or ew(n, "νετ") or ew(n, "ρον") or ew(n, "αρκ")
                or ew(n, "βαρ") or ew(n, "βολ") or ew(n, "ωφελ")):
            n += 2
    return n


def _r10(g, n):
    ew = g.ew
    if n > 5 and (ew(n, "οντασ") or ew(n, "ωντασ")):
        n -= 5
        if n == 3 and ew(n, "αρχ"):
            n += 3
            g.s[n - 3] = "ο"
        if ew(n, "κρε"):
            n += 3
            g.s[n - 3] = "ω"
    return n


def _r11(g, n):
    ew = g.ew
    if n > 6 and ew(n, "ομαστε"):
        n -= 6
        if n == 2 and ew(n, "ον"):
            n += 5
    elif n > 7 and ew(n, "ιομαστε"):
        n -= 7
        if n == 2 and ew(n, "ον"):
            n += 5
            g.s[n - 5:n] = list("ομαστ")
    return n


def _r12(g, n):
    ew = g.ew
    if n > 5 and ew(n, "ιεστε"):
        n -= 5
        if g.word(n) in _EXC12A:
            n += 4
    if n > 4 and ew(n, "εστε"):
        n -= 4
        if g.word(n) in _EXC12B:
            n += 3
    return n


def _r13(g, n):
    ew = g.ew
    if n > 6 and ew(n, "ηθηκεσ"):
        n -= 6
    elif n > 5 and (ew(n, "ηθηκα") or ew(n, "ηθηκε")):
        n -= 5
    removed = False
    if n > 4 and ew(n, "ηκεσ"):
        n -= 4
        removed = True
    elif n > 3 and (ew(n, "ηκα") or ew(n, "ηκε")):
        n -= 3
        removed = True
    if removed and (g.word(n) in _EXC13 or ew(n, "σκωλ")
                    or ew(n, "σκουλ") or ew(n, "ναρθ") or ew(n, "σφ")
                    or ew(n, "οθ") or ew(n, "πιθ")):
        n += 2
    return n


def _r14(g, n):
    ew = g.ew
    removed = False
    if n > 5 and ew(n, "ουσεσ"):
        n -= 5
        removed = True
    elif n > 4 and (ew(n, "ουσα") or ew(n, "ουσε")):
        n -= 4
        removed = True
    if removed and (g.word(n) in _EXC14 or g.vowel(n)
                    or ew(n, "ποδαρ") or ew(n, "βλεπ")
                    or ew(n, "πανταχ") or ew(n, "φρυδ")
                    or ew(n, "μαντιλ") or ew(n, "μαλλ")
                    or ew(n, "κυματ") or ew(n, "λαχ") or ew(n, "ληγ")
                    or ew(n, "φαγ") or ew(n, "ομ") or ew(n, "πρωτ")):
        n += 3
    return n


def _r15(g, n):
    ew = g.ew
    removed = False
    if n > 4 and ew(n, "αγεσ"):
        n -= 4
        removed = True
    elif n > 3 and (ew(n, "αγα") or ew(n, "αγε")):
        n -= 3
        removed = True
    if removed:
        cond1 = (g.word(n) in _EXC15A or ew(n, "οφ") or ew(n, "πελ")
                 or ew(n, "χορτ") or ew(n, "λλ") or ew(n, "σφ")
                 or ew(n, "ρπ") or ew(n, "φρ") or ew(n, "πρ")
                 or ew(n, "λοχ") or ew(n, "σμην"))
        cond2 = g.word(n) in _EXC15B or ew(n, "κολλ")
        if cond1 and not cond2:
            n += 2
    return n


def _r16(g, n):
    ew = g.ew
    removed = False
    if n > 4 and ew(n, "ησου"):
        n -= 4
        removed = True
    elif n > 3 and (ew(n, "ησε") or ew(n, "ησα")):
        n -= 3
        removed = True
    if removed and g.word(n) in _EXC16:
        n += 2
    return n


def _r17(g, n):
    ew = g.ew
    if n > 4 and ew(n, "ηστε"):
        n -= 4
        if g.word(n) in _EXC17:
            n += 3
    return n


def _r18(g, n):
    ew = g.ew
    removed = False
    if n > 6 and (ew(n, "ησουνε") or ew(n, "ηθουνε")):
        n -= 6
        removed = True
    elif n > 4 and ew(n, "ουνε"):
        n -= 4
        removed = True
    if removed and g.word(n) in _EXC18:
        n += 3
        g.s[n - 3:n] = list("ουν")
    return n


def _r19(g, n):
    ew = g.ew
    removed = False
    if n > 6 and (ew(n, "ησουμε") or ew(n, "ηθουμε")):
        n -= 6
        removed = True
    elif n > 4 and ew(n, "ουμε"):
        n -= 4
        removed = True
    if removed and g.word(n) in _EXC19:
        n += 3
        g.s[n - 3:n] = list("ουμ")
    return n


def _r20(g, n):
    ew = g.ew
    if n > 5 and (ew(n, "ματων") or ew(n, "ματοσ")):
        n -= 3
    elif n > 4 and ew(n, "ματα"):
        n -= 2
    return n


def _r21(g, n):
    ew = g.ew
    if n > 9 and ew(n, "ιοντουσαν"):
        return n - 9
    if n > 8 and (ew(n, "ιομασταν") or ew(n, "ιοσασταν")
                  or ew(n, "ιουμαστε") or ew(n, "οντουσαν")):
        return n - 8
    if n > 7 and (ew(n, "ιεμαστε") or ew(n, "ιεσαστε")
                  or ew(n, "ιομουνα") or ew(n, "ιοσαστε")
                  or ew(n, "ιοσουνα") or ew(n, "ιουνται")
                  or ew(n, "ιουνταν") or ew(n, "ηθηκατε")
                  or ew(n, "ομασταν") or ew(n, "οσασταν")
                  or ew(n, "ουμαστε")):
        return n - 7
    if n > 6 and (ew(n, "ιομουν") or ew(n, "ιονταν") or ew(n, "ιοσουν")
                  or ew(n, "ηθειτε") or ew(n, "ηθηκαν")
                  or ew(n, "ομουνα") or ew(n, "οσαστε")
                  or ew(n, "οσουνα") or ew(n, "ουνται")
                  or ew(n, "ουνταν") or ew(n, "ουσατε")):
        return n - 6
    if n > 5 and (ew(n, "αγατε") or ew(n, "ιεμαι") or ew(n, "ιεται")
                  or ew(n, "ιεσαι") or ew(n, "ιοταν") or ew(n, "ιουμα")
                  or ew(n, "ηθεισ") or ew(n, "ηθουν") or ew(n, "ηκατε")
                  or ew(n, "ησατε") or ew(n, "ησουν") or ew(n, "ομουν")
                  or ew(n, "ονται") or ew(n, "ονταν") or ew(n, "οσουν")
                  or ew(n, "ουμαι") or ew(n, "ουσαν")):
        return n - 5
    if n > 4 and (ew(n, "αγαν") or ew(n, "αμαι") or ew(n, "ασαι")
                  or ew(n, "αται") or ew(n, "ειτε") or ew(n, "εσαι")
                  or ew(n, "εται") or ew(n, "ηδεσ") or ew(n, "ηδων")
                  or ew(n, "ηθει") or ew(n, "ηκαν") or ew(n, "ησαν")
                  or ew(n, "ησει") or ew(n, "ησεσ") or ew(n, "ομαι")
                  or ew(n, "οταν")):
        return n - 4
    if n > 3 and (ew(n, "αει") or ew(n, "εισ") or ew(n, "ηθω")
                  or ew(n, "ησω") or ew(n, "ουν") or ew(n, "ουσ")):
        return n - 3
    if n > 2 and (ew(n, "αν") or ew(n, "ασ") or ew(n, "αω")
                  or ew(n, "ει") or ew(n, "εσ") or ew(n, "ησ")
                  or ew(n, "οι") or ew(n, "οσ") or ew(n, "ου")
                  or ew(n, "υσ") or ew(n, "ων")):
        return n - 2
    if n > 1 and g.vowel(n):
        return n - 1
    return n


def _r22(g, n):
    ew = g.ew
    if ew(n, "εστερ") or ew(n, "εστατ"):
        return n - 5
    if (ew(n, "οτερ") or ew(n, "οτατ") or ew(n, "υτερ")
            or ew(n, "υτατ") or ew(n, "ωτερ") or ew(n, "ωτατ")):
        return n - 4
    return n


def greek_stem_chain(term: str) -> str:
    """The GreekAnalyzer chain's stem stage contract: casefold then
    stem (GreekLowerCaseFilter + GreekStemFilter)."""
    return greek_stem(greek_lowercase(term))


from functools import lru_cache as _lru_cache  # noqa: E402

greek_stem_chain = _lru_cache(maxsize=1 << 17)(greek_stem_chain)
# the pieces are used separately by the el_default chain (casing
# BEFORE the stop check, stem after) — memoize them too, or every
# occurrence re-runs the 22-rule machine (module-level lru_cache
# wrappers pickle by reference into the Arrow UDF closures)
greek_stem = _lru_cache(maxsize=1 << 17)(greek_stem)
greek_lowercase = _lru_cache(maxsize=1 << 17)(greek_lowercase)
