"""Double Metaphone (Lawrence Philips, C/C++ Users Journal, June 2000)
— the default encoder of the reference's PhoneticFilterFactory
(lucene/analysis/phonetic/src/java/org/apache/lucene/analysis/phonetic/
PhoneticFilterFactory.java:48, DoubleMetaphoneFilter.java), which
delegates to commons-codec's DoubleMetaphone. This is a from-scratch
re-expression of the published algorithm: a primary and an optional
alternate 4-char (configurable) code per word, with the contextual
rules for Germanic/Slavic/Italian/Spanish spellings.

Gated by the reference filter's own test vectors
(DoubleMetaphoneFilterTest.java: international -> ANTR/ANTRNXNL,
Kuczewski -> KSSK + alt KXFS, hello -> HL) plus a public-vector table
in tests/test_dmetaphone.py.

The filter semantics (DoubleMetaphoneFilter.java:70-100): for each
token emit the primary code, and the alternate code too when it
differs; with inject=true the original token is kept and codes are
added at the same position; tokens that encode to empty (no letters)
pass through unchanged.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

VOWELS = "AEIOUY"
SILENT_START = ("GN", "KN", "PN", "WR", "PS")
L_R_N_M_B_H_F_V_W_SPACE = ("L", "R", "N", "M", "B", "H", "F", "V", "W",
                           " ")
ES_EP_EB_EL_EY_IB_IL_IN_IE_EI_ER = ("ES", "EP", "EB", "EL", "EY", "IB",
                                    "IL", "IN", "IE", "EI", "ER")
L_T_K_S_N_M_B_Z = ("L", "T", "K", "S", "N", "M", "B", "Z")


class _Result:
    """Primary/alternate accumulators, each capped at max_len."""

    def __init__(self, max_len: int):
        self.max_len = max_len
        self.primary: List[str] = []
        self.alternate: List[str] = []

    def append(self, prim: str, alt: Optional[str] = None) -> None:
        if alt is None:
            alt = prim
        self.append_primary(prim)
        self.append_alternate(alt)

    def append_primary(self, s: str) -> None:
        room = self.max_len - len(self.primary)
        if room > 0:
            self.primary.extend(s[:room])

    def append_alternate(self, s: str) -> None:
        room = self.max_len - len(self.alternate)
        if room > 0:
            self.alternate.extend(s[:room])

    def complete(self) -> bool:
        return (len(self.primary) >= self.max_len
                and len(self.alternate) >= self.max_len)


def _char_at(v: str, i: int) -> str:
    # out-of-range reads a NUL sentinel (matches the reference's
    # CHAR_NULL guard reads)
    if i < 0 or i >= len(v):
        return "\0"
    return v[i]


def _contains(v: str, start: int, length: int, *criteria: str) -> bool:
    if start < 0 or start + length > len(v):
        return False
    target = v[start:start + length]
    return target in criteria


def _is_vowel(c: str) -> bool:
    return c in VOWELS


def _is_slavo_germanic(v: str) -> bool:
    return ("W" in v or "K" in v or "CZ" in v or "WITZ" in v)


def _is_silent_start(v: str) -> bool:
    return v.startswith(SILENT_START)


def double_metaphone(value: str, max_len: int = 4,
                     ) -> Tuple[str, Optional[str]]:
    """Returns (primary, alternate). alternate is None when identical
    to the primary — the caller-facing contract of
    DoubleMetaphoneFilter's alternate emission check."""
    value = " ".join(value.strip().upper().split()) if value else ""
    # clean: uppercase, trimmed; the algorithm reads raw chars and
    # treats any non-handled char as silent
    if not value:
        return "", None
    slavo = _is_slavo_germanic(value)
    index = 1 if _is_silent_start(value) else 0
    r = _Result(max_len)
    n = len(value)
    while not r.complete() and index <= n - 1:
        c = value[index]
        if c in "AEIOUY":
            if index == 0:
                r.append("A")
            index += 1
        elif c == "B":
            r.append("P")
            index += 2 if _char_at(value, index + 1) == "B" else 1
        elif c == "Ç":  # C-cedilla
            r.append("S")
            index += 1
        elif c == "C":
            index = _handle_c(value, r, index)
        elif c == "D":
            index = _handle_d(value, r, index)
        elif c == "F":
            r.append("F")
            index += 2 if _char_at(value, index + 1) == "F" else 1
        elif c == "G":
            index = _handle_g(value, r, index, slavo)
        elif c == "H":
            index = _handle_h(value, r, index)
        elif c == "J":
            index = _handle_j(value, r, index, slavo)
        elif c == "K":
            r.append("K")
            index += 2 if _char_at(value, index + 1) == "K" else 1
        elif c == "L":
            index = _handle_l(value, r, index)
        elif c == "M":
            r.append("M")
            index += 2 if _condition_m0(value, index) else 1
        elif c == "N":
            r.append("N")
            index += 2 if _char_at(value, index + 1) == "N" else 1
        elif c == "Ñ":  # N-tilde
            r.append("N")
            index += 1
        elif c == "P":
            index = _handle_p(value, r, index)
        elif c == "Q":
            r.append("K")
            index += 2 if _char_at(value, index + 1) == "Q" else 1
        elif c == "R":
            index = _handle_r(value, r, index, slavo)
        elif c == "S":
            index = _handle_s(value, r, index, slavo)
        elif c == "T":
            index = _handle_t(value, r, index)
        elif c == "V":
            r.append("F")
            index += 2 if _char_at(value, index + 1) == "V" else 1
        elif c == "W":
            index = _handle_w(value, r, index)
        elif c == "X":
            index = _handle_x(value, r, index)
        elif c == "Z":
            index = _handle_z(value, r, index, slavo)
        else:
            index += 1
    primary = "".join(r.primary)
    alternate = "".join(r.alternate)
    return primary, (alternate if alternate != primary else None)


# -- per-letter contextual rules --------------------------------------------

def _handle_c(v: str, r: _Result, i: int) -> int:
    if _condition_c0(v, i):  # greek roots e.g. 'chianti'
        r.append("K")
        i += 2
    elif i == 0 and _contains(v, i, 6, "CAESAR"):
        r.append("S")
        i += 2
    elif _contains(v, i, 2, "CH"):
        i = _handle_ch(v, r, i)
    elif (_contains(v, i, 2, "CZ")
          and not _contains(v, i - 2, 4, "WICZ")):
        r.append("S", "X")  # 'czerny'
        i += 2
    elif _contains(v, i + 1, 3, "CIA"):
        r.append("X")  # 'focaccia'
        i += 3
    elif (_contains(v, i, 2, "CC")
          and not (i == 1 and _char_at(v, 0) == "M")):
        return _handle_cc(v, r, i)  # double 'C' but not 'McClellan'
    elif _contains(v, i, 2, "CK", "CG", "CQ"):
        r.append("K")
        i += 2
    elif _contains(v, i, 2, "CI", "CE", "CY"):
        if _contains(v, i, 3, "CIO", "CIE", "CIA"):
            r.append("S", "X")  # italian vs english
        else:
            r.append("S")
        i += 2
    else:
        r.append("K")
        if _contains(v, i + 1, 2, " C", " Q", " G"):
            i += 3  # 'mac caffrey', 'mac gregor'
        elif (_contains(v, i + 1, 1, "C", "K", "Q")
              and not _contains(v, i + 1, 2, "CE", "CI")):
            i += 2
        else:
            i += 1
    return i


def _condition_c0(v: str, i: int) -> bool:
    if _contains(v, i, 4, "CHIA"):
        return True
    if i <= 1:
        return False
    if _is_vowel(_char_at(v, i - 2)):
        return False
    if not _contains(v, i - 1, 3, "ACH"):
        return False
    c = _char_at(v, i + 2)
    return ((c != "I" and c != "E")
            or _contains(v, i - 2, 6, "BACHER", "MACHER"))


def _handle_cc(v: str, r: _Result, i: int) -> int:
    if (_contains(v, i + 2, 1, "I", "E", "H")
            and not _contains(v, i + 2, 2, "HU")):
        if ((i == 1 and _char_at(v, i - 1) == "A")
                or _contains(v, i - 1, 5, "UCCEE", "UCCES")):
            r.append("KS")  # 'accident', 'accede', 'succeed'
        else:
            r.append("X")  # 'bacci', 'bertucci'
        i += 3
    else:
        r.append("K")  # Pierce's rule
        i += 2
    return i


def _handle_ch(v: str, r: _Result, i: int) -> int:
    if i > 0 and _contains(v, i, 4, "CHAE"):
        r.append("K", "X")  # 'michael'
        return i + 2
    if _condition_ch0(v, i):
        r.append("X")  # greek word starts e.g. 'chemistry'... no:
        return i + 2
    if _condition_ch1(v, i):
        r.append("K")  # germanic/greek 'architect', 'orchestra'
        return i + 2
    if i > 0:
        if _contains(v, 0, 2, "MC"):
            r.append("K")  # 'McHugh'
        else:
            r.append("X", "K")
    else:
        r.append("X")
    return i + 2


def _condition_ch0(v: str, i: int) -> bool:
    if i != 0:
        return False
    if (not _contains(v, i + 1, 5, "HARAC", "HARIS")
            and not _contains(v, i + 1, 3, "HOR", "HYM", "HIA", "HEM")):
        return False
    return not _contains(v, 0, 5, "CHORE")


def _condition_ch1(v: str, i: int) -> bool:
    return ((_contains(v, 0, 4, "VAN ", "VON ")
             or _contains(v, 0, 3, "SCH"))
            or _contains(v, i - 2, 6, "ORCHES", "ARCHIT", "ORCHID")
            or _contains(v, i + 2, 1, "T", "S")
            or ((_contains(v, i - 1, 1, "A", "O", "U", "E") or i == 0)
                and (_contains(v, i + 2, 1, *L_R_N_M_B_H_F_V_W_SPACE)
                     or i + 1 == len(v) - 1)))


def _handle_d(v: str, r: _Result, i: int) -> int:
    if _contains(v, i, 2, "DG"):
        if _contains(v, i + 2, 1, "I", "E", "Y"):
            r.append("J")  # 'edge'
            i += 3
        else:
            r.append("TK")  # 'edgar'
            i += 2
    elif _contains(v, i, 2, "DT", "DD"):
        r.append("T")
        i += 2
    else:
        r.append("T")
        i += 1
    return i


def _handle_g(v: str, r: _Result, i: int, slavo: bool) -> int:
    if _char_at(v, i + 1) == "H":
        return _handle_gh(v, r, i)
    if _char_at(v, i + 1) == "N":
        if i == 1 and _is_vowel(_char_at(v, 0)) and not slavo:
            r.append("KN", "N")
        elif (not _contains(v, i + 2, 2, "EY")
              and _char_at(v, i + 1) != "Y" and not slavo):
            r.append("N", "KN")
        else:
            r.append("KN")
        return i + 2
    if _contains(v, i + 1, 2, "LI") and not slavo:
        r.append("KL", "L")
        return i + 2
    if i == 0 and (_char_at(v, i + 1) == "Y"
                   or _contains(v, i + 1, 2,
                                *ES_EP_EB_EL_EY_IB_IL_IN_IE_EI_ER)):
        r.append("K", "J")  # 'ges-', 'gep-' etc at word start
        return i + 2
    if ((_contains(v, i + 1, 2, "ER") or _char_at(v, i + 1) == "Y")
            and not _contains(v, 0, 6, "DANGER", "RANGER", "MANGER")
            and not _contains(v, i - 1, 1, "E", "I")
            and not _contains(v, i - 1, 3, "RGY", "OGY")):
        r.append("K", "J")
        return i + 2
    if (_contains(v, i + 1, 1, "E", "I", "Y")
            or _contains(v, i - 1, 4, "AGGI", "OGGI")):
        if (_contains(v, 0, 4, "VAN ", "VON ")
                or _contains(v, 0, 3, "SCH")
                or _contains(v, i + 1, 2, "ET")):
            r.append("K")  # germanic
        elif _contains(v, i + 1, 3, "IER"):
            r.append("J")
        else:
            r.append("J", "K")
        return i + 2
    if _char_at(v, i + 1) == "G":
        r.append("K")
        return i + 2
    r.append("K")
    return i + 1


def _handle_gh(v: str, r: _Result, i: int) -> int:
    if i > 0 and not _is_vowel(_char_at(v, i - 1)):
        r.append("K")
        return i + 2
    if i == 0:
        if _char_at(v, i + 2) == "I":
            r.append("J")  # 'ghislane'
        else:
            r.append("K")  # 'ghoul'
        return i + 2
    if ((i > 1 and _contains(v, i - 2, 1, "B", "H", "D"))
            or (i > 2 and _contains(v, i - 3, 1, "B", "H", "D"))
            or (i > 3 and _contains(v, i - 4, 1, "B", "H"))):
        return i + 2  # silent: 'hugh', 'bough', 'broughton'
    if (i > 2 and _char_at(v, i - 1) == "U"
            and _contains(v, i - 3, 1, "C", "G", "L", "R", "T")):
        r.append("F")  # 'laugh', 'cough', 'rough', 'tough'
    elif i > 0 and _char_at(v, i - 1) != "I":
        r.append("K")
    return i + 2


def _handle_h(v: str, r: _Result, i: int) -> int:
    # keep H only between vowels or at a vowel-followed word start
    if ((i == 0 or _is_vowel(_char_at(v, i - 1)))
            and _is_vowel(_char_at(v, i + 1))):
        r.append("H")
        return i + 2
    return i + 1


def _handle_j(v: str, r: _Result, i: int, slavo: bool) -> int:
    if _contains(v, i, 4, "JOSE") or _contains(v, 0, 4, "SAN "):
        # spanish: 'jose', 'san jacinto'
        if ((i == 0 and (_char_at(v, i + 4) == " " or len(v) == 4))
                or _contains(v, 0, 4, "SAN ")):
            r.append("H")
        else:
            r.append("J", "H")
        return i + 1
    if i == 0:
        r.append("J", "A")  # 'yankelovich' vs 'jahn'
    elif (_is_vowel(_char_at(v, i - 1)) and not slavo
          and (_char_at(v, i + 1) == "A" or _char_at(v, i + 1) == "O")):
        r.append("J", "H")
    elif i == len(v) - 1:
        r.append("J", " ")
    elif (not _contains(v, i + 1, 1, *L_T_K_S_N_M_B_Z)
          and not _contains(v, i - 1, 1, "S", "K", "L")):
        r.append("J")
    return i + 2 if _char_at(v, i + 1) == "J" else i + 1


def _handle_l(v: str, r: _Result, i: int) -> int:
    if _char_at(v, i + 1) == "L":
        if _condition_l0(v, i):
            r.append_primary("L")  # spanish 'cabrillo', 'gallegos'
        else:
            r.append("L")
        return i + 2
    r.append("L")
    return i + 1


def _condition_l0(v: str, i: int) -> bool:
    if (i == len(v) - 3
            and _contains(v, i - 1, 4, "ILLO", "ILLA", "ALLE")):
        return True
    return ((_contains(v, len(v) - 2, 2, "AS", "OS")
             or _contains(v, len(v) - 1, 1, "A", "O"))
            and _contains(v, i - 1, 4, "ALLE"))


def _condition_m0(v: str, i: int) -> bool:
    if _char_at(v, i + 1) == "M":
        return True
    # 'dumb', 'thumb' — and their -er forms
    return (_contains(v, i - 1, 3, "UMB")
            and (i + 1 == len(v) - 1 or _contains(v, i + 2, 2, "ER")))


def _handle_p(v: str, r: _Result, i: int) -> int:
    if _char_at(v, i + 1) == "H":
        r.append("F")
        return i + 2
    r.append("P")
    return i + 2 if _contains(v, i + 1, 1, "P", "B") else i + 1


def _handle_r(v: str, r: _Result, i: int, slavo: bool) -> int:
    # french 'rogier' final silent R in the primary
    if (i == len(v) - 1 and not slavo
            and _contains(v, i - 2, 2, "IE")
            and not _contains(v, i - 4, 2, "ME", "MA")):
        r.append_alternate("R")
    else:
        r.append("R")
    return i + 2 if _char_at(v, i + 1) == "R" else i + 1


def _handle_s(v: str, r: _Result, i: int, slavo: bool) -> int:
    if _contains(v, i - 1, 3, "ISL", "YSL"):
        return i + 1  # silent: 'island', 'carlysle'
    if i == 0 and _contains(v, i, 5, "SUGAR"):
        r.append("X", "S")
        return i + 1
    if _contains(v, i, 2, "SH"):
        if _contains(v, i + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ"):
            r.append("S")  # germanic
        else:
            r.append("X")
        return i + 2
    if (_contains(v, i, 3, "SIO", "SIA")
            or _contains(v, i, 4, "SIAN")):
        if slavo:
            r.append("S")
        else:
            r.append("S", "X")
        return i + 3
    if ((i == 0 and _contains(v, i + 1, 1, "M", "N", "L", "W"))
            or _contains(v, i + 1, 1, "Z")):
        # german/anglicization e.g. 'smith' -> alt 'schmidt'
        r.append("S", "X")
        return i + 2 if _contains(v, i + 1, 1, "Z") else i + 1
    if _contains(v, i, 2, "SC"):
        return _handle_sc(v, r, i)
    if (i == len(v) - 1
            and _contains(v, i - 2, 2, "AI", "OI")):
        r.append_alternate("S")  # french 'resnais', 'artois'
    else:
        r.append("S")
    return i + 2 if _contains(v, i + 1, 1, "S", "Z") else i + 1


def _handle_sc(v: str, r: _Result, i: int) -> int:
    if _char_at(v, i + 2) == "H":
        if _contains(v, i + 3, 2, "OO", "ER", "EN", "UY", "ED", "EM"):
            if _contains(v, i + 3, 2, "ER", "EN"):
                r.append("X", "SK")  # 'schermerhorn', 'schenker'
            else:
                r.append("SK")  # 'school', 'schooner'
        else:
            if (i == 0 and not _is_vowel(_char_at(v, 3))
                    and _char_at(v, 3) != "W"):
                r.append("X", "S")
            else:
                r.append("X")
        return i + 3
    if _contains(v, i + 2, 1, "I", "E", "Y"):
        r.append("S")
        return i + 3
    r.append("SK")
    return i + 3


def _handle_t(v: str, r: _Result, i: int) -> int:
    if _contains(v, i, 4, "TION"):
        r.append("X")
        return i + 3
    if _contains(v, i, 3, "TIA", "TCH"):
        r.append("X")
        return i + 3
    if (_contains(v, i, 2, "TH")
            or _contains(v, i, 3, "TTH")):
        if (_contains(v, i + 2, 2, "OM", "AM")
                or _contains(v, 0, 4, "VAN ", "VON ")
                or _contains(v, 0, 3, "SCH")):
            r.append("T")  # 'thomas', 'thames', germanic
        else:
            r.append("0", "T")  # '0' = th fricative
        return i + 2
    r.append("T")
    return i + 2 if _contains(v, i + 1, 1, "T", "D") else i + 1


def _handle_w(v: str, r: _Result, i: int) -> int:
    if _contains(v, i, 2, "WR"):
        r.append("R")
        return i + 2
    if (i == 0 and (_is_vowel(_char_at(v, i + 1))
                    or _contains(v, i, 2, "WH"))):
        if _is_vowel(_char_at(v, i + 1)):
            r.append("A", "F")  # 'wasserman' alt 'vasserman'
        else:
            r.append("A")  # 'wh-' e.g. 'uomo'
        return i + 1
    if ((i == len(v) - 1 and _is_vowel(_char_at(v, i - 1)))
            or _contains(v, i - 1, 5, "EWSKI", "EWSKY", "OWSKI",
                         "OWSKY")
            or _contains(v, 0, 3, "SCH")):
        r.append_alternate("F")  # polish 'filipowicz'
        return i + 1
    if _contains(v, i, 4, "WICZ", "WITZ"):
        r.append("TS", "FX")
        return i + 4
    return i + 1


def _handle_x(v: str, r: _Result, i: int) -> int:
    if i == 0:
        r.append("S")  # 'xavier'
        return i + 1
    if not (i == len(v) - 1
            and (_contains(v, i - 3, 3, "IAU", "EAU")
                 or _contains(v, i - 2, 2, "AU", "OU"))):
        r.append("KS")  # french silent final X: 'breaux'
    return i + 2 if _contains(v, i + 1, 1, "C", "X") else i + 1


def _handle_z(v: str, r: _Result, i: int, slavo: bool) -> int:
    if _char_at(v, i + 1) == "H":
        r.append("J")  # chinese pinyin e.g. 'zhao'
        return i + 2
    if (_contains(v, i + 1, 2, "ZO", "ZI", "ZA")
            or (slavo and (i > 0 and _char_at(v, i - 1) != "T"))):
        r.append("S", "TS")
    else:
        r.append("S")
    return i + 2 if _char_at(v, i + 1) == "Z" else i + 1
