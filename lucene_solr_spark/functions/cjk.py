"""CJKBigramFilter re-expression.

Reference: ``analysis/cjk/CJKBigramFilter.java`` — buffers the chars
of consecutive tokens whose type is an enabled CJK writing system
(HAN / HIRAGANA / KATAKANA / HANGUL flags, :130-133) and emits
overlapping character bigrams (type <DOUBLE>, :306); a buffered run of
length 1 is emitted as a <SINGLE> unigram (:327); with
``outputUnigrams`` every char is also emitted and each bigram shares
its first char's position (posInc 0, :308-309). Tokens of other types
pass through unchanged. Runs break when the incoming position
increment is not 1 (:150-165 hasBufferedUnigram/flush logic).

Our StandardTokenizer stand-in emits Han/Hiragana as single-char
tokens and Katakana/Hangul as runs, exactly like the reference
grammar (StandardTokenizerImpl.jflex:181-186), so type classification
here is by script of the token's characters.
"""

from __future__ import annotations

from typing import List, Tuple

HAN = 1
HIRAGANA = 2
KATAKANA = 4
HANGUL = 8
ALL = HAN | HIRAGANA | KATAKANA | HANGUL


def _script(ch: str) -> int:
    cp = ord(ch)
    if 0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF:
        return HAN
    if 0x3040 <= cp <= 0x309F:
        return HIRAGANA
    if 0x30A0 <= cp <= 0x30FF or 0x31F0 <= cp <= 0x31FF:
        return KATAKANA
    if 0xAC00 <= cp <= 0xD7A3 or 0x1100 <= cp <= 0x11FF:
        return HANGUL
    return 0


def token_script(tok: str) -> int:
    """The writing system of a token, 0 if chars mix scripts / non-CJK."""
    if not tok:
        return 0
    s = _script(tok[0])
    if s and all(_script(c) == s for c in tok):
        return s
    return 0


def cjk_bigram_post(flags: int = ALL, output_unigrams: bool = False):
    """Stream post filter: [(token, pos)] -> [(token, pos)], positions
    renumbered by reference posInc rules (pass-through tokens keep
    their incoming increments, stop holes included)."""

    def post(tp: List[Tuple[str, int]]) -> List[Tuple[str, int]]:
        out: List[Tuple[str, int]] = []
        out_pos = -1
        last_in = -1
        run: List[str] = []          # buffered CJK chars
        run_inc = 1                  # posInc carried by the run start

        def flush():
            nonlocal out_pos, run, run_inc
            if not run:
                return
            if len(run) == 1:
                out_pos += run_inc
                out.append((run[0], out_pos))       # <SINGLE>
            elif output_unigrams:
                base = out_pos + run_inc
                for i, c in enumerate(run):
                    out.append((c, base + i))
                for i in range(len(run) - 1):
                    out.append((run[i] + run[i + 1], base + i))
                out_pos = base + len(run) - 1
                out.sort(key=lambda x: (x[1], len(x[0])))
            else:
                for i in range(len(run) - 1):
                    out_pos += run_inc if i == 0 else 1
                    out.append((run[i] + run[i + 1], out_pos))  # <DOUBLE>
            run = []
            run_inc = 1

        for tok, pos in tp:
            inc = pos - last_in
            last_in = pos
            sc = token_script(tok)
            if sc and (flags & sc):
                if run and inc != 1:
                    flush()
                if not run:
                    run_inc = inc
                run.extend(tok)
            else:
                flush()
                out_pos += inc
                out.append((tok, out_pos))
        flush()
        return out

    return post


# -- CJKWidthFilter (analysis/cjk/CJKWidthFilter.java) -----------------------
# Fullwidth ASCII -> basic latin; halfwidth katakana -> kana, with
# voiced/semi-voiced sound marks combined into the preceding kana when
# a composed form exists (else the combining mark codepoints 0x3099/
# 0x309A as the reference's fallback).

_KANA_NORM = (
    0x30FB, 0x30F2, 0x30A1, 0x30A3, 0x30A5, 0x30A7, 0x30A9, 0x30E3,
    0x30E5, 0x30E7, 0x30C3, 0x30FC, 0x30A2, 0x30A4, 0x30A6, 0x30A8,
    0x30AA, 0x30AB, 0x30AD, 0x30AF, 0x30B1, 0x30B3, 0x30B5, 0x30B7,
    0x30B9, 0x30BB, 0x30BD, 0x30BF, 0x30C1, 0x30C4, 0x30C6, 0x30C8,
    0x30CA, 0x30CB, 0x30CC, 0x30CD, 0x30CE, 0x30CF, 0x30D2, 0x30D5,
    0x30D8, 0x30DB, 0x30DE, 0x30DF, 0x30E0, 0x30E1, 0x30E2, 0x30E4,
    0x30E6, 0x30E8, 0x30E9, 0x30EA, 0x30EB, 0x30EC, 0x30ED, 0x30EF,
    0x30F3, 0x3099, 0x309A,
)

# kana combining deltas over 0x30A6-0x30FD (CJKWidthFilter.java:87-101)
_KANA_COMBINE_VOICED = (
    78, 0, 0, 0, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1,
    0, 1, 0, 1, 0, 1, 0, 0, 1, 0, 1, 0, 1, 0, 0, 0, 0, 0, 0, 1, 0, 0,
    1, 0, 0, 1, 0, 0, 1, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 8, 8, 8, 8, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1,
)
_KANA_COMBINE_HALF_VOICED = (
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 2, 0, 0,
    2, 0, 0, 2, 0, 0, 2, 0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
)


import re as _re_w

# any char the filter touches: fullwidth ASCII or halfwidth katakana
_WIDTH_CANDIDATE = _re_w.compile("[！-ﾟ]").search


def cjk_width_fold(token: str) -> str:
    """CJKWidthFilter.incrementToken (:62-85) as a per-token fold,
    replaying the in-place scan: the voiced-mark combine deletes the
    mark and re-examines the following character. Tokens without any
    foldable char (one C-level regex probe) pass through untouched —
    the overwhelming case on non-CJK text."""
    if _WIDTH_CANDIDATE(token) is None:
        return token
    buf = [ord(c) for c in token]
    n = len(buf)
    i = 0
    while i < n:
        ch = buf[i]
        if 0xFF01 <= ch <= 0xFF5E:
            buf[i] = ch - 0xFEE0
        elif 0xFF65 <= ch <= 0xFF9F:
            if ch in (0xFF9E, 0xFF9F) and i > 0:
                prev = buf[i - 1]
                combined = False
                if 0x30A6 <= prev <= 0x30FD:
                    d = (_KANA_COMBINE_HALF_VOICED[prev - 0x30A6]
                         if ch == 0xFF9F
                         else _KANA_COMBINE_VOICED[prev - 0x30A6])
                    if d:
                        buf[i - 1] = prev + d
                        combined = True
                if combined:
                    del buf[i]
                    n -= 1
                    continue
            buf[i] = _KANA_NORM[ch - 0xFF65]
        i += 1
    return "".join(chr(c) for c in buf[:n])
