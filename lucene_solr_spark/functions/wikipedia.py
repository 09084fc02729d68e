"""WikipediaTokenizer: wiki-markup-aware tokenization re-expressed as
an explicit state machine.

Reference semantics mirrored:
  - WikipediaTokenizerImpl.jflex (analysis/common/src/java/org/apache/
    lucene/analysis/wikipedia/WikipediaTokenizerImpl.jflex): all nine
    scanner states with their rule sets IN FILE ORDER; token macros
    (ALPHANUM/APOSTROPHE/ACRONYM/COMPANY/EMAIL/HOST/NUM/CJ/TAGS) and
    the wiki trigger macros; jflex maximal-munch resolution (longest
    match wins, earliest rule on ties) is replicated by scoring every
    active rule at the cursor — the states are declared with %state
    (INCLUSIVE), so the spec's final ``. | {WHITESPACE} | {TAGS}``
    catch-all participates in EVERY state, last.
  - scanner side effects kept verbatim per action: currentTokType,
    numBalanced (the '' toggling), positionInc (only the
    external-link display-text rule and the "]" close set it to 0;
    states whose rules don't assign it inherit the previous value),
    numLinkToks, numWikiTokensSeen (reset to 0 at each wiki trigger,
    ++ per in-context token — the LUCENE-1133 run detector the
    collapse loop keys on).
  - WikipediaTokenizer.java:183-213 (TOKENS_ONLY emission, the
    first-token posInc=0 -> 1 fixup), :215-246 collapseAndSaveTokens
    (BOTH: collapsed run first — gap chars rewritten as single
    spaces, trimmed, UNTOKENIZED_TOKEN_FLAG=1, posInc read from the
    scanner AFTER the lookahead — then the saved sub-tokens with the
    first saved one at posInc 0), :252-282 collapseTokens
    (UNTOKENIZED_ONLY), and the yypushback of the whole lookahead
    token WITHOUT restoring scanner state (:241-243 — the reference
    rescans it under the post-run state; kept).

This is an ANALYSIS-chain component: it runs inside the same Arrow
batch UDFs as every other tokenizer here (one Python state machine
pass per document, no per-token JVM crossings), so the Spark plan
shape is identical to the standard chain's.
"""

from __future__ import annotations

import re
from typing import List, NamedTuple, Optional, Sequence, Set, Tuple

__all__ = [
    "WikiToken",
    "wikipedia_tokenize",
    "TOKEN_TYPES",
    "TOKENS_ONLY",
    "UNTOKENIZED_ONLY",
    "BOTH",
    "UNTOKENIZED_TOKEN_FLAG",
]

# -- type ids (WikipediaTokenizer.java:50-92) --------------------------------
ALPHANUM, APOSTROPHE, ACRONYM, COMPANY, EMAIL, HOST, NUM, CJ = range(8)
INTERNAL_LINK, EXTERNAL_LINK, CITATION, CATEGORY, BOLD, ITALICS, \
    BOLD_ITALICS, HEADING, SUB_HEADING, EXTERNAL_LINK_URL = range(8, 18)

TOKEN_TYPES = [
    "<ALPHANUM>", "<APOSTROPHE>", "<ACRONYM>", "<COMPANY>", "<EMAIL>",
    "<HOST>", "<NUM>", "<CJ>", "il", "el", "ci", "c", "b", "i", "bi",
    "h", "sh", "elu",
]

TOKENS_ONLY = 0
UNTOKENIZED_ONLY = 1
BOTH = 2
UNTOKENIZED_TOKEN_FLAG = 1

# -- macros (jflex character classes, kept to the spec's ranges) -------------
_L = (r"A-Za-zÀ-ÖØ-öø-ÿĀ-῿"
      r"ﾠ-ￜ")
_D = (r"0-9٠-٩۰-۹०-९০-৯"
      r"੦-੯૦-૯୦-୯௧-௯"
      r"౦-౯೦-೯൦-൯๐-๙"
      r"໐-໙၀-၉")
_K = r"가-힯ᄀ-ᇿ"
_CJ = (r"぀-㆏㄀-ㄯ゠-ヿㇰ-ㇿ"
       r"㌀-㍿㐀-䶿一-鿿豈-﫿"
       r"･-ﾟ")

_ALNUM = f"[{_L}{_D}{_K}]+"
_ALPHA = f"[{_L}]+"
_HASDIG = f"[{_L}{_D}]*[{_D}][{_L}{_D}]*"
_P = r"[_\-/.,]"
_WS = r"(?:\r\n|[ \r\n\t\f])"


def _c(p: str):
    return re.compile(p)


_R_ALPHANUM = _c(_ALNUM)
_R_APOSTROPHE = _c(f"{_ALPHA}(?:'{_ALPHA})+")
_R_ACRONYM = _c(f"{_ALPHA}\\.(?:{_ALPHA}\\.)+")
_R_COMPANY = _c(f"{_ALPHA}[&@]{_ALPHA}")
_R_EMAIL = _c(f"{_ALNUM}(?:[.\\-_]{_ALNUM})*@{_ALNUM}(?:[.\\-]{_ALNUM})+")
_R_HOST = _c(f"{_ALNUM}(?:\\.{_ALNUM})+")
# NUM's seven alternatives scored separately (maximal munch = max over
# alternatives; Python alternation is first-match, not longest)
_R_NUM = [_c(p) for p in (
    f"{_ALNUM}{_P}{_HASDIG}",
    f"[{_D}]+{_P}[{_D}]+",
    f"{_HASDIG}{_P}{_ALNUM}",
    f"{_ALNUM}(?:{_P}{_HASDIG}{_P}{_ALNUM})+",
    f"{_HASDIG}(?:{_P}{_ALNUM}{_P}{_HASDIG})+",
    f"{_ALNUM}{_P}{_HASDIG}(?:{_P}{_ALNUM}{_P}{_HASDIG})+",
    f"{_HASDIG}{_P}{_ALNUM}(?:{_P}{_HASDIG}{_P}{_ALNUM})+",
)]
_R_CJ = _c(f"[{_CJ}]")
_R_TAGS = _c(f"</?{_ALNUM}(?:{_WS}*{_ALNUM}=\"{_ALNUM}\")*>")
_R_WS = _c(_WS)
_R_DOT = _c(r"[^\r\n]")
_R_URL = _c(
    f"(?:http://|https://){_ALNUM}(?:\\.{_ALNUM})+"
    f"[{_L}{_D}{_K}_\\-/.,?&=#]*")
_R_INFOBOX = _c(r"\{\{[Ii]nfobox_")

(YYINITIAL, CATEGORY_STATE, INTERNAL_LINK_STATE, EXTERNAL_LINK_STATE,
 TWO_SINGLE_QUOTES_STATE, THREE_SINGLE_QUOTES_STATE,
 FIVE_SINGLE_QUOTES_STATE, DOUBLE_EQUALS_STATE, DOUBLE_BRACE_STATE,
 STRING) = range(10)

YYEOF = -1


class WikiToken(NamedTuple):
    term: str
    type: str
    start: int
    end: int
    pos_inc: int
    flags: int


def _lit(s: str):
    return _c(re.escape(s))


class _Scanner:
    """WikipediaTokenizerImpl: maximal-munch over the active rule set
    (state rules in file order + the global catch-all last)."""

    def __init__(self, text: str):
        self.text = text
        self.pos = 0
        self.state = YYINITIAL
        self.current_tok_type = 0
        self.num_balanced = 0
        self.position_inc = 1
        self.num_link_toks = 0
        self.num_wiki_tokens_seen = 0
        self.start = 0
        self.length = 0

    # -- actions: each returns a token-type id to emit, or None ------------
    def get_next_token(self) -> int:
        text, n = self.text, len(self.text)
        while self.pos < n:
            skip_m, skip_act, flat = _FAST[self.state]
            sm = skip_m(text, self.pos)
            if sm is not None:
                # a run of chars that cannot start any non-ignore
                # rule: fire the state's (idempotent) ignore action
                # once and jump the whole run
                self.start = self.pos
                self.length = sm.end() - self.pos
                self.pos = sm.end()
                skip_act(self)
                continue
            pos = self.pos
            best_len = 0
            best_rule = None
            for match, action in flat:
                m = match(text, pos)
                if m is not None:
                    ln = m.end() - pos
                    if ln > best_len:
                        best_len = ln
                        best_rule = action
            if best_rule is None:  # pragma: no cover - catch-all total
                self.pos += 1
                continue
            self.start = pos
            self.length = best_len
            self.pos = pos + best_len
            tok = best_rule(self)
            if tok is not None:
                return tok
        return YYEOF

    def yypushback_all(self) -> None:
        # yypushback(yylength()) — rewind the whole last match; scanner
        # STATE is not restored (reference behavior)
        self.pos = self.start

    def yytext(self) -> str:
        return self.text[self.start:self.start + self.length]


# -- rule actions (side effects verbatim from the jflex action code) --------

def _a_generic(tok_type):
    def act(s: _Scanner):
        s.position_inc = 1
        return tok_type
    return act


def _a_ignore_initial(s: _Scanner):
    s.num_wiki_tokens_seen = 0
    s.position_inc = 1
    return None


def _a_dbl_bracket(s: _Scanner):
    s.num_wiki_tokens_seen = 0
    s.position_inc = 1
    s.current_tok_type = INTERNAL_LINK
    s.state = INTERNAL_LINK_STATE
    return None


def _a_dbl_bracket_cat(s: _Scanner):
    s.num_wiki_tokens_seen = 0
    s.position_inc = 1
    s.current_tok_type = CATEGORY
    s.state = CATEGORY_STATE
    return None


def _a_external_open(s: _Scanner):
    s.num_wiki_tokens_seen = 0
    s.position_inc = 1
    s.current_tok_type = EXTERNAL_LINK_URL
    s.state = EXTERNAL_LINK_STATE
    return None


def _a_two_quotes(s: _Scanner):
    s.num_wiki_tokens_seen = 0
    s.position_inc = 1
    if s.num_balanced == 0:
        s.num_balanced += 1
        s.state = TWO_SINGLE_QUOTES_STATE
    else:
        s.num_balanced = 0
    return None


def _a_dbl_equals(s: _Scanner):
    s.num_wiki_tokens_seen = 0
    s.position_inc = 1
    s.state = DOUBLE_EQUALS_STATE
    return None


def _a_citation_open(s: _Scanner):
    s.num_wiki_tokens_seen = 0
    s.position_inc = 1
    s.current_tok_type = CITATION
    s.state = DOUBLE_BRACE_STATE
    return None


def _a_ctx_alnum(next_state):
    def act(s: _Scanner):
        s.state = next_state
        s.num_wiki_tokens_seen += 1
        return s.current_tok_type
    return act


def _a_link_close(s: _Scanner):
    s.num_link_toks = 0
    s.state = YYINITIAL
    return None


def _a_cat_close(s: _Scanner):
    s.state = YYINITIAL
    return None


def _a_ignore_posinc1(s: _Scanner):
    s.position_inc = 1
    return None


def _a_ext_url(s: _Scanner):
    s.position_inc = 1
    s.num_wiki_tokens_seen += 1
    s.state = EXTERNAL_LINK_STATE
    return s.current_tok_type


def _a_ext_alnum(s: _Scanner):
    s.position_inc = 0 if s.num_link_toks == 0 else 1
    s.num_wiki_tokens_seen += 1
    s.current_tok_type = EXTERNAL_LINK
    s.state = EXTERNAL_LINK_STATE
    s.num_link_toks += 1
    return s.current_tok_type


def _a_ext_close(s: _Scanner):
    s.num_link_toks = 0
    s.position_inc = 0
    s.state = YYINITIAL
    return None


def _a_quote_to_bold(s: _Scanner):
    s.current_tok_type = BOLD
    s.state = THREE_SINGLE_QUOTES_STATE
    return None


def _a_quote_to_bold_italics(s: _Scanner):
    s.current_tok_type = BOLD_ITALICS
    s.state = FIVE_SINGLE_QUOTES_STATE
    return None


def _a_italics_alnum(s: _Scanner):
    s.current_tok_type = ITALICS
    s.num_wiki_tokens_seen += 1
    s.state = STRING
    return s.current_tok_type


def _a_quote_link(s: _Scanner):
    s.current_tok_type = INTERNAL_LINK
    s.num_wiki_tokens_seen = 0
    s.state = INTERNAL_LINK_STATE
    return None


def _a_quote_cat(s: _Scanner):
    s.current_tok_type = CATEGORY
    s.num_wiki_tokens_seen = 0
    s.state = CATEGORY_STATE
    return None


def _a_quote_ext(s: _Scanner):
    s.current_tok_type = EXTERNAL_LINK
    s.num_wiki_tokens_seen = 0
    s.state = EXTERNAL_LINK_STATE
    return None


def _a_ignore(s: _Scanner):
    return None


def _a_sub_heading(s: _Scanner):
    s.current_tok_type = SUB_HEADING
    s.num_wiki_tokens_seen = 0
    s.state = STRING
    return None


def _a_heading_alnum(s: _Scanner):
    s.current_tok_type = HEADING
    s.state = DOUBLE_EQUALS_STATE
    s.num_wiki_tokens_seen += 1
    return s.current_tok_type


def _a_equals_close(s: _Scanner):
    s.state = YYINITIAL
    return None


def _a_brace_alnum(s: _Scanner):
    s.state = DOUBLE_BRACE_STATE
    s.num_wiki_tokens_seen = 0
    return s.current_tok_type


def _a_brace_close(s: _Scanner):
    s.state = YYINITIAL
    return None


def _a_string_end(s: _Scanner):
    s.num_balanced = 0
    s.current_tok_type = ALPHANUM
    s.state = YYINITIAL
    return None


def _a_string_alnum(s: _Scanner):
    s.state = STRING
    s.num_wiki_tokens_seen += 1
    return s.current_tok_type


def _a_string_link(s: _Scanner):
    s.num_balanced = 0
    s.num_wiki_tokens_seen = 0
    s.current_tok_type = INTERNAL_LINK
    s.state = INTERNAL_LINK_STATE
    return None


def _a_string_cat(s: _Scanner):
    s.num_balanced = 0
    s.num_wiki_tokens_seen = 0
    s.current_tok_type = CATEGORY
    s.state = CATEGORY_STATE
    return None


def _a_string_ext(s: _Scanner):
    s.num_balanced = 0
    s.num_wiki_tokens_seen = 0
    s.current_tok_type = EXTERNAL_LINK
    s.state = EXTERNAL_LINK_STATE
    return None


def _a_string_pipe(s: _Scanner):
    s.state = STRING
    return s.current_tok_type


# the spec's final unprefixed rule — active in EVERY (inclusive) state
_CATCH_ALL = ([_R_DOT, _R_WS, _R_TAGS], _a_ignore)

_RULES = {
    YYINITIAL: [
        ([_R_ALPHANUM], _a_generic(ALPHANUM)),
        ([_R_APOSTROPHE], _a_generic(APOSTROPHE)),
        ([_R_ACRONYM], _a_generic(ACRONYM)),
        ([_R_COMPANY], _a_generic(COMPANY)),
        ([_R_EMAIL], _a_generic(EMAIL)),
        (_R_NUM, _a_generic(NUM)),
        ([_R_HOST], _a_generic(HOST)),
        ([_R_CJ], _a_generic(CJ)),
        ([_lit("[[")], _a_dbl_bracket),
        ([_c(r"\[\[:?Category:")], _a_dbl_bracket_cat),
        ([_lit("[")], _a_external_open),
        ([_lit("''")], _a_two_quotes),
        ([_lit("==")], _a_dbl_equals),
        ([_lit("{{")], _a_citation_open),
        ([_lit("<ref>")], _a_citation_open),
        ([_R_DOT, _R_WS, _R_INFOBOX], _a_ignore_initial),
        _CATCH_ALL,
    ],
    INTERNAL_LINK_STATE: [
        ([_R_ALPHANUM], _a_ctx_alnum(INTERNAL_LINK_STATE)),
        ([_lit("]]")], _a_link_close),
        ([_R_DOT, _R_WS], _a_ignore_posinc1),
        _CATCH_ALL,
    ],
    EXTERNAL_LINK_STATE: [
        ([_R_URL], _a_ext_url),
        ([_R_ALPHANUM], _a_ext_alnum),
        ([_lit("]")], _a_ext_close),
        ([_R_WS], _a_ignore_posinc1),
        _CATCH_ALL,
    ],
    CATEGORY_STATE: [
        ([_R_ALPHANUM], _a_ctx_alnum(CATEGORY_STATE)),
        ([_lit("]]")], _a_cat_close),
        ([_R_DOT, _R_WS], _a_ignore_posinc1),
        _CATCH_ALL,
    ],
    TWO_SINGLE_QUOTES_STATE: [
        ([_lit("'")], _a_quote_to_bold),
        ([_lit("'''")], _a_quote_to_bold_italics),
        ([_R_ALPHANUM], _a_italics_alnum),
        ([_lit("[[")], _a_quote_link),
        ([_c(r"\[\[:?Category:")], _a_quote_cat),
        ([_lit("[")], _a_quote_ext),
        ([_R_DOT, _R_WS], _a_ignore),
        _CATCH_ALL,
    ],
    THREE_SINGLE_QUOTES_STATE: [
        ([_R_ALPHANUM], _a_string_alnum),
        ([_lit("[[")], _a_quote_link),
        ([_c(r"\[\[:?Category:")], _a_quote_cat),
        ([_lit("[")], _a_quote_ext),
        ([_R_DOT, _R_WS], _a_ignore),
        _CATCH_ALL,
    ],
    FIVE_SINGLE_QUOTES_STATE: [
        ([_R_ALPHANUM], _a_string_alnum),
        ([_lit("[[")], _a_quote_link),
        ([_c(r"\[\[:?Category:")], _a_quote_cat),
        ([_lit("[")], _a_quote_ext),
        ([_R_DOT, _R_WS], _a_ignore),
        _CATCH_ALL,
    ],
    DOUBLE_EQUALS_STATE: [
        ([_lit("=")], _a_sub_heading),
        ([_R_ALPHANUM], _a_heading_alnum),
        ([_lit("==")], _a_equals_close),
        ([_R_DOT, _R_WS], _a_ignore),
        _CATCH_ALL,
    ],
    DOUBLE_BRACE_STATE: [
        ([_R_ALPHANUM], _a_brace_alnum),
        ([_lit("}}")], _a_brace_close),
        ([_lit("</ref>")], _a_brace_close),
        ([_R_DOT, _R_WS], _a_ignore),
        _CATCH_ALL,
    ],
    STRING: [
        ([_lit("'''''")], _a_string_end),
        ([_lit("'''")], _a_string_end),
        ([_lit("''")], _a_string_end),
        ([_lit("===")], _a_string_end),
        ([_R_ALPHANUM], _a_string_alnum),
        ([_lit("[[")], _a_string_link),
        ([_c(r"\[\[:?Category:")], _a_string_cat),
        ([_lit("[")], _a_string_ext),
        ([_lit("|")], _a_string_pipe),
        ([_R_DOT, _R_WS], _a_ignore),
        _CATCH_ALL,
    ],
}

# STRING state: the spec lists DOUBLE_BRACKET_CAT after DOUBLE_BRACKET,
# but "[[:Category:"/"[[Category:" is LONGER than "[[" so maximal munch
# picks it regardless of order — same for the quote states.


# -- fast path: boring-run skipping + flattened rule sweep -------------------
# Most positions in real text hold characters that can only match the
# 1-char DOT/WS ignore rules (spaces, punctuation). Sweeping every
# rule at each of those positions dominated the kernel cost (r3
# verdict perf note). Per state we precompute:
#   - a skip regex matching a maximal run of characters that cannot
#     START any non-ignore rule (the alnum macro classes plus each
#     literal's first char plus '<' for TAGS are excluded), and
#   - the ignore action to fire ONCE for the run — sound because
#     every DOT/WS action is idempotent (_a_ignore_initial /
#     _a_ignore_posinc1 / _a_ignore set fixed values), and
#   - the rule list flattened to (pattern, action) pairs.
# Byte-identical output is guarded by the reference golden vectors in
# tests/test_wikipedia.py.

_STARTERS = f"{_L}{_D}{_K}{_CJ}<"
_SKIP_EXTRA = {
    YYINITIAL: "['={\\[",
    INTERNAL_LINK_STATE: "\\]",
    CATEGORY_STATE: "\\]",
    EXTERNAL_LINK_STATE: "\\]",
    TWO_SINGLE_QUOTES_STATE: "'\\[",
    THREE_SINGLE_QUOTES_STATE: "'\\[",
    FIVE_SINGLE_QUOTES_STATE: "'\\[",
    DOUBLE_EQUALS_STATE: "=",
    DOUBLE_BRACE_STATE: "}",
    STRING: "'=|\\[",
}

_FAST = {}
for _st, _rules in _RULES.items():
    _flat = []
    _ignore_action = None
    for _pats, _act in _rules:
        for _p in _pats:
            _flat.append((_p.match, _act))
        if _ignore_action is None and (_R_DOT in _pats or _R_WS in _pats):
            _ignore_action = _act
    _skip = _c(f"[^{_STARTERS}{_SKIP_EXTRA[_st]}]+")
    _FAST[_st] = (_skip.match, _ignore_action, _flat)


def wikipedia_tokenize(
    text: str,
    token_output: int = TOKENS_ONLY,
    untokenized_types: Optional[Sequence[str]] = None,
) -> List[WikiToken]:
    """WikipediaTokenizer.incrementToken (:183-213) + the collapse
    paths (:215-282). Returns the full stream as WikiToken rows."""
    untok: Set[str] = set(untokenized_types or ())
    s = _Scanner(text)
    out: List[WikiToken] = []
    first = True

    def emit(term, type_, start, end, pos_inc, flags):
        nonlocal first
        if first and pos_inc == 0:
            pos_inc = 1  # don't emit posinc=0 for the first token
        out.append(WikiToken(term, type_, start, end, pos_inc, flags))
        first = False

    while True:
        tok = s.get_next_token()
        if tok == YYEOF:
            return out
        type_ = TOKEN_TYPES[tok]
        if token_output == TOKENS_ONLY or type_ not in untok:
            emit(s.yytext(), type_, s.start, s.start + s.length,
                 s.position_inc, 0)
            continue

        # collapse the run (UNTOKENIZED_ONLY and BOTH)
        the_start = s.start
        buffer = s.yytext()
        last_pos = the_start + len(buffer)
        saved: List[Tuple[str, str, int, int, int]] = []
        if token_output == BOTH:
            saved.append((s.yytext(), type_, s.start,
                          s.start + s.length, 0))
        num_seen = 0
        while True:
            tmp = s.get_next_token()
            if tmp == YYEOF:
                break
            if not (tmp == tok and s.num_wiki_tokens_seen > num_seen):
                break
            curr_pos = s.start
            buffer += " " * (curr_pos - last_pos)
            buffer += s.yytext()
            if token_output == BOTH:
                saved.append((s.yytext(), type_, s.start,
                              s.start + s.length, s.position_inc))
            num_seen += 1
            last_pos = curr_pos + len(s.yytext())
        collapsed = buffer.strip()
        # the collapsed token's posInc is the scanner's CURRENT value
        # (post-lookahead), :205-208
        emit(collapsed, type_, the_start, the_start + len(collapsed),
             s.position_inc, UNTOKENIZED_TOKEN_FLAG)
        for term, ty, st, en, pi in saved:
            emit(term, ty, st, en, pi, 0)
        if tmp != YYEOF:
            s.yypushback_all()
