"""Classic query-string parser (subset of the Lucene classic syntax,
lucene/queryparser/src/java/org/apache/lucene/queryparser/classic/
QueryParserBase.java:113 `parse`; clause modifiers :300-420; field
terms re-analyzed through the same chain :490-620).

Supported surface (documented subset — no parentheses/boost/slop):

  term                 SHOULD TermQuery (default operator OR)
  +term / -term        MUST / MUST_NOT
  "a b"                PhraseQuery (hole-aware positions), +/- allowed
  a AND b              both clauses MUST (classic AND binding)
  NOT a                next clause MUST_NOT
  a OR b               both SHOULD (the default)
  content:term         explicit field (only `content` exists)
  pre*                 PrefixQuery -> CONSTANT_SCORE rewrite
                       (MultiTermQuery.java:107-116): matching docs
                       score 1.0
  term~                FuzzyQuery (edit distance <= 2, the classic `~`
                       default) -> SCORING_BOOLEAN rewrite: expanded
                       terms scored as a disjunction sub-scorer.
                       Distance is Damerau (Levenshtein + adjacent
                       transposition as ONE primitive edit), matching
                       FuzzyQuery.defaultTranspositions=true
                       (FuzzyQuery.java:52, LevenshteinAutomata
                       transpositions): 'abcd'~ matches 'bacd' at
                       distance 1. Clause(transpositions=False) gives
                       the plain-Levenshtein automaton instead.
                       rewrite='top_terms_<n>' bounds oversize
                       expansions; without it they raise
                       TooManyClauses (scoring kinds only).

The parser produces occur-tagged clause ASTs; stats resolution and
scoring live in the executor (search_boolean)."""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<mod>[+\-])?
        (?:
            "(?P<phrase>[^"]*)"(?:~(?P<pslop>\d+))?(?:\^(?P<pboost>\d+(?:\.\d+)?))?
          | (?:(?P<rfld>[A-Za-z_]\w*):)?(?P<rng>[\[\{][^\]\}]*[\]\}])
          | /(?P<regex>(?:[^/\\]|\\.)*)/
          | (?P<lparen>\()
          | (?P<rparen>\))
          | (?P<word>[^\s"()]+)
        )
    )""",
    re.VERBOSE,
)

_RANGE_INNER = re.compile(r"^\s*(\S+)\s+TO\s+(\S+)\s*$")

_KEYWORDS = {"AND", "OR", "NOT", "&&", "||", "!"}


@dataclass
class Clause:
    occur: str                  # 'must' | 'should' | 'not'
    # 'term' | 'phrase' | 'prefix' | 'wildcard' | 'regexp' | 'range'
    # | 'multi' (fuzzy)
    kind: str
    text: str                   # raw payload (analyzed later)
    terms: List[str] = field(default_factory=list)
    offsets: List[Tuple[str, int]] = field(default_factory=list)
    # multi-term kinds: expansion source (prefix stem / fuzzy term /
    # wildcard pattern / regexp source)
    pattern: Optional[str] = None
    # 'range' bounds (TermRangeQuery): None = open end
    lo: Optional[str] = None
    hi: Optional[str] = None
    include_lo: bool = True
    include_hi: bool = True
    # phrase slop ("..."~n -> SloppyPhraseScorer; 0 = exact)
    slop: int = 0
    # query boost (term^2 / "phrase"^2): weight = f32(idf * boost)
    # before the (k1+1) factor (BM25Stats.normalize,
    # similarities/BM25Similarity.java:289-293)
    boost: float = 1.0
    # 'range' only: None/'content' = term range over the index; any
    # other name = numeric/field range (NumericRangeQuery surface)
    field: Optional[str] = None
    # 'multi' (fuzzy) only: adjacent transposition = 1 primitive edit
    # (FuzzyQuery.java:52 defaultTranspositions=true)
    transpositions: bool = True
    # 'bool' (parenthesized group): nested BooleanQuery sub-clauses
    # (classic QP grouping, QueryParserBase.java Clause production;
    # BooleanQuery-in-BooleanQuery nesting)
    sub: Optional[List["Clause"]] = None


class QueryParseError(ValueError):
    pass


class TooManyClauses(QueryParseError):
    """A multi-term expansion exceeded BooleanQuery.maxClauseCount
    (search/BooleanQuery.java:50-66 throws TooManyClauses rather than
    silently truncating; same contract here — use a TOP_TERMS(n)
    rewrite for large expansions)."""


# -- ExtendableQueryParser (lucene/queryparser/.../ext/) --------------------
# Extensions.splitExtensionField (ext/Extensions.java:121-131): a field
# token may carry '<indexField>:<extensionKey>'; the registered
# ParserExtension builds the clause for (field, term) itself
# (ParserExtension.parse(ExtensionQuery)). Registry keyed like
# Extensions.add(key, extension).

_PARSER_EXTENSIONS: dict = {}


def register_parser_extension(key: str, fn) -> None:
    """Extensions.add analogue: ``fn(field, term) -> Clause`` is called
    when a query uses ``<field>:<key>:<term>`` (or ``<key>:<term>`` on
    the default field)."""
    _PARSER_EXTENSIONS[key] = fn


def _raw_extension(field: str, term: str) -> "Clause":
    """Built-in 'raw' extension: the term bypasses the analysis chain
    entirely (the ext-module use case — a clause type classic cannot
    express; semantics of Solr's {!raw} on the lucene parser side)."""
    return Clause(occur="should", kind="term", text=term, terms=[term])


register_parser_extension("raw", _raw_extension)


_WILDCARD_SPLIT = re.compile(r"(\\.)|([?*]+)")


def analyzing_wildcard_pattern(word: str, analyzer) -> str:
    """AnalyzingQueryParser.getWildcardQuery chunk analysis
    (lucene/queryparser/.../analyzing/AnalyzingQueryParser.java:70-104
    + analyzeSingleChunk :163-196): split the term at wildcard runs
    (``[?*]+``; escaped chars are gobbled so ``\\*`` stays literal),
    pass each literal chunk through the FULL analysis chain — the
    chunk must come out as exactly one token, else ParseException —
    and reassemble with the wildcards in place. This is what makes
    ``RUNNing*`` match ``run``-stemmed terms under a stemming chain,
    where classic QP only lowercases."""
    sb = []
    last = 0
    for m in _WILDCARD_SPLIT.finditer(word):
        if m.group(1) is not None:
            continue  # escaped char: stays inside the chunk
        if m.start() > last:
            sb.append(
                _analyze_single_chunk(analyzer, word, word[last:m.start()])
            )
        sb.append(m.group(2))
        last = m.end()
    if last < len(word):
        sb.append(_analyze_single_chunk(analyzer, word, word[last:]))
    return "".join(sb)


def _analyze_single_chunk(analyzer, whole: str, chunk: str) -> str:
    """analyzeSingleChunk: the chain must produce exactly one token
    for the chunk (AnalyzingQueryParser.java:178-195 throws on zero —
    e.g. a stopword chunk — and on more than one)."""
    toks = analyzer.analyze(chunk)
    if len(toks) != 1:
        raise QueryParseError(
            f"analyzer produced {len(toks)} tokens for wildcard chunk "
            f"{chunk!r} of {whole!r} (need exactly 1)"
        )
    return toks[0]


def parse_query(q: str, analyzer=None, analyzing: bool = False
                ) -> List[Clause]:
    """Parse ``q`` into occur-tagged clauses, re-analyzing every field
    term through ``analyzer`` (an AnalyzerSpec; defaults to the
    standard chain) — QueryParserBase re-analysis contract: query terms
    MUST go through the same chain the index was built with.

    ``analyzing=True`` = AnalyzingQueryParser mode (queryparser/
    analyzing/AnalyzingQueryParser.java): wildcard literal chunks also
    pass through the full chain. (Prefix stems, fuzzy terms and range
    bounds are chain-analyzed in BOTH modes here — this parser's
    documented strictness over classic's lowercase-only expansion.)"""
    if analyzer is None:
        from lucene_solr_spark.functions.analysis import get_analyzer

        analyzer = get_analyzer("standard")
    analyze = analyzer.analyze
    analyze_with_positions = analyzer.analyze_with_positions
    clauses: List[Clause] = []
    pending: Optional[str] = None   # occur forced on the NEXT clause
    # grouping parens: a stack of (outer clause list, group occur) —
    # '(' pushes a fresh clause list, ')' pops and wraps it in a
    # kind='bool' clause (classic QP grouping -> nested BooleanQuery)
    stack: List[Tuple[List[Clause], str]] = []
    pos = 0
    while pos < len(q):
        m = _TOKEN.match(q, pos)
        if not m or m.end() == pos:
            break
        pos = m.end()
        mod, phrase, word = m.group("mod"), m.group("phrase"), m.group("word")
        rng, regex = m.group("rng"), m.group("regex")
        occur0 = "should"
        if mod == "+":
            occur0 = "must"
        elif mod == "-":
            occur0 = "not"
        elif pending is not None:
            occur0 = pending
        if m.group("lparen") is not None:
            stack.append((clauses, occur0))
            clauses = []
            pending = None
            continue
        if m.group("rparen") is not None:
            if not stack:
                raise QueryParseError("unbalanced ')'")
            sub = clauses
            clauses, gocc = stack.pop()
            if sub:
                clauses.append(
                    Clause(occur=gocc, kind="bool", text="(...)", sub=sub))
            pending = None
            continue
        if rng is not None:
            # TermRangeQuery surface: [a TO b] inclusive, {a TO b}
            # exclusive, mixed brackets allowed, * = open end
            # (classic QP range syntax, QueryParserBase.java range
            # production; TermRangeQuery.java inclusive-bound flags).
            # field:[a TO b] on a non-content field is the numeric/
            # field range (NumericRangeQuery surface) — bounds kept
            # verbatim (trie fields are not analyzed).
            pending = None
            rfld = m.group("rfld")
            if rfld == "content":
                rfld = None
            inner = _RANGE_INNER.match(rng[1:-1])
            if not inner:
                raise QueryParseError(f"bad range syntax: {rng!r}")

            def _bound(tok: str) -> Optional[str]:
                if tok == "*":
                    return None
                if rfld is not None:
                    return tok
                ts = analyze(tok)
                if len(ts) != 1:
                    raise QueryParseError(f"bad range bound: {tok!r}")
                return ts[0]

            clauses.append(
                Clause(occur=occur0, kind="range", text=rng,
                       lo=_bound(inner.group(1)), hi=_bound(inner.group(2)),
                       include_lo=rng[0] == "[", include_hi=rng[-1] == "]",
                       field=rfld)
            )
            continue
        if regex is not None:
            # RegexpQuery surface (search/RegexpQuery.java): /pattern/
            # matches whole terms; the pattern is NOT analyzed (the
            # automaton walks raw term bytes — AutomatonQuery.java)
            pending = None
            clauses.append(
                Clause(occur=occur0, kind="regexp", text=f"/{regex}/",
                       pattern=regex)
            )
            continue
        if phrase is None and word in _KEYWORDS:
            if word in ("AND", "&&"):
                if clauses and clauses[-1].occur == "should":
                    clauses[-1].occur = "must"
                pending = "must"
            elif word in ("NOT", "!"):
                pending = "not"
            else:  # OR
                pending = None
            continue
        occur = "should"
        if mod == "+":
            occur = "must"
        elif mod == "-":
            occur = "not"
        elif pending is not None:
            occur = pending
        pending = None
        if phrase is not None:
            tp = analyze_with_positions(phrase)
            if not tp:
                continue
            p0 = tp[0][1]
            pslop, pboost = m.group("pslop"), m.group("pboost")
            clauses.append(
                Clause(occur=occur, kind="phrase", text=phrase,
                       terms=list(dict.fromkeys(t for t, _ in tp)),
                       offsets=[(t, p - p0) for t, p in tp],
                       slop=int(pslop) if pslop else 0,
                       boost=float(pboost) if pboost else 1.0)
            )
            continue
        if ":" in word:
            fld, word = word.split(":", 1)
            # ExtendableQueryParser dispatch (ext/ExtendableQueryParser
            # .java getFieldQuery + Extensions.splitExtensionField):
            # '<field>:<key>:<term>' routes to the registered
            # extension; '<key>:<term>' binds it to the default field
            ext_key = data = None
            if ":" in word:
                maybe_key, rest = word.split(":", 1)
                if fld == "content" and maybe_key in _PARSER_EXTENSIONS:
                    ext_key, data = maybe_key, rest
            if ext_key is None and fld in _PARSER_EXTENSIONS:
                ext_key, data, fld = fld, word, "content"
            if ext_key is not None:
                c = _PARSER_EXTENSIONS[ext_key]("content", data)
                c.occur = occur
                clauses.append(c)
                continue
            if fld != "content":
                raise QueryParseError(f"unknown field: {fld!r}")
        boost = 1.0
        bm = re.match(r"^(.+)\^(\d+(?:\.\d+)?)$", word)
        if bm:
            word, boost = bm.group(1), float(bm.group(2))
            if "*" in word or "?" in word or word.endswith("~"):
                raise QueryParseError(
                    "boost is supported on term and phrase clauses only"
                )
        if word.endswith("*") and len(word) > 1 and "*" not in word[:-1] \
                and "?" not in word:
            stem = analyze(word[:-1])
            if len(stem) != 1:
                raise QueryParseError(f"bad prefix term: {word!r}")
            clauses.append(
                Clause(occur=occur, kind="prefix", text=word,
                       pattern=stem[0])
            )
            continue
        if "*" in word or "?" in word:
            # WildcardQuery (search/WildcardQuery.java): * = any run,
            # ? = one char. Classic mode: pattern is lowercased when
            # the chain lowercases (QueryParserBase
            # lowercaseExpandedTerms) but otherwise NOT analyzed.
            # Analyzing mode (AnalyzingQueryParser): every literal
            # chunk between wildcard runs goes through the full chain.
            if analyzing:
                pat = analyzing_wildcard_pattern(word, analyzer)
            else:
                pat = word.lower() if analyzer.lowercase else word
            clauses.append(
                Clause(occur=occur, kind="wildcard", text=word, pattern=pat)
            )
            continue
        if word.endswith("~"):
            stem = analyze(word[:-1])
            if len(stem) != 1:
                raise QueryParseError(f"bad fuzzy term: {word!r}")
            clauses.append(
                Clause(occur=occur, kind="multi", text=word,
                       pattern=stem[0])
            )
            continue
        for t in analyze(word):
            clauses.append(Clause(occur=occur, kind="term", text=t,
                                  terms=[t], boost=boost))
    if stack:
        raise QueryParseError("unbalanced '('")
    return clauses


def insert_precedence_groups(q: str) -> str:
    """PrecedenceQueryParser (queryparser/flexible/precedence/
    PrecedenceQueryParser.java + BooleanModifiersQueryNodeProcessor):
    AND binds tighter than OR, so 'a AND b OR c' means
    (+a +b) OR (c) instead of classic's flat '+a +b c'. Implemented as
    a grammar pass: every maximal explicit-AND run is wrapped in a
    grouping paren and the classic parser then builds the nested
    BooleanQuery — juxtaposed bare clauses keep the classic
    default-OR behavior, NOT binds to its following operand, existing
    parens recurse (each level gets its own precedence grouping)."""
    items = _prec_items(q)
    return _prec_render(items)


def _prec_items(q: str):
    """Recursive token items: ('u', raw_text) units, ('g', mod, sub)
    paren groups, ('op', word) for AND/OR/NOT keyword forms."""
    stack: List[Tuple[list, Optional[str]]] = []
    items: list = []
    pos = 0
    while pos < len(q):
        m = _TOKEN.match(q, pos)
        if not m or m.end() == pos:
            break
        pos = m.end()
        if m.group("lparen") is not None:
            stack.append((items, m.group("mod")))
            items = []
            continue
        if m.group("rparen") is not None:
            if not stack:
                raise QueryParseError("unbalanced ')'")
            sub = items
            items, gmod = stack.pop()
            items.append(("g", gmod, sub))
            continue
        word = m.group("word")
        if (word in _KEYWORDS and m.group("mod") is None
                and m.group("phrase") is None):
            items.append(("op", word))
            continue
        items.append(("u", m.group(0).strip()))
    if stack:
        raise QueryParseError("unbalanced '('")
    return items


def _prec_render(items) -> str:
    seq: list = []
    pending_not: List[str] = []
    for it in items:
        if it[0] == "op":
            w = it[1]
            if w in ("AND", "&&"):
                seq.append("AND")
            elif w in ("OR", "||"):
                seq.append("OR")
            else:
                pending_not.append("NOT")
            continue
        if it[0] == "u":
            s = it[1]
        else:
            s = (it[1] or "") + "(" + _prec_render(it[2]) + ")"
        if pending_not:
            s = " ".join(pending_not) + " " + s
            pending_not = []
        seq.append(("operand", s))
    if pending_not:      # dangling NOT: keep classic's pending token
        seq.append(("operand", " ".join(pending_not)))
    runs: List[List[str]] = []
    run: List[str] = []
    join_next = False
    for el in seq:
        if el == "AND":
            join_next = True
        elif el == "OR":
            join_next = False
        else:
            if run and join_next:
                run.append(el[1])
            else:
                if run:
                    runs.append(run)
                run = [el[1]]
            join_next = False
    if run:
        runs.append(run)
    return " ".join(
        "(" + " AND ".join(r) + ")" if len(r) > 1 else r[0] for r in runs)


def parse_complex_phrase(phrase_text: str, analyzer=None) -> List[Clause]:
    """ComplexPhraseQueryParser pass-2 clause extraction
    (lucene/queryparser/.../complexPhrase/ComplexPhraseQueryParser.java
    :226-283 ComplexPhraseQuery.rewrite): the quoted phrase body is
    re-parsed position by position; each position yields either a plain
    term (SpanTermQuery) or a multi-term clause (prefix / wildcard /
    fuzzy — the reference forces SCORING_BOOLEAN rewrite at :88-99 so
    the expansion is visible, then folds it into a SpanOrQuery at
    :346-348). The caller arranges the positions in an in-order
    SpanNearQuery with the phrase's slop (:283).

    Documented divergences: boolean operators / negation inside the
    phrase (:289-311 SpanNotQuery path) are not supported — only the
    positional sequence form `"a b* c~"`; analyzer-dropped tokens
    (stopwords) skip their position instead of leaving a hole (the
    reference's behavior here is analyzer-dependent and historically
    buggy — LUCENE-3821).
    """
    if analyzer is None:
        from lucene_solr_spark.functions.analysis import get_analyzer

        analyzer = get_analyzer("standard")
    analyze = analyzer.analyze
    out: List[Clause] = []
    for word in phrase_text.split():
        if word.endswith("*") and len(word) > 1 and "*" not in word[:-1] \
                and "?" not in word:
            stem = analyze(word[:-1])
            if len(stem) != 1:
                raise QueryParseError(f"bad prefix term in phrase: {word!r}")
            out.append(Clause(occur="must", kind="prefix", text=word,
                              pattern=stem[0]))
            continue
        if "*" in word or "?" in word:
            pat = word.lower() if analyzer.lowercase else word
            out.append(Clause(occur="must", kind="wildcard", text=word,
                              pattern=pat))
            continue
        if word.endswith("~"):
            stem = analyze(word[:-1])
            if len(stem) != 1:
                raise QueryParseError(f"bad fuzzy term in phrase: {word!r}")
            out.append(Clause(occur="must", kind="multi", text=word,
                              pattern=stem[0]))
            continue
        for t in analyze(word):
            out.append(Clause(occur="must", kind="term", text=t, terms=[t]))
    return out
