"""WordBreakSpellChecker re-expression (lucene/suggest/src/java/org/
apache/lucene/search/spell/WordBreakSpellChecker.java): suggest
breaking a compound term into indexed words ("machinelearning" ->
"machine learning") and combining adjacent query terms into one
indexed word ("micro soft" -> "microsoft").

Algorithm kept rule-for-rule:
- suggestWordBreaks (:93-133, recursion :258-312): split points from
  minBreakWordLength to len-minBreakWordLength (codepoint counts);
  a split is emitted when BOTH sides reach minSuggestionFrequency;
  recursion on the right part while numberBreaks < maxChanges — the
  left part must itself pass the frequency gate to descend; the
  maxEvaluations budget (default 1000) bounds the walk; SUGGEST_
  WHEN_NOT_IN_INDEX returns nothing when the original term is indexed,
  SUGGEST_MORE_POPULAR raises the gate to the original's frequency.
- result order: NUM_CHANGES_THEN_MAX_FREQUENCY = fewest words, then
  max word frequency descending (LengthThenMaxFreqComparator
  :446-458); _SUM_ variant sums instead. Java's PriorityQueue leaves
  ties unordered — this port adds a deterministic final tie-break on
  the joined suggestion text (documented delta).
- suggestWordCombinations (:162-255): adjacent runs of up to
  maxChanges+1 terms (maxCombineWordLength codepoint cap, SEPARATOR
  breaks runs); emitted when the CONCATENATION reaches
  minSuggestionFrequency (mode gates per :215-218); score = number of
  combinations; order = fewest combinations, then combined frequency
  descending (:474-487).

Spark shape: the reference probes the term dictionary once per
candidate (ir.docFreq). Here every candidate substring/concatenation
is collected FIRST and resolved with ONE batched ``df_lookup`` call —
the engine's pushed-down term_stats probe (plus the bloom sidecar's
driver-side NO fast path), so a suggestion costs one Spark job
regardless of split count.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence, Tuple

SEPARATOR = ""  # SEPARATOR_TERM = new Term("", "") (:44)

SUGGEST_WHEN_NOT_IN_INDEX = "when_not_in_index"
SUGGEST_MORE_POPULAR = "more_popular"
SUGGEST_ALWAYS = "always"


class WordBreakSpellChecker:
    def __init__(self, df_lookup: Callable[[Sequence[str]], Dict[str, int]],
                 min_suggestion_frequency: int = 1,
                 min_break_word_length: int = 1,
                 max_combine_word_length: int = 20,
                 max_changes: int = 1,
                 max_evaluations: int = 1000):
        self.df_lookup = df_lookup
        self.min_suggestion_frequency = min_suggestion_frequency
        self.min_break_word_length = max(1, min_break_word_length)
        self.max_combine_word_length = max_combine_word_length
        self.max_changes = max_changes
        self.max_evaluations = max_evaluations

    # -- word breaks -----------------------------------------------------
    def _all_substrings(self, term: str) -> List[str]:
        mbl = self.min_break_word_length
        subs = set()
        n = len(term)
        for a in range(0, n - mbl + 1):
            for b in range(a + mbl, n + 1):
                subs.add(term[a:b])
        return list(subs)

    def suggest_word_breaks(
        self, term: str, max_suggestions: int = 5,
        suggest_mode: str = SUGGEST_WHEN_NOT_IN_INDEX,
        sort_by_sum: bool = False,
    ) -> List[List[Tuple[str, int]]]:
        """Returns suggestions best-first; each is [(word, freq), ...].
        One batched df lookup for the original term plus every
        candidate substring."""
        if max_suggestions < 1:
            return []
        dfs = self.df_lookup([term] + self._all_substrings(term))
        freq = lambda t: dfs.get(t, 0)  # noqa: E731
        orig = freq(term)
        if orig > 0 and suggest_mode == SUGGEST_WHEN_NOT_IN_INDEX:
            return []
        min_freq = self.min_suggestion_frequency
        if suggest_mode == SUGGEST_MORE_POPULAR:
            min_freq = orig if orig else 1

        suggestions: List[List[Tuple[str, int]]] = []
        budget = [0]  # totalEvaluations across the recursion (:305-309)

        def recurse(text: str, number_breaks: int,
                    prefix: List[Tuple[str, int]]):
            mbl = self.min_break_word_length
            if len(text) < mbl * 2:
                return 0
            this_time = 0
            for i in range(mbl, len(text) - mbl + 1):
                left, right = text[:i], text[i:]
                lf = freq(left)
                if lf >= min_freq:
                    rf = freq(right)
                    if rf >= min_freq:
                        suggestions.append(
                            prefix + [(left, lf), (right, rf)])
                    if number_breaks + 1 <= self.max_changes:
                        recurse(right, number_breaks + 1,
                                prefix + [(left, lf)])
                this_time += 1
                budget[0] += 1
                if budget[0] >= self.max_evaluations:
                    break
            return this_time

        recurse(term, 1, [])
        agg = max if not sort_by_sum else sum

        def key(sugg):
            return (len(sugg), -agg(f for _w, f in sugg),
                    " ".join(w for w, _f in sugg))

        suggestions.sort(key=key)
        return suggestions[:max_suggestions]

    # -- combinations ----------------------------------------------------
    def suggest_word_combinations(
        self, terms: Sequence[str], max_suggestions: int = 5,
        suggest_mode: str = SUGGEST_WHEN_NOT_IN_INDEX,
    ) -> List[Tuple[Tuple[str, int], List[int]]]:
        """Returns [( (combined_word, freq), [orig indexes] )]
        best-first. One batched df lookup for the originals plus every
        candidate concatenation."""
        if max_suggestions < 1:
            return []
        cands = []
        for i in range(len(terms) - 1):
            if terms[i] == SEPARATOR:
                continue
            combined = terms[i]
            if len(combined) > self.max_combine_word_length:
                continue
            for j in range(i + 1, len(terms)):
                if j - i > self.max_changes or terms[j] == SEPARATOR:
                    break
                combined = combined + terms[j]
                if len(combined) > self.max_combine_word_length:
                    break
                cands.append(combined)
        dfs = self.df_lookup(list(terms) + cands)
        freq = lambda t: dfs.get(t, 0)  # noqa: E731
        orig = ([freq(t) for t in terms]
                if suggest_mode != SUGGEST_ALWAYS else None)

        out = []
        evals = 0
        for i in range(len(terms) - 1):
            if terms[i] == SEPARATOR:
                continue
            combined = terms[i]
            if len(combined) > self.max_combine_word_length:
                continue
            max_f = orig[i] if orig is not None else 0
            min_f = orig[i] if orig is not None else (1 << 31)
            for j in range(i + 1, len(terms)):
                if j - i > self.max_changes or terms[j] == SEPARATOR:
                    break
                combined = combined + terms[j]
                if len(combined) > self.max_combine_word_length:
                    break
                if orig is not None:
                    max_f = max(max_f, orig[j])
                    min_f = min(min_f, orig[j])
                cf = freq(combined)
                ok = (suggest_mode != SUGGEST_MORE_POPULAR or cf >= max_f)
                ok = ok and (suggest_mode != SUGGEST_WHEN_NOT_IN_INDEX
                             or min_f == 0)
                if ok and cf >= self.min_suggestion_frequency:
                    out.append(((combined, cf), list(range(i, j + 1))))
                evals += 1
                if evals == self.max_evaluations:
                    break

        def key(item):
            (w, f), idxs = item
            return (len(idxs) - 1, -f, w)

        out.sort(key=key)
        return out[:max_suggestions]


# -- Solr wrapper (WordBreakSolrSpellChecker) --------------------------------

PROHIBITED_TERM_FLAG = 16384   # QueryConverter.java:58
REQUIRED_TERM_FLAG = 32768     # :62
TERM_PRECEDES_NEW_BOOLEAN_OPERATOR_FLAG = 65536  # :71


def word_break_spelling_result(
    tokens: Sequence[Tuple[str, int, int]],
    wbsp: WordBreakSpellChecker,
    df_lookup: Callable[[Sequence[str]], Dict[str, int]],
    num_suggestions: int = 5,
    combine_words: bool = True,
    break_words: bool = True,
    sort_by_sum: bool = False,
    suggest_mode: str = SUGGEST_WHEN_NOT_IN_INDEX,
) -> List[Tuple[str, int, int, str, int, int]]:
    """WordBreakSolrSpellChecker.getSuggestions (solr/core/.../
    spelling/WordBreakSolrSpellChecker.java:195-322): per-token break
    suggestions (freq = max or summed word freq per the tie-breaker,
    :231-247) and adjacent-run combine suggestions over the term array
    WITH separator terms injected between tokens whose
    required/prohibited status changes or after a token that precedes
    a new boolean operator (:208-226); the two lists are interleaved
    into one SpellingResult by descending freq with the
    breakCount>=combineCount tie rule, stopping once more than
    ``num_suggestions`` distinct tokens have entries (:276-320).
    Token frequency annotations: docFreq for break tokens,
    max/summed word docFreq for combine tokens (getCombineFrequency
    :324-337).

    ``tokens``: [(text, start_offset, flags)] — the
    SpellingQueryConverter output. Returns interleaved rows
    [(token_text, start, end, suggestion, freq, token_freq)].

    NOTE kept verbatim: combine suggestion indexes are positions in
    the SEPARATOR-bearing term array but are used to index the
    separator-free token array (:255-266) — the reference's own
    index-space conflation, observable only when separators are
    injected."""
    term_arr: List[str] = []
    token_arr = [(t, s, s + len(t), f) for t, s, f in tokens]
    last_prohibited = last_required = last_precedes = False
    break_list: List[Tuple[Tuple[str, int, int], str, int]] = []
    for i, (text, _start, _end, flags) in enumerate(token_arr):
        prohibited = (flags & PROHIBITED_TERM_FLAG) == PROHIBITED_TERM_FLAG
        required = (flags & REQUIRED_TERM_FLAG) == REQUIRED_TERM_FLAG
        precedes = (flags & TERM_PRECEDES_NEW_BOOLEAN_OPERATOR_FLAG) \
            == TERM_PRECEDES_NEW_BOOLEAN_OPERATOR_FLAG
        if i > 0 and (prohibited != last_prohibited
                      or required != last_required or last_precedes):
            term_arr.append(SEPARATOR)
        last_prohibited, last_required, last_precedes = \
            prohibited, required, precedes
        term_arr.append(text)
        if break_words:
            for sugg in wbsp.suggest_word_breaks(
                    text, num_suggestions, suggest_mode,
                    sort_by_sum=sort_by_sum):
                agg = sum if sort_by_sum else max
                break_list.append((
                    token_arr[i][:3],
                    " ".join(w for w, _f in sugg),
                    agg(f for _w, f in sugg),
                ))

    combines = wbsp.suggest_word_combinations(
        term_arr, num_suggestions, suggest_mode)
    combine_list: List[Tuple[Tuple[str, int, int], str, int]] = []
    if combine_words:
        for (combined, cfreq), idxs in combines:
            first, last = idxs[0], idxs[-1]
            text = " ".join(
                token_arr[i][0] for i in range(first, last + 1))
            combine_list.append((
                (text, token_arr[first][1], token_arr[last][2]),
                combined, cfreq,
            ))

    # one batched probe covers every docFreq annotation (the
    # reference's per-entry ir.docFreq calls, :293-318, :324-337)
    probe = set()
    for tok, _s, _f in break_list:
        probe.add(tok[0])
    for tok, _s, _f in combine_list:
        probe.update(tok[0].split())
    dfs = df_lookup(sorted(probe)) if probe else {}

    def _combine_freq(token_text: str) -> int:
        words = token_text.split()
        if sort_by_sum:
            return sum(dfs.get(w, 0) for w in words)
        return max((dfs.get(w, 0) for w in words), default=0)

    out: List[Tuple[str, int, int, str, int, int]] = []
    seen_tokens: List[Tuple[str, int, int]] = []
    bi, ci = iter(break_list), iter(combine_list)
    last_break = next(bi, None)
    last_combine = next(ci, None)
    break_count = combine_count = 0

    def _emit(entry, token_freq):
        tok, sugg, freq = entry
        out.append((tok[0], tok[1], tok[2], sugg, freq, token_freq))
        if tok not in seen_tokens:
            seen_tokens.append(tok)

    while last_break is not None or last_combine is not None:
        if last_break is None:
            _emit(last_combine, _combine_freq(last_combine[0][0]))
            last_combine = None
        elif last_combine is None:
            _emit(last_break, dfs.get(last_break[0][0], 0))
            last_break = None
        elif last_break[2] < last_combine[2]:
            _emit(last_combine, _combine_freq(last_combine[0][0]))
            last_combine = None
        elif last_combine[2] < last_break[2]:
            _emit(last_break, dfs.get(last_break[0][0], 0))
            last_break = None
        elif break_count >= combine_count:
            _emit(last_combine, _combine_freq(last_combine[0][0]))
            last_combine = None
        else:
            _emit(last_break, dfs.get(last_break[0][0], 0))
            last_break = None
        if len(seen_tokens) > num_suggestions:
            break
        if last_break is None:
            last_break = next(bi, None)
            if last_break is not None:
                break_count += 1
        if last_combine is None:
            last_combine = next(ci, None)
            if last_combine is not None:
                combine_count += 1
    return out
