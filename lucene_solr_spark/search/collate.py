"""Ranked collation possibilities + the collation try loop: Solr's
PossibilityIterator and SpellCheckCollator (spellcheck.collate with
maxCollationTries).

Reference semantics mirrored rule-for-rule:
  - PossibilityIterator (solr/core/src/java/org/apache/solr/spelling/
    PossibilityIterator.java:67-147 constructor, :201-256 odometer):
    combinations of per-token corrections enumerated in odometer order
    (LAST token's suggestion index increments fastest, :220-239 carry
    walk), rank = sum of selected suggestion indices (:215-222 "rank
    += correctionIndex[i]"), capped at maxEvaluations evaluations;
    combinations where every correction equals its original are
    dropped (isSuggestionForReal :149-157); survivors go through a
    java.util.PriorityQueue of size maximumRequiredSuggestions whose
    comparator ranks POORER suggestions first (RankComparator
    :418-428: rank desc then index desc at the head), with the skip
    rule "full and rsp.rank >= head.rank -> skip" (:113-116) applied
    BEFORE the for-real filter; the final order drains the heap into
    an array back-to-front (:138-143), i.e. best (lowest rank) first.
    In non-overlap mode every batch holds exactly one combination so
    rsp.index is always 0 (:181-197 nextOnesIndex resets per batch) —
    equal-rank order is the Java binary-heap pop order, replicated
    here bit-for-bit by _JavaPQ.
  - overlap mode (suggestionsMayOverlap, :257-333): each combination
    splits into per-anchor maximal compatible subsets
    (separateOverlappingTokens/compatible walk kept verbatim,
    including the rotating index scan and the gotOne early-outs);
    conflicts = original-token offset ranges overlap inclusively
    (:335-347); combinations sorted by start offset and deduplicated
    by correction-object identity (RankedSpellPossibility.equals uses
    the List of SpellCheckCorrection objects, which do NOT override
    equals — and the constructor creates exactly one object per
    (token, suggestion) pair, so identity == value here).
  - SpellCheckCollator.collate (solr/core/.../spelling/
    SpellCheckCollator.java:51-180): maxTries < 1 means no index
    verification and iterate up to maxCollations; otherwise up to
    maxCollationTries possibilities are re-queried and only those
    with hits > 0 are kept, up to maxCollations; internalRank =
    rank*1000 + index in overlap mode, plain rank otherwise (:166).
  - getCollation (:182-235): in-order offset-arithmetic replacement of
    each original token with its correction inside the ORIGINAL query
    string, with the word-break parenthesis rule (corrections
    containing spaces get wrapped in parens; a preceding +/- is
    replicated onto every broken word and hoisted before the paren;
    TERM_IN_BOOLEAN_QUERY tokens get " AND " injected instead),
    position-increment-0 tokens skipped.

Scale note: this is query-side logic over a handful of suggestion
lists — O(maxEvaluations) tiny tuples on the driver, exactly like the
reference (it runs per request on one Solr node). The data-plane work
is the per-collation verification queries; `collate` batches those
through one searcher per call and the entry caps them at
maxCollationTries, mirroring the reference's own bound.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

__all__ = [
    "Token",
    "SpellCheckCorrection",
    "RankedSpellPossibility",
    "PossibilityIterator",
    "get_collation",
    "collate",
    "TERM_IN_BOOLEAN_QUERY_FLAG",
]

TERM_IN_BOOLEAN_QUERY_FLAG = 131072  # QueryConverter.java:73


class Token:
    """The slice of org.apache.lucene.analysis.Token the collator
    reads: text, offsets, position increment, flags."""

    __slots__ = ("text", "start", "end", "pos_inc", "flags")

    def __init__(self, text: str, start: int, end: int,
                 pos_inc: int = 1, flags: int = 0):
        self.text = text
        self.start = start
        self.end = end
        self.pos_inc = pos_inc
        self.flags = flags

    def __repr__(self):  # pragma: no cover - debug aid
        return f"Token({self.text!r},{self.start},{self.end})"


class SpellCheckCorrection:
    """SpellCheckCorrection.java — deliberately NO value equality:
    the reference class doesn't override equals/hashCode and the
    iterator allocates exactly one instance per (token, suggestion),
    so identity equality IS the dedup semantics."""

    __slots__ = ("original", "correction", "num_occurrences")

    def __init__(self, original: Token, correction: str,
                 num_occurrences: int):
        self.original = original
        self.correction = correction
        self.num_occurrences = num_occurrences


class RankedSpellPossibility:
    __slots__ = ("corrections", "rank", "index")

    def __init__(self):
        self.corrections: List[SpellCheckCorrection] = []
        self.rank = 0
        self.index = 0


class _JavaPQ:
    """java.util.PriorityQueue binary heap (siftUp on offer, siftDown
    on poll) under RankComparator (PossibilityIterator.java:418-428):
    head = highest rank, ties by highest index. Pop order for equal
    keys is heap-layout-dependent in Java; replicating the exact
    sift arithmetic keeps ours identical."""

    def __init__(self):
        self._q: List[RankedSpellPossibility] = []

    @staticmethod
    def _cmp(a: RankedSpellPossibility, b: RankedSpellPossibility) -> int:
        r = b.rank - a.rank
        if r == 0:
            r = b.index - a.index
        return r

    def size(self) -> int:
        return len(self._q)

    def peek(self) -> Optional[RankedSpellPossibility]:
        return self._q[0] if self._q else None

    def offer(self, item: RankedSpellPossibility) -> None:
        q = self._q
        k = len(q)
        q.append(item)
        while k > 0:
            parent = (k - 1) >> 1
            if self._cmp(item, q[parent]) >= 0:
                break
            q[k] = q[parent]
            k = parent
        q[k] = item

    def poll(self) -> RankedSpellPossibility:
        q = self._q
        head = q[0]
        x = q.pop()
        size = len(q)
        if size:
            k = 0
            half = size >> 1
            while k < half:
                child = 2 * k + 1
                right = child + 1
                if right < size and self._cmp(q[child], q[right]) > 0:
                    child = right
                if self._cmp(x, q[child]) <= 0:
                    break
                q[k] = q[child]
                k = child
            q[k] = x
        return head


def _is_for_real(rsp: RankedSpellPossibility) -> bool:
    # PossibilityIterator.java:149-157
    for corr in rsp.corrections:
        if corr.original.text != corr.correction:
            return True
    return False


def _conflicts(c1: SpellCheckCorrection, c2: SpellCheckCorrection) -> bool:
    # :335-347 — inclusive offset-range overlap of the ORIGINAL tokens
    s1, e1 = c1.original.start, c1.original.end
    s2, e2 = c2.original.start, c2.original.end
    return (s1 <= s2 <= e1) or (s2 <= s1 <= e2)


class PossibilityIterator:
    """Iterator over ranked correction combinations.

    ``suggestions``: ordered ``[(Token, [(correction, num_occ), ...])]``
    — outer order is the query-token order (the reference's
    LinkedHashMap insertion order), inner order is best-first.
    """

    def __init__(self, suggestions: Sequence[
            Tuple[Token, Sequence[Tuple[str, int]]]],
            maximum_required_suggestions: int,
            max_evaluations: int, overlap: bool = False):
        self._possibility_list: List[List[SpellCheckCorrection]] = []
        self._done = False
        self._suggestions_may_overlap = overlap
        self._next_ones: Optional[List[List[SpellCheckCorrection]]] = None
        self._next_ones_pos = 0
        self._next_ones_rank = 0
        self._next_ones_index = 0

        for token, sugg in suggestions:
            if not sugg:
                continue
            self._possibility_list.append([
                SpellCheckCorrection(token, corr, n) for corr, n in sugg])

        wrap = len(self._possibility_list)
        if wrap == 0:
            self._done = True
        else:
            self._correction_index = [0] * wrap

        pq = _JavaPQ()
        remove_dups: Optional[Dict[tuple, RankedSpellPossibility]] = (
            {} if overlap else None)
        num_evaluations = 0
        while (num_evaluations < max_evaluations
               and self._internal_has_next()):
            rsp = self._internal_next()
            num_evaluations += 1
            if (pq.size() >= maximum_required_suggestions
                    and rsp.rank >= pq.peek().rank):
                continue
            if not _is_for_real(rsp):
                continue
            if remove_dups is None:
                pq.offer(rsp)
            else:
                # token-offset order for match-and-replace (:123-125);
                # Python sort is stable like Collections.sort
                rsp.corrections.sort(key=lambda c: c.original.start)
                key = tuple(id(c) for c in rsp.corrections)
                if key not in remove_dups:
                    remove_dups[key] = rsp
                    pq.offer(rsp)
            if pq.size() > maximum_required_suggestions:
                removed = pq.poll()
                if remove_dups is not None:
                    del remove_dups[
                        tuple(id(c) for c in removed.corrections)]
        out: List[RankedSpellPossibility] = [None] * pq.size()
        for i in range(pq.size() - 1, -1, -1):
            out[i] = pq.poll()
        self._ranked = out
        self._ranked_pos = 0

    # -- public iterator protocol ------------------------------------------
    def __iter__(self):
        return self

    def __next__(self) -> RankedSpellPossibility:
        if self._ranked_pos >= len(self._ranked):
            raise StopIteration
        rsp = self._ranked[self._ranked_pos]
        self._ranked_pos += 1
        return rsp

    def has_next(self) -> bool:
        return self._ranked_pos < len(self._ranked)

    # -- internal enumeration (:154-256) -----------------------------------
    def _batch_has_next(self) -> bool:
        return (self._next_ones is not None
                and self._next_ones_pos < len(self._next_ones))

    def _batch_next(self) -> List[SpellCheckCorrection]:
        item = self._next_ones[self._next_ones_pos]
        self._next_ones_pos += 1
        return item

    def _internal_has_next(self) -> bool:
        if self._batch_has_next():
            return True
        if self._done:
            return False
        self._internal_next_advance()
        return self._batch_has_next()

    def _internal_next(self) -> RankedSpellPossibility:
        if not self._batch_has_next():
            if self._done:
                raise StopIteration
            self._internal_next_advance()
            if not self._batch_has_next():
                raise StopIteration
        rsl = RankedSpellPossibility()
        rsl.corrections = self._batch_next()
        rsl.rank = self._next_ones_rank
        rsl.index = self._next_ones_index
        self._next_ones_index += 1
        return rsl

    def _internal_next_advance(self) -> None:
        # :201-256 — odometer with last index fastest; the carry loop
        # and both done-flags kept verbatim
        if self._batch_has_next():
            return
        if self._done:
            raise StopIteration
        pl = self._possibility_list
        ci = self._correction_index
        possible_corrections: Optional[
            List[List[SpellCheckCorrection]]] = None
        rank = 0
        while (not self._done
               and (possible_corrections is None
                    or len(possible_corrections) == 0)):
            possible_correction: List[SpellCheckCorrection] = []
            rank = 0
            last = len(ci) - 1
            for i in range(len(ci)):
                single_word = pl[i]
                picked = single_word[ci[i]]
                rank += ci[i]
                if i == last:
                    ci[i] += 1
                    if ci[i] == len(single_word):
                        ci[i] = 0
                        if len(ci) == 1:
                            self._done = True
                        for ii in range(i - 1, -1, -1):
                            ci[ii] += 1
                            if ci[ii] >= len(pl[ii]) and ii > 0:
                                ci[ii] = 0
                            else:
                                break
                possible_correction.append(picked)
            if ci[0] == len(pl[0]):
                self._done = True
            if self._suggestions_may_overlap:
                possible_corrections = self._separate_overlapping(
                    possible_correction)
            else:
                possible_corrections = [possible_correction]
        self._next_ones = possible_corrections
        self._next_ones_pos = 0
        self._next_ones_rank = rank
        self._next_ones_index = 0

    def _separate_overlapping(
            self, possible: List[SpellCheckCorrection]
    ) -> List[List[SpellCheckCorrection]]:
        # :257-276
        if len(possible) == 1:
            return [possible]
        return [self._compatible(possible, i)
                for i in range(len(possible))]

    @staticmethod
    def _compatible(all_: List[SpellCheckCorrection],
                    pos: int) -> List[SpellCheckCorrection]:
        # :278-333 — rotating first pass anchored at `pos`, then
        # forward passes pinning one more element each round
        sacred = all_[pos]
        first_pass = [sacred]
        index = pos
        got_one = False
        for _ in range(len(all_) - 1):
            index += 1
            if index == len(all_):
                index = 0
            disposable = all_[index]
            if not _conflicts(sacred, disposable):
                first_pass.append(disposable)
                got_one = True
        if not got_one:
            return first_pass
        prior = first_pass

        pos = 1
        while True:
            if pos == len(prior) - 1:
                return prior
            subsequent = list(prior[:pos + 1])
            sacred = prior[pos]
            index = pos
            got_one = False
            for _ in range(len(prior) - 1):
                index += 1
                if index == len(prior):
                    break
                disposable = prior[index]
                if not _conflicts(sacred, disposable):
                    subsequent.append(disposable)
                    got_one = True
            if not got_one or pos == len(prior) - 1:
                return subsequent
            prior = subsequent
            pos += 1


def get_collation(orig_query: str,
                  corrections: List[SpellCheckCorrection]) -> str:
    """SpellCheckCollator.getCollation (:182-235) — offset-arithmetic
    in-place replacement, word-break paren/+-/AND rules verbatim."""
    collation = list(orig_query)
    offset = 0
    for correction in corrections:
        tok = correction.original
        if tok.pos_inc == 0:
            continue
        corr = correction.correction
        add_parenthesis = False
        required_or_prohibited: Optional[str] = None
        index_of_space = corr.find(" ")
        corr_sb = list(corr)
        bump = 1
        while -1 < index_of_space < len(corr) - 1:
            add_parenthesis = True
            previous_char = (collation[tok.start - 1]
                             if tok.start > 0 else " ")
            if previous_char in ("-", "+"):
                corr_sb.insert(index_of_space + bump, previous_char)
                if required_or_prohibited is None:
                    required_or_prohibited = previous_char
                bump += 1
            elif (tok.flags & TERM_IN_BOOLEAN_QUERY_FLAG) \
                    == TERM_IN_BOOLEAN_QUERY_FLAG:
                corr_sb[index_of_space + bump:index_of_space + bump] = \
                    list("AND ")
                bump += 4
            index_of_space = correction.correction.find(
                " ", index_of_space + bump)
        one_for_req_or_prohib = 0
        if add_parenthesis:
            if required_or_prohibited is not None:
                corr_sb.insert(0, required_or_prohibited)
                one_for_req_or_prohib += 1
            corr_sb.insert(0, "(")
            corr_sb.append(")")
        corr = "".join(corr_sb)
        start_index = tok.start + offset - one_for_req_or_prohib
        end_index = tok.end + offset
        collation[start_index:end_index] = list(corr)
        offset += (len(corr) - one_for_req_or_prohib
                   - (tok.end - tok.start))
    return "".join(collation)


class SpellCheckCollation:
    __slots__ = ("collation_query", "hits", "internal_rank",
                 "misspellings_and_corrections")

    def __init__(self, collation_query: str, hits: int,
                 internal_rank: int,
                 misspellings_and_corrections: List[Tuple[str, str]]):
        self.collation_query = collation_query
        self.hits = hits
        self.internal_rank = internal_rank
        self.misspellings_and_corrections = misspellings_and_corrections


def collate(suggestions: Sequence[Tuple[Token, Sequence[Tuple[str, int]]]],
            original_query: str,
            hit_counter: Optional[Callable[[str], int]],
            max_collations: int = 1,
            max_collation_tries: int = 0,
            max_collation_evaluations: int = 10000,
            overlap: bool = False) -> List[SpellCheckCollation]:
    """SpellCheckCollator.collate (:51-180). ``hit_counter`` re-runs a
    collation against the index and returns its hit count; pass None
    for the maxTries<1 / no-QueryComponent path (no verification,
    hits recorded as 0)."""
    verify = True
    max_tries = max_collation_tries
    max_number_to_iterate = max_tries
    if max_tries < 1:
        max_tries = 1
        max_number_to_iterate = max_collations
        verify = False
    if hit_counter is None and verify:
        max_tries = 1
        verify = False

    collations: List[SpellCheckCollation] = []
    try_no = 0
    coll_no = 0
    possibility_iter = PossibilityIterator(
        suggestions, max_number_to_iterate, max_collation_evaluations,
        overlap)
    while (try_no < max_tries and coll_no < max_collations
           and possibility_iter.has_next()):
        possibility = next(possibility_iter)
        collation_query = get_collation(
            original_query, possibility.corrections)
        hits = 0
        if verify:
            try_no += 1
            hits = int(hit_counter(collation_query))
        if hits > 0 or not verify:
            coll_no += 1
            collations.append(SpellCheckCollation(
                collation_query, hits,
                (possibility.rank * 1000 + possibility.index)
                if overlap else possibility.rank,
                [(c.original.text, c.correction)
                 for c in possibility.corrections]))
    return collations


def conjunction_merge_spelling(results, num_sug: int):
    """ConjunctionSolrSpellChecker.mergeCheckers (solr/spelling/
    ConjunctionSolrSpellChecker.java:96-142): suggestions for the same
    original token from several checkers interleave ROUND-ROBIN in
    checker order (one from each per pass, preserving each checker's
    own ordering), capped at numSug per token; token frequencies merge
    last-checker-wins (putAll order).

    ``results``: list of (suggestions, token_frequency) where
    suggestions maps token -> ordered list of (word, freq) and
    token_frequency maps token -> int (or None). Returns
    (merged_suggestions, merged_token_frequency) with the same
    shapes."""
    combined_tf = {}
    all_suggestions = {}
    for suggestions, token_freq in results:
        if token_freq:
            combined_tf.update(token_freq)
        for token, corrections in suggestions.items():
            all_suggestions.setdefault(token, []).append(
                list(corrections))
    merged = {}
    for token, lists in all_suggestions.items():
        iters = [iter(l) for l in lists]
        out = []
        added = 0
        while added < num_sug:
            any_data = False
            for it in iters:
                nxt = next(it, None)
                if nxt is not None:
                    any_data = True
                    out.append(nxt)
                    added += 1
                    if added == num_sug:
                        break
            if not any_data:
                break
        merged[token] = out
    return merged, combined_tf
