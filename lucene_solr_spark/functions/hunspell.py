"""Hunspell affix-dictionary stemming.

Reference: ``lucene/analysis/common/src/java/org/apache/lucene/
analysis/hunspell/`` —

* ``HunspellDictionary.java`` (:129-510): .aff/.dic parsing. The
  first non-blank non-comment affix line must be ``SET <charset>``
  (:271-308, parse error otherwise); ``FLAG`` selects the flag
  strategy (:323-341 — UTF-8/simple chars, ``num`` comma-separated
  ints with non-digits stripped, ``long`` two-ASCII-char flags COOKED
  BY SUMMING the two char codes, :484-505); ``AF`` alias lines
  (first = count, then values, 1-based ids, :399-419); ``PFX``/
  ``SFX`` headers carry cross-product Y/N and a rule count, each rule
  line needs >= 5 fields (strict mode throws, lenient skips),
  strip ``0`` means empty, the append may carry ``/flags`` (alias-
  resolved, parsed, SORTED), and the condition compiles to
  ``%s.*`` (prefix) / ``.*%s`` (suffix) matched FULLY against the
  STRIPPED word (:208-252, HunspellAffix.checkCondition:44-46).
  Affixes key by their append; with ignoreCase the word/affix maps
  lowercase both inserts and lookups (CharArrayMap ignoreCase).
  .dic: first line is the entry count; ``word/flags`` with flags cut
  at a TAB comment, alias-resolved, sorted; ignoreCase lowercases
  the entry (:352-396).

* ``HunspellStemmer.java`` (:72-207): stem(word) = [word if it's in
  the dictionary] + recursive affix stripping — every trailing
  substring is probed as a suffix append and every leading substring
  as a prefix append (:118-165), the affix flag must cross-check
  with the PREVIOUS step's append flags (null flags accept all,
  :210-212), applyAffix lowercases when ignoreCase, checks the
  condition on the stripped word, accepts when a dictionary entry
  carries the affix's flag, and recurses (crossProduct only) up to
  RECURSION_CAP=2 (:176-204). uniqueStems dedups by stem text
  (case-insensitive under ignoreCase, :81-99).

* ``HunspellStemFilter.java`` (:86-125): per token — keyword-marked
  tokens pass through; no stems => token unchanged; else the first
  stem replaces the token and the remaining stems emit at the SAME
  position (posInc 0); dedup=true uses uniqueStems.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

__all__ = ["HunspellAffix", "HunspellWord", "HunspellDictionary",
           "HunspellStemmer", "hunspell_stem_post"]

RECURSION_CAP = 2


class HunspellParseError(ValueError):
    pass


class HunspellWord:
    __slots__ = ("flags",)

    def __init__(self, flags=None):
        self.flags = tuple(sorted(flags)) if flags is not None else None

    def has_flag(self, flag) -> bool:
        return self.flags is not None and flag in self.flags


class HunspellAffix:
    __slots__ = ("flag", "strip", "append", "append_flags",
                 "condition", "cross_product")

    def __init__(self, flag, strip, append, append_flags, condition,
                 cross_product):
        self.flag = flag
        self.strip = strip
        self.append = append
        self.append_flags = append_flags  # sorted tuple or None
        self.condition = condition        # compiled, fullmatch
        self.cross_product = cross_product

    def check_condition(self, text: str) -> bool:
        return self.condition.fullmatch(text) is not None


# -- flag parsing strategies (:448-505) ---------------------------------

def _simple_flags(raw: str):
    return list(raw)


def _num_flags(raw: str):
    return [int(re.sub(r"[^0-9]", "", p)) for p in raw.strip().split(",")]


def _long_flags(raw: str):
    if not raw:
        return []
    # two ASCII chars cooked by SUMMING their codes (:496-500)
    return [ord(raw[i]) + ord(raw[i + 1])
            for i in range(0, len(raw), 2)]


class HunspellDictionary:
    def __init__(self, affix_text: str, dic_texts, ignore_case=False,
                 strict_affix_parsing=True):
        if isinstance(dic_texts, str):
            dic_texts = [dic_texts]
        self.ignore_case = ignore_case
        self._flags = _simple_flags
        self._aliases: Optional[List[str]] = None
        self._alias_count = 0
        self.prefixes: Dict[str, List[HunspellAffix]] = {}
        self.suffixes: Dict[str, List[HunspellAffix]] = {}
        self.words: Dict[str, List[HunspellWord]] = {}
        self._read_affix(affix_text, strict_affix_parsing)
        for t in dic_texts:
            self._read_dic(t)

    # -- lookups (CharArrayMap ignoreCase lowers the probe too) --------

    def _key(self, s: str) -> str:
        return s.lower() if self.ignore_case else s

    def lookup_word(self, w: str):
        return self.words.get(self._key(w))

    def lookup_prefix(self, w: str):
        return self.prefixes.get(self._key(w))

    def lookup_suffix(self, w: str):
        return self.suffixes.get(self._key(w))

    # -- .aff ----------------------------------------------------------

    def _read_affix(self, text: str, strict: bool):
        lines = text.splitlines()
        # SET <charset> must be the first non-blank non-comment line
        # (:271-308); later lines are read by the line parser below
        it = iter(enumerate(lines))
        for _i, line in it:
            if (not line or line[0] == "#" or not line.strip()):
                continue
            if line.startswith("SET "):
                self.encoding = line[4:].strip()
                break
            raise HunspellParseError(
                "The first non-comment line in the affix file must "
                f"be a 'SET charset', was: '{line}'")
        else:
            raise HunspellParseError("Unexpected end of affix file.")
        i = 0
        n = len(lines)
        while i < n:
            line = lines[i]
            if line.startswith("AF"):
                self._parse_alias(line)
            elif line.startswith("PFX"):
                i = self._parse_affix(self.prefixes, line, lines, i,
                                      "{}.*", strict)
            elif line.startswith("SFX"):
                i = self._parse_affix(self.suffixes, line, lines, i,
                                      ".*{}", strict)
            elif line.startswith("FLAG"):
                ft = line[5:]
                if ft == "num":
                    self._flags = _num_flags
                elif ft == "UTF-8":
                    self._flags = _simple_flags
                elif ft == "long":
                    self._flags = _long_flags
                else:
                    raise HunspellParseError(f"Unknown flag type: {ft}")
            i += 1

    def _parse_alias(self, line: str):
        args = re.split(r"\s+", line)
        if self._aliases is None:
            self._aliases = [""] * int(args[1])
        else:
            self._aliases[self._alias_count] = args[1]
            self._alias_count += 1

    def _alias_value(self, aid: int) -> str:
        try:
            return self._aliases[aid - 1]
        except IndexError as ex:
            raise ValueError(f"Bad flag alias number:{aid}") from ex

    def _parse_affix(self, affixes, header, lines, i, cond_pattern,
                     strict) -> int:
        args = re.split(r"\s+", header)
        cross_product = args[2] == "Y"
        num_lines = int(args[3])
        for _ in range(num_lines):
            i += 1
            rule = re.split(r"\s+", lines[i])
            if len(rule) < 5:
                if strict:
                    raise HunspellParseError(
                        "The affix file contains a rule with less "
                        f"than five elements (line {i + 1})")
                continue
            flag = self._flags(rule[1])[0]
            strip = "" if rule[2] == "0" else rule[2]
            affix_arg = rule[3]
            append_flags = None
            sep = affix_arg.rfind("/")
            if sep != -1:
                flag_part = affix_arg[sep + 1:]
                if self._alias_count > 0:
                    flag_part = self._alias_value(int(flag_part))
                append_flags = tuple(sorted(self._flags(flag_part)))
                append = affix_arg[:sep]
            else:
                append = affix_arg
            condition = re.compile(cond_pattern.format(rule[4]))
            aff = HunspellAffix(flag, strip, append, append_flags,
                                condition, cross_product)
            affixes.setdefault(self._key(append), []).append(aff)
        return i

    # -- .dic ----------------------------------------------------------

    def _read_dic(self, text: str):
        lines = text.splitlines()
        int(lines[0])  # first line: entry count
        for line in lines[1:]:
            sep = line.rfind("/")
            if sep == -1:
                word_form = HunspellWord()
                entry = line
            else:
                end = line.find("\t", sep)
                if end == -1:
                    end = len(line)
                flag_part = line[sep + 1:end]
                if self._alias_count > 0:
                    flag_part = self._alias_value(int(flag_part))
                word_form = HunspellWord(self._flags(flag_part))
                entry = line[:sep]
                if self.ignore_case:
                    entry = entry.lower()
            self.words.setdefault(self._key(entry), []).append(word_form)


class HunspellStemmer:
    def __init__(self, dictionary: HunspellDictionary):
        self.dictionary = dictionary

    def stem(self, word: str) -> List[str]:
        stems = []
        if self.dictionary.lookup_word(word) is not None:
            stems.append(word)
        stems.extend(self._stem(word, None, 0))
        return stems

    def unique_stems(self, word: str) -> List[str]:
        out, seen = [], set()
        key = (str.lower if self.dictionary.ignore_case else str)
        if self.dictionary.lookup_word(word) is not None:
            out.append(word)
            seen.add(key(word))
        for s in self._stem(word, None, 0):
            if key(s) not in seen:
                out.append(s)
                seen.add(key(s))
        return out

    def _stem(self, word: str, flags, depth: int) -> List[str]:
        stems: List[str] = []
        n = len(word)
        for i in range(n):
            suffixes = self.dictionary.lookup_suffix(word[i:])
            if not suffixes:
                continue
            for suffix in suffixes:
                if self._cross_checked(suffix.flag, flags):
                    de = n - len(suffix.append)
                    stripped = word[:de] + suffix.strip
                    stems.extend(self._apply(stripped, suffix, depth))
        for i in range(n - 1, -1, -1):
            prefixes = self.dictionary.lookup_prefix(word[:i])
            if not prefixes:
                continue
            for prefix in prefixes:
                if self._cross_checked(prefix.flag, flags):
                    start = len(prefix.append)
                    stripped = prefix.strip + word[start:]
                    stems.extend(self._apply(stripped, prefix, depth))
        return stems

    def _apply(self, stripped: str, affix: HunspellAffix,
               depth: int) -> List[str]:
        if self.dictionary.ignore_case:
            stripped = stripped.lower()
        if not affix.check_condition(stripped):
            return []
        stems: List[str] = []
        words = self.dictionary.lookup_word(stripped)
        if words is not None:
            for w in words:
                if w.has_flag(affix.flag):
                    stems.append(stripped)
        if affix.cross_product and depth < RECURSION_CAP:
            stems.extend(self._stem(stripped, affix.append_flags,
                                    depth + 1))
        return stems

    @staticmethod
    def _cross_checked(flag, flags) -> bool:
        return flags is None or flag in flags


def hunspell_stem_post(dictionary: HunspellDictionary,
                       dedup: bool = True, keyword_set=frozenset()):
    """HunspellStemFilter as an AnalyzerSpec post stage: keyword-set
    tokens pass through; no stems => unchanged; else first stem
    replaces the token, remaining stems join it at the SAME position
    (emits_overlaps)."""
    stemmer = HunspellStemmer(dictionary)

    def post(tp: List[Tuple[str, int]]) -> List[Tuple[str, int]]:
        out: List[Tuple[str, int]] = []
        for t, p in tp:
            if t in keyword_set:
                out.append((t, p))
                continue
            stems = (stemmer.unique_stems(t) if dedup
                     else stemmer.stem(t))
            if not stems:
                out.append((t, p))
                continue
            for s in stems:
                out.append((s, p))
        return out

    return post
