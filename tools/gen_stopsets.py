#!/usr/bin/env python3
"""Regenerate lucene_solr_spark/functions/stopsets.py from the
reference's published per-language default stop lists.

The stop lists are PUBLIC DATA the reference itself embeds and
redistributes (the snowball/*_stop.txt files are the snowballstem.org
project's published stop lists, BSD; the per-language stopwords.txt
files are Apache-licensed resource data). This tool re-serializes
them into a standalone Python data module so the engine carries the
same default analyzer behavior without a runtime dependency on the
reference tree — the same treatment kstem_data.py / the RSLP rule
tables already received.

Parse rules mirror WordlistLoader exactly
(analysis/common/src/java/org/apache/lucene/analysis/util/
WordlistLoader.java):
- getSnowballWordSet (:143-159): strip a '|' trailing comment, split
  the remainder on whitespace, add every nonempty token.
- getWordSet(reader, comment) (:109-124): skip lines that START with
  the comment string, else add line.trim().
- getWordSet(reader) (:54-67): add every line.trim() (gl, lv).

Per-analyzer loader selection is read off each <Lang>Analyzer's
DefaultSetHolder (file:line in the LANGS table below).
"""
import io
import os
import sys

REF = "/root/reference/lucene/analysis/common/src/resources/org/apache/lucene/analysis"

# lang -> (relative stop file, format)
# format: "snowball" | "hash" (leading-# comment lines skipped) |
#         "plain" (every trimmed line)
LANGS = {
    # snowball-format lists (WordlistLoader.getSnowballWordSet):
    # da/DanishAnalyzer.java:65, nl/DutchAnalyzer.java:77,
    # fi/FinnishAnalyzer.java:65, fr/FrenchAnalyzer.java:81,
    # de/GermanAnalyzer.java:70, hu/HungarianAnalyzer.java:65,
    # it/ItalianAnalyzer.java:74, no/NorwegianAnalyzer.java:65,
    # pt/PortugueseAnalyzer.java:64, ru/RussianAnalyzer.java:55,
    # es/SpanishAnalyzer.java:64, sv/SwedishAnalyzer.java:65,
    # en: snowball/english_stop.txt ships but EnglishAnalyzer uses
    # StandardAnalyzer.STOP_WORDS_SET (en/EnglishAnalyzer.java:54) —
    # emitted anyway for users selecting the snowball English list.
    "da": ("snowball/danish_stop.txt", "snowball"),
    "nl": ("snowball/dutch_stop.txt", "snowball"),
    "en_snowball": ("snowball/english_stop.txt", "snowball"),
    "fi": ("snowball/finnish_stop.txt", "snowball"),
    "fr": ("snowball/french_stop.txt", "snowball"),
    "de": ("snowball/german_stop.txt", "snowball"),
    "hu": ("snowball/hungarian_stop.txt", "snowball"),
    "it": ("snowball/italian_stop.txt", "snowball"),
    "no": ("snowball/norwegian_stop.txt", "snowball"),
    "pt": ("snowball/portuguese_stop.txt", "snowball"),
    "ru": ("snowball/russian_stop.txt", "snowball"),
    "es": ("snowball/spanish_stop.txt", "snowball"),
    "sv": ("snowball/swedish_stop.txt", "snowball"),
    # '#'-comment lists (loadStopwordSet(..., "#") /
    # getWordSet(..., "#", ...)): ar/ArabicAnalyzer.java:78,
    # bg/BulgarianAnalyzer.java:72, br/BrazilianAnalyzer.java:66,
    # ca/CatalanAnalyzer.java:71, cjk/CJKAnalyzer.java:61,
    # cz/CzechAnalyzer.java:62, el/GreekAnalyzer.java:61,
    # eu/BasqueAnalyzer.java:63, fa/PersianAnalyzer.java:77,
    # ga/IrishAnalyzer.java:81, hi/HindiAnalyzer.java:66,
    # hy/ArmenianAnalyzer.java:63, id/IndonesianAnalyzer.java:58,
    # ro/RomanianAnalyzer.java:68, th/ThaiAnalyzer.java:64,
    # tr/TurkishAnalyzer.java:67
    "ar": ("ar/stopwords.txt", "hash"),
    "bg": ("bg/stopwords.txt", "hash"),
    "br": ("br/stopwords.txt", "hash"),
    "ca": ("ca/stopwords.txt", "hash"),
    "cjk": ("cjk/stopwords.txt", "hash"),
    "cz": ("cz/stopwords.txt", "hash"),
    "el": ("el/stopwords.txt", "hash"),
    "eu": ("eu/stopwords.txt", "hash"),
    "fa": ("fa/stopwords.txt", "hash"),
    "ga": ("ga/stopwords.txt", "hash"),
    "hi": ("hi/stopwords.txt", "hash"),
    "hy": ("hy/stopwords.txt", "hash"),
    "id": ("id/stopwords.txt", "hash"),
    "ro": ("ro/stopwords.txt", "hash"),
    "th": ("th/stopwords.txt", "hash"),
    "tr": ("tr/stopwords.txt", "hash"),
    # plain lists (getWordSet with no comment arg):
    # gl/GalicianAnalyzer.java:63, lv/LatvianAnalyzer.java:63
    "gl": ("gl/stopwords.txt", "plain"),
    "lv": ("lv/stopwords.txt", "plain"),
}


def parse(path: str, fmt: str) -> list:
    words = []
    seen = set()
    with io.open(path, encoding="utf-8") as f:
        for line in f.read().split("\n"):
            if fmt == "snowball":
                c = line.find("|")
                if c >= 0:
                    line = line[:c]
                toks = line.split()
            elif fmt == "hash":
                if line.startswith("#"):
                    continue
                t = line.strip()
                toks = [t] if t else []
                # getWordSet(reader, comment) adds line.trim() even
                # when empty -> CharArraySet ignores "" (length-0 adds
                # are effectively a single "" key; it never matches a
                # token) — we simply drop empties.
            else:
                t = line.strip()
                toks = [t] if t else []
            for w in toks:
                if w and w not in seen:
                    seen.add(w)
                    words.append(w)
    return words


def main(out_path: str) -> None:
    blocks = []
    for lang in sorted(LANGS):
        rel, fmt = LANGS[lang]
        words = parse(os.path.join(REF, rel), fmt)
        body = ",\n    ".join(
            ", ".join(repr(w) for w in words[i:i + 6])
            for i in range(0, len(words), 6))
        blocks.append(
            f"# {rel} ({fmt} format, {len(words)} words)\n"
            f"STOP_{lang.upper()} = frozenset([\n    {body},\n])")
    names = ",\n    ".join(
        f"{lang!r}: STOP_{lang.upper()}" for lang in sorted(LANGS))
    src = '''"""Per-language default stop sets — re-serialized from the
reference's published resource data (generated by
tools/gen_stopsets.py; see that tool's header for provenance and the
exact WordlistLoader parse rules replayed per format). Each set is
the byte-exact content a <Lang>Analyzer's getDefaultStopSet() loads
(analysis/common/src/resources/org/apache/lucene/analysis/...).

Keys are the analyzer package codes (ar bg br ca cjk cz da de el eu
fa fi fr ga gl hi hu hy id it lv nl no pt ro ru sv th tr) plus
'en_snowball' for the snowball English list that ships alongside
(EnglishAnalyzer itself uses StandardAnalyzer.STOP_WORDS_SET — the
33-word set in constants.STOPWORDS)."""

'''
    src += "\n\n".join(blocks)
    src += f"\n\nSTOP_SETS = {{\n    {names},\n}}\n"
    with io.open(out_path, "w", encoding="utf-8") as f:
        f.write(src)
    total = sum(len(parse(os.path.join(REF, rel), fmt))
                for rel, fmt in LANGS.values())
    print(f"wrote {out_path}: {len(LANGS)} languages, {total} words")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "lucene_solr_spark/functions/stopsets.py")
