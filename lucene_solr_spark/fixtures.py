"""Reference query set (FIXTURES.md section 2) — fixed, deterministic,
mirroring ReutersQueryMaker.STANDARD_QUERIES' mix (single terms,
conjunctions, negations, long disjunctions; lucene/benchmark/src/java/
org/apache/lucene/benchmark/byTask/feeds/ReutersQueryMaker.java:43-56)
over source-code terms from the synthetic corpus vocabulary.

Each entry: dict(query_id, query_text, kind, mode, mm, exclude).
mode: 'or' | 'and'; mm: minShouldMatch for 'or'; exclude: MUST_NOT text.
"""

from __future__ import annotations

from lucene_solr_spark.corpusgen import HIGH_DF_IDS, VOCAB

QUERY_SET = [
    # -- 4 single terms ------------------------------------------------
    {"query_id": 1, "kind": "single_rare", "query_text": VOCAB[4990],
     "mode": "or", "mm": 0, "exclude": ""},
    {"query_id": 2, "kind": "single_mid", "query_text": VOCAB[300],
     "mode": "or", "mm": 0, "exclude": ""},
    {"query_id": 3, "kind": "single_high_df", "query_text": HIGH_DF_IDS[0],
     "mode": "or", "mm": 0, "exclude": ""},
    {"query_id": 4, "kind": "single_stopword", "query_text": "the",
     "mode": "or", "mm": 0, "exclude": ""},  # must match nothing
    # -- 3 two-term disjunctions ----------------------------------------
    {"query_id": 5, "kind": "or2", "query_text": f"{VOCAB[10]} {VOCAB[451]}",
     "mode": "or", "mm": 0, "exclude": ""},
    {"query_id": 6, "kind": "or2", "query_text": f"{VOCAB[77]} {VOCAB[2000]}",
     "mode": "or", "mm": 0, "exclude": ""},
    {"query_id": 7, "kind": "or2",
     "query_text": f"{HIGH_DF_IDS[1]} {VOCAB[3500]}",
     "mode": "or", "mm": 0, "exclude": ""},
    # -- 3 conjunctions --------------------------------------------------
    {"query_id": 8, "kind": "and2", "query_text": f"{VOCAB[50]} {VOCAB[120]}",
     "mode": "and", "mm": 0, "exclude": ""},
    {"query_id": 9, "kind": "and3",
     "query_text": "seven hundred seventy",  # English.intToEnglish signature
     "mode": "and", "mm": 0, "exclude": ""},
    {"query_id": 10, "kind": "and2",
     "query_text": f"{HIGH_DF_IDS[2]} {VOCAB[900]}",
     "mode": "and", "mm": 0, "exclude": ""},
    # -- 2 negations ------------------------------------------------------
    {"query_id": 11, "kind": "not", "query_text": VOCAB[30],
     "mode": "or", "mm": 0, "exclude": HIGH_DF_IDS[1]},
    {"query_id": 12, "kind": "not", "query_text": f"{VOCAB[15]} {VOCAB[16]}",
     "mode": "or", "mm": 0, "exclude": VOCAB[40]},
    # -- minShouldMatch 2-of-4 ---------------------------------------------
    {"query_id": 13, "kind": "mm2of4",
     "query_text": f"{VOCAB[60]} {VOCAB[61]} {VOCAB[62]} {VOCAB[63]}",
     "mode": "or", "mm": 2, "exclude": ""},
    # -- long 20-term disjunction (the "GATT paragraph" analogue) ----------
    {"query_id": 14, "kind": "or20",
     "query_text": " ".join(VOCAB[100:120]),
     "mode": "or", "mm": 0, "exclude": ""},
    # -- >255-char token (must be skipped by the analyzer) ------------------
    {"query_id": 15, "kind": "overlong_token",
     "query_text": ("x" * 260) + " " + VOCAB[10],
     "mode": "or", "mm": 0, "exclude": ""},
    # -- mixed-case/underscore (tokenizer + lowercase pinning) --------------
    {"query_id": 16, "kind": "case_underscore",
     "query_text": f"{HIGH_DF_IDS[0].upper()} {HIGH_DF_IDS[3].capitalize()}",
     "mode": "or", "mm": 0, "exclude": ""},
]

# exact-phrase query set (PhraseQuery tier): int_to_english doc headers
# give deterministic adjacent-token runs; entry 4 exercises a StopFilter
# hole via an embedded stopword pattern
PHRASE_QUERY_SET = [
    "seven hundred",
    "doc two hundred",
    "hundred seventy",
    "one thousand one hundred",
    "nonexistent_phrase_term here",
]

# classic query-string set (queryparser + BooleanScorer2 composition)
BOOLEAN_QUERY_SET = [
    f"+{VOCAB[50]} +{VOCAB[120]} {VOCAB[10]}",          # req + opt
    f"{VOCAB[10]} OR {VOCAB[451]}",
    f"{VOCAB[10]} AND {VOCAB[451]} {VOCAB[30]}",        # AND binds pair
    f'+"seven hundred" {VOCAB[10]} -{HIGH_DF_IDS[0]}',  # phrase MUST
    "read*",                                            # prefix const-score
    f"{VOCAB[300]}~",                                   # fuzzy expansion
    f"content:{VOCAB[15]} -{VOCAB[40]}",
    f"-{VOCAB[10]}",                                    # only NOT -> empty
    f'+{HIGH_DF_IDS[2]} "doc seven" {VOCAB[900]}',
    f"{VOCAB[10]}^2 {VOCAB[451]}",                      # term boost
    f'"seven hundred"^3 {VOCAB[10]}^0.5',               # phrase + frac boost
    f'+{VOCAB[15]}^4 -{VOCAB[40]} "doc seven"~2^2',     # boosted sloppy
]
