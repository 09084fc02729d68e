"""Deterministic synthetic source-code corpus (FIXTURES.md section 1).

Shape fixed by BASELINE.json input_hint:
    corpus(repo string, path string, commit string, lang string,
           content string)

Design mirrors the reference's deterministic-corpus test idiom
(English.intToEnglish gives every docID a derivable unique text,
lucene/test-framework/src/java/org/apache/lucene/util/English.java:177-186):
  - every doc i carries `intToEnglish(i)` number words in a header
    comment -> a derivable rare-term signature per doc;
  - identifiers drawn from a Zipf(s~1.1) vocabulary of ~5000
    snake_case/camelCase names; keywords; operators (dropped by the
    tokenizer); numbers (NUM tokens);
  - doc lengths log-uniform 10..4000 tokens (populates many SmallFloat
    norm buckets -> exercises BM25 docID tie-breaks);
  - ~1% of files duplicated verbatim under different paths
    (content_sha256 invariant / dedup checks);
  - a handful of high-DF identifiers present in >50% of docs (drives the
    skewed-term salted merge path).

Everything is a pure function of the row index `i` (seed folded in), so
generation is reproducible at any parallelism / batching — the property
docID determinism is later built on.
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np
import pandas as pd

SEED = 42
N_REPOS = 20
LANGS = ["py", "java", "scala", "go", "js"]
_EXT = {"py": "py", "java": "java", "scala": "scala", "go": "go", "js": "js"}

_ONES = ("zero one two three four five six seven eight nine ten eleven "
         "twelve thirteen fourteen fifteen sixteen seventeen eighteen "
         "nineteen").split()
_TENS = ("zero ten twenty thirty forty fifty sixty seventy eighty "
         "ninety").split()


def int_to_english(i: int) -> str:
    """English number words (reference: English.intToEnglish,
    lucene/test-framework/.../util/English.java:177-186 idiom; exact
    wording ours — only determinism and uniqueness matter)."""
    if i < 0:
        return "minus " + int_to_english(-i)
    if i < 20:
        return _ONES[i]
    if i < 100:
        return _TENS[i // 10] + ("" if i % 10 == 0 else " " + _ONES[i % 10])
    if i < 1000:
        return (_ONES[i // 100] + " hundred"
                + ("" if i % 100 == 0 else " " + int_to_english(i % 100)))
    for unit, name in ((10 ** 9, "billion"), (10 ** 6, "million"),
                       (10 ** 3, "thousand")):
        if i >= unit:
            head = int_to_english(i // unit) + " " + name
            rest = i % unit
            return head if rest == 0 else head + " " + int_to_english(rest)
    raise AssertionError


def _build_vocab(n: int = 5000) -> List[str]:
    rng = np.random.Generator(np.random.PCG64(SEED))
    stems = ("read write parse scan merge flush commit seek token term doc "
             "index query score block heap sort hash byte char buffer "
             "stream field norm stat freq delta pack skip tier shard "
             "batch row col page cache pool lock sync async util json "
             "http node edge graph tree list map set queue stack").split()
    suffixes = ("er handler builder writer reader impl util helper factory "
                "manager ctx info meta data view proxy codec fmt enc dec "
                "buf idx ptr ref val arg res tmp").split()
    vocab = []
    seen = set()
    while len(vocab) < n:
        a = stems[int(rng.integers(len(stems)))]
        b = suffixes[int(rng.integers(len(suffixes)))]
        c = stems[int(rng.integers(len(stems)))]
        style = int(rng.integers(3))
        if style == 0:
            w = f"{a}_{b}"
        elif style == 1:
            w = a + b.capitalize()
        else:
            w = f"{a}_{c}_{b}"
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    return vocab


VOCAB = _build_vocab()
# Zipf(s=1.1) CDF over the vocab (rank 1 = most common)
_ranks = np.arange(1, len(VOCAB) + 1, dtype=np.float64)
_zipf_p = _ranks ** -1.1
_ZIPF_CDF = np.cumsum(_zipf_p / _zipf_p.sum())

# present in >50% of docs -> df-skewed terms for the salted merge path
HIGH_DF_IDS = ["common_util", "base_handler", "core_ctx", "shared_buf"]
KEYWORDS = ["def", "return", "import", "class", "if", "for", "while",
            "else", "break", "continue"]
OPERATORS = [" = ", " == ", " + ", " / ", "(", ") ", "; ", ", ", " -> ",
             " && ", " << "]
LITERALS = ["0x1F", "3.14", "1_000", '"s"', "42", "0.5", "256", "8080"]


def doc_content(i: int) -> str:
    """Content of doc index i — pure function of i (and SEED)."""
    if i % 100 == 99 and i > 0:
        return doc_content(i - 1)  # ~1% verbatim duplicates
    rng = np.random.Generator(np.random.PCG64(SEED * 1_000_003 + i))
    # log-uniform token budget 10..4000
    n_tokens = int(10.0 * 400.0 ** rng.random())
    ids = np.searchsorted(_ZIPF_CDF, rng.random(n_tokens))
    words = [VOCAB[j] for j in ids]
    parts = [f"// doc {int_to_english(i)}\n"]
    u = rng.random(n_tokens)
    for k, w in enumerate(words):
        r = u[k]
        if r < 0.06:
            parts.append(KEYWORDS[int(r * 1000) % len(KEYWORDS)] + " ")
        elif r < 0.10:
            parts.append(LITERALS[int(r * 1000) % len(LITERALS)] + " ")
        parts.append(w)
        parts.append(OPERATORS[int(u[n_tokens - 1 - k] * len(OPERATORS))]
                     if r > 0.5 else " ")
        if k % 9 == 8:
            parts.append("\n")
    for h, hid in enumerate(HIGH_DF_IDS):
        if rng.random() < 0.6:
            # parenthesis after the id: '(' splits, so `hid` stands alone
            # as a genuine high-DF term (a '.' would glue it to 'init')
            parts.append(f"\n{hid}(init_{h})")
    return "".join(parts)


def row(i: int) -> dict:
    import hashlib

    repo = f"org/repo{i % N_REPOS:03d}"
    lang = LANGS[(i // N_REPOS) % len(LANGS)]
    path = f"src/m{(i // 7) % 13}/f_{i:07d}.{_EXT[lang]}"
    commit = hashlib.sha1(f"{repo}:{path}".encode()).hexdigest()
    return {"repo": repo, "path": path, "commit": commit, "lang": lang,
            "content": doc_content(i)}


def corpus_rows(n_docs: int) -> List[dict]:
    """Driver-side generation for small test tiers (sf-s = 1k)."""
    return [row(i) for i in range(n_docs)]


CORPUS_SCHEMA = ("repo string, path string, commit string, lang string, "
                 "content string")


def generate_corpus(spark, n_docs: int, partitions: int = 32):
    """Distributed deterministic generation: spark.range over doc index
    -> mapInPandas(row). Partition-count independent by construction."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame([row(int(i)) for i in pdf["id"]])

    return (
        spark.range(0, n_docs, 1, partitions)
        .mapInPandas(gen, schema=CORPUS_SCHEMA)
    )
