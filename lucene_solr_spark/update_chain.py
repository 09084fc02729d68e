"""Solr update-request processor chain (solr/core/src/java/org/apache/
solr/update/processor/): the index-time field-mutation pipeline
(UpdateRequestProcessorChain.java runs processors in declaration
order; FieldMutatingUpdateProcessor.java is the per-field base).

Each processor here is a DataFrame -> DataFrame transform over the
document batch; ``update_chain`` composes them in order. Multivalued
fields are array columns. Per-factory semantics (file names under
update/processor/):

  trim_fields           TrimFieldUpdateProcessorFactory (String.trim)
  truncate_fields       TruncateFieldUpdateProcessorFactory (maxLength
                        prefix; only CharSequence values)
  field_length          FieldLengthUpdateProcessorFactory (replace a
                        string value with its length)
  count_values          CountFieldValuesUpdateProcessorFactory
                        (replace the multivalue with its count)
  concat_values         ConcatFieldUpdateProcessorFactory (join the
                        multivalue with a delimiter, default ", ")
  uniq_values           UniqFieldsUpdateProcessorFactory (drop dup
                        values, FIRST occurrence order kept)
  remove_blank          RemoveBlankFieldUpdateProcessorFactory (drop
                        zero-length strings; a scalar field becomes
                        NULL, a multivalue loses the blank entries)
  default_value         DefaultValueUpdateProcessorFactory (fill a
                        missing/NULL field with a constant)
  clone_field           CloneFieldUpdateProcessorFactory (copy source
                        to dest before later mutations)
  regexp_boost          RegexpBoostProcessor.java (multiply the boost
                        field by ``boost`` when the input field matches
                        the pattern; boost column created at 1.0 when
                        absent)

100 TB plan: every processor is pure column math (trim/substr/array
ops in whole-stage codegen) — the chain fuses into one projection over
the ingest scan, no shuffle, no UDF.
"""

from __future__ import annotations

from typing import Callable, Iterable, List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "update_chain", "trim_fields", "truncate_fields", "field_length",
    "count_values", "concat_values", "uniq_values", "remove_blank",
    "default_value", "clone_field", "regexp_boost", "language_identify",
]

Processor = Callable[[DataFrame], DataFrame]


def update_chain(df: DataFrame, processors: Iterable[Processor]) -> DataFrame:
    for p in processors:
        df = p(df)
    return df


def trim_fields(*cols: str) -> Processor:
    def p(df):
        for c in cols:
            df = df.withColumn(c, F.trim(F.col(c)))
        return df
    return p


def truncate_fields(max_len: int, *cols: str) -> Processor:
    def p(df):
        for c in cols:
            df = df.withColumn(c, F.substring(F.col(c), 1, int(max_len)))
        return df
    return p


def field_length(src: str, dst: str = None) -> Processor:
    def p(df):
        return df.withColumn(dst or src, F.length(F.col(src)))
    return p


def count_values(src: str, dst: str = None) -> Processor:
    def p(df):
        return df.withColumn(dst or src, F.size(F.col(src)))
    return p


def concat_values(src: str, delimiter: str = ", ",
                  dst: str = None) -> Processor:
    def p(df):
        return df.withColumn(dst or src,
                             F.array_join(F.col(src), delimiter))
    return p


def uniq_values(src: str) -> Processor:
    # first-occurrence order (UniqFieldsUpdateProcessorFactory uses a
    # LinkedHashSet): left fold appending unseen values
    def p(df):
        return df.withColumn(src, F.expr(f"""
aggregate({src}, CAST(array() AS array<string>),
  (acc, x) -> IF(array_contains(acc, x), acc, array_append(acc, x)))
"""))
    return p


def remove_blank(*cols: str) -> Processor:
    def p(df):
        for c in cols:
            dt = dict(df.dtypes)[c]
            if dt.startswith("array"):
                df = df.withColumn(
                    c, F.filter(F.col(c), lambda x: F.length(x) != 0))
            else:
                df = df.withColumn(
                    c, F.when(F.length(F.col(c)) == 0,
                              F.lit(None)).otherwise(F.col(c)))
        return df
    return p


def default_value(col: str, value) -> Processor:
    def p(df):
        return df.withColumn(col, F.coalesce(F.col(col), F.lit(value)))
    return p


def clone_field(src: str, dst: str) -> Processor:
    def p(df):
        return df.withColumn(dst, F.col(src))
    return p


def regexp_boost(input_col: str, pattern: str, boost: float,
                 boost_col: str = "boost") -> Processor:
    def p(df):
        if boost_col not in df.columns:
            df = df.withColumn(boost_col, F.lit(1.0))
        return df.withColumn(
            boost_col,
            F.when(F.col(input_col).rlike(pattern),
                   F.col(boost_col) * F.lit(float(boost)))
            .otherwise(F.col(boost_col)))
    return p


# ---------------------------------------------------------------------------
# LanguageIdentifierUpdateProcessor (solr/contrib/langid/src/java/org/
# apache/solr/update/processor/LanguageIdentifierUpdateProcessor.java)
# ---------------------------------------------------------------------------

def _langid_detect(profiles: dict, text_col):
    """Pluggable detectLanguage() analogue (the abstract hook at
    LanguageIdentifierUpdateProcessor.java:298): stopword-profile
    scoring over whitespace tokens — one Catalyst array_max over
    (score, tiebreak, lang) structs so every profile filter evaluates
    exactly once per row. Returns struct(lg, s, total):

      lg    — top-scoring language (score desc, lang asc tie-break,
              the deterministic stand-in for langdetect's probability
              order)
      s     — its raw stopword-hit count
      total — hits across ALL profiles; certainty = s/total plays
              DetectedLanguage.getCertainty() (1.0 when only one
              profile matches, like langdetect's normalized probs)

    s == 0 <=> detectLanguage() returned the empty list (the
    LangDetect impl returns emptyList for blank input,
    LangDetectLanguageIdentifierUpdateProcessor.java:47-50)."""
    import re as _re

    langs = sorted(profiles)

    def _profile_count(words):
        # ONE native regexp scan per profile instead of a per-token
        # higher-order filter (HOF lambdas evaluate interpreted, not
        # codegen — ~5x slower on long texts). Space-delimited token
        # match: the left anchor consumes at most the separating
        # space, the right anchor is a lookahead, so adjacent hits
        # ("the the") all count. Identical counts to
        # size(filter(split(text,' '), isin(words))) on space-joined
        # token streams.
        alt = "|".join(_re.escape(w) for w in sorted(words))
        return F.regexp_count(text_col, F.lit(f"(?:^| )(?:{alt})(?= |$)"))

    entries = [
        F.struct(
            _profile_count(profiles[lg]).alias("s"),
            F.lit(len(langs) - i).alias("tb"),
            F.lit(lg).alias("lg"),
        )
        for i, lg in enumerate(langs)
    ]
    arr = F.array(*entries)
    best = F.array_max(arr)
    total = F.aggregate(
        arr, F.lit(0), lambda acc, e: acc + e["s"])
    return F.struct(
        best["lg"].alias("lg"), best["s"].alias("s"),
        total.alias("total"))


def _langid_mapped_name(field: str, lang: str, lcmap: dict,
                        map_pattern: str, map_replace: str) -> str:
    """getMappedField (LanguageIdentifierUpdateProcessor.java:358-368):
    lcmap rewrite of the code, then mapPattern/mapReplace on the field
    name, then the {lang} placeholder."""
    import re
    lc = lcmap.get(lang, lang) if lcmap else lang
    # Java replaceFirst with $1 backrefs -> Python \1
    repl = map_replace.replace("$1", "\\1")
    return re.sub(map_pattern, repl, field, count=1).replace(
        "{lang}", lc)


def language_identify(
    profiles: dict,
    input_fields,
    lang_field: str = None,
    langs_field: str = None,
    threshold: float = 0.5,
    fallback: str = None,
    fallback_fields=(),
    whitelist=(),
    overwrite: bool = False,
    map_enable: bool = False,
    map_fl=None,
    map_individual: bool = False,
    map_individual_fl=None,
    map_keep_orig: bool = False,
    map_pattern: str = "(.*)",
    map_replace: str = "$1_{lang}",
    map_lcmap: dict = None,
    map_langs=None,
    schema_fields=None,
) -> Processor:
    """Solr langid contrib as one fused columnar projection.

    Semantics mirrored from LanguageIdentifierUpdateProcessor.java
    (process() :186-246, resolveLanguage :318-346, getFallbackLang
    :248-268, concatFields :273-289, getMappedField :358-368) with the
    stopword-profile detector standing in for the langdetect library
    (the detector is the pluggable abstract hook, :298):

    - detection text = concat of ``input_fields`` each followed by one
      space (concatFields appends " " per present field);
    - resolve order: empty detection -> fallback; whitelist miss ->
      fallback; certainty < threshold -> fallback; null/empty resolved
      code -> "" (:339-343);
    - per-row fallback = first non-null ``fallback_fields`` value,
      else ``fallback`` (:253-266);
    - existing non-null ``lang_field`` + overwrite=False: the value is
      sanity-checked (whitelist only — certainty fixed at 1.0 passes
      any threshold, :306-310) instead of re-detected;
    - mapping moves each ``map_fl`` field's value to the
      pattern-derived per-language column (doc.setField; removal of
      the original = per-row NULL unless map_keep_orig) using the doc
      language, or a per-field detection for ``map_individual_fl``
      fields when map_individual (fallback = doc language, :216-222);
    - ``langs_field`` = all languages seen for the doc. The reference
      collects them in a HashSet (iteration order undefined); we emit
      a sorted distinct array — the one documented determinism fix;
    - ``schema_fields`` given = enforceSchema: a mapped name outside
      it raises at PLAN time (the reference throws per-document,
      :230-233 — the set of names is static here, so the error is
      hoisted).

    Column-name constraint (columnar divergence, documented): mapped
    output columns must be a static set, so rows whose resolved
    language falls outside ``map_langs`` (default: profile keys +
    literal fallback) keep their original field unmapped.

    100 TB plan: the whole processor — detection, resolve chain,
    mapping moves — is one whole-stage-codegen projection; no UDF, no
    shuffle, no per-row Python."""
    input_fields = list(input_fields)
    fallback_fields = list(fallback_fields)
    whitelist = list(whitelist)
    map_fl = list(map_fl) if map_fl is not None else list(input_fields)
    map_individual_fl = (list(map_individual_fl)
                         if map_individual_fl is not None else list(map_fl))
    all_map_fields = list(dict.fromkeys(map_fl + (
        map_individual_fl if map_individual else [])))
    if map_langs is None:
        map_langs = sorted(set(profiles) | (
            {fallback} if fallback else set()))

    def p(df: DataFrame) -> DataFrame:
        fb_parts = [F.col(f) for f in fallback_fields if f in df.columns]
        fb_parts.append(F.lit(fallback if fallback is not None else ""))
        fallback_col = F.coalesce(*fb_parts)

        # concatFields: value + " " per present field
        text = F.concat(*[
            F.concat(F.coalesce(F.col(f), F.lit("")), F.lit(" "))
            for f in input_fields
        ]) if input_fields else F.lit("")

        def resolve(det):
            certainty = F.when(
                det["total"] > 0,
                det["s"].cast("double") / det["total"].cast("double")
            ).otherwise(F.lit(0.0))
            r = F.when(det["s"] == 0, fallback_col)
            if whitelist:
                r = r.when(~det["lg"].isin(*whitelist), fallback_col)
            r = r.when(certainty < F.lit(float(threshold)), fallback_col)
            r = r.otherwise(det["lg"])
            return F.coalesce(r, F.lit(""))

        def resolve_existing(code_col):
            # certainty 1.0: threshold always passes; whitelist only
            if whitelist:
                r = F.when(~code_col.isin(*whitelist),
                           fallback_col).otherwise(code_col)
            else:
                r = code_col
            return F.coalesce(r, F.lit(""))

        det = _langid_detect(profiles, text)
        detected = resolve(det)
        if lang_field and lang_field in df.columns and not overwrite:
            doc_lang = F.when(
                F.col(lang_field).isNotNull(),
                resolve_existing(F.col(lang_field)),
            ).otherwise(detected)
        else:
            doc_lang = detected
        df = df.withColumn("__doc_lang", doc_lang)
        doc_langs = [F.col("__doc_lang")]

        if map_enable:
            field_lang: dict = {}
            for f in all_map_fields:
                if f not in df.columns:
                    continue
                if map_individual and f in map_individual_fl:
                    fdet = _langid_detect(
                        profiles, F.coalesce(F.col(f), F.lit("")))
                    fcert = F.when(
                        fdet["total"] > 0,
                        fdet["s"].cast("double") / fdet["total"]
                        .cast("double")).otherwise(F.lit(0.0))
                    fl = F.when(fdet["s"] == 0, F.col("__doc_lang"))
                    if whitelist:
                        fl = fl.when(~fdet["lg"].isin(*whitelist),
                                     F.col("__doc_lang"))
                    fl = fl.when(fcert < F.lit(float(threshold)),
                                 F.col("__doc_lang"))
                    fl = fl.otherwise(fdet["lg"])
                    field_lang[f] = F.coalesce(fl, F.lit(""))
                else:
                    field_lang[f] = F.col("__doc_lang")
            for f, flang in field_lang.items():
                df = df.withColumn(f"__flang_{f}", flang)
                doc_langs.append(F.col(f"__flang_{f}"))
            for f in field_lang:
                flang = F.col(f"__flang_{f}")
                for lg in map_langs:
                    name = _langid_mapped_name(
                        f, lg, map_lcmap or {}, map_pattern, map_replace)
                    if schema_fields is not None and \
                            name not in schema_fields:
                        raise ValueError(
                            "Invalid output field mapping for "
                            f"{f} field and language: {lg}")
                    moved = F.when(
                        (flang == lg) & F.col(f).isNotNull(), F.col(f))
                    if name in df.columns:
                        new = F.coalesce(moved, F.col(name))
                    else:
                        new = moved
                    df = df.withColumn(name, new)
                if not map_keep_orig:
                    df = df.withColumn(
                        f,
                        F.when(flang.isin(*map_langs), F.lit(None))
                        .otherwise(F.col(f)))

        if lang_field:
            df = df.withColumn(lang_field, F.col("__doc_lang"))
        if langs_field:
            df = df.withColumn(
                langs_field,
                F.sort_array(F.array_distinct(F.array(*doc_langs))))
        drop = ["__doc_lang"] + [
            c for c in df.columns if c.startswith("__flang_")]
        return df.drop(*drop)
    return p


# ---------------------------------------------------------------------------
# FieldValueSubset family + misc processors (round 2i)
# ---------------------------------------------------------------------------

def first_value(src: str) -> Processor:
    """FirstFieldValueUpdateProcessorFactory: keep only the first of a
    multivalued field's values (FieldValueSubsetUpdateProcessorFactory
    .pickSubset specialization)."""
    def p(df):
        return df.withColumn(src, F.element_at(F.col(src), 1))
    return p


def last_value(src: str) -> Processor:
    """LastFieldValueUpdateProcessorFactory: keep only the last value."""
    def p(df):
        return df.withColumn(src, F.element_at(F.col(src), -1))
    return p


def min_value(src: str) -> Processor:
    """MinFieldValueUpdateProcessorFactory: keep the minimum value."""
    def p(df):
        return df.withColumn(src, F.array_min(F.col(src)))
    return p


def max_value(src: str) -> Processor:
    """MaxFieldValueUpdateProcessorFactory: keep the maximum value."""
    def p(df):
        return df.withColumn(src, F.array_max(F.col(src)))
    return p


def ignore_field(*cols: str) -> Processor:
    """IgnoreFieldUpdateProcessorFactory: drop the fields entirely."""
    def p(df):
        return df.drop(*cols)
    return p


def html_strip_field(*cols: str) -> Processor:
    """HTMLStripFieldUpdateProcessorFactory: remove markup, keeping
    text content (HTMLStripCharFilter over the stored value; the
    codegen tag/comment/entity strip mirrors sources/extract.py)."""
    def p(df):
        for c in cols:
            x = F.regexp_replace(F.col(c), r"<!--.*?-->", " ")
            x = F.regexp_replace(x, r"<[^>]*>", " ")
            x = F.regexp_replace(x, r"&nbsp;", " ")
            x = F.regexp_replace(x, r"&amp;", "&")
            x = F.regexp_replace(x, r"&lt;", "<")
            x = F.regexp_replace(x, r"&gt;", ">")
            x = F.trim(F.regexp_replace(x, r"\s+", " "))
            df = df.withColumn(c, x)
        return df
    return p


def regex_replace_field(col: str, pattern: str, replacement: str
                        ) -> Processor:
    """RegexReplaceProcessorFactory: Matcher.replaceAll on the value."""
    def p(df):
        return df.withColumn(
            col, F.regexp_replace(F.col(col), pattern, replacement))
    return p


def timestamp_field(col: str, when) -> Processor:
    """TimestampUpdateProcessorFactory: stamp documents missing the
    field. The reference stamps NOW per batch; here the instant is an
    explicit parameter — replay-deterministic (an NRT re-run of the
    same micro-batch yields the same rows, the idempotence
    streaming/nrt.py relies on)."""
    def p(df):
        if col in df.columns:
            return df.withColumn(
                col, F.coalesce(F.col(col),
                                F.lit(when).cast("timestamp")))
        return df.withColumn(col, F.lit(when).cast("timestamp"))
    return p


def uuid_field(col: str, from_cols=None) -> Processor:
    """UUIDUpdateProcessorFactory: fill the field with a UUID. With
    ``from_cols`` the UUID is v5-style — sha1 of the key columns laid
    out as a UUID — deterministic across replays/retries (the scale-
    safe choice; Solr's random UUIDs break micro-batch replay
    idempotence). Without, a random UUID per row like the reference."""
    def p(df):
        if from_cols:
            h = F.sha1(F.concat_ws("\x1f", *[F.col(c).cast("string")
                                             for c in from_cols]))
            u = F.concat_ws(
                "-", F.substring(h, 1, 8), F.substring(h, 9, 4),
                F.concat(F.lit("5"), F.substring(h, 14, 3)),
                F.substring(h, 17, 4), F.substring(h, 21, 12))
            return df.withColumn(col, u)
        return df.withColumn(col, F.expr("uuid()"))
    return p


# URLClassifyProcessor.java:67-83 landing-page suffixes, in match order
URL_LANDING_SUFFIXES = (
    "/", "index.html", "index.htm", "index.phtml", "index.shtml",
    "index.xml", "index.php", "index.asp", "index.aspx",
    "welcome.html", "welcome.htm", "welcome.phtml", "welcome.shtml",
    "welcome.xml", "welcome.php", "welcome.asp", "welcome.aspx",
)


def url_classify(url_col: str = "url") -> Processor:
    """URLClassifyProcessor (solr/core/.../update/processor/
    URLClassifyProcessor.java:109-234): per-url length, path levels,
    top-level flag, landing-page flag, domain and canonical url — all
    as one codegen projection (parse_url + regexp), no UDF.

    Rule fidelity: suffix match on the LOWERCASED path in declaration
    order (:213-222); levels counts '/' in the path with the landing
    suffix replaceFirst-ed away then trailing '/'+ stripped (:169-178);
    toplevel = empty path AND no query (:186-189); landingpage = no
    query AND a suffix matched (:197-203); canonical replaces the
    trailing '/<suffix>' with '/' (:143-151). The suffix is used as an
    UNESCAPED regex in replaceFirst exactly like the reference (dots
    match any char — bug-compatible). URL normalization (URI.normalize
    dot-segment removal) is assumed done upstream."""
    def p(df):
        url = F.col(url_col)
        path = F.lower(F.parse_url(url, F.lit("PATH")))
        query = F.parse_url(url, F.lit("QUERY"))
        suffix = F.lit("")
        for s in reversed(URL_LANDING_SUFFIXES):
            suffix = F.when(path.endswith(s), F.lit(s)).otherwise(suffix)
        # replaceFirst(suffix+"$","") then strip trailing slashes
        path_wo = F.when(
            suffix == "", path
        ).otherwise(F.regexp_replace(path, F.concat(suffix, F.lit("$")),
                                     F.lit("")))
        path_wo = F.regexp_replace(path_wo, "/+$", "")
        levels = (F.length(path_wo)
                  - F.length(F.regexp_replace(path_wo, "/", "")))
        toplevel = F.when(
            (F.length(path_wo) == 0) & query.isNull(), F.lit(1)
        ).otherwise(F.lit(0))
        landing = F.when(
            query.isNull() & (suffix != ""), F.lit(1)).otherwise(F.lit(0))
        canonical = F.when(
            suffix == "", url
        ).otherwise(F.regexp_replace(
            url, F.concat(F.lit("/"), suffix, F.lit("$")), F.lit("/")))
        return (
            df.withColumn("url_length", F.length(url))
            .withColumn("url_levels", levels)
            .withColumn("url_toplevel", toplevel)
            .withColumn("url_landingpage", landing)
            .withColumn("url_domain", F.parse_url(url, F.lit("HOST")))
            .withColumn("url_canonical", canonical)
        )
    return p
