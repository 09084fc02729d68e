"""Solr langid contrib gates (solr/contrib/langid/.../
LanguageIdentifierUpdateProcessor.java): resolve chain (threshold,
whitelist, fallback fields/value), existing-langField sanity check,
field mapping with lcmap + keepOrig + mapIndividual, enforceSchema
plan-time throw, langsField collection."""

import pytest

from lucene_solr_spark import update_chain as U

PROFILES = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "das"),
}


def _docs(spark):
    rows = [
        # clear English: certainty 1.0
        (0, "the cat and the dog of note", None, None),
        # clear German
        (1, "der hund und das haus", None, None),
        # mixed: en 2 hits, de 1 hit -> certainty 2/3 < 0.75 threshold
        (2, "the cat and der hund x", None, None),
        # no profile hit -> empty detection
        (3, "zzz qqq", None, "pt"),
        # existing language value (sanity-check path)
        (4, "the the the", "de", None),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, body string, language string, hint string")


def test_resolve_threshold_whitelist_fallback(spark):
    out = U.update_chain(_docs(spark), [
        U.language_identify(
            PROFILES, ["body"], lang_field="language",
            threshold=0.75, fallback_fields=["hint"], fallback="gen",
        ),
    ])
    lang = {r["doc_id"]: r["language"] for r in out.collect()}
    assert lang[0] == "en"
    assert lang[1] == "de"
    assert lang[2] == "gen"       # below threshold -> literal fallback
    assert lang[3] == "pt"        # empty detection -> fallback FIELD first
    assert lang[4] == "de"        # pre-set value kept (overwrite=False)


def test_existing_value_whitelist_sanity_and_overwrite(spark):
    # whitelist excludes the stored 'de' -> falls back even though the
    # field was pre-set (resolveLanguage(String, ...) :306-310)
    out = U.update_chain(_docs(spark), [
        U.language_identify(
            PROFILES, ["body"], lang_field="language",
            threshold=0.0, whitelist=("en",), fallback="f",
        ),
    ])
    lang = {r["doc_id"]: r["language"] for r in out.collect()}
    assert lang[4] == "f"
    # overwrite=True re-detects doc 4 ("the the the" -> en)
    out2 = U.update_chain(_docs(spark), [
        U.language_identify(
            PROFILES, ["body"], lang_field="language",
            threshold=0.0, whitelist=("en",), fallback="f",
            overwrite=True,
        ),
    ])
    lang2 = {r["doc_id"]: r["language"] for r in out2.collect()}
    assert lang2[4] == "en"
    assert lang2[1] == "f"        # detected de, not whitelisted


def test_mapping_lcmap_keeporig(spark):
    out = U.update_chain(_docs(spark), [
        U.language_identify(
            PROFILES, ["body"], lang_field="language",
            threshold=0.0, fallback="en",
            map_enable=True, map_fl=["body"],
            map_lcmap={"de": "deutsch"},
        ),
    ])
    rows = {r["doc_id"]: r for r in out.collect()}
    assert "body_en" in out.columns and "body_deutsch" in out.columns
    assert rows[0]["body_en"].startswith("the cat")
    assert rows[0]["body"] is None            # mapKeepOrig=false removes
    assert rows[1]["body_deutsch"].startswith("der hund")
    assert rows[1]["body_en"] is None
    # keepOrig=True keeps the source column
    out2 = U.update_chain(_docs(spark), [
        U.language_identify(
            PROFILES, ["body"], lang_field="language",
            threshold=0.0, fallback="en",
            map_enable=True, map_fl=["body"], map_keep_orig=True,
        ),
    ])
    r0 = out2.filter("doc_id = 0").collect()[0]
    assert r0["body"] is not None and r0["body_en"] == r0["body"]


def test_map_individual_and_langs_field(spark):
    rows = [(0, "the cat and the dog", "der hund und das haus")]
    d = spark.createDataFrame(rows, "doc_id long, a string, b string")
    out = U.update_chain(d, [
        U.language_identify(
            PROFILES, ["a"], lang_field="language",
            langs_field="langs", threshold=0.0,
            map_enable=True, map_fl=["a", "b"],
            map_individual=True, map_individual_fl=["b"],
        ),
    ])
    r = out.collect()[0]
    assert r["language"] == "en"
    assert r["a_en"] is not None and r["b_de"] is not None
    assert r["langs"] == ["de", "en"]     # sorted distinct (HashSet det.)


def test_enforce_schema_plan_time_throw(spark):
    with pytest.raises(ValueError, match="Invalid output field mapping"):
        U.language_identify(
            PROFILES, ["body"], lang_field="language",
            map_enable=True, map_fl=["body"],
            schema_fields={"body_en"},   # body_de missing
        )(_docs(spark))
