"""Solr Cell / ExtractingRequestHandler re-expression (solr/contrib/
extraction/src/java/org/apache/solr/handler/extraction/
ExtractingRequestHandler.java, ExtractingDocumentLoader.java,
SolrContentHandler.java): turn raw uploaded content into indexable
fields — extracted text in the ``content`` field plus document
metadata (title etc.), with ``literal.*`` pass-through fields,
``fmap.*`` renames, and an ``uprefix`` for unmapped metadata.

The reference delegates parsing to Tika. Binary codecs (PDF/DOCX)
aren't available in this container, so the format registry here ships
an HTML extractor built from JVM-side Catalyst expressions (the same
tag/entity handling class as the engine's HTMLStripCharFilter, as
regexp_replace chains so the whole extraction is whole-stage codegen
— no Python in the row path) and a pluggable ``register_extractor``
hook with the NotImplementedError contract used by multimodal.py for
absent codecs.

Entity handling is the documented 6-entity subset (&amp; &lt; &gt;
&quot; &#39; &nbsp;) — the full named-entity table lives in the
python charfilter path (functions/analysis.py html_strip_charfilter);
extraction keeps to Catalyst builtins so it scales as a pure scan.
"""

from __future__ import annotations

from typing import Callable, Dict, List

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# script/style content disappears entirely (HTMLStripCharFilter
# behavior); other tags become spaces; entities unescape; whitespace
# collapses. ORDER IS THE CONTRACT (script bodies must go before the
# generic tag strip).
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")]


def html_text(col: Column) -> Column:
    """Extracted text content of an HTML document."""
    out = F.regexp_replace(col, r"(?is)<(script|style)[^>]*>.*?</\1>",
                           " ")
    out = F.regexp_replace(out, r"(?s)<!--.*?-->", " ")
    out = F.regexp_replace(out, r"(?s)<[^>]*>", " ")
    for src, dst in _ENTITIES:
        out = F.replace(out, F.lit(src), F.lit(dst))
    out = F.regexp_replace(out, r"\s+", " ")
    return F.trim(out)


def html_title(col: Column) -> Column:
    """The <title> metadata field (TikaCoreProperties TITLE)."""
    t = F.regexp_extract(col, r"(?is)<title[^>]*>(.*?)</title>", 1)
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def html_meta(col: Column, name: str) -> Column:
    """A <meta name=... content=...> field, as Tika surfaces them."""
    return F.regexp_extract(
        col, r'(?is)<meta\s+name="' + name + r'"\s+content="([^"]*)"',
        1)


_EXTRACTORS: Dict[str, Callable[[Column], Dict[str, Column]]] = {}


def register_extractor(content_type: str):
    def deco(fn: Callable[[Column], Dict[str, Column]]):
        _EXTRACTORS[content_type] = fn
        return fn
    return deco


@register_extractor("text/html")
def _html_extractor(col: Column) -> Dict[str, Column]:
    return {"content": html_text(col), "title": html_title(col)}


@register_extractor("text/plain")
def _plain_extractor(col: Column) -> Dict[str, Column]:
    return {"content": F.trim(F.regexp_replace(col, r"\s+", " "))}


def extract(df: DataFrame, source_col: str, content_type: str,
            literals: Dict[str, object] | None = None,
            fmap: Dict[str, str] | None = None,
            meta_fields: List[str] | None = None,
            uprefix: str = "") -> DataFrame:
    """ExtractingDocumentLoader.load: run the content-type's extractor,
    apply literal.* constants and fmap.* renames; meta_fields not in
    fmap get the uprefix (unmapped-field prefix). Unknown content
    types raise NotImplementedError naming register_extractor — the
    stub contract for absent binary codecs."""
    try:
        fn = _EXTRACTORS[content_type]
    except KeyError:
        raise NotImplementedError(
            f"no extractor for {content_type!r}; add one with "
            "@register_extractor(content_type)")
    fmap = fmap or {}
    cols = dict(fn(F.col(source_col)))
    if meta_fields:
        for m in meta_fields:
            cols[m] = html_meta(F.col(source_col), m)
    out = df
    for name, c in cols.items():
        target = fmap.get(name, name if name in ("content", "title")
                          else uprefix + name)
        out = out.withColumn(target, c)
    for k, v in (literals or {}).items():
        out = out.withColumn(k, F.lit(v))
    return out
