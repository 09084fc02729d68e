"""UAX29URLEmailTokenizer gates: the reference's three golden corpora
(643 URLs, 265 emails, 105 wiki-page URLs — byte-exact, in order) plus
the StandardAnalyzer-shape vectors, types/offsets, and LUCENE-3880
(TestUAX29URLEmailTokenizer.java)."""

import os

import pytest

from lucene_solr_spark.functions.urlemail import uax29_url_email_tokenize

REF = ("/root/reference/lucene/analysis/common/src/test/org/apache/"
       "lucene/analysis/core/")

needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference corpus not available")


def _terms(text, **kw):
    return [t.term for t in uax29_url_email_tokenize(text, **kw)]


def test_sa_vectors():
    assert _terms("B2B") == ["B2B"]
    assert _terms("2B") == ["2B"]
    assert _terms("some-dashed-phrase") == ["some", "dashed", "phrase"]
    assert _terms("dogs,chase,cats") == ["dogs", "chase", "cats"]
    assert _terms("ac/dc") == ["ac", "dc"]
    assert _terms("O'Reilly") == ["O'Reilly"]
    assert _terms("O'Reilly's") == ["O'Reilly's"]
    assert _terms("21.35") == ["21.35"]
    assert _terms("R2D2 C3PO") == ["R2D2", "C3PO"]
    assert _terms("216.239.63.104") == ["216.239.63.104"]
    assert _terms("David has 5000 bones") == ["David", "has", "5000",
                                              "bones"]
    assert _terms("C embedded developers wanted") == [
        "C", "embedded", "developers", "wanted"]
    assert _terms('"QUOTED" word') == ["QUOTED", "word"]


def test_types_and_offsets():
    toks = uax29_url_email_tokenize("David has 5000 bones")
    assert [t.type for t in toks] == ["<ALPHANUM>", "<ALPHANUM>",
                                      "<NUM>", "<ALPHANUM>"]
    assert [t.start for t in toks] == [0, 6, 10, 15]
    assert [t.end for t in toks] == [5, 9, 14, 20]


def test_mailto_lucene3880():
    toks = uax29_url_email_tokenize("mailto:test@example.org")
    assert [(t.term, t.type) for t in toks] == [
        ("mailto", "<ALPHANUM>"), ("test@example.org", "<EMAIL>")]


def test_basic_urls_and_emails():
    toks = uax29_url_email_tokenize(
        "visit https://example.com/a?b=c#d or write to joe@example.com")
    assert [(t.term, t.type) for t in toks] == [
        ("visit", "<ALPHANUM>"),
        ("https://example.com/a?b=c#d", "<URL>"),
        ("or", "<ALPHANUM>"), ("write", "<ALPHANUM>"),
        ("to", "<ALPHANUM>"), ("joe@example.com", "<EMAIL>")]
    # no-scheme URL requires a real TLD
    assert [(t.term, t.type) for t in
            uax29_url_email_tokenize("lucene.apache.org")] == [
        ("lucene.apache.org", "<URL>")]
    assert [(t.term, t.type) for t in
            uax29_url_email_tokenize("foo.notatld")] == [
        ("foo.notatld", "<ALPHANUM>")]


def test_max_token_length_skip():
    long_url = "http://example.com/" + "a" * 300
    toks = uax29_url_email_tokenize("x " + long_url + " y")
    assert [t.term for t in toks] == ["x", "y"]
    toks = uax29_url_email_tokenize("x " + long_url + " y",
                                    max_token_length=10 ** 9)
    assert [t.term for t in toks] == ["x", long_url, "y"]


def _read(name):
    with open(REF + name, encoding="utf-8") as f:
        return f.read()


def _read_lines(name):
    # \n/\r only, like Java's BufferedReader.readLine — the email
    # vectors contain other Unicode line-break chars INSIDE bracketed
    # hosts, which str.splitlines() would wrongly split on
    return [ln.strip() for ln in
            _read(name).replace("\r\n", "\n").replace("\r", "\n")
            .split("\n") if ln.strip()]


@needs_ref
def test_email_corpus_exact():
    got = [t.term for t in uax29_url_email_tokenize(
        _read("random.text.with.email.addresses.txt"),
        max_token_length=10 ** 9) if t.type == "<EMAIL>"]
    assert got == _read_lines(
        "email.addresses.from.random.text.with.email.addresses.txt")


@needs_ref
def test_url_corpus_exact():
    got = [t.term for t in uax29_url_email_tokenize(
        _read("random.text.with.urls.txt"),
        max_token_length=10 ** 9) if t.type == "<URL>"]
    assert got == _read_lines("urls.from.random.text.with.urls.txt")


@needs_ref
def test_wiki_page_urls_exact():
    got = [t.term for t in uax29_url_email_tokenize(
        _read("LuceneResourcesWikiPage.html"),
        max_token_length=10 ** 9) if t.type == "<URL>"]
    assert got == _read_lines("LuceneResourcesWikiPageURLs.txt")


def test_urlemail_default_analyzer_chain():
    """UAX29URLEmailAnalyzer composition (UAX29URLEmailAnalyzer.java:
    99-110): tokenizer + lowercase + standard stop set, registered as
    urlemail_default."""
    from lucene_solr_spark.functions.analysis import get_analyzer

    a = get_analyzer("urlemail_default")
    assert a.analyze(
        "The Quick fox at HTTP://Example.COM/Path admin@Site.ORG") == [
        "quick", "fox", "http://example.com/path", "admin@site.org"]
    assert a.analyze("the of and") == []


def test_payload_encoders_spi():
    """PayloadEncoder SPI (Float/Integer/Identity —
    payloads/FloatEncoder.java, IntegerEncoder.java:33-38,
    IdentityEncoder.java:40-51)."""
    import struct

    from lucene_solr_spark.functions.payloads import (
        delimited_payload_bytes,
        payload_encoder,
    )

    assert payload_encoder("float")("0.5") == struct.pack(">f", 0.5)
    assert payload_encoder("integer")("-7") == struct.pack(">i", -7)
    assert payload_encoder("identity")("héllo") == "héllo".encode("utf-8")
    out = delimited_payload_bytes("a|1 b c|2.5", encoder="float")
    assert out == [("a", struct.pack(">f", 1.0)), ("b", None),
                   ("c", struct.pack(">f", 2.5))]
    import pytest

    with pytest.raises(ValueError):
        payload_encoder("bogus")
