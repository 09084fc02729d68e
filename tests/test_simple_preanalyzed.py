"""SimplePreAnalyzedParser golden gates (reference
solr/core/src/test/org/apache/solr/schema/PreAnalyzedFieldTest.java:31-67
valid/validParsed/invalid vectors, run through parse + toFormattedString
exactly like testValidSimple/testInvalidSimple)."""

import pytest

from lucene_solr_spark.sources.preanalyzed import (
    PreAnalyzedParseError,
    parse_simple_preanalyzed,
    parse_simple_raw,
    simple_to_formatted,
)

# PreAnalyzedFieldTest.java:31-41 (Java string escapes expanded)
VALID = [
    "1 one two three",
    "1  one  two   three ",
    "1 one,s=123,e=128,i=22  two three,s=20,e=22,y=foobar",
    "1 \\ one\\ \\,,i=22,a=\\, two\\=\n\r\t\\n,\\ =\\   \\",
    "1 ,i=22 ,i=33,s=2,e=20 , ",
    "1 =This is the stored part with \\= \n \\n \t \\t escapes."
    "=one two three  ąćęłńó"
    "śźż",
    "1 ==",
    "1 =this is a test.=",
    "1 one,p=deadbeef two,p=0123456789abcdef three",
]

# PreAnalyzedFieldTest.java:43-53
VALID_PARSED = [
    "1 one,s=0,e=3 two,s=4,e=7 three,s=8,e=13",
    "1 one,s=1,e=4 two,s=6,e=9 three,s=12,e=17",
    "1 one,i=22,s=123,e=128,y=word two,i=1,s=5,e=8,y=word"
    " three,i=1,s=20,e=22,y=foobar",
    "1 \\ one\\ \\,,i=22,s=0,e=6 two\\=\\n\\r\\t\\n,i=1,s=7,e=15"
    " \\\\,i=1,s=17,e=18",
    "1 i=22,s=0,e=0 i=33,s=2,e=20 i=1,s=2,e=2",
    "1 =This is the stored part with = \n \\n \t \\t escapes."
    "=one,s=0,e=3 two,s=4,e=7 three,s=8,e=13 ąć"
    "ęłńóśźż,s=15,e=25",
    "1 ==",
    "1 =this is a test.=",
    "1 one,p=deadbeef,s=0,e=3 two,p=0123456789abcdef,s=4,e=7"
    " three,s=8,e=13",
]

# PreAnalyzedFieldTest.java:55-67
INVALID = [
    "one two three",     # missing version
    "2 one two three",   # invalid version
    "1 o,ne two",        # missing escape
    "1 one t=wo",        # missing escape
    "1 one,, two",       # unescaped comma
    "1 one,s ",          # missing attrib value
    "1 one,s= val",      # missing attrib value, unescaped space
    "1 one,s=,val",      # unescaped comma
    "1 =",               # unescaped equals
    "1 =stored ",        # unterminated stored
    "1 ===",             # unescaped = in token stream
]


@pytest.mark.parametrize("i", range(len(VALID)))
def test_valid_roundtrip(i):
    stored, toks = parse_simple_raw(VALID[i])
    assert simple_to_formatted(stored, toks) == VALID_PARSED[i]


@pytest.mark.parametrize("s", INVALID)
def test_invalid_rejected(s):
    with pytest.raises(PreAnalyzedParseError):
        parse_simple_raw(s)


def test_stream_shape_matches_json_path():
    # same 6-tuple stream shape as parse_preanalyzed; payload is b64
    stored, stream = parse_simple_preanalyzed(
        "1 =st=one,p=deadbeef two,i=3 three,s=20,e=22")
    assert stored == "st"
    import base64
    assert stream == [
        ("one", 0, 0, 3, base64.b64encode(bytes.fromhex("deadbeef"))
         .decode(), None),
        ("two", 3, 4, 7, None, None),
        ("three", 4, 20, 22, None, None),
    ]


def test_bare_version_is_rejected_like_reference_crash():
    # "1 " crashes the reference (val.charAt(0) on empty); we raise
    with pytest.raises(PreAnalyzedParseError):
        parse_simple_raw("1 ")


def test_empty_input_accepted():
    assert parse_simple_raw("") == (None, [])
