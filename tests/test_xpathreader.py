"""XPathRecordReader — vectors ported from TestXPathRecordReader
(solr/contrib/dataimporthandler test suite)."""

import pytest

from lucene_solr_spark.sources.xpathreader import (
    FLATTEN,
    XPathRecordReader,
)


def test_basic():
    xml = ("<root>\n   <b><c>Hello C1</c>\n      <c>Hello C1</c>\n"
           "      </b>\n   <b><c>Hello C2</c>\n     </b>\n</root>")
    rr = XPathRecordReader("/root/b")
    rr.add_field("c", "/root/b/c", True)
    l = rr.get_all_records(xml)
    assert len(l) == 2
    assert len(l[0]["c"]) == 2 and len(l[1]["c"]) == 1


def test_attributes():
    xml = ('<root>\n   <b a="x0" b="y0" />\n   <b a="x1" b="y1" />\n'
           '   <b a="x2" b="y2" />\n</root>')
    rr = XPathRecordReader("/root/b")
    rr.add_field("a", "/root/b/@a")
    rr.add_field("b", "/root/b/@b")
    l = rr.get_all_records(xml)
    assert [(m["a"], m["b"]) for m in l] == [
        ("x0", "y0"), ("x1", "y1"), ("x2", "y2")]


def test_attr_in_root():
    xml = ('<r>\n<merchantProduct id="814636051" mid="189973">\n'
           '  <in_stock type="stock-4" />\n'
           '  <condition type="cond-0" />\n'
           '  <price>301.46</price>\n</merchantProduct>\n'
           '<merchantProduct id="814636052" mid="189974">\n'
           '  <in_stock type="stock-5" />\n'
           '  <condition type="cond-1" />\n'
           '  <price>302.46</price>\n</merchantProduct>\n\n</r>')
    rr = XPathRecordReader("/r/merchantProduct")
    rr.add_field("id", "/r/merchantProduct/@id")
    rr.add_field("mid", "/r/merchantProduct/@mid")
    rr.add_field("price", "/r/merchantProduct/price")
    rr.add_field("conditionType", "/r/merchantProduct/condition/@type")
    l = rr.get_all_records(xml)
    assert (l[0]["id"], l[0]["mid"], l[0]["price"],
            l[0]["conditionType"]) == (
        "814636051", "189973", "301.46", "cond-0")
    assert (l[1]["id"], l[1]["price"], l[1]["conditionType"]) == (
        "814636052", "302.46", "cond-1")


def test_multiple_for_each_streams_by_path():
    xml = ('<root>\n<a>\n   <b a="x0" b="y0" />\n'
           '        <b a="x1" b="y1" />\n        <b a="x2" b="y2" />\n'
           '        </a>'
           '<x>\n   <b a="x4" b="y4" />\n        <b a="x5" b="y5" />\n'
           '        <b a="x6" b="y6" />\n        </x></root>')
    rr = XPathRecordReader("/root/a | /root/x")
    rr.add_field("a", "/root/a/b/@a")
    rr.add_field("b", "/root/a/b/@b")
    rr.add_field("a", "/root/x/b/@a")
    rr.add_field("b", "/root/x/b/@b")
    a, x = [], []
    rr.stream_records(xml, lambda rec, xp: (
        a.append(rec) if xp == "/root/a" else
        x.append(rec) if xp == "/root/x" else None))
    assert len(a) == 1 and len(x) == 1


def test_missing_attr_null_alignment():
    xml = ('<root>\n<a>\n  <b a="x0" b="y0" />\n'
           '       <b a="x1" b="y1" />\n       </a>'
           '<a>\n  <b a="x3"  />\n       <b b="y4" />\n       </a>'
           '</root>')
    rr = XPathRecordReader("/root/a")
    rr.add_field("a", "/root/a/b/@a", True)
    rr.add_field("b", "/root/a/b/@b", True)
    l = rr.get_all_records(xml)
    assert len(l) == 2
    assert l[1]["a"][1] is None and l[1]["b"][0] is None


def test_elems_2level_missing_and_empty():
    xml = ("<root>\n\t<a>\n\t   <b>\n\t  <x>x0</x>\n"
           "\t            <y>y0</y>\n\t            </b>\n"
           "\t   <b>\n\t  <x>x1</x>\n\t            <y>y1</y>\n"
           "\t            </b>\n\t   </a>\n\t<a>\n"
           "\t   <b>\n\t  <x>x3</x>\n\t   </b>\n"
           "\t   <b>\n\t  <y>y4</y>\n\t   </b>\n\t   </a>\n</root>")
    rr = XPathRecordReader("/root/a")
    rr.add_field("a", "/root/a/b/x", True)
    rr.add_field("b", "/root/a/b/y", True)
    l = rr.get_all_records(xml)
    assert len(l) == 2
    assert l[1]["a"][1] is None and l[1]["b"][0] is None

    xml2 = ("<root>\n\t<a>\n\t   <b>\n\t  <x>x0</x>\n"
            "\t            <y>y0</y>\n\t   </b>\n"
            "\t   <b>\n\t  <x></x>\n\t            <y>y1</y>\n"
            "\t   </b>\n\t</a>\n</root>")
    l2 = XPathRecordReader("/root/a").add_field(
        "a", "/root/a/b/x", True).add_field(
        "b", "/root/a/b/y", True).get_all_records(xml2)
    assert l2[0]["a"] == ["x0", ""] and l2[0]["b"] == ["y0", "y1"]


def test_mixed_content_and_flatten():
    xml = ('<xhtml:p xmlns:xhtml="http://xhtml.com/" >This text is \n'
           "  <xhtml:b>bold</xhtml:b> and this text is \n"
           "  <xhtml:u>underlined</xhtml:u>!\n</xhtml:p>")
    rr = XPathRecordReader("/p")
    rr.add_field("p", "/p", True)
    rr.add_field("b", "/p/b", True)
    rr.add_field("u", "/p/u", True)
    row = rr.get_all_records(xml)[0]
    assert row["b"][0] == "bold" and row["u"][0] == "underlined"
    p = row["p"][0]
    assert "This text is" in p and "and this text is" in p
    assert "!" in p and "bold" not in p

    rr2 = XPathRecordReader("/p")
    rr2.add_field("p", "/p", False, FLATTEN)
    row2 = rr2.get_all_records(xml)[0]
    assert row2["p"].strip() == (
        "This text is \n  bold and this text is \n  underlined!")


def test_attrib_present_and_valued_filters():
    xml = ('<root>\n\t<a>\n\t   <b k="x">\n'
           "\t        <x>x0</x>\n\t        <y></y>\n\t        </b>\n"
           '\t     <b k="y">\n\t        <x></x>\n'
           "\t        <y>y1</y>\n\t        </b>\n"
           '\t     <b k="z">\n\t        <x>x2</x>\n'
           "\t        <y>y2</y>\n\t        </b>\n\t</a>\n"
           "\t<a>\n\t   <b>\n\t        <x>x3</x>\n\t        </b>\n"
           "\t     <b>\n\t     <y>y4</y>\n\t        </b>\n"
           "\t</a>\n</root>")
    rr = XPathRecordReader("/root/a")
    rr.add_field("x", "/root/a/b[@k]/x", True)
    rr.add_field("y", "/root/a/b[@k]/y", True)
    l = rr.get_all_records(xml)
    assert len(l) == 2
    assert l[0]["x"] == ["x0", "", "x2"]
    assert l[0]["y"] == ["", "y1", "y2"]
    assert l[1] == {}

    xml3 = ('<root>\n\t<a>\n   <b k="x">\n\t      <x>x0</x>\n'
            '\t      <y>y0</y>\n\t      </b>\n\t    <b k="y">\n'
            "\t      <x>x1</x>\n\t      <y>y1</y>\n\t      </b>\n"
            "\t    </a>\n\t<a>\n   <b><x>x3</x></b>\n"
            "\t    <b><y>y4</y></b>\n\t</a>\n</root>")
    rr3 = XPathRecordReader("/root/a")
    rr3.add_field("x", "/root/a/b[@k='x']/x", True)
    rr3.add_field("y", "/root/a/b[@k='x']/y", True)
    l3 = rr3.get_all_records(xml3)
    assert len(l3) == 2
    assert len(l3[0]["x"]) == 1 and len(l3[0]["y"]) == 1
    assert l3[1] == {}


def test_attrib_val_with_slash():
    xml = ('<root><b>\n  <a x="a/b" h="hello-A"/>  \n</b></root>')
    rr = XPathRecordReader("/root/b")
    rr.add_field("x", "/root/b/a[@x='a/b']/@h")
    l = rr.get_all_records(xml)
    assert len(l) == 1 and l[0]["x"] == "hello-A"


def test_unsupported_xpaths():
    with pytest.raises(ValueError, match="forEach cannot start"):
        XPathRecordReader("//b")
    rr = XPathRecordReader("/root")
    with pytest.raises(ValueError, match="must start with"):
        rr.add_field("bold", "b")


ANYD = ("<anyd>\n"
        "  this <boo>top level</boo> is ignored because it is "
        "external to the forEach\n"
        "  <status>as is <boo>this element</boo></status>\n"
        '  <contenido id="10097" idioma="cat">\n'
        "    This one is <boo>not ignored as its</boo> inside a "
        "forEach\n"
        "    <antetitulo><i> big <boo>antler</boo></i></antetitulo>\n"
        "    <titulo>  My <i>flattened <boo>title</boo></i> </titulo>\n"
        "    <resumen> My summary <i>skip this!</i>  </resumen>\n"
        "    <texto>   <boo>Within the body of</boo>My text</texto>\n"
        "    <p>Access <boo>inner <i>sub clauses</i> as well</boo>"
        "</p>\n    </contenido>\n</anyd>")


def test_any_descendant_from_root():
    rr = XPathRecordReader("/anyd/contenido")
    rr.add_field("descdend", "//boo", True)
    rr.add_field("inr_descd", "//boo/i", False)
    rr.add_field("cont", "/anyd/contenido", False)
    rr.add_field("id", "/anyd/contenido/@id", False)
    rr.add_field("status", "/anyd/status", False)
    rr.add_field("title", "/anyd/contenido/titulo", False, FLATTEN)
    rr.add_field("resume", "/anyd/contenido/resumen", False)
    rr.add_field("text", "/anyd/contenido/texto", False)
    l = rr.get_all_records(ANYD)
    assert len(l) == 1
    m = l[0]
    assert m["cont"].strip() == "This one is  inside a forEach"
    assert m["id"] == "10097"
    assert m["title"].strip() == "My flattened title"
    assert m["resume"].strip() == "My summary"
    assert m["text"].strip() == "My text"
    assert m["descdend"] == [
        "not ignored as its", "antler", "Within the body of",
        "inner  as well"]
    assert m["inr_descd"].strip() == "sub clauses"


def test_any_descendant_of_a_child():
    xml = ANYD.replace("anyd", "anycd")
    rr = XPathRecordReader("/anycd")
    rr.add_field("descdend", "/anycd//boo", True)
    m = rr.get_all_records(xml)[0]
    assert m["descdend"] == [
        "top level", "this element", "not ignored as its", "antler",
        "title", "Within the body of", "inner  as well"]

    rr2 = XPathRecordReader("/anycd")
    rr2.add_field("descdend", "/anycd/contenido//boo", True)
    m2 = rr2.get_all_records(xml)[0]
    assert m2["descdend"] == [
        "not ignored as its", "antler", "title", "Within the body of",
        "inner  as well"]


def test_same_for_each_and_xpath():
    xml = ("<root>\n   <cat>\n     <name>hello</name>\n   </cat>\n"
           '   <item name="item name"/>\n</root>')
    rr = XPathRecordReader("/root/cat/name")
    rr.add_field("catName", "/root/cat/name")
    assert rr.get_all_records(xml)[0]["catName"] == "hello"


def test_put_null_alignment_three_lists():
    xml = ("<root>\n  <i>\n    <x>\n      <a>A.1.1</a>\n"
           "      <b>B.1.1</b>\n    </x>\n    <x>\n"
           "      <b>B.1.2</b>\n      <c>C.1.2</c>\n    </x>\n"
           "  </i>\n  <i>\n    <x>\n      <a>A.2.1</a>\n"
           "      <c>C.2.1</c>\n    </x>\n    <x>\n"
           "      <b>B.2.2</b>\n      <c>C.2.2</c>\n    </x>\n"
           "  </i>\n</root>")
    rr = XPathRecordReader("/root/i")
    rr.add_field("a", "/root/i/x/a", True)
    rr.add_field("b", "/root/i/x/b", True)
    rr.add_field("c", "/root/i/x/c", True)
    l = rr.get_all_records(xml)
    assert l[0]["a"] == ["A.1.1", None]
    assert l[0]["b"] == ["B.1.1", "B.1.2"]
    assert l[0]["c"] == [None, "C.1.2"]
    assert l[1]["a"] == ["A.2.1", None]
    assert l[1]["b"] == [None, "B.2.2"]
    assert l[1]["c"] == ["C.2.1", "C.2.2"]


def test_fuzz_invariants_alignment_and_count():
    """Randomized records duel a direct simulation of the reference
    semantics: per <x>, present children putText+register in the
    record frame; missing children putNulls WITHOUT registering
    (putNulls :430-443 never touches valuesAddedinThisFrame), so a
    field that saw only nulls in a record survives the frame purge
    and LEAKS into the following record — a reference quirk this
    port reproduces faithfully."""
    import random

    rng = random.Random(99)
    for _ in range(60):
        n_rec = rng.randint(0, 5)
        shape = []          # per record: list of x-element dicts
        xml = ["<root>"]
        for _r in range(n_rec):
            xs = []
            xml.append("<i>")
            for _x in range(rng.randint(0, 3)):
                xml.append("<x>")
                present = {}
                for tag in ("a", "b"):
                    if rng.random() < 0.6:
                        v = f"v{rng.randint(0, 9)}"
                        xml.append(f"<{tag}>{v}</{tag}>")
                        present[tag] = v
                xml.append("</x>")
                xs.append(present)
            xml.append("</i>")
            shape.append(xs)
        xml.append("</root>")

        # direct simulation of the parse-walk value lifecycle
        values = {}
        want_records = []
        for xs in shape:
            frame = set()
            for present in xs:
                for tag in ("a", "b"):
                    if tag in present:
                        values.setdefault(tag, []).append(present[tag])
                        frame.add(tag)
                    else:
                        values.setdefault(tag, []).append(None)
            want_records.append({k: list(v) for k, v in values.items()})
            for fld in frame:
                values.pop(fld, None)

        rr = XPathRecordReader("/root/i")
        rr.add_field("a", "/root/i/x/a", True)
        rr.add_field("b", "/root/i/x/b", True)
        got = rr.get_all_records("".join(xml))
        assert len(got) == n_rec
        for want, rec in zip(want_records, got):
            assert rec == want, ("".join(xml), rec, want)
