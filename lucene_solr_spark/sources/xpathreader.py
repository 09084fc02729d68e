"""XPathRecordReader — DIH's streaming XPath-subset record extractor.

Reference: ``solr/contrib/dataimporthandler/src/java/org/apache/solr/
handler/dataimport/XPathRecordReader.java`` (:60-660). A restricted
XPath dialect compiled into a prefix tree of Nodes, then ONE forward
pass over the XML event stream emits records — no DOM.

Rules kept rule-for-rule:

* forEach (:72-83): '|'-separated record paths; '//' at the start
  throws; each path marks its leaf Node isRecord with the FULL path
  string as forEachPath (handed to the record handler).
* addField (:103-125): xpaths must start with '/'; the path splits on
  '/' with the single-quote re-join rule (splitEscapeQuote :601-620 —
  segments with an odd quote count glue back to the next); a trailing
  '@attr' registers an attribute Node; an EMPTY segment ('//') hangs
  the next segment on wildCardNodes, matched against any descendant
  via the wildAncestor chain (buildOptimise :462-467).
* '[@attr]' / "[@attr='val']" filters (getOrAddNode :536-556 and the
  ATTRIB_PRESENT_WITHVAL regex): element matches only when every
  listed attribute is present and valued ones are equal.
* the parse walk (:240-321): attribute values store when present —
  or store null mid-record (the reference NPEs when an attribute
  field sits OUTSIDE any record scope; here that stores nothing,
  documented divergence); text accumulates only for hasText nodes;
  FLATTEN counts child starts and keeps appending through them;
  END_ELEMENT emits the record (deep copy) when isRecord, and for
  non-record frames pushes NULLS for multivalued children that
  produced no value this frame (putNulls :430-443) so parallel
  multivalued lists stay aligned; a finally-block pops the frame and
  purges its values.
* unmatched elements (handleStartElement :327-380): first the exact
  children, then every wildAncestor's wildCardNodes; still unmatched
  subtrees are skipped WITH the descendant cache — a '//'-registered
  local name found anywhere inside the skip re-enters the tree.

Element names match by LOCAL name (the reference's namespace-aware
StAX getLocalName); the expat event stream strips prefixes the same
way. The per-record streaming shape survives at scale because one
XML blob is one row: the distributed form maps this reader over a
binary/text column (mapInPandas), one pass per document.
"""

from __future__ import annotations

import re
from typing import Callable, Dict, List, Optional
from xml.parsers import expat

__all__ = ["XPathRecordReader", "FLATTEN"]

FLATTEN = 1

_ATTRIB_PRESENT_WITHVAL = re.compile(
    r"(\S*?)?(\[@)(\S*?)(='(.*?)')?(\])")


def _split_escape_quote(s: str) -> List[str]:
    """splitEscapeQuote (:601-620): split on '/' but re-join segments
    whose single-quote count is odd (a '/' inside a quoted attribute
    value)."""
    out: List[str] = []
    ss = s.split("/")
    i = 0
    while i < len(ss):
        sb = []
        qc = 0
        while True:
            sb.append(ss[i])
            qc += ss[i].count("'")
            if qc % 2 == 0:
                break
            i += 1
            sb.append("/")
        out.append("".join(sb))
        i += 1
    return out


class _Events:
    """Pull-style event cursor over expat output: ('start', local,
    attrs) / ('end',) / ('text', data) / ('end_doc',). Attribute keys
    are local names (prefix stripped) like StAX getAttributeValue
    with a null namespace."""

    def __init__(self, xml_text: str):
        self.events = []
        p = expat.ParserCreate()

        def start(name, attrs):
            self.events.append((
                "start", name.split(":")[-1],
                {k.split(":")[-1]: v for k, v in attrs.items()}))

        p.StartElementHandler = start
        p.EndElementHandler = lambda name: self.events.append(("end",))
        p.CharacterDataHandler = (
            lambda data: self.events.append(("text", data)))
        p.Parse(xml_text, True)
        self.events.append(("end_doc",))
        self.pos = 0

    def next(self):
        ev = self.events[self.pos]
        self.pos += 1
        return ev


class _Node:
    def __init__(self, name: str, parent: Optional["_Node"]):
        self.xpath_name = self.name = name
        self.parent = parent
        self.field_name: Optional[str] = None
        self.for_each_path: Optional[str] = None
        self.attributes: Optional[List["_Node"]] = None
        self.child_nodes: Optional[List["_Node"]] = None
        self.wild_card_nodes: Optional[List["_Node"]] = None
        self.attrib_and_values = None  # list of (attr, val-or-None)
        self.wild_ancestor: Optional["_Node"] = None
        self.has_text = False
        self.multi_valued = False
        self.is_record = False
        self.flatten = False

    # -- build (:470-534) ----------------------------------------------

    def build(self, paths: List[str], field_name: str,
              multi_valued: bool, record: bool, flags: int):
        xpseg = paths.pop(0)
        if not paths and xpseg.startswith("@"):
            if self.attributes is None:
                self.attributes = []
            n = _Node(xpseg[1:], None)
            n.field_name = field_name
            n.multi_valued = multi_valued
            self.attributes.append(n)
        elif xpseg == "":
            # '//' wildcard: hang the NEXT segment on wildCardNodes
            xpseg = paths.pop(0)
            if self.wild_card_nodes is None:
                self.wild_card_nodes = []
            n = self._get_or_add(xpseg, self.wild_card_nodes)
            if not paths:
                n.has_text = True
                n.field_name = field_name
                n.multi_valued = multi_valued
                n.flatten = flags == FLATTEN
            else:
                n.build(paths, field_name, multi_valued, record, flags)
        else:
            if self.child_nodes is None:
                self.child_nodes = []
            n = self._get_or_add(xpseg, self.child_nodes)
            if not paths:
                if record:
                    n.is_record = True
                    n.for_each_path = field_name
                else:
                    n.has_text = True
                    n.field_name = field_name
                    n.multi_valued = multi_valued
                    n.flatten = flags == FLATTEN
            else:
                n.build(paths, field_name, multi_valued, record, flags)

    def _get_or_add(self, xpath_name: str, search: List["_Node"]):
        for n in search:
            if n.xpath_name == xpath_name:
                return n
        n = _Node(xpath_name, self)
        m = _ATTRIB_PRESENT_WITHVAL.search(xpath_name)
        if m:
            n.name = m.group(1)
            start = m.start(2)
            while True:
                m2 = _ATTRIB_PRESENT_WITHVAL.search(xpath_name, start)
                if not m2:
                    break
                if n.attrib_and_values is None:
                    n.attrib_and_values = []
                n.attrib_and_values.append((m2.group(3), m2.group(5)))
                start = m2.end(6)
        search.append(n)
        return n

    def build_optimise(self, wa: Optional["_Node"]):
        self.wild_ancestor = wa
        if self.wild_card_nodes is not None:
            wa = self
        if self.child_nodes is not None:
            for n in self.child_nodes:
                n.build_optimise(wa)
        if self.wild_card_nodes is not None:
            for n in self.wild_card_nodes:
                n.build_optimise(wa)

    # -- parse walk (:240-321) -----------------------------------------

    def parse(self, ev: _Events, cur_attrs: Dict[str, str],
              handler, values: dict, stack: List[set],
              record_started: bool):
        frame = None
        if self.is_record:
            record_started = True
            frame = set()
            stack.append(frame)
        elif record_started:
            frame = stack[-1]
        try:
            if self.attributes is not None:
                for node in self.attributes:
                    value = cur_attrs.get(node.name)
                    if value is not None or (record_started
                                             and not self.is_record):
                        if frame is not None:
                            _put_text(values, value, node.field_name,
                                      node.multi_valued)
                            frame.add(node.field_name)
            children_found = set()
            flattened_starts = 0
            text: List[str] = []
            while True:
                event = ev.next()
                kind = event[0]
                if kind == "end":
                    if flattened_starts > 0:
                        flattened_starts -= 1
                        continue
                    if self.has_text and frame is not None:
                        frame.add(self.field_name)
                        _put_text(values, "".join(text),
                                  self.field_name, self.multi_valued)
                    if self.is_record:
                        handler(_deep_copy(values), self.for_each_path)
                    if (self.child_nodes and record_started
                            and not self.is_record
                            and not children_found
                            >= set(id(c) for c in self.child_nodes)):
                        for n in self.child_nodes:
                            if id(n) not in children_found:
                                n.put_nulls(values)
                    return
                if self.has_text and kind == "text":
                    text.append(event[1])
                elif kind == "start":
                    if self.flatten:
                        flattened_starts += 1
                    else:
                        self._handle_start(ev, event, children_found,
                                           handler, values, stack,
                                           record_started)
                elif kind == "end_doc":
                    return
        finally:
            if (self.is_record or not record_started) and stack:
                clean = stack.pop()
                if clean is not None:
                    for fld in clean:
                        values.pop(fld, None)

    def _handle_start(self, ev, event, children_found, handler,
                      values, stack, record_started):
        local, attrs = event[1], event[2]
        n = _matching(local, attrs, self.child_nodes)
        descends: Dict[str, "_Node"] = {}
        if n is not None:
            children_found.add(id(n))
            n.parse(ev, attrs, handler, values, stack, record_started)
            return
        dn = self
        while dn is not None:
            if dn.wild_card_nodes is not None:
                n = _matching(local, attrs, dn.wild_card_nodes)
                if n is not None:
                    children_found.add(id(n))
                    n.parse(ev, attrs, handler, values, stack,
                            record_started)
                    break
                for nn in dn.wild_card_nodes:
                    descends[nn.name] = nn
            dn = dn.wild_ancestor
        if n is None:
            # skip the subtree, re-entering on cached '//' names
            count = 1
            while count != 0:
                tok = ev.next()
                if tok[0] == "start":
                    nn = descends.get(tok[1])
                    if nn is not None:
                        children_found.add(id(nn))
                        nn.parse(ev, tok[2], handler, values, stack,
                                 record_started)
                    else:
                        count += 1
                elif tok[0] == "end":
                    count -= 1
                elif tok[0] == "end_doc":
                    return

    def put_nulls(self, values: dict):
        if self.attributes is not None:
            for n in self.attributes:
                if n.multi_valued:
                    _put_text(values, None, n.field_name, True)
        if self.has_text and self.multi_valued:
            _put_text(values, None, self.field_name, True)
        if self.child_nodes is not None:
            for c in self.child_nodes:
                c.put_nulls(values)


def _matching(local, attrs, search):
    if search is None:
        return None
    for n in search:
        if n.name == local:
            if n.attrib_and_values is None:
                return n
            ok = True
            for k, v in n.attrib_and_values:
                val = attrs.get(k)
                if val is None or (v is not None and v != val):
                    ok = False
                    break
            if ok:
                return n
    return None


def _put_text(values, value, field_name, multi_valued):
    if multi_valued:
        v = values.get(field_name)
        if v is None:
            v = []
            values[field_name] = v
        v.append(value)
    else:
        values[field_name] = value


def _deep_copy(values):
    return {k: (list(v) if isinstance(v, list) else v)
            for k, v in values.items()}


class XPathRecordReader:
    def __init__(self, for_each_xpath: str):
        self.root = _Node("/", None)
        for split in for_each_xpath.split("|"):
            split = split.strip()
            if split.startswith("//"):
                raise ValueError(
                    f"forEach cannot start with '//': {split}")
            if not split:
                continue
            self._add_field0(split, split, False, True, 0)

    def add_field(self, name: str, xpath: str,
                  multi_valued: bool = False, flags: int = 0):
        self._add_field0(xpath, name, multi_valued, False, flags)
        return self

    def _add_field0(self, xpath, name, multi_valued, is_record, flags):
        if not xpath.startswith("/"):
            raise ValueError(f"xpath must start with '/' : {xpath}")
        paths = _split_escape_quote(xpath)
        if paths and paths[0].strip() == "":
            paths.pop(0)
        self.root.build(paths, name, multi_valued, is_record, flags)
        self.root.build_optimise(None)

    def stream_records(self, xml_text: str,
                       handler: Callable[[dict, str], None]):
        ev = _Events(xml_text)
        self.root.parse(ev, {}, handler, {}, [], False)

    def get_all_records(self, xml_text: str) -> List[dict]:
        out: List[dict] = []
        self.stream_records(xml_text,
                            lambda rec, _xp: out.append(rec))
        return out
