"""PreAnalyzedField re-expression (solr/core/src/java/org/apache/
solr/schema/PreAnalyzedField.java + JsonPreAnalyzedParser.java): a
field whose value arrives ALREADY analyzed — the JSON v1 format
carries the stored text plus a token list with optional per-token
attributes, and indexing bypasses the analysis chain entirely.

JsonPreAnalyzedParser rules kept exactly (:91-207):
- "v" must equal "1" (error otherwise); "str" is the stored text.
- each token map: "t" term text; "s"/"e" explicit char offsets
  (non-numeric values ignored with the has-flag cleared); "i"
  position increment (default 1, non-numeric ignored); "p" base64
  payload; "y" type.
- offset defaults: start = previous token's end + 1 (so the FIRST
  default start is 1, not 0 — the reference's separator-increment
  quirk, :111-115), end = start + len(term) when "e" is absent.

Spark shape: parsing is a per-row pure function over the JSON column
(Arrow-batched in the loader); the result is the same
(term, pos, start, end) stream the normal analysis chain feeds the
inverter, so a pre-analyzed corpus indexes through the identical
build path with the chain skipped."""

from __future__ import annotations

import json
from typing import List, Optional, Tuple

VERSION = "1"


class PreAnalyzedParseError(ValueError):
    pass


def parse_preanalyzed(value: str) -> Tuple[Optional[str], List[tuple]]:
    """Returns (stored_text, [(term, position, start, end, payload_b64,
    type)]) — positions are the accumulated increments (first token at
    increment-1 like the chain's position space)."""
    try:
        m = json.loads(value)
    except Exception as e:
        raise PreAnalyzedParseError(f"invalid JSON: {e}") from e
    v = m.get("v")
    if v is None:
        raise PreAnalyzedParseError("Missing VERSION key")
    if v != VERSION:
        raise PreAnalyzedParseError(
            f"Unknown VERSION '{v}', expected {VERSION}")
    stored = m.get("str")
    tokens = m.get("tokens")
    out: List[tuple] = []
    if tokens is None:
        return stored, out
    token_end = 0
    pos = -1
    for tok in tokens:
        token_start = token_end + 1   # separator-increment default
        has_start = has_end = False
        term = ""
        length = -1
        pinc = 1
        payload = None
        ttype = None
        for key, val in tok.items():
            if key == "t":
                term = str(val)
                length = len(term)
            elif key == "s":
                has_start = True
                if isinstance(val, (int, float)):
                    token_start = int(val)
                else:
                    try:
                        token_start = int(str(val))
                    except ValueError:
                        has_start = False
            elif key == "e":
                has_end = True
                if isinstance(val, (int, float)):
                    token_end = int(val)
                else:
                    try:
                        token_end = int(str(val))
                    except ValueError:
                        has_end = False
            elif key == "i":
                if isinstance(val, (int, float)):
                    pinc = int(val)
                else:
                    try:
                        pinc = int(str(val))
                    except ValueError:
                        pass
            elif key == "p":
                s = str(val)
                payload = s if s else None
            elif key == "y":
                ttype = str(val)
            # unknown keys skipped like the reference (warn-only)
        if not has_end and length > -1:
            token_end = token_start + length
        pos += pinc
        out.append((term, pos, token_start, token_end, payload, ttype))
    return stored, out


# ---------------------------------------------------------------------------
# SimplePreAnalyzedParser (solr/core/src/java/org/apache/solr/schema/
# SimplePreAnalyzedParser.java) — the plain-text v1 format:
#   content ::= version (stored)? tokens      version ::= "1 "
#   stored  ::= "=" text "="                  token   ::= text ("," attrib)*
#   attrib  ::= name "=" value
# Escapes "\ " "\," "\=" "\\" "\n" "\r" "\t"; unknown "\x" stays as the
# two chars "\x" AND counts 2 toward the offset cursor (:362-366).
# Attribute names: i (posIncr, strict int), s/e (explicit offsets),
# y (type), f (flags, hex), p (payload, hex bytes).  Default offsets
# come from a character cursor over term text + separating spaces only
# (attribute chars are free): tokenEnd = cursor at flush, tokenStart =
# tokenEnd - len(term) (:285-320,413-418).  Unlike the JSON format the
# NEXT token's default never chains off an explicit s/e.
# ---------------------------------------------------------------------------

# Java HashMap bucket of the single-char attr keys (hash = ord, default
# capacity 16) — drives the reference's attribute-class registration
# order in createState (:419-446): p=0, s=3, e=5, f=6, i=9, y=9 (i/y
# collide; the tie is put order, i.e. the order the attrs appeared).
_BUCKET = {"p": 0, "s": 3, "e": 5, "f": 6, "i": 9, "y": 9}


class _SimpleTok:
    __slots__ = ("term", "start", "end", "pinc", "ttype", "flags",
                 "p_class", "payload", "class_adds")

    def __init__(self):
        self.term = ""
        self.start = 0
        self.end = 0
        self.pinc = None       # None = PositionIncrementAttribute absent
        self.ttype = None      # None = TypeAttribute absent
        self.flags = None      # None = FlagsAttribute absent
        self.p_class = False   # PayloadAttribute added?
        self.payload = b""     # set only when non-empty (:440)
        self.class_adds = ()   # attr classes THIS token registers, in order


def _hex_to_bytes(hexstr: str) -> bytes:
    """hexToBytes (:167-188): whitespace stripped, odd length pads the
    last nibble low with 0, non-hex char raises."""
    h = "".join(hexstr.split())
    out = bytearray()
    i = 0
    while i < len(h):
        hi = _nibble(h[i])
        lo = 0
        if i < len(h) - 1:
            i += 1
            lo = _nibble(h[i])
        out.append((hi << 4 | lo) & 0xFF)
        i += 1
    return bytes(out)


def _nibble(c: str) -> int:
    v = "0123456789abcdef".find(c.lower())
    if v < 0 or (not c.isascii()):
        raise PreAnalyzedParseError(f"Not a hex character: '{c}'")
    return v


def _hashmap_order(keys_in_put_order):
    """Iteration order of a default-capacity Java HashMap over the
    single-char attr keys: by bucket, put order within a bucket."""
    return sorted(
        keys_in_put_order,
        key=lambda kv: (_BUCKET.get(kv, 99), keys_in_put_order.index(kv)))


def _simple_create_state(term: str, attr_items, token_end: int):
    """createState (:413-453): fold the raw attr list into a token
    state; returns (_SimpleTok, error) semantics via raising."""
    t = _SimpleTok()
    t.term = term
    token_start = token_end - len(term)
    adds = []
    for k in _hashmap_order([k for k, _ in attr_items]):
        v = dict(attr_items)[k]
        if k == "i":
            try:
                t.pinc = int(v)
            except ValueError as e:
                raise PreAnalyzedParseError(
                    f"invalid position increment '{v}'") from e
            adds.append("i")
        elif k == "s":
            token_start = int(v)
        elif k == "e":
            token_end = int(v)
        elif k == "y":
            t.ttype = v
            adds.append("y")
        elif k == "f":
            try:
                t.flags = int(v, 16)
            except ValueError as e:
                raise PreAnalyzedParseError(f"invalid flags '{v}'") from e
            adds.append("f")
        elif k == "p":
            t.p_class = True
            data = _hex_to_bytes(v)
            if data:
                t.payload = data
            adds.append("p")
        # unknown attribute: ignored (:443-445)
    t.start = token_start
    t.end = token_end
    t.class_adds = tuple(adds)
    return t


_S_TOKEN, _S_NAME, _S_VALUE, _S_UNDEF = 0, 1, 2, 3


def parse_simple_raw(value: str):
    """SimplePreAnalyzedParser.parse (:216-411) rule-verbatim.

    Returns (stored_text_or_None, [_SimpleTok]).  Raises
    PreAnalyzedParseError on every input the reference rejects,
    including the bare-version "1 " case (reference crashes with
    StringIndexOutOfBounds on val.charAt(0))."""
    if value == "":
        return None, []
    idx = value.find(" ")
    if idx == -1:
        raise PreAnalyzedParseError("Missing VERSION token")
    if value[:idx] != VERSION:
        raise PreAnalyzedParseError(f"Unknown VERSION {value[:idx]}")
    val = value[idx + 1:]
    if val == "":
        raise PreAnalyzedParseError(
            "empty content after version (reference charAt(0) crash)")
    ts_start = 0
    stored = None
    if val[0] == "=":
        if len(val) <= 1:
            raise PreAnalyzedParseError("Unexpected end of stored field")
        buf = []
        i = 1
        while i < len(val):
            c = val[i]
            if c == "\\":
                if i < len(val) - 1:
                    i += 1
                    c = val[i]
                    if c == "=":   # ONLY \= is recognized here (:251)
                        buf.append("=")
                    else:
                        buf.append("\\")
                        buf.append(c)
                else:
                    buf.append(c)
            elif c == "=":
                ts_start = i + 1
                break
            else:
                buf.append(c)
            i += 1
        if ts_start == 0:
            raise PreAnalyzedParseError("Missing end marker of stored part")
        stored = "".join(buf)

    toks: List[_SimpleTok] = []
    tok_term: List[str] = []
    tok_attrs: List[tuple] = []   # (name, value) in put order
    att_name: List[str] = []
    att_val: List[str] = []
    s = _S_UNDEF
    last_pos = 0
    i = ts_start
    n = len(val)
    while i < n:
        c = val[i]
        if c == " ":
            if s == _S_VALUE:
                if not att_val:
                    raise PreAnalyzedParseError(
                        f"Unexpected character ' ' at position {i}"
                        " - empty value of attribute.")
                if att_name:
                    tok_attrs.append(("".join(att_name), "".join(att_val)))
            elif s == _S_NAME:
                if att_name:
                    raise PreAnalyzedParseError(
                        f"Unexpected character ' ' at position {i}"
                        " - missing attribute value.")
            att_name = []
            att_val = []
            if tok_term or tok_attrs or s == _S_NAME:
                toks.append(_simple_create_state(
                    "".join(tok_term), tok_attrs, last_pos))
            s = _S_UNDEF
            tok_term = []
            tok_attrs = []
            last_pos += 1
            i += 1
            continue
        if s == _S_UNDEF:
            s = _S_TOKEN
        tgt = tok_term if s == _S_TOKEN else (
            att_name if s == _S_NAME else att_val)
        if c == "\\":
            if s == _S_TOKEN:
                last_pos += 1
            if i >= n - 1:      # trailing backslash kept (:340-343)
                tgt.append(c)
                i += 1
                continue
            i += 1
            c = val[i]
            if c in ("\\", "=", ",", " "):
                tgt.append(c)
            elif c == "n":
                tgt.append("\n")
            elif c == "r":
                tgt.append("\r")
            elif c == "t":
                tgt.append("\t")
            else:               # unknown escape: both chars, cursor +2
                tgt.append("\\")
                tgt.append(c)
                last_pos += 1
        elif c == ",":
            if s == _S_TOKEN:
                s = _S_NAME
            elif s == _S_VALUE:
                if not att_val:
                    raise PreAnalyzedParseError(
                        f"Unexpected character ',' at position {i}"
                        " - empty value of attribute.")
                if att_name and att_val:
                    tok_attrs.append(("".join(att_name), "".join(att_val)))
                att_name = []
                att_val = []
                s = _S_NAME
            else:
                raise PreAnalyzedParseError(
                    f"Unexpected character ',' at position {i}"
                    " - missing attribute value.")
        elif c == "=":
            if s == _S_NAME:
                s = _S_VALUE
            else:
                raise PreAnalyzedParseError(
                    f"Unexpected character '=' at position {i}"
                    " - empty value of attribute.")
        else:
            tgt.append(c)
            if s == _S_TOKEN:
                last_pos += 1
        i += 1
    if tok_term or tok_attrs or s in (_S_NAME, _S_VALUE):
        if s == _S_VALUE and att_name and att_val:
            tok_attrs.append(("".join(att_name), "".join(att_val)))
        toks.append(_simple_create_state(
            "".join(tok_term), tok_attrs, last_pos))
    return stored, toks


def parse_simple_preanalyzed(
        value: str) -> Tuple[Optional[str], List[tuple]]:
    """Same output shape as parse_preanalyzed — (stored, [(term, pos,
    start, end, payload_b64, type)]) — so a simple-format corpus feeds
    the identical inverter path.  Positions accumulate increments with
    the first default-increment token at 0.  Flags are validated but
    not carried (the posting stream has no flags lane — same treatment
    the JSON path gives its "f" key)."""
    import base64

    stored, toks = parse_simple_raw(value)
    out: List[tuple] = []
    pos = -1
    for t in toks:
        pos += 1 if t.pinc is None else t.pinc
        payload = (base64.b64encode(t.payload).decode("ascii")
                   if t.payload else None)
        out.append((t.term, pos, t.start, t.end, payload, t.ttype))
    return stored, out


def _simple_escape(s: str) -> str:
    """escape (:542-573)."""
    out = []
    for c in s:
        if c in ("\\", "=", ",", " "):
            out.append("\\")
            out.append(c)
        elif c == "\n":
            out.append("\\n")
        elif c == "\r":
            out.append("\\r")
        elif c == "\t":
            out.append("\\t")
        else:
            out.append(c)
    return "".join(out)


def simple_to_formatted(stored: Optional[str], toks) -> str:
    """toFormattedString (:456-536) over a parsed token list.

    Reference quirks kept:
    - stored text is emitted UNESCAPED: the reference's
      replaceAll("=", "\\\\=") replacement string collapses to "=" in
      Java regex replacement semantics, so '=' inside stored survives
      raw and the output may not re-parse (:463).
    - attribute classes are registered on a SHARED AttributeSource, so
      once any token carries i/y/f/p every token serializes it with
      the cleared-state default (i=1, y="word", f=0-as-hex "0",
      p=null -> omitted via the remove-last-comma path :506-508).
    - class order = first-registration order: term attr first, each
      token's adds in Java-HashMap iteration order, offset (s,e)
      registered at the end of the first token (:448).
    """
    classes = ["t"]
    for t in toks:
        for k in t.class_adds:
            if k not in classes:
                classes.append(k)
        if "se" not in classes:
            classes.append("se")
    parts = [VERSION + " "]
    if stored is not None:
        parts.append("=" + stored + "=")
    first = True
    for t in toks:
        if not first:
            parts.append(" ")
        first = False
        tok = []
        term = None
        for cl in classes:
            if cl == "t":
                term = _simple_escape(t.term)
                continue
            if tok:
                tok.append(",")
            if cl == "i":
                tok.append("i=%d" % (1 if t.pinc is None else t.pinc))
            elif cl == "y":
                tok.append("y=" + _simple_escape(
                    "word" if t.ttype is None else t.ttype))
            elif cl == "f":
                tok.append("f=%x" % (0 if t.flags is None else t.flags))
            elif cl == "p":
                if t.payload:
                    tok.append("p=" + t.payload.hex())
                elif tok:
                    tok.pop()   # remove the comma just appended
            elif cl == "se":
                tok.append("s=%d,e=%d" % (t.start, t.end))
        body = "".join(tok)
        if term:
            body = term + "," + body if body else term
        parts.append(body)
    return "".join(parts)
