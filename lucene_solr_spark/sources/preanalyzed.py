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
