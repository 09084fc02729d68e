"""Path-hierarchy tokenizers.

Reference: ``analysis/path/PathHierarchyTokenizer.java`` (forward:
cumulative prefixes ``/a``, ``/a/b``, ``/a/b/c``; first token
posInc=1, the rest posInc=0 — PathHierarchyTokenizer.java:113-120;
``skip`` drops the first N components and the surviving tokens keep a
leading delimiter, :146-200) and
``analysis/path/ReversePathHierarchyTokenizer.java`` (suffixes:
``www.site.co.uk`` -> ``www.site.co.uk``, ``site.co.uk``, ``co.uk``,
``uk``; skip drops trailing components — :30-47,:108-140).

Re-expressed as a pure string -> [(token, position)] function: the
split-prefix formulation below is provably equivalent to the
reference's char walk for inputs without repeated delimiters (the
only shape the factories are documented for); ``replacement``
substitutes the delimiter char in EMITTED tokens only.
"""

from __future__ import annotations

from typing import List, Tuple


def path_hierarchy_tokens(
    s: str,
    delimiter: str = "/",
    replacement: str | None = None,
    skip: int = 0,
    reverse: bool = False,
) -> List[Tuple[str, int]]:
    """All tokens share position 0 (posInc 1 then 0s, as in the
    reference); callers that need ordering use list order."""
    if replacement is None:
        replacement = delimiter
    if not s:
        return []
    parts = s.split(delimiter)
    rep = replacement

    if not reverse:
        # leading '' (absolute path) is not a skippable component
        lead = 1 if parts and parts[0] == "" else 0
        toks = []
        if skip == 0:
            for k in range(1, len(parts) + 1):
                tok = rep.join(parts[:k])
                if tok:
                    toks.append(tok)
        else:
            body = parts[lead:]
            if len(body) <= skip:
                return []
            for k in range(skip + 1, len(body) + 1):
                # skipped components collapse to one leading delimiter
                toks.append(rep + rep.join(body[skip:k]))
        return [(t, 0) for t in toks]

    # reverse: suffixes, longest first; skip drops trailing components
    # (ReversePathHierarchyTokenizer.java:108-140 — with skip>0 the
    # emitted suffixes keep a trailing delimiter)
    trail = 1 if len(parts) > 1 and parts[-1] == "" else 0
    body = parts[: len(parts) - trail] if trail else parts
    if skip > 0:
        if len(body) <= skip:
            return []
        kept = body[: len(body) - skip]
        toks = [rep.join(kept[i:]) + rep for i in range(len(kept))]
    else:
        toks = [rep.join(body[i:]) + (rep * trail)
                for i in range(len(body))]
    return [(t, 0) for t in toks if t and t != rep]
