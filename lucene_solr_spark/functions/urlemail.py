"""UAX29URLEmailTokenizer: the URL/EMAIL-aware word tokenizer.

Reference semantics mirrored:
  - UAX29URLEmailTokenizerImpl.jflex (analysis/common/.../standard/
    UAX29URLEmailTokenizerImpl.jflex:90-285): the URL grammar
    (RFC-3986-shaped HTTP full/no-scheme, FTP, FILE variants with the
    login/host/port/path/query/fragment pieces, IPv4 octet ranges and
    the full IPv6 alternation), the EMAIL grammar (atom-text class
    kept VERBATIM including the '+'-'/' range that admits ',' and
    '.', quoted strings, bracketed hosts), the LUCENE-3880
    mailto-lookahead rule (competes at full lookahead length, consumes
    only "mailto"), and the UAX#29 word/numeric tier shared with
    StandardTokenizer (this engine's ASCII scanner + token_type).
    jflex maximal munch is replicated by scoring every rule at the
    cursor and taking the longest (spec order on ties, URL first).
  - ASCIITLD.jflex-macro: the July-2012 IANA root-zone TLD table
    (public IANA data; 314 entries incl. xn-- IDN forms), matched
    case-insensitively, longest-alternative-first.
  - UAX29URLEmailTokenizer.java: token types <ALPHANUM>/<NUM>/<URL>/
    <EMAIL> and the maxTokenLength skip rule (oversize tokens are
    dropped, positions unaffected at this tier).

ASCII scope note: the CJK/SEA/Hangul tiers follow the same
conscious-exclusion seam as the standard chain (SURVEY section 2.2)
— the corpus payload is source code.
"""

from __future__ import annotations

import re
from typing import List, NamedTuple

from lucene_solr_spark.functions.analysis import (
    _A_CORE,
    token_type,
)

__all__ = ["UrlEmailToken", "uax29_url_email_tokenize"]


_ASCII_TLDS = (
    "ac", "ad", "ae", "aero", "af", "ag",
    "ai", "al", "am", "an", "ao", "aq",
    "ar", "arpa", "as", "asia", "at", "au",
    "aw", "ax", "az", "ba", "bb", "bd",
    "be", "bf", "bg", "bh", "bi", "biz",
    "bj", "bm", "bn", "bo", "br", "bs",
    "bt", "bv", "bw", "by", "bz", "ca",
    "cat", "cc", "cd", "cf", "cg", "ch",
    "ci", "ck", "cl", "cm", "cn", "co",
    "com", "coop", "cr", "cu", "cv", "cw",
    "cx", "cy", "cz", "de", "dj", "dk",
    "dm", "do", "dz", "ec", "edu", "ee",
    "eg", "er", "es", "et", "eu", "fi",
    "fj", "fk", "fm", "fo", "fr", "ga",
    "gb", "gd", "ge", "gf", "gg", "gh",
    "gi", "gl", "gm", "gn", "gov", "gp",
    "gq", "gr", "gs", "gt", "gu", "gw",
    "gy", "hk", "hm", "hn", "hr", "ht",
    "hu", "id", "ie", "il", "im", "in",
    "info", "int", "io", "iq", "ir", "is",
    "it", "je", "jm", "jo", "jobs", "jp",
    "ke", "kg", "kh", "ki", "km", "kn",
    "kp", "kr", "kw", "ky", "kz", "la",
    "lb", "lc", "li", "lk", "lr", "ls",
    "lt", "lu", "lv", "ly", "ma", "mc",
    "md", "me", "mg", "mh", "mil", "mk",
    "ml", "mm", "mn", "mo", "mobi", "mp",
    "mq", "mr", "ms", "mt", "mu", "museum",
    "mv", "mw", "mx", "my", "mz", "na",
    "name", "nc", "ne", "net", "nf", "ng",
    "ni", "nl", "no", "np", "nr", "nu",
    "nz", "om", "org", "pa", "pe", "pf",
    "pg", "ph", "pk", "pl", "pm", "pn",
    "pr", "pro", "ps", "pt", "pw", "py",
    "qa", "re", "ro", "rs", "ru", "rw",
    "sa", "sb", "sc", "sd", "se", "sg",
    "sh", "si", "sj", "sk", "sl", "sm",
    "sn", "so", "sr", "st", "su", "sv",
    "sx", "sy", "sz", "tc", "td", "tel",
    "tf", "tg", "th", "tj", "tk", "tl",
    "tm", "tn", "to", "tp", "tr", "travel",
    "tt", "tv", "tw", "tz", "ua", "ug",
    "uk", "us", "uy", "uz", "va", "vc",
    "ve", "vg", "vi", "vn", "vu", "wf",
    "ws", "xn--0zwm56d", "xn--11b5bs3a9aj6g", "xn--3e0b707e", "xn--45brj9c", "xn--80akhbyknj4f",
    "xn--80ao21a", "xn--90a3ac", "xn--9t4b11yi5a", "xn--clchc0ea0b2g2a9gcd", "xn--deba0ad", "xn--fiqs8s",
    "xn--fiqz9s", "xn--fpcrj9c3d", "xn--fzc2c9e2c", "xn--g6w251d", "xn--gecrj9c", "xn--h2brj9c",
    "xn--hgbk6aj7f53bba", "xn--hlcj6aya9esc7a", "xn--j6w193g", "xn--jxalpdlp", "xn--kgbechtv", "xn--kprw13d",
    "xn--kpry57d", "xn--lgbbat1ad8j", "xn--mgb9awbf", "xn--mgbaam7a8h", "xn--mgbayh7gpa", "xn--mgbbh1a71e",
    "xn--mgbc0a9azcg", "xn--mgberp4a5d4ar", "xn--o3cw4h", "xn--ogbpf8fl", "xn--p1ai", "xn--pgbs0dh",
    "xn--s9brj9c", "xn--wgbh1c", "xn--wgbl6a", "xn--xkc2al3hye2a", "xn--xkc2dl3a5ee0h", "xn--yfro4i67o",
    "xn--ygbi2ammx", "xn--zckzah", "xxx", "ye", "yt", "za",
    "zm", "zw",
)


_TLD_ALT = "|".join(sorted(_ASCII_TLDS, key=len, reverse=True))
_LABEL = r"[A-Za-z0-9](?:[A-Za-z0-9\-]*[A-Za-z0-9])?"
# DomainNameStrict = label ("." label)* "." TLD; strict BEFORE IPv4 in
# host alternations so backtracking can reach the longer dotted parse
_DOMAIN_STRICT = (
    f"{_LABEL}(?:\\.{_LABEL})*\\.(?i:(?:{_TLD_ALT}))")
_DOMAIN_LOOSE = f"{_LABEL}(?:\\.{_LABEL})*"

_OCTET = r"(?:2(?:[0-4][0-9]|5[0-5])|1[0-9][0-9]|0?[1-9][0-9]|0{0,2}[0-9])"
_IPV4 = f"{_OCTET}(?:\\.{_OCTET}){{3}}"
_H16 = r"[0-9A-Fa-f]{1,4}"
_LS32 = f"(?:{_IPV4}|{_H16}:{_H16})"
_IPV6 = "|".join([
    f"(?:{_H16}:){{6}}{_LS32}",
    f"::(?:{_H16}:){{5}}{_LS32}",
    f"(?:{_H16})?::(?:{_H16}:){{4}}{_LS32}",
    f"(?:(?:{_H16}:){{0,1}}{_H16})?::(?:{_H16}:){{3}}{_LS32}",
    f"(?:(?:{_H16}:){{0,2}}{_H16})?::(?:{_H16}:){{2}}{_LS32}",
    f"(?:(?:{_H16}:){{0,3}}{_H16})?::{_H16}:{_LS32}",
    f"(?:(?:{_H16}:){{0,4}}{_H16})?::{_LS32}",
    f"(?:(?:{_H16}:){{0,5}}{_H16})?::{_H16}",
    f"(?:(?:{_H16}:){{0,6}}{_H16})?::",
])

_UNRES = r"[\-._~A-Za-z0-9]"
_PCT = r"%[0-9A-Fa-f]{2}"
_SUB = r"[!$&'()*+,;=]"
_LOGINSEG = f"(?:{_UNRES}|{_PCT}|{_SUB})*"
_LOGIN = f"{_LOGINSEG}(?::{_LOGINSEG})?@"
_QUERY = f"\\?(?:{_UNRES}|{_PCT}|{_SUB}|[:@/?])*"
_FRAG = f"#(?:{_UNRES}|{_PCT}|{_SUB}|[:@/?])*"
_PORT = r":[0-9]{1,5}"
_HOST_STRICT = f"(?:\\[(?:{_IPV6})\\]|{_DOMAIN_STRICT}|{_IPV4})"
# DomainNameLoose admits every unbracketed IPv4 spelling
_HOST_LOOSE = f"(?:\\[(?:{_IPV6})\\]|{_DOMAIN_LOOSE})"
_AUTH_STRICT = f"{_HOST_STRICT}(?:{_PORT})?"
_AUTH_LOOSE = f"(?:{_LOGIN})?{_HOST_LOOSE}(?:{_PORT})?"
_HTTPSEG = f"(?:{_UNRES}|{_PCT}|[;:@&=])*"
_HTTPPATH = f"(?:/{_HTTPSEG})*"
_HTTPFULL = (f"[hH][tT][tT][pP][sS]?://{_AUTH_LOOSE}"
             f"(?:{_HTTPPATH})?(?:{_QUERY})?(?:{_FRAG})?")
_HTTPNOSCHEME = (f"{_AUTH_STRICT}"
                 f"(?:{_HTTPPATH})?(?:{_QUERY})?(?:{_FRAG})?")
_FTPSEG = f"(?:{_UNRES}|{_PCT}|[?:@&=])*"
_FTPPATH = f"/{_FTPSEG}(?:/{_FTPSEG})*"
_FTPTYPE = r";[tT][yY][pP][eE]=[aAiIdD]"
_FTPURL = (f"[fF][tT][pP]://{_AUTH_LOOSE}{_FTPPATH}"
           f"(?:{_FTPTYPE})?(?:{_FRAG})?")
_FILEURL = (f"[fF][iI][lL][eE]://(?:{_HOST_LOOSE})?{_FTPPATH}"
            f"(?:{_FRAG})?")
_URL_RE = re.compile(
    f"(?:{_HTTPFULL}|{_FTPURL}|{_FILEURL}|{_HTTPNOSCHEME})")

# EMAILatomText keeps the reference's '+'-'/' RANGE (adds ',' '.')
_ATOM = r"[A-Za-z0-9!#$%&'*+,\-./=?^_`{|}~]"
_EQS = r'"(?:[\x01-\x08\x0B\x0C\x0E-\x21\x23-\x5B\x5D-\x7E]|\\[\x00-\x7F])*"'
_ELABEL = f"(?:{_ATOM}+|{_EQS})"
_ELOCAL = f"{_ELABEL}(?:\\.{_ELABEL})*"
_EDLT = r"(?:[\x01-\x08\x0B\x0C\x0E-\x5A\x5E-\x7F]|\\[\x00-\x7F])"
_EBRACKET = f"\\[(?:{_EDLT}*|{_IPV4}|[iI][pP][vV]6:(?:{_IPV6}))\\]"
_EMAIL_RE = re.compile(
    f"{_ELOCAL}@(?:{_DOMAIN_STRICT}|{_EBRACKET})")

_MAILTO_RE = re.compile(
    f"(?P<word>[mM][aA][iI][lL][tT][oO])"
    f"(?P<look>:{_ELOCAL}@(?:{_DOMAIN_STRICT}|{_EBRACKET}))")

_WORD_RE = re.compile(f"_*{_A_CORE}(?:_+{_A_CORE})*_*")


class UrlEmailToken(NamedTuple):
    term: str
    type: str
    start: int
    end: int


# fast-path prechecks (r3 verdict perf note): outside quoted email
# local parts, every URL/EMAIL/mailto match is whitespace-free up to
# a REQUIRED '.', '@', '[' or ':' (schemes carry '://', no-scheme
# hosts need '.'+TLD or an IPv4 dot or a bracketed IPv6, emails need
# '@', mailto needs ':'), so when the non-space run at the cursor has
# none of those — and no '"' opening a quoted local part, whose _EQS
# body may span whitespace-class control chars and spaces — only the
# word rule can fire, skipping the expensive URL alternation at every
# plain word. Whitespace runs are skipped in one step.
_WS_RUN = re.compile(r"\s+")
_NONSPACE = re.compile(r"\S+")
_URLISH = re.compile(r"[.@\[:\"]")


def uax29_url_email_tokenize(
    text: str, max_token_length: int = 255,
) -> List[UrlEmailToken]:
    """Scan ``text`` with maximal munch over the URL / mailto-lookahead
    / EMAIL / word-numeric rules (spec order on ties). Oversize tokens
    are skipped like the tokenizer's maxTokenLength rule."""
    out: List[UrlEmailToken] = []
    pos, n = 0, len(text)
    while pos < n:
        wm = _WS_RUN.match(text, pos)
        if wm is not None:
            pos = wm.end()
            continue
        best_len = 0
        best_consume = 0
        best_type = None
        span = _NONSPACE.match(text, pos).end()
        if _URLISH.search(text, pos, span) is not None:
            m = _URL_RE.match(text, pos)
            if m and m.end() - pos > best_len:
                best_len = best_consume = m.end() - pos
                best_type = "<URL>"
            m = _MAILTO_RE.match(text, pos)
            if m:
                full = m.end() - pos
                if full > best_len:
                    best_len = full
                    best_consume = m.end("word") - pos
                    best_type = "<ALPHANUM>"
            m = _EMAIL_RE.match(text, pos)
            if m and m.end() - pos > best_len:
                best_len = best_consume = m.end() - pos
                best_type = "<EMAIL>"
        m = _WORD_RE.match(text, pos)
        if m and m.end() - pos > best_len:
            best_len = best_consume = m.end() - pos
            best_type = None  # classify below
        if best_len == 0:
            pos += 1
            continue
        term = text[pos:pos + best_consume]
        ttype = best_type if best_type is not None else token_type(term)
        if len(term) <= max_token_length:
            out.append(UrlEmailToken(term, ttype, pos,
                                     pos + best_consume))
        pos += best_consume
    return out
