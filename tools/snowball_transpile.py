"""Transpile the Snowball-compiler-GENERATED Java stemmers
(org/tartarus/snowball/ext/*.java — themselves machine-generated from
the published snowballstem.org algorithm scripts) into Python classes
over the engine's snowball_runtime.SnowballProgram port.

The generated dialect is tiny and rigidly regular, so this is a
restricted translator, not a Java compiler: Among tables, bit-set
groupings, I_/B_/S_ fields, boolean r_*() methods, `labN: do {...}
while(false)` single-shot blocks, `golabN/replabN: while(true)` loops
(with labeled continue), switch(among_var) with no fallthrough, and
straight-line expressions. Labeled break/continue translate to
exceptions bound to the innermost breakable construct, which is
exactly Java's binding rule.

Usage: python tools/snowball_transpile.py
Writes lucene_solr_spark/functions/snowball_ext.py; every generated
stemmer is then vocabulary-duel-gated over the reference's own
TestSnowballVocabData.zip (voc.txt/output.txt per language) in
tests/test_snowball.py."""

from __future__ import annotations

import os
import re
import sys

EXT = ("/root/reference/lucene/analysis/common/src/java/org/tartarus/"
       "snowball/ext")
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))),
    "lucene_solr_spark", "functions", "snowball_ext.py")


def strip_comments(src: str) -> str:
    src = re.sub(r"/\*.*?\*/", "", src, flags=re.S)
    src = re.sub(r"//[^\n]*", "", src)
    return src


def parse_amongs(src: str):
    """{name: [(s, substring_i, result, method_name or None)]}"""
    out = {}
    for m in re.finditer(
            r"Among (a_\d+)\[\]\s*=\s*\{(.*?)\};", src, flags=re.S):
        name, body = m.group(1), m.group(2)
        rows = []
        for am in re.finditer(
                r'new Among\s*\(\s*"((?:[^"\\]|\\.)*)"\s*,\s*(-?\d+)\s*,'
                r'\s*(-?\d+)\s*,\s*"([^"]*)"\s*,\s*methodObject\s*\)',
                body):
            s = am.group(1).encode().decode("unicode_escape")
            rows.append((s, int(am.group(2)), int(am.group(3)),
                         am.group(4) or None))
        out[name] = rows
    return out


def parse_groupings(src: str):
    out = {}
    for m in re.finditer(
            r"char (g_\w+)\[\]\s*=\s*\{([^}]*)\};", src):
        vals = [int(v.strip()) for v in m.group(2).split(",") if v.strip()]
        out[m.group(1)] = vals
    return out


def parse_fields(src: str):
    fields = []
    for m in re.finditer(r"private (?:int|boolean) (I_\w+|B_\w+);", src):
        fields.append(m.group(1))
    for m in re.finditer(
            r"private java\.lang\.StringBuilder (S_\w+)\s*=", src):
        fields.append(m.group(1))
    return fields


# ---------------------------------------------------------------------------
# tokenizer (enough for the generated dialect)
# ---------------------------------------------------------------------------

_TOKEN_RX = re.compile(
    r'"(?:[^"\\]|\\.)*"'            # string literal
    r"|'(?:[^'\\]|\\.)'"            # char literal
    r"|[A-Za-z_][A-Za-z0-9_]*"      # identifier
    r"|\d+"                         # number
    r"|\+\+|--|==|!=|<=|>=|&&|\|\||[-+*/%(){};:,<>=!\[\]]"
)


def tokens(src: str):
    return _TOKEN_RX.findall(src)


class P:
    """Token stream with a cursor."""

    def __init__(self, toks):
        self.t = toks
        self.i = 0

    def peek(self, off=0):
        return self.t[self.i + off] if self.i + off < len(self.t) else None

    def next(self):
        tok = self.t[self.i]
        self.i += 1
        return tok

    def expect(self, tok):
        got = self.next()
        if got != tok:
            raise SyntaxError(
                f"expected {tok!r} got {got!r} at {self.i}: "
                f"{' '.join(self.t[self.i - 5:self.i + 5])}")


_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


class Fn:
    """Transpiles ONE method body."""

    def __init__(self, fields, cls):
        self.fields = set(fields)
        self.cls = cls
        self.lines = []
        self.depth = 1
        self.breakable = []   # stack of labels for bare break
        self.n_syn = 0

    def w(self, s):
        self.lines.append("    " * self.depth + s)

    # -- expressions --
    def expr_atom(self, p: P) -> str:
        tok = p.peek()
        if tok == "(":
            p.next()
            e = self.expr(p)
            p.expect(")")
            return f"({e})"
        if tok == "!":
            p.next()
            return f"(not {self.expr_atom(p)})"
        if tok == "-":
            p.next()
            return f"(-{self.expr_atom(p)})"
        tok = p.next()
        if tok.startswith('"'):
            return tok  # python string literal, same escapes
        if tok.startswith("'"):
            ch = tok[1:-1].encode().decode("unicode_escape")
            return repr(ch)
        if tok.isdigit():
            return tok
        if _IDENT.match(tok):
            if p.peek() == "(":
                p.next()
                args = []
                if p.peek() != ")":
                    args.append(self.expr(p))
                    while p.peek() == ",":
                        p.next()
                        args.append(self.expr(p))
                p.expect(")")
                return self.call(tok, args)
            return self.name(tok)
        raise SyntaxError(f"unexpected token {tok!r}")

    _BINOPS = {"==": "==", "!=": "!=", "<=": "<=", ">=": ">=",
               "<": "<", ">": ">", "+": "+", "-": "-",
               "&&": "and", "||": "or"}

    def expr(self, p: P) -> str:
        out = self.expr_atom(p)
        while p.peek() in self._BINOPS:
            op = self._BINOPS[p.next()]
            out = f"{out} {op} {self.expr_atom(p)}"
        return out

    def name(self, tok: str) -> str:
        if tok in ("cursor", "limit", "limit_backward", "bra", "ket"):
            return f"self.{tok}"
        if tok in self.fields:
            return f"self.{tok}"
        if tok.startswith(("a_", "g_")):
            return f"self.{tok}"
        if tok == "true":
            return "True"
        if tok == "false":
            return "False"
        return tok  # local (v_N, c, among_var, ...)

    def call(self, fn: str, args) -> str:
        if fn.startswith("r_") or fn in (
                "in_grouping", "in_grouping_b", "out_grouping",
                "out_grouping_b", "in_range", "in_range_b", "out_range",
                "out_range_b", "eq_s", "eq_s_b", "eq_v", "eq_v_b",
                "find_among", "find_among_b", "slice_from", "slice_del",
                "slice_to", "insert", "replace_s", "assign_to",
                "slice_check", "stem"):
            # find_among(a_0, 32) drops the size arg (python len)
            if fn in ("find_among", "find_among_b") and len(args) == 2:
                args = args[:1]
            return f"self.{fn}({', '.join(args)})"
        raise SyntaxError(f"unknown call {fn}({args})")

    # -- statements --
    def block(self, p: P):
        p.expect("{")
        any_stmt = False
        while p.peek() != "}":
            self.stmt(p)
            any_stmt = True
        p.expect("}")
        if not any_stmt:
            self.w("pass")

    def stmt(self, p: P):
        tok = p.peek()
        if tok == "{":
            self.block(p)
            return
        if tok in ("int", "boolean", "char"):
            p.next()
            name = p.next()
            if p.peek() == "=":
                p.next()
                e = self.expr(p)
                self.w(f"{name} = {e}")
            p.expect(";")
            return
        if tok == "if":
            p.next()
            p.expect("(")
            cond = self.expr(p)
            p.expect(")")
            self.w(f"if {cond}:")
            self.depth += 1
            self.stmt(p)
            self.depth -= 1
            if p.peek() == "else":
                p.next()
                self.w("else:")
                self.depth += 1
                self.stmt(p)
                self.depth -= 1
            return
        if tok == "return":
            p.next()
            if p.peek() == ";":
                p.next()
                self.w("return")
            else:
                e = self.expr(p)
                p.expect(";")
                self.w(f"return {e}")
            return
        if tok == "break":
            p.next()
            if _IDENT.match(p.peek() or "") and p.peek() != ";":
                lab = p.next()
            else:
                lab = self.breakable[-1]
            p.expect(";")
            self.w(f"raise _Br({lab!r})")
            return
        if tok == "continue":
            p.next()
            lab = p.next()
            p.expect(";")
            self.w(f"raise _Ct({lab!r})")
            return
        if tok == "switch":
            p.next()
            p.expect("(")
            sel = self.expr(p)
            p.expect(")")
            self.switch(p, sel)
            return
        # label?
        if _IDENT.match(tok) and p.peek(1) == ":":
            lab = p.next()
            p.next()  # ':'
            if p.peek() == "do":
                p.next()
                self.w("try:")
                self.depth += 1
                self.breakable.append(lab)
                self.block(p)
                self.breakable.pop()
                self.depth -= 1
                p.expect("while")
                p.expect("(")
                assert p.next() == "false"
                p.expect(")")
                p.expect(";")
                self.w("except _Br as e:")
                self.w(f"    if e.lab != {lab!r}: raise")
            elif p.peek() == "while":
                p.next()
                p.expect("(")
                assert p.next() == "true"
                p.expect(")")
                self.w("try:")
                self.w("    while True:")
                self.w("        try:")
                self.depth += 3
                self.breakable.append(lab)
                self.block(p)
                self.breakable.pop()
                self.depth -= 3
                self.w("        except _Ct as e:")
                self.w(f"            if e.lab != {lab!r}: raise")
                self.w("            continue")
                self.w("except _Br as e:")
                self.w(f"    if e.lab != {lab!r}: raise")
            else:
                raise SyntaxError(f"label {lab} before {p.peek()!r}")
            return
        # plain statement: call or assignment
        if _IDENT.match(tok) and p.peek(1) == "(":
            p.next()
            p.expect("(")
            args = []
            if p.peek() != ")":
                args.append(self.expr(p))
                while p.peek() == ",":
                    p.next()
                    args.append(self.expr(p))
            p.expect(")")
            p.expect(";")
            self.w(self.call(tok, args))
            return
        if _IDENT.match(tok):
            name = p.next()
            op = p.next()
            if op == "++":
                p.expect(";")
                self.w(f"{self.name(name)} += 1")
                return
            if op == "--":
                p.expect(";")
                self.w(f"{self.name(name)} -= 1")
                return
            if op != "=":
                raise SyntaxError(f"expected '=' after {name}, got {op}")
            e = self.expr(p)
            p.expect(";")
            self.w(f"{self.name(name)} = {e}")
            return
        raise SyntaxError(f"unhandled statement start {tok!r}")

    def switch(self, p: P, sel: str):
        syn = f"_sw{self.n_syn}"
        self.n_syn += 1
        p.expect("{")
        self.w("try:")
        self.depth += 1
        self.breakable.append(syn)
        first = True
        while p.peek() == "case":
            p.next()
            val = p.next()
            p.expect(":")
            kw = "if" if first else "elif"
            first = False
            self.w(f"{kw} {sel} == {val}:")
            self.depth += 1
            wrote = False
            while p.peek() not in ("case", "}"):
                self.stmt(p)
                wrote = True
            if not wrote:
                self.w("pass")
            self.depth -= 1
        p.expect("}")
        self.breakable.pop()
        self.depth -= 1
        self.w("except _Br as e:")
        self.w(f"    if e.lab != {syn!r}: raise")


def transpile_class(path: str, cls: str) -> str:
    src = strip_comments(open(path, encoding="utf-8").read())
    amongs = parse_amongs(src)
    groups = parse_groupings(src)
    fields = parse_fields(src)

    out = [f"class {cls}(SnowballProgram):"]
    for name, rows in amongs.items():
        out.append(f"    {name} = (")
        for s, si, res, meth in rows:
            mref = f"{meth!r}" if meth else "None"
            out.append(f"        ({s!r}, {si}, {res}, {mref}),")
        out.append("    )")
    for name, vals in groups.items():
        out.append(f"    {name} = {tuple(vals)!r}")
    out.append("")
    out.append("    def __init__(self):")
    out.append("        super().__init__()")
    for f in fields:
        init = '""' if f.startswith("S_") else (
            "False" if f.startswith("B_") else "0")
        out.append(f"        self.{f} = {init}")
    if not fields:
        out.append("        pass")
    out.append("")

    for m in re.finditer(
            r"(?:private|public)\s+boolean\s+(r_\w+|stem)\s*\(\s*\)\s*\{",
            src):
        name = m.group(1)
        # find matching close brace
        i = m.end()
        depth = 1
        while depth:
            if src[i] == "{":
                depth += 1
            elif src[i] == "}":
                depth -= 1
            i += 1
        body = src[m.end():i - 1]
        fn = Fn(fields, cls)
        fn.depth = 2
        p = P(tokens(body))
        wrote = False
        while p.peek() is not None:
            fn.stmt(p)
            wrote = True
        out.append(f"    def {name}(self):")
        out.extend(fn.lines if wrote else ["        pass"])
        # Java: falling off the end of a boolean method can't happen in
        # generated code except via final return; the stem() methods
        # end with 'return true;' — but r_ helpers may fall through
        # only after a final return, so no implicit return needed.
        out.append("")
    return "\n".join(out)


def main():
    names = sorted(f for f in os.listdir(EXT) if f.endswith("Stemmer.java"))
    parts = [
        '"""Snowball stemmer family — GENERATED by '
        "tools/snowball_transpile.py from the reference's "
        "machine-generated org/tartarus/snowball/ext classes (which the "
        "Snowball compiler emits from the published snowballstem.org "
        "algorithm scripts). Do not edit by hand; regenerate with the "
        "tool. Each class is vocabulary-duel-gated over the reference's "
        'own TestSnowballVocabData.zip in tests/test_snowball.py."""\n',
        "from lucene_solr_spark.functions.snowball_runtime import (",
        "    SnowballProgram,",
        "    _Br,",
        "    _Ct,",
        ")",
        "",
        "",
    ]
    classes = []
    for fname in names:
        cls = fname[:-5]  # strip .java
        parts.append(transpile_class(os.path.join(EXT, fname), cls))
        parts.append("")
        classes.append(cls)
    parts.append("SNOWBALL_CLASSES = {")
    for cls in classes:
        key = cls.replace("Stemmer", "").lower()
        parts.append(f"    {key!r}: {cls},")
    parts.append("}")
    with open(OUT, "w", encoding="utf-8") as f:
        f.write("\n".join(parts) + "\n")
    print(f"wrote {OUT}: {len(classes)} stemmers")


if __name__ == "__main__":
    sys.exit(main())
