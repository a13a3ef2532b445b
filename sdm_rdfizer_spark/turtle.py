"""Minimal driver-side Turtle parser.

RML mapping documents are small (KB–MB), so parsing stays on the driver.
This replaces the reference's use of rdflib for mapping-document parsing
(reference: rdfizer/rdfizer/semantify.py:1861-1868 parses the mapping with
rdflib and then runs SPARQL over it; we parse Turtle ourselves and expose a
tiny triple-pattern query API instead).

Supported Turtle subset (sufficient for RML/R2RML mapping documents):
  @prefix / @base (and SPARQL-style PREFIX / BASE), IRIs, prefixed names,
  blank nodes ([ ... ] property lists, _:labels), literals (quoted strings
  with ``^^dt`` / ``@lang``, numbers, booleans), ``a``, object lists ``,``,
  predicate lists ``;``, RDF collections ``( ... )``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


class IRI(str):
    """An absolute IRI term."""

    __slots__ = ()

    def __repr__(self) -> str:  # pragma: no cover
        return f"<{str(self)}>"


class BNode(str):
    """A blank-node term (the string is the label)."""

    __slots__ = ()

    def __repr__(self) -> str:  # pragma: no cover
        return f"_:{str(self)}"


@dataclass(frozen=True)
class Literal:
    value: str
    datatype: str | None = None
    lang: str | None = None

    def __str__(self) -> str:
        return self.value


Term = "IRI | BNode | Literal"

_TOKEN_RE = re.compile(
    r"""
      (?P<comment>\#[^\n]*)
    | (?P<iriref><[^<>"{}|^`\\\s]*>)
    | (?P<string>\"\"\"(?:[^"\\]|\\.|\"(?!\"\"))*\"\"\"|'''(?:[^'\\]|\\.|'(?!''))*'''|\"(?:[^"\\\n]|\\.)*\"|'(?:[^'\\\n]|\\.)*')
    | (?P<keyword>@prefix|@base|(?i:PREFIX|BASE)(?=\s)|\ba\b|\btrue\b|\bfalse\b)
    | (?P<langtag>@[a-zA-Z]+(?:-[a-zA-Z0-9]+)*)
    | (?P<dtype_sep>\^\^)
    | (?P<pname>[A-Za-z0-9_][A-Za-z0-9_.\-]*?:[A-Za-z0-9_][A-Za-z0-9_.\-\/#%]*|[A-Za-z0-9_][A-Za-z0-9_.\-]*?:|:[A-Za-z0-9_][A-Za-z0-9_.\-\/#%]*)
    | (?P<bnode_label>_:[A-Za-z0-9_][A-Za-z0-9_.\-]*)
    | (?P<number>[+-]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
    | (?P<punct>[\[\]();,.])
    | (?P<ws>\s+)
    """,
    re.VERBOSE,
)

_ESCAPES = {
    "t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}


def _unescape(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            nxt = s[i + 1]
            if nxt == "u":
                out.append(chr(int(s[i + 2 : i + 6], 16)))
                i += 6
                continue
            if nxt == "U":
                out.append(chr(int(s[i + 2 : i + 10], 16)))
                i += 10
                continue
            if nxt in _ESCAPES:
                out.append(_ESCAPES[nxt])
                i += 2
                continue
        out.append(c)
        i += 1
    return "".join(out)


class TurtleParseError(ValueError):
    pass


class _Tokens:
    def __init__(self, text: str):
        self.toks: list[tuple[str, str]] = []
        pos = 0
        while pos < len(text):
            m = _TOKEN_RE.match(text, pos)
            if m is None:
                raise TurtleParseError(f"lex error at {text[pos:pos+40]!r}")
            kind = m.lastgroup
            if kind not in ("ws", "comment"):
                self.toks.append((kind, m.group()))
            pos = m.end()
        self.i = 0

    def peek(self) -> tuple[str, str] | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> tuple[str, str]:
        t = self.peek()
        if t is None:
            raise TurtleParseError("unexpected EOF")
        self.i += 1
        return t

    def expect_punct(self, ch: str) -> None:
        kind, val = self.next()
        if kind != "punct" or val != ch:
            raise TurtleParseError(f"expected {ch!r}, got {val!r}")


class Graph:
    """A tiny in-memory triple store with pattern matching."""

    def __init__(self) -> None:
        self.triples: list[tuple] = []
        self.base: str | None = None
        self.prefixes: dict[str, str] = {}
        self._bn = 0

    # -- construction -------------------------------------------------
    def add(self, s, p, o) -> None:
        self.triples.append((s, p, o))

    def new_bnode(self) -> BNode:
        self._bn += 1
        return BNode(f"gen{self._bn}")

    # -- query --------------------------------------------------------
    def match(self, s=None, p=None, o=None):
        for ts, tp, to in self.triples:
            if (s is None or ts == s) and (p is None or tp == p) and (o is None or to == o):
                yield (ts, tp, to)

    def objects(self, s, p) -> list:
        return [o for _, _, o in self.match(s, p, None)]

    def value(self, s, p, default=None):
        for _, _, o in self.match(s, p, None):
            return o
        return default

    def subjects(self, p=None, o=None) -> list:
        seen, out = set(), []
        for ts, _, _ in self.match(None, p, o):
            if ts not in seen:
                seen.add(ts)
                out.append(ts)
        return out

    def collection_items(self, head) -> list:
        """Walk an rdf:List (first/rest/nil) into a Python list."""
        items = []
        nil = IRI(RDF + "nil")
        while head is not None and head != nil:
            first = self.value(head, IRI(RDF + "first"))
            if first is None:
                break
            items.append(first)
            head = self.value(head, IRI(RDF + "rest"))
        return items


def parse(text: str) -> Graph:
    g = Graph()
    toks = _Tokens(text)

    def resolve_iri(raw: str) -> IRI:
        iri = _unescape(raw[1:-1])
        if g.base and not re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*:", iri):
            return IRI(g.base + iri)
        return IRI(iri)

    def resolve_pname(raw: str) -> IRI:
        pfx, _, local = raw.partition(":")
        if pfx not in g.prefixes:
            raise TurtleParseError(f"undefined prefix {pfx!r}:")
        return IRI(g.prefixes[pfx] + local)

    def parse_object():
        kind, val = toks.next()
        if kind == "iriref":
            return resolve_iri(val)
        if kind == "pname":
            return resolve_pname(val)
        if kind == "bnode_label":
            return BNode(val[2:])
        if kind == "keyword" and val == "a":
            return IRI(RDF + "type")
        if kind == "keyword" and val in ("true", "false"):
            return Literal(val, datatype="http://www.w3.org/2001/XMLSchema#boolean")
        if kind == "number":
            if "e" in val.lower() or "." in val:
                dt = "http://www.w3.org/2001/XMLSchema#double" if "e" in val.lower() else "http://www.w3.org/2001/XMLSchema#decimal"
            else:
                dt = "http://www.w3.org/2001/XMLSchema#integer"
            return Literal(val, datatype=dt)
        if kind == "string":
            if val.startswith(('"""', "'''")):
                body = val[3:-3]
            else:
                body = val[1:-1]
            value = _unescape(body)
            nxt = toks.peek()
            if nxt and nxt[0] == "langtag":
                toks.next()
                return Literal(value, lang=nxt[1][1:])
            if nxt and nxt[0] == "dtype_sep":
                toks.next()
                dkind, dval = toks.next()
                if dkind == "iriref":
                    dt = resolve_iri(dval)
                elif dkind == "pname":
                    dt = resolve_pname(dval)
                else:
                    raise TurtleParseError("bad datatype")
                return Literal(value, datatype=str(dt))
            return Literal(value)
        if kind == "punct" and val == "[":
            node = g.new_bnode()
            nxt = toks.peek()
            if not (nxt and nxt[0] == "punct" and nxt[1] == "]"):
                parse_predicate_object_list(node)
            toks.expect_punct("]")
            return node
        if kind == "punct" and val == "(":
            items = []
            while True:
                nxt = toks.peek()
                if nxt and nxt[0] == "punct" and nxt[1] == ")":
                    toks.next()
                    break
                items.append(parse_object())
            if not items:
                return IRI(RDF + "nil")
            head = g.new_bnode()
            cur = head
            for i, item in enumerate(items):
                g.add(cur, IRI(RDF + "first"), item)
                if i == len(items) - 1:
                    g.add(cur, IRI(RDF + "rest"), IRI(RDF + "nil"))
                else:
                    nxt_node = g.new_bnode()
                    g.add(cur, IRI(RDF + "rest"), nxt_node)
                    cur = nxt_node
            return head
        raise TurtleParseError(f"unexpected token {val!r} in object position")

    def parse_predicate_object_list(subject) -> None:
        while True:
            nxt = toks.peek()
            if nxt is None or (nxt[0] == "punct" and nxt[1] in ".]"):
                return
            kind, val = toks.next()
            if kind == "iriref":
                pred = resolve_iri(val)
            elif kind == "pname":
                pred = resolve_pname(val)
            elif kind == "keyword" and val == "a":
                pred = IRI(RDF + "type")
            else:
                raise TurtleParseError(f"unexpected predicate token {val!r}")
            while True:
                g.add(subject, pred, parse_object())
                nxt = toks.peek()
                if nxt and nxt[0] == "punct" and nxt[1] == ",":
                    toks.next()
                    continue
                break
            nxt = toks.peek()
            if nxt and nxt[0] == "punct" and nxt[1] == ";":
                toks.next()
                # tolerate trailing ';' before '.' or ']'
                continue
            return

    while toks.peek() is not None:
        kind, val = toks.next()
        if kind == "keyword" and val in ("@prefix",) or (kind == "keyword" and val.lower() == "prefix"):
            pkind, pval = toks.next()
            if pkind != "pname":
                raise TurtleParseError("bad @prefix")
            ikind, ival = toks.next()
            if ikind != "iriref":
                raise TurtleParseError("bad @prefix IRI")
            g.prefixes[pval[:-1]] = _unescape(ival[1:-1])
            if val == "@prefix":
                toks.expect_punct(".")
            continue
        if kind == "keyword" and (val == "@base" or val.lower() == "base"):
            ikind, ival = toks.next()
            if ikind != "iriref":
                raise TurtleParseError("bad @base IRI")
            g.base = _unescape(ival[1:-1])
            if val == "@base":
                toks.expect_punct(".")
            continue
        # subject
        if kind == "iriref":
            subj = resolve_iri(val)
        elif kind == "pname":
            subj = resolve_pname(val)
        elif kind == "bnode_label":
            subj = BNode(val[2:])
        elif kind == "punct" and val == "[":
            subj = g.new_bnode()
            nxt = toks.peek()
            if not (nxt and nxt[0] == "punct" and nxt[1] == "]"):
                parse_predicate_object_list(subj)
            toks.expect_punct("]")
        else:
            raise TurtleParseError(f"unexpected token {val!r} in subject position")
        parse_predicate_object_list(subj)
        toks.expect_punct(".")

    return g
