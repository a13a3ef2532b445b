"""Logical IR for mapping rules — the unit the compiler consumes.

Mirrors the capability surface of the reference data model
(reference: rdfizer/rdfizer/triples_map/TriplesMap.py:3-201) but is a plain
frozen-ish dataclass IR designed to be compiled into a Spark DataFrame plan,
not interpreted row-at-a-time.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# term map kinds
TEMPLATE = "template"
REFERENCE = "reference"
CONSTANT = "constant"
FUNCTION = "function"
PARENT = "parent_triples_map"
QUOTED = "quoted_triples_map"
GATHER = "gather"

# term types
TT_IRI = "IRI"
TT_BLANKNODE = "BlankNode"
TT_LITERAL = "Literal"
TT_UNSAFE_IRI = "UnsafeIRI"


@dataclass
class LogicalSource:
    """Where the rows come from (reference: TriplesMap.py:28-39).

    ``source`` is a path/URL/table/connection descriptor; ``fmt`` one of
    csv/tsv/json/xml/parquet/jdbc/sql/view; ``iterator`` a JSONPath-ish or
    XPath iterator; ``query``/``table`` for database-backed sources.
    """

    source: str
    fmt: str = "csv"
    iterator: str | None = None
    table: str | None = None
    query: str | None = None
    delimiter: str | None = None
    options: dict = field(default_factory=dict)

    def cache_key(self) -> tuple:
        return (self.source, self.fmt, self.iterator, self.table, self.query, self.delimiter)


@dataclass
class JoinCondition:
    """Equality join keys; multi-column allowed (reference: TriplesMap.py:166-168)."""

    child: list[str]
    parent: list[str]


@dataclass
class TermMap:
    """One of template / reference / constant / function-valued term.

    ``value`` is the template string, the column reference, the constant
    term, or the function-map id respectively.
    """

    kind: str
    value: str
    term_type: str | None = None      # IRI / BlankNode / Literal / UnsafeIRI
    datatype: str | None = None       # constant datatype IRI
    datatype_map: TermMap | None = None
    language: str | None = None
    language_map: TermMap | None = None
    # joins (object position): parent triples-map id + join condition
    parent_tm: str | None = None
    join: JoinCondition | None = None
    # RML-CC gather spec
    gather: "GatherMap | None" = None
    # constant term is an IRI (vs literal)
    constant_is_iri: bool = False


@dataclass
class SubjectMap:
    term: TermMap
    rdf_classes: list[str] = field(default_factory=list)
    graphs: list[TermMap] = field(default_factory=list)
    condition: str | None = None      # function-map id used as row filter


@dataclass
class PredicateObjectMap:
    predicate: TermMap
    obj: TermMap
    graphs: list[TermMap] = field(default_factory=list)


@dataclass
class FunctionMap:
    """FnO/FNML function application (reference: TriplesMap.py:174-180).

    ``parameters`` maps parameter IRI → a typed value descriptor:
    {"type": "constant"|"reference"|"template"|"function", "value": str}.
    """

    func_map_id: str
    name: str
    parameters: dict = field(default_factory=dict)


@dataclass
class GatherMap:
    """RML-CC collection/container spec (reference: TriplesMap.py:182-192)."""

    gather: list[TermMap] = field(default_factory=list)
    gather_as: str = "http://www.w3.org/1999/02/22-rdf-syntax-ns#List"
    strategy: str = "append"          # append | cartesian
    allow_empty: bool = False


@dataclass
class TriplesMap:
    tm_id: str
    source: LogicalSource
    subject: SubjectMap
    poms: list[PredicateObjectMap] = field(default_factory=list)
    func_maps: dict[str, FunctionMap] = field(default_factory=dict)
    kind: str = "TriplesMap"          # TriplesMap | NonAssertedTriplesMap
