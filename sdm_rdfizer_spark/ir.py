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
    view: "LogicalView | None" = None

    def cache_key(self) -> tuple:
        return (self.source, self.fmt, self.iterator, self.table, self.query,
                self.delimiter, self.view.view_id if self.view else None)


@dataclass
class ViewField:
    """RML-LV field (reference: TriplesMap.py:194-201 ViewSource, parsed
    at semantify.py:2012-2060). ``kind`` ∈ reference|template|constant|
    iterator; iterator fields carry nested sub-fields."""

    name: str
    kind: str
    value: str | None = None
    iterator: str | None = None
    fields: "list[ViewField]" = field(default_factory=list)


@dataclass
class ViewJoin:
    """rml:innerJoin / rml:leftJoin between views (semantify.py:2086-2133):
    equality condition + the parent fields surfaced under new names."""

    kind: str                     # inner | left
    parent: "LogicalView"
    child_key: str                # reference or {template}
    parent_key: str
    fields: list[tuple] = field(default_factory=list)   # (new_name, parent_field)


@dataclass
class LogicalView:
    """An RML logical view: projection/flatten/join over a base source or
    another view (reference: lv_functions.py:271-551 view_projection)."""

    view_id: str
    base_source: "LogicalSource | None" = None
    base_view: "LogicalView | None" = None
    fields: list[ViewField] = field(default_factory=list)
    joins: list[ViewJoin] = field(default_factory=list)


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
    # RML-IO logical target ids (reference: semantify.py:2204-2208) —
    # triples built with this term map are also written to these targets
    targets: list[str] = field(default_factory=list)


@dataclass(frozen=True)
class LogicalTarget:
    """RML-IO output target (reference parse semantify.py:2204-2208,
    execution `logical_dump` semantify.py:10013-10088): a file path plus
    serialization / compression / encoding post-passes."""

    target_id: str
    path: str
    serialization: str | None = None   # ntriples|turtle|jsonld|rdfjson|rdfxml|n3
    compression: str | None = None     # gzip|zip|targz|tarxz
    encoding: str | None = None        # utf-8 | utf-16


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
    return_iri: str | None = None


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
