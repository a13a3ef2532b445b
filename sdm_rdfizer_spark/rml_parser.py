"""RML / R2RML mapping-document → IR extractor.

The reference extracts TriplesMap objects by running SPARQL over the
rdflib-parsed mapping (reference: rdfizer/rdfizer/semantify.py:2135-2483 for
the new RML formulation, semantify.py:2486-2676 for legacy RML/R2RML, FNML
at semantify.py:1871-1900, RML-CC at semantify.py:1901-2011). We walk our
own parsed Turtle graph instead; both the legacy vocabularies
(rr:/rml:/ql:/fnml:) and the unified ``http://w3id.org/rml/`` namespace are
accepted.
"""

from __future__ import annotations

import os
import re

from .ir import (
    CONSTANT, FUNCTION, GATHER, PARENT, QUOTED, REFERENCE, TEMPLATE,
    FunctionMap, GatherMap, JoinCondition, LogicalSource, PredicateObjectMap,
    SubjectMap, TermMap, TriplesMap,
)
from .turtle import BNode, Graph, IRI, Literal, RDF, parse

RR = "http://www.w3.org/ns/r2rml#"
RML = "http://semweb.mmlab.be/ns/rml#"
QL = "http://semweb.mmlab.be/ns/ql#"
RML2 = "http://w3id.org/rml/"          # unified "new RML" namespace
FNML = "http://semweb.mmlab.be/ns/fnml#"
FNO = "https://w3id.org/function/ontology#"
CSVW = "http://www.w3.org/ns/csvw#"
DCAT = "http://www.w3.org/ns/dcat#"
VOID = "http://rdfs.org/ns/void#"
SD = "http://www.w3.org/ns/sparql-service-description#"
HCTL = "https://www.w3.org/2019/wot/hypermedia#"
D2RQ = "http://www.wiwiss.fu-berlin.de/suhl/bizer/D2RQ/0.1#"

_NS = (RML2, RR, RML, FNML, FNO)


def _vals(g: Graph, s, *local_names):
    """All objects of s under any namespace variant of the given local names."""
    out = []
    for ln in local_names:
        for ns in _NS:
            out.extend(g.objects(s, IRI(ns + ln)))
    return out


def _val(g: Graph, s, *local_names, default=None):
    v = _vals(g, s, *local_names)
    return v[0] if v else default


def _txt(v) -> str | None:
    if v is None:
        return None
    return str(v)


_FORMULATIONS = {
    "CSV": "csv", "TSV": "tsv", "JSONPath": "json", "XPath": "xml",
    "Parquet": "parquet", "SQL2008": "sql", "SPARQL": "sparql",
}


def _parse_view_field(g: Graph, fnode) -> "ViewField":
    from .ir import ViewField

    name = _txt(_val(g, fnode, "fieldName")) or ""
    iterator = _txt(_val(g, fnode, "iterator"))
    if iterator is not None:
        subs = [_parse_view_field(g, f) for f in _vals(g, fnode, "field")]
        return ViewField(name=name, kind="iterator", iterator=iterator, fields=subs)
    ref = _txt(_val(g, fnode, "reference"))
    if ref is not None:
        return ViewField(name=name, kind="reference", value=ref)
    tpl = _txt(_val(g, fnode, "template"))
    if tpl is not None:
        return ViewField(name=name, kind="template", value=tpl)
    const = _val(g, fnode, "constant")
    return ViewField(name=name, kind="constant",
                     value=str(const) if const is not None else None)


def _parse_view(g: Graph, node, base_dir: str | None) -> "LogicalView":
    """A logical-view node: rml:viewOn (base source or nested view) +
    rml:field list + rml:innerJoin/rml:leftJoin (reference query shape:
    semantify.py:2012-2133)."""
    from .ir import LogicalView, ViewJoin

    base_node = _val(g, node, "viewOn")
    base_source = base_view = None
    if base_node is not None:
        if _val(g, base_node, "viewOn") is not None or _vals(g, base_node, "field"):
            base_view = _parse_view(g, base_node, base_dir)
        else:
            base_source = _parse_source_descriptor(g, base_node, base_dir)
    fields = [_parse_view_field(g, f) for f in _vals(g, node, "field")]
    joins = []
    for kind, prop in (("inner", "innerJoin"), ("left", "leftJoin")):
        for jn in _vals(g, node, prop):
            parent_node = _val(g, jn, "parentLogicalView")
            if parent_node is None:
                continue
            parent = _parse_view(g, parent_node, base_dir)
            jc = _val(g, jn, "joinCondition")
            child_key = parent_key = None
            if jc is not None:
                child_key = _txt(_val(g, jc, "child"))
                parent_key = _txt(_val(g, jc, "parent"))
                if child_key is None:
                    cm = _val(g, jc, "childMap")
                    child_key = _txt(_val(g, cm, "reference", "template")) if cm is not None else None
                if parent_key is None:
                    pm = _val(g, jc, "parentMap")
                    parent_key = _txt(_val(g, pm, "reference", "template")) if pm is not None else None
            jfields = []
            for f in _vals(g, jn, "field"):
                new_name = _txt(_val(g, f, "fieldName"))
                src = _txt(_val(g, f, "reference", "template", "constant"))
                if new_name and src:
                    jfields.append((new_name, src))
            joins.append(ViewJoin(kind=kind, parent=parent,
                                  child_key=child_key or "",
                                  parent_key=parent_key or "",
                                  fields=jfields))
    return LogicalView(view_id=str(node), base_source=base_source,
                       base_view=base_view, fields=fields, joins=joins)


def _parse_source_descriptor(g: Graph, ls_node, base_dir: str | None) -> LogicalSource:
    """The plain (non-view) part of a logical-source node."""
    return _parse_source(g, ls_node, base_dir)


def _parse_source(g: Graph, ls_node, base_dir: str | None) -> LogicalSource:
    if _val(g, ls_node, "viewOn") is not None:
        view = _parse_view(g, ls_node, base_dir)
        return LogicalSource(source=f"view:{ls_node}", fmt="view", view=view)
    src_node = _val(g, ls_node, "source")
    source = None
    delimiter = None
    options: dict = {}
    if isinstance(src_node, Literal):
        source = str(src_node)
    elif src_node is not None:
        # structured source descriptors (reference: semantify.py:2148-2195):
        # rml:path, CSVW url, DCAT downloadURL, VoID dataDump, SPARQL-SD
        # endpoint, WoT-TD hypermedia target, D2RQ jdbc descriptor
        for prop in ((RML2, "path"), (RML2, "root"), (RML, "path"),
                     (CSVW, "url"), (DCAT, "downloadURL"), (VOID, "dataDump"),
                     (SD, "endpoint"), (HCTL, "hasTarget"),
                     (D2RQ, "jdbcDSN")):
            v = g.value(src_node, IRI(prop[0] + prop[1]))
            if v is not None and prop[1] != "root":
                source = str(v)
                break
        dialect = g.value(src_node, IRI(CSVW + "dialect"))
        if dialect is not None:
            d = g.value(dialect, IRI(CSVW + "delimiter"))
            if d is not None:
                delimiter = str(d)
        # D2RQ connection credentials (reference: semantify.py:2169-2177)
        # → Spark JDBC reader options
        for d2rq_prop, opt in (("username", "user"), ("password", "password"),
                               ("jdbcDriver", "driver")):
            v = g.value(src_node, IRI(D2RQ + d2rq_prop))
            if v is not None:
                options[opt] = str(v)
    fmt_iri = _txt(_val(g, ls_node, "referenceFormulation"))
    fmt = "csv"
    if fmt_iri:
        local = fmt_iri.rsplit("/", 1)[-1].rsplit("#", 1)[-1]
        fmt = _FORMULATIONS.get(local, local.lower())
    iterator = _txt(_val(g, ls_node, "iterator"))
    table = _txt(_val(g, ls_node, "tableName"))
    query = _txt(_val(g, ls_node, "query", "sqlQuery"))
    if (source and base_dir and "://" not in source
            and not source.lower().startswith("jdbc:")
            and not os.path.isabs(source)):
        source = os.path.join(base_dir, source)
    # infer format from extension when unspecified
    if fmt == "csv" and source:
        low = source.lower()
        if low.endswith(".parquet"):
            fmt = "parquet"
        elif low.endswith(".json"):
            fmt = "json"
        elif low.endswith(".tsv"):
            fmt = "tsv"
        elif low.endswith(".xml"):
            fmt = "xml"
        elif low.endswith(".nt"):
            fmt = "ntriples"
    if source and source.lower().startswith("jdbc:") and fmt not in ("sql", "jdbc"):
        fmt = "jdbc"
    return LogicalSource(source=source or "", fmt=fmt, iterator=iterator,
                         table=table, query=query, delimiter=delimiter,
                         options=options)


def _term_type(v) -> str | None:
    t = _txt(v)
    if t is None:
        return None
    local = t.rsplit("#", 1)[-1].rsplit("/", 1)[-1]
    return local


def _parse_term_map(g: Graph, node, pos: str) -> TermMap:
    """Parse one term map bnode (subject/predicate/object/graph position);
    attaches RML-IO logical-target ids (reference: semantify.py:2204-2208)."""
    tm = _parse_term_map_inner(g, node, pos)
    tm.targets = [str(t) for t in _vals(g, node, "logicalTarget")]
    return tm


def _parse_term_map_inner(g: Graph, node, pos: str) -> TermMap:
    template = _txt(_val(g, node, "template"))
    reference = _txt(_val(g, node, "reference", "column"))
    constant = _val(g, node, "constant")
    parent_tm = _val(g, node, "parentTriplesMap")
    quoted_tm = _val(g, node, "quotedTriplesMap")
    fn = _val(g, node, "functionValue", "functionExecution")
    gather = _vals(g, node, "gather")

    tt = _term_type(_val(g, node, "termType"))
    datatype = _txt(_val(g, node, "datatype"))
    language = _txt(_val(g, node, "language"))
    # R2RML: rr:language MUST be a valid BCP47 tag (published conformance
    # case RMLTC0015b expects the engine to reject e.g. "english-USA-")
    if language is not None and not re.fullmatch(
            r"[A-Za-z]{1,8}(-[A-Za-z0-9]{1,8})*", language):
        raise ValueError(
            f"invalid rr:language tag {language!r}: must be a well-formed "
            "BCP47 language tag")
    dt_map_node = _val(g, node, "datatypeMap")
    lang_map_node = _val(g, node, "languageMap")
    dt_map = _parse_term_map(g, dt_map_node, "datatype") if dt_map_node is not None else None
    lang_map = _parse_term_map(g, lang_map_node, "language") if lang_map_node is not None else None

    if gather:
        items = []
        for head in gather:
            for item in g.collection_items(head):
                items.append(_parse_term_map(g, item, "object"))
        gather_as = _txt(_val(g, node, "gatherAs")) or (RDF + "List")
        strategy_iri = _txt(_val(g, node, "strategy"))
        strategy = "cartesian" if (strategy_iri and "cartesian" in strategy_iri.lower()) else "append"
        allow_empty = str(_val(g, node, "allowEmptyListAndContainer", default="false")).lower() == "true"
        gm = GatherMap(gather=items, gather_as=gather_as, strategy=strategy, allow_empty=allow_empty)
        base = TermMap(kind=GATHER, value="", term_type=tt, gather=gm)
        base.template_for_gather = template  # subject of the gathered collection, if any
        return base

    if fn is not None:
        return TermMap(kind=FUNCTION, value=str(fn), term_type=tt,
                       datatype=datatype, datatype_map=dt_map,
                       language=language, language_map=lang_map)
    if parent_tm is not None or quoted_tm is not None:
        children, parents = [], []
        for jc in _vals(g, node, "joinCondition"):
            # query 'child'/'parent' literals first; a combined query would
            # return the childMap/parentMap bnode label and shadow the
            # nested-reference fallback below
            c = _txt(_val(g, jc, "child"))
            p = _txt(_val(g, jc, "parent"))
            if c is None:
                cm = _val(g, jc, "childMap")
                c = _txt(_val(g, cm, "reference", "template")) if cm is not None else None
            if p is None:
                pm = _val(g, jc, "parentMap")
                p = _txt(_val(g, pm, "reference", "template")) if pm is not None else None
            if c is not None and p is not None:
                children.append(c)
                parents.append(p)
        join = JoinCondition(child=children, parent=parents) if children else None
        if quoted_tm is not None:
            # RML-star quoted triples map (reference: semantify.py:2209-2215)
            return TermMap(kind=QUOTED, value=str(quoted_tm),
                           parent_tm=str(quoted_tm), join=join)
        return TermMap(kind=PARENT, value=str(parent_tm), parent_tm=str(parent_tm), join=join)
    if template is not None:
        return TermMap(kind=TEMPLATE, value=template, term_type=tt,
                       datatype=datatype, datatype_map=dt_map,
                       language=language, language_map=lang_map)
    if reference is not None:
        return TermMap(kind=REFERENCE, value=reference, term_type=tt,
                       datatype=datatype, datatype_map=dt_map,
                       language=language, language_map=lang_map)
    if constant is not None:
        is_iri = isinstance(constant, IRI)
        return TermMap(kind=CONSTANT, value=str(constant), term_type=tt,
                       datatype=datatype, language=language, constant_is_iri=is_iri)
    # a bare IRI/literal used directly as a constant shortcut
    if isinstance(node, (IRI, Literal)):
        return TermMap(kind=CONSTANT, value=str(node), constant_is_iri=isinstance(node, IRI))
    raise ValueError(f"cannot interpret term map {node!r} in {pos} position")


def _parse_function_node(g: Graph, node) -> FunctionMap:
    """One fnml:functionValue / rml:functionExecution node → FunctionMap.

    Legacy FNML (fnml:functionValue): the node carries POMs — predicate
    fno:executes names the function, every other predicate is a parameter
    (reference: mapping_functions.py:106-199 interprets this shape).
    New RML-FNML: rml:function + rml:input [rml:parameter;
    rml:inputValue | rml:inputValueMap] (reference query:
    semantify.py:1871-1899).
    """
    name = None
    params: dict = {}

    # new-style
    fn = _val(g, node, "function")
    if fn is not None:
        name = str(fn)
    for inp in _vals(g, node, "input"):
        param = _txt(_val(g, inp, "parameter"))
        if param is None:
            continue
        const = _val(g, inp, "inputValue")
        if const is not None:
            params[param] = {"type": "constant", "value": str(const)}
            continue
        ivm = _val(g, inp, "inputValueMap")
        if ivm is not None:
            params[param] = _param_descriptor(g, ivm)

    # legacy-style: POMs on the functionValue node
    for pom in _vals(g, node, "predicateObjectMap"):
        preds = [str(x) for x in _vals(g, pom, "predicate")]
        oms = _vals(g, pom, "objectMap") + _vals(g, pom, "object")
        if not preds or not oms:
            continue
        pred = preds[0]
        om = oms[0]
        if pred == FNO + "executes" or pred.endswith("/executes"):
            if isinstance(om, (IRI, Literal)):
                name = str(om)
            else:
                name = _txt(_val(g, om, "constant")) or name
            continue
        if isinstance(om, (IRI, Literal)):
            params[pred] = {"type": "constant", "value": str(om)}
        else:
            params[pred] = _param_descriptor(g, om)

    ret = _txt(_val(g, node, "return", "returnMap"))
    fm = FunctionMap(func_map_id=str(node), name=name or "", parameters=params)
    fm.return_iri = ret
    return fm


def _param_descriptor(g: Graph, om) -> dict:
    nested = _val(g, om, "functionValue", "functionExecution")
    if nested is not None:
        return {"type": "function", "value": str(nested),
                "nested": _parse_function_node(g, nested)}
    ref = _txt(_val(g, om, "reference", "column"))
    if ref is not None:
        return {"type": "reference", "value": ref}
    tpl = _txt(_val(g, om, "template"))
    if tpl is not None:
        return {"type": "template", "value": tpl}
    const = _val(g, om, "constant")
    if const is not None:
        return {"type": "constant", "value": str(const)}
    return {"type": "constant", "value": str(om)}


def _parse_function_maps(g: Graph) -> dict[str, FunctionMap]:
    """All function descriptors in the mapping, keyed by node id."""
    out: dict[str, FunctionMap] = {}
    nodes = set()
    # "condition": a subject-map row filter may point at a function
    # descriptor that is referenced NOWHERE else (reference:
    # semantify.py:6383-6407) — collect those nodes too
    for prop in ("functionValue", "functionExecution", "condition"):
        for ns in _NS:
            for _, _, o in g.match(None, IRI(ns + prop), None):
                nodes.add(o)
    for node in nodes:
        fm = _parse_function_node(g, node)
        out[str(node)] = fm
    return out


def parse_mapping(text: str, base_dir: str | None = None) -> list[TriplesMap]:
    g = parse(text)
    return extract_triples_maps(g, base_dir)


def parse_mapping_file(path: str) -> list[TriplesMap]:
    with open(path, encoding="utf-8") as f:
        return parse_mapping(f.read(), base_dir=os.path.dirname(os.path.abspath(path)))


def extract_logical_targets(g: Graph, base_dir: str | None = None) -> dict:
    """All RML-IO logical-target descriptors in the document, by id.

    Shape (reference query semantify.py:2204-2208): ``?tm rml:logicalTarget
    ?out . ?out rml:target ?dump . ?dump rml:path ?file`` (or
    ``void:dataDump``), with optional rml:serialization / rml:compression /
    rml:encoding post-passes (executed at semantify.py:10013-10088)."""
    from .ir import LogicalTarget

    targets: dict[str, LogicalTarget] = {}
    for out in {o for s, p, o in g.match(None, None, None)
                if isinstance(p, IRI) and str(p).endswith("logicalTarget")}:
        tid = str(out)
        if tid in targets:
            continue
        dump = _val(g, out, "target")
        path = None
        if dump is not None:
            if isinstance(dump, Literal):
                path = str(dump)
            else:
                path = _txt(_val(g, dump, "path", "root"))
                if path is None:
                    v = g.value(dump, IRI(VOID + "dataDump"))
                    path = _txt(v)
        if path is None:
            continue
        if base_dir and "://" not in path and not os.path.isabs(path):
            path = os.path.join(base_dir, path)

        def _local(v):
            t = _txt(v)
            return t.rsplit("/", 1)[-1].rsplit("#", 1)[-1].lower() if t else None

        ser = _local(_val(g, out, "serialization"))
        if ser:
            ser = {"n-triples": "ntriples", "n-quads": "nquads",
                   "rdf_xml": "rdfxml", "json-ld": "jsonld"}.get(ser, ser)
        comp = _local(_val(g, out, "compression"))
        enc = _txt(_val(g, out, "encoding"))
        if enc:
            enc = enc.rsplit("/", 1)[-1].rsplit("#", 1)[-1]
        targets[tid] = LogicalTarget(target_id=tid, path=path,
                                     serialization=ser, compression=comp,
                                     encoding=enc)
    return targets


def extract_triples_maps(g: Graph, base_dir: str | None = None) -> list[TriplesMap]:
    tms: list[TriplesMap] = []
    tm_nodes = []
    seen = set()
    # anything with a logicalSource + subjectMap is a triples map
    for ln in ("logicalSource",):
        for ns in _NS:
            for s in g.subjects(IRI(ns + ln)):
                if s not in seen:
                    seen.add(s)
                    tm_nodes.append(s)
    for node in tm_nodes:
        ls_node = _val(g, node, "logicalSource")
        source = _parse_source(g, ls_node, base_dir)

        sm_node = _val(g, node, "subjectMap", "subject")
        if sm_node is None:
            continue
        if isinstance(sm_node, IRI) and not list(g.match(sm_node, None, None)):
            subject_term = TermMap(kind=CONSTANT, value=str(sm_node), constant_is_iri=True)
            classes, graphs, condition = [], [], None
        else:
            subject_term = _parse_term_map(g, sm_node, "subject")
            classes = [str(c) for c in _vals(g, sm_node, "class")]
            graphs = []
            for gm in _vals(g, sm_node, "graphMap"):
                graphs.append(_parse_term_map(g, gm, "graph"))
            for gc in _vals(g, sm_node, "graph"):
                graphs.append(TermMap(kind=CONSTANT, value=str(gc), constant_is_iri=True))
            condition = _txt(_val(g, sm_node, "condition"))
        sm = SubjectMap(term=subject_term, rdf_classes=classes, graphs=graphs, condition=condition)

        poms: list[PredicateObjectMap] = []
        for pom_node in _vals(g, node, "predicateObjectMap"):
            preds: list[TermMap] = []
            for p in _vals(g, pom_node, "predicate"):
                preds.append(TermMap(kind=CONSTANT, value=str(p), constant_is_iri=True))
            for pm in _vals(g, pom_node, "predicateMap"):
                preds.append(_parse_term_map(g, pm, "predicate"))
            objs: list[TermMap] = []
            for o in _vals(g, pom_node, "object"):
                objs.append(TermMap(kind=CONSTANT, value=str(o),
                                    constant_is_iri=isinstance(o, IRI),
                                    datatype=getattr(o, "datatype", None),
                                    language=getattr(o, "lang", None)))
            for om in _vals(g, pom_node, "objectMap"):
                objs.append(_parse_term_map(g, om, "object"))
            pgraphs = []
            for gm in _vals(g, pom_node, "graphMap"):
                pgraphs.append(_parse_term_map(g, gm, "graph"))
            for gc in _vals(g, pom_node, "graph"):
                pgraphs.append(TermMap(kind=CONSTANT, value=str(gc), constant_is_iri=True))
            for p in preds:
                for o in objs:
                    poms.append(PredicateObjectMap(predicate=p, obj=o, graphs=pgraphs))

        # mapping-rule dedup (reference remove_duplicate_po,
        # functions.py:2265-2280): drop POMs equal in predicate, object
        # value and decoration — each duplicate would re-emit the same
        # triples only for the global distinct to collapse later
        uniq, seen_pos = [], set()
        for pom in poms:
            o = pom.obj
            key = (
                pom.predicate.kind, pom.predicate.value, o.kind, o.value,
                o.term_type, o.language,
                o.language_map.value if o.language_map else None,
                o.datatype,
                o.datatype_map.value if o.datatype_map else None,
                o.parent_tm,
                tuple(o.join.child + o.join.parent) if o.join else None,
                tuple(str(gm.value) for gm in pom.graphs),
            )
            if o.kind == GATHER or key not in seen_pos:
                seen_pos.add(key)
                uniq.append(pom)
        poms = uniq

        kind = "TriplesMap"
        for t in g.objects(node, IRI(RDF + "type")):
            if "NonAssertedTriplesMap" in str(t):
                kind = "NonAssertedTriplesMap"
        tms.append(TriplesMap(tm_id=str(node), source=source, subject=sm,
                              poms=poms, func_maps=_parse_function_maps(g), kind=kind))
    return tms
