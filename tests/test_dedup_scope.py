"""Special-predicate dedup scoping (reference parity).

The reference keys its duplicate table (PTT) per predicate with inner key
(subject, object) — the graph term never participates — EXCEPT for the
four "general predicates" (rdfs:subClassOf, owl:sameAs, rdfs:seeAlso,
rdfs:subPropertyOf; rdfizer/rdfizer/semantify.py:105-109), whose table is
scoped per (predicate, object-map RULE value) (the dedup gates at
semantify.py:4651-4677): the same s/p/o emitted by two DIFFERENT
object-map rules is written twice, while duplicates from the same rule
collapse. ``dedup_scope="reference"`` reproduces that keying.
"""

import pytest

from sdm_rdfizer_spark import materialize

OWL_SAMEAS = "<http://www.w3.org/2002/07/owl#sameAs>"
EX_KIND = "<http://example.com/vocab/kind>"


@pytest.fixture(scope="module")
def csv_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("dedup_scope")
    # duplicate-heavy: every row repeated, and `alias` renders the same
    # IRI the constant rule emits
    (d / "data.csv").write_text(
        "tid,kind,alias\n"
        "T1,coding,http://example.com/canon/X\n"
        "T1,coding,http://example.com/canon/X\n"
        "T2,coding,http://example.com/canon/X\n"
    )
    return d


def _mapping(d):
    # two sameAs rules for the same subjects: a constant object and a
    # template that renders the SAME IRI; plus a normal predicate
    # duplicated across rows and emitted into a named graph
    return f"""
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix rml: <http://semweb.mmlab.be/ns/rml#> .
@prefix ql: <http://semweb.mmlab.be/ns/ql#> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix ex: <http://example.com/vocab/> .
<#M> a rr:TriplesMap;
  rml:logicalSource [ rml:source "{d}/data.csv"; rml:referenceFormulation ql:CSV ];
  rr:subjectMap [ rr:template "http://example.com/t/{{tid}}" ];
  rr:predicateObjectMap [ rr:predicate ex:kind; rr:objectMap [ rml:reference "kind" ] ];
  rr:predicateObjectMap [ rr:predicate owl:sameAs;
    rr:objectMap [ rr:constant <http://example.com/canon/X> ] ];
  rr:predicateObjectMap [ rr:predicate owl:sameAs;
    rr:objectMap [ rr:template "{{alias}}"; rr:termType rr:IRI ] ] .
"""


def _graph_mapping(d):
    return f"""
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix rml: <http://semweb.mmlab.be/ns/rml#> .
@prefix ql: <http://semweb.mmlab.be/ns/ql#> .
@prefix ex: <http://example.com/vocab/> .
<#M> a rr:TriplesMap;
  rml:logicalSource [ rml:source "{d}/data.csv"; rml:referenceFormulation ql:CSV ];
  rr:subjectMap [ rr:template "http://example.com/t/{{tid}}";
                  rr:graphMap [ rr:constant ex:g1 ];
                  rr:graphMap [ rr:constant ex:g2 ] ];
  rr:predicateObjectMap [ rr:predicate ex:kind; rr:objectMap [ rml:reference "kind" ] ] .
"""


def test_reference_scope_keeps_cross_rule_duplicates(spark, csv_dir):
    rows = materialize(spark, _mapping(csv_dir),
                       dedup_scope="reference").collect()
    sameas = [(r.s, r.o) for r in rows if r.p == OWL_SAMEAS]
    # T1: one from the constant rule + one from the template rule (the
    # reference writes both — separate PTT tables); T2 likewise
    assert sorted(sameas) == sorted(
        [("<http://example.com/t/T1>", "<http://example.com/canon/X>")] * 2
        + [("<http://example.com/t/T2>", "<http://example.com/canon/X>")] * 2
    )
    # same-rule duplicates (the repeated T1 row) collapse
    kinds = [(r.s, r.o) for r in rows if r.p == EX_KIND]
    assert len(kinds) == 2  # T1 and T2 once each


def test_default_scope_collapses_cross_rule_duplicates(spark, csv_dir):
    rows = materialize(spark, _mapping(csv_dir)).collect()
    sameas = [(r.s, r.o) for r in rows if r.p == OWL_SAMEAS]
    assert sorted(sameas) == [
        ("<http://example.com/t/T1>", "<http://example.com/canon/X>"),
        ("<http://example.com/t/T2>", "<http://example.com/canon/X>"),
    ]


def test_reference_scope_ignores_graph(spark, csv_dir):
    # spog keeps one triple per named graph; reference keying has no
    # graph component, so the two-graph mapping emits each triple once
    spog = materialize(spark, _graph_mapping(csv_dir)).collect()
    ref = materialize(spark, _graph_mapping(csv_dir),
                      dedup_scope="reference").collect()
    spog_kinds = [r for r in spog if r.p == EX_KIND]
    ref_kinds = [r for r in ref if r.p == EX_KIND]
    assert len(spog_kinds) == 4   # (T1, T2) x (g1, g2)
    assert len(ref_kinds) == 2    # graph ignored in the dedup key
    assert all(r.g in ("<http://example.com/vocab/g1>",
                       "<http://example.com/vocab/g2>") for r in ref_kinds)


def test_reference_scope_output_schema_clean(spark, csv_dir):
    df = materialize(spark, _mapping(csv_dir), dedup_scope="reference")
    assert df.columns == ["s", "p", "o", "g"]


def test_reference_scope_with_logical_targets(spark, csv_dir):
    """materialize_with_targets: the per-target dedup uses the same
    reference keying and the __rule tag never leaks into outputs."""
    from sdm_rdfizer_spark import materialize_with_targets

    m = f"""
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix rml: <http://semweb.mmlab.be/ns/rml#> .
@prefix ql: <http://semweb.mmlab.be/ns/ql#> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix ex: <http://example.com/vocab/> .
@prefix formats: <http://www.w3.org/ns/formats/> .
<#M> a rr:TriplesMap;
  rml:logicalSource [ rml:source "{csv_dir}/data.csv"; rml:referenceFormulation ql:CSV ];
  rr:subjectMap [ rr:template "http://example.com/t/{{tid}}" ];
  rr:predicateObjectMap [ rr:predicate owl:sameAs;
    rr:objectMap [ rr:constant <http://example.com/canon/X>;
                   rml:logicalTarget <#T> ] ];
  rr:predicateObjectMap [ rr:predicate owl:sameAs;
    rr:objectMap [ rr:template "{{alias}}"; rr:termType rr:IRI;
                   rml:logicalTarget <#T> ] ] .
<#T> rml:target [ rml:path "{csv_dir}/same.nt" ];
  rml:serialization formats:N-Triples .
"""
    main, frames = materialize_with_targets(spark, m, dedup_scope="reference")
    assert main.columns == ["s", "p", "o", "g"]
    rows = main.collect()
    # both rules survive for each of T1/T2 (reference PTT keying)
    assert len(rows) == 4
    (spec, frame), = frames.items()
    assert frame.columns == ["s", "p", "o", "g"]
    assert frame.count() == 4
