"""RML-IO logical targets: per-term-map output routing + serializations.

Reference behavior: a term map carrying rml:logicalTarget sends every
triple built with it to the target file as well (parse
semantify.py:2204-2208, execution semantify.py:10013-10088). Here one
tagged compilation pass feeds all outputs.
"""

import gzip
import json

import pytest

from conftest import triple_set

from sdm_rdfizer_spark import materialize_with_targets
from sdm_rdfizer_spark.sinks import parse_term, to_jsonld, to_rdfjson, to_rdfxml, write_target

MAPPING = """
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix rml: <http://semweb.mmlab.be/ns/rml#> .
@prefix ql: <http://semweb.mmlab.be/ns/ql#> .
@prefix ex: <http://ex.org/vocab/> .
@prefix void: <http://rdfs.org/ns/void#> .
@prefix formats: <http://www.w3.org/ns/formats/> .

<#TM> a rr:TriplesMap;
  rml:logicalSource [ rml:source "%(dir)s/people.csv"; rml:referenceFormulation ql:CSV ];
  rr:subjectMap [ rr:template "http://ex.org/p/{id}"; rr:class ex:Person ];
  rr:predicateObjectMap [ rr:predicate ex:name;
    rr:objectMap [ rml:reference "name";
                   rml:logicalTarget <#NameTarget> ] ];
  rr:predicateObjectMap [ rr:predicate ex:age;
    rr:objectMap [ rml:reference "age" ] ] .

<#NameTarget> rml:target [ rml:path "%(dir)s/names.nt" ];
  rml:serialization formats:N-Triples .
"""


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    d = tmp_path_factory.mktemp("targets")
    (d / "people.csv").write_text("id,name,age\n1,ann,30\n2,bob,41\n")
    return str(d)


def test_target_routing(spark, fixtures):
    mapping = MAPPING % {"dir": fixtures}
    main, frames = materialize_with_targets(spark, mapping)
    # main output has all triples: 2 types + 2 names + 2 ages
    assert len(triple_set(main)) == 6
    assert len(frames) == 1
    (spec, frame), = frames.items()
    got = triple_set(frame)
    # target only gets triples built with the name object map
    assert got == {
        ("<http://ex.org/p/1>", "<http://ex.org/vocab/name>", '"ann"'),
        ("<http://ex.org/p/2>", "<http://ex.org/vocab/name>", '"bob"'),
    }
    out = write_target(frame, spec)
    text = sorted(open(out).read().strip().splitlines())
    assert text[0] == '<http://ex.org/p/1> <http://ex.org/vocab/name> "ann" .'


def test_serializations_and_compression(spark, fixtures, tmp_path):
    mapping = MAPPING % {"dir": fixtures}
    _, frames = materialize_with_targets(spark, mapping)
    (spec, frame), = frames.items()

    rj = to_rdfjson(frame)
    assert rj["http://ex.org/p/1"]["http://ex.org/vocab/name"] == [
        {"type": "literal", "value": "ann"}]

    ld = to_jsonld(frame)
    byid = {n["@id"]: n for n in ld}
    assert byid["http://ex.org/p/1"]["http://ex.org/vocab/name"] == [{"@value": "ann"}]

    xml = to_rdfxml(frame)
    assert 'rdf:about="http://ex.org/p/1"' in xml and ">ann<" in xml

    # gzip post-pass keyed off the .gz extension, like the reference
    spec2 = type(spec)(target_id="t2", path=str(tmp_path / "names.nt.gz"))
    write_target(frame, spec2)
    lines = gzip.open(spec2.path, "rt").read()
    assert '"bob"' in lines

    # jsonld serialization keyed off filename
    spec3 = type(spec)(target_id="t3", path=str(tmp_path / "names.jsonld"))
    write_target(frame, spec3)
    data = json.load(open(spec3.path))
    assert any(n["@id"] == "http://ex.org/p/2" for n in data)


def test_encoding_then_compression(spark, fixtures, tmp_path):
    """A target declaring BOTH utf-16 encoding and compression gets the
    encoding rewrite first, then compression — reference order
    (semantify.py:10033-10037 then :10069-10086): the archive holds
    UTF-16 bytes."""
    mapping = MAPPING % {"dir": fixtures}
    _, frames = materialize_with_targets(spark, mapping)
    (spec, frame), = frames.items()

    spec_both = type(spec)(target_id="tboth", path=str(tmp_path / "names.nt"),
                           compression="gzip", encoding="utf-16")
    write_target(frame, spec_both)
    raw = gzip.open(spec_both.path, "rb").read()
    # BOM + NUL interleaving prove the bytes inside the archive are UTF-16
    assert raw[:2] in (b"\xff\xfe", b"\xfe\xff")
    text = raw.decode("utf-16")
    assert '"ann"' in text and '"bob"' in text

    # encoding without compression still works standalone
    spec_enc = type(spec)(target_id="tenc", path=str(tmp_path / "names2.nt"),
                          encoding="utf-16")
    write_target(frame, spec_enc)
    plain = open(spec_enc.path, "rb").read()
    assert plain[:2] in (b"\xff\xfe", b"\xfe\xff")
    assert '"ann"' in plain.decode("utf-16")


def test_parse_term():
    assert parse_term("<http://x/y>") == {"kind": "uri", "value": "http://x/y"}
    assert parse_term('"hi"@en') == {"kind": "literal", "value": "hi", "lang": "en"}
    assert parse_term('"3"^^<http://www.w3.org/2001/XMLSchema#integer>') == {
        "kind": "literal", "value": "3",
        "datatype": "http://www.w3.org/2001/XMLSchema#integer"}
    assert parse_term("_:b0") == {"kind": "bnode", "value": "b0"}
