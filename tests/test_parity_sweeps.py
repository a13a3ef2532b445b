"""Round-2 parity sweeps: CSV FAILFAST validation, POM dedup,
identical-target sink dedup, SPARQL-BGP .nt iterator, endpoint paging."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from sdm_rdfizer_spark import materialize
from sdm_rdfizer_spark.ir import LogicalSource
from sdm_rdfizer_spark.sources import read_source
from tests.conftest import triple_set


def test_csv_failfast_raises_on_ragged_rows(spark, tmp_path):
    (tmp_path / "bad.csv").write_text("a,b\n1,2\n3,4,5,6\n")
    ls = LogicalSource(source=str(tmp_path / "bad.csv"), fmt="csv",
                       options={"mode": "FAILFAST"})
    df = read_source(spark, ls)
    with pytest.raises(Exception, match="MALFORMED|Malformed|FAILFAST"):
        df.collect()


def test_csv_permissive_default_keeps_rows(spark, tmp_path):
    (tmp_path / "bad.csv").write_text("a,b\n1,2\n3,4,5,6\n")
    ls = LogicalSource(source=str(tmp_path / "bad.csv"), fmt="csv")
    assert read_source(spark, ls).count() == 2


def test_duplicate_poms_compile_once(spark, tmp_path):
    from sdm_rdfizer_spark.rml_parser import extract_triples_maps
    from sdm_rdfizer_spark.turtle import parse as parse_turtle

    (tmp_path / "d.csv").write_text("k,v\na,1\n")
    m = f"""
        @prefix rr: <http://www.w3.org/ns/r2rml#> .
        @prefix rml: <http://semweb.mmlab.be/ns/rml#> .
        @prefix ql: <http://semweb.mmlab.be/ns/ql#> .
        @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
        @prefix ex: <http://x.org/> .
        <#M> a rr:TriplesMap;
          rml:logicalSource [ rml:source "{tmp_path}/d.csv"; rml:referenceFormulation ql:CSV ];
          rr:subjectMap [ rr:template "http://x.org/r/{{k}}" ];
          rr:predicateObjectMap [ rr:predicate ex:v; rr:objectMap [ rml:reference "v" ] ];
          rr:predicateObjectMap [ rr:predicate ex:v; rr:objectMap [ rml:reference "v" ] ];
          rr:predicateObjectMap [ rr:predicate ex:v;
            rr:objectMap [ rml:reference "v"; rr:datatype xsd:int ] ] .
    """
    tms = extract_triples_maps(parse_turtle(m), str(tmp_path))
    # exact duplicate dropped; the datatype-decorated one survives
    assert len(tms[0].poms) == 2
    got = triple_set(materialize(spark, m))
    assert len(got) == 2


def test_identical_targets_written_once(spark, tmp_path, monkeypatch):
    import sdm_rdfizer_spark.sinks as sinks

    calls = []
    real = sinks.write_target

    def spy(frame, spec, prefixes=None):
        calls.append(spec.path)
        return real(frame, spec)

    import sdm_rdfizer_spark.engine as engine
    monkeypatch.setattr(engine, "semantify", engine.semantify)
    (tmp_path / "d.csv").write_text("k,v\na,1\nb,2\n")
    shared = tmp_path / "shared.nt"
    (tmp_path / "m.ttl").write_text(f"""
        @prefix rr: <http://www.w3.org/ns/r2rml#> .
        @prefix rml: <http://semweb.mmlab.be/ns/rml#> .
        @prefix rmlt: <http://semweb.mmlab.be/ns/rml-target#> .
        @prefix rml2: <http://w3id.org/rml/> .
        @prefix ql: <http://semweb.mmlab.be/ns/ql#> .
        @prefix ex: <http://x.org/> .
        <#T1> a rml2:LogicalTarget; rml2:target [ rml2:path "{shared}" ] .
        <#T2> a rml2:LogicalTarget; rml2:target [ rml2:path "{shared}" ] .
        <#M> a rr:TriplesMap;
          rml:logicalSource [ rml:source "{tmp_path}/d.csv"; rml:referenceFormulation ql:CSV ];
          rr:subjectMap [ rr:template "http://x.org/r/{{k}}" ];
          rr:predicateObjectMap [ rr:predicate ex:v;
            rr:objectMap [ rml:reference "v"; rml2:logicalTarget <#T1> ] ];
          rr:predicateObjectMap [ rr:predicate ex:w;
            rr:objectMap [ rml:reference "v"; rml2:logicalTarget <#T2> ] ] .
    """)
    out = tmp_path / "out"
    out.mkdir()
    (tmp_path / "config.ini").write_text(f"""
[default]
main_directory: {tmp_path}

[datasets]
number_of_datasets: 1
output_folder: {out}
all_in_one_file: no
remove_duplicate: yes

[dataset1]
name: t
mapping: {tmp_path}/m.ttl
""")
    monkeypatch.setattr(sinks, "write_target", spy)
    engine.semantify(str(tmp_path / "config.ini"), spark)
    # one write for the shared path, containing BOTH targets' triples
    assert calls.count(str(shared)) == 1
    text = open(shared).read()
    assert "<http://x.org/v>" in text and "<http://x.org/w>" in text


def test_nt_source_sparql_iterator(spark, tmp_path):
    (tmp_path / "g.nt").write_text(
        '<http://x.org/a> <http://x.org/name> "ann" .\n'
        '<http://x.org/a> <http://x.org/age> "30" .\n'
        '<http://x.org/b> <http://x.org/name> "bob" .\n'
    )
    ls = LogicalSource(
        source=str(tmp_path / "g.nt"), fmt="ntriples",
        query="PREFIX ex: <http://x.org/> "
              "SELECT ?person ?n ?a WHERE { ?person ex:name ?n . "
              "?person ex:age ?a }")
    rows = [r.asDict() for r in read_source(spark, ls).collect()]
    assert rows == [{"person": "http://x.org/a", "n": "ann", "a": "30"}]


def test_nt_sparql_iterator_in_mapping(spark, tmp_path):
    (tmp_path / "g.nt").write_text(
        '<http://x.org/a> <http://x.org/name> "ann" .\n'
        '<http://x.org/b> <http://x.org/name> "bob" .\n'
    )
    m = f"""
        @prefix rr: <http://www.w3.org/ns/r2rml#> .
        @prefix rml: <http://semweb.mmlab.be/ns/rml#> .
        @prefix ql: <http://semweb.mmlab.be/ns/ql#> .
        @prefix ex: <http://x.org/> .
        <#M> a rr:TriplesMap;
          rml:logicalSource [ rml:source "{tmp_path}/g.nt";
             rml:referenceFormulation ql:NTriples;
             rml:iterator "SELECT ?n WHERE {{ ?s <http://x.org/name> ?n }}" ];
          rr:subjectMap [ rr:template "http://y.org/{{n}}" ];
          rr:predicateObjectMap [ rr:predicate ex:known; rr:objectMap "yes" ] .
    """
    got = triple_set(materialize(spark, m))
    assert ("<http://y.org/ann>", "<http://x.org/known>", '"yes"') in got
    assert ("<http://y.org/bob>", "<http://x.org/known>", '"yes"') in got


class _SparqlPagingHandler(BaseHTTPRequestHandler):
    hits = []

    def do_GET(self):
        import urllib.parse
        q = urllib.parse.parse_qs(
            urllib.parse.urlparse(self.path).query)["query"][0]
        type(self).hits.append(q)
        import re
        m = re.search(r"LIMIT (\d+) OFFSET (\d+)", q)
        limit, offset = int(m.group(1)), int(m.group(2))
        total = 7
        names = [f"n{i}" for i in range(offset, min(offset + limit, total))]
        body = json.dumps({
            "head": {"vars": ["name"]},
            "results": {"bindings": [
                {"name": {"type": "literal", "value": n}} for n in names]},
        }).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/sparql-results+json")
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


def test_sparql_endpoint_pages(spark):
    srv = HTTPServer(("127.0.0.1", 0), _SparqlPagingHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        ls = LogicalSource(
            source=f"http://127.0.0.1:{srv.server_port}/sparql", fmt="sparql",
            query="SELECT ?name WHERE { ?s ?p ?name }",
            options={"page_size": 3})
        df = read_source(spark, ls)
        assert df.count() == 7
        assert len(_SparqlPagingHandler.hits) == 3  # 3+3+1
    finally:
        srv.shutdown()


def test_valid_source_config_flag(spark, tmp_path):
    """config [datasets] valid_source: yes -> ragged CSV aborts the run."""
    import pytest as _pytest

    import sdm_rdfizer_spark.engine as engine

    (tmp_path / "bad.csv").write_text("a,b\n1,2\n3,4,5,6\n")
    (tmp_path / "m.ttl").write_text(f"""
        @prefix rr: <http://www.w3.org/ns/r2rml#> .
        @prefix rml: <http://semweb.mmlab.be/ns/rml#> .
        @prefix ql: <http://semweb.mmlab.be/ns/ql#> .
        @prefix ex: <http://x.org/> .
        <#M> a rr:TriplesMap;
          rml:logicalSource [ rml:source "{tmp_path}/bad.csv"; rml:referenceFormulation ql:CSV ];
          rr:subjectMap [ rr:template "http://x.org/r/{{a}}" ];
          rr:predicateObjectMap [ rr:predicate ex:b; rr:objectMap [ rml:reference "b" ] ] .
    """)
    out = tmp_path / "out"
    out.mkdir()
    (tmp_path / "config.ini").write_text(f"""
[default]
main_directory: {tmp_path}

[datasets]
number_of_datasets: 1
output_folder: {out}
all_in_one_file: no
remove_duplicate: yes
valid_source: yes

[dataset1]
name: v
mapping: {tmp_path}/m.ttl
""")
    with _pytest.raises(Exception, match="MALFORMED|Malformed|FAILFAST"):
        engine.semantify(str(tmp_path / "config.ini"), spark)
