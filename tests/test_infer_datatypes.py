"""Value-sniffing datatype inference for string sources (reference
functions.py:16-65, precedence semantify.py:9492-9508)."""

from sdm_rdfizer_spark import materialize
from tests.conftest import triple_set

XSD = "http://www.w3.org/2001/XMLSchema#"


def test_sniffed_datatypes_csv(spark, tmp_path):
    (tmp_path / "vals.csv").write_text(
        "k,v\n"
        "int,42\n"
        "negint,-7\n"
        "bool,True\n"
        "dbl,3.50\n"
        "date,2020-01-02\n"
        "dt,2020-01-02T03:04:05\n"
        "plain,hello\n"
    )
    m = f"""
        @prefix rr: <http://www.w3.org/ns/r2rml#> .
        @prefix rml: <http://semweb.mmlab.be/ns/rml#> .
        @prefix ql: <http://semweb.mmlab.be/ns/ql#> .
        @prefix ex: <http://x.org/> .
        <#M> a rr:TriplesMap;
          rml:logicalSource [ rml:source "{tmp_path}/vals.csv"; rml:referenceFormulation ql:CSV ];
          rr:subjectMap [ rr:template "http://x.org/r/{{k}}" ];
          rr:predicateObjectMap [ rr:predicate ex:v; rr:objectMap [ rml:reference "v" ] ] .
    """
    got = triple_set(materialize(spark, m, infer_datatypes=True))
    o = {s.split("/r/")[1].rstrip(">"): obj for s, _, obj in got}
    assert o["int"] == f'"42"^^<{XSD}integer>'
    assert o["negint"] == f'"-7"^^<{XSD}integer>'
    # booleans lower-case the lexical form like the reference
    assert o["bool"] == f'"true"^^<{XSD}boolean>'
    # float-looking strings canonicalize before typing ("3.50" -> "3.5")
    assert o["dbl"] == f'"3.5"^^<{XSD}double>'
    assert o["date"] == f'"2020-01-02"^^<{XSD}date>'
    assert o["dt"] == f'"2020-01-02T03:04:05"^^<{XSD}dateTime>'
    assert o["plain"] == '"hello"'


def test_explicit_datatype_wins_over_sniffing(spark, tmp_path):
    (tmp_path / "d.csv").write_text("k,v\na,42\n")
    m = f"""
        @prefix rr: <http://www.w3.org/ns/r2rml#> .
        @prefix rml: <http://semweb.mmlab.be/ns/rml#> .
        @prefix ql: <http://semweb.mmlab.be/ns/ql#> .
        @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
        @prefix ex: <http://x.org/> .
        <#M> a rr:TriplesMap;
          rml:logicalSource [ rml:source "{tmp_path}/d.csv"; rml:referenceFormulation ql:CSV ];
          rr:subjectMap [ rr:template "http://x.org/r/{{k}}" ];
          rr:predicateObjectMap [ rr:predicate ex:v;
            rr:objectMap [ rml:reference "v"; rr:datatype xsd:string ] ] .
    """
    got = triple_set(materialize(spark, m, infer_datatypes=True))
    assert ("<http://x.org/r/a>", "<http://x.org/v>",
            f'"42"^^<{XSD}string>') in got


def test_no_sniffing_without_flag(spark, tmp_path):
    (tmp_path / "d.csv").write_text("k,v\na,42\n")
    m = f"""
        @prefix rr: <http://www.w3.org/ns/r2rml#> .
        @prefix rml: <http://semweb.mmlab.be/ns/rml#> .
        @prefix ql: <http://semweb.mmlab.be/ns/ql#> .
        @prefix ex: <http://x.org/> .
        <#M> a rr:TriplesMap;
          rml:logicalSource [ rml:source "{tmp_path}/d.csv"; rml:referenceFormulation ql:CSV ];
          rr:subjectMap [ rr:template "http://x.org/r/{{k}}" ];
          rr:predicateObjectMap [ rr:predicate ex:v; rr:objectMap [ rml:reference "v" ] ] .
    """
    got = triple_set(materialize(spark, m))
    assert ("<http://x.org/r/a>", "<http://x.org/v>", '"42"') in got
