"""RML-CC gather maps: containers (Bag/Seq/Alt) and rdf:List chains."""

import textwrap

from sdm_rdfizer_spark import materialize
from tests.conftest import triple_set

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def _mapping(tmp_path, object_map: str) -> str:
    (tmp_path / "students.csv").write_text(
        "sid,sport1,sport2\n"
        "1,judo,karate\n"
        "2,chess,\n"
        "3,,\n"
    )
    return textwrap.dedent(f"""
        @prefix rr: <http://www.w3.org/ns/r2rml#> .
        @prefix rml: <http://semweb.mmlab.be/ns/rml#> .
        @prefix ql: <http://semweb.mmlab.be/ns/ql#> .
        @prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
        @prefix ex: <http://x.org/> .
        <#M> a rr:TriplesMap;
          rml:logicalSource [ rml:source "{tmp_path}/students.csv"; rml:referenceFormulation ql:CSV ];
          rr:subjectMap [ rr:template "http://x.org/student/{{sid}}" ];
          rr:predicateObjectMap [ rr:predicate ex:plays; rr:objectMap [ {object_map} ] ] .
    """)


def test_gather_bag_container(spark, tmp_path):
    m = _mapping(tmp_path, """
        rml:gather ( [ rml:reference "sport1" ] [ rml:reference "sport2" ] );
        rml:gatherAs rdf:Bag
    """)
    got = triple_set(materialize(spark, m))
    s1 = "<http://x.org/student/1>"
    # head triple + type + _1/_2 members for student 1
    heads = {(s, o) for s, p, o in got if p == "<http://x.org/plays>"}
    assert len(heads) == 2   # students 1 and 2 (3 has no items, allow_empty off)
    node1 = next(o for s, o in heads if s == s1)
    assert (node1, f"<{RDF}type>", f"<{RDF}Bag>") in got
    assert (node1, f"<{RDF}_1>", '"judo"') in got
    assert (node1, f"<{RDF}_2>", '"karate"') in got
    # student 2: one member only
    node2 = next(o for s, o in heads if s == "<http://x.org/student/2>")
    assert (node2, f"<{RDF}_1>", '"chess"') in got
    assert not any(s == node2 and p == f"<{RDF}_2>" for s, p, o in got)
    # student 3 emits nothing
    assert not any("student/3" in s for s, _, _ in got)


def test_gather_list_chain(spark, tmp_path):
    m = _mapping(tmp_path, """
        rml:gather ( [ rml:reference "sport1" ] [ rml:reference "sport2" ] );
        rml:gatherAs rdf:List
    """)
    got = triple_set(materialize(spark, m))
    s1 = "<http://x.org/student/1>"
    head = next(o for s, p, o in got if s == s1 and p == "<http://x.org/plays>")
    assert head.startswith("_:")
    first1 = next(o for s, p, o in got if s == head and p == f"<{RDF}first>")
    assert first1 == '"judo"'
    rest1 = next(o for s, p, o in got if s == head and p == f"<{RDF}rest>")
    first2 = next(o for s, p, o in got if s == rest1 and p == f"<{RDF}first>")
    assert first2 == '"karate"'
    rest2 = next(o for s, p, o in got if s == rest1 and p == f"<{RDF}rest>")
    assert rest2 == f"<{RDF}nil>"
    # single-item list for student 2 terminates immediately
    s2 = "<http://x.org/student/2>"
    h2 = next(o for s, p, o in got if s == s2 and p == "<http://x.org/plays>")
    assert next(o for s, p, o in got if s == h2 and p == f"<{RDF}rest>") == f"<{RDF}nil>"


def test_gather_grouped_by_node(spark, tmp_path):
    (tmp_path / "enroll.csv").write_text(
        "student,course\n1,math\n1,art\n2,bio\n"
    )
    m = textwrap.dedent(f"""
        @prefix rr: <http://www.w3.org/ns/r2rml#> .
        @prefix rml: <http://semweb.mmlab.be/ns/rml#> .
        @prefix ql: <http://semweb.mmlab.be/ns/ql#> .
        @prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
        @prefix ex: <http://x.org/> .
        <#M> a rr:TriplesMap;
          rml:logicalSource [ rml:source "{tmp_path}/enroll.csv"; rml:referenceFormulation ql:CSV ];
          rr:subjectMap [ rr:template "http://x.org/student/{{student}}" ];
          rr:predicateObjectMap [ rr:predicate ex:courses; rr:objectMap [
              rr:template "http://x.org/courses/{{student}}";
              rml:gather ( [ rml:reference "course" ] );
              rml:gatherAs rdf:Seq ] ] .
    """)
    got = triple_set(materialize(spark, m))
    node1 = "<http://x.org/courses/1>"
    assert ("<http://x.org/student/1>", "<http://x.org/courses>", node1) in got
    # items sorted by value: art before math
    assert (node1, f"<{RDF}_1>", '"art"') in got
    assert (node1, f"<{RDF}_2>", '"math"') in got
    assert ("<http://x.org/courses/2>", f"<{RDF}_1>", '"bio"') in got
