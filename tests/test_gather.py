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


def test_gather_cartesian_strategy(spark, tmp_path):
    """rml:cartesian: one collection per combination of item values
    (reference cc_functions.py:499-536)."""
    m = _mapping(tmp_path, """
        rml:gather ( [ rml:reference "sport1" ] [ rml:reference "sport2" ] );
        rml:gatherAs rdf:List;
        rml:strategy rml:cartesian
    """)
    got = triple_set(materialize(spark, m))
    s1 = "<http://x.org/student/1>"
    # student 1: 1x1 combos -> one 2-element list [judo, karate]
    heads1 = [o for s, p, o in got if s == s1 and p == "<http://x.org/plays>"]
    assert len(heads1) == 1
    h = heads1[0]
    assert next(o for s, p, o in got if s == h and p == f"<{RDF}first>") == '"judo"'
    r = next(o for s, p, o in got if s == h and p == f"<{RDF}rest>")
    assert next(o for s, p, o in got if s == r and p == f"<{RDF}first>") == '"karate"'
    # student 2: sport2 empty -> zero combinations -> nothing emitted
    assert not any("student/2" in s for s, _, _ in got)


def test_gather_cartesian_multi_combo(spark, tmp_path):
    """Array-valued references fan out into the cross product."""
    import json
    rows = [{"sid": 1, "a": ["x", "y"], "b": ["1", "2"]}]
    (tmp_path / "d.json").write_text(json.dumps(rows))
    m = f"""
        @prefix rr: <http://www.w3.org/ns/r2rml#> .
        @prefix rml: <http://semweb.mmlab.be/ns/rml#> .
        @prefix ql: <http://semweb.mmlab.be/ns/ql#> .
        @prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
        @prefix ex: <http://x.org/> .
        <#M> a rr:TriplesMap;
          rml:logicalSource [ rml:source "{tmp_path}/d.json";
             rml:referenceFormulation ql:JSONPath; rml:iterator "$[*]" ];
          rr:subjectMap [ rr:template "http://x.org/s/{{sid}}" ];
          rr:predicateObjectMap [ rr:predicate ex:combo; rr:objectMap [
              rml:gather ( [ rml:reference "a" ] [ rml:reference "b" ] );
              rml:gatherAs rdf:Seq;
              rml:strategy rml:cartesian ] ] .
    """
    got = triple_set(materialize(spark, m))
    heads = [o for s, p, o in got if p == "<http://x.org/combo>"]
    assert len(heads) == 4  # 2x2 combinations, each its own Seq
    for h in heads:
        members = {(p, o) for s, p, o in got if s == h and p.startswith(f"<{RDF}_")}
        assert len(members) == 2


def test_gather_parent_join_items(spark, tmp_path):
    """A parentTriplesMap gather item contributes every joined parent
    subject (reference hash_maker_cc, cc_functions.py:13-120)."""
    (tmp_path / "teams.csv").write_text("tid,name\n10,reds\n20,blues\n")
    (tmp_path / "players.csv").write_text(
        "pid,team\nA,10\nB,10\nC,20\n")
    m = f"""
        @prefix rr: <http://www.w3.org/ns/r2rml#> .
        @prefix rml: <http://semweb.mmlab.be/ns/rml#> .
        @prefix ql: <http://semweb.mmlab.be/ns/ql#> .
        @prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
        @prefix ex: <http://x.org/> .
        <#P> a rr:TriplesMap;
          rml:logicalSource [ rml:source "{tmp_path}/players.csv"; rml:referenceFormulation ql:CSV ];
          rr:subjectMap [ rr:template "http://x.org/player/{{pid}}" ] .
        <#T> a rr:TriplesMap;
          rml:logicalSource [ rml:source "{tmp_path}/teams.csv"; rml:referenceFormulation ql:CSV ];
          rr:subjectMap [ rr:template "http://x.org/team/{{tid}}" ];
          rr:predicateObjectMap [ rr:predicate ex:roster; rr:objectMap [
              rml:gather ( [ rr:parentTriplesMap <#P>;
                             rr:joinCondition [ rr:child "tid"; rr:parent "team" ] ] );
              rml:gatherAs rdf:Seq ] ] .
    """
    got = triple_set(materialize(spark, m))
    t10 = "<http://x.org/team/10>"
    node = next(o for s, p, o in got if s == t10 and p == "<http://x.org/roster>")
    assert (node, f"<{RDF}_1>", "<http://x.org/player/A>") in got
    assert (node, f"<{RDF}_2>", "<http://x.org/player/B>") in got
    t20 = "<http://x.org/team/20>"
    node2 = next(o for s, p, o in got if s == t20 and p == "<http://x.org/roster>")
    assert (node2, f"<{RDF}_1>", "<http://x.org/player/C>") in got
    assert not any(s == node2 and p == f"<{RDF}_2>" for s, p, o in got)


def test_gather_subject_position(spark, tmp_path):
    """Subject-position gather: the subject IS the collection node
    (reference gather_subject, cc_functions.py:121-216)."""
    (tmp_path / "students.csv").write_text(
        "sid,sport1,sport2\n1,judo,karate\n2,chess,\n")
    m = f"""
        @prefix rr: <http://www.w3.org/ns/r2rml#> .
        @prefix rml: <http://semweb.mmlab.be/ns/rml#> .
        @prefix ql: <http://semweb.mmlab.be/ns/ql#> .
        @prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
        @prefix ex: <http://x.org/> .
        <#M> a rr:TriplesMap;
          rml:logicalSource [ rml:source "{tmp_path}/students.csv"; rml:referenceFormulation ql:CSV ];
          rr:subjectMap [ rr:template "http://x.org/sports/{{sid}}";
              rml:gather ( [ rml:reference "sport1" ] [ rml:reference "sport2" ] );
              rml:gatherAs rdf:Bag ];
          rr:predicateObjectMap [ rr:predicate ex:of; rr:objectMap [
              rr:template "http://x.org/student/{{sid}}" ] ] .
    """
    got = triple_set(materialize(spark, m))
    n1 = "<http://x.org/sports/1>"
    # membership hangs directly off the subject (no head triple)
    assert (n1, f"<{RDF}type>", f"<{RDF}Bag>") in got
    assert (n1, f"<{RDF}_1>", '"judo"') in got
    assert (n1, f"<{RDF}_2>", '"karate"') in got
    # ordinary POMs still use the same subject
    assert (n1, "<http://x.org/of>", "<http://x.org/student/1>") in got
    n2 = "<http://x.org/sports/2>"
    assert (n2, f"<{RDF}_1>", '"chess"') in got


def test_gather_subject_list(spark, tmp_path):
    """Subject-position rdf:List: the subject is the FIRST cell."""
    (tmp_path / "students.csv").write_text(
        "sid,sport1,sport2\n1,judo,karate\n")
    m = f"""
        @prefix rr: <http://www.w3.org/ns/r2rml#> .
        @prefix rml: <http://semweb.mmlab.be/ns/rml#> .
        @prefix ql: <http://semweb.mmlab.be/ns/ql#> .
        @prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
        @prefix ex: <http://x.org/> .
        <#M> a rr:TriplesMap;
          rml:logicalSource [ rml:source "{tmp_path}/students.csv"; rml:referenceFormulation ql:CSV ];
          rr:subjectMap [ rr:template "http://x.org/sports/{{sid}}";
              rml:gather ( [ rml:reference "sport1" ] [ rml:reference "sport2" ] );
              rml:gatherAs rdf:List ] .
    """
    got = triple_set(materialize(spark, m))
    n1 = "<http://x.org/sports/1>"
    assert (n1, f"<{RDF}first>", '"judo"') in got
    rest = next(o for s, p, o in got if s == n1 and p == f"<{RDF}rest>")
    assert (rest, f"<{RDF}first>", '"karate"') in got
    assert (rest, f"<{RDF}rest>", f"<{RDF}nil>") in got


def test_gather_grouped_row_order_source_vs_value(spark, tmp_path):
    """Grouped gathers: default cross-row item order sorts by value
    (deterministic; RML-CC leaves it undefined), gather_row_order="source"
    preserves source-row iteration order like the reference
    (cc_functions.py:269-340)."""
    (tmp_path / "enroll2.csv").write_text(
        "student,course\nms,zeta\nms,alpha\nms,mid\n")
    m = f"""
        @prefix rr: <http://www.w3.org/ns/r2rml#> .
        @prefix rml: <http://semweb.mmlab.be/ns/rml#> .
        @prefix ql: <http://semweb.mmlab.be/ns/ql#> .
        @prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
        @prefix ex: <http://x.org/> .
        <#M> a rr:TriplesMap;
          rml:logicalSource [ rml:source "{tmp_path}/enroll2.csv"; rml:referenceFormulation ql:CSV ];
          rr:subjectMap [ rr:template "http://x.org/student/{{student}}" ];
          rr:predicateObjectMap [ rr:predicate ex:courses; rr:objectMap [
              rr:template "http://x.org/courses/{{student}}";
              rml:gather ( [ rml:reference "course" ] );
              rml:gatherAs rdf:Seq ] ] .
    """

    def members(triples):
        got = triple_set(triples)
        node = next(o for s, p, o in got
                    if p == "<http://x.org/courses>")
        out = {}
        for s, p, o in got:
            if s == node and p.startswith(f"<{RDF}_"):
                out[int(p[len(f"<{RDF}_"):-1])] = o
        return [out[i] for i in sorted(out)]

    assert members(materialize(spark, m)) == ['"alpha"', '"mid"', '"zeta"']
    assert members(
        materialize(spark, m, gather_row_order="source")
    ) == ['"zeta"', '"alpha"', '"mid"']
