"""RML-LV logical views: field projection, array flatten, view joins."""

import json
import textwrap

from sdm_rdfizer_spark import materialize
from tests.conftest import triple_set

PFX = """
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix rml: <http://w3id.org/rml/> .
@prefix ql: <http://semweb.mmlab.be/ns/ql#> .
@prefix ex: <http://x.org/> .
"""


def test_view_projection_and_flatten(spark, tmp_path):
    (tmp_path / "orders.json").write_text(json.dumps({
        "orders": [
            {"oid": "o1", "buyer": {"name": "ada"}, "items": [
                {"sku": "a", "qty": 2}, {"sku": "b", "qty": 1}]},
            {"oid": "o2", "buyer": {"name": "alan"}, "items": [
                {"sku": "c", "qty": 5}]},
        ]
    }))
    m = PFX + textwrap.dedent(f"""
        <#M> a rr:TriplesMap;
          rml:logicalSource [
            rml:viewOn [ rml:source [ rml:path "{tmp_path}/orders.json" ];
                         rml:referenceFormulation ql:JSONPath;
                         rml:iterator "$.orders[*]" ];
            rml:field [ rml:fieldName "oid"; rml:reference "oid" ];
            rml:field [ rml:fieldName "buyer"; rml:reference "buyer.name" ];
            rml:field [ rml:fieldName "item"; rml:iterator "$.items[*]";
                        rml:field [ rml:fieldName "sku"; rml:reference "sku" ];
                        rml:field [ rml:fieldName "qty"; rml:reference "qty" ] ];
          ];
          rr:subjectMap [ rr:template "http://x.org/order/{{oid}}/{{sku}}" ];
          rr:predicateObjectMap [ rr:predicate ex:qty; rr:objectMap [ rml:reference "qty" ] ];
          rr:predicateObjectMap [ rr:predicate ex:buyer; rr:objectMap [ rml:reference "buyer" ] ] .
    """)
    got = triple_set(materialize(spark, m))
    assert ("<http://x.org/order/o1/a>", "<http://x.org/qty>", '"2"') in got
    assert ("<http://x.org/order/o1/b>", "<http://x.org/qty>", '"1"') in got
    assert ("<http://x.org/order/o2/c>", "<http://x.org/buyer>", '"alan"') in got


def test_view_inner_and_left_join(spark, tmp_path):
    (tmp_path / "emp.csv").write_text("eid,dept\ne1,d1\ne2,d2\ne3,dX\n")
    (tmp_path / "dept.csv").write_text("did,dname\nd1,Eng\nd2,Ops\n")
    m = PFX + textwrap.dedent(f"""
        <#M> a rr:TriplesMap;
          rml:logicalSource [
            rml:viewOn [ rml:source [ rml:path "{tmp_path}/emp.csv" ];
                         rml:referenceFormulation ql:CSV ];
            rml:field [ rml:fieldName "eid"; rml:reference "eid" ];
            rml:field [ rml:fieldName "dept"; rml:reference "dept" ];
            rml:leftJoin [
              rml:parentLogicalView [
                rml:viewOn [ rml:source [ rml:path "{tmp_path}/dept.csv" ];
                             rml:referenceFormulation ql:CSV ];
                rml:field [ rml:fieldName "did"; rml:reference "did" ];
                rml:field [ rml:fieldName "dname"; rml:reference "dname" ];
              ];
              rml:joinCondition [ rml:child "dept"; rml:parent "did" ];
              rml:field [ rml:fieldName "deptname"; rml:reference "dname" ];
            ];
          ];
          rr:subjectMap [ rr:template "http://x.org/e/{{eid}}" ];
          rr:predicateObjectMap [ rr:predicate ex:deptName; rr:objectMap [ rml:reference "deptname" ] ] .
    """)
    got = triple_set(materialize(spark, m))
    assert ("<http://x.org/e/e1>", "<http://x.org/deptName>", '"Eng"') in got
    assert ("<http://x.org/e/e2>", "<http://x.org/deptName>", '"Ops"') in got
    # left join: e3 has no dept match → NULL field → triple dropped
    assert not any(s == "<http://x.org/e/e3>" for s, _, _ in got)
