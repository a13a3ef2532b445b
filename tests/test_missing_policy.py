"""Missing-attribute policy (reference: rdfizer/rdfizer/functions.py:1915-1920
with the hardcoded global ignore="yes", semantify.py:75-76).

``ignore`` (default) drops the affected predicateObjectMap — or the whole
TriplesMap when the subject references the missing attribute — with a
warning; ``abort`` raises a MappingError naming attribute and TriplesMap.
"""

import pytest

from sdm_rdfizer_spark import materialize
from sdm_rdfizer_spark.compiler.plan import MappingError
from tests.conftest import triple_set

EX = "http://example.com/vocab/"


@pytest.fixture(scope="module")
def csv_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("missing_fixtures")
    (d / "data.csv").write_text("tid,kind\nT1,coding\nT2,lnc\n")
    return d


def _mapping(d, subject_ref="tid", object_ref="kind"):
    return f"""
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix rml: <http://semweb.mmlab.be/ns/rml#> .
@prefix ql: <http://semweb.mmlab.be/ns/ql#> .
@prefix ex: <http://example.com/vocab/> .
<#M> a rr:TriplesMap;
  rml:logicalSource [ rml:source "{d}/data.csv"; rml:referenceFormulation ql:CSV ];
  rr:subjectMap [ rr:template "http://example.com/t/{{{subject_ref}}}" ];
  rr:predicateObjectMap [ rr:predicate ex:kind; rr:objectMap [ rml:reference "{object_ref}" ] ];
  rr:predicateObjectMap [ rr:predicate ex:id; rr:objectMap [ rml:reference "tid" ] ] .
"""


def test_missing_object_ignore_drops_pom(spark, csv_dir):
    with pytest.warns(UserWarning, match="typo_column"):
        triples = materialize(spark, _mapping(csv_dir, object_ref="typo_column"))
        got = triple_set(triples)
    # the bad POM is gone, the good one survives
    assert ("<http://example.com/t/T1>", f"<{EX}id>", '"T1"') in got
    assert not any(p == f"<{EX}kind>" for _, p, _ in got)


def test_missing_object_abort_raises(spark, csv_dir):
    with pytest.raises(MappingError, match="typo_column"):
        materialize(spark, _mapping(csv_dir, object_ref="typo_column"),
                    missing_policy="abort")


def test_missing_subject_ignore_drops_tm(spark, csv_dir):
    with pytest.warns(UserWarning, match="nope"):
        triples = materialize(spark, _mapping(csv_dir, subject_ref="nope"))
        assert triples.count() == 0


def test_missing_subject_abort_names_tm(spark, csv_dir):
    with pytest.raises(MappingError, match="subject map"):
        materialize(spark, _mapping(csv_dir, subject_ref="nope"),
                    missing_policy="abort")


def test_clean_mapping_unaffected(spark, csv_dir):
    got = triple_set(materialize(spark, _mapping(csv_dir),
                                 missing_policy="abort"))
    assert ("<http://example.com/t/T1>", f"<{EX}kind>", '"coding"') in got
