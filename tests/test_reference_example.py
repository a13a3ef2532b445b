"""Drop-in compatibility: run the reference distribution's own example
(mapping.ttl + CSVs, /root/reference/example/) through this engine and
pin the complete expected output — a reference user's first mapping must
work unchanged.  The example is read-only input; nothing is copied."""

import os

import pytest

from conftest import triple_set
from sdm_rdfizer_spark import materialize, semantify

EX = "/root/reference/example"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{EX}/mapping.ttl"),
    reason="reference example not present")

BIOTYPES = [
    "lincRNA",
    "miRNA",
    "processed_transcript",
    "transcribed_unprocessed_pseudogene",
    "unprocessed_pseudogene",
]
RDF_TYPE = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"


def _expected():
    t = set()
    for b in BIOTYPES:
        s = f"<http://project-iasis.eu/BioType/{b}>"
        t.add((s, RDF_TYPE, "<http://project-iasis.eu/vocab/BioType>"))
        t.add((s, "<http://project-iasis.eu/vocab/isRelatedTo>",
               "<http://project-iasis.eu/Chromosome/chr1>"))
    t.add(("<http://project-iasis.eu/Chromosome/chr1>", RDF_TYPE,
           "<http://project-iasis.eu/vocab/chr>"))
    return t


def test_reference_example_mapping_materializes(spark):
    with open(f"{EX}/mapping.ttl") as fh:
        mapping = fh.read()
    df = materialize(spark, mapping, base_dir=EX)
    assert triple_set(df) == _expected()


def test_reference_example_via_config(spark, tmp_path):
    """The config-driven path (reference CLI shape: [datasets] +
    [dataset1] sections, turtle output) against the same example."""
    cfg = tmp_path / "config.ini"
    cfg.write_text(f"""[datasets]
number_of_datasets: 1
output_folder: {tmp_path}/output
remove_duplicate: yes
all_in_one_file: no
name: joinCondition
enrichment: yes
ordered: yes
output_format: turtle

[dataset1]
name: joinCondition
mapping: {EX}/mapping.ttl
""")
    semantify(str(cfg), spark)
    out = tmp_path / "output" / "joinCondition.ttl"
    assert out.exists()
    # round-trip through our Turtle parser: the same 11 triples
    from sdm_rdfizer_spark.turtle import parse

    g = parse(out.read_text())
    got = {(f"<{s}>", f"<{p}>", f"<{o}>") for s, p, o in g.triples}
    assert got == _expected()
