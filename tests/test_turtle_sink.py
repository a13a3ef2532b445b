"""Turtle sink: distributed writer round-trip + driver-collect guard."""

import pytest

import sdm_rdfizer_spark.sinks as sinks
from sdm_rdfizer_spark.sinks import to_turtle, write_turtle
from sdm_rdfizer_spark.turtle import parse as parse_turtle


def _triples_df(spark, n=500):
    return spark.range(n).selectExpr(
        "concat('<http://x.org/s/', cast(id % 50 as string), '>') as s",
        "concat('<http://x.org/p/', cast(id % 3 as string), '>') as p",
        "concat('\"v', cast(id as string), '\"') as o",
        "cast(null as string) as g",
    )


def test_write_turtle_single_file_roundtrip(spark, tmp_path):
    df = _triples_df(spark)
    out = str(tmp_path / "out.ttl")
    write_turtle(df, out, {"x": "http://x.org/s/"}, single_file=True)
    text = open(out).read()
    assert "@prefix x:" in text
    g = parse_turtle(text)
    got = {(str(s), str(p), str(o)) for s, p, o in g.triples}
    assert len(got) == 500
    # subjects/predicates shortened in the text but parse back to full IRIs
    sp = {(s.split("/s/")[-1].rstrip(">"),) for s, _, _ in got if "/s/" in s}
    assert len({s for s, _, _ in got}) == 50
    assert len({p for _, p, _ in got}) == 3


def test_write_turtle_directory_parts_concatenate(spark, tmp_path):
    import glob as _glob
    df = _triples_df(spark, 200)
    out = str(tmp_path / "out_ttl_dir")
    write_turtle(df, out, {"x": "http://x.org/s/"})
    parts = sorted(_glob.glob(out + "/part-*"))
    assert parts
    text = "\n".join(open(p).read() for p in parts)
    g = parse_turtle(text)
    assert len(g.triples) == 200


def test_to_turtle_guard_refuses_large(spark, monkeypatch):
    monkeypatch.setattr(sinks, "DRIVER_SERIALIZE_MAX_ROWS", 100)
    df = _triples_df(spark, 500)
    with pytest.raises(ValueError, match="write_turtle"):
        to_turtle(df)


def test_engine_routes_large_turtle_distributed(spark, tmp_path, monkeypatch):
    import sdm_rdfizer_spark.engine as engine
    monkeypatch.setattr(engine, "TURTLE_DRIVER_MAX_ROWS", 10)
    (tmp_path / "d.csv").write_text(
        "k,v\n" + "".join(f"{i},x{i}\n" for i in range(50)))
    (tmp_path / "m.ttl").write_text(f"""
        @prefix rr: <http://www.w3.org/ns/r2rml#> .
        @prefix rml: <http://semweb.mmlab.be/ns/rml#> .
        @prefix ql: <http://semweb.mmlab.be/ns/ql#> .
        @prefix ex: <http://x.org/> .
        <#M> a rr:TriplesMap;
          rml:logicalSource [ rml:source "{tmp_path}/d.csv"; rml:referenceFormulation ql:CSV ];
          rr:subjectMap [ rr:template "http://x.org/r/{{k}}" ];
          rr:predicateObjectMap [ rr:predicate ex:v; rr:objectMap [ rml:reference "v" ] ] .
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
output_format: turtle

[dataset1]
name: big
mapping: {tmp_path}/m.ttl
""")
    engine.semantify(str(tmp_path / "config.ini"), spark)
    text = open(out / "big.ttl").read()
    g = parse_turtle(text)
    assert len(g.triples) == 50


def test_write_ntriples_partitioned_by_predicate(spark, tmp_path):
    """partition_by_predicate lays the output out one directory per
    predicate (the Spark analogue of the reference's mapping_partitions)
    and the union of all partitions equals the unpartitioned output."""
    import glob
    import os

    from sdm_rdfizer_spark.sinks import write_ntriples

    df = spark.createDataFrame(
        [("<http://x/s1>", "<http://x/name>", '"a"', None),
         ("<http://x/s1>", "<http://x/age>", '"3"', None),
         ("<http://x/s2>", "<http://x/name>", '"b"', None)],
        "s string, p string, o string, g string",
    )
    out = str(tmp_path / "out.nt.d")
    write_ntriples(df, out, partition_by_predicate=True)
    dirs = sorted(os.path.basename(d) for d in glob.glob(f"{out}/pred=*"))
    assert dirs == ["pred=http%3A%2F%2Fx%2Fage", "pred=http%3A%2F%2Fx%2Fname"], dirs
    lines = set()
    for f in glob.glob(f"{out}/pred=*/part-*"):
        lines |= set(open(f).read().splitlines())
    assert lines == {
        '<http://x/s1> <http://x/name> "a" .',
        '<http://x/s1> <http://x/age> "3" .',
        '<http://x/s2> <http://x/name> "b" .',
    }


def test_bucketed_tables_join_without_exchange(spark, tmp_path):
    """Two tables bucketed the same way on the join key must sort-merge
    with ZERO exchange — the co-located-join guarantee write_bucketed
    exists for (spark.read.parquet on the same files would re-shuffle
    both sides)."""
    from pyspark.sql import functions as F

    from sdm_rdfizer_spark.sinks import bucketed_table, write_bucketed

    a = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    b = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    write_bucketed(a, "t_bkt_a", ["k"], 4, path=str(tmp_path / "a"))
    write_bucketed(b, "t_bkt_b", ["k"], 4, path=str(tmp_path / "b"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_table(spark, "t_bkt_a").join(
            bucketed_table(spark, "t_bkt_b"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert j.count() == 1000
        # the same files read WITHOUT the bucket spec DO pay exchanges —
        # the metadata, not the layout, carries the guarantee
        p2 = (spark.read.parquet(str(tmp_path / "a"))
              .join(spark.read.parquet(str(tmp_path / "b")), "k")
              ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" in p2, p2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_bkt_a")
        spark.sql("DROP TABLE IF EXISTS t_bkt_b")
