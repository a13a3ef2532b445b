"""HTTP service parity with the reference's Flask app (app.py:1-17)."""

import urllib.request

from sdm_rdfizer_spark.webapi import GREETING, start_background


def test_webapi_graph_creation(spark, tmp_path):
    (tmp_path / "d.csv").write_text("k,v\na,1\n")
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

[dataset1]
name: api
mapping: {tmp_path}/m.ttl
""")
    srv = start_background(spark)
    try:
        base = f"http://127.0.0.1:{srv.server_port}"
        assert urllib.request.urlopen(base + "/").read().decode() == GREETING
        cfg = str(tmp_path / "config.ini").lstrip("/")
        resp = urllib.request.urlopen(f"{base}/graph_creation/{cfg}")
        assert resp.status == 200
        assert "semantified" in resp.read().decode()
        text = open(out / "api.nt").read()
        assert '<http://x.org/r/a> <http://x.org/v> "1" .' in text
        # unknown route -> 404; bad config -> 500
        try:
            urllib.request.urlopen(base + "/nope")
            assert False
        except urllib.error.HTTPError as e:
            assert e.code == 404
        try:
            urllib.request.urlopen(base + "/graph_creation/does/not/exist.ini")
            assert False
        except urllib.error.HTTPError as e:
            assert e.code == 500
    finally:
        srv.shutdown()
