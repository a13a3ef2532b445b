"""Plan-shape regression guards: the expensive queries must keep the
plans the r2 audit established (broadcast joins, no per-branch recompute
of gather subplans, shuffle-free text ops)."""

import os

import pytest


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def entry(spark):
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as E
    return E


SF = "/root/testdata/sf0.001"


def test_gather_join_single_pass(spark, entry):
    """One scan, one broadcast join, no sort-merge, ≤4 shuffles (parent
    group agg, node grouping, final distinct) — the union-of-branches
    shape had 10 shuffles and 3 broadcasts."""
    plan = _plan(entry.queries()["rml_gather_join"](spark, SF))
    assert plan.count("BroadcastHashJoin") == 1
    assert "SortMergeJoin" not in plan
    shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert shuffles <= 4, plan


def test_customer_graph_broadcasts_parents(spark, entry):
    plan = _plan(entry.queries()["rml_customer_graph"](spark, SF))
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 1


def test_text_ops_shuffle_free(spark, entry):
    for q in ("text_token_count", "text_quality", "text_language_id",
              "text_fingerprint", "text_repetition"):
        plan = _plan(entry.queries()[q](spark, SF))
        assert "Exchange" not in plan, q


def test_parquet_scan_prunes_columns(spark, entry):
    """Column pruning reaches the scan: the token-count query reads only
    doc_id + text from the documents table."""
    plan = _plan(entry.queries()["text_token_count"](spark, SF))
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan and "lang" not in scan[0] and "source" not in scan[0]


def test_reference_dedup_scope_single_shuffle(spark, tmp_path):
    """dedup_scope="reference" (per-rule PTT keying) must stay ONE
    dedup shuffle — the rule tag rides the explode structs, it must not
    introduce extra exchanges or branches."""
    from sdm_rdfizer_spark import materialize

    (tmp_path / "d.csv").write_text("id,v\n1,a\n2,b\n")
    m = f"""
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix rml: <http://semweb.mmlab.be/ns/rml#> .
@prefix ql: <http://semweb.mmlab.be/ns/ql#> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix ex: <http://x.org/> .
<#M> a rr:TriplesMap;
  rml:logicalSource [ rml:source "{tmp_path}/d.csv"; rml:referenceFormulation ql:CSV ];
  rr:subjectMap [ rr:template "http://x.org/i/{{id}}" ];
  rr:predicateObjectMap [ rr:predicate ex:v; rr:objectMap [ rml:reference "v" ] ];
  rr:predicateObjectMap [ rr:predicate owl:sameAs; rr:objectMap [
      rr:template "http://x.org/c/{{v}}" ] ] .
"""
    for scope in ("spog", "reference"):
        df = materialize(spark, m, dedup_scope=scope)
        plan = _plan(df)
        shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
        assert shuffles <= 1, (scope, plan)
        assert df.columns == ["s", "p", "o", "g"]


def test_xml_sample_scan_single_filescan(spark, tmp_path):
    """The distributed XML scan reads its source file once in the plan
    (r2 judge: the key-discovery pass doubled I/O)."""
    from sdm_rdfizer_spark import materialize

    (tmp_path / "c.xml").write_text(
        "<c>" + "".join(f'<i k="{n}">x</i>' for n in range(40)) + "</c>")
    m = f"""
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix rml: <http://semweb.mmlab.be/ns/rml#> .
@prefix ql: <http://semweb.mmlab.be/ns/ql#> .
@prefix ex: <http://x.org/> .
<#M> a rr:TriplesMap;
  rml:logicalSource [ rml:source "{tmp_path}/c.xml"; rml:referenceFormulation ql:XPath;
                      rml:iterator "/c/i" ];
  rr:subjectMap [ rr:template "http://x.org/i/{{k}}" ];
  rr:predicateObjectMap [ rr:predicate ex:t; rr:objectMap [ rml:reference "#text" ] ] .
"""
    plan = _plan(materialize(spark, m))
    assert plan.count("FileScan") == 1, plan


def test_sampling_is_pure_filter(spark, entry):
    """Deterministic sampling compiles to a filter over the scan — no
    shuffle, no Python, and column pruning still reaches the scan."""
    for q in ("sample_stratified",):
        plan = _plan(entry.queries()[q](spark, SF))
        assert "Exchange" not in plan, q
        scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
        assert scan and "text" not in scan[0]  # text column pruned away


def test_pii_scrub_shuffle_free(spark, entry):
    plan = _plan(entry.queries()["text_pii_scrub"](spark, SF))
    assert "Exchange" not in plan


def test_dedup_spans_shuffle_budget(spark, entry):
    """Span dedup: ONE corpus scan (posexplode_outer, no join-back that
    would re-read the text column), window shuffle on the span hash +
    reassembly groupBy — no join, nothing quadratic."""
    plan = _plan(entry.queries()["dedup_spans"](spark, SF))
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert plan.count("FileScan") == 1, plan
    shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert shuffles <= 2, plan


def test_tfidf_skew_safe_shuffles(spark, entry):
    """TF-IDF: tf agg + vocab-sized df agg + tf⋈df join + top-k window.
    There must be NO count-window partitioned by term (a hot term would
    buffer in one task); the doc count arrives as a broadcast
    cross-join; the only Window is the per-doc top-k, with its partial
    WindowGroupLimit pushed below the shuffle."""
    plan = _plan(entry.queries()["text_tfidf_topk"](spark, SF))
    shuffles = (plan.count("Exchange") - plan.count("BroadcastExchange")
                - plan.count("Exchange SinglePartition"))  # scalar N count
    assert shuffles <= 4, plan
    assert plan.count("Window ") == 1, plan  # only the doc top-k window
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row N cross join
    # Spark 4 pushes the top-k cut below the doc shuffle: only ≤k rows
    # per (doc, input partition) reach the final window
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_corpus_stats_single_partial_agg(spark, entry):
    """corpus_stats is one hash aggregation with a map-side partial:
    exactly 1 shuffle, HashAggregate above and below it."""
    plan = _plan(entry.queries()["corpus_stats"](spark, SF))
    shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert shuffles == 1, plan
    assert plan.count("HashAggregate") >= 2


def test_decontaminate_broadcasts_benchmark(spark, entry):
    """The benchmark shingle set must broadcast (eval sets are small);
    the corpus side must not shuffle for the join — only the final
    doc-grain aggregation shuffles the (bounded) hit stream."""
    plan = _plan(entry.queries()["text_decontaminate"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_asof_join_no_nested_loop(spark, entry):
    """The as-of join must compile to union + running window — a single
    shuffle on the by-keys, never a BroadcastNestedLoopJoin (what Spark
    does with a raw range predicate)."""
    plan = _plan(entry.queries()["events_asof_join"](spark, SF))
    assert "NestedLoop" not in plan, plan
    assert "Window" in plan


def test_interval_join_is_equi_join(spark, entry):
    """The range-containment join must reach the join operator as an
    equi-join on (keys, bucket) — no nested loop, no cartesian."""
    plan = _plan(entry.queries()["events_interval_join"](spark, SF))
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan


def test_funnel_single_shuffle(spark, entry):
    """The chained conditional-min windows all partition on user_id —
    ENSURE_REQUIREMENTS must reuse one exchange, plus the final
    per-user dedup: ≤2 shuffles, no joins."""
    plan = _plan(entry.queries()["events_funnel"](spark, SF))
    shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert shuffles <= 2, plan
    assert "Join" not in plan


def test_corpus_pipeline_shuffle_budget(spark, entry):
    """Composed pipeline: row-local stages fused into the scans, one
    fingerprint window shuffle + one doc_id join — no cartesian, no
    nested loop."""
    plan = _plan(entry.queries()["corpus_pipeline"](spark, SF))
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert shuffles <= 4, plan


def test_lineitem_wide_single_scan_one_shuffle(spark, entry):
    """The wide-POM anchor: 9 POMs + rdf:type must come from ONE
    lineitem scan (single explode pass, not a scan per POM) with the
    global dedup as the only shuffle. The dedup-elision proof must NOT
    fire here: the synthetic lineitem's (l_orderkey, l_linenumber) is
    deliberately non-unique, so the distinct genuinely collapses rows —
    the uniqueness probe catches that (rml_orders_wide is the
    elision-eligible counterpart)."""
    plan = _plan(entry.queries()["rml_lineitem_wide"](spark, SF))
    assert plan.count("FileScan") == 1, plan
    shuffles = (plan.count("Exchange") - plan.count("BroadcastExchange")
                # the documented row-group parallelism primer on tiny
                # local files (sources.py) — not a keyed shuffle
                - plan.count("Exchange RoundRobinPartitioning"))
    assert shuffles == 1, plan


def test_orders_wide_elides_dedup_shuffle(spark, entry):
    """Wide projection over a PROVABLY unique subject key (o_orderkey):
    the dedup-elision proof removes the distinct, leaving a completely
    shuffle-free materialization plan."""
    plan = _plan(entry.queries()["rml_orders_wide"](spark, SF))
    assert plan.count("FileScan") == 1, plan
    shuffles = (plan.count("Exchange") - plan.count("BroadcastExchange")
                - plan.count("Exchange RoundRobinPartitioning"))
    assert shuffles == 0, plan


def test_chunk_documents_shuffle_free(spark, entry):
    """Chunking is sequence → posexplode → substring: a narrow plan with
    no exchange at all — chunk parallelism = scan parallelism."""
    plan = _plan(entry.queries()["text_chunk_documents"](spark, SF))
    assert "Exchange" not in plan, plan


def test_sequence_pack_single_shard_shuffle(spark, entry):
    """Packing shuffles ONCE on the shard key (the window partition);
    the shard count caps window skew, and there is no global sort."""
    plan = _plan(entry.queries()["sample_sequence_pack"](spark, SF))
    shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert shuffles == 1, plan
    assert "rangepartitioning" not in plan.lower(), plan


def test_sliding_window_expand_before_partial_agg(spark, entry):
    """The window fan-out (Expand) must precede a partial aggregation so
    the shuffle carries (window, type) partials, not exploded events."""
    plan = _plan(entry.queries()["events_sliding_window"](spark, SF))
    assert "Expand" in plan
    shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert shuffles == 1, plan
    # toString prints top-down (final agg, exchange, partial agg,
    # Expand, scan): the LAST HashAggregate printed is the partial one
    # and must sit between the exchange and the Expand
    expand_pos = plan.index("Expand")
    exchange_pos = plan.index("Exchange")
    partial_pos = plan.rindex("HashAggregate")
    assert exchange_pos < partial_pos < expand_pos, plan


def test_semantic_dedup_small_k_exact_plan(spark, entry):
    """Small-cell-count semantic dedup: the intra-cell self-join stays a
    cell equi-join (no cartesian/nested-loop), and the keep join against
    the (small) duplicate-id set broadcasts."""
    plan = _plan(entry.queries()["dedup_semantic"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 1, plan


def test_similarity_join_banding_equi_join(spark, entry):
    """Cross-corpus similarity join: candidates come from an equi-join
    on the (band, band-hash) key — never a cartesian — and the verify
    stage's id joins stay equi-joins."""
    plan = _plan(entry.queries()["dedup_similarity_join"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_gtfs_files_matches_tabular_shape(spark, entry):
    """The all-JSONL files track must get the SAME dedup-elision plan as
    the all-CSV tabular track (r9: the driver-side uniqueness/injectivity
    probes read flat line-JSON through DuckDB read_json, so per-branch
    distincts elide and dimension parents broadcast without a parent-
    pairs dedup exchange — a JSON source is not a reason to shuffle)."""
    plans = {}
    for q in ("rml_gtfs_files", "rml_gtfs_tabular"):
        p = _plan(entry.queries()[q](spark, SF))
        plans[q] = (p.count("Exchange hashpartitioning"),
                    p.count("BroadcastExchange"),
                    p.count("SortMergeJoin"))
    assert plans["rml_gtfs_files"] == plans["rml_gtfs_tabular"], plans
    assert plans["rml_gtfs_files"][2] == 0
    assert plans["rml_gtfs_files"][0] <= 3


def test_source_matrix_label_rides_existing_shuffles(spark, entry):
    """dedup_source_matrix threads the source label through the
    signature/band pipeline via carry_cols, so the ONLY join in the plan
    is the band self-join — no id-keyed join back to the corpus to
    recover group labels (the pre-carry shape paid one per side)."""
    plan = _plan(entry.queries()["dedup_source_matrix"](spark, SF))
    joins = (plan.count("BroadcastHashJoin") + plan.count("SortMergeJoin")
             + plan.count("ShuffledHashJoin"))
    assert joins == 1, plan
    keyed = plan.count("Exchange hashpartitioning")
    # 2 signature aggs (one per self-join side) + pair groupBy + matrix
    # groupBy; anything above means a label join crept back in
    assert keyed <= 4, plan


def test_exact_substr_two_shuffles_no_join(spark, entry):
    """dedup_exact_substr: window-count over md5(window) replaces a
    count+join-back (one fp shuffle), then ONE doc-keyed shuffle that
    the lag window, the islands sum window, and both rollup groupBys
    all reuse (doc_id is a prefix of every later key)."""
    plan = _plan(entry.queries()["dedup_exact_substr"](spark, SF))
    assert plan.count("Join") == 0, plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_dsir_log_ratio_side_broadcasts(spark, entry):
    """sample_dsir_weights: the log-ratio table (<= n_buckets rows) must
    reach the corpus via broadcast — never a corpus-sized shuffle join —
    and nothing sort-merges."""
    plan = _plan(entry.queries()["sample_dsir_weights"](spark, SF))
    assert plan.count("SortMergeJoin") == 0, plan
    assert plan.count("BroadcastHashJoin") >= 1, plan


def test_bucketed_index_join_pays_no_corpus_shuffle(spark, entry):
    """dedup_bucketed_index: the doc_id join between the two bucketed
    tables must read pre-partitioned buckets — the only keyed exchange
    in the whole plan is the tiny per-source rollup."""
    plan = _plan(entry.queries()["dedup_bucketed_index"](spark, SF))
    assert plan.count("Exchange hashpartitioning") <= 1, plan
