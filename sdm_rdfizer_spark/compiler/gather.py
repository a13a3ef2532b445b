"""RML-CC gather maps: rdf:List / rdf:Bag / rdf:Seq / rdf:Alt construction.

Reference implementation: rdfizer/rdfizer/cc_functions.py:217-536
(gather_triples_generation) and grouping at cc_functions.py:537-552.
Spark shape: per-row item arrays built from the gather term maps (append =
array concat, cartesian = cross product), optional grouping across rows by
the collection-node value (groupBy + collect_list), membership emitted via
posexplode — one shuffle only when grouping is requested.

Blank-node determinism: the reference mints uuid4-per-collection
(cc_functions.py:218), which is non-reproducible and breaks distributed
retries; we derive node ids from md5(subject || predicate) so re-executed
tasks emit identical triples (SURVEY §7 hard part c).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..ir import CONSTANT, REFERENCE, TEMPLATE, GatherMap, TermMap
from .terms import compile_term_map, compile_template, compile_reference

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_FIRST = f"<{RDF}first>"
RDF_REST = f"<{RDF}rest>"
RDF_NIL = f"<{RDF}nil>"
RDF_TYPE = f"<{RDF}type>"


def _item_array(df: DataFrame, gm: GatherMap, base: str | None) -> Column:
    """Per-row array of valid item terms, in gather-list order."""
    items = []
    for tm in gm.gather:
        cv = compile_term_map(df, tm, "object", base=base)
        items.append(F.when(cv.valid, cv.expr))
    arr = F.array(*items) if items else F.array()
    return F.filter(arr, lambda x: x.isNotNull())


def compile_gather(
    df: DataFrame,
    subject: Column,
    subject_valid: Column,
    pred: Column,
    graph: Column,
    gm: GatherMap,
    *,
    base: str | None = None,
    node_term: TermMap | None = None,
) -> DataFrame:
    """Triples DataFrame for one gather-valued POM.

    ``node_term`` is the gather map's own template/reference (the
    collection node); when present, rows sharing a node value are grouped
    (one collection per node), else each row gets its own collection.
    """
    items = _item_array(df, gm, base)

    if node_term is not None and node_term.kind in (TEMPLATE, REFERENCE):
        ncv = compile_term_map(df, node_term, "subject", base=base)
        node = ncv.expr
        rows = df.where(subject_valid & ncv.valid).select(
            subject.alias("s"), pred.alias("p"), graph.cast("string").alias("g"),
            node.alias("node"), items.alias("items"),
        )
        # group across rows: one collection per (s, p, node); item order =
        # gather order within a row, row order by first item (deterministic)
        grouped = (
            rows.select("s", "p", "g", "node", F.posexplode_outer("items").alias("pos", "item"))
            .groupBy("s", "p", "g", "node")
            .agg(F.array_sort(F.collect_list(F.struct("item", "pos"))).alias("sorted"))
            .select(
                "s", "p", "g", "node",
                F.filter(
                    F.transform("sorted", lambda x: x["item"]),
                    lambda x: x.isNotNull(),
                ).alias("items"),
            )
        )
    else:
        # per-row collection with a deterministic blank node; the item
        # values participate in the id so two rows sharing a subject don't
        # collapse into one collection (the reference mints uuid4 per row,
        # cc_functions.py:218 — unique but not reproducible)
        node = F.concat(
            F.lit("_:g"),
            F.md5(F.concat(subject, pred, F.concat_ws("\x1f", items))),
        )
        grouped = df.where(subject_valid).select(
            subject.alias("s"), pred.alias("p"), graph.cast("string").alias("g"),
            node.alias("node"), items.alias("items"),
        )

    empty = F.size("items") == 0
    is_list = gm.gather_as.endswith("List")

    if is_list:
        head_obj = F.when(empty, F.lit(RDF_NIL)).otherwise(
            F.concat(F.lit("_:"), F.md5(F.concat_ws("|", "node", F.lit("0"))))
        )
        head = grouped.where(F.lit(gm.allow_empty) | ~empty).select(
            "s", "p", head_obj.alias("o"), "g"
        )
        cells = grouped.where(~empty).select(
            "node", "g", F.posexplode("items").alias("pos", "item"),
            F.size("items").alias("n"),
        )
        cell_node = F.concat(F.lit("_:"), F.md5(F.concat_ws("|", "node", F.col("pos").cast("string"))))
        next_node = F.when(
            F.col("pos") == F.col("n") - 1, F.lit(RDF_NIL)
        ).otherwise(
            F.concat(F.lit("_:"), F.md5(F.concat_ws("|", "node", (F.col("pos") + 1).cast("string"))))
        )
        firsts = cells.select(cell_node.alias("s"), F.lit(RDF_FIRST).alias("p"),
                              F.col("item").alias("o"), F.col("g"))
        rests = cells.select(cell_node.alias("s"), F.lit(RDF_REST).alias("p"),
                             next_node.alias("o"), F.col("g"))
        return head.union(firsts).union(rests)

    # containers: Bag / Seq / Alt
    keep = grouped.where(F.lit(gm.allow_empty) | ~empty)
    head = keep.select("s", "p", F.col("node").alias("o"), "g")
    types = keep.select(F.col("node").alias("s"), F.lit(RDF_TYPE).alias("p"),
                        F.lit(f"<{gm.gather_as}>").alias("o"), "g")
    members = (
        keep.where(~empty)
        .select("node", "g", F.posexplode("items").alias("pos", "item"))
        .select(
            F.col("node").alias("s"),
            F.concat(F.lit(f"<{RDF}_"), (F.col("pos") + 1).cast("string"), F.lit(">")).alias("p"),
            F.col("item").alias("o"),
            F.col("g"),
        )
    )
    return head.union(types).union(members)
