"""RML-CC gather maps: rdf:List / rdf:Bag / rdf:Seq / rdf:Alt construction.

Reference implementation: rdfizer/rdfizer/cc_functions.py:217-536
(gather_triples_generation), subject-position gathers at
cc_functions.py:121-216 (gather_subject), parent-TM items with join at
cc_functions.py:13-120 + 340-346 (hash_maker_cc / "join" items), the
cartesian strategy at cc_functions.py:499-536.

Spark shape: per-row item ARRAYS built from the gather term maps — a
scalar term contributes 0/1 items, an array-typed reference contributes
all its elements, a parent-triples-map item contributes every joined
parent subject (planner-provided left join against grouped parent pairs).
``append`` concatenates the arrays in gather order; ``cartesian`` explodes
the cross product into one collection per combination. Optional grouping
across rows by the collection-node value (groupBy + collect_list);
membership emitted via posexplode — shuffles only when grouping or a
parent join requires one.

Blank-node determinism: the reference mints uuid4-per-collection
(cc_functions.py:218), which is non-reproducible and breaks distributed
retries; we derive node ids from md5(subject || predicate || items) so
re-executed tasks emit identical triples (SURVEY §7 hard part c). Joined
parent items are array_sort-ed (the reference's dict order is source-row
order — RML-CC leaves cross-row item order undefined).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..ir import CONSTANT, PARENT, QUOTED, REFERENCE, TEMPLATE, GatherMap, TermMap
from .terms import compile_term_map

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_FIRST = f"<{RDF}first>"
RDF_REST = f"<{RDF}rest>"
RDF_NIL = f"<{RDF}nil>"
RDF_TYPE = f"<{RDF}type>"

EMPTY = F.array().cast("array<string>")


def _term_value_array(df: DataFrame, tm: TermMap, base: str | None) -> Column:
    """Item values one gather term map contributes for a row, as an array.

    A reference to an ARRAY column yields every element as a quoted
    literal (the reference's string_substitution_json returns a list,
    cc_functions.py:269-275); scalars yield a 0/1-element array.
    """
    if tm.kind == REFERENCE:
        dtype = dict(df.dtypes).get(tm.value, "")
        if dtype.startswith("array"):
            return F.filter(
                F.transform(
                    F.col(tm.value),
                    lambda e: F.concat(F.lit('"'), e.cast("string"), F.lit('"')),
                ),
                lambda x: x.isNotNull(),
            )
    cv = compile_term_map(df, tm, "object", base=base)
    return F.when(cv.valid, F.array(cv.expr)).otherwise(EMPTY)


def _item_arrays(
    df: DataFrame, gm: GatherMap, base: str | None, parent_items,
) -> tuple[DataFrame, list[Column]]:
    """One value-array per gather item (in gather order). PARENT-kind
    items left-join the planner's grouped parent pairs into ``df``."""
    arrays: list[Column] = []
    cur = df
    for item in gm.gather:
        if item.kind in (PARENT, QUOTED):
            if parent_items is None:
                raise NotImplementedError(
                    "parent-triples-map gather items need a planner context")
            cur, arr = parent_items(cur, item)
        else:
            arr = _term_value_array(cur, item, base)
        arrays.append(arr)
    return cur, arrays


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
    parent_items=None,
    as_subject: bool = False,
) -> DataFrame:
    """Triples DataFrame for one gather map.

    ``node_term`` is the gather map's own template/reference (the
    collection node); when present, rows sharing a node value are grouped
    (one collection per node), else each row gets its own collection.
    With ``as_subject`` the collection node IS the triples-map subject
    (reference gather_subject): no head triple is emitted and membership
    hangs directly off ``subject``.
    """
    df, arrays = _item_arrays(df, gm, base, parent_items)

    if gm.strategy == "cartesian" and len(arrays) >= 2 and not as_subject:
        # one collection per combination of item values
        # (cc_functions.py:499-536, generalized to N item terms)
        combos = F.transform(arrays[0], lambda x: F.array(x))
        for arr in arrays[1:]:
            nxt = arr
            combos = F.flatten(
                F.transform(combos,
                            lambda c: F.transform(nxt, lambda y: F.concat(c, F.array(y))))
            )
        grouped = (
            df.where(subject_valid)
            .select(subject.alias("s"), pred.alias("p"),
                    graph.cast("string").alias("g"),
                    F.explode(combos).alias("items"))
            .withColumn("node", F.concat(
                F.lit("_:g"),
                F.md5(F.concat(F.col("s"), F.col("p"),
                               F.concat_ws("\x1f", F.col("items")))),
            ))
            .select("s", "p", "g", "node", "items")
        )
        return _emit(grouped, gm, as_subject=False)

    items = F.array_compact(F.flatten(F.array(*arrays))) if arrays else EMPTY

    if as_subject:
        grouped = df.where(subject_valid).select(
            subject.alias("node"), graph.cast("string").alias("g"),
            items.alias("items"),
        ).withColumn("s", F.col("node")).withColumn("p", F.lit(None).cast("string"))
        return _emit(grouped, gm, as_subject=True)

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
    return _emit(grouped, gm, as_subject=False)


def _emit(grouped: DataFrame, gm: GatherMap, *, as_subject: bool) -> DataFrame:
    """(s, p, g, node, items) rows → collection triples."""
    empty = F.size("items") == 0
    is_list = gm.gather_as.endswith("List")

    if is_list:
        cells = grouped.where(~empty).select(
            "node", "g", F.posexplode("items").alias("pos", "item"),
            F.size("items").alias("n"),
        )
        derived = F.concat(F.lit("_:"), F.md5(F.concat_ws("|", "node", F.col("pos").cast("string"))))
        # subject-position lists: the subject itself is the first cell
        cell_node = F.when(F.col("pos") == 0, F.col("node")).otherwise(derived) \
            if as_subject else derived
        next_node = F.when(
            F.col("pos") == F.col("n") - 1, F.lit(RDF_NIL)
        ).otherwise(
            F.concat(F.lit("_:"), F.md5(F.concat_ws("|", "node", (F.col("pos") + 1).cast("string"))))
        )
        firsts = cells.select(cell_node.alias("s"), F.lit(RDF_FIRST).alias("p"),
                              F.col("item").alias("o"), F.col("g"))
        rests = cells.select(cell_node.alias("s"), F.lit(RDF_REST).alias("p"),
                             next_node.alias("o"), F.col("g"))
        if as_subject:
            return firsts.union(rests)
        head_obj = F.when(empty, F.lit(RDF_NIL)).otherwise(
            F.concat(F.lit("_:"), F.md5(F.concat_ws("|", "node", F.lit("0"))))
        )
        head = grouped.where(F.lit(gm.allow_empty) | ~empty).select(
            "s", "p", head_obj.alias("o"), "g"
        )
        return head.union(firsts).union(rests)

    # containers: Bag / Seq / Alt
    keep = grouped.where(F.lit(gm.allow_empty) | ~empty)
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
    if as_subject:
        return types.union(members)
    head = keep.select("s", "p", F.col("node").alias("o"), "g")
    return head.union(types).union(members)
