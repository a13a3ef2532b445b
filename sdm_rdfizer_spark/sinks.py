"""Triple-DataFrame sinks.

The reference writes N-Triples/Turtle line-by-line on the driver
(reference: rdfizer/rdfizer/semantify.py:9957-9968 dataset sink,
functions.py:394-568 ``turtle_print`` grouped serialization,
semantify.py:10038-10086 re-serialization/compression). Here the N-Triples
render is a distributed ``concat_ws`` text write; Turtle prefix-grouped
output stays a driver-side post-pass by design (SURVEY §7 hard part e).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ntriples_lines(triples: DataFrame) -> DataFrame:
    """Render (s,p,o[,g]) to one N-Triples/N-Quads line per row."""
    cols = triples.columns
    if "g" in cols:
        line = F.when(
            F.col("g").isNotNull(),
            F.concat_ws(" ", "s", "p", "o", "g"),
        ).otherwise(F.concat_ws(" ", "s", "p", "o"))
    else:
        line = F.concat_ws(" ", "s", "p", "o")
    return triples.select(F.concat(line, F.lit(" .")).alias("value"))


def write_ntriples(
    triples: DataFrame,
    path: str,
    *,
    single_file: bool = False,
    compression: str | None = None,
) -> str:
    """Write triples as ``.nt`` text. With ``single_file`` the write is
    coalesced and the part file moved to ``path`` itself (the reference
    always writes one file per dataset; distributed output is the default
    here because a single file is a scale bottleneck)."""
    lines = ntriples_lines(triples)
    if single_file:
        tmp = path + "._spark_tmp"
        writer = lines.coalesce(1).write.mode("overwrite")
        if compression:
            writer = writer.option("compression", compression)
        writer.text(tmp)
        part = glob.glob(os.path.join(tmp, "part-*"))[0]
        shutil.move(part, path)
        shutil.rmtree(tmp, ignore_errors=True)
        return path
    writer = lines.write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.text(path)
    return path


def to_turtle(triples: DataFrame, prefixes: dict[str, str] | None = None, limit: int | None = None) -> str:
    """Driver-side Turtle serialization with subject/predicate grouping
    (``;`` / ``,`` continuations — the shape of the reference's
    ``turtle_print``, functions.py:394-568). Only for small outputs /
    debugging; the scalable sink is N-Triples."""
    prefixes = prefixes or {}
    rows = triples.select("s", "p", "o").collect() if limit is None else \
        triples.select("s", "p", "o").limit(limit).collect()
    by_subject: dict[str, dict[str, list[str]]] = {}
    for r in rows:
        by_subject.setdefault(r["s"], {}).setdefault(r["p"], []).append(r["o"])

    def shorten(term: str) -> str:
        if term.startswith("<") and term.endswith(">"):
            iri = term[1:-1]
            for pfx, ns in prefixes.items():
                if iri.startswith(ns) and "/" not in iri[len(ns):] and "#" not in iri[len(ns):]:
                    return f"{pfx}:{iri[len(ns):]}"
        return term

    out = []
    for pfx, ns in sorted(prefixes.items()):
        out.append(f"@prefix {pfx}: <{ns}> .")
    if prefixes:
        out.append("")
    for s in sorted(by_subject):
        preds = by_subject[s]
        plines = []
        for p in sorted(preds):
            objs = ", ".join(sorted(preds[p]))
            plines.append(f"\t{shorten(p)} {objs}")
        out.append(shorten(s) + "\n" + " ;\n".join(plines) + " .")
    return "\n".join(out) + "\n"
