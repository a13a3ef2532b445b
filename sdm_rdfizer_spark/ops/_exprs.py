"""Column-expression construction helpers shared by the ops modules.

Building a literal array as ``F.array(*[F.lit(x) for x in xs])`` costs
one py4j socket round trip PER ELEMENT (plus one per ``array``/``lit``
wrapper) — for the hyperplane tables, stopword lists and PQ codebooks
that ride query plans as literals this is hundreds of driver round
trips per query build (profiled: ~75% of multi-literal plan build time
is socket wait). ``lit_array`` renders the whole array as ONE SQL
expression text and parses it with a single ``F.expr`` call.

Value fidelity: doubles are rendered with ``repr`` (shortest
round-trip form) and parsed back via ``CAST('…' AS DOUBLE)`` — both
Python's repr and the JVM parse are correctly rounded, so the double
that reaches the plan is BIT-IDENTICAL to the Python float. Strings
are quoted with backslash/quote escaping; ints render exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _sql_str(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def lit_array(values, sql_type: str = "DOUBLE") -> Column:
    """One-round-trip literal array Column of ``sql_type`` elements.

    ``sql_type``: 'DOUBLE' (values rendered via repr + CAST — bit-exact,
    including non-finite values: Python renders them 'nan'/'inf', which
    Java's Double.parseDouble would NULL out under the non-ANSI cast, so
    they are special-cased to the 'NaN'/'Infinity' spellings the JVM
    parses — ADVICE r10 #1), 'STRING' (escaped quotes), or an integer
    type name ('INT'/'BIGINT').
    """
    import math

    t = sql_type.upper()
    if not values:
        return F.expr(f"CAST(array() AS ARRAY<{t}>)")
    if t == "DOUBLE":
        def _d(v) -> str:
            f = float(v)
            if math.isnan(f):
                return "CAST('NaN' AS DOUBLE)"
            if math.isinf(f):
                return ("CAST('Infinity' AS DOUBLE)" if f > 0
                        else "CAST('-Infinity' AS DOUBLE)")
            return f"CAST({_sql_str(repr(f))} AS DOUBLE)"

        parts = [_d(v) for v in values]
    elif t == "STRING":
        parts = [_sql_str(str(v)) for v in values]
    else:
        parts = [f"CAST({int(v)} AS {t})" for v in values]
    return F.expr("array(" + ", ".join(parts) + ")")
