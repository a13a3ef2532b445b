"""FNML function application → Column expressions.

Parameter binding mirrors the reference's ``execution_dic``
(rdfizer/rdfizer/fnml_functions.py:234-302): parameters are keyed by the
IRI local name; constant / reference / template / nested-function values
are resolved against the row. Nested composition
(mapping_functions.py:10-103) is plain recursion here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import FUNCTION_BUILDERS, bool_to_term, local_name
from ..ir import FunctionMap
from .terms import (
    CompiledValue, ExprLayers, _canon, compile_template, valid_value,
)

# functions whose result is boolean (term position renders "True"/"False")
BOOL_FUNCS = {"string_contains", "equal", "notEqual", "isNull", "listContainsElement"}


def compile_function(
    df: DataFrame,
    fm: FunctionMap,
    func_maps: dict[str, FunctionMap],
    *,
    base: str | None = None,
    as_condition: bool = False,
    layers: ExprLayers | None = None,
) -> CompiledValue:
    params: dict = {}
    for param_iri, desc in fm.parameters.items():
        key = local_name(param_iri)
        kind = desc.get("type")
        value = desc.get("value", "")
        if kind == "constant":
            params[key] = (F.lit(value), F.lit(True))
            if key == "pattern":
                params["__pattern_const"] = value
        elif kind == "reference":
            raw = _canon(df, value, layers)
            params[key] = (raw, valid_value(raw))
        elif kind == "template":
            cv = compile_template(df, value, encode=False, layers=layers)
            params[key] = (cv.expr, cv.valid)
        elif kind == "function":
            nested = desc.get("nested") or func_maps.get(value)
            ncv = compile_function(df, nested, func_maps, base=base, layers=layers)
            params[key] = (ncv.expr, ncv.valid)
        else:
            params[key] = (F.lit(value), F.lit(True))

    name = local_name(fm.name)
    builder = FUNCTION_BUILDERS.get(name)
    if builder is None:
        raise NotImplementedError(
            f"FnO function {fm.name!r} not registered; add it via "
            f"sdm_rdfizer_spark.functions.register_function"
        )
    if name == "parseURL":
        output = local_name(fm.return_iri) if fm.return_iri else "stringOutput"
        expr, valid = builder(params, output=output)
    else:
        expr, valid = builder(params)

    if as_condition:
        return CompiledValue(expr.cast("boolean"), valid)
    if name in BOOL_FUNCS:
        expr = bool_to_term(expr)
    return CompiledValue(expr, valid & expr.isNotNull())
