"""On-disk RMLTC conformance fixtures (VERDICT r4 item 3).

Each directory under ``tests/fixtures/rmltc/`` is one test case in the
published kg-construct layout — source file(s) + ``mapping.ttl`` + either
the complete expected ``output.nq`` or an ``expect-error.txt`` marker —
covering the four families the reference's KGCW matrices track
(``kgcw_2025_challenge/SDM-RDFizer_KGCW2025.xlsx`` sheets RML-Core /
RML-STAR / RML-CC / RML-LV): RML Core CSV, RML-star quoted triples,
RML-CC gather collections, and RML-LV logical views.

The sandbox has no network and the reference repo ships only its result
matrices, not the suite's fixture files — so the inputs/mappings here are
reconstructions of the published test-case designs under their official
IDs (see ``tests/fixtures/rmltc/MATRIX.md``), and every ``output.nq`` is
the COMPLETE expected graph: the assertion is sorted canonical N-Quads
equality (blank-node labels canonicalized), not membership, so one extra
or missing triple fails the case.
"""

import os
import re

import pytest

from sdm_rdfizer_spark import materialize

ROOT = os.path.join(os.path.dirname(__file__), "fixtures", "rmltc")
CASES = sorted(d for d in os.listdir(ROOT)
               if os.path.isdir(os.path.join(ROOT, d))
               and not d.startswith("."))

_BNODE_RE = re.compile(r"_:[A-Za-z0-9]+")


def _canon(lines):
    """Sorted lines with blank-node labels rewritten to first-occurrence
    ids (scan order = lines sorted with labels masked), so two outputs
    compare equal iff they are isomorphic modulo bnode naming for the
    small, asymmetric graphs these fixtures produce."""
    masked = sorted(lines, key=lambda l: _BNODE_RE.sub("_:_", l))
    mapping: dict = {}
    out = []
    for line in masked:
        out.append(_BNODE_RE.sub(
            lambda m: mapping.setdefault(m.group(0), f"_:b{len(mapping)}"),
            line))
    return sorted(out)


@pytest.mark.parametrize("case", CASES)
def test_rmltc_case(spark, case):
    d = os.path.join(ROOT, case)
    mapping = open(os.path.join(d, "mapping.ttl")).read()
    err_marker = os.path.join(d, "expect-error.txt")
    if os.path.exists(err_marker):
        needle = open(err_marker).read().strip()
        with pytest.raises(Exception, match=re.escape(needle)):
            materialize(spark, mapping, base_dir=d,
                        missing_policy="abort").collect()
        return
    df = materialize(spark, mapping, base_dir=d, missing_policy="abort")
    got = []
    for r in df.select("s", "p", "o", "g").collect():
        tail = " ." if r["g"] is None else f" {r['g']} ."
        got.append(f"{r['s']} {r['p']} {r['o']}{tail}")
    expected = [l for l in open(os.path.join(d, "output.nq")).read()
                .splitlines() if l.strip()]
    assert _canon(got) == _canon(expected)
