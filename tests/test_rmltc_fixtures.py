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
    """Sorted lines with blank-node labels rewritten by color
    refinement: each bnode's color starts as the sorted multiset of its
    masked lines and is refined three times with its bnode-neighbor
    colors, so structurally distinct nodes get distinct labels even in
    SYMMETRIC graphs (e.g. the cartesian-gather Bags, where several
    nodes share individual masked lines). Nodes still tied after
    refinement are automorphic for these fixture-scale graphs — any
    consistent assignment yields the same line multiset."""
    lines = list(lines)
    masked_line = lambda l: _BNODE_RE.sub("_:_", l)
    by_node: dict = {}
    for l in lines:
        for b in set(_BNODE_RE.findall(l)):
            by_node.setdefault(b, []).append(l)
    color = {b: tuple(sorted(masked_line(l) for l in ls))
             for b, ls in by_node.items()}
    for _ in range(3):
        color = {
            b: (color[b], tuple(sorted(
                (masked_line(l),
                 tuple(sorted(color[o] for o in set(_BNODE_RE.findall(l))
                              if o != b)))
                for l in ls)))
            for b, ls in by_node.items()
        }
    order = sorted(by_node, key=lambda b: (repr(color[b]), sorted(by_node[b])))
    mapping = {b: f"_:b{i}" for i, b in enumerate(order)}
    return sorted(_BNODE_RE.sub(lambda m: mapping[m.group(0)], l)
                  for l in lines)


def _rows_to_nq(df):
    out = []
    for r in df.select("s", "p", "o", "g").collect():
        tail = " ." if r["g"] is None else f" {r['g']} ."
        out.append(f"{r['s']} {r['p']} {r['o']}{tail}")
    return out


def _read_lines(path):
    return [l for l in open(path).read().splitlines() if l.strip()]


@pytest.mark.parametrize("case", CASES)
def test_rmltc_case(spark, case, tmp_path):
    d = os.path.join(ROOT, case)
    mapping = open(os.path.join(d, "mapping.ttl")).read()
    err_marker = os.path.join(d, "expect-error.txt")
    if os.path.exists(err_marker):
        needle = open(err_marker).read().strip()
        with pytest.raises(Exception, match=re.escape(needle)):
            materialize(spark, mapping, base_dir=d,
                        missing_policy="abort").collect()
        return
    targets_dir = os.path.join(d, "targets")
    if os.path.isdir(targets_dir):
        _run_target_case(spark, d, mapping, targets_dir, tmp_path)
        return
    df = materialize(spark, mapping, base_dir=d, missing_policy="abort")
    got = _rows_to_nq(df)
    expected = _read_lines(os.path.join(d, "output.nq"))
    assert _canon(got) == _canon(expected)


def _run_target_case(spark, d, mapping, targets_dir, tmp_path):
    """RML-IO target case (RMLTTC family): the routed frame for each
    logical target must equal ``targets/<local-id>.nq``, AND the
    declared serialization/compression/encoding post-passes must
    round-trip — write_target's file, decompressed and decoded per the
    target spec, holds exactly the expected triples (reference order:
    serialize, then encode, then compress — semantify.py:10013-10088)."""
    import dataclasses
    import gzip as _gzip

    from sdm_rdfizer_spark import materialize_with_targets
    from sdm_rdfizer_spark.sinks import write_target

    main, frames = materialize_with_targets(
        spark, mapping, base_dir=d, missing_policy="abort")
    assert _canon(_rows_to_nq(main)) == \
        _canon(_read_lines(os.path.join(d, "output.nq")))
    by_local = {
        spec.target_id.rsplit("/", 1)[-1].rsplit("#", 1)[-1]: (spec, frame)
        for spec, frame in frames.items()}
    for fname in sorted(os.listdir(targets_dir)):
        local = fname[:-3]
        assert local in by_local, f"no target frame for {local}"
        spec, frame = by_local[local]
        expected = _read_lines(os.path.join(targets_dir, fname))
        assert _canon(_rows_to_nq(frame)) == _canon(expected), local
        if (spec.serialization or "ntriples") not in ("ntriples", "nquads"):
            continue
        out = write_target(frame, dataclasses.replace(
            spec, path=str(tmp_path / os.path.basename(spec.path))))
        raw = open(out, "rb").read()
        comp = (spec.compression or "").lower()
        if comp in ("gzip", "gz"):
            raw = _gzip.decompress(raw)
        enc = (spec.encoding or "").upper().replace("-", "")
        text = raw.decode("utf-16" if enc == "UTF16" else "utf-8")
        got_lines = [l for l in text.splitlines() if l.strip()]
        assert _canon(got_lines) == _canon(expected), \
            f"{local}: serialized file does not round-trip"
