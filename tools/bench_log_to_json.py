"""Reconstruct a partial bench artifact from a bench.py stderr log.

bench.py writes its JSON artifact only at sweep end, so a sweep killed
by a wall-clock timeout leaves per-query rows in the log but no
artifact. This recovers them honestly: the output carries
``"partial": true`` plus the covered-query count so a truncated sweep
can never masquerade as a full one.

Usage: python tools/bench_log_to_json.py LOGFILE [sf] > partial.json
"""

from __future__ import annotations

import json
import re
import sys


def main() -> int:
    log = open(sys.argv[1], errors="replace").read()
    sf = float(sys.argv[2]) if len(sys.argv) > 2 else None
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    skipped: list[str] = []
    isolated: dict[str, float] = {}
    for m in re.finditer(r"^\[bench\] ([\w.]+): ([0-9.]+)s$", log, re.M):
        timings[m.group(1)] = float(m.group(2))
    for m in re.finditer(r"^\[bench\] ([\w.]+): ERROR (.*)$", log, re.M):
        errors[m.group(1)] = m.group(2)[:200]
    for m in re.finditer(r"^\[bench\] ([\w.]+): SKIPPED$", log, re.M):
        skipped.append(m.group(1))
    for m in re.finditer(
            r"^\[bench\] isolated ([\w.]+): ([0-9.]+)s", log, re.M):
        isolated[m.group(1)] = float(m.group(2))
    out = {
        "metric": "materialization_total",
        "value": round(sum(timings.values()), 2),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "partial": True,
        "n_completed": len(timings),
        "note": "recovered from a timeout-killed sweep log; queries "
                "missing here did not finish",
    }
    if skipped:
        out["skipped"] = sorted(skipped)
    if errors:
        out["errors"] = errors
    if isolated:
        out["isolated"] = isolated
    print(json.dumps(out, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
