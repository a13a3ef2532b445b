"""Render the per-query sf1 -> sf10 scaling table from two bench JSONs.

Usage: python tools/scale_report.py BENCH_sf1_r05.json BENCH_sf10_r05.json

Prints a markdown table sorted by ratio descending, flagging queries whose
wall-clock grew faster than the data (ratio > 10 on a 10x scale-up) —
those get a plan diagnosis in SCALE.md. Sub-second sf1 timings are noise-
dominated (JVM/task-dispatch floor), so ratios are additionally annotated
with the absolute sf10 cost.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    lo_path, hi_path = sys.argv[1], sys.argv[2]
    lo = json.load(open(lo_path))
    hi = json.load(open(hi_path))
    factor = (hi.get("sf") or 10) / (lo.get("sf") or 1)
    rows = []
    for name, t_hi in hi["queries"].items():
        t_lo = lo["queries"].get(name)
        if t_lo is None:
            continue
        ratio = t_hi / t_lo if t_lo else float("inf")
        rows.append((name, t_lo, t_hi, ratio))
    rows.sort(key=lambda r: -r[3])
    print(f"| query | sf1 (s) | sf10 (s) | ratio ({factor:.0f}x data) |")
    print("|---|---|---|---|")
    flagged = []
    for name, t_lo, t_hi, ratio in rows:
        mark = ""
        # super-linear AND expensive enough that it isn't dispatch noise
        if ratio > factor * 1.2 and t_hi > 5:
            mark = " **superlinear**"
            flagged.append(name)
        print(f"| {name} | {t_lo:.1f} | {t_hi:.1f} | {ratio:.1f}x{mark} |")
    skipped = set(lo.get("skipped", [])) | set(hi.get("skipped", []))
    if skipped:
        print(f"\nskipped at sf10 (documented O(n^2) exact baselines): "
              f"{', '.join(sorted(skipped))}")
    errs = {**lo.get("errors", {}), **hi.get("errors", {})}
    if errs:
        print(f"\nerrors: {errs}")
    if flagged:
        print(f"\nFLAGGED superlinear (>1.2x data growth, >5s): {flagged}",
              file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
