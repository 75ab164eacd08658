#!/usr/bin/env python
"""Compare two bench JSON artifacts (e.g. BENCH_r04.json vs a fresh run)
and flag per-query regressions beyond a noise threshold.

Usage: python tools/bench_compare.py OLD.json NEW.json [threshold]

The driver's per-round BENCH_r{N}.json parses the bench stdout line; this
tool accepts either that envelope ({"parsed": {...}}-style) or the raw
bench line itself. Queries present on only one side are listed, not
flagged — suite composition legitimately changes between rounds.

Threshold default 1.5 (50% slower): this box's ambient noise spans
±30-80% per SCALE.md, so single-run deltas under ~1.5x are not evidence.
Exit code 1 when any regression exceeds the threshold (CI-able).
"""

from __future__ import annotations

import json
import sys


def _load_queries(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    # unwrap driver envelopes: {"parsed": {...bench line...}} or nested
    for key in ("parsed", "primary"):
        if isinstance(d.get(key), dict) and "queries" in d[key]:
            d = d[key]
            break
    q = d.get("queries")
    if not isinstance(q, dict):
        raise SystemExit(f"{path}: no 'queries' dict found")
    return {k: float(v) for k, v in q.items()}


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old, new = _load_queries(sys.argv[1]), _load_queries(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    flagged = []
    rows = []
    for name in sorted(set(old) | set(new)):
        a, b = old.get(name), new.get(name)
        if a is None or b is None:
            rows.append((name, a, b, None, "only-one-side"))
            continue
        ratio = b / a if a > 0 else float("inf")
        note = ""
        if ratio >= threshold and (b - a) >= 0.5:  # ignore sub-0.5s jitter
            note = "REGRESSION"
            flagged.append(name)
        elif ratio <= 1 / threshold and (a - b) >= 0.5:
            note = "improved"
        rows.append((name, a, b, ratio, note))
    w = max(len(r[0]) for r in rows)
    for name, a, b, ratio, note in rows:
        fa = "-" if a is None else f"{a:7.3f}"
        fb = "-" if b is None else f"{b:7.3f}"
        fr = "  -  " if ratio is None else f"{ratio:5.2f}"
        print(f"{name:<{w}}  {fa}  {fb}  x{fr}  {note}")
    ta, tb = sum(old.values()), sum(new.values())
    print(f"{'TOTAL':<{w}}  {ta:7.3f}  {tb:7.3f}  x{tb / ta:5.2f}")
    if flagged:
        print(f"\nflagged (> {threshold}x and > 0.5s absolute): {flagged}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
