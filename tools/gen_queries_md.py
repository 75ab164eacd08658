#!/usr/bin/env python
"""Regenerate QUERIES.md — one line per registry entry from docstrings."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weather_data_warehouse_aws_spark import queries as registry  # noqa: E402


def main() -> None:
    q, o = registry.collect()
    lines = [
        "# QUERIES — the registry (`__spark_entry__.queries()`)",
        "",
        f"{len(q)} named queries, {len(o)} with DuckDB oracles (hash-checked",
        "at sf0.01 by the driver and tests/test_registry_oracle.py; types by",
        "tests/test_schema_parity.py; re-verified at sf0.1 and under shuffle-",
        "partition/timezone fuzz). One line each, from the implementation docstrings:",
        "",
        "| query | oracle | what it exercises |",
        "|---|---|---|",
    ]
    for name in sorted(q):
        fn = q[name]
        mod = fn.__module__.rsplit(".", 1)[-1]
        doc = (fn.__doc__ or "").strip().splitlines()
        first = doc[0].strip() if doc else ""
        mark = "✓" if name in o else "rows-only"
        lines.append(f"| `{name}` ({mod}) | {mark} | {first} |")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(q)} queries")


if __name__ == "__main__":
    main()
