#!/usr/bin/env python
"""Regenerate QUERIES.md — the auto-generated index of every
registered query (one row per (Spark builder, DuckDB oracle) pair,
grouped by defining module). Run from the repo root:

    python tools/gen_queries_md.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from takuan_spark.queries import REGISTRY, _load

    _load()
    bymod: dict[str, list[tuple[str, str]]] = {}
    for name, spec in REGISTRY.items():
        inner = getattr(spec.builder, "__wrapped__", spec.builder)
        mod = inner.__module__.split(".")[-1]
        bymod.setdefault(mod, []).append((name, spec.description))

    lines = [
        "# QUERIES — the registered query surface\n",
        "Auto-generated index of every registered query "
        "(`takuan_spark/queries/`): one row per (Spark builder, "
        "DuckDB oracle) pair, grouped by defining module. "
        "Regenerate with `python tools/gen_queries_md.py`.\n",
    ]
    total = 0
    for mod in sorted(bymod):
        entries = bymod[mod]
        total += len(entries)
        lines.append(f"\n## {mod} ({len(entries)})\n")
        for name, desc in entries:
            d = " ".join((desc or "").split())
            if len(d) > 220:
                d = d[:217] + "..."
            lines.append(f"- **{name}** — {d}")
    lines.append(f"\n_Total: {total} queries, all oracle-paired._")
    out = os.path.join(REPO, "QUERIES.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {total} queries")


if __name__ == "__main__":
    main()
