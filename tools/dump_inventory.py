"""Regenerate QUERIES.md: the full registered-query inventory with
oracle status and the first docstring line (scale/semantics note).

Usage: python tools/dump_inventory.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from file_scraper_spark import registry


def first_line(doc: str) -> str:
    text = " ".join(line.strip() for line in doc.strip().splitlines())
    for sep in (". ", " — the", " ("):
        if sep in text and len(text.split(sep)[0]) > 30:
            return text.split(sep)[0].rstrip(".") + "."
    return (text[:140] + "…") if len(text) > 140 else text


def main() -> None:
    registry._ensure_loaded()
    by_module: dict[str, list] = {}
    for name, spec in sorted(registry.REGISTRY.items()):
        module = spec.fn.__module__.rsplit(".", 1)[-1]
        by_module.setdefault(module, []).append((name, spec))
    total = len(registry.REGISTRY)
    with_oracle = sum(1 for s in registry.REGISTRY.values() if s.oracle)
    out = [
        "# QUERIES — registered query inventory",
        "",
        f"{total} queries, {with_oracle} DuckDB-oracle-checked "
        f"(`python tools/dump_inventory.py` regenerates; "
        f"`python tools/check_correctness.py` verifies).",
        "",
    ]
    for module, specs in sorted(by_module.items()):
        out.append(f"## {module} ({len(specs)})\n")
        out.append("| query | check | summary |")
        out.append("|---|---|---|")
        for name, spec in specs:
            check = "oracle" if spec.oracle else "rows-only"
            out.append(f"| `{name}` | {check} | {first_line(spec.doc)} |")
        out.append("")
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "QUERIES.md",
    )
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"QUERIES.md written ({total} queries)")


if __name__ == "__main__":
    main()
