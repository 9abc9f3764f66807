"""Generate OPERATORS.md: the registry-derived index of every declared
query — module, oracle status, recorded-window membership, and the
first docstring line. Regenerate after adding operators:

    python scripts/gen_operators_md.py
"""

from __future__ import annotations

import sys
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyanamo_spark.registry import (
    DECLARED,
    ORACLES,
    QUERIES,
    ROWS_ONLY_REASONS,
    load_all,
)


def first_line(doc: str | None) -> str:
    if not doc:
        return ""
    # first sentence, collapsed to one line
    text = " ".join(doc.strip().split())
    for stop in (". ", ".\n"):
        if stop in text:
            return text[: text.index(stop) + 1]
    if len(text) <= 160:
        return text
    return text[:160].rsplit(" ", 1)[0] + "…"


def main() -> int:
    load_all()
    by_module: dict[str, list[str]] = defaultdict(list)
    for name, fn in QUERIES.items():
        mod = getattr(fn, "__wrapped__", fn).__module__
        by_module[mod].append(name)

    lines = [
        "# Operator index (generated)",
        "",
        "Every declared query id, grouped by module. `oracle` = the",
        "driver checks a DuckDB oracle hash; `rows-only` = contractual",
        "weaker check (seeded randomness / not SQL-expressible), backed",
        "by behavioral tests. `window` = in the current 50-seat",
        "driver-recorded DECLARED window. Regenerate with",
        "`python scripts/gen_operators_md.py`.",
        "",
        f"**{len(QUERIES)} queries, {len(ORACLES)} oracle-checked, "
        f"{len(QUERIES) - len(ORACLES)} rows-only.**",
        "",
    ]
    window = set(DECLARED[:50])
    for mod in sorted(by_module):
        lines.append(f"## {mod}")
        lines.append("")
        lines.append("| query | check | window | what |")
        lines.append("|---|---|---|---|")
        for name in sorted(by_module[mod]):
            check = "oracle" if name in ORACLES else "rows-only"
            w = "yes" if name in window else ""
            doc = first_line(QUERIES[name].__doc__).replace("|", "\\|")
            lines.append(f"| {name} | {check} | {w} | {doc} |")
        lines.append("")
    lines += [
        "## Why rows-only",
        "",
        "Each oracle-less query documents why no cross-engine hash",
        "check is possible and what pins its semantics instead",
        "(enforced by tests/test_registry_contract.py).",
        "",
        "| query | reason |",
        "|---|---|",
    ]
    for name in sorted(ROWS_ONLY_REASONS):
        lines.append(
            f"| {name} | {ROWS_ONLY_REASONS[name]} |"
        )
    lines.append("")
    (REPO / "OPERATORS.md").write_text("\n".join(lines))
    print(f"OPERATORS.md: {len(QUERIES)} queries across {len(by_module)} modules")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
