"""Generate QUERIES.md: every driver query, its check mode, and its
docstring summary — the navigation index for the correctness corpus."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as em  # noqa: E402


def main() -> None:
    qs = em.queries()
    oracles = em.oracle_sql()
    lines = [
        "# QUERIES — driver correctness corpus",
        "",
        f"{len(qs)} queries; {len(oracles)} DuckDB-oracle-checked "
        "(row count + schema + order-insensitive value hash at sf0.01), "
        "the rest rows-only with the reason stated in the docstring.",
        "",
        "| query | check | summary |",
        "|---|---|---|",
    ]
    for name, fn in qs.items():
        doc = " ".join((fn.__doc__ or "").split())
        mode = "oracle" if name in oracles else "rows-only"
        lines.append(f"| `{name}` | {mode} | {doc} |")
    with open(os.path.join(REPO, "QUERIES.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote QUERIES.md ({len(qs)} queries, {len(oracles)} oracle)")


if __name__ == "__main__":
    main()
