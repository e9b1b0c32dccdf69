"""Regenerate COVERAGE.md's generated query-index appendix.

COVERAGE.md's prose tables map SURVEY.md §2 operators to code and
proof, but with a 211-query contract the prose alone can drift — a
query can ship without a coverage row and nothing fails (round-11
verdict ask #8). This script rewrites the block between the BEGIN/END
markers with one row per `betl_spark.contract.QUERIES` entry (its
defining contract module + whether it carries a DuckDB oracle), and
`tests/test_coverage_doc.py` asserts the block is in sync and every
cited file path in COVERAGE.md exists — so the coverage map is
generated-and-checked, not hand-maintained.

Usage: PYTHONPATH=/root/repo python scripts/update_coverage_index.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BEGIN = "<!-- BEGIN GENERATED QUERY INDEX (scripts/update_coverage_index.py) -->"
END = "<!-- END GENERATED QUERY INDEX -->"

#: contract submodules in the same precedence order as contract/__init__
MODULES = [
    "tpch", "operators", "scale", "streaming_delta", "pipeline_e2e",
    "round3", "round5", "round6", "round7", "round8", "round9",
    "round10", "round11", "linkage", "round12", "round13", "round14",
]


def build_rows() -> list[str]:
    import importlib

    from betl_spark.contract import ORACLES, QUERIES

    owner: dict[str, str] = {}
    for mod_name in MODULES:
        try:
            mod = importlib.import_module(f"betl_spark.contract.{mod_name}")
        except ModuleNotFoundError:
            continue
        for q in getattr(mod, "QUERIES", {}):
            # Plain assignment, iterating in registration order: on a
            # duplicate name the LAST module wins, matching the _ALL
            # dict-merge precedence in betl_spark/contract/__init__.py.
            owner[q] = f"betl_spark/contract/{mod_name}.py"
    rows = []
    for name in sorted(QUERIES):
        oracle = "yes" if name in ORACLES else "rows-only"
        rows.append(f"| `{name}` | `{owner.get(name, '?')}` | {oracle} |")
    return rows


def main() -> None:
    path = os.path.join(REPO, "COVERAGE.md")
    text = open(path).read()
    rows = build_rows()
    block = "\n".join(
        [
            BEGIN,
            "",
            "| Contract query | Defined in | Oracle |",
            "|---|---|---|",
            *rows,
            "",
            END,
        ]
    )
    if BEGIN in text and END in text:
        head = text.split(BEGIN)[0]
        tail = text.split(END, 1)[1]
        text = head + block + tail
    else:
        text = text.rstrip() + (
            "\n\n## Appendix: contract-query index (GENERATED — run "
            "scripts/update_coverage_index.py)\n\n"
            "One row per `betl_spark.contract.QUERIES` entry; "
            "`tests/test_coverage_doc.py` fails if this block is stale.\n\n"
        ) + block + "\n"
    with open(path, "w") as fh:
        fh.write(text)
    print(f"wrote {len(rows)} query rows to COVERAGE.md")


if __name__ == "__main__":
    main()
