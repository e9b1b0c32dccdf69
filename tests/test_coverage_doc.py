"""COVERAGE.md is generated-and-checked (round-11 verdict ask #8).

Three drift guards so the coverage map cannot rot as the contract
grows:

1. every `betl_spark.contract.QUERIES` entry has a row in the
   generated appendix (a query shipped without running
   ``scripts/update_coverage_index.py`` fails here);
2. the generated appendix has no rows for queries that no longer
   exist (stale rows fail);
3. every ``file.py`` / ``file.py:line`` citation anywhere in
   COVERAGE.md points at an existing file (and the file really has
   that many lines), and every cited ``betl_spark`` module imports.
"""

from __future__ import annotations

import importlib
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
COV_PATH = os.path.join(REPO, "COVERAGE.md")


def _coverage_text() -> str:
    with open(COV_PATH) as fh:
        return fh.read()


def _index_rows(text: str) -> dict[str, str]:
    m = re.search(
        r"BEGIN GENERATED QUERY INDEX.*?-->(.*?)<!-- END GENERATED",
        text,
        re.S,
    )
    assert m, "COVERAGE.md is missing the generated query-index block"
    rows = {}
    for line in m.group(1).splitlines():
        cells = re.match(r"\| `([^`]+)` \| `([^`]+)` \| (\S+) \|", line)
        if cells:
            rows[cells.group(1)] = (cells.group(2), cells.group(3))
    return rows


def test_every_contract_query_has_a_coverage_row():
    from betl_spark.contract import QUERIES

    rows = _index_rows(_coverage_text())
    missing = sorted(set(QUERIES) - set(rows))
    assert not missing, (
        f"{len(missing)} contract queries lack a COVERAGE.md row "
        f"(run scripts/update_coverage_index.py): {missing[:10]}"
    )


def test_coverage_index_has_no_stale_rows():
    from betl_spark.contract import ORACLES, QUERIES

    rows = _index_rows(_coverage_text())
    stale = sorted(set(rows) - set(QUERIES))
    assert not stale, f"COVERAGE.md rows for removed queries: {stale[:10]}"
    # the defining-module citation and oracle column must match reality
    for name, (mod_path, oracle) in rows.items():
        assert os.path.exists(os.path.join(REPO, mod_path)), (
            f"{name}: cited module {mod_path} does not exist"
        )
        assert (oracle == "yes") == (name in ORACLES), (
            f"{name}: oracle column out of sync (run "
            "scripts/update_coverage_index.py)"
        )


def test_every_cited_path_exists_and_imports():
    text = _coverage_text()
    cites = set(
        re.findall(r"`((?:betl_spark|tests|scripts)/[\w/]+\.py)(?::(\d+))?", text)
    )
    assert cites, "no file citations found — regex drift?"
    for path, line in sorted(cites):
        full = os.path.join(REPO, path)
        assert os.path.exists(full), f"COVERAGE.md cites missing file {path}"
        if line:
            n_lines = sum(1 for _ in open(full))
            assert int(line) <= n_lines, (
                f"COVERAGE.md cites {path}:{line} but the file has only "
                f"{n_lines} lines"
            )
        if path.startswith("betl_spark/") and "/contract/" not in path:
            mod = path[:-3].replace("/", ".")
            importlib.import_module(mod)  # raises on breakage


def test_readme_pins_the_contract_query_count():
    """README.md's "N/N" oracle-parity claim tracks len(QUERIES).

    Round-12 verdict #6: README.md drifted to 216/216 within one round
    of the 217th query shipping. COVERAGE.md is generated and guarded;
    the README's prose count was not — now any contract growth without
    a README update fails here.
    """
    from betl_spark.contract import QUERIES

    with open(os.path.join(REPO, "README.md")) as fh:
        readme = fh.read()
    want = f"{len(QUERIES)}/{len(QUERIES)}"
    stale = set(re.findall(r"\b(\d{3})/\1\b", readme)) - {str(len(QUERIES))}
    assert want in readme, (
        f"README.md must state the oracle-parity count as {want} "
        f"(contract has {len(QUERIES)} queries)"
    )
    assert not stale, f"README.md still contains stale N/N counts: {stale}"
