"""Summary-layer prep (reference betl/defaultdataflows/stageSummarise.py:26-59).

Summary tables are user-written ``groupBy().agg()`` dataflows; the
framework's contract is only to truncate the ``su_*`` tables before the
bespoke summarise dataflows run, then load what they staged. In Spark,
"truncate" is an overwrite of the BSE/SUM parquet namespace — the
bespoke dataflow's ``write(..., 'SUM')`` does the load directly, so prep
reduces to clearing stale outputs.
"""

from __future__ import annotations

import shutil


def default_summarise_prep(pipeline) -> None:
    for table in pipeline.registry.tables("SUM", "SUMMARY"):
        path = pipeline.conf.layer_path("SUM", table.name)
        shutil.rmtree(path, ignore_errors=True)
