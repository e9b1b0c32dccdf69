"""The engine's declared workload: queries + DuckDB oracle SQL.

Each entry exercises one operator family from SURVEY.md §2 (or a
beyond-reference scale operator) through the engine's public surface,
paired with ANSI SQL an independent engine (DuckDB) can run on the same
parquet tables. The driver hash-compares both result sets, so every
query here is an executable correctness contract.

Determinism rules used throughout (so Spark and DuckDB agree bit-for-bit):
- money/measure aggregation is done in DECIMAL(18,2) (the data is
  2-decimal exact) and only cast to DOUBLE at the end;
- averages are exact-decimal sums divided as doubles at the end;
- LIMIT queries carry a total ORDER BY (tiebreak on a key);
- timestamps are bucketed with floor(epoch/N) (truncation-safe in both
  engines) or cast to DATE.
"""

from betl_spark.contract.tpch import QUERIES as _TPCH
from betl_spark.contract.operators import QUERIES as _OPERATORS
from betl_spark.contract.scale import QUERIES as _SCALE
from betl_spark.contract.streaming_delta import QUERIES as _STREAMING
from betl_spark.contract.pipeline_e2e import QUERIES as _PIPELINE

QUERIES: dict = {}
ORACLES: dict = {}
for _name, (_fn, _sql) in {
    **_TPCH,
    **_OPERATORS,
    **_SCALE,
    **_STREAMING,
    **_PIPELINE,
}.items():
    QUERIES[_name] = _fn
    if _sql is not None:
        ORACLES[_name] = _sql
