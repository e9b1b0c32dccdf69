"""betl_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference framework brianspurling/betl (a Kimball-style star-schema ETL
framework; see SURVEY.md). The execution model is entirely different:
lazy DataFrames optimized by Catalyst/Tungsten replace eager pandas
mutation with CSV temp files; the same ~30-operator dataflow vocabulary
is exposed on top.

Layout
------
- ``session``    — SparkSession factory tuned for the local[32] test box
                   and for large-cluster defaults (AQE, broadcast, Arrow).
- ``config``     — application + schedule configuration (Conf).
- ``schema``     — schema registry: layers → datasets → tables → columns,
                   StructType factories (all-string staging / typed DWH).
- ``io``         — datastore connectors + validated read/write paths.
- ``dataflow``   — the DataFlow class: the user-facing operator vocabulary.
- ``defaults``   — framework-provided dataflows: bulk extract, date/audit
                   dims, dimension & fact loads (surrogate-key engine).
- ``operators``  — beyond-reference scale operators: dedup families,
                   similarity search, text analysis, multimodal plumbing.
- ``streaming``  — Structured Streaming surface over event streams.
- ``pipeline``   — the stage runner (E→T→L→S gating, dims before facts).
"""

from betl_spark.session import build_spark
from betl_spark.config import Conf, ScheduleConfig
from betl_spark.dataflow.core import DataFlow
from betl_spark.pipeline import Pipeline

__all__ = ["build_spark", "Conf", "ScheduleConfig", "DataFlow", "Pipeline"]
__version__ = "0.1.0"
