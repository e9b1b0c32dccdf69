"""New-app scaffolding (reference betl/setup/fileSetup.py:90-280).

The reference's interactive Setup() writes a runnable app skeleton:
directories, .gitignore, appConfig.ini, main.py and an example
dataflow. Here the same skeleton is one non-interactive function; the
config file is a Python module (``app_config.py`` building a ``Conf``)
rather than an INI, because this engine's configuration IS the ``Conf``
dataclass — there is no ConfigObj indirection to template.

GSheet/Postgres bootstrap (reference gsheetSetup.py / dbSetup.py) is
deliberately out of scope: those provision external services; the
Spark-first engine stages to parquet under tmp_data and needs no
database to exist before the first run.
"""

from __future__ import annotations

import os

_GITIGNORE = """\
# betl_spark app artifacts
tmp_data/
logs/
reports/
spark-warehouse/

# Byte-compiled
__pycache__/
*.py[cod]
"""

_APP_CONFIG = '''\
"""Application configuration: declare source datastores, the schema
registry, and the stage schedule. Edit freely — this module is yours."""

import os

from betl_spark import Conf, ScheduleConfig
from betl_spark.io.datastore import Datastore

import dfl_example

# absolute, so paths resolve identically in the driver and in a Spark
# JVM started from a different working directory
APP_ROOT = os.path.dirname(os.path.abspath(__file__))

conf = Conf(
    app_root=APP_ROOT,
    datastores={{
        # point this at your source system; see betl_spark.io.datastore
        # for FILESYSTEM / PARQUET / POSTGRES / SQLITE / GSHEET / EXCEL
        "{src_id}": Datastore(
            "{src_id}",
            "FILESYSTEM",
            is_src_sys=True,
            path=APP_ROOT + "/src_data",
        ),
    }},
    schedule=ScheduleConfig(
        src_system_ids=["{src_id}"],
        extract_dataflows=[dfl_example.extract_example],
        transform_dataflows=[dfl_example.example_dataflow],
        load_dim_dataflows=[],
        load_fact_dataflows=[],
        summarise_dataflows=[],
    ),
)
'''

_MAIN = '''\
"""Pipeline entry point: `python main.py` runs the gated stage
sequence (extract -> transform -> load -> summarise)."""

from betl_spark import Pipeline
from betl_spark.schema.registry import SchemaRegistry

from app_config import conf

registry = SchemaRegistry()
# declare your warehouse tables here, e.g.:
# registry.define("BSE", "dm_example", [
#     ("sk_example", "SERIAL", "Surrogate key"),
#     ("nk_example", "TEXT", "Natural key"),
# ])

if __name__ == "__main__":
    pipeline = Pipeline(conf, registry=registry)
    pipeline.run()
'''

_DFL_EXAMPLE = '''\
"""Example dataflows (reference betl/setup/fileSetup.py:243-262):
extract a source table to the EXT layer, then clean it and stage it
for loading."""


def extract_example(pipeline):
    dfl = pipeline.dataflow("Extract example table")
    dfl.getDataFromSrc("example_table_name", "{src_id}")
    dfl.write("example_table_name", "example_table_name", "EXT")


def example_dataflow(pipeline):
    dfl = pipeline.dataflow("Example dataflow")
    dfl.read("example_table_name", "EXT")
    dfl.dedupe("example_table_name", desc="Make dataset unique")
    dfl.prepForLoad("example_table_name", targetTableName="dm_example")
'''

APP_DIRS = ("src_data", "tmp_data", "logs", "schema")


def create_app_skeleton(
    app_root: str, src_system_id: str = "SRC", force: bool = False
) -> list[str]:
    """Write a runnable app skeleton under ``app_root``; returns the
    paths written. Existing files are left alone unless ``force``
    (the reference prompts y/n per file; non-interactive here)."""
    os.makedirs(app_root, exist_ok=True)
    for d in APP_DIRS:
        os.makedirs(os.path.join(app_root, d), exist_ok=True)
    files = {
        ".gitignore": _GITIGNORE,
        "app_config.py": _APP_CONFIG.format(src_id=src_system_id),
        "main.py": _MAIN,
        "dfl_example.py": _DFL_EXAMPLE.format(src_id=src_system_id),
    }
    written: list[str] = []
    for name, content in files.items():
        path = os.path.join(app_root, name)
        if os.path.exists(path) and not force:
            continue
        with open(path, "w") as f:
            f.write(content)
        written.append(path)
    return written
