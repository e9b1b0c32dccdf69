"""Pipeline runner (reference betl/PipelineClass.py:16-420).

The reference builds an Airflow DAG (or executes immediately) over the
stage sequence Extract → Transform → Load → Summarise, with stage gating
flags and the hard ordering rule *dimensions before facts*
(PipelineClass.py:203-208). Here the same gating drives a plain-Python
topological runner; every task receives a fresh ``DataFlow`` bound to
the shared Conf/SparkSession, so tasks only communicate through staged
data — the same contract that lets the reference run each task in its
own Airflow worker.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import SparkSession

from betl_spark.config import Conf
from betl_spark.schema.registry import SchemaRegistry
from betl_spark.session import build_spark


class Pipeline:
    def __init__(
        self,
        conf: Conf,
        registry: SchemaRegistry | None = None,
        spark: SparkSession | None = None,
    ):
        self.conf = conf
        self.registry = registry or SchemaRegistry()
        self.spark = spark or build_spark()
        self.run_log: list[str] = []

    def dataflow(self, desc: str):
        from betl_spark.dataflow.core import DataFlow

        return DataFlow(self.conf, desc, spark=self.spark, registry=self.registry)

    def schedule_dataflows(
        self,
        dataflows: list[Callable],
        upstream: dict[str, list[str]] | None = None,
    ) -> list[str]:
        """Run bespoke dataflows honoring an ``upstream`` dependency dict
        (function name → names that must run first) — the reference's
        createAndScheduleDFOperators contract (PipelineClass.py:422-454),
        as a deterministic topological order instead of an Airflow DAG.

        Ties break in the given list order, so a run is reproducible.
        Raises ValueError on cycles or unknown dependency names.
        """
        upstream = upstream or {}
        by_name = {fn.__name__: fn for fn in dataflows}
        for name, deps in upstream.items():
            unknown = [d for d in [name, *deps] if d not in by_name]
            if unknown:
                raise ValueError(f"unknown dataflow(s) in upstream: {unknown}")
        done: list[str] = []
        remaining = [fn.__name__ for fn in dataflows]
        while remaining:
            ready = [
                n for n in remaining
                if all(d in done for d in upstream.get(n, []))
            ]
            if not ready:
                raise ValueError(f"dependency cycle among: {sorted(remaining)}")
            n = ready[0]
            remaining.remove(n)
            self._run_task(f"dataflow_{n}", by_name[n])
            done.append(n)
        return done

    def _run_task(self, name: str, fn: Callable) -> None:
        self.run_log.append(name)
        fn(self)

    def run(self) -> list[str]:
        """Execute the gated stage sequence (reference
        PipelineClass.py:66-420): extract → transform → load dims →
        load facts → summarise. User dataflows are callables taking the
        pipeline; default dataflows come from ``betl_spark.defaults``.
        """
        sched = self.conf.schedule
        from betl_spark import defaults

        if sched.run_extract:
            if sched.default_extract:
                for src_id in sched.src_system_ids:
                    self._run_task(
                        f"bulkExtract_{src_id}",
                        lambda p, s=src_id: defaults.bulk_extract(p, s, sched.bulk_or_delta),
                    )
            for fn in sched.extract_dataflows:
                self._run_task(f"extract_{fn.__name__}", fn)

        if sched.run_transform:
            if sched.default_load:  # date/audit dims are load prerequisites
                self._run_task("transformDMDate", defaults.transform_dm_date)
                self._run_task("transformDMAudit", defaults.transform_dm_audit)
            for fn in sched.transform_dataflows:
                self._run_task(f"transform_{fn.__name__}", fn)

        if sched.run_load:
            # dims strictly before facts (reference PipelineClass.py:203-208)
            for fn in sched.load_dim_dataflows:
                self._run_task(f"loadDim_{fn.__name__}", fn)
            if sched.default_load:
                for dim in self.registry.tables("BSE", "DIMENSION"):
                    self._run_task(
                        f"bulkLoad_{dim.name}",
                        lambda p, d=dim: defaults.bulk_load_dimension(p, d),
                    )
            for fn in sched.load_fact_dataflows:
                self._run_task(f"loadFactPrep_{fn.__name__}", fn)
            if sched.default_load:
                for fact in self.registry.tables("BSE", "FACT"):
                    self._run_task(
                        f"bulkLoad_{fact.name}",
                        lambda p, t=fact: defaults.bulk_load_fact(p, t),
                    )

        if sched.run_summarise:
            if sched.default_summarise:
                self._run_task("summarisePrep", defaults.default_summarise_prep)
            for fn in sched.summarise_dataflows:
                self._run_task(f"summarise_{fn.__name__}", fn)

        return self.run_log
