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

    def _plan_groups(self) -> list[list[tuple[str, Callable]]]:
        """The gated stage sequence (reference PipelineClass.py:66-420)
        as ordered barrier groups of (task_id, callable): tasks within
        a group are independent; every task depends on ALL tasks of the
        previous non-empty group. This preserves the hard rules — dims
        strictly before facts (PipelineClass.py:203-208), date/audit
        dims before bespoke transforms — while exposing the real
        parallelism (per-source extracts, per-dimension bulk loads) to
        any executor, Airflow included.

        Single source of truth: ``run`` executes this plan and
        ``to_dag_spec``/``to_airflow_dag`` export it, so the local
        topological runner and a DAG scheduler can never disagree on
        ordering.
        """
        sched = self.conf.schedule
        from betl_spark import defaults

        groups: list[list[tuple[str, Callable]]] = []
        if sched.run_extract:
            g: list[tuple[str, Callable]] = []
            if sched.default_extract:
                for src_id in sched.src_system_ids:
                    g.append((
                        f"bulkExtract_{src_id}",
                        lambda p, s=src_id: defaults.bulk_extract(
                            p, s, sched.bulk_or_delta
                        ),
                    ))
            g.extend(
                (f"extract_{fn.__name__}", fn) for fn in sched.extract_dataflows
            )
            groups.append(g)

        if sched.run_transform:
            if sched.default_load:  # date/audit dims are load prerequisites
                groups.append([
                    ("transformDMDate", defaults.transform_dm_date),
                    ("transformDMAudit", defaults.transform_dm_audit),
                ])
            groups.append([
                (f"transform_{fn.__name__}", fn)
                for fn in sched.transform_dataflows
            ])

        if sched.run_load:
            # dims strictly before facts (reference PipelineClass.py:203-208)
            groups.append([
                (f"loadDim_{fn.__name__}", fn) for fn in sched.load_dim_dataflows
            ])
            if sched.default_load:
                groups.append([
                    (
                        f"bulkLoad_{dim.name}",
                        lambda p, d=dim: defaults.bulk_load_dimension(p, d),
                    )
                    for dim in self.registry.tables("BSE", "DIMENSION")
                ])
            groups.append([
                (f"loadFactPrep_{fn.__name__}", fn)
                for fn in sched.load_fact_dataflows
            ])
            if sched.default_load:
                groups.append([
                    (
                        f"bulkLoad_{fact.name}",
                        lambda p, t=fact: defaults.bulk_load_fact(p, t),
                    )
                    for fact in self.registry.tables("BSE", "FACT")
                ])

        if sched.run_summarise:
            if sched.default_summarise:
                groups.append([
                    ("summarisePrep", defaults.default_summarise_prep)
                ])
            groups.append([
                (f"summarise_{fn.__name__}", fn)
                for fn in sched.summarise_dataflows
            ])
        return [g for g in groups if g]

    def run(self) -> list[str]:
        """Execute the gated stage sequence: extract → transform →
        load dims → load facts → summarise. User dataflows are
        callables taking the pipeline; default dataflows come from
        ``betl_spark.defaults``.
        """
        for group in self._plan_groups():
            for name, fn in group:
                self._run_task(name, fn)
        return self.run_log

    def dataflows_dag_spec(
        self,
        dataflows: list[Callable],
        upstream: dict[str, list[str]] | None = None,
    ) -> dict:
        """The bespoke-dataflow counterpart of ``to_dag_spec``: export
        the ``schedule_dataflows`` workload (explicit upstream dict,
        the reference's createAndScheduleDFOperators contract) as the
        same serializable {"tasks": [...]} shape — validated with the
        scheduler's own rules, so a spec that exports is a spec that
        runs.
        """
        upstream = upstream or {}
        by_name = {fn.__name__: fn for fn in dataflows}
        for name, deps in upstream.items():
            unknown = [d for d in [name, *deps] if d not in by_name]
            if unknown:
                raise ValueError(f"unknown dataflow(s) in upstream: {unknown}")
        return {
            "tasks": [
                {
                    "task_id": f"dataflow_{fn.__name__}",
                    "upstream": [
                        f"dataflow_{d}" for d in upstream.get(fn.__name__, [])
                    ],
                }
                for fn in dataflows
            ]
        }

    def to_dag_spec(self) -> dict:
        """The run plan as a serializable DAG spec — the engine's
        equivalent of the reference's Airflow mode (PipelineClass.py:
        456-514 builds PythonOperators with the same task ids and
        upstream chaining). Returns {"tasks": [{"task_id", "upstream":
        [...]}...]}; hand it to any scheduler, or use
        ``to_airflow_dag`` when the airflow package is installed.
        """
        tasks = []
        prev: list[str] = []
        for group in self._plan_groups():
            names = [name for name, _ in group]
            tasks.extend(
                {"task_id": n, "upstream": list(prev)} for n in names
            )
            prev = names
        return {"tasks": tasks}

    def to_airflow_dag(self, dag):
        """Attach the run plan to an Airflow DAG as PythonOperators
        (one per task, upstream set per ``to_dag_spec``), mirroring the
        reference's createOp (PipelineClass.py:457-480). Import-gated:
        airflow is not a dependency of this engine; raises ImportError
        with a clear message when it isn't installed.
        """
        try:
            from airflow.operators.python import PythonOperator
        except ImportError as exc:  # pragma: no cover - env seam
            raise ImportError(
                "to_airflow_dag requires apache-airflow; use to_dag_spec() "
                "for a scheduler-agnostic plan"
            ) from exc
        ops: dict[str, object] = {}
        prev: list[str] = []
        for group in self._plan_groups():
            names = []
            for name, fn in group:
                op = PythonOperator(
                    task_id=name,
                    python_callable=lambda p=self, f=fn, n=name: p._run_task(n, f),
                    dag=dag,
                )
                for up in prev:
                    op.set_upstream(ops[up])
                ops[name] = op
                names.append(name)
            prev = names
        return ops
