"""Step journal.

The reference logs every operator step with description, duration, and
dataframe shape (betl/dataflow/DataFlowClass.py:68-103,
betl/logger/LoggerClass.py:484-632), and relies on step descriptions
being unique for cross-run stats. Eager shape logging would force a
Spark job per step, so shape capture is opt-in
(``Conf.verbose_step_logging``) — SURVEY.md §7.5 hard part 3.
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager
from dataclasses import dataclass, field


def log_alert(conf, alert: str) -> None:
    """Append an alert to ``<log_path>/_alerts.txt``.

    The reference keeps alerts that need human action (e.g. unmapped
    MDM rows, betl/dataflow/dfl_mdm.py:186-197) in a file separate from
    the step log, one entry per blank-line-separated block
    (betl/logger/alerts.py:4-12).
    """
    os.makedirs(str(conf.log_path), exist_ok=True)
    with open(os.path.join(str(conf.log_path), "_alerts.txt"), "a") as f:
        f.write(alert + "\n\n")


@dataclass
class Step:
    op: str
    desc: str
    started: float
    duration: float | None = None
    rows: int | None = None
    cols: int | None = None
    detail: dict = field(default_factory=dict)


@dataclass
class Journal:
    dataflow_desc: str
    steps: list[Step] = field(default_factory=list)

    @contextmanager
    def step(self, op: str, desc: str = ""):
        s = Step(op=op, desc=desc or op, started=time.time())
        self.steps.append(s)
        try:
            yield s
        finally:
            s.duration = time.time() - s.started

    def report(self) -> str:
        lines = [f"dataflow: {self.dataflow_desc}"]
        for s in self.steps:
            shape = f" [{s.rows}x{s.cols}]" if s.rows is not None else ""
            lines.append(f"  {s.op}: {s.desc} ({s.duration:.3f}s){shape}")
        return "\n".join(lines)
