"""Physical-plan inspection helpers: the 64 KB codegen-cliff guard.

The JVM rejects methods over 64 KB of bytecode, and Spark guards the
whole-stage-codegen path with ``spark.sql.codegen.hugeMethodLimit``
(default 65535): when a generated stage's largest compiled method
exceeds the limit, ``WholeStageCodegenExec`` silently falls back to
interpreted execution — answers stay correct, throughput quietly drops
~10x. Big LITERAL expression trees are the usual trigger: the round-11
synthetic-name lookup (contract/linkage.py) as a nested CASE pyramid
generated ~21k Java lines once Catalyst collapsed the projections, blew
the limit, and dropped the whole scan stage out of codegen. The fix
(array literals + element_at) is O(1) generated code, but the failure
mode WILL recur as literal tables grow — so this module makes it
observable and testable.

``explain codegen`` (``ExplainMode.CODEGEN`` — the same output as
Scala's ``df.queryExecution.debug.codegen()``) compiles every
whole-stage subtree and reports ``maxMethodCodeSize`` in each subtree
header. That is the EXACT value ``WholeStageCodegenExec.doExecute``
compares against ``hugeMethodLimit``, so asserting on it pins the
cliff precisely — not a line-count proxy.

Used by ``tests/test_plans.py::test_big_literal_projections_stay_in_codegen``
(the regression pin) and available to operators that build large
generated expressions (``warn_on_codegen_cliff``).
"""

from __future__ import annotations

import re
import warnings
from dataclasses import dataclass

#: Spark's default spark.sql.codegen.hugeMethodLimit — the JVM's 64 KB
#: method-bytecode ceiling. A compiled stage method past this limit is
#: executed interpreted (the comparison is strict: exactly 65535 stays
#: compiled, as tests/test_plans.py pins).
HUGE_METHOD_LIMIT = 65535

_SUBTREE_HEADER = re.compile(
    r"== Subtree (\d+) / (\d+) "
    r"\(maxMethodCodeSize:(-?\d+); maxConstantPoolSize:(\d+)"
)


@dataclass
class CodegenSubtree:
    """One whole-stage-codegen subtree of a physical plan."""

    index: int
    max_method_code_size: int  # compiled bytecode bytes, largest method
    max_constant_pool_size: int
    tree: str  # the `*(N) ...` operator lines for this subtree

    @property
    def falls_back(self) -> bool:
        """True when this stage will execute interpreted (the cliff)."""
        return self.max_method_code_size > HUGE_METHOD_LIMIT


def explain_codegen(df) -> str:
    """The `codegen`-mode explain string (compiles every subtree)."""
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("codegen")
    )


def codegen_subtrees(df) -> list[CodegenSubtree]:
    """Parse every whole-stage subtree + its compiled method size.

    Empty list means the plan has NO codegen stage at all — for a
    plain projection that itself is a red flag (the planner refused
    codegen, e.g. a CodegenFallback expression in the tree).
    """
    text = explain_codegen(df)
    out: list[CodegenSubtree] = []
    chunks = text.split("== Subtree ")[1:]
    for chunk in chunks:
        m = _SUBTREE_HEADER.match("== Subtree " + chunk)
        if not m:  # pragma: no cover - format drift guard
            continue
        tree = chunk.split("Generated code:")[0]
        tree = tree.split("==", 1)[-1].strip()
        out.append(
            CodegenSubtree(
                index=int(m.group(1)),
                max_method_code_size=int(m.group(3)),
                max_constant_pool_size=int(m.group(4)),
                tree=tree,
            )
        )
    return out


def warn_on_codegen_cliff(
    df, label: str = "", budget: int = HUGE_METHOD_LIMIT // 2
) -> list[CodegenSubtree]:
    """Warn when any codegen stage nears/passes the 64 KB cliff.

    ``budget`` defaults to HALF the fallback limit so growth is caught
    while there is still headroom (a literal table that lands at 60 KB
    today falls off the cliff at the next size bump). Returns the
    parsed subtrees so callers can assert further. Emits one warning
    per offending stage; a stage already PAST the limit is reported as
    such (it is silently interpreted at runtime).
    """
    subtrees = codegen_subtrees(df)
    for st in subtrees:
        if st.falls_back:
            warnings.warn(
                f"codegen cliff{f' [{label}]' if label else ''}: subtree "
                f"{st.index} compiled to maxMethodCodeSize="
                f"{st.max_method_code_size} > hugeMethodLimit="
                f"{HUGE_METHOD_LIMIT}; the stage will run INTERPRETED. "
                f"Stage:\n{st.tree}",
                stacklevel=2,
            )
        elif st.max_method_code_size > budget:
            warnings.warn(
                f"codegen budget{f' [{label}]' if label else ''}: subtree "
                f"{st.index} maxMethodCodeSize={st.max_method_code_size} "
                f"exceeds the {budget}-byte budget (limit "
                f"{HUGE_METHOD_LIMIT}); shrink the generated expression "
                "(array literals instead of CASE pyramids) before it "
                "falls off the 64 KB cliff.",
                stacklevel=2,
            )
    return subtrees
