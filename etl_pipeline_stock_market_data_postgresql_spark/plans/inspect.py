"""Physical-plan inspection helpers.

The engine has no custom Catalyst rules (SURVEY.md §4: none are needed
for parity) — its optimizer story is *verifying* that the declarative
plans actually get the free optimizations: filters pushed into the
parquet scan, columns pruned, small joins broadcast, expressions inside
whole-stage codegen. These helpers turn those checks into assertions
(tests/test_plans.py) so a regression in plan shape fails CI rather
than silently costing 100× at scale.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode)


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every parquet scan in the plan."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        entry = m.group(1).strip()
        if entry:
            out.extend(p.strip() for p in entry.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each scan (column pruning check)."""
    text = explain_str(df)
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        schemas.append(cols)
    return schemas


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or \
        "BroadcastNestedLoopJoin" in explain_str(df)


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of whole-stage-codegen regions (wider spans = fewer
    interpreter boundaries). Uses codegen-mode explain because the
    pre-execution AQE plan carries no codegen annotations."""
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees",
                  explain_str(df, "codegen"))
    return int(m.group(1)) if m else 0
