"""Helpers for asserting physical-plan quality.

Usage::

    report = plan_report(df)
    assert report.has_pushed_filters
    assert report.broadcast_joins >= 1
    assert not report.cartesian_products

These are the properties that decide whether a plan survives a 100× data
scale-up: filters evaluated inside the parquet reader (row-group skipping),
column pruning (narrow ReadSchema), broadcast instead of shuffle for small
dims, whole-stage codegen for the hot expression path, and no accidental
cartesian products.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame


def explain_formatted(df: "DataFrame") -> str:
    """The string ``df.explain("formatted")`` would print."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


@dataclass
class PlanReport:
    text: str
    pushed_filters: list[str]
    read_schemas: list[str]
    broadcast_joins: int
    sortmerge_joins: int
    shuffle_exchanges: int
    codegen_stages: int
    cartesian_products: int
    take_ordered: bool

    @property
    def has_pushed_filters(self) -> bool:
        return any(pf not in ("[]", "") for pf in self.pushed_filters)

    def scans_only_columns(self, allowed: set[str]) -> bool:
        """True iff every parquet scan reads a subset of ``allowed``."""
        for schema in self.read_schemas:
            cols = set(re.findall(r"(\w+):", schema))
            if not cols <= allowed:
                return False
        return True


def plan_report(df: "DataFrame") -> PlanReport:
    text = explain_formatted(df)
    # codegen stage markers (*(n)) only appear in "simple" mode output
    simple = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "simple"
    )
    return PlanReport(
        text=text,
        pushed_filters=re.findall(r"PushedFilters: (\[.*?\])", text),
        read_schemas=re.findall(r"ReadSchema: struct<(.*?)>", text),
        broadcast_joins=len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", text)),
        sortmerge_joins=len(re.findall(r"SortMergeJoin", text)),
        # formatted mode prints "Exchange (n)" in the tree and the
        # partitioning in the details ("Arguments: hashpartitioning(...)")
        shuffle_exchanges=len(re.findall(r"Arguments: hashpartitioning", text)),
        codegen_stages=len(set(re.findall(r"\*\((\d+)\)", simple))),
        cartesian_products=len(re.findall(r"CartesianProduct", text)),
        take_ordered=("TakeOrderedAndProject" in text),
    )
