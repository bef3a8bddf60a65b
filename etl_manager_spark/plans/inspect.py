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
    single_partition_windows: int

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


def _count_single_partition_windows(simple: str) -> int:
    """Window operators fed (directly or through a Sort/WindowGroupLimit)
    by an ``Exchange SinglePartition`` — the shape an unpartitioned
    ``Window.orderBy(...)`` plans: every row funnels into ONE task for the
    sort + window, a non-starter when the windowed dimension grows with
    the data. Detected on the simple-mode tree, where a node's input is
    printed on the immediately following lines."""
    lines = simple.splitlines()
    flagged_exchanges: set[int] = set()
    for i, line in enumerate(lines):
        if "Window" not in line:
            continue
        for j in range(i + 1, min(i + 4, len(lines))):
            if "Exchange SinglePartition" in lines[j]:
                flagged_exchanges.add(j)
                break
            if "Exchange" in lines[j]:  # some other partitioning feeds it
                break
    return len(flagged_exchanges)


def _window_frame_bounds(plan_text: str) -> list[tuple[str, str]]:
    """(lower, upper) bound expressions of every specifiedwindowframe in
    the plan text. The body is split on TOP-LEVEL commas only (bounds
    like ``-cast(interval 7 days as ...)`` nest parens and commas), after
    scanning to the frame's own balanced closing paren — per-frame, so a
    bound can never bleed into a neighboring frame the way a lazy regex
    across the whole text can. The first top-level comma separates the
    frame type (RowFrame/RangeFrame) from the bounds."""
    out: list[tuple[str, str]] = []
    marker = "specifiedwindowframe("
    start = plan_text.find(marker)
    while start != -1:
        i = start + len(marker)
        depth = 1
        parts: list[str] = []
        piece_start = i
        while i < len(plan_text) and depth > 0:
            c = plan_text[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    parts.append(plan_text[piece_start:i].strip())
            elif c == "," and depth == 1:
                parts.append(plan_text[piece_start:i].strip())
                piece_start = i + 1
            i += 1
        if depth == 0 and len(parts) == 3:
            out.append((parts[1], parts[2]))
        start = plan_text.find(marker, i)
    return out


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
        single_partition_windows=_count_single_partition_windows(simple),
    )


@dataclass
class PlanWarning:
    code: str
    message: str


def lint_plan(
    df: "DataFrame",
    wide_scan_columns: int = 20,
    max_shuffles: int = 6,
) -> list[PlanWarning]:
    """Static scale-lint of a DataFrame's physical plan: the checks a
    reviewer runs by eye on ``explain()`` before letting a query near
    100 TB, as structured warnings. Heuristics, not verdicts — a warning
    means "look at this", and some flagged shapes are deliberate (a
    sorted write WANTS the range partitioning it flags).

    Checks:
    - ``cartesian-product``: CartesianProduct anywhere — O(n·m), almost
      always an accidental missing join key.
    - ``nested-loop-join``: BroadcastNestedLoopJoin — correct for tiny
      broadcast sides and null-aware NOT IN, quadratic if both sides grow.
    - ``python-row-udf``: BatchEvalPython — row-at-a-time (pickled)
      Python in the plan; Arrow paths (ArrowEvalPython / *InPandas) are
      10-100× faster and deliberately NOT flagged.
    - ``filter-not-pushed``: a Filter node coexists with a parquet scan
      whose PushedFilters is empty — the predicate never reached the
      reader (non-pushable expression, or a cast hiding the column).
    - ``wide-scan``: a scan reading more than ``wide_scan_columns``
      columns — projection pruning probably failed (SELECT * somewhere).
    - ``single-partition-window``: a Window fed by an Exchange
      SinglePartition — an unpartitioned ``Window.orderBy``; the whole
      input sorts in ONE task. Legitimate only when the window's input
      is provably bounded (a post-``limit(k)`` frame, a ≤k-row
      aggregate); over a dimension that grows with the data it is the
      canonical 100 TB cliff.
    - ``unbounded-percentile``: an exact ``percentile``/``median``
      aggregate — its per-group buffer holds every distinct value in one
      task; over a domain that grows with the data it OOMs a single
      executor even when the shuffle shape is clean. Legitimate only
      when the group's value domain is provably bounded.
    - ``shrinking-window-frame``: a window frame ending at UNBOUNDED
      FOLLOWING without starting at UNBOUNDED PRECEDING — Spark
      re-aggregates the frame for every row, O(rows²) per partition;
      the reversed-ordering running frame computes the same value O(n).
    - ``global-sort``: a rangepartitioning exchange — a full global sort;
      for top-k, TakeOrderedAndProject should have replaced it.
    - ``many-shuffles``: more than ``max_shuffles`` hash exchanges —
      the pipeline re-keys too often; look for a common partitioning.
    """
    r = plan_report(df)
    warnings: list[PlanWarning] = []
    if r.cartesian_products:
        warnings.append(
            PlanWarning(
                "cartesian-product",
                f"{r.cartesian_products} CartesianProduct node(s): O(n*m) "
                "pair fan-out — check for a missing join condition",
            )
        )
    if "BroadcastNestedLoopJoin" in r.text:
        warnings.append(
            PlanWarning(
                "nested-loop-join",
                "BroadcastNestedLoopJoin present: fine for a tiny "
                "broadcast side or null-aware NOT IN, quadratic otherwise",
            )
        )
    if "BatchEvalPython" in r.text:
        warnings.append(
            PlanWarning(
                "python-row-udf",
                "row-at-a-time Python UDF (BatchEvalPython) in the plan — "
                "use built-in expressions or an Arrow pandas_udf",
            )
        )
    # IsNotNull guards are freebies Spark pushes for ANY referenced
    # column — only a substantive predicate (comparison/In/StartsWith…)
    # counts as "the filter reached the reader"
    substantive_pushed = any(
        re.search(r"(?!IsNotNull)\b[A-Z]\w+\(", pf.replace("IsNotNull(", ""))
        for pf in r.pushed_filters
    )
    if "Filter" in r.text and r.pushed_filters and not substantive_pushed:
        warnings.append(
            PlanWarning(
                "filter-not-pushed",
                "plan filters rows but no substantive predicate reached "
                "any scan (only IsNotNull guards pushed) — check for "
                "casts/expressions wrapping the filtered column",
            )
        )
    for schema in r.read_schemas:
        n_cols = len(re.findall(r"(\w+):", schema))
        if n_cols > wide_scan_columns:
            warnings.append(
                PlanWarning(
                    "wide-scan",
                    f"a scan reads {n_cols} columns — projection pruning "
                    "likely failed (SELECT * upstream?)",
                )
            )
    # exact percentile/median aggregates buffer every distinct value of a
    # group in ONE task (ObjectHashAggregate counts-map, sorted at eval);
    # over a continuous/near-unique domain the buffer grows linearly with
    # the data even when the shuffle shape is clean — invisible to the
    # single-partition-window check. approx_percentile (bounded sketch)
    # is deliberately not flagged.
    _noapprox = r.text.replace("approx_percentile(", "").replace(
        "percentile_approx(", ""
    )
    # dedupe by the full call text: each aggregate renders several times
    # in a formatted plan (partial + final HashAggregate nodes and their
    # detail lines), so a raw hit count would over-report
    exact_pct = len(
        set(re.findall(r"\b(?:percentile|median)\([^)]*\)?", _noapprox))
    )
    if exact_pct:
        warnings.append(
            PlanWarning(
                "unbounded-percentile",
                f"{exact_pct} exact percentile/median aggregate(s): the "
                "per-group buffer holds every distinct value in one task "
                "— safe only when the group's value domain is provably "
                "bounded (state the bound in the workload docstring); "
                "otherwise use operators/quantiles.py's rank-quantile "
                "CDF or approx_percentile",
            )
        )
    # frames ending at UNBOUNDED FOLLOWING that do NOT start at UNBOUNDED
    # PRECEDING run Spark's UnboundedFollowingWindowFunctionFrame, which
    # RE-AGGREGATES from every row to the partition end — O(rows²) per
    # partition (a 500k-row partition runs for hours). The full-partition
    # frame [unboundedpreceding, unboundedfollowing] computes once per
    # partition and is fine; the equivalent O(n) formulation for
    # "first non-null at-or-after" is last(..., ignorenulls) over the
    # REVERSED ordering with a running [unboundedpreceding, currentrow]
    # frame (see operators/asof.py).
    # the lower bound can be ANY expression (an integer, token$(), or a
    # RangeFrame interval like '-INTERVAL 7 days', itself with nested
    # parens/commas), so a single regex can't delimit it — a lazy .+?
    # spans ACROSS adjacent frames and misreads a benign full-partition
    # frame as shrinking. Parse each frame's balanced-paren body and
    # split its top-level commas instead; an interval-bounded shrinking
    # frame is just as quadratic as an integer-bounded one.
    shrinking = [
        lo
        for lo, hi in _window_frame_bounds(r.text)
        if hi == "unboundedfollowing$()" and lo != "unboundedpreceding$()"
    ]
    if shrinking:
        warnings.append(
            PlanWarning(
                "shrinking-window-frame",
                f"{len(shrinking)} window frame(s) ending at UNBOUNDED "
                "FOLLOWING without starting at UNBOUNDED PRECEDING — "
                "Spark re-aggregates the frame from every row to the "
                "partition end, O(rows²) per partition; reverse the "
                "ordering and use a running [unboundedpreceding, "
                "currentrow] frame instead",
            )
        )
    if r.single_partition_windows:
        warnings.append(
            PlanWarning(
                "single-partition-window",
                f"{r.single_partition_windows} Window(s) fed by Exchange "
                "SinglePartition — unpartitioned Window.orderBy sorts ALL "
                "rows in one task; bound the input (limit(k)) or use a "
                "two-phase per-partition rank + offset",
            )
        )
    if "rangepartitioning" in r.text and not r.take_ordered:
        warnings.append(
            PlanWarning(
                "global-sort",
                "rangepartitioning exchange = full global sort; for "
                "top-k use orderBy(...).limit(k) so Spark plans "
                "TakeOrderedAndProject",
            )
        )
    if r.shuffle_exchanges > max_shuffles:
        warnings.append(
            PlanWarning(
                "many-shuffles",
                f"{r.shuffle_exchanges} hash exchanges (> {max_shuffles}) "
                "— look for a reusable partitioning or bucketing",
            )
        )
    return warnings
