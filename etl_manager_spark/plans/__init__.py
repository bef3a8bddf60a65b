"""Physical-plan introspection: verify the plans Catalyst produces are the
plans we want (pushdown, pruning, broadcast, codegen) — at 100 TB the plan
shape IS the performance model."""

from etl_manager_spark.plans.inspect import (
    explain_formatted,
    lint_plan,
    plan_report,
    PlanReport,
    PlanWarning,
)

__all__ = [
    "explain_formatted",
    "lint_plan",
    "plan_report",
    "PlanReport",
    "PlanWarning",
]
