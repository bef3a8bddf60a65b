"""Skew-mitigation helpers for joins and aggregations at scale.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
default here) handles most sort-merge skew at runtime. These helpers cover
the cases AQE can't: broadcast-infeasible dimension joins against a fact
table with a few pathological hot keys, and hot-key aggregations where a
single reducer would own a whole key.

Salting trades one shuffle's balance for replicating the small side
``salt_factor`` times — worth it when a handful of keys dominate (Zipfian
event streams, null-heavy FKs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``on`` with the fact side salted.

    fact rows get a random salt in [0, salt_factor); the dim side is
    exploded once per salt value, so every (key, salt) bucket joins locally.
    A hot fact key is thereby spread over ``salt_factor`` reducers.

    The salt is derived from a hash of the whole fact row id via
    ``monotonically_increasing_id`` — cheap, deterministic within a run, and
    uniform; pass a column via ``fact["..."]`` upstream if you need stable
    reproducibility across runs.

    Only ``inner`` and ``left`` joins are supported: with ``right`` or
    ``full_outer`` a dim key absent from the fact would surface once per
    salt replica (``salt_factor`` duplicate unmatched rows).
    """
    for side, df_ in (("fact", fact), ("dim", dim)):
        if "_salt" in df_.columns:
            raise ValueError(
                f"salted_join: {side} may not contain '_salt' (internal "
                "salting column — it would be overwritten and dropped)"
            )
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join: how={how!r} unsupported — the dim side is "
            f"replicated per salt, so right/full outer joins would emit "
            f"{salt_factor} copies of each unmatched dim key"
        )
    salted_fact = fact.withColumn(
        "_salt", (F.pmod(F.monotonically_increasing_id(), F.lit(salt_factor))).cast("int")
    )
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_factor)]))
    )
    out = salted_fact.join(salted_dim, on=[on, "_salt"], how=how)
    return out.drop("_salt")


def two_phase_agg(
    df: DataFrame,
    group_cols: list[str],
    agg_exprs: dict[str, str],
    salt_factor: int = 16,
) -> DataFrame:
    """Hot-key aggregation in two shuffles: first by (key, salt) — spreading
    each hot key over ``salt_factor`` reducers — then by key to merge
    partials. Supports decomposable aggregates: sum, count, min, max.

    ``agg_exprs`` maps output column → "sum(col)" / "count(*)" / "min(col)"
    / "max(col)".
    """
    phase1 = []
    phase2 = []
    for out_name, expr in agg_exprs.items():
        fn, _, arg = expr.partition("(")
        fn = fn.strip().lower()
        arg = arg.rstrip(")").strip()
        if fn == "count":
            # count(*) counts rows; count(col) skips that column's NULLs —
            # honoring the arg, not silently treating both as count(*)
            cnt = F.count(F.lit(1)) if arg in ("*", "1", "") else F.count(arg)
            phase1.append(cnt.alias(f"_p_{out_name}"))
            phase2.append(F.sum(f"_p_{out_name}").alias(out_name))
        elif fn == "sum":
            phase1.append(F.sum(arg).alias(f"_p_{out_name}"))
            phase2.append(F.sum(f"_p_{out_name}").alias(out_name))
        elif fn == "min":
            phase1.append(F.min(arg).alias(f"_p_{out_name}"))
            phase2.append(F.min(f"_p_{out_name}").alias(out_name))
        elif fn == "max":
            phase1.append(F.max(arg).alias(f"_p_{out_name}"))
            phase2.append(F.max(f"_p_{out_name}").alias(out_name))
        else:
            raise ValueError(f"non-decomposable aggregate {expr!r}")
    if "_salt" in df.columns:
        raise ValueError(
            "two_phase_agg: input may not contain '_salt' (internal "
            "salting column)"
        )
    salted = df.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt_factor)).cast("int")
    )
    partial = salted.groupBy(*group_cols, "_salt").agg(*phase1)
    return partial.groupBy(*group_cols).agg(*phase2)
