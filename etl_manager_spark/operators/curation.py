"""Corpus-curation operators: text normalization, linear quality scoring,
per-domain capping, and k-fold assignment (SURVEY §2.D extensions).

The reference (etl_manager) stops at metadata + job orchestration — these
are the curation steps a 100 TB training-data pipeline runs between its
quality gates (operators/text.py) and its dedup passes (operators/dedup.py):

* **normalize** the text once so downstream exact-dedup hashes and
  fingerprints agree across whitespace/case variants;
* **score** each document with a (deterministic, linear) quality model —
  the fasttext-classifier-shaped step of CCNet/RefinedWeb-style pipelines,
  expressed entirely in JVM columns so it pipelines inside the scan;
* **cap** each domain's contribution so boilerplate-heavy hosts can't
  dominate the mixture (per-group top-k by quality);
* **fold** the corpus into k reproducible cross-validation folds keyed on
  the document id hash (composes with sampling.split_column: same md5-hex
  draw discipline, stable under any partitioning or engine).

Everything is a pure column expression or a window/aggregate over built-in
functions — no Python in the hot path; every op has an ANSI-SQL rendering
(the ``*_SQL`` helpers) that DuckDB evaluates bitwise-identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_manager_spark.operators.sampling import _threshold_hex, hash_bucket
from etl_manager_spark.operators.text import (
    distinct_token_count,
    stopword_ratio,
    token_count,
)


def normalize_text(col: Column | str) -> Column:
    """Canonical text form: whitespace runs collapsed to single spaces,
    trimmed, lower-cased. The whitespace class is spelled EXPLICITLY
    (space, tab, newline, CR, FF, vertical tab) because Java's ``\\s``
    matches U+000B while RE2/DuckDB's does not — an explicit class reads
    identically in both engines, so any engine produces the same
    canonical string — which is the point: the normalized md5 is a
    cross-engine dedup key."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(F.regexp_replace(c, "[ \t\n\r\f\u000B]+", " ")))


def normalized_hash(col: Column | str) -> Column:
    """md5 of the canonical form — the whitespace/case-insensitive exact
    dedup key (pair with operators/dedup.exact_dedup on this column)."""
    return F.md5(normalize_text(col))


def normalize_sql(expr: str) -> str:
    """DuckDB rendering of :func:`normalize_text` (same canonical string)."""
    return (
        f"LOWER(TRIM(REGEXP_REPLACE({expr}, "
        "'[ \t\n\r\f\x0B]+', ' ', 'g')))"
    )


# Fixed public weights for the linear quality model. Placeholder values in
# the spirit of CCNet's fasttext stage: reward vocabulary diversity and a
# healthy stopword rate (fluent prose has one), saturate on length. A real
# deployment swaps these for trained weights — the plan shape is identical.
QUALITY_WEIGHTS = {
    "bias": -1.5,
    "log1p_tokens": 0.25,
    "distinct_ratio": 2.0,
    "stopword_ratio": 1.5,
}


def linear_quality_z(text_col: Column | str) -> Column:
    """Linear quality score z = w·x over three JVM-computed features:
    ln(1+tokens), distinct-token ratio, stopword ratio. Fixed left-to-right
    summation order (w0 + w1·f1 + w2·f2 + w3·f3) so the IEEE result is
    reproducible across engines; quantize before comparing.

    Scale: a pure per-row projection — no shuffle, pipelines inside
    whole-stage codegen with the scan."""
    w = QUALITY_WEIGHTS
    ntok = token_count(text_col).cast("double")
    # token-less (empty/whitespace-only/NULL) docs score NULL: the ratio
    # features are 0/0 there, which throws DIVIDE_BY_ZERO under ANSI —
    # the same zero-token guard as text_profile, mirrored in the SQL twin
    distinct_ratio = distinct_token_count(text_col).cast("double") / ntok
    return F.when(
        ntok > 0,
        F.lit(w["bias"])
        + F.lit(w["log1p_tokens"]) * F.log(F.lit(1.0) + ntok)
        + F.lit(w["distinct_ratio"]) * distinct_ratio
        + F.lit(w["stopword_ratio"]) * stopword_ratio(text_col),
    )


def linear_quality_sql(tok_expr: str, stop_sql_set: str) -> str:
    """DuckDB rendering of :func:`linear_quality_z` given a tokens-array
    expression and the SQL stopword set literal (same float op order)."""
    w = QUALITY_WEIGHTS
    ntok = f"CAST(LEN({tok_expr}) AS DOUBLE)"
    distinct = f"CAST(LEN(LIST_DISTINCT({tok_expr})) AS DOUBLE) / {ntok}"
    stop = (
        f"CAST(LEN(LIST_FILTER({tok_expr}, t -> LOWER(t) IN {stop_sql_set}))"
        f" AS DOUBLE) / {ntok}"
    )
    return (
        f"CASE WHEN {ntok} > 0 THEN "
        f"{w['bias']} + {w['log1p_tokens']} * LN(1.0 + {ntok})"
        f" + {w['distinct_ratio']} * ({distinct})"
        f" + {w['stopword_ratio']} * ({stop})"
        " ELSE NULL END"
    )


def kfold_column(id_col: Column | str, k: int) -> Column:
    """Fold assignment 0..k-1 from the row's md5-hex draw: fold i covers
    draws in [i/k, (i+1)/k). Same discipline as sampling.split_column —
    deterministic under any partitioning, consistent across engines, and
    composable (the fold-0 rows of k=5 are a subset of the 'test' rows of
    an 80/20 split only if thresholds align; folds themselves are disjoint
    and exhaustive by construction). A pure per-row projection."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    draw = hash_bucket(id_col)
    expr = None
    for i in range(k - 1):
        cond = draw < F.lit(_threshold_hex((i + 1) / k))
        expr = F.when(cond, i) if expr is None else expr.when(cond, i)
    return expr.otherwise(k - 1).cast("int")


def kfold_sql(id_expr: str, k: int) -> str:
    """DuckDB rendering of :func:`kfold_column` (same thresholds)."""
    draw = f"substr(md5(CAST({id_expr} AS VARCHAR)), 1, 8)"
    whens = "".join(
        f" WHEN {draw} < '{_threshold_hex((i + 1) / k)}' THEN {i}"
        for i in range(k - 1)
    )
    return f"CAST(CASE{whens} ELSE {k - 1} END AS INTEGER)"


def cap_per_group(
    df: DataFrame,
    group_col: str,
    order_by: list[Column],
    k: int,
    two_phase: bool = True,
) -> DataFrame:
    """Keep at most ``k`` rows per group, preferring the ``order_by``-first
    rows (ties must be broken by a unique column for determinism) — the
    per-domain contribution cap of a web-corpus mixture.

    Two-phase by default: rank within (group, input-partition) first and
    keep k per cell, then rank the survivors globally per group. The
    prefilter is exact — any row in a group's true top-k is in its own
    partition-cell's top-k under the SAME total order — and bounds the
    final shuffle to k·partitions rows per group, so one hot domain with
    10⁹ pages shuffles k·P rows, not 10⁹. The cell window's partition key
    includes the physical partition id (the salt), so even a single giant
    group spreads over all reducers.

    The output carries a 1-based ``rank`` column (the within-group
    position under ``order_by``); the input may therefore not already
    contain ``rank`` — or the internal ``_cpg_pid``/``_cpg_rank`` staging
    names — refused up front rather than silently overwritten."""
    from pyspark.sql import Window

    from etl_manager_spark.operators.topk import grouped_topk

    taken = {"rank", "_cpg_pid", "_cpg_rank"} & set(df.columns)
    if taken:
        raise ValueError(
            f"cap_per_group: input may not contain {sorted(taken)} "
            "('rank' is the output rank; the _cpg_ names are internal)"
        )
    pre = df
    if two_phase:
        part = df.withColumn("_cpg_pid", F.spark_partition_id())
        w = Window.partitionBy(group_col, "_cpg_pid").orderBy(*order_by)
        pre = (
            part.withColumn("_cpg_rank", F.row_number().over(w))
            .filter(F.col("_cpg_rank") <= k)
            .drop("_cpg_pid", "_cpg_rank")
        )
    return grouped_topk(pre, [group_col], order_by, k)
