"""Vectorized Python UDF patterns (SURVEY §2.C UDF/UDAF row).

The engine's rule: pyspark.sql.functions first — Python only where numpy
genuinely earns its keep. These are the two sanctioned shapes:

* scalar ``pandas_udf`` — Arrow batches in, numpy kernel, Arrow batches
  out. ~10-100× over row-at-a-time ``F.udf`` (one serialization per
  batch, vectorized compute).
* grouped ``applyInPandas`` — per-group pandas frame in, frame out; the
  grouped-map stand-in for a custom UDAF when the aggregate state is a
  vector (here: per-label embedding centroids).

Scale notes: both operate per Arrow batch / per group partition — no
driver collection; the applyInPandas shuffle is one hash exchange on the
group key, identical layout to a built-in groupBy.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, ByteType, DoubleType

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame


@F.pandas_udf(ArrayType(ByteType()))
def quantize_embedding(vectors: pd.Series) -> pd.Series:
    """Symmetric int8 quantization per vector: scale = 127/max|x| (0-safe),
    values round-half-away-from-zero into [-127, 127]. Vectorized numpy
    over each Arrow batch."""
    import numpy as np

    def q(vec):
        if vec is None:
            return None
        x = np.asarray(vec, dtype=np.float64)
        peak = np.abs(x).max() if x.size else 0.0
        if not np.isfinite(peak):
            # NaN/Inf components make peak non-finite; the zero-guard
            # doesn't fire and sign/floor astype(int8) of NaN is
            # undefined-value casting — the whole vector would silently
            # quantize to platform-dependent junk. NULL out instead
            # (nulls propagate like any SQL expression over bad input).
            return None
        if peak == 0.0:
            return np.zeros(x.size, dtype=np.int8)
        scaled = x * (127.0 / peak)
        return np.sign(scaled).astype(np.int8) * np.floor(
            np.abs(scaled) + 0.5
        ).astype(np.int8)

    return pd.Series([q(v) for v in vectors])


def quantized_embeddings(df: "DataFrame", id_col: str = "vec_id", vec_col: str = "embedding") -> "DataFrame":
    return df.select(
        F.col(id_col),
        quantize_embedding(F.col(vec_col).cast("array<double>")).alias("q_embedding"),
    )


def _centroid_of_group(pdf: pd.DataFrame) -> pd.DataFrame:
    import numpy as np

    # NULL embeddings are ignored (SQL-aggregate semantics: the group row
    # survives with the non-null rows' centroid; a group of ONLY nulls
    # emits nothing) — np.stack over a None would otherwise abort the
    # whole job on one bad row. A null LABEL is a legitimate group
    # (groupBy keeps it): emitted as-is, not int()-coerced.
    pdf = pdf[pdf["embedding"].notna()]
    if pdf.empty:
        return pd.DataFrame({"label": [], "n": [], "centroid": []}).astype(
            {"label": "object", "n": "int64", "centroid": "object"}
        )
    pdf = pdf.sort_values("_order_id", kind="mergesort")  # stable on ties
    mat = np.stack(pdf["embedding"].map(lambda v: np.asarray(v, dtype=np.float64)))
    # Sequential left-fold over rows in id order (NOT np.sum/mean, whose
    # pairwise accumulation is faster but order-sensitive): identical
    # float64 add sequence to a SQL engine folding LIST(v ORDER BY id), so
    # the result is bitwise-reproducible — the property the DuckDB
    # list_reduce oracle pins. Each step is still vectorized across dims;
    # the loop is over rows only.
    acc = mat[0].astype(np.float64, copy=True)
    for row in mat[1:]:
        acc = acc + row
    raw_label = pdf["label"].iloc[0]
    # pass the label through at its own type (unwrap numpy scalars only);
    # int()-coercion crashed string labels and wrapped >int32 under the
    # old hardcoded 'label int' schema
    if pd.isna(raw_label):
        label = None
    elif hasattr(raw_label, "item"):
        label = raw_label.item()
    else:
        label = raw_label
    return pd.DataFrame(
        {
            "label": [label],
            "n": [len(pdf)],
            "centroid": [acc / len(pdf)],
        }
    )


def label_centroids(
    df: "DataFrame",
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> "DataFrame":
    """Per-label embedding centroid — a vector-valued aggregate via
    grouped-map applyInPandas (the grouped-map stand-in for a custom UDAF
    with vector state). Rows are folded sequentially in ``id_col`` order so
    the float64 result is bitwise-deterministic and oracle-checkable; see
    _centroid_of_group. The output label column carries the INPUT label
    type (a hardcoded 'label int' schema silently int32-wrapped bigint
    labels and crashed string ones)."""
    label_type = df.schema[label_col].dataType.simpleString()
    return (
        df.select(
            F.col(label_col).alias("label"),
            F.col(vec_col).alias("embedding"),
            F.col(id_col).alias("_order_id"),
        )
        .groupBy("label")
        .applyInPandas(
            _centroid_of_group,
            schema=f"label {label_type}, n long, centroid array<double>",
        )
    )


def token_explode_udtf():
    """Python UDTF (Spark 4 table function): one input row → N output rows,
    defined as a class with a generator ``eval`` — the row-at-a-time
    escape hatch for fan-out logic that doesn't fit explode()/mapInPandas.
    Row-at-a-time means SLOW relative to Arrow paths; reserve UDTFs for
    logic that genuinely needs per-row control flow and bound their input
    (the workload caps doc_id) — this exists to cover the operator shape,
    not as the recommended tokenizer (that's the JVM split/explode)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, tok_idx int, token string")
    class TokenExplode:
        def eval(self, doc_id, text):
            if text is None:
                return
            for i, tok in enumerate(text.split(" ")):
                yield doc_id, i, tok

    return TokenExplode


@F.pandas_udf(DoubleType())  # DataType object: a DDL string would need an
# active session to parse at import time (module imports session-free)
def weighted_mean_cents(values: pd.Series, weights: pd.Series) -> float:
    """Grouped-aggregate pandas UDF (the true custom-UDAF shape: Arrow
    batches of the group in, ONE scalar out — completes the UDF matrix
    next to scalar/grouped-map/mapInPandas/UDTF). Weighted mean computed
    exactly: values centi-quantized to int64, Σ(cents·w) and Σw as
    ARBITRARY-PRECISION Python-int sums (order-free AND overflow-free —
    an int64 numpy dot wraps silently past 2⁶³, and the DuckDB oracle's
    SUM promotes to HUGEINT, so wrapping would be a silent engine
    divergence on exactly the 'exact' path), one correctly-rounded
    division at the end — so the result is bitwise-reproducible under
    any partitioning. Rows with a NULL value or weight are skipped, the
    same rows the oracle's SUM ignores (a NaN reaching
    astype(int64) would silently contribute INT64_MIN).

    Partial aggregation still applies JVM-side for the shuffle: Spark
    feeds this UDAF each group's full Arrow stream post-exchange, but the
    exchange carries only the projected (value, weight) columns."""
    import numpy as np

    vals = values.to_numpy(dtype=np.float64)
    ws = weights.to_numpy(dtype=np.float64)
    ok = ~(np.isnan(vals) | np.isnan(ws))
    v, w_f = vals[ok], ws[ok]
    # the exactness contract is integer accumulation: non-finite or
    # cents-overflow values would reach astype(int64) as INT64_MIN
    # (silent garbage), and fractional weights would silently truncate —
    # both engines' casts ERROR on these inputs, so raise, don't corrupt
    if not (np.isfinite(v).all() and np.isfinite(w_f).all()):
        raise ValueError("weighted_mean_cents: non-finite value/weight")
    if (np.abs(v) >= 9.2e16).any():
        raise ValueError(
            "weighted_mean_cents: |value| too large to centi-quantize "
            "into int64"
        )
    if (w_f != np.floor(w_f)).any():
        raise ValueError(
            "weighted_mean_cents: weights must be integral (the exact "
            "accumulation is integer arithmetic); scale fractional "
            "weights up first"
        )
    cents = np.floor(v * 100.0 + 0.5).astype(np.int64)
    w = w_f.astype(np.int64)
    sw = sum(int(x) for x in w)
    if sw == 0:
        return None  # SQL NULL (the oracle's SUM/SUM is NULL), not NaN
    num = sum(int(c) * int(x) for c, x in zip(cents, w))
    return (num / sw) / 100.0


def event_runs_udtf():
    """Partition-ordered Python UDTF (Spark 4 ``TABLE(...) PARTITION BY
    ... ORDER BY`` form): consumes each user's event stream IN ORDER and
    emits one row per run of consecutive identical event types — the
    gaps-and-islands shape expressed as stateful per-group iteration.
    Spark instantiates the class once per PARTITION BY group and calls
    ``eval`` row-by-row in ORDER BY order, then ``terminate`` at the
    group boundary, so the only state is the current run. Row-at-a-time
    Python is the slow path: the workload bounds its input, and the
    pure-SQL islands trick (row_number difference) is the scale
    implementation — this exists to cover the stateful-UDTF shape."""
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="user_id bigint, run_start timestamp_ntz, "
        "run_type string, run_len int"
    )
    class EventRuns:
        def __init__(self):
            self._cur = None

        def eval(self, row):
            cur = self._cur
            if cur is not None and cur[2] == row["event_type"]:
                self._cur = (cur[0], cur[1], cur[2], cur[3] + 1)
            else:
                if cur is not None:
                    yield cur
                self._cur = (row["user_id"], row["ts"], row["event_type"], 1)

        def terminate(self):
            if self._cur is not None:
                yield self._cur

    return EventRuns
