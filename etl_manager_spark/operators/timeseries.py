"""Ordered per-key time-series analytics.

The shape that SQL windows cannot express: a value that depends on the
PREVIOUS output, not the previous input (EWMA, compound interest, state
machines). Spark's window functions stop at lag/lead over inputs, so
these fold sequentially within a key via Arrow-grouped pandas — parallel
across keys, sequential only inside one key's (small) history, the same
sharding argument as ``operators/packing.pack_sequences``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _same_key(a, b) -> bool:
    """Key equality for the sorted-stream folds. A NULL numeric key
    reaches pandas as NaN, and NaN != NaN would re-initialize the state
    on EVERY row of the NULL-keyed series; None/NaN must each compare
    equal to themselves here (the NULL key is one real series)."""
    if a is b:
        return True
    try:
        if a != a and b != b:  # both NaN
            return True
    except TypeError:
        pass
    return a == b


def _foldable_values(df: DataFrame, value_col: str):
    """Rows the integer-quantized folds can consume: non-null, and for
    floating columns finite with |v| small enough that floor(v·1e9+0.5)
    fits int64 — NaN/Inf passed isNotNull and crashed math.floor inside
    the fold; out-of-range values silently wrapped np.int64. Skipped
    rows behave like the NULLs the filter already skipped."""
    cond = F.col(value_col).isNotNull()
    if dict(df.dtypes).get(value_col) in ("float", "double"):
        cond = (
            cond
            & ~F.isnan(F.col(value_col))
            & (F.abs(F.col(value_col)) < F.lit(9.2e9))
        )
    return cond


def ewma_per_key(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    alpha: float = 0.5,
) -> DataFrame:
    """Exponentially-weighted moving average of ``value_col`` per key in
    event-time order: ``e_1 = v_1``, ``e_i = (1-α)·e_{i-1} + α·v_i``.
    The smoothing baseline behind rate-anomaly detection and engagement
    decay scores.

    Rows are totally ordered within a key by (ts, id) — the id tiebreak
    makes simultaneous events deterministic. The recurrence is evaluated
    as literally written, one float multiply-add pair per row in input
    order, so any engine replaying the same recurrence (e.g. a DuckDB
    recursive CTE) produces bitwise-identical doubles; α = 0.5 keeps
    both products exact (exponent shifts). The emitted value is
    nano-quantized to int64 so the driver's value hash never sees raw
    float encodings.

    Scale shape: ONE shuffle on the key; per-key state during the fold
    is a single double. The Python loop touches only (id, ts, value)
    triples — a few dozen bytes per row, Arrow-batched per key group.
    Key-count parallelism is the unit of scale-out, same as any
    sessionization.

    Rows with a NULL ``value_col`` are dropped before the fold (no state
    update, no output row) — the standard "missing sample" treatment;
    without the explicit filter a NULL would arrive in the Arrow batch
    as NaN, silently poison the running average for every later row of
    the key, and then crash the int64 quantization.

    Returns (<key_col>, <id_col>, ewma_q)."""
    import math

    import numpy as np
    import pandas as pd

    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    one_minus = 1.0 - alpha

    # Sorted-stream fold, NOT applyInPandas: a grouped fold pays pandas
    # group-construction overhead once per KEY (millions of tiny frames
    # for a user-keyed stream). Instead co-locate each key with one
    # repartition, sort within partitions by (key, ts, id), and fold the
    # resulting ordered stream — carrying (last_key, e) across Arrow
    # batches, since a key's run may straddle a batch boundary. One
    # Python-level loop over scalar floats; the frames stay Arrow-sized.
    def _fold_stream(batches):
        last_key = object()  # sentinel no data key can equal (a NULL
        # key is a REAL series and must trigger initialization)
        e = 0.0
        for pdf in batches:
            keys = pdf[key_col].to_numpy()
            vals = pdf[value_col].to_numpy()
            out = np.empty(len(pdf), dtype=np.int64)
            for i in range(len(pdf)):
                k = keys[i]
                v = float(vals[i])
                if not _same_key(k, last_key):
                    e = v
                    last_key = k
                else:
                    e = one_minus * e + alpha * v
                # quantize exactly like functions/exact.py: floor(x·1e9+0.5)
                out[i] = math.floor(e * 1e9 + 0.5)
            yield pd.DataFrame(
                {key_col: keys, id_col: pdf[id_col].to_numpy(), "ewma_q": out}
            )

    key_dtype = df.schema[key_col].dataType.simpleString()
    id_dtype = df.schema[id_col].dataType.simpleString()
    cols = list(dict.fromkeys([key_col, ts_col, id_col, value_col]))
    order = list(dict.fromkeys([key_col, ts_col, id_col]))
    slim = (
        df.select(*cols)
        .filter(
            # a row with no event time has no position in the fold order
            _foldable_values(df, value_col) & F.col(ts_col).isNotNull()
        )
        .repartition(F.col(key_col))
        .sortWithinPartitions(*order)
    )
    return slim.mapInPandas(
        _fold_stream, schema=f"{key_col} {key_dtype}, {id_col} {id_dtype}, ewma_q long"
    )


def holt_per_key(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Holt linear (double-exponential) smoothing per key in event-time
    order — the level+trend extension of :func:`ewma_per_key`, the
    standard short-horizon forecaster for per-entity metrics:

    * ``ℓ_1 = v_1``, ``b_1 = 0``
    * ``ℓ_i = ½·v_i + ½·(ℓ_{i-1} + b_{i-1})``
    * ``b_i = ½·(ℓ_i − ℓ_{i-1}) + ½·b_{i-1}``

    α = β = ½ keeps every product an exponent shift (exact IEEE), and
    both recurrences are evaluated as literally written, so a DuckDB
    recursive CTE replaying the same expression text produces bitwise-
    identical doubles. NULL values are dropped before the fold (missing
    sample — same policy and reasoning as ewma_per_key).

    Scale shape: identical to ewma_per_key — one shuffle on the key,
    sorted-stream fold with TWO doubles of per-key state, Arrow-batched;
    no per-key pandas frames.

    Returns (<key_col>, <id_col>, level_q, trend_q) nano-quantized."""
    import math

    import numpy as np
    import pandas as pd

    def _fold_stream(batches):
        last_key = object()  # sentinel no data key can equal (a NULL
        # key is a REAL series and must trigger initialization)
        lvl = 0.0
        trd = 0.0
        for pdf in batches:
            keys = pdf[key_col].to_numpy()
            vals = pdf[value_col].to_numpy()
            out_l = np.empty(len(pdf), dtype=np.int64)
            out_b = np.empty(len(pdf), dtype=np.int64)
            for i in range(len(pdf)):
                k = keys[i]
                v = float(vals[i])
                if not _same_key(k, last_key):
                    lvl = v
                    trd = 0.0
                    last_key = k
                else:
                    prev = lvl
                    lvl = 0.5 * v + 0.5 * (prev + trd)
                    trd = 0.5 * (lvl - prev) + 0.5 * trd
                out_l[i] = math.floor(lvl * 1e9 + 0.5)
                out_b[i] = math.floor(trd * 1e9 + 0.5)
            yield pd.DataFrame(
                {
                    key_col: keys,
                    id_col: pdf[id_col].to_numpy(),
                    "level_q": out_l,
                    "trend_q": out_b,
                }
            )

    key_dtype = df.schema[key_col].dataType.simpleString()
    id_dtype = df.schema[id_col].dataType.simpleString()
    cols = list(dict.fromkeys([key_col, ts_col, id_col, value_col]))
    order = list(dict.fromkeys([key_col, ts_col, id_col]))
    slim = (
        df.select(*cols)
        .filter(
            # a row with no event time has no position in the fold order
            _foldable_values(df, value_col) & F.col(ts_col).isNotNull()
        )
        .repartition(F.col(key_col))
        .sortWithinPartitions(*order)
    )
    return slim.mapInPandas(
        _fold_stream,
        schema=(
            f"{key_col} {key_dtype}, {id_col} {id_dtype}, "
            "level_q long, trend_q long"
        ),
    )


def holt_winters_additive_per_key(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "day",
    id_col: str = "day",
    value_col: str = "v",
    period: int = 7,
) -> DataFrame:
    """Holt–Winters ADDITIVE smoothing per key in event-time order —
    level + trend + a ``period``-slot seasonal cycle, the triple-
    exponential member of the family next to :func:`ewma_per_key` and
    :func:`holt_per_key`. With all three smoothing constants pinned at
    ½ (exponent shifts) and a zero-initialized seasonal cycle the whole
    trajectory is a deterministic IEEE expression chain:

    * ``ℓ_1 = v_1``, ``b_1 = 0``, seasonal slots start at 0
    * ``ℓ_i = ½·(v_i − s_{i−m}) + ½·(ℓ_{i−1} + b_{i−1})``
    * ``b_i = ½·(ℓ_i − ℓ_{i−1}) + ½·b_{i−1}``
    * ``s_i = ½·(v_i − ℓ_i) + ½·s_{i−m}``  (``s_{i−m} = 0`` while the
      cycle is still filling)

    Every step evaluates the recurrences as literally written, so a
    DuckDB recursive CTE carrying the last ``period`` seasonal values
    in a LIST column and replaying the same expression text produces
    bitwise-identical doubles.

    Scale shape: identical to holt_per_key — one shuffle on the key,
    sorted-stream Arrow fold; per-key state is 2 doubles + a
    ``period``-slot ring, independent of series length.

    Returns (<key_col>, <id_col>, level_q, trend_q, seasonal_q)
    nano-quantized."""
    import math
    from collections import deque

    import numpy as np
    import pandas as pd

    def _fold_stream(batches):
        last_key = object()  # sentinel no data key can equal (a NULL
        # key is a REAL series and must trigger initialization)
        lvl = 0.0
        trd = 0.0
        ring: deque = deque()
        for pdf in batches:
            keys = pdf[key_col].to_numpy()
            vals = pdf[value_col].to_numpy()
            out_l = np.empty(len(pdf), dtype=np.int64)
            out_b = np.empty(len(pdf), dtype=np.int64)
            out_s = np.empty(len(pdf), dtype=np.int64)
            for i in range(len(pdf)):
                k = keys[i]
                v = float(vals[i])
                if not _same_key(k, last_key):
                    lvl = v
                    trd = 0.0
                    ring = deque()
                    s_new = 0.5 * (v - lvl) + 0.5 * 0.0
                    last_key = k
                else:
                    s_old = ring[0] if len(ring) >= period else 0.0
                    prev = lvl
                    lvl = 0.5 * (v - s_old) + 0.5 * (prev + trd)
                    trd = 0.5 * (lvl - prev) + 0.5 * trd
                    s_new = 0.5 * (v - lvl) + 0.5 * s_old
                if len(ring) >= period:
                    ring.popleft()
                ring.append(s_new)
                out_l[i] = math.floor(lvl * 1e9 + 0.5)
                out_b[i] = math.floor(trd * 1e9 + 0.5)
                out_s[i] = math.floor(s_new * 1e9 + 0.5)
            yield pd.DataFrame(
                {
                    key_col: keys,
                    id_col: pdf[id_col].to_numpy(),
                    "level_q": out_l,
                    "trend_q": out_b,
                    "seasonal_q": out_s,
                }
            )

    key_dtype = df.schema[key_col].dataType.simpleString()
    id_dtype = df.schema[id_col].dataType.simpleString()
    # ts/id may be the SAME column (a daily series is ordered and
    # identified by its day) — dedupe before select
    cols = list(dict.fromkeys([key_col, ts_col, id_col, value_col]))
    order = list(dict.fromkeys([key_col, ts_col, id_col]))
    slim = (
        df.select(*cols)
        .filter(
            # a row with no event time has no position in the fold order
            _foldable_values(df, value_col) & F.col(ts_col).isNotNull()
        )
        .repartition(F.col(key_col))
        .sortWithinPartitions(*order)
    )
    return slim.mapInPandas(
        _fold_stream,
        schema=(
            f"{key_col} {key_dtype}, {id_col} {id_dtype}, "
            "level_q long, trend_q long, seasonal_q long"
        ),
    )
