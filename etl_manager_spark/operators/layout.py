"""Data-layout operators: small-file compaction and range-clustered
writes.

At 100 TB the dominant cost of a badly-laid-out table is not compute but
scan planning: millions of KB-sized files (streaming sinks, per-partition
appends) mean millions of parquet footers to read and task-start
overheads that dwarf the I/O. The fixes are layout rewrites:

* ``compact``: rewrite a directory into few, right-sized files. Uses
  ``coalesce`` (narrow — merges scan splits without a shuffle) when
  reducing file count, ``repartition`` only when growing it.
* ``sorted_partitioned_write``: range-partition + sort-within-partition
  on chosen keys before writing, so every parquet file covers a narrow
  key range and min/max row-group stats actually prune (the poor man's
  clustering index; what Z-ordering generalizes to multiple columns).

Both rewrite data without changing it — callers verify with the
row-identity oracle, not by trusting the operator.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def compact(
    spark: SparkSession,
    path: str,
    target_files: int | None = None,
    fmt: str = "parquet",
    target_file_bytes: int | None = None,
) -> dict:
    """Rewrite ``path`` (a directory of ``fmt`` files) into fewer files.
    Pass either an explicit ``target_files`` count, or
    ``target_file_bytes`` to size the count from the data itself
    (``ceil(total_input_bytes / target_file_bytes)``) — the production
    form, since "128 MB files" is the invariant worth holding while data
    volume grows; byte sizes come from the directory listing (local
    stat here; the Hadoop FS listing gives the same numbers on an
    object store). Compressed input bytes understate the rewritten
    size slightly — bias ``target_file_bytes`` low if exact output
    sizing matters.

    Safe against reading-while-overwriting: the rewrite lands in a
    sibling temp dir, which then replaces the original (local/posix
    rename; on an object store you'd write to a new prefix and flip a
    pointer — same two-phase shape).

    Returns {"files_before", "files_after", "rows"} so pipelines can
    assert the rewrite preserved row count and actually shrank the file
    count."""

    def _data_files(p: str) -> list[str]:
        return [
            os.path.join(dp, f)
            for dp, _, files in os.walk(p)
            for f in files
            if not f.startswith(("_", "."))
        ]

    if (target_files is None) == (target_file_bytes is None):
        raise ValueError("pass exactly one of target_files / target_file_bytes")
    if target_file_bytes is not None:
        if target_file_bytes < 1:
            raise ValueError(f"target_file_bytes must be >= 1, got {target_file_bytes}")
        total = sum(os.path.getsize(f) for f in _data_files(path))
        target_files = max(1, -(-total // target_file_bytes))
    if target_files < 1:
        raise ValueError(f"target_files must be >= 1, got {target_files}")

    tmp = path.rstrip("/") + "._compact_tmp"
    old = path.rstrip("/") + "._compact_old"
    # recover an interrupted swap BEFORE reading: a crash between the two
    # moves leaves the only copy at ._compact_old (tmp was verified
    # complete before the moves started — promote it); and a stale _old
    # left behind must be cleared, or shutil.move(path, old) would nest
    # the live table INSIDE it and the later rmtree would delete BOTH
    # generations
    if not os.path.exists(path) and os.path.exists(old):
        if os.path.exists(tmp):
            shutil.move(tmp, path)
            shutil.rmtree(old, ignore_errors=True)
        else:
            shutil.move(old, path)
    if os.path.exists(old):
        shutil.rmtree(old)
    before = len(_data_files(path))
    df = spark.read.format(fmt).load(path)
    rows_before = df.count()
    shrunk = (
        df.coalesce(target_files)
        if target_files <= before
        else df.repartition(target_files)
    )
    shrunk.write.mode("overwrite").format(fmt).save(tmp)
    rows = spark.read.format(fmt).load(tmp).count()
    if rows != rows_before:
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"compact: rewritten row count {rows} != source {rows_before} "
            "— aborting before replacing the original"
        )
    shutil.move(path, old)
    shutil.move(tmp, path)
    shutil.rmtree(old)
    return {
        "files_before": before,
        "files_after": len(_data_files(path)),
        "rows": rows,
    }


def sorted_partitioned_write(
    df: DataFrame,
    path: str,
    range_cols: list[str],
    n_partitions: int,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` range-clustered on ``range_cols``: one shuffle to
    range-partition (contiguous key ranges per partition — unlike hash
    partitioning, which scatters every range over all files), then an
    in-partition sort so row groups within each file are ordered too.
    A later scan filtering on a ``range_cols`` prefix prunes to the few
    files whose min/max stats overlap the predicate."""
    (
        df.repartitionByRange(n_partitions, *[F.col(c) for c in range_cols])
        .sortWithinPartitions(*(sort_cols or range_cols))
        .write.mode("overwrite")
        .format(fmt)
        .save(path)
    )


def zorder_value(
    cols: list[str],
    mins: dict[str, float],
    maxs: dict[str, float],
    bits: int = 16,
) -> "F.Column":
    """Z-order (Morton) key over ``cols``: each column is quantized to
    ``bits`` levels over its [min, max] range, then the bit patterns are
    interleaved — nearby (c1, c2, …) tuples get nearby z-values, so
    range-partitioning + sorting on z clusters EVERY listed column at
    once (single-column range clustering can only serve its leading
    column). Pure JVM bit arithmetic (shiftleft/bitwise-or), no Python.

    ``mins``/``maxs`` come from a prior ``describe``/``ANALYZE`` pass or
    known domain bounds — at 100 TB you have table stats anyway; clamping
    handles stragglers outside the declared range."""
    if not cols:
        raise ValueError("zorder_value needs at least one column")
    if bits * len(cols) > 63:
        raise ValueError(
            f"{len(cols)} cols × {bits} bits = {bits * len(cols)} "
            "interleaved bits — must fit a signed int64 (≤ 63)"
        )
    quantized = []
    for c in cols:
        lo, hi = float(mins[c]), float(maxs[c])
        span = hi - lo if hi > lo else 1.0
        q = F.floor(
            (
                F.least(F.greatest(F.col(c).cast("double"), F.lit(lo)), F.lit(hi))
                - F.lit(lo)
            )
            / F.lit(span)
            * F.lit(float(2**bits - 1))
            + F.lit(0.5)
        ).cast("long")
        quantized.append(q)
    z = F.lit(0).cast("long")
    # interleave: output bit (b * n_cols + i) = bit b of column i
    for b in range(bits):
        for i, q in enumerate(quantized):
            bit = F.shiftright(q, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * len(quantized) + i))
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    n_partitions: int,
    bits: int = 16,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` Z-order-clustered on ``zorder_cols``: one stats pass
    for per-column min/max (a single tiny aggregate), then range-partition
    + sort on the interleaved Morton key. Every file then covers a small
    hyper-rectangle of the listed columns, so min/max row-group stats
    prune scans filtering on ANY of them — the multi-column generalization
    of :func:`sorted_partitioned_write`."""
    aggs = []
    for c in zorder_cols:
        aggs += [F.min(F.col(c).cast("double")).alias(f"_min_{c}"),
                 F.max(F.col(c).cast("double")).alias(f"_max_{c}")]
    if "_z" in df.columns:
        raise ValueError(
            "zorder_write: input may not contain '_z' (internal Morton-key "
            "column — it would be overwritten and dropped)"
        )
    row = df.agg(*aggs).first()
    mins = {c: row[f"_min_{c}"] for c in zorder_cols}
    maxs = {c: row[f"_max_{c}"] for c in zorder_cols}
    if any(mins[c] is None or maxs[c] is None for c in zorder_cols):
        # empty frame or all-NULL z-column: no stats to interleave on —
        # write as-is (sorted_partitioned_write handles this fine too)
        df.write.mode("overwrite").format(fmt).save(path)
        return
    z = zorder_value(zorder_cols, mins, maxs, bits=bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_partitions, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .format(fmt)
        .save(path)
    )
