"""Stream-static enrichment and CDC-style streaming MERGE.

Two streaming patterns every production pipeline hits that the windowed
aggregations don't cover:

* **Stream-static join**: enrich a fact stream with a dimension table.
  Spark re-plans the static side per micro-batch, so a broadcast hint
  keeps every batch a map-side join — no shuffle of the stream, no
  state store. The dimension may be refreshed between batches (each
  batch sees the table as of its own planning).

* **foreachBatch MERGE (CDC apply)**: Structured Streaming has no
  built-in MERGE sink; the standard recipe is ``foreachBatch`` applying
  a batch MERGE per micro-batch. State lives in a versioned directory
  swapped atomically per batch (object-store equivalent: write a new
  prefix, flip a pointer) — the same two-phase shape as
  ``operators.layout.compact``.
"""

from __future__ import annotations

import os
import shutil
from typing import TYPE_CHECKING

from pyspark.sql import functions as F

from etl_manager_spark.operators.upsert import merge_upsert

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession


def stream_static_join(
    stream: "DataFrame",
    dim: "DataFrame",
    on: str,
    how: str = "inner",
) -> "DataFrame":
    """Enrich a streaming DataFrame with a static dimension via broadcast
    — re-resolved every micro-batch, stateless, no watermark needed (only
    stream-stream joins buffer state)."""
    return stream.join(F.broadcast(dim), on=on, how=how)


def apply_cdc_stream(
    spark: "SparkSession",
    changes: "DataFrame",
    key: list[str],
    order_cols: list[str],
    state_path: str,
    checkpoint_path: str,
    delete_col: str | None = None,
) -> "DataFrame":
    """Apply a change stream to a keyed table with MERGE semantics and
    return the final table state (availableNow: process everything queued,
    then stop).

    Per micro-batch: (1) collapse the batch to one row per key — last
    writer wins by ``order_cols`` (a CDC batch can carry several changes
    for one key; applying them unreduced would make the merge
    non-deterministic); (2) MERGE into the current state (updates take
    the change row verbatim, new keys insert, ``delete_col`` rows drop);
    (3) atomically swap the new state version in. Restarts resume from
    the checkpoint: a half-written ``_next`` (crash during the write)
    is simply overwritten, and a crash BETWEEN the two swap moves —
    ``current`` renamed away but the new version not yet promoted — is
    repaired by ``_recover`` before any read: the complete ``_next`` is
    promoted (replaying its batch over it is idempotent: same reduced
    rows merge to the same state), else ``_old`` is restored. Without
    that repair a restart would silently rebuild from an EMPTY table,
    losing every previously applied batch. The input schema may not use
    the internal name ``_cdc_rank``.

    Scale: the per-batch reduce is one shuffle of the BATCH (not the
    table); the merge joins state⋈batch on key — with the state table
    bucketed by key this is the classic incremental-upsert shape (what
    table formats' MERGE does under the hood)."""
    if "_cdc_rank" in changes.columns:
        raise ValueError(
            "apply_cdc_stream: input may not contain '_cdc_rank' "
            "(internal rank column — it would be overwritten and dropped)"
        )
    current = os.path.join(state_path, "current")
    nxt_path = os.path.join(state_path, "_next")
    old_path = os.path.join(state_path, "_old")
    from pyspark.sql import Window

    def _recover() -> None:
        """Repair an interrupted version swap (see docstring)."""
        if os.path.exists(current):
            return
        if os.path.exists(old_path):
            if os.path.exists(nxt_path):
                # the swap moves only start after _next is fully written:
                # _old present means the write completed — promote it
                shutil.move(nxt_path, current)
                shutil.rmtree(old_path, ignore_errors=True)
            else:
                shutil.move(old_path, current)

    def _apply(batch: "DataFrame", batch_id: int) -> None:
        _recover()
        rank = F.row_number().over(
            Window.partitionBy(*key).orderBy(*[F.col(c).desc() for c in order_cols])
        )
        reduced = (
            batch.withColumn("_cdc_rank", rank)
            .filter(F.col("_cdc_rank") == 1)
            .drop("_cdc_rank")
        )
        data_cols = [c for c in reduced.columns if c != delete_col]
        if os.path.exists(current):
            target = batch.sparkSession.read.parquet(current).select(data_cols)
        else:
            target = batch.sparkSession.createDataFrame(
                [], reduced.select(data_cols).schema
            )
        # reduced is key-unique by construction (row_number()==1 over the
        # same key right above) — skip merge's uniqueness window, which
        # would re-shuffle every micro-batch to prove what the reduction
        # already guarantees
        merged = merge_upsert(
            target,
            reduced,
            key=key,
            delete_col=delete_col,
            assume_unique_source=True,
        )
        merged.write.mode("overwrite").parquet(nxt_path)
        if os.path.exists(current):
            shutil.move(current, old_path)
        shutil.move(nxt_path, current)
        shutil.rmtree(old_path, ignore_errors=True)

    q = (
        changes.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    _recover()
    if not os.path.exists(current):
        # zero micro-batches (empty source on first run): the final state
        # is the empty table with the change schema minus the delete flag
        empty_cols = [c for c in changes.columns if c != delete_col]
        return spark.createDataFrame([], changes.select(empty_cols).schema)
    return spark.read.parquet(current)
