"""Sequence packing and mixture sampling: the two corpus-assembly steps
between "filtered documents" and "training batches" in an LLM data
pipeline.

Packing turns variable-length documents into fixed-token-budget training
sequences (unfilled context is wasted compute — packing efficiency is a
first-order pretraining cost driver). Mixture sampling realizes a target
domain mix ("x tokens of web, y of code, …") as a deterministic document
subset.

Neither exists in the reference (its pipelines stop at table writes —
see reference etl.py GlueJob outputs); both are standard published
practice (GPT-3 / Gopher / LLaMA data sections describe exactly these
steps) and both are shaped here for Spark scale:

* packing is embarrassingly parallel across hash shards — ONE shuffle on
  the shard key, sequential greedy fold only within a shard, and only
  (id, n_tokens) pairs ever cross into Python (Arrow-batched); the text
  column stays JVM-side untouched.
* mixture sampling is a single window pass per domain — ONE shuffle on
  the domain key; the keep/drop decision is a pure function of row
  identity (md5 priority order), so any engine reproduces the same set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_manager_spark.operators.text import token_count


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_tokens: int = 128,
    n_shards: int = 16,
) -> DataFrame:
    """Greedy in-order sequence packing: within each of ``n_shards`` hash
    shards, documents (ordered by id) are folded into bins of at most
    ``seq_tokens`` whitespace tokens — a document that would overflow the
    current bin opens the next one; a document larger than the budget
    gets a bin of its own (callers chunk oversized docs first, see
    :func:`etl_manager_spark.operators.text.chunk_documents`).

    Shard = the shortest ``md5(id)`` hex prefix wide enough for
    ``n_shards`` buckets, mod ``n_shards`` (one digit up to 16 shards) —
    deterministic, uniform, and engine-independent, so the full packing
    layout (shard, seq_id per doc) is reproducible anywhere, which is
    what makes resumable / auditable training-data builds possible.

    Scale shape: token counts are computed JVM-side; only (shard, id,
    n_tokens) reaches the grouped Arrow fold — a few bytes per document
    regardless of text size. One hash shuffle on the shard key; each
    shard's fold is O(docs in shard) with O(1) state. At 100 TB you raise
    ``n_shards`` to keep shards executor-sized (the shard count bounds
    parallelism); packing quality is unaffected because bins never cross
    shards by construction.

    Returns (shard, <id_col>, n_tokens, seq_id): ``seq_id`` is the
    0-based bin index within the shard."""
    import pandas as pd

    if seq_tokens <= 0:
        raise ValueError(f"seq_tokens must be positive, got {seq_tokens}")
    if not 1 <= n_shards <= 16**8:
        raise ValueError(f"n_shards must be in [1, 16^8], got {n_shards}")
    # smallest md5-hex prefix wide enough for n_shards buckets: 1 digit up
    # to 16 shards (the oracle-replayable form), more digits for the
    # 100 TB fan-outs the docstring prescribes — for n_shards <= 16 the
    # assignment is bit-for-bit the historical single-digit rule
    digits = 1
    while 16**digits < n_shards:
        digits += 1
    slim = df.select(
        F.pmod(
            F.conv(
                F.substring(F.md5(F.col(id_col).cast("string")), 1, digits), 16, 10
            ).cast("long"),
            F.lit(n_shards),
        )
        .cast("int")
        .alias("shard"),
        F.col(id_col),
        token_count(text_col).cast("long").alias("n_tokens"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        seq_ids = []
        fill = 0
        sid = 0
        first = True
        for n in pdf["n_tokens"]:
            if first:
                fill = n
                first = False
            elif fill + n <= seq_tokens:
                fill += n
            else:
                sid += 1
                fill = n
            seq_ids.append(sid)
        pdf["seq_id"] = pd.Series(seq_ids, dtype="int64")
        return pdf

    id_dtype = df.schema[id_col].dataType.simpleString()
    return slim.groupBy("shard").applyInPandas(
        _pack,
        schema=f"shard int, {id_col} {id_dtype}, n_tokens long, seq_id long",
    )


def mixture_sample_by_token_budget(
    df: DataFrame,
    budgets: dict[str, int],
    default_budget: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic domain-mixture sampling: keep documents per source in
    md5-priority order until the source's token budget is reached (a
    document is kept iff the running token total INCLUDING it stays
    within budget — the mix never overshoots).

    The priority order hashes row identity (``md5(id)``, ties broken by
    id), so the selected set is independent of partitioning, engine, and
    run — rerunning the pipeline, or auditing it with another engine,
    selects the identical documents. One window pass partitioned by
    source: a single shuffle on the domain key; at 100 TB a domain's
    window is one sorted pass, and a skewed mega-domain can be pre-split
    by a salt digit and budget-divided the same way.

    Returns (<id_col>, <source_col>, n_tokens, cum_tokens) for kept
    documents only."""
    from pyspark.sql import Window

    order_key = F.md5(F.col(id_col).cast("string"))
    w = (
        Window.partitionBy(source_col)
        .orderBy(order_key, F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    budget_expr = F.coalesce(
        *(
            [
                F.when(F.col(source_col) == src, F.lit(int(b)))
                for src, b in sorted(budgets.items())
            ]
            + [F.lit(int(default_budget))]
        )
    )
    return (
        df.select(
            F.col(id_col),
            F.col(source_col),
            token_count(text_col).cast("long").alias("n_tokens"),
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= budget_expr)
        .select(id_col, source_col, "n_tokens", "cum_tokens")
    )
