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
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Greedy in-order sequence packing: within each of ``n_shards`` hash
    shards, documents (ordered by ``order_cols``, default ``[id_col]``)
    are folded into bins of at most
    ``seq_tokens`` whitespace tokens — a document that would overflow the
    current bin opens the next one; a document larger than the budget
    gets a bin of its own (callers chunk oversized docs first, see
    :func:`etl_manager_spark.operators.text.chunk_documents`).

    ``order_cols`` must be a TOTAL order within each shard or the packing
    layout is not reproducible: rows tying on the sort key fold in
    partition-arrival order, which varies per run. In particular the
    chunk_documents → pack_sequences composition duplicates ``id_col``
    (one row per chunk), so pass ``order_cols=[id_col, "chunk_idx"]``
    there; the extra order columns ride through to the output.

    Shard = an ``md5(id)`` hex prefix mod ``n_shards`` — deterministic,
    uniform, and engine-independent, so the full packing layout (shard,
    seq_id per doc) is reproducible anywhere, which is what makes
    resumable / auditable training-data builds possible. The prefix
    width is the smallest where ``16^digits`` is an exact multiple of
    ``n_shards`` (bit-for-bit the historical 1-digit rule for 16-shard
    layouts), else wide enough that the modulo bias is ≤ 2⁻²⁰ — the
    minimal-width rule gave the low shards up to 2× the documents of
    the high ones whenever ``n_shards`` didn't divide ``16^digits``
    (e.g. 10 shards from 1 digit: 6 shards at 2/16, 4 at 1/16), which
    breaks the executor-sizing math the docstring prescribes.

    Scale shape: token counts are computed JVM-side; only (shard, id,
    n_tokens) reaches the grouped Arrow fold — a few bytes per document
    regardless of text size. One hash shuffle on the shard key; each
    shard's fold is O(docs in shard) with O(1) state. At 100 TB you raise
    ``n_shards`` to keep shards executor-sized (the shard count bounds
    parallelism); packing quality is unaffected because bins never cross
    shards by construction.

    Returns (shard, <order_cols>, n_tokens, seq_id): ``seq_id`` is the
    0-based bin index within the shard."""
    import pandas as pd

    order_cols = list(order_cols or [id_col])
    if id_col not in order_cols:
        raise ValueError(
            f"order_cols must include id_col ({id_col!r}) — the shard key "
            "hashes it"
        )
    if seq_tokens <= 0:
        raise ValueError(f"seq_tokens must be positive, got {seq_tokens}")
    if not 1 <= n_shards <= 16**8:
        raise ValueError(f"n_shards must be in [1, 16^8], got {n_shards}")
    digits = 1
    while 16**digits % n_shards != 0 and 16**digits < n_shards << 20:
        digits += 1
    slim = df.select(
        F.pmod(
            F.conv(
                F.substring(
                    # null ids coalesce to the empty-string draw, the
                    # house rule from sampling.hash_bucket — md5(NULL) is
                    # NULL and would put null-id docs in a NULL shard
                    # outside the documented [0, n_shards) layout
                    F.md5(F.coalesce(F.col(id_col).cast("string"), F.lit(""))),
                    1,
                    digits,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(n_shards),
        )
        .cast("int")
        .alias("shard"),
        *[F.col(c) for c in order_cols],
        # null text counts 0 tokens: token_count(NULL) is NULL and a NaN
        # reaching the greedy fold poisons every later comparison in the
        # shard (each doc then opens its own bin, silently)
        F.coalesce(token_count(text_col).cast("long"), F.lit(0)).alias(
            "n_tokens"
        ),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        # mergesort: stable, so equal keys at least fold in a consistent
        # relative order within one materialization; the REPRODUCIBLE-
        # layout contract still requires order_cols to be a total order
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(drop=True)
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

    order_schema = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in order_cols
    )
    return slim.groupBy("shard").applyInPandas(
        _pack,
        schema=f"shard int, {order_schema}, n_tokens long, seq_id long",
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

    # null-id coalesce per the sampling.hash_bucket rule: md5(NULL) is
    # NULL and NULL sorts FIRST in the window — a null-id doc would jump
    # the priority queue and consume budget ahead of every real document.
    # n_tokens is the FINAL tie-break: duplicate ids (conflicting-payload
    # dups in hostile data) tie on (pri, id), and the budget cut between
    # the copies would otherwise fall arbitrarily per engine/run; rows
    # still tying after n_tokens are interchangeable for the fold (equal
    # contribution, identical output row)
    order_key = F.md5(F.coalesce(F.col(id_col).cast("string"), F.lit("")))
    w = (
        Window.partitionBy(source_col)
        .orderBy(order_key, F.col(id_col), F.col("n_tokens"))
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
            # null text counts 0 tokens (window SUM would silently skip a
            # NULL, letting the doc ride inside the budget for free)
            F.coalesce(token_count(text_col).cast("long"), F.lit(0)).alias(
                "n_tokens"
            ),
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= budget_expr)
        .select(id_col, source_col, "n_tokens", "cum_tokens")
    )
