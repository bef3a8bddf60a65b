"""BPE merge learning + vocabulary encoding (LLM-pipeline extension).

Tokenizer training at corpus scale, the way production trainers do it
(Sennrich et al. 2016; HF tokenizers): byte-pair merges are learned from
the **word-frequency dictionary**, not the raw corpus. The split of work:

* **Distributed (corpus-scale):** tokenize + count words — one
  map-side-combined ``groupBy`` over the corpus, then a bounded
  ``orderBy().limit(vocab_limit)`` (TakeOrdered heap, no global sort).
  This is the only pass whose cost grows with corpus size; at 100 TB it
  is a single shuffle keyed by word.
* **Driver (dictionary-scale):** the merge rounds. The dictionary is
  bounded by language (≲10⁶ types; capped explicitly), so per-round pair
  counting is O(vocab · word_len) driver work — same precedent as the
  IVF/PQ codebook training in :mod:`.similarity` (bounded collect,
  documented cap).
* **Distributed again (encode):** applying the learned vocabulary is a
  broadcast-map lookup per token — pure JVM expressions, no shuffle
  beyond the per-document re-aggregation.

Merge semantics (parity-critical, mirrored by the DuckDB oracles in
``workloads/curation.py``): each round counts ALL adjacent symbol pairs
(multiplicity included, weighted by word frequency), picks the argmax
with deterministic tie-break (count desc, left asc, right asc), and
replaces occurrences left-to-right non-overlapping. Words are lowercase
``[a-z]+`` tokens of length ≥ 2; no end-of-word marker (documented
simplification — merged symbols compare by string value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_VOCAB_LIMIT = 2000
DEFAULT_NUM_MERGES = 8

WORD_PATTERN = "[a-z]+"


def word_tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus tokens as one ``word`` column (lowercase alphabetic runs)."""
    return docs.select(
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{WORD_PATTERN}', 0)")
        ).alias("word")
    )


def word_counts(
    docs: DataFrame, text_col: str = "text", vocab_limit: int = DEFAULT_VOCAB_LIMIT
) -> DataFrame:
    """Top-``vocab_limit`` word-frequency dictionary (freq desc, word asc —
    a deterministic total order so the truncation boundary is stable)."""
    return (
        word_tokens(docs, text_col)
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(vocab_limit)
    )


def merge_pair_ltr(syms: list[str], left: str, right: str) -> list[str]:
    """Replace (left, right) occurrences left-to-right, non-overlapping."""
    out: list[str] = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def learn_merges(
    vocab: list[tuple[str, int]], num_merges: int = DEFAULT_NUM_MERGES
) -> tuple[list[tuple[int, str, str, int]], dict[str, list[str]]]:
    """Run the merge rounds on a (word, freq) dictionary.

    Returns (merges, final_symbols): merges as
    ``(merge_rank, lft, rgt, pair_freq)`` in learned order, and each
    word's symbol sequence after all merges (the encode table)."""
    words: dict[str, list[str]] = {w: list(w) for w, _ in vocab}
    freqs = dict(vocab)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, num_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            f = freqs[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        # argmax with total-order tie-break: count desc, pair asc
        (lft, rgt), best = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, lft, rgt, best))
        for w in words:
            words[w] = merge_pair_ltr(words[w], lft, rgt)
    return merges, words


def learn_bpe(
    spark: SparkSession,
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = DEFAULT_NUM_MERGES,
    vocab_limit: int = DEFAULT_VOCAB_LIMIT,
) -> tuple[list[tuple[int, str, str, int]], dict[str, list[str]]]:
    """Distributed dictionary build + driver merge rounds (see module doc)."""
    vocab = [
        (r["word"], r["freq"])
        for r in word_counts(docs, text_col, vocab_limit).collect()
    ]
    return learn_merges(vocab, num_merges)


def merges_df(
    spark: SparkSession, merges: list[tuple[int, str, str, int]]
) -> DataFrame:
    return spark.createDataFrame(
        merges, "merge_rank int, lft string, rgt string, pair_freq long"
    )


def encode_symbol_counts(
    docs: DataFrame,
    final_symbols: dict[str, list[str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document token + post-merge symbol counts via broadcast
    dictionary lookup (in-vocab words → learned symbol count; OOV words
    fall back to character count — no merges were learned for them).

    Scale shape: the dictionary travels as a literal map (bounded by
    ``vocab_limit``), tokens never shuffle — the only exchange is the
    per-document re-aggregation, keyed by ``id_col``.

    Documents that tokenize to nothing (NULL/empty text, no letter runs)
    yield NO output row — the explode has nothing to emit. Callers
    needing zero rows for degenerate docs left-join the corpus and
    coalesce the counts to 0.
    """
    entries: list = []
    for w, syms in final_symbols.items():
        entries.append(F.lit(w))
        entries.append(F.lit(len(syms)))
    lookup = F.create_map(*entries) if entries else F.create_map()
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{WORD_PATTERN}', 0)")
        ).alias("word"),
    )
    return (
        toks.withColumn(
            "n_syms",
            F.coalesce(
                F.element_at(lookup, F.col("word")), F.length("word")
            ).cast("long"),
        )
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("n_syms").cast("long").alias("n_bpe_syms"),
        )
    )
