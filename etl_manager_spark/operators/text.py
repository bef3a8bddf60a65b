"""Text-analysis operators over a document table (SURVEY §2.D).

All operators are pure ``pyspark.sql.functions`` expressions — JVM-side,
whole-stage-codegen, no Python in the row path — so they scale linearly
with executors at 100 TB. Tokenization is a simple whitespace split; swap
in a BPE-ish regex via the ``pattern`` argument where needed.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_TOKEN_PATTERN = r"\s+"

# Tiny built-in stopword/marker sets. Deterministic and engine-portable —
# good enough for quality ratios; swap for real lexicons in production.
STOPWORDS = ("the", "a", "an", "of", "and", "to", "in", "is", "it", "that")

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "y", "que"),
    "fr": ("le", "la", "de", "et", "que"),
    "de": ("der", "die", "das", "und", "ist"),
}


def tokens(col: Column | str, pattern: str = DEFAULT_TOKEN_PATTERN) -> Column:
    """Whitespace/regex tokenizer → array<string>, with boundary empties
    REMOVED: Java's split keeps a leading '' for leading separators, and
    F.trim strips only ASCII space — so '\\n'-bounded text (most
    file-sourced text ends in a newline) used to yield phantom ''
    tokens that inflated every token count and shifted fingerprints.
    The filter form is boundary-agnostic for ANY whitespace. DuckDB
    oracle twin:
    ``LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+'), x -> x <> '')``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, pattern), lambda t: t != F.lit(""))


def token_count(col: Column | str) -> Column:
    # nullif(-1): with ANSI off (legacy deployments) size(NULL) is -1,
    # not NULL — callers' coalesce(token_count, 0) guards must hold on
    # any deployment, not just the ANSI-on default
    return F.nullif(F.size(tokens(col)), F.lit(-1))


def distinct_token_count(col: Column | str) -> Column:
    return F.nullif(F.size(F.array_distinct(tokens(col))), F.lit(-1))


# GPT-2-style pre-tokenizer, simplified to the regex subset Java regex and
# RE2 (DuckDB) interpret identically: contraction suffixes, letter runs,
# digit runs, punctuation runs — each optionally absorbing one leading
# space. A whitespace-only stretch yields no token.
BPE_TOKEN_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


def bpe_token_count(col: Column | str, pattern: str = BPE_TOKEN_PATTERN) -> Column:
    """Subword-ish token count: number of pre-tokenizer matches. The real
    BPE merge table is model-specific; the pre-tokenizer match count is
    the piece count an actual BPE would start from, which is the quantity
    training-data pipelines budget by."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0)))


def stopword_ratio(col: Column | str, stopwords=STOPWORDS) -> Column:
    """NULL for token-less (empty/whitespace-only) docs — 0/0 would throw
    under ANSI now that tokens() filters boundary empties."""
    toks = tokens(col)
    stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(*stopwords)))
    n = F.size(toks)
    return F.when(n == 0, F.lit(None).cast("double")).otherwise(
        stop.cast("double") / n.cast("double")
    )


def quality_score(text_col: Column | str) -> Column:
    """Heuristic document-quality score in [0,1]: length band + alpha ratio
    + non-degenerate token diversity. Deterministic integer/compare logic so
    it is portable across engines."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    n_tok = token_count(c)
    n_distinct = distinct_token_count(c)
    length_ok = (F.length(c) >= 20) & (F.length(c) <= 100000)
    diversity = n_distinct.cast("double") / n_tok.cast("double")
    # tokens() filters boundary empties so n_tok == 0 is real for
    # empty/whitespace-only text; the explicit trim test stays as the
    # engine-portable belt (and documents the intended score-0 path)
    return (
        F.when((F.trim(c) == "") | (n_tok == 0), F.lit(0.0))
        .otherwise(
            (length_ok.cast("double") + (diversity > 0.1).cast("double") + diversity)
            / F.lit(3.0)
        )
    )


def language_id(text_col: Column | str, markers: dict[str, tuple[str, ...]] | None = None) -> Column:
    """Marker-word language heuristic: count hits per language's marker set,
    pick the argmax (ties → lexicographically first language), 'und' when no
    marker hits. A real system would use char n-gram models; the operator
    shape (pure expression, no shuffle) is the point here. An explicitly
    EMPTY marker dict classifies everything 'und' (it is not a request
    for the defaults — only None is)."""
    markers = markers if markers is not None else LANG_MARKERS
    if not markers:
        return F.lit("und")
    toks = tokens(text_col)

    def _hits(mset):
        # factory binds mset per language (a default arg on the lambda would
        # change its arity — PySpark maps lambda params to HOF variables)
        return F.size(F.filter(toks, lambda t: F.lower(t).isin(*mset)))

    scored = F.array(
        *[
            F.struct(_hits(mset).alias("hits"), F.lit(lang).alias("lang"))
            for lang, mset in sorted(markers.items())
        ]
    )
    # explicit fold keeping the first max → ties resolve to the
    # lexicographically-first language (scored is sorted by lang)
    folded = F.aggregate(
        scored,
        F.struct(F.lit(-1).alias("hits"), F.lit("und").alias("lang")),
        lambda acc, s: F.when(s["hits"] > acc["hits"], s).otherwise(acc),
    )
    return F.when(folded["hits"] <= 0, F.lit("und")).otherwise(folded["lang"])


def rolling_fingerprint(
    text_col: Column | str, window: int = 8, mod: int = 1_000_000_007
) -> Column:
    """Winnowing-style rolling-hash fingerprint: Karp-Rabin polynomial
    hash (base 31, prime modulus) of every ``window``-char substring of
    the normalized text, folded to the minimum — documents sharing any
    window collide with high probability, the classic local-similarity
    fingerprint.

    All-integer JVM expression in its FUSED single-expression form: each
    window folds ``acc*31 + ascii(substr(s, j, 1))`` directly — usable
    wherever one Column expression is required, but the interpreted HOF
    re-evaluates the normalized-string subtree per fold step, so this
    form is O(len·window·normalize). For the staged O(len·window) fast
    path (decode to a char-code array ONCE, then element_at lookups —
    the 120 s → 14 s on 5000 docs at sf0.1 numbers), use
    :func:`with_rolling_fingerprint`. HOFs can't stream carry
    state across windows, so the fold itself is still O(len·window). The
    per-step modulus keeps the accumulator < mod·31 + 255, well inside
    int64 in both Spark and the DuckDB oracle (exact integer parity)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    s = _normalize_for_fp(c, window)
    # NB: as a single fused expression we must fold over substr directly.
    # Splicing char_codes(s) inline would put the whole O(len) decode
    # INSIDE the per-step lambda (re-evaluated per fold step — quadratic);
    # use with_rolling_fingerprint for the staged O(len·window) form.
    starts = F.sequence(F.lit(1), F.greatest(F.length(s) - (window - 1), F.lit(1)))

    def window_hash(i):
        return F.aggregate(
            F.sequence(i, i + (window - 1)),
            F.lit(0).cast("long"),
            lambda acc, j: (acc * 31 + F.ascii(F.substr(s, j, F.lit(1)))) % mod,
        )

    return F.array_min(F.transform(starts, window_hash))


def _normalize_for_fp(c: Column, window: int) -> Column:
    """lowercase, collapse whitespace, right-pad to ``window`` chars so
    every string has ≥ 1 full window (avoids out-of-bounds element_at
    under ANSI mode; a no-op for normal documents). NB rpad truncates
    longer strings, hence the length guard."""
    s = F.lower(F.regexp_replace(c, r"\s+", " "))
    return F.when(F.length(s) < window, F.rpad(s, window, " ")).otherwise(s)


def char_codes(str_col: Column) -> Column:
    """array<int> of the string's char codes (one substr/ascii pass)."""
    return F.transform(
        F.sequence(F.lit(1), F.length(str_col)),
        lambda j: F.ascii(F.substr(str_col, j, F.lit(1))),
    )


def _fingerprint_of_codes(codes: Column, window: int, mod: int) -> Column:
    n_windows = F.greatest(F.size(codes) - (window - 1), F.lit(1))

    # fold over a constant offset array (constant-folded once, no
    # per-window sequence allocation); same fold order → same values
    offsets = F.sequence(F.lit(0), F.lit(window - 1))

    def window_hash(i):
        return F.aggregate(
            offsets,
            F.lit(0).cast("long"),
            lambda acc, k: (acc * 31 + F.element_at(codes, i + k)) % mod,
        )

    return F.array_min(F.transform(F.sequence(F.lit(1), n_windows), window_hash))


def with_rolling_fingerprint(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "fingerprint",
    window: int = 8,
    mod: int = 1_000_000_007,
) -> DataFrame:
    """Two-projection form: materialize the char-code array in its own
    column first so each code is decoded exactly once per document, then
    fold windows over element_at lookups. Relying on expression-level CSE
    inside nested lambdas is not safe — as one fused expression the codes
    subtree sits inside the per-step lambda and may be re-evaluated per
    fold step."""
    s = _normalize_for_fp(F.col(text_col), window)
    if "_rf_codes" in df.columns:
        raise ValueError(
            "with_rolling_fingerprint: input may not contain '_rf_codes' "
            "(internal staging column — it would be overwritten and dropped)"
        )
    staged = df.withColumn("_rf_codes", char_codes(s))
    out = staged.withColumn(
        out_col, _fingerprint_of_codes(F.col("_rf_codes"), window, mod)
    )
    return out.drop("_rf_codes")


def rolling_fingerprint_vectorized(
    text_col: Column | str, window: int = 8, mod: int = 1_000_000_007
) -> Column:
    """Arrow-batched numpy form of :func:`rolling_fingerprint` — byte-for-
    byte the same integer fold ((acc·31 + code) % mod per step, min over
    windows), but each fold step is one vectorized op across ALL of a
    document's windows, so the per-document cost is ``window`` numpy ops
    instead of len·window interpreted lambda steps (23 s → ~2 s on 5000
    docs at sf0.1). int64 stays exact: acc < mod·31 + 255 « 2⁶³.

    This is the sanctioned escape hatch: the pure-JVM HOF expression is
    semantically fine but interpreted per element; when that interpreter
    floor dominates, Arrow+numpy is the faster engine for the identical
    arithmetic."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col

    @F.pandas_udf("long")
    def _fp(texts: pd.Series) -> pd.Series:
        import re

        import numpy as np

        def one(t):
            if t is None:
                return None
            # re.ASCII pins \s to the JVM regexp_replace default (ASCII
            # whitespace only) — without it Python collapses \xa0 /
            #   etc. and the fingerprint diverges from the JVM twin
            s = re.sub(r"\s+", " ", t, flags=re.ASCII).lower()
            if len(s) < window:
                s = s.ljust(window, " ")
            codes = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(
                np.int64
            )
            n_win = codes.size - (window - 1)
            acc = np.zeros(n_win, dtype=np.int64)
            base = np.arange(n_win)
            for k in range(window):
                acc = (acc * 31 + codes[base + k]) % mod
            return int(acc.min())

        return pd.Series([one(t) for t in texts])

    return _fp(c)


def cdc_chunk_stats_vectorized(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    mod: int = 1_000_000_007,
    mask: int = 63,
) -> DataFrame:
    """Arrow-batched numpy form of :func:`cdc_chunk_stats` — the same
    Karp-Rabin boundary rule value-for-value (per-step ``(acc·31 + code)
    % mod`` fold, cut where the window hash ≡ 0 (mod mask+1)), but each
    fold step is ONE vectorized op across all of a document's windows,
    so the per-document cost is ``window`` numpy ops instead of
    len·window interpreted lambda steps (the
    :func:`rolling_fingerprint_vectorized` escape hatch, applied to
    chunking; measured 7.6 s → ~1 s for the catalog query at sf0.1).

    Parity notes (tests assert frame equality with the JVM path):
    ``re.ASCII`` pins ``\\s`` to the JVM regexp class; lower-after-sub
    commutes with the JVM's sub-after-lower; utf-32 decode yields the
    same code points as ``F.ascii(F.substr(...))``; NULL text produces
    the JVM path's all-NULL stats row; int64 stays exact
    (acc < mod·31 + max code point « 2⁶³)."""
    import re as _re

    @F.pandas_udf(
        "struct<n_chunks:long,max_chunk:long,min_chunk:long,n_chars:long>"
    )
    def _cdc(texts: pd.Series) -> pd.DataFrame:
        import numpy as np

        sub = _re.compile(r"\s+", _re.ASCII).sub
        rows = []
        for t in texts:
            if t is None:
                # JVM-path parity: NULL text still yields ONE chunk row —
                # greatest(size(NULL)-7, 1) = 1 window, its NULL hash is
                # filtered, and ends = concat([], array(NULL)) is the
                # 1-element [NULL] array, so n_chunks = 1 with NULL
                # lengths/chars (pinned by the parity test)
                rows.append((1, None, None, None))
                continue
            s = sub(" ", t).lower()
            if len(s) < window:
                s = s.ljust(window, " ")
            codes = np.frombuffer(
                s.encode("utf-32-le"), dtype=np.uint32
            ).astype(np.int64)
            n = codes.size
            n_win = n - (window - 1)
            acc = np.zeros(n_win, dtype=np.int64)
            base = np.arange(n_win)
            for k in range(window):
                acc = (acc * 31 + codes[base + k]) % mod
            # cut positions are window END indices (1-based), interior only
            ends_at = base + window  # 1-based end index of each window
            cuts = ends_at[(acc % (mask + 1) == 0) & (ends_at < n)]
            ends = np.concatenate([cuts, np.array([n], dtype=np.int64)])
            lens = np.diff(np.concatenate([[0], ends]))
            rows.append(
                (int(ends.size), int(lens.max()), int(lens.min()), int(n))
            )
        return pd.DataFrame(
            rows, columns=["n_chunks", "max_chunk", "min_chunk", "n_chars"]
        )

    return df.select(
        id_col, _cdc(F.col(text_col)).alias("_c")
    ).select(
        id_col,
        F.col("_c.n_chunks").alias("n_chunks"),
        F.col("_c.max_chunk").alias("max_chunk"),
        F.col("_c.min_chunk").alias("min_chunk"),
        F.col("_c.n_chars").alias("n_chars"),
    )


def doc_fingerprint(text_col: Column | str) -> Column:
    """Deterministic content fingerprint: md5 of the normalized token stream
    (lowercased, whitespace-collapsed). Engine-portable (md5 is standard)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.md5(F.array_join(F.transform(tokens(c), F.lower), " "))


def text_profile_vectorized(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Arrow-batched form of :func:`text_profile` — identical semantics
    (tests assert frame equality with the JVM path on the test corpus),
    one Python pass per document instead of a six-HOF JVM expression.

    Exists for the same reason as :func:`rolling_fingerprint_vectorized`,
    plus one more: the fused JVM profile expression takes 12-48 s of
    Janino codegen compile on first execution (each sub-expression alone
    compiles in <1 s; combined they blow past the generated-method sweet
    spot), which a run-each-query-once benchmark pays in full. Semantics
    parity notes: tokenization filters boundary empties like ``tokens()``
    (no trim needed — any-whitespace boundaries are handled), ``re.ASCII``
    makes ``\\s`` the Java character class, Python ``len`` ≡ ``F.length``
    (code points), md5 over UTF-8 bytes both sides."""
    import hashlib
    import re as _re

    stop = set(STOPWORDS)

    @F.pandas_udf(
        "struct<n_tokens:int,n_distinct_tokens:int,n_chars:int,"
        "stopword_ratio:double,quality:double,fingerprint:string>"
    )
    def _prof(texts: pd.Series) -> pd.DataFrame:
        rows = []
        split = _re.compile(r"\s+", _re.ASCII).split
        for t in texts:
            if t is None:
                rows.append((None, None, None, None, None, None))
                continue
            # tokens() parity: boundary empties filtered, so
            # empty/whitespace-only docs have ZERO tokens and NULL ratios
            toks = [tok for tok in split(t) if tok != ""]
            n_tok = len(toks)
            n_distinct = len(set(toks))
            n_chars = len(t)
            lowered = [tok.lower() for tok in toks]
            n_stop = sum(1 for tok in lowered if tok in stop)
            ratio = n_stop / n_tok if n_tok else None
            diversity = n_distinct / n_tok if n_tok else None
            length_ok = 1.0 if 20 <= n_chars <= 100000 else 0.0
            if n_tok == 0:
                quality = 0.0
                fp = None  # nothing to fingerprint (oracle: md5(NULL))
            else:
                quality = (
                    length_ok + (1.0 if diversity > 0.1 else 0.0) + diversity
                ) / 3.0
                fp = hashlib.md5(" ".join(lowered).encode("utf-8")).hexdigest()
            rows.append((n_tok, n_distinct, n_chars, ratio, quality, fp))
        return pd.DataFrame(
            rows,
            columns=[
                "n_tokens",
                "n_distinct_tokens",
                "n_chars",
                "stopword_ratio",
                "quality",
                "fingerprint",
            ],
        )

    return df.select(F.col(id_col), _prof(F.col(text_col)).alias("_p")).select(
        id_col, "_p.*"
    )


def text_profile(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document text statistics table.

    Tokenizes ONCE into a staging column and derives every statistic from
    the shared array (the fused form re-ran the regex split ~6× per row —
    once per statistic — and its expression tree was large enough that
    codegen compile dominated cold runs). Two projections are safe:
    CollapseProject will not inline a non-cheap producer expression that
    is consumed more than once, the same guarantee
    :func:`with_rolling_fingerprint` relies on."""
    staged = df.select(
        F.col(id_col),
        F.length(text_col).alias("n_chars"),
        (F.trim(F.col(text_col)) == "").alias("_tp_empty"),
        tokens(text_col).alias("_tp_toks"),
    )
    toks = F.col("_tp_toks")
    n_tok = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS)))
    # n_tok == 0 is REAL for empty/whitespace-only docs now that tokens()
    # filters boundary empties — guard every ratio (ANSI throws on 0/0;
    # the vectorized twin emits NULL there via pandas NaN → Arrow)
    diversity = F.when(n_tok == 0, F.lit(None).cast("double")).otherwise(
        n_distinct.cast("double") / n_tok.cast("double")
    )
    length_ok = (F.col("n_chars") >= 20) & (F.col("n_chars") <= 100000)
    quality = F.when(F.col("_tp_empty") | (n_tok == 0), F.lit(0.0)).otherwise(
        (length_ok.cast("double") + (diversity > 0.1).cast("double") + diversity)
        / F.lit(3.0)
    )
    return staged.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        F.col("n_chars"),
        F.when(n_tok == 0, F.lit(None).cast("double"))
        .otherwise(n_stop.cast("double") / n_tok.cast("double"))
        .alias("stopword_ratio"),
        quality.alias("quality"),
        # zero-token docs fingerprint NULL (nothing to fingerprint), the
        # same value the oracle's ARRAY_TO_STRING([]) -> NULL path yields
        F.when(
            n_tok > 0, F.md5(F.array_join(F.transform(toks, F.lower), " "))
        ).alias("fingerprint"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap_tokens: int = 8,
) -> DataFrame:
    """Split documents into fixed-size token chunks with overlap — the
    context-window packing step of an LLM training pipeline (one training
    example per chunk, consecutive chunks sharing ``overlap_tokens`` so no
    span is lost at a boundary).

    One row in → ceil(max(n - overlap, 1) / stride) rows out, columns
    (id, chunk_idx, n_tokens, chunk_text). Pure JVM expressions: tokenize
    once, generate chunk starts with ``sequence``, slice + rejoin per
    chunk — no Python, no shuffle; the fan-out happens inside the scan
    stage, so it scales like any generator. Chunks shorter than
    ``overlap_tokens`` past the last full chunk are not re-emitted (every
    token is in at least one chunk; the final chunk may be short).
    """
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap_tokens < chunk_tokens, got "
            f"{overlap_tokens} / {chunk_tokens}"
        )
    stride = chunk_tokens - overlap_tokens
    toks = tokens(text_col)
    n = F.size(toks)
    # chunk starts: 0, stride, 2·stride, … while start + overlap < n —
    # i.e. the last chunk begins at the last stride boundary that still
    # contributes ≥1 new token beyond the previous chunk's coverage.
    starts = F.sequence(
        F.lit(0),
        F.greatest(
            F.lit(0),
            F.floor((n - F.lit(overlap_tokens + 1)) / F.lit(stride)).cast("int")
            * F.lit(stride),
        ),
        F.lit(stride),
    )
    # the caller's id column name is PRESERVED (renaming to a hardcoded
    # 'doc_id' broke joins back to the source and the documented
    # pack_sequences(chunks, id_col=...) pairing)
    return (
        df.select(
            F.col(id_col).alias(id_col),
            toks.alias("_toks"),
            F.explode(starts).alias("_start"),
        )
        .select(
            id_col,
            (F.col("_start") / F.lit(stride)).cast("int").alias("chunk_idx"),
            F.slice(
                F.col("_toks"), F.col("_start") + 1, F.lit(chunk_tokens)
            ).alias("_chunk"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.size("_chunk").alias("n_tokens"),
            F.array_join("_chunk", " ").alias("chunk_text"),
        )
    )


# --------------------------------------------------------------------- #
# Corpus filtering: Gopher-style quality rules, repeated-ngram
# boilerplate, PII scrubbing


def repeated_ngram_fraction(
    text_col: Column | str, n: int = 3, toks: Column | None = None
) -> Column:
    """Fraction of a document's n-grams that are repeats of an earlier
    n-gram (0.0 = all unique): the Gopher-style repetition gate that
    catches looping/boilerplate generation. Pure JVM expressions — the
    n-gram list is built with sequence+slice, so the whole rule runs
    inside codegen with no Python and no shuffle. Documents with fewer
    than n tokens score 0.0. Pass ``toks`` to reuse an already-built
    token array instead of re-running the regex split on the raw text
    (the hot-path composition in :func:`gopher_quality_flags`).

    Callers should pass ``toks`` as a reference to a STAGED column, not
    an inline tokens() expression: the slice lambda re-evaluates its
    argument per n-gram position, so an inline tokenize is O(len²) per
    document (the bigram_lm hazard class)."""
    if toks is None:
        toks = tokens(text_col)
    n_toks = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n_toks - F.lit(n - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    return F.when(n_toks < F.lit(n), F.lit(0.0)).otherwise(
        (total - distinct).cast("double") / total.cast("double")
    )


def gopher_quality_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    max_repeated_trigram_fraction: float = 0.5,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Gopher-style document quality rules as one row of boolean flags per
    document — the triage step of a corpus pipeline, kept as FLAGS (not a
    pre-applied filter) so downstream stages can weigh rules differently
    or audit why a document was dropped.

    Every rule is a closed-form expression over the token array; the
    whole report is a single projection (tokenize once, no shuffle, no
    Python), so it runs at scan speed at any scale."""
    # NULL text gates like empty text (see the vectorized twin): no
    # content -> zero tokens -> keep=False, never NULL flags.
    # The token array is staged as a COLUMN: inlined into the repeated-
    # trigram slice lambda it would re-tokenize per n-gram position —
    # O(len²) per document (the bigram_lm hazard class). CollapseProject
    # keeps the two projections separate because the array is referenced
    # many times and the regex split is not cheap.
    staged = df.select(
        F.col(id_col),
        tokens(
            F.coalesce(
                F.col(text_col) if isinstance(text_col, str) else text_col,
                F.lit(""),
            )
        ).alias("_toks"),
    )
    toks = F.col("_toks")
    n_toks = F.size(toks)
    char_sum = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    mean_len = F.when(n_toks == 0, F.lit(0.0)).otherwise(
        char_sum.cast("double") / n_toks.cast("double")
    )
    stop_hits = F.size(
        F.filter(toks, lambda t: F.lower(t).isin(list(STOPWORDS)))
    )
    rep3 = repeated_ngram_fraction(text_col, n=3, toks=toks)
    flags = {
        "ok_token_count": (n_toks >= min_tokens) & (n_toks <= max_tokens),
        "ok_mean_word_len": (mean_len >= min_mean_word_len)
        & (mean_len <= max_mean_word_len),
        "ok_repetition": rep3 <= max_repeated_trigram_fraction,
        "ok_stopwords": stop_hits >= min_stopword_hits,
    }
    out = staged.select(
        F.col(id_col),  # caller's name preserved: flags join back by it
        n_toks.alias("n_tokens"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(rep3, 6).alias("repeated_trigram_frac"),
        *[c.alias(name) for name, c in flags.items()],
    )
    keep = None
    for name in flags:
        keep = F.col(name) if keep is None else keep & F.col(name)
    return out.withColumn("keep", keep)


# PII patterns restricted to the regex subset Java and RE2 interpret
# identically (no backreferences, no lookaround).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ]?[0-9]{0,4}", "<PHONE>"),
)


def scrub_pii(text_col: Column | str) -> Column:
    """Replace email / IPv4 / phone literals with typed placeholder tokens
    — the redaction step before text leaves a controlled zone. A chain of
    ``regexp_replace`` calls (order matters twice: emails first so their
    digit runs can't half-match the phone pattern, and IPv4 BEFORE phone —
    the phone pattern accepts '.' as a separator, so a dotted quad like
    192.168.100.200 would otherwise redact as <PHONE> and downstream
    audits keyed on placeholder type would miscount categories), all
    JVM-side."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    for _, pattern, replacement in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, replacement)
    return c


def corpus_ngram_counts(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    min_count: int = 2,
) -> DataFrame:
    """Corpus-level boilerplate mining: count every n-gram across all
    documents and keep those appearing ``min_count``+ times — the shared
    headers/footers/templates an LLM corpus wants stripped before
    training. One explode + one hash-agg shuffle with map-side partial
    aggregation; the min_count gate filters post-agg, so the shuffle
    carries (ngram, partial-count) pairs, not documents.

    The token array is projected into a COLUMN before the slice lambda:
    an inline tokens() expression inside a ``transform`` lambda is
    re-evaluated per element (per n-gram position), turning the
    tokenize into O(len²) per document — measured 4.4× slower at sf0.1
    (same hazard class as bigram_lm_scores)."""
    staged = df.select(tokens(text_col).alias("_toks")).filter(
        F.size("_toks") >= n
    )
    grams = F.transform(
        F.sequence(
            F.lit(1), F.greatest(F.size("_toks") - F.lit(n - 1), F.lit(1))
        ),
        lambda i: F.array_join(F.slice("_toks", i, n), " "),
    )
    return (
        staged.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= min_count)
    )


def top_ngram_char_fraction(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """Gopher/Dolma "top n-gram character fraction": per document, the
    share of (whitespace-normalized) characters covered by occurrences
    of the document's single MOST FREQUENT n-gram — high values mark
    template/loop boilerplate that the per-doc repeated-n-gram gate
    (:func:`repeated_ngram_fraction`) underweights when one phrase
    dominates. Coverage is the Gopher approximation
    ``count · len(gram) / len(normalized_doc)``.

    Distributed shape (NOT the O(tokens²) per-row nested loop): explode
    n-grams → hash-agg on (doc, gram) with map-side combine → per-doc
    argmax. The argmax is a row_number window over the (much smaller)
    per-doc distinct-gram table, ordered (count DESC, gram ASC) so ties
    break deterministically to the lexicographically smallest gram.
    Two shuffles — (id, gram) then id — both keyed on the doc id first,
    so a corpus bucketed by doc id runs the second exchange-free.

    Docs with fewer than ``n`` tokens have no n-gram and are omitted.
    Returns (id, top_gram, gram_count, top_gram_char_frac_q)."""
    from pyspark.sql.window import Window

    toks = F.filter(tokens(text_col), lambda t: t != "")
    base = df.select(
        F.col(id_col).alias("id"),
        toks.alias("_toks"),
    ).filter(F.size("_toks") >= n)
    grams = base.select(
        "id",
        F.length(F.array_join("_toks", " ")).alias("norm_chars"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("_toks") - F.lit(n - 1)),
                lambda i: F.array_join(F.slice("_toks", i, n), " "),
            )
        ).alias("gram"),
    )
    counts = grams.groupBy("id", "norm_chars", "gram").agg(
        F.count(F.lit(1)).alias("gram_count")
    )
    w = Window.partitionBy("id").orderBy(
        F.col("gram_count").desc(), F.col("gram").asc()
    )
    from etl_manager_spark.operators.ranking import quantize

    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "id",
            F.col("gram").alias("top_gram"),
            "gram_count",
            quantize(
                F.col("gram_count")
                * F.length("gram").cast("double")
                / F.col("norm_chars").cast("double")
            ).alias("top_gram_char_frac_q"),
        )
    )


def gopher_quality_flags_vectorized(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    max_repeated_trigram_fraction: float = 0.5,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Arrow-batched form of :func:`gopher_quality_flags` — identical
    output (tests assert frame equality on the test corpus), one Python
    pass per document instead of the per-element JVM HOF chain: building
    the trigram array with interpreted ``transform(sequence → array_join(
    slice))`` costs ~100 HOF evaluations per document, ~35 s at sf0.1
    where this path is ~1 s. Same trade as
    :func:`text_profile_vectorized`.

    Parity notes: rounding mirrors Spark's ``F.round`` on doubles
    (``BigDecimal.valueOf(d).setScale(6, HALF_UP)``) via
    ``Decimal(repr(x))`` — Java ``Double.toString`` and Python ``repr``
    produce the same shortest round-trip digits."""
    import re as _re
    from decimal import ROUND_HALF_UP, Decimal

    stop = set(STOPWORDS)
    q6 = Decimal("0.000001")

    def _round6(x: float) -> float:
        return float(Decimal(repr(x)).quantize(q6, rounding=ROUND_HALF_UP))

    @F.pandas_udf(
        "struct<n_tokens:int,mean_word_len:double,repeated_trigram_frac:double,"
        "ok_token_count:boolean,ok_mean_word_len:boolean,ok_repetition:boolean,"
        "ok_stopwords:boolean,keep:boolean>"
    )
    def _flags(texts: pd.Series) -> pd.DataFrame:
        rows = []
        split = _re.compile(r"\s+", _re.ASCII).split
        for t in texts:
            if t is None:
                # NULL text gates like empty text: a document with no
                # content deterministically fails the token-count rule
                # (keep=False), never a NULL verdict a filter can't act on
                t = ""
            toks = [tok for tok in split(t) if tok != ""]
            n = len(toks)
            mean_len = 0.0 if n == 0 else sum(len(tok) for tok in toks) / n
            if n < 3:
                rep3 = 0.0
            else:
                grams = [" ".join(toks[i : i + 3]) for i in range(n - 2)]
                rep3 = (len(grams) - len(set(grams))) / len(grams)
            stop_hits = sum(1 for tok in toks if tok.lower() in stop)
            ok_count = min_tokens <= n <= max_tokens
            ok_len = min_mean_word_len <= mean_len <= max_mean_word_len
            ok_rep = rep3 <= max_repeated_trigram_fraction
            ok_stop = stop_hits >= min_stopword_hits
            rows.append(
                (
                    n,
                    _round6(mean_len),
                    _round6(rep3),
                    ok_count,
                    ok_len,
                    ok_rep,
                    ok_stop,
                    ok_count and ok_len and ok_rep and ok_stop,
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                "n_tokens", "mean_word_len", "repeated_trigram_frac",
                "ok_token_count", "ok_mean_word_len", "ok_repetition",
                "ok_stopwords", "keep",
            ],
        )

    return df.select(
        F.col(id_col), _flags(F.col(text_col)).alias("_g")
    ).select(id_col, "_g.*")


def cdc_chunk_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 8,
    mod: int = 1_000_000_007,
    mask: int = 63,
) -> DataFrame:
    """Content-defined chunking (FastCDC-style): cut wherever the
    Karp-Rabin hash of the trailing ``window`` chars ≡ 0 (mod mask+1) —
    the dedup-storage primitive whose boundaries survive insertions
    (fixed-size chunking shifts every boundary after an edit; CDC
    boundaries are content-anchored). Shares the fingerprint fold of
    :func:`with_rolling_fingerprint`, so the whole thing is scan-stage
    JVM expressions: char codes staged once, per-position window hashes,
    boundary filter, segment lengths — all integer arithmetic, no floats
    anywhere. Emits per-doc chunk count and min/max chunk length.

    A production variant adds min/max chunk-size clamps (FastCDC's
    normalized chunking); the boundary RULE is the portable part and is
    what the oracle replays."""
    s = _normalize_for_fp(F.col(text_col), window)
    staged = df.select(id_col, char_codes(s).alias("_codes"))
    codes = F.col("_codes")
    n_windows = F.greatest(F.size(codes) - (window - 1), F.lit(1))
    offsets = F.sequence(F.lit(0), F.lit(window - 1))

    def whash(i):
        return F.aggregate(
            offsets,
            F.lit(0).cast("long"),
            lambda acc, k: (acc * 31 + F.element_at(codes, i + k)) % mod,
        )

    L = F.size(codes)
    cuts = F.filter(
        F.transform(
            F.sequence(F.lit(1), n_windows),
            lambda i: F.when(
                whash(i) % F.lit(mask + 1) == 0, i + F.lit(window - 1)
            ).otherwise(F.lit(0)),
        ),
        lambda x: (x > 0) & (x < L),
    )
    with_ends = staged.select(
        id_col,
        L.alias("n_chars"),
        F.concat(cuts, F.array(L)).alias("ends"),
    )
    lens = F.transform(
        F.sequence(F.lit(1), F.size("ends")),
        lambda k: F.element_at("ends", k)
        - F.when(k == 1, F.lit(0)).otherwise(F.element_at("ends", k - 1)),
    )
    return with_ends.select(
        id_col,
        F.size("ends").cast("long").alias("n_chunks"),
        F.array_max(lens).cast("long").alias("max_chunk"),
        F.array_min(lens).cast("long").alias("min_chunk"),
        F.col("n_chars").cast("long").alias("n_chars"),
    )
