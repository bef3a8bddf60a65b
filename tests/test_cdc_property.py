"""Property test for cdc_chunk_stats: on ANY random text, the Spark
expression pipeline must equal a pure-Python reference of the
content-defined-chunking rule (Karp-Rabin window hash ≡ 0 mod 64 cuts,
same normalization). Tiny alphabets force hash collisions (boundaries
everywhere); short strings exercise the rpad path."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_manager_spark.operators.text import cdc_chunk_stats

WINDOW, MOD, MASK = 8, 1_000_000_007, 63


def _reference(text: str):
    s = re.sub(r"\s+", " ", text).lower()
    if len(s) < WINDOW:
        s = s.ljust(WINDOW)
    codes = [ord(c) for c in s]
    n = len(codes)
    cuts = []
    for i in range(0, max(n - WINDOW + 1, 1)):
        h = 0
        for k in range(WINDOW):
            h = (h * 31 + codes[i + k]) % MOD
        if h % (MASK + 1) == 0:
            cut = i + WINDOW
            if 0 < cut < n:
                cuts.append(cut)
    ends = cuts + [n]
    lens = [e - s0 for s0, e in zip([0] + ends[:-1], ends)]
    return len(ends), max(lens), min(lens), n


text_strategy = st.text(
    alphabet=st.sampled_from(list("ab \txyz")), min_size=0, max_size=120
)


@settings(max_examples=25, deadline=None)
@given(texts=st.lists(text_strategy, min_size=1, max_size=8))
def test_cdc_chunk_stats_matches_reference(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_chunks"], r["max_chunk"], r["min_chunk"], r["n_chars"])
        for r in cdc_chunk_stats(df).collect()
    }
    exp = {i: _reference(t) for i, t in enumerate(texts)}
    assert got == exp
    # round 10: the Arrow/numpy fast path must agree with BOTH the pure
    # reference and the JVM expression form on the same inputs
    from etl_manager_spark.operators.text import cdc_chunk_stats_vectorized

    got_v = {
        r["doc_id"]: (r["n_chunks"], r["max_chunk"], r["min_chunk"], r["n_chars"])
        for r in cdc_chunk_stats_vectorized(df).collect()
    }
    assert got_v == exp


def test_cdc_vectorized_null_and_unicode_parity(spark):
    """The vectorized kernel must reproduce the JVM expression path on
    the edge axes the property alphabet does not reach: NULL text, empty
    text, exotic whitespace (NBSP must NOT collapse — \\s is the ASCII
    class in both engines), multibyte code points, and exactly-window
    strings."""
    from etl_manager_spark.operators.text import cdc_chunk_stats_vectorized

    rows = [
        (0, None),
        (1, ""),
        (2, " \t \n "),
        (3, "ab cd ef"),     # NBSP is not ASCII whitespace
        (4, "héllo wörld ünïcode — π≈3.14159 🙂 end"),
        (5, "exactly8"),
        (6, "a" * 500),
        (7, "The quick brown fox jumps over the lazy dog. " * 20),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    jvm = sorted([tuple(r) for r in cdc_chunk_stats(df).collect()])
    vec = sorted([tuple(r) for r in cdc_chunk_stats_vectorized(df).collect()])
    assert jvm == vec
