"""Unit tests for operators/ranking.py and operators/behavior.py over
hand-built inputs with independently computed expectations."""

import math

from pyspark.sql import functions as F

from etl_manager_spark.operators import behavior as B
from etl_manager_spark.operators import ranking as R


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tfidf_matches_hand_computation(spark):
    df = _docs(
        spark,
        [
            (1, "a a b"),
            (2, "a c"),
            (3, "c c c d"),
        ],
    )
    got = {
        (r.id, r.term): (r.tf, r.df, r.tfidf_q)
        for r in R.tfidf_top_terms(df, k=10).collect()
    }
    # term 'a': df=2; doc1 tf=2 → 2*ln(3/2)
    q = math.floor(2 * math.log(3 / 2) * 1e9 + 0.5)
    assert got[(1, "a")] == (2, 2, q)
    # term 'd': df=1; doc3 tf=1 → ln(3)
    assert got[(3, "d")] == (1, 1, math.floor(math.log(3.0) * 1e9 + 0.5))


def test_tfidf_rank_deterministic_tie_break(spark):
    # doc with two terms of identical tf/df → rank by term asc
    df = _docs(spark, [(1, "x y"), (2, "x y")])
    rows = R.tfidf_top_terms(df, k=2).filter(F.col("id") == 1).collect()
    by_rank = {r.rank: r.term for r in rows}
    assert by_rank == {1: "x", 2: "y"}


def test_bm25_prefers_matching_docs(spark):
    df = _docs(
        spark,
        [
            (1, "spark joins data fast"),
            (2, "spark spark spark spark"),
            (3, "nothing relevant here at all"),
        ],
    )
    scores = {r.id: r.score_q for r in R.bm25_scores(df, ["spark"]).collect()}
    assert 3 not in scores  # no query term → no row
    assert scores[2] > scores[1] > 0  # higher tf, same dl-ish → higher score


def test_inverted_index_caps_postings_but_counts_full_df(spark):
    df = _docs(spark, [(i, "tok") for i in range(30)])
    row = R.inverted_index(df, max_postings=20).collect()[0]
    assert row.term == "tok"
    assert row.df == 30
    import json

    assert json.loads(row.postings) == list(range(20))


def test_decontaminate_flags_exact_overlap_only(spark):
    base = "w1 w2 w3 w4 w5 w6 w7 w8"
    train = _docs(
        spark,
        [
            (1, base + " extra tail"),  # contains the eval 8-gram
            (2, "different words entirely here none shared at all"),
        ],
    )
    ev = _docs(spark, [(100, base)])
    got = {r.id: r.n_shared for r in R.ngram_decontaminate(train, ev, n=8).collect()}
    assert got == {1: 1}


def _events(spark, rows):
    import datetime

    parsed = [
        (u, t, datetime.datetime.fromisoformat(ts)) for u, t, ts in rows
    ]
    return spark.createDataFrame(
        parsed, "user_id long, event_type string, ts timestamp_ntz"
    )


def test_funnel_requires_strict_order(spark):
    ev = _events(
        spark,
        [
            # u1 completes in order
            (1, "view", "2024-01-01 10:00:00"),
            (1, "click", "2024-01-01 11:00:00"),
            (1, "purchase", "2024-01-01 12:00:00"),
            # u2 purchases BEFORE clicking → stops at click
            (2, "view", "2024-01-02 10:00:00"),
            (2, "purchase", "2024-01-02 10:30:00"),
            (2, "click", "2024-01-02 11:00:00"),
            # u3 never views → not even step 1
            (3, "click", "2024-01-03 10:00:00"),
        ],
    )
    got = {
        r.step_name: r.n_users
        for r in B.funnel(ev, ["view", "click", "purchase"]).collect()
    }
    assert got == {"view": 2, "click": 2, "purchase": 1}


def test_funnel_simultaneous_event_does_not_advance(spark):
    ev = _events(
        spark,
        [
            (1, "view", "2024-01-01 10:00:00"),
            (1, "click", "2024-01-01 10:00:00"),  # same instant → no advance
        ],
    )
    got = {r.step_name: r.n_users for r in B.funnel(ev, ["view", "click"]).collect()}
    assert got == {"view": 1, "click": 0}


def test_cohort_retention_offsets(spark):
    ev = _events(
        spark,
        [
            (1, "view", "2024-01-01 09:00:00"),
            (1, "view", "2024-01-03 09:00:00"),  # offset 2
            (1, "view", "2024-01-03 18:00:00"),  # same day, deduped
            (2, "view", "2024-01-02 09:00:00"),
        ],
    )
    got = {
        (str(r.cohort_day), r.day_offset): r.n_users
        for r in B.cohort_retention(ev).collect()
    }
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-02", 0): 1,
    }


def test_bigram_lm_hand_computed(spark):
    # corpus: two docs, vocab {a,b,c} (V=3), add-1 smoothing
    df = _docs(spark, [(1, "a b a"), (2, "a b c")])
    # unigram counts: a=3, b=2, c=1; bigram counts: (a,b)=2, (b,a)=1, (b,c)=1
    got = {r.id: (r.n_bigrams, r.sum_logp_q) for r in R.bigram_lm_scores(df).collect()}

    def q(x):
        return math.floor(x * 1e9 + 0.5)

    # doc1 bigrams: (a,b), (b,a) → ln(3/6) + ln(2/5)
    assert got[1] == (2, q(math.log((2 + 1) / (3 + 3))) + q(math.log((1 + 1) / (2 + 3))))
    # doc2 bigrams: (a,b), (b,c) → ln(3/6) + ln(2/5)
    assert got[2] == (2, q(math.log(3 / 6)) + q(math.log(2 / 5)))


def test_bigram_lm_garbled_doc_scores_lower(spark):
    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(10)]
    rows.append((99, "zxq qzx xqz zqx qxz"))  # out-of-distribution
    df = _docs(spark, rows)
    got = {r.id: r.sum_logp_q / r.n_bigrams for r in R.bigram_lm_scores(df).collect()}
    assert got[99] < got[0]


def test_corpus_stats_hand_computed(spark):
    df = _docs(spark, [(1, "a a b"), (2, "b c")])
    row = R.corpus_stats(df).collect()[0]
    # tokens: a×2, b×2, c×1 → total 5, vocab 3, hapax 1 (c)
    assert (row.total_tokens, row.vocab_size, row.hapax_count) == (5, 3, 1)
    assert row.type_token_ratio_q == math.floor(3 / 5 * 1e9 + 0.5)


def test_funnel_property_vs_python_reference(spark):
    """Property test: the distributed funnel equals a direct per-user
    Python scan for random event sequences (random types, ts ties,
    repeated steps)."""
    import datetime

    from hypothesis import given, settings, strategies as st

    steps = ["a", "b", "c"]
    events_strategy = st.lists(
        st.tuples(
            st.integers(0, 3),               # user
            st.sampled_from(["a", "b", "c", "x"]),
            st.integers(0, 12),              # coarse ts → frequent ties
        ),
        min_size=1,
        max_size=25,
    )

    def python_funnel(rows):
        reached = {i + 1: 0 for i in range(len(steps))}
        by_user = {}
        for u, t, ts in rows:
            by_user.setdefault(u, []).append((ts, t))
        for evs in by_user.values():
            # min-after-previous: arrival per step from the sorted scan
            arrived = None
            stage = 0
            for ts, t in sorted(evs, key=lambda e: e[0]):
                if stage < len(steps) and t == steps[stage]:
                    if stage == 0 or ts > arrived:
                        stage += 1
                        arrived = ts
            for s in range(1, stage + 1):
                reached[s] += 1
        return reached

    epoch = datetime.datetime(2024, 1, 1)

    @settings(max_examples=20, deadline=None)
    @given(rows=events_strategy)
    def check(rows):
        df = spark.createDataFrame(
            [
                (u, t, epoch + datetime.timedelta(hours=ts))
                for u, t, ts in rows
            ],
            "user_id long, event_type string, ts timestamp_ntz",
        )
        got = {r.step: r.n_users for r in B.funnel(df, steps).collect()}
        assert got == python_funnel(rows)

    check()


def test_bm25_empty_corpus_returns_empty_not_crash(spark):
    df = _docs(spark, []).filter("doc_id IS NOT NULL")
    out = R.bm25_scores(df, ["anything"])
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["id", "score_q"]


def test_bm25_empty_corpus_keeps_string_id_dtype(spark):
    """The empty path must mirror the non-empty path's id dtype — the API
    accepts any id_col type."""
    df = spark.createDataFrame([], "doc_id string, text string")
    empty = R.bm25_scores(df, ["anything"], id_col="doc_id")
    nonempty = R.bm25_scores(
        spark.createDataFrame([("a", "anything else")], "doc_id string, text string"),
        ["anything"],
        id_col="doc_id",
    )
    assert empty.schema == nonempty.schema
    assert empty.count() == 0
