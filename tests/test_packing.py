"""Sequence packing + mixture sampling (operators/packing.py)."""

import pytest
from pyspark.sql import functions as F

from etl_manager_spark.operators.packing import (
    mixture_sample_by_token_budget,
    pack_sequences,
)
from etl_manager_spark.workloads.tables import load_table


def _packed(spark, rows, seq_tokens, n_shards=1):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(df, seq_tokens=seq_tokens, n_shards=n_shards)
    return {r.doc_id: (r.seq_id, r.n_tokens) for r in out.collect()}


def test_pack_greedy_fold_single_shard(spark):
    # tokens: 3, 3, 3 with budget 6 -> bins [d1 d2][d3]
    got = _packed(
        spark,
        [(1, "a b c"), (2, "d e f"), (3, "g h i")],
        seq_tokens=6,
    )
    assert got == {1: (0, 3), 2: (0, 3), 3: (1, 3)}


def test_pack_oversized_doc_gets_own_bin(spark):
    # 2, 5(oversized), 2 with budget 4: [d1][d2][d3]
    got = _packed(
        spark,
        [(1, "a b"), (2, "c d e f g"), (3, "h i")],
        seq_tokens=4,
    )
    assert got == {1: (0, 2), 2: (1, 5), 3: (2, 2)}


def test_pack_bins_never_overflow_except_oversized(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    packed = pack_sequences(docs, seq_tokens=128, n_shards=16)
    bins = (
        packed.groupBy("shard", "seq_id")
        .agg(F.sum("n_tokens").alias("total"), F.count(F.lit(1)).alias("n_docs"))
        .collect()
    )
    for b in bins:
        # a bin over budget can only be a single oversized document
        assert b.total <= 128 or b.n_docs == 1, b


def test_pack_deterministic_under_repartition(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = sorted(map(tuple, pack_sequences(docs, seq_tokens=128).collect()))
    b = sorted(
        map(tuple, pack_sequences(docs.repartition(13), seq_tokens=128).collect())
    )
    assert a == b


def test_pack_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="seq_tokens"):
        pack_sequences(df, seq_tokens=0)
    with pytest.raises(ValueError, match="n_shards"):
        pack_sequences(df, n_shards=0)
    with pytest.raises(ValueError, match="n_shards"):
        pack_sequences(df, n_shards=16**8 + 1)


def test_mixture_budget_is_hard_cap(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = mixture_sample_by_token_budget(
        docs, budgets={"src0": 400}, default_budget=150
    )
    per_source = {
        r.source: r.total
        for r in out.groupBy("source").agg(F.sum("n_tokens").alias("total")).collect()
    }
    for src, total in per_source.items():
        assert total <= (400 if src == "src0" else 150), (src, total)


def test_mixture_keeps_highest_priority_prefix(spark, sf_dir):
    """The kept set must be a prefix of the md5-priority order — no doc
    may be skipped while a lower-priority doc of the same source is kept."""
    docs = load_table(spark, sf_dir, "documents")
    kept = mixture_sample_by_token_budget(
        docs, budgets={}, default_budget=300
    ).select("doc_id", "source")
    ranked = docs.select(
        "doc_id",
        "source",
        F.md5(F.col("doc_id").cast("string")).alias("pri"),
    )
    joined = ranked.join(kept.withColumn("kept", F.lit(1)), ["doc_id", "source"], "left")
    rows = sorted(
        joined.collect(), key=lambda r: (r.source, r.pri, r.doc_id)
    )
    seen_drop: set[str] = set()
    for r in rows:
        if r.kept is None:
            seen_drop.add(r.source)
        else:
            assert r.source not in seen_drop, f"gap in priority prefix: {r}"


def test_cluster_representatives_picks_best_then_smallest_id(spark):
    from etl_manager_spark.operators.dedup import cluster_representatives

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)], "id long, cluster_id long"
    )
    scores = spark.createDataFrame(
        # cluster 1: id 2 wins on score; cluster 10: tie -> smallest id 10
        [(1, 5), (2, 9), (3, 9), (10, 4), (11, 4)], "id long, score long"
    )
    out = {r.id: (r.rep_id, r.keep) for r in cluster_representatives(clusters, scores).collect()}
    assert out == {
        1: (2, False),
        2: (2, True),
        3: (2, False),
        10: (10, True),
        11: (10, False),
    }


def test_ewma_hand_case_and_tiebreak(spark):
    from etl_manager_spark.operators.timeseries import ewma_per_key

    df = spark.createDataFrame(
        [
            # user 1: 2 -> 4 -> 8 gives e = 2, 3, 5.5
            (1, "2024-01-01 00:00:00", 1, 2.0),
            (1, "2024-01-01 00:01:00", 2, 4.0),
            (1, "2024-01-01 00:02:00", 3, 8.0),
            # user 2: simultaneous events order by event_id: 10 then 20
            (2, "2024-01-01 00:00:00", 5, 20.0),
            (2, "2024-01-01 00:00:00", 4, 10.0),
        ],
        "user_id long, ts string, event_id long, value double",
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) ts", "event_id", "value")
    got = {r.event_id: r.ewma_q for r in ewma_per_key(df).collect()}
    assert got == {
        1: 2_000_000_000,
        2: 3_000_000_000,
        3: 5_500_000_000,
        4: 10_000_000_000,
        5: 15_000_000_000,
    }


def test_ewma_rejects_bad_alpha(spark):
    from etl_manager_spark.operators.timeseries import ewma_per_key

    df = spark.createDataFrame([(1, 1, 1.0)], "user_id long, event_id long, value double")
    with pytest.raises(ValueError, match="alpha"):
        ewma_per_key(df.withColumn("ts", F.current_timestamp()), alpha=0.0)


def test_table_diff_classifies_all_transitions(spark):
    from etl_manager_spark.operators.upsert import table_diff

    before = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, None), (4, 40.0, "d")],
        "k long, price double, tag string",
    )
    after = spark.createDataFrame(
        [(2, 20.0, "b"), (3, 30.0, None), (4, 40.0, None), (5, 50.0, "e")],
        "k long, price double, tag string",
    )
    got = {r.k: r.diff_status for r in table_diff(before, after, ["k"]).collect()}
    assert got == {
        1: "removed",
        2: "unchanged",
        3: "unchanged",  # NULL == NULL under null-safe equality
        4: "changed",    # value -> NULL IS a change
        5: "added",
    }


def test_table_diff_requires_keys(spark):
    from etl_manager_spark.operators.upsert import table_diff

    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="key"):
        table_diff(df, df, [])


def test_pack_matches_python_reference_on_random_corpora(spark):
    """Randomized (seeded) cross-check: the distributed fold must equal a
    direct Python replay of the greedy recurrence for every shard."""
    import random

    from etl_manager_spark.operators.packing import pack_sequences

    rng = random.Random(20240814)
    rows = [
        (i, " ".join("w" for _ in range(rng.randint(1, 40))))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.shard, r.n_tokens, r.seq_id)
        for r in pack_sequences(df, seq_tokens=64, n_shards=16).collect()
    }
    # python reference: same shard digit, same id order, same greedy rule
    import hashlib

    by_shard: dict[int, list[tuple[int, int]]] = {}
    for i, text in rows:
        shard = int(hashlib.md5(str(i).encode()).hexdigest()[0], 16) % 16
        by_shard.setdefault(shard, []).append((i, len(text.split())))
    want = {}
    for shard, docs in by_shard.items():
        fill, sid = None, 0
        for i, n in sorted(docs):
            if fill is None:
                fill = n
            elif fill + n <= 64:
                fill += n
            else:
                sid += 1
                fill = n
            want[i] = (shard, n, sid)
    assert got == want


def test_pack_multi_digit_shards(spark):
    """n_shards beyond 16 uses a wider md5 prefix: shards stay in range
    and the fold semantics are unchanged within each shard."""
    from etl_manager_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(i, "a b c") for i in range(200)], "doc_id long, text string"
    )
    out = pack_sequences(df, seq_tokens=6, n_shards=50).collect()
    shards = {r.shard for r in out}
    assert all(0 <= s < 50 for s in shards)
    assert len(shards) > 16, "wider prefix must actually spread past 16 buckets"


def test_ewma_ignores_null_values(spark):
    from pyspark.sql import functions as F

    from etl_manager_spark.operators.timeseries import ewma_per_key

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 1, 2.0),
            (1, "2024-01-01 00:01:00", 2, None),  # dropped: no state update
            (1, "2024-01-01 00:02:00", 3, 4.0),
        ],
        "user_id long, ts string, event_id long, value double",
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"), "event_id", "value")
    got = {r.event_id: r.ewma_q for r in ewma_per_key(df).collect()}
    assert got == {1: 2_000_000_000, 3: 3_000_000_000}


def test_cluster_representatives_keeps_unscored_members(spark):
    """LEFT-join contract: a clustered doc missing from scores must still
    appear in the decision table, ranked below scored members."""
    from etl_manager_spark.operators.dedup import cluster_representatives

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (7, 7), (8, 7)], "id long, cluster_id long"
    )
    scores = spark.createDataFrame([(2, 5)], "id long, score long")
    out = {r.id: (r.rep_id, r.keep) for r in cluster_representatives(clusters, scores).collect()}
    assert out == {
        1: (2, False),  # unscored, ranked below the scored member
        2: (2, True),
        7: (7, True),   # wholly unscored cluster: smallest id wins
        8: (7, False),
    }


def test_simhash_pairs_param_validation(spark):
    from etl_manager_spark.operators.dedup import simhash_near_dup_pairs

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="divide"):
        simhash_near_dup_pairs(df, bits=16, bands=3)
    with pytest.raises(ValueError, match="complete band join"):
        simhash_near_dup_pairs(df, bits=16, bands=4, max_hamming=4)


def test_simhash_pairs_find_near_identical_docs(spark):
    """Two docs sharing almost all tokens land within the hamming budget;
    an unrelated doc does not pair with them."""
    from etl_manager_spark.operators.dedup import simhash_near_dup_pairs

    base = " ".join(f"tok{i}" for i in range(30))
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base + " extra"),
            (3, " ".join(f"other{i}" for i in range(30))),
        ],
        "doc_id long, text string",
    )
    pairs = {(r.id_a, r.id_b): r.hamming for r in simhash_near_dup_pairs(df).collect()}
    assert (1, 2) in pairs
    assert pairs[(1, 2)] <= 3
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_pack_sequences_deterministic_over_chunks(spark):
    """The documented chunk_documents -> pack_sequences composition
    duplicates doc_id (one row per chunk); order_cols=[doc_id, chunk_idx]
    makes the layout a total order, so it reproduces under any input
    partitioning and the seq_id attributes to a specific chunk."""
    from etl_manager_spark.operators.packing import pack_sequences
    from etl_manager_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(300))), (2, "short doc here")],
        "doc_id long, text string",
    )
    chunks = chunk_documents(docs, chunk_tokens=64, overlap_tokens=0)
    layouts = []
    for parts in (1, 3, 7):
        packed = pack_sequences(
            chunks.repartition(parts),
            text_col="chunk_text",
            seq_tokens=128,
            order_cols=["doc_id", "chunk_idx"],
        )
        layouts.append(
            sorted(
                (r.doc_id, r.chunk_idx, r.shard, r.seq_id)
                for r in packed.collect()
            )
        )
    assert layouts[0] == layouts[1] == layouts[2]
    assert {c for c in packed.columns} == {"shard", "doc_id", "chunk_idx", "n_tokens", "seq_id"}
    # order_cols must include the shard-hashed id
    import pytest as _pytest

    with _pytest.raises(ValueError, match="order_cols must include"):
        pack_sequences(chunks, text_col="chunk_text", order_cols=["chunk_idx"])
