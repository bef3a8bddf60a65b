"""Edge-semantics regressions from the round-7 adversarial review:
zero-norm vectors, singleton MMR shortlists, keep-all/null-id sampling,
string-id BFS — each a silent-divergence class at production data
quality, invisible to the clean driver fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_manager_spark.operators import similarity as S


def test_zero_norm_vector_never_ranks_first(spark):
    """An all-zero embedding must score cosine 0.0 (not NaN, which Spark
    orders above every double → rank 1 for every query) in BOTH the JVM
    expression and the numpy kernels."""
    rows = [
        (0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 0.0]), (3, [0.5, 0.5]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter(F.col("vec_id") == 0)
    got = {
        r["rank"]: (r["neighbor_id"], r["cosine_sim"])
        for r in S.cosine_topk(q, emb, k=3).collect()
    }
    assert got[1][0] == 1            # the genuinely-similar vector
    assert got[3] == (2, 0.0)        # zero vector scores 0.0, ranks last
    # threshold gate: zero vector passes no positive threshold
    pairs = {
        (r["id_a"], r["id_b"])
        for r in S.cosine_near_dup_pairs(
            emb, id_col="vec_id", vec_col="embedding", threshold=0.5
        ).collect()
    }
    assert all(2 not in p for p in pairs)


def test_mmr_singleton_candidate_survives(spark):
    """A query whose shortlist has exactly one candidate must emit that
    candidate at mmr_rank 1 (b_nid-null row), not vanish."""
    rows = [(7, 42, 0.9, None, None)]
    pairs = spark.createDataFrame(
        rows,
        "query_id long, a_nid long, a_simq double, b_nid long, sim_ab double",
    )
    got = S.mmr_select(pairs, k=3, lam=0.7).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["query_id"], r["mmr_rank"], r["neighbor_id"]) == (7, 1, 42)


def test_mmr_missing_pair_raises_with_ids(spark):
    rows = [
        (1, 10, 0.9, 11, 0.5),
        (1, 11, 0.8, 12, 0.4),  # (10,12)/(12,10) missing entirely
        (1, 12, 0.7, 10, 0.3),
    ]
    # remove one orientation AND its reverse for (11,10): only (10,11)
    # exists — reverse lookup must cover it; (11,12) exists only as
    # (11,12) — fine. But (12,11) reverse-resolves. The truly missing
    # rectangle cell is none here, so first assert success:
    pairs = spark.createDataFrame(
        rows,
        "query_id long, a_nid long, a_simq double, b_nid long, sim_ab double",
    )
    assert len(S.mmr_select(pairs, k=3, lam=0.7).collect()) == 3
    # now a genuinely missing pair: candidates 20,21 with no pair rows
    bad = spark.createDataFrame(
        [(2, 20, 0.9, None, None), (2, 21, 0.8, None, None)],
        "query_id long, a_nid long, a_simq double, b_nid long, sim_ab double",
    )
    with pytest.raises(Exception, match="missing the pair sim"):
        S.mmr_select(bad, k=2, lam=0.7).collect()


def test_sampling_fraction_one_keeps_every_row(spark):
    from etl_manager_spark.operators.sampling import (
        _threshold_hex,
        split_column,
        stratified_sample,
    )

    assert _threshold_hex(1.0) == "g"
    n = 2000
    df = spark.range(n).selectExpr("id", "'x' as lang")
    kept = stratified_sample(df, "id", "lang", {"x": 1.0})
    assert kept.count() == n
    train = df.filter(split_column("id", 1.0) == "train")
    assert train.count() == n


def test_sampling_null_ids_deterministic_not_dropped(spark):
    from etl_manager_spark.operators.sampling import (
        split_column,
        stratified_sample,
    )

    rows = [(None, "x")] * 10 + [(1, "x"), (2, "x")]
    df = spark.createDataFrame(rows, "id int, lang string")
    # fraction 1.0 keeps null-id rows too (md5 of the coalesced sentinel)
    assert stratified_sample(df, "id", "lang", {"x": 1.0}).count() == 12
    # the split routes all null-id rows to ONE side (shared draw), and
    # fraction 1.0 routes them to train — never fraction-independent
    assert df.filter(split_column("id", 1.0) == "train").count() == 12


def test_bfs_string_ids(spark):
    from etl_manager_spark.operators.graph import bfs_distances

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "id_a string, id_b string"
    )
    got = {r["id"]: r["dist"] for r in bfs_distances(pairs, "a").collect()}
    assert got == {"a": 0, "b": 1, "c": 2}


def test_assortativity_decimal_moments_match_small_graph(spark):
    """The decimal(38,0) moment rewrite must not move the answer on a
    graph small enough for int64 (the overflow fix is value-neutral)."""
    from etl_manager_spark.operators.graph import degree_assortativity

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 3)], "id_a long, id_b long"
    )
    row = degree_assortativity(pairs).collect()[0]
    assert row["n_edges"] == 4
    # independent numpy check
    import numpy as np

    edges = [(1, 2), (2, 3), (3, 4), (1, 3)]
    sym = edges + [(b, a) for a, b in edges]
    from collections import Counter

    deg = Counter(u for u, _ in sym)
    dx = np.array([deg[u] for u, v in sym], dtype=float)
    dy = np.array([deg[v] for u, v in sym], dtype=float)
    r = np.corrcoef(dx, dy)[0, 1]
    assert row["r_q"] == int(np.floor(r * 1e9 + 0.5))


def test_table_diff_null_key_matches_itself(spark):
    """A NULL-keyed row present unchanged in both snapshots must report
    'unchanged' — the plain equi-join reported it as added AND removed."""
    from etl_manager_spark.operators.upsert import table_diff

    before = spark.createDataFrame([(None, 1), (1, 2)], "k int, v int")
    after = spark.createDataFrame([(None, 1), (1, 3)], "k int, v int")
    got = {r["k"]: r["diff_status"] for r in table_diff(before, after, ["k"]).collect()}
    assert got == {None: "unchanged", 1: "changed"}


def test_chunk_documents_preserves_id_column_name(spark):
    from etl_manager_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [(7, "a b c d e f")], "user_id long, text string"
    )
    out = chunk_documents(df, id_col="user_id", chunk_tokens=4, overlap_tokens=1)
    assert "user_id" in out.columns and "doc_id" not in out.columns
    assert out.join(df, on="user_id").count() == out.count()


def test_empty_document_scores_zero_quality(spark):
    from etl_manager_spark.operators.text import quality_score, text_profile

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "a real document with several tokens here")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["q"]
        for r in df.select("doc_id", quality_score("text").alias("q")).collect()
    }
    assert got[1] == 0.0 and got[2] == 0.0 and got[3] > 0.5
    prof = {r["doc_id"]: r["quality"] for r in text_profile(df).collect()}
    assert prof[1] == 0.0 and prof[2] == 0.0


def test_text_profile_vectorized_empty_doc_parity(spark):
    from etl_manager_spark.operators.text import (
        text_profile,
        text_profile_vectorized,
    )

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "some words here")], "doc_id long, text string"
    )
    jvm = {r["doc_id"]: r["quality"] for r in text_profile(df).collect()}
    vec = {r["doc_id"]: r["quality"] for r in text_profile_vectorized(df).collect()}
    assert jvm == vec


def test_scrub_pii_ip_not_redacted_as_phone(spark):
    from etl_manager_spark.operators.text import scrub_pii

    df = spark.createDataFrame(
        [(1, "ip 192.168.100.200 end"), (2, "call +1-555-0123 now")],
        "id long, text string",
    )
    got = {r["id"]: r["s"] for r in df.select("id", scrub_pii("text").alias("s")).collect()}
    assert got[1] == "ip <IP> end"
    assert "<PHONE>" in got[2]


def test_heavy_hitters_nan_candidate_not_missed(spark):
    from etl_manager_spark.operators.frequency import heavy_hitters_two_pass

    rows = [(float("nan"),)] * 40 + [(1.0,)] * 5 + [(float(i),) for i in range(2, 30)]
    df = spark.createDataFrame(rows, "v double").repartition(8)
    got = heavy_hitters_two_pass(df, "v", k=4).collect()
    import math

    assert any(math.isnan(r["v"]) for r in got), "NaN heavy hitter missed"


def test_within_distance_join_rejects_shared_coordinate_names(spark):
    from etl_manager_spark.operators.spatial import within_distance_join

    left = spark.createDataFrame([(1, 10.0, 10.0)], "id long, lat double, lon double")
    right = spark.createDataFrame([(2, 10.1, 10.1)], "rid long, lat double, lon double")
    with pytest.raises(ValueError, match="BOTH sides"):
        within_distance_join(left, right, max_km=50)


def test_extract_features_null_content_null_bytes(spark):
    from etl_manager_spark.operators import multimodal as M

    media = M.synthetic_media(spark, n=4).select(
        "media_id",
        F.when(F.col("media_id") == 0, F.lit(None).cast("binary"))
        .otherwise(F.col("content"))
        .alias("content"),
        "meta",
    )
    feats = {r["media_id"]: r["n_bytes"] for r in M.extract_features(media, feature_dim=4).collect()}
    stats = {r["media_id"]: r["n_bytes"] for r in M.media_stats(media).collect()}
    assert feats[0] is None and stats[0] is None  # consistent NULL semantics
    assert feats[1] == stats[1] and feats[1] is not None


def test_rank_bounded_null_desc_matches_window(spark):
    """rank_bounded must rank NULLs LAST on desc keys, exactly like the
    row_number window it replaces (desc default = NULLS LAST)."""
    from pyspark.sql import Window

    from etl_manager_spark.operators.topk import rank_bounded

    rows = [(1, 5.0), (2, None), (3, 9.0), (4, 7.0), (5, None)]
    df = spark.createDataFrame(rows, "id long, score double")
    w = Window.orderBy(F.desc("score"), F.asc("id"))
    exp = {
        r["id"]: r["rnk"]
        for r in df.select("id", F.row_number().over(w).alias("rnk")).collect()
    }
    got = {
        r["id"]: r["rnk"]
        for r in rank_bounded(df, [("score", "desc"), ("id", "asc")]).collect()
    }
    assert got == exp


def test_partial_topk_prefilter_superset_under_any_tiebreak(spark):
    """Value ties at the local k boundary all survive the prefilter, so
    prefilter + grouped_topk equals plain grouped_topk regardless of the
    final tiebreak (row_number would drop true winners arbitrarily)."""
    from etl_manager_spark.operators.topk import (
        grouped_topk,
        partial_topk_prefilter,
    )

    rows = [("g", 5.0, i) for i in range(20)] + [("g", 4.0, 100 + i) for i in range(5)]
    df = spark.createDataFrame(rows, "grp string, value double, id long").repartition(1)
    order = [F.desc("value"), F.asc("id")]
    exact = {
        (r["grp"], r["id"])
        for r in grouped_topk(df, ["grp"], order, k=3).collect()
    }
    pre = partial_topk_prefilter(df, ["grp"], "value", k=3)
    two_phase = {
        (r["grp"], r["id"])
        for r in grouped_topk(pre, ["grp"], order, k=3).collect()
    }
    assert two_phase == exact  # ids 0,1,2 — smallest ids among the tie


def test_funnel_rejects_repeated_steps(spark, sf_dir):
    from etl_manager_spark.operators.behavior import funnel

    events = spark.createDataFrame(
        [(1, "view", "2026-01-01 00:00:00")], "user_id long, event_type string, ts string"
    ).select("user_id", "event_type", F.col("ts").cast("timestamp"))
    with pytest.raises(ValueError, match="must be distinct"):
        funnel(events, ["view", "click", "view"])


def test_simhash_rejects_bits_over_32(spark):
    from etl_manager_spark.operators.dedup import simhash

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match=r"\[1, 32\]"):
        simhash(df, bits=48)


def test_minhash_bands_must_divide(spark):
    from etl_manager_spark.operators.dedup import minhash_near_duplicates

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="multiple of bands"):
        minhash_near_duplicates(df, num_hashes=8, bands=3).collect()


def test_bm25_empty_query_rejected(spark):
    from etl_manager_spark.operators.ranking import bm25_scores

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="query_terms is empty"):
        bm25_scores(df, [])


def test_two_level_rollup_rejects_non_multiple(spark):
    from etl_manager_spark.streaming.windows import (
        _duration_seconds,
        two_level_rollup,
    )

    assert _duration_seconds("10 minutes") == 600
    assert _duration_seconds("1 hour") == 3600
    events = spark.readStream.format("rate").load().selectExpr(
        "timestamp as ts", "'view' as event_type", "cast(value as double) as value"
    )
    with pytest.raises(ValueError, match="integer multiple"):
        two_level_rollup(events, small="25 minutes", big="1 hour")


def test_pack_sequences_null_text_and_null_id(spark):
    """A NULL-text doc packs as 0 tokens (a NaN poisoned the greedy fold
    for the whole shard); a NULL-id doc lands in a real [0, n_shards)
    shard via the coalesced hash draw."""
    from etl_manager_spark.operators.packing import pack_sequences

    rows = [(1, "a b c"), (2, None), (None, "d e"), (3, "f g h")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = pack_sequences(df, seq_tokens=8, n_shards=4).collect()
    assert len(out) == 4
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[2]["n_tokens"] == 0
    assert 0 <= by_id[None]["shard"] < 4


def test_pack_sequences_shard_uniformity_non_power_of_16(spark):
    """10 shards: the 1-digit rule gave shards 0-5 twice the mass of
    6-9; the bias-bounded prefix must keep the spread tight."""
    from etl_manager_spark.operators.packing import pack_sequences

    df = spark.range(4000).selectExpr("id as doc_id", "'x y z' as text")
    counts = {
        r["shard"]: r["n"]
        for r in pack_sequences(df, seq_tokens=64, n_shards=10)
        .groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(counts) == set(range(10))
    assert max(counts.values()) < 1.35 * min(counts.values()), counts


def test_mixture_budget_null_text_costs_zero_not_free_ride(spark):
    from etl_manager_spark.operators.packing import (
        mixture_sample_by_token_budget,
    )

    rows = [(i, "s", "tok " * 4) for i in range(10)] + [(99, "s", None)]
    df = spark.createDataFrame(rows, "doc_id int, source string, text string")
    out = mixture_sample_by_token_budget(df, budgets={"s": 12}, default_budget=0)
    got = out.collect()
    # null-text doc may be kept (0 tokens) but never pushes cum past budget
    assert all(r["cum_tokens"] <= 12 for r in got)
    assert {r["n_tokens"] for r in got if r["doc_id"] == 99} <= {0}


def test_weighted_mean_cents_nulls_and_bigint_products(spark):
    from etl_manager_spark.functions.udfs import weighted_mean_cents

    rows = [("g", 10.0, 1), ("g", None, 5), ("g", 20.0, None), ("g", 30.0, 3)]
    df = spark.createDataFrame(rows, "g string, v double, w long")
    got = df.groupBy("g").agg(
        weighted_mean_cents("v", "w").alias("m")
    ).collect()[0]["m"]
    # only (10,1) and (30,3) count: (1000*1 + 3000*3)/4 = 2500 cents = 25.0
    assert got == 25.0
    # overflow-free: huge values × weights past int64
    big = spark.createDataFrame(
        [("h", 9e16, 10**9)] * 3, "g string, v double, w long"
    )
    got_big = big.groupBy("g").agg(
        weighted_mean_cents("v", "w").alias("m")
    ).collect()[0]["m"]
    assert abs(got_big - 9e16) < 1e3  # int64 dot would have wrapped negative


def test_label_centroids_null_label_and_null_embedding(spark):
    from etl_manager_spark.functions.udfs import label_centroids

    rows = [
        (1, 0, [1.0, 1.0]),
        (2, 0, None),            # ignored inside the group
        (3, None, [3.0, 5.0]),   # null label = its own group
        (4, 7, None),            # all-null group → no row
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    got = {r["label"]: (r["n"], list(r["centroid"])) for r in label_centroids(df).collect()}
    assert got[0] == (1, [1.0, 1.0])
    assert got[None] == (1, [3.0, 5.0])
    assert 7 not in got


def test_quantize_embedding_nan_vector_nulls(spark):
    from etl_manager_spark.functions.udfs import quantized_embeddings

    df = spark.createDataFrame(
        [(1, [1.0, float("nan"), 2.0]), (2, [1.0, -2.0])],
        "vec_id long, embedding array<double>",
    )
    got = {r["vec_id"]: r["q_embedding"] for r in quantized_embeddings(df).collect()}
    assert got[1] is None
    assert got[2] == [64, -127]


def test_conform_case_insensitive_column_match(spark):
    from etl_manager_spark import TableMeta
    from etl_manager_spark.sources.writers import conform

    t = TableMeta(
        name="t", location="t", data_format="parquet",
        columns=[{"name": "user_id", "type": "long"},
                 {"name": "score", "type": "double"}],
    )
    df = spark.createDataFrame([(1, 2.5)], "USER_ID long, SCORE double")
    out = conform(df, t)
    assert out.columns == ["user_id", "score"]
    r = out.collect()[0]
    assert (r.user_id, r.score) == (1, 2.5)  # not silently nulled


def test_jsonl_sink_overwrite_sweeps_stale_parts(spark, tmp_path):
    """mode('overwrite') with fewer partitions must not leave the larger
    previous write's part files behind; append must not clobber."""
    import glob
    import json

    from etl_manager_spark.sources.pysource import register_sink

    register_sink(spark)
    path = str(tmp_path / "sink")
    spark.range(40).repartition(4).write.format("jsonlsink").option(
        "path", path
    ).mode("append").save()
    first = set(glob.glob(path + "/part-*.jsonl"))
    assert len(first) == 4
    spark.range(10).repartition(2).write.format("jsonlsink").option(
        "path", path
    ).mode("overwrite").save()
    parts = glob.glob(path + "/part-*.jsonl")
    assert len(parts) == 2  # stale parts swept
    rows = []
    for p in parts:
        with open(p) as fh:
            rows += [json.loads(line)["id"] for line in fh]
    assert sorted(rows) == list(range(10))
    # append after overwrite: old parts survive, new ones unique-named
    spark.range(10, 15).repartition(1).write.format("jsonlsink").option(
        "path", path
    ).mode("append").save()
    assert len(glob.glob(path + "/part-*.jsonl")) == 3
    # no orphan temp files ever survive a commit
    assert glob.glob(path + "/_tmp-*.jsonl") == []


def test_jsonl_sink_creates_missing_directory(spark, tmp_path):
    from etl_manager_spark.sources.pysource import register_sink

    register_sink(spark)
    fresh = str(tmp_path / "does" / "not" / "exist")
    spark.range(5).coalesce(1).write.format("jsonlsink").option(
        "path", fresh
    ).mode("overwrite").save()
    import glob

    assert len(glob.glob(fresh + "/part-*.jsonl")) == 1


def test_sink_abort_tolerates_none_messages():
    """PySpark passes None for a failed task's commit slot — abort must
    clean the surviving files instead of crashing on .filename."""
    from etl_manager_spark.sources.pysource import _remove_message_files

    class Msg:
        def __init__(self, f):
            self.filename = f

    import tempfile
    import os

    f = tempfile.NamedTemporaryFile(delete=False)
    f.close()
    _remove_message_files([None, Msg(f.name), None])
    assert not os.path.exists(f.name)


def test_jsonl_sink_commit_spares_concurrent_writers_tmp_files(spark, tmp_path):
    """commit()'s orphan sweep is scoped to the committing writer's own
    id: a concurrent job's in-flight _tmp- task files (same path,
    different writer) must survive, or its later os.replace fails."""
    import glob
    import os

    from etl_manager_spark.sources.pysource import register_sink

    register_sink(spark)
    path = tmp_path / "sink"
    path.mkdir()
    foreign = path / "_tmp-feedbeefcafe-0-deadbeef.jsonl"
    foreign.write_text('{"id": 99}\n')
    spark.range(5).coalesce(1).write.format("jsonlsink").option(
        "path", str(path)
    ).mode("append").save()
    assert foreign.exists()  # concurrent writer's in-flight file intact
    # and the committing writer still swept its own orphans: the only
    # _tmp- file left is the foreign one
    assert glob.glob(str(path / "_tmp-*.jsonl")) == [str(foreign)]
    assert len(glob.glob(str(path / "part-*.jsonl"))) == 1
    # overwrite mode sweeps EVERY orphan temp (the dataset is declared
    # replaced) — this is how a hard-crashed writer's leftovers get
    # reclaimed
    spark.range(3).coalesce(1).write.format("jsonlsink").option(
        "path", str(path)
    ).mode("overwrite").save()
    assert not foreign.exists()
    assert glob.glob(str(path / "_tmp-*.jsonl")) == []
    assert os.path.exists(str(path / "_SUCCESS"))


def test_conform_rejects_case_ambiguous_columns(spark):
    """Two input columns differing only by case that both target a
    declared field must raise (Spark's AMBIGUOUS_REFERENCE), not let
    dict order silently pick one."""
    import pytest as _pytest

    from etl_manager_spark import TableMeta
    from etl_manager_spark.meta.table import MetadataError
    from etl_manager_spark.sources.writers import conform

    t = TableMeta(
        name="t", location="t", data_format="parquet",
        columns=[{"name": "user_id", "type": "long"}],
    )
    df = spark.createDataFrame([(1, 2)], "USER_ID long, user_id long")
    with _pytest.raises(MetadataError, match="ambiguous.*USER_ID.*user_id"):
        conform(df, t)
    # collisions on columns NO declared field wants are still fine
    t2 = TableMeta(
        name="t2", location="t2", data_format="parquet",
        columns=[{"name": "other", "type": "long"}],
    )
    df2 = spark.createDataFrame(
        [(1, 2, 3)], "EXTRA long, extra long, other long"
    )
    assert conform(df2, t2).columns == ["other"]
