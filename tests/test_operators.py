"""Operator-level tests: LSH recall vs brute force, asof correctness on a
hand-built fixture, multimodal plumbing, dedup edge cases."""

import pytest
from pyspark.sql import Row, functions as F

from etl_manager_spark.operators import multimodal as M
from etl_manager_spark.operators import similarity as S
from etl_manager_spark.operators.asof import asof_join
from etl_manager_spark.operators.dedup import exact_dedup, minhash_near_duplicates
from etl_manager_spark.workloads.tables import load_table


def test_lsh_topk_recall_vs_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = S.cosine_topk(queries, emb, k=5)
    approx = S.cosine_topk_lsh(
        queries, emb, dim=64, k=5, num_planes=3, num_tables=16
    )
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # p3×t16 on these embeddings measures 1.0 (sf0.001) / 0.96 (sf0.01);
    # a broken index (wrong planes, lost buckets) lands far below this
    assert recall >= 0.85, f"recall {recall}"
    assert all(r.rank <= 5 for r in approx.collect())


def test_cosine_blocked_matches_broadcast_exactly(spark, sf_dir):
    """The blocked numpy all-pairs kernel must equal the broadcast HOF
    form bitwise (same pairs, identical float sims)."""
    from etl_manager_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    hof = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in S.cosine_near_dup_pairs(emb, threshold=0.4).collect()
    }
    blocked = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in S.cosine_near_dup_pairs_blocked(emb, threshold=0.4).collect()
    }
    assert hof == blocked and len(blocked) > 0


def test_rolling_fingerprint_paths_agree(spark, sf_dir):
    """The fused HOF expression, the two-projection HOF form, and the
    Arrow-vectorized numpy form must produce identical fingerprints."""
    from etl_manager_spark.operators import text as X

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    fused = {
        r.doc_id: r.fp
        for r in docs.select(
            "doc_id", X.rolling_fingerprint("text").alias("fp")
        ).collect()
    }
    staged = {
        r.doc_id: r.fingerprint
        for r in X.with_rolling_fingerprint(docs, "text").collect()
    }
    vec = {
        r.doc_id: r.fp
        for r in docs.select(
            "doc_id", X.rolling_fingerprint_vectorized("text").alias("fp")
        ).collect()
    }
    assert fused == staged == vec and len(fused) > 0


def test_text_profile_paths_agree(spark, sf_dir):
    """The JVM-HOF profile and the Arrow-vectorized profile must produce
    identical rows on the test corpus plus whitespace/empty edge cases
    (float stats bitwise-equal: same IEEE double ops on each side)."""
    from etl_manager_spark.operators import text as X

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    edge = spark.createDataFrame(
        [(90001, ""), (90002, "   "), (90003, "\tThe the THE x\n"),
         (90004, "one"), (90005, None)],
        "doc_id long, text string",
    )
    docs = docs.unionByName(edge)
    jvm = {r.doc_id: r for r in X.text_profile(docs).collect()}
    vec = {r.doc_id: r for r in X.text_profile_vectorized(docs).collect()}
    assert len(jvm) == len(vec) > 0
    assert jvm == vec


def test_ivf_topk_recall_vs_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = S.cosine_topk(queries, emb, k=5)
    approx = S.cosine_topk_ivf(queries, emb, k=5, num_lists=8, nprobe=3)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    # probing 3/8 lists measures 0.92 (sf0.001) / 0.96 (sf0.01) recall;
    # a broken index (bad centroids, wrong list routing) lands far below
    recall = len(e & a) / len(e)
    assert recall >= 0.8, f"recall {recall}"
    # scored candidates are real corpus vectors with exact cosine — any
    # returned (q, n) pair that brute force also returns must agree on sim
    exact_sims = {(r.query_id, r.neighbor_id): r.cosine_sim for r in exact.collect()}
    for r in approx.collect():
        if (r.query_id, r.neighbor_id) in exact_sims:
            assert r.cosine_sim == exact_sims[(r.query_id, r.neighbor_id)]


def test_cosine_near_dup_lsh_recall_vs_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    # low threshold so the exact pair set is non-empty on random embeddings
    exact = S.cosine_near_dup_pairs(emb, threshold=0.35)
    approx = S.cosine_near_dup_pairs_lsh(
        emb, threshold=0.35, dim=64, num_planes=3, num_tables=16
    )
    e = {(r.id_a, r.id_b) for r in exact.collect()}
    a = {(r.id_a, r.id_b) for r in approx.collect()}
    assert e, "exact pair set unexpectedly empty — threshold too high"
    # LSH candidates are a subset of all pairs: no false positives
    assert a <= e
    recall = len(e & a) / len(e)
    # p3×t16 measures ≈0.99 at both test scales
    assert recall >= 0.9, f"recall {recall}"


def test_asof_join_fixture(spark):
    quotes = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 5, 11.0), ("b", 3, 20.0)],
        "sym string, qts int, px double",
    )
    trades = spark.createDataFrame(
        [("a", 0), ("a", 1), ("a", 4), ("a", 6), ("b", 2), ("b", 9)],
        "sym string, tts int",
    )
    out = asof_join(
        trades, quotes, on="sym", left_ts="tts", right_ts="qts",
        right_payload=["px"],
    )
    got = {(r.sym, r.tts): (r.px_asof, r.qts_asof) for r in out.collect()}
    assert got == {
        ("a", 0): (None, None),       # before any quote
        ("a", 1): (10.0, 1),          # equal timestamps: quote visible
        ("a", 4): (10.0, 1),
        ("a", 6): (11.0, 5),
        ("b", 2): (None, None),
        ("b", 9): (20.0, 3),
    }


def test_asof_join_null_payload_and_name_overlap(spark):
    """All carried fields come from ONE right row: a NULL payload field in
    the nearest right row stays NULL (no backfill from an older row), and
    a right payload column sharing a left column's name is carried cleanly
    (the left values cannot pollute the payload)."""
    quotes = spark.createDataFrame(
        [("a", 1, 10.0, "x1"), ("a", 5, None, "x2")],
        "sym string, qts int, px double, src string",
    )
    trades = spark.createDataFrame(
        [("a", 2), ("a", 6)], "sym string, tts int"
    )
    out = asof_join(
        trades, quotes, on="sym", left_ts="tts", right_ts="qts",
        right_payload=["px", "src"],
    )
    got = {r.tts: (r.px_asof, r.src_asof, r.qts_asof) for r in out.collect()}
    # t=6 matches the qts=5 quote whose px is NULL: px_asof must be NULL,
    # NOT backfilled from the qts=1 row
    assert got == {2: (10.0, "x1", 1), 6: (None, "x2", 5)}

    # right payload column named like a left column: left values must not
    # leak into the carried payload
    trades2 = spark.createDataFrame(
        [("a", 2, 99.0), ("a", 6, 98.0)], "sym string, tts int, px double"
    )
    out2 = asof_join(
        trades2, quotes, on="sym", left_ts="tts", right_ts="qts",
        right_payload=["px"],
    )
    got2 = {r.tts: (r.px, r.px_asof) for r in out2.collect()}
    assert got2 == {2: (99.0, 10.0), 6: (98.0, None)}

    # suffixed output name colliding with a left column raises
    trades3 = trades.withColumn("px_asof", F.lit(0.0))
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            trades3, quotes, on="sym", left_ts="tts", right_ts="qts",
            right_payload=["px"],
        )


def test_asof_join_property_vs_duckdb(spark):
    """Property test: asof_join must agree with DuckDB's native ASOF LEFT
    JOIN on random key/timestamp sets, including equal left/right
    timestamps, duplicate left rows, keys with no right rows, and NULL
    payload fields. Right (key, ts) pairs are unique (both engines pick
    arbitrarily among exact right-side ties, so ties there are not part of
    the contract). Pins the single-struct payload-carry semantics (no
    cross-row NULL backfill) against an independent reference engine."""
    import duckdb
    import pandas as pd
    from hypothesis import given, settings, strategies as st

    right_rows = st.lists(
        st.tuples(
            st.integers(0, 2),                      # key
            st.integers(0, 15),                     # rts
            st.none() | st.integers(-5, 5),         # payload a (nullable)
            st.none() | st.integers(-5, 5),         # payload b (nullable)
        ),
        max_size=8,
        unique_by=lambda r: (r[0], r[1]),
    )
    left_rows = st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 15)),
        min_size=1,
        max_size=10,
    )

    @settings(max_examples=25, deadline=None)
    @given(right=right_rows, left=left_rows)
    def check(right, left):
        left_df = spark.createDataFrame(
            [(i, k, ts) for i, (k, ts) in enumerate(left)],
            "id int, k int, lts int",
        )
        right_schema = "k int, rts int, a int, b int"
        rdf = (
            spark.createDataFrame(right, right_schema)
            if right
            else spark.createDataFrame([], right_schema)
        )
        out = asof_join(
            left_df, rdf, on="k", left_ts="lts", right_ts="rts",
            right_payload=["a", "b"],
        )
        got = {
            r.id: (r.a_asof, r.b_asof, r.rts_asof) for r in out.collect()
        }

        con = duckdb.connect()
        lpd = pd.DataFrame(
            [(i, k, ts) for i, (k, ts) in enumerate(left)],
            columns=["id", "k", "lts"],
        )
        rpd = pd.DataFrame(right, columns=["k", "rts", "a", "b"]).astype(
            {"a": "Int64", "b": "Int64"}
        ) if right else pd.DataFrame(
            {"k": pd.Series(dtype="int64"), "rts": pd.Series(dtype="int64"),
             "a": pd.Series(dtype="Int64"), "b": pd.Series(dtype="Int64")}
        )
        con.register("l", lpd)
        con.register("r", rpd)
        want = {
            row[0]: (row[1], row[2], row[3])
            for row in con.execute(
                "SELECT l.id, r.a, r.b, r.rts FROM l "
                "ASOF LEFT JOIN r ON l.k = r.k AND l.lts >= r.rts"
            ).fetchall()
        }
        con.close()
        assert got == want

    check()


def test_exact_dedup_deterministic_survivor(spark):
    df = spark.createDataFrame(
        [(3, "x"), (1, "x"), (2, "y")], "id int, val string"
    )
    out = {(r.val): (r.id, r.copies) for r in exact_dedup(df, ["val"], "id").collect()}
    assert out == {"x": (1, 2), "y": (2, 1)}


def test_minhash_identical_docs_are_near_dups(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta gamma delta epsilon zeta"),
            Row(doc_id=2, text="alpha beta gamma delta epsilon zeta"),
            Row(doc_id=3, text="totally different words entirely here now"),
        ]
    )
    pairs = minhash_near_duplicates(df, jaccard_threshold=0.9).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [(1, 2)]
    assert pairs[0].jaccard == 1.0


def test_near_dup_clusters_chain_merges_transitively(spark):
    # A-B and B-C: one component even though A-C never paired directly
    from etl_manager_spark.operators.dedup import near_dup_clusters

    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    out = {r.id: r.cluster_id for r in near_dup_clusters(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1}


def test_near_dup_clusters_two_cliques_stay_separate(spark):
    from etl_manager_spark.operators.dedup import near_dup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12)], "id_a long, id_b long"
    )
    out = {r.id: r.cluster_id for r in near_dup_clusters(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_near_dup_clusters_long_chain_and_string_ids(spark):
    from etl_manager_spark.operators.dedup import near_dup_clusters

    # 8-node path: worst-case diameter for min-label propagation
    chain = [(f"d{i}", f"d{i+1}") for i in range(8)]
    pairs = spark.createDataFrame(chain, "id_a string, id_b string")
    out = {r.id: r.cluster_id for r in near_dup_clusters(pairs).collect()}
    assert set(out) == {f"d{i}" for i in range(9)}
    assert set(out.values()) == {"d0"}


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_near_dup_clusters_property_vs_union_find(spark):
    """Property test on random graphs: cluster assignment must equal an
    independent union-find (same components, min-id representative).
    Small id space forces dense merges; self-loops and duplicate/reversed
    edges are fair game."""
    from hypothesis import given, settings, strategies as st

    from etl_manager_spark.operators.dedup import near_dup_clusters

    edges_strategy = st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1,
        max_size=20,
    )

    @settings(max_examples=20, deadline=None)
    @given(edges=edges_strategy)
    def check(edges):
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {r.id: r.cluster_id for r in near_dup_clusters(pairs).collect()}
        assert got == _union_find(edges)

    check()


def test_connected_components_star_property_vs_union_find(spark):
    """Same union-find property as propagation, for the star contraction."""
    from hypothesis import given, settings, strategies as st

    from etl_manager_spark.operators.dedup import connected_components_star

    @settings(max_examples=10, deadline=None)
    @given(
        edges=st.lists(
            st.tuples(st.integers(0, 15), st.integers(0, 15)),
            min_size=1,
            max_size=25,
        )
    )
    def check(edges):
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {
            r.id: r.cluster_id
            for r in connected_components_star(pairs).collect()
        }
        assert got == _union_find(edges)

    check()


def test_connected_components_star_giant_component_log_rounds(spark):
    """The giant-component guard: a dense seeded random graph fused with a
    64-node chain (diameter 63 — min-propagation would need 63 rounds)
    must converge within the O(log² n) bound and match union-find."""
    import random

    from etl_manager_spark.operators.dedup import connected_components_star

    rng = random.Random(42)
    n = 120
    edges = [(i, i + 1) for i in range(63)]  # chain: worst case diameter
    edges += [
        (rng.randrange(60, n), rng.randrange(60, n)) for _ in range(150)
    ]  # dense blob overlapping the chain's tail
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    # ceil(log2(120))^2 would be 49; star needs far fewer — 12 is the
    # practical log² budget and far below the 63 propagation would need
    got = {
        r.id: r.cluster_id
        for r in connected_components_star(pairs, max_iterations=12).collect()
    }
    assert got == _union_find(edges)


def test_near_dup_clusters_auto_falls_back_to_star(spark):
    """algorithm='auto' with a cap far below the diameter must not raise:
    it switches to star contraction and still labels correctly."""
    from etl_manager_spark.operators.dedup import near_dup_clusters

    chain = [(i, i + 1) for i in range(40)]  # diameter 40 >> cap 3
    pairs = spark.createDataFrame(chain, "id_a long, id_b long")
    got = {
        r.id: r.cluster_id
        for r in near_dup_clusters(pairs, max_iterations=3).collect()
    }
    assert got == {i: 0 for i in range(41)}

    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="did not converge"):
        near_dup_clusters(
            pairs, max_iterations=3, algorithm="propagation"
        ).collect()


def test_near_dup_clusters_exhaustion_contract(spark):
    """Cap exhaustion: algorithm='propagation' raises (partial labels
    would silently mis-cluster); the default 'auto' falls back to star
    contraction and succeeds instead."""
    from etl_manager_spark.operators.dedup import near_dup_clusters

    chain = [(i, i + 1) for i in range(6)]
    pairs = spark.createDataFrame(chain, "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        near_dup_clusters(pairs, max_iterations=1, algorithm="propagation").collect()
    out = {
        r.id: r.cluster_id
        for r in near_dup_clusters(pairs, max_iterations=1).collect()
    }
    assert out == {i: 0 for i in range(7)}


def test_multimodal_feature_extraction_shape(spark):
    media = M.synthetic_media(spark, n=8)
    feats = M.extract_features(media, feature_dim=16).collect()
    assert len(feats) == 8
    assert all(len(r.feature) == 16 for r in feats)
    assert all(0.0 <= v <= 1.0 for r in feats for v in r.feature)
    # deterministic: same content → same sha/feature on re-run
    again = M.extract_features(media, feature_dim=16).collect()
    assert {r.media_id: r.content_sha256 for r in feats} == {
        r.media_id: r.content_sha256 for r in again
    }


def test_media_stats_jvm_side(spark):
    media = M.synthetic_media(spark, n=4)
    stats = M.media_stats(media).collect()
    assert all(r.n_bytes > 0 and len(r.content_md5) == 32 for r in stats)


def test_merge_upsert_update_insert_delete(spark):
    from etl_manager_spark.operators.upsert import merge_upsert

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, name string, v double"
    )
    source = spark.createDataFrame(
        [(2, "b2", 25.0, False), (3, "c", 30.0, True), (4, "d", 40.0, False)],
        "k long, name string, v double, _del boolean",
    )
    out = {
        r.k: (r.name, r.v)
        for r in merge_upsert(target, source, key=["k"], delete_col="_del").collect()
    }
    # 1 passes through, 2 updated, 3 deleted, 4 inserted
    assert out == {1: ("a", 10.0), 2: ("b2", 25.0), 4: ("d", 40.0)}


def test_merge_upsert_null_updates_and_null_keys(spark):
    """A matched source row can null a column out (updates are gated on
    presence, not COALESCE), and NULL join keys match null-safely for both
    update and delete paths."""
    from etl_manager_spark.operators.upsert import merge_upsert

    target = spark.createDataFrame(
        [(1, "a", 10.0), (None, "nk", 99.0), (None, "nk2", 77.0)],
        "k long, name string, v double",
    )
    # upsert without delete_col: matched row sets v to NULL
    source = spark.createDataFrame([(1, "a2", None)], "k long, name string, v double")
    out = {r.k: (r.name, r.v) for r in merge_upsert(target, source, key=["k"]).collect()}
    assert out[1] == ("a2", None)

    # NULL-key source row updates the NULL-key target rows (null-safe join)
    source2 = spark.createDataFrame(
        [(None, "nk-upd", 1.0, False), (5, "e", 5.0, True)],
        "k long, name string, v double, _del boolean",
    )
    rows = merge_upsert(target, source2, key=["k"], delete_col="_del").collect()
    by_name = {r.name: (r.k, r.v) for r in rows}
    # both NULL-key target rows matched the NULL-key source row
    assert by_name == {"a": (1, 10.0), "nk-upd": (None, 1.0)}
    # delete-flagged source-only key 5 was NOT inserted
    assert all(r.k != 5 for r in rows)

    # NULL-key delete: the null-keyed target rows are dropped
    source3 = spark.createDataFrame(
        [(None, "x", 0.0, True)], "k long, name string, v double, _del boolean"
    )
    rows3 = merge_upsert(target, source3, key=["k"], delete_col="_del").collect()
    assert {r.k for r in rows3} == {1}


def test_merge_upsert_rejects_schema_mismatch(spark):
    import pytest

    from etl_manager_spark.operators.upsert import merge_upsert

    target = spark.createDataFrame([(1, "a")], "k long, name string")
    source = spark.createDataFrame([(1, 2.0)], "k long, other double")
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_upsert(target, source, key=["k"])


def test_scd2_intervals_and_tie_break(spark):
    from etl_manager_spark.operators.upsert import scd2_from_events

    df = spark.createDataFrame(
        [(1, 100, 10), (1, 200, 11), (1, 200, 12), (2, 50, 13)],
        "uid long, ts long, event_id long",
    )
    rows = {
        r.event_id: (r.valid_from, r.valid_to, r.is_current)
        for r in scd2_from_events(
            df, key=["uid"], ts_col="ts", order_cols=["event_id"]
        ).collect()
    }
    assert rows[10] == (100, 200, False)
    assert rows[11] == (200, 200, False)  # tie broken by event_id
    assert rows[12] == (200, None, True)
    assert rows[13] == (50, None, True)


def test_fuzzy_name_pairs_blocked_levenshtein(spark):
    from etl_manager_spark.operators.dedup import fuzzy_name_pairs

    df = spark.createDataFrame(
        [("small ring",), ("smal ring",), ("red ring",), ("red widget",),
         ("small ring",)],  # duplicate row: distinct-first must collapse it
        "name string",
    )
    out = {
        (r.name_a, r.name_b): r.distance
        for r in fuzzy_name_pairs(df, "name", max_distance=3).collect()
    }
    # same block 'ring': smal~small dist 1; red~small dist > 3 excluded;
    # 'widget' block has one member → no pair
    assert out == {("smal ring", "small ring"): 1}


def test_resize_media_shape_and_determinism(spark):
    media = M.synthetic_media(spark, n=6)
    out = M.resize_media(media, width=8, height=4).collect()
    assert len(out) == 6
    assert all(len(r.content) == 8 * 4 * 3 for r in out)
    assert all((r.width, r.height) == (8, 4) for r in out)
    again = {r.media_id: bytes(r.content) for r in M.resize_media(media, 8, 4).collect()}
    assert {r.media_id: bytes(r.content) for r in out} == again


def test_sample_frames_fanout(spark):
    media = M.synthetic_media(spark, n=9)
    frames = M.sample_frames(media, every_ms=1000).collect()
    durations = {
        r.media_id: r.meta.duration_ms
        for r in media.collect()
        if r.meta.duration_ms is not None
    }
    # stills yield nothing; videos yield ceil(duration/1000) frames at 0,1000,...
    expected = {mid: (d + 999) // 1000 for mid, d in durations.items()}
    got = {}
    for r in frames:
        got[r.media_id] = got.get(r.media_id, 0) + 1
        assert r.ts_ms == r.frame_idx * 1000
        assert len(r.frame) == 32  # sha256 stub
    assert got == expected and expected


def test_train_test_split_disjoint_exhaustive_stable(spark, sf_dir):
    from etl_manager_spark.operators.sampling import train_test_split

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    train, test = train_test_split(docs, "doc_id", 0.8)
    tr = {r.doc_id for r in train.collect()}
    te = {r.doc_id for r in test.collect()}
    allids = {r.doc_id for r in docs.collect()}
    assert tr | te == allids and not (tr & te)
    # roughly the requested fraction (md5 is uniform)
    assert 0.7 < len(tr) / len(allids) < 0.9
    # stable across a different partitioning
    tr2 = {r.doc_id for r in train_test_split(docs.repartition(7), "doc_id", 0.8)[0].collect()}
    assert tr2 == tr


def test_triangle_counts_vs_bruteforce(spark):
    """Random graph: the two-join enumeration must match a brute-force
    itertools triangle count per node."""
    import hashlib
    from itertools import combinations

    from etl_manager_spark.operators.graph import triangle_counts

    n = 40
    edges = sorted(
        {
            (a, b)
            for a in range(n)
            for b in range(a + 1, n)
            if int(hashlib.md5(f"{a}-{b}".encode()).hexdigest()[:4], 16) % 7 == 0
        }
    )
    eset = set(edges)
    expected: dict[int, int] = {}
    for a, b, c in combinations(range(n), 3):
        if (a, b) in eset and (b, c) in eset and (a, c) in eset:
            for v in (a, b, c):
                expected[v] = expected.get(v, 0) + 1
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.id: r.n_triangles for r in triangle_counts(pairs).collect()}
    assert got == expected
    assert sum(expected.values()) % 3 == 0 and expected  # sanity: fixture has triangles


def test_pagerank_quantized_partitioning_invariant(spark):
    """Quantized contributions make the ranks exactly reproducible under
    different partitionings AND match a sequential numpy replay of the
    same quantization rule."""
    import hashlib
    import math

    from etl_manager_spark.operators.graph import pagerank_quantized

    n = 30
    edges = sorted(
        {
            (a, b)
            for a in range(n)
            for b in range(a + 1, n)
            if int(hashlib.md5(f"{a}:{b}".encode()).hexdigest()[:4], 16) % 5 == 0
        }
    )
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    r1 = {r.id: r.rank for r in pagerank_quantized(pairs, iterations=3).collect()}
    r2 = {
        r.id: r.rank
        for r in pagerank_quantized(pairs.repartition(7, "id_b"), iterations=3).collect()
    }
    assert r1 == r2  # bitwise, not approximately

    # sequential replay
    sym = {}
    for a, b in edges:
        sym.setdefault(a, set()).add(b)
        sym.setdefault(b, set()).add(a)
    ranks = {v: 1.0 for v in sym}
    for _ in range(3):
        acc = {v: 0 for v in sym}
        for src, nbrs in sym.items():
            deg = len(nbrs)
            for dst in nbrs:
                acc[dst] += math.floor(ranks[src] / deg * 1e9 + 0.5)
        ranks = {v: 0.15000000000000002 + 0.85 * (s / 1e9) for v, s in acc.items()}
    assert r1 == ranks


def test_semantic_dedup_pairs_subset_of_exact(spark, sf_dir):
    """Within-cluster pairs must be a subset of the exact all-pairs set,
    with bitwise-identical sims for every emitted pair."""
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = S.ivf_train_centroids(emb, num_lists=8, train_sample=1024)
    sem = S.semantic_dedup_pairs(emb, centroids, threshold=0.4)
    exact = S.cosine_near_dup_pairs_blocked(emb, threshold=0.4)
    sem_rows = {(r.id_a, r.id_b): r.cosine_sim for r in sem.collect()}
    exact_rows = {(r.id_a, r.id_b): r.cosine_sim for r in exact.collect()}
    assert set(sem_rows) <= set(exact_rows)
    for k, v in sem_rows.items():
        assert exact_rows[k] == v  # bitwise


def test_perceptual_hash_is_jvm_side_and_complete(spark):
    """The media pHash must be pure column arithmetic (no Python stage in
    the plan), and the banded Hamming join must find EVERY pair within
    max_hamming (pigeonhole completeness) — verified against brute force."""
    from etl_manager_spark.operators import dedup as D
    from etl_manager_spark.operators import multimodal as M
    from etl_manager_spark.plans import plan_report

    media = M.synthetic_media(spark, n=64)
    hashed = M.perceptual_hash(media, bits=16)
    assert "InPandas" not in plan_report(hashed).text
    assert "BatchEvalPython" not in plan_report(hashed).text

    sig = {r["media_id"]: r["phash"] for r in hashed.collect()}
    brute = {
        (a, b): bin(sig[a] ^ sig[b]).count("1")
        for a in sig
        for b in sig
        if a < b and bin(sig[a] ^ sig[b]).count("1") <= 3
    }
    banded = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in D.hamming_near_dup_pairs(
            hashed, "media_id", "phash", bits=16, bands=4, max_hamming=3
        ).collect()
    }
    assert banded == brute


def test_top_ngram_char_fraction_argmax_and_tiebreak(spark):
    """The per-doc top bigram must be the most frequent one, ties broken
    to the lexicographically smallest gram, coverage = count·len/chars
    over the whitespace-normalized text, and sub-n-token docs omitted."""
    from etl_manager_spark.operators.text import top_ngram_char_fraction

    df = spark.createDataFrame(
        [
            # "a b" ×2 beats the others
            (1, "a b a b c"),
            # every bigram unique → tie at count 1 → smallest gram wins
            (2, "z y x w"),
            # single token → no bigram → omitted
            (3, "lonely"),
            # extra whitespace must not change the normalized length
            (4, "  p   q p q  "),
        ],
        "doc_id long, text string",
    )
    rows = {r["id"]: r for r in top_ngram_char_fraction(df, n=2).collect()}
    assert set(rows) == {1, 2, 4}
    assert rows[1]["top_gram"] == "a b"
    assert rows[1]["gram_count"] == 2
    # "a b a b c" → 9 normalized chars, coverage 2·3/9
    assert rows[1]["top_gram_char_frac_q"] == round(2 * 3 / 9 * 1e9)
    assert rows[2]["top_gram"] == "x w"  # smallest of {"z y", "y x", "x w"}
    assert rows[4]["top_gram"] == "p q"
    assert rows[4]["gram_count"] == 2
    assert rows[4]["top_gram_char_frac_q"] == round(2 * 3 / 7 * 1e9)


def test_pq_adc_rerank_recall(spark, sf_dir):
    """The ADC shortlist + exact rerank must recover (nearly) the exact
    top-k: recall 1.0 measured at R=50 on both test SFs — a meaningful
    floor that fails if the codes, LUTs, or rerank break."""
    from etl_manager_spark.workloads import load_registry

    rows = load_registry()["similarity_topk_pq_adc"].fn(spark, sf_dir).collect()
    assert len(rows) == 25
    recall = rows[0]["recall_vs_bruteforce"]
    assert recall >= 0.95, f"ADC+rerank recall {recall}"


def test_mmr_skips_redundant_candidate(spark):
    """With two near-identical top candidates, MMR must pick one of them
    first and then prefer the diverse third candidate over the twin."""
    from etl_manager_spark.operators import similarity as S

    # query 100; candidates: 1 and 2 near-duplicates slightly more
    # relevant than 3, but 3 is near-orthogonal to the twins — at
    # λ=0.7 the redundancy penalty must outweigh the twins' edge
    rows = [
        (100, [0.7, 0.7, 0.0, 0.0]),
        (1, [1.0, 0.05, 0.0, 0.0]),
        (2, [1.0, 0.051, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter(F.col("vec_id") == 100)
    cands = S.cosine_topk(q, emb, k=3)
    cvec = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("_cv"),
        S.l2_norm(F.col("embedding")).alias("_cn"),
    )
    candv = cands.join(cvec, on="neighbor_id").select(
        "query_id",
        F.col("neighbor_id").alias("a_nid"),
        F.col("cosine_sim").alias("a_simq"),
        "_cv",
        "_cn",
    )
    b = candv.select(
        F.col("query_id").alias("_bq"),
        F.col("a_nid").alias("b_nid"),
        F.col("_cv").alias("_bv"),
        F.col("_cn").alias("_bn"),
    )
    pairs = candv.join(
        b,
        (F.col("query_id") == F.col("_bq")) & (F.col("a_nid") != F.col("b_nid")),
    ).select(
        "query_id",
        "a_nid",
        "a_simq",
        "b_nid",
        (S.dot(F.col("_cv"), F.col("_bv")) / (F.col("_cn") * F.col("_bn"))).alias(
            "sim_ab"
        ),
    )
    got = {
        r["mmr_rank"]: r["neighbor_id"]
        for r in S.mmr_select(pairs, k=3, lam=0.7).collect()
    }
    assert got[1] in (1, 2)  # most relevant twin first
    assert got[2] == 3, got  # diversity beats the redundant twin
    assert got[3] in (1, 2) and got[3] != got[1]


# ---------------------------------------------------------------- bloom join


def test_bloom_prefilter_no_false_negatives(spark, sf_dir):
    """The bloom candidate set must be a superset of the exact match set
    (conservative filter) — the property that makes prefilter+join exact."""
    from etl_manager_spark.operators import bloomjoin as BJ

    orders = load_table(spark, sf_dir, "orders")
    dim = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "MACHINERY")
        .select("c_custkey")
    )
    words = BJ.build_key_bloom(dim, "c_custkey")
    cand = {
        r[0]
        for r in orders.filter(BJ.might_contain(F.col("o_custkey"), words))
        .select("o_custkey")
        .distinct()
        .collect()
    }
    exact = {
        r[0]
        for r in orders.join(
            dim, orders.o_custkey == dim.c_custkey, "left_semi"
        )
        .select("o_custkey")
        .distinct()
        .collect()
    }
    assert exact <= cand
    # and the filter actually prunes: candidates should be far below the
    # distinct key universe (5 segments → ~20% true rate; allow fp slack)
    universe = orders.select("o_custkey").distinct().count()
    assert len(cand) < 0.5 * universe, (len(cand), universe)


def test_bloom_prefiltered_join_matches_plain_semi(spark, sf_dir):
    from etl_manager_spark.operators.bloomjoin import bloom_prefiltered_join

    orders = load_table(spark, sf_dir, "orders")
    dim = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select("c_custkey")
    )
    got = sorted(
        r[0]
        for r in bloom_prefiltered_join(
            orders, dim, "o_custkey", "c_custkey", how="semi"
        )
        .select("o_orderkey")
        .collect()
    )
    want = sorted(
        r[0]
        for r in orders.join(
            dim, orders.o_custkey == dim.c_custkey, "left_semi"
        )
        .select("o_orderkey")
        .collect()
    )
    assert got == want


def test_bloom_prefiltered_join_refuses_outer(spark, sf_dir):
    from etl_manager_spark.operators.bloomjoin import (
        bloom_prefiltered_join,
        build_key_bloom,
    )

    orders = load_table(spark, sf_dir, "orders")
    dim = load_table(spark, sf_dir, "customer").select("c_custkey")
    with pytest.raises(ValueError, match="semi/inner"):
        bloom_prefiltered_join(orders, dim, "o_custkey", "c_custkey", how="left")
    with pytest.raises(ValueError, match="multiple of 64"):
        build_key_bloom(dim, "c_custkey", num_bits=100)


def test_build_key_bloom_driver_ceiling_property(spark, sf_dir):
    """The max_bits guard refuses any num_bits above the ceiling BEFORE
    any distributed work (a driver-OOM-by-collect must fail fast), and
    accepts any word-aligned size at or below it."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from etl_manager_spark.operators.bloomjoin import build_key_bloom

    dim = load_table(spark, sf_dir, "customer").select("c_custkey").limit(50)

    @settings(max_examples=30, deadline=None)
    @given(
        words=st.integers(min_value=1, max_value=1 << 20),
        max_words=st.integers(min_value=1, max_value=1 << 12),
    )
    def check(words, max_words):
        num_bits, max_bits = words * 64, max_words * 64
        if num_bits > max_bits:
            with pytest.raises(ValueError, match="exceeds max_bits"):
                build_key_bloom(dim, "c_custkey", num_bits=num_bits, max_bits=max_bits)
        elif num_bits <= 1 << 16:  # only actually build small bitmaps
            got = build_key_bloom(dim, "c_custkey", num_bits=num_bits, max_bits=max_bits)
            assert len(got) == words

    check()
    # the default ceiling itself refuses the documented 10⁹-bit end
    with pytest.raises(ValueError, match="exceeds max_bits"):
        build_key_bloom(dim, "c_custkey", num_bits=1 << 30)


def test_sorted_neighborhood_pairs_hand_fixture(spark):
    """Window-3 adjacency over the sorted distinct names: each name is
    compared to its 2 successors only; typo'd blocking keys still pair."""
    from etl_manager_spark.operators.dedup import sorted_neighborhood_pairs

    names = ["apple", "apply", "banana", "bananna", "cherry", "apple"]
    df = spark.createDataFrame([(n,) for n in names], ["name"])
    got = {
        (r["name_a"], r["name_b"], r["distance"])
        for r in sorted_neighborhood_pairs(
            df, "name", window=3, max_distance=3
        ).collect()
    }
    # sorted order: apple, apply, banana, bananna, cherry
    assert ("apple", "apply", 1) in got
    assert ("banana", "bananna", 1) in got
    # apple→banana is within the window but over the distance gate
    assert all(p[2] <= 3 for p in got)
    assert ("apple", "banana") not in {(a, b) for a, b, _ in got}


def test_sorted_neighborhood_pairs_thin_partitions(spark):
    """Partitions thinner than window-1 names (parallelism >= vocabulary):
    boundary neighborhoods must chain across multiple FOLLOWING
    partitions (round-6 advisor repro: 6 names / 8 partitions / window=3
    lost every lead-2 pair). Compare against the brute-force global-sort
    pair set with no distance gate so every neighborhood pair counts."""
    from etl_manager_spark.operators.dedup import sorted_neighborhood_pairs

    names = sorted(["alpha", "beta", "gamma", "delta", "epsilon", "zeta"])
    df = spark.createDataFrame([(n,) for n in names * 2], ["name"])
    for n_parts, window in [(8, 3), (12, 4), (6, 6), (2, 3)]:
        expected = {
            (names[i], names[j])
            for i in range(len(names))
            for j in range(i + 1, min(i + window, len(names)))
        }
        got = {
            (r["name_a"], r["name_b"])
            for r in sorted_neighborhood_pairs(
                df, "name", window=window, max_distance=10**6,
                n_partitions=n_parts,
            ).collect()
        }
        assert got == expected, f"n_partitions={n_parts} window={window}"


def test_holt_per_key_matches_pandas_reference(spark):
    """holt_per_key vs an independent per-group pandas fold, including
    across Arrow-batch boundaries (single partition forces one stream)."""
    import math
    import random

    rng = random.Random(7)
    rows = []
    eid = 0
    for uid in range(5):
        for _ in range(rng.randint(1, 20)):
            rows.append((uid, eid, float(rng.randint(-50, 50)) / 4))
            eid += 1
    df = spark.createDataFrame(rows, "user_id long, event_id long, value double")
    from etl_manager_spark.operators.timeseries import holt_per_key

    got = {
        (r.user_id, r.event_id): (r.level_q, r.trend_q)
        for r in holt_per_key(
            df.withColumn("ts", F.col("event_id"))
        ).collect()
    }
    exp = {}
    for uid in sorted({r[0] for r in rows}):
        seq = sorted([r for r in rows if r[0] == uid], key=lambda r: r[1])
        lvl, trd = None, 0.0
        for _, e, v in seq:
            if lvl is None:
                lvl, trd = v, 0.0
            else:
                prev = lvl
                lvl = 0.5 * v + 0.5 * (prev + trd)
                trd = 0.5 * (lvl - prev) + 0.5 * trd
            exp[(uid, e)] = (
                math.floor(lvl * 1e9 + 0.5),
                math.floor(trd * 1e9 + 0.5),
            )
    assert got == exp


def test_heavy_hitters_exact_and_complete(spark):
    """Two-pass heavy hitters equals the exact GROUP BY + HAVING answer
    even under an adversarial partitioning that spreads the hot key."""
    from etl_manager_spark.operators.frequency import heavy_hitters_two_pass

    # 'hot' has 30/90 rows (> 90/(k+1) for k=5, threshold 15); 'warm' 12
    # (below); the rest singletons spread across partitions
    vals = ["hot"] * 30 + ["warm"] * 12 + [f"cold{i}" for i in range(48)]
    df = (
        spark.createDataFrame([(v,) for v in vals], "tok string")
        # round-robin spreads 'hot' evenly: each of 8 partitions sees
        # ~4/11 local share — still above 1/6, the local threshold
        .repartition(8)
    )
    got = {
        (r.tok, r.cnt) for r in heavy_hitters_two_pass(df, "tok", k=5).collect()
    }
    assert got == {("hot", 30)}

    # exactness: result matches plain groupBy+filter on a coarser k
    exact = {
        (r.tok, r["count"])
        for r in df.groupBy("tok").count().filter(F.col("count") > 90 / 8).collect()
    }
    got8 = {
        (r.tok, r.cnt) for r in heavy_hitters_two_pass(df, "tok", k=7).collect()
    }
    assert got8 == exact


def test_degree_assortativity_known_graphs(spark):
    from etl_manager_spark.operators.graph import degree_assortativity

    # perfect matching: every degree 1 → zero variance → guarded r = 0
    matching = spark.createDataFrame(
        [(0, 1), (2, 3)], "id_a long, id_b long"
    )
    row = degree_assortativity(matching).collect()[0]
    assert (row.n_edges, row.r_q) == (2, 0)

    # star K1,3: center degree 3, leaves 1 — maximally disassortative
    star = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "id_a long, id_b long"
    )
    row = degree_assortativity(star).collect()[0]
    assert row.n_edges == 3
    assert row.r_q == -1000000000


def test_bfs_distances_hand_built_graph(spark):
    from etl_manager_spark.operators.graph import bfs_distances

    # path 0-1-2-3 plus branch 1-4, separate component 8-9
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (1, 4), (8, 9)], "id_a long, id_b long"
    )
    got = {(r.id, r.dist) for r in bfs_distances(pairs, 0).collect()}
    assert got == {(0, 0), (1, 1), (2, 2), (4, 2), (3, 3)}
    # unreachable component never appears; source-only graph is itself
    got9 = {(r.id, r.dist) for r in bfs_distances(pairs, 8).collect()}
    assert got9 == {(8, 0), (9, 1)}


def test_within_distance_join_cell_boundaries(spark):
    """Pairs straddling 1°-cell boundaries must survive the grid
    prefilter; pairs beyond the radius must not appear."""
    from etl_manager_spark.operators.spatial import (
        haversine_km,
        within_distance_join,
    )

    left = spark.createDataFrame(
        [(1, 9.999, 19.999), (2, 50.0, 0.0)],
        "lid long, a_lat double, a_lon double",
    )
    right = spark.createDataFrame(
        # r1: just across both cell edges from l1 (~0.3 km away)
        # r2: same cell as l2 but 80 km south (beyond 50 km)
        [(10, 10.001, 20.001), (20, 49.3, 0.0)],
        "rid long, b_lat double, b_lon double",
    )
    got = {
        (r.lid, r.rid)
        for r in within_distance_join(
            left,
            right,
            max_km=50,
            left_cols=("a_lat", "a_lon"),
            right_cols=("b_lat", "b_lon"),
        ).collect()
    }
    assert got == {(1, 10)}
    with pytest.raises(ValueError):
        within_distance_join(left, right, max_km=60)


def test_within_distance_join_antimeridian_wrap(spark):
    """A pair straddling ±180° longitude is ~tens of km apart and must
    survive the grid prefilter (cells −180 and 179 are neighbors)."""
    from etl_manager_spark.operators.spatial import within_distance_join

    left = spark.createDataFrame(
        [(1, 4.2, 179.74)], "lid long, a_lat double, a_lon double"
    )
    right = spark.createDataFrame(
        [(10, 4.14, -179.94)], "rid long, b_lat double, b_lon double"
    )
    rows = within_distance_join(
        left,
        right,
        max_km=50,
        left_cols=("a_lat", "a_lon"),
        right_cols=("b_lat", "b_lon"),
    ).collect()
    assert [(r.lid, r.rid) for r in rows] == [(1, 10)]
    assert abs(rows[0].distance_km - 36.1099) < 0.01


def test_within_distance_join_polar_completeness(spark):
    """Past ~60° a fixed 3×3 neighborhood silently drops true pairs
    (1° of longitude narrows below the radius); the latitude-adaptive
    lon ring must return exactly the brute-force pair set at every
    latitude band, including the full-ring polar case — with no
    duplicate pairs from wrapped-cell collisions."""
    import itertools
    import math

    from etl_manager_spark.operators.spatial import (
        haversine_km,
        within_distance_join,
    )

    # pairs per band: equator, the old 60° cliff, high-lat, near-pole
    # (where ANY longitude can be within 50 km), plus antimeridian wrap
    lpts = [
        (1, 0.2, 10.0), (2, 60.5, 10.0), (3, 75.0, 10.0),
        (4, 89.8, 10.0), (5, 0.1, 179.9), (6, 66.0, -30.0),
    ]
    rpts = [
        (10, 0.3, 10.3), (11, 60.6, 10.9), (12, 75.1, 11.5),
        (13, 89.75, 170.0), (14, 0.15, -179.95), (15, 66.2, -29.0),
        (16, 75.0, 60.0),  # far in lon at high lat: must NOT match
    ]
    left = spark.createDataFrame(lpts, "lid long, a_lat double, a_lon double")
    right = spark.createDataFrame(rpts, "rid long, b_lat double, b_lon double")
    got = sorted(
        (r["lid"], r["rid"])
        for r in within_distance_join(
            left, right, max_km=50,
            left_cols=("a_lat", "a_lon"), right_cols=("b_lat", "b_lon"),
        ).collect()
    )

    def hav(a, b):
        (_, la1, lo1), (_, la2, lo2) = a, b
        p1, p2 = math.radians(la1), math.radians(la2)
        dp, dl = p2 - p1, math.radians(lo2 - lo1)
        x = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
        return 2 * 6371.0 * math.asin(math.sqrt(x))

    want = sorted(
        (a[0], b[0])
        for a, b in itertools.product(lpts, rpts)
        if hav(a, b) <= 50
    )
    assert got == want
    assert len(got) == len(set(got))  # no wrap-duplicate pairs
    assert (4, 13) in got  # near-pole pair 160 degrees of longitude apart


# --------------------------------------------------------------------- #
# k-core (operators/graph.py: kcore_subgraph)


def test_kcore_chain_peels_clique_survives(spark):
    """A 4-chain has no 2-core; a triangle IS its own 2-core; a chain
    dangling off a clique peels back exactly to the clique."""
    from etl_manager_spark.operators.graph import kcore_subgraph

    # chain 1-2-3-4 + triangle 10-11-12 + tail 12-13-14
    edges = [
        (1, 2), (2, 3), (3, 4),
        (10, 11), (11, 12), (10, 12),
        (12, 13), (13, 14),
    ]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    core = kcore_subgraph(pairs, k=2)
    got = sorted(tuple(r) for r in core.collect())
    assert got == [(10, 11), (10, 12), (11, 12)]


def test_kcore_raises_when_unroll_budget_too_small(spark):
    """A long chain cascades one removal per round — max_rounds=1 must
    raise rather than silently return a superset of the core."""
    import pytest

    from etl_manager_spark.operators.graph import kcore_subgraph

    chain = [(i, i + 1) for i in range(6)]
    pairs = spark.createDataFrame(chain, "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        kcore_subgraph(pairs, k=2, max_rounds=1)


def test_kcore_3core_of_k4_minus_edge(spark):
    """K4 is a 3-core; remove one edge and the 3-core vanishes (every
    node drops below degree 3 after the first peel cascades)."""
    from etl_manager_spark.operators.graph import kcore_subgraph

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    pairs = spark.createDataFrame(k4, "id_a long, id_b long")
    assert kcore_subgraph(pairs, k=3).count() == 6
    pairs_minus = spark.createDataFrame(k4[:-1], "id_a long, id_b long")
    assert kcore_subgraph(pairs_minus, k=3).count() == 0


def test_dupspan_island_merge_handcrafted(spark, tmp_path):
    """Span geometry on a corpus built by hand: touching shingles merge
    into one span, a >3 position gap splits spans, unique docs report
    zeros, and covered_frac is exact."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_manager_spark.workloads.hygiene import dupspan_coverage_documents

    texts = {
        1: "a b c d e f",              # one dup trigram at pos 0
        2: "a b c x y z",              # fully covered via chained overlaps
        3: "q r s t u v w",            # nothing shared
        4: "x y z a b c x y z",        # fully covered, one island
        5: "a b c m1 m2 m3 m4 a b c",  # two disjoint spans (gap > 3)
    }
    tbl = pa.table(
        {
            "doc_id": pa.array(list(texts), type=pa.int64()),
            "text": pa.array(list(texts.values())),
            "lang": pa.array(["en"] * 5),
            "source": pa.array(["t"] * 5),
            "n_chars": pa.array([len(t) for t in texts.values()], type=pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: r.asDict()
        for r in dupspan_coverage_documents(spark, str(tmp_path)).collect()
    }
    assert got[3] == dict(doc_id=3, n_dup_positions=0, n_spans=0,
                          max_span_tokens=0, covered_tokens=0,
                          total_tokens=7, covered_frac_q=0)
    assert got[1] == dict(doc_id=1, n_dup_positions=1, n_spans=1,
                          max_span_tokens=3, covered_tokens=3,
                          total_tokens=6, covered_frac_q=500000000)
    assert got[2]["covered_tokens"] == 6 and got[2]["n_spans"] == 1
    assert got[2]["covered_frac_q"] == 1000000000
    assert got[4] == dict(doc_id=4, n_dup_positions=5, n_spans=1,
                          max_span_tokens=9, covered_tokens=9,
                          total_tokens=9, covered_frac_q=1000000000)
    assert got[5]["n_spans"] == 2 and got[5]["max_span_tokens"] == 3
    assert got[5]["covered_tokens"] == 6 and got[5]["covered_frac_q"] == 600000000


def test_local_cc_equals_propagation(spark):
    """Driver-side union-find must agree with distributed label
    propagation on random graphs, and must refuse oversized inputs."""
    import random

    import pytest as _pytest

    from etl_manager_spark.operators.dedup import (
        connected_components_local,
        near_dup_clusters,
    )

    for seed in (5, 6):
        rng = random.Random(seed)
        edges = [
            (rng.randrange(60), rng.randrange(60)) for _ in range(80)
        ]
        edges = [(min(a, b), max(a, b)) for a, b in edges if a != b]
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        local = {
            (r.id, r.cluster_id)
            for r in connected_components_local(pairs).collect()
        }
        dist = {
            (r.id, r.cluster_id)
            for r in near_dup_clusters(pairs, algorithm="propagation").collect()
        }
        assert local == dist

    big = spark.createDataFrame(
        [(i, i + 1) for i in range(50)], "id_a long, id_b long"
    )
    with _pytest.raises(ValueError, match="max_edges"):
        connected_components_local(big, max_edges=10)


def test_bpe_merge_pair_ltr_runs_and_ties():
    from etl_manager_spark.operators.bpe import learn_merges, merge_pair_ltr

    # left-to-right non-overlap in same-symbol runs
    assert merge_pair_ltr(list("aaa"), "a", "a") == ["aa", "a"]
    assert merge_pair_ltr(list("aaaa"), "a", "a") == ["aa", "aa"]
    assert merge_pair_ltr(list("abab"), "a", "b") == ["ab", "ab"]
    assert merge_pair_ltr(list("abb"), "a", "b") == ["ab", "b"]
    # merged symbols are eligible in later rounds, not the same round
    assert merge_pair_ltr(["ab", "c", "ab"], "ab", "c") == ["abc", "ab"]

    # deterministic tie-break: count desc, then pair asc
    merges, words = learn_merges([("ba", 2), ("ab", 2)], num_merges=1)
    assert merges == [(1, "a", "b", 2)]
    assert words["ab"] == ["ab"] and words["ba"] == ["b", "a"]

    # multiplicity counting: 'aaa' contributes (a,a) twice per occurrence
    merges, _ = learn_merges([("aaa", 1), ("bc", 1)], num_merges=1)
    assert merges[0][1:] == ("a", "a", 2)

    # fewer pairs than rounds -> stops early
    merges, _ = learn_merges([("ab", 1)], num_merges=5)
    assert [m[0] for m in merges] == [1, 2][: len(merges)]
    assert merges[0][1:3] == ("a", "b")


def test_bpe_encode_symbol_counts_oov_fallback(spark):
    from etl_manager_spark.operators.bpe import encode_symbol_counts

    docs = spark.createDataFrame(
        [(1, "Hello hello WORLD unknownword"), (2, "a xy")],
        "doc_id long, text string",
    )
    # dict: 'hello' encodes to 3 symbols, 'xy' to 1; others fall back to
    # char count ('world'→5, 'unknownword'→11, 'a'→1)
    out = {
        r["doc_id"]: (r["n_tokens"], r["n_bpe_syms"])
        for r in encode_symbol_counts(
            docs, {"hello": ["he", "ll", "o"], "xy": ["xy"]}
        ).collect()
    }
    assert out[1] == (4, 3 + 3 + 5 + 11)
    assert out[2] == (2, 1 + 1)


def test_kcenter_greedy_picks_spread_points(spark, sf_dir):
    # hand-crafted: seed=min id at origin; farthest point then alternates
    from etl_manager_spark.workloads.curation import kcenter_coreset_embeddings
    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile, os

    pts = {
        0: [0.0] * 64,
        1: [10.0] + [0.0] * 63,          # farthest from origin -> pick 2nd
        2: [0.0, 8.0] + [0.0] * 62,      # farthest from {0,1} -> pick 3rd
        3: [1.0] + [0.0] * 63,           # near origin, picked late
        4: [9.0] + [0.0] * 63,           # near point 1
        5: [0.0, 7.5] + [0.0] * 62,      # near point 2
        6: [5.0, 4.0] + [0.0] * 62,
        7: [2.0, 2.0] + [0.0] * 62,
        8: [0.5, 0.5] + [0.0] * 62,
        9: [4.0, 4.0] + [0.0] * 62,
    }
    with tempfile.TemporaryDirectory() as td:
        tbl = pa.table(
            {
                "vec_id": pa.array(list(pts), pa.int64()),
                "embedding": pa.array(
                    [pa.array(v, pa.float32()) for v in pts.values()],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([0] * len(pts), pa.int32()),
            }
        )
        pq.write_table(tbl, os.path.join(td, "embeddings.parquet"))
        rows = kcenter_coreset_embeddings(spark, td).collect()
    order = [r["vec_id"] for r in sorted(rows, key=lambda r: r["sel_rank"])]
    assert order[0] == 0            # deterministic seed = min vec_id
    assert order[1] == 1            # farthest point
    assert order[2] == 2            # farthest from the selected pair
    assert rows[0]["dmin_q"] == -1  # seed sentinel
    # every selected point is distinct and dmin is non-increasing after r=2
    assert len(set(order)) == len(order)
    dmins = [r["dmin_q"] for r in sorted(rows, key=lambda r: r["sel_rank"])][1:]
    assert all(a >= b for a, b in zip(dmins, dmins[1:]))


def test_merge_upsert_matched_uniqueness_contract(spark):
    """SQL MERGE (and Delta) raise 'multiple source rows matched' only
    when several source rows match the SAME target row; unmatched
    duplicate source keys legally insert (WHEN NOT MATCHED). The assert
    lives in the join condition, so it cannot be column-pruned away —
    count()-only consumers raise too."""
    from etl_manager_spark.operators.upsert import merge_upsert

    tgt = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    dup = spark.createDataFrame([(2, "B"), (2, "B2")], "k long, v string")
    with pytest.raises(Exception, match="multiple source rows matched"):
        merge_upsert(tgt, dup, ["k"]).collect()
    # count() prunes every output column — the check must still fire
    with pytest.raises(Exception, match="multiple source rows matched"):
        merge_upsert(tgt, dup, ["k"]).count()
    # duplicate source keys matching NO target row insert, like MERGE
    udup = spark.createDataFrame([(9, "X"), (9, "Y")], "k long, v string")
    out = sorted((r.k, r.v) for r in merge_upsert(tgt, udup, ["k"]).collect())
    assert out == [(1, "a"), (2, "b"), (9, "X"), (9, "Y")]
    # null keys are null-safe: two null-key source rows matching a
    # null-key target row are duplicates
    tnull = spark.createDataFrame([(None, "t")], "k long, v string")
    ndup = spark.createDataFrame([(None, "X"), (None, "Y")], "k long, v string")
    with pytest.raises(Exception, match="multiple source rows matched"):
        merge_upsert(tnull, ndup, ["k"]).count()
    # pre-deduplicated callers skip the uniqueness window
    assert merge_upsert(tgt, dup, ["k"], assume_unique_source=True).count() == 3
    # reserved internal names are refused up front
    bad = spark.createDataFrame([(1, "a", 2)], "k long, v string, _merge_key_n int")
    with pytest.raises(ValueError, match="_merge_key_n"):
        merge_upsert(bad, bad, ["k"])
    # unique keys still merge
    src = spark.createDataFrame([(2, "B"), (3, "C")], "k long, v string")
    out = sorted((r.k, r.v) for r in merge_upsert(tgt, src, ["k"]).collect())
    assert out == [(1, "a"), (2, "B"), (3, "C")]


def test_bloom_join_widens_mismatched_integral_keys(spark):
    """xxhash64 hashes INT and BIGINT through different byte paths: equal
    values hash differently, so an unnormalized probe silently DROPS true
    matches. Integral key pairs are widened to bigint before hashing;
    non-widenable pairs are refused rather than guessed."""
    from etl_manager_spark.operators.bloomjoin import bloom_prefiltered_join

    fact = spark.createDataFrame([(5, "a"), (6, "b")], "fk long, x string")
    dim = spark.createDataFrame([(5,)], "dk int")
    got = bloom_prefiltered_join(fact, dim, "fk", "dk").count()
    want = fact.join(dim, fact.fk == dim.dk, "left_semi").count()
    assert got == want == 1
    sdim = spark.createDataFrame([("5",)], "dk string")
    with pytest.raises(ValueError, match="hash domain"):
        bloom_prefiltered_join(fact, sdim, "fk", "dk")


def test_rank_bounded_desc_edge_domains(spark):
    """Desc keys: LONG_MIN must not overflow under ANSI (bitwise-NOT
    encode), NaN ranks FIRST on desc double keys (Spark orders NaN above
    every number), and non-orderable payload columns (maps) pass through
    because the sort comparator reads only the key fields."""
    from etl_manager_spark.operators.topk import rank_bounded

    df = spark.createDataFrame(
        [(-(2**63), "min"), (5, "five"), (None, "null")], "k long, tag string"
    )
    got = sorted(
        (r.rnk, r.tag) for r in rank_bounded(df.limit(10), [("k", "desc")]).collect()
    )
    assert got == [(1, "five"), (2, "min"), (3, "null")]  # nulls last
    dfn = spark.createDataFrame(
        [(float("nan"), "nan"), (9.0, "nine"), (1.0, "one")], "k double, tag string"
    )
    gotn = sorted(
        (r.rnk, r.tag) for r in rank_bounded(dfn.limit(10), [("k", "desc")]).collect()
    )
    assert gotn == [(1, "nan"), (2, "nine"), (3, "one")]
    dfm = spark.createDataFrame(
        [(2, {"a": "b"}), (1, {"c": "d"})], "k long, m map<string,string>"
    )
    gotm = sorted(
        (r.rnk, r.k) for r in rank_bounded(dfm.limit(10), [("k", "asc")]).collect()
    )
    assert gotm == [(1, 1), (2, 2)]
    with pytest.raises(ValueError, match="desc key"):
        rank_bounded(
            spark.createDataFrame([("x",)], "k string"), [("k", "desc")]
        )


def test_partial_topk_prefilter_survives_colliding_columns(spark):
    from etl_manager_spark.operators.topk import partial_topk_prefilter

    df = spark.createDataFrame(
        [(3, 1, "g"), (1, 1, "g")], "_pid long, _lr long, g string"
    ).coalesce(1)
    out = partial_topk_prefilter(df, ["g"], "_pid", 1)
    assert set(out.columns) == {"_pid", "_lr", "g"}
    # user column ranked (not the overwritten partition id) and intact
    assert [r._pid for r in out.collect()] == [3]


def test_similarity_api_contracts(spark):
    """Round-8 review fixes: exclude_self is optional (independent id
    spaces), Arrow-kernel variants refuse non-integral ids with a clear
    error instead of ANSI cast failures, and NULL/ragged embeddings are
    skipped like the exact paths skip them (NULL sims) rather than
    killing the stage in np.stack."""
    from etl_manager_spark.operators.similarity import (
        cosine_near_dup_pairs,
        cosine_near_dup_pairs_blocked,
        cosine_near_dup_pairs_lsh,
        cosine_topk,
        cosine_topk_lsh,
    )

    q = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id long, embedding array<double>")
    c = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    got = [
        (r.rank, r.neighbor_id)
        for r in cosine_topk(q, c, k=2, exclude_self=False).orderBy("rank").collect()
    ]
    assert got == [(1, 1), (2, 2)]  # identical corpus vector not dropped
    qs = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [1.0, 0.0])], "vec_id string, embedding array<double>"
    )
    assert cosine_near_dup_pairs(qs, 0.9).count() == 1  # exact path: any id type
    with pytest.raises(ValueError, match="integral id"):
        cosine_near_dup_pairs_blocked(qs, 0.9)
    with pytest.raises(ValueError, match="integral id"):
        cosine_topk_lsh(qs, qs, dim=2)
    bad = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, None), (4, [1.0, 0.0, 9.9])],
        "vec_id long, embedding array<double>",
    )
    assert cosine_near_dup_pairs(bad, 0.9).count() == 1
    assert cosine_near_dup_pairs_blocked(bad, 0.9).count() == 1
    assert cosine_near_dup_pairs_lsh(bad, 0.9, dim=2).count() == 1


def test_dedup_api_contracts(spark):
    """Round-8 review fixes: NULL-text pairs score jaccard 0.0 under any
    deployment (never 1.0 via legacy -1/-1), NaN scores never win the
    cluster representative, NULL edge endpoints don't crash the local
    union-find, exact_dedup refuses reserved/overlapping names, and the
    incremental verify step semi-joins the corpus to candidates."""
    from etl_manager_spark.operators.dedup import (
        cluster_representatives,
        connected_components_local,
        exact_dedup,
        incremental_minhash_dedup,
        pairwise_jaccard,
    )

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, None), (3, None)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    pj = {
        (r.id_a, r.id_b): r.jaccard
        for r in pairwise_jaccard(docs, pairs, "doc_id", "text").collect()
    }
    assert pj == {(1, 2): 0.0, (2, 3): 0.0}
    clusters = spark.createDataFrame([(1, 10), (2, 10), (3, 10)], "id long, cluster_id long")
    scores = spark.createDataFrame(
        [(1, float("nan")), (2, 0.9), (3, 0.1)], "id long, score double"
    )
    cr = {r.id: r.keep for r in cluster_representatives(clusters, scores).collect()}
    assert cr == {1: False, 2: True, 3: False}
    p2 = spark.createDataFrame([(None, 5), (5, 6)], "a long, b long")
    cc = sorted((r.id, r.cluster_id) for r in connected_components_local(p2, "a", "b").collect())
    assert cc == [(5, 5), (6, 5)]
    with pytest.raises(ValueError, match="disjoint"):
        exact_dedup(docs, ["text", "doc_id"], "doc_id")
    corpus = spark.createDataFrame(
        [(i, f"common tokens alpha beta {i}") for i in range(50)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1000, "common tokens alpha beta 7")], "doc_id long, text string"
    )
    out = incremental_minhash_dedup(new, corpus)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan  # verify step reads candidate corpus rows only
    assert out.count() >= 1


def test_multimodal_null_content_stays_null(spark):
    """NULL payloads: NULL feature/phash/resized frame (never a
    fabricated zero vector or phash 0 that joins every missing row into
    one dedup clique), and a user-supplied codec is never invoked on
    None."""
    from pyspark.sql import types as T

    from etl_manager_spark.operators import multimodal as M

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
            T.StructField(
                "meta",
                T.StructType(
                    [
                        T.StructField("mime", T.StringType()),
                        T.StructField("duration_ms", T.IntegerType()),
                    ]
                ),
            ),
        ]
    )
    df = spark.createDataFrame(
        [(1, b"abc", ("image/x", None)), (2, None, ("video/x", 2000))], schema
    )
    feats = {r.media_id: r.feature for r in M.extract_features(df).collect()}
    assert feats[2] is None and feats[1] is not None
    ph = {r.media_id: r.phash for r in M.perceptual_hash(df).collect()}
    assert ph[2] is None and ph[1] is not None

    def crashy(b):
        raise RuntimeError("decoder called on None")

    got = M.extract_features(
        df.filter("media_id = 2"), decode_fn=crashy
    ).collect()
    assert got[0].feature is None  # codec never saw the NULL payload


def test_asof_null_semantics_and_reserved_names(spark):
    """SQL ASOF / merge_asof semantics on NULLs: a NULL-ts right row
    satisfies no predicate (sorted first, it used to be carried as a
    backward 'match'), a NULL-ts or NULL-key left row matches nothing,
    and NULL keys never match each other. Internal working names are
    refused."""
    from pyspark.sql import functions as F

    from etl_manager_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10), (1, None), (None, 10)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, None, "nullts"), (1, 5, "ok"), (None, 3, "nullkey")],
        "k long, ts long, v string",
    )
    res = {
        (r.k, r.ts): r.v_asof
        for r in asof_join(left, right, "k", "ts", "ts", ["v"]).collect()
    }
    assert res == {(1, 10): "ok", (1, None): None, (None, 10): None}
    with pytest.raises(ValueError, match="_side"):
        asof_join(left.withColumn("_side", F.lit(9)), right, "k", "ts", "ts", ["v"])


def test_compact_crash_recovery_and_rowcount_gate(spark, tmp_path):
    """A crash between compact's two swap moves leaves the only copy at
    ._compact_old; the next run must promote the complete rewrite (or
    restore the original), never nest the live table inside a stale _old
    and rmtree both. The rewrite is also row-count-verified BEFORE the
    original is replaced."""
    import shutil

    from etl_manager_spark.operators.layout import compact

    p = str(tmp_path / "t")
    spark.range(100).repartition(8).write.parquet(p)
    compact(spark, p, target_files=2)
    shutil.copytree(p, p + "._compact_tmp")
    shutil.move(p, p + "._compact_old")
    stats = compact(spark, p, target_files=2)
    assert stats["rows"] == 100


def test_zorder_empty_frame_and_reserved_name(spark, tmp_path):
    from pyspark.sql import functions as F

    from etl_manager_spark.operators.layout import zorder_write

    zp = str(tmp_path / "z")
    zorder_write(
        spark.range(0).selectExpr("cast(id as double) x", "cast(id as double) y"),
        zp, ["x", "y"], 2,
    )
    assert spark.read.parquet(zp).count() == 0
    with pytest.raises(ValueError, match="_z"):
        zorder_write(
            spark.range(1).selectExpr("cast(id as double) x", "id as _z"),
            zp, ["x"], 2,
        )


def test_two_phase_agg_count_col_skips_nulls(spark):
    from etl_manager_spark.operators.skew import two_phase_agg

    d = spark.createDataFrame([("k1", None), ("k1", 5)], "k string, x long")
    r = two_phase_agg(d, ["k"], {"n": "count(x)", "nn": "count(*)"}).collect()[0]
    assert (r.n, r.nn) == (1, 2)
    with pytest.raises(ValueError, match="_salt"):
        two_phase_agg(d.withColumnRenamed("x", "_salt"), ["k"], {"n": "count(*)"})


def test_timeseries_nan_and_ts_eq_id(spark):
    """NaN/Inf values are skipped like NULLs (math.floor(nan) used to
    kill the fold task), and ts_col == id_col (a daily series ordered
    and identified by its day) works in every fold sibling."""
    from etl_manager_spark.operators.timeseries import ewma_per_key

    d = spark.createDataFrame(
        [("k", 1, 1.0), ("k", 2, float("nan")), ("k", 3, 2.0)],
        "g string, day long, value double",
    )
    r = sorted(
        (x.day, x.ewma_q)
        for x in ewma_per_key(
            d, key_col="g", ts_col="day", id_col="day", value_col="value"
        ).collect()
    )
    assert r == [(1, 1000000000), (3, 1500000000)]


def test_funnel_null_ts_does_not_poison_walk(spark):
    """A NULL-ts step-1 event used to sort first, advance with last=NULL,
    and freeze the walk (ts > NULL is NULL forever) — silently
    undercounting every later step vs funnel_step_arrivals."""
    from etl_manager_spark.operators.behavior import funnel

    ev = spark.createDataFrame(
        [(1, None, "signup"), (1, 10, "signup"), (1, 20, "purchase")],
        "user_id long, ts long, event_type string",
    )
    fr = {r.step_name: r.n_users for r in funnel(ev, ["signup", "purchase"]).collect()}
    assert fr == {"signup": 1, "purchase": 1}


def test_linear_quality_and_normalize_cross_engine(spark):
    """Token-less docs score NULL in both renderings (0/0 threw under
    ANSI), and the normalize whitespace class (explicit, incl. U+000B)
    produces the identical canonical string in Spark and DuckDB —
    Java's \\s matches vertical tab, RE2's does not."""
    import duckdb
    from pyspark.sql import functions as F

    from etl_manager_spark.operators.curation import (
        linear_quality_z,
        normalize_sql,
        normalize_text,
    )

    docs = spark.createDataFrame(
        [(1, ""), (2, "the cat and the dog")], "doc_id long, text string"
    )
    z = {
        r.doc_id: r.z
        for r in docs.select("doc_id", linear_quality_z("text").alias("z")).collect()
    }
    assert z[1] is None and z[2] is not None
    s = "a\x0bb  c"
    spark_norm = (
        docs.limit(1).select(normalize_text(F.lit(s)).alias("n")).collect()[0].n
    )
    duck_norm = duckdb.connect().execute(
        f"SELECT {normalize_sql('?')}", [s]
    ).fetchone()[0]
    assert spark_norm == duck_norm == "a b c"


def test_cap_per_group_and_heavy_hitters_guards(spark):
    from pyspark.sql import functions as F

    from etl_manager_spark.operators.curation import cap_per_group
    from etl_manager_spark.operators.frequency import heavy_hitters_two_pass

    df = spark.createDataFrame([(1, "a", 5)], "rank long, g string, v long")
    with pytest.raises(ValueError, match="rank"):
        cap_per_group(df, "g", [F.col("v").desc()], 1)
    df2 = spark.createDataFrame([(1,)], "cnt long")
    with pytest.raises(ValueError, match="cnt"):
        heavy_hitters_two_pass(df2, "cnt")


def test_iterative_loops_observed_counts_no_extra_jobs_and_empty_safe(spark):
    """Round-11 contract: the iterative loops' convergence probes ride
    their checkpoint jobs as observed metrics (DataFrame.observe) instead
    of a separate .count() job per round. Pin (a) correctness on empty
    and degenerate inputs — the new failure mode would be Observation.get
    hanging on a zero-row materialization — and (b) labels still exact
    on a multi-component graph. (The job economy itself — ~8 fewer jobs
    per graph query — is pinned by the committed job-profile evidence,
    not asserted here: AQE's jobs-per-materialization varies across
    Spark versions and configs, so an absolute ceiling is brittle.)"""
    from etl_manager_spark.operators.dedup import (
        connected_components_star,
        near_dup_clusters,
    )
    from etl_manager_spark.operators.graph import bfs_distances, kcore_subgraph

    # empty inputs: every loop terminates immediately (observe returns 0)
    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components_star(empty).count() == 0
    assert kcore_subgraph(empty, k=2).count() == 0
    assert near_dup_clusters(empty).count() == 0

    # single-edge BFS: one layer then an empty frontier (observed 0 breaks)
    one = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    got = {r.id: r.dist for r in bfs_distances(one, source_id=1).collect()}
    assert got == {1: 0, 2: 1}

    # exact labels on a known 2-component graph (chain + triangle path)
    edges = [(i, i + 1) for i in range(8)] + [(100, 101), (101, 102)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r.id: r.cluster_id
        for r in connected_components_star(pairs, max_iterations=12).collect()
    }
    assert got == {**{i: 0 for i in range(9)}, 100: 100, 101: 100, 102: 100}
