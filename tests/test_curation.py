"""Curation-operator behavior: k-fold assignment invariants, two-phase
domain cap exactness, normalization idempotence, winsorize clipping, and
the plan shapes that keep these scan-local."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_manager_spark.operators import curation as C
from etl_manager_spark.plans import plan_report
from etl_manager_spark.workloads.tables import load_tables


def test_kfold_disjoint_exhaustive_uniformish(spark, sf_dir):
    docs = load_tables(spark, sf_dir)["documents"]
    total = docs.count()
    counts = {
        r["fold"]: r["n"]
        for r in docs.select(C.kfold_column("doc_id", 5).alias("fold"))
        .groupBy("fold")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(counts) == {0, 1, 2, 3, 4}, counts
    assert sum(counts.values()) == total
    # md5 draw is uniform; with n=50 docs a 3x imbalance would flag a
    # threshold bug rather than chance
    assert max(counts.values()) <= 3 * max(1, total // 5), counts


def test_kfold_stable_under_repartition(spark, sf_dir):
    docs = load_tables(spark, sf_dir)["documents"]
    a = {
        (r["doc_id"], r["fold"])
        for r in docs.select("doc_id", C.kfold_column("doc_id", 5).alias("fold")).collect()
    }
    b = {
        (r["doc_id"], r["fold"])
        for r in docs.repartition(7)
        .select("doc_id", C.kfold_column("doc_id", 5).alias("fold"))
        .collect()
    }
    assert a == b


def test_cap_two_phase_equals_single_phase(spark, sf_dir):
    docs = load_tables(spark, sf_dir)["documents"]
    order = [F.col("n_chars").desc(), F.col("doc_id").asc()]

    def rows(df):
        return sorted(
            (r["source"], r["rank"], r["doc_id"]) for r in df.collect()
        )

    two = C.cap_per_group(docs, "source", order, k=3, two_phase=True)
    one = C.cap_per_group(docs, "source", order, k=3, two_phase=False)
    assert rows(two) == rows(one)
    # and stable under a different physical partitioning of the input
    two_rep = C.cap_per_group(docs.repartition(5), "source", order, k=3)
    assert rows(two_rep) == rows(one)


def test_normalize_text_idempotent_and_canonical(spark):
    df = spark.createDataFrame(
        [("  Hello \t WORLD\n\nfoo  ",), ("already normal",)], ["t"]
    )
    once = [r[0] for r in df.select(C.normalize_text("t")).collect()]
    twice = [
        r[0]
        for r in df.select(C.normalize_text(C.normalize_text("t"))).collect()
    ]
    assert once == ["hello world foo", "already normal"]
    assert once == twice


def test_quality_score_is_scan_local(spark, sf_dir):
    docs = load_tables(spark, sf_dir)["documents"]
    scored = docs.select("doc_id", C.linear_quality_z("text").alias("z"))
    r = plan_report(scored)
    assert r.shuffle_exchanges == 0, r.text
    assert r.scans_only_columns({"doc_id", "text"}), r.read_schemas


def test_winsorize_emits_only_clipped_rows(spark, sf_dir_oracle):
    from etl_manager_spark.workloads import load_registry

    out = load_registry()["winsorize_events_value"].fn(spark, sf_dir_oracle)
    rows = out.collect()
    assert rows, "expected some clipped tail rows"
    assert all(r["winsorized"] != r["value"] for r in rows)


def test_asof_tolerance_masks_stale_matches(spark):
    from etl_manager_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-10 00:00:00"), (1, "2024-03-01 00:00:00")],
        "k long, ts string",
    ).select("k", F.col("ts").cast("timestamp_ntz").alias("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-05 00:00:00", 100)], "k long, rts string, payload long"
    ).select(
        "k", F.col("rts").cast("timestamp_ntz").alias("rts"), "payload"
    )
    out = {
        r["ts"].month: r["payload_asof"]
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            right_payload=["payload"], tolerance="30 DAYS",
        ).collect()
    }
    # 5 days stale -> kept; 56 days stale -> masked to NULL
    assert out[1] == 100 and out[3] is None


def test_temperature_resample_budgets_nest(spark, sf_dir):
    """A smaller budget's kept set must be a prefix (per stratum) of a
    larger budget's — the property that makes resampled corpora
    comparable across budget choices."""
    from etl_manager_spark.operators.sampling import temperature_resample

    docs = load_tables(spark, sf_dir)["documents"]
    small = {
        (r["source"], r["doc_id"])
        for r in temperature_resample(docs, "source", "doc_id", 40).collect()
    }
    large = {
        (r["source"], r["doc_id"])
        for r in temperature_resample(docs, "source", "doc_id", 120).collect()
    }
    assert small <= large
    # quota realization never exceeds the budget
    assert len(large) <= 120


def test_temperature_resample_upweights_rare_strata(spark):
    """With sqrt shares, a stratum 16x larger gets only ~4x the quota."""
    from etl_manager_spark.operators.sampling import temperature_resample

    rows = [("big", i) for i in range(1600)] + [("small", 10_000 + i) for i in range(100)]
    df = spark.createDataFrame(rows, "src string, id long")
    kept = temperature_resample(df, "src", "id", 100).collect()
    by = {}
    for r in kept:
        by[r["src"]] = by.get(r["src"], 0) + 1
    # raw shares would be 94/6; sqrt shares are 80/20
    assert by["small"] >= 15, by
    assert by["big"] <= 85, by


def test_winsorize_bounds_match_numpy_order_stats(spark):
    import numpy as np

    vals = [float(v) for v in np.random.RandomState(7).uniform(0, 100, 400)]
    df = spark.createDataFrame(
        [(i, "t", v) for i, v in enumerate(vals)],
        "event_id long, event_type string, value double",
    )
    df.createOrReplaceTempView("_wins_events")
    from pyspark.sql import Window
    from pyspark.sql import functions as FF

    wo = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    r = df.select(
        "value",
        FF.row_number().over(wo).alias("rn"),
        FF.count(FF.lit(1)).over(wn).alias("n"),
    )
    bounds = r.groupBy().agg(
        FF.min(FF.when(FF.col("rn") == FF.ceil(FF.lit(0.05) * FF.col("n")), FF.col("value"))).alias("lo"),
        FF.min(FF.when(FF.col("rn") == FF.ceil(FF.lit(0.95) * FF.col("n")), FF.col("value"))).alias("hi"),
    ).collect()[0]
    s = sorted(vals)
    import math

    assert bounds["lo"] == s[math.ceil(0.05 * 400) - 1]
    assert bounds["hi"] == s[math.ceil(0.95 * 400) - 1]


def test_twa_matches_pandas_replay(spark, sf_dir_oracle):
    """The exact-integer TWA must equal a float pandas replay to ~1e-9
    (the quantization grid), per (user, day)."""
    import pandas as pd

    from etl_manager_spark.workloads import load_registry

    out = load_registry()["twa_user_value_daily"].fn(spark, sf_dir_oracle)
    got = {(r["user_id"], r["day"]): r["twa_q"] for r in out.collect()}

    ev = pd.read_parquet(f"{sf_dir_oracle}/events.parquet")
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    ev["day"] = ev["ts"].dt.floor("D")
    ev["cents"] = (ev["value"] * 100.0 + 0.5).apply(int)
    check = 0
    for (u, day), g in ev.groupby(["user_id", "day"]):
        dt = (g["ts"].shift(-1) - g["ts"]).dt.total_seconds() * 1e6
        mask = dt.notna() & (dt > 0)
        if not mask.any():
            continue
        num = (g["cents"][mask] * dt[mask]).sum()
        den = dt[mask].sum()
        expected = num / den / 100.0
        q = got[(u, day.date())]
        assert abs(q / 1e9 - expected) < 2e-9, (u, day, q, expected)
        check += 1
    assert check > 50  # replay actually covered groups


def test_synthlog_stream_reader_incremental_offsets():
    """Micro-batch offsets advance by `batch` rows and readBetweenOffsets
    replays exactly the committed range — the exactly-once contract."""
    from etl_manager_spark.sources.pysource import SynthLogStreamReader, _row

    r = SynthLogStreamReader({"rows": "50", "batch": "20"})
    off0 = r.initialOffset()
    rows1, off1 = r.read(off0)
    assert off1 == {"i": 20} and len(list(rows1)) == 20
    rows2, off2 = r.read(off1)
    assert off2 == {"i": 40} and len(list(rows2)) == 20
    rows3, off3 = r.read(off2)
    assert off3 == {"i": 50} and len(list(rows3)) == 10
    replay = list(r.readBetweenOffsets({"i": 20}, {"i": 40}))
    assert replay == [_row(i) for i in range(20, 40)]


def test_asof_forward_direction_and_ties(spark):
    """Forward as-of: each left row takes the EARLIEST right row at or
    after its timestamp; an exactly concurrent right row matches; rows
    past the last right row get NULL; forward tolerance masks matches
    too far in the FUTURE."""
    from etl_manager_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00"),  # strictly before both rights
            (1, "2024-02-01 00:00:00"),  # exactly concurrent with a right
            (1, "2024-06-01 00:00:00"),  # after the last right -> NULL
        ],
        "k long, ts string",
    ).select("k", F.col("ts").cast("timestamp_ntz").alias("ts"))
    right = spark.createDataFrame(
        [(1, "2024-02-01 00:00:00", 10), (1, "2024-04-01 00:00:00", 20)],
        "k long, rts string, payload long",
    ).select("k", F.col("rts").cast("timestamp_ntz").alias("rts"), "payload")
    out = {
        r["ts"].month: r["payload_asof"]
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            right_payload=["payload"], direction="forward",
        ).collect()
    }
    assert out == {1: 10, 2: 10, 6: None}
    # 31-day tolerance: the January row's nearest-next right is 31 days
    # out (kept); nothing within reach of June; February is concurrent
    masked = {
        r["ts"].month: r["payload_asof"]
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            right_payload=["payload"], direction="forward",
            tolerance="31 DAYS",
        ).collect()
    }
    assert masked == {1: 10, 2: 10, 6: None}
    tight = {
        r["ts"].month: r["payload_asof"]
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            right_payload=["payload"], direction="forward",
            tolerance="7 DAYS",
        ).collect()
    }
    assert tight == {1: None, 2: 10, 6: None}


def test_asof_property_vs_pandas_merge_asof(spark):
    """Property test: asof_join (both directions, with/without tolerance)
    equals pandas.merge_asof on random keyed series. Right timestamps are
    unique per key (both implementations leave equal-ts right-row choice
    unspecified); left timestamps may tie with right ones — exact-match
    visibility is part of the contract."""
    import datetime

    import pandas as pd
    from hypothesis import given, settings, strategies as st

    from etl_manager_spark.operators.asof import asof_join

    epoch = datetime.datetime(2024, 1, 1)

    def ts(h):
        return epoch + datetime.timedelta(hours=h)

    lefts = st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 30)), min_size=1, max_size=12
    )
    rights = st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 30)), min_size=1, max_size=8,
        unique_by=lambda r: (r[0], r[1]),
    )

    @settings(max_examples=15, deadline=None)
    @given(ls=lefts, rs=rights)
    def check(ls, rs):
        ldf = spark.createDataFrame(
            [(k, ts(h)) for k, h in ls], "k long, ts timestamp_ntz"
        )
        rdf = spark.createDataFrame(
            [(k, ts(h), k * 1000 + h) for k, h in rs],
            "k long, rts timestamp_ntz, payload long",
        )
        lpd = pd.DataFrame(
            [(k, ts(h)) for k, h in ls], columns=["k", "ts"]
        ).sort_values(["ts", "k"], kind="stable")
        rpd = pd.DataFrame(
            [(k, ts(h), k * 1000 + h) for k, h in rs],
            columns=["k", "rts", "payload"],
        ).sort_values(["rts", "k"], kind="stable")
        for direction, tol in [
            ("backward", None),
            ("forward", None),
            ("backward", "5 HOURS"),
            ("forward", "5 HOURS"),
        ]:
            got = {
                (r["k"], r["ts"]): r["payload_asof"]
                for r in asof_join(
                    ldf, rdf, on="k", left_ts="ts", right_ts="rts",
                    right_payload=["payload"], direction=direction,
                    tolerance=tol,
                ).collect()
            }
            exp_df = pd.merge_asof(
                lpd, rpd, left_on="ts", right_on="rts", by="k",
                direction=direction,
                tolerance=None if tol is None else pd.Timedelta(hours=5),
            )
            exp = {
                (row.k, row.ts.to_pydatetime()): (
                    None if pd.isna(row.payload) else int(row.payload)
                )
                for row in exp_df.itertuples()
            }
            assert got == exp, (direction, tol, got, exp)

    check()


def test_tokens_ignore_boundary_whitespace(spark):
    """'\\n'-bounded text must not yield phantom '' tokens: F.trim strips
    only ASCII space, so the old split-after-trim counted 'hello\\n' as 2
    tokens and fingerprinted trailing-newline docs differently."""
    from etl_manager_spark.operators.text import (
        doc_fingerprint,
        quality_score,
        token_count,
        tokens,
    )

    df = spark.createDataFrame(
        [(1, "hello\n"), (2, "hello"), (3, "\n\n"), (4, "\ta b\n")],
        "id long, text string",
    )
    got = {
        r.id: (r.n, r.toks)
        for r in df.select(
            "id",
            token_count("text").alias("n"),
            tokens("text").alias("toks"),
        ).collect()
    }
    assert got[1] == (1, ["hello"])
    assert got[2] == (1, ["hello"])
    assert got[3] == (0, [])
    assert got[4] == (2, ["a", "b"])
    # whitespace-only text scores 0.0 (not 0.5 via a phantom-token's
    # perfect diversity)
    q = {r.id: r.q for r in df.select("id", quality_score("text").alias("q")).collect()}
    assert q[3] == 0.0
    # trailing-newline twin fingerprints identically to the bare text
    f = {r.id: r.f for r in df.select("id", doc_fingerprint("text").alias("f")).collect()}
    assert f[1] == f[2]


def test_language_id_empty_markers_is_und(spark):
    from etl_manager_spark.operators.text import language_id

    df = spark.createDataFrame([("the cat sat",)], "text string")
    assert df.select(language_id("text", markers={}).alias("l")).collect()[0].l == "und"


def test_gopher_flags_preserve_caller_id_name(spark):
    from etl_manager_spark.operators.text import (
        gopher_quality_flags,
        gopher_quality_flags_vectorized,
    )

    df = spark.createDataFrame(
        [(7, "the cat sat on the mat and it is a fine day for all of us")],
        "page_id long, text string",
    )
    for fn in (gopher_quality_flags, gopher_quality_flags_vectorized):
        out = fn(df, id_col="page_id")
        assert "page_id" in out.columns  # joins back to the source work
        assert out.collect()[0].page_id == 7
