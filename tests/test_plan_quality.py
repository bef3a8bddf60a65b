"""Plan-shape assertions: the properties that make queries survive a 100×
scale-up. These test the PLAN, not the result — regressions here are
performance bugs even when results stay correct."""

import pytest
from pyspark.sql import functions as F

from etl_manager_spark.plans import plan_report
from etl_manager_spark.workloads import load_registry
from etl_manager_spark.workloads.tables import load_tables

REGISTRY = load_registry()


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    def get(name):
        return plan_report(REGISTRY[name].fn(spark, sf_dir))

    return get


def test_q1_filter_pushdown_and_pruning(plans):
    r = plans("q1_pricing_summary")
    # shipdate predicate must reach the parquet scan
    assert r.has_pushed_filters
    assert any("l_shipdate" in pf for pf in r.pushed_filters)
    # only the 7 needed columns are read, not all 11
    assert r.scans_only_columns(
        {
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        }
    ), r.read_schemas


def test_q3_topk_uses_heap_not_full_sort(plans):
    r = plans("q3_shipping_priority")
    assert r.take_ordered, "top-10 should plan TakeOrderedAndProject"
    assert r.has_pushed_filters


def test_q5_dimensions_broadcast(plans):
    r = plans("q5_local_supplier_volume")
    # supplier/nation/region must broadcast — the fact table shuffles only
    # for the customer⋈orders and orders⋈lineitem joins
    assert r.broadcast_joins >= 3, r.text[:2000]
    assert r.cartesian_products == 0


def test_similarity_bruteforce_broadcasts_queries(plans):
    r = plans("similarity_topk_bruteforce")
    # the 5-query side must broadcast; corpus side must NOT shuffle before
    # scoring (BroadcastNestedLoopJoin over the filtered query side)
    assert "BroadcastNestedLoopJoin" in r.text or r.broadcast_joins >= 1


def test_similarity_topk_window_group_limit_below_exchange(spark, sf_dir):
    """The per-query ranking windows key on query_id alone — FEW keys, so
    the shuffle volume contract rests on Spark's InferWindowGroupLimit:
    a Partial WindowGroupLimit must sit BELOW the exchange, bounding each
    mapper's output to k rows per query (verified round 10: a hand-built
    salted two-stage prefilter produced the identical bound plus a
    redundant exchange, so the declared single-window form is the right
    plan). If a Spark upgrade stops inferring the pushed limit, this
    breaks loudly instead of silently shipping |corpus| rows per query
    to |queries| reducers.

    Since round 10 the lsh workload eagerly checkpoints the scorer
    output inside _with_recall (the top-k window then executes at
    build time, invisible to the workload's final explain), so the
    contract is asserted on the SCORER subplans directly — the same
    frames the workloads materialize."""
    from etl_manager_spark.operators import similarity as S
    from etl_manager_spark.workloads.pipeline import _emb_set

    emb = _emb_set(load_tables(spark, sf_dir)["embeddings"])
    queries = emb.filter(F.col("vec_id") < 5)
    scorers = {
        "cosine_topk": S.cosine_topk(queries, emb, k=5),
        "cosine_topk_lsh": S.cosine_topk_lsh(
            queries, emb, dim=64, k=5, num_planes=3, num_tables=16
        ),
    }
    for name, df in scorers.items():
        lines = plan_report(df).text.splitlines()
        wgl = [i for i, x in enumerate(lines) if "WindowGroupLimit" in x]
        exch = [
            i
            for i, x in enumerate(lines)
            if "Exchange" in x and "BroadcastExchange" not in x
        ]
        assert wgl, f"{name}: no WindowGroupLimit in plan"
        # Final(above)/Partial(below) pair straddling a shuffle: some
        # Exchange line sits strictly between two WindowGroupLimit lines
        assert any(
            a < e < b for a, b in zip(wgl, wgl[1:]) for e in exch
        ), f"{name}: no Exchange between WindowGroupLimit pair\n" + "\n".join(
            lines[:40]
        )


def test_scalar_queries_are_codegen_only(plans):
    for name in ("scalar_string_functions", "scalar_math_functions"):
        r = plans(name)
        assert r.codegen_stages >= 1
        assert r.shuffle_exchanges == 0, f"{name} must not shuffle"


def test_exact_dedup_single_shuffle(plans):
    r = plans("dedup_exact_documents")
    assert r.shuffle_exchanges == 1, "exact dedup = exactly one shuffle"


def test_q9_dimensions_broadcast_single_fact_shuffle(plans):
    r = plans("q9_profit_by_nation_year")
    # part/supplier/nation broadcast; only lineitem⋈orders shuffles
    assert r.broadcast_joins >= 3, r.text[:2000]
    assert r.sortmerge_joins <= 1
    assert r.cartesian_products == 0
    # part name filter must push to the parquet scan
    assert any("p_name" in pf for pf in r.pushed_filters), r.pushed_filters


def test_near_dup_exact_single_shuffle(plans):
    r = plans("dedup_embedding_cosine")
    # blocked all-pairs: one shuffle on the block-pair key into the numpy
    # scoring groups — no broadcast, no second exchange
    assert "FlatMapGroupsInPandas" in r.text
    assert r.shuffle_exchanges == 1, r.text[:2000]


def test_q17_window_reuses_join_partitioning(plans):
    r = plans("q17_small_quantity_revenue")
    # window partitions by l_partkey; the join output is already
    # partitioned compatibly — at most the one agg exchange plus one for
    # the window's sort requirement
    assert r.shuffle_exchanges <= 2, r.text[:2000]
    assert r.broadcast_joins >= 1


def test_projection_pruning_on_wide_join(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    df = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "c_name")
    )
    r = plan_report(df)
    assert r.scans_only_columns({"o_orderkey", "o_custkey", "c_custkey", "c_name"}), (
        r.read_schemas
    )


def test_stratified_sample_is_pure_scan_filter(plans):
    r = plans("stratified_sample_documents")
    # the md5-threshold predicate is a per-row filter: no shuffle, and the
    # projection prunes to the three selected columns
    assert r.shuffle_exchanges == 0, r.text[:2000]
    assert r.codegen_stages >= 1
    assert r.scans_only_columns({"doc_id", "lang", "source"}), r.read_schemas


def test_chunk_documents_fanout_stays_in_scan_stage(plans):
    r = plans("chunk_documents_ctx32")
    # tokenize→sequence→explode→slice is a generator inside the scan
    # stage: JVM-only (no Python nodes). The single allowed exchange is
    # spread()'s guarded round-robin repartition (single-split local file
    # → session parallelism; a no-op at production split counts) — never
    # a hash/key shuffle.
    assert r.shuffle_exchanges <= 1, r.text[:2000]
    assert "hashpartitioning" not in r.text, r.text[:2000]
    assert "Generate" in r.text
    for python_node in ("ArrowEvalPython", "FlatMapGroupsInPandas", "MapInPandas"):
        assert python_node not in r.text


def test_pretrain_pipeline_bounded_shuffles(plans):
    r = plans("pretrain_pipeline_documents")
    # quality filter + sampling predicate fuse into the scan side; the
    # only exchanges are the dedup hash-agg, the final rollup, and (at
    # most) the semi-join back-joins — a bounded-stage plan at any scale
    assert r.shuffle_exchanges <= 5, r.text[:3000]
    assert r.cartesian_products == 0


def test_zorder_reread_pushes_both_filter_columns(plans):
    r = plans("layout_zorder_write_events")
    # the whole point of the z-order layout: predicates on EITHER listed
    # column must reach the parquet scan so min/max stats can prune
    assert any("user_id" in pf for pf in r.pushed_filters), r.pushed_filters
    assert any("value" in pf for pf in r.pushed_filters), r.pushed_filters
    assert r.scans_only_columns({"event_id", "user_id", "value"}), r.read_schemas


def test_kmeans_assign_is_map_only(plans):
    r = plans("kmeans_assign_embeddings")
    # centroids are folded in as literals: one scan, zero exchanges,
    # zero joins — the Lloyd E-step must never shuffle the corpus
    assert r.shuffle_exchanges == 0, r.text[:2000]
    assert "Join" not in r.text, r.text[:2000]
    assert r.scans_only_columns({"vec_id", "embedding"}), r.read_schemas


def test_decontaminate_broadcasts_eval_side(plans):
    r = plans("decontaminate_train_vs_eval")
    # the eval n-gram set must broadcast — the corpus side never
    # shuffles for the overlap join itself
    assert r.broadcast_joins >= 1, r.text[:2000]
    assert r.cartesian_products == 0


def test_tfidf_broadcasts_vocabulary(plans):
    r = plans("tfidf_top_terms_documents")
    # the vocabulary-sized df table joins broadcast; no cartesian
    assert r.broadcast_joins >= 1, r.text[:2000]
    assert r.cartesian_products == 0


def test_funnel_shuffles_only_on_user_id(spark, sf_dir):
    # the arrival-chain variant (per-user arrival timestamps): every hash
    # exchange must be on the user id — it never reshuffles on
    # step/event_type/ts; event_type filters push to the scan
    from etl_manager_spark.operators.behavior import funnel_step_arrivals

    events = load_tables(spark, sf_dir)["events"]
    last = funnel_step_arrivals(events, ["view", "click", "purchase"])[-1]
    r = plan_report(last)
    assert r.cartesian_products == 0
    assert r.has_pushed_filters
    assert any("event_type" in pf for pf in r.pushed_filters), r.pushed_filters
    import re

    for m in re.finditer(r"hashpartitioning\(([^,)]+)", r.text):
        assert m.group(1).startswith(("id", "user_id")), m.group(0)
    # funnel() itself is the single-shuffle sorted-walk: ONE scan of the
    # events table, the only DATA-SIZED hash exchange keyed on the user
    # id (the post-walk count is a 1-row global agg: its exchange is
    # SinglePartition, not a hash repartition of data), event_type filter
    # pushed to the scan
    rf = plan_report(REGISTRY["funnel_view_click_purchase"].fn(spark, sf_dir))
    assert rf.cartesian_products == 0
    assert rf.shuffle_exchanges == 1, "funnel must shuffle exactly once"
    scans = re.findall(r"\(\d+\) Scan parquet", rf.text)
    assert len(scans) == 1, "funnel must scan events once"
    assert any("event_type" in pf for pf in rf.pushed_filters), rf.pushed_filters
    hash_keys = [
        m.group(1) for m in re.finditer(r"hashpartitioning\(([^,)]+)", rf.text)
    ]
    data_keys = [k for k in hash_keys if k.startswith(("id", "user_id"))]
    assert data_keys, rf.text[:2000]
    for k in hash_keys:
        assert k.startswith(("id", "user_id", "step")), k


def test_skew_hotkey_salting_engages(plans):
    """VERDICT r4 ask #6: the mitigation must actually be IN the plan —
    a dim replicated per salt (Generate/explode) and shuffles keyed on
    (user_id, _salt) before the final merge on user_id alone."""
    r = plans("skew_hotkey_stress_events")
    # dim side replicated per salt (a Generate/explode over the salt
    # array; at test SF the replicated dim is then broadcast — the right
    # call, and above the broadcast threshold the same plan shuffles on
    # (user_id, _salt), never on the bare hot key)
    assert "explode(" in r.text, "dim side not replicated per salt"
    import re

    keys = [
        m.group(1)
        for m in re.finditer(r"hashpartitioning\(([^)]*?)(?:,\s*\d+)?\)", r.text)
    ]
    salted = [k for k in keys if "_salt" in k]
    merge_only = [k for k in keys if "user_id" in k and "_salt" not in k]
    assert salted, f"no shuffle keyed on the salt: {keys}"
    assert merge_only, f"no final merge shuffle on the bare key: {keys}"


def test_pack_sequences_shuffles_only_on_shard_and_text_stays_jvm(plans):
    r = plans("pack_sequences_documents")
    import re

    keys = [m.group(1) for m in re.finditer(r"hashpartitioning\((\w+)", r.text)]
    assert keys and all(k == "shard" for k in keys), keys
    # only (shard, id, n_tokens) may cross into the Arrow fold: the text
    # column is consumed JVM-side by the token count inside the scan stage
    m = re.search(
        r"\(\d+\) FlatMapGroupsInPandas\nInput \[\d+\]: \[([^\]]*)\]", r.text
    )
    assert m and "text" not in m.group(1), m.group(1) if m else r.text


def test_mixture_sample_single_window_pass(plans):
    r = plans("mixture_sample_token_budget")
    import re

    keys = [m.group(1) for m in re.finditer(r"hashpartitioning\((\w+)", r.text)]
    assert keys and all(k == "source" for k in keys), keys
    assert r.cartesian_products == 0


def test_schema_evolution_is_union_of_projections(plans):
    r = plans("schema_evolution_events_union")
    # conformance is projection-only: the union itself adds no exchange
    # (the only shuffle is the final groupBy rollup)
    assert "Union" in r.text
    assert r.cartesian_products == 0


def test_bigram_lm_broadcasts_count_tables(plans):
    r = plans("bigram_lm_score_documents")
    # the vocabulary²-bounded count tables must broadcast: the 4M-row
    # pair stream is probed map-side, never sort-merge-joined (measured
    # 7× difference at sf0.1)
    assert r.broadcast_joins >= 2, r.text[:2000]
    assert r.sortmerge_joins == 0, r.text[:2000]


def test_ewma_single_shuffle_sorted_stream(plans):
    r = plans("ewma_user_values")
    import re

    keys = [m.group(1) for m in re.finditer(r"hashpartitioning\((\w+)", r.text)]
    assert keys and all(k == "user_id" for k in keys), keys
    # the fold consumes the sorted stream in place: exactly one exchange,
    # no grouped-map (FlatMapGroupsInPandas) machinery
    assert len(keys) == 1
    assert "MapInPandas" in r.text and "FlatMapGroupsInPandas" not in r.text


def test_weighted_sample_topk_uses_heap_not_full_sort(plans):
    r = plans("weighted_sample_documents")
    # the global top-50 must be a TakeOrdered heap; a full Sort of the
    # corpus for a 50-row result is the scale bug this guards against
    assert r.take_ordered, r.text[:1500]
    # one scan, no joins — the key is computed inline from the row id
    assert r.broadcast_joins == 0 and r.sortmerge_joins == 0


def test_regression_moments_single_aggregate(plans):
    r = plans("regression_price_by_quantity")
    # all five moments ride ONE map-combined hash aggregate: exactly one
    # shuffle (on l_returnflag), no joins, slope/corr are post-agg projections
    assert r.shuffle_exchanges == 1, r.text[:1500]
    assert r.broadcast_joins == 0 and r.sortmerge_joins == 0
    assert r.scans_only_columns({"l_returnflag", "l_quantity", "l_extendedprice"})


def test_gapfill_shuffles_only_on_user_id(plans):
    r = plans("gapfill_locf_user_hours")
    # hourly agg, bounds agg, slot join and LOCF window all key on
    # user_id (± the hour column): no key other than user_id may appear
    # first in any hashpartitioning
    import re

    keys = re.findall(r"Arguments: hashpartitioning\((\w+)", r.text)
    assert keys and all(k.startswith("user_id") for k in keys), keys
    # the per-user slot explode stays out of Python: no ArrowEvalPython
    assert "ArrowEvalPython" not in r.text and "BatchEvalPython" not in r.text


def test_semdedup_single_cluster_shuffle(plans):
    r = plans("semdedup_embeddings")
    # assignment is an Arrow projection (closure-constant centroids — no
    # join); the only required movement is the groupBy(cluster) for
    # within-cluster scoring
    assert r.broadcast_joins == 0 and r.sortmerge_joins == 0, r.text[:1500]
    assert "ArrowEvalPython" in r.text  # centroid argmax stays vectorized


def test_fk_audit_broadcasts_dimension_parents(plans):
    r = plans("fk_integrity_audit")
    # four of five FK edges have dimension-sized parents (customer,
    # nation ×2, region) — those must broadcast; only lineitem→orders may
    # shuffle. A plan that sort-merges a dimension edge would repartition
    # the fact side for nothing.
    assert r.broadcast_joins >= 4, r.text[:2000]


def test_k_anonymity_is_one_partial_agg(plans):
    r = plans("k_anonymity_audit_events")
    # one hash-partitioned exchange on the quasi-id triple; counts
    # combine map-side so the shuffle carries occupied cells, not rows
    assert r.shuffle_exchanges == 1, r.text[:1500]
    assert r.broadcast_joins == 0 and r.sortmerge_joins == 0
    assert r.scans_only_columns({"event_type", "ts", "value"}), r.read_schemas


def test_session_concurrency_shuffles_user_then_hour_only(plans):
    import re

    r = plans("session_concurrency_events")
    keys = re.findall(r"Arguments: hashpartitioning\((\w+)", r.text)
    # sessionization + session bounds key on user_id; the final count
    # keys on hour_start — nothing else may shuffle, and the hour
    # explode is a JVM generator, not Python
    assert keys and set(keys) <= {"user_id", "hour_start"}, keys
    assert "Generate" in r.text
    assert "ArrowEvalPython" not in r.text and "BatchEvalPython" not in r.text


def test_curation_quality_gate_is_scan_local(plans):
    r = plans("quality_linear_score_documents")
    # spread()'s single-split guard may add one round-robin exchange on
    # the tiny local fixture; no hash shuffle, no join, no Python
    import re

    assert not re.search(r"Arguments: hashpartitioning", r.text), r.text[:1500]
    assert r.broadcast_joins == 0 and r.sortmerge_joins == 0
    assert "EvalPython" not in r.text


def test_phash_banded_join_keys_on_band_bucket(plans):
    import re

    r = plans("multimodal_phash_dedup")
    # candidate generation must join on (band, bv) — never a cartesian
    # all-pairs of media rows
    assert r.cartesian_products == 0, r.text[:1500]
    keys = re.findall(r"Arguments: hashpartitioning\((\w+)", r.text)
    assert any(k == "band" for k in keys) or r.broadcast_joins >= 1, keys


def test_dynamic_partition_pruning_engages(spark, sf_dir, tmp_path):
    """Joining a partitioned fact against a filtered dim must inject a
    dynamicpruning expression into the fact scan's PartitionFilters —
    the Catalyst feature that turns a selective dim filter into fact
    partition skipping at 100 TB (without it the scan reads every
    partition and the join discards most of it)."""
    ev = load_tables(spark, sf_dir)["events"]
    d = str(tmp_path / "dpp_fact")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(d)
    fact = spark.read.parquet(d)
    dim = spark.createDataFrame(
        [("view", 1.0), ("click", 2.0)], "event_type string, w double"
    ).filter(F.col("w") > 1.5)
    j = fact.join(dim, on="event_type").agg(F.count(F.lit(1)))
    r = plan_report(j)
    assert "dynamicpruning" in r.text.lower(), r.text[:2000]


def test_twa_single_shared_shuffle(plans):
    import re

    r = plans("twa_user_value_daily")
    # the lead window and the (user, day) aggregate must share one
    # exchange keyed on user_id(+day) — a second hash partitioning
    # would mean the window's sort isn't being reused
    keys = re.findall(r"Arguments: hashpartitioning\((\w+)", r.text)
    assert keys and all(k.startswith("user_id") for k in keys), keys


def test_chi2_marginals_broadcast(plans):
    r = plans("chi2_event_type_by_dow")
    # cell counts join their marginals via broadcast (5-row / 7-row
    # tables); a sort-merge join of the contingency table would be absurd
    assert r.sortmerge_joins == 0, r.text[:1500]
    assert r.broadcast_joins >= 3


def test_top_ngram_argmax_shuffles_on_doc_keys_only(plans):
    """The gram explode must be a JVM generator in the scan stage and
    every hash exchange keyed on the doc id first — (id, ...) for the
    count agg, id for the argmax window — so a doc-bucketed corpus runs
    the argmax exchange-free."""
    import re

    r = plans("top_ngram_char_frac_documents")
    assert r.cartesian_products == 0
    assert "Generate" in r.text
    for python_node in ("ArrowEvalPython", "MapInPandas"):
        assert python_node not in r.text
    keys = re.findall(r"hashpartitioning\((\w+)", r.text)
    assert keys and all(k.startswith("id") for k in keys), keys


def test_char_entropy_fanout_in_scan_stage(plans):
    """Char explode is a generator before any exchange; the only data
    shuffle keys on the doc id (the (id, ch) agg); no Python nodes."""
    import re

    r = plans("char_entropy_documents")
    assert r.cartesian_products == 0
    assert "Generate" in r.text
    for python_node in ("ArrowEvalPython", "MapInPandas"):
        assert python_node not in r.text
    keys = re.findall(r"hashpartitioning\((\w+)", r.text)
    assert keys and all(k.startswith("id") for k in keys), keys


def test_iqr_fences_broadcast_back(plans):
    """The 5-row fence table must broadcast to the outlier-count scan —
    shipping events to the fences would be a data-sized shuffle."""
    r = plans("iqr_outlier_fences_events")
    assert r.broadcast_joins >= 1, r.text[:2000]
    assert r.cartesian_products == 0


def test_multitouch_attribution_no_cartesian_and_pushed_filters(plans):
    """The purchase×touch pairing must stay an equi-join on user_id with
    the range as residual (never a cartesian), and both event_type
    filters must reach the scans."""
    r = plans("multitouch_attribution_events")
    assert r.cartesian_products == 0
    assert any("event_type" in pf for pf in r.pushed_filters), r.pushed_filters


def test_q21_reuses_orderkey_partitioning(plans):
    """Both lineitem passes hash on l_orderkey; the R-pairs ⋈ ord join
    must reuse that partitioning (no third data-sized exchange) and the
    supplier dim must broadcast."""
    import re

    r = plans("q21_sole_return_supplier")
    assert r.cartesian_products == 0
    assert r.broadcast_joins >= 1, r.text[:2000]
    data_keys = [
        m.group(1)
        for m in re.finditer(r"hashpartitioning\((\w+)", r.text)
        if m.group(1).startswith("l_")
    ]
    assert data_keys and all(k.startswith("l_orderkey") for k in data_keys), data_keys


def test_lint_plan_flags_antipatterns(spark, sf_dir):
    """lint_plan must flag each anti-pattern it documents and stay quiet
    on a well-shaped query."""
    from etl_manager_spark.plans import lint_plan

    t = load_tables(spark, sf_dir)

    codes = {w.code for w in lint_plan(t["nation"].crossJoin(t["region"]))}
    assert "cartesian-product" in codes or "nested-loop-join" in codes

    from pyspark.sql.types import LongType

    slow = F.udf(lambda x: x + 1, LongType())
    codes = {w.code for w in lint_plan(t["nation"].select(slow("n_nationkey")))}
    assert "python-row-udf" in codes

    # F.expr over a cast hides the column from pushdown
    hidden = t["lineitem"].filter(
        F.col("l_quantity").cast("string") == "1.0"
    )
    codes = {w.code for w in lint_plan(hidden)}
    assert "filter-not-pushed" in codes

    codes = {w.code for w in lint_plan(t["events"].orderBy("value"))}
    assert "global-sort" in codes

    # top-k plans TakeOrderedAndProject -> no global-sort warning
    codes = {w.code for w in lint_plan(t["events"].orderBy("value").limit(5))}
    assert "global-sort" not in codes

    # a healthy pushdown-friendly aggregation: no warnings at all
    clean = (
        t["lineitem"]
        .filter(F.col("l_shipdate") >= "1995-01-01")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert lint_plan(clean) == []


def test_pca_projection_is_map_only(plans):
    """Components are closure literals: one scan, zero exchanges, zero
    joins, zero Python — the projection must never shuffle the corpus."""
    r = plans("pca_project_embeddings")
    assert r.shuffle_exchanges == 0, r.text[:2000]
    assert "Join" not in r.text, r.text[:2000]
    for python_node in ("ArrowEvalPython", "MapInPandas", "BatchEvalPython"):
        assert python_node not in r.text
    assert r.scans_only_columns({"vec_id", "embedding"}), r.read_schemas


def test_pq_encode_is_map_only(plans):
    """Codebooks are closure literals: the encode must be a single
    map-only scan — no join, no shuffle, no Python."""
    r = plans("pq_encode_embeddings")
    assert r.shuffle_exchanges == 0, r.text[:2000]
    assert "Join" not in r.text, r.text[:2000]
    for python_node in ("ArrowEvalPython", "MapInPandas", "BatchEvalPython"):
        assert python_node not in r.text
    assert r.scans_only_columns({"vec_id", "embedding"}), r.read_schemas


def test_bloom_prefilter_probe_in_scan_stage(plans):
    """The bloom probe must run map-side under the orders scan — a Filter
    with the xxhash64 probes sitting below the join, so pruned rows never
    enter an exchange. The exact semi join stays (FP cleanup)."""
    r = plans("bloom_prefilter_join_orders")
    assert "xxhash64" in r.text
    # probe is a Filter in the same stage as the scan: simple-mode plan
    # shows Filter(...xxhash64...) directly over the orders FileScan
    import re

    m = re.search(r"Condition :[^\n]*xxhash64", r.text)
    assert m, "bloom probe filter missing from physical plan"
    assert r.broadcast_joins + r.sortmerge_joins >= 1  # exact verify join
    assert r.cartesian_products == 0


def test_acf_single_window_shuffle(plans):
    """ACF = one hashpartitioning exchange on event_type (the window);
    the moment aggregation reuses that partitioning (same key), so no
    second full-data shuffle."""
    r = plans("acf_lag_events_value")
    assert r.shuffle_exchanges <= 2, r.shuffle_exchanges
    assert r.cartesian_products == 0


def test_pmi_unigram_tables_broadcast(plans):
    """PMI attaches unigram counts and the two scalar totals via
    broadcast — the bigram stream must not sort-merge against the
    vocabulary."""
    r = plans("pmi_collocations_documents")
    assert r.broadcast_joins >= 4, r.broadcast_joins  # ua, ub, tot, btot
    assert r.sortmerge_joins == 0, r.text[:500]
    assert r.take_ordered  # top-20 heap, not a global sort


def test_rrf_fusion_no_cartesian(plans):
    r = plans("rrf_fuse_bm25_tfidf_documents")
    assert r.cartesian_products == 0
    assert r.take_ordered


def test_temporal_split_bounds_broadcast(plans):
    """The bounds row attaches via a broadcast nested-loop of a 1-row
    aggregate — no shuffle of events keyed on anything but the final
    split groupBy."""
    r = plans("temporal_split_events")
    assert r.broadcast_joins >= 1
    assert r.cartesian_products == 0


def test_heavy_hitters_recount_broadcasts_candidates(plans):
    r = plans("heavy_hitter_tokens_documents")
    # phase-2 recount: candidate set AND the 1-row total must broadcast —
    # the only shuffle left is the final few-key aggregate
    assert r.broadcast_joins >= 2, r.text[:2000]
    assert r.sortmerge_joins == 0, "candidate join must not shuffle the stream"
    assert r.cartesian_products == 0  # total rides a broadcast nested loop


def test_holt_single_key_shuffle(plans):
    r = plans("holt_linear_events")
    # one Exchange: the repartition on user_id feeding the sorted fold
    assert r.shuffle_exchanges == 1, r.text[:1500]


def test_kl_drift_no_full_sort(plans):
    r = plans("vocab_kl_drift_documents")
    # top-50 must plan TakeOrdered, and the 1-row totals must broadcast
    assert r.take_ordered, r.text[:1500]
    assert r.cartesian_products == 0


def test_assortativity_single_row_reduction(plans):
    r = plans("assortativity_neardup_graph")
    # moment reduction ends in one global aggregate; degree tables join
    # by broadcast (node-sized) or hash — never cartesian
    assert r.cartesian_products == 0


# --------------------------------------------------------------------- #
# round-6 batch: tokenizer / evaluation / resampling / hygiene contracts


def test_bpe_encode_single_shuffle_map_lookup(plans):
    # encode = tokenize + broadcast-map lookup + per-doc re-agg: the ONLY
    # exchange is the doc_id aggregation; no joins, no windows
    r = plans("bpe_vocab_encode_documents")
    assert r.shuffle_exchanges <= 1, r.text[:1500]
    assert r.sortmerge_joins == 0 and r.cartesian_products == 0
    assert r.single_partition_windows == 0


def test_calibration_pure_groupby(plans):
    r = plans("calibration_bins_documents")
    assert r.shuffle_exchanges <= 1
    assert r.sortmerge_joins == 0 and r.broadcast_joins == 0
    assert r.single_partition_windows == 0


def test_roc_auc_level_table_broadcast_theta(plans):
    # ranks come from a broadcast theta-join over the <=1001-level table,
    # never a global ranking window
    r = plans("roc_auc_stopword_lang_documents")
    assert r.broadcast_joins >= 1, r.text[:1500]
    assert r.single_partition_windows == 0


def test_bootstrap_no_windows_no_joins_on_data(plans):
    # Poisson bootstrap: explode + groupBy(b); the only join is the 1-row
    # broadcast of the full-sample mean
    r = plans("bootstrap_poisson_ci_events")
    assert r.single_partition_windows == 0
    assert r.sortmerge_joins == 0 and r.cartesian_products == 0
    assert r.broadcast_joins >= 1


def test_bootstrap_lift_same_shape(plans):
    r = plans("bootstrap_lift_ci_events")
    assert r.single_partition_windows == 0
    assert r.sortmerge_joins == 0 and r.cartesian_products == 0
    assert r.has_pushed_filters  # event_type IN (view, click) reaches scan


def test_logo_influence_single_pass_plus_broadcast(plans):
    # group stats + 1-row totals broadcast — never |groups| re-scans
    r = plans("logo_slope_influence_events")
    assert r.broadcast_joins >= 1
    assert r.sortmerge_joins == 0
    assert r.single_partition_windows == 0


def test_conformal_broadcast_dimension_joins(plans):
    r = plans("conformal_interval_events")
    assert r.broadcast_joins >= 2, r.text[:1500]
    assert r.sortmerge_joins == 0
    assert r.single_partition_windows == 0


def test_zipf_topk_heap_and_broadcast_ranks(plans):
    r = plans("zipf_fit_documents")
    assert r.take_ordered, "top-1000 must plan TakeOrderedAndProject"
    assert r.broadcast_joins >= 1
    assert r.single_partition_windows == 0


def test_feature_mi_broadcast_marginals(plans):
    r = plans("feature_mi_documents")
    assert r.broadcast_joins >= 3, r.text[:1500]
    assert r.cartesian_products == 0
    assert r.single_partition_windows == 0


def test_source_overlap_one_shingle_key_join(plans):
    # the pair mine is an equijoin keyed by shingle; size lookups broadcast
    r = plans("source_overlap_matrix_documents")
    assert r.cartesian_products == 0
    assert r.broadcast_joins >= 2
    assert r.single_partition_windows == 0


def test_mase_windows_partitioned_by_type(plans):
    r = plans("mase_seasonal_naive_daily")
    assert r.single_partition_windows == 0
    assert r.sortmerge_joins == 0 and r.cartesian_products == 0


def test_embedding_drift_bounded_shuffles(plans):
    r = plans("embedding_drift_halves")
    assert r.single_partition_windows == 0
    assert r.cartesian_products == 0


def test_shrinking_window_frame_lint(spark, sf_dir):
    """A frame ending at UNBOUNDED FOLLOWING that does not start at
    UNBOUNDED PRECEDING re-aggregates from every row to partition end —
    O(rows²) per partition (the gapfill/asof hang on multi-year spans).
    lint_plan must flag it; the full-partition frame and running frames
    must stay quiet; the two rewritten call sites must plan clean."""
    from pyspark.sql import Window

    from etl_manager_spark.plans import lint_plan

    df = spark.createDataFrame([(1, 1.0)], "g int, v double")
    shrink = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    codes = [w.code for w in lint_plan(df.select(F.first("v").over(shrink)))]
    assert "shrinking-window-frame" in codes

    full = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    run = (
        Window.partitionBy("g")
        .orderBy(F.col("v").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ok = df.select(F.sum("v").over(full), F.last("v").over(run))
    assert "shrinking-window-frame" not in [w.code for w in lint_plan(ok)]

    reg = load_registry()
    for name in ("gapfill_linear_user_hours", "asof_forward_events_order"):
        codes = [w.code for w in lint_plan(reg[name].fn(spark, sf_dir))]
        assert "shrinking-window-frame" not in codes, name


def test_window_frame_bounds_parser_is_per_frame():
    """ADVICE r8: the old single-regex bound matcher missed interval
    RangeFrame lower bounds; the first lazy-regex broadening then bled
    ACROSS adjacent frames and misread window_navigation_orders' benign
    full-partition frame as shrinking. The balanced-paren parser must
    catch both shrinking forms and neither benign form."""
    from etl_manager_spark.plans.inspect import _window_frame_bounds

    txt = (
        "w1(specifiedwindowframe(RowFrame, unboundedpreceding$(), "
        "currentrow$())), "
        "w2(specifiedwindowframe(RowFrame, 3, unboundedfollowing$())), "
        "specifiedwindowframe(RangeFrame, "
        "-cast(INTERVAL '7' DAY, interval), unboundedfollowing$()), "
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), "
        "unboundedfollowing$()), "
        "specifiedwindowframe(RowFrame, -2, 2)"
    )
    bounds = _window_frame_bounds(txt)
    assert len(bounds) == 5
    shrinking = [
        lo
        for lo, hi in bounds
        if hi == "unboundedfollowing$()" and lo != "unboundedpreceding$()"
    ]
    assert shrinking == ["3", "-cast(INTERVAL '7' DAY, interval)"]


def test_interval_shrinking_range_frame_is_flagged(spark):
    """A RangeFrame whose lower bound renders as an interval expression
    (the advisor's false-negative case) must trip the lint, and the
    full-partition frame in the same plan must not."""
    import datetime

    from pyspark.sql import Window

    from etl_manager_spark.plans.inspect import lint_plan

    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, d), float(d)) for d in range(1, 6)],
        "g int, ts timestamp, v double",
    )
    df.createOrReplaceTempView("frame_lint_probe")
    # interval RangeFrame bounds are SQL-only (PySpark rangeBetween takes
    # longs); this renders as 'specifiedwindowframe(RangeFrame,
    # -INTERVAL ..., unboundedfollowing$())' — the advisor's exact case
    shrink = spark.sql(
        """
        SELECT sum(v) OVER (PARTITION BY g ORDER BY ts
                            RANGE BETWEEN INTERVAL 7 DAYS PRECEDING
                            AND UNBOUNDED FOLLOWING) AS s
        FROM frame_lint_probe
        """
    )
    codes = [w.code for w in lint_plan(shrink)]
    assert "shrinking-window-frame" in codes

    full = (
        Window.partitionBy("g")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    lead_w = Window.partitionBy("g").orderBy("ts")
    mixed = df.select(
        F.sum("v").over(full).alias("s"),
        F.lead("v", 1).over(lead_w).alias("nxt"),
    )
    assert "shrinking-window-frame" not in [w.code for w in lint_plan(mixed)]


def _node_blocks(formatted: str) -> dict[str, list[str]]:
    """Map node kind -> detail blocks from a formatted plan: each block
    starts '(n) NodeName' and runs to the next blank-line-delimited
    header."""
    import re

    blocks: dict[str, list[str]] = {}
    current_kind = None
    current: list[str] = []
    for line in formatted.splitlines():
        m = re.match(r"^\(\d+\) (\w+)", line)
        if m:
            if current_kind is not None:
                blocks.setdefault(current_kind, []).append("\n".join(current))
            current_kind, current = m.group(1), [line]
        elif current_kind is not None:
            current.append(line)
    if current_kind is not None:
        blocks.setdefault(current_kind, []).append("\n".join(current))
    return blocks


def test_ngram_tokenize_staged_outside_generate_lambda(plans):
    """Round-10 contract (the bigram_lm hazard class): an inline regex
    tokenize inside a transform/slice lambda is re-evaluated PER n-gram
    position — O(len²) per document (measured 4.4× on the corpus trigram
    miner). The token array must be projected into a column BEFORE the
    explode, so the Generate's lambda references a bound column and the
    split() runs once per row in a Project."""
    for name in (
        "corpus_ngram_boilerplate",
        "decontaminate_train_vs_eval",
        "ngram_containment_top_pairs",
    ):
        r = plans(name)
        blocks = _node_blocks(r.text)
        gens = blocks.get("Generate", [])
        # containment's Generate feeds a checkpoint built during fn();
        # its final plan reads the checkpointed RDD — nothing to assert
        # there beyond the absence of a lambda-inlined split anywhere
        for g in gens:
            assert "split(" not in g, (
                f"{name}: regex tokenize inlined into a Generate lambda "
                "(re-evaluated per n-gram position):\n" + g
            )


def test_gopher_jvm_flags_tokenize_once(spark, sf_dir):
    """The JVM gopher_quality_flags twin must tokenize once per row: one
    split() in the whole optimized plan (the staged _toks projection),
    not one per flag rule or per trigram position."""
    from etl_manager_spark.operators.text import gopher_quality_flags

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = gopher_quality_flags(docs)._jdf.queryExecution().optimizedPlan().toString()
    n_split = plan.count("split(")
    assert n_split == 1, (
        f"gopher_quality_flags evaluates split() {n_split}× per row — the "
        "staged _toks projection collapsed or a rule re-tokenizes inline"
    )
