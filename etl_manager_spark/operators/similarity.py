"""Similarity search over embedding columns (SURVEY §2.D).

Baseline: brute-force cosine top-k — exact, one broadcast join, JVM-side
arithmetic via higher-order functions (zip_with/aggregate), no Python UDF.

Scale path: LSH bucketing (random-hyperplane signs) cuts the candidate set
from |corpus| to a bucket; brute-force then runs per bucket. At 100 TB the
corpus side stays partitioned, the (small) query side broadcasts, and the
dot products pipeline inside whole-stage codegen — no shuffle of the corpus
at all for the brute-force path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential double dot product (deterministic; bitwise-reproducible)."""
    return F.aggregate(
        F.zip_with(a.cast("array<double>"), b.cast("array<double>"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a.cast("array<double>"), lambda x: x * x),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def safe_cosine_expr(dot_col: Column, norm_a: Column, norm_b: Column) -> Column:
    """cosine = dot/(‖a‖·‖b‖), with ZERO-NORM vectors scoring 0.0 instead
    of NaN. The NaN matters: Spark orders NaN ABOVE every double, so one
    all-zero embedding would rank 1 for EVERY query in every top-k path
    and pass every ``>= threshold`` gate, while the numpy kernels' NaN
    compares False — the variants would silently disagree. 0.0 ("no
    similarity") is the standard convention and keeps all kernels
    bitwise-aligned."""
    denom = norm_a * norm_b
    return F.when(denom == F.lit(0.0), F.lit(0.0)).otherwise(dot_col / denom)


def cosine(a: Column, b: Column) -> Column:
    return safe_cosine_expr(dot(a, b), l2_norm(a), l2_norm(b))


def _safe_outer_sims(dots, norms_a, norms_b):
    """numpy twin of :func:`safe_cosine_expr`: dots/(‖a‖⊗‖b‖) with
    zero-denominator pairs scoring 0.0 — same convention, bitwise-equal
    elsewhere (the division is elementwise IEEE either way)."""
    import numpy as np

    denom = np.multiply.outer(norms_a, norms_b)
    out = np.zeros_like(dots)
    np.divide(dots, denom, out=out, where=denom != 0)
    return out


def _seq_norms(A):
    """Per-row L2 norms, summing squares sequentially over dimensions —
    the same IEEE op order as :func:`l2_norm` and the DuckDB oracle's
    SQRT(LIST_DOT_PRODUCT(v, v)), so results are bitwise-identical."""
    import numpy as np

    acc = np.zeros(A.shape[0])
    for k in range(A.shape[1]):
        acc += A[:, k] * A[:, k]
    return np.sqrt(acc)


def _seq_dots(A, B):
    """All-pairs dot products (m×n), vectorized across pairs but sequential
    across dimensions — bitwise-identical to :func:`dot` per pair."""
    import numpy as np

    acc = np.zeros((A.shape[0], B.shape[0]))
    for k in range(A.shape[1]):
        acc += np.multiply.outer(A[:, k], B[:, k])
    return acc


def _collect_training_sample(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    sample_fraction: float,
    train_sample: int,
    what: str,
) -> list[tuple]:
    """Shared driver-side training-sample collect for the stored-index
    trainers (IVF / PCA / PQ): hash-filter the corpus to the requested
    fraction (the same md5 draw as sampling.stratified_sample, so the
    sample is reproducible under any partitioning), then collect with a
    LIMIT-bounded guard — the cap (max(100k, 50·train_sample) rows)
    refuses a corpus-sized collect with sizing guidance instead of
    OOMing the driver."""
    from etl_manager_spark.operators.sampling import _threshold_hex, hash_bucket

    filtered = corpus
    if sample_fraction < 1.0:
        filtered = corpus.filter(
            hash_bucket(id_col) < F.lit(_threshold_hex(sample_fraction))
        )
    cap = max(100_000, 50 * train_sample)
    rows = (
        filtered.select(F.col(id_col), F.col(vec_col).cast("array<double>"))
        .limit(cap + 1)
        .collect()
    )
    if len(rows) > cap:
        raise ValueError(
            f"{what} training sample collect would exceed {cap} rows; pass "
            "sample_fraction ≈ train_sample/|corpus| so only the hash-"
            "filtered sample reaches the driver"
        )
    return [(r[0], r[1]) for r in rows]


_INTEGRAL_IDS = ("tinyint", "smallint", "int", "bigint")


def _require_integral_id(df: DataFrame, id_col: str, op: str) -> None:
    """The Arrow-kernel variants exchange ids through fixed long-typed
    schemas; a non-integral id would either throw CAST_INVALID_INPUT
    under ANSI or silently become NULL ids on legacy deployments. Refuse
    up front with the alternative spelled out."""
    t = dict(df.dtypes).get(id_col)
    if t not in _INTEGRAL_IDS:
        raise ValueError(
            f"{op}: id column {id_col!r} has type {t} — the Arrow kernel "
            "variants require an integral id; use the exact cosine_topk/"
            "cosine_near_dup_pairs (any orderable id type) or add an "
            "integral surrogate id"
        )


def _valid_vec(vec_col: Column, dim: int | None = None) -> Column:
    """Rows the numpy kernels can stack: non-null, and when the expected
    dimensionality is known, exactly ``dim`` long. The exact HOF paths
    score such rows NULL (zip_with pads, aggregate propagates) and the
    threshold/rank drops them — filtering before the kernel gives the
    same outcome instead of a stage-killing np.stack shape error."""
    cond = vec_col.isNotNull()
    if dim is not None:
        cond = cond & (F.size(vec_col) == dim)
    return cond


def _stack_uniform(vecs, ids):
    """(V, ids) with rows of the MODAL vector length only (ties break to
    the larger length for determinism) — the kernel-side guard for
    ragged inputs reaching np.stack when the caller couldn't state a
    dim. Malformed rows score nothing, matching the exact paths where
    their sims are NULL and fail every threshold."""
    import numpy as np

    lens = np.array([len(v) for v in vecs])
    vals, counts = np.unique(lens, return_counts=True)
    modal = int(vals[np.lexsort((vals, counts))[-1]])
    keep = lens == modal
    V = np.stack([np.asarray(v, dtype=np.float64) for v, k in zip(vecs, keep) if k])
    return V, ids[keep]


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    extra_payload_cols: list[str] | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    ``queries`` must be small (broadcast side); the corpus is scanned once
    with no shuffle — ranking happens in a window partitioned by query id,
    whose input is only |queries|·|corpus| scored rows pre-filtered by the
    broadcast join. Ties break on candidate id for determinism.
    ``extra_payload_cols`` carries additional corpus columns (metadata
    the caller filtered on, display fields) through to the result —
    filtered retrieval composes as a plain ``corpus.filter(...)``
    BEFORE this call, so the predicate pushes to the corpus scan and
    the result always has k rows per query (never the post-filtered
    fewer-than-k of filter-after-ANN).

    ``exclude_self`` (default True) drops candidates whose id equals the
    query's id — correct when queries are DRAWN FROM the corpus (the
    corpus-self search all the approximate variants assume). Pass False
    when queries and corpus are independent tables whose id spaces
    merely overlap, or equal ids would silently exclude real neighbors."""
    extra = list(extra_payload_cols or [])
    # NULL vectors are excluded on BOTH sides of the search: they have no
    # similarity to anything, and leaving them in would let a NULL-sim row
    # enter the top-k whenever a query has fewer than k real candidates
    # (desc sort puts NULLs last, not out)
    q = queries.filter(_valid_vec(F.col(vec_col))).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        l2_norm(F.col(vec_col)).alias("_qnorm"),
    )
    c = corpus.filter(_valid_vec(F.col(vec_col))).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        l2_norm(F.col(vec_col)).alias("_cnorm"),
        *[F.col(x) for x in extra],
    )
    scored = F.broadcast(q).crossJoin(c)
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = (
        scored
        .select(
            "query_id",
            "neighbor_id",
            *extra,
            safe_cosine_expr(
                dot(F.col("_qvec"), F.col("_cvec")),
                F.col("_qnorm"),
                F.col("_cnorm"),
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", *extra, "cosine_sim")
    )


def _hyperplane(dim: int, seed: int) -> list[float]:
    """Deterministic pseudo-random hyperplane from a hash — no RNG state,
    reproducible across runs/engines."""
    import hashlib

    out = []
    for i in range(dim):
        h = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
        out.append(int(h[:8], 16) / float(0xFFFFFFFF) * 2.0 - 1.0)
    return out


def lsh_bucket(vec_col: Column, dim: int, num_planes: int = 8, seed: int = 7) -> Column:
    """Random-hyperplane LSH bucket id (0..2^num_planes-1) as a long.
    Vectors with small angles land in the same bucket with high probability.
    """
    from etl_manager_spark.functions.exact import lit_double_array

    bucket = F.lit(0).cast("long")
    for p in range(num_planes):
        plane = lit_double_array(_hyperplane(dim, seed * 1000 + p))
        proj = F.aggregate(
            F.zip_with(vec_col.cast("array<double>"), plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0)).cast("long")
    return bucket


_RECT_SCHEMA = "query_id long, neighbor_id long, cosine_sim double"


def _score_rect_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Score one candidate group holding query rows (side='q') and corpus
    rows (side='c'): every query×candidate cosine via the sequential-
    across-dims kernel (bitwise-equal to the exact HOF form), self-pairs
    excluded. Shared by the LSH-bucket and IVF-list top-k paths."""
    import numpy as np

    is_q = (pdf["side"] == "q").to_numpy()
    if not is_q.any() or is_q.all():
        return pd.DataFrame(
            {"query_id": [], "neighbor_id": [], "cosine_sim": []}
        ).astype({"query_id": "int64", "neighbor_id": "int64", "cosine_sim": "float64"})
    ids = pdf["id"].to_numpy()
    V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["vec"]])
    Q, C = V[is_q], V[~is_q]
    qi, ci = ids[is_q], ids[~is_q]
    sims = _safe_outer_sims(_seq_dots(Q, C), _seq_norms(Q), _seq_norms(C))
    a, b = np.nonzero(qi[:, None] != ci[None, :])
    return pd.DataFrame(
        {"query_id": qi[a], "neighbor_id": ci[b], "cosine_sim": sims[a, b]}
    )


def lsh_table_keys(
    vec_col: Column,
    dim: int,
    num_planes: int = 4,
    num_tables: int = 4,
    seed_base: int = 7,
) -> Column:
    """``array<string>`` of ``table:bucket`` keys for ALL hash tables in one
    Arrow-batched projection — same planes as :func:`lsh_bucket` with
    seed ``seed_base + t``. The 16 per-plane projections are computed with
    the sequential-across-dims kernel (:func:`_seq_dots`, vectorized across
    rows AND planes), NOT a blocked GEMM: every projection is therefore
    bitwise-identical to the HOF ``dot`` fold and to DuckDB's
    ``LIST_DOT_PRODUCT``, so bucket assignment is reproducible across
    engines — the DuckDB oracle for the LSH queries recomputes the exact
    same buckets from the same plane literals."""
    import numpy as np
    import pandas as pd

    planes = np.array(
        [
            _hyperplane(dim, (seed_base + t) * 1000 + p)
            for t in range(num_tables)
            for p in range(num_planes)
        ]
    )  # (T·P, dim)
    weights = 1 << np.arange(num_planes)

    @F.pandas_udf("array<string>")
    def _keys(vs: pd.Series) -> pd.Series:
        V = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        signs = (_seq_dots(V, planes) > 0).reshape(len(vs), -1, num_planes)
        buckets = signs @ weights  # (n, T)
        return pd.Series(
            [[f"{t}:{b}" for t, b in enumerate(row)] for row in buckets]
        )

    return _keys(vec_col)


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_planes: int = 4,
    num_tables: int = 4,
) -> DataFrame:
    """Approximate cosine top-k: hyperplane-LSH with OR-amplification —
    ``num_tables`` independent hash tables of ``num_planes`` planes each;
    a candidate is considered if it collides with the query in ANY table.

    All heavy arithmetic is Arrow-vectorized: bucket assignment is one GEMM
    per batch (:func:`lsh_table_keys`), and each (table, bucket) group
    scores its query×candidate rectangle with the sequential-across-dims
    numpy kernel (bitwise-equal sims to the exact brute force, so the
    recall tests can compare values). Pairs colliding in several tables are
    deduped with a max-agg (identical sims, so max = dedup).

    Scale: candidates per query ≈ |corpus| · L / 2^planes; the corpus
    shuffles once on (table, bucket). Tune planes up for selectivity,
    tables up for recall."""
    import numpy as np
    import pandas as pd

    _require_integral_id(queries, id_col, "cosine_topk_lsh")
    _require_integral_id(corpus, id_col, "cosine_topk_lsh")

    def tagged(df, side):
        return df.filter(_valid_vec(F.col(vec_col), dim)).select(
            F.col(id_col).cast("long").alias("id"),
            F.col(vec_col).alias("vec"),
            F.lit(side).alias("side"),
            F.explode(
                lsh_table_keys(F.col(vec_col), dim, num_planes, num_tables)
            ).alias("bucket"),
        )

    both = tagged(queries, "q").unionByName(tagged(corpus, "c"))

    scored = (
        both.groupBy("bucket")
        .applyInPandas(_score_rect_group, _RECT_SCHEMA)
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("cosine_sim").alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine_sim")
    )


def cosine_near_dup_pairs(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs: all (a, b) with
    ``a.id < b.id`` and ``cosine(a, b) >= threshold``.

    This is the exact O(n²) formulation — correct at any scale but only
    affordable when one side fits in a broadcast (≲ a few 100k vectors).
    The self-cross-join broadcasts the smaller (same) relation and the
    pair enumeration + dot products stay inside whole-stage codegen with
    no shuffle; the id< predicate halves the work.

    Each vector's L2 norm is computed once BEFORE the join (O(n)) instead
    of per pair (O(n²)) — cosine = dot/(norm_a·norm_b) is the identical
    float expression either way (same ops, same order → bitwise-equal to
    the naive form and to the DuckDB oracle), but the per-pair work drops
    from three array passes to one.
    """
    a = corpus.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("_va"),
        l2_norm(F.col(vec_col)).alias("_na"),
    )
    b = corpus.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("_vb"),
        l2_norm(F.col(vec_col)).alias("_nb"),
    )
    return (
        F.broadcast(a)
        .join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            safe_cosine_expr(
                dot(F.col("_va"), F.col("_vb")), F.col("_na"), F.col("_nb")
            ).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def cosine_near_dup_pairs_blocked(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int = 8,
) -> DataFrame:
    """Exact all-pairs cosine via blocked matrix products — same result as
    :func:`cosine_near_dup_pairs`, different engine.

    Each vector goes to block ``id % n_blocks``; every unordered block pair
    (bi <= bj) becomes one applyInPandas group holding both blocks' rows,
    which scores its pairs with numpy. The fold is vectorized ACROSS pairs
    but sequential ACROSS dimensions (acc += a_k·b_k, k ascending), so every
    float op happens in the same IEEE order as the zip_with/aggregate
    expression and the DuckDB oracle — bitwise-identical sims, ~10× faster
    than the interpreted per-pair HOF at sf0.1 (27 s → ~2.5 s).

    Scale: no broadcast — rows replicate n_blocks times (choose
    n_blocks ≈ √parallelism, giving O(n·√P) shuffle) and each block pair
    is an independent task whose (m×n) score matrix bounds task memory at
    (n/n_blocks)² doubles. This is the standard distributed all-pairs
    layout; at 100 TB prefer the LSH variant unless exactness is required.
    """
    import numpy as np
    import pandas as pd

    block = F.pmod(F.col(id_col), F.lit(n_blocks)).cast("int")
    pair_keys = F.array_distinct(
        F.array(
            *[
                F.concat_ws(
                    "_",
                    F.least(block, F.lit(j)).cast("string"),
                    F.greatest(block, F.lit(j)).cast("string"),
                )
                for j in range(n_blocks)
            ]
        )
    )
    _require_integral_id(corpus, id_col, "cosine_near_dup_pairs_blocked")
    tagged = corpus.filter(_valid_vec(F.col(vec_col))).select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).alias("vec"),
        F.explode(pair_keys).alias("pair"),
    )

    def score_block_pair(pdf: pd.DataFrame) -> pd.DataFrame:
        V, ids = _stack_uniform(list(pdf["vec"]), pdf["id"].to_numpy())
        bi, bj = (int(x) for x in pdf["pair"].iloc[0].split("_"))
        blocks = ids % n_blocks

        if bi == bj:
            A, ia = V, ids
            B, ib = V, ids
        else:
            ma, mb = blocks == bi, blocks == bj
            A, ia = V[ma], ids[ma]
            B, ib = V[mb], ids[mb]
        if len(ia) == 0 or len(ib) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine_sim": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine_sim": "float64"}
            )
        sims = _safe_outer_sims(_seq_dots(A, B), _seq_norms(A), _seq_norms(B))
        # within a block (bi==bj) each unordered pair appears twice in the
        # A×B grid — keep the ia<ib triangle; across blocks it appears once
        # (blocks are disjoint), so keep all and orient id_a=min, id_b=max.
        # Cosine is bitwise-symmetric (IEEE multiply commutes), so
        # orientation is free.
        keep = sims >= threshold
        if bi == bj:
            keep &= ia[:, None] < ib[None, :]
        ai, bidx = np.nonzero(keep)
        left, right = ia[ai], ib[bidx]
        return pd.DataFrame(
            {
                "id_a": np.minimum(left, right),
                "id_b": np.maximum(left, right),
                "cosine_sim": sims[ai, bidx],
            }
        )

    return tagged.groupBy("pair").applyInPandas(
        score_block_pair, "id_a long, id_b long, cosine_sim double"
    )


def cosine_near_dup_pairs_lsh(
    corpus: DataFrame,
    threshold: float,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 4,
    num_tables: int = 4,
) -> DataFrame:
    """LSH-blocked near-duplicate pairs — the 100 TB scale path.

    Candidate pairs are limited to vectors sharing an LSH bucket in at
    least one of ``num_tables`` hash tables (OR-amplified recall), then
    verified with the exact cosine. Work drops from O(n²) to
    O(Σ_bucket |bucket|²); each (table, bucket) is one applyInPandas group
    scored with the same vectorized-across-pairs / sequential-across-dims
    numpy kernel as :func:`cosine_near_dup_pairs_blocked` (bitwise-equal
    sims to the HOF expression), then a max-agg dedupes pairs that collide
    in several tables (their sims are bitwise-identical, so max is just
    dedup). No broadcast — the corpus can be arbitrarily large; task
    memory is bounded by the largest bucket's |bucket|² score matrix, so
    cap hot buckets with more planes if the data has boilerplate clusters.
    Approximate: pairs whose vectors collide in no table are missed."""
    import numpy as np
    import pandas as pd

    _require_integral_id(corpus, id_col, "cosine_near_dup_pairs_lsh")
    tagged = corpus.filter(_valid_vec(F.col(vec_col), dim)).select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).alias("vec"),
        F.explode(
            lsh_table_keys(F.col(vec_col), dim, num_planes, num_tables)
        ).alias("bucket"),
    )

    def score_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine_sim": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine_sim": "float64"}
            )
        V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["vec"]])
        norms = _seq_norms(V)
        sims = _safe_outer_sims(_seq_dots(V, V), norms, norms)
        keep = (ids[:, None] < ids[None, :]) & (sims >= threshold)
        ai, bi = np.nonzero(keep)
        return pd.DataFrame(
            {"id_a": ids[ai], "id_b": ids[bi], "cosine_sim": sims[ai, bi]}
        )

    return (
        tagged.groupBy("bucket")
        .applyInPandas(score_bucket, "id_a long, id_b long, cosine_sim double")
        .groupBy("id_a", "id_b")
        .agg(F.max("cosine_sim").alias("cosine_sim"))
    )


def _train_centroids_driver(
    sample_vectors: list[list[float]], k: int, iters: int = 5
) -> list[list[float]]:
    """Spherical k-means on a driver-side sample (numpy, deterministic:
    sorted-sample init, fixed iteration count — no RNG). The sample is
    small (≤ a few thousand vectors) so this is O(sample·k·dim) driver
    work; the result is a list of unit-norm centroids to broadcast as
    plan literals."""
    import numpy as np

    X = np.asarray(sample_vectors, dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    C = X[:k].copy()
    for _ in range(iters):
        assign = (X @ C.T).argmax(axis=1)
        for j in range(k):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
        C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    return C.tolist()


def _usable_training_rows(id_vec_rows, train_sample, what):
    """Shared sample hygiene for every trainer entry: drop rows whose
    vector is NULL/empty (a 100 TB corpus contains them; numpy would
    otherwise die deep in the solver with a shape error), sort by id for
    determinism under any partitioning, truncate to ``train_sample``, and
    refuse an EMPTY sample with a contract error instead of the trainers'
    internal LinAlgError/AxisError."""
    usable = sorted(
        (r for r in id_vec_rows if r[1] is not None and len(r[1]) > 0),
        key=lambda r: (r[0], tuple(r[1])),
    )
    # duplicate ids collapse to their lexicographically-least vector —
    # the training sample is a SET keyed by id, and both the Spark path
    # and the oracle factories must derive the same one from raw rows
    rows = []
    for r in usable:
        if not rows or rows[-1][0] != r[0]:
            rows.append(r)
    rows = rows[:train_sample]
    if not rows:
        raise ValueError(
            f"{what} training: empty training sample (no rows with a "
            "non-null, non-empty vector) - an index cannot be trained "
            "from nothing; check the corpus/filter"
        )
    return rows


def _sorted_sample_centroids(
    id_vec_rows: list[tuple], num_lists: int, train_sample: int
) -> list[list[float]]:
    """Shared trainer entry for the Spark path AND the DuckDB oracle
    factory: sort the hash-filtered sample by id (determinism under any
    partitioning / read order), truncate to ``train_sample`` rows, train.
    Both callers feed float64-widened vectors, so the centroids are
    bit-for-bit identical however the sample was collected."""
    rows = _usable_training_rows(id_vec_rows, train_sample, "IVF")
    return _train_centroids_driver([list(r[1]) for r in rows], num_lists)


def ivf_train_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_lists: int = 16,
    train_sample: int = 1024,
    sample_fraction: float = 1.0,
) -> list[list[float]]:
    """Deterministic driver-side IVF training sample + spherical k-means.

    The sample is a hash-threshold filter (md5 of the id — reproducible
    under any partitioning and complete: the kept set is a pure per-row
    predicate, so no ordering of the corpus is ever needed). The filtered
    rows are collected and the SHARED trainer sorts/truncates them
    driver-side — the plan is scan → filter → collect, with no
    TakeOrdered heap over the corpus (the previous ``orderBy().limit()``
    made every executor heap-sort its whole partition just to pick the
    first ids). At 100 TB pass ``sample_fraction`` ≈
    train_sample/|corpus| so the collect is sample-sized; the guard below
    refuses a collect that would materialize far more than the training
    set, pointing at the knob instead of OOMing the driver."""
    rows = _collect_training_sample(
        corpus, id_col, vec_col, sample_fraction, train_sample, "IVF"
    )
    return _sorted_sample_centroids(rows, num_lists, train_sample)


def cosine_topk_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_lists: int = 16,
    nprobe: int = 4,
    train_sample: int = 1024,
    sample_fraction: float = 1.0,
) -> DataFrame:
    """IVF-Flat approximate cosine top-k — the cluster-pruned ANN path.

    Index: spherical k-means centroids trained driver-side on a
    deterministic hash-threshold sample (:func:`ivf_train_centroids` — no
    TakeOrdered over the corpus), then each corpus vector is assigned to
    its nearest centroid's inverted list via an Arrow-batched projection
    (centroids are closure constants — no side table, no join for the
    assignment). Query: probe the ``nprobe`` nearest lists and score each
    list group's query×candidate rectangle exactly with the
    sequential-across-dims kernel (sims bitwise-equal to brute force),
    cutting scored candidates to ~nprobe/num_lists of the corpus.

    Every float decision (training means, assignment dots, probe ranking,
    final sims) uses sequential-across-dims accumulation, so the DuckDB
    oracle — given the same centroid literals — reproduces the exact
    candidate sets and scores via LIST_DOT_PRODUCT.

    Scale: the candidate grouping shuffles the corpus once on the list
    id — at 100 TB the corpus-side assignment would be precomputed once
    and stored as a partition column so probes become partition pruning.
    Approximate: misses neighbors whose list isn't probed."""
    import numpy as np

    _require_integral_id(queries, id_col, "cosine_topk_ivf")
    _require_integral_id(corpus, id_col, "cosine_topk_ivf")
    centroids = ivf_train_centroids(
        corpus, id_col, vec_col, num_lists, train_sample, sample_fraction
    )
    C = np.asarray(centroids, dtype=np.float64)  # (k, dim)
    dim = C.shape[1]

    @F.pandas_udf("int")
    def assign_list(vs: pd.Series) -> pd.Series:
        V = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        return pd.Series((_seq_dots(V, C).argmax(axis=1) + 1).astype("int32"))

    @F.pandas_udf("array<int>")
    def probe_lists(vs: pd.Series) -> pd.Series:
        V = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        # stable sort: equal dots keep ascending list order, matching the
        # oracle's ORDER BY dp DESC, list_id ASC tie-break
        order = np.argsort(-_seq_dots(V, C), axis=1, kind="stable")[:, :nprobe] + 1
        return pd.Series([row.astype("int32").tolist() for row in order])

    c = corpus.filter(_valid_vec(F.col(vec_col), dim)).select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).alias("vec"),
        F.lit("c").alias("side"),
        assign_list(F.col(vec_col)).alias("_list"),
    )
    q = queries.filter(_valid_vec(F.col(vec_col), dim)).select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).alias("vec"),
        F.lit("q").alias("side"),
        F.explode(probe_lists(F.col(vec_col))).alias("_list"),
    )
    # no max-agg dedup needed: each corpus vector lives in exactly one
    # list, so a (query, candidate) pair is scored at most once
    scored = q.unionByName(c).groupBy("_list").applyInPandas(
        _score_rect_group, _RECT_SCHEMA
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine_sim")
    )


def semantic_dedup_pairs(
    corpus: DataFrame,
    centroids: list[list[float]],
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public):
    cluster the embedding space with (externally trained, deterministic)
    k-means centroids, then search for near-duplicate pairs ONLY within
    each cluster — the candidate set drops from O(n²) to
    O(Σ_cluster |cluster|²) on the bet that semantic duplicates share a
    centroid. The returned pairs (``cluster, id_a, id_b, cosine_sim``
    with ``id_a < id_b`` and sim ≥ threshold) feed the same
    components→representatives chain as the text dedup path
    (operators/dedup.py).

    Assignment is an Arrow-batched argmax against centroid closure
    constants (no join); each cluster group scores its pairs with the
    vectorized-across-pairs / sequential-across-dims kernel, so sims are
    bitwise-equal to the exact HOF form and the DuckDB oracle.

    Scale: one shuffle of the corpus on the cluster id; task memory is
    bounded by the largest cluster's score matrix — for 100 TB raise the
    centroid count so clusters stay bucket-sized (SemDeDup uses ~100k
    clusters at web scale), or recurse: re-cluster any oversized cluster.
    Approximate by design: cross-cluster duplicate pairs are missed."""
    import numpy as np

    _require_integral_id(corpus, id_col, "semantic_dedup_pairs")
    C = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf("int")
    def assign_cluster(vs: pd.Series) -> pd.Series:
        V = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        return pd.Series((_seq_dots(V, C).argmax(axis=1) + 1).astype("int32"))

    tagged = corpus.filter(_valid_vec(F.col(vec_col), C.shape[1])).select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).alias("vec"),
        assign_cluster(F.col(vec_col)).alias("cluster"),
    )

    def score_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id"].to_numpy()
        empty = pd.DataFrame(
            {"cluster": [], "id_a": [], "id_b": [], "cosine_sim": []}
        ).astype(
            {
                "cluster": "int32",
                "id_a": "int64",
                "id_b": "int64",
                "cosine_sim": "float64",
            }
        )
        if len(ids) < 2:
            return empty
        V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["vec"]])
        norms = _seq_norms(V)
        sims = _safe_outer_sims(_seq_dots(V, V), norms, norms)
        keep = (ids[:, None] < ids[None, :]) & (sims >= threshold)
        ai, bi = np.nonzero(keep)
        if len(ai) == 0:
            return empty
        return pd.DataFrame(
            {
                "cluster": np.full(len(ai), pdf["cluster"].iloc[0], dtype="int32"),
                "id_a": ids[ai],
                "id_b": ids[bi],
                "cosine_sim": sims[ai, bi],
            }
        )

    return tagged.groupBy("cluster").applyInPandas(
        score_cluster, "cluster int, id_a long, id_b long, cosine_sim double"
    )


def embedding_profile(df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Per-vector stats: dimension, L2 norm, min/max element."""
    v = F.col(vec_col).cast("array<double>")
    return df.select(
        F.col(id_col),
        F.size(vec_col).alias("dim"),
        l2_norm(F.col(vec_col)).alias("l2_norm"),
        F.array_min(v).alias("min_val"),
        F.array_max(v).alias("max_val"),
    )


def _pca_components_driver(
    vectors: list[list[float]], n_components: int
) -> tuple[list[float], list[list[float]]]:
    """Deterministic PCA training: column mean + the top ``n_components``
    eigenvectors of the (uncentered-scale) scatter matrix XᵀX, computed
    with float64 numpy — one BLAS gramian + one symmetric eigensolve on a
    sample-sized matrix, identical however the sample reached the driver.
    Each eigenvector's sign is fixed by making its largest-|component|
    coordinate positive (eigenvectors are defined up to sign; without the
    fix two runs could disagree by a global flip)."""
    import numpy as np

    X = np.asarray(vectors, dtype=np.float64)
    mean = X.mean(axis=0)
    Xc = X - mean
    scatter = Xc.T @ Xc
    _, eigvecs = np.linalg.eigh(scatter)  # ascending eigenvalues
    comps: list[list[float]] = []
    for k in range(1, n_components + 1):
        v = eigvecs[:, -k]
        j = int(np.argmax(np.abs(v)))
        if v[j] < 0:
            v = -v
        comps.append([float(x) for x in v])
    return [float(m) for m in mean], comps


def _sorted_sample_pca(
    id_vec_rows: list[tuple], n_components: int, train_sample: int
) -> tuple[list[float], list[list[float]]]:
    """Shared PCA trainer entry for the Spark path AND the DuckDB oracle
    factory — same sort/truncate contract as
    :func:`_sorted_sample_centroids`."""
    rows = _usable_training_rows(id_vec_rows, train_sample, "PCA")
    return _pca_components_driver([list(r[1]) for r in rows], n_components)


def pca_train_components(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_components: int = 2,
    train_sample: int = 1024,
    sample_fraction: float = 1.0,
) -> tuple[list[float], list[list[float]]]:
    """Driver-side deterministic PCA training over a hash-threshold
    sample — identical collect contract (and OOM guard) to
    :func:`ivf_train_centroids`: the plan is scan → filter → collect,
    no TakeOrdered over the corpus; at 100 TB pass ``sample_fraction``
    ≈ train_sample/|corpus| so only the sample reaches the driver.
    Returns (mean, components)."""
    rows = _collect_training_sample(
        corpus, id_col, vec_col, sample_fraction, train_sample, "PCA"
    )
    return _sorted_sample_pca(
        rows, n_components, train_sample
    )


def pca_project(
    corpus: DataFrame,
    mean: list[float],
    components: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Project every vector onto the given principal components — a
    map-only JVM projection (components are closure literals: no join,
    no shuffle, no Python). Each projection is a LEFT-ASSOCIATIVE sum of
    per-dimension terms ``(e_i − mean_i)·v_i`` so the float result is
    bitwise-reproducible in any engine that evaluates the same chain
    (the DuckDB oracle renders the identical ``+`` chain). Output
    columns ``pc{k}_q`` are nano-quantized."""
    from functools import reduce
    from operator import add

    from etl_manager_spark.operators.ranking import quantize

    vec = F.col(vec_col).cast("array<double>")
    cols = [F.col(id_col)]
    for k, comp in enumerate(components, start=1):
        terms = [
            (F.element_at(vec, i + 1) - F.lit(mean[i])) * F.lit(comp[i])
            for i in range(len(comp))
        ]
        cols.append(quantize(reduce(add, terms)).alias(f"pc{k}_q"))
    return corpus.select(*cols)


def _train_pq_codebooks(
    vectors: list[list[float]],
    num_subspaces: int,
    num_centroids: int,
    iters: int = 10,
) -> list[list[list[float]]]:
    """Deterministic product-quantization training: split each vector
    into ``num_subspaces`` contiguous subvectors and run fixed-iteration
    L2 Lloyd per subspace. Init = the first ``num_centroids`` DISTINCT
    subvectors in sample order (no RNG); numpy argmin breaks ties to the
    lowest centroid index — every step is a pure function of the sorted
    sample, so the Spark path and the oracle factory train bit-for-bit
    identical codebooks."""
    import numpy as np

    X = np.asarray(vectors, dtype=np.float64)
    _, dim = X.shape
    assert dim % num_subspaces == 0, (dim, num_subspaces)
    d = dim // num_subspaces
    books: list[list[list[float]]] = []
    for m in range(num_subspaces):
        S = X[:, m * d : (m + 1) * d]
        seen: set = set()
        init: list = []
        for row in S:
            t = tuple(row)
            if t not in seen:
                seen.add(t)
                init.append(row)
            if len(init) == num_centroids:
                break
        C = np.array(init, dtype=np.float64)
        if len(C) < num_centroids:
            C = np.vstack([C] + [C[:1]] * (num_centroids - len(C)))
        for _ in range(iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for k in range(num_centroids):
                members = S[assign == k]
                if len(members):
                    C[k] = members.mean(axis=0)
        books.append([[float(x) for x in c] for c in C])
    return books


def _sorted_sample_pq(
    id_vec_rows: list[tuple],
    num_subspaces: int,
    num_centroids: int,
    train_sample: int,
) -> list[list[list[float]]]:
    """Shared PQ trainer entry (same sort/truncate contract as the IVF
    and PCA trainers) for the Spark path AND the DuckDB oracle."""
    rows = _usable_training_rows(id_vec_rows, train_sample, "PQ")
    return _train_pq_codebooks(
        [list(r[1]) for r in rows], num_subspaces, num_centroids
    )


# bump to invalidate any stored PQ index (codebooks + codes) when the
# training or encode arithmetic changes
# v2: stored codes are built over the DISTINCT valid-vector corpus set
PQ_ALGO_VERSION = 2


def pq_train_codebooks(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_subspaces: int = 8,
    num_centroids: int = 8,
    train_sample: int = 1024,
    sample_fraction: float = 1.0,
) -> list[list[list[float]]]:
    """Driver-side PQ training over the deterministic hash-threshold
    sample — same collect contract and OOM guard as
    :func:`ivf_train_centroids`."""
    rows = _collect_training_sample(
        corpus, id_col, vec_col, sample_fraction, train_sample, "PQ"
    )
    return _sorted_sample_pq(
        rows, num_subspaces, num_centroids, train_sample
    )


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization encoding: per subspace, the nearest-codeword
    index (squared-L2 argmin with lowest-index tie-break via struct
    ordering) plus the total reconstruction error — the 8× – 32×
    embedding-compression step of a 100 TB similarity index. Codebooks
    are closure literals: the whole encode is a map-only JVM projection
    (no join, no shuffle, no Python); every distance folds
    dimension-sequentially and the subspace errors add in subspace
    order, so the DuckDB oracle reproduces codes AND error bitwise."""
    from functools import reduce
    from operator import add

    from etl_manager_spark.functions.exact import lit_double_matrix
    from etl_manager_spark.operators.ranking import quantize

    d = len(codebooks[0][0])
    # direct array cast, NOT transform(x -> cast): a lambda here nests
    # inside the per-subspace transform below and Spark's lambda-variable
    # binding rejects the shadowed variables
    vv = F.col(vec_col).cast("array<double>")
    # ONE transform per subspace over the codebook-as-literal-array —
    # M expressions total, not M·K struct expressions (the per-codeword
    # struct form built 512 lambda trees for 16×32 and Catalyst spent
    # ~20 s per query analyzing them at ANY data size; this form plans
    # in well under a second with identical per-dimension float ops)
    def _subspace_costs(sub: Column, book_lit: Column) -> Column:
        # single-arg lambda on purpose: a second (defaulted) parameter
        # makes pyspark pass transform's (element, index) form and the
        # index variable would silently replace the subvector
        return F.transform(
            book_lit,
            lambda c: F.aggregate(
                F.zip_with(sub, c, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )

    cost_cols = []
    for m, book in enumerate(codebooks):
        sub = F.slice(vv, m * d + 1, d)
        book_lit = lit_double_matrix(book)
        cost_cols.append(
            _subspace_costs(sub, book_lit).alias(f"_costs_{m}")
        )
    base = corpus.select(F.col(id_col), *cost_cols)
    sel = [F.col(id_col)]
    recon_terms = []
    for m in range(len(codebooks)):
        mind = F.array_min(F.col(f"_costs_{m}"))
        # array_position returns the FIRST index holding the min —
        # the same lowest-codeword tie-break as the struct ordering
        sel.append(
            (F.array_position(F.col(f"_costs_{m}"), mind) - 1)
            .cast("int")
            .alias(f"code_{m}")
        )
        recon_terms.append(mind)
    sel.append(quantize(reduce(add, recon_terms)).alias("recon_err_q"))
    return base.select(*sel)


def pq_adc_luts(
    query_vecs: list[list[float]], codebooks: list[list[list[float]]]
) -> list[list[list[float]]]:
    """Asymmetric-distance lookup tables: for each query, per subspace,
    the squared L2 distance from the query's subvector to every codeword
    — the tiny (queries × M × K doubles) table that makes PQ search a
    pure table-lookup sum. Computed with an explicit sequential fold so
    the values are a deterministic function of (queries, codebooks);
    both the Spark plan and the DuckDB oracle consume these values AS
    LITERALS, so engine-side arithmetic starts from identical doubles."""
    d = len(codebooks[0][0])
    luts: list[list[list[float]]] = []
    for q in query_vecs:
        per_m: list[list[float]] = []
        for m, book in enumerate(codebooks):
            sub = q[m * d : (m + 1) * d]
            row = []
            for c in book:
                acc = 0.0
                for a, b in zip(sub, c):
                    diff = a - b
                    acc = acc + diff * diff
                row.append(acc)
            per_m.append(row)
        luts.append(per_m)
    return luts


def mmr_select(
    cands_with_pairs: DataFrame,
    k: int = 5,
    lam: float = 0.7,
) -> DataFrame:
    """Maximal-marginal-relevance selection over per-query candidate
    sets: greedily pick the candidate maximizing
    ``λ·sim(q,c) − (1−λ)·max_{s∈S} sim(c,s)`` (ties → smallest id; the
    first pick's diversity term is 0). Input is the flattened
    (query_id, a_nid, a_simq, b_nid, sim_ab) pair table — ALL sims are
    computed JVM-side with the exact kernel BEFORE this step, so the
    Arrow loop only does comparisons and two multiplies per score and
    the result is bitwise-reproducible (the DuckDB oracle unrolls the
    same k argmax steps over the same sims).

    A candidate with NO pair rows (a single-candidate shortlist) rides
    in as a ``b_nid``-null row — callers join the pair table LEFT so the
    query still emits its one pick instead of silently vanishing. A pair
    present in only one orientation is looked up both ways; a genuinely
    missing pair raises with the offending ids (the rectangle contract
    is enforced with a message, not an executor KeyError).

    Scale: the loop is inherently sequential per query, but its input is
    the candidate SHORTLIST (k²·queries pair rows, not corpus-sized) —
    one shuffle on query_id into the Arrow stage."""
    import math

    import pandas as pd

    def _select(group: pd.DataFrame) -> pd.DataFrame:
        qid = int(group["query_id"].iloc[0])
        simq: dict = {}
        sim_ab: dict = {}
        for r in group.itertuples():
            simq[int(r.a_nid)] = float(r.a_simq)
            if r.b_nid is not None and not pd.isna(r.b_nid):
                sim_ab[(int(r.a_nid), int(r.b_nid))] = float(r.sim_ab)

        def pair_sim(c, s):
            v = sim_ab.get((c, s))
            if v is None:
                v = sim_ab.get((s, c))
            if v is None:
                raise ValueError(
                    f"mmr_select: query {qid} is missing the pair sim for "
                    f"({c}, {s}) in either orientation — the input must "
                    "carry the full candidate×candidate rectangle"
                )
            return v

        remaining = sorted(simq)
        selected: list = []
        out = []
        while remaining and len(selected) < k:
            best = None
            for c in remaining:  # ascending id → ties keep smallest
                if selected:
                    # true max over selected — NEGATIVE sims stay
                    # negative (an anti-similar pick is a diversity
                    # bonus under standard MMR, not clamped to 0)
                    mx = max(pair_sim(c, s) for s in selected)
                else:
                    mx = 0.0
                score = lam * simq[c] - (1.0 - lam) * mx
                if best is None or score > best[0]:
                    best = (score, c)
            score, pick = best
            selected.append(pick)
            remaining.remove(pick)
            out.append(
                (
                    qid,
                    len(selected),
                    pick,
                    int(math.floor(score * 1000000000.0 + 0.5)),
                )
            )
        return pd.DataFrame(
            out, columns=["query_id", "mmr_rank", "neighbor_id", "mmr_score_q"]
        )

    return cands_with_pairs.groupBy("query_id").applyInPandas(
        _select,
        schema="query_id long, mmr_rank int, neighbor_id long, mmr_score_q long",
    )
