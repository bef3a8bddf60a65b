"""Graph-analytics workloads over the near-duplicate pair graph.

The MinHash→LSH→verify chain (workloads/pipeline.py) yields an edge
list; these queries answer structural questions about it with
operators/graph.py. Both oracles rebuild the identical pair set with the
shared ``_MINHASH_PAIRS_CTES`` SQL, so engine and oracle agree on the
graph before any graph math starts. PageRank follows the house float
discipline: per-edge contributions are nano-quantized to int64 before
summation, so the per-node reduction is exact integer arithmetic and the
unrolled-SQL replay is bitwise-identical.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_manager_spark.operators import graph as G
from etl_manager_spark.operators.ranking import quantize
from etl_manager_spark.workloads import workload
from etl_manager_spark.workloads.pipeline import (
    _MINHASH_PAIRS_CTES,
    neardup_pairs_stored,
)

_PR_DAMPING = 0.85
_PR_BASE = repr(1.0 - _PR_DAMPING)  # exact IEEE literal, matches F.lit math


def _neardup_pairs(spark, sf_dir):
    """Stored per-fixture edge table (pipeline.neardup_pairs_stored).

    Graph analytics reference the edge list several times in one plan
    (a triangle enumeration joins it against itself three ways, then
    explodes corners); reading a materialized pair table makes each
    reference a cheap columnar scan instead of a replay of the full
    shingle→minhash→band→verify chain. At 100 TB the pair table is
    maintained incrementally by the dedup pipeline — analytics never
    re-mine pairs."""
    return neardup_pairs_stored(spark, sf_dir)


@workload(
    "triangle_support_neardup",
    f"""
    WITH {_MINHASH_PAIRS_CTES},
    edges AS (SELECT id_a AS a, id_b AS b FROM dup_pairs),
    tri AS (
      SELECT ab.a, ab.b, bc.b AS c
      FROM edges ab
      JOIN edges bc ON ab.b = bc.a
      JOIN edges ac ON ac.a = ab.a AND ac.b = bc.b
    ),
    corners AS (
      SELECT a AS id FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    )
    SELECT id AS doc_id, COUNT(*) AS n_triangles
    FROM corners GROUP BY id
    """,
    category="graph",
)
def triangle_support_neardup(spark, sf_dir):
    """Per-document triangle support in the near-duplicate graph
    (operators/graph.py: triangle_counts). High support = clique-like
    duplicate cluster (safe to collapse); support 0 on a component =
    chain of borderline matches worth auditing before deletion. The
    oracle rebuilds the same edge list via the shared MinHash CTEs and
    enumerates each a<b<c triangle once with the same two-join pattern."""
    return G.triangle_counts(_neardup_pairs(spark, sf_dir)).select(
        F.col("id").alias("doc_id"), "n_triangles"
    )


@workload(
    "pagerank_neardup_graph",
    f"""
    WITH {_MINHASH_PAIRS_CTES},
    sym AS (
      SELECT id_a AS src, id_b AS dst FROM dup_pairs
      UNION
      SELECT id_b AS src, id_a AS dst FROM dup_pairs
    ),
    deg AS (SELECT src, COUNT(*) AS deg FROM sym GROUP BY src),
    e AS (SELECT s.src, s.dst, d.deg FROM sym s JOIN deg d ON d.src = s.src),
    r1 AS (
      SELECT e.dst AS id,
             {_PR_BASE} + {_PR_DAMPING!r} * (SUM(CAST(FLOOR(
               1.0 / e.deg * 1000000000.0 + 0.5) AS BIGINT)) / 1000000000.0) AS r
      FROM e GROUP BY e.dst
    ),
    r2 AS (
      SELECT e.dst AS id,
             {_PR_BASE} + {_PR_DAMPING!r} * (SUM(CAST(FLOOR(
               r1.r / e.deg * 1000000000.0 + 0.5) AS BIGINT)) / 1000000000.0) AS r
      FROM e JOIN r1 ON r1.id = e.src GROUP BY e.dst
    ),
    r3 AS (
      SELECT e.dst AS id,
             {_PR_BASE} + {_PR_DAMPING!r} * (SUM(CAST(FLOOR(
               r2.r / e.deg * 1000000000.0 + 0.5) AS BIGINT)) / 1000000000.0) AS r
      FROM e JOIN r2 ON r2.id = e.src GROUP BY e.dst
    )
    SELECT id AS doc_id,
           CAST(FLOOR(r * 1000000000.0 + 0.5) AS BIGINT) AS rank_q
    FROM r3
    """,
    category="graph",
)
def pagerank_neardup_graph(spark, sf_dir):
    """Three PageRank iterations over the near-dup graph
    (operators/graph.py: pagerank_quantized) — central nodes are the
    boilerplate "templates" many documents echo. Contributions are
    int64-quantized before each per-node sum, so every iteration is
    exact integer arithmetic and the oracle replays the whole
    trajectory as three unrolled SQL aggregations, bit-for-bit."""
    ranks = G.pagerank_quantized(
        _neardup_pairs(spark, sf_dir), iterations=3, damping=_PR_DAMPING
    )
    return ranks.select(
        F.col("id").alias("doc_id"), quantize(F.col("rank")).alias("rank_q")
    )


@workload(
    "clustering_coefficient_neardup",
    f"""
    WITH {_MINHASH_PAIRS_CTES},
    edges AS (SELECT id_a AS a, id_b AS b FROM dup_pairs),
    tri AS (
      SELECT ab.a, ab.b, bc.b AS c
      FROM edges ab
      JOIN edges bc ON ab.b = bc.a
      JOIN edges ac ON ac.a = ab.a AND ac.b = bc.b
    ),
    corners AS (
      SELECT a AS id FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    ),
    tcnt AS (SELECT id, COUNT(*) AS n_tri FROM corners GROUP BY id),
    sym AS (
      SELECT a AS id, b AS nb FROM edges
      UNION ALL SELECT b, a FROM edges
    ),
    deg AS (SELECT id, COUNT(*) AS deg FROM sym GROUP BY id)
    SELECT d.id AS doc_id, CAST(d.deg AS BIGINT) AS degree,
           CAST(COALESCE(t.n_tri, 0) AS BIGINT) AS n_triangles,
           CAST(FLOOR(2.0 * COALESCE(t.n_tri, 0)
                      / (d.deg * (d.deg - 1))
                      * 1000000000.0 + 0.5) AS BIGINT) AS clustering_q
    FROM deg d LEFT JOIN tcnt t ON t.id = d.id
    WHERE d.deg >= 2
    """,
    category="graph",
)
def clustering_coefficient_neardup(spark, sf_dir):
    """Local clustering coefficient per node of the near-dup graph:
    ``2·triangles / (deg·(deg−1))`` — 1.0 marks a node whose neighbors
    form a clique (a true duplicate cluster, safe to collapse by
    representative), near-0 marks a hub threading otherwise-unrelated
    documents (a boilerplate template, NOT a dedup group). Triangle and
    degree counts are exact integers; the coefficient is a single
    double division, quantized — portable by construction. Shape: the
    triangle two-join plus one degree aggregate, all keyed on node
    ids."""
    pairs = _neardup_pairs(spark, sf_dir)
    tri = G.triangle_counts(pairs)
    sym = pairs.select(
        F.col("id_a").alias("id"), F.col("id_b").alias("nb")
    ).unionAll(
        pairs.select(F.col("id_b").alias("id"), F.col("id_a").alias("nb"))
    )
    deg = sym.groupBy("id").agg(F.count(F.lit(1)).alias("degree"))
    ntri = F.coalesce(F.col("n_triangles"), F.lit(0))
    return (
        deg.join(tri, on="id", how="left")
        .filter(F.col("degree") >= 2)
        .select(
            F.col("id").alias("doc_id"),
            F.col("degree").cast("long").alias("degree"),
            ntri.cast("long").alias("n_triangles"),
            quantize(
                F.lit(2.0)
                * ntri
                / (F.col("degree") * (F.col("degree") - 1))
            ).alias("clustering_q"),
        )
    )


@workload(
    "assortativity_neardup_graph",
    f"""
    WITH {_MINHASH_PAIRS_CTES},
    sym AS (
      SELECT DISTINCT u, v FROM (
        SELECT id_a AS u, id_b AS v FROM dup_pairs
        UNION ALL SELECT id_b, id_a FROM dup_pairs
      )
    ),
    deg AS (SELECT u, COUNT(*) AS deg FROM sym GROUP BY u),
    ends AS (
      SELECT du.deg AS dx, dv.deg AS dy
      FROM sym s JOIN deg du ON du.u = s.u JOIN deg dv ON dv.u = s.v
    ),
    m AS (
      SELECT COUNT(*) AS n, SUM(dx) AS sx, SUM(dy) AS sy,
             SUM(dx * dx) AS sxx, SUM(dy * dy) AS syy,
             SUM(dx * dy) AS sxy
      FROM ends
    )
    SELECT CAST(n / 2 AS BIGINT) AS n_edges,
           CAST(FLOOR(
             CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE)
                       * CAST(n * syy - sy * sy AS DOUBLE) = 0 THEN 0.0
                  ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                       / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                          * SQRT(CAST(n * syy - sy * sy AS DOUBLE)))
             END * 1000000000.0 + 0.5) AS BIGINT) AS r_q
    FROM m
    """,
    category="graph",
)
def assortativity_neardup_graph(spark, sf_dir):
    """Degree assortativity of the near-duplicate graph
    (operators/graph.py: degree_assortativity): the Pearson correlation
    between endpoint degrees over the symmetrized edge list. Positive —
    duplicates clump into cliques (collapse whole clusters); negative —
    hub-and-spoke boilerplate templates (drop the hub, keep the
    leaves). The five degree moments are exact integer sums; the
    coefficient is one guarded IEEE expression over them, identical
    text in the oracle. Reads the stored per-fixture pair table."""
    return G.degree_assortativity(_neardup_pairs(spark, sf_dir))


@workload(
    "bfs_distance_neardup",
    f"""
    WITH RECURSIVE {_MINHASH_PAIRS_CTES},
    sym AS (
      SELECT id_a AS src, id_b AS dst FROM dup_pairs
      UNION
      SELECT id_b AS src, id_a AS dst FROM dup_pairs
    ),
    s AS (SELECT MIN(src) AS s FROM sym),
    reach(id, d) AS (
      SELECT s, 0 FROM s WHERE s IS NOT NULL
      UNION
      SELECT e.dst, r.d + 1
      FROM sym e JOIN reach r ON e.src = r.id
      WHERE r.d < 20
    )
    SELECT id AS doc_id, CAST(MIN(d) AS INTEGER) AS dist
    FROM reach GROUP BY id
    """,
    category="graph",
)
def bfs_distance_neardup(spark, sf_dir):
    """Unweighted shortest-path distances from the lowest-id node of the
    near-dup graph (operators/graph.py: bfs_distances) — "how many hops
    does this template propagate" in the duplicate topology, and the
    fourth iterative-graph shape next to label propagation, star
    contraction, and PageRank. Frontier-only expansion: each round joins
    the LAST layer (not all visited nodes) against the checkpointed edge
    list and anti-joins the visited set; rounds = source eccentricity.
    The oracle is recursive-CTE reachability with per-node minimum
    depth, capped at the same max depth. Reads the stored per-fixture
    pair table; the O(1) source-id lookup is one driver-side min."""
    pairs = _neardup_pairs(spark, sf_dir)
    source = pairs.agg(
        F.min(F.least(F.col("id_a"), F.col("id_b")))
    ).collect()[0][0]
    if source is None:
        # empty graph: no source to walk from — zero rows, matching the
        # oracle's NULL-guarded seed (seeding a NULL id would crash the
        # non-nullable frontier schema)
        return pairs.select(
            F.col("id_a").alias("doc_id"), F.lit(0).cast("int").alias("dist")
        ).filter(F.lit(False))
    return G.bfs_distances(pairs, source).select(
        F.col("id").alias("doc_id"), "dist"
    )
