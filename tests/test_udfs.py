"""Vectorized UDF property tests: quantization round-trip error bound and
centroid agreement with the JVM-side mean."""

import math

from pyspark.sql import functions as F

from etl_manager_spark.functions.udfs import label_centroids, quantized_embeddings
from etl_manager_spark.workloads.tables import load_table


def test_quantize_roundtrip_error_bound(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = quantized_embeddings(emb)
    joined = emb.join(q, on="vec_id").select("vec_id", "embedding", "q_embedding")
    for row in joined.limit(50).collect():
        x = [float(v) for v in row.embedding]
        peak = max(abs(v) for v in x) or 1.0
        deq = [b * peak / 127.0 for b in row.q_embedding]
        # max quantization error is half a step
        step = peak / 127.0
        assert all(abs(a - b) <= step / 2 + 1e-12 for a, b in zip(x, deq)), row.vec_id
        assert all(-127 <= b <= 127 for b in row.q_embedding)


def test_label_centroids_match_hof_mean(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    got = {r.label: (r.n, list(r.centroid)) for r in label_centroids(emb).collect()}

    # JVM-side reference: elementwise sum via aggregate+zip_with, / count
    dim = len(emb.first().embedding)
    agg = (
        emb.select("label", F.col("embedding").cast("array<double>").alias("v"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.aggregate(
                F.collect_list("v"),
                F.array(*[F.lit(0.0)] * dim),
                lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
            ).alias("vsum"),
        )
    )
    want = {
        r.label: (r.n, [s / r.n for s in r.vsum]) for r in agg.collect()
    }
    assert set(got) == set(want)
    for label in want:
        n_got, c_got = got[label]
        n_want, c_want = want[label]
        assert n_got == n_want
        assert all(
            math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
            for a, b in zip(c_got, c_want)
        ), label
