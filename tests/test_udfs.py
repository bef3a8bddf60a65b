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


def test_weighted_mean_cents_guards(spark):
    import pytest
    """Round-8 review: fractional weights raised (they silently truncated
    before), non-finite values raise (INT64_MIN garbage before), and a
    zero/empty usable weight sum returns SQL NULL, not NaN."""
    from pyspark.sql import functions as F

    from etl_manager_spark.functions.udfs import weighted_mean_cents

    d = spark.createDataFrame([("a", 1.0, 2.0)], "g string, v double, w double")
    with pytest.raises(Exception, match="integral"):
        d.groupBy("g").agg(
            weighted_mean_cents("v", F.col("w") + 0.5).alias("m")
        ).collect()
    inf = spark.createDataFrame(
        [("a", float("inf"), 1.0)], "g string, v double, w double"
    )
    with pytest.raises(Exception, match="non-finite"):
        inf.groupBy("g").agg(weighted_mean_cents("v", "w").alias("m")).collect()
    nulls = spark.createDataFrame([("a", None, None)], "g string, v double, w double")
    r = nulls.groupBy("g").agg(weighted_mean_cents("v", "w").alias("m")).collect()
    assert r[0].m is None


def test_label_centroids_carry_label_type(spark):
    from etl_manager_spark.functions.udfs import label_centroids

    big = spark.createDataFrame(
        [(2**32 + 5, [1.0, 2.0], 1), (2**32 + 5, [3.0, 4.0], 2)],
        "label long, embedding array<double>, vec_id long",
    )
    r = label_centroids(big).collect()[0]
    assert r.label == 2**32 + 5 and r.centroid == [2.0, 3.0]
    s = spark.createDataFrame([("x", [1.0], 1)], "label string, embedding array<double>, vec_id long")
    assert label_centroids(s).collect()[0].label == "x"


def test_typed_empty_literal_arrays(spark):
    from etl_manager_spark.functions.exact import (
        lit_double_array,
        lit_double_matrix,
        lit_long_array,
    )

    df = spark.range(1).select(
        lit_double_array([]).alias("d"),
        lit_long_array([]).alias("l"),
        lit_double_matrix([[1.0], []]).alias("m"),
    )
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert types == {
        "d": "array<double>",
        "l": "array<bigint>",
        "m": "array<array<double>>",
    }
