"""Property tests for the two-pass heavy-hitter operator: on ANY value
distribution and ANY partitioning, the result must equal the exact
GROUP BY + HAVING answer — the candidate phase may only widen the
superset, never lose a true heavy hitter (the averaging-argument
guarantee in operators/frequency.py)."""

import random

import pytest
from pyspark.sql import functions as F

from etl_manager_spark.operators.frequency import heavy_hitters_two_pass


def _exact(df, k):
    n = df.count()
    return {
        (r.tok, r.cnt)
        for r in df.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt").cast("double") > n / (k + 1))
        .collect()
    }


@pytest.mark.parametrize("seed,parts,k", [(1, 3, 4), (2, 8, 6), (3, 16, 3)])
def test_heavy_hitters_equals_exact_on_random_zipf(spark, seed, parts, k):
    rng = random.Random(seed)
    # Zipf-ish: value i drawn with weight 1/(i+1); ~40 distinct values
    vals = rng.choices(
        [f"v{i}" for i in range(40)],
        weights=[1.0 / (i + 1) for i in range(40)],
        k=600,
    )
    df = spark.createDataFrame([(v,) for v in vals], "tok string").repartition(
        parts
    )
    got = {
        (r.tok, r.cnt)
        for r in heavy_hitters_two_pass(df, "tok", k=k).collect()
    }
    assert got == _exact(df, k)


def test_heavy_hitters_single_value_and_empty(spark):
    one = spark.createDataFrame([("x",)] * 10, "tok string")
    assert {
        (r.tok, r.cnt) for r in heavy_hitters_two_pass(one, "tok", k=2).collect()
    } == {("x", 10)}
    empty = spark.createDataFrame([], "tok string")
    assert heavy_hitters_two_pass(empty, "tok", k=2).collect() == []
    with pytest.raises(ValueError):
        heavy_hitters_two_pass(one, "tok", k=0)
