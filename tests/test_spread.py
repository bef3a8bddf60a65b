"""spread() split-count estimation (workloads/tables.py): the probe must
replay Spark's FilePartition math over local file sizes — a raw file
count is wrong in both directions (many small files pack into few task
partitions; one big file splits into many)."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_manager_spark.workloads.tables import spread


def test_single_small_file_is_spread(spark, tmp_path):
    p = str(tmp_path / "one")
    spark.range(1000).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    out = spread(df, spark, min_partitions=8)
    assert out.rdd.getNumPartitions() == 8
    assert out.count() == 1000


def test_many_small_files_still_spread_to_target(spark, tmp_path):
    """16 tiny files pack into FEW task partitions under openCost
    padding; a file-count probe would call them 'already spread' and
    leave a per-row-heavy stage underparallelized. The size-based
    estimate must still repartition when the estimated split count is
    below the target."""
    p = str(tmp_path / "many")
    spark.range(1600).repartition(16).write.parquet(p)
    df = spark.read.parquet(p)
    # 16 files of a few KB each: padded total ≈ 16 × 4 MB = 64 MB;
    # Spark packs those into ≈ defaultParallelism partitions, so against
    # a much larger target the estimate must trigger the repartition
    target = spark.sparkContext.defaultParallelism * 8
    out = spread(df, spark, min_partitions=target)
    assert out.rdd.getNumPartitions() == target


def test_estimate_matches_spark_actual_partitions(spark, tmp_path):
    """The estimator's no-op decision must agree with Spark's OWN scan
    partitioning: when the estimate says 'already spread', the actual
    scan partition count is at least the target too (so the no-op never
    leaves cores idle)."""
    p = str(tmp_path / "agree")
    spark.range(20000).repartition(12).write.parquet(p)
    df = spark.read.parquet(p)
    actual = df.rdd.getNumPartitions()
    out = spread(df, spark, min_partitions=actual)
    # estimate >= actual here (padding counts whole openCost per file),
    # so spread() must no-op — identical plan object
    assert out is df


def test_non_scan_plan_still_spreads(spark):
    df = spark.range(64).select((F.col("id") * 2).alias("v")).coalesce(1)
    out = spread(df, spark, min_partitions=4)
    assert out.rdd.getNumPartitions() == 4


def test_size_conf_parses_spark_suffix_syntax(spark, tmp_path):
    """A session configured with size-suffixed values ('128m' — valid
    Spark syntax) must not raise inside spread()'s split probe."""
    from etl_manager_spark.workloads.tables import _size_conf

    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")
        assert _size_conf(
            spark, "spark.sql.files.maxPartitionBytes", 0
        ) == 128 * 1024 * 1024
        spark.conf.set("spark.sql.files.maxPartitionBytes", "4MB")
        assert _size_conf(
            spark, "spark.sql.files.maxPartitionBytes", 0
        ) == 4 * 1024 * 1024
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1g")
        p = str(tmp_path / "suffixed")
        spark.range(100).coalesce(1).write.parquet(p)
        out = spread(spark.read.parquet(p), spark, min_partitions=4)
        assert out.count() == 100  # no ValueError inside the probe
        # unparseable → documented default, never a raise (Spark rejects
        # bad values for ITS keys at set-time, so use an unvalidated key)
        spark.conf.set("graft.test.sizeConf", "bogus")
        assert _size_conf(spark, "graft.test.sizeConf", 7) == 7
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
