"""Relational operator coverage (SURVEY §2.C) over the TPC-H-ish testdata.

Every query is idiomatic DataFrame code — scans with pushed-down filters,
broadcast-able dimension joins, partial-aggregated groupBys, rank windows —
paired with a DuckDB oracle. Aggregates over doubles use the decimal-exact
discipline (see functions/exact.py) so both engines emit bitwise-equal
doubles.

Scale notes are inline per query; the common themes:
* dimension tables (region/nation/supplier) broadcast — no shuffle of the
  fact table for those joins;
* groupBy aggregates rely on Catalyst's partial (map-side) aggregation;
* top-k = global TakeOrderedAndProject or rank-window per group;
* AQE handles join-strategy fallback and skew splitting at real scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_manager_spark.functions.exact import dec, dec_avg, dec_sum
from etl_manager_spark.operators.topk import grouped_topk
from etl_manager_spark.workloads import workload
from etl_manager_spark.workloads.tables import load_tables

def _ansi_grand_total(res, spark, n_keys, fills):
    """Restore ANSI's always-present () grouping-set row.

    Spark's ROLLUP/CUBE/GROUPING SETS emit ZERO rows over an empty
    relation, while ANSI (and DuckDB/PostgreSQL) emit exactly one row for
    the ``()`` set — the same row ``SELECT COUNT(*) FROM empty`` yields.
    ``res`` must carry ``F.grouping_id().alias("_gid")``; the ()-row
    (gid = 2**n_keys − 1, present iff the input was non-empty) is
    re-anchored on a literal one-row seed via a 1×1 left join so it
    exists unconditionally, with ``fills`` (col → literal Column)
    supplying the values a left-join NULL must become on the empty case
    (COUNT columns → 0, GROUPING flags → 1; SUM/AVG stay NULL, which IS
    their ANSI empty-input value). On non-empty input the reassembled
    result is bitwise the original. Cost: one filter + one 1×1 join +
    one union over the already-aggregated (groups-sized) result."""
    gid_all = (1 << n_keys) - 1
    rest = res.filter(F.col("_gid") != gid_all).drop("_gid")
    tot = res.filter(F.col("_gid") == gid_all).drop("_gid")
    dtypes = dict(tot.dtypes)
    seed = spark.range(1).select(F.lit(1).alias("_seed"))
    anchored = (
        seed.join(tot.withColumn("_seed", F.lit(1)), "_seed", "left")
        .drop("_seed")
        .select(
            *[
                F.coalesce(F.col(c), fills[c]).cast(dtypes[c]).alias(c)
                if c in fills
                else F.col(c)
                for c in tot.columns
            ]
        )
    )
    return rest.unionByName(anchored)


# SQL fragment helpers for the DuckDB oracle side (mirror functions/exact.py)
def _dsum(col: str) -> str:
    return f"CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DOUBLE)"


def _davg(col: str) -> str:
    # COUNT(col), not COUNT(*): SQL AVG semantics (nulls excluded), the
    # same denominator functions/exact.py:dec_avg uses
    return f"CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DOUBLE) / COUNT({col})"


_REVENUE_SPARK = (
    lambda: F.sum(
        dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
    ).cast("double")
)
_REVENUE_SQL = (
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"
)


# --------------------------------------------------------------------- #
# Aggregation family


@workload(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {_dsum('l_quantity')} AS sum_qty,
           {_dsum('l_extendedprice')} AS sum_base_price,
           {_REVENUE_SQL} AS sum_disc_price,
           {_davg('l_quantity')} AS avg_qty,
           {_davg('l_extendedprice')} AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    category="aggregation",
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: single fact scan + 6-group hash aggregate.
    Scale: filter pushes to parquet row groups; partial agg makes the
    shuffle 6 rows per map task."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity").alias("sum_qty"),
            dec_sum("l_extendedprice").alias("sum_base_price"),
            _REVENUE_SPARK().alias("sum_disc_price"),
            dec_avg("l_quantity").alias("avg_qty"),
            dec_avg("l_extendedprice").alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@workload(
    "agg_orders_by_priority",
    f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           {_dsum('o_totalprice')} AS total_revenue,
           {_davg('o_totalprice')} AS avg_price,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM orders GROUP BY o_orderpriority
    """,
    category="aggregation",
)
def agg_orders_by_priority(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return t["orders"].groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dec_sum("o_totalprice").alias("total_revenue"),
        dec_avg("o_totalprice").alias("avg_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@workload(
    "agg_distinct_per_segment",
    """
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_distinct_keys
    FROM customer GROUP BY c_mktsegment
    """,
    category="aggregation",
)
def agg_distinct_per_segment(spark, sf_dir):
    """countDistinct → Catalyst expands to a two-stage aggregate
    automatically (partial distinct per mapper)."""
    t = load_tables(spark, sf_dir)
    return t["customer"].groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.countDistinct("c_custkey").alias("n_distinct_keys"),
    )


@workload(
    "rollup_revenue_region_nation",
    f"""
    SELECT COALESCE(r_name, 'ALL') AS region_name,
           COALESCE(n_name, 'ALL') AS nation_name,
           COUNT(*) AS n_orders,
           {_dsum('o_totalprice')} AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    category="aggregation",
)
def rollup_revenue_region_nation(spark, sf_dir):
    """ROLLUP grouping sets; nation/region joins are broadcast (tiny dims)."""
    t = load_tables(spark, sf_dir)
    joined = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    res = joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dec_sum("o_totalprice").alias("revenue"),
        F.grouping_id().alias("_gid"),
    )
    return (
        _ansi_grand_total(res, spark, 2, {"n_orders": F.lit(0)})
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "n_orders",
            "revenue",
        )
    )


@workload(
    "cube_status_priority",
    """
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n_orders
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    category="aggregation",
)
def cube_status_priority(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    res = (
        t["orders"]
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.grouping_id().alias("_gid"))
    )
    return (
        _ansi_grand_total(res, spark, 2, {"n_orders": F.lit(0)})
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
        )
    )


# --------------------------------------------------------------------- #
# Join family


@workload(
    "q3_shipping_priority",
    f"""
    SELECT l_orderkey, o_orderdate, o_orderpriority,
           {_REVENUE_SQL} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    category="join",
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape. Scale: filters push to scans; customer→orders is a
    shuffle join on custkey, lineitem joins on orderkey; final top-10 is a
    TakeOrderedAndProject (per-partition heap), not a full sort."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.lit("1996-01-01").cast("timestamp_ntz"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_REVENUE_SPARK().alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@workload(
    "q5_local_supplier_volume",
    f"""
    SELECT n_name, {_REVENUE_SQL} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY n_name
    """,
    category="join",
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: 6-way join. supplier/nation/region broadcast."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
        )
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(_REVENUE_SPARK().alias("revenue"))
    )


@workload(
    "join_left_customer_order_stats",
    f"""
    SELECT c_custkey, c_name,
           CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
           COALESCE({_dsum('o_totalprice')}, 0.0) AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
    category="join",
)
def join_left_customer_order_stats(spark, sf_dir):
    """LEFT join preserving order-less customers (the reference's canonical
    query shape — example job.py:33)."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dec_sum("o_totalprice"), F.lit(0.0)).alias("total_spent"),
        )
    )


@workload(
    "join_semi_customers_with_open_orders",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    """,
    category="join",
)
def join_semi_customers_with_open_orders(spark, sf_dir):
    """LEFT SEMI join — dedup-free existence check, no orders columns leak."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(
            t["orders"].filter(F.col("o_orderstatus") == "O"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_semi",
        )
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@workload(
    "join_anti_customers_without_orders",
    """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    category="join",
)
def join_anti_customers_without_orders(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
    )


@workload(
    "join_full_nation_presence",
    """
    WITH cust AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
                  FROM customer GROUP BY c_nationkey),
         supp AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
                  FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(cust.nationkey, supp.nationkey) AS nationkey,
           COALESCE(n_customers, 0) AS n_customers,
           COALESCE(n_suppliers, 0) AS n_suppliers
    FROM cust FULL OUTER JOIN supp ON cust.nationkey = supp.nationkey
    """,
    category="join",
)
def join_full_nation_presence(spark, sf_dir):
    """FULL OUTER join of two pre-aggregated sides (aggregate-then-join:
    the join input is |nations| rows, not |customers|)."""
    t = load_tables(spark, sf_dir)
    cust = (
        t["customer"].groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    supp = (
        t["supplier"].groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return (
        cust.join(supp, on="nationkey", how="full_outer")
        .select(
            "nationkey",
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


@workload(
    "join_cross_region_pairs",
    """
    SELECT a.r_name AS region_a, b.r_name AS region_b
    FROM region a CROSS JOIN region b
    """,
    category="join",
)
def join_cross_region_pairs(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    a = t["region"].select(F.col("r_name").alias("region_a"))
    b = t["region"].select(F.col("r_name").alias("region_b"))
    return a.crossJoin(b)


# --------------------------------------------------------------------- #
# Window family


@workload(
    "window_top3_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rank
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC NULLS LAST, o_orderkey NULLS FIRST) AS rank
          FROM orders)
    WHERE rank <= 3
    """,
    category="window",
)
def window_top3_orders_per_customer(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return grouped_topk(
        t["orders"].select("o_custkey", "o_orderkey", "o_totalprice"),
        group_cols=["o_custkey"],
        order_by=[F.desc("o_totalprice"), F.asc("o_orderkey")],
        k=3,
    )


@workload(
    "window_running_spend",
    """
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate NULLS FIRST, o_orderkey NULLS FIRST)
                AS DOUBLE) AS running_spend
    FROM orders WHERE o_custkey < 100
    """,
    category="window",
)
def window_running_spend(spark, sf_dir):
    """Running total per customer — decimal accumulation keeps the window
    sum exact and portable."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        t["orders"]
        .filter(F.col("o_custkey") < 100)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
        )
    )


@workload(
    "window_order_gap_days",
    """
    SELECT o_custkey, o_orderkey,
           DATE_DIFF('day',
                     CAST(LAG(o_orderdate) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate NULLS FIRST, o_orderkey NULLS FIRST) AS DATE),
                     CAST(o_orderdate AS DATE)) AS gap_days
    FROM orders WHERE o_custkey < 100
    """,
    category="window",
)
def window_order_gap_days(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        t["orders"]
        .filter(F.col("o_custkey") < 100)
        .select(
            "o_custkey",
            "o_orderkey",
            F.datediff(
                F.to_date("o_orderdate"), F.to_date(F.lag("o_orderdate").over(w))
            ).alias("gap_days"),
        )
    )


# --------------------------------------------------------------------- #
# Set operations / sort / top-k


@workload(
    "setop_nations_with_both",
    """
    SELECT n_name FROM nation JOIN customer ON c_nationkey = n_nationkey
    INTERSECT
    SELECT n_name FROM nation JOIN supplier ON s_nationkey = n_nationkey
    """,
    category="setop",
)
def setop_nations_with_both(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    cust_nations = t["nation"].join(
        t["customer"], F.col("c_nationkey") == F.col("n_nationkey")
    ).select("n_name")
    supp_nations = t["nation"].join(
        t["supplier"], F.col("s_nationkey") == F.col("n_nationkey")
    ).select("n_name")
    return cust_nations.intersect(supp_nations)


@workload(
    "setop_customer_only_nations",
    """
    SELECT n_name FROM nation JOIN customer ON c_nationkey = n_nationkey
    EXCEPT
    SELECT n_name FROM nation JOIN supplier ON s_nationkey = n_nationkey
    """,
    category="setop",
)
def setop_customer_only_nations(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    cust_nations = t["nation"].join(
        t["customer"], F.col("c_nationkey") == F.col("n_nationkey")
    ).select("n_name")
    supp_nations = t["nation"].join(
        t["supplier"], F.col("s_nationkey") == F.col("n_nationkey")
    ).select("n_name")
    # subtract = EXCEPT (set semantics); exceptAll would keep nations whose
    # customer multiplicity merely exceeds supplier multiplicity
    return cust_nations.subtract(supp_nations)


@workload(
    "topk_parts_by_price",
    """
    SELECT p_partkey, p_name, p_retailprice
    FROM part ORDER BY p_retailprice DESC, p_partkey LIMIT 20
    """,
    category="sort",
)
def topk_parts_by_price(spark, sf_dir):
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition heaps,
    no full sort, no single-node shuffle of the table."""
    t = load_tables(spark, sf_dir)
    return (
        t["part"]
        .select("p_partkey", "p_name", "p_retailprice")
        .orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
        .limit(20)
    )


# --------------------------------------------------------------------- #
# Scalar function families


@workload(
    "scalar_string_functions",
    """
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           LOWER(p_brand) AS brand_lower,
           SUBSTRING(p_name, 1, 12) AS name_prefix,
           LENGTH(p_name) AS name_len,
           CONCAT_WS('/', p_brand, p_type) AS brand_type,
           REPLACE(p_type, ' ', '_') AS type_snake,
           TRIM(p_name) AS name_trim,
           REVERSE(p_brand) AS brand_rev,
           CONTAINS(p_type, 'ECONOMY') AS is_economy
    FROM part
    """,
    category="scalar",
)
def scalar_string_functions(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return t["part"].select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 12).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.trim("p_name").alias("name_trim"),
        F.reverse("p_brand").alias("brand_rev"),
        F.contains(F.col("p_type"), F.lit("ECONOMY")).alias("is_economy"),
    )


@workload(
    "scalar_datetime_functions",
    """
    SELECT o_orderkey,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS order_year,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS order_month,
           CAST(EXTRACT(DAY FROM o_orderdate) AS INTEGER) AS order_day,
           CAST(EXTRACT(QUARTER FROM o_orderdate) AS INTEGER) AS order_quarter,
           CAST(EXTRACT(DOW FROM o_orderdate) AS INTEGER) AS order_dow,
           DATE_TRUNC('month', o_orderdate) AS order_month_start,
           CAST(CAST(o_orderdate AS DATE) + 30 AS DATE) AS due_date,
           LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end
    FROM orders WHERE o_orderkey < 1000
    """,
    category="scalar",
)
def scalar_datetime_functions(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .filter(F.col("o_orderkey") < 1000)
        .select(
            "o_orderkey",
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            F.dayofmonth("o_orderdate").alias("order_day"),
            F.quarter("o_orderdate").alias("order_quarter"),
            # DOW normalized to DuckDB/Postgres convention (Sunday=0)
            (F.dayofweek("o_orderdate") - 1).alias("order_dow"),
            # DATE on both sides (DuckDB's date_trunc('month') yields DATE)
            F.to_date(F.date_trunc("month", "o_orderdate")).alias("order_month_start"),
            F.date_add(F.to_date("o_orderdate"), 30).alias("due_date"),
            F.last_day(F.to_date("o_orderdate")).alias("month_end"),
        )
    )


@workload(
    "scalar_math_functions",
    """
    SELECT l_orderkey, l_linenumber,
           ABS(l_discount - 0.05) AS disc_dev,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
           SQRT(l_quantity) AS qty_sqrt,
           l_discount * l_discount AS disc_sq,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod,
           GREATEST(l_tax, l_discount) AS max_rate,
           LEAST(l_tax, l_discount) AS min_rate
    FROM lineitem WHERE l_orderkey < 500
    """,
    category="scalar",
)
def scalar_math_functions(spark, sf_dir):
    """Deterministic IEEE ops only (no transcendentals — libm variance —
    and no ROUND on .x5-prone money values, whose half-even vs half-up
    behavior differs across engines)."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .filter(F.col("l_orderkey") < 500)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
            F.floor("l_extendedprice").alias("price_floor"),
            F.ceil("l_quantity").alias("qty_ceil"),
            F.sqrt("l_quantity").alias("qty_sqrt"),
            (F.col("l_discount") * F.col("l_discount")).alias("disc_sq"),
            (F.col("l_orderkey") % 7).alias("key_mod"),
            F.greatest("l_tax", "l_discount").alias("max_rate"),
            F.least("l_tax", "l_discount").alias("min_rate"),
        )
    )


# --------------------------------------------------------------------- #
# JSON + events (semi-structured / time series)


@workload(
    "json_extract_events",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(TRY_CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS sum_k,
           CAST(MIN(TRY_CAST(props->>'$.k' AS INTEGER)) AS INTEGER) AS min_k,
           CAST(MAX(TRY_CAST(props->>'$.k' AS INTEGER)) AS INTEGER) AS max_k
    FROM events GROUP BY event_type
    """,
    category="json",
)
def json_extract_events(spark, sf_dir):
    """JSON string column → typed extraction (get_json_object is JVM-side;
    for repeated multi-key extraction prefer from_json once per row).
    try_cast, matching the oracle's TRY_CAST: a single non-numeric k in
    100 TB of props must degrade to NULL, not fail the job under ANSI."""
    t = load_tables(spark, sf_dir)
    k = F.get_json_object("props", "$.k").try_cast("int")
    return t["events"].groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@workload(
    "json_struct_parse_events",
    """
    SELECT event_id, event_type,
           TRY_CAST(props->>'$.k' AS INTEGER) AS k,
           TRY_CAST(props->>'$.k' AS INTEGER) % 10 AS k_bucket
    FROM events
    WHERE TRY_CAST(props->>'$.k' AS INTEGER) >= 50
    """,
    category="json",
)
def json_struct_parse_events(spark, sf_dir):
    """Schema-on-read JSON parsing: from_json parses the string ONCE per
    row into a typed struct (vs get_json_object re-parsing per extraction),
    then projection/filter run on typed columns — the pattern for multi-key
    JSON at scale."""
    t = load_tables(spark, sf_dir)
    parsed = t["events"].withColumn("p", F.from_json("props", "k INT"))
    return (
        parsed.filter(F.col("p.k") >= 50)
        .select(
            "event_id",
            "event_type",
            F.col("p.k").alias("k"),
            (F.col("p.k") % 10).alias("k_bucket"),
        )
    )


@workload(
    "events_hourly_rollup",
    f"""
    SELECT DATE_TRUNC('hour', ts) AS hour_start,
           COUNT(*) AS n_events,
           {_dsum('value')} AS total_value,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users
    FROM events GROUP BY DATE_TRUNC('hour', ts)
    """,
    category="events",
)
def events_hourly_rollup(spark, sf_dir):
    """Tumbling-window aggregation in batch form (streaming variant lives in
    etl_manager_spark.streaming with the same grouping)."""
    t = load_tables(spark, sf_dir)
    return t["events"].groupBy(
        F.date_trunc("hour", "ts").cast("timestamp_ntz").alias("hour_start")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        dec_sum("value").alias("total_value"),
        F.countDistinct("user_id").alias("active_users"),
    )


@workload(
    "events_sessionization",
    """
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             EPOCH_US(ts) - LAG(EPOCH_US(ts))
               OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id NULLS FIRST) AS gap_us
      FROM events
    ),
    flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END AS new_session
      FROM ordered
    )
    SELECT user_id,
           CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM flagged GROUP BY user_id
    """,
    category="events",
)
def events_sessionization(spark, sf_dir):
    """Gap-based sessionization (30 min) via lag + flag-sum — the batch
    equivalent of a session window; integer microsecond arithmetic keeps it
    engine-portable."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    flagged = t["events"].select(
        "user_id",
        F.when(
            (micros - F.lag(micros).over(w)).isNull()
            | ((micros - F.lag(micros).over(w)) > 1_800_000_000),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    return flagged.groupBy("user_id").agg(
        F.sum("new_session").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


@workload(
    "pivot_event_type_by_dow",
    """
    SELECT CAST(EXTRACT(DOW FROM ts) AS INTEGER) AS dow,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
    FROM events GROUP BY 1
    """,
    category="events",
)
def pivot_event_type_by_dow(spark, sf_dir):
    """Pivot via conditional aggregation (explicit columns — deterministic
    schema, unlike dynamic .pivot() which scans for values first)."""
    t = load_tables(spark, sf_dir)
    def n(et):
        return F.sum(F.when(F.col("event_type") == et, 1).otherwise(0)).alias(f"n_{et}")

    return t["events"].groupBy(
        (F.dayofweek("ts") - 1).alias("dow")
    ).agg(n("click"), n("view"), n("purchase"), n("signup"), n("error"))


# --------------------------------------------------------------------- #
# Subqueries / second aggregation batch


@workload(
    "q6_revenue_change",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue_delta,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    category="aggregation",
)
def q6_revenue_change(spark, sf_dir):
    """TPC-H Q6 shape: pure scan+filter+agg — every predicate pushes to the
    parquet reader; the aggregate is a single global row."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice") * dec("l_discount"))
            .cast("double")
            .alias("revenue_delta"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@workload(
    "subquery_in_hot_parts",
    """
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem
                        GROUP BY l_partkey HAVING COUNT(*) > 40)
    """,
    category="subquery",
)
def subquery_in_hot_parts(spark, sf_dir):
    """IN-subquery = semi join against a pre-aggregated (tiny) side; Spark
    broadcasts the aggregate result."""
    t = load_tables(spark, sf_dir)
    hot = (
        t["lineitem"].groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 40)
        .select("l_partkey")
    )
    return (
        t["part"]
        .join(F.broadcast(hot), F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .select("p_partkey", "p_name", "p_retailprice")
    )


@workload(
    "subquery_scalar_above_avg",
    """
    SELECT o_orderpriority, COUNT(*) AS n_above_avg
    FROM orders
    WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                                 / COUNT(o_totalprice) FROM orders)
    GROUP BY o_orderpriority
    """,
    category="subquery",
)
def subquery_scalar_above_avg(spark, sf_dir):
    """Scalar subquery: global average computed once (decimal-exact),
    broadcast into the filter."""
    t = load_tables(spark, sf_dir)
    avg_df = t["orders"].agg(dec_avg("o_totalprice").alias("_avg"))
    return (
        t["orders"]
        .crossJoin(F.broadcast(avg_df))
        .filter(F.col("o_totalprice") > F.col("_avg"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_above_avg"))
    )


@workload(
    "agg_median_acctbal_by_nation",
    """
    SELECT c_nationkey, QUANTILE_CONT(c_acctbal, 0.5) AS median_acctbal,
           COUNT(*) AS n_customers
    FROM customer GROUP BY c_nationkey
    """,
    category="aggregation",
)
def agg_median_acctbal_by_nation(spark, sf_dir):
    """Exact median (interpolating continuous percentile — same definition
    in Spark `percentile` and DuckDB `quantile_cont`), computed by the
    distributed rank-quantile operator (operators/quantiles.py) instead
    of the built-in aggregate: 25 nations × a near-unique balance domain
    means per-group percentile buffers grow linearly with the data —
    the ordered-cumsum CDF bounds memory by the range-partition slice
    and replays the identical interpolation bit-for-bit."""
    from etl_manager_spark.operators.quantiles import grouped_exact_percentiles

    t = load_tables(spark, sf_dir)
    return grouped_exact_percentiles(
        t["customer"],
        ["c_nationkey"],
        "c_acctbal",
        {"median_acctbal": 0.5},
        count_name="n_customers",
    )


@workload(
    "array_agg_line_numbers",
    """
    SELECT l_orderkey,
           TO_JSON(LIST(l_linenumber ORDER BY l_linenumber)) AS line_numbers,
           COUNT(*) AS n_lines
    FROM lineitem WHERE l_orderkey < 200
    GROUP BY l_orderkey
    """,
    category="aggregation",
)
def array_agg_line_numbers(spark, sf_dir):
    """Array aggregation with deterministic order (collect_list has no
    intrinsic order under parallelism — always sort the result). The array
    is emitted JSON-encoded (``to_json`` ≡ DuckDB ``TO_JSON`` for integer
    lists) so the driver's pandas canonicalizer can sort/hash rows."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .filter(F.col("l_orderkey") < 200)
        .groupBy("l_orderkey")
        .agg(
            F.to_json(F.sort_array(F.collect_list("l_linenumber"))).alias(
                "line_numbers"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@workload(
    "grouping_sets_revenue",
    f"""
    SELECT COALESCE(r_name, 'ALL') AS region_name,
           COALESCE(c_mktsegment, 'ALL') AS segment,
           {_dsum('o_totalprice')} AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY GROUPING SETS ((r_name), (c_mktsegment), ())
    """,
    category="aggregation",
)
def grouping_sets_revenue(spark, sf_dir):
    """Explicit GROUPING SETS via the SQL surface (temp views + spark.sql —
    the engine's full-SQL face; DataFrame rollup/cube cover the rest)."""
    t = load_tables(spark, sf_dir)
    for name in ("orders", "customer", "nation", "region"):
        t[name].createOrReplaceTempView(f"_gs_{name}")
    # the COALESCE-to-'ALL' rendering happens AFTER _ansi_grand_total so
    # the re-anchored ()-row (NULL keys) renders like any other subtotal
    res = spark.sql(
        """
        SELECT r_name, c_mktsegment,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               GROUPING_ID(r_name, c_mktsegment) AS _gid
        FROM _gs_orders
        JOIN _gs_customer ON o_custkey = c_custkey
        JOIN _gs_nation ON c_nationkey = n_nationkey
        JOIN _gs_region ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((r_name), (c_mktsegment), ())
        """
    )
    return _ansi_grand_total(res, spark, 2, {}).select(
        F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
        F.coalesce("c_mktsegment", F.lit("ALL")).alias("segment"),
        "revenue",
    )


@workload(
    "union_all_contacts",
    """
    SELECT 'customer' AS kind, c_name AS name, c_nationkey AS nationkey, c_acctbal AS acctbal
    FROM customer WHERE c_acctbal > 9900
    UNION ALL
    SELECT 'supplier' AS kind, s_name AS name, s_nationkey AS nationkey, s_acctbal AS acctbal
    FROM supplier WHERE s_acctbal > 9000
    """,
    category="setop",
)
def union_all_contacts(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    cust = t["customer"].filter(F.col("c_acctbal") > 9900).select(
        F.lit("customer").alias("kind"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_acctbal").alias("acctbal"),
    )
    supp = t["supplier"].filter(F.col("s_acctbal") > 9000).select(
        F.lit("supplier").alias("kind"),
        F.col("s_name").alias("name"),
        F.col("s_nationkey").alias("nationkey"),
        F.col("s_acctbal").alias("acctbal"),
    )
    return cust.unionByName(supp)


@workload(
    "range_join_value_buckets",
    """
    WITH buckets(bucket, lo, hi) AS (
      VALUES ('low', 0.0, 50.0), ('mid', 50.0, 200.0), ('high', 200.0, 1000.0)
    )
    SELECT bucket, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events JOIN buckets ON value >= lo AND value < hi
    GROUP BY bucket
    """,
    category="join",
)
def range_join_value_buckets(spark, sf_dir):
    """Theta/range join against a tiny broadcast bucket table (banding
    pattern — at scale, always broadcast the band side)."""
    t = load_tables(spark, sf_dir)
    buckets = spark.createDataFrame(
        [("low", 0.0, 50.0), ("mid", 50.0, 200.0), ("high", 200.0, 1000.0)],
        "bucket string, lo double, hi double",
    )
    return (
        t["events"]
        .join(
            F.broadcast(buckets),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value").alias("total_value"),
        )
    )


@workload(
    "window_ntile_quartiles",
    """
    SELECT c_custkey, c_mktsegment,
           NTILE(4) OVER (PARTITION BY c_mktsegment
                          ORDER BY c_acctbal NULLS FIRST, c_custkey NULLS FIRST)
             AS quartile
    FROM customer
    """,
    category="window",
)
def window_ntile_quartiles(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return t["customer"].select(
        "c_custkey", "c_mktsegment", F.ntile(4).over(w).alias("quartile")
    )


@workload(
    "latest_event_per_user",
    """
    SELECT user_id, event_id, ts, event_type
    FROM (SELECT user_id, event_id, ts, event_type,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC NULLS LAST, event_id DESC NULLS LAST) AS rn
          FROM events)
    WHERE rn = 1
    """,
    category="window",
)
def latest_event_per_user(spark, sf_dir):
    """Keep-latest-per-key dedup — the canonical CDC/compaction pattern
    (rank window, one shuffle on the key)."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        t["events"]
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type")
    )


# --------------------------------------------------------------------- #
# TPC-H analog batch 3 (shapes adapted to the testdata's column subset)


@workload(
    "q4_priority_with_returns",
    """
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
    category="subquery",
)
def q4_priority_with_returns(spark, sf_dir):
    """TPC-H Q4 shape: correlated EXISTS → left-semi join."""
    t = load_tables(spark, sf_dir)
    returned = t["lineitem"].filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        t["orders"]
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .join(returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@workload(
    "q7_nation_pair_volume",
    f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS ship_year,
           {_REVENUE_SQL} AS volume
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE sn.n_name IN ('NATION_1', 'NATION_2')
      AND cn.n_name IN ('NATION_1', 'NATION_2')
      AND sn.n_name <> cn.n_name
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY sn.n_name, cn.n_name, EXTRACT(YEAR FROM l_shipdate)
    """,
    category="join",
)
def q7_nation_pair_volume(spark, sf_dir):
    """TPC-H Q7 shape: two roles of the same dimension (nation aliased
    twice), both broadcast."""
    t = load_tables(spark, sf_dir)
    sn = t["nation"].select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = t["nation"].select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = ["NATION_1", "NATION_2"]
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            F.col("supp_nation").isin(pair)
            & F.col("cust_nation").isin(pair)
            & (F.col("supp_nation") != F.col("cust_nation"))
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(_REVENUE_SPARK().alias("volume"))
    )


@workload(
    "q8_market_share",
    f"""
    WITH all_rev AS (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS order_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS vol,
             sn.n_name AS supp_nation
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN region ON cn.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE r_name = 'AMERICA'
    )
    SELECT order_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN vol ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM(vol) AS DOUBLE) AS market_share
    FROM all_rev GROUP BY order_year
    """,
    category="join",
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: ratio of two exact decimal sums (both cast to double
    before one IEEE division — portable)."""
    t = load_tables(spark, sf_dir)
    vol = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
    sn = t["nation"].select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = t["nation"].select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "AMERICA")),
            F.col("cn_region") == F.col("r_regionkey"),
        )
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .withColumn("vol", vol)
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_5", F.col("vol")).otherwise(
                        F.lit(0).cast("decimal(18,2)")
                    )
                ).cast("double")
                / F.sum("vol").cast("double")
            ).alias("market_share")
        )
    )


@workload(
    "q10_returned_item_customers",
    f"""
    SELECT c_custkey, c_name, {_REVENUE_SQL} AS revenue, c_acctbal
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    category="join",
)
def q10_returned_item_customers(spark, sf_dir):
    """TPC-H Q10 shape: revenue lost to returns, top 20 customers."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .join(
            t["lineitem"].filter(F.col("l_returnflag") == "R"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("c_custkey", "c_name", "c_acctbal")
        .agg(_REVENUE_SPARK().alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@workload(
    "q12_priority_by_quantity_band",
    """
    SELECT CASE WHEN l_quantity < 10 THEN 'low'
                WHEN l_quantity < 30 THEN 'mid'
                ELSE 'high' END AS qty_band,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS urgent_lines,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS normal_lines
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
    category="aggregation",
)
def q12_priority_by_quantity_band(spark, sf_dir):
    """TPC-H Q12 shape: CASE-derived grouping key + conditional counts."""
    t = load_tables(spark, sf_dir)
    band = (
        F.when(F.col("l_quantity") < 10, "low")
        .when(F.col("l_quantity") < 30, "mid")
        .otherwise("high")
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(band.alias("qty_band"))
        .agg(
            # when/otherwise(0), not cast(int): a NULL priority must count
            # as 0 in BOTH conditionals (the oracle's CASE ... ELSE 0),
            # not become a NULL that empties an all-null group's sum
            F.sum(F.when(urgent, 1).otherwise(0)).alias("urgent_lines"),
            F.sum(F.when(~urgent, 1).otherwise(0)).alias("normal_lines"),
        )
    )


@workload(
    "q14_promo_revenue_share",
    """
    SELECT CAST(100 AS DOUBLE)
             * (CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                    THEN CAST(l_extendedprice AS DECIMAL(18,2))
                         * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                         * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE))
           AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
    """,
    category="join",
)
def q14_promo_revenue_share(spark, sf_dir):
    """TPC-H Q14 shape: promo revenue percentage (part side broadcast)."""
    t = load_tables(spark, sf_dir)
    vol = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
        )
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("vol", vol)
        .agg(
            (
                F.lit(100).cast("double")
                * (
                    F.sum(
                        F.when(F.col("p_type").like("PROMO%"), F.col("vol")).otherwise(
                            F.lit(0).cast("decimal(18,2)")
                        )
                    ).cast("double")
                    / F.sum("vol").cast("double")
                )
            ).alias("promo_revenue_pct")
        )
    )


@workload(
    "q18_large_quantity_orders",
    f"""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           {_dsum('l_quantity')} AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
    """,
    category="join",
)
def q18_large_quantity_orders(spark, sf_dir):
    """TPC-H Q18 shape: HAVING over a grouped join (threshold filter after
    aggregation — Catalyst pushes nothing here, by design)."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate")
        .agg(dec_sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )


@workload(
    "q19_disjunctive_predicates",
    f"""
    SELECT {_REVENUE_SQL} AS revenue, COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)
    """,
    category="join",
)
def q19_disjunctive_predicates(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-ANDs across both join sides (evaluated post
    join; the p_brand IN superset could pre-filter the broadcast side)."""
    t = load_tables(spark, sf_dir)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 50))
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(_REVENUE_SPARK().alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


@workload(
    "scalar_array_functions",
    """
    WITH agg AS (
      SELECT l_orderkey, LIST(l_linenumber ORDER BY l_linenumber) AS nums
      FROM lineitem WHERE l_orderkey < 200 GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           CAST(LEN(nums) AS INTEGER) AS n,
           nums[1] AS first_line,
           nums[-1] AS last_line,
           LIST_CONTAINS(nums, 3) AS has_three,
           TO_JSON(LIST_REVERSE(nums)) AS rev,
           TO_JSON(nums[1:2]) AS first_two,
           CAST(LIST_SUM(nums) AS BIGINT) AS total
    FROM agg
    """,
    category="scalar",
)
def scalar_array_functions(spark, sf_dir):
    """Array scalar family over a deterministic per-order array: size,
    element_at (both ends), contains, reverse, slice, integer aggregate
    sum — all JVM-side, exact oracle (integer arithmetic only). Array-
    valued outputs are JSON-encoded for the driver's canonicalizer."""
    t = load_tables(spark, sf_dir)
    agg = (
        t["lineitem"]
        .filter(F.col("l_orderkey") < 200)
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("l_linenumber")).alias("nums"))
    )
    return agg.select(
        "l_orderkey",
        F.size("nums").alias("n"),
        F.element_at("nums", 1).alias("first_line"),
        F.element_at("nums", -1).alias("last_line"),
        F.array_contains("nums", 3).alias("has_three"),
        F.to_json(F.reverse("nums")).alias("rev"),
        F.to_json(F.slice("nums", 1, 2)).alias("first_two"),
        F.aggregate(
            "nums", F.lit(0).cast("long"), lambda acc, x: acc + x
        ).alias("total"),
    )


@workload(
    "window_percentiles_acctbal",
    """
    SELECT c_custkey, c_mktsegment,
           PERCENT_RANK() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal NULLS FIRST, c_custkey NULLS FIRST)
             AS pr,
           CUME_DIST() OVER (PARTITION BY c_mktsegment
                             ORDER BY c_acctbal NULLS FIRST, c_custkey NULLS FIRST) AS cd
    FROM customer
    """,
    category="window",
)
def window_percentiles_acctbal(spark, sf_dir):
    """percent_rank/cume_dist: rank-derived ratios — one integer division
    per row, identical IEEE op in both engines, so the floats hash-match
    (ties broken by c_custkey for full determinism)."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return t["customer"].select(
        "c_custkey",
        "c_mktsegment",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


@workload(
    "recursive_hierarchy_depth",
    """
    WITH RECURSIVE anc(doc_id, anc_id, depth) AS (
      SELECT doc_id, doc_id, 0 FROM documents
      UNION ALL
      SELECT a.doc_id, (a.anc_id - 1) // 2, a.depth + 1
      FROM anc a WHERE a.anc_id > 0
    )
    SELECT doc_id,
           CAST(MAX(depth) AS INTEGER) AS depth,
           COUNT(*) AS n_ancestors
    FROM anc GROUP BY doc_id
    """,
    category="subquery",
)
def recursive_hierarchy_depth(spark, sf_dir):
    """Recursive CTE (Spark 4 WITH RECURSIVE): walk each document up a
    synthetic binary-heap parent tree (parent(i) = (i-1) div 2) to the
    root, emitting depth and ancestor count — the hierarchical-traversal
    query shape (org charts, BOM explosions, category trees). UNION ALL
    recursion terminates because the tree is acyclic; iteration count is
    the tree depth (log n), each step a self-join Catalyst plans like any
    equi-join. DuckDB runs the same text modulo the integer-division
    spelling (DIV vs //)."""
    t = load_tables(spark, sf_dir)
    t["documents"].createOrReplaceTempView("documents_rec")
    # the recursion's TOTAL row count is provably n_docs·(depth+1) with
    # depth = log2(max id) ≤ 64 — raise Spark's runaway-recursion guard
    # (default 1M rows) to that bound instead of failing at ~15k docs;
    # the level guard (default 100) already exceeds any 64-bit heap walk
    n_docs = t["documents"].count()
    # the limit is read at ACTION time on the returned lazy DataFrame
    # (verified: restoring it before collect() fails the recursion), so a
    # try/finally restore here would break the contract of returning an
    # executable DataFrame — instead only ever RAISE the guard to the
    # provable bound, never lower a value the session already carries
    bound = max(1_000_000, (n_docs + 1) * 65)
    try:
        current = int(spark.conf.get("spark.sql.cteRecursionRowLimit"))
    except Exception:  # noqa: BLE001 - unreadable conf → assume default
        current = 1_000_000
    if bound > current:
        spark.conf.set("spark.sql.cteRecursionRowLimit", str(bound))
    return spark.sql(
        """
        WITH RECURSIVE anc(doc_id, anc_id, depth) AS (
          SELECT doc_id, doc_id, 0 FROM documents_rec
          UNION ALL
          SELECT a.doc_id, (a.anc_id - 1) DIV 2, a.depth + 1
          FROM anc a WHERE a.anc_id > 0
        )
        SELECT doc_id,
               CAST(MAX(depth) AS INT) AS depth,
               COUNT(*) AS n_ancestors
        FROM anc GROUP BY doc_id
        """
    )


@workload(
    "setop_all_multiset_variants",
    """
    WITH a AS (SELECT c_nationkey AS nk FROM customer WHERE c_custkey % 3 = 0),
    b AS (SELECT c_nationkey AS nk FROM customer WHERE c_custkey % 2 = 0),
    i AS (SELECT nk FROM a INTERSECT ALL SELECT nk FROM b),
    e AS (SELECT nk FROM a EXCEPT ALL SELECT nk FROM b)
    SELECT 'intersect_all' AS op, nk, COUNT(*) AS n FROM i GROUP BY nk
    UNION ALL
    SELECT 'except_all' AS op, nk, COUNT(*) AS n FROM e GROUP BY nk
    """,
    category="setop",
)
def setop_all_multiset_variants(spark, sf_dir):
    """Multiset set operations (INTERSECT ALL / EXCEPT ALL): duplicate
    counts min()'d / subtracted rather than collapsed — the bag semantics
    the distinct variants (setop_nations_with_both) don't exercise. Spark
    plans both as aggregate-count + generate (no sort), same shuffle
    profile as a groupBy."""
    t = load_tables(spark, sf_dir)
    a = t["customer"].filter(F.col("c_custkey") % 3 == 0).select(
        F.col("c_nationkey").alias("nk")
    )
    b = t["customer"].filter(F.col("c_custkey") % 2 == 0).select(
        F.col("c_nationkey").alias("nk")
    )
    i = (
        a.intersectAll(b)
        .groupBy("nk")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("intersect_all").alias("op"), "nk", "n")
    )
    e = (
        a.exceptAll(b)
        .groupBy("nk")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("op"), "nk", "n")
    )
    return i.unionByName(e)


@workload(
    "pagination_orders_offset",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 20 OFFSET 40
    """,
    category="sort",
)
def pagination_orders_offset(spark, sf_dir):
    """Keyset-free pagination (ORDER BY … LIMIT … OFFSET, Spark ≥3.4):
    page 3 of the price-ranked orders under a total order. Spark executes
    this as a single TakeOrdered-style global top-(offset+limit) then
    drops the prefix — fine for shallow pages; deep pagination at 100 TB
    should switch to keyset predicates (WHERE (price, key) < last-seen),
    which pushes down instead of materializing offset+limit rows."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .offset(40)
        .limit(20)
    )


@workload(
    "join_right_supplier_nation",
    """
    SELECT n.n_name, s.s_suppkey, s.s_name
    FROM supplier s RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
    """,
    category="join",
)
def join_right_supplier_nation(spark, sf_dir):
    """RIGHT OUTER join: every nation survives even with no suppliers
    (null-extended left side) — the mirror of the left-join family,
    planned as a broadcast of the small right-preserved side."""
    t = load_tables(spark, sf_dir)
    return t["supplier"].join(
        t["nation"],
        t["supplier"]["s_nationkey"] == t["nation"]["n_nationkey"],
        "right",
    ).select("n_name", "s_suppkey", "s_name")


@workload(
    "lateral_top_orders_per_customer",
    """
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c,
         LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                  WHERE o_custkey = c.c_custkey
                  ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) o
    WHERE c.c_custkey < 50
    """,
    category="join",
)
def lateral_top_orders_per_customer(spark, sf_dir):
    """Correlated LATERAL derived table (SQL:1999 lateral join, Spark
    ≥3.2): each customer row feeds a correlated ordered-limit subquery —
    the per-row top-N idiom SQL users reach for before learning window
    functions. Catalyst de-correlates it into a ranked window join, so
    the plan matches the window formulation rather than a per-row loop."""
    t = load_tables(spark, sf_dir)
    t["customer"].createOrReplaceTempView("_lat_customer")
    t["orders"].createOrReplaceTempView("_lat_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM _lat_customer c,
             LATERAL (SELECT o_orderkey, o_totalprice FROM _lat_orders
                      WHERE o_custkey = c.c_custkey
                      ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) o
        WHERE c.c_custkey < 50
        """
    )


@workload(
    "bloom_prefilter_join_orders",
    f"""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {_dsum('o_totalprice')} AS revenue
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey
                    AND c.c_mktsegment = 'BUILDING')
    GROUP BY o_orderpriority
    """,
    category="join",
)
def bloom_prefilter_join_orders(spark, sf_dir):
    """Bloom-prefiltered semi join (operators/bloomjoin.py): orders are
    pruned map-side by a 2 KB bitmap of the BUILDING-segment customer
    keys BEFORE the join shuffle, then the exact semi join removes the
    bloom's false positives — bitwise-identical rows to the plain semi
    join (the oracle), but at 100 TB only ~segment-share of the fact
    table enters the exchange. This is Spark's runtime-bloom-filter
    rewrite made explicit and user-steerable: the probe is pure codegen
    (xxhash64 ×2 + bitmap element_at) inside the scan stage, and the
    filter build is one bounded aggregation (≤ num_bits positions),
    never a key collect."""
    from etl_manager_spark.operators.bloomjoin import bloom_prefiltered_join

    t = load_tables(spark, sf_dir)
    dim = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey"
    )
    pruned = bloom_prefiltered_join(
        t["orders"], dim, "o_custkey", "c_custkey", how="semi"
    )
    return pruned.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dec_sum("o_totalprice").alias("revenue"),
    )


@workload(
    "rollup_grouping_id_events",
    """
    SELECT event_type,
           CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hod,
           CAST(GROUPING(event_type) AS INTEGER) AS g_type,
           CAST(GROUPING(CAST(EXTRACT(hour FROM ts) AS INTEGER)) AS INTEGER)
             AS g_hod,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY ROLLUP(event_type, CAST(EXTRACT(hour FROM ts) AS INTEGER))
    """,
    category="relational",
)
def rollup_grouping_id_events(spark, sf_dir):
    """ROLLUP with GROUPING() indicator columns — the flags that let a
    consumer tell a real NULL key from a subtotal row (the classic
    rollup-consumption bug). Same single-pass partial-aggregated rollup
    as rollup_revenue_region_nation, plus the grouping metadata both
    engines define identically (1 = aggregated-away level)."""
    t = load_tables(spark, sf_dir)
    res = (
        t["events"]
        .withColumn("hod", F.hour("ts"))
        .rollup("event_type", "hod")
        .agg(
            F.grouping("event_type").cast("int").alias("g_type"),
            F.grouping("hod").cast("int").alias("g_hod"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.grouping_id().alias("_gid"),
        )
    )
    return _ansi_grand_total(
        res,
        spark,
        2,
        {"g_type": F.lit(1), "g_hod": F.lit(1), "n": F.lit(0)},
    ).select("event_type", "hod", "g_type", "g_hod", "n")
