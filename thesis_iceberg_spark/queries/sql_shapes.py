"""SQL shape coverage: correlated subqueries, IN/EXISTS predicates, VALUES
inline tables, unpivot/melt (§2B SQL completeness).

These exercise Catalyst's subquery decorrelation — the rewrites that turn
correlated scalar subqueries and EXISTS/IN into joins — which is exactly
what makes such queries survive at 100 TB (a naive per-row subquery would
be O(n) scans; decorrelation makes it one aggregate + one join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from thesis_iceberg_spark.queries import register
from thesis_iceberg_spark.sources.registry import load_table, register_tables


@register(
    "correlated_scalar_subquery",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE o_totalprice > 1.5 * (
    SELECT AVG(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
""",
    doc="Correlated scalar subquery: orders 50% above their customer's "
    "average. Catalyst decorrelates to aggregate-then-join (one shuffle), "
    "not a per-row rescan.",
)
def correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE o_totalprice > 1.5 * (
    SELECT AVG(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
"""
    )


@register(
    "in_exists_subqueries",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
  AND EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
""",
    doc="IN + correlated EXISTS in one predicate (SQL-text path): both "
    "rewrite to semi joins; the IN side is a broadcastable dim filter.",
)
def in_exists_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_tables(spark, sf_dir, ("customer", "nation", "orders"))
    return spark.sql(
        """
SELECT c_custkey, c_name
FROM customer c
WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
  AND EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
"""
    )


@register(
    "values_inline_dim_join",
    oracle="""
WITH w(o_orderpriority, weight) AS (
  VALUES ('1-URGENT', 5), ('2-HIGH', 4), ('3-MEDIUM', 3),
         ('4-NOT SPECIFIED', 2), ('5-LOW', 1))
SELECT w.weight, COUNT(*) AS n_orders
FROM orders o JOIN w ON o.o_orderpriority = w.o_orderpriority
GROUP BY w.weight
""",
    doc="VALUES inline table as a broadcast dimension (the SQL-native "
    "lookup-table pattern; ref S9 uses VALUES for inserts, this uses it "
    "relationally).",
)
def values_inline_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
WITH w AS (
  SELECT * FROM VALUES ('1-URGENT', 5), ('2-HIGH', 4), ('3-MEDIUM', 3),
                       ('4-NOT SPECIFIED', 2), ('5-LOW', 1)
  AS w(o_orderpriority, weight))
SELECT w.weight, COUNT(*) AS n_orders
FROM orders o JOIN w ON o.o_orderpriority = w.o_orderpriority
GROUP BY w.weight
"""
    )


@register(
    "set_ops_multiset",
    oracle="""
WITH a AS (SELECT l_returnflag AS flag FROM lineitem WHERE l_quantity < 10),
     b AS (SELECT l_returnflag AS flag FROM lineitem WHERE l_discount > 0.05)
SELECT 'intersect_all' AS op, flag, COUNT(*) AS n
FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY flag
UNION ALL
SELECT 'except_all', flag, COUNT(*)
FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY flag
""",
    doc="Multiset set operations (INTERSECT ALL / EXCEPT ALL): duplicate-"
    "preserving bag semantics, the counterpart of the distinct set ops in "
    "set_ops_customer_segments.",
)
def set_ops_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") < 10).select(F.col("l_returnflag").alias("flag"))
    b = li.filter(F.col("l_discount") > 0.05).select(F.col("l_returnflag").alias("flag"))
    inter = (
        a.intersectAll(b)
        .groupBy("flag")
        .agg(F.count("*").alias("n"))
        .select(F.lit("intersect_all").alias("op"), "flag", "n")
    )
    exc = (
        a.exceptAll(b)
        .groupBy("flag")
        .agg(F.count("*").alias("n"))
        .select(F.lit("except_all").alias("op"), "flag", "n")
    )
    return inter.unionAll(exc)


@register(
    "window_funcs_extended",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(ntile(4) OVER w AS INT) AS price_quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume,
       first_value(o_orderkey) OVER w AS cheapest_order,
       CAST(row_number() OVER w AS BIGINT) AS rn
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
""",
    doc="Extended window functions: ntile / percent_rank / cume_dist / "
    "first_value / row_number over one named partition-ordered window — "
    "single shuffle, single partition-local sort for all five.",
)
def window_funcs_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.ntile(4).over(w).cast("int").alias("price_quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("o_orderkey").over(w).alias("cheapest_order"),
        F.row_number().over(w).cast("bigint").alias("rn"),
    )


@register(
    "conditional_funcs_profile",
    oracle="""
SELECT c_custkey,
       greatest(c_acctbal, 0.0) AS bal_floor0,
       least(c_acctbal, 5000.0) AS bal_cap5k,
       nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
       COALESCE(nullif(c_mktsegment, 'BUILDING'), 'DEFAULT') AS seg_defaulted,
       CASE WHEN c_acctbal < 0 THEN 'debt'
            WHEN c_acctbal < 1000 THEN 'low' ELSE 'high' END AS bal_band,
       c_acctbal BETWEEN 100 AND 200 AS in_band
FROM customer
""",
    doc="Conditional-function family: greatest/least/nullif/coalesce/"
    "CASE/BETWEEN — identical three-valued-logic semantics on both engines.",
)
def conditional_funcs_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.greatest("c_acctbal", F.lit(0.0)).alias("bal_floor0"),
        F.least("c_acctbal", F.lit(5000.0)).alias("bal_cap5k"),
        F.nullif("c_mktsegment", F.lit("BUILDING")).alias("seg_or_null"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("DEFAULT")).alias(
            "seg_defaulted"
        ),
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 1000, "low")
        .otherwise("high")
        .alias("bal_band"),
        F.col("c_acctbal").between(100, 200).alias("in_band"),
    )


@register(
    "unpivot_order_measures",
    oracle="""
SELECT o_orderkey, measure, value FROM (
  SELECT o_orderkey, 'totalprice' AS measure, o_totalprice AS value
  FROM orders
  UNION ALL
  SELECT o_orderkey, 'custkey', CAST(o_custkey AS DOUBLE) FROM orders
) WHERE o_orderkey <= 500
""",
    doc="Unpivot / melt (wide->long): DataFrame unpivot() generates the "
    "Expand node (one pass, rows x measures) — the oracle states it as the "
    "equivalent UNION ALL.",
)
def unpivot_order_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 500)
        .select(
            "o_orderkey",
            F.col("o_totalprice").alias("totalprice"),
            F.col("o_custkey").cast("double").alias("custkey"),
        )
    )
    return o.unpivot("o_orderkey", ["totalprice", "custkey"], "measure", "value")
