"""Relational operators (SURVEY.md §2A P1-P13, S1-S2 + §2B joins/aggs/windows).

Part A mirrors the reference's scan/project/filter surface (ref: api.py and
notebook cells cited per-query).  Part B adds the §2B mandated relational
extensions (joins of every kind, hash aggregation, windows, rollup/cube,
set ops, top-k) that the reference explicitly lacks (SURVEY.md §2A
"explicit absences") — all pure DataFrame compositions so Catalyst keeps
pushdown/pruning/codegen.

Scale notes per operator are inline; the common themes:
  * dimension tables (region/nation/supplier/part/customer at TPC-H ratios)
    are broadcast explicitly — no shuffle of the fact table for star joins;
  * aggregations are expressed on group-by keys so Catalyst plans
    partial (map-side) + final aggregation — no driver-side reduction;
  * windows partition by a key before ordering — no global sort unless the
    query semantically requires one (top-k uses TakeOrderedAndProject).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from thesis_iceberg_spark.queries import register
from thesis_iceberg_spark.sources.registry import load_table

# Money/measure columns go through DECIMAL(18,4) so sums are exact (order-
# independent) and identical across Spark and DuckDB; final CAST to DOUBLE
# gives a stable comparable output type.
DEC = "decimal(18,4)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Part A — reference surface (scans / projections / filters)
# ---------------------------------------------------------------------------


@register(
    "scan_full",
    oracle="SELECT r_regionkey, r_name FROM region",
    doc="S1/P1 full table scan (ref: api.py:63-73 GET /<table>).",
)
def scan_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "region").select("r_regionkey", "r_name")


@register(
    "scan_sql",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    doc="S2 SQL-text table scan (ref: api.py:138,220 spark.sql f-strings).",
)
def scan_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql("SELECT n_nationkey, n_name, n_regionkey FROM nation")


@register(
    "project_columns",
    oracle="SELECT c_custkey, c_name, c_mktsegment FROM customer",
    doc="P2 column projection (ref: api.py:109 .select('age')); "
    "scan must prune to the 3 referenced columns (ReadSchema check).",
)
def project_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")


@register(
    "point_lookup",
    oracle="SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey = 42",
    doc="P6 equality point lookup (ref: api.py:220 WHERE Index = {id}); "
    "predicate pushes to the parquet scan (PushedFilters: [EqualTo]).",
)
def point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") == 42)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "filter_eq_string",
    oracle=(
        "SELECT c_custkey, c_name, c_acctbal FROM customer "
        "WHERE c_mktsegment = 'BUILDING'"
    ),
    doc="P7 string-equality filter (ref: api.py:250 WHERE `First Name` = 'Sarah').",
)
def filter_eq_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name", "c_acctbal")
    )


@register(
    "filter_range_ts",
    oracle=(
        "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00' "
        "AND l_shipdate < TIMESTAMP '1998-02-01 00:00:00'"
    ),
    doc="P8 timestamp range filter (ref: api.py:134-140 WHERE added_at >= date); "
    "range predicate pushes down for row-group min/max skipping.",
)
def filter_range_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-02-01 00:00:00").cast("timestamp_ntz"))
    ).select("l_orderkey", "l_linenumber", "l_quantity")


@register(
    "filter_year_func",
    oracle=(
        "SELECT CAST(year(o_orderdate) AS INT) AS order_year, COUNT(*) AS n_orders "
        "FROM orders WHERE year(o_orderdate) < 1998 GROUP BY 1"
    ),
    doc="P9 function predicate (ref: #cell-70 WHERE YEAR(`Date of birth`) < 1927).",
)
def filter_year_func(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") < 1998)
        .groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "filter_null",
    oracle="SELECT COUNT(*) AS n_null_props FROM events WHERE props IS NULL",
    doc="P10 null predicate (ref: #cell-11 DELETE ... WHERE added_at IS NULL).",
)
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("props").isNull())
        .agg(F.count("*").alias("n_null_props"))
    )


@register(
    "filter_neq",
    oracle=(
        "SELECT event_type, COUNT(*) AS n FROM events "
        "WHERE event_type != 'click' GROUP BY event_type"
    ),
    doc="P11 inequality filter (ref: #cell-34 WHERE _change_type != 'Delete').",
)
def filter_neq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") != "click")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )


@register(
    "distinct_values",
    oracle="SELECT DISTINCT event_type FROM events",
    doc="P12 DISTINCT (ref: #cell-35 SELECT DISTINCT _change_type).",
)
def distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "events").select("event_type").distinct()


@register(
    "topk_orders",
    oracle=(
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 20"
    ),
    doc="P13/§2B top-k: ORDER BY + LIMIT with unique tie-break "
    "(ref: #cell-68 LIMIT 20). Plans as TakeOrderedAndProject — no global "
    "sort, each partition keeps only its local top 20.",
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# Part B — §2B mandated relational extensions
# ---------------------------------------------------------------------------


@register(
    "agg_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(CAST(SUM(CAST(l_quantity AS {DEC})) AS VARCHAR) AS DOUBLE) AS sum_qty,
       CAST(CAST(SUM(CAST(l_extendedprice AS {DEC})) AS VARCHAR) AS DOUBLE) AS sum_base_price,
       CAST(CAST(SUM(CAST(l_extendedprice AS {DEC}) * (1 - CAST(l_discount AS {DEC}))) AS VARCHAR) AS DOUBLE)
           AS sum_disc_price,
       CAST(CAST(SUM(CAST(l_extendedprice AS {DEC}) * (1 - CAST(l_discount AS {DEC}))
                * (1 + CAST(l_tax AS {DEC}))) AS VARCHAR) AS DOUBLE) AS sum_charge,
       CAST(CAST(SUM(CAST(l_quantity AS {DEC})) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(CAST(SUM(CAST(l_extendedprice AS {DEC})) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(CAST(SUM(CAST(l_discount AS {DEC})) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    doc="§2B hash aggregation, TPC-H Q1 style: partial+final agg over 2 "
    "low-cardinality keys; decimal-exact sums. At 100 TB this is a pure "
    "map-side-combine pattern — tiny shuffle regardless of input size.",
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast(DEC)
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    tax = F.col("l_tax").cast(DEC)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("string").cast("double").alias("sum_qty"),
            F.sum(price).cast("string").cast("double").alias("sum_base_price"),
            F.sum(price * (F.lit(1) - disc)).cast("string").cast("double").alias("sum_disc_price"),
            F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax))
            .cast("string").cast("double")
            .alias("sum_charge"),
            (F.sum(qty).cast("string").cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(price).cast("string").cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(disc).cast("string").cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "join_inner_cust_orders",
    oracle=f"""
SELECT c.c_custkey, c.c_name, COUNT(*) AS n_orders,
       CAST(CAST(SUM(CAST(o.o_totalprice AS {DEC})) AS VARCHAR) AS DOUBLE) AS total_spend
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey, c.c_name
""",
    doc="§2B inner equi-join + agg. customer:orders is 1:10, but BOTH sides "
    "scale with SF (customer is 150k rows *per TPC-H SF* — multi-TB at the "
    "100 TB target), so neither side carries a broadcast hint: a forced hint "
    "would override spark.sql.autoBroadcastJoinThreshold and OOM building "
    "the broadcast at scale.  AQE picks broadcast at small SF from measured "
    "sizes and a shuffle join at scale (the q3 rule, functions_q.py).",
)
def join_inner_cust_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("string").cast("double").alias("total_spend"),
        )
    )


@register(
    "join_left_order_counts",
    oracle="""
SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey
""",
    doc="§2B left outer join preserving customers with zero orders.",
)
def join_left_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_semi_active_customers",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
              AND o.o_orderstatus = 'O')
""",
    doc="§2B left-semi join (EXISTS): customers with at least one open order.",
)
def join_semi_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti_inactive_customers",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
    doc="§2B left-anti join (NOT EXISTS): customers with no orders at all.",
)
def join_anti_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_full_outer_nation_presence",
    oracle="""
WITH cs AS (SELECT c_nationkey AS nk, COUNT(*) AS n_customers
            FROM customer GROUP BY c_nationkey),
     ss AS (SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers
            FROM supplier GROUP BY s_nationkey)
SELECT COALESCE(cs.nk, ss.nk) AS nationkey,
       COALESCE(n_customers, 0) AS n_customers,
       COALESCE(n_suppliers, 0) AS n_suppliers
FROM cs FULL OUTER JOIN ss ON cs.nk = ss.nk
""",
    doc="§2B full outer join: nations having customers, suppliers, or both. "
    "Aggregating both sides BEFORE the join keeps the outer join tiny.",
)
def join_full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    cs = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_customers"))
    )
    ss = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    j = cs.join(ss, "nk", "full_outer")
    return j.select(
        F.col("nk").alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


@register(
    "star_join_revenue_by_nation",
    oracle=f"""
SELECT n.n_name AS nation, r.r_name AS region,
       CAST(CAST(SUM(CAST(l.l_extendedprice AS {DEC}) * (1 - CAST(l.l_discount AS {DEC})))
            AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n.n_name, r.r_name
""",
    doc="§2B star join (TPC-H Q5 style): fact lineitem joins orders, "
    "customer, nation, region.  Only the BOUNDED-cardinality dims (nation "
    "25 rows, region 5 rows at ANY SF) carry broadcast hints; orders and "
    "customer scale with SF (~29% of orders survives the 2-year filter — "
    "terabytes at the 100 TB target), so a forced F.broadcast would "
    "override autoBroadcastJoinThreshold and kill the job building the "
    "broadcast.  AQE decides those joins from measured shuffle sizes: "
    "broadcast at small SF, shuffle join at scale.  The shuffle-free "
    "alternative at scale is the bucketed layout demonstrated by "
    "join_bucketed_colocated (zero-Exchange plan gate).",
)
def star_join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    rev = (F.col("l_extendedprice").cast(DEC)) * (F.lit(1) - F.col("l_discount").cast(DEC))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(F.sum(rev).cast("string").cast("double").alias("revenue"))
    )


@register(
    "window_rank_orders",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice,
       RANK() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS price_rank
FROM orders QUALIFY price_rank <= 3
""",
    doc="§2B window rank: top-3 orders per customer. Partition-local sort "
    "only — shuffles once on o_custkey, never globally sorts.",
)
def window_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.rank().over(w).alias("price_rank"),
        )
        .filter(F.col("price_rank") <= 3)
    )


@register(
    "window_lag_user_values",
    oracle="""
SELECT user_id, event_id, value,
       LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
FROM events
""",
    doc="§2B window lag: previous event value per user ordered by time "
    "(as-of-self pattern; event_id tie-break keeps it deterministic).",
)
def window_lag_user_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return _t(spark, sf_dir, "events").select(
        "user_id", "event_id", "value", F.lag("value").over(w).alias("prev_value")
    )


@register(
    "window_running_total",
    oracle=f"""
SELECT o_custkey, o_orderkey,
       CAST(CAST(SUM(CAST(o_totalprice AS {DEC})) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
           AS running_spend
FROM orders
""",
    doc="§2B window frame: per-customer running spend (ROWS BETWEEN frame).",
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("string").cast("double").alias("running_spend"),
    )


@register(
    "rollup_order_stats",
    oracle=f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       CAST(CAST(SUM(CAST(o_totalprice AS {DEC})) AS VARCHAR) AS DOUBLE) AS total
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
    doc="§2B rollup: status -> priority hierarchy with subtotals.",
)
def rollup_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("string").cast("double").alias("total"),
        )
    )


@register(
    "cube_lineitem_flags",
    oracle=f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(CAST(SUM(CAST(l_quantity AS {DEC})) AS VARCHAR) AS DOUBLE) AS total_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    doc="§2B cube over both lineitem flags (all 4 grouping combinations).",
)
def cube_lineitem_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast(DEC)).cast("string").cast("double").alias("total_qty"),
        )
    )


@register(
    "set_ops_customer_segments",
    oracle="""
WITH rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
     bld  AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
SELECT 'union' AS op, c_custkey FROM (SELECT * FROM rich UNION SELECT * FROM bld)
UNION ALL
SELECT 'intersect' AS op, c_custkey FROM (SELECT * FROM rich INTERSECT SELECT * FROM bld)
UNION ALL
SELECT 'except' AS op, c_custkey FROM (SELECT * FROM rich EXCEPT SELECT * FROM bld)
""",
    doc="§2B set operations: UNION / INTERSECT / EXCEPT over two customer "
    "predicates, tagged so one result covers all three.",
)
def set_ops_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    rich = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    bld = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return (
        rich.union(bld).distinct().select(F.lit("union").alias("op"), "c_custkey")
        .unionAll(bld.intersect(rich).select(F.lit("intersect").alias("op"), "c_custkey"))
        .unionAll(rich.exceptAll(bld).distinct().select(F.lit("except").alias("op"), "c_custkey"))
    )


@register(
    "agg_count_distinct",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events
FROM events GROUP BY event_type
""",
    doc="§2B distinct aggregation: exact distinct users per event type "
    "(Catalyst expands to a two-phase partial-distinct plan).",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
    )


@register(
    "agg_approx_count_distinct",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       TRUE AS approx_ok
FROM events GROUP BY event_type
""",
    doc="§2B approximate distinct (HyperLogLog++): the 100 TB-friendly "
    "variant of agg_count_distinct — constant memory per group. HLL sketch "
    "values differ across engines, so the oracle-able form is a SELF-CHECK: "
    "alongside the exact count we emit approx_ok = |approx-exact|/exact <= "
    "0.05, which DuckDB predicts as TRUE. The sketch runs at rsd=0.01 so "
    "the 5% gate is a 5-sigma margin, and Spark's HLL++ is deterministic "
    "for a given dataset — stable, not flaky.",
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        )
        .select(
            "event_type",
            "n_users",
            # try_divide + fallback: a group whose user_ids are ALL NULL
            # has n_users = 0 (both counts ignore NULLs), where the bare
            # division THROWS under ANSI (r12 degenerate-events sweep);
            # the honest zero-group answer is approx == exact == 0
            F.coalesce(
                F.try_divide(
                    F.abs(F.col("approx_users") - F.col("n_users")),
                    F.col("n_users"),
                )
                <= F.lit(0.05),
                F.col("approx_users") == F.col("n_users"),
            ).alias("approx_ok"),
        )
    )


@register(
    "grouping_sets_sql",
    oracle=f"""
SELECT o_orderstatus, CAST(year(o_orderdate) AS INT) AS order_year,
       COUNT(*) AS n,
       CAST(CAST(SUM(CAST(o_totalprice AS {DEC})) AS VARCHAR) AS DOUBLE) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (order_year), ())
""",
    doc="§2B GROUPING SETS via SQL text on both engines.",
)
def grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        f"""
SELECT o_orderstatus, CAST(year(o_orderdate) AS INT) AS order_year,
       COUNT(*) AS n,
       CAST(CAST(SUM(CAST(o_totalprice AS {DEC})) AS STRING) AS DOUBLE) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (CAST(year(o_orderdate) AS INT)), ())
"""
    )


@register(
    "orderby_multi_col",
    oracle="""
SELECT s_suppkey, s_name, s_nationkey, s_acctbal
FROM supplier ORDER BY s_nationkey ASC, s_acctbal DESC, s_suppkey
""",
    doc="§2B multi-column global sort (range-partitioned exchange).",
)
def orderby_multi_col(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "supplier")
        .orderBy(F.col("s_nationkey").asc(), F.col("s_acctbal").desc(), F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    )


# --- ANALYZE-style column statistics (r14, df-level) -------------------------
#
# The stats-collection face every engine ships (Spark's ANALYZE TABLE
# ... FOR COLUMNS, DuckDB/Postgres ANALYZE, Iceberg's per-file column
# metrics): per-column null count, distinct count, min/max — the inputs
# a cost-based planner feeds join reordering and a data engineer reads
# before trusting a table.  ONE pass: all columns' aggregates ride a
# single Aggregate (the multiple COUNT(DISTINCT)s expand via Catalyst's
# Expand — rows x columns before partial aggregation, the same
# bounded-output trade ANALYZE itself makes; at 100 TB the exact
# distinct arm swaps for the registry's HLL sketch, hll_distinct_df,
# exactly like Spark's own ANALYZE uses HLL++), then the one-row result
# unpivots via stack() into one row per column.  min/max are emitted as
# CAST-to-string of md5-portable types only — the sketches' cross-engine
# cast contract.

def table_profile_df(df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    """(column_name, n_rows, n_nulls, n_distinct, min_s, max_s) — one row
    per profiled column, computed in ONE aggregate pass.  Internal
    aliases are INDEX-based and the name literal rides F.lit, so any
    legal Spark column name (spaces, quotes) profiles safely (r14 review
    pass 4 #2); the portable-type guard is the sketches' own
    _require_portable_cast — ONE cross-engine cast contract, not a copy
    (pass 4 #3)."""
    from thesis_iceberg_spark.queries.sketch import _require_portable_cast

    for c in cols:
        _require_portable_cast(df, c, "table_profile_df")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    for i, c in enumerate(cols):
        aggs += [
            # count(when(..)) not sum(flag): SUM over zero rows is NULL,
            # and the null count of an empty column is 0 (pass 4 #1)
            F.count(F.when(F.col(c).isNull(), 1)).cast("bigint").alias(f"nn_{i}"),
            F.countDistinct(c).alias(f"nd_{i}"),
            F.min(c).cast("string").alias(f"mn_{i}"),
            F.max(c).cast("string").alias(f"mx_{i}"),
        ]
    one = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col(f"nn_{i}").alias("n_nulls"),
            F.col(f"nd_{i}").alias("n_distinct"),
            F.col(f"mn_{i}").alias("min_s"),
            F.col(f"mx_{i}").alias("max_s"),
        )
        for i, c in enumerate(cols)
    ]
    return (
        one.select("n_rows", F.explode(F.array(*rows)).alias("p"))
        .select(
            "p.column_name", "n_rows", "p.n_nulls", "p.n_distinct",
            "p.min_s", "p.max_s",
        )
    )


PROFILE_EVENT_COLS = ("event_id", "user_id", "event_type")


def relational_table_profile_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column statistics over events(event_id, user_id, event_type) —
    r15/r16 registration candidate; sql_table_profile() is the ready
    oracle builder."""
    return table_profile_df(
        load_table(spark, sf_dir, "events"), PROFILE_EVENT_COLS
    )


def sql_table_profile(
    table: str = "events", cols: tuple[str, ...] = PROFILE_EVENT_COLS
) -> str:
    """DuckDB twin of table_profile_df: the same single aggregate,
    unpivoted by a UNION ALL over the column literals."""
    aggs = ["CAST(COUNT(*) AS BIGINT) AS n_rows"]
    for i, c in enumerate(cols):
        q = '"' + c.replace('"', '""') + '"'  # identifier-quoted name
        aggs += [
            # COUNT(CASE...) not SUM: the null count of an empty column
            # is 0, and SUM over zero rows is NULL (pass 4 #1 — both
            # twins fixed together so the parity stays honest)
            f"CAST(COUNT(CASE WHEN {q} IS NULL THEN 1 END) AS BIGINT) AS nn_{i}",
            f"CAST(COUNT(DISTINCT {q}) AS BIGINT) AS nd_{i}",
            f"CAST(MIN({q}) AS VARCHAR) AS mn_{i}",
            f"CAST(MAX({q}) AS VARCHAR) AS mx_{i}",
        ]
    arms = "\nUNION ALL\n".join(
        "SELECT '" + c.replace("'", "''") + f"' AS column_name, n_rows, "
        f"nn_{i} AS n_nulls, nd_{i} AS n_distinct, mn_{i} AS min_s, "
        f"mx_{i} AS max_s FROM a"
        for i, c in enumerate(cols)
    )
    return f"WITH a AS (SELECT {', '.join(aggs)} FROM {table})\n{arms}"
