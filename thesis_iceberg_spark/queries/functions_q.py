"""Scalar-function coverage: string / math / array / JSON (§2B — the
reference uses almost no scalar functions, SURVEY.md §2A absence list).

Each query exercises a function family end-to-end with an exact DuckDB
oracle, so the function surface is verified, not just present. All
JVM-side builtins — these run inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from thesis_iceberg_spark.queries import register
from thesis_iceberg_spark.sources.registry import load_table


@register(
    "json_extract_props",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
""",
    doc="JSON scalar functions over the events.props column: path "
    "extraction (get_json_object / ->>), cast, aggregate. At scale the "
    "extraction runs codegen'd per row — no Python, no UDF.",
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "string_funcs_profile",
    oracle="""
SELECT s.s_suppkey,
       upper(s.s_name) AS name_upper,
       substr(s.s_name, 1, 8) AS name_prefix,
       concat(n.n_name, '/', s.s_name) AS nation_supplier,
       length(s.s_name) AS name_len,
       levenshtein(s.s_name, n.n_name) AS edit_to_nation,
       replace(lower(s.s_name), 'supplier', 'S') AS name_compact
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
""",
    doc="String-function family: upper/substr/concat/length/levenshtein/"
    "replace over a broadcast dim join — both engines implement identical "
    "semantics (levenshtein included).",
)
def string_funcs_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    j = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    return j.select(
        "s_suppkey",
        F.upper("s_name").alias("name_upper"),
        F.substring("s_name", 1, 8).alias("name_prefix"),
        F.concat_ws("/", "n_name", "s_name").alias("nation_supplier"),
        F.length("s_name").alias("name_len"),
        F.levenshtein("s_name", "n_name").alias("edit_to_nation"),
        F.replace(F.lower(F.col("s_name")), F.lit("supplier"), F.lit("S")).alias(
            "name_compact"
        ),
    )


@register(
    "array_funcs_embeddings",
    oracle="""
SELECT vec_id,
       len(embedding) AS dim,
       CAST(list_max(embedding) AS DOUBLE) AS v_max,
       CAST(list_min(embedding) AS DOUBLE) AS v_min,
       CAST(embedding[1] AS DOUBLE) AS v_first,
       CAST(list_max(embedding[1:8]) AS DOUBLE) AS head_max,
       len(list_filter(embedding, x -> x > 0)) AS n_positive
FROM embeddings
""",
    doc="Array-function family over the embedding column: size / min / max "
    "/ indexing / slice / higher-order filter. float values pass through "
    "untouched (no arithmetic), so cross-engine equality is exact.",
)
def array_funcs_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.array_max("embedding").cast("double").alias("v_max"),
        F.array_min("embedding").cast("double").alias("v_min"),
        # F.get, not [0]: ordinal indexing THROWS on an empty array under
        # ANSI (Spark 4 default); get() yields NULL, matching DuckDB's
        # out-of-bounds list semantics (values identical when non-empty)
        F.get("embedding", 0).cast("double").alias("v_first"),
        F.array_max(F.slice("embedding", 1, 8)).cast("double").alias("head_max"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    )


@register(
    "math_funcs_profile",
    oracle="""
SELECT o_orderkey,
       round(o_totalprice, 1) AS price_round,
       CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
       CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
       CAST(o_orderkey % 7 AS BIGINT) AS key_mod,
       abs(o_totalprice - 100000.0) AS dist_100k,
       sqrt(o_totalprice) AS price_sqrt
FROM orders WHERE o_orderkey <= 1000
""",
    doc="Math-function family: round/floor/ceil/mod/abs/sqrt (sqrt is "
    "IEEE-correctly-rounded so it reproduces exactly; ln/exp are excluded "
    "because JVM and libm differ by 1 ulp on some inputs).",
)
def math_funcs_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    return o.select(
        "o_orderkey",
        F.round("o_totalprice", 1).alias("price_round"),
        F.floor("o_totalprice").alias("price_floor"),
        F.ceil("o_totalprice").alias("price_ceil"),
        (F.col("o_orderkey") % 7).cast("bigint").alias("key_mod"),
        F.abs(F.col("o_totalprice") - 100000.0).alias("dist_100k"),
        # ln/exp are NOT correctly-rounded (JVM vs libm differ by 1 ulp on
        # some inputs); sqrt IS IEEE-correctly-rounded, so it stays
        F.sqrt("o_totalprice").alias("price_sqrt"),
    )


@register(
    "map_funcs_event_props",
    oracle="""
SELECT event_type,
       CAST(map(['type'], [event_type])['type'][1] AS VARCHAR) AS from_map,
       COUNT(*) AS n
FROM events GROUP BY event_type
""",
    doc="Map-type construction and lookup (create_map / element access) — "
    "the remaining §2B complex-type family.",
)
def map_funcs_event_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n")
    ).select(
        "event_type",
        F.create_map(F.lit("type"), F.col("event_type"))["type"].alias("from_map"),
        "n",
    )


@register(
    "agg_collect_sorted",
    oracle="""
SELECT n_regionkey,
       array_to_string(list_sort(list(n_name)), ',') AS nations_csv,
       CAST(len(list(n_name)) AS INT) AS n_nations,
       CAST(regexp_extract(MIN(n_name), 'NATION_([0-9]+)', 1) AS BIGINT)
           AS min_nation_num
FROM nation GROUP BY n_regionkey
""",
    doc="Collection aggregates made deterministic: collect_list is "
    "order-nondeterministic, so sort_array(collect_list(...)) is the "
    "reproducible form, rendered via array_join (registered outputs carry "
    "NO raw array/map/struct columns — the driver comparator can't "
    "canonicalize them); plus a capture-group regexp_extract.",
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    sorted_names = F.sort_array(F.collect_list("n_name"))
    return n.groupBy("n_regionkey").agg(
        F.array_join(sorted_names, ",").alias("nations_csv"),
        F.size(sorted_names).alias("n_nations"),
        F.regexp_extract(F.min("n_name"), r"NATION_([0-9]+)", 1)
        .cast("bigint")
        .alias("min_nation_num"),
    )


@register(
    "pivot_status_by_year",
    oracle="""
SELECT CAST(year(o_orderdate) AS INT) AS order_year,
       CAST(COUNT(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS F,
       CAST(COUNT(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS O,
       CAST(COUNT(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS P
FROM orders GROUP BY 1
""",
    doc="Pivot (long->wide): order counts per year pivoted on status. "
    "Spark's pivot with an EXPLICIT value list is a single-pass conditional "
    "aggregation (no extra distinct-values job, fixed output schema — the "
    "scale-safe form); the oracle states the same as FILTERed counts.",
)
def pivot_status_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
    )


@register(
    "time_funcs_profile",
    oracle="""
SELECT event_id,
       CAST(year(ts) AS INT) AS y,
       CAST(month(ts) AS INT) AS m,
       CAST(day(ts) AS INT) AS d,
       CAST(hour(ts) AS INT) AS h,
       CAST(dayofweek(ts) AS INT) + 1 AS dow,
       strftime(ts + INTERVAL 90 DAY, '%Y-%m-%d') AS plus_90d,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_bucket,
       CAST(date_diff('day', TIMESTAMP '2024-01-01 00:00:00', ts) AS BIGINT) AS days_since_epoch0
FROM events WHERE event_id <= 2000
""",
    doc="Date/time-function family: extract (year..hour, dayofweek), "
    "interval arithmetic, date_trunc, datediff. DuckDB dayofweek is "
    "0=Sunday vs Spark 1=Sunday — the oracle shifts by one; all outputs "
    "are ints or formatted strings so equality is exact.",
)
def time_funcs_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 2000)
    return e.select(
        "event_id",
        F.year("ts").cast("int").alias("y"),
        F.month("ts").cast("int").alias("m"),
        F.dayofmonth("ts").cast("int").alias("d"),
        F.hour("ts").cast("int").alias("h"),
        F.dayofweek("ts").cast("int").alias("dow"),
        F.date_format(F.col("ts") + F.expr("INTERVAL 90 DAYS"), "yyyy-MM-dd").alias("plus_90d"),
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour_bucket"),
        F.datediff(
            F.to_date("ts"), F.lit("2024-01-01").cast("date")
        ).cast("bigint").alias("days_since_epoch0"),
    )


@register(
    "agg_percentiles",
    oracle="""
SELECT o_orderstatus,
       quantile_cont(o_totalprice, 0.5) AS p50,
       quantile_cont(o_totalprice, 0.9) AS p90,
       quantile_cont(o_totalprice, 0.99) AS p99
FROM orders GROUP BY o_orderstatus
""",
    doc="Exact percentiles (linear interpolation): Spark percentile() and "
    "DuckDB quantile_cont use the same interpolation and reproduce "
    "bit-identical doubles (verified). The approx sketch variant for "
    "100 TB is approx_percentile — see agg_approx_count_distinct for the "
    "same exact-vs-sketch trade-off.",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
        F.percentile("o_totalprice", F.lit(0.9)).alias("p90"),
        F.percentile("o_totalprice", F.lit(0.99)).alias("p99"),
    )


@register(
    "q3_unshipped_topk",
    oracle="""
SELECT l.l_orderkey,
       CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                     * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS VARCHAR)
            AS DOUBLE) AS revenue,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate_s
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l_orderkey LIMIT 10
""",
    doc="TPC-H Q3 analog: segment-filtered customers x date-bounded orders "
    "x unshipped lineitems, revenue per order, top-10. No forced hints: "
    "orders is a FACT table and customer scales with SF, so both joins are "
    "left to AQE (shuffle join at scale, broadcast only if the filtered "
    "side is genuinely small at runtime); TakeOrderedAndProject for the "
    "limit.",
)
def q3_unshipped_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,4)")
    )
    return (
        # no broadcast hint on ANY side: orders is a fact table and customer
        # scales with SF (150k rows per TPC-H SF) — a forced hint would
        # override spark.sql.autoBroadcastJoinThreshold and OOM at 100x
        # scale; AQE picks broadcast at small SF, shuffle join at scale
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).cast("string").cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_s"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q14_promo_revenue",
    oracle="""
SELECT CAST(CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                          THEN CAST(l.l_extendedprice AS DECIMAL(18,4))
                               * (1 - CAST(l.l_discount AS DECIMAL(18,4)))
                          ELSE CAST(0 AS DECIMAL(18,4)) END) AS VARCHAR) AS DOUBLE)
         AS promo_revenue,
       CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                     * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS VARCHAR)
            AS DOUBLE) AS total_revenue,
       COUNT(*) AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1997-02-01 00:00:00'
""",
    doc="TPC-H Q14 analog (promo revenue share): month-sliced lineitem "
    "joined to part (SF-scaling — AQE picks the strategy, no forced hint), "
    "conditional decimal aggregation. Exercises LIKE-prefix predicates + "
    "CASE inside SUM.",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-02-01 00:00:00").cast("timestamp_ntz"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,4)")
    )
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        # part scales with SF (200k rows per TPC-H SF) — no forced hint;
        # AQE broadcasts at small SF from measured sizes
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.sum(promo).cast("string").cast("double").alias("promo_revenue"),
            F.sum(rev).cast("string").cast("double").alias("total_revenue"),
            F.count("*").alias("n_lines"),
        )
    )
