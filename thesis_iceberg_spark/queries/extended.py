"""Extended relational operators: as-of join, range join, Python UDF paths
(SURVEY.md §2B — operators the reference lacks entirely).

The UDF queries demonstrate the engine's Python escape hatches the RIGHT
way: Arrow-vectorized ``pandas_udf`` (scalar and grouped-agg), never
row-at-a-time Python UDFs. Everything else in this engine is JVM-side;
these exist because a real pipeline sometimes needs numpy/pandas logic.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from thesis_iceberg_spark.queries import register
from thesis_iceberg_spark.queries.textnorm import fold_py, fold_sql, pd_trans_table
from thesis_iceberg_spark.sources.registry import load_table

# --- CSV fixture for the S4 ingest query (written with stdlib at import
# time so it exists before either engine runs; deterministic contents) ----

CSV_FIXTURE = "/tmp/tisw_csv_fixture/people.csv"


def _ensure_csv_fixture() -> None:
    import os

    os.makedirs(os.path.dirname(CSV_FIXTURE), exist_ok=True)
    rows = ["Index,First Name,Date of birth,Job Title"]
    jobs = ['"Editor, commissioning"', "Engineer", "Analyst", '"Scientist, data"']
    for i in range(1, 201):
        yy = (i * 7) % 100
        dd = (i % 28) + 1
        mm = (i % 12) + 1
        rows.append(f"{i},Person{i},{dd:02d}-{mm:02d}-{yy:02d},{jobs[i % 4]}")
    content = "\n".join(rows) + "\n"
    if not (os.path.exists(CSV_FIXTURE) and open(CSV_FIXTURE).read() == content):
        with open(CSV_FIXTURE, "w") as f:
            f.write(content)


_ensure_csv_fixture()


@register(
    "asof_join_last_event",
    oracle="""
WITH j AS (
  SELECT o.o_orderkey, o.o_custkey,
         strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate_s,
         e.ts, e.event_id, e.value,
         ROW_NUMBER() OVER (PARTITION BY o.o_orderkey
                            ORDER BY e.ts DESC, e.event_id DESC) AS rn
  FROM orders o
  LEFT JOIN events e ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate)
SELECT o_orderkey, o_custkey, o_orderdate_s,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_ts_s,
       value AS last_value
FROM j WHERE rn = 1
""",
    doc="As-of join: for every order, the customer's most recent event at "
    "or before the order date (deterministic event_id tie-break). Spark "
    "plan: equi-join on the user key + per-order top-1 window — one shuffle "
    "on the key, no inequality cross-product. DuckDB's native ASOF JOIN "
    "computes the same relation (the window oracle pins tie-breaks).",
)
def asof_join_last_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Top-1-per-order as a MAX(struct) aggregation, not a window (r15
    # optimization round, guide §2.3 "aggregate before you shuffle"):
    # row_number().over(orderkey) compiled to Sort + WindowGroupLimit +
    # Exchange + Sort + WindowGroupLimit + Window + Filter
    # (plans/r15/asof_join_last_event_before.txt).  MAX(struct(ts,
    # event_id, value)) under the same grouping is the identical
    # relation — struct ordering is lexicographic on (ts, event_id),
    # matching the window's (ts DESC, event_id DESC) top-1 (event_id is
    # unique, so the value field never decides), and an orderless
    # no-event order keeps its single all-NULL-fields struct.  A struct
    # max is not hash-aggregable, so the plan is SortAggregate around
    # the same exchange — still strictly less work than the window
    # form: the partial agg ships <= 1 row per (order, task) like
    # WindowGroupLimit did, but the trailing Window + rn-Filter pass is
    # gone and both sorts order by the 3 fixed group keys instead of
    # (order, ts DESC, event_id DESC)
    # (plans/r15/asof_join_last_event_after.txt).  Measured
    # (tests/exp_r15_asof_ab.py, interleaved same-JVM A/B, two runs):
    # 0.95x/0.93x the window form locally, rows verified identical.
    o = load_table(spark, sf_dir, "orders")
    e = load_table(spark, sf_dir, "events")
    j = o.join(
        e, (e.user_id == o.o_custkey) & (e.ts <= o.o_orderdate), "left"
    )
    return (
        j.groupBy("o_orderkey", "o_custkey", "o_orderdate")
        .agg(F.max(F.struct("ts", "event_id", "value")).alias("last"))
        .select(
            "o_orderkey",
            "o_custkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_s"),
            F.date_format("last.ts", "yyyy-MM-dd HH:mm:ss").alias("event_ts_s"),
            F.col("last.value").alias("last_value"),
        )
    )


@register(
    "range_join_event_window",
    oracle="""
SELECT o.o_orderkey, COUNT(e.event_id) AS n_events_7d
FROM orders o
LEFT JOIN events e
  ON e.user_id = o.o_custkey
 AND e.ts >= o.o_orderdate
 AND e.ts < o.o_orderdate + INTERVAL 7 DAY
GROUP BY o.o_orderkey
""",
    doc="Range (band) join: events of the same customer within 7 days after "
    "each order. The equality key carries the shuffle; the range predicate "
    "filters within each key group — never a cartesian.",
)
def range_join_event_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    e = load_table(spark, sf_dir, "events")
    cond = (
        (e.user_id == o.o_custkey)
        & (e.ts >= o.o_orderdate)
        & (e.ts < F.expr("o_orderdate + INTERVAL 7 DAYS"))
    )
    return (
        o.join(e, cond, "left")
        .groupBy("o_orderkey")
        .agg(F.count("event_id").alias("n_events_7d"))
    )


@register(
    "pandas_udf_scalar_text",
    oracle=f"""
SELECT doc_id,
       len(list_filter(
           regexp_split_to_array(trim({fold_sql('text', cased=False)}), '\\s+'),
           x -> x <> '')) AS n_words_udf,
       length(text) - length(replace(text, 'a', '')) AS n_letter_a
FROM documents
""",
    doc="Arrow-vectorized SCALAR pandas_udf (the sanctioned Python hot "
    "path): pandas str ops over whole Arrow batches, ~10-100x faster than "
    "row-at-a-time Python UDFs. Integer outputs keep it exactly oracle-able.",
)
def pandas_udf_scalar_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.pandas_udf("long")
    def n_words(texts: pd.Series) -> pd.Series:
        # NULL text -> NULL count (pandas str.split leaves NaN; a bare
        # map(len) crashed on it — caught by the r10 \x0B-corpus sweep).
        # Counting NON-EMPTY tokens is the only edge-stable contract:
        # pandas .str.strip() eats edge \t/\n that DuckDB's space-only
        # trim() keeps (as an empty token), and an empty doc splits to
        # [''] in both — dropping empties makes the two agree on every
        # edge shape (review r10; the oracle mirrors with list_filter).
        # The textnorm fold is applied via str.translate (r11): pandas
        # strip/\s+ already treat \x0B AND unicode whitespace as
        # whitespace, but the fold also DELETES invisible formatting
        # chars like the oracle does — without it a zero-width-space-only
        # doc counts 1 here and 0 there.
        return (
            texts.str.translate(pd_trans_table(cased=False))
            .str.strip()
            .str.split(r"\s+")
            .map(
                lambda x: sum(1 for t in x if t) if isinstance(x, list) else None
            )
            .astype("Int64")
        )

    @F.pandas_udf("long")
    def n_letter_a(texts: pd.Series) -> pd.Series:
        return texts.str.count("a")

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        n_words("text").alias("n_words_udf"),
        n_letter_a("text").alias("n_letter_a"),
    )


@register(
    "pandas_udf_grouped_median",
    oracle="""
SELECT o_orderstatus, median(o_totalprice) AS median_price, COUNT(*) AS n
FROM orders GROUP BY o_orderstatus
""",
    doc="Grouped-aggregate pandas_udf (UDAF path): per-status median order "
    "price via numpy over Arrow groups. Median is selection/interpolation, "
    "not summation, so it reproduces exactly across engines.",
)
def pandas_udf_grouped_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    @F.pandas_udf("double")
    def median_udaf(prices: pd.Series) -> float:
        return float(np.median(prices.values))

    @F.pandas_udf("long")
    def count_udaf(prices: pd.Series) -> int:
        # grouped-agg pandas UDFs can't mix with built-in aggregates in one
        # agg() — so the row count is a pandas UDAF too
        return int(prices.size)

    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        median_udaf("o_totalprice").alias("median_price"),
        count_udaf("o_totalprice").alias("n"),
    )


@register(
    "csv_ingest_repair",
    oracle=f"""
WITH raw AS (
  SELECT "Index" AS idx, "First Name" AS first_name,
         strptime("Date of birth", '%d-%m-%y') AS dob_raw,
         "Job Title" AS job_title
  FROM read_csv('{CSV_FIXTURE}', header = true,
                columns = {{'Index': 'BIGINT', 'First Name': 'VARCHAR',
                           'Date of birth': 'VARCHAR', 'Job Title': 'VARCHAR'}}))
SELECT idx, first_name,
       strftime(CASE WHEN dob_raw > current_date
                     THEN dob_raw - INTERVAL 100 YEAR ELSE dob_raw END,
                '%Y-%m-%d') AS dob_s,
       job_title
FROM raw
""",
    doc="S4 CSV ingestion with date repair (ref: #cell-66): dd-MM-yy "
    "parsing, future-year-minus-100 fix, quoted commas — distributed Spark "
    "CSV reader vs DuckDB read_csv applying the identical repair rule.",
)
def csv_ingest_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    from thesis_iceberg_spark.sources.csv import read_csv

    _ensure_csv_fixture()
    df = read_csv(spark, CSV_FIXTURE, date_columns={"Date of birth": "dd-MM-yy"})
    return df.select(
        F.col("Index").alias("idx"),
        F.col("First Name").alias("first_name"),
        F.date_format("Date of birth", "yyyy-MM-dd").alias("dob_s"),
        F.col("Job Title").alias("job_title"),
    )


@register(
    "agg_q6_revenue",
    oracle="""
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                   * CAST(l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
         AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
    doc="TPC-H Q6 analog: single-pass filtered scalar aggregate. All three "
    "predicates push to the parquet scan; the whole query is one codegen "
    "stage with a scalar combine — the cheapest possible shape at 100 TB.",
)
def agg_q6_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,4)")
                * F.col("l_discount").cast("decimal(18,4)")
            )
            .cast("string")
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "agg_salted_skew",
    oracle="""
SELECT event_type, COUNT(*) AS n,
       CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS total
FROM events GROUP BY event_type
""",
    doc="Two-phase SALTED aggregation for skewed keys (§2B scale posture): "
    "phase 1 groups by (key, salt=event_id%16) so a hot key spreads over 16 "
    "reducers; phase 2 combines the 16 partials per key. Result is exactly "
    "the direct groupBy (the oracle); the plan trades one tiny extra "
    "shuffle for skew immunity. AQE's skew-join handles joins; this is the "
    "aggregation-side equivalent.",
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    partial = (
        e.withColumn("_salt", (F.col("event_id") % 16).cast("int"))
        .groupBy("event_type", "_salt")
        .agg(
            F.count("*").alias("pn"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("pt"),
        )
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        F.sum("pt").cast("string").cast("double").alias("total"),
    )


@register(
    "join_bucketed_colocated",
    oracle="""
SELECT o.o_orderkey, c.c_custkey, c.c_mktsegment, o.o_orderstatus
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_acctbal > 0
""",
    doc="Write-time BUCKETED join (§2B co-located joins): both sides are "
    "persisted bucketed+sorted by the join key, so the sort-merge join "
    "needs NO exchange and NO sort — the 100 TB pattern for repeated "
    "fact-fact joins (bucket layout amortizes the shuffle across every "
    "future join). Plan-asserted shuffle-free in tests/test_plans.py.",
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    tag = os.path.basename(os.path.normpath(sf_dir))
    n_buckets = 8
    names = {}
    for t, key in (("orders", "o_custkey"), ("customer", "c_custkey")):
        tbl = f"bkt_{tag.replace('.', '_')}_{t}"
        names[t] = tbl
        if not spark.catalog.tableExists(tbl):
            # the in-memory catalog forgets tables across sessions but the
            # warehouse directory persists — clear any stale location
            import shutil

            shutil.rmtree(
                os.path.join(spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:"), tbl),
                ignore_errors=True,
            )
            (
                load_table(spark, sf_dir, t)
                .write.bucketBy(n_buckets, key)
                .sortBy(key)
                .mode("overwrite")
                .format("parquet")
                .saveAsTable(tbl)
            )
    o = spark.table(names["orders"])
    c = spark.table(names["customer"]).filter(F.col("c_acctbal") > 0)
    # disable broadcast so the bucketed sort-merge path is exercised
    j = o.join(c.hint("merge"), o.o_custkey == c.c_custkey)
    return j.select("o_orderkey", "c_custkey", "c_mktsegment", "o_orderstatus")


@register(
    "skyline_price_size",
    oracle="""
SELECT a.p_partkey, a.p_retailprice, a.p_size
FROM part a
WHERE NOT EXISTS (
  SELECT 1 FROM part b
  WHERE b.p_retailprice <= a.p_retailprice AND b.p_size <= a.p_size
    AND (b.p_retailprice < a.p_retailprice OR b.p_size < a.p_size))
""",
    doc="Skyline query (2D Pareto-dominance, minimize price and size; cf. "
    "'Integration of Skyline Queries into Spark SQL', EDBT 2023): two-phase "
    "local-then-global sweep via Arrow mapInPandas — exact, no O(n^2) join. "
    "The oracle is the textbook NOT EXISTS dominance test.",
)
def skyline_price_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    from thesis_iceberg_spark.operators.skyline import skyline_2d

    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    )
    return skyline_2d(part, "p_retailprice", "p_size")


@register(
    "udtf_tokenize_positions",
    oracle=f"""
WITH t AS (
  SELECT doc_id,
         list_filter(
             regexp_split_to_array(trim({fold_sql('text', cased=False)}), '\\s+'),
             x -> x <> '') AS toks
  FROM documents WHERE doc_id <= 50)
SELECT doc_id, unnest(toks) AS token,
       CAST(generate_subscripts(toks, 1) AS INT) AS pos
FROM t
""",
    doc="Python UDTF (table function): one input document row expands to "
    "one row per token with its 1-based position. Demonstrates the UDTF "
    "registration + lateral-join path; bounded to 50 docs because per-row "
    "Python is the slow path (posexplode does this JVM-side — see "
    "text_top_bigrams_by_lang for the idiomatic variant).",
)
def udtf_tokenize_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    class Tokenize:
        def eval(self, text: str):
            # NULL text -> zero rows, like the oracle's unnest(NULL);
            # no-arg split() already treats \x0B and unicode whitespace
            # as separators (edges included), but the textnorm fold must
            # still run so invisible formatting chars are deleted from
            # the yielded TOKEN TEXT exactly like the folded oracle (r11)
            if text is None:
                return
            for i, tok in enumerate(fold_py(text, cased=False).split(), start=1):
                yield tok, i

    spark.udtf.register(
        "tokenize_udtf", udtf(Tokenize, returnType="token string, pos int")
    )
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        "SELECT doc_id, t.token, t.pos "
        "FROM documents, LATERAL tokenize_udtf(text) AS t WHERE doc_id <= 50"
    )
