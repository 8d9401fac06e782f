"""CSV ingestion with date repair (SURVEY.md §2A S4; ref: #cell-66 (json:2152)).

The reference ingests 'Employee 1000x.csv' through pandas: parse dd-MM-yy
dates, subtract 100 years from dates that land in the future (two-digit-year
pivot bug), then ``spark.createDataFrame``.  That path funnels every row
through the driver; this engine does the same repair distributed, with
Spark's native CSV reader and column expressions — no pandas, no driver
materialization, scales to any number of files.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def repair_two_digit_year(col: Column) -> Column:
    """Fix dd-MM-yy dates parsed into the future: Spark maps 'yy' into
    2000-2099, so a birthdate '23-05-39' becomes 2039-05-23; anything after
    the current date gets 100 years subtracted (ref: #cell-66's
    ``np.where(year > current_year, date - 100 years, date)``)."""
    return F.when(col > F.current_date(), F.add_months(col, -1200)).otherwise(col)


def read_csv(
    spark: SparkSession,
    path: str,
    date_columns: dict[str, str] | None = None,
    **options,
) -> DataFrame:
    """Read CSV with header + schema inference (quoted fields with commas
    survive, matching pandas' behavior on 'Job Title' values like
    '"Editor, commissioning"').  ``date_columns`` maps column -> source
    format; two-digit-year formats get the future-date repair."""
    df = (
        spark.read.option("header", True)
        .option("inferSchema", True)
        .option("quote", '"')
        .option("escape", '"')
        .options(**options)
        .csv(path)
    )
    for name, fmt in (date_columns or {}).items():
        parsed = F.to_date(F.col(name), fmt)
        if "yyyy" not in fmt and "yy" in fmt:
            parsed = repair_two_digit_year(parsed)
        df = df.withColumn(name, parsed)
    return df
