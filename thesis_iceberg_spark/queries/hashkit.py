"""The registry's ONE portable keyed-hash kernel.

Every deterministic sampling / bucketing / sketching decision in the
engine reduces to "first 32 bits of md5(some-string) as an integer",
because md5-over-UTF-8 is the one hash family Spark, DuckDB, and Python
all compute identically (review r10 consolidated four drifting copies of
the doc_id form; review r12 pulled the column-input form out of text.py
and classify.py so a fifth copy could not drift).

DuckDB twin of ``md5_u32(expr)``:
    CAST('0x' || substr(md5(<expr-sql>), 1, 8) AS BIGINT)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_u32(col: Column) -> Column:
    """First 32 bits of md5 of a string column as a BIGINT in [0, 2^32).

    The cast to binary pins the hashed bytes to UTF-8 in Spark, matching
    DuckDB's md5(VARCHAR) and Python's md5(s.encode()).
    """
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 8), 16, 10).cast(
        "bigint"
    )
