"""Garbage/mojibake detection (r11): the decode-damage gate over RAW text.

The registered query's full value oracle covers the deterministic-damage
arms; this file pins the df-level behavior on crafted real-world shapes —
actual U+FFFD mojibake, control-character runs, the whitespace exclusions
(the detector must NOT count what other operators treat as whitespace),
the threshold boundary, and NULL/empty propagation.
"""

from __future__ import annotations

from thesis_iceberg_spark.queries.text import (
    GARBAGE_MAX_CONTROL_RATIO,
    garbage_flags_df,
)


def _flags(spark, rows):
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    return {r.doc_id: r for r in garbage_flags_df(df).collect()}


def test_mojibake_and_control_detection(spark):
    out = _flags(
        spark,
        [
            (1, "perfectly clean prose with words"),
            (2, "lossy decode le�ft marks he�re"),  # U+FFFD
            (3, "binary sp\x00ill\x01 in\x02 text" + "x" * 400),  # NUL etc.
            (4, "\x07" * 10),  # pure control garbage
        ],
    )
    assert out[1].n_replacement == 0 and out[1].n_control == 0
    assert out[1].keep is True and out[1].garbage_ratio == 0.0
    assert out[2].n_replacement == 2 and out[2].keep is False
    assert out[3].n_control == 3
    # 3 control chars in ~420 -> ratio > 0.005 -> rejected
    assert out[3].keep is False
    assert out[4].n_control == 10 and out[4].keep is False


def test_whitespace_class_is_not_garbage(spark):
    # \t \n \x0B \x0C \r and the \x1C-\x1F separators belong to the
    # whitespace/fold contract — the detector must not count them
    out = _flags(spark, [(1, "a\tb\nc\x0bd\x0ce\rf\x1cg\x1dh\x1ei\x1fj")])
    assert out[1].n_control == 0 and out[1].n_replacement == 0
    assert out[1].keep is True


def test_threshold_boundary_exact(spark):
    # exactly at the ratio: 1 control char in 200 chars = 0.005 -> keep
    text_at = "\x01" + "x" * 199
    # just over: 1 in 199 chars > 0.005 -> reject
    text_over = "\x01" + "x" * 198
    out = _flags(spark, [(1, text_at), (2, text_over)])
    assert out[1].garbage_ratio == GARBAGE_MAX_CONTROL_RATIO
    assert out[1].keep is True
    assert out[2].keep is False


def test_null_and_empty_text(spark):
    out = _flags(spark, [(1, None), (2, "")])
    assert out[1].n_replacement is None and out[1].keep is None
    # empty doc: zero counts, 0/0 division -> NULL ratio, coalesced keep
    assert out[2].n_replacement == 0 and out[2].garbage_ratio is None
    assert out[2].keep is True


def test_registered_oracle_parity_on_empty_doc_without_damage_tail(
    spark, tmp_path_factory
):
    # review r11: an EMPTY doc whose doc_id % 15 == 0 gets an empty damage
    # tail -> length(t)=0 -> DuckDB 0/0 ratio is NULL, and the oracle's
    # keep lacked the COALESCE its Spark twin has (NULL vs TRUE mismatch).
    # Full driver-style compare over a corpus crafted to hit that arm.
    import duckdb

    from thesis_iceberg_spark.oracle import compare_query
    from thesis_iceberg_spark.queries import REGISTRY, queries

    queries()
    d = str(tmp_path_factory.mktemp("garb_empty"))
    rows = [
        (15, "", "en", "src0", 0),  # empty + %15==0: no tail at all
        (30, None, "en", "src0", None),  # NULL propagates NULL everywhere
        (16, "", "en", "src1", 0),  # empty + damage tail (repl hit)
        (17, "clean prose here", "en", "src2", 16),
    ]
    spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    ).write.parquet(f"{d}/documents.parquet")
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{d}/documents.parquet/*.parquet')"
    )
    spec = REGISTRY["text_garbage_flags"]
    r = compare_query(spark, con, "text_garbage_flags", spec.fn, spec.oracle, d)
    assert r.ok, str(r)
