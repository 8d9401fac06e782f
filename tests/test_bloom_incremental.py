"""dedup_incremental_bloom (r12): cross-batch membership dedup.

The Bloom filter is PRUNING only — the confirm join makes the output
exact — so the tests pin (a) exactness against the plain semi-join on
both the driver corpus and a crafted-dup corpus, (b) that the filter
actually prunes (the scale claim), (c) the false-positive rate against
its design target, and (d) the zero-shuffle probe plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from thesis_iceberg_spark.queries import REGISTRY, queries
from thesis_iceberg_spark.queries.dedup import (
    BLOOM_FPP,
    RECRAWL_ID_OFFSET,
    _bloom_params,
    _norm,
    bloom_build,
    bloom_probe,
)
from thesis_iceberg_spark.sources.registry import load_table

queries()


def _exact_semi(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select("doc_id", F.md5(_norm().cast("binary")).alias("fingerprint"))
    ex = (
        fp.filter(F.col("doc_id") % 2 == 0)
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("canonical_doc_id"))
    )
    batch = fp.select(
        (F.col("doc_id") + RECRAWL_ID_OFFSET).alias("doc_id"), "fingerprint"
    )
    return batch.join(ex, "fingerprint").select(
        "doc_id", "canonical_doc_id", "fingerprint"
    )


def test_output_is_exact_semi_join(spark, sf_dir):
    got = sorted(map(tuple, REGISTRY["dedup_incremental_bloom"].fn(spark, sf_dir).collect()))
    want = sorted(map(tuple, _exact_semi(spark, sf_dir).collect()))
    assert got == want
    assert got, "no members at driver scale — the member arm is untested"


def test_bloom_params_shape():
    m, k = _bloom_params(1000)
    assert m % 64 == 0
    assert 1 <= k <= 16
    # textbook sizing: ~9.6 bits/key at 1% fpp
    assert 9 * 1000 <= m <= 11 * 1000
    assert _bloom_params(0)[0] >= 64  # degenerate corpus still valid


def test_no_false_negatives_and_measured_fpp(spark):
    # members must ALL survive the probe (false negatives impossible);
    # non-member survival rate must sit near the design fpp
    import hashlib

    members = [hashlib.md5(f"m{i}".encode()).hexdigest() for i in range(2000)]
    others = [hashlib.md5(f"x{i}".encode()).hexdigest() for i in range(4000)]
    m, k = _bloom_params(len(members))
    mdf = spark.createDataFrame([(s,) for s in members], "fingerprint string")
    bloom = spark.sparkContext.broadcast(bloom_build(mdf, m, k))
    odf = spark.createDataFrame(
        [(i, s) for i, s in enumerate(members + others)], "i long, fingerprint string"
    )
    survivors = {r.i for r in bloom_probe(odf, bloom, m, k).collect()}
    assert set(range(len(members))) <= survivors  # no false negatives
    fp_rate = (len(survivors) - len(members)) / len(others)
    assert fp_rate <= 5 * BLOOM_FPP, fp_rate  # 1% design, loose 5x gate


def test_probe_prunes_before_any_shuffle(spark, sf_dir):
    # the scale claim: the non-duplicate majority dies in a narrow Arrow
    # map, BEFORE the confirm join's exchange — the probe subtree itself
    # must contain no Exchange, and the filter must actually prune (odd
    # docs' re-crawls are non-members)
    from thesis_iceberg_spark.plans import formatted_plan
    from thesis_iceberg_spark.queries.dedup import _docs, _bloom_params

    docs = _docs(spark, sf_dir)
    fp = docs.select("doc_id", F.md5(_norm().cast("binary")).alias("fingerprint"))
    existing = fp.filter(F.col("doc_id") % 2 == 0)
    batch = fp.select(
        (F.col("doc_id") + RECRAWL_ID_OFFSET).alias("doc_id"), "fingerprint"
    )
    m, k = _bloom_params(existing.count())
    bloom = spark.sparkContext.broadcast(bloom_build(existing, m, k))
    cand = bloom_probe(batch, bloom, m, k)
    plan = formatted_plan(cand)
    assert "MapInPandas" in plan
    assert "Exchange" not in plan  # zero-shuffle probe
    n_batch = batch.count()
    n_cand = cand.count()
    n_members = REGISTRY["dedup_incremental_bloom"].fn(spark, sf_dir).count()
    assert n_members <= n_cand <= n_members + max(10, int(3 * BLOOM_FPP * n_batch))
    assert n_cand < 0.6 * n_batch  # the filter prunes the non-member half


def test_crafted_dups_across_batches(spark, tmp_path_factory):
    # byte-identical text under different ids across the split: the
    # re-crawled odd doc matches the even original via fingerprint
    d = str(tmp_path_factory.mktemp("bloom_inc"))
    rows = [
        (2, "alpha beta gamma", "en", "src0", 16),
        (3, "alpha beta gamma", "en", "src0", 16),  # odd twin of doc 2
        (5, "delta epsilon zeta", "en", "src0", 18),  # odd, unique
    ]
    spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    got = {
        (r.doc_id, r.canonical_doc_id)
        for r in REGISTRY["dedup_incremental_bloom"].fn(spark, d).collect()
    }
    off = RECRAWL_ID_OFFSET
    # doc 2's re-crawl AND doc 3's re-crawl both match existing doc 2;
    # doc 5's re-crawl matches nothing
    assert got == {(2 + off, 2), (3 + off, 2)}


def test_null_text_is_never_a_member(spark, tmp_path_factory):
    # NULL text -> NULL fingerprint: SQL equi-join semantics say NULL
    # never matches, so the Bloom kernels must SKIP nulls (build carries
    # no bits, probe rejects) instead of crashing — the r12 degenerate
    # sweep caught a TypeError here on the first NULL-text doc
    d = str(tmp_path_factory.mktemp("bloom_null"))
    rows = [
        (2, None, "en", "src0", 0),  # existing NULL-text doc
        (3, None, "en", "src0", 0),  # odd NULL-text doc (re-crawled too)
        (4, "alpha beta", "en", "src0", 10),
        (5, "alpha beta", "en", "src0", 10),
    ]
    spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    got = {
        (r.doc_id, r.canonical_doc_id)
        for r in REGISTRY["dedup_incremental_bloom"].fn(spark, d).collect()
    }
    off = RECRAWL_ID_OFFSET
    # only the real-text dup pair matches; the NULL-text re-crawls of
    # docs 2 and 3 are NOT members even though doc 2 is in the kept half
    assert got == {(4 + off, 4), (5 + off, 4)}


def test_registered_query_matches_duckdb_oracle(spark, tmp_path_factory):
    import duckdb

    from thesis_iceberg_spark.oracle import compare_query
    from thesis_iceberg_spark.queries import oracle_sql

    d = str(tmp_path_factory.mktemp("bloom_oracle"))
    rows = [
        (i, f"text {'common' if i % 3 == 0 else i} tail", "en", "src0", 20)
        for i in range(1, 40)
    ]
    spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{d}/documents.parquet/*.parquet')"
    )
    r = compare_query(
        spark,
        con,
        "dedup_incremental_bloom",
        REGISTRY["dedup_incremental_bloom"].fn,
        oracle_sql()["dedup_incremental_bloom"],
        d,
    )
    assert r.ok, str(r)

def test_filter_bytes_budget_raises_loudly():
    # r13 (VERDICT r12 #3): a corpus-scaled n_items must never silently
    # size a multi-GB array — the guard fires BEFORE any job runs, so no
    # spark frame is even needed to pin it
    from thesis_iceberg_spark.queries.dedup import (
        BLOOM_MAX_FILTER_BYTES,
        bloom_build,
    )

    too_big_m = (BLOOM_MAX_FILTER_BYTES * 8) + 64
    with pytest.raises(ValueError, match="prefix"):
        bloom_build(None, too_big_m, 7)


def test_tree_merge_equals_flat_driver_merge(spark):
    # the treeAggregate OR-merge must produce the byte-identical filter
    # the r12 flat driver merge produced, on a genuinely multi-partition
    # build (8 partitions -> 8 per-partition arrays to merge)
    import numpy as np

    from thesis_iceberg_spark.queries.dedup import (
        _bloom_params,
        _bloom_positions,
        bloom_build,
    )

    fps = spark.range(0, 4000).repartition(8).select(
        F.md5(F.col("id").cast("string").cast("binary")).alias("fingerprint")
    )
    m, k = _bloom_params(4000)
    got = bloom_build(fps, m, k)
    # flat reference merge, straight from the definition
    acc = np.zeros(m // 64, dtype=np.uint64)
    for (fp,) in fps.collect():
        for pos in _bloom_positions(fp, m, k):
            acc[pos >> 6] |= np.uint64(1) << np.uint64(pos & 63)
    assert got == acc.tobytes()
