"""semdedup_keepers: both keeper modes on crafted clusters (round 6,
VERDICT r5 #6).  The min-id variant is dedup_embedding_cluster_canonical;
keeper='centroid_far' implements Abbas et al.'s published rule — keep the
member with the LOWEST cosine to the cluster centroid, preserving
diversity — and since round 7 is ALSO a registered, DuckDB-value-oracled
driver query (dedup_semdedup_centroid_far): the margin test below is what
makes the float argmin safe to value-oracle across engines."""

from __future__ import annotations

import pytest

from thesis_iceberg_spark.queries.dedup import semdedup_keepers


@pytest.fixture()
def emb_dir(spark, tmp_path):
    # cluster A (ids 1,2,3): 3 is scaled on its first 8 dims — every pair
    # stays above the 0.45 LSH threshold and shares its top-16 signed
    # dims (bucket collision certain), but 3 is the least-typical member:
    # cos(v3, centroid) < cos(v1, centroid) ~ cos(v2, centroid).
    # cluster B (ids 10,11): identical vectors — all centroid cosines tie
    # at 1.0, so the keeper falls back to min vec_id.
    # id 20: singleton, never paired, absent from the output (near-dup
    # convention: unpaired vectors are their own canonical).
    a = [1.0] * 64
    v2 = a[:]
    v2[63] = 1.1
    v3 = [3.0] * 8 + [1.0] * 56
    neg = [-1.0] * 64
    lone = [1.0] * 32 + [-1.0] * 32
    rows = [(1, a), (2, v2), (3, v3), (10, neg), (11, neg[:]), (20, lone)]
    d = str(tmp_path / "sem")
    spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    ).write.parquet(f"{d}/embeddings.parquet")
    return d


def test_min_id_keeper_matches_registered_rule(spark, emb_dir):
    got = {
        r.vec_id: r.canonical_vec_id
        for r in semdedup_keepers(spark, emb_dir, keeper="min_id").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_centroid_far_keeper_picks_least_typical(spark, emb_dir):
    got = {
        r.vec_id: r.canonical_vec_id
        for r in semdedup_keepers(spark, emb_dir, keeper="centroid_far").collect()
    }
    # cluster A keeps 3 (lowest centroid cosine); B ties -> min id 10
    assert got == {1: 3, 2: 3, 3: 3, 10: 10, 11: 10}


def test_unknown_keeper_rejected(spark, emb_dir):
    with pytest.raises(ValueError, match="unknown semdedup keeper"):
        semdedup_keepers(spark, emb_dir, keeper="median")


def test_empty_embeddings_returns_empty_not_typeerror(spark, tmp_path):
    # ADVICE r6: .first() on an empty embeddings table is None; must yield
    # a typed empty (vec_id, canonical_vec_id) result, not a TypeError.
    d = str(tmp_path / "empty")
    spark.createDataFrame(
        [], "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    ).write.parquet(f"{d}/embeddings.parquet")
    out = semdedup_keepers(spark, d, keeper="centroid_far")
    assert out.columns == ["vec_id", "canonical_vec_id"]
    assert out.count() == 0


def test_zero_norm_member_never_wins_keeper(spark, tmp_path, monkeypatch):
    # ADVICE r6: a zero-norm member divides to NULL cosine, which sorted
    # FIRST in the struct-min and silently became the keeper; after the
    # coalesce(+inf) fix the degenerate member must LOSE.  A zero vector
    # cannot enter a cluster through the real LSH-pairs path (its cosine
    # to anything is NULL, failing the >= 0.45 filter), so monkeypatch the
    # pair source to force a cluster {0, 1, 2} containing the zero vector
    # and assert id 0 is not chosen.
    from thesis_iceberg_spark.queries import dedup as dmod

    a = [1.0] * 64
    v2 = a[:]
    v2[63] = 1.2
    rows = [(0, [0.0] * 64), (1, a), (2, v2)]
    d = str(tmp_path / "zn")
    spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    ).write.parquet(f"{d}/embeddings.parquet")
    forced = spark.createDataFrame(
        [(0, 1), (1, 2)], "vec_a BIGINT, vec_b BIGINT"
    )
    monkeypatch.setattr(
        dmod, "dedup_embedding_lsh_pairs", lambda *_: forced
    )
    got = {
        r.vec_id: r.canonical_vec_id
        for r in semdedup_keepers(spark, d, keeper="centroid_far").collect()
    }
    # keeper must be a real member (1: the centroid tilts toward the
    # longer v2, so v1 has the lower cosine), never the zero vector
    assert set(got) == {0, 1, 2}
    assert set(got.values()) == {1}


def test_mixed_width_cluster_keeps_true_centroid_far(spark, tmp_path):
    # ADVICE r7 (medium): two vectors of the SAME non-modal width have a
    # well-defined cosine, pass the 0.45 filter, and form a cluster.  With
    # a corpus-global centroid width, that cluster's centroid carried NULL
    # past the members' width, every cos_c coalesced to +inf, and the
    # keeper silently degraded to min-vec_id — diverging from the DuckDB
    # oracle's per-member-width centroids.  After the per-cluster slice
    # fix, the width-32 cluster below must keep its true centroid-far
    # member (102), not min id (100).  The pairs flow through the REAL
    # LSH path (no monkeypatch): the short-vector signature path buckets
    # them, and the verify cosine is non-NULL because widths match.
    import random

    random.seed(7)
    rows = [
        (i, [random.uniform(-1, 1) for _ in range(64)]) for i in range(6)
    ]  # corpus max/modal width stays 64
    a32 = [1.0] * 32
    b32 = a32[:]
    b32[31] = 1.1
    c32 = [3.0] * 4 + [1.0] * 28  # least typical member of the 32-cluster
    rows += [(100, a32), (101, b32), (102, c32)]
    d = str(tmp_path / "mixed")
    spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    ).coalesce(1).write.parquet(f"{d}/embeddings.parquet")
    got = {
        r.vec_id: r.canonical_vec_id
        for r in semdedup_keepers(spark, d, keeper="centroid_far").collect()
    }
    assert got == {100: 102, 101: 102, 102: 102}


def test_mixed_width_cluster_matches_duckdb_oracle(spark, tmp_path):
    # The full cross-engine gate on the same corpus: the oracle previously
    # ERRORED outright ("list dimensions must be equal" — DuckDB's
    # list_dot_product on a cross-width candidate pair) where Spark's
    # zip_with pads NULL; the CASE width guard in _SQL_EMB_SELECT is the
    # twin.  All three LSH-family oracles must value-match here.
    import random

    import duckdb

    from thesis_iceberg_spark.oracle import compare_query
    from thesis_iceberg_spark.queries import REGISTRY, queries

    queries()
    random.seed(7)
    rows = [
        (i, [random.uniform(-1, 1) for _ in range(64)]) for i in range(6)
    ]
    a32 = [1.0] * 32
    b32 = a32[:]
    b32[31] = 1.1
    c32 = [3.0] * 4 + [1.0] * 28
    rows += [(100, a32), (101, b32), (102, c32)]
    d = str(tmp_path / "mixedo")
    spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    ).coalesce(1).write.parquet(f"{d}/embeddings.parquet")
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{d}/embeddings.parquet/*.parquet')"
    )
    for name in (
        "dedup_embedding_lsh_pairs",
        "dedup_embedding_cluster_canonical",
        "dedup_semdedup_centroid_far",
    ):
        spec = REGISTRY[name]
        res = compare_query(spark, con, name, spec.fn, spec.oracle, d)
        assert res.ok, str(res)


def test_centroid_is_single_shuffle_at_d1024(spark):
    # VERDICT r6 ask #6: the D-wide per-dimension avg() centroid must plan
    # as ONE Exchange with a partial/final HashAggregate pair even at
    # D=1024 (map-side combine).  If this ever splits into multiple
    # shuffles or falls back to sort-aggregate-per-dim, the width ceiling
    # documented on _cluster_centroids has been hit.
    from thesis_iceberg_spark.queries.dedup import _cluster_centroids

    import pyspark.sql.functions as F

    members = spark.range(8).select(
        (F.col("id") % 2).alias("label"),
        F.array(*[F.rand(seed=7) for _ in range(1024)]).alias("v"),
    )
    plan = (
        _cluster_centroids(members, 1024)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan[:2000]
    assert plan.count("HashAggregate") == 2, plan[:2000]


def test_sf_keeper_margin_resists_engine_float_noise():
    # The registered dedup_semdedup_centroid_far carries a DuckDB value
    # oracle; that is only sound if the keeper's cosine margin over the
    # runner-up dwarfs cross-engine double-summation noise (~1e-14).
    # Measured margin at sf0.001 is ~1.7e-9; assert a 1e-10 floor so a
    # future data regen that lands near-ties fails loudly here instead of
    # flaking in the driver gate.
    import duckdb

    from thesis_iceberg_spark.queries import REGISTRY, _load_all

    _load_all()
    spec = REGISTRY["dedup_semdedup_centroid_far"]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/embeddings.parquet')"
    )
    body = spec.oracle.rsplit("keep AS", 1)[0].rstrip().rstrip(",")
    margin = con.execute(
        body
        + """,
sel AS (SELECT label, cos_c,
        row_number() OVER (PARTITION BY label ORDER BY cos_c, vec_id) rn
        FROM cosv)
SELECT min(b.cos_c - a.cos_c) AS m
FROM sel a JOIN sel b ON a.label = b.label AND a.rn = 1 AND b.rn = 2"""
    ).fetchone()[0]
    assert margin is None or margin > 1e-10, margin


def test_centroid_modes_agree_and_explode_plan_is_narrow(spark):
    # the exploded form must produce the same centroids as the wide form
    # (up to float summation order) and keep aggregate rows narrow — it is
    # the documented path past CENTROID_WIDE_DIM_CEILING dims
    import pyspark.sql.functions as F

    from thesis_iceberg_spark.queries.dedup import _cluster_centroids

    members = spark.range(12).select(
        (F.col("id") % 3).alias("label"),
        F.array(
            *[(F.col("id") * 7 + i).cast("double") for i in range(16)]
        ).alias("v"),
    )
    wide = {
        r.label: r.c
        for r in _cluster_centroids(members, 16, mode="wide").collect()
    }
    expl = {
        r.label: r.c
        for r in _cluster_centroids(members, 16, mode="explode").collect()
    }
    assert set(wide) == set(expl)
    for lbl in wide:
        assert len(wide[lbl]) == len(expl[lbl]) == 16
        for a, b in zip(wide[lbl], expl[lbl]):
            assert abs(a - b) <= 1e-12 * max(1.0, abs(a)), (lbl, a, b)
    with pytest.raises(ValueError, match="unknown centroid mode"):
        _cluster_centroids(members, 16, mode="median")

    # AUTO-SELECTION is real, not just documented: past the ceiling the
    # plan must contain the explode Generate (and no 2049-wide aggregate);
    # at/below the ceiling it must be the single wide HashAggregate pair.
    from thesis_iceberg_spark.queries.dedup import CENTROID_WIDE_DIM_CEILING

    def plan_of(df):
        return df._jdf.queryExecution().executedPlan().toString()

    wide_plan = plan_of(_cluster_centroids(members, CENTROID_WIDE_DIM_CEILING))
    assert "Generate" not in wide_plan
    big = spark.range(4).select(
        (F.col("id") % 2).alias("label"),
        F.array(*[F.lit(float(i)) for i in range(4)]).alias("v"),
    )
    expl_plan = plan_of(
        _cluster_centroids(big, CENTROID_WIDE_DIM_CEILING + 1)
    )
    assert "Generate" in expl_plan  # posexplode path engaged automatically


def test_centroid_explode_matches_wide_on_ragged_arrays(spark):
    # review finding: explode must honor the dim contract on ragged input
    # exactly like wide mode — dim elements, NULL where no member has the
    # position — or the two modes silently diverge at the auto-switch.
    import pyspark.sql.functions as F

    from thesis_iceberg_spark.queries.dedup import _cluster_centroids

    rows = [(0, [1.0, 2.0]), (0, [3.0]), (1, [5.0, 6.0, 7.0])]
    members = spark.createDataFrame(rows, "label BIGINT, v ARRAY<DOUBLE>")
    wide = {
        r.label: r.c for r in _cluster_centroids(members, 4, mode="wide").collect()
    }
    expl = {
        r.label: r.c
        for r in _cluster_centroids(members, 4, mode="explode").collect()
    }
    assert wide == expl
    assert wide[0] == [2.0, 2.0, None, None]
    assert wide[1] == [5.0, 6.0, 7.0, None]


def test_centroid_explode_truncates_members_longer_than_dim(spark):
    # the r10 sorted-prefix assembly filters pos >= dim before the
    # aggregate (wide mode never reads past dim-1 either); a member longer
    # than dim must not widen or shift the centroid
    from thesis_iceberg_spark.queries.dedup import _cluster_centroids

    rows = [(0, [1.0, 2.0, 9.0, 9.0]), (0, [3.0, 4.0])]
    members = spark.createDataFrame(rows, "label BIGINT, v ARRAY<DOUBLE>")
    wide = {r.label: r.c for r in _cluster_centroids(members, 2, mode="wide").collect()}
    expl = {
        r.label: r.c for r in _cluster_centroids(members, 2, mode="explode").collect()
    }
    assert wide == expl == {0: [2.0, 3.0]}
