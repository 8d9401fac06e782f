"""Equivalence suite for the vectorized KMeans assignment kernel
(VERDICT r8 ask #3): the one-matmul-per-batch `_kmeans_assign_kernel`
must reproduce the pre-r9 per-vector reference loop EXACTLY — including
NULL / ragged / zero-norm masking and the deterministic (-cosine,
centroid_id) tie-break — on crafted and randomized batches.  Pure
pandas/numpy: the kernel is a mapInPandas body, so no Spark session is
needed to pin its contract."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from thesis_iceberg_spark.queries.dedup import _kmeans_assign_kernel


def _reference_loop(centers, nprobe, pdf: pd.DataFrame) -> pd.DataFrame:
    """The pre-r9 per-vector loop, kept verbatim as the oracle."""
    C = np.asarray(centers, dtype=np.float64)
    cn = np.linalg.norm(C, axis=1)
    cn[cn == 0] = 1.0
    ids, cids = [], []
    for vec_id, v in zip(pdf["vec_id"].to_numpy(), pdf["v"]):
        if v is None or len(v) != C.shape[1]:
            continue
        a = np.asarray(v, dtype=np.float64)
        na = np.linalg.norm(a)
        if na == 0:
            continue
        cos = (C @ a) / (cn * na)
        top = np.lexsort((np.arange(len(cos)), -cos))[:nprobe]
        ids.extend([int(vec_id)] * len(top))
        cids.extend(int(t) for t in top)
    return pd.DataFrame(
        {
            "vec_id": np.array(ids, dtype=np.int64),
            "bucket": np.array(cids, dtype=np.int64),
        }
    )


def _run_kernel(centers, nprobe, pdf: pd.DataFrame) -> pd.DataFrame:
    out = list(_kmeans_assign_kernel(centers, nprobe)(iter([pdf])))
    return pd.concat(out, ignore_index=True)


def _assert_equiv(centers, nprobe, pdf):
    got = _run_kernel(centers, nprobe, pdf)
    want = _reference_loop(centers, nprobe, pdf)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )


def test_degenerate_rows_masked():
    """NULL, ragged (wrong width) and zero-norm vectors emit no rows;
    the surviving rows match the reference loop exactly."""
    centers = [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]]
    pdf = pd.DataFrame(
        {
            "vec_id": np.array([1, 2, 3, 4, 5, 6], dtype=np.int64),
            "v": [
                [1.0, 0.1],          # clean
                None,                 # NULL
                [1.0],                # ragged: too short
                [1.0, 2.0, 3.0],      # ragged: too long
                [0.0, 0.0],           # zero norm
                [-0.5, 0.5],          # clean, negative components
            ],
        }
    )
    got = _run_kernel(centers, 2, pdf)
    assert set(got["vec_id"]) == {1, 6}
    _assert_equiv(centers, 2, pdf)


def test_all_rows_degenerate_yields_typed_empty():
    centers = [[1.0, 0.0], [0.0, 1.0]]
    pdf = pd.DataFrame(
        {
            "vec_id": np.array([1, 2], dtype=np.int64),
            "v": [None, [0.0, 0.0]],
        }
    )
    got = _run_kernel(centers, 1, pdf)
    assert len(got) == 0
    assert got["vec_id"].dtype == np.int64
    assert got["bucket"].dtype == np.int64


def test_exact_cosine_ties_break_to_lower_centroid_id():
    """Duplicate centroids (kmeans CAN collapse clusters on degenerate
    data) produce exact cosine ties: the lower centroid id must win, both
    inside the selected top-p and at the top-p boundary."""
    # centroids 1 and 3 are identical; 0 and 2 are identical
    centers = [[1.0, 0.0], [0.0, 1.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]]
    pdf = pd.DataFrame(
        {
            "vec_id": np.array([10, 11], dtype=np.int64),
            "v": [[3.0, 0.0], [0.0, 7.0]],
        }
    )
    for nprobe in (1, 2, 3, 4, 5):
        _assert_equiv(centers, nprobe, pdf)
    got = _run_kernel(centers, 2, pdf)
    # vec 10 is exactly on centroids 0 and 2 (cos=1 for both): 0 then 2
    assert list(got[got.vec_id == 10]["bucket"]) == [0, 2]
    assert list(got[got.vec_id == 11]["bucket"]) == [1, 3]


def test_boundary_tie_straddles_topp_cut():
    """A tie exactly AT the top-p boundary (selected min == best excluded)
    must resolve to the lower centroid id deterministically (argmax's
    first-max contract in the successive-argmax kernel)."""
    # all four centroids equidistant from the query -> every cut is a tie
    centers = [[1.0, 0.0], [1.0, 0.0], [1.0, 0.0], [1.0, 0.0]]
    pdf = pd.DataFrame(
        {"vec_id": np.array([1], dtype=np.int64), "v": [[2.0, 0.0]]}
    )
    for nprobe in (1, 2, 3):
        got = _run_kernel(centers, nprobe, pdf)
        assert list(got["bucket"]) == list(range(nprobe))
        _assert_equiv(centers, nprobe, pdf)


def test_nprobe_at_least_k_takes_all_centroids_ordered():
    centers = [[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]]
    pdf = pd.DataFrame(
        {"vec_id": np.array([1], dtype=np.int64), "v": [[1.0, 0.2]]}
    )
    for nprobe in (3, 5, 100):
        got = _run_kernel(centers, nprobe, pdf)
        assert len(got) == 3  # clamped to k
        _assert_equiv(centers, nprobe, pdf)


def _near_tie(centers, nprobe, v, floor=1e-5) -> bool:
    """True when any adjacent f64-cosine gap inside the top-(nprobe+1)
    selection region is a nonzero value below ``floor``: the kernel scores
    in float32 (~1e-7 relative rounding, BLAS-dependent), so ordering on
    such rows is legitimately environment-specific and must not be pinned
    by a randomized test.  EXACT ties (gap == 0 — probability zero on
    continuous data) stay in; the crafted-tie tests above pin those."""
    C = np.asarray(centers, dtype=np.float64)
    cn = np.linalg.norm(C, axis=1)
    cn[cn == 0] = 1.0
    a = np.asarray(v, dtype=np.float64)
    na = np.linalg.norm(a)
    if na == 0:
        return False
    cos = np.sort((C @ a) / (cn * na))[::-1][: nprobe + 1]
    gaps = -np.diff(cos)
    return bool(((gaps > 0) & (gaps < floor)).any())


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("k,d,rows,nprobe", [(7, 5, 64, 3), (33, 8, 128, 5), (4, 3, 16, 2)])
def test_randomized_equivalence(seed, k, d, rows, nprobe):
    """Randomized batches with injected NULL/ragged/zero rows: vectorized
    kernel == reference loop row for row.  Rows whose top-p boundary has a
    sub-1e-5 (but nonzero) f64 gap are regenerated — the f32 kernel's
    ordering there depends on BLAS rounding, which is not the contract."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, d)).tolist()
    vs: list = []
    for i in range(rows):
        r = rng.integers(0, 10)
        if r == 0:
            vs.append(None)
        elif r == 1:
            vs.append(rng.normal(size=d + 1).tolist())
        elif r == 2:
            vs.append([0.0] * d)
        else:
            v = rng.normal(size=d).tolist()
            while _near_tie(centers, nprobe, v):
                v = rng.normal(size=d).tolist()
            vs.append(v)
    pdf = pd.DataFrame(
        {"vec_id": np.arange(rows, dtype=np.int64), "v": vs}
    )
    _assert_equiv(centers, nprobe, pdf)


def test_zero_norm_centroid_does_not_crash():
    """A zero centroid (possible on degenerate fit data) must not divide
    by zero; its cosine column is computed with a clamped norm exactly as
    the reference loop does."""
    centers = [[0.0, 0.0], [1.0, 0.0]]
    pdf = pd.DataFrame(
        {"vec_id": np.array([1], dtype=np.int64), "v": [[1.0, 1.0]]}
    )
    for nprobe in (1, 2):
        _assert_equiv(centers, nprobe, pdf)


def test_f32_near_tie_rescored_in_f64():
    """ADVICE r9: a ~1e-9 cosine near-tie is invisible at f32 resolution
    (~1e-7), so the f32 SGEMM's pick was BLAS-build-dependent.  The kernel
    now re-scores rows whose top-p boundary gap is under 1e-6 in f64 —
    this adversarial pair (the FARTHER centroid has the lower id, so the
    f32 tie-break would pick it) must resolve to the f64-correct order."""
    import math

    far = [1.0 - 2e-9, math.sqrt(1.0 - (1.0 - 2e-9) ** 2)]
    near = [1.0 - 1e-9, math.sqrt(1.0 - (1.0 - 1e-9) ** 2)]
    centers = [far, near]  # id 0 = farther, id 1 = nearer
    pdf = pd.DataFrame(
        {"vec_id": np.array([1], dtype=np.int64), "v": [[1.0, 0.0]]}
    )
    got = _run_kernel(centers, 1, pdf)
    assert list(got["bucket"]) == [1]  # f64 order, not the f32 tie-break
    _assert_equiv(centers, 1, pdf)
