"""Property-based tests on the NumPy kernels (hypothesis).

The reference has no property tests (SURVEY §5); these pin the
algebraic invariants the hand-written cases can't sweep: metric ranges,
top-k consistency with a full sort, transpose symmetry, dtype
promotion, and NaN totality.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from polars_matmul_spark import kernels as K

finite = st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False, width=32)


def mats(max_rows=8, max_dim=6):
    return st.tuples(
        st.integers(1, max_rows), st.integers(1, max_rows), st.integers(1, max_dim)
    ).flatmap(
        lambda s: st.tuples(
            arrays(np.float64, (s[0], s[2]), elements=finite),
            arrays(np.float64, (s[1], s[2]), elements=finite),
        )
    )


@given(mats())
@settings(max_examples=80, deadline=None)
def test_cosine_bounded_and_zero_norm_guarded(qc):
    Q, C = qc
    S = K.similarity_matrix(Q, C, "cosine")
    assert S.shape == (len(Q), len(C))
    assert np.all(S <= 1.0 + 1e-6) and np.all(S >= -1.0 - 1e-6)
    # the reference guards EACH norm independently: a pair's score is
    # zeroed unless q_norm > eps AND c_norm > eps (src/metrics.rs:276-288)
    qn = np.linalg.norm(Q, axis=1)
    cn = np.linalg.norm(C, axis=1)
    guarded = (qn <= K.EPS_F64)[:, None] | (cn <= K.EPS_F64)[None, :]
    if guarded.any():
        assert np.all(S[guarded] == 0.0)


@given(mats())
@settings(max_examples=80, deadline=None)
def test_euclidean_nonnegative_and_self_distance(qc):
    Q, _ = qc
    S = K.similarity_matrix(Q, Q, "euclidean")
    assert np.all(S >= 0.0)
    # diagonal is numerically-clamped near zero (sqrt(max(0, ...)))
    assert np.all(np.diag(S) < 1e-2 * (1 + np.abs(Q).max() ** 2) ** 0.5)


@given(mats())
@settings(max_examples=80, deadline=None)
def test_dot_transpose_symmetry(qc):
    Q, C = qc
    assert np.array_equal(
        K.similarity_matrix(Q, C, "dot"), K.similarity_matrix(C, Q, "dot").T
    )


@given(mats(), st.integers(1, 12))
@settings(max_examples=80, deadline=None)
def test_topk_matches_full_sort(qc, k):
    Q, C = qc
    idx, scores = K.topk(Q, C, k, "cosine")
    kk = min(k, len(C))
    assert idx.shape == (len(Q), kk) and scores.shape == (len(Q), kk)
    S = K.similarity_matrix(Q, C, "cosine")
    for r in range(len(Q)):
        # returned scores are the matrix entries at the returned indices
        assert np.array_equal(scores[r], S[r, idx[r]])
        # and equal the k best scores of a full descending sort
        assert np.array_equal(np.sort(scores[r])[::-1], np.sort(S[r])[::-1][:kk])
        # sorted best-first
        assert np.all(np.diff(scores[r]) <= 1e-15)


@given(mats(), st.integers(1, 6))
@settings(max_examples=40, deadline=None)
def test_topk_euclidean_ascending(qc, k):
    Q, C = qc
    idx, scores = K.topk(Q, C, k, "euclidean")
    for r in range(len(Q)):
        assert np.all(np.diff(scores[r]) >= -1e-15)


@given(
    st.sampled_from([np.float32, np.float64]),
    st.sampled_from([np.float32, np.float64]),
)
def test_promotion_f32_iff_both(dl, dr):
    out = K.promote_dtype(np.dtype(dl), np.dtype(dr))
    expected = np.float32 if (dl == np.float32 and dr == np.float32) else np.float64
    assert out == np.dtype(expected)


@given(st.integers(1, 6), st.integers(1, 6), st.integers(1, 8))
def test_nan_scores_never_raise(nq, nc, k):
    Q = np.full((nq, 3), np.nan)
    C = np.ones((nc, 3))
    idx, scores = K.topk(Q, C, k, "dot")
    assert idx.shape == (nq, min(k, nc))  # total, no exception
