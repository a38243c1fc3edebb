"""Hybrid retrieval: RRF fusion + late-interaction MaxSim.

Exact-value oracles are pure-Python replications (rank arithmetic and
sequential float folds — both engines' semantics are replicated
literally), plus plan gates pinning the shuffle shape and an
agreement gate between the declarative and blocked MaxSim paths.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from polars_matmul_spark.operators.retrieval import (
    maxsim_topk,
    maxsim_topk_blocked,
    maxsim_topk_ivf,
    rrf_fuse,
)


# --- RRF --------------------------------------------------------------------


def _mk_leg(spark, rows):
    return spark.createDataFrame(rows, "query_id long, doc_id long, score double")


def _py_rrf(legs, k_const=60, top_per_leg=20, dp=9):
    """Literal replication: per-leg rank on (round(score, dp) desc,
    doc_id asc) within query, fused score summed in leg declaration
    order."""
    ranks = {}
    for name, rows in legs.items():
        by_q = {}
        for q, d, s in rows:
            by_q.setdefault(q, []).append((round(s, dp), d))
        for q, lst in by_q.items():
            lst.sort(key=lambda t: (-t[0], t[1]))
            for r, (_s, d) in enumerate(lst[:top_per_leg], start=1):
                ranks.setdefault((q, d), {})[name] = r
    out = {}
    for (q, d), by_leg in ranks.items():
        acc = 0.0
        for name in legs:
            acc = acc + (1.0 / (k_const + by_leg[name]) if name in by_leg else 0.0)
        out[(q, d)] = (round(acc, dp), by_leg)
    return out


def test_rrf_two_legs_exact(spark):
    lex = [(1, 10, 9.0), (1, 11, 5.0), (1, 12, 3.0), (2, 20, 1.0)]
    den = [(1, 11, 0.9), (1, 13, 0.8), (1, 10, 0.2), (2, 21, 0.5)]
    legs = {"lex": lex, "dense": den}
    out = rrf_fuse(
        {n: _mk_leg(spark, rows) for n, rows in legs.items()},
        id_cols=["doc_id"],
        group_cols=["query_id"],
    ).collect()
    expected = _py_rrf(legs)
    assert len(out) == len(expected)
    for row in out:
        exp_score, exp_ranks = expected[(row.query_id, row.doc_id)]
        assert row.rrf_score == exp_score
        assert row.lex_rank == exp_ranks.get("lex")
        assert row.dense_rank == exp_ranks.get("dense")
    # doc 11 is the only one ranked top-2 in BOTH legs -> fused #1
    top = [r for r in out if r.query_id == 1 and r.fused_rank == 1]
    assert top[0].doc_id == 11


def test_rrf_three_legs_fixed_order_sum(spark):
    # three legs: the fused score must be the FIXED-ORDER expression
    # sum (leg declaration order), bit-for-bit
    legs = {
        "a": [(1, 1, 3.0), (1, 2, 2.0)],
        "b": [(1, 2, 5.0), (1, 3, 1.0)],
        "c": [(1, 1, 0.5), (1, 2, 0.25)],
    }
    out = {
        r.doc_id: r
        for r in rrf_fuse(
            {n: _mk_leg(spark, rows) for n, rows in legs.items()},
            id_cols=["doc_id"],
            group_cols=["query_id"],
        ).collect()
    }
    exp = _py_rrf(legs)
    for d in (1, 2, 3):
        assert out[d].rrf_score == exp[(1, d)][0]
    # doc 2 appears in all three legs (ranks 2,1,2)
    assert out[2].a_rank == 2 and out[2].b_rank == 1 and out[2].c_rank == 2
    assert out[3].a_rank is None


def test_rrf_top_per_leg_cuts_candidates(spark):
    rows = [(1, d, float(100 - d)) for d in range(30)]
    out = rrf_fuse(
        {"only": _mk_leg(spark, rows)},
        id_cols=["doc_id"],
        group_cols=["query_id"],
        top_per_leg=5,
    ).collect()
    assert len(out) == 5
    assert sorted(r.doc_id for r in out) == [0, 1, 2, 3, 4]


def test_rrf_k_truncates_fused(spark):
    rows = [(1, d, float(d % 7)) for d in range(20)]
    out = rrf_fuse(
        {"only": _mk_leg(spark, rows)},
        id_cols=["doc_id"],
        group_cols=["query_id"],
        k=3,
    ).collect()
    assert sorted(r.fused_rank for r in out) == [1, 2, 3]


def test_rrf_ascending_leg(spark):
    # euclidean-style leg: lower is better
    rows = [(1, 1, 9.0), (1, 2, 0.5)]
    out = {
        r.doc_id: r
        for r in rrf_fuse(
            {"l2": _mk_leg(spark, rows)},
            id_cols=["doc_id"],
            group_cols=["query_id"],
            ascending=("l2",),
        ).collect()
    }
    assert out[2].l2_rank == 1 and out[1].l2_rank == 2


def test_rrf_rank_tiebreak_on_rounded_score(spark):
    # scores equal at the 9-dp grid -> id ascending decides the rank
    rows = [(1, 5, 1.0 + 2e-12), (1, 3, 1.0), (1, 4, 1.0 + 1e-12)]
    out = {
        r.doc_id: r
        for r in rrf_fuse(
            {"leg": _mk_leg(spark, rows)},
            id_cols=["doc_id"],
            group_cols=["query_id"],
        ).collect()
    }
    assert (out[3].leg_rank, out[4].leg_rank, out[5].leg_rank) == (1, 2, 3)


def test_rrf_weighted_legs(spark):
    # weight 0 silences a leg entirely; weight 2 doubles its term
    legs = {
        "a": [(1, 1, 5.0), (1, 2, 4.0)],
        "b": [(1, 2, 9.0), (1, 3, 8.0)],
    }
    out = {
        r.doc_id: r
        for r in rrf_fuse(
            {n: _mk_leg(spark, rows) for n, rows in legs.items()},
            id_cols=["doc_id"],
            group_cols=["query_id"],
            weights={"a": 2.0, "b": 0.0},
        ).collect()
    }
    assert out[1].rrf_score == round(2.0 / 61, 9)
    assert out[2].rrf_score == round(2.0 / 62 + 0.0, 9)
    assert out[3].rrf_score == 0.0
    # ranks themselves are weight-independent
    assert out[3].b_rank == 2


def test_rrf_empty_legs_raises(spark):
    with pytest.raises(ValueError, match="Empty series"):
        rrf_fuse({}, id_cols=["doc_id"])


def test_rrf_plan_shape(spark):
    # one ranking window per leg + one fuse aggregation + the fused
    # window — no Python UDF anywhere, no crossJoin
    legs = {
        "a": _mk_leg(spark, [(1, 1, 1.0)]),
        "b": _mk_leg(spark, [(1, 1, 2.0)]),
    }
    plan = rrf_fuse(
        legs, id_cols=["doc_id"], group_cols=["query_id"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


# --- MaxSim -----------------------------------------------------------------


def _mvec_frames(spark, n_qdocs=3, n_cdocs=8, m=4, d=16, seed=7):
    rng = np.random.default_rng(seed)
    qrows = [
        (qd, pos, rng.standard_normal(d).astype(np.float32).tolist())
        for qd in range(n_qdocs)
        for pos in range(m)
    ]
    crows = [
        (cd, rng.standard_normal(d).astype(np.float32).tolist())
        for cd in range(100, 100 + n_cdocs)
        for _ in range(m)
    ]
    q = spark.createDataFrame(qrows, "q_doc long, q_pos long, q_emb array<float>")
    c = spark.createDataFrame(crows, "c_doc long, c_emb array<float>")
    return q, c, qrows, crows


def _py_maxsim(qrows, crows, k=5, dp=9):
    """Literal replication of the declarative twin: sequential-fold
    cosine per pair, float max per (q_vec, doc), sequential sum in
    ascending q_pos, round, rank on (rounded desc, c_doc asc)."""

    def seq_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + float(x) * float(y)
        return acc

    def cos(a, b):
        qq, cc = seq_dot(a, a), seq_dot(b, b)
        if math.sqrt(qq) > 1e-10 and math.sqrt(cc) > 1e-10:
            return seq_dot(a, b) / (math.sqrt(qq) * math.sqrt(cc))
        return 0.0

    by_cdoc = {}
    for cd, emb in crows:
        by_cdoc.setdefault(cd, []).append([float(x) for x in emb])
    by_qdoc = {}
    for qd, pos, emb in qrows:
        by_qdoc.setdefault(qd, []).append((pos, [float(x) for x in emb]))
    out = {}
    for qd, vecs in by_qdoc.items():
        scores = []
        for cd, cvecs in by_cdoc.items():
            acc = 0.0
            for _pos, qv in sorted(vecs):
                acc = acc + max(cos(qv, cv) for cv in cvecs)
            scores.append((round(acc, dp), cd))
        scores.sort(key=lambda t: (-t[0], t[1]))
        for r, (s, cd) in enumerate(scores[:k], start=1):
            out[(qd, r)] = (cd, s)
    return out


@pytest.mark.slow
def test_maxsim_exact_vs_python(spark):
    q, c, qrows, crows = _mvec_frames(spark)
    out = maxsim_topk(q, c, k=5).collect()
    exp = _py_maxsim(qrows, crows, k=5)
    assert len(out) == len(exp)
    for row in out:
        cd, s = exp[(row.q_doc, row.rank)]
        assert row.c_doc == cd
        assert row.maxsim == s


@pytest.mark.slow
def test_maxsim_identical_doc_ranks_first(spark):
    # plant the query's own vectors as corpus doc 999: every query
    # vector finds an exact max of 1.0 -> maxsim == n_qvecs, rank 1
    q, c, qrows, _ = _mvec_frames(spark, n_qdocs=1, m=3)
    clone = spark.createDataFrame(
        [(999, emb) for _qd, _pos, emb in qrows],
        "c_doc long, c_emb array<float>",
    )
    out = maxsim_topk(q, c.unionByName(clone), k=1).collect()
    assert out[0].c_doc == 999
    assert out[0].maxsim == pytest.approx(3.0, abs=1e-9)


@pytest.mark.slow
def test_maxsim_blocked_agrees_with_exact(spark):
    q, c, _, _ = _mvec_frames(spark, n_qdocs=4, n_cdocs=12, m=5, d=24)
    a = {(r.q_doc, r.rank): (r.c_doc, r.maxsim) for r in maxsim_topk(q, c, k=4).collect()}
    b = {
        (r.q_doc, r.rank): (r.c_doc, r.maxsim)
        for r in maxsim_topk_blocked(q, c, k=4).collect()
    }
    assert a.keys() == b.keys()
    for key, (cd, s) in a.items():
        assert b[key][0] == cd
        # blocked path scores via BLAS GEMM -> ulp-level difference
        # from the sequential fold is allowed, rank order is not
        assert b[key][1] == pytest.approx(s, abs=1e-8)


def test_maxsim_rejects_distance_metric(spark):
    q, c, _, _ = _mvec_frames(spark, n_qdocs=1, n_cdocs=2)
    with pytest.raises(ValueError, match="maxsim needs a similarity"):
        maxsim_topk(q, c, metric="euclidean")
    with pytest.raises(ValueError, match="maxsim needs a similarity"):
        maxsim_topk_blocked(q, c, metric="euclidean")


def test_maxsim_blocked_empty_queries_raises(spark):
    _, c, _, _ = _mvec_frames(spark, n_qdocs=1, n_cdocs=2)
    empty_q = spark.createDataFrame([], "q_doc long, q_pos long, q_emb array<float>")
    with pytest.raises(ValueError, match="Empty series"):
        maxsim_topk_blocked(empty_q, c)


def test_maxsim_column_collision_raises(spark):
    # r9 ADVICE (medium): shared column names between the two sides
    # used to make the corpus groupBy silently resolve to the QUERY
    # column and collapse every corpus doc into one garbage row
    q, c, _, _ = _mvec_frames(spark, n_qdocs=1, n_cdocs=2)
    q2 = q.withColumnRenamed("q_doc", "doc_id")
    c2 = c.withColumnRenamed("c_doc", "doc_id")
    with pytest.raises(ValueError, match="collide"):
        maxsim_topk(q2, c2, q_doc="doc_id", c_doc="doc_id")
    c3 = c.withColumnRenamed("c_emb", "q_emb")
    with pytest.raises(ValueError, match="collide"):
        maxsim_topk(q, c3, c_col="q_emb")


@pytest.mark.slow
def test_maxsim_blocked_string_doc_ids(spark):
    # r9 ADVICE (low): the blocked path hardcoded long id types; it
    # must now carry any id dtype the declarative twin accepts
    q, c, _, _ = _mvec_frames(spark, n_qdocs=3, n_cdocs=6, m=3, d=8)
    qs = q.select(
        F.concat(F.lit("q"), F.col("q_doc")).alias("q_doc"), "q_pos", "q_emb"
    )
    cs = c.select(
        F.concat(F.lit("d"), F.col("c_doc")).alias("c_doc"), "c_emb"
    )
    a = {
        (r.q_doc, r.rank): (r.c_doc, r.maxsim)
        for r in maxsim_topk(qs, cs, k=3).collect()
    }
    b = {
        (r.q_doc, r.rank): (r.c_doc, r.maxsim)
        for r in maxsim_topk_blocked(qs, cs, k=3).collect()
    }
    assert a.keys() == b.keys() and len(a) == 9
    for key, (cd, s) in a.items():
        assert b[key][0] == cd
        assert b[key][1] == pytest.approx(s, abs=1e-8)


@pytest.mark.slow
def test_maxsim_ivf_full_probe_equals_exact(spark):
    # nprobe == n_centroids -> every doc is a candidate -> the pruned
    # path must EQUAL the exhaustive one row-for-row (scores exact,
    # same rounding, same tiebreak)
    q, c, _, _ = _mvec_frames(spark, n_qdocs=3, n_cdocs=10, m=4, d=16)
    exact = {(r.q_doc, r.rank): (r.c_doc, r.maxsim) for r in maxsim_topk(q, c, k=4).collect()}
    pruned = {
        (r.q_doc, r.rank): (r.c_doc, r.maxsim)
        for r in maxsim_topk_ivf(q, c, k=4, n_centroids=4, nprobe=4).collect()
    }
    assert pruned == exact


def test_maxsim_ivf_planted_clone_rank1(spark):
    # the query doc's own vectors planted as corpus doc 999: identical
    # vectors route to identical centroids, so the clone is ALWAYS a
    # candidate (nprobe >= 1) and lands rank 1 with maxsim == n_qvecs
    q, c, qrows, _ = _mvec_frames(spark, n_qdocs=1, n_cdocs=8, m=3)
    clone = spark.createDataFrame(
        [(999, emb) for _qd, _pos, emb in qrows],
        "c_doc long, c_emb array<float>",
    )
    out = maxsim_topk_ivf(
        q, c.unionByName(clone), k=2, n_centroids=4, nprobe=1
    ).collect()
    top = [r for r in out if r.rank == 1][0]
    assert top.c_doc == 999
    assert top.maxsim == pytest.approx(3.0, abs=1e-9)


@pytest.mark.slow
def test_maxsim_ivf_partial_probe_recall(spark):
    # deterministic seeded setup: with half the centroids probed the
    # pruned top-1 should usually agree with the exhaustive top-1
    q, c, _, _ = _mvec_frames(spark, n_qdocs=4, n_cdocs=16, m=4, d=16, seed=11)
    exact_top1 = {
        r.q_doc: r.c_doc for r in maxsim_topk(q, c, k=1).collect()
    }
    pruned = maxsim_topk_ivf(q, c, k=1, n_centroids=8, nprobe=4).collect()
    hits = sum(1 for r in pruned if exact_top1.get(r.q_doc) == r.c_doc)
    assert hits >= 2  # loose floor; full-probe equality is gated above


def test_maxsim_ivf_candidate_scores_exact(spark):
    # every (q_doc, c_doc) the pruned path emits must carry the SAME
    # score the exhaustive path assigns that pair (approximation only
    # prunes, never perturbs)
    q, c, qrows, crows = _mvec_frames(spark, n_qdocs=2, n_cdocs=8, m=3, d=12)
    exact_pairs = _py_maxsim(qrows, crows, k=len(crows))
    exact_scores = {
        (qd, cd): s for (qd, _r), (cd, s) in exact_pairs.items()
    }
    out = maxsim_topk_ivf(q, c, k=3, n_centroids=4, nprobe=2).collect()
    assert len(out) > 0
    for r in out:
        assert exact_scores[(r.q_doc, r.c_doc)] == r.maxsim


def test_rrf_partitioning_invariance(spark):
    # fused output must not depend on input partitioning or row order
    rows = [(1 + (d % 3), d, float((d * 37) % 11)) for d in range(40)]
    legs_a = {"x": _mk_leg(spark, rows).repartition(7), "y": _mk_leg(spark, rows[::-1])}
    legs_b = {"x": _mk_leg(spark, rows).coalesce(1), "y": _mk_leg(spark, rows[::-1]).repartition(3)}
    norm = lambda out: sorted(tuple(r) for r in out.collect())
    a = norm(rrf_fuse(legs_a, id_cols=["doc_id"], group_cols=["query_id"]))
    b = norm(rrf_fuse(legs_b, id_cols=["doc_id"], group_cols=["query_id"]))
    assert a == b


def test_maxsim_partitioning_invariance(spark):
    q, c, _, _ = _mvec_frames(spark, n_qdocs=2, n_cdocs=6, m=3, d=8)
    norm = lambda out: sorted(tuple(r) for r in out.collect())
    a = norm(maxsim_topk(q.repartition(5), c.repartition(3), k=3))
    b = norm(maxsim_topk(q.coalesce(1), c.repartition(7), k=3))
    assert a == b


def test_maxsim_declarative_plan_jvm_side(spark):
    q, c, _, _ = _mvec_frames(spark, n_qdocs=1, n_cdocs=2)
    plan = maxsim_topk(q, c)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
