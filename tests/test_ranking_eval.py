"""Retrieval evaluation metrics (operators/ranking_eval.py): exact
hand-computed values, a full DuckDB replay of the ordered folds
(oracle-parity discipline), edge rows (no-retrieval queries, unjudged
queries), and the macro average."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from polars_matmul_spark.operators.ranking_eval import (
    macro_metrics,
    ranking_metrics,
)

RUN_ROWS = [
    # q1: relevant docs 10 (rel 2) and 11 (rel 1); retrieved 4
    (1, 10, 1), (1, 99, 2), (1, 11, 3), (1, 98, 4),
    # q2: one relevant doc 20 retrieved at rank 3
    (2, 97, 1), (2, 96, 2), (2, 20, 3),
    # q3: retrieved but nothing judged for it
    (3, 95, 1), (3, 94, 2),
    # q4 appears only in qrels (retrieves nothing)
    # rank > k rows must be ignored (k=3 in the k-cut test)
    (2, 21, 9),
]
QREL_ROWS = [
    (1, 10, 2), (1, 11, 1),
    (2, 20, 1), (2, 21, 1),
    (4, 40, 1),
    # q5: judged, but every judgment is rel=0, and it retrieves
    # nothing — must still get its all-zero row (r9 ADVICE fix; it
    # used to be dropped, shrinking the macro denominator)
    (5, 50, 0),
]


def _frames(spark):
    run = spark.createDataFrame(RUN_ROWS, "query_id long, doc_id long, rank long")
    qrels = spark.createDataFrame(QREL_ROWS, "query_id long, doc_id long, rel long")
    return run, qrels


def _py_dcg(pairs):  # [(rank, rel)] ascending rank
    acc = 0.0
    for r, rel in sorted(pairs):
        acc = acc + (2.0 ** rel - 1.0) / math.log2(r + 1.0)
    return acc


def _py_idcg(rels, k):
    acc = 0.0
    for i, rel in enumerate(sorted(rels, reverse=True)[:k]):
        acc = acc + (2.0 ** rel - 1.0) / math.log2(i + 2.0)
    return acc


def test_known_values_k10(spark):
    run, qrels = _frames(spark)
    out = {r.query_id: r for r in ranking_metrics(run, qrels, k=10).collect()}
    # q1: first relevant at rank 1; 2/2 relevant found; ndcg exact
    assert out[1].rr == 1.0
    assert out[1].recall_at_k == 1.0
    assert out[1].precision_at_k == round(2 / 10, 9)
    dcg = _py_dcg([(1, 2), (3, 1)])
    assert out[1].ndcg_at_k == round(dcg / _py_idcg([2, 1], 10), 9)
    # q2: first relevant at rank 3 (rank-9 row also relevant)
    assert out[2].rr == round(1 / 3, 9)
    assert out[2].recall_at_k == 1.0  # both 20 and 21 inside top-10
    # q3: unjudged query -> zeros but present
    assert out[3].n_relevant == 0 and out[3].ndcg_at_k == 0.0
    # q4: judged but retrieved nothing -> zero row present
    assert out[4].n_retrieved == 0 and out[4].rr == 0.0 and out[4].recall_at_k == 0.0
    # q5: all judgments rel=0 AND nothing retrieved -> still a row
    assert 5 in out
    assert out[5].n_retrieved == 0 and out[5].n_relevant == 0
    assert out[5].rr == 0.0 and out[5].ndcg_at_k == 0.0
    # AP@k (trec_eval convention): q1 hits at ranks 1, 3 of R=2 ->
    # (1/1 + 2/3) / 2; q2 hits at ranks 3, 9 of R=2 -> (1/3 + 2/9) / 2
    assert out[1].ap_at_k == round((1 / 1 + 2 / 3) / 2, 9)
    assert out[2].ap_at_k == round((1 / 3 + 2 / 9) / 2, 9)
    assert out[3].ap_at_k == 0.0 and out[4].ap_at_k == 0.0
    assert out[5].ap_at_k == 0.0


def test_k_cut_ignores_deep_ranks(spark):
    run, qrels = _frames(spark)
    out = {r.query_id: r for r in ranking_metrics(run, qrels, k=3).collect()}
    # q2's rank-9 hit on doc 21 is outside k=3 -> recall 1/2
    assert out[2].recall_at_k == 0.5
    assert out[2].precision_at_k == round(1 / 3, 9)
    # ...and AP's denominator stays the FULL R=2 (truncation costs)
    assert out[2].ap_at_k == round((1 / 3) / 2, 9)


def test_duckdb_replay_exact(spark):
    """The full metric table replays bit-for-bit in DuckDB (list_reduce
    over pinned-order lists == the Spark sequential folds)."""
    run, qrels = _frames(spark)
    k = 10
    got = (
        ranking_metrics(run, qrels, k=k)
        .orderBy("query_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("run_t", run.toPandas())
    con.register("qrels_t", qrels.toPandas())
    oracle = con.sql(f"""
WITH runk AS (SELECT query_id, doc_id, rank FROM run_t WHERE rank <= {k}),
relsorted AS (
  -- grouped over ALL judged queries; rel>0 filtering inside the
  -- aggregates (mirrors the Spark side's all-zero-judgment fix)
  SELECT query_id,
         sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS n_relevant,
         list(rel ORDER BY rel DESC) FILTER (rel > 0) AS rels
  FROM qrels_t GROUP BY query_id
), idcg_pos AS (
  SELECT query_id, unnest(rels[1:{k}]) AS rel,
         generate_subscripts(rels[1:{k}], 1) AS pos
  FROM relsorted
), idcg AS (
  SELECT query_id,
         list_reduce(list_prepend(0.0,
           list((pow(2.0, rel) - 1.0) / log2(pos + 1.0) ORDER BY pos)),
           (s, x) -> s + x) AS idcg
  FROM idcg_pos GROUP BY query_id
), hits AS (
  SELECT r.query_id, r.rank, coalesce(q.rel, 0) AS rel,
         sum(CASE WHEN coalesce(q.rel, 0) > 0 THEN 1 ELSE 0 END)
           OVER (PARTITION BY r.query_id ORDER BY r.rank
                 ROWS UNBOUNDED PRECEDING) AS cum
  FROM runk r LEFT JOIN qrels_t q
    ON r.query_id = q.query_id AND r.doc_id = q.doc_id
), perq AS (
  SELECT query_id, count(*) AS n_retrieved,
         min(CASE WHEN rel > 0 THEN rank END) AS first_rel,
         sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS n_hits,
         list_reduce(list_prepend(0.0,
           list((pow(2.0, rel) - 1.0) / log2(rank + 1.0) ORDER BY rank)),
           (s, x) -> s + x) AS dcg,
         list_reduce(list_prepend(0.0,
           list(CAST(cum AS DOUBLE) / rank ORDER BY rank)
             FILTER (rel > 0)),
           (s, x) -> s + x) AS ap_num
  FROM hits GROUP BY query_id
)
SELECT query_id,
       CAST(coalesce(n_retrieved, 0) AS BIGINT) AS n_retrieved,
       CAST(coalesce(n_relevant, 0) AS BIGINT) AS n_relevant,
       round(CASE WHEN first_rel IS NOT NULL THEN 1.0 / first_rel
                  ELSE 0.0 END, 9) AS rr,
       round(CASE WHEN coalesce(n_relevant, 0) > 0
                  THEN coalesce(n_hits, 0) / CAST(n_relevant AS DOUBLE)
                  ELSE 0.0 END, 9) AS recall_at_k,
       round(coalesce(n_hits, 0) / {float(k)}, 9) AS precision_at_k,
       round(CASE WHEN coalesce(idcg, 0.0) > 0.0
                  THEN coalesce(dcg, 0.0) / idcg ELSE 0.0 END, 9) AS ndcg_at_k,
       round(CASE WHEN coalesce(n_relevant, 0) > 0
                  THEN coalesce(ap_num, 0.0) / CAST(n_relevant AS DOUBLE)
                  ELSE 0.0 END, 9) AS ap_at_k
FROM relsorted FULL JOIN perq USING (query_id)
LEFT JOIN idcg USING (query_id)
ORDER BY query_id
""").df()
    assert list(got.columns) == list(oracle.columns)
    assert got.equals(oracle), f"\n{got}\nvs\n{oracle}"


def test_macro_means(spark):
    run, qrels = _frames(spark)
    per_q = ranking_metrics(run, qrels, k=10)
    row = macro_metrics(per_q).collect()[0]
    vals = {r.query_id: r for r in per_q.collect()}
    n = len(vals)
    acc = 0.0
    for qid in sorted(vals):
        acc = acc + vals[qid].rr
    assert row.n_queries == n
    assert row.mean_rr == round(acc / n, 9)


def test_k_must_be_positive(spark):
    run, qrels = _frames(spark)
    with pytest.raises(ValueError, match="k must be >= 1"):
        ranking_metrics(run, qrels, k=0)


def test_plan_jvm_side_and_broadcast(spark):
    run, qrels = _frames(spark)
    plan = (
        ranking_metrics(run, qrels, k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
