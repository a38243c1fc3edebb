"""TF-IDF / BM25 / vocabulary operators vs a DuckDB oracle on the
sf0.001 documents table, plus plan-shape gates (probe broadcast, no
global window over the term set)."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from polars_matmul_spark.operators.tfidf import (
    bm25_score,
    bm25_score_multi,
    build_vocab,
    doc_terms,
    oov_rate,
    tf_idf,
)
from polars_matmul_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"

# the shared tokenizer, spelled in DuckDB: lowercased whitespace split,
# empties dropped
_DUCK_TERMS = """
SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term
FROM documents
"""


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    con.sql(f"CREATE VIEW terms AS {_DUCK_TERMS}")
    con.sql("CREATE VIEW terms_ne AS SELECT * FROM terms WHERE term <> ''")
    return con


def _sorted(df, keys):
    return df.sort_values(keys).reset_index(drop=True)


class TestTfIdf:
    def test_vs_duckdb(self, spark, duck):
        docs = load_table(spark, "documents", SF_DIR)
        got = _sorted(tf_idf(docs).toPandas(), ["doc_id", "term"])
        want = _sorted(
            duck.sql(
                """
WITH tf AS (SELECT doc_id, term, count(*) AS tf FROM terms_ne GROUP BY 1, 2),
     dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
     n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents)
SELECT doc_id, tf.term, tf,
       tf * (ln((1.0 + n_docs) / (1.0 + df)) + 1.0) AS tf_idf
FROM tf JOIN dft ON tf.term = dft.term CROSS JOIN n
"""
            ).df(),
            ["doc_id", "term"],
        )
        assert len(got) == len(want) and len(got) > 0
        assert (got["doc_id"].values == want["doc_id"].values).all()
        assert (got["term"].values == want["term"].values).all()
        np.testing.assert_allclose(
            got["tf_idf"].values, want["tf_idf"].values, rtol=1e-12
        )

    def test_idf_monotone(self, spark):
        # rarer terms weigh more at equal tf
        docs = load_table(spark, "documents", SF_DIR)
        w = tf_idf(docs).filter(F.col("tf") == 1)
        terms = doc_terms(docs)
        df_t = terms.distinct().groupBy("term").agg(F.count("*").alias("df"))
        j = w.join(df_t, "term").select("df", "tf_idf").toPandas()
        # group by df: weight must strictly decrease as df grows
        by_df = j.groupby("df")["tf_idf"].first().sort_index()
        assert (np.diff(by_df.values) < 0).all()


class TestBM25:
    QUERY = ["data", "learning", "model"]

    def test_vs_duckdb(self, spark, duck):
        docs = load_table(spark, "documents", SF_DIR)
        got = _sorted(bm25_score(docs, self.QUERY).toPandas(), ["doc_id"])
        probe = ", ".join(f"'{t}'" for t in self.QUERY)
        want = _sorted(
            duck.sql(
                f"""
WITH dl AS (
  SELECT doc_id,
         CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                              t -> t <> '')) AS DOUBLE) AS dl
  FROM documents),
     hits AS (SELECT * FROM terms_ne WHERE term IN ({probe})),
     tf AS (SELECT h.doc_id, term, dl, count(*) AS tf
            FROM hits h JOIN dl ON h.doc_id = dl.doc_id GROUP BY 1, 2, 3),
     dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
     n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
     ad AS (SELECT avg(dl) AS avgdl FROM dl)
SELECT doc_id,
       sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
           * tf * 2.2 / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))) AS bm25
FROM tf JOIN dft ON tf.term = dft.term CROSS JOIN n CROSS JOIN ad
GROUP BY doc_id
"""
            ).df(),
            ["doc_id"],
        )
        assert len(got) == len(want) and len(got) > 0
        assert (got["doc_id"].values == want["doc_id"].values).all()
        np.testing.assert_allclose(got["bm25"].values, want["bm25"].values, rtol=1e-12)

    def test_no_match_empty(self, spark):
        docs = load_table(spark, "documents", SF_DIR)
        assert bm25_score(docs, ["zzzznotaterm"]).count() == 0

    def test_probe_broadcasts_corpus_not_shuffled(self, spark):
        # the corpus-side explode must meet the probe in a broadcast
        # hash join — no sort-merge (full corpus shuffle) before it
        docs = load_table(spark, "documents", SF_DIR)
        plan = bm25_score(docs, self.QUERY)._jdf.queryExecution().executedPlan().toString()
        first_join = None
        for line in plan.splitlines():
            if "SortMergeJoin" in line or "BroadcastHashJoin" in line:
                first_join = line  # deepest join prints last
        assert first_join is not None and "BroadcastHashJoin" in first_join, plan

    def test_multi_matches_per_query_calls(self, spark):
        # bm25_score_multi (the one-corpus-pass hybrid-leg form,
        # round 12) must be value-identical per query to running
        # bm25_score once per bag — same (query, doc) set, scores
        # equal to float round-trip tolerance (the per-doc term sum is
        # <= |terms| doubles; downstream consumers rank on
        # round(score, 9))
        docs = load_table(spark, "documents", SF_DIR)
        queries = {0: self.QUERY, 1: ["join", "merge", "window"]}
        got = _sorted(
            bm25_score_multi(docs, queries).toPandas(),
            ["query_id", "doc_id"],
        )
        import pandas as pd

        want = _sorted(
            pd.concat(
                [
                    bm25_score(docs, terms)
                    .toPandas()
                    .assign(query_id=qid)
                    for qid, terms in queries.items()
                ]
            )[["query_id", "doc_id", "bm25"]],
            ["query_id", "doc_id"],
        )
        assert len(got) == len(want) and len(got) > 0
        assert (got["query_id"].values == want["query_id"].values).all()
        assert (got["doc_id"].values == want["doc_id"].values).all()
        np.testing.assert_allclose(
            got["bm25"].values, want["bm25"].values, rtol=1e-12
        )


class TestVocab:
    def test_topv_deterministic_and_ranked(self, spark, duck):
        docs = load_table(spark, "documents", SF_DIR)
        got = build_vocab(docs, max_size=50).toPandas()
        want = duck.sql(
            """
SELECT term, count(*) AS count FROM terms_ne
GROUP BY term ORDER BY count DESC, term ASC LIMIT 50
"""
        ).df()
        assert list(got["term"]) == list(want["term"])
        assert list(got["count"]) == list(want["count"])
        assert list(got["rank"]) == list(range(1, len(got) + 1))

    def test_no_global_window_over_terms(self, spark):
        # the top-V must be TakeOrdered (distributed partial top-k);
        # the only Window sits on the bounded V-row result
        docs = load_table(spark, "documents", SF_DIR)
        plan = (
            build_vocab(docs, max_size=50)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan, plan

    def test_huge_max_size_path_equivalence(self, spark, monkeypatch):
        # max_size beyond _TAKE_ORDERED_CAP switches build_vocab from
        # orderBy+limit (TakeOrdered allocates 2*max_size object slots
        # PER TASK regardless of input size — limit(10**9) was a ~16 GB
        # zeroed allocation that killed the driver JVM, round 12) to
        # rank-then-filter. (count DESC, term ASC) is a total order, so
        # the two formulations must agree row-for-row; pin it by
        # forcing the rank path at a small max_size.
        import polars_matmul_spark.operators.tfidf as T

        docs = load_table(spark, "documents", SF_DIR)
        want = build_vocab(docs, max_size=10).toPandas()
        monkeypatch.setattr(T, "_TAKE_ORDERED_CAP", 5)
        got = build_vocab(docs, max_size=10).toPandas()
        assert list(got["term"]) == list(want["term"])
        assert list(got["count"]) == list(want["count"])
        assert list(got["rank"]) == list(want["rank"])

    def test_oov_rate(self, spark):
        docs = load_table(spark, "documents", SF_DIR)
        vocab = build_vocab(docs, max_size=20)
        r = oov_rate(docs, vocab).toPandas()
        assert (r["oov_rate"] >= 0).all() and (r["oov_rate"] <= 1).all()
        assert (r["n_oov"] <= r["n_tokens"]).all()
        # with the full vocabulary, nothing is OOV
        full = build_vocab(docs, max_size=10**9)
        r2 = oov_rate(docs, full).toPandas()
        assert (r2["n_oov"] == 0).all()
