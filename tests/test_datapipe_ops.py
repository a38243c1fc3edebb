"""Round-4 data-pipeline operators vs DuckDB / NumPy oracles:

- line-level dedup (operators/linededup.py) — hand-built semantics
  matrix + full DuckDB replication on a newline-injected sf0.001 corpus
- hashed-token linear quality scorer + MLlib trainer
  (operators/quality_model.py) — DuckDB score parity, separability
- DSIR importance resampling (operators/dsir.py) — LM normalization,
  NumPy weight parity, Gumbel determinism + partitioning invariance,
  selection actually prefers target-like docs
- token-budget shard assignment (operators/shards.py) — two-phase
  prefix sum == DuckDB's single global window, write/read roundtrip
"""

from __future__ import annotations

import math
import os

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from polars_matmul_spark.operators.dsir import (
    dsir_log_weights,
    dsir_select,
    gumbel_topk_sample,
    hashed_unigram_logprobs,
)
from polars_matmul_spark.operators.linededup import (
    frequent_lines,
    strip_frequent_lines,
)
from polars_matmul_spark.operators.quality_model import (
    linear_quality_score,
    train_quality_classifier,
)
from polars_matmul_spark.operators.shards import (
    assign_token_shards,
    write_token_shards,
)
from polars_matmul_spark.operators.text import token_count
from polars_matmul_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    yield con
    con.close()


# --- line dedup ------------------------------------------------------------


class TestLineDedup:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        rows = [
            (1, "unique alpha\nCOOKIE BANNER\nbody one\n\nbody two"),
            (2, "cookie banner\nunique beta"),
            (3, "cookie   banner\nself repeat\nself repeat\nunique gamma"),
            (4, "COOKIE BANNER"),  # all-boilerplate doc
            (5, ""),  # empty doc
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_frequent_lines(self, corpus):
        # 'cookie banner' (case/space-normalized) is in docs 1,2,3,4;
        # 'self repeat' repeats only WITHIN doc 3 -> not frequent
        freq = frequent_lines(corpus, min_docs=2).collect()
        assert len(freq) == 1
        assert freq[0]["n_docs"] == 4

    def test_strip_semantics(self, corpus):
        out = {
            r["doc_id"]: r for r in strip_frequent_lines(corpus, min_docs=2).collect()
        }
        assert len(out) == 5  # every doc survives, even emptied ones
        # doc 1: banner removed, blank line KEPT, order preserved
        assert out[1]["text"] == "unique alpha\nbody one\n\nbody two"
        assert (out[1]["n_lines"], out[1]["n_stripped"]) == (5, 1)
        assert out[2]["text"] == "unique beta"
        # doc 3: within-doc repetition is not line-dedup's business
        assert out[3]["text"] == "self repeat\nself repeat\nunique gamma"
        # doc 4: emptied, counters say why
        assert out[4]["text"] == ""
        assert (out[4]["n_lines"], out[4]["n_stripped"]) == (1, 1)
        # doc 5: split('') -> one blank line, kept verbatim
        assert out[5]["text"] == ""
        assert out[5]["n_stripped"] == 0

    def test_vs_duckdb(self, spark, duck):
        # the synthetic corpus is single-line; inject newlines the same
        # deterministic way in both engines to get a multi-line corpus
        docs = load_table(spark, "documents", SF_DIR).withColumn(
            "text", F.regexp_replace("text", " ", "\n")
        )
        got = (
            strip_frequent_lines(docs, min_docs=2)
            .orderBy("doc_id")
            .toPandas()
        )
        want = duck.sql(
            r"""
WITH d AS (
  SELECT doc_id, replace(text, ' ', chr(10)) AS text FROM documents
), occ AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS line,
         generate_subscripts(string_split(text, chr(10)), 1) AS pos
  FROM d
), hashed AS (
  SELECT doc_id, pos, line,
         md5(regexp_replace(lower(trim(line)), '\s+', ' ', 'g')) AS h,
         trim(line) = '' AS is_blank
  FROM occ
), freq AS (
  SELECT h FROM hashed WHERE NOT is_blank
  GROUP BY h HAVING count(DISTINCT doc_id) >= 2
), marked AS (
  SELECT doc_id, pos, line,
         (h IN (SELECT h FROM freq)) AND NOT is_blank AS dropped
  FROM hashed
)
SELECT doc_id,
       coalesce(string_agg(CASE WHEN NOT dropped THEN line END, chr(10)
                           ORDER BY pos), '') AS text,
       count(*) AS n_lines,
       CAST(sum(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT) AS n_stripped
FROM marked GROUP BY doc_id ORDER BY doc_id
"""
        ).df()
        assert len(got) == len(want) and len(got) > 0
        assert (got["doc_id"].values == want["doc_id"].values).all()
        assert (got["text"].values == want["text"].values).all()
        assert (got["n_stripped"].values == want["n_stripped"].values).all()
        # the injected corpus must actually exercise the operator
        assert got["n_stripped"].sum() > 0


# --- quality model ---------------------------------------------------------

_D = 64
# deterministic pseudo-weights: fixed arithmetic, no RNG
_WEIGHTS = [((b * 2654435761) % 1000) / 1000.0 - 0.5 for b in range(_D)]
_BIAS = 0.25


class TestQualityModel:
    def test_score_vs_duckdb(self, spark, duck):
        docs = load_table(spark, "documents", SF_DIR)
        got = (
            docs.select(
                "doc_id",
                F.round(
                    linear_quality_score(F.col("text"), _WEIGHTS, _BIAS), 9
                ).alias("q"),
            )
            .orderBy("doc_id")
            .toPandas()
        )
        wlit = "[" + ", ".join(f"{w!r}" for w in _WEIGHTS) + "]"
        want = duck.sql(
            rf"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\s+'),
                     x -> x <> '') AS ts
  FROM documents
)
SELECT doc_id,
       round(1.0 / (1.0 + exp(-({_BIAS} +
         CASE WHEN len(ts) > 0 THEN
           list_sum(list_transform(ts, x ->
             ({wlit})[CAST(('0x' || substr(md5(x), 1, 12))::BIGINT % {_D}
                      AS INT) + 1]))
           / len(ts)
         ELSE 0.0 END))), 9) AS q
FROM t ORDER BY doc_id
"""
        ).df()
        assert len(got) == len(want) and len(got) > 0
        assert (got["doc_id"].values == want["doc_id"].values).all()
        np.testing.assert_allclose(got["q"].values, want["q"].values, atol=2e-9)

    def test_empty_doc_scores_sigmoid_bias(self, spark):
        df = spark.createDataFrame([(1, ""), (2, "   ")], "doc_id long, text string")
        got = df.select(
            linear_quality_score(F.col("text"), _WEIGHTS, _BIAS).alias("q")
        ).collect()
        want = 1.0 / (1.0 + math.exp(-_BIAS))
        for r in got:
            assert abs(r["q"] - want) < 1e-12

    def test_train_separates(self, spark):
        # synthetic separable corpus: "good" docs draw from one vocab,
        # "bad" from another; hold out every 5th doc
        good_vocab = ["insight", "analysis", "theorem", "study", "method"]
        bad_vocab = ["click", "free", "winner", "casino", "pills"]
        rows = []
        for i in range(200):
            vocab = good_vocab if i % 2 == 0 else bad_vocab
            text = " ".join(vocab[(i + j) % len(vocab)] for j in range(20))
            rows.append((i, text, 1.0 if i % 2 == 0 else 0.0))
        df = spark.createDataFrame(rows, "doc_id long, text string, label double")
        train = df.filter(F.col("doc_id") % 5 != 0)
        test = df.filter(F.col("doc_id") % 5 == 0)
        w, b = train_quality_classifier(train, n_buckets=256)
        assert len(w) == 256
        scored = test.select(
            "label", linear_quality_score(F.col("text"), w, b).alias("q")
        ).collect()
        acc = sum(
            1 for r in scored if (r["q"] >= 0.5) == (r["label"] >= 0.5)
        ) / len(scored)
        assert acc >= 0.95


# --- DSIR ------------------------------------------------------------------


class TestDsir:
    def test_lm_normalizes(self, spark):
        docs = load_table(spark, "documents", SF_DIR)
        lp = hashed_unigram_logprobs(docs, n_buckets=128)
        assert len(lp) == 128
        assert abs(sum(math.exp(x) for x in lp) - 1.0) < 1e-9

    def test_weights_vs_numpy(self, spark):
        rows = [(1, "aa bb aa"), (2, "cc"), (3, "")]
        raw = spark.createDataFrame(rows, "doc_id long, text string")
        target = spark.createDataFrame([(10, "aa aa bb")], "doc_id long, text string")
        D, alpha = 16, 0.5
        t_lp = hashed_unigram_logprobs(target, n_buckets=D, alpha=alpha)
        r_lp = hashed_unigram_logprobs(raw, n_buckets=D, alpha=alpha)

        # numpy replication with the same md5 bucketing
        import hashlib

        def bucket(tok):
            return int(hashlib.md5(tok.encode()).hexdigest()[:12], 16) % D

        def lm(token_lists):
            c = np.full(D, 0.0)
            for toks in token_lists:
                for t in toks:
                    c[bucket(t)] += 1
            return np.log((c + alpha) / (c.sum() + alpha * D))

        t_np = lm([["aa", "aa", "bb"]])
        r_np = lm([["aa", "bb", "aa"], ["cc"], []])
        np.testing.assert_allclose(t_lp, t_np, rtol=1e-12)
        np.testing.assert_allclose(r_lp, r_np, rtol=1e-12)

        got = {
            r["doc_id"]: r["log_w"]
            for r in dsir_log_weights(raw, t_lp, r_lp).collect()
        }
        for doc_id, toks in [(1, ["aa", "bb", "aa"]), (2, ["cc"]), (3, [])]:
            want = sum(t_np[bucket(t)] - r_np[bucket(t)] for t in toks)
            assert abs(got[doc_id] - want) < 1e-9

    def test_pair_matches_two_separate_fits(self, spark):
        """r6: the fused one-pass (target, raw) LM fit — for the common
        target-is-a-slice-of-raw setup — must be numerically identical
        to two separate hashed_unigram_logprobs jobs."""
        from polars_matmul_spark.operators.dsir import (
            hashed_unigram_logprobs_pair,
        )

        docs = load_table(spark, "documents", SF_DIR)
        pred = F.col("lang") == "en"
        t_sep = hashed_unigram_logprobs(docs.filter(pred), n_buckets=64, alpha=0.5)
        r_sep = hashed_unigram_logprobs(docs, n_buckets=64, alpha=0.5)
        t_fus, r_fus = hashed_unigram_logprobs_pair(
            docs, pred, n_buckets=64, alpha=0.5
        )
        assert t_fus == t_sep and r_fus == r_sep
        # empty target slice: smoothing-only LM, no crash
        t0, r0 = hashed_unigram_logprobs_pair(
            docs, F.lit(False), n_buckets=16
        )
        assert r0 == hashed_unigram_logprobs(docs, n_buckets=16)
        assert all(abs(x - math.log(1.0 / 16)) < 1e-12 for x in t0)

    def test_gumbel_deterministic_and_partition_invariant(self, spark):
        docs = load_table(spark, "documents", SF_DIR).withColumn(
            "log_w", F.col("doc_id").cast("double") % 7
        )
        a = [r["doc_id"] for r in gumbel_topk_sample(docs, 25).collect()]
        b = [r["doc_id"] for r in gumbel_topk_sample(docs.repartition(7), 25).collect()]
        assert len(a) == 25
        assert sorted(a) == sorted(b)

    def test_select_prefers_target_like(self, spark):
        rows = []
        for i in range(300):
            if i < 150:
                text = "the quick brown fox jumps over the lazy dog " * 3
            else:
                text = "zzz111 qqq222 xxx333 vvv444 " * 5
            rows.append((i, text))
        raw = spark.createDataFrame(rows, "doc_id long, text string")
        target = spark.createDataFrame(
            [(1000, "the quick brown fox likes the lazy dog")],
            "doc_id long, text string",
        )
        sel = dsir_select(raw, target, k=50, n_buckets=256)
        ids = [r["doc_id"] for r in sel.collect()]
        assert len(ids) == 50
        # overwhelming majority must be the english-like half
        assert sum(1 for i in ids if i < 150) >= 48


# --- shards ----------------------------------------------------------------


class TestShards:
    BUDGET = 2000

    def _docs(self, spark):
        return (
            load_table(spark, "documents", SF_DIR)
            .select("doc_id", "text")
            .withColumn("n_tokens", token_count(F.col("text")))
        )

    def test_two_phase_equals_global_window(self, spark, duck):
        got = (
            assign_token_shards(self._docs(spark), tokens_per_shard=self.BUDGET)
            .select("doc_id", "shard_start", "shard_id")
            .orderBy("doc_id")
            .toPandas()
        )
        want = duck.sql(
            rf"""
WITH t AS (
  -- mirrors text.token_count exactly: len(split(trim(text))), empty
  -- tokens INCLUDED (split('') is [''], size 1, in both engines)
  SELECT doc_id,
         len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents
)
SELECT doc_id,
       coalesce(sum(n_tokens) OVER (ORDER BY h, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         AS shard_start,
       CAST(floor(shard_start / {self.BUDGET}) AS BIGINT) AS shard_id
FROM t ORDER BY doc_id
"""
        ).df()
        assert len(got) == len(want) and len(got) > 0
        assert (got["doc_id"].values == want["doc_id"].values).all()
        assert (got["shard_start"].values == want["shard_start"].values).all()
        assert (got["shard_id"].values == want["shard_id"].values).all()
        assert got["shard_id"].nunique() > 1  # actually exercises cuts

    def test_partitioning_invariant(self, spark):
        base = self._docs(spark)
        a = (
            assign_token_shards(base, tokens_per_shard=self.BUDGET)
            .select("doc_id", "shard_id")
            .toPandas()
            .sort_values("doc_id")
        )
        b = (
            assign_token_shards(base.repartition(13), tokens_per_shard=self.BUDGET)
            .select("doc_id", "shard_id")
            .toPandas()
            .sort_values("doc_id")
        )
        assert (a["shard_id"].values == b["shard_id"].values).all()

    def test_write_roundtrip(self, spark, tmp_path):
        docs = self._docs(spark)
        path = os.path.join(str(tmp_path), "shards")
        write_token_shards(docs, path, tokens_per_shard=self.BUDGET)
        back = spark.read.parquet(path)
        assert back.count() == docs.count()
        assert "shard_id" in back.columns
        # every shard's token total stays under budget + one max doc
        per_shard = (
            back.groupBy("shard_id").agg(F.sum("n_tokens").alias("tot")).toPandas()
        )
        max_doc = docs.agg(F.max("n_tokens")).collect()[0][0]
        assert (per_shard["tot"] <= self.BUDGET + max_doc).all()


class TestHotShingleCap:
    """neardup_pairs_exact(max_shingle_docs=...): bounded candidate
    generation with full-array verification (round-5 stretch)."""

    def _mk(self, spark):
        # every doc ends with the same stopword-heavy boilerplate
        # shingle source ("click here to subscribe now"), so the
        # boilerplate n-grams appear in ALL docs — the quadratic hot
        # key. Genuine near-dup pairs (0,1) and (2,3) share their
        # distinctive prefixes too.
        boiler = "click here to subscribe now"
        rows = [
            (0, f"alpha beta gamma delta epsilon zeta {boiler}"),
            (1, f"alpha beta gamma delta epsilon eta {boiler}"),
            (2, f"red orange yellow green blue indigo {boiler}"),
            (3, f"red orange yellow green blue violet {boiler}"),
            (4, f"one two three four five six {boiler}"),
            (5, f"seven eight nine ten eleven twelve {boiler}"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_capped_pairs_equal_uncapped_at_threshold(self, spark):
        from polars_matmul_spark.operators.dedup import neardup_pairs_exact

        docs = self._mk(spark)
        uncapped = sorted(
            (r.d1, r.d2, round(r.jaccard, 9))
            for r in neardup_pairs_exact(docs, threshold=0.5).collect()
        )
        capped = sorted(
            (r.d1, r.d2, round(r.jaccard, 9))
            for r in neardup_pairs_exact(
                docs, threshold=0.5, max_shingle_docs=3
            ).collect()
        )
        # the boilerplate shingles (doc frequency 6 > 3) leave candidate
        # generation, but every >=0.5 pair still shares distinctive
        # shingles -> identical pairs AND identical (true, uncapped)
        # jaccard values
        assert capped == uncapped and len(capped) >= 2
        assert {(d1, d2) for d1, d2, _ in capped} >= {(0, 1), (2, 3)}

    def test_cap_drops_boilerplate_only_pairs(self, spark):
        from polars_matmul_spark.operators.dedup import neardup_pairs_exact

        docs = self._mk(spark)
        # at a threshold low enough that boilerplate alone qualifies,
        # the capped form misses pairs whose ONLY shared shingles are
        # hot — the documented approximation, and exactly the pairs a
        # boilerplate-strip pass removes
        uncapped = {
            (r.d1, r.d2)
            for r in neardup_pairs_exact(docs, threshold=0.05).collect()
        }
        capped = {
            (r.d1, r.d2)
            for r in neardup_pairs_exact(
                docs, threshold=0.05, max_shingle_docs=3
            ).collect()
        }
        assert capped < uncapped  # strictly fewer: (4,5)-style pairs gone
        assert (4, 5) in uncapped and (4, 5) not in capped
        # pairs that DO survive carry their true uncapped jaccard
        j_cap = {
            (r.d1, r.d2): r.jaccard
            for r in neardup_pairs_exact(
                docs, threshold=0.05, max_shingle_docs=3
            ).collect()
        }
        j_unc = {
            (r.d1, r.d2): r.jaccard
            for r in neardup_pairs_exact(docs, threshold=0.05).collect()
        }
        for k, v in j_cap.items():
            assert abs(v - j_unc[k]) == 0.0


class TestStripRepeatedWithinDoc:
    def test_semantics_matrix(self, spark):
        from polars_matmul_spark.operators.linededup import (
            strip_repeated_lines_within_doc,
        )

        rows = [
            # repeat dropped, first kept, order preserved
            (0, "alpha\nbeta\nalpha\ngamma\nbeta"),
            # case/whitespace-normalized repeats drop too
            (1, "Hello World\nhello   world\nunique"),
            # blank lines always survive, even repeated
            (2, "a\n\n\na"),
            # no repeats: untouched
            (3, "one\ntwo\nthree"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["text"], r["n_lines"], r["n_stripped"])
            for r in strip_repeated_lines_within_doc(df).collect()
        }
        assert got[0] == ("alpha\nbeta\ngamma", 5, 2)
        assert got[1] == ("Hello World\nunique", 3, 1)
        assert got[2] == ("a\n\n", 4, 1)
        assert got[3] == ("one\ntwo\nthree", 3, 0)

    def test_duckdb_replay(self, spark):
        import duckdb

        from polars_matmul_spark.operators.linededup import (
            strip_repeated_lines_within_doc,
        )
        from polars_matmul_spark.sources.tables import load_table

        sf = "/root/testdata/sf0.001"
        docs = load_table(spark, "documents", sf).select(
            "doc_id", F.regexp_replace("text", " ", "\n").alias("text")
        )
        got = sorted(map(tuple, strip_repeated_lines_within_doc(docs).collect()))
        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
        oracle = sorted(
            map(
                tuple,
                con.sql(r"""
WITH d AS (
  SELECT doc_id, replace(text, ' ', chr(10)) AS text FROM documents
), occ AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS line,
         generate_subscripts(string_split(text, chr(10)), 1) AS pos
  FROM d
), hashed AS (
  SELECT doc_id, pos, line,
         md5(regexp_replace(lower(trim(line)), '\s+', ' ', 'g')) AS h,
         trim(line) = '' AS is_blank
  FROM occ
), marked AS (
  SELECT doc_id, pos, line,
         (row_number() OVER (PARTITION BY doc_id, h ORDER BY pos) > 1)
           AND NOT is_blank AS dropped
  FROM hashed
)
SELECT doc_id,
       coalesce(string_agg(CASE WHEN NOT dropped THEN line END, chr(10)
                           ORDER BY pos), '') AS text,
       count(*) AS n_lines,
       CAST(sum(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT) AS n_stripped
FROM marked GROUP BY doc_id
""").fetchall(),
            )
        )
        assert got == oracle

    def test_single_doc_keyed_shuffle(self, spark):
        from polars_matmul_spark.operators.linededup import (
            strip_repeated_lines_within_doc,
        )
        from polars_matmul_spark.plans.inspect import (
            count_shuffles,
            uses_python_worker,
        )
        from polars_matmul_spark.sources.tables import load_table

        docs = load_table(spark, "documents", "/root/testdata/sf0.001")
        out = strip_repeated_lines_within_doc(docs)
        assert not uses_python_worker(out)
        # the explicit doc_id exchange serves both the window and the
        # reassembly: exactly one shuffle, nothing global
        assert count_shuffles(out) == 1
