"""Winnowing fingerprints + substring-overlap dedup (operators/
winnow.py): pure-Python winnowing oracle, full DuckDB replication,
the shared-substring guarantee, density, and plan gates."""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from polars_matmul_spark.operators.winnow import (
    build_winnow_index,
    winnow_dup_pairs,
    winnow_fingerprints,
    winnow_fp_values,
    winnow_new_vs_index,
)
from polars_matmul_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _h(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:12], 16)


def py_winnow(text: str, k: int = 8, window: int = 4) -> set[tuple[int, int]]:
    """Reference winnowing: per window of `window` k-gram hashes pick
    the min, rightmost on ties; return the distinct (pos, hash) set."""
    n = len(text) - k + 1
    if n <= 0:
        return set()
    hs = [_h(text[i : i + k]) for i in range(n)]
    w = min(window, n)
    out = set()
    for j in range(max(n - w + 1, 1)):
        win = hs[j : j + w]
        mv = min(win)
        off = max(i for i, v in enumerate(win) if v == mv)
        out.add((j + off, mv))
    return out


class TestFingerprints:
    def test_matches_python_oracle(self, spark):
        texts = [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "abcdefghijklmnopqrstuvwxyz"),
            (2, "aaaaaaaaaaaaaaaa"),  # all-equal hashes: rightmost-tie rule
            (3, "short"),  # < k: no fingerprints
            (4, "exactlyk"),  # == k: one gram, one window
            (5, "ninechars"),  # k+1 grams < window: short-doc fallback
        ]
        df = spark.createDataFrame(texts, "doc_id long, text string")
        got = {}
        for r in winnow_fingerprints(df, k=8, window=4).collect():
            got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
        want = {i: py_winnow(t, 8, 4) for i, t in texts if len(t) >= 8}
        want = {i: s for i, s in want.items() if s}
        assert got == want
        assert 3 not in got  # sub-k doc emits nothing

    def test_vs_duckdb(self, spark):
        docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
        got = sorted(
            (r.doc_id, r.pos, r.fp)
            for r in winnow_fingerprints(docs, k=8, window=4).collect()
        )
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
        )
        want = sorted(
            map(
                tuple,
                con.sql(
                    """
WITH g AS (
  SELECT doc_id, text, greatest(length(text) - 7, 0) AS n
  FROM documents WHERE length(text) >= 8
), hs AS (
  SELECT doc_id, n,
         list_transform(range(1, n + 1), i ->
           ('0x' || substr(md5(substr(text, CAST(i AS INT), 8)), 1, 12))::BIGINT
         ) AS h
  FROM g
), sel AS (
  SELECT doc_id,
         list_transform(
           range(1, greatest(n - least(4, n) + 1, 1) + 1), j ->
           {'pos': j + list_reduce(
                     list_transform(range(1, least(4, n) + 1), i ->
                       CASE WHEN h[CAST(j + i - 1 AS INT)] =
                            list_min(h[CAST(j AS INT):CAST(j + least(4, n) - 1 AS INT)])
                            THEN i ELSE 0 END),
                     (a, b) -> greatest(a, b)) - 2,
            'fp': list_min(h[CAST(j AS INT):CAST(j + least(4, n) - 1 AS INT)])}
         ) AS sels
  FROM hs
)
SELECT DISTINCT doc_id, CAST(s.pos AS BIGINT) AS pos, s.fp AS fp
FROM sel, unnest(sels) AS t(s)
"""
                ).fetchall(),
            )
        )
        assert got == want and len(got) > 0

    def test_density(self, spark):
        # winnowing selects ~2/(window+1) of positions (paper §3.2);
        # allow generous slack on real text
        docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
        n_pos = docs.select(
            F.sum(F.greatest(F.length("text") - F.lit(7), F.lit(0)))
        ).collect()[0][0]
        n_sel = winnow_fingerprints(docs, k=8, window=4).count()
        frac = n_sel / n_pos
        assert 0.2 < frac < 0.6  # theory: 2/5 = 0.4

    def test_jvm_only_plan(self, spark):
        docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
        plan = (
            winnow_fingerprints(docs)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Python" not in plan and "Exchange" not in plan

    def test_validation(self, spark):
        docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
        with pytest.raises(ValueError, match=">= 1"):
            winnow_fingerprints(docs, k=0)
        with pytest.raises(ValueError, match=">= 1"):
            winnow_fingerprints(docs, window=0)
        with pytest.raises(ValueError, match=">= 1"):
            winnow_fp_values(docs, k=0)

    def test_values_path_equals_positions_path(self, spark):
        # the fast pair-report path must select the identical distinct
        # (doc, fp) set as the full positions form
        docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
        fast = {
            (r.doc_id, r.fp)
            for r in winnow_fp_values(docs, k=8, window=4).distinct().collect()
        }
        full = {
            (r.doc_id, r.fp)
            for r in winnow_fingerprints(docs, k=8, window=4)
            .select("doc_id", "fp")
            .distinct()
            .collect()
        }
        assert fast == full and len(fast) > 0


class TestEdgeCases:
    def test_empty_corpus(self, spark):
        df = spark.createDataFrame([], "doc_id long, text string")
        assert winnow_fingerprints(df).count() == 0
        assert winnow_dup_pairs(df).count() == 0
        assert build_winnow_index(df).count() == 0

    def test_all_docs_below_k(self, spark):
        df = spark.createDataFrame(
            [(0, "short"), (1, "tiny")], "doc_id long, text string"
        )
        assert winnow_fp_values(df, k=8).count() == 0
        assert winnow_dup_pairs(df, k=8).count() == 0

    def test_new_vs_empty_index(self, spark):
        docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
        empty_ix = spark.createDataFrame([], "doc_id long, fp long")
        assert winnow_new_vs_index(docs.limit(5), empty_ix).count() == 0

    def test_single_doc_no_pairs(self, spark):
        df = spark.createDataFrame(
            [(0, "one single document long enough to fingerprint fully")],
            "doc_id long, text string",
        )
        assert winnow_fp_values(df).count() > 0
        assert winnow_dup_pairs(df).count() == 0


class TestGuaranteeProperty:
    """The winnowing guarantee (Schleimer et al. §3), property-tested
    against the pure-Python oracle: any span of length >= k + window - 1
    shared verbatim by two texts contributes at least one common
    selected fingerprint. Spark == py_winnow is pinned separately
    (TestFingerprints.test_matches_python_oracle), so this chain covers
    the distributed form without a Spark job per hypothesis example."""

    def test_shared_span_always_fingerprinted(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        K, W = 8, 4
        alpha = st.text(alphabet="abcdefgh ", min_size=0, max_size=60)
        span = st.text(alphabet="xyzuvw", min_size=K + W - 1, max_size=40)

        @given(pre1=alpha, suf1=alpha, pre2=alpha, suf2=alpha, s=span)
        @settings(max_examples=200, deadline=None)
        def check(pre1, suf1, pre2, suf2, s):
            t1 = f"{pre1}{s}{suf1}"
            t2 = f"{pre2}{s}{suf2}"
            f1 = {fp for _pos, fp in py_winnow(t1, K, W)}
            f2 = {fp for _pos, fp in py_winnow(t2, K, W)}
            assert f1 & f2, (t1, t2, s)

        check()


class TestDupPairs:
    def _mk(self, spark):
        # shared verbatim span of 40 chars between 0 and 1 (>= k+w-1=11
        # -> guaranteed common fingerprint); 2 shares nothing that long
        span = "this exact span is copied verbatim twice"
        rows = [
            (0, f"unique prefix alpha {span} unique suffix omega"),
            (1, f"completely different text here {span} and more tail"),
            (2, "no overlap with anything else in this corpus at all"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_guarantee_finds_shared_span(self, spark):
        pairs = {
            (r.d1, r.d2): r.n_shared
            for r in winnow_dup_pairs(self._mk(spark), min_shared=1).collect()
        }
        assert (0, 1) in pairs and pairs[(0, 1)] >= 1
        assert all(d == (0, 1) for d in pairs)  # no spurious pair

    def test_min_shared_filters(self, spark):
        df = self._mk(spark)
        lo = winnow_dup_pairs(df, min_shared=1)
        n01 = {
            (r.d1, r.d2): r.n_shared for r in lo.collect()
        }[(0, 1)]
        hi = winnow_dup_pairs(df, min_shared=n01 + 1)
        assert hi.count() == 0

    def test_hot_hash_cap(self, spark):
        # boilerplate span shared by ALL docs leaves candidate gen under
        # the cap; the pair sharing a DISTINCT span survives
        boiler = "standard footer text appended to every single document"
        span = "rare duplicated paragraph appearing in just two docs"
        rows = [(i, f"doc {i} body {boiler}") for i in range(6)] + [
            (10, f"first holder {span} {boiler}"),
            (11, f"second holder {span} {boiler}"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        capped = {
            (r.d1, r.d2)
            for r in winnow_dup_pairs(
                df, min_shared=1, max_hash_docs=3
            ).collect()
        }
        assert (10, 11) in capped
        # pure-boilerplate pairs (0..5 x each other) are the documented
        # miss under the cap
        assert not any(d1 < 6 and d2 < 6 for d1, d2 in capped)

    def test_auto_cap_bounds_planted_ubiquitous_fingerprint(self, spark):
        """r6: max_hash_docs defaults to 'auto' (winnow_hash_cap of the
        corpus row count). A license-header span planted in 100 of 202
        docs exceeds the derived cap (81), so its fingerprints leave
        the postings join — boilerplate-only pairs are the documented
        miss — while a genuine two-doc duplicate span survives. The
        explicit None opt-out reproduces the unbounded quadratic."""
        import hashlib

        from polars_matmul_spark.operators.winnow import winnow_hash_cap

        boiler = "LICENSE HEADER: COMMON BOILERPLATE PREAMBLE SHARED EVERYWHERE. "
        span = "zebra quantum flamingo paradox engine"
        rows = [
            (i, boiler + hashlib.md5(str(i).encode()).hexdigest())
            for i in range(100)
        ]
        rows += [
            (i, hashlib.md5(f"{i}filler".encode()).hexdigest() * 2)
            for i in range(100, 200)
        ]
        rows += [(200, f"alpha {span} omega"), (201, f"start {span} finish")]
        df = spark.createDataFrame(rows, "doc_id long, text string")

        assert winnow_hash_cap(202) == 81  # floor(sqrt(32*202)) + 1
        assert winnow_hash_cap(1) == 64  # tiny-corpus floor
        assert winnow_hash_cap(10**8) == 56_569  # ~16n pairs max per fp

        auto = {
            (r.d1, r.d2, r.n_shared)
            for r in winnow_dup_pairs(df, min_shared=1).collect()
        }
        explicit = {
            (r.d1, r.d2, r.n_shared)
            for r in winnow_dup_pairs(
                df, min_shared=1, max_hash_docs=winnow_hash_cap(202)
            ).collect()
        }
        assert auto == explicit  # 'auto' IS the derived cap
        pairs = {(d1, d2) for d1, d2, _ in auto}
        assert (200, 201) in pairs  # the genuine duplicate survives
        # every fingerprint selected in ALL 100 boiler docs (the
        # fully-interior boiler grams — df 100 > cap 81) left the join:
        # boiler-pair shared counts collapse vs the unbounded run.
        # (Boundary-straddling boiler grams win their window in only
        # SOME docs, so low-df boiler fps legitimately survive — the
        # cap bounds per-hash WORK, it is not a boilerplate classifier.)
        unb = {
            (r.d1, r.d2): r.n_shared
            for r in winnow_dup_pairs(
                df, min_shared=1, max_hash_docs=None
            ).collect()
        }
        assert len(unb) >= 100 * 99 // 2  # the prevented quadratic
        capped_n = {(d1, d2): n for d1, d2, n in auto}
        boiler_pairs = [p for p in unb if p[0] < 100 and p[1] < 100]
        assert all(
            capped_n.get(p, 0) < unb[p] for p in boiler_pairs
        )  # every boiler pair lost its ubiquitous fingerprints

    def test_incremental_equals_full_crossing_pairs(self, spark):
        # index even ids, arrive with odd ids: the incremental check
        # must equal the full-corpus pair run restricted to pairs that
        # cross the split (the same contract pinned for the MinHash
        # and IVF incremental forms)
        docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
        hist = docs.filter(F.col("doc_id") % 2 == 0)
        new = docs.filter(F.col("doc_id") % 2 == 1)
        ix = build_winnow_index(hist, k=8, window=4)
        inc = {
            (r.new_id, r.old_id): r.n_shared
            for r in winnow_new_vs_index(
                new, ix, k=8, window=4, min_shared=2
            ).collect()
        }
        full = {}
        for r in winnow_dup_pairs(docs, k=8, window=4, min_shared=2).collect():
            a, b = r.d1, r.d2
            if a % 2 != b % 2:  # crossing pairs only
                new_id, old_id = (a, b) if a % 2 == 1 else (b, a)
                full[(new_id, old_id)] = r.n_shared
        assert inc == full and len(inc) > 0

    def test_incremental_broadcasts_new_side(self, spark):
        # the TB-scale index must be scanned in place: the new batch's
        # fingerprint table broadcasts, no shuffle of the index side
        docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
        ix = build_winnow_index(docs.filter(F.col("doc_id") % 2 == 0))
        out = winnow_new_vs_index(docs.filter(F.col("doc_id") % 2 == 1), ix)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan

    def test_index_hot_hash_cap(self, spark):
        # build-time cap: a boilerplate hash present in > cap docs
        # leaves the index entirely
        boiler = "standard footer text appended to every single document"
        rows = [(i, f"doc {i} body {boiler}") for i in range(8)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        full = build_winnow_index(df, k=8, window=4)
        capped = build_winnow_index(df, k=8, window=4, max_hash_docs=4)
        hot_fps = {
            r.fp
            for r in full.groupBy("fp")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") > 4)
            .collect()
        }
        kept = {r.fp for r in capped.select("fp").distinct().collect()}
        assert hot_fps and not (hot_fps & kept)

    def test_counts_distinct_hashes_not_positions(self, spark):
        # a doc repeating the shared span twice still counts each
        # shared fingerprint hash once
        span = "repeated block of text long enough to fingerprint"
        rows = [
            (0, f"{span} middle filler then again {span}"),
            (1, f"other document also contains {span} exactly once"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        once = {
            (r.d1, r.d2): r.n_shared
            for r in winnow_dup_pairs(df, min_shared=1).collect()
        }
        # count bounded by doc 1's own distinct fingerprint count
        fp1 = (
            winnow_fingerprints(df)
            .filter(F.col("doc_id") == 1)
            .select("fp")
            .distinct()
            .count()
        )
        assert once[(0, 1)] <= fp1


def py_excise(
    rows: list[tuple[int, str]],
    k: int,
    min_docs: int = 2,
    keep_first: bool = True,
) -> dict[int, tuple[str, int, int]]:
    """Pure-Python oracle for excise_duplicate_spans: same gram hash,
    same min-id ownership, same sorted-start interval merge."""
    grams: dict[int, set[int]] = {}
    for did, text in rows:
        for i in range(len(text) - k + 1):
            grams.setdefault(_h(text[i : i + k]), set()).add(did)
    freq = {
        h: min(dids) for h, dids in grams.items() if len(dids) >= min_docs
    }
    out = {}
    for did, text in rows:
        cuts = sorted(
            i
            for i in range(len(text) - k + 1)
            if (h := _h(text[i : i + k])) in freq
            and (not keep_first or freq[h] != did)
        )
        cur, kept, nsp, nch = 0, [], 0, 0
        for p in cuts:
            if p >= cur:
                kept.append(text[cur:p])
                nsp += 1
                nch += k
                cur = p + k
            elif p + k > cur:
                nch += p + k - cur
                cur = p + k
        kept.append(text[cur:])
        out[did] = ("".join(kept), nsp, nch)
    return out


class TestExciseSpans:
    K = 12

    def test_planted_span_keep_first(self, spark):
        from polars_matmul_spark.operators.winnow import excise_duplicate_spans

        boiler = "COPY-THIS-LICENSE-HEADER-VERBATIM"  # 33 chars >= k
        rows = [
            (0, "zqxwvutsrqponm unique zero text kjihgfedcba"),
            (1, f"alpha{boiler}omega unique one"),
            (2, f"start two {boiler} middle {boiler} end"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["text"], r["n_spans_removed"], r["n_chars_removed"])
            for r in excise_duplicate_spans(df, k=self.K).collect()
        }
        # doc 0 shares nothing: untouched
        assert got[0] == (rows[0][1], 0, 0)
        # doc 1 is the owner (min id among sharers {1, 2}): untouched
        assert got[1] == (rows[1][1], 0, 0)
        # doc 2 loses BOTH copies of the span, keeps its unique text
        text2, nsp2, nch2 = got[2]
        assert boiler not in text2
        assert "start two " in text2 and " middle " in text2 and " end" in text2
        assert nsp2 == 2 and nch2 == 2 * len(boiler)
        # and the full outputs match the pure-Python oracle exactly
        assert got == py_excise(rows, self.K)

    def test_strip_everywhere_mode(self, spark):
        from polars_matmul_spark.operators.winnow import excise_duplicate_spans

        boiler = "SHARED-BOILERPLATE-SEGMENT-HERE"
        rows = [
            (10, f"aaa{boiler}bbb"),
            (20, f"ccc{boiler}ddd"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: r["text"]
            for r in excise_duplicate_spans(
                df, k=self.K, keep_first=False
            ).collect()
        }
        assert boiler not in got[10] and boiler not in got[20]
        oracle = py_excise(rows, self.K, keep_first=False)
        assert got == {d: o[0] for d, o in oracle.items()}

    @pytest.mark.slow
    def test_real_corpus_matches_python_oracle(self, spark):
        from polars_matmul_spark.operators.winnow import excise_duplicate_spans

        docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
        rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
        oracle = py_excise(rows, self.K)
        got = {
            r["doc_id"]: (r["text"], r["n_spans_removed"], r["n_chars_removed"])
            for r in excise_duplicate_spans(docs, k=self.K).collect()
        }
        assert got == oracle
        # the synthetic corpus genuinely shares word sequences — the
        # test must not pass vacuously
        assert any(nsp > 0 for (_, nsp, _) in got.values())

    def test_duckdb_replay(self, spark):
        from polars_matmul_spark.operators.winnow import excise_duplicate_spans

        k = self.K
        docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
        got = sorted(
            map(tuple, excise_duplicate_spans(docs, k=k).collect())
        )
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
        )
        oracle = sorted(
            map(
                tuple,
                con.sql(f"""
WITH d AS (
  SELECT doc_id, text FROM documents WHERE length(text) >= {k}
), idx AS (
  SELECT doc_id, text,
         unnest(range(1, length(text) - {k} + 2)) AS i
  FROM d
), g AS (
  SELECT doc_id, i - 1 AS pos,
         ('0x' || substr(md5(substr(text, i, {k})), 1, 12))::BIGINT AS h
  FROM idx
), freq AS (
  SELECT h, MIN(doc_id) AS owner
  FROM g GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
), hits AS (
  SELECT g.doc_id, g.pos FROM g JOIN freq USING (h)
  WHERE freq.owner != g.doc_id
), m AS (
  SELECT doc_id, pos,
         COALESCE(MAX(pos + {k}) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cur
  FROM hits
), seg AS (
  SELECT m.doc_id, m.pos,
         substr(d.text, m.cur + 1, GREATEST(m.pos - m.cur, 0)) AS piece,
         CASE WHEN m.pos >= m.cur THEN 1 ELSE 0 END AS newspan,
         GREATEST(LEAST(m.pos + {k} - m.cur, {k}), 0) AS chars_cut
  FROM m JOIN d USING (doc_id)
), agg AS (
  SELECT doc_id,
         string_agg(piece, '' ORDER BY pos) AS head,
         CAST(SUM(newspan) AS BIGINT) AS nsp,
         CAST(SUM(chars_cut) AS BIGINT) AS nch,
         MAX(pos + {k}) AS fin
  FROM seg GROUP BY doc_id
)
SELECT doc.doc_id,
       COALESCE(head || substr(doc.text, fin + 1, length(doc.text)), doc.text)
         AS text,
       COALESCE(nsp, 0) AS n_spans_removed,
       COALESCE(nch, 0) AS n_chars_removed
FROM documents doc LEFT JOIN agg USING (doc_id)
""").fetchall(),
            )
        )
        assert got == oracle

    def test_short_and_untouched_docs_pass_through(self, spark):
        from polars_matmul_spark.operators.winnow import excise_duplicate_spans

        rows = [(0, "tiny"), (1, "x" * 5), (2, "completely unique long text")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["text"], r["n_spans_removed"], r["n_chars_removed"])
            for r in excise_duplicate_spans(df, k=self.K).collect()
        }
        assert got == {d: (t, 0, 0) for d, t in rows}

    def test_validation_and_plan(self, spark):
        from polars_matmul_spark.operators.winnow import excise_duplicate_spans
        from polars_matmul_spark.plans.inspect import (
            explain_str,
            uses_python_worker,
        )

        docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
        with pytest.raises(ValueError):
            excise_duplicate_spans(docs, k=0)
        with pytest.raises(ValueError):
            excise_duplicate_spans(docs, min_docs=1)
        out = excise_duplicate_spans(docs, k=self.K)
        assert not uses_python_worker(out)
        plan = explain_str(out, "simple")
        assert "CartesianProduct" not in plan
        assert "BroadcastHashJoin" in plan  # the frequent-gram table


class TestExciseProperties:
    """Hypothesis: random small corpora (with deliberate sharing and
    non-ASCII alphabets) — the Spark operator must equal the pure-
    Python oracle exactly, and the counters must reconcile with the
    text lengths."""

    def _check(self, spark, rows, k, keep_first=True):
        from polars_matmul_spark.operators.winnow import excise_duplicate_spans

        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["text"], r["n_spans_removed"], r["n_chars_removed"])
            for r in excise_duplicate_spans(
                df, k=k, keep_first=keep_first
            ).collect()
        }
        oracle = py_excise(rows, k, keep_first=keep_first)
        assert got == oracle
        for did, orig in rows:
            out_text, _nsp, nch = got[did]
            assert len(out_text) == len(orig) - nch

    @pytest.mark.slow
    def test_random_corpora_match_oracle(self, spark):
        import random

        from hypothesis import given, settings
        from hypothesis import strategies as st

        # build corpora where docs are concatenations of a small pool
        # of "paragraphs" — guarantees real cross-doc sharing — over
        # ASCII, accented and astral (emoji) alphabets
        alphabets = ["abcd ", "éüñß ", "😀🎉⚡ x"]

        @st.composite
        def corpora(draw):
            alpha = draw(st.sampled_from(alphabets))
            rng = random.Random(draw(st.integers(0, 10**6)))
            pool = [
                "".join(rng.choice(alpha) for _ in range(rng.randint(4, 24)))
                for _ in range(4)
            ]
            n_docs = draw(st.integers(2, 5))
            rows = []
            for d in range(n_docs):
                segs = [
                    pool[rng.randrange(len(pool))]
                    for _ in range(rng.randint(0, 4))
                ]
                rows.append((d, "".join(segs)))
            k = draw(st.integers(2, 8))
            keep_first = draw(st.booleans())
            return rows, k, keep_first

        @given(corpora())
        @settings(max_examples=25, deadline=None)
        def run(case):
            rows, k, keep_first = case
            self._check(spark, rows, k, keep_first)

        run()


class TestExciseIncremental:
    K = 12

    def _corpus(self, spark):
        boiler = "INCREMENTAL-EXCISION-SHARED-SPAN"
        # planted texts chosen so the ONLY >= k-char cross-doc overlap
        # is the boiler itself (boundaries differ immediately)
        hist = [
            (0, f"aq1{boiler}zx1"),
            (2, "history alpha beta gamma qqq"),
        ]
        new = [
            (10, f"bw2{boiler}cv2"),      # crosses min_docs with history
            (11, "newdoc delta epsilon www"),
            (12, f"ek3{boiler}rt3"),      # second in-batch copy
        ]
        return hist, new, boiler

    def test_equals_full_run_restricted_to_new_ids(self, spark):
        from polars_matmul_spark.operators.winnow import (
            build_gram_index,
            excise_duplicate_spans,
            excise_new_vs_index,
        )

        hist, new, boiler = self._corpus(spark)
        hist_df = spark.createDataFrame(hist, "doc_id long, text string")
        new_df = spark.createDataFrame(new, "doc_id long, text string")
        index = build_gram_index(hist_df, k=self.K)
        got_rows = sorted(
            map(tuple, excise_new_vs_index(new_df, index, k=self.K).collect())
        )
        full_rows = sorted(
            map(
                tuple,
                excise_duplicate_spans(
                    hist_df.union(new_df), k=self.K, keep_first=False
                )
                .filter(F.col("doc_id") >= 10)
                .collect(),
            )
        )
        # collected-row comparison: the two frames share new_df's
        # lineage, and exceptAll over frames with overlapping attribute
        # ids proved flaky (one side intermittently resolved empty)
        assert got_rows == full_rows
        kept = {r[0]: r[1] for r in got_rows}
        assert all(boiler not in t for t in kept.values())
        assert "bw2" in kept[10] and "cv2" in kept[10]
        assert kept[11] == "newdoc delta epsilon www"

    def test_batch_only_duplication_is_cut(self, spark):
        # a span duplicated ONLY within the batch (absent from history)
        # must still be excised — the left-join coalesce path
        from polars_matmul_spark.operators.winnow import (
            build_gram_index,
            excise_new_vs_index,
        )

        hist_df = spark.createDataFrame(
            [(0, "nothing shared here at all")], "doc_id long, text string"
        )
        span = "BATCH-ONLY-DUPLICATED-SEGMENT"
        new_df = spark.createDataFrame(
            [(10, f"a{span}b"), (11, f"c{span}d")], "doc_id long, text string"
        )
        got = excise_new_vs_index(
            new_df, build_gram_index(hist_df, k=self.K), k=self.K
        )
        assert got.filter(F.col("text").contains(span)).count() == 0

    def test_index_scanned_in_place(self, spark):
        from polars_matmul_spark.operators.winnow import (
            build_gram_index,
            excise_new_vs_index,
        )
        from polars_matmul_spark.plans.inspect import (
            explain_str,
            uses_python_worker,
        )

        hist, new, _ = self._corpus(spark)
        hist_df = spark.createDataFrame(hist, "doc_id long, text string")
        new_df = spark.createDataFrame(new, "doc_id long, text string")
        out = excise_new_vs_index(
            new_df, build_gram_index(hist_df, k=self.K), k=self.K
        )
        plan = explain_str(out, "simple")
        # the index's only touch is the broadcast left-semi probe
        assert "LeftSemi" in plan and "BroadcastHashJoin" in plan, plan
        assert not uses_python_worker(out)
        # and the probe genuinely matched: history's span IS excised
        assert out.filter(F.col("n_spans_removed") > 0).count() >= 1
        with pytest.raises(ValueError):
            excise_new_vs_index(new_df, hist_df, k=0)
        with pytest.raises(ValueError):
            excise_new_vs_index(new_df, hist_df, min_docs=1)

    def test_merge_gram_index_equals_full_build(self, spark):
        from polars_matmul_spark.operators.winnow import (
            build_gram_index,
            merge_gram_index,
        )

        hist, new, _ = self._corpus(spark)
        docs = spark.createDataFrame(hist + new, "doc_id long, text string")
        b1 = docs.filter(F.col("doc_id") < 10)
        b2 = docs.filter(F.col("doc_id") >= 10)
        merged = sorted(
            map(
                tuple,
                merge_gram_index(
                    build_gram_index(b1, k=self.K), build_gram_index(b2, k=self.K)
                ).collect(),
            )
        )
        full = sorted(map(tuple, build_gram_index(docs, k=self.K).collect()))
        assert merged == full
        with pytest.raises(ValueError):
            merge_gram_index()


# --- span-granularity dedup observability (round 7) ------------------------


def py_span_stats(
    rows: list[tuple[int, str]], k: int, cap: int | None = None
) -> dict[tuple[int, int], tuple[int, int, int, list[int]]]:
    """Pure-Python oracle for shared_span_stats: same gram hash, same
    hot-hash cap, maximal diagonal runs of the gram match matrix."""
    from collections import defaultdict

    grams = {
        did: [(i, _h(text[i : i + k])) for i in range(len(text) - k + 1)]
        for did, text in rows
    }
    docs_per_h: dict[int, set[int]] = defaultdict(set)
    for did, lst in grams.items():
        for _, h in lst:
            docs_per_h[h].add(did)
    hot = (
        {h for h, s in docs_per_h.items() if len(s) > cap}
        if cap is not None
        else set()
    )
    kept = {
        did: [(p, h) for p, h in lst if h not in hot]
        for did, lst in grams.items()
    }
    out = {}
    ids = sorted(kept)
    for i, d1 in enumerate(ids):
        h1: dict[int, list[int]] = defaultdict(list)
        for p, h in kept[d1]:
            h1[h].append(p)
        for d2 in ids[i + 1 :]:
            by_diag: dict[int, set[int]] = defaultdict(set)
            for p2, h in kept[d2]:
                for p1 in h1.get(h, ()):
                    by_diag[p1 - p2].add(p1)
            if not by_diag:
                continue
            spans = []
            for ps in by_diag.values():
                sp = sorted(ps)
                run = 1
                for prev, cur in zip(sp, sp[1:]):
                    if cur == prev + 1:
                        run += 1
                    else:
                        spans.append(run + k - 1)
                        run = 1
                spans.append(run + k - 1)
            spans.sort()
            out[(d1, d2)] = (len(spans), max(spans), sum(spans), spans)
    return out


class TestSharedSpanStats:
    K = 12

    def test_planted_span_lengths(self, spark):
        from polars_matmul_spark.operators.winnow import shared_span_stats

        shared = "x" * 0 + "the quick brown fox jumps over it"  # 33 chars
        rows = [
            (1, "AAAA " + shared + " BBBB"),
            (2, "CCCCCC " + shared + " DDDD"),
            (3, "totally unrelated content here zz"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r["d1"], r["d2"]): (
                r["n_spans"],
                r["max_span_len"],
                r["sum_span_chars"],
                list(r["span_lengths"]),
            )
            for r in shared_span_stats(df, k=self.K).collect()
        }
        # docs 1 and 2 share exactly the planted span (plus the flanking
        # spaces, which belong to the maximal run on both sides)
        assert set(got) == {(1, 2)}
        n, mx, tot, lens = got[(1, 2)]
        assert n == 1 and mx == tot == lens[0]
        # maximal shared substring is " <shared> " = 33 + 2 spaces
        assert mx == len(shared) + 2

    def test_internal_repeat_counts_alignments(self, spark):
        from polars_matmul_spark.operators.winnow import shared_span_stats

        span = "abcdefghijklmnop"  # 16 chars > K
        rows = [
            (1, span + "----------" + span),  # twice in doc 1
            (2, "====" + span + "===="),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        [r] = shared_span_stats(df, k=self.K).collect()
        # two alignments (one per copy in doc 1), each the full span
        assert r["n_spans"] == 2
        assert r["max_span_len"] == len(span)
        assert r["sum_span_chars"] == 2 * len(span)

    def test_real_corpus_matches_python_oracle(self, spark):
        from polars_matmul_spark.operators.winnow import (
            shared_span_stats,
            winnow_hash_cap,
        )

        docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
        rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
        cap = winnow_hash_cap(len(rows))  # what "auto" resolves to
        oracle = py_span_stats(rows, self.K, cap)
        got = {
            (r["d1"], r["d2"]): (
                r["n_spans"],
                r["max_span_len"],
                r["sum_span_chars"],
                list(r["span_lengths"]),
            )
            for r in shared_span_stats(docs, k=self.K).collect()
        }
        assert got == oracle
        assert got, "corpus shares no spans — vacuous test"

    def test_duckdb_replay(self, spark):
        from polars_matmul_spark.operators.winnow import shared_span_stats

        k = self.K
        docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
        got = sorted(
            (r["d1"], r["d2"], r["n_spans"], r["max_span_len"],
             r["sum_span_chars"], tuple(r["span_lengths"]))
            for r in shared_span_stats(docs, k=k, max_hash_docs=None).collect()
        )
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
        )
        oracle = sorted(
            (d1, d2, n, mx, tot, tuple(lens))
            for d1, d2, n, mx, tot, lens in con.sql(f"""
WITH d AS (
  SELECT doc_id, text FROM documents WHERE length(text) >= {k}
), idx AS (
  SELECT doc_id, text, unnest(range(1, length(text) - {k} + 2)) AS i
  FROM d
), g AS (
  SELECT doc_id, i - 1 AS pos,
         ('0x' || substr(md5(substr(text, i, {k})), 1, 12))::BIGINT AS h
  FROM idx
), m AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, a.pos AS p1,
         a.pos - b.pos AS diag
  FROM g a JOIN g b ON a.h = b.h AND a.doc_id < b.doc_id
), r AS (
  SELECT d1, d2, diag, p1,
         p1 - row_number() OVER (PARTITION BY d1, d2, diag ORDER BY p1) AS grp
  FROM m
), s AS (
  SELECT d1, d2, diag, grp, CAST(count(*) + {k} - 1 AS INT) AS span_len
  FROM r GROUP BY 1, 2, 3, 4
)
SELECT d1, d2, count(*) AS n_spans, max(span_len) AS max_span_len,
       CAST(sum(span_len) AS BIGINT) AS sum_span_chars,
       list_sort(list(span_len)) AS span_lengths
FROM s GROUP BY d1, d2
""").fetchall()
        )
        assert got == oracle

    def test_plan_no_cartesian_no_global_window(self, spark):
        from polars_matmul_spark.operators.winnow import shared_span_stats

        docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
        plan = (
            shared_span_stats(docs, k=self.K)
            ._jdf.queryExecution()
            .explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "simple"
                )
            )
        )
        assert "CartesianProduct" not in plan
        assert "NestedLoop" not in plan
        # the island window is partitioned by (d1, d2, diag) — its
        # exchange hashes those keys, never a single-partition sort
        assert "Window" in plan
        assert "hashpartitioning(d1" in plan, plan

    def test_validation(self, spark):
        from polars_matmul_spark.operators.winnow import shared_span_stats

        docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
        with pytest.raises(ValueError, match="k must be"):
            shared_span_stats(docs, k=0)


class TestWindowMinimumProperty:
    """Hypothesis: algorithm-independent winnowing invariants checked
    on the SPARK output over random texts (ties, repeats, sub-k and
    short-doc fallback shapes included): every selected (pos, fp) is
    hash-consistent with the text, every length-w window of k-gram
    positions contains a selection, and some selection inside each
    window achieves that window's minimum hash. Unlike the fixed-case
    py_winnow pin above, nothing here replays the selection rule —
    the invariants are the Schleimer et al. §2 definition itself."""

    def test_invariants_on_random_texts(self, spark):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        K, W = 4, 3
        texts = st.lists(
            st.text(alphabet="abc x", min_size=0, max_size=30),
            min_size=1,
            max_size=25,
        )

        @settings(max_examples=5, deadline=None)
        @given(ts=texts)
        def check(ts):
            df = spark.createDataFrame(
                list(enumerate(ts)), "doc_id long, text string"
            )
            got: dict[int, set] = {}
            for r in winnow_fingerprints(df, k=K, window=W).collect():
                got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
            for i, t in enumerate(ts):
                sel = got.get(i, set())
                n = len(t) - K + 1
                if n <= 0:
                    assert not sel  # sub-k docs emit nothing
                    continue
                hs = [_h(t[p : p + K]) for p in range(n)]
                for pos, fp in sel:  # hash-consistency, in-range
                    assert 0 <= pos < n and fp == hs[pos]
                poss = {p for p, _ in sel}
                w = min(W, n)
                for j in range(max(n - w + 1, 1)):
                    win = range(j, j + w)
                    inwin = poss & set(win)
                    assert inwin, (t, j)  # coverage: no empty window
                    mv = min(hs[p] for p in win)
                    assert any(hs[p] == mv for p in inwin), (t, j)

        check()
