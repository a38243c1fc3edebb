"""Empirical scaling probe: how do the dedup/text operators' walls grow
as the corpus multiplies? Near-linear growth is the local evidence that
the plan shapes (postings equi-joins, partial aggs, banding) hold at
cluster scale; quadratic growth would expose an all-pairs plan.

Corpus construction: the sf0.1 documents table replicated K times with
every token salted by the copy index (regexp, scan-side), so copies
share NO shingles — corpus size grows Kx while true near-dup density
stays that of one copy (duplicating verbatim would instead grow the
candidate count quadratically in K by construction, measuring the
data, not the plan).

Usage: python examples/scaling_probe.py  # prints one JSON line per K
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from polars_matmul_spark.operators import dedup as D
    from polars_matmul_spark.operators import text as X
    from polars_matmul_spark.operators.tfidf import tf_idf
    from polars_matmul_spark.plans.session import get_spark
    from polars_matmul_spark.sources.tables import load_table

    spark = get_spark("scaling-probe")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    base = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    n_base = base.count()

    def corpus_x(k: int):
        parts = []
        for i in range(k):
            parts.append(
                base.select(
                    (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                    F.regexp_replace(F.col("text"), r"(\S+)", f"$1_{i}").alias(
                        "text"
                    ),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.cache()

    def timed(fn):
        t0 = time.perf_counter()
        fn()
        return round(time.perf_counter() - t0, 3)

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # events-side probe: replicate events K x with disjoint users/ids so
    # session and window state grows with the data, not with collisions
    events_base = load_table(spark, "events", sf_dir)
    n_events = events_base.count()

    def events_x(k: int):
        parts = []
        for i in range(k):
            parts.append(
                events_base.select(
                    (F.col("event_id") + F.lit(i * 100_000_000)).alias("event_id"),
                    "ts",
                    (F.col("user_id") + F.lit(i * 10_000_000)).alias("user_id"),
                    "event_type",
                    "value",
                    "props",
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.cache()

    def sessionize(ev):
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        gap = (
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        ) > 1800
        return (
            ev.withColumn("__new", F.when(gap, 1).otherwise(0))
            .withColumn("session_seq", F.sum("__new").over(w))
            .groupBy("user_id", "session_seq")
            .agg(F.count("*").alias("n_events"))
        )

    for k in (1, 4, 8):
        ev = events_x(k)
        ev.count()
        row = {"k": k, "n_events": n_events * k}
        force(ev.groupBy(F.window("ts", "1 hour"), "event_type").agg(F.count("*").alias("n")))
        row["hourly_windows"] = timed(
            lambda: force(
                ev.groupBy(F.window("ts", "1 hour"), "event_type").agg(
                    F.count("*").alias("n")
                )
            )
        )
        row["sessionize"] = timed(lambda: force(sessionize(ev)))
        # round-5 event-analytics family: the funnel fold is one
        # user-keyed shuffle; the windowed form's per-user work is
        # bounded by the t0-candidate cap, so both walls must track
        # the event count linearly
        from polars_matmul_spark.operators.funnel import (
            funnel,
            retention_cohorts,
        )

        steps = ["view", "click", "purchase"]
        force(funnel(ev, steps))
        row["funnel"] = timed(lambda: force(funnel(ev, steps)))
        row["funnel_windowed"] = timed(
            lambda: force(funnel(ev, steps, within_seconds=86400))
        )
        row["retention"] = timed(lambda: force(retention_cohorts(ev)))
        print(json.dumps(row))
        ev.unpersist()

    for k in (1, 2, 4, 8):
        docs = corpus_x(k)
        docs.count()  # materialize cache so the probe times the operator
        row = {"k": k, "n_docs": n_base * k}
        force(D.exact_dedup(docs))
        row["exact_dedup"] = timed(lambda: force(D.exact_dedup(docs)))
        force(D.simhash16(docs))
        row["simhash"] = timed(lambda: force(D.simhash16(docs)))
        force(docs.select("doc_id", X.quality_score(F.col("text")).alias("q")))
        row["quality"] = timed(
            lambda: force(
                docs.select("doc_id", X.quality_score(F.col("text")).alias("q"))
            )
        )
        force(D.neardup_pairs_minhash(docs, threshold=0.8))
        row["minhash_lsh"] = timed(
            lambda: force(D.neardup_pairs_minhash(docs, threshold=0.8))
        )
        # round-5: hot-shingle-capped exact jaccard — every posting
        # list bounded at 64 docs, so the candidate join is O(n * cap)
        # even though the UNCAPPED exact form is the quadratic oracle
        force(D.neardup_pairs_exact(docs, threshold=0.5, max_shingle_docs=64))
        row["jaccard_capped"] = timed(
            lambda: force(
                D.neardup_pairs_exact(docs, threshold=0.5, max_shingle_docs=64)
            )
        )
        # round-5: winnowing substring dedup — fingerprint pass is
        # O(total chars), postings join bounded by the hot-hash cap;
        # token salting means copies share no 20-gram spans, so the
        # true pair count grows linearly in K
        from polars_matmul_spark.operators.winnow import winnow_dup_pairs

        # repartition_to pins parallelism across K (the cached probe
        # corpus has K partitions — without it the 1x row measures one
        # core and the growth conflates partition count with plan cost)
        # warm first (the semantic_dedup_pairs lesson below: a cold
        # run in a long-lived probe session pays accumulated-GC and
        # JIT costs that read as phantom superlinearity — one unwarmed
        # k=8 winnow read 47s where three isolated runs read 9-14s)
        force(
            winnow_dup_pairs(
                docs, k=20, window=8, min_shared=2, max_hash_docs=64,
                repartition_to=spark.sparkContext.defaultParallelism,
            )
        )
        row["winnow"] = timed(
            lambda: force(
                winnow_dup_pairs(
                    docs,
                    k=20,
                    window=8,
                    min_shared=2,
                    max_hash_docs=64,
                    repartition_to=spark.sparkContext.defaultParallelism,
                )
            )
        )
        # round-6: exact substring excision — the gram pass is
        # O(total chars) row-local, the frequency count one uniform
        # groupBy; within-copy sharing keeps the frequent-gram table
        # growing linearly in K (same salting argument as the lines)
        from polars_matmul_spark.operators.winnow import excise_duplicate_spans

        exc_docs = docs.repartition(spark.sparkContext.defaultParallelism)
        force(excise_duplicate_spans(exc_docs, k=20))
        row["excise"] = timed(
            lambda: force(excise_duplicate_spans(exc_docs, k=20))
        )
        force(tf_idf(docs))
        row["tfidf"] = timed(lambda: force(tf_idf(docs)))
        # round-4 pipeline families. Token salting preserves WITHIN-copy
        # line sharing (every doc in copy i carries the same _{i}
        # suffixes), so the frequent-line table grows linearly in K —
        # the probe measures the plan, not a vanishing duplicate set.
        from polars_matmul_spark.operators.dsir import dsir_log_weights
        from polars_matmul_spark.operators.linededup import strip_frequent_lines
        from polars_matmul_spark.operators.quality_model import (
            dyadic_weights,
            linear_quality_score,
        )
        from polars_matmul_spark.operators.shards import assign_token_shards

        nl_docs = docs.withColumn("text", F.regexp_replace("text", " ", "\n"))
        force(strip_frequent_lines(nl_docs, min_docs=2))
        row["line_dedup"] = timed(
            lambda: force(strip_frequent_lines(nl_docs, min_docs=2))
        )
        # warm first: the literal-array fold plans pay a one-off
        # whole-stage-codegen compile (seconds, data-independent) that
        # must not contaminate a scaling measurement
        w64 = dyadic_weights(64)
        qm = docs.select(
            "doc_id", linear_quality_score(F.col("text"), w64, 0.1).alias("q")
        )
        force(qm)
        row["quality_model"] = timed(lambda: force(qm))
        # fixed LM constants: the probe measures the weighting plan,
        # not LM fitting (which is corpus-size-independent output)
        lp_a = [-6.0 - (b % 7) * 0.1 for b in range(256)]
        lp_b = [-6.5 - (b % 5) * 0.2 for b in range(256)]
        dw = dsir_log_weights(docs, lp_a, lp_b)
        force(dw)
        row["dsir_weight"] = timed(lambda: force(dw))
        tok_docs = docs.withColumn("n_tokens", X.token_count(F.col("text")))
        force(assign_token_shards(tok_docs, tokens_per_shard=50_000))
        row["token_shards"] = timed(
            lambda: force(assign_token_shards(tok_docs, tokens_per_shard=50_000))
        )
        # bloom: build on half the corpus, probe the other half — both
        # sides grow linearly in K, the bitmap size stays fixed
        from polars_matmul_spark.operators.bloom import build_bloom, probe_bloom

        fps = docs.select(
            "doc_id", X.fingerprint(F.col("text")).alias("fp")
        )
        hist = fps.filter(F.col("doc_id") % 2 == 0)
        newb = fps.filter(F.col("doc_id") % 2 == 1)
        m_bits, kh = 63 * 8192, 5
        force(build_bloom(hist, "fp", m_bits, kh))
        row["bloom_build"] = timed(lambda: force(build_bloom(hist, "fp", m_bits, kh)))
        bloom = build_bloom(hist, "fp", m_bits, kh).cache()
        bloom.count()
        force(probe_bloom(newb, bloom, "fp", m_bits, kh))
        row["bloom_probe"] = timed(
            lambda: force(probe_bloom(newb, bloom, "fp", m_bits, kh))
        )
        bloom.unpersist()
        # round-6: Count-Min sketch — build on half the corpus, look up
        # the other half's line hashes; counter table FIXED at
        # depth x width no matter what K is, so both walls must grow
        # linearly (build: one explode + bounded-key partial agg;
        # lookup: broadcast join)
        from polars_matmul_spark.operators.cms import build_cms, cms_lookup

        cw, cd = 8192, 5
        force(build_cms(hist, "fp", cw, cd))
        row["cms_build"] = timed(lambda: force(build_cms(hist, "fp", cw, cd)))
        cms = build_cms(hist, "fp", cw, cd).cache()
        cms.count()
        force(cms_lookup(newb, cms, "fp", cw, cd))
        row["cms_lookup"] = timed(
            lambda: force(cms_lookup(newb, cms, "fp", cw, cd))
        )
        cms.unpersist()
        # round-6: weighted priority sample — priorities are row-local,
        # the top-k is per-partition heaps + one k-row merge
        # (TakeOrderedAndProject), so the wall tracks the scan
        from polars_matmul_spark.operators.sampling import priority_sample

        wdocs = docs.select("doc_id", F.length("text").alias("w"))
        force(priority_sample(wdocs, "doc_id", 100, "w"))
        row["priority_sample"] = timed(
            lambda: force(priority_sample(wdocs, "doc_id", 100, "w"))
        )
        # round-7: the REAL codec layer — every doc's bytes encoded to
        # a genuine compressed FLAC stream once (cached), then the
        # decode+stats wall timed. Per-asset work is O(samples) with
        # no exchange at all, so the wall must track the asset count
        # linearly; superlinearity would expose accidental shuffles or
        # per-batch quadratic buffering in the mapInPandas stage.
        from polars_matmul_spark.operators.multimodal import (
            decoded_asset_stats,
        )

        def _flac_encode(batches):
            import numpy as _np
            import pandas as _pd

            from polars_matmul_spark.operators.flac import encode_flac

            for pdf in batches:
                payloads = []
                for text in pdf["text"]:
                    b = (text or "??").encode("ascii", "replace")
                    sm = (_np.frombuffer(b, _np.uint8).astype(_np.int64)
                          - 128) * 256
                    payloads.append(encode_flac(sm, 8000, bps=16))
                yield _pd.DataFrame(
                    {"asset_id": pdf["doc_id"], "payload": payloads}
                )

        assets = (
            docs.repartition(spark.sparkContext.defaultParallelism)
            .mapInPandas(_flac_encode, "asset_id long, payload binary")
            .cache()
        )
        assets.count()
        force(decoded_asset_stats(assets))
        row["flac_decode_stats"] = timed(
            lambda: force(decoded_asset_stats(assets))
        )
        assets.unpersist()
        print(json.dumps(row))
        docs.unpersist()

    # round-8: incremental excision vs a GROWING history (the one
    # broadcast envelope the probe had not stressed — round-7 verdict
    # stretch). The BATCH stays fixed (one corpus of base docs, ids
    # offset to stay disjoint from every history copy) while the
    # indexed history grows 1x -> 10x. The batch's distinct gram
    # hashes broadcast into a semi-join scan of the index, so the wall
    # should grow only with the index SCAN (linear, shallow slope) —
    # superlinearity would mean the index is being shuffled, and a
    # blow-up at 10x would mean the broadcast envelope leaks history
    # size. Batch-side work is K-independent by construction.
    from polars_matmul_spark.operators.winnow import (
        build_gram_index,
        excise_new_vs_index,
    )

    batch = base.select(
        (F.col("doc_id") + F.lit(900_000_000)).alias("doc_id"), "text"
    ).cache()
    batch.count()
    for k in (1, 5, 10):
        hist = corpus_x(k)
        hist.count()
        index = build_gram_index(hist, k=20).cache()
        n_index = index.count()  # materialize: probe times the excise
        force(excise_new_vs_index(batch, index, k=20))
        wall = timed(lambda: force(excise_new_vs_index(batch, index, k=20)))
        print(
            json.dumps(
                {
                    "k": k,
                    "n_history_docs": n_base * k,
                    "n_index_grams": n_index,
                    "excise_incremental": wall,
                }
            )
        )
        index.unpersist()
        hist.unpersist()
    batch.unpersist()

    # embeddings-side probe: replicate K x under per-copy Rademacher
    # sign flips — dot(u*s, v*s) == dot(u, v), so WITHIN-copy geometry
    # (and therefore near-dup density) is exactly preserved, while
    # cross-copy cosines scatter around 0 (random relative sign
    # pattern): corpus grows K x, true pair count grows K x (linear),
    # and a super-linear wall would expose an unblocked pass.
    # n_clusters scales with K (the SemDeDup contract: cluster size,
    # not cluster count, is what the within-cluster joins pay for).
    import numpy as np

    from polars_matmul_spark.operators.semdedup import semantic_dedup_pairs

    emb_base = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    n_emb = emb_base.count()
    dim = len(emb_base.select("embedding").first()[0])

    def embeddings_x(k: int):
        rng = np.random.default_rng(13)
        parts = []
        # each copy also plants near-dups of 5% of its rows (small
        # noise, same copy's sign pattern) so the TRUE pair count —
        # and with it the verify join's real work — grows exactly
        # linearly in K
        planted = emb_base.limit(max(n_emb // 20, 1)).select(
            (F.col("vec_id") + F.lit(5_000_000)).alias("vec_id"),
            F.transform(
                F.col("embedding").cast("array<double>"),
                # deterministic pseudo-noise (rand() is not allowed in
                # higher-order lambdas); ~0.08 L2 perturbation on a
                # unit vector -> cosine ~0.997, safely a near-dup
                lambda x: x + F.sin(x * 9973.0) * 0.01,
            ).alias("embedding"),
        )
        per_copy = emb_base.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        ).unionByName(planted)
        for i in range(k):
            signs = rng.choice([-1.0, 1.0], size=dim).tolist()
            s_col = F.array(*[F.lit(s) for s in signs])
            parts.append(
                per_copy.select(
                    (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
                    F.zip_with(
                        F.col("embedding"), s_col, lambda x, s: x * s
                    ).alias("embedding"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.cache()

    for k in (1, 2, 4, 8):
        emb = embeddings_x(k)
        emb.count()
        row = {"k": k, "n_vecs": emb.count()}
        # n_clusters grows with K: constant cluster size keeps the
        # within-cluster join linear; the n_rows x n_clusters
        # assignment term is the asymptotic knob (hierarchical /
        # IVF-style assignment at true cluster scale)
        pairs = semantic_dedup_pairs(emb, threshold=0.95, n_clusters=16 * k)
        # warm first like every other entry: the cold run pays MLlib
        # KMeans JIT + codegen and read 2x the warm wall (and in a
        # long-lived probe session, accumulated GC inflated a cold
        # k=8 run to 52s where two isolated runs read 17-19s)
        force(pairs)
        row["semantic_dedup_pairs"] = timed(lambda: force(pairs))
        row["n_pairs"] = pairs.count()
        # PQ: codebooks fixed (trained once on the base copy — the
        # operator contract), encode + ADC search over the Kx corpus;
        # both walls must grow at most linearly
        from polars_matmul_spark.operators.pq import encode_pq, pq_topk, train_pq

        if k == 1:
            global _PQ_BOOKS
            _PQ_BOOKS = train_pq(
                emb, vec_col="embedding", m=8, n_codes=64, seed=7, max_iter=10
            )
        force(encode_pq(emb, _PQ_BOOKS))
        row["pq_encode"] = timed(lambda: force(encode_pq(emb, _PQ_BOOKS)))
        codes = encode_pq(emb, _PQ_BOOKS).cache()
        codes.count()
        pq_q = emb.limit(20).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        force(pq_topk(pq_q, codes, _PQ_BOOKS, k=10))
        row["pq_search"] = timed(lambda: force(pq_topk(pq_q, codes, _PQ_BOOKS, k=10)))
        codes.unpersist()
        # JL projection: row-local map, wall must grow at most linearly
        # (any superlinear growth would mean the broadcast matrix or the
        # Arrow exchange is being rebuilt per-partition-count)
        from polars_matmul_spark.operators.projection import (
            projected_topk_rerank,
            random_project,
        )

        force(random_project(emb, out_dim=dim // 4, seed=7))
        row["random_project"] = timed(
            lambda: force(random_project(emb, out_dim=dim // 4, seed=7))
        )
        # two-stage JL search: corpus term linear in K (shortlist window
        # over slim rows), queries fixed
        jl_q = emb.limit(20).select(F.col("vec_id").alias("query_id"), "embedding")
        jl_c = emb.select(F.col("vec_id").alias("corpus_id"), "embedding")
        force(projected_topk_rerank(jl_q, jl_c, k=10, out_dim=dim // 4))
        row["projected_topk_rerank"] = timed(
            lambda: force(projected_topk_rerank(jl_q, jl_c, k=10, out_dim=dim // 4))
        )
        # SRP-banded near-dup: training-free LSH — bucket join work is
        # sum(bucket_size^2); with random sign patterns across copies
        # buckets stay uniform, so the wall must grow ~linearly
        from polars_matmul_spark.operators.projection import srp_neardup

        force(srp_neardup(emb, threshold=0.95))
        row["srp_neardup"] = timed(lambda: force(srp_neardup(emb, threshold=0.95)))
        # round-6: hamming top-k over packed SRP signatures — 20 fixed
        # queries broadcast against the Kx signature scan (8 bytes per
        # corpus row); integer distance, per-query window top-k over
        # slim triples: the wall must track the scan linearly
        from polars_matmul_spark.operators.projection import hamming_topk, srp_bits

        sigs = srp_bits(emb, n_bits=48).select("vec_id", "srp_sig").cache()
        sigs.count()
        hq = sigs.limit(20).withColumnRenamed("vec_id", "query_id")
        hc = sigs.withColumnRenamed("vec_id", "corpus_id")
        force(hamming_topk(hq, hc, k=10))
        row["hamming_topk"] = timed(lambda: force(hamming_topk(hq, hc, k=10)))
        sigs.unpersist()
        # round-5: contrastive mining — 20 fixed queries against the
        # Kx corpus; exact scoring is 20 x n pairs (linear in K), and
        # per-query depth means the one heavy-positive query below
        # cannot widen the other 19's retained candidates
        from polars_matmul_spark.operators.mining import hard_negatives

        mq = emb.limit(20).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
        )
        mc = emb.select(
            F.col("vec_id").alias("corpus_id"), F.col("embedding").alias("c_emb")
        )
        first_q = mq.select("query_id").first()[0]
        pos_ids = [r[0] for r in mc.select("corpus_id").limit(50).collect()]
        pos = spark.createDataFrame(
            [(int(first_q), int(c)) for c in pos_ids],
            "query_id long, corpus_id long",
        )
        force(hard_negatives(mq, mc, pos, k=5))
        row["hard_negatives"] = timed(
            lambda: force(hard_negatives(mq, mc, pos, k=5))
        )
        print(json.dumps(row))
        emb.unpersist()

    # --- round-9 second wave: late-interaction MaxSim, blocked path ---
    # 10 fixed query docs (5 vectors each) against a corpus of
    # 5-vector docs grown Kx. The blocked path broadcasts the 50 query
    # vectors, groups the corpus by doc ONCE, computes each doc's full
    # MaxSim in one BLAS batch and shuffles only (q_doc, c_doc, score)
    # scalars — so the wall must track the corpus scan linearly and
    # the declarative exact twin (pair materialization) must agree at
    # K=1 (agreement is pytest-gated; here we pin the SCALING shape).
    from polars_matmul_spark.operators.retrieval import maxsim_topk_blocked

    mv_q = emb_base.filter(F.col("vec_id") < 50).select(
        F.expr("vec_id div 5").cast("long").alias("q_doc"),
        (F.col("vec_id") % 5).cast("long").alias("q_pos"),
        F.col("embedding").cast("array<double>").alias("q_emb"),
    )
    for k in (1, 4, 8):
        emb = embeddings_x(k)
        n_vecs = emb.count()
        mv_c = emb.filter(F.col("vec_id") % 10_000_000 >= 50).select(
            F.expr("vec_id div 5").cast("long").alias("c_doc"),
            F.col("embedding").alias("c_emb"),
        )
        blocked = maxsim_topk_blocked(mv_q, mv_c, k=10)
        force(blocked)
        wall = min(timed(lambda: force(blocked)) for _ in range(2))
        print(
            json.dumps(
                {
                    "leg": "maxsim_blocked_sf_x",
                    "k": k,
                    "n_corpus_vecs": n_vecs,
                    "wall": wall,
                }
            )
        )
        emb.unpersist()

    # --- round-9: mega-domain skew leg for cap_docs_per_domain ---
    # One domain at 0% / 50% / 90% of a 2M-row corpus (50x-18,000x the
    # cap) vs ~20k uniform domains. The wall must NOT grow with the
    # mega-domain's size: row_number() <= k compiles to
    # WindowGroupLimit, whose partition-local top-k bounds what any
    # single domain sends through the exchange to k rows per input
    # partition. Round-9 measurement (best-of-3): frac 0.0 -> 0.92 s,
    # 0.5 -> ~0.8 s, 0.9 -> 0.67 s — the skewed corpus is FASTER
    # (fewer distinct keys to sort), so the documented count-based
    # pre-filter stays retired on this engine.
    from polars_matmul_spark.operators.urls import cap_docs_per_domain

    n_urls = 2_000_000
    for frac in (0.0, 0.5, 0.9):
        cut = int(n_urls * frac)
        urls = (
            spark.range(n_urls)
            .select(
                F.col("id").alias("doc_id"),
                F.concat(
                    F.when(F.col("id") < cut, F.lit("http://mega.com/p"))
                    .otherwise(
                        F.concat(
                            F.lit("http://site"),
                            (F.col("id") % 20_000).cast("string"),
                            F.lit(".com/p"),
                        )
                    ),
                    F.col("id").cast("string"),
                ).alias("url"),
                (F.col("id") % 1000).cast("double").alias("score"),
            )
        )
        capped = cap_docs_per_domain(urls, max_per_domain=100, order_col="score")
        force(capped)  # warm
        wall = min(timed(lambda: force(capped)) for _ in range(3))
        print(
            json.dumps(
                {
                    "leg": "url_domain_cap_skew",
                    "mega_frac": frac,
                    "mega_rows": cut,
                    "wall": round(wall, 3),
                }
            )
        )

    # --- round-10: link-graph PageRank scaling leg ---
    # A synthetic graph grown Kx at CONSTANT average out-degree (5):
    # nodes = 100k*K, each node s emits edges to (s*7 + j*1013 + 1)
    # mod n for j in 0..4 — deterministic, no RNG, hub-free. Each
    # iteration is the two-shuffle slim-table step (edge join +
    # dst-keyed sum), so the wall must track the edge count linearly;
    # superlinear growth would expose plan-depth or lineage blowup
    # (the localCheckpoint-per-iteration exists to prevent exactly
    # that).
    from polars_matmul_spark.operators.linkgraph import pagerank_fixedpoint

    for k in (1, 4, 8):
        n_nodes = 100_000 * k
        edges = (
            spark.range(n_nodes * 5)
            .select(
                (F.col("id") % n_nodes).alias("src_id"),
                (
                    (F.col("id") % n_nodes) * 7
                    + (F.col("id") / n_nodes).cast("long") * 1013
                    + 1
                )
                .cast("long")
                .alias("__t"),
            )
            .select("src_id", (F.col("__t") % n_nodes).alias("dst_id"))
            .cache()
        )
        n_edges = edges.count()
        pr = lambda: force(
            pagerank_fixedpoint(
                edges, "src_id", "dst_id", n_iter=3,
                redistribute_dangling=True,
            )
        )
        pr()  # warm
        wall = min(timed(pr) for _ in range(2))
        print(
            json.dumps(
                {
                    "leg": "pagerank_sf_x",
                    "k": k,
                    "n_nodes": n_nodes,
                    "n_edges": n_edges,
                    "wall": wall,
                }
            )
        )
        edges.unpersist()

    # --- round-12: iterate-until-converged leg (the delta fold) ---
    # pagerank_converged's per-iteration scalar now rides the step's
    # own checkpoint (per-node |Δrank| summed in one pass) instead of
    # a consecutive-rank-tables join job — so its wall at scale must
    # sit within a whisker of the fixed-count run for the same
    # iteration count. tol=0 pins the loop to max_iter iterations,
    # making the two runs the same data-sized work by construction.
    from polars_matmul_spark.operators.linkgraph import pagerank_converged

    k = 4
    n_nodes = 100_000 * k
    edges = (
        spark.range(n_nodes * 5)
        .select(
            (F.col("id") % n_nodes).alias("src_id"),
            (
                (F.col("id") % n_nodes) * 7
                + (F.col("id") / n_nodes).cast("long") * 1013
                + 1
            )
            .cast("long")
            .alias("__t"),
        )
        .select("src_id", (F.col("__t") % n_nodes).alias("dst_id"))
        .cache()
    )
    n_edges = edges.count()

    def prc():
        ranks, _info = pagerank_converged(
            edges, "src_id", "dst_id", max_iter=3, tol_units=0,
        )
        force(ranks)

    prc()  # warm
    wall = min(timed(prc) for _ in range(2))
    print(
        json.dumps(
            {
                "leg": "pagerank_converged_sf_x",
                "k": k,
                "n_nodes": n_nodes,
                "n_edges": n_edges,
                "wall": wall,
            }
        )
    )
    edges.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
