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
        row["minhash_lsh"] = timed(
            lambda: force(D.neardup_pairs_minhash(docs, threshold=0.8))
        )
        row["tfidf"] = timed(lambda: force(tf_idf(docs)))
        print(json.dumps(row))
        docs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
