"""Sequence packing: bin documents into fixed token budgets.

Training pipelines concatenate documents into fixed-length sequences
(e.g. 2048 tokens); packing efficiency = fraction of the budget filled
with real tokens. Optimal bin packing is NP-hard and inherently
serial — the scalable form is partition-local greedy packing:

1. one narrow pass computes token counts (JVM-side, operators/text.py);
2. ``repartition(shuffle key)`` spreads docs so each partition packs
   independently (any key works; pack quality is insensitive to which
   docs co-locate because greedy first-fit-decreasing inside a
   partition already achieves ~90+% fill at realistic length mixes);
3. ``mapInPandas`` runs first-fit-decreasing PER PARTITION — the only
   imperative step, O(n log n) per partition, zero cross-partition
   coordination;
4. bin ids are made globally unique by prefixing the Spark partition id.

Docs longer than the budget get a bin of their own and are flagged
(the caller truncates or splits them upstream).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pack_sequences", "materialize_bins"]

_SCHEMA = (
    "bin_id long, doc_id long, n_tokens long, bin_fill long, oversize boolean"
)


def _pack_partition(budget: int):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(batches), ignore_index=True)
        if pdf.empty:
            yield pd.DataFrame(
                {
                    "bin_id": pd.Series(dtype="int64"),
                    "doc_id": pd.Series(dtype="int64"),
                    "n_tokens": pd.Series(dtype="int64"),
                    "bin_fill": pd.Series(dtype="int64"),
                    "oversize": pd.Series(dtype="bool"),
                }
            )
            return
        part = int(pdf["__pid"].iloc[0])
        pdf = pdf.sort_values("n_tokens", ascending=False, kind="stable")
        # first-fit-decreasing over open bins; bins close once no doc fits
        bins: list[tuple[int, int]] = []  # (local_bin_idx, remaining)
        assign: list[int] = []
        fills: dict[int, int] = {}
        next_idx = 0
        for n in pdf["n_tokens"]:
            n = int(n)
            placed = None
            if n <= budget:
                for i, (idx, rem) in enumerate(bins):
                    if n <= rem:
                        bins[i] = (idx, rem - n)
                        placed = idx
                        break
            if placed is None:
                placed = next_idx
                next_idx += 1
                if n <= budget:
                    bins.append((placed, budget - n))
                # oversize docs: closed single-doc bin, never reopened
            assign.append(placed)
            fills[placed] = fills.get(placed, 0) + n
        local = pd.DataFrame(
            {
                "bin_id": [part * 10_000_000 + a for a in assign],
                "doc_id": pdf["doc_id"].astype("int64").to_numpy(),
                "n_tokens": pdf["n_tokens"].astype("int64").to_numpy(),
            }
        )
        local["bin_fill"] = local["bin_id"].map(
            {part * 10_000_000 + i: f for i, f in fills.items()}
        ).astype("int64")
        local["oversize"] = local["n_tokens"] > budget
        yield local

    return run


def pack_sequences(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    partitions: int | None = None,
) -> DataFrame:
    """(bin_id, doc_id, n_tokens, bin_fill, oversize) — every doc
    assigned to exactly one bin, no bin over ``budget`` (except
    single-doc oversize bins, flagged).

    Input needs an id and a token count; compute counts with
    operators/text.token_count first (kept separate so the count pass
    stays pure Catalyst). The repartition is the ONLY shuffle and it
    carries just (id, n_tokens) — pack 10^11 docs with a 16-byte row,
    not the document bodies; join bodies back by doc_id afterwards.
    """
    slim = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
    )
    if partitions:
        slim = slim.repartition(partitions, "doc_id")
    else:
        slim = slim.repartition("doc_id")
    slim = slim.withColumn("__pid", F.spark_partition_id())
    return slim.mapInPandas(_pack_partition(budget), _SCHEMA)


def materialize_bins(
    assignments: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
) -> DataFrame:
    """Turn pack assignments into physical training sequences:
    (bin_id, n_seqs, bin_fill, oversize, text) — each bin's documents
    concatenated in ascending doc-id order with ``sep``.

    This is the step that finally moves the document BODIES, and it is
    exactly two shuffles of them: one id-keyed join against the slim
    assignment table (broadcast if the batch is small — AQE decides),
    one bin-keyed agg. The in-bin order is pinned (doc_id ASC) so the
    emitted sequence bytes are a deterministic function of the
    assignment, and ``sort_array(collect_list(struct(..)))`` sorts
    executor-side — no window, no per-group Python.
    """
    bodies = docs.select(
        F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("__text")
    )
    joined = assignments.join(bodies, "doc_id")
    return (
        joined.groupBy("bin_id")
        .agg(
            F.count("*").alias("n_seqs"),
            F.first("bin_fill").alias("bin_fill"),
            F.max("oversize").alias("oversize"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("doc_id", "__text"))),
                    lambda s: s["__text"],
                ),
                sep,
            ).alias("text"),
        )
    )
