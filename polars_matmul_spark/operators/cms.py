"""Distributed Count-Min sketch — the mergeable frequency summary.

The Bloom module (operators/bloom.py) answers "have we seen this key"
in bounded space; this module answers "ABOUT HOW OFTEN have we seen
it". At 100 TB the exact answer (groupBy key) costs a shuffle over the
full key space and a result as big as the distinct-key count — fine
for heavy hitters (operators/profile.py::frequent_items), unusable as
a persisted per-key frequency service over billions of keys. A
Count-Min sketch (Cormode & Muthukrishnan 2005) caps the summary at
``depth x width`` counters with a one-sided guarantee:

    true_count <= estimate <= true_count + eps * N
                   (upper bound holding with prob >= 1 - delta,
                    width = ceil(e / eps), depth = ceil(ln 1/delta))

Spark-first shape, mirroring the Bloom design:

- the sketch IS a DataFrame: (row, col, n) — one row per NON-ZERO
  counter (probes treat absent counters as zero), at most
  depth * width rows no matter how large the corpus. It persists like
  any table.
- build: per key, ``depth`` counter positions from two md5-derived
  48-bit hashes via double hashing h1 + r*h2 (the bloom module's
  Kirsch-Mitzenmacher scheme) -> explode -> ONE groupBy over at most
  depth*width uniform keys, map-side combinable — the same
  partial-agg shuffle shape as build_bloom.
- merge: counters add, so sketches built with the same (width, depth)
  merge by union -> groupBy -> sum. This is what makes the sketch a
  STREAMING artifact: each micro-batch builds its own tiny sketch and
  folds it into the persisted one; history is never re-scanned.
- lookup: each probe key re-derives its depth positions, broadcast-
  joins the counter table and takes the MIN across rows. The sketch
  never shuffles.

Determinism: md5-based like bloom — no engine-private seeds, so a
DuckDB oracle replays the ENTIRE counter table bit-for-bit
(tests/test_cms.py::test_sketch_replays_in_duckdb).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_matmul_spark.operators.bloom import _h1h2

__all__ = ["cms_params", "build_cms", "merge_cms", "cms_lookup"]


def cms_params(eps: float, delta: float = 0.01) -> tuple[int, int]:
    """(width, depth) for additive error <= ``eps * N`` with
    probability >= 1 - ``delta``: width = ceil(e/eps),
    depth = ceil(ln(1/delta))."""
    if not (0.0 < eps < 1.0):
        raise ValueError(f"eps must be in (0, 1), got {eps}")
    if not (0.0 < delta < 1.0):
        raise ValueError(f"delta must be in (0, 1), got {delta}")
    return int(math.ceil(math.e / eps)), max(1, int(math.ceil(math.log(1.0 / delta))))


def _probes(value_col, width: int, depth: int):
    """(row, col) probe positions: col_r = (h1 + r*h2) mod width."""
    h1, h2 = _h1h2(value_col)
    return F.transform(
        F.sequence(F.lit(0).cast("long"), F.lit(depth - 1).cast("long")),
        lambda r: F.struct(
            r.alias("row"), F.pmod(h1 + r * h2, F.lit(width)).alias("col")
        ),
    )


def build_cms(
    df: DataFrame,
    value_col: str,
    width: int,
    depth: int,
    weight_col: str | None = None,
) -> DataFrame:
    """Aggregate ``df[value_col]`` occurrences (or ``weight_col``
    sums — e.g. token counts per document) into the counter table
    (row long, col long, n long). One explode (depth rows per input)
    + one groupBy over at most depth*width uniform keys — map-side
    combinable, output bounded by the sketch dimensions."""
    if width <= 0 or depth <= 0:
        raise ValueError(f"width and depth must be positive, got {width}x{depth}")
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    probes = df.select(
        F.explode(_probes(F.col(value_col), width, depth)).alias("p"),
        w.alias("__w"),
    )
    return (
        probes.select(F.col("p.row").alias("row"), F.col("p.col").alias("col"), "__w")
        .groupBy("row", "col")
        .agg(F.sum("__w").alias("n"))
    )


def merge_cms(*sketches: DataFrame) -> DataFrame:
    """Fold sketches built with the SAME (width, depth) into one:
    counters add, so merge(build(A), build(B)) == build(A union B)
    exactly (pinned in the tests). This is the incremental/streaming
    contract — per-batch sketches union into the persisted one."""
    if not sketches:
        raise ValueError("merge_cms needs at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "col").agg(F.sum("n").alias("n"))


def cms_lookup(
    keys_df: DataFrame,
    cms: DataFrame,
    value_col: str,
    width: int,
    depth: int,
    broadcast: bool = True,
) -> DataFrame:
    """Adds ``est_count``: min over the key's depth counters —
    >= the true count always, <= true + eps*N with prob 1 - delta.

    Plan: explode the probe positions, broadcast-join the counter
    table (bounded MBs by construction), min per key. The sketch
    never shuffles; the probe side shuffles only (key, row, col)
    triples for its final min. A sketch sized via ``cms_params`` with
    a very small eps/delta can outgrow the broadcast budget — pass
    ``broadcast=False`` to fall back to a shuffle join (the
    ``broadcast_frequent``/``broadcast_probe`` escape hatch the
    sibling operators expose; round-6 ADVICE).
    """
    _maybe_bcast = F.broadcast if broadcast else (lambda d: d)
    probes = keys_df.select(F.col(value_col).alias("__v")).distinct().select(
        "__v", F.explode(_probes(F.col("__v"), width, depth)).alias("p")
    )
    est = (
        probes.join(
            _maybe_bcast(cms),
            (F.col("p.row") == F.col("row")) & (F.col("p.col") == F.col("col")),
            "left",
        )
        .select("__v", F.coalesce(F.col("n"), F.lit(0)).alias("__c"))
        .groupBy("__v")
        .agg(F.min("__c").alias("est_count"))
    )
    return keys_df.join(
        est.withColumnRenamed("__v", value_col), value_col, "left"
    ).withColumn("est_count", F.coalesce(F.col("est_count"), F.lit(0)))
