"""Data Selection with Importance Resampling (DSIR, Xie et al. 2023).

Select raw-corpus documents that "look like" a small target corpus
(e.g. Wikipedia+books) by importance weighting under hashed unigram
language models:

    log w(doc) = sum over tokens t of [log p_target(b(t)) - log p_raw(b(t))]

with b(t) a hashed bucket and add-alpha smoothing, then sample without
replacement via Gumbel top-k. Everything is deterministic:

- bucketing is md5-based (engine-portable, see quality_model.token_bucket);
- the Gumbel noise is a HASH of the row id, not an RNG: u = (md5-bucket
  of the id + 0.5) / 1e6, g = -ln(-ln(u)). Rerunning the pipeline — or
  running it in DuckDB for the driver oracle — reproduces the exact
  selected set, and repartitioning cannot change it.

Scale shape at 100 TB:

1. Two hashed-unigram LMs (target is small by definition; raw is one
   map-side-combinable count agg whose output is exactly ``n_buckets``
   rows — a driver-size table no matter the corpus size).
2. The per-bucket log-ratio table (n_buckets doubles) rides into the
   scoring pass as a plan literal -> scoring is scan-speed Catalyst
   with zero shuffles, like linear_quality_score.
3. Gumbel top-k is TakeOrdered (per-partition heaps + driver merge of
   k-sized lists), NOT a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from polars_matmul_spark.operators.quality_model import token_bucket
from polars_matmul_spark.operators.sampling import hash_bucket
from polars_matmul_spark.operators.text import tokens

__all__ = [
    "hashed_unigram_logprobs",
    "hashed_unigram_logprobs_pair",
    "dsir_log_weights",
    "gumbel_topk_sample",
    "dsir_select",
]

_GUMBEL_BUCKETS = 1_000_000


def hashed_unigram_logprobs(
    df: DataFrame,
    text_col: str = "text",
    n_buckets: int = 1024,
    alpha: float = 1.0,
    salt: str = "",
) -> list[float]:
    """Add-alpha-smoothed log P(bucket) under ``df``'s token stream,
    as a dense length-``n_buckets`` list (the plan-literal form).

    One explode + one count agg; the collected result is ``n_buckets``
    doubles — the documented driver envelope (8 KB at the default D).
    """
    toks = F.filter(tokens(F.col(text_col)), lambda t: t != "")
    counts = (
        df.select(F.explode(toks).alias("tok"))
        .select(token_bucket(F.col("tok"), n_buckets, salt).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    return _dense_logprobs(counts, "c", n_buckets, alpha)


def _dense_logprobs(
    counts: list, c_col: str, n_buckets: int, alpha: float
) -> list[float]:
    import math

    dense = [0] * n_buckets
    for row in counts:
        dense[int(row["bucket"])] = int(row[c_col])
    denom = sum(dense) + alpha * n_buckets
    return [math.log((c + alpha) / denom) for c in dense]


def hashed_unigram_logprobs_pair(
    df: DataFrame,
    target_pred: Column,
    text_col: str = "text",
    n_buckets: int = 1024,
    alpha: float = 1.0,
    salt: str = "",
) -> tuple[list[float], list[float]]:
    """(target_logp, raw_logp) when the target corpus is a SLICE of the
    raw corpus (the common DSIR setup — e.g. the lang='en' rows of the
    same table): one tokenize+explode+agg pass computes both LMs, with
    the target counted via count_if(pred) beside the raw count(*).
    Numerically identical to two :func:`hashed_unigram_logprobs` calls
    on df.filter(pred) and df, at half the scan/tokenize cost — at
    100 TB the tokenize pass IS the job, so fusing the two LM fits
    halves the dominant stage.
    """
    toks = F.filter(tokens(F.col(text_col)), lambda t: t != "")
    counts = (
        df.select(target_pred.alias("__is_t"), F.explode(toks).alias("tok"))
        .select("__is_t", token_bucket(F.col("tok"), n_buckets, salt).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("c_raw"),
            F.count_if(F.col("__is_t")).alias("c_t"),
        )
        .collect()
    )
    return (
        _dense_logprobs(counts, "c_t", n_buckets, alpha),
        _dense_logprobs(counts, "c_raw", n_buckets, alpha),
    )


def dsir_log_weights(
    df: DataFrame,
    target_logp: list[float],
    raw_logp: list[float],
    text_col: str = "text",
    salt: str = "",
) -> DataFrame:
    """Adds ``log_w`` = sum over tokens of (target - raw) bucket
    log-prob. Pure Catalyst: the log-ratio table is an array literal;
    per-token lookup + sum via ``aggregate``. No shuffle, no Python.
    """
    if len(target_logp) != len(raw_logp):
        raise ValueError(
            f"LM size mismatch: target {len(target_logp)} vs raw {len(raw_logp)}"
        )
    n_buckets = len(target_logp)
    ratio = F.array(*[F.lit(float(t - r)) for t, r in zip(target_logp, raw_logp)])
    toks = F.filter(tokens(F.col(text_col)), lambda t: t != "")
    log_w = F.aggregate(
        toks,
        F.lit(0.0),
        lambda acc, t: acc
        + F.element_at(ratio, (token_bucket(t, n_buckets, salt) + 1).cast("int")),
    )
    return df.withColumn("log_w", log_w)


def _gumbel(id_col: Column, salt: str) -> Column:
    """Deterministic standard-Gumbel draw from the row id: invert the
    Gumbel CDF at a hash-uniform u in (0, 1). The +0.5 centers buckets
    so u is never exactly 0 or 1 (both would hit a log singularity)."""
    u = (hash_bucket(id_col, salt).cast("double") + F.lit(0.5)) / F.lit(
        float(_GUMBEL_BUCKETS)
    )
    return -F.log(-F.log(u))


def gumbel_topk_sample(
    df: DataFrame,
    k: int,
    logw_col: str = "log_w",
    id_col: str = "doc_id",
    temperature: float = 1.0,
    salt: str = "gumbel",
) -> DataFrame:
    """Sample ``k`` rows without replacement with P(row) proportional to
    exp(log_w / temperature), via the Gumbel-top-k trick: key =
    log_w/T + Gumbel(id), take the k largest keys.

    Deterministic (hash Gumbel) and partitioning-invariant. The
    ``orderBy(...).limit(k)`` pair compiles to TakeOrderedAndProject —
    per-partition top-k heaps, driver merges #partitions k-row lists;
    no global sort shuffle. Ties (measure-zero under the hash) break
    by id for a total order.
    """
    if temperature <= 0:
        raise ValueError(f"temperature must be positive, got {temperature}")
    keyed = df.withColumn(
        "__key",
        F.col(logw_col) / F.lit(float(temperature)) + _gumbel(F.col(id_col), salt),
    )
    return (
        keyed.orderBy(F.desc("__key"), F.asc(id_col)).limit(k).drop("__key")
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    alpha: float = 1.0,
    salt: str = "",
    temperature: float = 1.0,
) -> DataFrame:
    """End-to-end DSIR: fit both LMs, weight ``raw``, Gumbel-top-k
    select ``k`` documents. Returns the selected rows plus ``log_w``.
    """
    target_lm = hashed_unigram_logprobs(target, text_col, n_buckets, alpha, salt)
    raw_lm = hashed_unigram_logprobs(raw, text_col, n_buckets, alpha, salt)
    weighted = dsir_log_weights(raw, target_lm, raw_lm, text_col, salt)
    return gumbel_topk_sample(weighted, k, "log_w", id_col, temperature)
