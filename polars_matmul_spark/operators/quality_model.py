"""Model-based document quality scoring: hashed-token linear classifier.

The heuristic ``quality_score`` (operators/text.py) is the zero-setup
baseline; production pipelines score quality with a LEARNED model — a
linear classifier over hashed bag-of-words features (the fastText /
CCNet-LM recipe). Two halves:

- :func:`linear_quality_score` — apply a weight vector. Pure Catalyst:
  per token, bucket = md5(token) mod D; logit = bias + mean of
  weights[bucket]; score = sigmoid(logit). The weight vector rides
  along as an array literal (D is small — 2^10..2^14 — KBs in the
  plan), so scoring runs at scan speed with ZERO shuffles and zero
  Python. md5 bucketing (not murmur/xxhash) keeps the features
  engine-portable: the DuckDB driver oracle reproduces bucket ids and
  scores bit-for-bit (to the 9-dp float discipline).

- :func:`train_quality_classifier` — fit the weights with MLlib
  LogisticRegression on a labeled sample. Training data is a SAMPLE by
  construction (you label thousands of docs, not 100 TB), so the
  feature matrix is built distributed (explode -> bucket counts ->
  sparse vectors, one shuffle on doc id) and only the D coefficients
  come back to the driver. Mean-pooled counts at train time match the
  mean pooling in the scorer.

At 100 TB the flow is: label ~10^4 docs -> train (seconds) -> score
the full corpus at scan speed with the array-literal scorer -> filter
or stratify on the score. No stage touches the full corpus more than
once.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from polars_matmul_spark.operators.text import tokens

__all__ = [
    "token_bucket",
    "dyadic_weights",
    "linear_quality_logit",
    "linear_quality_score",
    "train_quality_classifier",
]


def dyadic_weights(n_buckets: int, denom_bits: int = 10) -> list[float]:
    """Deterministic pseudo-weights that are DYADIC RATIONALS
    (k / 2^denom_bits with |k| <= 2^(denom_bits-1)): token sums over
    them are exact in double arithmetic in ANY fold order, so logits
    are bit-identical across engines — the float discipline the
    registry row and pipeline rely on. Knuth multiplicative hashing
    spreads the signs/magnitudes."""
    d = 1 << denom_bits
    return [(((b * 2654435761) % d) - d // 2) / d for b in range(n_buckets)]


def token_bucket(tok: Column, n_buckets: int, salt: str = "") -> Column:
    """Hash bucket in [0, n_buckets) from md5 of the token (+salt).

    First 12 hex chars = 48 bits — exact in the double that ``conv``
    returns, and reproducible in any engine with md5 (the same
    mechanism as sampling.hash_bucket; see its docstring for why md5
    beats xxhash64 here).
    """
    h = F.md5(F.concat(tok, F.lit(salt)))
    return F.conv(F.substring(h, 1, 12), 16, 10).cast("long") % n_buckets


def linear_quality_logit(
    col: Column,
    weights: Sequence[float],
    bias: float = 0.0,
    salt: str = "",
) -> Column:
    """bias + mean over tokens of weights[bucket(token)] — the raw
    logit (monotone-equivalent to the sigmoid score for filtering and
    ranking, and — with dyadic weights — bit-exact across engines
    because no transcendental touches it).

    Mean (not sum) pooling: document length must not saturate the
    logit, and mean pooling matches the normalized count features used
    at train time. Empty documents score ``bias``.

    The weight array is a plan literal — Catalyst constant-folds the
    ``element_at`` lookups into the generated code; nothing is joined,
    shuffled, or sent through Python.
    """
    n_buckets = len(weights)
    w = F.array(*[F.lit(float(x)) for x in weights])
    toks = F.filter(tokens(col), lambda t: t != "")
    n = F.size(toks)
    total = F.aggregate(
        toks,
        F.lit(0.0),
        lambda acc, t: acc + F.element_at(w, (token_bucket(t, n_buckets, salt) + 1).cast("int")),
    )
    return F.lit(float(bias)) + F.when(n > 0, total / n).otherwise(F.lit(0.0))


def linear_quality_score(
    col: Column,
    weights: Sequence[float],
    bias: float = 0.0,
    salt: str = "",
) -> Column:
    """Sigmoid of :func:`linear_quality_logit` — the probability-shaped
    form (use the logit directly where cross-engine bit-exactness
    matters; exp is the one engine-variant step)."""
    logit = linear_quality_logit(col, weights, bias, salt)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))


def _bucket_count_vectors(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    n_buckets: int,
    salt: str,
) -> DataFrame:
    """(id, label, features) with features = normalized bucket-count
    vector. Built distributed and fully JVM-side: explode tokens ->
    (doc, bucket) counts (one uniform-key shuffle) -> per-doc dense
    assembly via a bucket->count map + ``array_to_vector``. The dense
    materialization is O(n_buckets) per TRAINING row — fine by
    construction, since the labeled set is a sample (~10^4 docs), never
    the corpus.
    """
    from pyspark.ml.functions import array_to_vector

    toks = F.filter(tokens(F.col(text_col)), lambda t: t != "")
    ex = df.select(
        F.col(id_col).alias("__id"),
        F.col(label_col).cast("double").alias("label"),
        F.explode(toks).alias("tok"),
    ).withColumn("bucket", token_bucket(F.col("tok"), n_buckets, salt))
    counts = ex.groupBy("__id", "label", "bucket").agg(F.count("*").alias("c"))
    per_doc = counts.groupBy("__id", "label").agg(
        F.sum("c").alias("n_toks"),
        F.map_from_entries(F.collect_list(F.struct("bucket", "c"))).alias("bc"),
    )
    dense = F.transform(
        F.sequence(F.lit(0).cast("long"), F.lit(n_buckets - 1).cast("long")),
        # try_element_at: NULL (not an ANSI error) on absent buckets
        lambda i: F.coalesce(F.try_element_at(F.col("bc"), i), F.lit(0)).cast(
            "double"
        )
        / F.col("n_toks"),
    )
    return per_doc.select(
        "__id", "label", array_to_vector(dense).alias("features")
    )


def train_quality_classifier(
    df: DataFrame,
    label_col: str = "label",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    salt: str = "",
    reg_param: float = 1e-3,
    max_iter: int = 50,
) -> tuple[list[float], float]:
    """Fit logistic regression over hashed-token mean-count features;
    returns (weights, bias) ready for :func:`linear_quality_score`.

    ``label_col`` is 1.0 for high-quality docs, 0.0 for low. The
    returned weight list has exactly ``n_buckets`` entries; feed it and
    the same ``salt`` to the scorer — bucket ids then agree by
    construction. standardization=False so the coefficients apply
    directly to the raw mean-count features the scorer computes.
    """
    from pyspark.ml.classification import LogisticRegression

    train = _bucket_count_vectors(df, id_col, text_col, label_col, n_buckets, salt)
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        regParam=reg_param,
        maxIter=max_iter,
        standardization=False,
    )
    model = lr.fit(train)
    return [float(x) for x in model.coefficients.toArray()], float(model.intercept)
