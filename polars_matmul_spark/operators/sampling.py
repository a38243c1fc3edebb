"""Deterministic sampling and splitting for training-data pipelines.

`df.sample()` and `randomSplit()` are seed-dependent AND
partitioning-dependent — rerun the pipeline with different file splits
and rows silently migrate between train and validation. At 100 TB the
only sane split is a pure function of each row's identity:

- ``hash_split``        train/val/test by md5 of the id — stable under
                        repartitioning, adding/removing rows never
                        reassigns OTHER rows, no shuffle at all (a
                        narrow filter on top of the scan)
- ``stratified_sample`` per-stratum fractions, same md5 mechanism —
                        engine-portable (any system with md5 reproduces
                        the exact row set; DuckDB-oracle-testable)
- ``top_n_per_key``     deterministic per-key shortlist (e.g. best-N
                        documents per domain by quality score) — window
                        with an explicit total-order tiebreak

md5 over xxhash64: a few ns/row slower, but bit-identical in every
engine (DuckDB, Trino, Flink all have md5; xxhash64 seeds differ).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hash_bucket",
    "hash_split",
    "stratified_sample",
    "top_n_per_key",
    "mixture_sample",
    "priority_sample",
    "reservoir_sample",
]

_BUCKETS = 1_000_000


def hash_bucket(id_col: Column, salt: str = "") -> Column:
    """Uniform bucket in [0, 1e6) from md5 of the id (+ optional salt
    to derive independent splits from the same ids). Uses the first 12
    hex chars (48 bits) — far below the 2^53 exact-integer bound of the
    double that ``conv`` returns."""
    h = F.md5(F.concat(id_col.cast("string"), F.lit(salt)))
    return (F.conv(F.substring(h, 1, 12), 16, 10).cast("long") % _BUCKETS).alias(
        "bucket"
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    salt: str = "",
) -> DataFrame:
    """Adds a ``split`` column ('train'/'val'/...) by consecutive bucket
    ranges. Fractions must sum to <= 1; rows past the total are dropped
    (an implicit subsample when fractions sum below 1).

    Row-local: no shuffle, no state, reproducible from the id alone.
    """
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    b = hash_bucket(F.col(id_col), salt)
    df = df.withColumn("__b", b)
    expr = None
    lo = 0.0
    for name, frac in fractions.items():
        hi = lo + frac
        cond = (F.col("__b") >= int(lo * _BUCKETS)) & (F.col("__b") < int(hi * _BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    return df.withColumn("split", expr).filter(F.col("split").isNotNull()).drop("__b")


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Keep each row iff its bucket falls under its stratum's fraction.

    Unlike ``df.sampleBy`` this is deterministic and partitioning-
    independent; expected (not exact) stratum sizes, like sampleBy.
    Strata not in ``fractions`` use ``default_fraction``.
    """
    thresh = F.lit(int(default_fraction * _BUCKETS))
    for name, frac in fractions.items():
        thresh = F.when(F.col(strata_col) == name, int(frac * _BUCKETS)).otherwise(thresh)
    return df.filter(hash_bucket(F.col(id_col), salt) < thresh)


def top_n_per_key(
    df: DataFrame,
    key_col: str,
    order_col: str,
    n: int,
    id_col: str,
    descending: bool = True,
) -> DataFrame:
    """Best-``n`` rows per key (e.g. highest-quality docs per domain).

    One shuffle on the key; the id tiebreak makes the output a total
    function of the data (no nondeterministic row_number ties). Skewed
    keys are AQE's problem locally; for a pathological hot key, pre-
    aggregate with the salted two-phase pattern in operators/skew.py.
    """
    direction = [
        F.desc(order_col) if descending else F.asc(order_col),
        F.asc(id_col),
    ]
    w = Window.partitionBy(key_col).orderBy(*direction)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def priority_sample(
    df: DataFrame,
    id_col: str,
    k: int,
    weight_col: str | None = None,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sample of exactly ``min(k, n)`` rows
    WITHOUT replacement (Efraimidis & Spirakis 2006): each row gets a
    priority ``ln(u) / w`` with ``u`` a hash-uniform in (0, 1) derived
    from the row id, and the ``k`` largest priorities are the sample —
    the probability a row enters is proportional to its weight, and
    re-running (or repartitioning, or adding unrelated rows) never
    changes an existing row's priority.

    This is what ``df.sample`` / RDD ``takeSample`` cannot give a
    100 TB pipeline: an exactly-``k`` weighted subset that is a pure
    function of row identity (resumable, auditable, engine-portable —
    the md5-derived ``u`` replays anywhere).

    Rows with ``w <= 0`` (or null) are excluded — zero weight means
    zero probability, and E-S priorities are undefined there.

    PRECONDITION: ``id_col`` values must be UNIQUE. Two rows with the
    same id get the identical ``(priority, id)`` sort key, so which
    physical copy survives at the ``k`` boundary is partition/plan
    dependent — exactly the nondeterminism this operator exists to
    remove. Dedup first (or derive a composite id) if ids can repeat
    (round-6 ADVICE).

    Scale shape: priorities are row-local; the top-``k`` compiles to
    ``TakeOrderedAndProject`` — per-partition heaps feeding one
    k-row merge on the driver side of the exchange, never a global
    sort (pinned in the tests). For per-stratum quotas compose with a
    window instead, or call once per stratum.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    # u = (h48 + 0.5) / 2^48: strictly inside (0, 1) so ln(u) is finite
    h = F.conv(
        F.substring(F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 12),
        16,
        10,
    ).cast("double")
    u = (h + F.lit(0.5)) / F.lit(float(1 << 48))
    if weight_col is None:
        pri = F.log(u)
    else:
        w = F.col(weight_col).cast("double")
        df = df.filter(w.isNotNull() & (w > 0))
        pri = F.log(u) / w
    return (
        df.withColumn("__pri", pri)
        .orderBy(F.desc("__pri"), F.asc(id_col))
        .limit(k)
        .drop("__pri")
    )


def reservoir_sample(df: DataFrame, id_col: str, k: int, salt: str = "") -> DataFrame:
    """Uniform sample of exactly ``min(k, n)`` rows without
    replacement — :func:`priority_sample` with unit weights. The
    deterministic replacement for ``rdd.takeSample(False, k)``."""
    return priority_sample(df, id_col, k, weight_col=None, salt=salt)


def mixture_sample(
    sources: dict[str, DataFrame],
    weights: dict[str, float],
    target_rows: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Weighted training mixture over several corpora -> one frame of
    ~``target_rows`` rows tagged (``source``, ``epoch``).

    Each source contributes ``target_rows * weight / sum(weights)``
    expected rows. A source too small for its quota is OVERSAMPLED:
    sampling fraction 2.3 means two full passes (epochs 0, 1) plus a
    0.3 hash-sample third pass — the standard up-weighting of small
    high-quality corpora in a training mix. Every decision is the
    row-identity hash (per-source, per-epoch salt), so the mix is
    deterministic, partitioning-invariant, and each epoch's subsample
    is independent of the others.

    Scale shape: one metadata-only ``count()`` per source up front
    (driver sees #sources scalars); after that, pure row-local filters
    unioned — no shuffle anywhere. All sources must share a schema.
    """
    missing = set(sources) - set(weights)
    if missing:
        raise ValueError(f"sources without a weight: {sorted(missing)}")
    tot_w = float(sum(weights[name] for name in sources))
    if tot_w <= 0:
        raise ValueError("weights must sum to a positive value")
    out = None
    for name, df in sources.items():
        n = df.count()
        if n == 0:
            continue
        frac = (target_rows * weights[name] / tot_w) / n
        full = int(frac)
        parts = [df.withColumn("epoch", F.lit(e)) for e in range(full)]
        rem = frac - full
        if rem > 0:
            part = df.filter(
                hash_bucket(F.col(id_col), f"{salt}:{name}:{full}")
                < int(rem * _BUCKETS)
            ).withColumn("epoch", F.lit(full))
            parts.append(part)
        tagged = parts[0]
        for p in parts[1:]:
            tagged = tagged.unionByName(p)
        tagged = tagged.withColumn("source", F.lit(name))
        out = tagged if out is None else out.unionByName(tagged)
    if out is None:
        raise ValueError("all sources are empty")
    return out
