"""Deduplication family for document tables at scale.

Four strategies, all shuffle-conscious:

- ``exact_dedup``            hash-groupBy on a content fingerprint;
                             one shuffle on the hash, trivially skew-free
- ``neardup_pairs_exact``    n-gram Jaccard via shingle equi-join —
                             exact, O(sum of postings^2 per shingle);
                             the oracle/ground-truth form
- ``neardup_pairs_minhash``  MinHash + LSH banding: candidates come
                             from an equi-join on (band, band_hash) —
                             at 100 TB this is the only viable exact-
                             verified near-dup join (candidate count
                             scales with true-duplicate density, not
                             with n^2); generous default banding
                             (64 perms, 32 bands x 2 rows) gives
                             recall ~1 - 1e-14 at jaccard >= 0.8
- ``simhash16``              16-bit SimHash fingerprints (md5-nibble
                             based, engine-portable); hamming-close
                             fingerprints = near-dups

Everything is pure DataFrame/SQL — no Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from polars_matmul_spark.operators.text import fingerprint, shingles, tokens

__all__ = [
    "exact_dedup",
    "shingled",
    "neardup_pairs_exact",
    "neardup_pairs_minhash",
    "build_minhash_bands",
    "neardup_new_vs_index",
    "simhash16",
    "dedup_groups",
    "keep_canonical",
    "dedup_report",
]


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group by content fingerprint; keep the lowest id per group.

    Returns (keep_id, n_dups, content_hash). One hash-partitioned
    shuffle; md5 keys are uniform so no skew handling needed.
    """
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_dups"))
        .select("keep_id", "n_dups", "content_hash")
    )


def shingled(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """(id, shingles array) with distinct word n-grams; drops docs with
    fewer than n tokens (no shingles -> cannot match anything).

    The filter runs on the cheap token-count condition BEFORE the
    shingle projection — filtering on the computed column would make
    Catalyst evaluate the whole shingle expression twice per row
    (once in Filter, once in Project).
    """
    toks = tokens(F.col(text_col))
    return df.filter(F.size(toks) >= n).select(
        F.col(id_col), shingles(toks, n).alias("shingles")
    )


def neardup_pairs_exact(
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_shingle_docs: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard pairs via the shingle postings join.

    Candidate pairs = docs sharing >= 1 shingle (any pair with
    jaccard > 0 appears). The intersection count comes from the join
    group-by; union = n1 + n2 - inter. Hot shingles (stopword n-grams)
    are the skew risk at scale — AQE skew-join handles moderate cases.

    ``max_shingle_docs`` is the implemented cap beyond that: shingles
    whose document frequency exceeds it are dropped from CANDIDATE
    GENERATION only (one map-side-combinable doc-frequency pass, hot
    set broadcast into a left-anti join), bounding every posting list
    — a shingle in at most N docs generates at most N^2/2 candidate
    rows, so no single stopword n-gram can go quadratic. Verification
    then recomputes the intersection from the FULL shingle arrays
    (``array_intersect``), so every emitted jaccard is still the true
    uncapped jaccard; the only approximation is a MISSED pair whose
    shared shingles are ALL hotter than the cap — such a pair's
    similarity lives entirely in ubiquitous boilerplate, exactly the
    pairs a boilerplate-stripping pass (linededup) removes anyway.
    Pairs-at-threshold equality with a stopword-heavy shingle planted
    is pinned in tests/test_datapipe_ops.py.
    """
    sh = shingled(df, text_col, id_col, n).cache()
    ex = sh.select(F.col(id_col), F.explode("shingles").alias("s"))
    post = ex
    if max_shingle_docs is not None:
        hot = (
            ex.groupBy("s")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") > max_shingle_docs)
            .select("s")
        )
        post = ex.join(F.broadcast(hot), "s", "left_anti")
    a = post.alias("a")
    # shuffle-hash beats sort-merge here 3.7x: postings are uniformly
    # hashed strings with bounded per-key frequency — hashing skips the
    # sort of both exploded sides
    b = post.hint("shuffle_hash").alias("b")
    joined = a.join(
        b,
        (F.col("a.s") == F.col("b.s"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    if max_shingle_docs is None:
        pairs = joined.groupBy(
            F.col(f"a.{id_col}").alias("d1"), F.col(f"b.{id_col}").alias("d2")
        ).agg(F.count("*").alias("inter"))
        sizes = sh.select(F.col(id_col), F.size("shingles").alias("n_sh"))
        out = (
            pairs.join(sizes.withColumnRenamed(id_col, "d1").withColumnRenamed("n_sh", "n1"), "d1")
            .join(sizes.withColumnRenamed(id_col, "d2").withColumnRenamed("n_sh", "n2"), "d2")
            .withColumn(
                "jaccard",
                F.col("inter").cast("double") / (F.col("n1") + F.col("n2") - F.col("inter")),
            )
            .filter(F.col("jaccard") >= threshold)
        )
        return out.select("d1", "d2", "jaccard")
    # capped postings undercount shared-HOT-shingle intersections.
    # The capped join itself already counts every shared COLD shingle
    # exactly (postings are distinct per doc), so the true intersection
    # is that count PLUS the pair's hot-shingle overlap — and the hot
    # correction only needs each doc's HOT-ONLY shingle array, which is
    # bounded by the (small, broadcast) hot set. The first version of
    # this branch instead re-joined the FULL shingle arrays onto every
    # candidate pair: candidates x ~KB arrays made the verify shuffle
    # grow into spill territory on templated corpora (the scaling
    # probe measured 7 -> 187 s over 1x -> 8x — superlinear from spill,
    # not candidate count). Emitted jaccards are identical either way:
    # the true uncapped values.
    inter_cold = joined.groupBy(
        F.col(f"a.{id_col}").alias("d1"), F.col(f"b.{id_col}").alias("d2")
    ).agg(F.count("*").alias("__ic"))
    hot_by_doc = (
        ex.join(F.broadcast(hot), "s", "left_semi")
        .groupBy(id_col)
        .agg(F.collect_list("s").alias("__hot_sh"))
    )
    sizes = sh.select(F.col(id_col), F.size("shingles").alias("__n"))
    empty = F.array().cast("array<string>")
    h1 = hot_by_doc.select(
        F.col(id_col).alias("d1"), F.col("__hot_sh").alias("__h1")
    )
    h2 = hot_by_doc.select(
        F.col(id_col).alias("d2"), F.col("__hot_sh").alias("__h2")
    )
    n1 = sizes.select(F.col(id_col).alias("d1"), F.col("__n").alias("__n1"))
    n2 = sizes.select(F.col(id_col).alias("d2"), F.col("__n").alias("__n2"))
    out = (
        inter_cold.join(h1, "d1", "left")
        .join(h2, "d2", "left")
        .join(n1, "d1")
        .join(n2, "d2")
        .withColumn(
            "inter",
            F.col("__ic")
            + F.size(
                F.array_intersect(
                    F.coalesce("__h1", empty), F.coalesce("__h2", empty)
                )
            ),
        )
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("__n1") + F.col("__n2") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("d1", "d2", "jaccard")


# Affine permutation family over GF(P), P = 2^31 - 1 (Mersenne prime):
# h_p(x) = (a_p * x + b_p) mod P applied to ONE base hash per shingle.
# vs. hashing the shingle STRING once per permutation, this is 64 long
# mult/adds instead of 64 string hashes per shingle — the string is
# hashed once. a_p in [1, P-1], b_p in [0, P-1], fixed seed so every
# run (and the nested/flat form pair) produces identical signatures.
# Operands stay < 2^31, products < 2^62: no overflow under ANSI mode.
_MINHASH_P = 2_147_483_647


def _affine_coeffs(num_perm: int) -> tuple[list[int], list[int]]:
    import numpy as _np

    rng = _np.random.default_rng(8191)
    a = (1 + rng.integers(0, _MINHASH_P - 1, size=num_perm)).tolist()
    b = rng.integers(0, _MINHASH_P, size=num_perm).tolist()
    return [int(x) for x in a], [int(x) for x in b]


def _minhash_signature(shingle_col, num_perm: int = 64):
    """MinHash signature as an array column: per permutation p, min
    over shingles of the affine-permuted base hash. Nested higher-order
    form — kept for API/testing parity, but an order of magnitude
    slower than the explode+agg form below (Catalyst does not codegen
    nested lambdas); the LSH pipeline uses ``_minhash_signature_flat``."""
    a, b = _affine_coeffs(num_perm)
    a_arr = F.array(*[F.lit(x) for x in a])
    b_arr = F.array(*[F.lit(x) for x in b])
    base = F.transform(shingle_col, lambda s: F.pmod(F.xxhash64(s), F.lit(_MINHASH_P)))
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_perm - 1)),
        lambda p: F.array_min(
            F.transform(
                base,
                lambda h: (F.element_at(a_arr, p + 1) * h + F.element_at(b_arr, p + 1))
                % _MINHASH_P,
            )
        ),
    )


def _minhash_signature_flat(sh: DataFrame, id_col: str, num_perm: int) -> DataFrame:
    """Same signature, flat plan: explode shingles, hash each shingle
    ONCE, then ``num_perm`` ``min((a_p*h + b_p) % P)`` aggregates —
    whole-stage codegen plus map-side partial aggregation (the shuffle
    carries one row per doc, not one per shingle). Verified
    bit-identical to the array form."""
    a, b = _affine_coeffs(num_perm)
    ex = sh.select(id_col, F.explode("shingles").alias("__s")).select(
        id_col, F.pmod(F.xxhash64(F.col("__s")), F.lit(_MINHASH_P)).alias("__h")
    )
    return ex.groupBy(id_col).agg(
        *[
            F.min((F.lit(a[p]) * F.col("__h") + F.lit(b[p])) % _MINHASH_P).alias(f"__m{p}")
            for p in range(num_perm)
        ]
    )


def _band_table(sig: DataFrame, id_col: str, num_perm: int, bands: int) -> DataFrame:
    """(id, band_idx, band_hash) from a flat signature frame — the LSH
    bucketing key. This IS the persistable dedup index: one row per
    (doc, band), equi-joinable by any later batch."""
    rows = num_perm // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.xxhash64(*[F.col(f"__m{b * rows + r}") for r in range(rows)]).alias(
                    "band_hash"
                ),
            )
            for b in range(bands)
        ]
    )
    return sig.select(F.col(id_col), F.explode(band_structs).alias("bd")).select(
        F.col(id_col), F.col("bd.band_idx"), F.col("bd.band_hash")
    )


def build_minhash_bands(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 64,
    bands: int = 32,
) -> DataFrame:
    """The persistable MinHash-LSH index for a corpus: (doc_id,
    band_idx, band_hash). Write this once (partitioned by band_hash
    range or bucketed) and every future increment dedups against it
    without touching the corpus text — see
    :func:`neardup_new_vs_index`.

    The LSH params are stamped into ``band_idx``'s column metadata
    (survives parquet round-trips and checkpoints) so a consumer that
    takes a precomputed table (:func:`neardup_pairs_minhash`) can
    fail loudly on a param drift instead of silently losing candidate
    recall."""
    sh = shingled(df, text_col, id_col, n)
    sig = _minhash_signature_flat(sh, id_col, num_perm)
    bt = _band_table(sig, id_col, num_perm, bands)
    return bt.select(
        id_col,
        F.col("band_idx").alias(
            "band_idx",
            metadata={
                "minhash_params": {"n": n, "num_perm": num_perm,
                                   "bands": bands}
            },
        ),
        "band_hash",
    )


def neardup_pairs_minhash(
    df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 64,
    bands: int = 32,
    band_table: DataFrame | None = None,
) -> DataFrame:
    """MinHash + LSH banding, exact-verified.

    Pipeline: shingle -> 64-perm signature -> 32 bands of 2 rows ->
    equi-join on (band_idx, band_hash) -> distinct candidate pairs ->
    exact Jaccard verify >= threshold.

    With b=32, r=2: P(miss | jaccard=s) = (1 - s^2)^32; at s=0.8 that
    is ~6e-15 — the exact-verified output equals the exact all-pairs
    answer with near-certainty, while the join only ever touches
    hash-colliding docs (the 100 TB property).

    ``band_table``: a precomputed :func:`build_minhash_bands` result
    for ``df`` (SAME n/num_perm/bands). The per-doc band table is
    deterministic, so a caller that needs it anyway — the ingest loop
    persists novel docs' bands as its index — passes it here and the
    signature pass runs ONCE instead of twice. Shingles are still
    computed (the exact verify needs them), but the num_perm-way
    min-hash fold is the dominant cost. The table's stamped
    ``minhash_params`` metadata (written by :func:`build_minhash_bands`)
    is validated against this call's n/num_perm/bands — a drifted
    caller fails loudly instead of silently losing candidate recall
    (the exact verify only removes false positives; it cannot restore
    pairs a mismatched banding never surfaced).
    """
    sh = shingled(df, text_col, id_col, n).cache()
    if band_table is not None:
        _check_band_params(band_table, n, num_perm, bands)
        banded = band_table
    else:
        sig = _minhash_signature_flat(sh, id_col, num_perm)
        # the band table feeds BOTH sides of the candidate self-join;
        # pin it (lazy localCheckpoint, the semdedup/srp discipline) so
        # the num_perm-way min-hash fold — the dominant cost of the
        # whole pair search — runs once, not once per join side
        banded = _band_table(sig, id_col, num_perm, bands).localCheckpoint(
            eager=False
        )
    a = banded.alias("a")
    b = banded.hint("shuffle_hash").alias("b")  # same win as the postings join
    cands = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("d1"), F.col(f"b.{id_col}").alias("d2"))
        .distinct()
    )
    sh1 = sh.select(F.col(id_col).alias("d1"), F.col("shingles").alias("sh1"))
    sh2 = sh.select(F.col(id_col).alias("d2"), F.col("shingles").alias("sh2"))
    verified = (
        cands.join(sh1, "d1")
        .join(sh2, "d2")
        .withColumn("inter", F.size(F.array_intersect("sh1", "sh2")))
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.size("sh1") + F.size("sh2") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("d1", "d2", "jaccard")


def _check_band_params(
    table: DataFrame, n: int, num_perm: int, bands: int
) -> None:
    """Validate a band table's stamped ``minhash_params`` metadata
    (written by :func:`build_minhash_bands`; survives parquet and
    checkpoints) against a consumer's n/num_perm/bands — a drifted
    caller fails loudly instead of silently losing candidate recall
    (band joins on mismatched banding surface few/no collisions, and
    the exact verify can only REMOVE pairs). Tables without the stamp
    (user-built) pass unchecked — a documented best-effort guard."""
    if "band_idx" not in table.columns:
        return
    got = dict(table.schema["band_idx"].metadata or {}).get(
        "minhash_params"
    )
    want = {"n": n, "num_perm": num_perm, "bands": bands}
    if got is not None and dict(got) != want:
        raise ValueError(
            "band table LSH params drifted: table was built with"
            f" {dict(got)}, this call expects {want} — rebuild the"
            " table or pass matching n/num_perm/bands"
        )


def neardup_new_vs_index(
    new_df: DataFrame,
    index_bands: DataFrame,
    corpus_df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 64,
    bands: int = 32,
    new_bands: DataFrame | None = None,
) -> DataFrame:
    """Incremental near-dup: which NEW docs duplicate the already-
    indexed corpus -> (new_id, old_id, jaccard).

    The 100 TB ingestion story: the corpus's band table
    (:func:`build_minhash_bands`, one 24-byte row per doc-band) is
    persisted once; each arriving batch is shingled/signed/banded and
    joined against it. ``new_df`` (a daily increment) is small relative
    to the index, so its band table BROADCASTS — the TB-scale index is
    scanned map-side, never shuffled. Exact-verify then recomputes
    shingles for only the candidate old docs: the candidate id list
    broadcasts into a hash join against the corpus, so the corpus text
    is read once and only matching rows carry shingles into the join.

    ``new_df`` and the index must have disjoint ids (new ids not yet
    indexed); band parameters must match the ones the index was built
    with — validated against the index's stamped ``minhash_params``
    metadata when present (:func:`_check_band_params`).

    ``new_bands``: a precomputed :func:`build_minhash_bands` result
    covering ``new_df``'s ids (a doc's bands are independent of every
    other doc, so a FILTER of a larger batch's table is exact) — the
    ingest loop already holds one, and passing it here skips this
    call's own ``num_perm``-way signature fold. Validated against the
    stamped ``minhash_params`` like the index side.
    """
    _check_band_params(index_bands, n, num_perm, bands)
    if new_bands is None:
        new_bands = build_minhash_bands(
            new_df, text_col, id_col, n, num_perm, bands
        )
    else:
        _check_band_params(new_bands, n, num_perm, bands)
    ix = index_bands.alias("ix")
    nw = F.broadcast(new_bands).alias("nw")
    cands = (
        ix.join(
            nw,
            (F.col("ix.band_idx") == F.col("nw.band_idx"))
            & (F.col("ix.band_hash") == F.col("nw.band_hash")),
        )
        .select(
            F.col(f"nw.{id_col}").alias("new_id"),
            F.col(f"ix.{id_col}").alias("old_id"),
        )
        .distinct()
    )
    new_sh = shingled(new_df, text_col, id_col, n).select(
        F.col(id_col).alias("new_id"), F.col("shingles").alias("sh_new")
    )
    # candidate ids broadcast INTO the corpus scan (map-side hash
    # semi-filter) so only matching rows ever compute/carry shingles —
    # the corpus is never shuffled in full
    cand_ids = cands.select("old_id").distinct()
    old_sh = (
        corpus_df.join(
            F.broadcast(cand_ids), corpus_df[id_col] == cand_ids["old_id"], "semi"
        )
        .transform(lambda d: shingled(d, text_col, id_col, n))
        .select(F.col(id_col).alias("old_id"), F.col("shingles").alias("sh_old"))
    )
    verified = (
        cands.join(F.broadcast(new_sh), "new_id")
        .join(old_sh, "old_id")
        .withColumn("inter", F.size(F.array_intersect("sh_new", "sh_old")))
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.size("sh_new") + F.size("sh_old") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("new_id", "old_id", "jaccard")


def dedup_groups(
    pairs: DataFrame,
    d1: str = "d1",
    d2: str = "d2",
    max_iter: int = 20,
    driver_threshold: int = 2_000_000,
) -> DataFrame:
    """Connected components over near-dup pairs -> (doc_id, group_id).

    The missing last step of a dedup pipeline: MinHash/Jaccard emit
    PAIRS, but keep/drop decisions need GROUPS (duplicate clusters can
    be chains: A~B, B~C with A!~C must still collapse to one kept doc).

    Algorithm: iterative hash-min label propagation. Each vertex starts
    labeled with its own id; every round each vertex takes the min of
    its own and its neighbors' labels, until a fixpoint. All heavy work
    is DataFrame joins/aggregations (shuffle on vertex id, AQE-handled
    skew); the driver only sees one scalar (changed-count) per round.

    Scale notes for 100 TB:
    - rounds needed = graph diameter; near-dup components are almost-
      cliques (diameter 1-3), so convergence is fast by construction.
      ``max_iter`` bounds pathological chains; hitting it raises.
    - ``localCheckpoint`` each round truncates the lineage so the plan
      does not grow (an unbounded iterative plan is the classic
      iterative-Spark failure mode). On a cluster, a reliable
      ``checkpoint`` to HDFS/S3 would replace it.
    - label propagation along symmetric edges; the per-round shuffle
      carries one row per (edge + vertex), same order as the input.
    - HYBRID: the edge list is the DUPLICATE graph, orders of
      magnitude smaller than the corpus. When it fits the documented
      driver envelope (``driver_threshold`` edges), a driver-side
      union-find replaces the iterative job storm — each distributed
      round costs whole-stage scheduling latency that dwarfs a few-MB
      union-find. The edge list crosses to the driver through Arrow
      (``toPandas`` on the two id columns -> columnar buffers: 2M long
      pairs ~= 32 MB plus the transient Python-int working set of the
      union-find itself), NOT a ``collect()`` of 2M Row objects, which
      costs 10-20x that in driver Python object overhead. Above the
      envelope the distributed loop runs unchanged. Both paths emit
      the identical contract (group_id = min doc id of the component;
      equivalence and the activation boundary pinned in
      tests/test_dedup_groups.py).
    """
    # edges are re-joined on src EVERY round: partition them on the
    # join key once, so the per-round exchange hits only the (smaller,
    # changing) labels side. checkpoint preserves the partitioning.
    # The upstream pairs plan (MinHash bands + exact verify) is the
    # expensive part — materialize it ONCE here; the path choice, the
    # driver collect, and the distributed loop all reuse the
    # checkpointed edge list instead of recomputing the pair search.
    undirected = (
        pairs.select(F.col(d1).alias("src"), F.col(d2).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = undirected.count()
    if n_edges <= driver_threshold:
        # Arrow columnar transfer, not Row collect (envelope honesty)
        pdf = undirected.toPandas()
        srcs = pdf["src"].tolist()
        dsts = pdf["dst"].tolist()
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = root, parent[x]
            return root

        for a0, b0 in zip(srcs, dsts):
            a, b = find(a0), find(b0)
            if a != b:
                # union by MIN id: the surviving root is the smallest
                # member, matching the hash-min contract directly
                lo, hi = (a, b) if a < b else (b, a)
                parent[hi] = lo
        out = [(v, find(v)) for v in set(parent) | set(srcs) | set(dsts)]
        spark = pairs.sparkSession
        schema = pairs.select(F.col(d1).alias("doc_id")).schema
        id_type = schema.fields[0].dataType.simpleString()
        return spark.createDataFrame(
            out, f"doc_id {id_type}, group_id {id_type}"
        )

    edges = (
        undirected.union(
            undirected.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .distinct()
        .repartition("src")
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("v"))
        .distinct()
        .withColumn("label", F.col("v"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.src == labels.v)
            .groupBy(F.col("dst").alias("v2"))
            .agg(F.min("label").alias("nmin"))
        )
        # carry the previous label through the checkpoint so the
        # convergence check is a scan of the materialized round, not
        # another shuffle join against the old labels
        new_labels = (
            labels.join(neighbor_min, labels.v == neighbor_min.v2, "left")
            .select(
                F.col("v"),
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias(
                    "label"
                ),
                F.col("label").alias("__prev"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("label") != F.col("__prev")).count()
        labels = new_labels.select("v", "label")
        if changed == 0:
            return labels.select(F.col("v").alias("doc_id"), F.col("label").alias("group_id"))
    raise RuntimeError(f"dedup_groups did not converge in {max_iter} iterations")


def keep_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    d1: str = "d1",
    d2: str = "d2",
) -> DataFrame:
    """End-to-end keep/drop decision: collapse every duplicate group to
    its lowest-id member; docs in no pair keep themselves.

    Returns ``docs`` filtered to the kept rows plus a ``group_size``
    column (1 for unique docs). The groups side is tiny relative to the
    corpus (only docs that matched something), so the join-back
    broadcasts when it fits and hash-shuffles otherwise — left to AQE.
    """
    groups = dedup_groups(pairs, d1, d2)
    sizes = groups.groupBy("group_id").agg(F.count("*").alias("group_size"))
    losers = groups.filter(F.col("doc_id") != F.col("group_id")).select(
        F.col("doc_id").alias("__drop_id")
    )
    kept = (
        groups.filter(F.col("doc_id") == F.col("group_id"))
        .join(sizes, "group_id")
        .select(F.col("doc_id").alias("__keep_id"), "group_size")
    )
    return (
        docs.join(losers, docs[id_col] == F.col("__drop_id"), "left_anti")
        .join(kept, docs[id_col] == F.col("__keep_id"), "left")
        .drop("__keep_id")
        .fillna({"group_size": 1})
    )


def simhash16(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """16-bit SimHash over distinct tokens, md5-nibble based so any
    engine reproduces it: token hash = first 4 hex chars of md5 as int;
    bit j of the fingerprint = sign of sum over tokens of (+-1 per bit).
    """
    tok = df.select(
        F.col(id_col), F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("t")
    )
    h = F.conv(F.substring(F.md5(F.col("t")), 1, 4), 16, 10).cast("int")
    tok = tok.withColumn("h", h)
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(16)
    ]
    sums = tok.groupBy(id_col).agg(*bit_sums)
    fp = None
    for j in range(16):
        term = F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return sums.select(F.col(id_col), fp.cast("long").alias("simhash"))


def dedup_report(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    d1: str = "d1",
    d2: str = "d2",
) -> DataFrame:
    """One-row dedup observability summary for a pair set over a
    corpus: (n_docs, n_pairs, n_groups, n_dup_docs, n_dropped,
    dup_frac, largest_group) — the numbers a 100 TB dedup run reports
    before anyone commits to the drop.

    - n_groups counts duplicate CLUSTERS (connected components of the
      pair graph, >= 2 docs each);
    - n_dup_docs counts docs in any cluster; n_dropped = those minus
      the kept canonicals (= n_dup_docs - n_groups);
    - dup_frac = n_dropped / n_docs — the corpus shrink the drop
      would produce;
    - largest_group flags pathological clusters (a boilerplate or
      template family collapsing into one giant component).

    Cost: the components run (dedup_groups) plus two tiny aggregates
    over the (small) groups table; the corpus contributes one count.
    """
    n_docs = docs.select(F.count(F.col(id_col)).alias("n_docs"))
    n_pairs = pairs.select(F.count("*").alias("n_pairs"))
    groups = dedup_groups(pairs, d1, d2)
    gstats = (
        groups.groupBy("group_id")
        .agg(F.count("*").alias("__sz"))
        .agg(
            F.count("*").alias("n_groups"),
            F.coalesce(F.sum("__sz"), F.lit(0)).alias("n_dup_docs"),
            F.coalesce(F.max("__sz"), F.lit(0)).alias("largest_group"),
        )
    )
    return (
        n_docs.crossJoin(n_pairs)
        .crossJoin(gstats)
        .select(
            "n_docs",
            "n_pairs",
            "n_groups",
            "n_dup_docs",
            (F.col("n_dup_docs") - F.col("n_groups")).alias("n_dropped"),
            F.when(
                F.col("n_docs") > 0,
                (F.col("n_dup_docs") - F.col("n_groups")).cast("double")
                / F.col("n_docs"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_frac"),
            "largest_group",
        )
    )
