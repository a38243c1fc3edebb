"""Winnowing document fingerprints + substring-overlap dedup.

The substring-level dedup modality sitting between exact-document
dedup (operators/dedup.py::exact_dedup) and shingle-set Jaccard
(``neardup_pairs_exact``): two documents that share one long VERBATIM
span — a quoted paragraph, boilerplate license text, copied code —
but differ everywhere else have low set-Jaccard yet are exactly the
pairs substring dedup (Lee et al., "Deduplicating Training Data Makes
Language Models Better", ACL 2022) exists to catch.

Algorithm: winnowing (Schleimer, Wilkerson, Aiken: "Winnowing: Local
Algorithms for Document Fingerprinting", SIGMOD 2003 — the MOSS
fingerprinter). Hash every character k-gram; in every window of
``window`` consecutive k-gram hashes select the minimum (rightmost on
ties); the selected (position, hash) set is the document fingerprint.

The winnowing GUARANTEE (paper §3): any shared substring of length
>= k + window - 1 contributes at least one selected fingerprint to
BOTH documents, so a postings equi-join on fingerprint hashes finds
every such pair. Density: ~2/(window+1) of positions are selected —
the index is a small fraction of the text.

Engine portability: the k-gram hash is the repo's md5-prefix idiom
(first 12 hex chars -> 48-bit int), so DuckDB replays selection and
join bit-for-bit (pinned in tests/test_winnow.py).

Scale shape (100 TB):

- ``winnow_fingerprints`` is row-local (no shuffle): per-doc array
  expressions, whole plan JVM-side (no Python worker — plan-gated).
  Per-row work is O(len * window) element comparisons.
- ``winnow_dup_pairs`` is the postings shape shared with the shingle
  join: explode fingerprints, equi-join on the 48-bit hash,
  ``max_hash_docs`` bounds every posting list (the hot-hash analogue
  of ``neardup_pairs_exact(max_shingle_docs=...)`` — ubiquitous
  boilerplate hashes cannot go quadratic), group-by pair. Emitted
  counts are SELECTED-fingerprint overlaps; candidates carry their
  matched gram, so a verifier can extend spans if exact maximal
  matches are needed downstream.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "winnow_fingerprints",
    "winnow_fp_values",
    "winnow_dup_pairs",
    "winnow_hash_cap",
    "build_winnow_index",
    "winnow_new_vs_index",
    "gram_arrays",
    "excise_duplicate_spans",
    "shared_span_stats",
    "build_gram_cms",
    "excise_duplicate_spans_cms",
    "build_gram_index",
    "merge_gram_index",
    "excise_new_vs_index",
]


def winnow_hash_cap(n_rows: int, candidate_factor: int = 16) -> int:
    """Default ``max_hash_docs`` for a corpus of ``n_rows`` documents:
    the largest per-fingerprint doc frequency whose candidate-pair
    contribution (df * (df-1) / 2 ~ df^2 / 2) stays under
    ``candidate_factor * n_rows`` — so ONE ubiquitous boilerplate
    fingerprint (license header, template preamble) can contribute at
    most ~candidate_factor * n pairs to the postings self-join, linear
    in the corpus, never the silent quadratic an uncapped hot hash
    produces. The same envelope philosophy as
    :func:`projection.srp_band_plan` (expected candidates <= ~16n).

    cap = max(64, floor(sqrt(2 * factor * n)) + 1). IEEE double sqrt
    (not isqrt) so DuckDB's ``floor(sqrt(...))`` replays the exact cap
    in driver oracles; the floor of 64 keeps tiny corpora exact.
    At n = 10^8 docs the default is ~56_569 — a fingerprint must
    appear in >56k documents before it is dropped, and what it costs
    before that is <= 1.6e9 pairs ~ 16n.
    """
    import math

    n = max(int(n_rows), 1)
    return max(64, int(math.floor(math.sqrt(2.0 * candidate_factor * n))) + 1)


def _resolve_hash_cap(df: DataFrame, max_hash_docs) -> int | None:
    """'auto' (the default) -> :func:`winnow_hash_cap` of the corpus
    row count; None is the explicit unbounded opt-out; an int passes
    through.

    NOTE: 'auto' makes the call EAGER — ``df.count()`` runs a Spark
    job at construction time (a zero-column scan: cheap over parquet,
    a full pass over derived/filtered inputs). Callers that know the
    size, build repeatedly over the same frame, or must stay lazy
    should resolve :func:`winnow_hash_cap` once themselves and pass
    the int (the streaming ingest does exactly this — one count per
    micro-batch, threaded into both its stages).

    The resolved cap is LOGGED (INFO) so capped runs stay auditable —
    a pair whose overlap is only hot boilerplate fingerprints is
    silently dropped by design, and the log line is the record of
    which threshold did it (round-6 ADVICE)."""
    if max_hash_docs == "auto":
        n = df.count()
        cap = winnow_hash_cap(n)
        logging.getLogger(__name__).info(
            "winnow: auto max_hash_docs=%d for %d docs "
            "(fingerprints in more docs than the cap are dropped; "
            "pass max_hash_docs=None for the exact unbounded form)",
            cap,
            n,
        )
        return cap
    return max_hash_docs

# 48-bit md5-prefix hash of a k-gram: far below the 2^53 exact-integer
# bound of conv()'s double, identical in DuckDB as
# ('0x' || substr(md5(g), 1, 12))::BIGINT
def _gram_hash(gram: Column) -> Column:
    return F.conv(F.substring(F.md5(gram), 1, 12), 16, 10).cast("long")


def winnow_fingerprints(
    df: DataFrame,
    k: int = 8,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per selected fingerprint: (id, pos, fp) where ``pos`` is
    the 0-based character offset of the selected k-gram and ``fp`` its
    48-bit hash. Documents shorter than ``k`` characters emit nothing
    (no k-gram exists); docs shorter than k + window - 1 fall back to
    a single window over however many grams exist.

    Pure Catalyst: sequence -> transform(substring) -> transform(md5
    prefix) -> per-window argmin (rightmost tie, the winnowing rule
    that makes selections consistent across overlapping windows) ->
    array_distinct -> explode. No shuffle, no Python worker.

    The k-gram hash array is MATERIALIZED as a projection column before
    the per-window pass: higher-order functions evaluate interpreted
    (no codegen) and re-evaluate their lambda body per element, so an
    inline ``hs`` sub-expression would be recomputed for every window —
    O(n_grams^2) md5 calls per document (measured: a single sf0.001
    partition ran 9+ minutes; materialized it's O(n_grams)).
    """
    if k < 1 or window < 1:
        raise ValueError(f"k and window must be >= 1, got k={k}, window={window}")
    t = F.col(text_col)
    n_grams = F.greatest(F.length(t) - F.lit(k - 1), F.lit(0))
    staged = (
        df.filter(F.length(t) >= k)
        .select(
            F.col(id_col),
            # hs[i] = hash of the k-gram at 0-based char offset i-1
            F.transform(
                F.sequence(F.lit(1), n_grams),
                lambda i: _gram_hash(t.substr(i, F.lit(k))),
            ).alias("__hs"),
            F.greatest(n_grams - F.lit(window - 1), F.lit(1)).alias("__nwin"),
            # short-doc fallback window
            F.least(F.lit(window), n_grams).alias("__weff"),
        )
    )
    hs, w_eff = F.col("__hs"), F.col("__weff")

    def _select(j):
        # window j (1-based start into hs): min hash, rightmost on tie.
        # win/mv re-evaluate per reference but over the bound __hs
        # column — O(window^2) comparisons per window, not O(n_grams).
        win = F.slice(hs, j, w_eff)
        mv = F.array_min(win)
        off = F.array_max(
            F.filter(
                F.sequence(F.lit(1), w_eff),
                lambda i: F.element_at(win, i) == mv,
            )
        )
        return F.struct(
            (j + off - F.lit(2)).cast("long").alias("pos"),  # 0-based char offset
            mv.alias("fp"),
        )

    selected = F.array_distinct(
        F.transform(F.sequence(F.lit(1), F.col("__nwin")), _select)
    )
    return (
        staged.select(F.col(id_col), F.explode(selected).alias("__s"))
        .select(id_col, F.col("__s.pos").alias("pos"), F.col("__s.fp").alias("fp"))
    )


def winnow_fp_values(
    df: DataFrame,
    k: int = 8,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    repartition_to: int | None = None,
) -> DataFrame:
    """Distinct (id, fp) selected-fingerprint VALUES — the positions
    dropped. Same selected hash set as :func:`winnow_fingerprints`
    (the per-window min is the min whichever position it sits at;
    distinct-by-value collapses the tie bookkeeping), but each window
    costs one slice + one array_min instead of the positions path's
    O(window^2) interpreted re-evaluations of the slice/min inside the
    rightmost-tie filter — 10x wall on the pair-report path, where
    positions are never read (sf0.1: 20.7s -> ~2s).

    ``repartition_to``: the fingerprint pass is heavy per-row compute
    (one md5 per char position); a small single-file input scans as
    ONE partition and serializes all of it onto one core. Pass the
    session's default parallelism to spread it — the shuffled payload
    is just (id, text), a no-op at 100 TB where the scan is already
    wide but a 7x wall cut on a one-file local table."""
    if k < 1 or window < 1:
        raise ValueError(f"k and window must be >= 1, got k={k}, window={window}")
    if repartition_to is not None:
        df = df.repartition(int(repartition_to))
    t = F.col(text_col)
    n_grams = F.greatest(F.length(t) - F.lit(k - 1), F.lit(0))
    staged = (
        df.filter(F.length(t) >= k)
        .select(
            F.col(id_col),
            F.transform(
                F.sequence(F.lit(1), n_grams),
                lambda i: _gram_hash(t.substr(i, F.lit(k))),
            ).alias("__hs"),
            F.greatest(n_grams - F.lit(window - 1), F.lit(1)).alias("__nwin"),
            F.least(F.lit(window), n_grams).alias("__weff"),
        )
    )
    mins = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.col("__nwin")),
            lambda j: F.array_min(F.slice(F.col("__hs"), j, F.col("__weff"))),
        )
    )
    return staged.select(F.col(id_col), F.explode(mins).alias("fp"))


def winnow_dup_pairs(
    df: DataFrame,
    k: int = 8,
    window: int = 4,
    min_shared: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hash_docs: int | None | str = "auto",
    repartition_to: int | None = None,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` selected fingerprints:
    (d1, d2, n_shared) with d1 < d2 — the MOSS-style substring-overlap
    report. By the winnowing guarantee, any pair sharing a verbatim
    span of length >= k + window - 1 shares at least one fingerprint;
    ``min_shared`` > 1 demands proportionally longer (or repeated)
    overlap and suppresses random 48-bit collisions (expected spurious
    shared-fp count for a corpus of F total fingerprints is
    ~F^2 / 2^49 — negligible below ~10^7 fingerprints per blocking
    domain, and ``min_shared>=2`` squares that rate).

    ``max_hash_docs`` bounds candidate generation exactly like
    ``neardup_pairs_exact(max_shingle_docs=...)``: fingerprints present
    in more docs than the cap (ubiquitous boilerplate) leave the
    postings join, so no single hash can go quadratic; pairs whose
    overlap is ONLY that boilerplate are the documented miss. The
    default is ``"auto"`` — :func:`winnow_hash_cap` of the corpus row
    count, which holds any one fingerprint's pair contribution to
    ~16 * n_rows (r6: previously unbounded by default, the one
    scale-killer the round-5 audit still flagged). Pass ``None`` to
    opt out explicitly (exactness regardless of boilerplate).
    """
    # values-only selection (winnow_fp_values): positions are never
    # read here, and dropping them removes the O(window^2) rightmost-
    # tie bookkeeping per window. A span shared at two positions within
    # one doc still counts once per (doc, hash): distinct before the
    # join so n_shared counts DISTINCT shared fingerprint hashes, not
    # position pairs.
    # localCheckpoint: without it the self-join re-runs the whole
    # fingerprint pass (one md5 per char position) on BOTH sides —
    # same fix as srp_neardup's signature frame (projection.py)
    max_hash_docs = _resolve_hash_cap(df, max_hash_docs)
    fps = winnow_fp_values(df, k, window, text_col, id_col, repartition_to)
    post = fps.distinct().localCheckpoint(eager=False)
    if max_hash_docs is not None:
        hot = (
            post.groupBy("fp")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") > max_hash_docs)
            .select("fp")
        )
        post = post.join(F.broadcast(hot), "fp", "left_anti")
    a = post.alias("a")
    b = post.hint("shuffle_hash").alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("d1"), F.col(f"b.{id_col}").alias("d2")
        )
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def excise_duplicate_spans(
    df: DataFrame,
    k: int = 20,
    min_docs: int = 2,
    keep_first: bool = True,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_frequent: bool = True,
) -> DataFrame:
    """Exact substring dedup by REMOVAL (Lee et al., ACL 2022): cut
    every cross-document verbatim span of length >= ``k`` out of the
    non-canonical copies, instead of dropping whole documents.

    Mechanism: hash every character k-gram (the winnowing gram hash,
    NO winnowed selection — selection samples ~2/(window+1) positions,
    which finds dup PAIRS but cannot delimit the span to cut). A
    position is duplicated when its k-gram appears in >= ``min_docs``
    DISTINCT documents; the union of the duplicated positions'
    ``[pos, pos+k)`` intervals is exactly the union of the maximal
    shared substrings of length >= k (a shared span of length L >= k
    shares all of its L-k+1 k-grams), up to 48-bit hash collisions
    (~F^2/2^49 spurious gram matches corpus-wide). Returns
    (id, text, n_spans_removed, n_chars_removed) for EVERY input row;
    untouched docs pass through with zeros.

    ``keep_first=True`` (the Lee-et-al policy): each frequent gram has
    a canonical OWNER — the smallest doc id among the docs containing
    it — and the owner keeps its copy. For a span shared by one set of
    documents every gram has the same owner (min of the same sharer
    set), so whole spans stay or go together; when spans with
    different sharer sets overlap, ownership is resolved per gram
    (still deterministic). ``keep_first=False`` strips frequent spans
    from every copy — CCNet line-dedup semantics at substring
    granularity (boilerplate removal mode).

    Scale shape (the honest cost of EXACT substring dedup — suffix
    arrays are also O(total bytes)): one (id, pos, hash) explode of
    the text, one distinct + map-side-combinable groupBy over gram
    hashes (uniform 48-bit keys), the frequent-gram table (bounded by
    cross-doc boilerplate diversity, NOT corpus size) broadcasts back
    into the slim gram stream, one per-doc aggregation of excise
    positions, one id-keyed join to reassemble — the line-dedup plan
    with k-grams in place of lines, no self-join anywhere, so a
    ubiquitous span costs O(its occurrences), never O(occ^2). Set
    ``broadcast_frequent=False`` when the frequent set is too large to
    broadcast (it becomes a shuffle join on the 8-byte hash).

    Engine portability: md5-prefix gram hashes, min-id ownership,
    sorted-position interval merge — DuckDB replays the whole operator
    (pinned in tests/test_winnow.py).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    # materialize the gram ARRAYS once: they feed BOTH the frequency
    # count and the hits join, and the md5-per-char-position pass is
    # the dominant cost (measured 7.2 -> ~4 s at sf0.1; at 100 TB the
    # gram table is the dataset you'd persist anyway). The array form
    # checkpoints a third of the exploded stream's bytes (positions
    # are the array index), and both derivations from it are row-local
    owner_aggs = [F.min(id_col).alias("__owner")] if keep_first else []
    arrays = gram_arrays(df, k, text_col, id_col).localCheckpoint(eager=False)
    # the min-id owner column is only computed (and carried through
    # the broadcast) when the keep-first policy actually reads it
    frequent = (
        _gram_doc_counts(arrays, id_col, owner_aggs)
        .filter(F.col("__n") >= min_docs)
        .drop("__n")
    )
    if broadcast_frequent:
        frequent = F.broadcast(frequent)
    hits = _gram_stream_from(arrays, id_col).join(frequent, "__h")
    if keep_first:
        hits = hits.filter(F.col("__owner") != F.col(id_col))
    return _excise_reassemble(
        df, _cut_positions(hits, id_col), k, text_col, id_col
    )


def shared_span_stats(
    df: DataFrame,
    k: int = 20,
    max_hash_docs: int | None | str = "auto",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Span-granularity dedup observability (the ``dedup_report``
    counterpart at substring level, round 7): for every document pair
    sharing at least one verbatim span of length >= ``k``, the MAXIMAL
    shared-span statistics — (d1, d2, n_spans, max_span_len,
    sum_span_chars, span_lengths sorted array) — without suffix
    automata: maximal shared spans are exactly the maximal DIAGONAL
    runs of the gram match matrix. A shared span of length L >= k
    aligns L-k+1 consecutive gram positions in both docs at a constant
    offset p1 - p2, so grouping matches by (pair, diagonal) and
    counting consecutive-p1 islands (gaps-and-islands) recovers every
    maximal span as run_len + k - 1 chars.

    Two docs that repeat the same span internally produce one run per
    alignment (the match-matrix semantics); ``sum_span_chars`` sums
    maximal runs over all alignments and so can exceed the distinct
    char union that :func:`excise_duplicate_spans` would cut —
    alignment mass vs excision mass, both useful, documented apart.
    48-bit gram-hash collisions can fabricate ~F^2/2^49 spurious
    length-``k`` spans corpus-wide — negligible, and only at the
    minimum length bucket.

    Scale shape: the postings equi-join on uniform 48-bit hashes is
    bounded by ``max_hash_docs`` exactly like :func:`winnow_dup_pairs`
    (default "auto" = :func:`winnow_hash_cap`, one eager count);
    the island window partitions by (d1, d2, diagonal) — never a
    global sort — and its exchange is REUSED by the island group-by
    (grouping keys a superset of the partitioning); the final per-pair
    fold moves only one slim row per maximal span.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    cap = _resolve_hash_cap(df, max_hash_docs)
    arrays = gram_arrays(df, k, text_col, id_col).localCheckpoint(eager=False)
    # only hashes seen in >= 2 DISTINCT docs can form a cross-doc
    # match, so the self-join's shuffle ships just the shared-gram
    # subset (bounded by duplicated content, not corpus size) instead
    # of every position — value-neutral, and the same counting pass
    # applies the hot-hash cap
    shared = _gram_doc_counts(arrays, id_col).filter(F.col("__n") >= 2)
    if cap is not None:
        shared = shared.filter(F.col("__n") <= cap)
    grams = _gram_stream_from(arrays, id_col).join(
        F.broadcast(shared.select("__h")), "__h"
    )
    a = grams.alias("a")
    b = grams.hint("shuffle_hash").alias("b")
    matches = a.join(
        b,
        (F.col("a.__h") == F.col("b.__h"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("d1"),
        F.col(f"b.{id_col}").alias("d2"),
        F.col("a.pos").alias("p1"),
        F.col("b.pos").alias("p2"),
        (F.col("a.pos") - F.col("b.pos")).alias("__diag"),
    )
    w = Window.partitionBy("d1", "d2", "__diag").orderBy("p1")
    runs = matches.withColumn(
        "__grp", F.col("p1") - F.row_number().over(w)
    )
    spans = runs.groupBy("d1", "d2", "__diag", "__grp").agg(
        (F.count("*") + F.lit(k - 1)).cast("int").alias("span_len")
    )
    return spans.groupBy("d1", "d2").agg(
        F.count("*").alias("n_spans"),
        F.max("span_len").alias("max_span_len"),
        F.sum("span_len").alias("sum_span_chars"),
        F.sort_array(F.collect_list("span_len")).alias("span_lengths"),
    )


def build_gram_cms(
    df: DataFrame,
    k: int = 20,
    width: int = 65536,
    depth: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    grams: DataFrame | None = None,
) -> DataFrame:
    """Count-Min sketch over DISTINCT-per-doc character k-gram hashes —
    the bounded, MERGEABLE state behind
    :func:`excise_duplicate_spans_cms` (the gram-granularity analogue
    of ``linededup.build_line_cms``).

    The exact excision's state is every gram hash ever seen
    (O(corpus bytes) — unbounded on a stream); this sketch caps it at
    ``depth * width`` counters forever. Per-batch sketches fold into a
    persisted one with ``cms.merge_cms`` (the distinct-per-doc
    pre-collapse keeps a doc's internal span repeats from inflating
    its grams' doc counts), which is what a streaming excise-on-ingest
    keeps instead of the unbounded gram set.

    ``grams``: a precomputed (ideally checkpointed)
    :func:`gram_arrays` frame over the SAME ``df``/``k`` — pass it
    when another consumer shares the md5 pass (the one-hash-pass
    build-plus-excise driver shape)."""
    from polars_matmul_spark.operators.cms import build_cms

    # pre-aggregate to (hash, distinct-doc count) before the sketch —
    # bit-identical counters, and the probe explode runs over the
    # distinct-key table instead of every (doc, gram) pair (the
    # build_line_cms pattern)
    if grams is None:
        grams = gram_arrays(df, k, text_col, id_col)
    wc = _gram_doc_counts(grams, id_col)
    return build_cms(wc, "__h", width, depth, weight_col="__n")


def excise_duplicate_spans_cms(
    df: DataFrame,
    cms: DataFrame,
    k: int = 20,
    width: int = 65536,
    depth: int = 5,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    grams: DataFrame | None = None,
    broadcast_frequent: bool = True,
) -> DataFrame:
    """Span excision against a Count-Min sketch instead of the exact
    gram-frequency table — same output shape as
    :func:`excise_duplicate_spans` in strip-everywhere mode
    (``keep_first`` needs per-gram owner ids, which a sketch cannot
    store — canonical-copy policies stay on the exact/batch path).

    A position is cut when its k-gram's ESTIMATED distinct-doc count
    reaches ``min_docs``. The CMS error is one-sided (never
    undercounts), so every truly duplicated span is excised — recall
    1.0 by construction — and extra chars are cut only on a counter
    collision, the safe direction for boilerplate removal. Sized
    generously the output matches the exact operator bit-for-bit
    (pinned in the tests).

    Scale shape: the sketch BROADCASTS (bounded MBs by construction)
    into the probe join; estimates are folded at DISTINCT-gram-hash
    granularity (per-doc dedup is row-local ``array_distinct``, so the
    probe side is the distinct-hash set, not every position), and only
    the FILTERED frequent set (est >= ``min_docs``) joins back into
    the position stream — never the full estimate frame (round 7: the
    former full-width ``cms_lookup`` join-back was the operator's
    biggest exchange). The reassembly join moves one row per doc.
    History never re-scans — merge new batches into ``cms`` and
    re-excise. ``broadcast_frequent=False`` falls back to a shuffle
    join for a saturated/undersized sketch whose frequent set is too
    large to broadcast (the sibling operators' escape hatch).

    ``grams``: a precomputed (ideally checkpointed)
    :func:`gram_arrays` frame over the SAME ``df``/``k`` — pass it to
    share one md5 pass between :func:`build_gram_cms` and this
    excision (the driver-row and ingest shape)."""
    # probe-position derivation shared with the cms module (in-package
    # reuse of its private _probes keeps the double-hash scheme in ONE
    # place; the public cms_lookup would re-distinct and join back the
    # full estimate frame — exactly the exchanges this plan avoids)
    from polars_matmul_spark.operators.cms import _probes

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    if grams is None:
        grams = gram_arrays(df, k, text_col, id_col).localCheckpoint(
            eager=False
        )
    keys = (
        grams.select(F.explode(F.array_distinct("__hs")).alias("__h"))
        .distinct()
    )
    probes = keys.select(
        "__h", F.explode(_probes(F.col("__h"), width, depth)).alias("p")
    )
    est = (
        probes.join(
            F.broadcast(cms),
            (F.col("p.row") == F.col("row")) & (F.col("p.col") == F.col("col")),
            "left",
        )
        .select("__h", F.coalesce(F.col("n"), F.lit(0)).alias("__c"))
        .groupBy("__h")
        .agg(F.min("__c").alias("__est"))
    )
    frequent = est.filter(F.col("__est") >= min_docs).select("__h")
    if broadcast_frequent:
        frequent = F.broadcast(frequent)
    hits = _gram_stream_from(grams, id_col).join(frequent, "__h")
    return _excise_reassemble(
        df, _cut_positions(hits, id_col), k, text_col, id_col
    )


def build_gram_index(
    df: DataFrame,
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(``__h``, ``n_docs``) distinct-doc counts per character k-gram
    hash — the persistable EXACT state behind
    :func:`excise_new_vs_index` (the unbounded-but-exact analogue of
    :func:`build_gram_cms`, and the substring-granularity analogue of
    the line-dedup frequent table). O(corpus bytes) rows — the honest
    size of exact substring-dedup state; persist it partitioned/
    bucketed by ``__h`` and every future increment excises against it
    without touching the corpus text. Fold per-batch indexes with
    :func:`merge_gram_index` — APPENDING raw build outputs leaves
    duplicate ``__h`` rows whose counts are never summed (silent
    under-excision downstream)."""
    return _gram_doc_counts(
        gram_arrays(df, k, text_col, id_col), id_col
    ).withColumnRenamed("__n", "n_docs")


def merge_gram_index(*indexes: DataFrame) -> DataFrame:
    """Fold per-batch gram indexes built over DISJOINT doc-id sets into
    one: distinct-doc counts add across disjoint batches, so
    ``merge(build(A), build(B)) == build(A union B)`` exactly (pinned
    in the tests) — the exact-index analogue of ``cms.merge_cms``."""
    if not indexes:
        raise ValueError("merge_gram_index needs at least one index")
    out = indexes[0]
    for s in indexes[1:]:
        out = out.unionByName(s)
    return out.groupBy("__h").agg(F.sum("n_docs").alias("n_docs"))


def excise_new_vs_index(
    new_df: DataFrame,
    index: DataFrame,
    k: int = 20,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_probe: bool = True,
) -> DataFrame:
    """Incremental EXACT span excision: cut from each NEW document
    every span of length >= ``k`` whose grams reach ``min_docs``
    distinct documents across the indexed history PLUS this batch —
    bit-identical to running
    ``excise_duplicate_spans(history ∪ batch, keep_first=False)``
    restricted to the new ids (pinned in the tests; ids must be
    disjoint from the index's, ``k`` must match the build).

    The 100 TB ingestion story mirrors ``winnow_new_vs_index``: the
    batch's distinct gram hashes BROADCAST into a left-semi scan of
    the TB-scale index — the index is read in place, never shuffled,
    and only the (small) matched subset flows into the total-count
    join. History docs are by definition older, so strip-everywhere is
    also the keep-first answer for the batch side; history's own
    copies keep theirs (re-excise history offline if retroactive
    cleaning matters)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    arrays = gram_arrays(new_df, k, text_col, id_col).localCheckpoint(
        eager=False
    )
    batch_counts = _gram_doc_counts(arrays, id_col).withColumnRenamed(
        "__n", "__bn"
    )
    # the index subset matching this batch: broadcast the batch's gram
    # set into a left-semi map-side scan — the only touch of the index.
    # ``broadcast_probe=False`` falls back to shuffle joins for batches
    # whose gram set is too large to broadcast (the batch side is
    # O(batch bytes) rows — pass False the way excise_duplicate_spans
    # takes broadcast_frequent=False).
    _maybe_bcast = F.broadcast if broadcast_probe else (lambda d: d)
    matched = index.join(
        _maybe_bcast(batch_counts.select("__h")), "__h", "left_semi"
    )
    frequent = (
        batch_counts.join(matched, "__h", "left")
        .filter(
            F.col("__bn") + F.coalesce(F.col("n_docs"), F.lit(0)) >= min_docs
        )
        .select("__h")
    )
    hits = _gram_stream_from(arrays, id_col).join(_maybe_bcast(frequent), "__h")
    return _excise_reassemble(
        new_df, _cut_positions(hits, id_col), k, text_col, id_col
    )


def gram_arrays(
    df: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc character k-gram hash ARRAY: (id, ``__hs``) where
    ``__hs[i]`` is the 48-bit hash of the k-gram at 0-based char
    offset i; docs shorter than ``k`` are dropped (no k-gram exists).
    One md5 per char position (materialized ``__hs``, the
    interpreted-HOF rule) — the dominant cost of every gram consumer,
    so this frame is PUBLIC: hash once, ``localCheckpoint``, and feed
    several consumers (e.g. :func:`build_gram_cms` +
    :func:`excise_duplicate_spans_cms` via their ``grams=`` parameter
    — the one-pass driver-row shape). The array form is also what to
    checkpoint: positions are implicit in the index, so it stores a
    third of the exploded stream's bytes.
    """
    t = F.col(text_col)
    n_grams = F.greatest(F.length(t) - F.lit(k - 1), F.lit(0))
    return df.filter(F.length(t) >= k).select(
        F.col(id_col),
        F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: _gram_hash(t.substr(i, F.lit(k))),
        ).alias("__hs"),
    )


def _gram_stream_from(arrays: DataFrame, id_col: str) -> DataFrame:
    """(id, pos, ``__h``) exploded stream from a :func:`gram_arrays`
    frame — row-local, so deriving it (even twice) from a checkpointed
    arrays frame never repeats the md5 pass."""
    return arrays.select(
        F.col(id_col), F.posexplode(F.col("__hs")).alias("pos", "__h")
    )


def _gram_doc_counts(arrays: DataFrame, id_col: str, extra_aggs=()) -> DataFrame:
    """(``__h``, ``__n`` [, extras]) DISTINCT-doc counts per gram hash
    from a :func:`gram_arrays` frame — the one counting block shared
    by the exact excision, the gram index, the gram CMS and the
    incremental batch side. Per-doc dedup happens ROW-LOCALLY
    (``array_distinct`` before the explode), so the only exchange is
    the final map-side-combinable groupBy over uniform 48-bit keys —
    one shuffle, not the distinct-then-count two (the row-7 cut of
    the operator family's biggest exchange)."""
    return (
        arrays.select(
            F.col(id_col), F.explode(F.array_distinct("__hs")).alias("__h")
        )
        .groupBy("__h")
        .agg(F.count("*").alias("__n"), *extra_aggs)
    )


def _cut_positions(hits: DataFrame, id_col: str) -> DataFrame:
    """Per-doc sorted excise starts from the frequent-gram hits."""
    return hits.groupBy(id_col).agg(
        F.sort_array(F.collect_set("pos")).alias("__cuts")
    )


def _gram_stream(
    df: DataFrame, k: int, text_col: str, id_col: str
) -> DataFrame:
    """Slim (id, pos, __h) stream of every character k-gram hash."""
    return _gram_stream_from(gram_arrays(df, k, text_col, id_col), id_col)


def _excise_fold(t: Column, cuts: Column, k: int) -> Column:
    """struct(kept, nsp, nch) rebuilt row-locally from SORTED excise
    starts: fold the starts left to right, copying the kept gap before
    each new interval and extending the cursor through overlaps; spans
    and chars are counted in the same fold. All interval ends are
    pos+k <= len by construction (grams exist only at pos <= len-k)."""
    zero = F.struct(
        F.lit(0).alias("cur"),
        F.lit("").alias("kept"),
        F.lit(0).cast("long").alias("nsp"),
        F.lit(0).cast("long").alias("nch"),
    )

    def _merge(acc, p):
        new_span = F.struct(
            (p + F.lit(k)).alias("cur"),
            F.concat(
                acc["kept"], t.substr(acc["cur"] + 1, p - acc["cur"])
            ).alias("kept"),
            (acc["nsp"] + 1).alias("nsp"),
            (acc["nch"] + F.lit(k)).alias("nch"),
        )
        extend = F.struct(
            (p + F.lit(k)).alias("cur"),
            acc["kept"].alias("kept"),
            acc["nsp"].alias("nsp"),
            (acc["nch"] + p + F.lit(k) - acc["cur"]).alias("nch"),
        )
        return (
            F.when(p >= acc["cur"], new_span)
            .when(p + F.lit(k) > acc["cur"], extend)
            .otherwise(acc)
        )

    return F.aggregate(
        cuts,
        zero,
        _merge,
        lambda acc: F.struct(
            F.concat(
                acc["kept"], t.substr(acc["cur"] + 1, F.length(t) - acc["cur"])
            ).alias("kept"),
            acc["nsp"].alias("nsp"),
            acc["nch"].alias("nch"),
        ),
    )


def _excise_reassemble(
    df: DataFrame, cuts: DataFrame, k: int, text_col: str, id_col: str
) -> DataFrame:
    """Join the per-doc sorted excise starts back and rebuild each
    text row-locally via :func:`_excise_fold`."""
    t = F.col(text_col)
    out = df.join(cuts, id_col, "left").withColumn(
        "__cuts", F.coalesce(F.col("__cuts"), F.array().cast("array<integer>"))
    )
    folded = _excise_fold(t, F.col("__cuts"), k)
    return out.select(
        F.col(id_col),
        folded["kept"].alias(text_col),
        folded["nsp"].alias("n_spans_removed"),
        folded["nch"].alias("n_chars_removed"),
    )


def build_winnow_index(
    df: DataFrame,
    k: int = 8,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hash_docs: int | None | str = "auto",
) -> DataFrame:
    """The persistable substring-fingerprint index for a corpus: one
    (doc_id, fp) row per distinct selected winnowing hash — the
    substring analogue of :func:`dedup.build_minhash_bands`. Write it
    once (partitioned/bucketed by ``fp``) and every future increment
    checks against it without touching the corpus text
    (:func:`winnow_new_vs_index`). Density ~2/(window+1) of char
    positions, so the index is a small fraction of the text bytes.

    ``max_hash_docs`` drops ubiquitous-boilerplate hashes AT BUILD
    time (doc frequency measured over this corpus), keeping every
    posting list bounded before the index is ever written; default
    ``"auto"`` = :func:`winnow_hash_cap` of the corpus row count,
    ``None`` the explicit unbounded opt-out."""
    max_hash_docs = _resolve_hash_cap(df, max_hash_docs)
    post = winnow_fp_values(df, k, window, text_col, id_col).distinct()
    if max_hash_docs is not None:
        hot = (
            post.groupBy("fp")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") > max_hash_docs)
            .select("fp")
        )
        post = post.join(F.broadcast(hot), "fp", "left_anti")
    return post


def winnow_new_vs_index(
    new_df: DataFrame,
    index: DataFrame,
    k: int = 8,
    window: int = 4,
    min_shared: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental substring dedup: which NEW docs share >=
    ``min_shared`` selected fingerprints with the already-indexed
    corpus -> (new_id, old_id, n_shared).

    The 100 TB ingestion story mirrors ``neardup_new_vs_index``: the
    corpus's fingerprint index is persisted once; each arriving batch
    is fingerprinted (row-local, no shuffle) and its SMALL (id, fp)
    table BROADCASTS into a map-side join against the TB-scale index,
    which is scanned in place — never shuffled. k/window must match
    the values the index was built with; ids must be disjoint."""
    new_post = winnow_fp_values(
        new_df, k, window, text_col, id_col
    ).distinct()
    ix = index.alias("ix")
    nw = F.broadcast(new_post).alias("nw")
    return (
        ix.join(nw, F.col("ix.fp") == F.col("nw.fp"))
        .groupBy(
            F.col(f"nw.{id_col}").alias("new_id"),
            F.col(f"ix.{id_col}").alias("old_id"),
        )
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
