"""Line-level deduplication (CCNet-style boilerplate removal).

Web corpora repeat whole LINES far more than whole documents:
navigation bars, cookie banners, footer legalese appear verbatim in
thousands of pages whose body text is unique. Document-level dedup
(``operators/dedup.py``) never catches these; line-level dedup removes
the repeated lines and keeps the unique bodies — the CCNet recipe
(Wenzek et al., 2020) and the reference corpus-prep pattern its users
run upstream of `polars-matmul` similarity search.

Plan shape, designed for 100 TB:

1. ``line_occurrences``  — split on newlines, posexplode, md5 of the
   canonicalized line. Scan-speed, no shuffle.
2. ``frequent_lines``    — count DISTINCT docs per line hash; one
   shuffle on the (uniform, 128-bit) hash with map-side partial
   aggregation. Output is tiny relative to the corpus (only lines
   crossing the ``min_docs`` threshold survive).
3. ``strip_frequent_lines`` — re-explode, mark lines whose hash is in
   the frequent set (broadcast join — the frequent-line table is
   MB-scale even for TB corpora), reassemble per doc with an
   order-pinned array sort. One shuffle on doc_id.

The corpus is shuffled exactly twice (once keyed by line hash, once by
doc id); the frequent set never shuffles anything — it broadcasts.
Every step is engine-portable (split / md5 / count-distinct / string
agg), so the whole operator replays in DuckDB for the driver oracle.

Blank/whitespace-only lines are excluded from frequency counting AND
from removal: they would otherwise always be "frequent" and their
removal would destroy paragraph structure rather than boilerplate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "line_occurrences",
    "frequent_lines",
    "strip_frequent_lines",
    "build_line_cms",
    "strip_frequent_lines_cms",
    "strip_repeated_lines_within_doc",
]


def _line_hash(line):
    # canonicalize just enough to catch trailing-whitespace/case noise
    # without merging genuinely different lines: trim + collapse inner
    # whitespace + lowercase, then md5. Engine-portable.
    return F.md5(F.regexp_replace(F.lower(F.trim(line)), r"\s+", " "))


def line_occurrences(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per (doc, line): (doc_id, pos, line, line_hash, is_blank).

    ``pos`` is the 0-based line index within the document — the
    order-restoration key for :func:`strip_frequent_lines`. Pure
    Catalyst split + posexplode; no shuffle.
    """
    lines = F.split(F.col(text_col), r"\n")
    out = df.select(
        F.col(id_col).alias("doc_id"), F.posexplode(lines).alias("pos", "line")
    )
    return out.select(
        "doc_id",
        "pos",
        "line",
        _line_hash(F.col("line")).alias("line_hash"),
        (F.trim(F.col("line")) == "").alias("is_blank"),
    )


def frequent_lines(
    df: DataFrame,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Line hashes appearing in at least ``min_docs`` DISTINCT documents
    (blank lines excluded): (line_hash, n_docs).

    Distinct-doc counting (not raw occurrence counting) so a single
    document repeating its own line doesn't get it globally removed —
    repetition WITHIN a doc is ``repetition_score``'s business
    (operators/text_filters.py), not line dedup's.
    """
    occ = line_occurrences(df, id_col, text_col).filter(~F.col("is_blank"))
    return (
        occ.groupBy("line_hash")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def _reassemble(marked: DataFrame) -> DataFrame:
    """(doc_id, pos, line, drop, ...) -> (doc_id, text, n_lines,
    n_stripped): surviving lines rejoined by newline in original
    order. One shuffle on doc_id."""
    kept = marked.groupBy("doc_id").agg(
        F.count("*").alias("n_lines"),
        F.sum(F.col("drop").cast("long")).alias("n_stripped"),
        F.array_sort(
            F.collect_list(F.when(~F.col("drop"), F.struct("pos", "line")))
        ).alias("__kept"),
    )
    return kept.select(
        "doc_id",
        F.concat_ws("\n", F.transform(F.col("__kept"), lambda s: s["line"])).alias(
            "text"
        ),
        "n_lines",
        "n_stripped",
    )


def strip_repeated_lines_within_doc(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keep only the FIRST occurrence of each normalized non-blank line
    WITHIN each document; later repeats drop — the intra-document
    complement of :func:`strip_frequent_lines` (which deliberately
    counts distinct docs so within-doc repetition is not its business;
    this closes that documented boundary as an explicit operator, the
    removal-side sibling of ``text_filters.repetition_expr`` scoring).
    Same output shape: (doc_id, text, n_lines, n_stripped), blank
    lines preserved verbatim.

    Scale shape: one doc-keyed shuffle total — the first-occurrence
    window and the reassembly group-by share the ``doc_id``
    partitioning, and nothing global is ever built (no frequent table,
    no broadcast): each document is cleaned independently, so the
    operator scales embarrassingly with the corpus.
    """
    from pyspark.sql import Window

    # one explicit doc_id exchange serves BOTH wide steps: hash
    # partitioning on doc_id satisfies the window's (doc_id, line_hash)
    # clustering (a subset of the keys co-locates every group) and the
    # reassembly group-by outright — without it Catalyst inserts one
    # exchange per step (measured: 2 -> 1 shuffles)
    occ = line_occurrences(df, id_col, text_col).repartition(F.col("doc_id"))
    w = Window.partitionBy("doc_id", "line_hash").orderBy("pos")
    marked = occ.withColumn("__rn", F.row_number().over(w)).withColumn(
        "drop", (F.col("__rn") > 1) & ~F.col("is_blank")
    )
    return _reassemble(marked)


def build_line_cms(
    df: DataFrame,
    width: int,
    depth: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Count-Min sketch over DISTINCT-per-doc line hashes — the
    bounded, MERGEABLE state behind :func:`strip_frequent_lines_cms`.

    The exact path's frequent-line table is bounded by boilerplate
    diversity; its full count-distinct STATE is not — to dedup a new
    batch against history exactly you must keep every line hash ever
    seen. This sketch caps that state at depth*width counters forever:
    per-batch sketches fold into the persisted one with
    ``cms.merge_cms`` (counters add; the distinct-per-doc pre-collapse
    keeps a doc's internal repeats from inflating its lines' counts),
    which is what a streaming/incremental line-dedup keeps instead of
    the unbounded hash set.
    """
    from polars_matmul_spark.operators.cms import build_cms

    # pre-aggregate to (line_hash, distinct-doc count) before the
    # sketch: the probe explode then runs over the distinct-key table
    # instead of every (doc, line) pair, and the weighted build
    # produces bit-identical counters (summing per-pair 1s == summing
    # per-key counts)
    wc = (
        line_occurrences(df, id_col, text_col)
        .filter(~F.col("is_blank"))
        .select("doc_id", "line_hash")
        .distinct()
        .groupBy("line_hash")
        .agg(F.count("*").alias("__n"))
    )
    return build_cms(wc, "line_hash", width, depth, weight_col="__n")


def strip_frequent_lines_cms(
    df: DataFrame,
    cms: DataFrame,
    width: int,
    depth: int,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet line dedup against a Count-Min sketch instead of the exact
    frequent-line set — same output shape as
    :func:`strip_frequent_lines`.

    A line is stripped when its ESTIMATED distinct-doc count reaches
    ``min_docs``. The CMS error is one-sided (never undercounts), so
    every truly frequent line is stripped — recall 1.0 by construction
    — and a rare line is wrongly stripped only on a counter collision
    (probability <= delta per key at the sketch's eps*N additive
    error), the safe direction for boilerplate removal. Sized
    generously (``cms_params(eps, delta)`` with eps*N well under
    ``min_docs``) the outputs match the exact operator bit-for-bit
    (pinned in the tests).

    Scale shape: the sketch BROADCASTS (bounded MBs by construction);
    the corpus shuffles once for the doc reassembly. History never
    re-scans — merge new batches into ``cms`` and re-strip.
    """
    from polars_matmul_spark.operators.cms import cms_lookup

    # estimate over the SLIM distinct hash set, then broadcast the
    # (hash, est) table back into one occurrence pass. An earlier form
    # checkpointed the full wide occurrence table (pos + line text per
    # row) so cms_lookup's two reads wouldn't recompute the split —
    # but materializing millions of wide rows cost more than the
    # recompute it saved (its registry row read 9.4 s deep in a test
    # session vs ~1.5 s isolated); the estimate table is bounded by
    # line diversity, the same broadcast envelope as the exact path's
    # frequent-line table.
    occ = line_occurrences(df, id_col, text_col)
    keys = occ.select("line_hash").distinct()
    est = cms_lookup(keys, cms, "line_hash", width, depth)
    marked = occ.join(F.broadcast(est), "line_hash").withColumn(
        "drop", (F.col("est_count") >= min_docs) & ~F.col("is_blank")
    )
    return _reassemble(marked)


def strip_frequent_lines(
    df: DataFrame,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove every non-blank line occurring in >= ``min_docs`` distinct
    docs; returns (doc_id, text, n_lines, n_stripped) with surviving
    lines rejoined by '\\n' in original order.

    Documents ALL of whose lines are boilerplate survive with empty
    text (and n_stripped == n_lines) — dropping them entirely is the
    caller's policy decision, visible in the counters. Blank lines are
    kept verbatim (see module docstring).
    """
    occ = line_occurrences(df, id_col, text_col)
    freq = frequent_lines(df, min_docs, id_col, text_col)
    # broadcast: the frequent-line table is bounded by boilerplate
    # diversity, not corpus size — MBs at 100 TB
    marked = occ.join(
        F.broadcast(freq.select("line_hash", F.lit(True).alias("__freq"))),
        "line_hash",
        "left",
    ).withColumn("drop", F.col("__freq").isNotNull() & ~F.col("is_blank"))
    return _reassemble(marked)
