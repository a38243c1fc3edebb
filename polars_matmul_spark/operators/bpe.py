"""Byte-pair-encoding subword tokenizer: the real-tokenizer step a
training-data pipeline needs beyond whitespace tokens (whitespace
remains the oracle-parity baseline in ``operators.text``).

Split of labor, sized for 100 TB:

- ``train_bpe``: learns the merge table from a BOUNDED sample of the
  corpus, counted distributively (one groupBy over words) and merged on
  the driver. The merge loop is inherently sequential (each merge
  changes the pair statistics the next merge ranks on), so the
  classical implementation runs driver-side over the word-frequency
  table — which is vocabulary-sized (unique words), not corpus-sized.
  ``max_words`` caps that table deterministically (top-N by count, ties
  on word) so driver memory is bounded no matter the corpus.
- ``bpe_encode``: application is the scale path — the merge table
  broadcasts (it is ``num_merges`` rows), and encoding runs in
  ``mapInPandas`` with a per-TASK word -> pieces memo, so each
  distinct word is encoded once per task rather than once per
  occurrence (on Zipfian text the hot words dominate occurrences, so
  per-task merge work is ~O(task vocabulary), not O(task tokens);
  the memo does not persist across tasks).

Determinism: merge selection ties break on (count desc, pair
lexicographic); training is a pure function of the word-frequency
table. The pytest oracle re-implements encode naively (per-occurrence,
no memo, no pandas) and must agree exactly.

Word model: lowercased whitespace words; each word is a char sequence
terminated by the end-of-word sentinel ``</w>`` (the original
Sennrich et al. 2016 formulation), so merges never cross word
boundaries and detokenization stays unambiguous.
"""

from __future__ import annotations

from collections import Counter
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "train_bpe",
    "merges_from_word_counts",
    "bpe_encode",
    "apply_merges",
]

EOW = "</w>"


def _word_counts(
    df: DataFrame, text_col: str, max_words: int
) -> list[tuple[str, int]]:
    """Distributed word-frequency table, capped to the top
    ``max_words`` (count desc, word asc — deterministic under any
    partitioning). One explode + one groupBy; the driver sees at most
    ``max_words`` rows."""
    counts = (
        df.select(
            F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("w").asc())
        .limit(max_words)
    )
    return [(r["w"], r["c"]) for r in counts.collect()]


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    max_words: int = 50_000,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the
    ordered merge list — JSON-serializable, tiny, broadcastable.

    The pair-count loop runs on the word-frequency table (unique words
    x their counts), the standard Sennrich formulation. Stops early if
    no pair occurs twice.
    """
    return merges_from_word_counts(_word_counts(df, text_col, max_words), num_merges)


def merges_from_word_counts(
    word_counts: Iterable[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """The driver-side merge loop on an explicit word-frequency table —
    the deterministic core of :func:`train_bpe`, exposed so a FIXED
    literal table (a pretrained-tokenizer artifact) can produce the
    same merges with no Spark session (the driver-row oracle needs
    the merge list at module-import time)."""
    vocab: dict[tuple[str, ...], int] = {
        tuple(w) + (EOW,): c for w, c in word_counts
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for word, c in vocab.items():
            for a, b in zip(word, word[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))
        if best[1] < 2:
            break
        pair = best[0]
        merges.append(pair)
        vocab = {_merge_word(w, pair): c for w, c in vocab.items()}
    return merges


def _merge_word(word: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    """One merge applied left-to-right, non-overlapping — the BPE rule."""
    out: list[str] = []
    i, n = 0, len(word)
    a, b = pair
    while i < n:
        if i < n - 1 and word[i] == a and word[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(word[i])
            i += 1
    return tuple(out)


def apply_merges(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode ONE word: start from chars + ``</w>``, repeatedly apply
    the lowest-rank applicable merge (the GPT-2-style priority loop —
    equivalent to replaying training order)."""
    pieces = tuple(word) + (EOW,)
    while len(pieces) > 1:
        best_rank, best_pair = None, None
        for p in zip(pieces, pieces[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        pieces = _merge_word(pieces, best_pair)
    return list(pieces)


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    id_cols: Iterable[str] = ("doc_id",),
) -> DataFrame:
    """-> id_cols + (``out_col`` array<string>, ``n_bpe`` long): the
    subword pieces of each document, words encoded independently.

    The merge table rides a SparkContext broadcast; encoding is
    mapInPandas (Arrow batches) with a per-task word memo — the hot
    path cost is one dict lookup per word occurrence within a task.
    """
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(
        {tuple(p): i for i, p in enumerate(merges)}
    )
    ids = list(id_cols)
    missing = [c for c in ids + [text_col] if c not in df.columns]
    if missing:
        raise ValueError(f"no such columns: {missing}")
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in ids
    )
    out_schema = ", ".join(
        x for x in (fields, f"{out_col} array<string>, n_bpe long") if x
    )
    src = df.select(*ids, F.lower(F.trim(F.col(text_col))).alias("__t"))

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ranks = bc.value
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            toks_out, n_out = [], []
            for t in pdf["__t"]:
                pieces: list[str] = []
                for w in (t or "").split():
                    got = memo.get(w)
                    if got is None:
                        got = memo[w] = apply_merges(w, ranks)
                    pieces.extend(got)
                toks_out.append(pieces)
                n_out.append(len(pieces))
            out = pdf[ids].copy()
            out[out_col] = toks_out
            out["n_bpe"] = n_out
            yield out

    return src.mapInPandas(encode, out_schema)
