"""Text-analysis operators over a document table — all pure Catalyst
expressions (JVM codegen, no Python UDFs): at 100 TB these run at scan
speed, embarrassingly parallel, zero shuffles until the final agg.

Operators: tokenization + counting, language-ID (stopword-hit
heuristic), quality scoring (length/stopword/shape ratios), document
fingerprinting (normalized-content hash and shingle sets for the dedup
family in ``operators.dedup``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "canonicalize",
    "tokens",
    "shingles",
    "token_count",
    "lang_id",
    "quality_score",
    "fingerprint",
    "STOPWORDS",
]

# Small per-language stopword lists for the heuristic language-ID.
# Order matters: ties resolve to the earlier language (deterministic).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "es": ("el", "los", "las", "y", "es", "que"),
    "fr": ("le", "la", "et", "les", "des", "est"),
    "zh": ("的", "是", "了", "在", "和"),
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization. BPE-ish subword splitting is a later
    refinement; whitespace is the oracle-parity baseline."""
    return F.split(F.trim(col), r"\s+")


def shingles(tok_col: Column, n: int = 3) -> Column:
    """Word n-gram shingles (distinct), for Jaccard/MinHash dedup.

    Pure SQL ``transform(sequence(...))`` — arrays stay JVM-side.
    Rows with fewer than n tokens yield an empty shingle set.
    """
    # Built from slice + zip_with, NOT transform(sequence, i -> t[i+j]):
    # Catalyst inlines column references, so indexing the token array
    # inside a lambda re-evaluates the full split() once per element —
    # O(tokens^2) regex work per row. slice() evaluates the array
    # expression once per call, keeping this O(1) evaluations per row.
    t = tok_col
    m = F.size(t) - (n - 1)  # number of shingles
    cols = [F.slice(t, j + 1, m) for j in range(n)]  # 1-based start
    zipped = cols[n - 1]
    for j in range(n - 2, -1, -1):
        zipped = F.zip_with(cols[j], zipped, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.when(F.size(t) >= n, F.array_distinct(zipped)).otherwise(
        F.array().cast("array<string>")
    )


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("long")


#: BPE-ish pretokenizer: letter runs, digit runs, single punctuation —
#: the coarse split a byte-pair tokenizer starts from. Engine-portable
#: regex (no lookarounds), identical semantics in Spark and DuckDB.
BPE_PRETOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r]"


def bpe_token_count(col: Column) -> Column:
    """Subword-ish token count over the BPE pretokenizer classes —
    the cheap proxy for LLM token budgeting at corpus scale."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_PRETOKEN_RE), F.lit(0))).cast("long")


def _stop_hits(toks: Column, words: tuple[str, ...]) -> Column:
    wl = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(wl, t)))


def lang_id(col: Column) -> Column:
    """Stopword-hit language guess with deterministic precedence.

    A production pipeline would use a character-n-gram model; the
    stopword heuristic is the SQL-expressible baseline whose decisions
    are reproducible in any engine.
    """
    toks = tokens(col)
    hits = {lang: _stop_hits(toks, words) for lang, words in STOPWORDS.items()}
    langs = list(STOPWORDS)
    expr = None
    for lang in langs:
        cond = None
        for other in langs:
            if other == lang:
                continue
            # strictly-greater for languages earlier in precedence,
            # greater-or-equal beats later ones
            c = (
                hits[lang] >= hits[other]
                if langs.index(other) > langs.index(lang)
                else hits[lang] > hits[other]
            )
            cond = c if cond is None else (cond & c)
        expr = (
            F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
        )
    return expr.otherwise(F.lit(langs[0]))


def quality_score(col: Column) -> Column:
    """Composite quality heuristic in [0, 2]: stopword density +
    length saturation. Deterministic double arithmetic (oracle-parity).
    """
    toks = tokens(col)
    n_tokens = F.size(toks).cast("double")
    stop_ratio = _stop_hits(toks, STOPWORDS["en"]).cast("double") / n_tokens
    len_sat = F.least(F.lit(1.0), n_tokens / F.lit(100.0))
    return stop_ratio + len_sat


def fingerprint(col: Column) -> Column:
    """Content fingerprint: md5 of whitespace-normalized lowercase text.

    The exact-dedup key. (A rolling Rabin-Karp variant lives in the
    kernel tests; md5 is the cross-engine-reproducible form.)
    """
    return F.md5(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "))


def canonicalize(col: Column, fold_digits: bool = False) -> Column:
    """Dedup-grade text canonicalization, pure Catalyst: lowercase,
    strip punctuation (everything outside [a-z0-9 ] after lowering),
    collapse whitespace runs, trim. ``fold_digits=True`` additionally
    maps every digit to ``0`` (catches near-dups differing only in
    ids/dates/counters — the news-article case).

    Feeding :func:`fingerprint` / MinHash with canonicalized text makes
    exact and near dedup robust to formatting noise; all steps are
    engine-portable string functions (the DuckDB oracle spells them
    with the same regexes), so canonicalized pipelines stay
    oracle-checkable.
    """
    c = F.lower(col)
    c = F.regexp_replace(c, r"[^a-z0-9\s]", " ")
    if fold_digits:
        c = F.regexp_replace(c, r"[0-9]", "0")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)
