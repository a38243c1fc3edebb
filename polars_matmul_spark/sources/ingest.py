"""Robust raw-text ingestion: JSONL/CSV with corrupt-record quarantine.

Real training-data feeds are dirty: truncated JSON lines from a killed
writer, mixed schemas from upstream deploys, stray unquoted delimiters.
At 100 TB the two failure modes to avoid are (a) FAILFAST aborting a
day-long job on the one bad line in file 93_412, and (b) PERMISSIVE
silently nulling whole rows so corruption shows up later as a data-
quality mystery. The quarantine pattern threads that needle:

    good, bad = read_jsonl_quarantine(spark, path, schema)

- ``good`` carries only rows the schema fully parsed;
- ``bad`` carries the RAW text of every rejected line (plus the source
  file), ready to persist next to the run for inspection/replay.

Mechanics: ONE ``spark.read.text`` scan (each line is data, nothing is
interpreted at scan time), then ``from_json``/``from_csv`` with
PERMISSIVE mode and ``columnNameOfCorruptRecord`` parses each line
into a struct whose corrupt field is non-null exactly when parsing or
type conversion failed. The good/bad split is a filter on that field.
Parsing is row-local Catalyst — no shuffle, no Python — and the raw
line is first-class, which also sidesteps Spark's
QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction on querying the corrupt
column straight off a raw JSON/CSV scan.

Nothing is dropped silently and nothing aborts: the bad-row count is
the pipeline's ingest health metric (feed it to ``profile_diff``
across batches to catch an upstream format break the day it ships).

Schema discipline at scale: always PASS a schema. Inference
(``spark.read.json`` without one) costs a full extra scan and locks in
whatever the first day's data happened to look like.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["read_jsonl_quarantine", "read_csv_quarantine"]

_CORRUPT = "__corrupt_record"


def _with_corrupt_field(schema: T.StructType) -> T.StructType:
    if _CORRUPT in schema.fieldNames():
        raise ValueError(f"schema already defines {_CORRUPT!r}")
    return T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType(), True)]
    )


def _split_parsed(
    raw: DataFrame, parsed_col, data_cols: list[str]
) -> tuple[DataFrame, DataFrame]:
    df = raw.withColumn("__p", parsed_col)
    ok = F.col("__p").isNotNull() & F.col(f"__p.{_CORRUPT}").isNull()
    good = df.filter(ok).select(*[F.col(f"__p.{c}").alias(c) for c in data_cols])
    bad = df.filter(~ok).select("raw", "source_file")
    return good, bad


def _raw_lines(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.text(path).select(
        F.col("value").alias("raw"), F.input_file_name().alias("source_file")
    )


def read_jsonl_quarantine(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """(good, bad) from newline-delimited JSON under ``path``.

    A line lands in ``bad`` (raw text + source file) when it is not
    valid JSON or any field fails to convert to the schema's type;
    ``good`` rows parsed completely. One text scan, row-local parse,
    split by a filter — each side prunes independently under Catalyst.
    """
    full = _with_corrupt_field(schema)
    raw = _raw_lines(spark, path)
    parsed = F.from_json(
        F.col("raw"),
        full,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT},
    )
    return _split_parsed(raw, parsed, schema.fieldNames())


def read_csv_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    **options: str,
) -> tuple[DataFrame, DataFrame]:
    """(good, bad) from CSV under ``path`` — the JSONL contract for
    delimited files (malformed quoting, wrong column count, type-cast
    failures all quarantine instead of nulling or aborting). Extra
    ``options`` pass through to ``from_csv`` (sep, quote, ...).

    With ``header=True`` header lines are dropped by PARSING each raw
    line as strings (same ``options``, so quoting/sep are honored) and
    comparing every field — trimmed, case-insensitively — against the
    schema's field names (the text source has no per-file header
    notion — the raw-line scan sees every line). Tolerant on purpose:
    ``"Doc_ID", text`` still reads as a header for schema
    ``(doc_id, text)``; the round-6 ADVICE failure mode (a real header
    with quotes/whitespace/case landing in ``bad`` and polluting the
    quarantine metric) is gone. The converse holds as before: a
    content line whose fields spell the column names is dropped too;
    pass header=False for headerless feeds. Headers whose NAMES differ
    from the schema's (renamed upstream columns) still quarantine —
    that is a real format break and belongs in the metric.
    """
    full = _with_corrupt_field(schema)
    opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT}
    opts.update(options)
    raw = _raw_lines(spark, path)
    names = schema.fieldNames()
    if header:
        # parse the candidate line with the caller's own csv options
        # (quote, sep/delimiter alias, escape ...) into all-strings,
        # then field-wise tolerant compare — null-safe: a line with
        # fewer columns yields null fields -> coalesce(False) -> kept
        hdr_schema = ", ".join(f"`__h{i}` string" for i in range(len(names)))
        hdr = F.from_csv(F.col("raw"), hdr_schema, dict(options))
        # a quote that follows leading whitespace is literal to the
        # csv parser (` "SCORE"` parses as `"SCORE"` with the quotes),
        # so after trimming also strip one surrounding quote pair
        def _canon(c):
            return F.lower(
                F.trim(F.regexp_replace(F.trim(c), '^"(.*)"$', "$1"))
            )

        is_hdr = F.lit(True)
        for i, name in enumerate(names):
            is_hdr = is_hdr & (_canon(hdr.getField(f"__h{i}")) == name.lower())
        raw = (
            raw.withColumn("__is_hdr", F.coalesce(is_hdr, F.lit(False)))
            .filter(~F.col("__is_hdr"))
            .drop("__is_hdr")
        )
    parsed = F.from_csv(F.col("raw"), full.simpleString(), opts)
    return _split_parsed(raw, parsed, names)
