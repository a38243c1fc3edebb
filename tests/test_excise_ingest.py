"""Streaming span-excision-on-ingest against the persisted gram CMS.

The family contract (same as the bloom/minhash/winnow/cms-strip
ingests): threshold behavior across batches, epoch-replay idempotence,
and a full availableNow stream run. Plus the batch-side equivalence:
the CMS excision matches the exact strip-everywhere operator
bit-for-bit when the sketch is generously sized.
"""

import pytest
from pyspark.sql import functions as F

from polars_matmul_spark.streaming.excise_ingest import (
    excise_ingest_batch,
    run_excise_stream,
)

K, W, D, MIN_DOCS = 12, 65536, 5, 2

BOILER = "VERBATIM-LICENSE-PARAGRAPH-COPIED-EVERYWHERE"


def _docs(spark, ids, with_boiler=True):
    rows = [
        (
            i,
            f"u{i}q{i}w{i} {BOILER} {i}zz{i}end" if with_boiler else f"clean{i} only",
        )
        for i in ids
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _read_out(spark, out_dir):
    return spark.read.parquet(out_dir)


def test_cms_excise_matches_exact_when_generously_sized(spark):
    from polars_matmul_spark.operators.winnow import (
        build_gram_cms,
        excise_duplicate_spans,
        excise_duplicate_spans_cms,
    )

    docs = _docs(spark, range(8)).union(_docs(spark, range(100, 104), False))
    cms = build_gram_cms(docs, K, W, D)
    got = sorted(
        map(
            tuple,
            excise_duplicate_spans_cms(
                docs, cms, K, W, D, min_docs=MIN_DOCS
            ).collect(),
        )
    )
    exact = sorted(
        map(
            tuple,
            excise_duplicate_spans(
                docs, k=K, min_docs=MIN_DOCS, keep_first=False
            ).collect(),
        )
    )
    # collected-row comparison (not exceptAll): the two frames share
    # docs' lineage, and exceptAll over frames with overlapping
    # attribute ids proved flaky in the incremental-excise test
    assert got == exact
    # and the planted span is genuinely gone from every copy
    assert all(BOILER not in t for _, t, _, _ in got)


def test_cms_excise_is_incremental(spark):
    # merged per-batch sketches excise identically to the sketch built
    # over the full corpus — history never re-scans
    from polars_matmul_spark.operators.cms import merge_cms
    from polars_matmul_spark.operators.winnow import (
        build_gram_cms,
        excise_duplicate_spans_cms,
    )

    docs = _docs(spark, range(6))
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    merged = merge_cms(
        build_gram_cms(b1, K, W, D), build_gram_cms(b2, K, W, D)
    )
    full = build_gram_cms(docs, K, W, D)
    a = sorted(
        map(
            tuple,
            excise_duplicate_spans_cms(
                docs, merged, K, W, D, min_docs=MIN_DOCS
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            excise_duplicate_spans_cms(
                docs, full, K, W, D, min_docs=MIN_DOCS
            ).collect(),
        )
    )
    assert a == b


def test_excise_threshold_crosses_across_batches(spark, tmp_path):
    cms_dir, out_dir = str(tmp_path / "cms"), str(tmp_path / "out")
    # batch 0: one copy of the span — below min_docs, kept
    excise_ingest_batch(
        spark, _docs(spark, [0]), 0, cms_dir, out_dir, K, W, D, MIN_DOCS
    )
    out0 = _read_out(spark, out_dir).filter(F.col("epoch") == 0).collect()
    assert all(BOILER in r["text"] for r in out0)
    # batch 1 carries a second copy: history(1) + batch(1) = 2 >=
    # min_docs -> cut ON ARRIVAL for this batch
    excise_ingest_batch(
        spark, _docs(spark, [1]), 1, cms_dir, out_dir, K, W, D, MIN_DOCS
    )
    out1 = _read_out(spark, out_dir).filter(F.col("epoch") == 1).collect()
    assert len(out1) == 1
    assert BOILER not in out1[0]["text"]
    assert "1zz1end" in out1[0]["text"] and "u1q1w1" in out1[0]["text"]
    assert out1[0]["n_spans_removed"] >= 1
    # a later clean batch is untouched
    excise_ingest_batch(
        spark, _docs(spark, [3], False), 2, cms_dir, out_dir, K, W, D, MIN_DOCS
    )
    out2 = _read_out(spark, out_dir).filter(F.col("epoch") == 2).collect()
    assert [r["n_spans_removed"] for r in out2] == [0]


def test_epoch_replay_is_idempotent(spark, tmp_path):
    cms_dir, out_dir = str(tmp_path / "cms"), str(tmp_path / "out")
    excise_ingest_batch(
        spark, _docs(spark, [0, 1]), 0, cms_dir, out_dir, K, W, D, MIN_DOCS
    )
    first_cms = sorted(
        map(tuple, spark.read.parquet(cms_dir).select("row", "col", "n").collect())
    )
    first_out = sorted(map(tuple, _read_out(spark, out_dir).collect()))
    # crash-replay: the SAME batch re-runs with the same epoch id —
    # counters must not double and the cleaned output is identical
    excise_ingest_batch(
        spark, _docs(spark, [0, 1]), 0, cms_dir, out_dir, K, W, D, MIN_DOCS
    )
    again_cms = sorted(
        map(tuple, spark.read.parquet(cms_dir).select("row", "col", "n").collect())
    )
    again_out = sorted(map(tuple, _read_out(spark, out_dir).collect()))
    assert first_cms == again_cms
    assert first_out == again_out


def test_full_stream_run(spark, tmp_path):
    import glob
    import shutil

    input_dir = str(tmp_path / "in")
    for i, ids in enumerate([[0], [1, 2], [5]]):
        _docs(spark, ids, with_boiler=(i < 2)).coalesce(1).write.parquet(
            f"{input_dir}/stage_{i}"
        )
    for i, f in enumerate(sorted(glob.glob(f"{input_dir}/stage_*/part-*.parquet"))):
        shutil.move(f, f"{input_dir}/batch_{i}.parquet")
    for d in glob.glob(f"{input_dir}/stage_*"):
        shutil.rmtree(d)
    cms_dir, out_dir = str(tmp_path / "cms"), str(tmp_path / "out")
    q = run_excise_stream(
        spark,
        input_dir,
        cms_dir,
        out_dir,
        str(tmp_path / "ckpt"),
        k=K,
        width=W,
        depth=D,
        min_docs=MIN_DOCS,
        max_files_per_trigger=1,
    )
    assert q.lastProgress is not None
    out = _read_out(spark, out_dir)
    assert out.count() == 4  # every doc lands exactly once
    # post-threshold arrivals are clean; every unique tail survives
    assert out.filter(F.col("n_spans_removed") > 0).count() >= 1
    kept = {r["doc_id"]: r["text"] for r in out.collect()}
    for i in [0, 1, 2]:
        assert f"{i}zz{i}end" in kept[i]
    assert kept[5] == "clean5 only"


def test_guardrails(spark, tmp_path):
    from polars_matmul_spark.operators.winnow import excise_duplicate_spans_cms

    docs = _docs(spark, [0])
    from polars_matmul_spark.operators.winnow import build_gram_cms

    cms = build_gram_cms(docs, K, W, D)
    with pytest.raises(ValueError):
        excise_duplicate_spans_cms(docs, cms, k=0, width=W, depth=D)
    with pytest.raises(ValueError):
        excise_duplicate_spans_cms(docs, cms, k=K, width=W, depth=D, min_docs=1)
