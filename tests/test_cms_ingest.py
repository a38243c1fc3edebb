"""Streaming boilerplate-strip-on-ingest against the persisted CMS.

The family contract (same as the bloom/minhash/winnow ingests):
threshold behavior across batches, epoch-replay idempotence, and a
full availableNow stream run.
"""

import pytest
from pyspark.sql import functions as F

from polars_matmul_spark.streaming.cms_ingest import (
    cms_strip_ingest_batch,
    run_cms_strip_stream,
)

W, D, MIN_DOCS = 4096, 5, 3

BOILER = "ALL RIGHTS RESERVED"


def _docs(spark, ids, with_boiler=True):
    rows = [
        (i, (BOILER + "\nbody text %d" % i) if with_boiler else "body text %d" % i)
        for i in ids
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _read_out(spark, out_dir):
    return spark.read.parquet(out_dir)


@pytest.mark.slow
def test_strip_threshold_crosses_across_batches(spark, tmp_path):
    cms_dir, out_dir = str(tmp_path / "cms"), str(tmp_path / "out")
    # batch 0: one boilerplate occurrence — below min_docs, kept
    cms_strip_ingest_batch(
        spark, _docs(spark, [0]), 0, cms_dir, out_dir, W, D, MIN_DOCS
    )
    out0 = _read_out(spark, out_dir).filter(F.col("epoch") == 0).collect()
    assert all(BOILER in r["text"] for r in out0)
    # batch 1 carries two more boilerplate docs: history(1) + batch(2)
    # = 3 >= min_docs -> stripped ON ARRIVAL for this batch
    cms_strip_ingest_batch(
        spark, _docs(spark, [1, 2]), 1, cms_dir, out_dir, W, D, MIN_DOCS
    )
    out1 = _read_out(spark, out_dir).filter(F.col("epoch") == 1).collect()
    assert len(out1) == 2
    assert all(BOILER not in r["text"] for r in out1)
    assert all("body text" in r["text"] for r in out1)  # bodies survive
    # a later clean batch is untouched
    cms_strip_ingest_batch(
        spark, _docs(spark, [3], with_boiler=False), 2, cms_dir, out_dir, W, D, MIN_DOCS
    )
    out2 = _read_out(spark, out_dir).filter(F.col("epoch") == 2).collect()
    assert [r["n_stripped"] for r in out2] == [0]


def test_epoch_replay_is_idempotent(spark, tmp_path):
    cms_dir, out_dir = str(tmp_path / "cms"), str(tmp_path / "out")
    cms_strip_ingest_batch(
        spark, _docs(spark, [0, 1]), 0, cms_dir, out_dir, W, D, MIN_DOCS
    )
    first_cms = sorted(
        map(tuple, spark.read.parquet(cms_dir).select("row", "col", "n").collect())
    )
    first_out = sorted(map(tuple, _read_out(spark, out_dir).collect()))
    # crash-replay: the SAME batch re-runs with the same epoch id —
    # counters must not double (epoch dir overwrites itself) and the
    # cleaned output must be identical
    cms_strip_ingest_batch(
        spark, _docs(spark, [0, 1]), 0, cms_dir, out_dir, W, D, MIN_DOCS
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
    # the file stream source reads FLAT files: lift each part file out
    # of its write directory (the bloom-ingest test's staging trick)
    for i, f in enumerate(sorted(glob.glob(f"{input_dir}/stage_*/part-*.parquet"))):
        shutil.move(f, f"{input_dir}/batch_{i}.parquet")
    for d in glob.glob(f"{input_dir}/stage_*"):
        shutil.rmtree(d)
    cms_dir, out_dir = str(tmp_path / "cms"), str(tmp_path / "out")
    q = run_cms_strip_stream(
        spark,
        input_dir,
        cms_dir,
        out_dir,
        str(tmp_path / "ckpt"),
        width=W,
        depth=D,
        min_docs=MIN_DOCS,
        max_files_per_trigger=1,
    )
    assert q.lastProgress is not None
    out = _read_out(spark, out_dir)
    assert out.count() == 4  # every doc lands exactly once
    # the sketch saw all four boilerplate-bearing lines' docs; at least
    # the post-threshold arrivals are clean, and nobody's body is lost
    assert out.filter(F.col("text").contains("body text")).count() == 4
    assert out.filter(F.col("n_stripped") > 0).count() >= 1


def test_width_depth_guardrails(spark, tmp_path):
    with pytest.raises(ValueError):
        cms_strip_ingest_batch(
            spark, _docs(spark, [0]), 0, str(tmp_path / "c"), str(tmp_path / "o"),
            width=0, depth=5,
        )
