"""Streaming decontamination-on-ingest (streaming/decontaminate.py):
with a static probe catalog the union of clean epochs must equal the
batch tag_contaminated anti-join over the whole feed (stream == batch,
the repo's streaming contract); probe sets landing BETWEEN stream runs
take effect on later epochs only (arrival-time semantics, pinned); and
replaying an epoch rewrites identical outputs (idempotence)."""

import glob

import pytest
from pyspark.sql import functions as F

from polars_matmul_spark.operators.text_filters import tag_contaminated
from polars_matmul_spark.streaming.decontaminate import (
    decontaminate_ingest_batch,
    run_decontaminate_stream,
)

# an 8-token probe phrase and documents embedding it verbatim
_P1 = "alpha bravo charlie delta echo foxtrot golf hotel"
_P2 = "nine ten eleven twelve thirteen fourteen fifteen sixteen"
_FILLER = "lorem ipsum dolor sit amet consectetur adipiscing elit"


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def dirs(tmp_path):
    d = {
        k: str(tmp_path / k)
        for k in ("in", "probes", "clean", "flagged", "ckpt")
    }
    return d


@pytest.mark.slow
def test_stream_equals_batch_static_probes(spark, dirs):
    rows = [
        (1, f"{_FILLER} {_P1} {_FILLER}"),
        (2, f"{_FILLER} {_FILLER}"),
        (3, f"prefix {_P1}"),
        (4, "unrelated text entirely here again and again and again"),
    ]
    # two input files -> two micro-batches
    _docs_df(spark, rows[:2]).coalesce(1).write.parquet(f"{dirs['in']}/f0")
    _docs_df(spark, rows[2:]).coalesce(1).write.parquet(f"{dirs['in']}/f1")
    spark.createDataFrame([(100, _P1)], "probe_id long, text string").write.parquet(
        dirs["probes"]
    )

    run_decontaminate_stream(
        spark, f"{dirs['in']}/*", dirs["probes"], dirs["clean"],
        dirs["flagged"], dirs["ckpt"],
    )

    clean = spark.read.parquet(dirs["clean"])
    flagged = spark.read.parquet(dirs["flagged"])
    assert sorted(r.doc_id for r in clean.collect()) == [2, 4]
    got = {r.doc_id: (r.n_hits, r.probe_ids) for r in flagged.collect()}
    assert set(got) == {1, 3}
    assert got[1] == (1, "100") and got[3] == (1, "100")

    # stream == batch: the same decision over the whole feed at once
    allb = _docs_df(spark, rows)
    probes = spark.createDataFrame([(100, _P1)], "probe_id long, text string")
    bflag = tag_contaminated(allb, probes)
    bclean = allb.join(bflag.select("doc_id"), "doc_id", "left_anti")
    assert sorted(r.doc_id for r in bclean.collect()) == sorted(
        r.doc_id for r in clean.collect()
    )


@pytest.mark.slow
def test_probe_growth_arrival_time_semantics(spark, dirs):
    # run 1: only P1 exists -> doc 10 (contains P2!) passes clean
    _docs_df(spark, [(10, f"{_FILLER} {_P2}")]).coalesce(1).write.parquet(
        f"{dirs['in']}/f0"
    )
    spark.createDataFrame([(100, _P1)], "probe_id long, text string").write.mode(
        "append"
    ).parquet(dirs["probes"])
    run_decontaminate_stream(
        spark, f"{dirs['in']}/*", dirs["probes"], dirs["clean"],
        dirs["flagged"], dirs["ckpt"],
    )
    assert sorted(r.doc_id for r in spark.read.parquet(dirs["clean"]).collect()) == [10]

    # probe set grows BETWEEN runs; a NEW doc with P2 is now flagged,
    # and the earlier admission is not revisited
    spark.createDataFrame([(200, _P2)], "probe_id long, text string").write.mode(
        "append"
    ).parquet(dirs["probes"])
    _docs_df(spark, [(11, f"{_P2} tail"), (12, _FILLER)]).coalesce(1).write.parquet(
        f"{dirs['in']}/f1"
    )
    run_decontaminate_stream(
        spark, f"{dirs['in']}/*", dirs["probes"], dirs["clean"],
        dirs["flagged"], dirs["ckpt"],
    )
    clean_ids = sorted(r.doc_id for r in spark.read.parquet(dirs["clean"]).collect())
    assert clean_ids == [10, 12]  # 10 stays admitted, 11 flagged late
    flagged = {r.doc_id: r.probe_ids for r in spark.read.parquet(dirs["flagged"]).collect()}
    assert flagged == {11: "200"}


def test_epoch_replay_idempotent(spark, dirs):
    batch = _docs_df(spark, [(1, f"{_P1} x"), (2, "plain words only")])
    spark.createDataFrame([(100, _P1)], "probe_id long, text string").write.parquet(
        dirs["probes"]
    )
    for _ in range(2):  # replay the same epoch
        decontaminate_ingest_batch(
            spark, batch, 7, dirs["probes"], dirs["clean"], dirs["flagged"]
        )
    clean = spark.read.parquet(dirs["clean"])
    assert [r.doc_id for r in clean.collect()] == [2]
    assert len(glob.glob(f"{dirs['clean']}/epoch=*")) == 1


def test_empty_probe_catalog_admits_everything(spark, dirs):
    batch = _docs_df(spark, [(1, f"{_P1} x"), (2, "plain")])
    decontaminate_ingest_batch(
        spark, batch, 0, dirs["probes"], dirs["clean"], dirs["flagged"]
    )
    assert sorted(r.doc_id for r in spark.read.parquet(dirs["clean"]).collect()) == [1, 2]
    assert spark.read.parquet(dirs["flagged"]).count() == 0
