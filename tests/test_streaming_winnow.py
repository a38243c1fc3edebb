"""Streaming substring dedup-on-ingest (streaming/winnow_ingest.py):
planted EMBEDDED-span dups (not exact copies — low set-Jaccard, new
exact fingerprint, shared verbatim substring) are rejected across
batches, within-batch overlap clusters collapse to the lowest id,
epoch replay is idempotent, and pure-novel docs always land."""

from __future__ import annotations

import glob
import shutil

import pytest
from pyspark.sql import functions as F

from polars_matmul_spark.streaming.winnow_ingest import (
    run_winnow_ingest_stream,
    winnow_ingest_batch,
)

# long distinctive spans; k=8, window=4 => any shared verbatim span of
# >= 11 chars guarantees a shared selected fingerprint
_SPAN_A = "the quick brown fox jumps over the lazy dog again and again"
_SPAN_B = "pack my box with five dozen liquor jugs every single morning"


def _mk_input(spark, root):
    """Two file-batches. batch0: three pure-novel docs (spans A, B and
    a C-doc). batch1: two novel docs PLUS one doc that EMBEDS span A
    inside otherwise-new text (cross-batch substring dup) and a pair
    of docs both embedding one new span (within-batch cluster)."""
    inp = str(root / "in")
    # NB: every "novel" doc must avoid sharing ANY >= k+w-1 = 11 char
    # span with any other — innocuous phrases like "document contains"
    # are already substring dups to the winnower (the first fixture
    # draft planted exactly that bug in itself)
    b0 = [
        (0, f"alpha intro {_SPAN_A} omega outro"),
        (1, f"beta preamble {_SPAN_B} gamma coda"),
        (2, "curious zebras vault mossy fjords while quails hum"),
    ]
    shared = "a freshly minted span that two batch-one docs both carry"
    b1 = [
        (100, "velvet compass drifts north beyond amber signal towers"),
        (101, "nimble otters juggle copper rings under winter lanterns"),
        # embeds span A from batch 0 => substring dup, must be rejected
        (102, f"totally different frame but quoting {_SPAN_A} verbatim"),
        # within-batch cluster: 103 survives (lowest), 104 drops
        (103, f"first holder of {shared} right here"),
        (104, f"second keeper of {shared} appears later"),
    ]
    for i, rows in enumerate((b0, b1)):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        df.coalesce(1).write.parquet(f"{inp}/tmp{i}")
        part = sorted(glob.glob(f"{inp}/tmp{i}/part-*.parquet"))[0]
        shutil.move(part, f"{inp}/batch{i}.parquet")
        shutil.rmtree(f"{inp}/tmp{i}")
    return inp


@pytest.fixture(scope="module")
def ingest_dirs(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("winnow_ingest")
    inp = _mk_input(spark, root)
    index, corpus, ckpt = (str(root / d) for d in ("index", "corpus", "ckpt"))
    run_winnow_ingest_stream(spark, inp, index, corpus, ckpt)
    return inp, index, corpus


class TestWinnowIngest:
    def test_novel_docs_accepted(self, spark, ingest_dirs):
        _, _, corpus_dir = ingest_dirs
        ids = {r.doc_id for r in spark.read.parquet(corpus_dir).collect()}
        assert {0, 1, 2, 100, 101} <= ids

    def test_cross_batch_embedded_span_rejected(self, spark, ingest_dirs):
        _, _, corpus_dir = ingest_dirs
        ids = {r.doc_id for r in spark.read.parquet(corpus_dir).collect()}
        assert 102 not in ids  # embeds span A accepted in batch 0

    def test_within_batch_cluster_lowest_id_wins(self, spark, ingest_dirs):
        _, _, corpus_dir = ingest_dirs
        ids = {r.doc_id for r in spark.read.parquet(corpus_dir).collect()}
        assert 103 in ids and 104 not in ids

    def test_index_covers_accepted_docs_only(self, spark, ingest_dirs):
        _, index_dir, corpus_dir = ingest_dirs
        idx_ids = {
            r.doc_id for r in spark.read.parquet(index_dir).select("doc_id").distinct().collect()
        }
        acc_ids = {r.doc_id for r in spark.read.parquet(corpus_dir).collect()}
        assert idx_ids == acc_ids

    def test_epoch_replay_idempotent(self, spark, ingest_dirs):
        # re-running the LAST batch with its own epoch id must leave
        # the corpus unchanged: its docs find themselves in the index
        # (self-id guard) and its epoch dirs overwrite in place
        inp, index_dir, corpus_dir = ingest_dirs
        before = sorted(
            (r.doc_id, r.text)
            for r in spark.read.parquet(corpus_dir).collect()
        )
        batch1 = spark.read.parquet(f"{inp}/batch1.parquet")
        winnow_ingest_batch(spark, batch1, 1, index_dir, corpus_dir)
        after = sorted(
            (r.doc_id, r.text)
            for r in spark.read.parquet(corpus_dir).collect()
        )
        assert after == before


def test_ingest_cap_threads_into_within_batch_collapse(spark, tmp_path):
    # max_hash_docs must reach BOTH stages: with the cap disabled
    # (None), a batch whose duplicates share only a ubiquitous
    # fingerprint still collapses; the "auto"/int paths resolve once
    # per batch instead of re-counting per stage
    from polars_matmul_spark.streaming.winnow_ingest import winnow_ingest_batch

    boiler = "0123456789abcdef" * 4  # one long shared span
    rows = [(i, boiler) for i in range(6)]  # 6 exact-span duplicates
    batch = spark.createDataFrame(rows, "doc_id long, text string")
    idx, corp = str(tmp_path / "idx"), str(tmp_path / "corp")
    winnow_ingest_batch(
        spark, batch, 0, idx, corp, k=8, window=4, max_hash_docs=None
    )
    acc = spark.read.parquet(corp)
    # all six share every fingerprint -> one canonical survivor
    assert acc.count() == 1 and acc.first()["doc_id"] == 0
