"""Streaming per-domain quota on ingest (streaming/urls.py): the
accepted corpus a multi-micro-batch stream builds must equal the
batch arrival-order quota over the whole feed (window by domain,
ranked by doc_id, rank <= max) — stream == batch, the repo's
streaming contract — and the quota must hold ACROSS epochs."""

import glob
import shutil

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from polars_matmul_spark.operators.urls import with_registrable_domain
from polars_matmul_spark.streaming.urls import (
    domain_quota_batch,
    run_domain_quota_stream,
)

MAX = 3


def _rows(ids, host):
    return [(i, f"http://{host}/p{i}", f"text {i}") for i in ids]


@pytest.fixture(scope="module")
def quota_stream(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("urlquota")
    inp, acc, ckpt = (str(root / d) for d in ("in", "accepted", "ckpt"))
    # spam.com sends 4 docs in batch A (one over quota) and 3 more in
    # batch B (all over); ok.org stays under; a *.pages.dev user-site
    # pair must count as TWO domains under the PSL
    batch_a = (
        _rows([1, 2, 3, 4], "spam.com")
        + _rows([5], "ok.org")
        + _rows([6], "alice.pages.dev")
    )
    batch_b = (
        _rows([7, 8, 9], "spam.com")
        + _rows([10], "ok.org")
        + _rows([11], "bob.pages.dev")
    )
    for i, rows in enumerate([batch_a, batch_b]):
        spark.createDataFrame(
            rows, "doc_id long, url string, text string"
        ).coalesce(1).write.parquet(f"{inp}/b{i}")
    flat = sorted(glob.glob(f"{inp}/*/part-*.parquet"))
    for i, f in enumerate(flat):
        shutil.move(f, f"{inp}/batch{i}.parquet")
    shutil.rmtree(f"{inp}/b0"), shutil.rmtree(f"{inp}/b1")

    psl = spark.createDataFrame(
        [("com",), ("org",), ("pages.dev",)], "suffix string"
    )
    run_domain_quota_stream(
        spark, inp, acc, ckpt, max_per_domain=MAX, psl=psl
    )
    return inp, acc, psl


class TestDomainQuotaStream:
    def test_quota_holds_across_epochs(self, spark, quota_stream):
        _inp, acc, _psl = quota_stream
        per_domain = (
            spark.read.parquet(acc)
            .groupBy("domain_key")
            .count()
            .collect()
        )
        counts = {r.domain_key: r["count"] for r in per_domain}
        # spam.com hit the cap in batch A and got nothing in batch B
        assert counts == {
            "spam.com": MAX,
            "ok.org": 2,
            "alice.pages.dev": 1,
            "bob.pages.dev": 1,
        }

    def test_stream_equals_batch_arrival_order(self, spark, quota_stream):
        inp, acc, psl = quota_stream
        feed = spark.read.parquet(inp)  # doc_id order == arrival order
        keyed = with_registrable_domain(feed, psl=psl)
        w = Window.partitionBy("domain_key").orderBy(F.col("doc_id").asc())
        batch_ref = (
            keyed.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= MAX)
            .select("doc_id")
        )
        got = sorted(r.doc_id for r in spark.read.parquet(acc).collect())
        want = sorted(r.doc_id for r in batch_ref.collect())
        assert got == want and 4 not in got and 7 not in got

    def test_replay_of_own_epoch_is_idempotent(self, spark, quota_stream):
        inp, acc, psl = quota_stream
        before = sorted(
            (r.doc_id, r.domain_key)
            for r in spark.read.parquet(acc).collect()
        )
        # replay epoch 0 with its original batch: the epoch guard must
        # ignore the epoch's own committed rows, reproducing the same
        # decisions instead of finding the quota "already used"
        batch0 = spark.read.parquet(f"{inp}/batch0.parquet")
        domain_quota_batch(
            spark, batch0, 0, acc, max_per_domain=MAX, psl=psl
        )
        after = sorted(
            (r.doc_id, r.domain_key)
            for r in spark.read.parquet(acc).collect()
        )
        assert before == after

    def test_rejects_bad_cap(self, spark, quota_stream):
        inp, acc, psl = quota_stream
        batch0 = spark.read.parquet(f"{inp}/batch0.parquet")
        with pytest.raises(ValueError, match="max_per_domain"):
            domain_quota_batch(spark, batch0, 99, acc, max_per_domain=0)
