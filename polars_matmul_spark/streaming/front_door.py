"""Streaming crawl front door — the END-TO-END composition of the
ingest modalities this package gates one-by-one: each micro-batch of
raw WARC payloads runs, in ONE foreachBatch epoch,

    WARC extraction    operators.warc.warc_table (gzip members + ISO
                       28500 framing + HTTP split)
    HTML extraction    operators.html strip/title/link-density gate
    URL quota          streaming.urls.domain_quota_batch
    hygiene            streaming.cms_ingest (frequent-line strip) then
                       streaming.excise_ingest (cross-doc span excision)
    dedup              streaming.bloom_ingest (exact) then
                       streaming.ingest (MinHash near-dup)
    decontamination    streaming.decontaminate (probe n-gram gate)

i.e. the streaming twin of the batch dry run's stages 01-08
(examples/curation_dry_run.py; the r9 verdict's "Next round #5").

Composition contract: every sub-stage keeps its OWN epoch-sink
protocol (overwritten ``epoch=N`` dir + crash-replay guard reading
``epoch != epoch_id`` history), and each stage's epoch output IS the
next stage's input — read back from the just-written ``epoch=N`` dir,
exactly how a production pipeline chains checkpointed stages. Replaying
an epoch therefore re-runs the whole chain against the same history
view at every stage, reproducing every intermediate and final write
bit-for-bit (idempotence is compositional because each link is
idempotent; pytest-gated in tests/test_streaming_front_door.py).

Scale notes: nothing here adds state or shuffles beyond what the
component loops already carry — the quota's (domain_key, count)
aggregate, the two CMS sketches (KBs regardless of corpus size), the
Bloom bitmap (MBs), the MinHash band index (slim longs), and the
broadcast probe-gram table. Bodies cross the wire once per stage
boundary (the parquet checkpoint a production run would do anyway);
pixels/payloads never re-shuffle inside a stage.

Ordering note (measured by the batch dry run): hygiene runs BEFORE
near-dup on purpose — excising shared spans first keeps unique prose
from both copies of a near-dup pair, where dedup-first would drop one
copy whole.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polars_matmul_spark.streaming.bloom_ingest import bloom_ingest_batch
from polars_matmul_spark.streaming.cms_ingest import cms_strip_ingest_batch
from polars_matmul_spark.streaming.decontaminate import (
    decontaminate_ingest_batch,
)
from polars_matmul_spark.streaming.excise_ingest import excise_ingest_batch
from polars_matmul_spark.streaming.ingest import ingest_documents_batch
from polars_matmul_spark.streaming.urls import domain_quota_batch

__all__ = ["front_door_batch", "run_front_door_stream", "STAGE_DIRS"]

# every state/sink directory the chain owns, relative to its root —
# one place, so tests and operators can never disagree on layout.
#
# Epoch-dir contract (relied on by replay — keep it when adding
# stages): a MISSING ``epoch=N`` dir under a stage is a valid state
# meaning "this stage emitted nothing for epoch N" — front_door_batch
# returns early when a stage's output is empty, so every LATER stage
# writes no epoch dir at all for that epoch. _epoch_output treats
# missing-dir and empty-dir identically (both -> None), so a replayed
# epoch takes the same early exit and reproduces the same absence.
STAGE_DIRS = {
    "head": "00_head",
    "quota": "01_quota_accepted",
    "line_cms": "02_line_cms",
    "line_clean": "02_line_clean",
    "gram_cms": "03_gram_cms",
    "excised": "03_excised",
    "bloom": "04_bloom",
    "bloom_corpus": "04_bloom_corpus",
    "minhash_index": "05_minhash_index",
    "minhash_corpus": "05_minhash_corpus",
    "clean": "06_clean",
    "flagged": "06_flagged",
}


def _epoch_output(spark: SparkSession, root: str, key: str, epoch_id: int):
    """Read back the stage output this epoch just wrote; None when the
    stage emitted nothing (an empty batch writes no parquet parts)."""
    from pyspark.errors import AnalysisException

    path = os.path.join(root, STAGE_DIRS[key], f"epoch={epoch_id}")
    try:
        df = spark.read.parquet(path)
    except AnalysisException:
        return None
    if not df.columns:
        return None
    return df


def front_door_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    epoch_id: int,
    state_root: str,
    probes_dir: str,
    max_per_domain: int = 1000,
    psl: DataFrame | None = None,
    line_min_docs: int = 3,
    excise_k: int = 20,
    excise_min_docs: int = 2,
    excise_cms_width: int = 65536,
    excise_cms_depth: int = 5,
    minhash_threshold: float = 0.8,
    decon_n: int = 8,
    decon_hash: str = "xxhash64",
    id_col: str = "asset_id",
    timings: dict | None = None,
) -> None:
    """Admit one micro-batch of raw WARC payloads
    (``id_col`` long, ``payload`` binary) through the whole front
    door; the surviving documents land in
    ``state_root/06_clean/epoch=N`` (with ``06_flagged`` carrying the
    decontamination rejects and each stage dir its own state).

    ``timings``: optional dict; each sub-stage appends its wall
    seconds to ``timings[stage]`` and each epoch-dir read-back to
    ``timings["readback"]`` — the observability the dry run reports
    (where does an epoch's wall actually go?).
    """
    import time as _time

    from polars_matmul_spark.operators.html import (
        extract_title,
        link_density,
        strip_html,
    )
    from polars_matmul_spark.operators.warc import warc_table

    def _dir(key: str) -> str:
        return os.path.join(state_root, STAGE_DIRS[key])

    _t = [_time.perf_counter()]

    def _mark(stage: str) -> None:
        now = _time.perf_counter()
        if timings is not None:
            timings.setdefault(stage, []).append(now - _t[0])
        _t[0] = now

    def _read(key: str):
        out = _epoch_output(spark, state_root, key, epoch_id)
        _mark("readback")
        return out

    # --- stateless head: WARC records -> boilerplate-gated HTML text
    records = warc_table(
        batch_df.select(id_col, "payload"), record_types={"response"}
    ).select(
        F.col(id_col).alias("doc_id"),
        F.col("target_uri").alias("url"),
        F.col("body").cast("string").alias("text"),
        "http_status",
    )
    docs = (
        records.filter(F.col("http_status") == 200)
        .withColumn("title", extract_title(F.col("text")))
        .withColumn("ldens", link_density(F.col("text")))
        .withColumn("text", strip_html(F.col("text")))
        .filter(F.col("ldens") < 0.9)
        .select("doc_id", "url", "title", "text")
    )
    # the head gate's epoch sink (round 11): the one stage boundary the
    # chain previously did not persist — rejected-at-head is the delta
    # of the raw batch vs this dir, and downstream consumers (the
    # driver row included) read the sunk set instead of re-deriving it.
    # The sink write doubles as the stage's materialization (the former
    # eager localCheckpoint would now be a second copy of the same
    # rows), and the read-back hands the next stage a clean scan.
    docs.write.mode("overwrite").parquet(
        os.path.join(_dir("head"), f"epoch={epoch_id}")
    )
    _mark("head")
    docs = _read("head")
    if docs is None:
        return

    # --- stateful chain: each stage admits, commits its epoch dir,
    # and hands its output to the next
    domain_quota_batch(
        spark, docs, epoch_id, _dir("quota"),
        max_per_domain=max_per_domain, psl=psl,
    )
    _mark("quota")
    cur = _read("quota")
    if cur is None:
        return
    # the hygiene protocol canonicalizes its input to (doc_id, text);
    # carry the crawl metadata around it and rejoin after excision
    extras = cur.select("doc_id", "url", "title", "domain_key")

    cms_strip_ingest_batch(
        spark, cur, epoch_id, _dir("line_cms"), _dir("line_clean"),
        min_docs=line_min_docs,
    )
    _mark("line_strip")
    cur = _read("line_clean")
    if cur is None:
        return

    # CMS sizing is the caller's contract: the sketch must keep
    # eps*N (N = distinct k-grams EVER inserted) well under
    # excise_min_docs or collisions excise unique prose (the CMS
    # error is one-sided). The default suits micro-batches; size up
    # for wide corpora.
    excise_ingest_batch(
        spark, cur, epoch_id, _dir("gram_cms"), _dir("excised"),
        k=excise_k, min_docs=excise_min_docs,
        width=excise_cms_width, depth=excise_cms_depth,
    )
    _mark("excise")
    cur = _read("excised")
    if cur is None:
        return
    cur = cur.join(extras, "doc_id")

    bloom_ingest_batch(
        spark, cur, epoch_id, _dir("bloom"), _dir("bloom_corpus")
    )
    _mark("bloom")
    cur = _read("bloom_corpus")
    if cur is None:
        return

    ingest_documents_batch(
        spark, cur, epoch_id, _dir("minhash_index"), _dir("minhash_corpus"),
        threshold=minhash_threshold,
    )
    _mark("minhash")
    cur = _read("minhash_corpus")
    if cur is None:
        return

    decontaminate_ingest_batch(
        spark, cur, epoch_id, probes_dir, _dir("clean"), _dir("flagged"),
        n=decon_n, hash_fn=decon_hash,
    )
    _mark("decontaminate")


def run_front_door_stream(
    spark: SparkSession,
    input_dir: str,
    state_root: str,
    probes_dir: str,
    checkpoint_dir: str,
    schema: str = "asset_id long, payload binary",
    max_per_domain: int = 1000,
    psl: DataFrame | None = None,
    line_min_docs: int = 3,
    excise_k: int = 20,
    excise_min_docs: int = 2,
    excise_cms_width: int = 65536,
    excise_cms_depth: int = 5,
    minhash_threshold: float = 0.8,
    decon_n: int = 8,
    decon_hash: str = "xxhash64",
    max_files_per_trigger: int = 1,
    timings: dict | None = None,
):
    """Drive the front door over a WARC payload file stream
    (availableNow); returns the finished query."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        front_door_batch(
            spark, batch_df, epoch_id, state_root, probes_dir,
            max_per_domain=max_per_domain, psl=psl,
            line_min_docs=line_min_docs, excise_k=excise_k,
            excise_min_docs=excise_min_docs,
            excise_cms_width=excise_cms_width,
            excise_cms_depth=excise_cms_depth,
            minhash_threshold=minhash_threshold, decon_n=decon_n,
            decon_hash=decon_hash, timings=timings,
        )

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
