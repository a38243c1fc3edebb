"""Streaming crawl front door (streaming/front_door.py): the composed
WARC -> HTML -> URL quota -> hygiene (line strip + span excision) ->
dedup (Bloom exact + MinHash near-dup) -> decontamination chain, as
ONE foreachBatch pipeline over two micro-batches with planted cases
for every gate, plus the repo's streaming contracts: stream == the
directly-driven batch chain, and epoch replay idempotence."""

import glob
import gzip
import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F

from polars_matmul_spark.streaming.front_door import (
    STAGE_DIRS,
    front_door_batch,
    run_front_door_stream,
)

# round 13: module fixture replays the full 8-stage stream — depth, not breadth;
# run with SPARK_GRAFT_SLOW_TESTS=1 (see conftest)
pytestmark = pytest.mark.slow

BOILER = "subscribe to our newsletter today friends and neighbors"
SPAN = "the quick brown fox jumps over the lazy dog again"
PROBE = "alpha beta gamma delta epsilon zeta eta theta"


def _uwords(doc_id, n, tag="u"):
    return " ".join(f"{tag}{doc_id}w{j}" for j in range(n))


def _doc_texts():
    """doc_id -> (host, multi-line text[, title]). Planted cases:

    - ids 1-4 on spamhost.com (quota 3: id 4 over); id 14 (epoch B)
      also spamhost -> history-full reject
    - id 5 / id 15: exact duplicates across epochs (Bloom gate)
    - id 6 / id 16: near-duplicates (one word differs; MinHash gate)
    - ids 7,8,9: share the BOILER line (line_min_docs=3 -> stripped
      same-epoch); id 17 (epoch B) has it too -> stripped vs history
    - ids 10,11,12: share the mid-line SPAN (excise_min_docs=3)
    - id 13: contains the 8-token PROBE -> decontamination flag
    - id 18: clean novel doc
    """
    t = {}
    for i in (1, 2, 3, 4, 14):
        t[i] = ("spamhost.com", _uwords(i, 24) + "\n" + _uwords(i, 8, "s"))
    # strip_html keeps title + nav text in the extracted body, so the
    # dup/near-dup pairs must share their TITLE too — otherwise the
    # "Doc {id}" prefix alone breaks exact fingerprints and dilutes
    # the shingle Jaccard below threshold
    shared5 = _uwords(5, 30, "e")
    t[5] = ("dupa.org", shared5, "Dup Page")
    t[15] = ("dupb.org", shared5, "Dup Page")
    near = [f"n6w{j}" for j in range(40)]
    t[6] = ("neara.org", " ".join(near), "Near Page")
    near16 = list(near)
    near16[20] = "CHANGED"
    t[16] = ("nearb.org", " ".join(near16), "Near Page")
    for i in (7, 8, 9, 17):
        t[i] = (f"boiler{i}.org", _uwords(i, 20) + "\n" + BOILER)
    for i in (10, 11, 12):
        t[i] = (
            f"span{i}.org",
            f"{_uwords(i, 12)} {SPAN} {_uwords(i, 12, 'z')}",
        )
    t[13] = ("probe.org", _uwords(13, 10) + " " + PROBE + " " + _uwords(13, 10, "q"))
    t[18] = ("clean.org", _uwords(18, 25))
    return t


def _warc_payload(doc_id, host, text, title=None):
    page = (
        f"<html><head><title>{title or f'Doc {doc_id}'}</title>"
        "<script>var v = 1;</script></head><body>"
        f"<nav><a href='/'>home</a></nav><p>{text}</p></body></html>"
    )
    body = page.encode("ascii", "replace")
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        + b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body
    )
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        + f"WARC-Record-ID: <urn:doc:{doc_id}>\r\n".encode()
        + f"WARC-Target-URI: http://{host}/d/{doc_id}\r\n".encode()
        + b"Content-Type: application/http;msgtype=response\r\n"
        + b"Content-Length: " + str(len(http)).encode()
        + b"\r\n\r\n" + http + b"\r\n\r\n"
    )
    return gzip.compress(rec)


EPOCH_A = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13]
EPOCH_B = [14, 15, 16, 17, 18]


def _write_feed(spark, inp):
    texts = _doc_texts()
    for i, ids in enumerate([EPOCH_A, EPOCH_B]):
        pdf = pd.DataFrame(
            {
                "asset_id": ids,
                "payload": [_warc_payload(d, *texts[d]) for d in ids],
            }
        )
        spark.createDataFrame(pdf).coalesce(1).write.parquet(f"{inp}/b{i}")
    flat = sorted(glob.glob(f"{inp}/*/part-*.parquet"))
    for i, f in enumerate(flat):
        shutil.move(f, f"{inp}/batch{i}.parquet")
    shutil.rmtree(f"{inp}/b0"), shutil.rmtree(f"{inp}/b1")


def _write_probes(spark, probes_dir):
    spark.createDataFrame(
        [(0, PROBE)], "probe_id long, text string"
    ).coalesce(1).write.mode("overwrite").parquet(probes_dir)


_KW = dict(max_per_domain=3, line_min_docs=3, excise_min_docs=3)


@pytest.fixture(scope="module")
def front_door(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("frontdoor")
    inp, state, probes, ckpt = (
        str(root / d) for d in ("in", "state", "probes", "ckpt")
    )
    _write_feed(spark, inp)
    _write_probes(spark, probes)
    run_front_door_stream(spark, inp, state, probes, ckpt, **_KW)
    return inp, state, probes


def _clean(spark, state):
    return spark.read.parquet(f"{state}/{STAGE_DIRS['clean']}")


class TestFrontDoorStream:
    def test_every_gate_fires(self, spark, front_door):
        _inp, state, _probes = front_door
        got = {r.doc_id for r in _clean(spark, state).select("doc_id").collect()}
        # 4, 14 quota; 15 bloom exact; 16 minhash near-dup; 13 flagged
        assert got == {1, 2, 3, 5, 6, 7, 8, 9, 10, 11, 12, 17, 18}
        flagged = spark.read.parquet(f"{state}/{STAGE_DIRS['flagged']}")
        assert {r.doc_id for r in flagged.collect()} == {13}

    def test_hygiene_applied_to_survivors(self, spark, front_door):
        _inp, state, _probes = front_door
        rows = {
            r.doc_id: r.text for r in _clean(spark, state).collect()
        }
        # the boilerplate line is gone from every carrier, including
        # the epoch-B arrival stripped against the PERSISTED sketch
        for i in (7, 8, 9, 17):
            assert BOILER not in rows[i], i
            assert f"{i}w0" in rows[i]  # unique prose survived
        # the shared mid-line span is excised from all three carriers
        for i in (10, 11, 12):
            assert SPAN not in rows[i], i
            assert f"{i}w0" in rows[i]

    def test_metadata_carried_through(self, spark, front_door):
        _inp, state, _probes = front_door
        row = (
            _clean(spark, state)
            .filter(F.col("doc_id") == 18)
            .collect()[0]
        )
        assert row.url == "http://clean.org/d/18"
        assert row.title == "Doc 18"
        assert row.domain_key == "clean.org"

    def test_stream_equals_driven_batch(self, spark, front_door, tmp_path):
        inp, state, probes = front_door
        state2 = str(tmp_path / "state2")
        for i, f in enumerate(sorted(glob.glob(f"{inp}/batch*.parquet"))):
            front_door_batch(
                spark, spark.read.parquet(f), i, state2, probes, **_KW
            )
        a = sorted(
            (r.doc_id, r.text) for r in _clean(spark, state).collect()
        )
        b = sorted(
            (r.doc_id, r.text) for r in _clean(spark, state2).collect()
        )
        assert a == b

    def test_epoch_replay_idempotent(self, spark, front_door):
        inp, state, probes = front_door
        before = sorted(
            tuple(r) for r in _clean(spark, state).collect()
        )
        last = sorted(glob.glob(f"{inp}/batch*.parquet"))[-1]
        front_door_batch(
            spark, spark.read.parquet(last), 1, state, probes, **_KW
        )
        after = sorted(tuple(r) for r in _clean(spark, state).collect())
        assert before == after
