"""Multimodal plumbing: fake decoders vs a local NumPy oracle, stub
gating, and batch-shape contracts. (The SQL-expressible multimodal
queries are covered by test_oracle_parity via the registry.)"""

import numpy as np
import pytest

from polars_matmul_spark.operators import multimodal as M
from polars_matmul_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def assets(spark, sf_dir):
    return M.asset_table(load_table(spark, "documents", sf_dir))


def _local_image(text: str, w=16):
    b = np.frombuffer(text.encode(), dtype=np.uint8)
    h = len(b) // w
    return b[: w * h].reshape(h, w)


def test_resize_fake_matches_numpy(spark, sf_dir, assets):
    docs = load_table(spark, "documents", sf_dir).filter("doc_id < 20")
    texts = {r.doc_id: r.text for r in docs.collect()}
    got = {
        r.asset_id: bytes(r.resized)
        for r in M.resize_fake(assets.filter("asset_id < 20"), 4, 4).collect()
    }
    assert len(got) == len(texts)
    for doc_id, text in texts.items():
        img = _local_image(text)
        h, w = img.shape
        ys = np.linspace(0, h - 1, 4).astype(int)
        xs = np.linspace(0, w - 1, 4).astype(int)
        want = img[np.ix_(ys, xs)].tobytes()
        assert got[doc_id] == want, doc_id
    # contract: every resized payload is exactly out_h*out_w bytes
    assert {len(v) for v in got.values()} == {16}


def test_byte_histogram_sums_to_one(spark, assets):
    rows = M.byte_histogram_features(assets.filter("asset_id < 10")).collect()
    assert len(rows) == 10
    for r in rows:
        assert len(r.features) == 16
        assert abs(sum(r.features) - 1.0) < 1e-12


def test_frame_sample_short_payload_empty(spark, assets):
    # payloads shorter than one frame must yield zero frames, not a
    # descending-sequence explosion
    from pyspark.sql import functions as F

    tiny = assets.withColumn("payload", F.substring(F.col("payload"), 1, 10))
    assert M.frame_sample(tiny, frame_bytes=64).count() == 0


def test_byte_histogram_non_divisor_bins(spark):
    # bins=10 does not divide 256: bytes >= 250 must clamp into the
    # last bin, not overflow into the next document's bin 0
    rows = [(1, bytes([255] * 4)), (2, bytes([0] * 4))]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    got = {r.asset_id: r.features for r in M.byte_histogram_features(df, bins=10).collect()}
    assert got[1][9] == 1.0 and sum(got[1]) == 1.0
    assert got[2][0] == 1.0 and sum(got[2]) == 1.0


def test_pixel_stats_short_payload_skipped(spark):
    # payload shorter than one image row: no decodable image, no crash
    rows = [(1, b"tiny", 16, 0), (2, bytes(range(32)), 16, 2)]
    df = spark.createDataFrame(rows, "asset_id long, payload binary, width int, height int")
    got = M.pixel_stats(df).collect()
    assert [r.asset_id for r in got] == [2]
    assert got[0].n_pixels == 32


def test_pixel_stats_truncated_payload_clips_not_crashes(spark):
    # a caller-declared height larger than the payload supports must
    # clip to the full pixel rows present, never ValueError on reshape
    rows = [
        (1, bytes(range(40)), 16, 4),   # 40 bytes, claims 16x4=64 -> 2 full rows
        (2, bytes(range(64)), 16, 4),   # exactly 16x4
        (3, b"x", 16, 4),               # under one row -> dropped
    ]
    df = spark.createDataFrame(rows, "asset_id long, payload binary, width int, height int")
    got = {r.asset_id: r for r in M.pixel_stats(df).collect()}
    assert set(got) == {1, 2}
    assert got[1].n_pixels == 32 and got[1].max_px == 31
    assert got[2].n_pixels == 64 and got[2].max_px == 63


def test_resize_fake_truncated_payload_clips_not_crashes(spark):
    rows = [(1, bytes(range(40)), 16, 4), (2, b"x", 16, 4)]
    df = spark.createDataFrame(rows, "asset_id long, payload binary, width int, height int")
    got = M.resize_fake(df, 2, 2).collect()
    assert [r.asset_id for r in got] == [1]
    # 2 effective rows: sample rows {0, 1}, cols {0, 15}
    assert bytes(got[0].resized) == bytes([0, 15, 16, 31])


def test_decode_asset_is_stubbed():
    with pytest.raises(NotImplementedError):
        M.decode_asset(b"\x00" * 16, "image")


class TestAudioRmsWindows:
    WIN, HOP = 64, 32

    def test_vs_naive_numpy(self, spark, sf_dir):
        import numpy as np

        from polars_matmul_spark.operators.multimodal import (
            asset_table,
            audio_rms_windows,
        )
        from polars_matmul_spark.sources.tables import load_table

        assets = asset_table(load_table(spark, "documents", sf_dir)).filter(
            "kind = 'audio'"
        )
        got = (
            audio_rms_windows(assets, self.WIN, self.HOP)
            .toPandas()
            .sort_values(["asset_id", "window_idx"])
            .reset_index(drop=True)
        )
        src = assets.select("asset_id", "payload").orderBy("asset_id").toPandas()
        rows = []
        for _, r in src.iterrows():
            x = np.frombuffer(bytes(r["payload"]), dtype=np.uint8).astype(
                np.float64
            ) - 128.0
            i = 0
            w = 0
            while i + self.WIN <= len(x):
                seg = x[i : i + self.WIN]
                rows.append((r["asset_id"], w, float(np.sqrt(np.mean(seg * seg)))))
                i += self.HOP
                w += 1
        assert len(got) == len(rows) > 0
        for (aid, widx, rms), (_, g) in zip(rows, got.iterrows()):
            assert g["asset_id"] == aid and g["window_idx"] == widx
            assert abs(g["rms"] - rms) < 1e-12

    def test_short_payloads_yield_no_windows(self, spark):
        import pandas as pd

        from polars_matmul_spark.operators.multimodal import audio_rms_windows

        df = spark.createDataFrame(
            pd.DataFrame(
                {"asset_id": [1, 2], "payload": [b"x" * 10, b"y" * 100]}
            )
        )
        out = audio_rms_windows(df, win=64, hop=32).toPandas()
        assert set(out["asset_id"]) == {2}
        assert len(out) == (100 - 64) // 32 + 1

    def test_bad_params_raise(self, spark):
        import pandas as pd
        import pytest

        from polars_matmul_spark.operators.multimodal import audio_rms_windows

        df = spark.createDataFrame(
            pd.DataFrame({"asset_id": [1], "payload": [b"x" * 10]})
        )
        with pytest.raises(ValueError, match="positive"):
            audio_rms_windows(df, win=0)
