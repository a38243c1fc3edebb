"""BPE tokenizer: distributed encode vs an independent naive oracle,
training determinism, and round-trip/compression properties."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_matmul_spark.operators.bpe import (
    EOW,
    apply_merges,
    bpe_encode,
    train_bpe,
)
from polars_matmul_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _naive_encode(text: str, merges: list[tuple[str, str]]) -> list[str]:
    """Independent oracle: replay merges in TRAINING order over every
    word occurrence (no rank loop, no memo). Equivalent because the
    rank-priority loop applies the same merges a training replay would."""
    out: list[str] = []
    for w in text.lower().strip().split():
        pieces = list(w) + [EOW]
        for a, b in merges:
            i, nxt = 0, []
            while i < len(pieces):
                if i < len(pieces) - 1 and pieces[i] == a and pieces[i + 1] == b:
                    nxt.append(a + b)
                    i += 2
                else:
                    nxt.append(pieces[i])
                    i += 1
            pieces = nxt
        out.extend(pieces)
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, "documents", SF_DIR).select("doc_id", "text")


@pytest.fixture(scope="module")
def merges(spark, docs):
    return train_bpe(docs, num_merges=60, max_words=5000)


class TestTrain:
    def test_deterministic(self, docs):
        again = train_bpe(docs, num_merges=60, max_words=5000)
        first = train_bpe(docs, num_merges=60, max_words=5000)
        assert first == again and len(first) == 60

    def test_merges_are_frequency_ordered_prefix(self, docs, merges):
        # training with fewer merges yields a prefix of the same list
        short = train_bpe(docs, num_merges=10, max_words=5000)
        assert short == merges[:10]


class TestEncode:
    def test_vs_naive_oracle(self, spark, docs, merges):
        got = (
            bpe_encode(docs, merges)
            .orderBy("doc_id")
            .toPandas()
            .set_index("doc_id")
        )
        sample = docs.orderBy("doc_id").limit(100).toPandas()
        for _, row in sample.iterrows():
            want = _naive_encode(row["text"], merges)
            assert list(got.loc[row["doc_id"], "bpe_tokens"]) == want
            assert got.loc[row["doc_id"], "n_bpe"] == len(want)

    def test_detokenization_roundtrip(self, spark, docs, merges):
        # concatenating pieces and splitting on </w> restores the
        # lowercased word sequence exactly
        pdf = bpe_encode(docs, merges).limit(50).toPandas()
        src = {
            r["doc_id"]: r["text"]
            for _, r in docs.toPandas().iterrows()
        }
        for _, row in pdf.iterrows():
            joined = "".join(row["bpe_tokens"])
            words = [w for w in joined.split(EOW) if w != ""]
            assert words == src[row["doc_id"]].lower().strip().split()

    def test_merges_compress(self, spark, docs, merges):
        # BPE with merges must produce fewer pieces than chars-only
        with_m = bpe_encode(docs, merges).agg(F.sum("n_bpe")).collect()[0][0]
        without = bpe_encode(docs, []).agg(F.sum("n_bpe")).collect()[0][0]
        assert with_m < without

    def test_rank_loop_equals_training_replay(self, merges):
        ranks = {tuple(p): i for i, p in enumerate(merges)}
        for w in ["the", "supplier", "unusual", "accounts", "zzzqqq"]:
            assert apply_merges(w, ranks) == _naive_encode(w, merges)


class TestBpeProperties:
    # pure-Python properties (no Spark): fast hypothesis sweeps over
    # the encode core shared by the distributed path

    def test_roundtrip_any_word(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=300, deadline=None)
        @given(
            st.lists(
                st.text(alphabet="abcdef", min_size=1, max_size=8),
                min_size=1,
                max_size=6,
            ),
            st.lists(
                st.tuples(
                    st.text(alphabet="abcdef", min_size=1, max_size=2),
                    st.text(alphabet="abcdef" + EOW, min_size=1, max_size=4),
                ),
                max_size=10,
            ),
        )
        def check(words, merges):
            ranks = {tuple(p): i for i, p in enumerate(merges)}
            for w in words:
                pieces = apply_merges(w, ranks)
                # concatenation restores the word + sentinel exactly
                assert "".join(pieces) == w + EOW
                # no piece is empty
                assert all(p for p in pieces)

        check()

    def test_encode_matches_training_replay_randomized(self):
        # rank-priority application == replaying merges in training
        # order, for merge tables that actually came from training
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=60, deadline=None)
        @given(
            st.lists(
                st.text(alphabet="abc", min_size=1, max_size=6),
                min_size=3,
                max_size=20,
            )
        )
        def check(corpus_words):
            from collections import Counter

            # train directly on the word list (driver-side trainer core)
            vocab = {tuple(w) + (EOW,): c for w, c in Counter(corpus_words).items()}
            merges = []
            from polars_matmul_spark.operators.bpe import _merge_word

            for _ in range(15):
                pairs = Counter()
                for word, c in vocab.items():
                    for a, b in zip(word, word[1:]):
                        pairs[(a, b)] += c
                if not pairs:
                    break
                best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))
                if best[1] < 2:
                    break
                merges.append(best[0])
                vocab = {_merge_word(w, best[0]): c for w, c in vocab.items()}

            ranks = {tuple(p): i for i, p in enumerate(merges)}
            for w in set(corpus_words):
                assert apply_merges(w, ranks) == _naive_encode(w, merges)

        check()
