"""Driver-gate simulation: run every registered query on Spark and its
DuckDB oracle side-by-side at sf0.01, compare row count, column names,
and order-insensitive values.

This is deliberately stricter than approximate comparison: values are
compared exactly after sorting (floats must be bit-identical, which the
oracle-parity design guarantees — sequential folds, decimal sums,
integer ratios).

This module IS the sf-scaled sweep, too: point it at a bigger SF
(``SPARK_GRAFT_ORACLE_SF_DIR=/root/testdata/sf0.1 pytest
tests/test_oracle_parity.py``) and every comparison — all 50 registry
rows plus the rotated-query gate — replays at 10x the driver's scale,
catching scale-dependent drift (window tie-breaks, float accumulation
order, cap boundaries) before a larger SF ever lands. Round-6 run (after the
second rotation): 68 passed at sf0.1 in 3:20.
"""

import math
import os

import duckdb
import pytest

from polars_matmul_spark.registry import ALL_QUERIES
from polars_matmul_spark.sources.tables import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    yield con
    con.close()


def _normalize(rows, colnames):
    import numpy as np

    out = []
    for row in rows:
        vals = []
        for c in sorted(colnames):
            v = row[c]
            if isinstance(v, np.ndarray):
                v = tuple(v.tolist())
            elif isinstance(v, list):
                v = tuple(v)
            elif isinstance(v, float) and math.isnan(v):
                v = "NaN"
            vals.append((c, v))
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


def test_registry_discipline():
    """The driver records at most 50 queries — the registry must sit
    EXACTLY at the cap (a 51st slot would silently never get a
    CORRECTNESS row, the round-1 bug). Since round 9 every row carries
    a full DuckDB value oracle: the one intrinsically non-replayable
    row (MLlib BRP-LSH, JVM-private RNG) was rotated to pytest and
    replaced by the engine-replayable p-stable Euclidean LSH."""
    assert len(ALL_QUERIES) == 50
    no_oracle = {n for n, (_f, o) in ALL_QUERIES.items() if o is None}
    assert no_oracle == set()


def _assert_matches(name, fn, oracle, spark, duck):
    sdf = fn(spark, SF_DIR)
    spark_pdf = sdf.toPandas()
    # a 0-row result passes any value comparison trivially — every
    # registered query must exercise real data at this SF (two
    # degenerate-window bugs were masked by 0 == 0 before this guard)
    assert len(spark_pdf) > 0, f"{name}: empty result — degenerate test"
    if oracle is None:
        return
    duck_pdf = duck.sql(oracle).df()

    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch {spark_pdf.columns} vs {duck_pdf.columns}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    s_rows = _normalize(spark_pdf.to_dict("records"), list(spark_pdf.columns))
    d_rows = _normalize(duck_pdf.to_dict("records"), list(duck_pdf.columns))
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


@pytest.mark.parametrize("name", sorted(ALL_QUERIES))
def test_query_matches_oracle(name, spark, duck):
    fn, oracle = ALL_QUERIES[name]
    _assert_matches(name, fn, oracle, spark, duck)


def _rotated_queries():
    """Every query rotated out of the 50-slot registry whose oracle
    still exists keeps the EXACT same value comparison here — rotation
    moves the gate from the driver to pytest, it never removes it."""
    from polars_matmul_spark import queries_core as qc
    from polars_matmul_spark import queries_datapipe as qd
    from polars_matmul_spark import queries_multimodal as qm
    from polars_matmul_spark import queries_pipeline as qp
    from polars_matmul_spark import queries_text as qt

    fn_dot, oracle_dot = qc._make_topk("dot")
    return {
        "topk_dot": (fn_dot, oracle_dot),
        "salted_event_counts": (
            qc._salted_event_counts,
            qc._SALTED_EVENT_COUNTS_ORACLE,
        ),
        "moving_avg_revenue": (qc._moving_avg_revenue, qc._MOVING_AVG_ORACLE),
        "lang_id": (qt._lang_id, qt._duck_lang_case()),
        "quality_score": (qt._quality, qt._QUALITY_ORACLE),
        "mm_pixel_stats": (qm._pixel_stats, qm._PIXEL_STATS_ORACLE),
        "mm_frame_sample": (qm._frame_sample, qm._FRAME_SAMPLE_ORACLE),
        "hash_split_docs": (qp._hash_split_docs, qp._HASH_SPLIT_ORACLE),
        # round-6 rotation: five slots freed for c4_clean, dedup_groups,
        # funnel_user_levels_windowed, ivfpq_adc_topk, mm_decoded_stats
        "q18_large_orders": (qc._q18, qc._Q18_ORACLE),
        "cust_quartiles_by_nation": (
            qc._cust_quartiles,
            qc._CUST_QUARTILES_ORACLE,
        ),
        "brand_above_avg_parts": (
            qc._brand_above_avg,
            qc._BRAND_ABOVE_AVG_ORACLE,
        ),
        "mm_asset_meta": (qm._asset_meta, qm._ASSET_META_ORACLE),
        "tfidf_weights": (qp._tfidf_weights, qp._TFIDF_ORACLE),
        # round-6 second rotation: four slots freed for cms_word_counts,
        # cms_line_dedup, priority_sample_docs, hamming_topk_srp
        "topk_euclidean": qc._make_topk("euclidean"),
        "cube_sales": (qc._cube_sales, qc._CUBE_SALES_ORACLE),
        "event_hourly_windows": (qc._event_hourly, qc._EVENT_HOURLY_ORACLE),
        "mm_byte_histogram": (qm._byte_histogram, qm._duck_histogram_oracle()),
        # round-7 rotation: six slots freed for the span-excision
        # family + within-doc strip / materialize_bins / mixture / BPE
        "matmul_nested": (qc._matmul_nested_scores, qc._MATMUL_NESTED_ORACLE),
        "sessionize_events": (qc._sessionize, qc._SESSIONIZE_ORACLE),
        "funnel_steps": (qc._funnel_steps, qc._FUNNEL_ORACLE),
        "retention_cohorts": (qc._retention, qc._RETENTION_ORACLE),
        "asof_purchase_click": (qc._asof_purchase_click, qc._ASOF_ORACLE),
        "range_join_price_bands": (
            qc._range_join_price_bands,
            qc._RANGE_JOIN_ORACLE,
        ),
        # round-7 second rotation: three slots freed for
        # shared_span_stats / profile_diff / merge_upsert
        "top_suppliers_per_nation": (
            qc._top_suppliers,
            qc._TOP_SUPPLIERS_ORACLE,
        ),
        "zorder_keys": (qc._zorder_keys, qc._zorder_oracle()),
        "hypertable_rollup": (
            qc._hypertable_rollup,
            qc._HYPERTABLE_ROLLUP_ORACLE,
        ),
        # round-8 rotation: two slots freed for probe_media /
        # rawbytes_ingest. cms_word_counts keeps its full sketch
        # replay here; sketch_distinct_users is rows-only by design
        # (no oracle exists to keep) — its error bound stays in
        # tests/test_sketches_and_bucketing.py
        "cms_word_counts": (qd._cms_word_counts, qd._CMS_WORD_ORACLE),
        # round-8 second wave: slot freed for mpeg_layer1_decode
        "profile_lineitem": (qp._profile_lineitem, qp._profile_oracle()),
        # round-8 third wave: slots freed for warc_extract and
        # url_domain_cap
        "token_counts": (qt._token_counts, qt._TOKEN_COUNTS_ORACLE),
        "hamming_topk_srp": (qd._hamming_topk_srp, qd._hamming_oracle()),
        # round-9 rotation: slot freed for triage_assets (the CMS
        # excision row keeps the reassembly replay driver-gated)
        "excise_duplicate_spans": (qt._excise_spans, qt._EXCISE_ORACLE),
        # round-9 second wave: slots freed for hybrid_rrf_search and
        # maxsim_multivector_topk (PQ+ADC stays driver-gated through
        # ivfpq_adc_topk; the line-dedup family keeps line_dedup_strip
        # and cms_line_dedup driver rows)
        "pq_adc_topk": (qd._pq_adc_topk, qd._PQ_ORACLE),
        "strip_within_doc": (qd._strip_within_doc, qd._STRIP_WITHIN_DOC_ORACLE),
        # ...and for decontaminate_docs (BM25's machinery runs
        # driver-gated inside hybrid_rrf_search's lexical legs)
        "bm25_search": (qp._bm25_search, qp._BM25_ORACLE),
        # round-9 third wave: slot freed for image_neardup_dhash
        # (cosine thresholding stays driver-gated through topk_cosine /
        # semantic_dedup_pairs / srp_neardup_bands)
        "embedding_neardup_cosine": (
            qc._embedding_neardup,
            qc._EMBEDDING_NEARDUP_ORACLE,
        ),
        # round-10 rotation: slots freed for domain_pagerank (the
        # srp/hamming family keeps sign-bit fingerprinting driver-gated
        # through srp_neardup_bands) and rank_eval_hybrid (the
        # line-dedup family keeps cms_line_dedup driver-gated)
        "simhash_fingerprint": (qt._simhash, qt._duck_simhash()),
        "line_dedup_strip": (qd._line_dedup_strip, qd._LINE_DEDUP_ORACLE),
        # round-11 rotation: slots freed for front_door_curation (whose
        # chain runs the Bloom fingerprint gate and md5-gram
        # decontamination driver-gated end-to-end) and
        # pagerank_converged_domains
        "decontaminate_docs": (qt._decontaminate_docs, qt._DECON_ORACLE),
        "bloom_incremental_dedup": (qd._bloom_incremental, qd._BLOOM_ORACLE),
        # round-12: the TWO-epoch front door lives here rather than in
        # the 50-capped registry (mixture_sample was briefly rotated
        # out for it mid-round and restored — the optimization-round
        # contract forbids removing a declared query). The full DuckDB
        # two-epoch replay still gates it at sf0.01 and sf0.1.
        "front_door_epochs": (qp._front_door_epochs, qp._fde_oracle()),
    }


@pytest.mark.parametrize("name", sorted(_rotated_queries()))
def test_rotated_query_still_matches_oracle(name, spark, duck):
    fn, oracle = _rotated_queries()[name]
    _assert_matches(name, fn, oracle, spark, duck)
