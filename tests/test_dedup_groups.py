"""Connected-components dedup grouping vs a union-find oracle.

The reference's dedup story stops at pair emission; group formation is
the step a corpus-dedup pipeline needs (chains must collapse even when
the endpoints never matched each other directly).
"""

import pytest
from pyspark.sql import functions as F

from polars_matmul_spark.operators.dedup import (
    dedup_groups,
    exact_dedup,
    keep_canonical,
    neardup_pairs_minhash,
)
from polars_matmul_spark.sources.tables import load_table


def _uf_components(pairs):
    """Union-find oracle: {vertex: min-id of its component}."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def _spark_groups(spark, pairs):
    df = spark.createDataFrame(pairs, "d1 long, d2 long")
    out = dedup_groups(df)
    return {r.doc_id: r.group_id for r in out.collect()}


def test_chain_collapses_to_one_group(spark):
    # A~B, B~C, C~D: no pair (A,D) exists, yet all four are one group
    got = _spark_groups(spark, [(1, 2), (2, 3), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_multiple_components_and_ties(spark):
    pairs = [(10, 20), (20, 30), (5, 6), (100, 101), (101, 100), (7, 8), (8, 7)]
    got = _spark_groups(spark, pairs)
    assert got == _uf_components(pairs)


def test_star_and_long_chain(spark):
    # star (hub 50) + a 9-hop chain exercises multi-round convergence
    pairs = [(50, x) for x in range(51, 60)] + [(i, i + 1) for i in range(200, 209)]
    got = _spark_groups(spark, pairs)
    assert got == _uf_components(pairs)


def test_empty_pairs_empty_groups(spark):
    df = spark.createDataFrame([], "d1 long, d2 long")
    assert dedup_groups(df).count() == 0


def test_nonconvergence_raises(spark):
    # driver_threshold=0 forces the distributed loop (union-find
    # always converges, so the max_iter bound only exists there)
    df = spark.createDataFrame([(i, i + 1) for i in range(0, 40)], "d1 long, d2 long")
    with pytest.raises(RuntimeError, match="converge"):
        dedup_groups(df, max_iter=2, driver_threshold=0)


def test_driver_and_distributed_paths_agree(spark):
    # the hybrid's two paths must emit the identical contract on the
    # same graph: chain + star + clique + isolated pair
    edges = (
        [(i, i + 1) for i in range(10, 15)]          # chain
        + [(100, x) for x in (101, 102, 103)]        # star
        + [(200, 201), (200, 202), (201, 202)]       # clique
        + [(300, 301)]
    )
    df = spark.createDataFrame(edges, "d1 long, d2 long")
    small = {
        (r["doc_id"], r["group_id"]) for r in dedup_groups(df).collect()
    }
    big = {
        (r["doc_id"], r["group_id"])
        for r in dedup_groups(df, driver_threshold=0).collect()
    }
    assert small == big and len(small) > 0


def test_driver_path_boundary(spark, monkeypatch):
    """The driver union-find activates iff n_edges <= driver_threshold,
    and crosses to the driver via Arrow (toPandas), not Row collect."""
    edges = [(i, i + 1) for i in range(10)]  # 10 distinct edges
    df = spark.createDataFrame(edges, "d1 long, d2 long")
    want = {(i, 0) for i in range(11)}

    # patch the CONCRETE DataFrame class (pyspark.sql.DataFrame is a
    # dispatch base in Spark 4; patching it misses the subclass method)
    cls = type(df)
    calls = []
    orig = cls.toPandas

    def spy(self):
        calls.append(1)
        return orig(self)

    monkeypatch.setattr(cls, "toPandas", spy)
    # AT the boundary: driver path (exactly one Arrow transfer)
    got = {(r.doc_id, r.group_id) for r in dedup_groups(df, driver_threshold=10).collect()}
    assert got == want and len(calls) == 1
    calls.clear()
    # ONE BELOW: distributed loop, no driver-side edge materialization
    got = {(r.doc_id, r.group_id) for r in dedup_groups(df, driver_threshold=9).collect()}
    assert got == want and len(calls) == 0


def test_keep_canonical_end_to_end(spark, sf_dir):
    """MinHash pairs -> groups -> kept corpus on the documents table:
    kept count == total - (non-canonical members), group sizes match the
    union-find oracle, and every kept doc is its group's min id."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    pairs = neardup_pairs_minhash(docs, threshold=0.8)
    pair_list = [(r.d1, r.d2) for r in pairs.collect()]
    comp = _uf_components(pair_list)

    kept = keep_canonical(docs, pairs).cache()
    n_docs = docs.count()
    losers = {v for v, root in comp.items() if v != root}
    assert kept.count() == n_docs - len(losers)
    # every kept doc is a component root or untouched by any pair
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    for v, root in comp.items():
        assert (v in kept_ids) == (v == root)
    # group_size matches oracle component sizes
    sizes = {}
    for v, root in comp.items():
        sizes[root] = sizes.get(root, 0) + 1
    for r in kept.collect():
        assert r.group_size == sizes.get(r.doc_id, 1)
    kept.unpersist()


def test_exact_dedup_consistent_with_groups(spark, sf_dir):
    """exact_dedup's keep set equals keep_canonical over exact-equality
    pairs (the two formulations agree on pure duplicates)."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    h = docs.select("doc_id", F.md5("text").alias("h"))
    a, b = h.alias("a"), h.alias("b")
    eq_pairs = a.join(
        b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    ).select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
    kept = keep_canonical(docs, eq_pairs)
    keep_ids_groups = {r.doc_id for r in kept.select("doc_id").collect()}
    keep_ids_exact = {r.keep_id for r in exact_dedup(docs).collect()}
    assert keep_ids_groups == keep_ids_exact


class TestDedupReport:
    def test_matches_union_find_oracle(self, spark):
        from collections import Counter

        from polars_matmul_spark.operators.dedup import dedup_report

        # 0-1-2 chain, 3-4 pair, 5/6 untouched singletons
        pairs = [(0, 1), (1, 2), (3, 4)]
        docs = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(7)], "doc_id long, text string"
        )
        pdf = spark.createDataFrame(pairs, "d1 long, d2 long")
        r = dedup_report(docs, pdf).collect()[0]
        comp = _uf_components(pairs)
        sizes = Counter(comp.values())
        assert r.n_docs == 7 and r.n_pairs == 3
        assert r.n_groups == len(sizes) == 2
        assert r.n_dup_docs == len(comp) == 5
        assert r.n_dropped == 5 - 2 == 3
        assert abs(r.dup_frac - 3 / 7) < 1e-12
        assert r.largest_group == max(sizes.values()) == 3

    def test_empty_pairs(self, spark):
        from polars_matmul_spark.operators.dedup import dedup_report

        docs = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(4)], "doc_id long, text string"
        )
        pdf = spark.createDataFrame([], "d1 long, d2 long")
        r = dedup_report(docs, pdf).collect()[0]
        assert (r.n_docs, r.n_pairs, r.n_groups, r.n_dup_docs, r.n_dropped) == (
            4, 0, 0, 0, 0,
        )
        assert r.dup_frac == 0.0 and r.largest_group == 0

    def test_on_real_minhash_pairs(self, spark, sf_dir):
        from polars_matmul_spark.operators.dedup import dedup_report, keep_canonical

        docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
        pairs = neardup_pairs_minhash(docs, threshold=0.8)
        r = dedup_report(docs, pairs).collect()[0]
        # consistency with the actual keep/drop: dropped == docs - kept
        kept = keep_canonical(docs, pairs).count()
        assert r.n_dropped == docs.count() - kept
        assert 0.0 <= r.dup_frac < 1.0
