"""Link-graph PageRank (operators/linkgraph.py): href extraction,
domain edge building, and the integer fixed-point PageRank — exact
pure-Python replication, a DuckDB replay with unrolled iterations,
ranking sanity on known graphs, and partitioning invariance."""

import duckdb
import pytest
from pyspark.sql import functions as F

from polars_matmul_spark.operators.linkgraph import (
    domain_edges,
    extract_hrefs,
    pagerank_converged,
    pagerank_dual,
    pagerank_fixedpoint,
)

SCALE = 1_000_000_000_000
DAMP = 85


def _py_pagerank(edges, n_iter=3, damping=DAMP, scale=SCALE):
    """Literal integer replication of the operator."""
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    base = scale * (100 - damping) // 100 // n
    r = {v: scale // n for v in nodes}
    for _ in range(n_iter):
        incoming = {v: 0 for v in nodes}
        for s, d in edges:
            incoming[d] += (r[s] * damping // 100) // deg[s]
        r = {v: base + incoming[v] for v in nodes}
    return r


def _py_pagerank_conserving(edges, n_iter=3, damping=DAMP, scale=SCALE):
    """Literal integer replication of redistribute_dangling=True."""
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    base = scale * (100 - damping) // 100 // n
    r = {v: scale // n for v in nodes}
    for _ in range(n_iter):
        incoming = {v: 0 for v in nodes}
        for s, d in edges:
            incoming[d] += (r[s] * damping // 100) // deg[s]
        residual = scale - n * base - sum(incoming.values())
        share = residual // n
        r = {v: base + incoming[v] + share for v in nodes}
    return r


def _edges_df(spark, edges):
    return spark.createDataFrame(edges, "src_domain string, dst_domain string")


CHAIN = [("a.com", "b.com"), ("b.com", "c.com"), ("c.com", "a.com")]
STAR = [("s1.com", "hub.com"), ("s2.com", "hub.com"), ("s3.com", "hub.com"),
        ("hub.com", "s1.com")]


@pytest.mark.parametrize("edges", [CHAIN, STAR, CHAIN + STAR])
def test_pagerank_exact_vs_python(spark, edges):
    got = {r.node: r.rank for r in pagerank_fixedpoint(_edges_df(spark, edges)).collect()}
    assert got == _py_pagerank(edges)


def test_pagerank_star_ranks_hub_first(spark):
    got = {r.node: r.rank for r in pagerank_fixedpoint(_edges_df(spark, STAR)).collect()}
    assert got["hub.com"] == max(got.values())
    # the one spoke the hub links back to outranks the others
    assert got["s1.com"] > got["s2.com"] == got["s3.com"]


def test_pagerank_duckdb_replay(spark):
    """One unrolled iteration set in SQL must reproduce the integer
    ranks bit-for-bit (integer //, order-free sums)."""
    edges = CHAIN + STAR + [("hub.com", "c.com")]
    got = (
        pagerank_fixedpoint(_edges_df(spark, edges), n_iter=2)
        .orderBy("node")
        .toPandas()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE e (src VARCHAR, dst VARCHAR)"
    )
    con.executemany("INSERT INTO e VALUES (?, ?)", edges)
    n = len({s for s, _ in edges} | {d for _, d in edges})
    base = SCALE * (100 - DAMP) // 100 // n
    oracle = con.sql(f"""
WITH nodes AS (SELECT DISTINCT src AS node FROM e
               UNION SELECT DISTINCT dst FROM e),
deg AS (SELECT src, count(*) AS d FROM (SELECT DISTINCT src, dst FROM e) GROUP BY src),
r0 AS (SELECT node, CAST({SCALE // n} AS BIGINT) AS rank FROM nodes),
i1 AS (
  SELECT n.node,
         CAST({base} + coalesce(sum((r0.rank * {DAMP} // 100) // deg.d), 0)
              AS BIGINT) AS rank
  FROM nodes n
  LEFT JOIN e ON e.dst = n.node
  LEFT JOIN r0 ON r0.node = e.src
  LEFT JOIN deg ON deg.src = e.src
  GROUP BY n.node
), i2 AS (
  SELECT n.node,
         CAST({base} + coalesce(sum((i1.rank * {DAMP} // 100) // deg.d), 0)
              AS BIGINT) AS rank
  FROM nodes n
  LEFT JOIN e ON e.dst = n.node
  LEFT JOIN i1 ON i1.node = e.src
  LEFT JOIN deg ON deg.src = e.src
  GROUP BY n.node
)
SELECT node, rank FROM i2 ORDER BY node
""").df()
    assert got.equals(oracle), f"\n{got}\nvs\n{oracle}"


def test_pagerank_mass_conservation_bound(spark):
    # floor division + dangling rules only ever DROP mass
    got = pagerank_fixedpoint(_edges_df(spark, CHAIN + STAR)).collect()
    assert sum(r.rank for r in got) <= SCALE
    assert all(r.rank > 0 for r in got)


# a graph with REAL dangling mass: b.com and sink.org emit nothing, so
# the default variant leaks their whole damped rank every iteration
DANGLING = [("a.com", "b.com"), ("a.com", "sink.org"), ("c.com", "a.com"),
            ("c.com", "b.com")]


@pytest.mark.parametrize("edges", [CHAIN, STAR, DANGLING, CHAIN + STAR])
def test_pagerank_conserving_exact_vs_python(spark, edges):
    got = {
        r.node: r.rank
        for r in pagerank_fixedpoint(
            _edges_df(spark, edges), redistribute_dangling=True
        ).collect()
    }
    assert got == _py_pagerank_conserving(edges)


@pytest.mark.parametrize("edges", [CHAIN, STAR, DANGLING, CHAIN + STAR])
def test_pagerank_conserving_mass_pin(spark, edges):
    """Leak == 0 +- n units per run: total mass after every iteration
    is scale - (residual mod n), so the final sum sits in
    (scale - n, scale]."""
    got = pagerank_fixedpoint(
        _edges_df(spark, edges), n_iter=5, redistribute_dangling=True
    ).collect()
    n = len(got)
    leak = SCALE - sum(r.rank for r in got)
    assert 0 <= leak < n, leak
    # while the default variant on the dangling graph leaks for real
    if edges is DANGLING:
        dflt = pagerank_fixedpoint(_edges_df(spark, edges), n_iter=5).collect()
        assert SCALE - sum(r.rank for r in dflt) > n


def test_pagerank_conserving_duckdb_replay(spark):
    """The conserving iteration replays bit-for-bit in SQL: the
    residual is a scalar subquery over the incoming sums."""
    edges = DANGLING + CHAIN
    got = (
        pagerank_fixedpoint(
            _edges_df(spark, edges), n_iter=2, redistribute_dangling=True
        )
        .orderBy("node")
        .toPandas()
    )
    con = duckdb.connect()
    # the operator dedups edges before anything else (DANGLING + CHAIN
    # contains a.com->b.com twice) — the replay must join the DEDUPED
    # edge table, not the raw inserts
    con.sql("CREATE TABLE e_raw (src VARCHAR, dst VARCHAR)")
    con.executemany("INSERT INTO e_raw VALUES (?, ?)", edges)
    con.sql("CREATE TABLE e AS SELECT DISTINCT src, dst FROM e_raw")
    n = len({s for s, _ in edges} | {d for _, d in edges})
    base = SCALE * (100 - DAMP) // 100 // n
    step = """
{out} AS (
  SELECT n.node,
         CAST(coalesce(sum(({prev}.rank * {damp} // 100) // deg.d), 0)
              AS BIGINT) AS inc
  FROM nodes n
  LEFT JOIN e ON e.dst = n.node
  LEFT JOIN {prev} ON {prev}.node = e.src
  LEFT JOIN deg ON deg.src = e.src
  GROUP BY n.node
), {out}r AS (
  SELECT node,
         CAST({base} + inc
              + ({scale} - {nbase} - (SELECT sum(inc) FROM {out})) // {n}
              AS BIGINT) AS rank
  FROM {out}
)"""
    oracle = con.sql(
        f"""
WITH nodes AS (SELECT DISTINCT src AS node FROM e
               UNION SELECT DISTINCT dst FROM e),
deg AS (SELECT src, count(*) AS d
        FROM (SELECT DISTINCT src, dst FROM e) GROUP BY src),
r0 AS (SELECT node, CAST({SCALE // n} AS BIGINT) AS rank FROM nodes),
{step.format(out="i1", prev="r0", damp=DAMP, base=base,
             scale=SCALE, nbase=n * base, n=n).lstrip()},
{step.format(out="i2", prev="i1r", damp=DAMP, base=base,
             scale=SCALE, nbase=n * base, n=n).lstrip()}
SELECT node, rank FROM i2r ORDER BY node
"""
    ).df()
    assert got.equals(oracle), f"\n{got}\nvs\n{oracle}"


def test_pagerank_partitioning_invariance(spark):
    edges = CHAIN + STAR
    a = sorted(tuple(r) for r in pagerank_fixedpoint(_edges_df(spark, edges).repartition(7)).collect())
    b = sorted(tuple(r) for r in pagerank_fixedpoint(_edges_df(spark, edges).coalesce(1)).collect())
    assert a == b


def _py_pagerank_converged(edges, max_iter=50, tol_units=None,
                           damping=DAMP, scale=SCALE):
    """Literal replication of pagerank_converged (conserving step)."""
    if tol_units is None:
        tol_units = scale // 10**6
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    base = scale * (100 - damping) // 100 // n
    r = {v: scale // n for v in nodes}
    it, delta = 0, None
    for it in range(1, max_iter + 1):
        incoming = {v: 0 for v in nodes}
        for s, d in edges:
            incoming[d] += (r[s] * damping // 100) // deg[s]
        share = (scale - n * base - sum(incoming.values())) // n
        new_r = {v: base + incoming[v] + share for v in nodes}
        delta = sum(abs(new_r[v] - r[v]) for v in nodes)
        r = new_r
        if delta <= tol_units:
            break
    return r, it, delta


@pytest.mark.parametrize("edges", [CHAIN, STAR, DANGLING])
def test_pagerank_converged_exact_vs_python(spark, edges):
    # a 0.85-damped walk contracts ~0.85x per iteration, so 1e-6
    # relative movement needs ~85 iterations — keep the SPARK side to
    # a handful and assert exact agreement with the replication
    # (ranks, iteration count, final delta, converged verdict alike)
    got, info = pagerank_converged(_edges_df(spark, edges), max_iter=6)
    exp_r, exp_it, exp_delta = _py_pagerank_converged(edges, max_iter=6)
    assert {r.node: r.rank for r in got.collect()} == exp_r
    assert info["n_iter"] == exp_it
    assert info["final_delta_units"] == exp_delta
    assert info["converged"] == (exp_delta <= SCALE // 10**6)
    # a fixed-count run with the reported iteration count reproduces
    # the ranks bit-for-bit — the stop rule is exact integer
    fixed = pagerank_fixedpoint(
        _edges_df(spark, edges), n_iter=info["n_iter"],
        redistribute_dangling=True,
    )
    assert {r.node: r.rank for r in fixed.collect()} == exp_r


def test_pagerank_converged_reaches_tolerance(spark):
    # low damping contracts fast (0.30^k): CHAIN genuinely converges
    # to 1e-6 relative movement within a handful of iterations
    got, info = pagerank_converged(
        _edges_df(spark, CHAIN), max_iter=20, damping=30
    )
    exp_r, exp_it, exp_delta = _py_pagerank_converged(
        CHAIN, max_iter=20, damping=30
    )
    assert info["converged"] and info["n_iter"] == exp_it < 20
    assert info["final_delta_units"] == exp_delta <= SCALE // 10**6
    assert {r.node: r.rank for r in got.collect()} == exp_r


def test_pagerank_converged_max_iter_cap(spark):
    # an absurdly tight tolerance cannot converge -> caps at max_iter
    got, info = pagerank_converged(
        _edges_df(spark, STAR), max_iter=2, tol_units=0
    )
    assert info["n_iter"] == 2 and not info["converged"]
    assert got.count() == 4


@pytest.mark.parametrize("edges", [CHAIN, DANGLING, CHAIN + STAR])
def test_pagerank_dual_equals_two_runs(spark, edges):
    dual = {
        r.node: (r.rank, r.rank_conserving)
        for r in pagerank_dual(_edges_df(spark, edges)).collect()
    }
    plain = _py_pagerank(edges)
    cons = _py_pagerank_conserving(edges)
    assert dual == {v: (plain[v], cons[v]) for v in plain}


def test_pagerank_converged_validation(spark):
    with pytest.raises(ValueError, match="max_iter"):
        pagerank_converged(_edges_df(spark, CHAIN), max_iter=0)


def test_pagerank_validation(spark):
    with pytest.raises(ValueError, match="damping"):
        pagerank_fixedpoint(_edges_df(spark, CHAIN), damping=101)
    with pytest.raises(ValueError, match="n_iter"):
        pagerank_fixedpoint(_edges_df(spark, CHAIN), n_iter=-1)


def test_extract_hrefs_and_edges(spark):
    docs = spark.createDataFrame(
        [
            (
                "http://blog.example.com/post",
                '<a href="https://GitHub.com/x">x</a> '
                "<A HREF='http://sub.wiki.org/page?utm_source=t'>y</A> "
                '<a href="/relative/path">rel</a> '
                '<img src="http://img.cdn.net/i.png">',
            ),
            ("http://example.com/", "no links here"),
        ],
        "url string, text string",
    )
    hrefs = docs.select(extract_hrefs(F.col("text")).alias("h")).collect()
    assert hrefs[0].h == [
        "https://GitHub.com/x",
        "http://sub.wiki.org/page?utm_source=t",
        "/relative/path",
    ]
    edges = {
        (r.src_domain, r.dst_domain) for r in domain_edges(docs).collect()
    }
    # relative link dropped; img src is not an href; case-folded and
    # tracking-stripped targets collapse to registrable domains
    assert edges == {
        ("example.com", "github.com"),
        ("example.com", "wiki.org"),
    }


def test_pagerank_plan_jvm_side(spark):
    plan = (
        pagerank_fixedpoint(_edges_df(spark, CHAIN), n_iter=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestPageRankProperty:
    """Hypothesis: the operator equals the pure-Python integer
    replication on ARBITRARY small digraphs — the fixed-graph
    equivalence tests above can't rule out shape-specific luck
    (degree-1 chains, symmetric stars); random edge sets with
    self-loops, parallel duplicates (deduped), dangling nodes and
    isolated sinks can."""

    @pytest.mark.slow
    def test_random_graphs_match_python(self, spark):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        nodes = [f"n{i}.com" for i in range(6)]
        edge = st.tuples(st.sampled_from(nodes), st.sampled_from(nodes))
        graphs = st.lists(edge, min_size=1, max_size=15)

        @settings(max_examples=8, deadline=None)
        @given(edges=graphs)
        def check(edges):
            df = _edges_df(spark, edges)
            got = {
                (r["node"], r["rank"], r["rank_conserving"])
                for r in pagerank_dual(df, n_iter=2).collect()
            }
            plain = _py_pagerank(edges, n_iter=2)
            cons = _py_pagerank_conserving(edges, n_iter=2)
            exp = {(v, plain[v], cons[v]) for v in plain}
            assert got == exp

        check()


def test_prc_edges_match_extraction_chain(spark):
    """The converged driver row's arithmetic edge shortcut is
    bit-equal to the full synth + href-extraction derivation on its
    own doc_id range — the pin that keeps the row's cheap edge table
    honest against the chain domain_pagerank scale-gates."""
    from polars_matmul_spark.queries_text import (
        _PRC_MAXDOC,
        _pr_synth_pages,
        _prc_edges,
    )

    docs = spark.range(_PRC_MAXDOC).select(F.col("id").alias("doc_id"))
    got = sorted(map(tuple, _prc_edges(docs).collect()))
    want = sorted(
        map(tuple, domain_edges(_pr_synth_pages(docs)).collect())
    )
    assert got == want
    assert len(got) == 25  # the fixed 9-node / 25-edge residue graph
