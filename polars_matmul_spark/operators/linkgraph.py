"""Link-graph quality priors: href extraction -> domain edge table ->
exact fixed-point PageRank.

The crawl-curation signal Common-Crawl-derived pipelines rank domains
by (centrality as a quality/spam prior): extract outgoing links from
HTML bodies, collapse to registrable-domain edges, and run PageRank.

Exactness design (the repo's oracle-parity rule, taken further than
the usual float discipline): ranks live in INTEGER fixed-point
("rank units", ``scale`` units = total mass 1.0) and every step is
integer arithmetic — damping via ``r * damping // 100``, per-edge
contribution via ``damped // out_degree`` (floor division; the
remainder mass is deliberately dropped, see below), and per-node sums
of longs, which are ORDER-INDEPENDENT — so the whole iteration
replays bit-for-bit in any engine, no rounding grids, no fold-order
pinning needed. A float PageRank differs at the last ulp depending on
aggregation order; an integer one cannot.

Documented deviations from textbook PageRank (both conservative and
deterministic):
- floor division drops up to ``out_degree - 1`` units per (node,
  iteration) and dangling nodes (no out-links) drop their whole
  damped mass — total mass slowly leaks instead of being
  redistributed. At ``scale`` = 1e12 the leak is ~1e-9 relative per
  iteration: irrelevant for RANKING, and the price of exactness.
- the teleport term uses ``scale * (100 - damping) // 100 // n`` —
  the same floor rule.
- ``redistribute_dangling=True`` closes the leak while keeping
  integer exactness: the iteration's total dropped mass (per-edge
  floor remainders + dangling nodes' whole damped mass + the teleport
  remainder) is recovered as ONE scalar — ``residual = scale -
  n*base - sum(incoming)`` — and floor-divided back over all n nodes.
  Total mass after each step is then ``scale - (residual mod n)``:
  conservation to within n units per iteration (pytest-pinned)
  instead of an unbounded compounding leak, still order-independent
  integer arithmetic, still bit-replayable (the residual is a scalar
  subquery in the DuckDB twin). Matters once n_iter grows past a
  handful — the conservative leak compounds geometrically with
  damping.

100 TB shape: each iteration is one (src-keyed) join of the slim
(node, rank, degree) table onto the edge list plus one dst-keyed
groupBy-sum — the classic two-shuffle PageRank step; the edge table
never widens. Iterations localCheckpoint so plan depth stays O(1)
per step instead of O(iterations).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from polars_matmul_spark.operators.urls import registrable_host_key

__all__ = [
    "extract_hrefs",
    "domain_edges",
    "pagerank_fixedpoint",
    "pagerank_dual",
    "pagerank_converged",
]

_HREF_RE = r'(?i)href\s*=\s*["\']([^"\'<>\s]+)["\']'


def extract_hrefs(text: Column) -> Column:
    """All href targets in an HTML body (array<string>): quoted
    attribute values only — the unquoted form is vanishingly rare in
    real markup and accepting it would swallow adjacent attributes."""
    return F.regexp_extract_all(text, F.lit(_HREF_RE), 1)


def domain_edges(
    docs: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Distinct (src_domain, dst_domain) edges: the page's own
    registrable domain -> each absolute http(s) link target's domain.
    Relative links (no scheme) carry no cross-domain signal and are
    dropped; self-loops are kept (a site linking itself is real
    signal for the dangling-mass rule, and PageRank handles loops).
    """
    # registrable_host_key(canonicalize_url(u)) == registrable_host_key(u)
    # for EVERY input (round 13): the key depends only on the host, and
    # host_of re-derives it from scratch — same trim, same
    # default-scheme rule, authority cut at the first of / ? #
    # (canonicalize's earlier fragment strip is subsumed), lowercasing
    # idempotent, userinfo and ANY port stripped by host_of regardless
    # of canonicalize's default-port rule; path/query normalization
    # never reaches the authority. Pinned by
    # tests/test_urls.py::test_host_key_canonicalize_invariant. Running
    # the key directly on the raw string drops the ~25x larger
    # canonicalize expression tree from both evaluation sites — the
    # tree was the row's codegen/JIT wall (guide §1.2/§7.2: the first
    # run of this plan shape compiled for ~10s+ and every run paid
    # ~0.8 ms/row interpreting the duplicated subtrees).
    links = docs.select(
        registrable_host_key(F.col(url_col)).alias("src_domain"),
        F.explode(extract_hrefs(F.col(text_col))).alias("href"),
    ).filter(F.col("href").rlike(r"(?i)^https?://"))
    return (
        links.select(
            "src_domain",
            registrable_host_key(F.col("href")).alias("dst_domain"),
        )
        .filter(F.col("src_domain") != "")
        .filter(F.col("dst_domain") != "")
        .distinct()
    )


def pagerank_fixedpoint(
    edges: DataFrame,
    src_col: str = "src_domain",
    dst_col: str = "dst_domain",
    n_iter: int = 3,
    damping: int = 85,
    scale: int = 1_000_000_000_000,
    redistribute_dangling: bool = False,
) -> DataFrame:
    """Exact integer-arithmetic PageRank over a (src, dst) edge list.

    -> (node, rank) with rank in integer units of ``1/scale`` total
    mass. Nodes = union of sources and destinations. Deterministic and
    engine-replayable by construction (see module docstring).

    ``redistribute_dangling=True`` adds the mass-conserving residual
    redistribution (module docstring, last deviation bullet): one
    1-row aggregate of the incoming sums per iteration, broadcast back
    over the node table — no extra data-sized shuffle, no driver
    round-trip, leak pinned to < n units per iteration.
    """
    if not 0 <= damping <= 100:
        raise ValueError("damping must be a percentage in 0..100")
    if n_iter < 0:
        raise ValueError("n_iter must be >= 0")
    nodes, e, deg, n, parts = _graph_tables(edges, src_col, dst_col)
    if n == 0:
        return nodes.withColumn("rank", F.lit(0).cast("long"))
    base = scale * (100 - damping) // 100 // n
    ranks = nodes.withColumn("rank", F.lit(int(scale // n)).cast("long"))
    for _ in range(n_iter):
        ranks = _pagerank_step(
            nodes, e, deg, ranks, n, base, damping, scale,
            redistribute_dangling, parts,
        )
    return ranks


def _graph_tables(edges, src_col, dst_col):
    """Deduped edge table, node table (checkpointed), out-degrees, n,
    and the slim-table partition count.

    The partition count matters more than it looks: a checkpointed
    rank table inherits ``spark.sql.shuffle.partitions`` (200 on a
    bare session) as its RDD partitioning, and because checkpointed
    RDD scans sit outside AQE's reach every later job schedules that
    many (mostly empty) tasks PER ITERATION. Size the slim (node,
    rank) tables by the data instead: ~50k rows per partition, floored
    at 1 — a 9-node driver-row graph iterates in single-task jobs, a
    1e9-node graph still spreads across the cluster."""
    # e and deg are lazily checkpointed: every iteration joins BOTH,
    # and without the checkpoint each step-job re-runs the edge dedup
    # shuffle and the degree agg from scratch. The lazy form costs no
    # extra job — e materializes inside the nodes-count job (AQE has
    # coalesced the distinct's output by then, so the pinned RDD
    # carries the coalesced partitioning, not the raw
    # spark.sql.shuffle.partitions), deg inside the first iteration.
    e = (
        edges.select(
            F.col(src_col).alias("__src"), F.col(dst_col).alias("__dst")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("__src").alias("node"))
        .unionByName(e.select(F.col("__dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    parts = max(1, min(int(n // 50_000) + 1, 100_000))
    nodes = nodes.coalesce(parts).localCheckpoint(eager=False)
    deg = (
        e.groupBy("__src")
        .agg(F.count("*").alias("__deg"))
        .localCheckpoint(eager=False)
    )
    return nodes, e, deg, n, parts


def _pagerank_step(
    nodes, e, deg, ranks, n, base, damping, scale, redistribute_dangling,
    parts=None, with_delta=False,
) -> DataFrame:
    """One exact integer iteration (the two-shuffle step); the new
    rank table is lazily checkpointed so plan depth stays O(1).

    ``with_delta=True`` additionally emits ``__delta`` =
    |new rank - old rank| per node, computed INSIDE the step's final
    projection (the join-back rides the ``ranks`` table, which carries
    the old rank, instead of the bare node table — identical rows by
    construction). The convergence loop then gets its movement total
    from a 1-column sum over the just-checkpointed output — no
    separate new-vs-old join job per iteration."""
    contrib = (
        e.join(ranks.withColumnRenamed("node", "__src"), "__src")
        .join(deg, "__src")
        .select(
            F.col("__dst").alias("node"),
            # integer `div` throughout — double division + cast
            # would MOSTLY agree but is not an identity we want to
            # carry a proof obligation for
            F.expr(f"((rank * {damping}) div 100) div __deg").alias("__c"),
        )
    )
    summed = contrib.groupBy("node").agg(F.sum("__c").alias("__in"))
    # the join-back left side: the old rank table when the caller
    # wants per-node deltas (same node set), else the slim node table
    left = (
        ranks.withColumnRenamed("rank", "__old") if with_delta else nodes
    )
    if redistribute_dangling:
        # the iteration's entire dropped mass as ONE scalar:
        # residual = scale - n*base - sum(incoming). Broadcast the
        # 1-row total back over the nodes and floor-divide it; the
        # per-node share is integer, order-independent, and DuckDB
        # replays it as a scalar subquery.
        tot = summed.agg(
            F.coalesce(F.sum("__in"), F.lit(0)).cast("long").alias("__tot")
        )
        share = F.expr(
            f"(cast({scale} as bigint) - cast({int(n) * int(base)} as"
            f" bigint) - __tot) div cast({n} as bigint)"
        )
        new_rank = (
            F.lit(int(base)) + F.coalesce(F.col("__in"), F.lit(0)) + share
        ).cast("long")
        out = (
            left.join(summed, "node", "left")
            .crossJoin(F.broadcast(tot))
        )
    else:
        new_rank = (
            F.lit(int(base)) + F.coalesce(F.col("__in"), F.lit(0))
        ).cast("long")
        out = left.join(summed, "node", "left")
    cols = ["node", new_rank.alias("rank")]
    if with_delta:
        cols.append(F.abs(new_rank - F.col("__old")).alias("__delta"))
    return out.select(*cols).coalesce(parts or 1).localCheckpoint(
        eager=False
    )


def pagerank_dual(
    edges: DataFrame,
    src_col: str = "src_domain",
    dst_col: str = "dst_domain",
    n_iter: int = 3,
    damping: int = 85,
    scale: int = 1_000_000_000_000,
) -> DataFrame:
    """Both variants over ONE prepared graph: -> (node, rank,
    rank_conserving). Bit-identical to running
    :func:`pagerank_fixedpoint` twice (pytest-pinned) but FUSED: the
    two rank columns ride ONE node table, so each iteration is one
    contrib join + one groupBy computing both sums — the same
    two-shuffle step as a single variant, not two of them. The
    per-column arithmetic is unchanged (identical integer expressions
    per variant), so fusion cannot change a single rank unit. Edge
    dedup, node table, degree agg and node count are also built once —
    the comparison shape the `domain_pagerank` driver row gates
    without paying the graph prep or the iteration twice."""
    if not 0 <= damping <= 100:
        raise ValueError("damping must be a percentage in 0..100")
    if n_iter < 0:
        raise ValueError("n_iter must be >= 0")
    nodes, e, deg, n, parts = _graph_tables(edges, src_col, dst_col)
    if n == 0:
        return nodes.withColumn("rank", F.lit(0).cast("long")).withColumn(
            "rank_conserving", F.lit(0).cast("long")
        )
    base = scale * (100 - damping) // 100 // n
    init = F.lit(int(scale // n)).cast("long")
    ranks = nodes.withColumn("rank", init).withColumn(
        "rank_conserving", init
    )
    for _ in range(n_iter):
        ranks = _pagerank_dual_step(
            nodes, e, deg, ranks, n, base, damping, scale, parts
        )
    return ranks


def _pagerank_dual_step(
    nodes, e, deg, ranks, n, base, damping, scale, parts=None
) -> DataFrame:
    """One fused iteration carrying (rank, rank_conserving): the SAME
    two-shuffle step as :func:`_pagerank_step`, with both variants'
    contributions computed in the one join and both sums in the one
    groupBy. The conserving residual stays a 1-row broadcast over the
    summed table (sum of the conserving column only)."""
    contrib = (
        e.join(ranks.withColumnRenamed("node", "__src"), "__src")
        .join(deg, "__src")
        .select(
            F.col("__dst").alias("node"),
            F.expr(f"((rank * {damping}) div 100) div __deg").alias("__c"),
            F.expr(
                f"((rank_conserving * {damping}) div 100) div __deg"
            ).alias("__cc"),
        )
    )
    summed = contrib.groupBy("node").agg(
        F.sum("__c").alias("__in"), F.sum("__cc").alias("__inc")
    )
    tot = summed.agg(
        F.coalesce(F.sum("__inc"), F.lit(0)).cast("long").alias("__tot")
    )
    share = F.expr(
        f"(cast({scale} as bigint) - cast({int(n) * int(base)} as"
        f" bigint) - __tot) div cast({n} as bigint)"
    )
    return (
        nodes.join(summed, "node", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "node",
            (F.lit(int(base)) + F.coalesce(F.col("__in"), F.lit(0)))
            .cast("long")
            .alias("rank"),
            (
                F.lit(int(base))
                + F.coalesce(F.col("__inc"), F.lit(0))
                + share
            )
            .cast("long")
            .alias("rank_conserving"),
        )
        .coalesce(parts or 1)
        .localCheckpoint(eager=False)
    )


def pagerank_converged(
    edges: DataFrame,
    src_col: str = "src_domain",
    dst_col: str = "dst_domain",
    max_iter: int = 50,
    tol_units: int | None = None,
    damping: int = 85,
    scale: int = 1_000_000_000_000,
    redistribute_dangling: bool = True,
) -> tuple[DataFrame, dict]:
    """Iterate the exact integer PageRank step until the total rank
    movement falls to ``tol_units`` (sum over nodes of |Δrank|, in
    integer 1/scale units) or ``max_iter`` is hit.

    -> ``(ranks, info)`` with ``info = {"n_iter": iterations actually
    run, "final_delta_units": the last movement, "converged": bool}``.

    The stop rule is an EXACT integer decision — the delta sum is an
    order-independent sum of longs, so the iteration count is
    deterministic on any engine and a fixed-``n_iter`` run with
    ``info["n_iter"]`` reproduces the ranks bit-for-bit (pytest-
    pinned). Default ``tol_units`` is ``scale // 10**6`` (1e-6
    relative total movement — far below anything that reorders a
    ranking).

    Cost note: convergence checking needs one driver-side scalar per
    iteration — the standard price of any iterate-until-stable job —
    but NOT a separate job: the step emits |Δrank| per node inside
    its own final projection (``with_delta=True``), so the scalar is
    a 1-column sum over the iteration's just-materialized checkpoint;
    the data-sized work per iteration is unchanged from the
    fixed-count form. Defaults to the mass-conserving variant:
    without it the conservative leak itself keeps the deltas from
    settling.
    """
    if not 0 <= damping <= 100:
        raise ValueError("damping must be a percentage in 0..100")
    if max_iter < 1:
        raise ValueError("max_iter must be >= 1")
    if tol_units is None:
        tol_units = scale // 10**6
    nodes, e, deg, n, parts = _graph_tables(edges, src_col, dst_col)
    if n == 0:
        return (
            nodes.withColumn("rank", F.lit(0).cast("long")),
            {"n_iter": 0, "final_delta_units": 0, "converged": True},
        )
    base = scale * (100 - damping) // 100 // n
    ranks = nodes.withColumn("rank", F.lit(int(scale // n)).cast("long"))
    delta = None
    it = 0
    for it in range(1, max_iter + 1):
        stepped = _pagerank_step(
            nodes, e, deg, ranks, n, base, damping, scale,
            redistribute_dangling, parts, with_delta=True,
        )
        # ONE job per iteration: this agg materializes the step's
        # lazy checkpoint and folds the per-node deltas in the same
        # pass (no consecutive-rank-tables join)
        delta = (
            stepped.agg(
                F.coalesce(F.sum("__delta"), F.lit(0)).alias("d")
            ).collect()[0]["d"]
        )
        ranks = stepped.drop("__delta")
        if delta <= tol_units:
            break
    return ranks, {
        "n_iter": it,
        "final_delta_units": int(delta),
        "converged": delta is not None and delta <= tol_units,
    }
