"""Graph analytics over co-occurrence graphs: PageRank and triangle census.

The engine already runs one iterative graph fixpoint — connected components
(`operators/dedup.py:connected_components`, the dedup-cluster labeler). This
module adds the two other canonical distributed-graph shapes a corpus /
catalog pipeline needs, both over the same kind of item co-occurrence graph
(parts bought together, documents syndicated together):

- ``pagerank``: damped power iteration. Like the CC fixpoint it is a loop of
  one shuffle-join + one aggregate per round with ``localCheckpoint`` lineage
  truncation — but unlike CC it is NUMERIC, so cross-engine hash-exactness
  requires an arithmetic lane both engines floor identically. Every quantity
  is a BIGINT on an integer grid (``scale``), every division is integer
  ``DIV`` with positive operands (truncation == floor), and the oracle unrolls
  the same fixed-iteration recurrence as chained CTEs — so the driver hash
  certifies ten rounds of distributed mass propagation bit-for-bit.
- ``triangle_counts``: per-node triangle participation. The scale trick is
  degree-ordered edge orientation (each undirected edge points from its
  (degree, id)-smaller endpoint to the larger): wedge generation then costs
  sum(out_deg^2) = O(m^1.5) instead of sum(deg^2), which is the difference
  between "the hub node explodes" and "bounded work" on power-law graphs
  (Suri & Vassilvitskii, "Counting Triangles and the Curse of the Last
  Reducer", WWW'11). Each triangle is emitted exactly once (its
  orientation-minimal vertex is the only one with both others as
  out-neighbors), so the counts are exact integers and the oracle is a plain
  three-way join over canonical u<v edges.

The reference (`loader.py` — a single-threaded pandas ETL) has no graph
analytics at all; SURVEY.md §2 Part C carries these as north-star extension
rows beside connected components.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def cooccurrence_edges(
    df: DataFrame,
    key_col: str,
    item_col: str,
    directed: bool = True,
) -> DataFrame:
    """Build the item co-occurrence graph: an edge (u, v) with weight w means
    items u and v appeared under w distinct keys together (parts in the same
    order, docs from the same source batch, ...).

    Scale posture: the self-join is per-KEY, and the per-key fan-out is
    bounded by the max group size (TPC-H orders hold ≤7 lineitems, so ≤42
    directed pairs per order) — this is the bounded-blocking shape every
    dedup/ER operator in this engine uses, never an all-pairs over the item
    universe. The distinct() collapses repeated (key, item) rows first so a
    part appearing on two lines of one order contributes one co-occurrence.

    ``directed=True`` emits both (u, v) and (v, u) — what ``pagerank`` wants;
    ``directed=False`` emits canonical u < v rows — what ``triangle_counts``
    wants.
    """
    ki = df.select(
        F.col(key_col).alias("_k"), F.col(item_col).alias("_i")
    ).distinct()
    other = ki.select(F.col("_k"), F.col("_i").alias("_j"))
    cond = (
        (ki["_i"] != other["_j"]) if directed else (ki["_i"] < other["_j"])
    )
    return (
        ki.join(other, "_k")
        .where(cond)
        .groupBy(F.col("_i").alias("src"), F.col("_j").alias("dst"))
        .agg(F.count("*").cast("bigint").alias("weight"))
    )


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "weight",
    iters: int = 10,
    scale: int = 10_000_000_000,
    damping_num: int = 85,
    damping_den: int = 100,
) -> DataFrame:
    """Weighted PageRank by damped power iteration on an integer grid.

    Recurrence (all BIGINT, all divisions integer-floor over positive
    operands, so Spark ``DIV`` and DuckDB ``//`` agree bit-for-bit):

        pr_0(v)     = scale DIV N
        contrib(e)  = (d_num * pr_t(src) * w_e) DIV (d_den * W_out(src))
        pr_{t+1}(v) = ((d_den - d_num) * scale) DIV (d_den * N)
                      + sum over in-edges e of contrib(e)

    Each edge's contribution floors INDIVIDUALLY (the oracle replays the
    identical per-edge expression), so the result is deterministic under any
    partitioning or join order — integer addition commutes, unlike float.
    Overflow bound: d_num * scale * max(w) must stay under 2^63; the default
    scale 1e10 leaves headroom to per-edge weights of ~1e7 co-occurrences.

    Loop shape (the CC loop's twin, `dedup.py:connected_components`): the
    edge table joins `outw` ONCE up front and is `localCheckpoint`-ed so no
    round re-executes the caller's edge-generation plan; each round is one
    shuffle-join (ranks into edges on src) + one aggregate (sum into dst) +
    one broadcast of the single-row N; the new ranks checkpoint and the
    previous round's blocks retire by exact RDD id. At cluster scale the
    checkpoint becomes a persisted table per round — same loop body. Nodes
    with no in-edges keep the teleport term via the left join from the node
    universe; dangling mass needs no correction here because the co-occurrence
    graph is symmetric (every node has out-edges) — callers feeding a
    non-symmetric graph should add the standard dangling-sum redistribution.

    Returns (node, pr_scaled BIGINT). pr_scaled/scale sums to ≤1 (flooring
    leaks mass downward deterministically — both engines leak identically).
    """
    from ..session import local_checkpoint_rdd_id, unpersist_rdd_ids

    sc = edges.sparkSession.sparkContext

    e = (
        edges.select(
            F.col(src_col).alias("_u"),
            F.col(dst_col).alias("_v"),
            F.col(weight_col).cast("bigint").alias("_w"),
        )
        .where(F.col(src_col) != F.col(dst_col))
    )
    outw = e.groupBy("_u").agg(F.sum("_w").alias("_wout"))
    # Pay the edge plan + out-weight join once; every round reuses the blocks.
    ew = e.join(outw, "_u").localCheckpoint()
    _ew_id = local_checkpoint_rdd_id(ew)

    nodes = (
        ew.select(F.col("_u").alias("node"))
        .union(ew.select(F.col("_v").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    _nodes_id = local_checkpoint_rdd_id(nodes)
    n_df = nodes.agg(F.count("*").alias("_n"))

    ranks = (
        nodes.crossJoin(F.broadcast(n_df))
        .select(
            "node",
            F.expr(f"CAST({scale} AS BIGINT) DIV _n").alias("pr_scaled"),
        )
        .localCheckpoint()
    )
    _prev_id = local_checkpoint_rdd_id(ranks)

    teleport = F.expr(
        f"CAST({(damping_den - damping_num) * scale} AS BIGINT)"
        f" DIV (CAST({damping_den} AS BIGINT) * _n)"
    )
    for _ in range(iters):
        contrib = (
            ew.join(ranks, ew["_u"] == ranks["node"])
            .select(
                F.col("_v"),
                F.expr(
                    f"(CAST({damping_num} AS BIGINT) * pr_scaled * _w)"
                    f" DIV (CAST({damping_den} AS BIGINT) * _wout)"
                ).alias("_c"),
            )
            .groupBy("_v")
            .agg(F.sum("_c").alias("_in"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(n_df))
            .join(contrib, nodes["node"] == contrib["_v"], "left")
            .select(
                "node",
                (teleport + F.coalesce(F.col("_in"), F.lit(0)))
                .cast("bigint")
                .alias("pr_scaled"),
            )
            .localCheckpoint()
        )
        new_id = local_checkpoint_rdd_id(ranks)
        if _prev_id is not None:
            unpersist_rdd_ids(sc, {_prev_id})
        _prev_id = new_id

    # The returned DataFrame is fully materialized (checkpointed); the edge
    # and node scaffolding can retire as soon as the caller consumes it —
    # they stay pinned here because the session's release_caches() sweep
    # (plans/__init__._wrap_release) reclaims checkpoint blocks between
    # registry queries.
    return ranks


def triangle_counts(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-node triangle participation over an undirected graph.

    Input edges may be directed, duplicated, or carry self-loops; they are
    canonicalized to distinct u < v pairs first. Each undirected edge is then
    ORIENTED from its (degree, id)-lexicographically smaller endpoint to the
    larger one. Wedges are pairs of out-neighbors of one center, so the wedge
    count is sum(out_deg choose 2), and the orientation bounds every node's
    out-degree by O(sqrt(m)) — the hub that would generate deg^2 wedges in a
    naive enumeration generates almost none, because its edges all point AT
    it (Suri & Vassilvitskii WWW'11; same reason the engine's MinHash path
    collapses identical-set cliques before emitting pairs). A triangle's
    orientation-minimal vertex is the unique center seeing both others as
    out-neighbors, so each triangle is emitted exactly once; the closing edge
    is checked against the canonical u < v set (for b < c the undirected edge
    IS the row (b, c)).

    Plan: two shuffles — wedge self-join keyed by center, closure join keyed
    by the (b, c) pair — then an explode + count. All exact integers; the
    oracle is the plain three-way join over canonical edges.
    """
    und = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("u"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .where(F.col("u") < F.col("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("node"))
        .union(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("_du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("_dv"))
    lower_is_u = (F.col("_du") < F.col("_dv")) | (
        (F.col("_du") == F.col("_dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lower_is_u, F.col("u")).otherwise(F.col("v")).alias("x"),
            F.when(lower_is_u, F.col("v")).otherwise(F.col("u")).alias("y"),
        )
    )
    o2 = oriented.select(F.col("x"), F.col("y").alias("z"))
    # y < z takes each unordered out-neighbor pair exactly once AND leaves it
    # in the canonical order the closure join needs (und rows are u < v).
    wedges = (
        oriented.join(o2, "x")
        .where(F.col("y") < F.col("z"))
        .select(
            F.col("x").alias("a"),
            F.col("y").alias("b"),
            F.col("z").alias("c"),
        )
    )
    tri = wedges.join(
        und, (wedges["b"] == und["u"]) & (wedges["c"] == und["v"])
    ).select("a", "b", "c")
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("n_triangles"))
    )
