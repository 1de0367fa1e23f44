"""Degree-orientation scale evidence for the triangle operator.

Quantifies, on a synthetic hub-skewed KG, what the orientation trick
(operators/graph.triangles — orient every undirected edge from the
lower-(degree, id) endpoint) saves over the naive src-src self-join of
the SAME enumeration:

- wedge-candidate volume for BOTH formulations via the analytic
  identity Σ_node C(deg_out(node), 2) vs Σ_node C(deg(node), 2) —
  the exact row counts of the respective self-joins before the closing
  join, computed as aggregations (the naive join itself is NOT
  executed at full scale: its hub-quadratic candidate set is the
  scale-kill this probe documents);
- the oriented operator executed END-TO-END at full scale (wall time +
  triangle count);
- both formulations executed end-to-end at a small control size, with
  triangle-set equality asserted (orientation completeness, checked —
  every triangle has exactly one all-out node).

The synthetic graph plants hubs explicitly: a power-ish tail via
modular hashing plus ``hubs`` star centers each touching ``hub_deg``
random nodes — the shape a web KG's celebrity entities take.

Usage: python tools/triangle_probe.py [edges=2000000] [control=30000]
Prints one JSON line; numbers go to SCALE.md / BENCH notes.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from gliner_spark.operators.graph import triangles, undirected_edges  # noqa: E402
from gliner_spark.session import build_session  # noqa: E402


def synth_edges(spark, n_edges: int, hubs: int = 20, hub_deg: int = 20000,
                n_nodes: int | None = None):
    n_nodes = n_nodes or max(1000, n_edges // 20)
    bulk = spark.range(0, n_edges).select(
        (F.abs(F.xxhash64("id", F.lit(1))) % n_nodes).alias("src_entity"),
        (F.abs(F.xxhash64("id", F.lit(2))) % n_nodes).alias("dst_entity"),
    )
    star = spark.range(0, hubs * hub_deg).select(
        (n_nodes + F.col("id") % hubs).alias("src_entity"),
        (F.abs(F.xxhash64("id", F.lit(3))) % n_nodes).alias("dst_entity"),
    )
    return bulk.unionByName(star)


def wedge_counts(und):
    """(naive, oriented) analytic wedge-candidate volumes."""
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    )
    naive = deg.agg(F.sum(F.col("d") * (F.col("d") - 1) / 2)).first()[0]
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("db"))
    ranked = und.join(da, "a").join(db, "b")
    lo_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    out_deg = (
        ranked.select(
            F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("u")
        )
        .groupBy("u").agg(F.count(F.lit(1)).alias("od"))
    )
    oriented = out_deg.agg(
        F.sum(F.col("od") * (F.col("od") - 1) / 2)
    ).first()[0]
    return int(naive), int(oriented)


def main():
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    control = int(sys.argv[2]) if len(sys.argv) > 2 else 30_000
    spark = build_session(app_name="triangle-probe", cores=8)

    und = undirected_edges(synth_edges(spark, n_edges)).localCheckpoint()
    m = und.count()
    naive_w, ori_w = wedge_counts(und)

    t0 = time.time()
    n_tri = triangles(
        und.select(F.col("a").alias("src_entity"),
                   F.col("b").alias("dst_entity"))
    ).count()
    t_ori = round(time.time() - t0, 3)

    # control-scale completeness: oriented == naive enumeration
    undc = undirected_edges(synth_edges(spark, control, hubs=4,
                                        hub_deg=500)).localCheckpoint()
    got = {
        tuple(r)
        for r in triangles(
            undc.select(F.col("a").alias("src_entity"),
                        F.col("b").alias("dst_entity"))
        ).collect()
    }
    e1 = undc.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = undc.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = undc.select(F.col("a").alias("x"), F.col("b").alias("z"))
    want = {
        tuple(r)
        for r in e1.join(e2, "y").join(e3, ["x", "z"])
        .select("x", "y", "z").collect()
    }
    assert got == want, (len(got), len(want))

    print(json.dumps({
        "edges_undirected": m,
        "wedge_candidates_naive": naive_w,
        "wedge_candidates_oriented": ori_w,
        "ratio": round(naive_w / max(ori_w, 1), 1),
        "oriented_run_sec": t_ori,
        "triangles": n_tri,
        "control_edges": undc.count(),
        "control_triangles_equal": True,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
