"""KG-embedding training-data preparation over the materialized edges.

A KG built at crawl scale feeds link-prediction / embedding training
(TransE-style), which needs two operators the analytics family does
not cover: a leakage-safe train/valid/test split and deterministic
negative sampling. The reference engine stops at triple emission
(/root/reference/src/gliner_structured.cpp), so this is
pipeline-extension surface with DuckDB twins in tests/test_kgtrain.py
— every random choice is a 60-bit md5 fold (the cross-engine hash
family oracle.py already uses for simhash), so the twins recompute the
IDENTICAL split and negatives in SQL, no tolerance.

Scale notes (10^9-edge posture):

* ``edge_split`` is a pure row-local projection — zero shuffles. The
  split key is the CANONICAL undirected (least, greatest, pred)
  triple, so an edge and its reverse always land in the same split:
  the classic inverse-edge leak (test (a,r,b) answerable from train
  (b,r,a)) is impossible by construction, not by a cleanup pass.
* ``negative_sample`` never materializes the node vocabulary on the
  driver and never cross-joins: nodes are hash-assigned to ``buckets``
  buckets, each (edge, attempt) candidate hash-picks ONE target
  bucket, and the corrupt entity is the argmin-hash node of that
  bucket — one equi-join with |V|/buckets average fan-out, reduced by
  a partial-aggregated min(struct) (hot buckets combine map-side),
  then one anti-join against the true edge set (the standard
  "filtered" setting). Candidates whose target bucket is empty or
  whose pick collides with a true edge are dropped, so the realized
  rate is <= k per positive — deterministic, and the drop is the
  filtered-setting semantics, not a bug.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SEP = "\x1f"


def md5h(*cols: Column | str) -> Column:
    """60-bit non-negative int from md5 of the SEP-joined columns —
    bit-identical to DuckDB's ('0x' || substr(md5(x),1,15))::BIGINT.

    NULL inputs are coalesced to a sentinel (\\x1e) BEFORE joining
    (r6 ADVICE): ``concat_ws`` silently SKIPS null columns, so a null
    pred (or entity) would collapse distinct keys onto each other and
    diverge from a ``||``-based SQL twin where NULL propagates. A
    DuckDB twin over nullable inputs must COALESCE to the same
    sentinel (chr(30)); the existing twins run on non-null columns,
    where the coalesce is a no-op."""
    joined = F.concat_ws(SEP, *[
        F.coalesce(
            (F.col(c) if isinstance(c, str) else c).cast("string"),
            F.lit("\x1e"),
        )
        for c in cols
    ])
    return F.conv(F.substring(F.md5(joined), 1, 15), 16, 10).cast("long")


def edge_split(
    edges: DataFrame,
    test_rate: float = 0.1,
    valid_rate: float = 0.1,
    seed: int = 13,
    src: str = "src_entity",
    dst: str = "dst_entity",
    pred: str = "pred",
) -> DataFrame:
    """Append a deterministic ``split`` column (train/valid/test).

    The hash key is (least(src,dst), greatest(src,dst), pred, seed):
    reverse duplicates of an edge co-locate in one split, closing the
    inverse-edge leak. Row-local, no shuffle; rates are exact in
    expectation (md5 uniformity) and reproducible across engines.
    """
    if test_rate + valid_rate >= 1.0:
        raise ValueError("test_rate + valid_rate must be < 1")
    u = (
        md5h(
            F.least(F.col(src), F.col(dst)),
            F.greatest(F.col(src), F.col(dst)),
            F.col(pred),
            F.lit(seed),
        )
        % 1000000
    ) / 1000000.0
    split = (
        F.when(u < test_rate, F.lit("test"))
        .when(u < test_rate + valid_rate, F.lit("valid"))
        .otherwise(F.lit("train"))
    )
    return edges.withColumn("split", split)


def negative_sample(
    edges: DataFrame,
    k: int = 1,
    buckets: int = 64,
    seed: int = 17,
    src: str = "src_entity",
    dst: str = "dst_entity",
    pred: str = "pred",
) -> DataFrame:
    """Corrupted-object negatives for each positive triple: up to ``k``
    rows (src, pred, neg_dst, attempt) per edge, filtered against the
    true edge set (no false negatives) and against the identity
    corruption.

    ``buckets`` trades join fan-out (avg |V|/buckets rows per
    candidate before the partial-agg min) against empty-bucket drops;
    set it well below the entity vocabulary size. All choices are
    md5-folded from (src, pred, dst, attempt, seed) — rerunning, or
    recomputing in DuckDB, yields byte-identical negatives.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    e = edges.select(
        F.col(src).alias("s"), F.col(pred).alias("p"), F.col(dst).alias("o")
    ).distinct()
    nodes = (
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("o").alias("node")))
        .distinct()
        .select("node", (md5h("node", F.lit(seed)) % buckets).alias("nb"))
    )
    cand = e.select(
        "s", "p", "o",
        F.explode(F.sequence(F.lit(1), F.lit(k))).alias("attempt"),
    ).withColumn(
        "tb", md5h("s", "p", "o", "attempt", F.lit(seed)) % buckets
    )
    picked = (
        cand.join(nodes, cand.tb == nodes.nb)
        .groupBy("s", "p", "o", "attempt")
        .agg(
            F.min(
                F.struct(
                    md5h("node", "s", "p", "o", "attempt").alias("h"),
                    F.col("node").alias("n"),
                )
            ).alias("_w")
        )
        .select("s", "p", "o", "attempt", F.col("_w.n").alias("neg_dst"))
        .where(F.col("neg_dst") != F.col("o"))
    )
    true_obj = e.select("s", "p", F.col("o").alias("neg_dst"))
    return (
        picked.join(true_obj, ["s", "p", "neg_dst"], "left_anti")
        .select(
            F.col("s").alias(src),
            F.col("p").alias(pred),
            F.col("o").alias(dst),
            "attempt",
            "neg_dst",
        )
    )
