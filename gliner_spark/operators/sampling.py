"""Training-data sampling + shard packing.

Two operators a 100 TB curation pipeline runs after filtering:

- ``sample_by_hash``: deterministic per-stratum sampling. Instead of
  ``sampleBy`` (RNG-seeded, not reproducible across engines or cluster
  layouts), a document is kept iff the first 8 hex chars of
  ``md5(doc_id)`` fall below the stratum's rate — a pure function of the
  row, so the sample is stable under re-runs, resumable partitions, AND
  reproducible in the DuckDB oracle (md5 agrees across engines).
- ``pack_shards``: sequence packing — assign documents to fixed
  token-budget training shards by cumulative token count in a canonical
  order. One window pass; shard boundaries are deterministic.

Scale notes: hash sampling is stateless row-local (survives any
partitioning); packing's window runs per stratum partition — at 10^12
docs pack within (lang, bucket) partitions rather than one global order
(the global sequential cumsum is the one thing that cannot distribute;
per-bucket packing is the standard compromise and is what this operator
does with ``part_col``).
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def rate_to_hex(rate: float) -> str:
    """Rate → 8-char lowercase hex threshold over the md5-prefix space.
    Comparison happens on fixed-width lowercase hex STRINGS, which is
    numerically ordered — and identical in Spark and DuckDB, so the
    sampled set is bit-for-bit reproducible cross-engine.

    rate ≥ 1.0 returns a sentinel strictly above every hex string ('g' >
    'f'), so full-rate strata are lossless under the strict '<' compare
    (a 0xffffffff threshold would silently drop docs whose md5 prefix is
    exactly 'ffffffff' — keep probability 1 − 2⁻³² instead of 1)."""
    if rate >= 1.0:
        return "g" * 8
    return format(max(int(rate * (1 << 32)), 0), "08x")


def sample_by_hash(
    docs: DataFrame,
    rates: Dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Rows whose md5(doc_id) 8-hex-char prefix is below their stratum's
    threshold. Deterministic, engine-independent, resume-safe."""
    thr = F.lit(rate_to_hex(default_rate))
    for key, r in rates.items():
        thr = F.when(
            F.col(strata_col) == key, F.lit(rate_to_hex(r))
        ).otherwise(thr)
    prefix = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
    return docs.where(prefix < thr)


def pack_shards(
    docs: DataFrame,
    token_budget: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    part_col: str | None = None,
) -> DataFrame:
    """(doc_id[, part], n_tokens, shard_id): documents packed into
    shards of ~token_budget whitespace tokens, in id order (per
    partition when ``part_col`` given — the distributable form)."""
    n_tok = F.size(F.split(F.col(text_col), " ")).cast("long")
    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        *([F.col(part_col).alias("part")] if part_col else []),
        n_tok.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("part") if part_col else Window.partitionBy()
    ).orderBy("doc_id")
    cum_before = F.coalesce(
        F.sum("n_tokens").over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    return base.withColumn(
        "shard_id", F.floor(cum_before / F.lit(token_budget)).cast("long")
    )


def mixture_sample(
    docs: DataFrame,
    alpha: float = 0.7,
    target_frac: float = 0.5,
    strata_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-reweighted cross-source sampling — the data-MIXING
    step of an LLM pipeline (multilingual/multi-source training sets
    re-weight strata by ``n_s^alpha``; alpha<1 upsamples small sources
    relative to their natural share, Conneau & Lample 2019 style).

    Per stratum s: weight w_s = n_s^alpha / Σ n_s^alpha, allocation
    keep_s = target_frac · N · w_s (capped at n_s), rate_s = keep_s/n_s
    rounded to 6 decimals (pinning the float so both engines derive the
    identical md5 threshold). Membership uses the same deterministic
    md5-prefix rule as ``sample_by_hash`` — reproducible across
    engines, re-runs and cluster layouts.

    Scale shape: one count aggregation (stratum-keyed, map-side
    combined) produces a model-sized rate table that broadcasts onto
    the corpus scan; the keep rule is row-local. Returns
    (doc_id, strata, rate) for audit — project rate away for the
    training set itself.
    """
    counts = docs.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n_s"))
    tot = counts.agg(
        F.sum("n_s").alias("n_total"),
        F.sum(F.pow("n_s", F.lit(float(alpha)))).alias("z"),
    )
    rate = F.least(
        F.lit(1.0),
        F.round(
            F.lit(float(target_frac)) * F.col("n_total")
            * F.pow("n_s", F.lit(float(alpha)))
            / F.col("z") / F.col("n_s"),
            6,
        ),
    )
    # double→bigint truncation differs across engines (Spark truncates,
    # DuckDB rounds): floor() first so both agree
    thr = F.when(F.col("rate") >= 1.0, F.lit("g" * 8)).otherwise(
        F.lpad(
            F.lower(F.hex(
                F.floor(F.col("rate") * F.lit(float(1 << 32)))
                .cast("bigint")
            )),
            8, "0",
        )
    )
    rates = (
        counts.crossJoin(F.broadcast(tot))
        .select(strata_col, rate.alias("rate"))
        .select(strata_col, "rate", thr.alias("thr"))
    )
    prefix = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
    return (
        docs.join(F.broadcast(rates), strata_col)
        .where(prefix < F.col("thr"))
        .select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(strata_col),
            "rate",
        )
    )
