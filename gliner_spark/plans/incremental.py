"""Incremental KG maintenance: fold a new crawl batch into existing
node/edge tables without reprocessing old pages.

The update decomposes cleanly because of how the pipeline is shaped
(plans/kg.py):

- mentions and triples are PER-DOCUMENT (the NER stage is row-local and
  relations are intra-document) → strictly append-only. Only the new
  batch is scored; the checkpoint manifests already make the append
  idempotent and resumable.
- nodes/edges derive from the DISTINCT-SURFACE universe, which is
  vocabulary-bounded, not corpus-bounded (SURVEY.md §2.3) → re-running
  linking + connected components over the merged surface table is cheap
  relative to scoring even at 100 TB, and is the only correct choice:
  a new surface can bridge two previously separate components, so
  components cannot be maintained per-batch without a full re-closure.

Equivalence contract (pytest): incremental(A) then merge(B) produces
node/edge tables identical to building over A ∪ B from scratch.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import PipelineConfig
from ..operators.canonicalize import canonical_entities, nodes_table
from ..operators.checkpoint import checkpoint_write, with_part_key
from ..operators.linking import entity_surfaces, lsh_links
from ..operators.ner import extract_mentions
from ..operators.relations import extract_relations
from .kg import KgResult


def _batch_fingerprint(
    new_pages: DataFrame, id_col: str, text_col: str
) -> str:
    """Deterministic, order-independent id of a batch's CONTENT:
    bit-xor of xxhash64(id, text) + row count. One cheap
    projection-only pass (trivial next to scoring); a replay of the
    same batch maps to the same fingerprint, different batches to
    different ones (2^-64 collision odds). Hashing (id, text) — not
    ids alone — means a recrawl that re-submits the same urls with
    UPDATED text gets a FRESH fingerprint, so its rescored mentions
    are not left-anti'd away by the earlier batch's DONE manifest."""
    row = new_pages.select(
        F.expr(f"bit_xor(xxhash64(`{id_col}`, `{text_col}`))").alias("x"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    return f"{(row.x or 0) & 0xFFFFFFFFFFFFFFFF:016x}-{row.n}"


def _prefix_keys(df: DataFrame, fp: str) -> DataFrame:
    return df.withColumn(
        "part_key", F.concat(F.lit(f"{fp}-"), F.col("part_key"))
    )


def merge_kg_batch(
    new_pages: DataFrame,
    labels: Sequence[str],
    checkpoint_root: str,
    cfg: PipelineConfig = PipelineConfig(),
    id_col: str = "url",
    text_col: str = "text",
    link_fn=None,
    batch_id: str | int | None = None,
) -> KgResult:
    """Score ONLY ``new_pages``, append their mentions/triples under
    ``checkpoint_root`` (manifest-idempotent: re-runs skip DONE
    partitions), then rebuild nodes/edges from the merged mention
    corpus. Returns the merged KG tables.

    Mention partitions are BATCH-SCOPED: part_key =
    ``{batch}-{hash bucket}``. With a shared bucket space, a later
    batch whose doc ids hash into buckets an earlier batch already
    marked DONE would be silently left-anti'd away — batches routinely
    share hash buckets, so the manifest key must carry batch identity.
    ``batch_id`` (e.g. Structured Streaming's foreachBatch epoch id,
    stable across replays) is used when given; otherwise a
    content-derived fingerprint of the batch's ids stands in — both
    make a replay of the same batch a no-op while distinct batches
    never collide.

    ``link_fn`` picks the linking path; the default is the SAME
    lsh_links configuration plans/kg.build_kg uses, so incremental
    merging is bit-equivalent to a from-scratch build (pytest-pinned);
    pass ``exact_jaccard_links`` for the oracle-exact path."""
    spark = new_pages.sparkSession

    fp = (
        str(batch_id)
        if batch_id is not None
        else _batch_fingerprint(new_pages, id_col, text_col)
    )
    new_mentions = extract_mentions(
        new_pages, labels, id_col=id_col, text_col=text_col,
        config=cfg.gliner,
    )
    # append-only stages: the manifest left-anti skips anything already
    # processed, so calling merge twice with the same batch is a no-op.
    # expected_part_keys = the batch's full part-key universe (derived
    # from the INPUT ids, not the mention output): partitions whose docs
    # yield zero mentions are invisible in new_mentions and would be
    # re-scored on every subsequent merge unless recorded DONE/0 here.
    # The id is cast to STRING before hashing because extract_mentions
    # emits doc_id as string (ner.py) — xxhash64(long) != xxhash64(string
    # of the same value), so hashing the raw column would record DONE/0
    # under phantom keys while real zero-mention buckets stay unrecorded.
    batch_keys = _prefix_keys(
        with_part_key(
            new_pages.select(
                F.col(id_col).cast("string").alias("doc_id")
            ),
            "doc_id",
        ),
        fp,
    ).select("part_key")
    checkpoint_write(
        _prefix_keys(with_part_key(new_mentions, "doc_id"), fp),
        checkpoint_root, "mentions",
        lineage={"labels": list(labels), "batch": fp},
        expected_part_keys=batch_keys,
    )
    mentions = spark.read.parquet(f"{checkpoint_root}/mentions")

    triples = extract_relations(
        mentions.repartition("doc_id"),
        window_bytes=cfg.relation_window * 4,
    )

    # global closure over the merged (vocabulary-bounded) surface set:
    # new surfaces may bridge previously separate components
    surfaces = entity_surfaces(mentions)
    if link_fn is None:
        links = lsh_links(
            surfaces, k=cfg.shingle_k, n_perms=cfg.minhash_perms,
            bands=cfg.lsh_bands * 2,
        )
    else:
        links = link_fn(surfaces)
    entities = canonical_entities(surfaces, links, cfg.cc_max_iters)
    nodes = nodes_table(entities)

    ent_map = F.broadcast(
        entities.select(
            F.col("label").alias("e_label"),
            F.col("surface").alias("e_surface"),
            "entity_id",
        )
    )
    t = triples
    edges = (
        t.join(
            ent_map,
            (F.lower(t.subj) == F.col("e_surface"))
            & (t.subj_label == F.col("e_label")),
        )
        .withColumnRenamed("entity_id", "src_entity")
        .drop("e_label", "e_surface")
        .join(
            ent_map,
            (F.lower(t.obj) == F.col("e_surface"))
            & (t.obj_label == F.col("e_label")),
        )
        .withColumnRenamed("entity_id", "dst_entity")
        .groupBy("src_entity", "dst_entity", "pred")
        .agg(
            F.count(F.lit(1)).alias("support"),
            F.round(F.sum("prob"), 4).alias("weight"),
        )
    )
    return KgResult(mentions, triples, nodes, edges)
