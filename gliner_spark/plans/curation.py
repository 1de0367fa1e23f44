"""Corpus curation: the composed keep/drop decision per document.

The end-to-end filter a training-data pipeline runs before anything
else: language gate + quality gate + duplicate suppression, combining
the individual operators into one oracle-checkable verdict table:

  (doc_id, lang_ok, quality_ok, is_exact_dup, is_near_dup, keep)

keep = lang_ok ∧ quality_ok ∧ ¬is_exact_dup ∧ ¬is_near_dup, where dup
flags mark non-canonical members (the minimum doc_id of each duplicate
group survives). Near-dup groups come from connected components over
the ngram-Jaccard pairs so transitive chains (A~B~C) keep exactly one
document — at web scale swap in ``minhash_dups`` for the pair source
(same shape, same component logic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.canonicalize import connected_components
from ..operators.dedup import exact_dup_groups, ngram_jaccard_dups
from ..operators.textstats import detect_language, quality_score


def curate(
    docs: DataFrame,
    allowed_langs=("en",),
    min_quality: float = 0.5,
    near_dup_threshold: float = 0.8,
    pair_source=None,
) -> DataFrame:
    ids = docs.select(F.col("doc_id").cast("long").alias("doc_id"))

    lang = detect_language(docs).select(
        "doc_id", F.col("pred_lang").isin(*allowed_langs).alias("lang_ok")
    )
    qual = quality_score(docs).select(
        "doc_id", (F.col("quality") >= min_quality).alias("quality_ok")
    )
    exact = exact_dup_groups(docs).select(
        "doc_id", (~F.col("keep")).alias("is_exact_dup")
    )

    # keep ids numeric end-to-end: connected_components takes any
    # orderable id type, and MIN over strings would pick "413" over "45"
    pairs = (pair_source or ngram_jaccard_dups)(
        docs, threshold=near_dup_threshold
    )
    comp = connected_components(pairs.select("src", "dst")).select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("dup_group"),
    )
    near = ids.join(comp, "doc_id", "left").select(
        "doc_id",
        (
            F.col("dup_group").isNotNull()
            & (F.col("dup_group") != F.col("doc_id"))
        ).alias("is_near_dup"),
    )

    return (
        ids.join(lang, "doc_id")
        .join(qual, "doc_id")
        .join(exact, "doc_id")
        .join(near, "doc_id")
        .select(
            "doc_id",
            "lang_ok",
            "quality_ok",
            "is_exact_dup",
            "is_near_dup",
            (
                F.col("lang_ok")
                & F.col("quality_ok")
                & ~F.col("is_exact_dup")
                & ~F.col("is_near_dup")
            ).alias("keep"),
        )
    )
