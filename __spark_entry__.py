"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship KG pipeline slice (pages → mentions →
triples) on sf0.001. ``queries``/``oracle_sql`` pair every implemented
operator with a DuckDB oracle where SQL-expressible (SURVEY.md §5);
non-SQL-expressible ops (MinHash signatures, greedy overlap resolution)
get rows-only entries plus pytest goldens.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gliner_spark import oracle
from gliner_spark.kernels.scorer import SOUP_LABELS
from gliner_spark.operators.canonicalize import canonical_entities, nodes_table
from gliner_spark.operators.linking import (
    entity_surfaces,
    exact_jaccard_links,
    lsh_links,
)
from gliner_spark.operators.ner import extract_mentions
from gliner_spark.operators.relations import aggregate_edges, extract_relations
from gliner_spark.sources.pages import pages_from_documents


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_mentions(
        _documents(spark, sf_dir), SOUP_LABELS, id_col="doc_id", text_col="text"
    )


def q_ner_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _mentions(spark, sf_dir)


def q_ner_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_relations(_mentions(spark, sf_dir))


def q_kg_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return aggregate_edges(extract_relations(_mentions(spark, sf_dir)))


def q_kg_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_jaccard_links(entity_surfaces(_mentions(spark, sf_dir)))


def q_kg_links_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # no SQL oracle (MinHash; FIXTURES.md §5) → rows-only check; recall
    # vs the exact variant is asserted in tests/test_linking.py
    return lsh_links(entity_surfaces(_mentions(spark, sf_dir)))


def q_kg_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    surfaces = entity_surfaces(_mentions(spark, sf_dir))
    links = exact_jaccard_links(surfaces)
    return nodes_table(canonical_entities(surfaces, links))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: pages → NER mentions → relation triples at sf0.001."""
    pages = pages_from_documents(spark, "/root/testdata/sf0.001")
    mentions = extract_mentions(pages, SOUP_LABELS)
    return extract_relations(mentions)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "ner_mentions": q_ner_mentions,
        "ner_triples": q_ner_triples,
        "kg_edges": q_kg_edges,
        "kg_links": q_kg_links,
        "kg_links_lsh": q_kg_links_lsh,
        "kg_nodes": q_kg_nodes,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "ner_mentions": oracle.ner_mentions_sql(),
        "ner_triples": oracle.ner_triples_sql(),
        "kg_edges": oracle.kg_edges_sql(),
        "kg_links": oracle.kg_links_sql(),
        "kg_nodes": oracle.kg_nodes_sql(),
    }
