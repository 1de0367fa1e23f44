"""Edge cases: null/empty texts, empty inputs, single-row frames —
every operator must degrade to empty output, never throw."""

import pytest
from pyspark.sql import functions as F

from gliner_spark.kernels.scorer import ALL_LABELS
from gliner_spark.operators.canonicalize import (
    canonical_entities,
    connected_components,
    connected_components_star,
    nodes_table,
)
from gliner_spark.operators.dedup import (
    exact_dup_groups,
    minhash_dups,
    ngram_jaccard_dups,
    simhash_dups,
)
from gliner_spark.operators.linking import entity_surfaces, exact_jaccard_links
from gliner_spark.operators.ner import extract_mentions
from gliner_spark.operators.ner_fused import extract_triples_fused
from gliner_spark.operators.relations import extract_relations
from gliner_spark.operators.textstats import quality_score, token_stats


@pytest.fixture(scope="session")
def spark():
    from gliner_spark.session import build_session

    s = build_session(app_name="gliner-tests", cores=4)
    yield s
    s.stop()


@pytest.fixture()
def nullish_docs(spark):
    return spark.createDataFrame(
        [
            (1, None),
            (2, ""),
            (3, "spark join table"),
            (4, "   "),
        ],
        "doc_id long, text string",
    )


def test_ner_handles_null_and_empty_text(spark, nullish_docs):
    out = extract_mentions(nullish_docs, ALL_LABELS, id_col="doc_id").collect()
    assert {r.doc_id for r in out} == {"3"}
    assert len(out) == 3  # spark, join, table


def test_fused_handles_null_and_empty_text(spark, nullish_docs):
    out = extract_triples_fused(
        nullish_docs, ALL_LABELS, id_col="doc_id"
    ).collect()
    assert all(r.doc_id == "3" for r in out)
    assert len(out) > 0  # system→operator, system→artifact, operator→artifact


def test_empty_dataframe_through_pipeline(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    mentions = extract_mentions(empty, ALL_LABELS, id_col="doc_id")
    assert mentions.count() == 0
    assert extract_relations(mentions).count() == 0
    surfaces = entity_surfaces(mentions)
    assert surfaces.count() == 0
    assert exact_jaccard_links(surfaces).count() == 0
    ents = canonical_entities(
        surfaces, exact_jaccard_links(surfaces)
    )
    assert nodes_table(ents).count() == 0


def test_empty_edges_connected_components(spark):
    empty = spark.createDataFrame([], "src string, dst string")
    assert connected_components(empty).count() == 0
    assert connected_components_star(empty).count() == 0


def test_dedup_ops_on_nullish(spark, nullish_docs):
    safe = nullish_docs.where(F.col("text").isNotNull())
    assert exact_dup_groups(safe).count() == 3
    assert ngram_jaccard_dups(safe).count() == 0  # no near-dups here
    assert minhash_dups(safe).count() == 0
    assert simhash_dups(safe).count() >= 0  # must not throw


def test_multimodal_and_bpe_on_nullish(spark, nullish_docs):
    """Null/empty text must not break the PPM construction (base falls
    back to ' '), the decoder, or the BPE counter."""
    from gliner_spark.operators.multimodal import attach_media, extract_features
    from gliner_spark.operators.textstats import bpe_token_stats

    feats = {r.doc_id: r for r in
             extract_features(attach_media(nullish_docs)).collect()}
    assert len(feats) == 4
    img = feats[3]  # doc_id % 3 == 0 → image
    assert (img.width, img.height) == (8, 8) and img.val_n == 192
    av_null = feats[1]  # null text → null payload → zero moments
    assert av_null.val_n == 0 and av_null.val_sum == 0
    assert av_null.width == 0  # non-image dims are explicit zeros

    bpe = {r.doc_id: r for r in bpe_token_stats(nullish_docs).collect()}
    assert bpe[3].n_bpe == 3
    assert bpe[2].n_bpe == 0 and bpe[2].avg_bpe_len is None
    assert bpe[1].n_bpe == 0 or bpe[1].n_bpe is None


def test_textstats_single_word_and_empty(spark):
    docs = spark.createDataFrame(
        [(1, "x"), (2, "the")], "doc_id long, text string"
    )
    ts = {r.doc_id: r for r in token_stats(docs).collect()}
    assert ts[1].n_tokens == 1 and ts[1].avg_token_len == 1.0
    q = {r.doc_id: r for r in quality_score(docs).collect()}
    assert q[2].stopword_ratio == 1.0
