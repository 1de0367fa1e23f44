"""Operator-level invariants that fit no other suite."""

import pytest


@pytest.fixture(scope="session")
def spark():
    from gliner_spark.session import build_session

    s = build_session(app_name="gliner-tests", cores=4)
    yield s
    s.stop()


def test_length_sorted_mentions_equal_unsorted(spark):
    """length_sort=True must be output-invariant (it only reorders rows
    within partitions before the scoring stage); kept as the pytest pin
    now that the sorted variant's gate row went to paragraph_dedup
    (r5; the padding win itself is measured by tools/padding_probe.py)."""
    from gliner_spark.kernels.scorer import SOUP_LABELS
    from gliner_spark.operators.ner import extract_mentions

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plain = {tuple(r) for r in extract_mentions(
        docs, SOUP_LABELS, id_col="doc_id").collect()}
    srt = {tuple(r) for r in extract_mentions(
        docs, SOUP_LABELS, id_col="doc_id", length_sort=True).collect()}
    assert plain and srt == plain
