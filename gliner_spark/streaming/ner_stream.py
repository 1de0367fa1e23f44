"""Streaming ingestion: incremental NER over arriving page files.

The reference is pure batch (SURVEY.md §2.2: streaming absent) and the
north rule's resumability is met by batch checkpoint manifests — but a
continuously-crawled corpus wants incremental processing, so the same
NER stage is exposed over Structured Streaming:

- ``stream_mentions``: ``readStream`` over a directory of page parquet
  files → the SAME ``extract_mentions`` operator (mapInPandas works
  unchanged on streaming DataFrames — this is the payoff of keeping NER
  shuffle-free: it is trivially streamable with no state store).
- ``stream_hourly_mentions``: watermarked tumbling-window count by label
  — late data handled by the watermark, state bounded.

Both run with ``trigger(availableNow=True)`` in tests (process all
pending input then stop), which is also the production catch-up mode.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import GlinerConfig
from ..operators.ner import extract_mentions
from ..schemas import PAGES


def read_page_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 8
) -> DataFrame:
    return (
        spark.readStream.schema(PAGES)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_mentions(
    pages_stream: DataFrame,
    labels: Sequence[str],
    config: GlinerConfig = GlinerConfig(),
) -> DataFrame:
    """Identical operator, streaming input: stateless row-local NER."""
    return extract_mentions(pages_stream, labels, config=config)


def stream_triples(
    pages_stream: DataFrame,
    labels: Sequence[str],
    config: GlinerConfig = GlinerConfig(),
) -> DataFrame:
    """The flagship fused pages→triples job on a stream: relations are
    intra-document, so the fused single-pass operator is stateless and
    streams with no state store — identical output to the batch run
    over the same files (asserted in tests/test_streaming.py)."""
    from ..operators.ner_fused import extract_triples_fused

    return extract_triples_fused(pages_stream, labels, config=config)


def stream_hourly_mentions(
    pages_stream: DataFrame,
    labels: Sequence[str],
    watermark: str = "1 hour",
    config: GlinerConfig = GlinerConfig(),
) -> DataFrame:
    """Windowed streaming aggregation: mentions per (hour, label) with a
    watermark bounding state for late pages."""
    with_ts = pages_stream.select(
        "url", "text", F.col("warc_ts").cast("timestamp").alias("warc_ts")
    )
    mentions = extract_mentions(
        with_ts.withColumn(
            "id_ts",
            F.concat(F.col("url"), F.lit("|"), F.col("warc_ts").cast("string")),
        ),
        labels,
        id_col="id_ts",
        config=config,
    )
    split = mentions.select(
        F.split(F.col("doc_id"), "\\|").getItem(0).alias("url"),
        F.to_timestamp(
            F.split(F.col("doc_id"), "\\|").getItem(1)
        ).alias("warc_ts"),
        "label",
    )
    return (
        split.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", "1 hour").alias("win"), F.col("label"))
        .agg(F.count(F.lit(1)).alias("n_mentions"))
        .select(
            F.col("win.start").alias("hour"), "label", "n_mentions"
        )
    )


def run_to_table(
    stream_df: DataFrame, out_path: str, checkpoint: str, mode: str = "append"
):
    """Materialize a streaming result with availableNow semantics; blocks
    until pending input is drained."""
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
