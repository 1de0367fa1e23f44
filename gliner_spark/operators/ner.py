"""Distributed NER: pages → mentions in ONE ``mapInPandas`` pass.

Spark translation of the reference lifecycle (SURVEY.md §3.1): tokenize →
score → decode → greedy all happen inside a single Arrow-batched Python
stage, because the greedy group is a single document — i.e. a single
input row — so **no shuffle is needed for NER**. The first shuffle in the
whole pipeline is the relation/linking join downstream.

Scale notes (100 TB / 1000 executors):
- the stage is embarrassingly parallel over input splits; throughput
  scales with cores as long as the scorer is the bottleneck (it is);
- ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds the ONNX batch
  and Python-worker peak memory;
- for the ONNX path, sorting *within partitions* by text length before
  scoring shrinks padding waste (per-batch maxima, processor.cpp:60,:80);
  opt-in via ``length_sort=True`` — it costs a local sort, no shuffle;
- Catalyst prunes unread page columns (html is never deserialized here —
  only ``id_col`` and ``text_col`` reach Python).
"""

from __future__ import annotations

from typing import Iterator, List, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import TOKEN_LEVEL, GlinerConfig
from ..kernels.pipeline import ner_documents
from ..kernels.scorer import SurrogateScorer, TokenSurrogateScorer
from ..schemas import MENTIONS
from .util import ensure_parallelism


def extract_mentions(
    pages: DataFrame,
    labels: Sequence[str],
    id_col: str = "url",
    text_col: str = "text",
    config: GlinerConfig = GlinerConfig(),
    scorer_factory=None,
    length_sort: bool = False,
) -> DataFrame:
    """pages(id, text, …) → mentions(doc_id, m_start, m_end, m_text,
    label, prob). Labels are a broadcast-sized query constant folded into
    the scorer (the reference folds them into the prompt,
    /root/reference/src/processor.cpp:33-49)."""
    labels = list(labels)
    cfg = config
    if scorer_factory is None:
        if cfg.model_type == TOKEN_LEVEL:
            scorer_factory = TokenSurrogateScorer
        else:
            scorer_factory = lambda mw=cfg.max_width: SurrogateScorer(mw)  # noqa: E731
    factory = scorer_factory

    src = ensure_parallelism(
        pages.select(
            F.col(id_col).cast("string").alias("doc_id"),
            F.col(text_col).alias("text"),
        )
    )
    if length_sort:
        src = src.sortWithinPartitions(F.length("text"))

    def score_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        scorer = factory()  # once per task; sessions cache per process
        for pdf in batches:
            ids: List[str] = []
            starts: List[int] = []
            ends: List[int] = []
            texts_out: List[str] = []
            labs: List[str] = []
            probs: List[float] = []
            spans_batch = ner_documents(
                pdf["text"].tolist(), labels, scorer, cfg
            )
            for doc_id, spans in zip(pdf["doc_id"], spans_batch):
                for s, e, txt, lab, p in spans:
                    ids.append(doc_id)
                    starts.append(s)
                    ends.append(e)
                    texts_out.append(txt)
                    labs.append(lab)
                    probs.append(round(float(p), 4))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="object"),
                    "m_start": pd.Series(starts, dtype="int64"),
                    "m_end": pd.Series(ends, dtype="int64"),
                    "m_text": pd.Series(texts_out, dtype="object"),
                    "label": pd.Series(labs, dtype="object"),
                    "prob": pd.Series(probs, dtype="float64"),
                }
            )

    return src.mapInPandas(score_partition, schema=MENTIONS)
