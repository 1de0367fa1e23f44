"""Single-document NER composition — the shared kernel between the Spark
operator and the single-process parity oracle.

Mirrors Model::inference (/root/reference/src/model.cpp:101-124):
validate → tokenize → score → decode → greedy, with the Model-level
defaults flat_ner=True, threshold=0.5, multi_label=False
(/root/reference/include/GLiNER/model.hpp:44-47). Empty texts or empty
label sets short-circuit to no spans (model.cpp:50-52, 104-107).

Because the Spark ``mapInPandas`` stage calls exactly this function, the
cluster output and the straight-line single-process output are the same
code path — the P/R-vs-reference gate (BASELINE.json:metric) is then a
structural identity, measured (not assumed) by bench's parity check.
"""

from __future__ import annotations

from typing import List, Sequence

from ..config import GlinerConfig
from .decode import Span, decode_span_logits, greedy_search
from .tokenize import tokenize_text


def ner_documents(
    texts: Sequence[str],
    labels: Sequence[str],
    scorer,
    config: GlinerConfig = GlinerConfig(),
) -> List[List[Span]]:
    """Batch NER: texts × labels → per-document selected spans."""
    if not texts or not labels:
        return [[] for _ in texts]
    batch_tokens = [tokenize_text(t) if t else [] for t in texts]
    logits = scorer.score_spans(batch_tokens, labels)
    out: List[List[Span]] = []
    for text, tokens, lg in zip(texts, batch_tokens, logits):
        spans = decode_span_logits(
            lg, tokens, text, labels, threshold=config.threshold
        )
        out.append(
            greedy_search(spans, flat_ner=config.flat_ner,
                          multi_label=config.multi_label)
        )
    return out
