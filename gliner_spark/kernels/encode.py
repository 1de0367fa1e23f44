"""Prompt construction + subword encoding + padding/masks (reference O4-O6).

Parity targets:
- prompt: ``[<<ENT>>, l1, <<ENT>>, l2, …, <<SEP>>, w1, w2, …]`` with
  promptLength = 2*len(labels)+1 (/root/reference/src/processor.cpp:33-59).
- encoding: per-word subword encode, no special tokens per word;
  numTokens = max over batch of (2 + Σ subword lens)
  (/root/reference/src/processor.cpp:64-81).
- padding/masks: zero-init (B, numTokens) int64; BOS id 1 at position 0,
  EOS id 2 after the last subword; attention_mask 1 on real tokens incl.
  BOS/EOS; words_mask = 1-based word counter written at the FIRST subword
  of each *text* word only (prompt words and continuation subwords stay 0)
  (/root/reference/src/processor.cpp:83-114; BOS :93, words_mask :100-103,
  EOS :111-112). These ids are DeBERTa-v3 conventions baked into the
  exported GLiNER ONNX graph — the layout must be replicated exactly.

The tokenizer is injected as ``encode_word: str -> list[int]`` so this
module needs no HF wheels (absent in the sandbox); ``OnnxScorer`` wires a
real ``tokenizers.Tokenizer`` when available, tests wire a fake.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Sequence, Tuple

import numpy as np

from .decode import enumerate_spans

ENT_TOKEN = "<<ENT>>"
SEP_TOKEN = "<<SEP>>"
BOS_ID = 1
EOS_ID = 2


@dataclass
class EncodedBatch:
    """Dense tensor bundle fed to the ONNX graph (names at
    /root/reference/src/model.cpp:54-68)."""

    input_ids: np.ndarray        # (B, num_tokens) int64
    attention_mask: np.ndarray   # (B, num_tokens) int64
    words_mask: np.ndarray       # (B, num_tokens) int64
    text_lengths: np.ndarray     # (B, 1) int64
    span_idx: np.ndarray | None  # (B, num_spans, 2) int64 (span models)
    span_mask: np.ndarray | None  # (B, num_spans) bool
    num_words: int               # max text length (words) over batch


def build_prompt_words(labels: Sequence[str]) -> List[str]:
    # processor.cpp:33-39
    out: List[str] = []
    for lab in labels:
        out.append(ENT_TOKEN)
        out.append(lab)
    out.append(SEP_TOKEN)
    return out


def encode_batch(
    batch_tokens: Sequence[Sequence[Tuple[int, int, str]]],
    labels: Sequence[str],
    encode_word: Callable[[str], List[int]],
    max_width: int,
    with_spans: bool = True,
) -> EncodedBatch:
    """Compose O4 (prompt) + O5 (subword) + O6 (pad/mask) + O7 (spans)
    for one Arrow batch of documents."""
    bsz = len(batch_tokens)
    prompt_words = build_prompt_words(labels)
    prompt_len = len(prompt_words)
    prompt_ids = [encode_word(w) for w in prompt_words]

    text_lengths = np.asarray(
        [len(toks) for toks in batch_tokens], dtype=np.int64
    ).reshape(bsz, 1)
    num_words = int(text_lengths.max()) if bsz else 0

    per_row: List[List[List[int]]] = []
    num_tokens = 0
    for toks in batch_tokens:
        row = list(prompt_ids) + [encode_word(t[2]) for t in toks]
        per_row.append(row)
        s = 2 + sum(len(w) for w in row)  # +2: BOS/EOS (processor.cpp:74)
        num_tokens = max(num_tokens, s)

    input_ids = np.zeros((bsz, num_tokens), dtype=np.int64)
    attention_mask = np.zeros((bsz, num_tokens), dtype=np.int64)
    words_mask = np.zeros((bsz, num_tokens), dtype=np.int64)

    for p, row in enumerate(per_row):
        idx = 0
        input_ids[p, idx] = BOS_ID
        attention_mask[p, idx] = 1
        idx += 1
        word_id = 1
        for token_id, word in enumerate(row):
            if token_id >= prompt_len:
                words_mask[p, idx] = word_id
                word_id += 1
            for t in word:
                input_ids[p, idx] = t
                attention_mask[p, idx] = 1
                idx += 1
        input_ids[p, idx] = EOS_ID
        attention_mask[p, idx] = 1

    span_idx = None
    span_mask = None
    if with_spans:
        # prepareSpans (processor.cpp:122-144): dense (B, numWords*maxWidth)
        num_spans = num_words * max_width
        span_idx = np.zeros((bsz, num_spans, 2), dtype=np.int64)
        span_mask = np.zeros((bsz, num_spans), dtype=bool)
        for p, toks in enumerate(batch_tokens):
            valid = enumerate_spans(len(toks), max_width)
            if valid.size == 0:
                continue
            flat = valid[:, 0] * max_width + (valid[:, 1] - valid[:, 0])
            span_idx[p, flat, 0] = valid[:, 0]
            span_idx[p, flat, 1] = valid[:, 1]
            span_mask[p, flat] = True

    return EncodedBatch(
        input_ids=input_ids,
        attention_mask=attention_mask,
        words_mask=words_mask,
        text_lengths=text_lengths,
        span_idx=span_idx,
        span_mask=span_mask,
        num_words=num_words,
    )
