"""Pure-Python subword tokenization from a HuggingFace ``tokenizer.json``.

Reference parity target: O5 — the reference encodes each word through a
real HF tokenizer via the tokenizers-cpp FFI
(/root/reference/src/processor.cpp:64-81, ``encode(word)`` with no
special tokens per word). The sandbox has no ``tokenizers`` wheel, so
this module reimplements the two model families GLiNER checkpoints ship
with — **WordPiece** (BERT-style greedy longest-prefix) and **Unigram**
(SentencePiece-style Viterbi) — from the published algorithms, plus the
normalizer/pre-tokenizer steps those configs use. stdlib-only (json +
unicodedata); no wheels.

``encoder_from_file(path)`` returns the same ``str -> list[int]``
callable shape ``encode_batch`` takes, and ``OnnxScorer`` falls back to
it when the ``tokenizers`` wheel is absent — making the real-model
encode path runnable anywhere Python runs.

Scope notes (documented, loud):
- BPE models raise ``UnsupportedTokenizerError`` (GLiNER's published
  checkpoints are DeBERTa-v3 [Unigram] or BERT-family [WordPiece]).
- The SentencePiece "Precompiled" charsmap normalizer cannot be
  reimplemented faithfully without the charsmap decoder; it is applied
  as NFKC (its dominant effect) — exotic mappings may differ.
"""

from __future__ import annotations

import json
import unicodedata
from typing import Callable, Dict, List, Sequence, Tuple

METASPACE = "▁"  # ▁


class UnsupportedTokenizerError(ValueError):
    pass


# ---------------------------------------------------------------------------
# normalizers
# ---------------------------------------------------------------------------

def _strip_accents(s: str) -> str:
    return "".join(
        c for c in unicodedata.normalize("NFD", s)
        if unicodedata.category(c) != "Mn"
    )


def _bert_clean(s: str) -> str:
    """BertNormalizer clean_text: drop control chars, normalize all
    whitespace to ' ' (per-word inputs rarely contain either)."""
    out = []
    for c in s:
        if c in ("\t", "\n", "\r"):
            out.append(" ")
        elif unicodedata.category(c) in ("Cc", "Cf") or c == "\x00":
            continue
        else:
            out.append(c)
    return "".join(out)


def _build_normalizer(cfg: dict | None) -> Callable[[str], str]:
    if cfg is None:
        return lambda s: s
    t = cfg.get("type")
    if t == "Sequence":
        fns = [_build_normalizer(c) for c in cfg.get("normalizers", [])]

        def seq(s: str) -> str:
            for f in fns:
                s = f(s)
            return s

        return seq
    if t in ("NFD", "NFC", "NFKC", "NFKD"):
        return lambda s: unicodedata.normalize(t, s)
    if t == "Lowercase":
        return lambda s: s.lower()
    if t == "StripAccents":
        return _strip_accents
    if t == "Strip":
        return lambda s: s.strip()
    if t == "Precompiled":
        # SentencePiece charsmap: approximated by NFKC (see module doc)
        return lambda s: unicodedata.normalize("NFKC", s)
    if t == "Replace":
        pat = cfg.get("pattern", {})
        lit = pat.get("String")
        if lit is not None:
            rep = cfg.get("content", "")
            return lambda s: s.replace(lit, rep)
        raise UnsupportedTokenizerError(f"Replace pattern {pat!r}")
    if t == "BertNormalizer":
        lower = cfg.get("lowercase", True)
        accents = cfg.get("strip_accents")
        clean = cfg.get("clean_text", True)

        def bert(s: str) -> str:
            if clean:
                s = _bert_clean(s)
            if lower:
                s = s.lower()
            # HF: strip_accents defaults to the lowercase flag when null
            if accents or (accents is None and lower):
                s = _strip_accents(s)
            return s

        return bert
    raise UnsupportedTokenizerError(f"normalizer type {t!r}")


# ---------------------------------------------------------------------------
# pre-tokenizers (per-WORD inputs: whitespace splitting is a no-op; what
# matters is punctuation isolation and the Metaspace prefix)
# ---------------------------------------------------------------------------

def _is_punct(c: str) -> bool:
    # BertPreTokenizer treats ASCII symbol ranges + Unicode P* as punct
    cp = ord(c)
    if (33 <= cp <= 47 or 58 <= cp <= 64 or 91 <= cp <= 96
            or 123 <= cp <= 126):
        return True
    return unicodedata.category(c).startswith("P")


def _split_punct(word: str) -> List[str]:
    pieces: List[str] = []
    cur = []
    for c in word:
        if _is_punct(c):
            if cur:
                pieces.append("".join(cur))
                cur = []
            pieces.append(c)
        else:
            cur.append(c)
    if cur:
        pieces.append("".join(cur))
    return pieces or [word]


def _build_pretokenizer(cfg: dict | None) -> Callable[[str], List[str]]:
    if cfg is None:
        return lambda w: [w]
    t = cfg.get("type")
    if t == "Sequence":
        fns = [_build_pretokenizer(c) for c in cfg.get("pretokenizers", [])]

        def seq(w: str) -> List[str]:
            pieces = [w]
            for f in fns:
                pieces = [p for piece in pieces for p in f(piece)]
            return pieces

        return seq
    if t == "Metaspace":
        repl = cfg.get("replacement", METASPACE)
        scheme = cfg.get("prepend_scheme", "always")
        if cfg.get("add_prefix_space") is False:
            scheme = "never"

        def meta(w: str) -> List[str]:
            w = w.replace(" ", repl)
            # per-word encode: every word starts a "sequence segment",
            # so "always"/"first" both prefix (HF first-segment rule)
            if scheme in ("always", "first") and not w.startswith(repl):
                w = repl + w
            return [w]

        return meta
    if t in ("Whitespace", "WhitespaceSplit"):
        return lambda w: [p for p in w.split() if p] or [w]
    if t == "BertPreTokenizer":
        return lambda w: [p for piece in w.split() for p in
                          _split_punct(piece)] or [w]
    if t == "Punctuation":
        return _split_punct
    if t == "Split":
        # common config: split on whitespace pattern
        return lambda w: [p for p in w.split() if p] or [w]
    raise UnsupportedTokenizerError(f"pre_tokenizer type {t!r}")


# ---------------------------------------------------------------------------
# models
# ---------------------------------------------------------------------------

class WordPieceEncoder:
    """Greedy longest-prefix WordPiece (the published BERT algorithm):
    repeatedly take the longest vocab entry matching at the cursor
    (continuation pieces carry the ``##`` prefix); any unmatched
    remainder maps the WHOLE word to ``[UNK]``."""

    def __init__(self, vocab: Dict[str, int], unk_token: str = "[UNK]",
                 continuing_subword_prefix: str = "##",
                 max_input_chars_per_word: int = 100):
        self.vocab = vocab
        self.unk_id = vocab[unk_token]
        self.prefix = continuing_subword_prefix
        self.max_chars = max_input_chars_per_word

    def encode_piece(self, piece: str) -> List[int]:
        if len(piece) > self.max_chars:
            return [self.unk_id]
        ids: List[int] = []
        start = 0
        n = len(piece)
        while start < n:
            end = n
            cur = None
            while start < end:
                sub = piece[start:end]
                if start > 0:
                    sub = self.prefix + sub
                tid = self.vocab.get(sub)
                if tid is not None:
                    cur = tid
                    break
                end -= 1
            if cur is None:
                return [self.unk_id]
            ids.append(cur)
            start = end
        return ids


class UnigramEncoder:
    """SentencePiece Unigram via Viterbi: the segmentation maximizing the
    sum of piece log-probs; characters no vocab piece covers emit
    ``unk_id`` with a constant penalty (Kudo 2018, §3)."""

    UNK_PENALTY = -20.0

    def __init__(self, vocab: Sequence[Tuple[str, float]],
                 unk_id: int | None):
        self.pieces = {tok: (i, float(score))
                       for i, (tok, score) in enumerate(vocab)}
        self.unk_id = unk_id
        self.max_piece_len = max((len(t) for t, _ in vocab), default=1)

    def encode_piece(self, piece: str) -> List[int]:
        n = len(piece)
        if n == 0:
            return []
        NEG = float("-inf")
        best = [NEG] * (n + 1)
        back: List[Tuple[int, int] | None] = [None] * (n + 1)
        best[0] = 0.0
        for end in range(1, n + 1):
            lo = max(0, end - self.max_piece_len)
            for start in range(lo, end):
                if best[start] == NEG:
                    continue
                hit = self.pieces.get(piece[start:end])
                if hit is not None:
                    score = best[start] + hit[1]
                    if score > best[end]:
                        best[end] = score
                        back[end] = (start, hit[0])
            if best[end] == NEG and self.unk_id is not None:
                # single-char unk fallback keeps the lattice connected
                start = end - 1
                if best[start] > NEG:
                    best[end] = best[start] + self.UNK_PENALTY
                    back[end] = (start, self.unk_id)
        if best[n] == NEG:
            return [] if self.unk_id is None else [self.unk_id]
        ids: List[int] = []
        pos = n
        while pos > 0:
            start, tid = back[pos]  # type: ignore[misc]
            ids.append(tid)
            pos = start
        ids.reverse()
        return ids


# ---------------------------------------------------------------------------
# loader
# ---------------------------------------------------------------------------

class SubwordTokenizer:
    """normalize → pre-tokenize → model, per WORD (no special tokens) —
    the exact shape the reference's per-word ``encode`` produces
    (processor.cpp:76: add_special_tokens=false)."""

    def __init__(self, config: dict):
        self.normalize = _build_normalizer(config.get("normalizer"))
        self.pretokenize = _build_pretokenizer(config.get("pre_tokenizer"))
        # added tokens match on the RAW input before normalization /
        # pre-tokenization (the HF added-vocabulary rule). GLiNER
        # checkpoints register <<ENT>>/<<SEP>> here — without this,
        # the prompt markers would shred through the punctuation
        # splitter into UNK runs instead of their single ids.
        self.added = {
            t["content"]: t["id"]
            for t in config.get("added_tokens", [])
            if "content" in t and "id" in t
        }
        model = config.get("model") or {}
        mtype = model.get("type")
        if mtype == "WordPiece":
            self.model = WordPieceEncoder(
                model["vocab"],
                unk_token=model.get("unk_token", "[UNK]"),
                continuing_subword_prefix=model.get(
                    "continuing_subword_prefix", "##"),
                max_input_chars_per_word=model.get(
                    "max_input_chars_per_word", 100),
            )
        elif mtype == "Unigram":
            self.model = UnigramEncoder(
                [(t, s) for t, s in model["vocab"]], model.get("unk_id")
            )
        else:
            raise UnsupportedTokenizerError(
                f"model type {mtype!r} (WordPiece and Unigram are "
                "supported; GLiNER checkpoints ship one of these)"
            )

    def encode_word(self, word: str) -> List[int]:
        added = self.added.get(word)
        if added is not None:
            return [added]
        word = self.normalize(word)
        if not word:  # HF: empty input encodes to no ids
            return []
        out: List[int] = []
        for piece in self.pretokenize(word):
            out.extend(self.model.encode_piece(piece))
        return out


def encoder_from_file(path: str) -> Callable[[str], List[int]]:
    """tokenizer.json → ``encode_word`` callable (the O5 seam)."""
    with open(path, encoding="utf-8") as f:
        return SubwordTokenizer(json.load(f)).encode_word
