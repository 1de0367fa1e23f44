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

GLiNER's published checkpoints are DeBERTa-v3 [Unigram] or BERT-family
[WordPiece]; **BPE** (rank-greedy merge loop, the published GPT-2/RoBERTa
algorithm) and the **ByteLevel** pre-tokenizer are implemented as well so
a user bringing a RoBERTa/GPT-backboned GLiNER variant does not hit a
hard error. The SentencePiece ``Precompiled`` charsmap is decoded from
its double-array trie (see ``_Charsmap``); inputs with no charsmap entry
pass through unchanged, exactly as in SentencePiece's NormalizePrefix.
"""

from __future__ import annotations

import base64
import json
import struct
import unicodedata
from typing import Callable, Dict, List, Optional, Sequence, Tuple

METASPACE = "▁"  # ▁


class UnsupportedTokenizerError(ValueError):
    pass


# ---------------------------------------------------------------------------
# SentencePiece Precompiled charsmap (double-array trie)
# ---------------------------------------------------------------------------

class _Charsmap:
    """Decoder for SentencePiece's ``precompiled_charsmap`` blob.

    Layout (sentencepiece ``normalizer.cc`` DecodePrecompiledCharsMap):
    ``uint32le trie_size || darts-clone double array (uint32le units) ||
    normalized-string pool ('\\0'-terminated strings)``. A lookup is a
    darts common-prefix search over the input's UTF-8 bytes; each leaf
    value is a byte offset into the pool. Normalization follows
    ``Normalizer::NormalizePrefix``: at each position take the LONGEST
    trie match and emit its pool string, else pass the single UTF-8
    character through unchanged. (HF's ``spm_precompiled`` applies the
    same trie per grapheme cluster; real charsmap entries are single
    code points or combining sequences, where the two walks agree.)

    Darts unit accessors (darts_clone ``darts.h``):
    ``label = unit & 0x800000ff``, ``has_leaf = (unit >> 8) & 1``,
    ``offset = (unit >> 10) << ((unit & 0x200) >> 6)``,
    ``value = unit & 0x7fffffff`` on the leaf unit.
    """

    def __init__(self, blob: bytes):
        (trie_size,) = struct.unpack_from("<I", blob, 0)
        n_units = trie_size // 4
        self.units = struct.unpack_from(f"<{n_units}I", blob, 4)
        self.pool = blob[4 + trie_size:]

    def _longest_match(
        self, data: bytes, start: int
    ) -> Optional[Tuple[int, int]]:
        """(match_byte_len, pool_offset) of the longest trie prefix of
        ``data[start:]``, or None."""
        units = self.units
        n_units = len(units)
        unit = units[0]
        node_pos = (unit >> 10) << ((unit & 0x200) >> 6)
        found: Optional[Tuple[int, int]] = None
        for i in range(start, len(data)):
            c = data[i]
            if c == 0:
                break
            node_pos ^= c
            # an xor landing outside the array means no child for this
            # byte (compactly-built arrays don't allocate unreachable
            # cells) — same outcome as a label mismatch
            if node_pos >= n_units:
                break
            unit = units[node_pos]
            if (unit & 0x800000FF) != c:
                break
            node_pos ^= (unit >> 10) << ((unit & 0x200) >> 6)
            if (unit >> 8) & 1:
                found = (i + 1 - start, units[node_pos] & 0x7FFFFFFF)
        return found

    def _pool_str(self, offset: int) -> str:
        end = self.pool.index(b"\0", offset)
        return self.pool[offset:end].decode("utf-8")

    def normalize(self, s: str) -> str:
        data = s.encode("utf-8")
        out: List[str] = []
        i, n = 0, len(data)
        while i < n:
            hit = self._longest_match(data, i)
            if hit is not None:
                length, offset = hit
                out.append(self._pool_str(offset))
                i += length
            else:
                b = data[i]
                step = 4 if b >= 0xF0 else 3 if b >= 0xE0 else \
                    2 if b >= 0xC0 else 1
                out.append(data[i:i + step].decode("utf-8", "replace"))
                i += step
        return "".join(out)


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
        blob_b64 = cfg.get("precompiled_charsmap")
        if blob_b64:
            cm = _Charsmap(base64.b64decode(blob_b64))
            return cm.normalize
        # blob absent (hand-written configs): NFKC is the charsmap's
        # dominant effect and the safest stand-in
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


def _bytes_to_unicode() -> Dict[int, str]:
    """GPT-2's reversible byte→printable-unicode table (Radford et al.
    2019, released encoder.py): printable latin bytes map to themselves,
    the rest shift into U+0100.."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


_BYTE_ENCODER = _bytes_to_unicode()
_GPT2_CONTRACTIONS = ("'s", "'t", "'re", "'ve", "'m", "'ll", "'d")


def _gpt2_split(text: str) -> List[str]:
    """The GPT-2 pre-tokenize regex (contractions | optional-space +
    letter/number/other runs | whitespace), as a scanner — Python ``re``
    lacks ``\\p{L}``/``\\p{N}`` so the alternation is hand-rolled with
    unicodedata categories. Inputs here are single words, so the
    whitespace branches are edge cases."""
    pieces: List[str] = []
    i, n = 0, len(text)
    while i < n:
        hit = next(
            (c for c in _GPT2_CONTRACTIONS if text.startswith(c, i)), None
        )
        if hit is not None:
            pieces.append(hit)
            i += len(hit)
            continue
        start = i
        if text[i] == " " and i + 1 < n and not text[i + 1].isspace():
            i += 1
        cat = unicodedata.category(text[i])[0]
        if cat == "L":
            while i < n and unicodedata.category(text[i])[0] == "L":
                i += 1
        elif cat == "N":
            while i < n and unicodedata.category(text[i])[0] == "N":
                i += 1
        elif not text[i].isspace():
            while i < n and not text[i].isspace() and \
                    unicodedata.category(text[i])[0] not in ("L", "N"):
                i += 1
        else:
            while i < n and text[i].isspace():
                i += 1
            # \s+(?!\S): a whitespace run followed by non-space yields
            # its last space to the next (space-prefixed) token
            if i < n and i - start > 1:
                i -= 1
        pieces.append(text[start:i])
    return pieces


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
    if t == "ByteLevel":
        add_prefix = cfg.get("add_prefix_space", True)
        use_regex = cfg.get("use_regex", True)

        def byte_level(w: str) -> List[str]:
            # per-word encode: each word starts a sequence segment, so
            # add_prefix_space applies (RoBERTa's "Ġword" form)
            if add_prefix and not w.startswith(" "):
                w = " " + w
            pieces = _gpt2_split(w) if use_regex else [w]
            return [
                "".join(_BYTE_ENCODER[b] for b in p.encode("utf-8"))
                for p in pieces
            ]

        return byte_level
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
    ``unk_id`` with a constant penalty (Kudo 2018, §3). Consecutive
    uncovered characters fuse into a SINGLE unk id (``fuse_unk`` — the
    SentencePiece behavior HF's Unigram defaults to), so OOV runs such
    as adjacent emoji match the reference's FFI tokenizer."""

    UNK_PENALTY = -20.0

    def __init__(self, vocab: Sequence[Tuple[str, float]],
                 unk_id: int | None, fuse_unk: bool = True):
        self.pieces = {tok: (i, float(score))
                       for i, (tok, score) in enumerate(vocab)}
        self.unk_id = unk_id
        self.fuse_unk = fuse_unk
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
            if not (
                self.fuse_unk and tid == self.unk_id
                and ids and ids[-1] == self.unk_id
            ):
                ids.append(tid)
            pos = start
        ids.reverse()
        return ids


class BPEEncoder:
    """Byte-pair encoding via the published rank-greedy merge loop
    (Sennrich 2016; GPT-2 encoder.py): start from single characters,
    repeatedly merge the adjacent pair with the LOWEST merge rank until
    no ranked pair remains, then map symbols through the vocab.
    ``continuing_subword_prefix`` / ``end_of_word_suffix`` decorate
    interior/final symbols before merging (and the prefix is stripped
    from the right side on merge), matching HF's BPE model semantics."""

    def __init__(self, vocab: Dict[str, int],
                 merges: Sequence[object],
                 unk_token: str | None = None,
                 continuing_subword_prefix: str = "",
                 end_of_word_suffix: str = "",
                 fuse_unk: bool = False,
                 byte_fallback: bool = False):
        self.vocab = vocab
        self.unk_id = vocab.get(unk_token) if unk_token else None
        self.csp = continuing_subword_prefix or ""
        self.eow = end_of_word_suffix or ""
        self.fuse_unk = fuse_unk
        self.byte_fallback = byte_fallback
        self.ranks: Dict[Tuple[str, str], int] = {}
        for i, m in enumerate(merges):
            pair = (tuple(m.split(" ", 1)) if isinstance(m, str)
                    else tuple(m))
            self.ranks[pair] = i  # type: ignore[index]

    def _merged(self, a: str, b: str) -> str:
        if self.csp and b.startswith(self.csp):
            b = b[len(self.csp):]
        return a + b

    def encode_piece(self, piece: str) -> List[int]:
        if not piece:
            return []
        word = list(piece)
        if self.csp:
            word = [word[0]] + [self.csp + c for c in word[1:]]
        if self.eow:
            word[-1] = word[-1] + self.eow
        while len(word) > 1:
            best_rank, best_pair = None, None
            for i in range(len(word) - 1):
                r = self.ranks.get((word[i], word[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_pair = r, (word[i], word[i + 1])
            if best_pair is None:
                break
            merged: List[str] = []
            j = 0
            while j < len(word):
                if (j < len(word) - 1
                        and (word[j], word[j + 1]) == best_pair):
                    merged.append(self._merged(word[j], word[j + 1]))
                    j += 2
                else:
                    merged.append(word[j])
                    j += 1
            word = merged
        ids: List[int] = []
        for tok in word:
            tid = self.vocab.get(tok)
            if tid is None and self.byte_fallback:
                byte_ids = [self.vocab.get(f"<0x{b:02X}>")
                            for b in tok.encode("utf-8")]
                if all(t is not None for t in byte_ids):
                    ids.extend(byte_ids)  # type: ignore[arg-type]
                    continue
            if tid is None:
                tid = self.unk_id
                if tid is None:  # HF BPE: no unk → token dropped
                    continue
                if self.fuse_unk and ids and ids[-1] == tid:
                    continue
            ids.append(tid)
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
                [(t, s) for t, s in model["vocab"]], model.get("unk_id"),
                fuse_unk=model.get("fuse_unk", True),
            )
        elif mtype == "BPE":
            self.model = BPEEncoder(
                model["vocab"], model.get("merges", []),
                unk_token=model.get("unk_token"),
                continuing_subword_prefix=model.get(
                    "continuing_subword_prefix") or "",
                end_of_word_suffix=model.get("end_of_word_suffix") or "",
                fuse_unk=model.get("fuse_unk", False),
                byte_fallback=model.get("byte_fallback", False),
            )
        else:
            raise UnsupportedTokenizerError(
                f"model type {mtype!r} (WordPiece, Unigram and BPE are "
                "supported)"
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
