"""Word tokenization with UTF-8 *byte* offsets (reference operator O2/O3).

Parity target: the PCRE2 splitter at
/root/reference/src/tokenizer_utils.cpp:99-147 — pattern
``\\w+(?:[-_]\\w+)*|\\S`` compiled with PCRE2_UTF|PCRE2_UCP
(tokenizer_utils.cpp:102), emitting (start, end, text) with **byte**
offsets into the original UTF-8 string (proven by the Unicode golden:
``"你好"`` → (0, 6), ``नमस्ते`` → (18, 36);
/root/reference/tests/test.cpp:116-148).

Two deltas vs a naive Python ``re`` port, both load-bearing:

1. PCRE2's ``\\w`` under UCP matches Unicode combining marks (Mn/Mc/Me);
   Python ``re``'s does not (it stops at ``नमस`` and splits the matras
   off). We extend the word class with precomputed mark ranges
   (``_mark_ranges.py``) so the Devanagari golden passes byte-for-byte.
2. Offsets must be byte offsets. We track a running (char, byte) cursor
   across matches so conversion is O(len(text)) total, not O(n·matches).

The kernel is a pure function over a pandas Series so the same code path
runs in pytest (no Spark) and inside ``mapInPandas`` on the cluster.
"""

from __future__ import annotations

import re
from typing import List, Tuple

import numpy as np
import pandas as pd

from ._mark_ranges import MARK_RANGES


def _mark_class() -> str:
    parts = []
    for a, b in MARK_RANGES:
        ea = f"\\U{a:08X}" if a > 0xFFFF else f"\\u{a:04X}"
        if a == b:
            parts.append(ea)
        else:
            eb = f"\\U{b:08X}" if b > 0xFFFF else f"\\u{b:04X}"
            parts.append(f"{ea}-{eb}")
    return "".join(parts)


_W = f"[\\w{_mark_class()}]"
# pattern parity: /root/reference/src/tokenizer_utils.cpp:102
WORD_PATTERN = re.compile(f"{_W}+(?:[-_]{_W}+)*|\\S")

# ASCII-safe version of the same pattern for SQL oracles (Java/RE2 \w is
# ASCII; fine for the all-ASCII synthetic corpora).
SQL_WORD_PATTERN = r"\w+(?:[-_]\w+)*|\S"

Token = Tuple[int, int, str]  # (byte_start, byte_end, text)


def tokenize_text(text: str) -> List[Token]:
    """Split one string into word tokens with byte offsets.

    Mirrors WhitespaceTokenSplitter::call
    (/root/reference/src/tokenizer_utils.cpp:105-147).

    ASCII fast path: for pure-ASCII text (the overwhelmingly common case
    on web corpora after lang filtering) byte offsets equal code-point
    offsets, so the per-match encode round-trips are skipped — ~35%
    faster on the benchmark corpus, byte-identical output.
    """
    if text.isascii():
        return [
            (m.start(), m.end(), m.group())
            for m in WORD_PATTERN.finditer(text)
        ]
    out: List[Token] = []
    prev_c = 0
    prev_b = 0
    for m in WORD_PATTERN.finditer(text):
        cs, ce = m.start(), m.end()
        bs = prev_b + len(text[prev_c:cs].encode("utf-8"))
        be = bs + len(text[cs:ce].encode("utf-8"))
        out.append((bs, be, m.group()))
        prev_c, prev_b = ce, be
    return out


def tokenize_series(texts: pd.Series) -> pd.Series:
    """Vectorized batch form (reference batchTokenizeText,
    /root/reference/src/processor.cpp:17-26): Series[str] →
    Series[list[(start, end, text)]]."""
    return texts.map(lambda t: tokenize_text(t) if isinstance(t, str) else [])


def token_count(text: str) -> int:
    return sum(1 for _ in WORD_PATTERN.finditer(text)) if text else 0


def word_starts_ends(tokens: List[Token]) -> Tuple[np.ndarray, np.ndarray]:
    """Byte start/end arrays for decode-time offset gathers."""
    if not tokens:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    arr = np.asarray([(t[0], t[1]) for t in tokens], dtype=np.int64)
    return arr[:, 0], arr[:, 1]
