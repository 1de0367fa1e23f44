"""Build a SentencePiece ``precompiled_charsmap`` blob from a plain
``{source: replacement}`` mapping — the ENCODER side of the format that
``gliner_spark.kernels.subword._Charsmap`` decodes.

Blob layout (sentencepiece ``normalizer.cc`` EncodePrecompiledCharsMap):
``uint32le trie_size || darts-clone double array (uint32le units) ||
normalized-string pool ('\\0'-terminated strings)``. Trie keys are the
UTF-8 bytes of each source sequence; leaf values are byte offsets into
the pool.

The double array follows darts-clone's unit encoding (``darts.h``):
  - internal unit: ``label`` in the low byte, ``has_leaf`` at bit 8,
    ``offset`` at bits 10.. (bit 9 selects the <<8 wide-offset form —
    never needed at fixture scale).
  - leaf unit: ``value | (1 << 31)`` (bit 31 also poisons ``label()``
    so a traversal can never walk through a leaf).
Node at position ``p`` with offset ``o``: child for byte ``c`` lives at
``p ^ o ^ c``; if the node terminates a key, its value leaf lives at
``p ^ o``.

Used by tests to synthesize charsmap fixtures (no real SentencePiece
model ships in this sandbox); placing a cell is brute-force first-fit,
fine for fixture-sized maps.
"""

from __future__ import annotations

import struct
from typing import Dict, List


class _Node:
    __slots__ = ("children", "value")

    def __init__(self) -> None:
        self.children: Dict[int, "_Node"] = {}
        self.value: int | None = None


def _build_darts(entries: Dict[bytes, int]) -> bytes:
    root = _Node()
    for key, value in entries.items():
        if not key or 0 in key:
            raise ValueError("keys must be non-empty and NUL-free")
        node = root
        for b in key:
            node = node.children.setdefault(b, _Node())
        node.value = value

    units: Dict[int, int] = {0: 0}
    used = {0}
    # a base may serve ONE node only: traversal disambiguates children
    # purely by stored label, so two nodes sharing a base would see each
    # other's children whenever a label coincides
    used_bases = set()

    def place(node: _Node, pos: int) -> None:
        labels = sorted(node.children)
        base = 1
        while True:
            cells = [base ^ c for c in labels]
            if node.value is not None:
                cells.append(base)
            if base not in used_bases and all(
                cell not in used for cell in cells
            ):
                break
            base += 1
        used.update(cells)
        used_bases.add(base)
        offset = pos ^ base
        if offset >= 1 << 21:
            raise ValueError("fixture trie too large for narrow offsets")
        unit = units.get(pos, 0) | (offset << 10)
        if node.value is not None:
            unit |= 1 << 8
            units[base] = (1 << 31) | node.value
        units[pos] = unit
        for label, child in node.children.items():
            child_pos = base ^ label
            units[child_pos] = label
            place(child, child_pos)

    place(root, 0)
    size = max(units) + 1
    return b"".join(struct.pack("<I", units.get(i, 0)) for i in range(size))


def build_charsmap(mapping: Dict[str, str]) -> bytes:
    """``{source: replacement}`` → precompiled_charsmap blob bytes.
    Replacements may be empty (deletion mappings are legal and common —
    e.g. zero-width characters)."""
    pool_parts: List[bytes] = []
    offsets: Dict[bytes, int] = {}
    pos = 0
    entries: Dict[bytes, int] = {}
    for src, repl in mapping.items():
        rb = repl.encode("utf-8")
        if rb not in offsets:
            offsets[rb] = pos
            pool_parts.append(rb + b"\0")
            pos += len(rb) + 1
        entries[src.encode("utf-8")] = offsets[rb]
    trie = _build_darts(entries)
    return struct.pack("<I", len(trie)) + trie + b"".join(pool_parts)
