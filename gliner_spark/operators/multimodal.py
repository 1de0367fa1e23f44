"""Multimodal column plumbing: opaque binary media + typed metadata.

A 100 TB training-data pipeline carries image/audio/video as ``binary``
columns with typed metadata, processed by Arrow-batched pandas stages.
The sandbox has no media libraries, so the *decode* step is stubbed
behind ``HAS_MEDIA_LIBS`` (deterministic fake features otherwise) while
everything Spark-side — schemas, batch iteration, partitioning, UDF
signatures — is real and tested:

- ``attach_media``: deterministic synthetic media bytes derived from the
  text column (so metadata has an exact SQL oracle: octet_length/sha256).
- ``media_metadata``: pure-Catalyst metadata projection (no Python).
- ``extract_features``: ``mapInPandas`` stage producing fixed-width
  float features per blob — the exact shape an image-embedding or
  audio-fingerprint stage has; swap ``_fake_decode`` for a real decoder
  when libs exist.
- ``sample_frames``: frame-sampling plumbing for video-like payloads:
  slices the blob into fixed-size "frames", keeps every n-th — shows the
  explode/row-count-amplification pattern without a codec.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .util import ensure_parallelism

try:  # real decoders would live behind this gate
    import PIL  # noqa: F401

    HAS_MEDIA_LIBS = True
except ImportError:
    HAS_MEDIA_LIBS = False

MEDIA_KINDS = ["image", "audio", "video"]


def attach_media(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(doc_id, kind, media, meta…): synthesize a deterministic binary
    payload per doc (UTF-8 bytes of the text, repeated by kind index) —
    stands in for decoded WARC payloads; derivation is SQL-expressible so
    downstream metadata is oracle-checkable."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in MEDIA_KINDS]),
        (F.pmod(F.col(id_col).cast("long"), F.lit(3)) + 1).cast("int"),
    )
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        kind.alias("kind"),
        F.encode(
            F.concat(F.col(text_col), F.lit("|"), kind), "utf-8"
        ).alias("media"),
    )


def media_metadata(media: DataFrame) -> DataFrame:
    """(doc_id, kind, n_bytes, sha) — pure Catalyst projection."""
    return media.select(
        "doc_id",
        "kind",
        F.octet_length("media").cast("long").alias("n_bytes"),
        F.sha2(F.col("media"), 256).alias("sha"),
    )


def _fake_decode(blob: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a media decoder: hashes byte windows
    into a fixed-width float vector. Replace with a real decode when
    HAS_MEDIA_LIBS; the Spark-side contract (bytes → float32[dim]) is
    identical."""
    if not blob:
        return np.zeros(dim, dtype=np.float32)
    arr = np.frombuffer(blob, dtype=np.uint8)
    idx = np.arange(arr.size)
    out = np.zeros(dim, dtype=np.float64)
    np.add.at(out, idx % dim, (arr.astype(np.float64) - 127.5) / 128.0)
    return (out / max(1.0, arr.size / dim)).astype(np.float32)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if HAS_MEDIA_LIBS:
            raise NotImplementedError(
                "real media decode not wired in this sandbox"
            )
        for pdf in batches:
            feats = [
                _fake_decode(b, dim).tolist() for b in pdf["media"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "feature": feats,
                }
            )

    return ensure_parallelism(media).mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, frame_bytes: int = 32,
                  every_nth: int = 4) -> DataFrame:
    """(doc_id, frame_idx, frame): fixed-size blob slices, every n-th
    kept — the row-amplification shape of video frame sampling, done
    with pure Catalyst array ops (no Python)."""
    n = F.octet_length("media")
    n_frames = F.ceil(n / F.lit(frame_bytes)).cast("int")
    idxs = F.filter(
        F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
        lambda i: i % every_nth == 0,
    )
    return (
        media.where(F.col("kind") == "video")
        .select(
            "doc_id",
            F.explode(idxs).alias("frame_idx"),
            F.col("media"),
        )
        .select(
            "doc_id",
            "frame_idx",
            F.substring(
                F.col("media"), F.col("frame_idx") * frame_bytes + 1, frame_bytes
            ).alias("frame"),
        )
    )
