"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow-batched Pandas UDFs.

The decode step itself is STUBBED (no image/audio libraries in this
container): ``decode_image_stub`` raises ``NotImplementedError`` unless
``fake=True``, in which case it produces a deterministic fake feature
vector from the blob's digest.  Everything *around* the stub — schema,
``mapInPandas`` batch shape, partition sizing — is real and tested, so
swapping in a real decoder (PIL / torchaudio / ffmpeg) is a one-function
change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .partitioning import ensure_min_parallelism

FEATURE_DIM = 4

FEATURE_SCHEMA = (
    "id long, byte_len long, checksum string, "
    "feature array<double>"
)


def decode_image_stub(blob: bytes, fake: bool = True) -> list[float]:
    """Placeholder for a real image/audio decode + feature extraction.

    With ``fake=True`` returns a deterministic FEATURE_DIM-vector derived
    from the md5 digest (first FEATURE_DIM bytes / 255).  With
    ``fake=False`` raises — the container has no decode libraries.
    """
    if not fake:
        raise NotImplementedError(
            "real image/audio decoding requires PIL/torchaudio — not in this image"
        )
    digest = hashlib.md5(blob).digest()
    return [round(b / 255.0, 6) for b in digest[:FEATURE_DIM]]


def attach_binary(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Simulate a multimodal table: utf-8 blob column + typed metadata."""
    return df.select(
        F.col(id_col).alias("id"),
        F.encode(F.col(text_col), "UTF-8").alias("blob"),
        F.lit("image/fake").alias("mime"),
    )


def extract_features(blobs: DataFrame, batch_fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas`` streams record batches through Python once — no
    per-row serde, no driver collect; partitioning is whatever the
    upstream scan produced, so at scale this rides the file splits.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs_col = pdf["blob"]
            out = pd.DataFrame(
                {
                    "id": pdf["id"],
                    "byte_len": blobs_col.map(len),
                    "checksum": blobs_col.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "feature": blobs_col.map(
                        lambda b: decode_image_stub(bytes(b), fake=batch_fake)
                    ),
                }
            )
            yield out

    return ensure_min_parallelism(blobs).mapInPandas(op, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = (
    "id long, frame_idx int, frame_checksum string, frame_feature array<double>"
)


def sample_frames(
    blobs: DataFrame, n_frames: int = 3, batch_fake: bool = True
) -> DataFrame:
    """Video-style frame sampling over a binary column: split each blob
    into ``n_frames`` evenly-spaced slices ("frames"), emit one row per
    frame with a checksum + a stub feature vector.

    Same contract as ``extract_features``: the decode is a deterministic
    fake (slice digest), the Spark plumbing — one Arrow pass, 1→N row
    fan-out inside ``mapInPandas``, no shuffle — is the real deliverable
    and is what a real ffmpeg/PIL decoder would drop into.
    """
    import hashlib as _hl

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sums, feats = [], [], [], []
            for doc_id, blob in zip(pdf["id"], pdf["blob"]):
                data = bytes(blob)
                step = max(1, len(data) // n_frames)
                for i in range(n_frames):
                    frame = data[i * step : (i + 1) * step]
                    ids.append(doc_id)
                    idxs.append(i)
                    sums.append(_hl.md5(frame).hexdigest())
                    feats.append(decode_image_stub(frame, fake=batch_fake))
            yield pd.DataFrame(
                {
                    "id": ids,
                    "frame_idx": idxs,
                    "frame_checksum": sums,
                    "frame_feature": feats,
                }
            )

    return ensure_min_parallelism(blobs).mapInPandas(op, schema=FRAME_SCHEMA)


def resize_stub(blob: bytes, out_dim: int = 8) -> list[float]:
    """Placeholder for an image resize / audio resample: mean-pools the
    byte stream into ``out_dim`` equal chunks (deterministic, shape-
    stable — the property a real `PIL.Image.resize` swap-in must keep).
    Empty blobs produce a zero vector."""
    if not blob:
        return [0.0] * out_dim
    step = max(1, len(blob) // out_dim)
    out = []
    for i in range(out_dim):
        chunk = blob[i * step : (i + 1) * step] or blob[-step:]
        out.append(round(sum(chunk) / len(chunk) / 255.0, 6))
    return out


def resize_features(blobs: DataFrame, out_dim: int = 8) -> DataFrame:
    """Arrow-batched resize over the binary column: fixed-dim pooled
    vector per blob (the image-resize plumbing; swap ``resize_stub`` for
    a real decoder+resize to productionize)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "resized": pdf["blob"].map(
                        lambda b: resize_stub(bytes(b), out_dim)
                    ),
                }
            )

    return ensure_min_parallelism(blobs).mapInPandas(
        op, schema="id long, resized array<double>"
    )
