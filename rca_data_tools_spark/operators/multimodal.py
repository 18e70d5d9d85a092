"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched ``mapInPandas`` kernels.

The heavy decode libraries (Pillow, ffmpeg, torchaudio) are NOT in this
runtime, so the actual byte -> pixels/samples step is stubbed: ``decode_image``
raises ``NotImplementedError`` and ``fake_decode_features`` derives
deterministic pseudo-features from the raw bytes. Everything Spark-side —
schema, batch iteration, partition sizing — is real and is what matters at
100 TB: binary blobs ride the scan, Python only ever sees Arrow record
batches, and per-batch memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "doc_id bigint, byte_len int, width int, height int, n_frames int, mean_luma double"


def attach_binary(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Materialize an opaque binary payload column (stand-in for image bytes)
    plus typed metadata, the canonical multimodal row layout."""
    return docs.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("media_bytes"),
        F.lit("image/fake").alias("media_type"),
    )


def decode_image(data: bytes):
    """Real decode entry point — requires an image library not present in
    this runtime."""
    raise NotImplementedError("image decode requires Pillow/opencv; not available in this runtime")


def _fake_features(b: bytes) -> tuple[int, int, int, int, float]:
    """Deterministic pseudo-decode used for plumbing tests: features are pure
    arithmetic on byte length and first byte, reproducible in any engine."""
    n = len(b)
    first = b[0] if n else 0
    width = 64 + (n % 512)
    height = 64 + (first % 256)
    n_frames = 1 + (n % 7)
    mean_luma = ((n * 31 + first) % 25600) / 100.0
    return n, width, height, n_frames, mean_luma


def extract_media_features(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas feature extraction over the binary column.

    The kernel sees an iterator of Arrow-backed pandas batches — the shape a
    real decoder (resize, frame-sample, spectrogram) would use; swap
    ``_fake_features`` for the real kernel when decode libs exist.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["media_bytes"].map(_fake_features)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "byte_len": [f[0] for f in feats],
                    "width": [f[1] for f in feats],
                    "height": [f[2] for f in feats],
                    "n_frames": [f[3] for f in feats],
                    "mean_luma": [f[4] for f in feats],
                }
            )

    return media.mapInPandas(kernel, schema=MEDIA_SCHEMA)
