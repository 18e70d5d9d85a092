"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched ``mapInPandas`` kernels.

The heavy decode libraries (Pillow, ffmpeg, torchaudio) are OPTIONAL:
``decode_image`` routes through Pillow when it is importable (probed on each
executor) and raises ``NotImplementedError`` otherwise, and the deterministic
stub kernels derive pseudo-features from the raw bytes so the plumbing stays
testable in decode-free runtimes. Everything Spark-side —
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


def _pillow():
    """Pillow's Image module when installed, else None — probed at call
    time so executors (separate worker processes) make their own probe."""
    try:
        from PIL import Image

        return Image
    except ImportError:
        return None


def decode_image(data: bytes) -> tuple[int, int, float]:
    """Real decode entry point: (width, height, mean_luma 0-255) via Pillow
    when installed; raises NotImplementedError otherwise (the deterministic
    stub kernels below never call this)."""
    Image = _pillow()
    if Image is None:
        raise NotImplementedError(
            "image decode requires Pillow/opencv; not available in this runtime"
        )
    import io

    with Image.open(io.BytesIO(bytes(data))) as im:
        g = im.convert("L")
        w, h = g.size
        hist = g.histogram()  # 256 luma bins; no numpy round-trip
        return w, h, sum(i * c for i, c in enumerate(hist)) / max(1, w * h)


def extract_image_features(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """The REAL-decode twin of :func:`extract_media_features`: same
    mapInPandas shape, same output schema, but geometry/luma come from
    ``decode_image`` (Pillow) instead of the deterministic stub. Raises in
    runtimes without an image library — callers choose the stub or this
    explicitly; nothing silently degrades."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "doc_id": [], "byte_len": [], "width": [],
                "height": [], "n_frames": [], "mean_luma": [],
            }
            for did, b in zip(pdf[id_col], pdf["media_bytes"]):
                b = bytes(b)
                w, h, luma = decode_image(b)
                rows["doc_id"].append(did)
                rows["byte_len"].append(len(b))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_frames"].append(1)
                rows["mean_luma"].append(luma)
            yield pd.DataFrame(rows)

    return media.mapInPandas(kernel, schema=MEDIA_SCHEMA)


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


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_len int, frame_md5 string"


def sample_frames(media: DataFrame, id_col: str = "doc_id", stride: int = 2) -> DataFrame:
    """Frame sampling over the binary column: the blob divides into
    ``n_frames`` fixed-size frames (fake geometry from the deterministic
    stub; a real video decoder would pull keyframes here) and every
    ``stride``-th frame is emitted as (doc_id, frame_idx, frame_len,
    frame_md5). The fan-out happens INSIDE the kernel — one input row yields
    several output rows from the same Arrow batch, the shape a real
    frame-sampler uses so sampled frames never round-trip through a shuffle.

    The fingerprint is md5 of the frame bytes' uppercase hex, byte-exactly
    replayable in SQL as md5(substring(hex(blob), off*2+1, len*2)) — DuckDB
    has no blob substring, so the hex-string view is the cross-engine
    contract."""
    import hashlib

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_len": [], "frame_md5": []}
            for did, b in zip(pdf[id_col], pdf["media_bytes"]):
                b = bytes(b)
                n = len(b)
                n_frames = 1 + (n % 7)
                fsize = n // n_frames
                for fi in range(0, n_frames, stride):
                    chunk = b[fi * fsize : (fi + 1) * fsize]
                    out["doc_id"].append(did)
                    out["frame_idx"].append(fi)
                    out["frame_len"].append(len(chunk))
                    out["frame_md5"].append(hashlib.md5(chunk.hex().upper().encode()).hexdigest())
            yield pd.DataFrame(out)

    return media.mapInPandas(kernel, schema=FRAME_SCHEMA)


AUDIO_RATE = 8000  # Hz, 8-bit unsigned mono PCM throughout


def synth_wav(doc_id: int, n_samples: int, rate: int = AUDIO_RATE) -> bytes:
    """A REAL WAV blob (RIFF header + 8-bit unsigned mono PCM) written with
    the stdlib ``wave`` encoder; sample i is the deterministic sequence
    ``(doc_id*7 + i*13) % 256`` so an SQL oracle can replay every decoded
    statistic without parsing RIFF."""
    import io
    import wave

    samples = bytes((doc_id * 7 + i * 13) % 256 for i in range(n_samples))
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(rate)
        w.writeframes(samples)
    return buf.getvalue()


def decode_audio(data: bytes) -> tuple[int, int, int, bytes]:
    """REAL audio decode — stdlib ``wave`` RIFF parser, present in every
    runtime (unlike image/video codecs): returns (n_channels, framerate,
    n_frames, raw frame bytes)."""
    import io
    import wave

    with wave.open(io.BytesIO(bytes(data)), "rb") as w:
        return (
            w.getnchannels(),
            w.getframerate(),
            w.getnframes(),
            w.readframes(w.getnframes()),
        )


AUDIO_SCHEMA = (
    "doc_id bigint, sample_rate int, n_samples bigint, duration_ms double, "
    "mean_amp double, rms_amp double, zero_crossings bigint"
)


def attach_audio(docs: DataFrame, id_col: str, n_samples_col: str) -> DataFrame:
    """Materialize real WAV payloads (stdlib encoder, executor-side) as the
    audio analogue of :func:`attach_binary`."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_bytes": [
                        synth_wav(int(d), int(n))
                        for d, n in zip(pdf[id_col], pdf[n_samples_col])
                    ],
                    "media_type": "audio/wav",
                }
            )

    return docs.mapInPandas(
        kernel, schema="doc_id bigint, media_bytes binary, media_type string"
    )


def extract_audio_features(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas audio feature extraction over REAL WAV bytes: each blob
    goes through the stdlib RIFF decode, then numpy computes amplitude
    statistics on the decoded PCM — the spectrogram/VAD kernel shape, with
    bounded per-batch memory exactly like the image path."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in (
                "doc_id", "sample_rate", "n_samples", "duration_ms",
                "mean_amp", "rms_amp", "zero_crossings",
            )}
            for did, b in zip(pdf[id_col], pdf["media_bytes"]):
                nch, rate, n, frames = decode_audio(bytes(b))
                if nch != 1:  # a stripped assert would mis-read stereo
                    raise ValueError(f"expected mono WAV, got {nch} channels")
                c = np.frombuffer(frames, dtype=np.uint8).astype(np.int64) - 128
                neg = c < 0
                rows["doc_id"].append(did)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(n)
                # integer sums -> one IEEE divide/sqrt: bit-identical in any
                # engine, no rounding contract needed
                rows["duration_ms"].append(n * 1000.0 / rate)
                rows["mean_amp"].append(float(c.sum()) / max(1, n))
                rows["rms_amp"].append(
                    float(np.sqrt(float((c * c).sum()) / max(1, n)))
                )
                rows["zero_crossings"].append(int((neg[1:] != neg[:-1]).sum()))
            yield pd.DataFrame(rows)

    return media.mapInPandas(kernel, schema=AUDIO_SCHEMA)


def resize_stub(media: DataFrame, target_w: int, target_h: int, id_col: str = "doc_id") -> DataFrame:
    """Resize plumbing: computes the real output geometry (aspect-preserving
    fit into target_w x target_h from the stub's fake source geometry) and
    passes the payload through untouched — the byte transform itself needs an
    image library (decode_image raises NotImplementedError). The Spark-side
    contract (schema, one-row-in-one-row-out mapInPandas, payload column kept
    binary) is exactly what the real kernel drops into."""

    schema = f"{id_col} bigint, media_bytes binary, src_w int, src_h int, out_w int, out_h int"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["media_bytes"].map(_fake_features)
            src_w = [f[1] for f in feats]
            src_h = [f[2] for f in feats]
            scale = [min(target_w / w, target_h / h) for w, h in zip(src_w, src_h)]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "media_bytes": pdf["media_bytes"],  # real kernel: decoded+resized bytes
                    "src_w": src_w,
                    "src_h": src_h,
                    "out_w": [max(1, int(w * s)) for w, s in zip(src_w, scale)],
                    "out_h": [max(1, int(h * s)) for h, s in zip(src_h, scale)],
                }
            )

    return media.mapInPandas(kernel, schema=schema)


FRAME_AUDIO_SCHEMA = (
    "doc_id bigint, frame_idx int, n_in_frame int, frame_rms double, "
    "frame_peak int, n_flips bigint"
)


def extract_audio_frames(
    media: DataFrame, id_col: str = "doc_id", frame_len: int = 20
) -> DataFrame:
    """Frame-level audio analysis over REAL WAV bytes: RIFF-decode, split
    the PCM into fixed-length frames, and emit per-frame RMS / peak /
    sign-flip counts — the VAD/onset-detection shape. The fan-out happens
    INSIDE the Arrow kernel (one input row yields n_frames output rows from
    the same batch), so frame rows never round-trip through a shuffle and
    the blob itself dies inside the task."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "doc_id", "frame_idx", "n_in_frame", "frame_rms",
                "frame_peak", "n_flips",
            )}
            for did, b in zip(pdf[id_col], pdf["media_bytes"]):
                nch, rate, n, frames = decode_audio(bytes(b))
                if nch != 1:  # a stripped assert would mis-read stereo
                    raise ValueError(f"expected mono WAV, got {nch} channels")
                c = np.frombuffer(frames, dtype=np.uint8).astype(np.int64) - 128
                for fi in range(0, (n + frame_len - 1) // frame_len):
                    f = c[fi * frame_len : (fi + 1) * frame_len]
                    neg = f < 0
                    out["doc_id"].append(did)
                    out["frame_idx"].append(fi)
                    out["n_in_frame"].append(len(f))
                    out["frame_rms"].append(
                        float(np.sqrt(float((f * f).sum()) / len(f)))
                    )
                    out["frame_peak"].append(int(np.abs(f).max()))
                    out["n_flips"].append(int((neg[1:] != neg[:-1]).sum()))
            yield pd.DataFrame(out)

    return media.mapInPandas(kernel, schema=FRAME_AUDIO_SCHEMA)
