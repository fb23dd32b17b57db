"""Multimodal column operators: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

Convention (what a 100 TB multimodal corpus table looks like here):

    doc_id bigint, payload binary, media_type string,
    meta struct<width:int, height:int, channels:int, duration_ms:bigint>

The Spark-side plumbing — schemas, batch iteration, partition-parallel
UDF signatures — is real and tested.  The actual codec calls (PIL/
ffmpeg/librosa) are STUBBED: this container has no media libraries, so
each decoder raises ``NotImplementedError`` unless its library imports,
and a deterministic ``fake_decode_image`` stands in for tests/oracles
(dimensions derived arithmetically from the payload bytes).

Scale notes: decode/resize/feature-extract are embarrassingly parallel
per row; ``mapInPandas`` keeps them JVM→Arrow→pandas batched (no
per-row Python overhead), and binary payloads never shuffle unless the
caller repartitions.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

DECODED_SCHEMA = ("doc_id bigint, width int, height int, channels int, "
                  "n_bytes bigint")
FEATURE_SCHEMA = "doc_id bigint, features array<double>"
FRAMES_SCHEMA = "doc_id bigint, frame_idx int, frame binary"
AUDIO_SCHEMA = "doc_id bigint, sample_rate int, n_samples bigint"


def _require_lib(name: str):
    try:
        return __import__(name)
    except ImportError as e:
        raise NotImplementedError(
            f"{name} is not available in this environment; real decode is "
            f"stubbed (plumbing is tested via fake_decode_image)") from e


def decode_image(df: DataFrame, payload_col: str = "payload",
                 id_col: str = "doc_id") -> DataFrame:
    """Real image decode via PIL — raises NotImplementedError when PIL is
    absent (this container).  Plumbing identical to fake_decode_image."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        PIL = _require_lib("PIL.Image")
        import io
        for pdf in it:
            out = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                img = PIL.open(io.BytesIO(b))
                out.append((i, img.width, img.height, len(img.getbands()),
                            len(b)))
            yield pd.DataFrame(out, columns=["doc_id", "width", "height",
                                             "channels", "n_bytes"])

    return df.mapInPandas(batches, DECODED_SCHEMA)


def fake_decode_image(df: DataFrame, payload_col: str = "payload",
                      id_col: str = "doc_id") -> DataFrame:
    """Deterministic stand-in decoder: dimensions are pure arithmetic on
    the payload byte length, so results are oracle-checkable while the
    batch shapes / schema / partitioning match the real decoder."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = pdf[payload_col].map(len)
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "width": (64 + n % 191).astype("int32"),
                "height": (64 + (n * 31) % 191).astype("int32"),
                "channels": pd.Series([3] * len(pdf)).astype("int32"),
                "n_bytes": n.astype("int64"),
            })

    return df.mapInPandas(batches, DECODED_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int,
                  payload_col: str = "payload") -> DataFrame:
    """Resize via PIL (raises NotImplementedError when PIL is absent);
    schema preserved, payload re-encoded as PNG."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _require_lib("PIL.Image")
        import io

        from PIL import Image
        for pdf in it:  # pragma: no cover (needs PIL; see test_extensions)
            def rz(b):
                img = Image.open(io.BytesIO(b)).resize((width, height))
                buf = io.BytesIO()
                img.save(buf, format="PNG")
                return buf.getvalue()
            pdf = pdf.copy()
            pdf[payload_col] = pdf[payload_col].map(rz)
            yield pdf

    return df.mapInPandas(batches, df.schema)


def extract_image_features(df: DataFrame, payload_col: str = "payload",
                           id_col: str = "doc_id") -> DataFrame:
    """Deterministic byte-histogram features (16 buckets, L1-normalized):
    a real, library-free feature extractor shaped like an embedding UDF."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in it:
            feats = []
            for b in pdf[payload_col]:
                # vectorized: view bytes as uint8, bucket by high nibble
                arr = np.frombuffer(b, dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=16).astype("float64")
                feats.append(hist / max(1, arr.size))
            yield pd.DataFrame({"doc_id": pdf[id_col], "features": feats})

    return df.mapInPandas(batches, FEATURE_SCHEMA)


def sample_video_frames(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Stub frame sampler: requires an ffmpeg binding."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _require_lib("av")
        yield from it  # pragma: no cover

    return df.mapInPandas(batches, FRAMES_SCHEMA)


def decode_audio(df: DataFrame) -> DataFrame:
    """Stub audio decode: requires librosa/soundfile."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _require_lib("soundfile")
        yield from it  # pragma: no cover

    return df.mapInPandas(batches, AUDIO_SCHEMA)
