"""Multimodal column operators: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

Convention (what a 100 TB multimodal corpus table looks like here):

    doc_id bigint, payload binary, media_type string,
    meta struct<width:int, height:int, channels:int, duration_ms:bigint>

The Spark-side plumbing — schemas, batch iteration, partition-parallel
UDF signatures — is real and tested.  IMAGE decode is real and runs in
every environment: PIL when installed (any format), else a
dependency-free ``struct``-unpack codec for uncompressed 24bpp BMP
(:func:`decode_bmp_py`), oracle-checked end-to-end by the
``mm_real_decode`` query.  Video/audio codec calls (ffmpeg/librosa)
remain STUBBED — no such library ships in this container — raising
``NotImplementedError`` unless the library imports; the deterministic
``fake_decode_image`` additionally stands in where format-agnostic
plumbing tests need it.

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


# ---------------------------------------------------------------------------
# pure-Python uncompressed-BMP codec: a REAL decode path that needs no
# media library, so the image pipeline is executable (and oracle-
# checkable) in environments without PIL.  Handles the standard 24bpp
# uncompressed BITMAPINFOHEADER form, both bottom-up (positive height)
# and top-down (negative height) row orders, including 4-byte row
# padding.  PIL, when present, takes priority for every other format.
# ---------------------------------------------------------------------------


def decode_bmp_py(b: bytes):
    """Decode an uncompressed 24bpp BMP with plain ``struct`` unpacking.

    Returns ``(width, height, channels, pixels)`` where ``pixels`` is
    row-major TOP-DOWN BGR bytes (padding stripped, bottom-up storage
    re-ordered) — the canonical layout downstream checksums/features
    consume."""
    import struct
    if b[:2] != b"BM":
        raise NotImplementedError(
            "not a BMP payload and PIL is unavailable; only uncompressed "
            "24bpp BMP decodes without a media library")
    data_off = struct.unpack_from("<I", b, 10)[0]
    w, h = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    comp = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"pure-Python BMP decode supports uncompressed 24bpp only "
            f"(got bpp={bpp}, compression={comp})")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3          # rows pad to 4-byte boundaries
    rows = []
    for y in range(h):
        src_y = y if top_down else h - 1 - y
        off = data_off + src_y * stride
        rows.append(b[off:off + w * 3])
    return w, h, 3, b"".join(rows)


def encode_bmp_py(width: int, height: int, pixels: bytes,
                  top_down: bool = False) -> bytes:
    """Encode row-major top-down BGR bytes as an uncompressed 24bpp BMP
    (the inverse of :func:`decode_bmp_py`; used to synthesize fixture
    payloads and round-trip-test the decoder)."""
    import struct
    stride = (width * 3 + 3) & ~3
    body = bytearray()
    order = range(height) if top_down else range(height - 1, -1, -1)
    for y in order:
        row = pixels[y * width * 3:(y + 1) * width * 3]
        body += row + b"\x00" * (stride - len(row))
    data_off = 14 + 40
    size = data_off + len(body)
    hdr = struct.pack("<2sIHHI", b"BM", size, 0, 0, data_off)
    info = struct.pack("<IiiHHIIiiII", 40, width,
                       -height if top_down else height,
                       1, 24, 0, len(body), 2835, 2835, 0, 0)
    return hdr + info + bytes(body)


def decode_image(df: DataFrame, payload_col: str = "payload",
                 id_col: str = "doc_id") -> DataFrame:
    """Real image decode: PIL when present (any format), else the
    pure-Python BMP parser — so a real decode runs in every
    environment.  Plumbing identical to fake_decode_image."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from PIL import Image as _Image
        except ImportError:
            _Image = None
        import io
        for pdf in it:
            out = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(b)
                if _Image is not None:
                    img = _Image.open(io.BytesIO(b))
                    out.append((i, img.width, img.height,
                                len(img.getbands()), len(b)))
                else:
                    w, h, c, _px = decode_bmp_py(b)
                    out.append((i, w, h, c, len(b)))
            yield pd.DataFrame(out, columns=["doc_id", "width", "height",
                                             "channels", "n_bytes"])

    return df.mapInPandas(batches, DECODED_SCHEMA)


DECODE_STATS_SCHEMA = ("doc_id bigint, width int, height int, channels int, "
                       "pix_checksum bigint")


def decode_image_pixels(df: DataFrame, payload_col: str = "payload",
                        id_col: str = "doc_id") -> DataFrame:
    """Decode images DOWN TO PIXELS and emit a position-weighted
    checksum: ``sum((idx + 1) * (r + 2g + 3b))`` over row-major
    top-down pixels.  The weight makes the checksum sensitive to pixel
    ORDER, so a decoder that mishandles BMP bottom-up storage or row
    padding produces a different value — this is the oracle-checkable
    proof that real decoding ran correctly.  PIL path and the
    pure-Python BMP path produce identical values by construction
    (both normalize to top-down RGB)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        try:
            from PIL import Image as _Image
        except ImportError:
            _Image = None
        import io
        for pdf in it:
            out = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(b)
                if _Image is not None:
                    img = _Image.open(io.BytesIO(b)).convert("RGB")
                    w, h = img.width, img.height
                    rgb = np.frombuffer(img.tobytes(), dtype=np.uint8)
                    rgb = rgb.reshape(-1, 3).astype(np.int64)
                else:
                    w, h, _c, px = decode_bmp_py(b)
                    bgr = np.frombuffer(px, dtype=np.uint8)
                    rgb = bgr.reshape(-1, 3)[:, ::-1].astype(np.int64)
                weights = np.arange(1, w * h + 1, dtype=np.int64)
                chk = int((weights * (rgb[:, 0] + 2 * rgb[:, 1]
                                      + 3 * rgb[:, 2])).sum())
                out.append((i, w, h, 3, chk))
            yield pd.DataFrame(out, columns=["doc_id", "width", "height",
                                             "channels", "pix_checksum"])

    return df.mapInPandas(batches, DECODE_STATS_SCHEMA)


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
