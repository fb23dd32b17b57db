"""ctypes binding to the system libwebp (when installed) — the native
fast path for WebP decode/encode, and the in-container cross-validation
oracle for the pure-Python VP8/VP8L codecs.

Only stable public C API symbols are used (``WebPDecodeRGBA``,
``WebPDecodeYUV``, ``WebPEncodeRGBA``, ``WebPEncodeLosslessRGBA``,
``WebPGetInfo``, ``WebPFree`` — webp/decode.h, webp/encode.h).  Every
entry point degrades to ``None``/``ImportError`` when the library is
absent, so callers gate on :func:`available` and fall back to the
dependency-free decoders.

At 100 TB scale this is the intended decode path (C speed, SIMD); the
pure-Python decoders in :mod:`padawan_spark.functions.webp` /
:mod:`padawan_spark.functions.vp8` guarantee the pipeline still
executes — and stays oracle-checkable — in environments without it.
"""

from __future__ import annotations

import ctypes
import ctypes.util

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    for name in ("libwebp.so.7", "libwebp.so", "libwebp.7.dylib",
                 "libwebp.dylib", ctypes.util.find_library("webp")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        try:
            lib.WebPGetInfo.restype = ctypes.c_int
            lib.WebPGetInfo.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
            lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
            lib.WebPDecodeRGBA.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
            lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
            lib.WebPDecodeYUV.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
            lib.WebPEncodeRGBA.restype = ctypes.c_size_t
            lib.WebPEncodeRGBA.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_float,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
            lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
            lib.WebPEncodeLosslessRGBA.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
            lib.WebPFree.restype = None
            lib.WebPFree.argtypes = [ctypes.c_void_p]
        except AttributeError:
            continue
        _lib = lib
        break
    return _lib


def available() -> bool:
    return _load() is not None


def get_info(data: bytes) -> tuple[int, int] | None:
    """(width, height) via WebPGetInfo, or None if unparsable/absent."""
    lib = _load()
    if lib is None:
        return None
    w, h = ctypes.c_int(), ctypes.c_int()
    if not lib.WebPGetInfo(data, len(data), ctypes.byref(w),
                           ctypes.byref(h)):
        return None
    return w.value, h.value


def decode_rgba(data: bytes) -> tuple[int, int, bytes]:
    """Decode any WebP (lossy VP8, lossless VP8L, VP8X) to
    ``(width, height, rgba_bytes)`` with the system decoder."""
    lib = _load()
    if lib is None:
        raise ImportError("libwebp is not installed")
    w, h = ctypes.c_int(), ctypes.c_int()
    buf = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w),
                             ctypes.byref(h))
    if not buf:
        raise ValueError("libwebp could not decode the payload")
    try:
        rgba = ctypes.string_at(buf, w.value * h.value * 4)
    finally:
        lib.WebPFree(buf)
    return w.value, h.value, rgba


def decode_yuv(data: bytes) -> tuple[int, int, bytes, bytes, bytes]:
    """Decode to raw ``(width, height, y_plane, u_plane, v_plane)``
    (4:2:0; chroma planes are ceil(w/2) x ceil(h/2)) — the byte-exact
    cross-validation target for the pure-Python VP8 decoder, free of
    any YUV→RGB conversion choices."""
    lib = _load()
    if lib is None:
        raise ImportError("libwebp is not installed")
    w, h = ctypes.c_int(), ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)()
    v = ctypes.POINTER(ctypes.c_uint8)()
    stride, uv_stride = ctypes.c_int(), ctypes.c_int()
    buf = lib.WebPDecodeYUV(data, len(data), ctypes.byref(w),
                            ctypes.byref(h), ctypes.byref(u),
                            ctypes.byref(v), ctypes.byref(stride),
                            ctypes.byref(uv_stride))
    if not buf:
        raise ValueError("libwebp could not decode the payload")
    try:
        W, H = w.value, h.value
        cw, ch = (W + 1) // 2, (H + 1) // 2
        yp = b"".join(ctypes.string_at(
            ctypes.addressof(buf.contents) + r * stride.value, W)
            for r in range(H))
        up = b"".join(ctypes.string_at(
            ctypes.addressof(u.contents) + r * uv_stride.value, cw)
            for r in range(ch))
        vp = b"".join(ctypes.string_at(
            ctypes.addressof(v.contents) + r * uv_stride.value, cw)
            for r in range(ch))
    finally:
        lib.WebPFree(buf)
    return W, H, yp, up, vp


def encode_rgba(width: int, height: int, rgba: bytes,
                quality: float = 75.0) -> bytes:
    """Lossy (VP8) encode via the simple API — used to generate REAL
    lossy fixtures that the pure-Python decoder must match byte-exactly."""
    lib = _load()
    if lib is None:
        raise ImportError("libwebp is not installed")
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGBA(rgba, width, height, width * 4,
                           float(quality), ctypes.byref(out))
    if not n:
        raise ValueError("libwebp encode failed")
    try:
        return ctypes.string_at(out, n)
    finally:
        lib.WebPFree(out)


def encode_lossless_rgba(width: int, height: int, rgba: bytes) -> bytes:
    lib = _load()
    if lib is None:
        raise ImportError("libwebp is not installed")
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeLosslessRGBA(rgba, width, height, width * 4,
                                   ctypes.byref(out))
    if not n:
        raise ValueError("libwebp encode failed")
    try:
        return ctypes.string_at(out, n)
    finally:
        lib.WebPFree(out)
